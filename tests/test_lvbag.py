"""LVBAG reader vs the reference autotest (autotest/ogr/ogr_lvbag.py)."""

import os

import pytest

from gdal_spark.sources.lvbag import lvbag_open

D = "/root/reference/autotest/ogr/data/lvbag"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference autotest data missing"
)


def test_lig():
    ds = lvbag_open(os.path.join(D, "lig.xml"))
    assert ds.layer_count == 1
    l = ds.layers[0]
    assert l.name == "Ligplaats" and l.geom_type == "POLYGON"
    assert l.feature_count == 3 and len(l.fields) == 17
    assert l.epsg == 28992  # Amersfoort / RD New
    assert l.field_names[:4] == [
        "hoofdadresNummeraanduidingRef", "nevenadresNummeraanduidingRef",
        "identificatie", "status",
    ]
    f = l.features[0]["fields"]
    assert f["hoofdadresNummeraanduidingRef"] == \
        "NL.IMBAG.Nummeraanduiding.0106200000005333"
    assert f.get("nevenadresNummeraanduidingRef") is None
    assert f["identificatie"] == "NL.IMBAG.Ligplaats.0106020000000003"
    assert f["status"] == "Plaats aangewezen"
    assert f["geconstateerd"] == 0
    assert f["documentDatum"] == "2009/05/26"
    assert f["documentNummer"] == "2009-01000"
    assert f["voorkomenIdentificatie"] == 1
    assert f["beginGeldigheid"] == "2009/05/26"
    assert f.get("eindGeldigheid") is None
    assert f["tijdstipRegistratie"] == "2009/11/06 13:37:22"
    assert f["tijdstipRegistratieLV"] == "2009/11/06 14:07:51.498"
    assert l.features[0]["wkt"].startswith("POLYGON ((231948.413 557767.07,")


def test_num():
    l = lvbag_open(os.path.join(D, "num.xml")).layers[0]
    assert l.name == "Nummeraanduiding" and l.geom_type is None
    assert l.feature_count == 3 and len(l.fields) == 22
    f = l.features[0]["fields"]
    assert f["identificatie"] == "NL.IMBAG.Nummeraanduiding.0106200000002798"
    assert f["huisnummer"] == 23 and f["postcode"] == "9403KB"
    assert f["typeAdresseerbaarObject"] == "Verblijfsobject"
    assert f["openbareruimteRef"] == "NL.IMBAG.Openbareruimte.0106300000002560"
    assert f.get("woonplaatsRef") is None
    assert f["tijdstipRegistratie"] == "2009/11/06 12:21:37"
    assert f["tijdstipRegistratieLV"] == "2009/11/06 12:38:46.603"
    f1 = l.features[1]["fields"]
    assert f1["woonplaatsRef"] == "NL.IMBAG.Woonplaats.1050"
    assert f1["huisnummer"] == 24 and f1["postcode"] == "9403KD"


def test_opr():
    l = lvbag_open(os.path.join(D, "opr.xml")).layers[0]
    assert l.name == "Openbareruimte"
    assert l.feature_count == 4 and len(l.fields) == 19
    assert l.features[0]["fields"]["naam"] == "Twaalfsuurlaan"
    assert l.features[0]["fields"].get("verkorteNaam") is None
    assert l.features[3]["fields"]["naam"] == "Schout bij Nacht Doormansingel"
    assert l.features[3]["fields"]["verkorteNaam"] == "Sbn Doormansingel"


def test_pnd():
    l = lvbag_open(os.path.join(D, "pnd.xml")).layers[0]
    assert l.name == "Pand" and l.geom_type == "POLYGON"
    assert l.feature_count == 6 and len(l.fields) == 16
    assert l.epsg == 28992
    years = [x["fields"].get("oorspronkelijkBouwjaar") for x in l.features]
    assert years[0] == 2009
    assert years[3:] == [2007, 1975, 2001]


def test_sta_vbo_wpl():
    l = lvbag_open(os.path.join(D, "sta.xml")).layers[0]
    assert (l.name, l.geom_type, l.feature_count, len(l.fields)) == \
        ("Standplaats", "POLYGON", 2, 17)
    l = lvbag_open(os.path.join(D, "vbo.xml")).layers[0]
    assert (l.name, l.geom_type, l.feature_count, len(l.fields)) == \
        ("Verblijfsobject", "POINT", 3, 20)
    l = lvbag_open(os.path.join(D, "wpl.xml")).layers[0]
    assert (l.name, l.geom_type, l.feature_count, len(l.fields)) == \
        ("Woonplaats", "MULTIPOLYGON", 2, 16)
    assert l.features[0]["fields"]["naam"] == "Assen"
    assert l.features[0]["fields"]["identificatie"] == \
        "NL.IMBAG.Woonplaats.2391"
    assert l.features[1]["fields"]["naam"] == "Loon"


def test_fix_identificatie():
    """15-digit ids get zero-padded to 16 before the domein prefix."""
    l = lvbag_open(os.path.join(D, "pnd2.xml")).layers[0]
    assert l.features[0]["fields"]["identificatie"] == \
        "NL.IMBAG.Pand.0571100000003518"


def test_old_schema():
    assert lvbag_open(os.path.join(D, "lig_old.xml")).layer_count == 0


def test_stringlist_and_secondary():
    l = lvbag_open(os.path.join(D, "vbo2.xml")).layers[0]
    assert l.features[0]["fields"]["gebruiksdoel"] == \
        ["woonfunctie", "gezondheidszorgfunctie"]
    l = lvbag_open(os.path.join(D, "vbo3.xml")).layers[0]
    f = l.features[0]["fields"]
    assert f["hoofdadresNummeraanduidingRef"] == \
        "NL.IMBAG.Nummeraanduiding.0518200000692257"
    assert f["nevenadresNummeraanduidingRef"] == [
        "NL.IMBAG.Nummeraanduiding.0518200000692258",
        "NL.IMBAG.Nummeraanduiding.0518200000692259",
        "NL.IMBAG.Nummeraanduiding.0518200000692260",
    ]
    assert f["identificatie"] == "NL.IMBAG.Verblijfsobject.0518010000692261"
    l = lvbag_open(os.path.join(D, "vbo4.xml")).layers[0]
    assert l.features[0]["fields"]["pandRef"] == [
        "NL.IMBAG.Pand.0048100000002999", "NL.IMBAG.Pand.1950100000100293",
    ]


def test_file_extension():
    """Content-sniffed, so a .vbo extension opens the same way."""
    l = lvbag_open(os.path.join(D, "file4.vbo")).layers[0]
    assert l.features[0]["fields"]["pandRef"] == [
        "NL.IMBAG.Pand.0048100000002999", "NL.IMBAG.Pand.1950100000100293",
    ]


def test_read_errors():
    with pytest.raises(Exception):
        lvbag_open(os.path.join(D, "inval_pnd.xml"))
