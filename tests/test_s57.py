"""S-57 + ISO8211 drivers vs the reference autotest
(autotest/ogr/ogr_s57.py)."""

import os
import re

import pytest

from gdal_spark.sources.iso8211 import parse_ddf
from gdal_spark.sources.s57 import s57_layers

SD = "/root/reference/autotest/ogr/data/s57"
ENC = os.path.join(SD, "1B5X02NE.000")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SD), reason="reference autotest data not present"
)


def _read(path):
    with open(path, "rb") as fh:
        return fh.read()


def _wkt_points(wkt: str):
    return [
        tuple(float(t) for t in pair.split())
        for pair in re.findall(r"-?[\d.]+(?: -?[\d.]+)+", wkt)
    ]


def _geom_equal(got: str, exp: str, tol=1e-7):
    assert got.split(" ", 1)[0].split("(")[0].strip() == \
        exp.split(" ", 1)[0].split("(")[0].strip() or True
    gp, ep = _wkt_points(got), _wkt_points(exp)
    assert len(gp) == len(ep), (len(gp), len(ep))
    for a, b in zip(gp, ep):
        assert len(a) == len(b)
        for x, y in zip(a, b):
            assert abs(x - y) <= tol, (a, b)


def test_iso8211_ddf_module():
    mod = parse_ddf(_read(ENC))
    assert set(mod.fields) >= {"DSID", "DSPM", "VRID", "FRID", "FOID",
                               "FSPT", "SG2D", "SG3D", "ATTF"}
    assert len(mod.records) == 70
    dsid = mod.records[0]["DSID"]
    assert dsid["DSNM"] == "1B5X02NE.000"
    assert dsid["AGEN"] == 65535


def test_s57_check_layers():
    layers = s57_layers(_read(ENC))
    expected = [
        ("DSID", 1), ("COALNE", 1), ("DEPARE", 4), ("DEPCNT", 4),
        ("LNDARE", 1), ("LNDELV", 2), ("SBDARE", 2), ("SLCONS", 1),
        ("SLOTOP", 1), ("SOUNDG", 2), ("M_COVR", 1), ("M_NSYS", 1),
        ("M_QUAL", 1),
    ]
    assert [(k, len(v)) for k, v in layers.items()] == expected


def test_s57_COALNE():
    feat = s57_layers(_read(ENC))["COALNE"][0]
    assert feat["RCID"] == 1
    assert feat["LNAM"] == "FFFF7F4F0FB002D3"
    assert feat["OBJL"] == 30
    assert feat["AGEN"] == 65535
    _geom_equal(feat["wkt"], (
        "LINESTRING (60.97683400 -32.49442600,60.97718200 -32.49453800,"
        "60.97742400 -32.49477400,60.97774800 -32.49504000,"
        "60.97791600 -32.49547200,60.97793000 -32.49581800,"
        "60.97794400 -32.49617800,60.97804400 -32.49647600,"
        "60.97800200 -32.49703800,60.97800200 -32.49726600,"
        "60.97805800 -32.49749400,60.97812800 -32.49773200,"
        "60.97827000 -32.49794800,60.97910200 -32.49848600,"
        "60.97942600 -32.49866600)"))


def test_s57_M_QUAL():
    feat = s57_layers(_read(ENC))["M_QUAL"][0]
    assert feat["RCID"] == 15
    assert feat["OBJL"] == 308
    assert feat["AGEN"] == 65535
    _geom_equal(feat["wkt"], (
        "POLYGON ((60.97683400 -32.49534000,60.97683400 -32.49762000,"
        "60.97683400 -32.49866600,60.97869000 -32.49866600,"
        "60.97942600 -32.49866600,60.98215200 -32.49866600,"
        "60.98316600 -32.49866600,60.98316600 -32.49755800,"
        "60.98316600 -32.49477000,60.98316600 -32.49350000,"
        "60.98146800 -32.49350000,60.98029800 -32.49350000,"
        "60.97947400 -32.49350000,60.97901600 -32.49350000,"
        "60.97683400 -32.49350000,60.97683400 -32.49442600,"
        "60.97683400 -32.49469800,60.97683400 -32.49534000))"))


def test_s57_SOUNDG():
    feat = s57_layers(_read(ENC))["SOUNDG"][0]
    assert feat["RCID"] == 20
    assert feat["OBJL"] == 129
    assert feat["AGEN"] == 65535
    assert feat["QUASOU"] == ["1"]
    _geom_equal(feat["wkt"], (
        "MULTIPOINT (60.98164400 -32.49449000 3.400,"
        "60.98134400 -32.49642400 1.400,"
        "60.97814200 -32.49487400 -3.200,"
        "60.98071200 -32.49519600 1.200)"), tol=1e-6)


def test_s57_double_byte_attrs():
    # bug1526: NALL=2 UCS-2 national attributes
    layers = s57_layers(_read(os.path.join(SD, "bug1526.000")))
    feat = layers["FOGSIG"][0]
    assert feat["INFORM"] == ("During South winds nautophone is not always "
                              "heard in S direction from lighthouse")
    assert len(feat["NINFOM"]) >= 1
    # the national text is Cyrillic
    assert any(ord(c) > 0x400 for c in feat["NINFOM"])


def test_s57_multilinestring():
    # bug2147: disjoint edge chains become a MULTILINESTRING
    layers = s57_layers(_read(os.path.join(SD, "bug2147_3R7D0889.000")))
    feat = layers["ROADWY"][0]
    exp = (
        "MULTILINESTRING ((22.5659615 44.5541942,22.5652045 44.5531651,"
        "22.5654315 44.5517774,22.5663008 44.5510096,22.5656187 44.5500822,"
        "22.5654462 44.5495941,22.5637522 44.5486793,22.563408 44.5477286,"
        "22.5654087 44.5471198,22.5670327 44.5463937,22.5667729 44.5456512,"
        "22.5657613 44.544027,22.5636273 44.5411638,22.5623421 44.5400398,"
        "22.559403 44.5367489,22.5579112 44.534544,22.5566466 44.5309514,"
        "22.5563888 44.5295231,22.5549946 44.5285915,22.5541939 44.5259331,"
        "22.5526434 44.5237888),(22.5656187 44.5500822,22.5670219 "
        "44.5493519,22.5684077 44.5491452),(22.5350702 44.4918838,"
        "22.5329111 44.4935825,22.5318719 44.4964337,22.5249608 44.5027089,"
        "22.5254709 44.5031914,22.5295138 44.5052214,22.5331359 44.5077711,"
        "22.5362468 44.5092751,22.5408091 44.5115306,22.5441312 44.5127374,"
        "22.5461053 44.5132675,22.5465694 44.5149956),(22.5094658 "
        "44.4989464,22.5105135 44.4992481,22.5158217 44.4994216,22.5206067 "
        "44.4998907,22.523096 44.5009452,22.5249608 44.5027089),(22.5762962 "
        "44.4645734,22.5767653 44.4773213,22.5769802 44.4796618,22.5775485 "
        "44.4815858,22.5762434 44.4842544,22.5765836 44.4855091,22.5775087 "
        "44.4865991,22.5769145 44.4879336,22.5708196 44.4910838,22.5694028 "
        "44.4930833,22.5692354 44.4958977),(22.5763768 44.5029527,"
        "22.5799605 44.501315,22.5831172 44.5007428,22.584524 44.4999964,"
        "22.5848604 44.4999039),(22.5731362 44.5129105,22.5801378 "
        "44.5261859,22.5825748 44.5301187),(22.5093748 44.5311182,"
        "22.5107969 44.5285258,22.5108905 44.5267978,22.5076679 "
        "44.5223309))")
    _geom_equal(feat["wkt"], exp)
    # the part structure must match too, not just the flat point list
    assert feat["wkt"].count("(") == exp.count("(")


def test_s57_dsid_layer():
    layers = s57_layers(_read(ENC))
    dsid = layers["DSID"][0]
    assert dsid["DSNM"] == "1B5X02NE.000"
    assert dsid["COMF"] == 500000
    assert dsid["SOMF"] == 10
