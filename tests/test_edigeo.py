"""EDIGEO reader (sources/edigeo.py) over a synthetic cadastre lot
shaped like the reference autotest dataset (ogr_edigeo.py layers:
point/line/polygon object classes, attributes, QAL dates)."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.sources.edigeo import edigeo_open


def L(code: str, value: str) -> str:
    return f"{code}{len(value):02d}:{value}"


def _lot(hole: bool = False) -> dict[str, str]:
    thf = "\n".join([
        L("LONSA", "EDAB01"),
        L("GNNSA", "SE"),
        L("GONSA", "SE"),
        L("QANSA", "SE"),
        L("DINSA", "SE"),
        L("SCNSA", "SE"),
        L("GDNSA", "T1"),
    ])
    geo = L("RELSA", "LAMB1")
    gen = "\n".join([L("CM1CC", "900000;100000"),
                     L("CM2CC", "901000;101000")])
    dic = "\n".join([
        L("RTYSA", "DID"), L("RIDSA", "ID_N_OBJ_E_2_1_0"),
        L("LABSA", "BORNE"),
        L("RTYSA", "DID"), L("RIDSA", "ID_N_OBJ_E_2_1_1"),
        L("LABSA", "BATIMENT"),
        L("RTYSA", "DID"), L("RIDSA", "ID_N_OBJ_E_2_1_2"),
        L("LABSA", "TRONROUTE"),
        L("RTYSA", "DIA"), L("RIDSA", "ID_N_ATT_TEX"),
        L("LABSA", "TEX"), L("TYPSA", "T"),
        L("RTYSA", "DIA"), L("RIDSA", "ID_N_ATT_SUP"),
        L("LABSA", "SUPF"), L("TYPSA", "R"),
    ])
    scd = "\n".join([
        L("RTYSA", "OBJ"), L("RIDSA", "BORNE_id"),
        L("DIPCP", "SE;SE;DID;ID_N_OBJ_E_2_1_0"), L("KNDSA", "PCT"),
        L("AAPCP", "SE;SE;ATT;ATT_TEX_id"),
        L("RTYSA", "OBJ"), L("RIDSA", "BATIMENT_id"),
        L("DIPCP", "SE;SE;DID;ID_N_OBJ_E_2_1_1"), L("KNDSA", "ARE"),
        L("AAPCP", "SE;SE;ATT;ATT_SUP_id"),
        L("RTYSA", "OBJ"), L("RIDSA", "TRONROUTE_id"),
        L("DIPCP", "SE;SE;DID;ID_N_OBJ_E_2_1_2"), L("KNDSA", "LIN"),
        L("RTYSA", "ATT"), L("RIDSA", "ATT_TEX_id"),
        L("DIPCP", "SE;SE;DIA;ID_N_ATT_TEX"), L("CANSN", "30"),
        L("RTYSA", "ATT"), L("RIDSA", "ATT_SUP_id"),
        L("DIPCP", "SE;SE;DIA;ID_N_ATT_SUP"), L("CANSN", "10"),
    ])
    qal = "\n".join([
        L("RTYSA", "QUP"), L("RIDSA", "QUP_1"),
        L("ODASD", "20060314"), L("UDASD", "20070101"),
    ])
    # geometry: a 10x10 square building (4 arcs), one road line,
    # one borne point
    vec_lines = [
        # arcs of the building exterior
        L("RTYSA", "PAR"), L("RIDSA", "ARC_1"),
        L("CORCC", "900100;100100"), L("CORCC", "900110;100100"),
        L("RTYSA", "PAR"), L("RIDSA", "ARC_2"),
        L("CORCC", "900110;100100"), L("CORCC", "900110;100110"),
        L("RTYSA", "PAR"), L("RIDSA", "ARC_3"),
        # deliberately reversed to exercise chain-reversal
        L("CORCC", "900100;100110"), L("CORCC", "900110;100110"),
        L("RTYSA", "PAR"), L("RIDSA", "ARC_4"),
        L("CORCC", "900100;100110"), L("CORCC", "900100;100100"),
        # a road arc
        L("RTYSA", "PAR"), L("RIDSA", "ARC_R"),
        L("CORCC", "900000;100000"), L("CORCC", "900050;100080"),
        # borne point
        L("RTYSA", "PNO"), L("RIDSA", "PNO_1"),
        L("CORCC", "900500;100500"),
        # features
        L("RTYSA", "FEA"), L("RIDSA", "FEA_BORNE"),
        L("SCPCP", "SE;SE;OBJ;BORNE_id"),
        L("ATPCP", "SE;SE;ATT;ATT_TEX_id"), L("ATVS ", "B12"),
        L("QAPCP", "SE;SE;QUP;QUP_1"),
        L("RTYSA", "FEA"), L("RIDSA", "FEA_BAT"),
        L("SCPCP", "SE;SE;OBJ;BATIMENT_id"),
        L("ATPCP", "SE;SE;ATT;ATT_SUP_id"), L("ATVS ", "100.5"),
        L("QAPCP", "SE;SE;QUP;QUP_1"),
        L("RTYSA", "FEA"), L("RIDSA", "FEA_ROUTE"),
        L("SCPCP", "SE;SE;OBJ;TRONROUTE_id"),
        # links
        L("RTYSA", "LNK"), L("RIDSA", "LNK_1"),
        L("FTPCP", "SE;SE;FEA;FEA_BORNE"), L("FTPCP", "SE;SE;PNO;PNO_1"),
        L("RTYSA", "LNK"), L("RIDSA", "LNK_2"),
        L("FTPCP", "SE;SE;FEA;FEA_ROUTE"), L("FTPCP", "SE;SE;PAR;ARC_R"),
        L("RTYSA", "LNK"), L("RIDSA", "LNK_3"),
        L("FTPCP", "SE;SE;FEA;FEA_BAT"), L("FTPCP", "SE;SE;PFE;PFE_1"),
        L("RTYSA", "LNK"), L("RIDSA", "LNK_4"),
        L("FTPCP", "SE;SE;PAR;ARC_1"), L("FTPCP", "SE;SE;PFE;PFE_1"),
        L("RTYSA", "LNK"), L("RIDSA", "LNK_5"),
        L("FTPCP", "SE;SE;PAR;ARC_2"), L("FTPCP", "SE;SE;PFE;PFE_1"),
        L("RTYSA", "LNK"), L("RIDSA", "LNK_6"),
        L("FTPCP", "SE;SE;PAR;ARC_3"), L("FTPCP", "SE;SE;PFE;PFE_1"),
        L("RTYSA", "LNK"), L("RIDSA", "LNK_7"),
        L("FTPCP", "SE;SE;PAR;ARC_4"), L("FTPCP", "SE;SE;PFE;PFE_1"),
    ]
    if hole:
        vec_lines += [
            L("RTYSA", "PAR"), L("RIDSA", "ARC_H"),
            L("CORCC", "900103;100103"), L("CORCC", "900106;100103"),
            L("CORCC", "900106;100106"), L("CORCC", "900103;100106"),
            L("CORCC", "900103;100103"),
            L("RTYSA", "LNK"), L("RIDSA", "LNK_H"),
            L("FTPCP", "SE;SE;PAR;ARC_H"), L("FTPCP", "SE;SE;PFE;PFE_1"),
        ]
    files = {
        "E000AB01.THF": thf,
        "EDAB01SE.GEO": geo,
        "EDAB01SE.GEN": gen,
        "EDAB01SE.DIC": dic,
        "EDAB01SE.SCD": scd,
        "EDAB01SE.QAL": qal,
        "EDAB01T1.VEC": "\n".join(vec_lines),
    }
    return files


def test_layers_and_extent():
    lot = edigeo_open("E000AB01.THF", _lot())
    assert set(lot.layers) == {"BORNE_id", "BATIMENT_id", "TRONROUTE_id"}
    assert lot.rel == "LAMB1"
    assert lot.extent == (900000.0, 100000.0, 901000.0, 101000.0)


def test_point_feature_with_attr_and_dates():
    lot = edigeo_open("E000AB01.THF", _lot())
    feats = lot.layer_features("BORNE_id")
    assert len(feats) == 1
    f = feats[0]
    kind, xy = f["geometry"]
    assert kind == "Point" and xy == (900500.0, 100500.0)
    assert f["fields"]["TEX"] == "B12"
    assert f["fields"]["OBJECT_RID"] == "FEA_BORNE"
    assert f["fields"]["CREAT_DATE"] == 20060314
    assert f["fields"]["UPDATE_DATE"] == 20070101
    # lookup by dictionary label also works
    assert lot.layer_features("BORNE") == feats


def test_line_feature():
    lot = edigeo_open("E000AB01.THF", _lot())
    f = lot.layer_features("TRONROUTE_id")[0]
    kind, coords = f["geometry"]
    assert kind == "LineString"
    np.testing.assert_allclose(
        coords, [(900000, 100000), (900050, 100080)])


def test_polygon_arc_chaining():
    """Four arcs, one stored reversed, chain into one closed 10x10 ring;
    the R-typed attribute converts to float."""
    lot = edigeo_open("E000AB01.THF", _lot())
    f = lot.layer_features("BATIMENT_id")[0]
    kind, polys = f["geometry"]
    assert kind == "Polygon"
    assert len(polys) == 1 and len(polys[0]) == 1
    ring = polys[0][0]
    assert tuple(ring[0]) == tuple(ring[-1])
    xs, ys = ring[:, 0], ring[:, 1]
    assert (xs.max() - xs.min(), ys.max() - ys.min()) == (10.0, 10.0)
    assert f["fields"]["SUPF"] == 100.5


def test_polygon_with_hole():
    lot = edigeo_open("E000AB01.THF", _lot(hole=True))
    f = lot.layer_features("BATIMENT_id")[0]
    _, polys = f["geometry"]
    assert len(polys) == 1 and len(polys[0]) == 2
    exterior, hole = polys[0]
    assert exterior[:, 0].max() - exterior[:, 0].min() == 10.0
    assert hole[:, 0].max() - hole[:, 0].min() == 3.0


def test_missing_mandatory_field():
    files = _lot()
    files["E000AB01.THF"] = files["E000AB01.THF"].replace("SCNSA", "XXXSA")
    with pytest.raises(ValueError, match="SCN"):
        edigeo_open("E000AB01.THF", files)
