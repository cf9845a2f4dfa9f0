"""OpenFileGDB driver vs the reference's own fixtures
(autotest/ogr/data/openfilegdb/polygon_golden.gdb and
autotest/ogr/data/filegdb/testopenfilegdb.gdb.zip, expectations from
autotest/ogr/ogr_openfilegdb.py openfilegdb_datalist +
ogr_openfilegdb_make_test_data)."""

import os
import struct
import zipfile

import numpy as np
import pytest

from gdal_spark.functions import wkb as W
from gdal_spark.sources import openfilegdb as G

GOLDEN = "/root/reference/autotest/ogr/data/openfilegdb/polygon_golden.gdb"
TESTZIP = "/root/reference/autotest/ogr/data/filegdb/testopenfilegdb.gdb.zip"


@pytest.fixture(scope="module")
def testgdb(tmp_path_factory):
    d = tmp_path_factory.mktemp("ofgdb")
    zipfile.ZipFile(TESTZIP).extractall(d)
    return str(d / "testopenfilegdb.gdb")


def _rows(gdb, name):
    layers = G.list_layers(gdb)
    L = next(l for l in layers if l["name"] == name)
    hdr = G.parse_table_header(os.path.join(gdb, L["table"] + ".gdbtable"))
    out = []
    with open(os.path.join(gdb, L["table"] + ".gdbtable"), "rb") as fh:
        for fid, off in G._table_rows_local(gdb, L["table"]):
            fh.seek(off)
            (ln,) = struct.unpack("<I", fh.read(4))
            out.append(G.decode_row(fh.read(ln), hdr["fields"], fid))
    return out


def test_polygon_golden():
    assert G.list_layers(GOLDEN) == [
        {"name": "OGRGeoJSON", "table": "a00000009", "id": 9}
    ]
    rows = _rows(GOLDEN, "OGRGeoJSON")
    assert len(rows) == 1
    assert rows[0]["foo"] == "bar"
    rings = W.polygon_rings(rows[0]["SHAPE"])
    assert np.allclose(
        rings[0][0], [[0, 0], [0, 1], [1, 0], [0, 0]], atol=1e-9
    )


def test_all_layers_decode(testgdb):
    # every layer of the reference's full-typology gdb decodes cleanly
    layers = G.list_layers(testgdb)
    names = {l["name"] for l in layers}
    assert {"point", "multipoint", "linestring", "multilinestring",
            "polygon", "multipolygon", "point25D", "polygon25D",
            "null_polygon", "big_layer", "hole",
            "pointm", "polygonzm"} <= names
    for L in layers:
        _rows(testgdb, L["name"])


def test_field_values_parity(testgdb):
    # ogr_openfilegdb_make_test_data writes 5 identical features per layer
    rows = _rows(testgdb, "point")
    assert len(rows) == 5
    r = rows[0]
    assert r["id"] == 1 and rows[4]["id"] == 5
    assert r["str"] == "foo_é"
    assert r["smallint"] == -13
    assert r["int"] == 123
    assert r["float"] == 1.5
    assert r["real"] == 4.56
    assert r["adate"] == "2013-12-26 12:34:56"
    assert r["guid"] == "{12345678-9ABC-DEF0-1234-567890ABCDEF}"
    assert r["xml"] == "<foo></foo>"
    assert r["binary"] == b"\x00\xff\x7f"
    assert r["binary2"] == b"\x12\x34\x56"
    assert r["nullint"] is None


def test_geometry_parity(testgdb):
    # expected WKTs from openfilegdb_datalist (grid-snap tolerance)
    code, pt = W.parse(_rows(testgdb, "point")[0]["SHAPE"])
    assert code == 1 and np.allclose(pt, (1, 2), atol=1e-9)
    code, ls = W.parse(_rows(testgdb, "linestring")[0]["SHAPE"])
    assert code == 2 and np.allclose(ls, [[1, 2], [3, 4]], atol=1e-9)
    polys = W.polygon_rings(_rows(testgdb, "polygon")[0]["SHAPE"])
    assert np.allclose(
        polys[0][0], [[0, 0], [0, 1], [1, 1], [1, 0], [0, 0]], atol=1e-9
    )
    # MULTIPOLYGON (((0 0,0 1,1 1,1 0,0 0),(hole)),((2 0,2 1,3 1,3 0,2 0)))
    mps = W.polygon_rings(_rows(testgdb, "multipolygon")[0]["SHAPE"])
    assert len(mps) == 2
    assert len(mps[0]) == 2  # outer + hole
    assert np.allclose(
        mps[0][1][0], [0.25, 0.25], atol=1e-9
    )
    assert np.allclose(mps[1][0][0], [2, 0], atol=1e-9)
    assert _rows(testgdb, "null_polygon")[0]["SHAPE"] is None
    # 25D layers decode (XY carried; Z dropped by design in this engine)
    code, pt = W.parse(_rows(testgdb, "point25D")[0]["SHAPE"])
    assert code == 1 and np.allclose(pt, (1, 2), atol=1e-9)


def test_big_layer_values(testgdb):
    rows = _rows(testgdb, "big_layer")
    assert len(rows) == 341
    assert all(rows[i]["real"] == i % 4 for i in range(341))


def test_read_openfilegdb_spark(spark, testgdb):
    df = G.read_openfilegdb(spark, testgdb, layer="point")
    rows = df.orderBy("fid").collect()
    assert [r.fid for r in rows] == [1, 2, 3, 4, 5]
    assert all(r.str == "foo_é" for r in rows)
    code, pt = W.parse(bytes(rows[0].wkb))
    assert code == 1 and np.allclose(pt, (1, 2), atol=1e-9)


def test_write_read_roundtrip(spark, tmp_path):
    import pandas as pd

    ring = np.array([[0.0, 0.0], [0.0, 2.0], [2.0, 2.0], [2.0, 0.0], [0.0, 0.0]])
    pdf = pd.DataFrame(
        {
            "wkb": [W.write_polygon([ring]), W.write_point(1.5, -2.25), None],
            "name": ["a", "b", None],
            "val": [1.5, None, 3.25],
        }
    )
    d = str(tmp_path / "toy.gdb")
    G.write_openfilegdb(spark.createDataFrame(pdf), d, layer="toy")
    assert G.list_layers(d)[0]["name"] == "toy"
    back = G.read_openfilegdb(spark, d).orderBy("fid").collect()
    assert [r.name for r in back] == ["a", "b", None]
    assert back[1].val is None and back[2].val == 3.25
    code, pt = W.parse(bytes(back[1].wkb))
    assert code == 1 and np.allclose(pt, (1.5, -2.25), atol=1e-9)
    rings = W.polygon_rings(bytes(back[0].wkb))
    assert np.allclose(rings[0][0], ring, atol=1e-9)
    assert back[2].wkb is None
