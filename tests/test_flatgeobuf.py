"""FlatGeobuf reader parity — autotest/ogr/ogr_flatgeobuf.py
expectations on the reference's own .fgb fixtures (poly.fgb,
poly_no_index.fgb, testdatatypes.fgb, alldatatypes.fgb), packed
Hilbert R-tree search included."""

import json

import pytest

from gdal_spark.sources.flatgeobuf import (
    iter_features,
    packed_rtree_search,
    parse_header,
    read_flatgeobuf,
)

FGB = "/root/reference/autotest/ogr/data/testfgb"


def _load(name):
    data = open(f"{FGB}/{name}", "rb").read()
    return data, parse_header(data)


class TestHeaderIndex:
    def test_poly_header(self):
        _, h = _load("poly.fgb")
        assert h["name"] == "poly"
        assert h["envelope"] == [478315.53125, 4762880.5,
                                 481645.3125, 4765610.5]
        assert h["features_count"] == 10
        assert h["geometry_type"] == 3
        assert [c[0] for c in h["columns"]] == ["AREA", "EAS_ID", "PRFEDEA"]

    def test_rtree_bbox_counts(self):
        """test_ogr_flatgeobuf_2 spatial filter counts (envelope
        intersection = the no-GEOS path: 10 / 0 / 5)."""
        data, h = _load("poly.fgb")
        full = packed_rtree_search(
            data, h, 478315.53125, 4762880.5, 481645.3125, 4765610.5)
        assert len(full) == 10
        off = packed_rtree_search(
            data, h, 878315.53125, 4762880.5, 881645.3125, 4765610.5)
        assert off == []
        part = packed_rtree_search(
            data, h, 479586.0, 4764618.6, 479808.2, 4764797.8)
        assert len(part) == 5

    def test_no_index_file(self):
        data, h = _load("poly_no_index.fgb")
        assert h["index_node_size"] == 0 or h["features_offset"] == h[
            "index_offset"]
        feats = list(iter_features(data, h))
        assert len(feats) == 10


class TestFeatures:
    def test_poly_values(self):
        data, h = _load("poly.fgb")
        feats = list(iter_features(data, h))
        assert len(feats) == 10
        _, wkt, fields = feats[0]
        assert wkt.startswith("POLYGON ((480701.0625 4764738,")
        assert fields == {"AREA": 1634833.375, "EAS_ID": 158,
                          "PRFEDEA": "35043369"}
        # the fixture is Hilbert-reordered; its EAS_ID multiset matches
        # the engine's read_shapefile of the canonical poly.shp
        assert [f[2]["EAS_ID"] for f in feats] == [
            158, 168, 166, 165, 170, 169, 171, 179, 172, 173,
        ]
        assert sorted(round(f[2]["AREA"], 3) for f in feats) == [
            5268.813, 15775.758, 101429.977, 215229.266, 247328.172,
            261752.781, 268597.625, 547597.188, 596610.313, 1634833.375,
        ]

    def test_datatypes(self):
        data, h = _load("testdatatypes.fgb")
        _, _, f = next(iter_features(data, h))
        assert f["int"] == 1
        assert f["int64"] == 1234567890123
        assert f["double"] == 1.25
        assert f["string"] == "my string"
        assert f["datetime"] == "2019-10-15T12:34:56.789Z"

    def test_alldatatypes(self):
        data, h = _load("alldatatypes.fgb")
        _, _, f = next(iter_features(data, h))
        assert f["byte"] == -1 and f["ubyte"] == 255
        assert f["bool"] is True
        assert f["short"] == -1 and f["ushort"] == 65535
        assert f["int"] == -1 and f["uint"] == 4294967295
        assert f["long"] == -1 and f["ulong"] == 2**64 - 1
        assert f["float"] == 0 and f["double"] == 0
        assert f["string"] == "X" and f["json"] == "X"
        assert f["binary"] == b"\x58"


class TestDistributed:
    @pytest.fixture(scope="class")
    def spark(self):
        from gdal_spark.session import get_session

        s = get_session(master="local[4]")
        s.sparkContext.setLogLevel("FATAL")
        return s

    def test_full_scan(self, spark):
        df = read_flatgeobuf(spark, f"{FGB}/poly.fgb").toPandas()
        assert len(df) == 10
        assert sorted(json.loads(r)["EAS_ID"] for r in df["fields"]) == [
            158, 165, 166, 168, 169, 170, 171, 172, 173, 179,
        ]

    def test_bbox_pruned_scan(self, spark):
        df = read_flatgeobuf(
            spark, f"{FGB}/poly.fgb",
            bbox=(479586.0, 4764618.6, 479808.2, 4764797.8),
        ).toPandas()
        assert len(df) == 5


class TestWriter:
    def test_roundtrip_types_and_geoms(self, tmp_path):
        from gdal_spark.sources.flatgeobuf import (
            COL_BOOL,
            COL_DOUBLE,
            COL_INT,
            COL_LONG,
            COL_STRING,
            iter_features,
            write_flatgeobuf,
        )

        cols = [("k", COL_LONG), ("v", COL_DOUBLE), ("s", COL_STRING),
                ("i", COL_INT), ("b", COL_BOOL)]
        feats = [
            dict(gtype=1, xy=[1.5, 2.5], ends=None,
                 fields={"k": 7, "v": 1.25, "s": "hi", "i": -5, "b": True}),
            dict(gtype=2, xy=[0, 0, 10, 5, 20, 0], ends=None,
                 fields={"k": -3, "s": "ln"}),
            dict(gtype=3, xy=[0, 0, 4, 0, 4, 3, 0, 0, 1, 1, 2, 1, 2, 2,
                              1, 1], ends=[4, 8], fields={}),
        ]
        p = str(tmp_path / "w.fgb")
        write_flatgeobuf(p, "w", cols, feats, envelope=[0, 0, 20, 5])
        data = open(p, "rb").read()
        from gdal_spark.sources.flatgeobuf import parse_header

        h = parse_header(data)
        assert h["features_count"] == 3 and h["name"] == "w"
        out = list(iter_features(data, h))
        assert out[0][1] == "POINT (1.5 2.5)"
        assert out[0][2] == {"k": 7, "v": 1.25, "s": "hi", "i": -5,
                             "b": True}
        assert out[1][1] == "LINESTRING (0 0,10 5,20 0)"
        assert out[1][2] == {"k": -3, "s": "ln"}
        # two rings -> polygon with hole
        assert out[2][1] == (
            "POLYGON ((0 0,4 0,4 3,0 0),(1 1,2 1,2 2,1 1))"
        )
