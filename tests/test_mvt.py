"""MVT codec parity — autotest/ogr/ogr_mvt.py expectations on the
reference's own pbf fixtures, plus encoder round trips."""

import glob
import os

import numpy as np
import pytest

from gdal_spark.sources.mvt import (
    GEOM_LINESTRING,
    GEOM_POINT,
    GEOM_POLYGON,
    clip_line_to_box,
    decode_geometry,
    encode_mvt_tile,
    parse_mvt_tile,
    tile_geo,
)

MVT = "/root/reference/autotest/ogr/data/mvt"


def _tile(name):
    p = sorted(glob.glob(os.path.join(MVT, name, "**", "*.pbf"),
                         recursive=True))[0]
    z, x, y = p.split("/")[-3:]
    return parse_mvt_tile(open(p, "rb").read()), tile_geo(
        int(z), int(x), int(y[:-4])
    )


def _coords(wkt):
    import re

    return np.array(
        [float(v) for v in re.findall(r"-?\d+(?:\.\d+)?(?:[eE]-?\d+)?", wkt)]
    )


def _assert_wkt(got, expected, tol=1e-6):
    g, e = _coords(got), _coords(expected)
    assert got.split("(")[0].strip() == expected.split("(")[0].strip()
    assert len(g) == len(e)
    assert np.allclose(g, e, atol=tol)


class TestDecodeParity:
    def test_linestring(self):
        layers, geo = _tile("linestring")
        f = layers[0]["features"][0]
        _assert_wkt(
            decode_geometry(f["type"], f["geometry"], layers[0]["extent"],
                            geo=geo, force_multi=True),
            "MULTILINESTRING ((215246.671651058 6281289.23636264,"
            "332653.947097085 6447616.20991119))",
        )
        # METADATA_FILE= (native type, no promotion)
        _assert_wkt(
            decode_geometry(f["type"], f["geometry"], layers[0]["extent"],
                            geo=geo),
            "LINESTRING (215246.671651058 6281289.23636264,"
            "332653.947097085 6447616.20991119)",
        )

    def test_multilinestring(self):
        layers, geo = _tile("multilinestring")
        f = layers[0]["features"][0]
        _assert_wkt(
            decode_geometry(f["type"], f["geometry"], layers[0]["extent"],
                            geo=geo),
            "MULTILINESTRING ((215246.671651058 6281289.23636264,"
            "332653.947097085 6447616.20991119),(440277.282922614 "
            "6623727.12308023,547900.618748143 6809621.97586978),"
            "(665307.894194175 6985732.88903883,772931.230019704 "
            "7171627.74182838))",
        )

    def test_polygon(self):
        layers, geo = _tile("polygon")
        f = layers[0]["features"][0]
        _assert_wkt(
            decode_geometry(f["type"], f["geometry"], layers[0]["extent"],
                            geo=geo),
            "POLYGON ((332653.947097085 6447616.20991119,332653.947097085 "
            "6281289.23636264,215246.671651058 6281289.23636264,"
            "215246.671651058 6447616.20991119,332653.947097085 "
            "6447616.20991119))",
        )

    def test_mixed(self):
        layers, geo = _tile("mixed")
        fs = layers[0]["features"]
        _assert_wkt(
            decode_geometry(fs[0]["type"], fs[0]["geometry"],
                            layers[0]["extent"], geo=geo, force_multi=True),
            "MULTIPOINT ((215246.671651058 6281289.23636264),"
            "(332653.947097085 6447616.20991119))",
        )

    def test_point_polygon_multi_with_holes(self):
        """test_ogr_mvt_point_polygon: 3 polygons, first with a hole —
        winding-order ring assembly."""
        layers, geo = _tile("point_polygon/0")
        poly_lyr = [l for l in layers if l["name"] == "polygon2"][0]
        f = poly_lyr["features"][0]
        wkt = decode_geometry(f["type"], f["geometry"], poly_lyr["extent"],
                              geo=geo, force_multi=True)
        _assert_wkt(
            wkt,
            "MULTIPOLYGON (((440277.282922614 450061.222543117,"
            "440277.282922614 -440277.282922614,0.0 -440277.282922614,"
            "0.0 -215246.671651058,215246.671651058 -215246.671651058,"
            "215246.671651058 225030.61127156,0.0 225030.61127156,"
            "0.0 450061.222543117,440277.282922614 450061.222543117)),"
            "((0.0 117407.275446031,0.0 -107623.335825529,"
            "-117407.275446031 -107623.335825529,-117407.275446031 "
            "117407.275446031,0.0 117407.275446031)),"
            "((107623.335825529 58703.6377230138,107623.335825529 "
            "-48919.6981025115,48919.6981025115 -48919.6981025115,"
            "48919.6981025115 58703.6377230138,107623.335825529 "
            "58703.6377230138)))",
            tol=1e-5,
        )

    def test_datatypes(self):
        """test_ogr_mvt_datatypes field values."""
        layers, _ = _tile("datatypes")
        f = layers[0]["features"][0]
        expect = {
            "bool_false": False, "bool_true": True,
            "pos_int_value": 1, "pos_int64_value": 123456789012345,
            "neg_int_value": -1, "neg_int64_value": -123456789012345,
            "pos_sint_value": 1, "pos_sint64_value": 123456789012345,
            "neg_sint_value": -1, "neg_sint64_value": -123456789012345,
            "uint_value": 2000000000, "uint64_value": 4000000000,
            "float_value": 1.25, "real_value": 1.23456789,
            "string_value": "str",
        }
        for k, v in expect.items():
            assert f["fields"][k] == v, (k, f["fields"][k])

    def test_raw_tile_space(self):
        """Non-georeferenced GetXY flips y: (nX, extent - nY)."""
        layers, _ = _tile("linestring")
        f = layers[0]["features"][0]
        wkt = decode_geometry(f["type"], f["geometry"], layers[0]["extent"])
        xs = _coords(wkt)
        assert xs.min() >= 0 and xs.max() <= 4096


class TestEncoder:
    def test_roundtrip_all_types(self):
        feats = [
            dict(id=7, type=GEOM_POINT, parts=[np.array([[100, 200]])],
                 fields={"name": "a", "v": 3, "w": -2, "f": 1.5,
                         "b": True}),
            dict(type=GEOM_LINESTRING,
                 parts=[np.array([[0, 0], [10, 5]]),
                        np.array([[20, 20], [30, 25], [40, 20]])],
                 fields={"name": "b"}),
            dict(type=GEOM_POLYGON,
                 parts=[np.array([[0, 0], [0, 50], [60, 50], [60, 0],
                                  [0, 0]])],
                 fields={}),
        ]
        data = encode_mvt_tile(
            [dict(name="lyr", extent=4096, features=feats)]
        )
        layers = parse_mvt_tile(data)
        assert layers[0]["name"] == "lyr"
        assert layers[0]["extent"] == 4096 and layers[0]["version"] == 2
        out = layers[0]["features"]
        assert out[0]["id"] == 7
        assert out[0]["fields"] == {"name": "a", "v": 3, "w": -2, "f": 1.5,
                                    "b": True}
        assert decode_geometry(out[0]["type"], out[0]["geometry"]) == (
            "POINT (100 3896)"
        )
        ml = decode_geometry(out[1]["type"], out[1]["geometry"])
        assert ml == ("MULTILINESTRING ((0 4096,10 4091),"
                      "(20 4076,30 4071,40 4076))")
        pg = decode_geometry(out[2]["type"], out[2]["geometry"])
        assert pg.startswith("POLYGON ((0 4096,0 4046,60 4046,60 4096")

    def test_value_dedup(self):
        feats = [
            dict(type=GEOM_POINT, parts=[np.array([[i, i]])],
                 fields={"cls": "x"})
            for i in range(5)
        ]
        data = encode_mvt_tile([dict(name="l", features=feats)])
        lyr = parse_mvt_tile(data)[0]
        assert lyr["keys"] == ["cls"] and lyr["values"] == ["x"]


class TestDistributed:
    @pytest.fixture(scope="class")
    def spark(self):
        from gdal_spark.session import get_session

        s = get_session(master="local[4]")
        s.sparkContext.setLogLevel("FATAL")
        return s

    def test_write_read_tileset(self, spark, tmp_path_factory):
        from gdal_spark.sources.mvt import read_mvt_tileset, write_mvt_tiles

        root = str(tmp_path_factory.mktemp("mvt_sink"))
        pts = [
            dict(x=float(-MERC) + (i % 8) * MERC / 2.0,
                 y=float(MERC) - (i % 5) * MERC / 3.0 - 1.0,
                 name=f"p{i}")
            for i in range(40)
            for MERC in [20037508.342789244]
        ]
        df = spark.createDataFrame(pts)
        n = write_mvt_tiles(df, root, zoom=2, layer_name="pts")
        assert n > 1
        back = read_mvt_tileset(spark, root).toPandas()
        assert len(back) == 40
        assert set(back["layer"]) == {"pts"}
        assert (back["z"] == 2).all()
        assert back["wkt"].str.startswith("MULTIPOINT").all()


class TestPyramidWriter:
    @pytest.fixture(scope="class")
    def spark(self):
        from gdal_spark.session import get_session

        s = get_session(master="local[4]")
        s.sparkContext.setLogLevel("FATAL")
        return s

    def test_clip_line_to_box(self):
        # crosses the box twice -> two parts
        line = np.array([[-10, 5], [5, 5], [5, 20], [8, 20], [8, 5],
                         [30, 5]], dtype=float)
        parts = clip_line_to_box(line, 0, 0, 10, 10)
        assert len(parts) == 2
        assert np.allclose(parts[0][0], [0, 5])
        assert np.allclose(parts[0][-1], [5, 10])
        assert np.allclose(parts[1][0], [8, 10])
        assert np.allclose(parts[1][-1], [10, 5])
        # fully inside
        parts = clip_line_to_box(np.array([[1, 1], [2, 2.0]]), 0, 0, 10, 10)
        assert len(parts) == 1 and len(parts[0]) == 2
        # fully outside
        assert clip_line_to_box(
            np.array([[20, 20], [30, 30.0]]), 0, 0, 10, 10) == []

    def test_pyramid_polygons_lines(self, spark, tmp_path_factory):
        """Polygon + line features across two zooms: decoded tiles
        reassemble the clipped geometry within quantization error."""
        from gdal_spark.functions.wkb import (
            write_linestring,
            write_polygon,
        )
        from gdal_spark.sources.mvt import (
            read_mvt_tileset,
            write_mvt_pyramid,
        )

        M = MERC_MAX = 20037508.342789244
        # a polygon spanning tile boundaries at z1, and a long line
        ring = np.array(
            [[-M / 2, -M / 2], [M / 2, -M / 2], [M / 2, M / 2],
             [-M / 2, M / 2], [-M / 2, -M / 2]]
        )
        line = np.array([[-M * 0.8, 0], [M * 0.8, M * 0.3]])
        df = spark.createDataFrame(
            [
                dict(wkb=bytearray(write_polygon([ring])), name="poly"),
                dict(wkb=bytearray(write_linestring(line)), name="line"),
            ]
        )
        root = str(tmp_path_factory.mktemp("mvt_pyr"))
        n = write_mvt_pyramid(df, root, 0, 1, layer_name="lyr",
                              buffer_px=0)
        assert n >= 5  # z0 tile + 4 z1 tiles
        back = read_mvt_tileset(spark, root).toPandas()
        z0 = back[back["z"] == 0]
        # at z0 both features land in the single tile
        assert set(z0["wkt"].str.split(" ").str[0]) == {
            "MULTIPOLYGON", "MULTILINESTRING",
        }
        # polygon area at z0 within quantization error of M^2
        from gdal_spark.functions.geomops import wkt_area

        a = wkt_area(z0[z0["wkt"].str.startswith("MULTIPOLYGON")]
                     ["wkt"].iloc[0])
        assert abs(a - M * M) / (M * M) < 1e-3
        # at z1 the polygon covers all four tiles, each tile clipped to
        # its quadrant: total area ~= M^2 (buffer 0 -> no overlap)
        z1 = back[(back["z"] == 1)
                  & back["wkt"].str.startswith("MULTIPOLYGON")]
        assert len(z1) == 4
        total = sum(wkt_area(w) for w in z1["wkt"])
        assert abs(total - M * M) / (M * M) < 1e-3
