"""TopoJSON + ESRIJSON vs the reference autotest
(autotest/ogr/ogr_topojson.py, ogr_esrijson.py)."""

import os

import pytest

from gdal_spark.sources.jsonfmts import (
    esrijson_features, esrijson_geom_wkt, topojson_layers,
)

TD = "/root/reference/autotest/ogr/data/topojson"
ED = "/root/reference/autotest/ogr/data/esrijson"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(TD), reason="reference autotest data not present"
)


def _read(path):
    with open(path, "rb") as fh:
        return fh.read()


# exact transcription of test_ogr_topojson_objects_is_array expectations
EXPECTED_TOPOJSON1 = [
    ("foo", None, "POINT EMPTY"),
    (None, None, "POINT EMPTY"),
    (None, None, "POINT EMPTY"),
    (None, None, "POINT (100 1010)"),
    (None, None, "LINESTRING EMPTY"),
    (None, None, "LINESTRING EMPTY"),
    (None, None, "LINESTRING EMPTY"),
    (None, None, "LINESTRING EMPTY"),
    (None, None, "LINESTRING EMPTY"),
    (None, None, "LINESTRING EMPTY"),
    (None, None, "LINESTRING EMPTY"),
    (None, None, "LINESTRING EMPTY"),
    (None, "0", "LINESTRING EMPTY"),
    (None, "foo", "LINESTRING EMPTY"),
    ("1", None, "LINESTRING (100 1000,110 1000,110 1100)"),
    ("2", None, "LINESTRING (110 1100,110 1000,100 1000)"),
    (None, None, "POLYGON EMPTY"),
    (None, None, "POLYGON EMPTY"),
    (None, None, "POLYGON EMPTY"),
    (None, None,
     "POLYGON ((100 1000,110 1000,110 1100,100 1100,100 1000),"
     "(101 1010,101 1090,109 1090,109 1010,101 1010))"),
    (None, None,
     "POLYGON ((110 1100,110 1000,100 1000,100 1100,110 1100),"
     "(101 1010,109 1010,109 1090,101 1090,101 1010))"),
    (None, None, "MULTIPOINT EMPTY"),
    (None, None, "MULTIPOINT EMPTY"),
    (None, None, "MULTIPOINT EMPTY"),
    (None, None, "MULTIPOINT EMPTY"),
    (None, None, "MULTIPOINT (100 1010,101 1020)"),
    (None, None, "MULTIPOLYGON EMPTY"),
    (None, None, "MULTIPOLYGON EMPTY"),
    (None, None, "MULTIPOLYGON EMPTY"),
    (None, None,
     "MULTIPOLYGON (((110 1100,110 1000,100 1000,100 1100,110 1100)),"
     "((101 1010,109 1010,109 1090,101 1090,101 1010)))"),
    (None, None, "MULTILINESTRING EMPTY"),
    (None, None, "MULTILINESTRING EMPTY"),
    (None, None, "MULTILINESTRING ((100 1000,110 1000,110 1100))"),
    (None, None,
     "MULTILINESTRING ((100 1000,110 1000,110 1100,100 1100,100 1000))"),
    (None, None,
     "MULTILINESTRING ((100 1000,110 1000,110 1100,100 1100,100 1000),"
     "(101 1010,101 1090,109 1090,109 1010,101 1010))"),
]


def test_topojson_objects_is_array():
    layers = topojson_layers(_read(os.path.join(TD, "topojson1.topojson")))
    assert list(layers) == ["a_layer", "TopoJSON"]
    a = layers["a_layer"]
    assert len(a) == 1
    assert a[0]["wkt"] == "LINESTRING (100 1000,110 1000,110 1100)"

    feats = layers["TopoJSON"]
    assert len(feats) == len(EXPECTED_TOPOJSON1)
    for i, (eid, ename, ewkt) in enumerate(EXPECTED_TOPOJSON1):
        f = feats[i]
        assert f.get("id") == eid, (i, f)
        assert f.get("name") == ename, (i, f)
        assert f["wkt"] == ewkt, (i, f)


def test_topojson_objects_is_dict():
    layers = topojson_layers(_read(os.path.join(TD, "topojson2.topojson")))
    assert list(layers) == ["a_layer", "TopoJSON"]
    f = layers["a_layer"][0]
    assert f["id"] == "foo" and f["name"] == "line"
    assert f["wkt"] == "LINESTRING (100 1000,110 1000,110 1100)"
    f2 = layers["TopoJSON"][0]
    assert f2["wkt"] == "LINESTRING (100 1000,110 1000,110 1100)"
    assert f2["id"] == "1"


def test_topojson_no_transform():
    layers = topojson_layers(_read(os.path.join(TD, "topojson3.topojson")))
    want = "LINESTRING (0 0,10 0,0 10,10 0,0 0)"
    assert layers["a_layer"][0]["wkt"] == want
    assert layers["TopoJSON"][0]["wkt"] == want


def test_esrijson_point_fields():
    feats, info = esrijson_features(_read(os.path.join(ED, "esripoint.json")))
    assert info["wkid"] == 4326
    assert info["aliases"]["objectid"] == "Object ID"
    f = feats[0]
    assert f["wkt"] == "POINT (2 49)"
    assert f["objectid"] == 1
    assert f["fooSmallInt"] == 2
    assert f["fooInt"] == 1234567890
    assert f["fooSingle"] == 1.5
    assert f["fooDouble"] == 3.4
    assert f["fooString"] == "56"
    assert f["fooDate"] == "2021/12/31 00:00:00+00"
    assert f["fooDateOnly"] == "2025/09/20"
    assert f["fooTimeOnly"] == "12:34:56"
    assert f["fooBigInteger"] == 1234567890123456
    assert f["fooGlobalID"] == "{FD04C39C-69C6-4DCC-88D6-7E3E673DD0CB}"


def test_esrijson_linestring():
    feats, _ = esrijson_features(
        _read(os.path.join(ED, "esrilinestring.json")))
    assert feats[0]["wkt"].startswith("LINESTRING (2 49")


def test_esrijson_polygon_hole_grouping():
    feats, _ = esrijson_features(_read(os.path.join(ED, "esripolygon.json")))
    assert feats[0]["wkt"] == (
        "MULTIPOLYGON (((2 49,2 50,3 50,3 49,2 49),"
        "(2.1 49.1,2.1 49.9,2.9 49.9,2.9 49.1,2.1 49.1)),"
        "((-2 49,-2 50,-3 50,-3 49,-2 49)))")
    feats, _ = esrijson_features(
        _read(os.path.join(ED, "esripolygonempty.json")))
    assert feats[0]["wkt"] == "POLYGON EMPTY"


def test_esrijson_multipoint():
    feats, _ = esrijson_features(_read(os.path.join(ED, "esrimultipoint.json")))
    assert feats[0]["wkt"] == "MULTIPOINT (2 49,3 50)"


def test_esrijson_z_variants():
    feats, _ = esrijson_features(_read(os.path.join(ED, "esrizpoint.json")))
    assert feats[0]["wkt"] == "POINT (2 49 1)"
    feats, _ = esrijson_features(
        _read(os.path.join(ED, "esrizlinestring.json")))
    assert feats[0]["wkt"] == "LINESTRING (2 49 1,3 50 2)"
    feats, _ = esrijson_features(
        _read(os.path.join(ED, "esrizmultipoint.json")))
    assert feats[0]["wkt"] == "MULTIPOINT (2 49 1,3 50 2)"


def test_esrijson_zm_m_variants():
    feats, _ = esrijson_features(
        _read(os.path.join(ED, "esrizmmultipoint.json")))
    assert feats[0]["wkt"] == "MULTIPOINT ZM ((2 49 1 100),(3 50 2 100))"
    # hasM without hasZ: the third value is the measure
    feats, _ = esrijson_features(
        _read(os.path.join(ED, "esrihasmnozmultipoint.json")))
    assert feats[0]["wkt"] == "MULTIPOINT M ((2 49 1),(3 50 2))"


def test_esrijson_hasz_without_z():
    # esriinvalidhaszmultipoint: hasZ declared but points are 2D -> 2D
    feats, _ = esrijson_features(
        _read(os.path.join(ED, "esriinvalidhaszmultipoint.json")))
    assert feats[0]["wkt"] == "MULTIPOINT (2 49,3 50)"


def test_esrijson_starting_with_features_geometry():
    feats, _ = esrijson_features(_read(os.path.join(
        ED, "esrijsonstartingwithfeaturesgeometry.json")))
    assert len(feats) == 1


def test_esrijson_geom_from_json():
    assert esrijson_geom_wkt({"x": 2, "y": 49}) == "POINT (2 49)"
