"""JSON-FG driver vs the reference autotest (autotest/ogr/ogr_jsonfg.py)."""

import json
import os

import pytest

from gdal_spark.sources.jsonfg import (
    jsonfg_layers, parse_coord_ref_sys,
)

D = "/root/reference/autotest/ogr/data/jsonfg"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference autotest data missing"
)


def test_jsonfg_feature_type_top_level():
    layers = jsonfg_layers(
        open(os.path.join(D, "feature_type_top_level.json"), "rb").read())
    assert "type1" in layers


def test_jsonfg_two_feature_types():
    layers = jsonfg_layers(
        open(os.path.join(D, "two_feature_types.json"), "rb").read())
    assert len(layers) == 2
    t1 = layers["type1"]["features"]
    assert len(t1) == 2
    assert t1[0]["wkt"] == "POINT (2 49)"
    assert str(t1[0]["foo"]) == "1"
    assert t1[1]["foo"] == "bar"
    t2 = layers["type2"]["features"]
    assert len(t2) == 1
    assert t2[0]["wkt"] == "LINESTRING Z (2 49 1,3 50 2)"
    assert t2[0]["bar"] == "baz"


@pytest.mark.parametrize(
    "value,expected",
    [
        ("[EPSG:4326]", "EPSG:4326"),
        ("http://www.opengis.net/def/crs/EPSG/0/4326", "EPSG:4326"),
        ({"type": "Reference", "href": "[EPSG:32631]"}, "EPSG:32631"),
        ({"type": "Reference", "href": "[EPSG:4326]", "epoch": 2023.1},
         "EPSG:4326"),
        (["[EPSG:4326]"], "EPSG:4326"),
    ],
)
def test_jsonfg_coordrefsys_valid(value, expected):
    assert parse_coord_ref_sys(value) == expected


@pytest.mark.parametrize(
    "value",
    [None, 12, "", "[", "[]", "[EPSG]", "[EPSG:]", "[EPSG:0]",
     "http://www.opengis.net/def/crs/EPSG/0/0", {}, {"type": None},
     {"type": 12}, {"type": "invalid"}, {"type": "Reference"},
     {"type": "Reference", "href": None},
     {"type": "Reference", "href": 12},
     {"type": "Reference", "href": "[EPSG:]"},
     {"type": "Reference", "href": "[EPSG:4326]", "epoch": "invalid"},
     [], ["[EPSG:4326]", "invalid"], ["invalid", "[EPSG:4326]"]],
)
def test_jsonfg_coordrefsys_invalid(value):
    assert parse_coord_ref_sys(value) is None


@pytest.mark.parametrize(
    "time_value,expected",
    [
        (None, {}),
        ({"date": "2023-06-05"}, {"time": "2023/06/05"}),
        ({"timestamp": "2023-06-05T12:34:56Z"},
         {"time": "2023/06/05 12:34:56+00"}),
        ({"interval": ["2023-06-05", "2023-06-06"]},
         {"time_start": "2023/06/05", "time_end": "2023/06/06"}),
        ({"interval": ["2023-06-05", ".."]},
         {"time_start": "2023/06/05", "time_end": None}),
        ({"interval": ["..", "2023-06-06"]},
         {"time_start": None, "time_end": "2023/06/06"}),
        ({"interval": ["2023-06-05T12:34:56Z", "2023-06-06T12:34:56Z"]},
         {"time_start": "2023/06/05 12:34:56+00",
          "time_end": "2023/06/06 12:34:56+00"}),
    ],
)
def test_jsonfg_time(time_value, expected):
    doc = {
        "type": "FeatureCollection",
        "conformsTo": ["[ogc-json-fg-1-0.1:core]"],
        "features": [{"type": "Feature", "properties": {},
                      "geometry": None, "time": time_value}],
    }
    layers = jsonfg_layers(json.dumps(doc))
    f = layers["features"]["features"][0]
    got = {k: f.get(k) for k in ("time", "time_start", "time_end")
           if k in f}
    assert got == expected


def test_jsonfg_place_precedence():
    doc = {
        "type": "Feature",
        "conformsTo": ["[ogc-json-fg-1-0.1:core]"],
        "coordRefSys": "[EPSG:32631]",
        "geometry": {"type": "Point", "coordinates": [3, 49]},
        "place": {"type": "Point", "coordinates": [500000, 5400000]},
        "properties": {},
    }
    layers = jsonfg_layers(json.dumps(doc))
    f = layers["features"]["features"][0]
    assert f["wkt"] == "POINT (500000 5400000)"
    assert f["from_place"]
    assert layers["features"]["crs"] == "EPSG:32631"
