"""MapML driver vs the reference autotest (autotest/ogr/ogr_mapml.py)."""

import os

import pytest

from gdal_spark.sources.mapml import mapml_read, mapml_write

P = "/root/reference/autotest/ogr/data/mapml/poly.mapml"

pytestmark = pytest.mark.skipif(
    not os.path.exists(P), reason="reference autotest data missing"
)


def test_mapml_read_poly():
    layers = mapml_read(open(P, "rb").read())
    feats = layers["poly"]
    assert len(feats) == 10
    f = feats[0]
    assert f["fid"] == 1
    assert f["AREA"] == "215229.266"
    assert f["EAS_ID"] == "168"
    assert f["PRFEDEA"] == "35043411"
    assert f["wkt"].startswith(
        "POLYGON ((2.75225922 43.03904529,2.75274742 43.03985229")


@pytest.mark.parametrize("wkt", [
    "POINT (1 2)",
    "LINESTRING (1 2,3 4)",
    "POLYGON ((0 0,0 1,1 0,0 0),(0.1 0.1,0.1 0.7,0.7 0.1,0.1 0.1))",
    "MULTIPOINT (0 1,2 3)",
    "MULTILINESTRING ((1 2,3 4),(5 6,7 8))",
    "MULTIPOLYGON (((0 0,0 1,1 0,0 0)),((10 0,10 1,11 0,10 0)))",
    "GEOMETRYCOLLECTION (POINT (1 2),GEOMETRYCOLLECTION (POINT (3 4)))",
])
def test_mapml_write_read_roundtrip(wkt):
    doc = mapml_write({"test": [{"fid": 10, "intfield": 1, "wkt": wkt}]})
    back = mapml_read(doc)["test"][0]
    assert back["wkt"] == wkt
    assert back["fid"] == 10
    assert back["intfield"] == "1"
