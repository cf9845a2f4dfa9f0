"""Idrisi vector reader vs the reference autotest
(autotest/ogr/ogr_idrisi.py)."""

import os

import pytest

from gdal_spark.sources.idrisi_vector import idrisi_vector_open

D = "/root/reference/autotest/ogr/data/idrisi"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference autotest data missing"
)


def test_points():
    lyr = idrisi_vector_open(os.path.join(D, "points.vct"))
    assert lyr.geom_type == "POINT"
    assert lyr.n_features == 2
    assert lyr.ref_system == "utm-31n"
    assert lyr.extent == (400000.0, 600000.0, 4000000.0, 5000000.0)
    assert lyr.wkt(0) == "POINT (400000 5000000)"
    assert lyr.wkt(1) == "POINT (600000 4000000)"
    # AVL/ADC attribute join with typed fields
    assert [f[0] for f in lyr.fields] == \
        ["id", "IntegerField", "RealField", "StringField"]
    r = lyr.field_record(0)
    assert r["id"] == 1.0 and r["IntegerField"] == 2
    assert r["RealField"] == 3.45 and r["StringField"] == "foo"
    r = lyr.field_record(1)
    assert r["id"] == 2.0 and r["StringField"] == "bar"
    # spatial filter (SetSpatialFilterRect)
    assert lyr.spatial_filter(600000 - 1, 4000000 - 1,
                              600000 + 1, 4000000 + 1) == [1]
    assert lyr.spatial_filter(0, 0, 1, 1) == []


def test_lines():
    lyr = idrisi_vector_open(os.path.join(D, "lines.vct"))
    assert lyr.geom_type == "LINESTRING"
    assert lyr.n_features == 2
    assert lyr.extent == (400000.0, 600000.0, 4000000.0, 5000000.0)
    assert lyr.wkt(0) == "LINESTRING (400000 5000000,600000 4500000)"
    assert lyr.wkt(1) == "LINESTRING (450000 4000000,550000 4500000)"
    assert lyr.field_record(0)["id"] == 10.0
    assert lyr.field_record(1)["id"] == 20.0
    assert lyr.spatial_filter(0, 0, 1, 1) == []


def test_polygons():
    """Single-part polygons still carry the node-count array (the
    reference reads and validates it == nTotalNodes)."""
    lyr = idrisi_vector_open(os.path.join(D, "polygons.vct"))
    assert lyr.geom_type == "POLYGON"
    assert lyr.n_features == 2
    assert lyr.wkt(0) == (
        "POLYGON ((400000 4000000,400000 5000000,600000 5000000,"
        "600000 4000000,400000 4000000),(450000 4250000,450000 4750000,"
        "550000 4750000,550000 4250000,450000 4250000))"
    )
    assert lyr.wkt(1) == (
        "POLYGON ((400000 4000000,400000 5000000,600000 5000000,"
        "600000 4000000,400000 4000000))"
    )
    assert lyr.spatial_filter(0, 0, 1, 1) == []
