"""GTFS driver vs the reference autotest (autotest/ogr/ogr_gtfs.py)."""

import os

import pytest

from gdal_spark.sources.gtfs import gtfs_layers

P = "/root/reference/autotest/ogr/data/gtfs/gtfs_extract.zip"

pytestmark = pytest.mark.skipif(
    not os.path.exists(P), reason="reference autotest data missing"
)


def test_gtfs_open_and_content():
    layers = gtfs_layers(open(P, "rb").read())
    assert len(layers) == 9

    agency = layers["agency"]
    assert len(agency) == 1
    assert agency[0]["agency_name"] == "SOLEA"

    cal = layers["calendar"]
    assert len(cal) == 1
    assert cal[0]["start_date"] == "2023/01/02"

    assert sum(1 for r in layers["routes"]
               if r.get("route_type") == 3) == 30

    s0 = layers["stops"][0]
    assert s0["arrival_time"] == "05:37:00"
    assert s0["wkt"] == "POINT (7.280823 47.763704)"

    t0 = layers["trips"][0]
    assert t0["wkt"].startswith(
        "LINESTRING (7.280823 47.763704,7.278051 47.762217,"
        "7.278683 47.760148")

    sg = layers["shapes_geom"]
    assert len(sg) == 1
    assert sg[0]["shape_id"] == "80013"
    assert sg[0]["wkt"].startswith(
        "LINESTRING (7.28084 47.763684,7.28073 47.76364")
