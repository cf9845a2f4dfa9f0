"""OGRGeometry method parity (autotest/ogr/ogr_geom.py): area incl.
holes / GeometryCollection / big-offset LinearRing / Triangle,
Boundary for every geometry class, LineString Value(), closeRings
idempotence, and Segmentize goldens incl. issue #1341 symmetry."""

import numpy as np
import pytest

from gdal_spark.functions.geomops import (
    close_rings,
    parse_wkt_any,
    wkt_area,
    wkt_boundary,
    wkt_length,
    wkt_value,
)
from gdal_spark.functions.simplify import segmentize_line


def test_geom_area():
    wkt = (
        "MULTIPOLYGON( ((0 0,1 1,1 0,0 0)),"
        "((0 0,10 0, 10 10, 0 10),(1 1,1 2,2 2,2 1)) )"
    )
    assert wkt_area(wkt) == pytest.approx(99.5, abs=1e-11)


def test_geom_area_linearring_and_big_offset():
    assert wkt_area("LINEARRING (0 0,10 0,10 10,0 10,0 0)") == pytest.approx(
        100.0, abs=1e-11
    )
    B = 1.0e11
    ring = (
        f"LINEARRING ({B} {B},{B + 10} {B},{B + 10} {B + 10},"
        f"{B} {B + 10},{B} {B})"
    )
    assert wkt_area(ring) == pytest.approx(100.0, abs=1e-11)


def test_geom_area_geometrycollection_and_triangle():
    gc = (
        "GEOMETRYCOLLECTION( POLYGON((0 0,1 1,1 0,0 0)),"
        " MULTIPOLYGON(((0 0,1 1,1 0,0 0))), LINESTRING(0 0,1 1),"
        " POINT(0 0), GEOMETRYCOLLECTION EMPTY )"
    )
    assert wkt_area(gc) == pytest.approx(1.0, abs=1e-11)
    tri = wkt_area("TRIANGLE((0 0,100 0,0 100,0 0))")
    assert tri != pytest.approx(4999.5, abs=1e-11)
    assert tri == pytest.approx(5000.0, abs=1e-11)


def test_geom_boundary():
    assert wkt_boundary("POINT(1 1)") == "GEOMETRYCOLLECTION EMPTY"
    assert wkt_boundary("MULTIPOINT((0 0),(1 1))") == "GEOMETRYCOLLECTION EMPTY"
    b = wkt_boundary("LINESTRING(0 0, 1 1, 2 2, 3 2, 4 2)")
    assert b.startswith("MULTIPOINT") and b.count("(") - 1 == 2
    assert wkt_boundary("LINESTRING(0 0, 1 0, 1 1, 0 1, 0 0)") == "MULTIPOINT EMPTY"
    assert wkt_boundary("POLYGON((0 0,1 1,1 0,0 0))").startswith("LINESTRING")
    two = wkt_boundary("POLYGON((0 0,9 0,9 9,0 9,0 0),(1 1,1 2,2 2,1 1))")
    assert two.startswith("MULTILINESTRING") and two.count("(") - 1 == 2


def test_geom_value():
    wkt = "LINESTRING(2 3,5 3,5 0)"
    L = wkt_length(wkt)
    assert L == pytest.approx(6.0)
    assert wkt_value(wkt, -1e-3) == pytest.approx((2, 3))
    assert wkt_value(wkt, L / 4) == pytest.approx((3.5, 3))
    assert wkt_value(wkt, L / 2) == pytest.approx((5, 3))
    assert wkt_value(wkt, 3 * L / 4) == pytest.approx((5, 1.5))
    assert wkt_value(wkt, L + 1e-3) == pytest.approx((5, 0))


def test_geom_closerings_idempotent():
    once = close_rings("POLYGON((0 0,0 1,1 1,1 0))")
    assert once == "POLYGON ((0 0,0 1,1 1,1 0,0 0))"
    assert close_rings(once) == once


def test_geom_segmentize_goldens():
    pts = segmentize_line(np.array([[0.0, 0.0], [0.0, 10.0]]), 1.00001)
    assert np.allclose(pts, [[0, i] for i in range(11)])
    # below-threshold spacing is a no-op
    pts2 = segmentize_line(np.array([[0.0, 0.0], [0.0, 1.0]]), 10000)
    assert np.array_equal(pts2, [[0, 0], [0, 1]])
    # issue #1341: repeated segmentize is stable
    a = segmentize_line(np.array([[0.0, 0.0], [10.0, 0.0]]), 0.399999999999)
    assert len(a) == 26
    b = segmentize_line(a, 0.399999999999)
    assert np.allclose(a, b) and len(b) == 26
    # symmetry: forward and reversed inputs give mirrored points
    g1 = segmentize_line(np.array([[0.0, 0.0], [1.2, 1.0], [2.0, 0.0]]), 0.25)
    g2 = segmentize_line(np.array([[2.0, 0.0], [1.2, 1.0], [0.0, 0.0]]), 0.25)
    assert np.allclose(g1, g2[::-1])


def test_parse_wkt_collection_nested():
    kind, members = parse_wkt_any(
        "GEOMETRYCOLLECTION(POINT(1 2), GEOMETRYCOLLECTION EMPTY,"
        " MULTILINESTRING((0 0,1 1),(2 2,3 3)))"
    )
    assert kind == "GEOMETRYCOLLECTION" and len(members) == 3
    assert members[0] == ("POINT", (1.0, 2.0))
    assert members[1][1] is None
    assert members[2][0] == "MULTILINESTRING" and len(members[2][1]) == 2


def test_wrapdateline_goldens():
    from gdal_spark.functions.geomops import wrapdateline

    # ogr_geomtransfomer_wrapdateline_no_ct
    assert (
        wrapdateline("LINESTRING(-179 0,179 0)")
        == "MULTILINESTRING ((-179 0,-180 0),(180 0,179 0))"
    )
    # ogr_geomtransfomer_wrapdateline_multipoint
    assert (
        wrapdateline("MULTIPOINT((-179 0),(179 0),(-182 0),(182 0))")
        == "MULTIPOINT ((-179 0),(179 0),(178 0),(-178 0))"
    )
    # ogr_geomtransfomer_wrapdateline_geometrycollection
    assert (
        wrapdateline("GEOMETRYCOLLECTION(POINT(-182 0),LINESTRING(-179 0,179 0))")
        == "GEOMETRYCOLLECTION (POINT (178 0),"
        "LINESTRING (-179 0,-180 0),LINESTRING (180 0,179 0))"
    )
    # a line that does not cross stays a LINESTRING
    assert wrapdateline("LINESTRING(10 0,20 5)") == "LINESTRING (10 0,20 5)"
    # crossing the other way
    assert (
        wrapdateline("LINESTRING(179 0,-179 0)")
        == "MULTILINESTRING ((179 0,180 0),(-180 0,-179 0))"
    )


def test_wrapdateline_polygon_split():
    from gdal_spark.functions.geomops import parse_wkt_any, wrapdateline, wkt_area

    out = wrapdateline(
        "POLYGON((170 0,-170 0,-170 10,170 10,170 0))"
    )
    kind, polys = parse_wkt_any(out)
    assert kind == "MULTIPOLYGON" and len(polys) == 2
    lons = np.concatenate([r[:, 0] for p in polys for r in p])
    assert lons.min() >= -180.0 and lons.max() <= 180.0
    # total area preserved: 20 deg x 10 deg
    assert wkt_area((kind, polys)) == pytest.approx(200.0, abs=1e-9)
    # non-crossing polygon unchanged
    same = wrapdateline("POLYGON((10 0,20 0,20 10,10 10,10 0))")
    assert same.startswith("POLYGON")
