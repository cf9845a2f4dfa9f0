"""buffer_wkb (OGRGeometry::Buffer / GEOS Buffer, quadsegs convention)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from gdal_spark.functions import buffer as B
from gdal_spark.functions import geom as G
from gdal_spark.functions import wkb as W

Q = 8
CIRCLE = lambda d: (d * d / 2.0) * 32 * math.sin(math.pi / 16)  # noqa: E731


def _sq(x0, y0, s):
    return np.array(
        [(x0, y0), (x0 + s, y0), (x0 + s, y0 + s), (x0, y0 + s), (x0, y0)],
        dtype=np.float64,
    )


def test_square_dilate_closed_form():
    out = B.buffer_wkb(W.write_polygon([_sq(0, 0, 10)]), 2.0, Q)
    assert abs(G.wkb_area(out) - (100 + 80 + CIRCLE(2.0))) < 1e-9


def test_cw_ring_normalized():
    cw = W.write_polygon([_sq(0, 0, 10)[::-1].copy()])
    ccw = W.write_polygon([_sq(0, 0, 10)])
    assert G.wkb_area(B.buffer_wkb(cw, 1.0)) == G.wkb_area(B.buffer_wkb(ccw, 1.0))


def test_erode():
    sq = W.write_polygon([_sq(0, 0, 10)])
    assert abs(G.wkb_area(B.buffer_wkb(sq, -2.0)) - 36.0) < 1e-12
    assert B.buffer_wkb(sq, -5.0) is None  # collapses exactly
    assert B.buffer_wkb(sq, -7.0) is None


def test_point_disc_and_capsule():
    disc = B.buffer_wkb(W.write_point(3, 4), 1.5, Q)
    assert abs(G.wkb_area(disc) - CIRCLE(1.5)) < 1e-12
    x0, _, x1, _ = W.bbox(disc)
    assert (x0, x1) == (1.5, 4.5)  # vertices ON the circle
    cap = B.buffer_wkb(
        W.write_linestring(np.array([(0, 0), (6, 0)], dtype=np.float64)), 2.0, Q
    )
    assert abs(G.wkb_area(cap) - (24 + CIRCLE(2.0))) < 1e-9


def test_diagonal_capsule():
    cap = B.buffer_wkb(
        W.write_linestring(np.array([(0, 0), (3, 4)], dtype=np.float64)), 1.0, Q
    )
    assert abs(G.wkb_area(cap) - (10 + CIRCLE(1.0))) < 1e-9


def test_triangle_dilate():
    # non-axis-aligned convex ring: area = A + P*d + sum of per-corner
    # discretized arcs (each exterior angle phi gets m=ceil(phi/step)
    # segments of area d^2/2 * sin(phi/m))
    tri = np.array([(0, 0), (8, 0), (0, 6), (0, 0)], dtype=np.float64)
    d = 1.25
    out = B.buffer_wkb(W.write_polygon([tri]), d, Q)
    step = (math.pi / 2) / Q
    arcs = 0.0
    for phi in (math.pi / 2, math.pi - math.atan2(6, 8), math.pi / 2 + math.atan2(6, 8)):
        m = math.ceil(phi / step - 1e-12)
        arcs += (d * d / 2.0) * m * math.sin(phi / m)
    assert abs(G.wkb_area(out) - (24 + 24 * d + arcs)) < 1e-9


def test_concave_rejected():
    conc = np.array(
        [(0, 0), (10, 0), (10, 10), (5, 3), (0, 10), (0, 0)], dtype=np.float64
    )
    with pytest.raises(ValueError):
        B.buffer_wkb(W.write_polygon([conc]), 1.0)
