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


def test_concave_negative_rejected():
    """Positive concave buffering is supported (Minkowski union path);
    EROSION of a concave ring still raises."""
    conc = np.array(
        [(0, 0), (10, 0), (10, 10), (5, 3), (0, 10), (0, 0)], dtype=np.float64
    )
    assert B.buffer_wkb(W.write_polygon([conc]), 1.0) is not None
    with pytest.raises(ValueError):
        B.buffer_wkb(W.write_polygon([conc]), -1.0)


# ---------------------------------------------------------------------------
# Concave positive buffer (Minkowski union path)
# ---------------------------------------------------------------------------


def _poly_wkb(ring):
    ring = np.asarray(ring, dtype=np.float64)
    return W.write_polygon([ring])


def _shoelace(ring):
    return 0.5 * float(
        np.sum(ring[:-1, 0] * ring[1:, 1] - ring[1:, 0] * ring[:-1, 1])
    )


def _buffer_area(buf):
    total = 0.0
    for rings in W.polygon_rings(buf):
        for r in rings:
            total += _shoelace(np.asarray(r))  # holes are CW -> negative
    return abs(total) if total >= 0 else total


def _grid_oracle_area(ring, d, res=500):
    """Area of {p : dist(p, polygon) <= d} on a dense grid."""
    ring = np.asarray(ring, dtype=np.float64)
    lo = ring.min(axis=0) - d - 0.1
    hi = ring.max(axis=0) + d + 0.1
    xs = np.linspace(lo[0], hi[0], res)
    ys = np.linspace(lo[1], hi[1], res)
    XX, YY = np.meshgrid(xs, ys)
    P = np.stack([XX.ravel(), YY.ravel()], axis=1)
    # point-in-polygon (even-odd)
    inside = np.zeros(len(P), bool)
    v = ring[:-1]
    n = len(v)
    for i in range(n):
        a, b = v[i], v[(i + 1) % n]
        cond = (a[1] > P[:, 1]) != (b[1] > P[:, 1])
        with np.errstate(divide="ignore", invalid="ignore"):
            xi = a[0] + (P[:, 1] - a[1]) / (b[1] - a[1]) * (b[0] - a[0])
        inside ^= cond & (P[:, 0] < xi)
    # distance to boundary
    dmin = np.full(len(P), np.inf)
    for i in range(n):
        a, b = v[i], v[(i + 1) % n]
        e = b - a
        t = np.clip(((P - a) @ e) / (e @ e), 0.0, 1.0)
        proj = a + t[:, None] * e
        dmin = np.minimum(dmin, np.hypot(*(P - proj).T))
    covered = inside | (dmin <= d)
    cell = (xs[1] - xs[0]) * (ys[1] - ys[0])
    return covered.sum() * cell


def test_concave_square_matches_convex_path():
    sq = np.array([(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)], float)
    conv = B._buffer_convex_ring(sq, 1.0, 8)
    mink = B._buffer_concave_ring(sq, 1.0, 8)
    assert len(mink) == 1 and len(mink[0]) == 1
    a1, a2 = abs(_shoelace(conv)), abs(_shoelace(mink[0][0]))
    assert a2 == pytest.approx(a1, rel=2e-3)


def test_concave_l_shape_area_vs_grid_oracle():
    L = np.array(
        [(0, 0), (6, 0), (6, 2), (2, 2), (2, 6), (0, 6), (0, 0)], float
    )
    out = B.buffer_wkb(_poly_wkb(L), 1.0)
    area = 0.0
    for rings in W.polygon_rings(out):
        for r in rings:
            area += _shoelace(np.asarray(r))
    oracle = _grid_oracle_area(L, 1.0)
    assert abs(area) == pytest.approx(oracle, rel=0.02)


def test_concave_c_shape_closes_into_hole():
    # 3x4 cavity reachable only through a 0.2-wide slit: buffering at
    # d=0.5 seals the slit but cannot fill the cavity -> interior hole
    C = np.array(
        [
            (0, 0), (5, 0), (5, 2.9), (4, 2.9), (4, 1), (1, 1),
            (1, 5), (4, 5), (4, 3.1), (5, 3.1), (5, 6), (0, 6), (0, 0),
        ],
        float,
    )
    out = B.buffer_wkb(_poly_wkb(C), 0.5)
    polys = list(W.polygon_rings(out))
    n_holes = sum(len(r) - 1 for r in polys)
    assert n_holes == 1
    # at a distance smaller than half the slit width, no hole forms
    out2 = B.buffer_wkb(_poly_wkb(C), 0.04)
    polys2 = list(W.polygon_rings(out2))
    assert sum(len(r) - 1 for r in polys2) == 0


def test_concave_buffer_contains_original_vertices():
    L = np.array(
        [(0, 0), (6, 0), (6, 2), (2, 2), (2, 6), (0, 6), (0, 0)], float
    )
    out = B.buffer_wkb(_poly_wkb(L), 0.5)
    pts = L[:-1]
    hit = G.points_in_wkb(pts[:, 0], pts[:, 1], out)
    assert bool(np.all(hit))


# ---------------------------------------------------------------------------
# Polygons with holes
# ---------------------------------------------------------------------------


def _donut_wkb(outer, hole):
    return W.write_polygon(
        [np.asarray(outer, dtype=np.float64), np.asarray(hole, dtype=np.float64)]
    )


SQ10 = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]
HOLE = [(4, 4), (6, 4), (6, 6), (4, 6), (4, 4)]


def test_hole_positive_buffer_shrinks_hole():
    out = B.buffer_wkb(_donut_wkb(SQ10, HOLE), 0.5)
    polys = list(W.polygon_rings(out))
    assert len(polys) == 1 and len(polys[0]) == 2
    area = sum(_shoelace(np.asarray(r)) for r in polys[0])
    # outer square dilates, hole erodes from 2x2 to 1x1
    outer_area = 100 + 4 * 10 * 0.5 + 4 * 8 * 0.5 * 0.25 * math.sin(
        math.pi / 2 / 8
    )
    assert abs(area) == pytest.approx(outer_area - 1.0, rel=1e-3)


def test_hole_positive_buffer_fills_small_hole():
    out = B.buffer_wkb(_donut_wkb(SQ10, HOLE), 1.0)
    polys = list(W.polygon_rings(out))
    # 2x2 hole eroded by 1.0 -> empty: no interior ring survives
    assert len(polys) == 1 and len(polys[0]) == 1


def test_hole_negative_buffer_grows_hole():
    out = B.buffer_wkb(_donut_wkb(SQ10, HOLE), -0.5)
    polys = list(W.polygon_rings(out))
    assert len(polys) == 1 and len(polys[0]) == 2
    outer = polys[0][0]
    np.testing.assert_allclose(
        np.sort(np.unique(np.asarray(outer)[:, 0])), [0.5, 9.5]
    )
    area = sum(_shoelace(np.asarray(r)) for r in polys[0])
    hole_grown = 4.0 + 4 * 2 * 0.5 + 4 * 8 * 0.5 * 0.25 * math.sin(
        math.pi / 2 / 8
    )
    assert abs(area) == pytest.approx(81.0 - hole_grown, rel=1e-3)


def test_hole_negative_buffer_to_annulus_split():
    # eroding a 10x10 with a 2x8 horizontal slot hole by 1.4 splits the
    # region into two bands
    slot = [(1, 4), (9, 4), (9, 6), (1, 6), (1, 4)]
    out = B.buffer_wkb(_donut_wkb(SQ10, slot), -1.6)
    polys = list(W.polygon_rings(out))
    assert len(polys) == 2
    assert all(len(rs) == 1 for rs in polys)
