"""Chi-shape concave hull (operators/tin.py concave_hull) vs GEOS
ConcaveHullOfPoints properties (apps/gdalalg_vector_concave_hull.cpp):
ratio=1 is the convex hull, hulls contain all points, area shrinks
monotonically with ratio, rings stay simple."""

import numpy as np
import pytest

from gdal_spark.operators.tin import concave_hull


def _area(c):
    x, y = c[:, 0], c[:, 1]
    return 0.5 * abs(float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1])))


def _l_points(s=1.0):
    return (
        np.array(
            [(x, y) for x in range(5) for y in range(5) if not (x >= 3 and y >= 3)],
            dtype=np.float64,
        )
        * s
    )


def _point_in_ring(p, ring):
    """Boundary-inclusive containment: exact on-segment check first,
    then plain ray casting (chi-shapes put many input points ON the
    ring, where a shrink-toward-centroid trick misclassifies)."""
    for i in range(len(ring) - 1):
        a, b = ring[i], ring[i + 1]
        d = b - a
        L2 = float(d @ d)
        t = 0.0 if L2 == 0 else np.clip(((p - a) @ d) / L2, 0.0, 1.0)
        if np.hypot(*(a + t * d - p)) < 1e-9:
            return True
    inside = False
    for i in range(len(ring) - 1):
        a, b = ring[i], ring[i + 1]
        if (a[1] > p[1]) != (b[1] > p[1]):
            xint = a[0] + (p[1] - a[1]) * (b[0] - a[0]) / (b[1] - a[1])
            if p[0] < xint:
                inside = not inside
    return inside


class TestConcaveHull:
    def test_ratio_one_is_convex_hull(self):
        """ratio=1 must equal the monotone-chain convex hull by area."""
        from gdal_spark.functions import st_catalog as ST
        from gdal_spark.functions import wkb as W

        rng = np.random.default_rng(11)
        pts = rng.uniform(0, 100, (60, 2))
        ring = concave_hull(pts, 1.0)
        got = _area(ring)
        mp = W.write_polygon([np.vstack([pts, pts[:1]])])  # raw cloud ring
        hull_wkb = ST._convex_hull(mp)
        from gdal_spark.functions import geom as G

        assert got == pytest.approx(G.wkb_area(bytes(hull_wkb)), rel=1e-9)

    def test_l_grid_closed_form(self):
        for s in (1.0, 2.0, 3.0):
            cv = concave_hull(_l_points(s), 1.0)
            cc = concave_hull(_l_points(s), 0.4)
            assert len(cv) == 14 and _area(cv) == pytest.approx(14 * s * s)
            assert len(cc) == 16 and _area(cc) == pytest.approx(12.5 * s * s)

    def test_contains_all_points(self):
        rng = np.random.default_rng(3)
        pts = rng.uniform(0, 50, (80, 2))
        for ratio in (0.0, 0.2, 0.5, 1.0):
            ring = concave_hull(pts, ratio)
            assert all(_point_in_ring(p, ring) for p in pts), ratio

    def test_area_monotone_in_ratio(self):
        rng = np.random.default_rng(9)
        pts = rng.uniform(0, 50, (100, 2))
        areas = [_area(concave_hull(pts, r)) for r in (0.0, 0.3, 0.6, 1.0)]
        assert all(a <= b + 1e-9 for a, b in zip(areas, areas[1:]))

    def test_ring_is_simple(self):
        from gdal_spark.functions import st_catalog as ST
        from gdal_spark.functions import wkb as W

        rng = np.random.default_rng(4)
        pts = rng.uniform(0, 30, (50, 2))
        ring = concave_hull(pts, 0.1)
        assert ST._is_simple(W.write_polygon([ring]))

    def test_too_few_points(self):
        with pytest.raises(ValueError):
            concave_hull(np.array([[0.0, 0.0], [1.0, 1.0]]), 0.5)
