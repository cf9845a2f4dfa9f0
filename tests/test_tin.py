"""Delaunay TIN + linear gridding (alg/gdalgrid.cpp GGA_Linear) goldens."""

from __future__ import annotations

import numpy as np

from gdal_spark.operators import tin


class TestDelaunay:
    def test_square_two_triangles(self):
        pts = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)
        tris = tin.delaunay(pts)
        assert len(tris) == 2
        assert {i for t in tris for i in t} == {0, 1, 2, 3}

    def test_empty_circumcircle_property(self):
        rng = np.random.default_rng(42)
        pts = rng.uniform(0, 100, (40, 2))
        tris = tin.delaunay(pts)
        # Euler: triangles = 2n - 2 - hull_size for a valid triangulation
        for t in tris:
            for k in range(len(pts)):
                if k in t:
                    continue
                assert not tin._circumcircle_contains(pts, t, pts[k]), (t, k)

    def test_total_area_is_hull_area(self):
        rng = np.random.default_rng(7)
        pts = np.vstack(
            [[[0, 0], [10, 0], [10, 10], [0, 10]], rng.uniform(1, 9, (20, 2))]
        )
        tris = tin.delaunay(pts)
        area = 0.0
        for a, b, c in tris:
            pa, pb, pc = pts[a], pts[b], pts[c]
            area += abs(
                (pb[0] - pa[0]) * (pc[1] - pa[1]) - (pc[0] - pa[0]) * (pb[1] - pa[1])
            ) / 2
        assert abs(area - 100.0) < 1e-6


class TestTinInterpolate:
    def test_reproduces_plane_exactly(self):
        # linear interpolation on ANY triangulation reproduces an affine
        # field exactly — the strong TIN correctness invariant
        rng = np.random.default_rng(3)
        pts = np.vstack(
            [[[0, 0], [10, 0], [10, 10], [0, 10]], rng.uniform(0, 10, (30, 2))]
        )
        vals = 3.0 * pts[:, 0] - 2.0 * pts[:, 1] + 7.0
        qx, qy = np.meshgrid(np.linspace(0, 10, 21), np.linspace(0, 10, 21))
        got = tin.tin_interpolate(pts, vals, qx, qy)
        want = 3.0 * qx.ravel() - 2.0 * qy.ravel() + 7.0
        np.testing.assert_allclose(got, want, atol=1e-8)

    def test_nodata_outside_hull(self):
        pts = np.array([[0, 0], [4, 0], [2, 3]], float)
        vals = np.array([1.0, 2.0, 3.0])
        got = tin.tin_interpolate(pts, vals, np.array([10.0, 2.0]),
                                  np.array([10.0, 1.0]), nodata=-9999.0)
        assert got[0] == -9999.0
        assert got[1] != -9999.0

    def test_vertex_values_exact(self):
        rng = np.random.default_rng(5)
        pts = rng.uniform(0, 10, (15, 2))
        vals = rng.uniform(-5, 5, 15)
        got = tin.tin_interpolate(pts, vals, pts[:, 0], pts[:, 1])
        np.testing.assert_allclose(got, vals, atol=1e-6)
