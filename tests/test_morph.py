"""Unit tests for morphological/focal kernels (gdal_spark.raster.morph)
against brute-force numpy oracles."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.raster import morph


def brute_proximity(target: np.ndarray) -> np.ndarray:
    ty, tx = np.nonzero(target)
    h, w = target.shape
    out = np.full((h, w), np.inf)
    yy, xx = np.mgrid[0:h, 0:w]
    for y, x in zip(ty, tx):
        out = np.minimum(out, np.sqrt((yy - y) ** 2.0 + (xx - x) ** 2.0))
    return out


class TestProximity:
    def test_exact_vs_brute_force(self):
        rng = np.random.default_rng(7)
        t = rng.random((23, 31)) < 0.05
        t[0, 0] = True  # ensure non-empty
        d = morph.proximity(t)
        np.testing.assert_allclose(d, brute_proximity(t), atol=1e-9)

    def test_maxdist_cap_and_nodata(self):
        t = np.zeros((16, 16), bool)
        t[0, 0] = True
        d = morph.proximity(t, max_dist=5.0)
        assert d[15, 15] == 65535.0  # GDAL default nodata beyond MAXDIST
        d2 = morph.proximity(t, max_dist=5.0, nodata=-1.0)
        assert d2[15, 15] == -1.0
        assert d2[0, 3] == 3.0

    def test_dist_mult_geo_units(self):
        t = np.zeros((4, 4), bool)
        t[0, 0] = True
        d = morph.proximity(t, dist_mult=30.0)
        assert d[0, 2] == pytest.approx(60.0)


class TestSieve:
    def test_small_region_merges_into_largest_neighbor(self):
        v = np.zeros((8, 8), np.int64)
        v[2:4, 2:4] = 5          # 4-px island
        v[6:, :] = 9             # 16-px strip (not adjacent to island)
        out = morph.sieve(v, threshold=5)
        assert (out[2:4, 2:4] == 0).all()          # island absorbed by 0-sea
        assert (out[6:, :] == 9).all()             # large region untouched

    def test_threshold_keeps_equal_or_larger(self):
        v = np.zeros((8, 8), np.int64)
        v[0:2, 0:2] = 3  # exactly 4 px
        out = morph.sieve(v, threshold=4)
        assert (out == v).all()

    def test_8_connect_counts_diagonal(self):
        v = np.zeros((6, 6), np.int64)
        v[1, 1] = 7
        v[2, 2] = 7  # diagonal pair: one region of 2 under 8-connect
        out4 = morph.sieve(v, threshold=2, connect=4)
        assert (out4 == 0).all()  # two 1-px regions, both removed
        out8 = morph.sieve(v, threshold=2, connect=8)
        assert out8[1, 1] == 7 and out8[2, 2] == 7


class TestFillNodata:
    def test_interior_hole_filled_within_range(self):
        arr = np.full((9, 9), 100.0)
        valid = np.ones((9, 9), bool)
        valid[4, 4] = False
        arr[4, 4] = 0.0
        out = morph.fillnodata(arr, valid)
        assert out[4, 4] == pytest.approx(100.0)

    def test_gradient_hole_idw(self):
        # column ramp: filled value must sit between its flank values
        arr = np.tile(np.arange(9, dtype=float) * 10.0, (9, 1))
        valid = np.ones((9, 9), bool)
        valid[4, 4] = False
        out = morph.fillnodata(arr, valid)
        assert 30.0 < out[4, 4] < 50.0

    def test_out_of_range_untouched(self):
        arr = np.zeros((20, 20))
        arr[0, 0] = 50.0
        valid = np.zeros((20, 20), bool)
        valid[0, 0] = True
        out = morph.fillnodata(arr, valid, max_search_dist=3)
        assert out[19, 19] == 0.0  # unreachable: keeps original value
        assert out[0, 2] == pytest.approx(50.0)

    def test_valid_pixels_never_change(self):
        rng = np.random.default_rng(3)
        arr = rng.random((12, 12)) * 255
        valid = rng.random((12, 12)) > 0.3
        out = morph.fillnodata(arr, valid)
        np.testing.assert_allclose(out[valid], arr[valid])


class TestFocal:
    def setup_method(self):
        rng = np.random.default_rng(11)
        self.arr = (rng.random((10, 12)) * 100).round()

    def brute(self, method, size=3):
        r = size // 2
        h, w = self.arr.shape
        out = np.empty((h, w))
        fns = {
            "mean": np.mean, "sum": np.sum, "min": np.min, "max": np.max,
            "stddev": np.std, "median": np.median,
        }
        for y in range(h):
            for x in range(w):
                win = self.arr[max(0, y - r): y + r + 1, max(0, x - r): x + r + 1]
                out[y, x] = fns[method](win)
        return out

    @pytest.mark.parametrize("method", ["mean", "sum", "min", "max", "stddev", "median"])
    def test_vs_brute(self, method):
        np.testing.assert_allclose(
            morph.focal_stat(self.arr, 3, method), self.brute(method), atol=1e-9
        )

    def test_mode(self):
        a = np.array([[1, 1, 2], [1, 2, 2], [3, 3, 3]], float)
        m = morph.focal_stat(a, 3, "mode")
        assert m[1, 1] in (1.0, 2.0, 3.0)
        assert m[0, 0] == 1.0

    def test_convolve_identity(self):
        ident = np.zeros((3, 3))
        ident[1, 1] = 1.0
        np.testing.assert_allclose(morph.convolve(self.arr, ident), self.arr)

    def test_convolve_gaussian_preserves_constant(self):
        c = np.full((8, 8), 42.0)
        np.testing.assert_allclose(morph.convolve(c, "gaussian"), c)


class TestPansharpen:
    def test_brovey_identity_when_pan_equals_pseudo(self):
        rng = np.random.default_rng(5)
        ms = rng.random((6, 6, 3)) * 200 + 10
        pan = ms.mean(axis=2)
        out = morph.pansharpen(pan, ms)
        np.testing.assert_allclose(out, ms, rtol=1e-12)

    def test_ratio_scaling(self):
        ms = np.full((4, 4, 3), 50.0)
        pan = np.full((4, 4), 100.0)
        out = morph.pansharpen(pan, ms)  # pseudo=50, ratio=2
        np.testing.assert_allclose(out, 100.0)


class TestInterpolateAtPoint:
    def setup_method(self):
        self.arr = np.arange(20, dtype=float).reshape(4, 5)

    def test_pixel_center_exact(self):
        v = morph.interpolate_at_point(self.arr, np.array([1.5]), np.array([2.5]))
        assert v[0] == self.arr[2, 1]

    def test_bilinear_midpoint(self):
        v = morph.interpolate_at_point(self.arr, np.array([1.0]), np.array([1.0]))
        assert v[0] == pytest.approx((self.arr[0, 0] + self.arr[0, 1]
                                      + self.arr[1, 0] + self.arr[1, 1]) / 4)

    def test_nearest(self):
        v = morph.interpolate_at_point(self.arr, np.array([1.9]), np.array([0.2]),
                                       method="near")
        assert v[0] == self.arr[0, 1]

    def test_border_clamp(self):
        v = morph.interpolate_at_point(self.arr, np.array([-3.0, 99.0]),
                                       np.array([0.5, 3.5]))
        assert v[0] == self.arr[0, 0] and v[1] == self.arr[3, 4]
