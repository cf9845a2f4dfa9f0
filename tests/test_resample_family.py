"""Full resample-method family + DEM metric kernels.

Oracles are independent re-derivations:
  * cubic == direct Catmull-Rom CubicConvolution formula
    (alg/gdalwarpkernel.cpp:3220) evaluated scalar-at-a-time.
  * cubicspline / lanczos == direct filter-function weighting loops.
  * window methods == brute-force per-output-pixel python reduction with
    GDAL's window convention [floor(min+eps), ceil(max-eps)) and the
    sorted[ceil(q*n - 1)] quantile rule (alg/gdalwarpkernel.cpp:8334).
  * TRI/TPI/roughness == scalar 3x3 loops transcribing gdaldem_lib.cpp.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from gdal_spark.raster import kernels as K


def _cubic_convolution(t, f0, f1, f2, f3):
    # alg/gdalwarpkernel.cpp:3220 CubicConvolution (distanceN = t^N)
    return f1 + 0.5 * (
        t * (f2 - f0)
        + t * t * (2 * f0 - 5 * f1 + 4 * f2 - f3)
        + t * t * t * (3 * (f1 - f2) + f3 - f0)
    )


def _bspline_scalar(x):
    def cube(v):
        return max(v, 0.0) ** 3

    return cube(x + 2) - 4 * cube(x + 1) + 6 * cube(x) - 4 * cube(x - 1)


def _lanczos_scalar(x):
    if x == 0.0:
        return 1.0
    if abs(x) >= 3.0:
        return 0.0
    return math.sin(math.pi * x) * math.sin(math.pi * x / 3) / (math.pi * x * math.pi * x / 3)


class TestFilterKernels:
    @pytest.mark.parametrize("seed", range(4))
    def test_cubic_matches_convolution_formula(self, seed):
        rng = np.random.default_rng(seed)
        arr = rng.uniform(0, 255, (12, 13))
        # interior fractional sample points (away from edge clamping)
        fx = rng.uniform(2.0, 9.5, 40)
        fy = rng.uniform(2.0, 9.5, 40)
        got = K._kernel_gather(arr, fx, fy, "cubic")
        for k in range(len(fx)):
            x0, y0 = int(np.floor(fx[k])), int(np.floor(fy[k]))
            tx, ty = fx[k] - x0, fy[k] - y0
            rows = [
                _cubic_convolution(tx, *[arr[y0 + j, x0 + i] for i in (-1, 0, 1, 2)])
                for j in (-1, 0, 1, 2)
            ]
            want = _cubic_convolution(ty, *rows)
            assert got[k] == pytest.approx(want, abs=1e-9)

    @pytest.mark.parametrize(
        "kernel,fn,r", [("cubicspline", _bspline_scalar, 2), ("lanczos", _lanczos_scalar, 3)]
    )
    def test_filter_matches_scalar_weights(self, kernel, fn, r):
        rng = np.random.default_rng(11)
        arr = rng.uniform(0, 255, (16, 16))
        fx = rng.uniform(4.0, 11.5, 30)
        fy = rng.uniform(4.0, 11.5, 30)
        got = K._kernel_gather(arr, fx, fy, kernel)
        for k in range(len(fx)):
            x0, y0 = int(np.floor(fx[k])), int(np.floor(fy[k]))
            tx, ty = fx[k] - x0, fy[k] - y0
            wx = np.array([fn(tx - o) for o in range(-(r - 1), r + 1)])
            wy = np.array([fn(ty - o) for o in range(-(r - 1), r + 1)])
            wx /= wx.sum()
            wy /= wy.sum()
            want = 0.0
            for j, oy in enumerate(range(-(r - 1), r + 1)):
                for i, ox in enumerate(range(-(r - 1), r + 1)):
                    want += wy[j] * wx[i] * arr[y0 + oy, x0 + ox]
            assert got[k] == pytest.approx(want, abs=1e-9)

    def test_cubic_interpolates_exactly_on_linear_ramp(self):
        # Catmull-Rom reproduces degree<=1 polynomials exactly
        ramp = np.outer(np.arange(10, dtype=float), np.ones(10)) * 3 + 7
        out = K.resample_kernel(ramp, 20, 20, "cubic")
        fy = (np.arange(20) + 0.5) * 10 / 20 - 0.5
        want = np.outer(fy, np.ones(20)) * 3 + 7
        # rows whose 4 taps are all un-clamped: 1 <= fy <= 7 (y0+2 <= 9)
        interior = (fy >= 1.0) & (fy <= 7.0)
        assert np.allclose(out[interior], want[interior], atol=1e-9)

    def test_uint8_clips_overshoot(self):
        arr = np.zeros((8, 8), dtype=np.uint8)
        arr[:, 4:] = 255  # step edge -> cubic overshoots beyond [0, 255]
        out = K.resample_kernel(arr, 16, 16, "cubic")
        assert out.dtype == np.uint8
        assert out.min() >= 0 and out.max() <= 255

    def test_multiband(self):
        rng = np.random.default_rng(3)
        arr = rng.uniform(0, 255, (9, 9, 3))
        out = K.resample_kernel(arr, 5, 7, "lanczos")
        assert out.shape == (5, 7, 3)
        for b in range(3):
            assert np.allclose(out[..., b], K.resample_kernel(arr[..., b], 5, 7, "lanczos"))


def _window_oracle(arr, out_h, out_w, method):
    eps = 1e-10
    h, w = arr.shape[:2]
    out = np.zeros((out_h, out_w), dtype=np.float64)
    for r in range(out_h):
        ylo = max(int(math.floor(r * h / out_h + eps)), 0)
        yhi = min(int(math.ceil((r + 1) * h / out_h - eps)), h)
        yhi = max(yhi, ylo + 1)
        for c in range(out_w):
            xlo = max(int(math.floor(c * w / out_w + eps)), 0)
            xhi = min(int(math.ceil((c + 1) * w / out_w - eps)), w)
            xhi = max(xhi, xlo + 1)
            vals = arr[ylo:yhi, xlo:xhi].astype(np.float64).ravel()
            if method == "average":
                out[r, c] = vals.mean()
            elif method == "rms":
                out[r, c] = math.sqrt((vals**2).mean())
            elif method == "min":
                out[r, c] = vals.min()
            elif method == "max":
                out[r, c] = vals.max()
            elif method == "sum":
                out[r, c] = vals.sum()
            elif method == "mode":
                uniq, cnt = np.unique(vals, return_counts=True)
                out[r, c] = uniq[np.argmax(cnt)]
            else:
                q = {"med": 0.5, "q1": 0.25, "q3": 0.75}[method]
                srt = np.sort(vals)
                out[r, c] = srt[max(0, math.ceil(q * len(srt) - 1))]
    return out


class TestWindowResample:
    @pytest.mark.parametrize(
        "method", ["average", "rms", "min", "max", "sum", "med", "q1", "q3"]
    )
    @pytest.mark.parametrize("shape", [(12, 18, 5, 7), (10, 10, 4, 4), (9, 13, 6, 5)])
    def test_vs_bruteforce(self, method, shape):
        h, w, oh, ow = shape
        rng = np.random.default_rng(h * w + oh)
        arr = rng.uniform(0, 100, (h, w))
        got = K.resample_window(arr, oh, ow, method)
        want = _window_oracle(arr, oh, ow, method)
        assert np.allclose(got, want, atol=1e-9), method

    def test_mode_vs_bruteforce_smallalphabet(self):
        rng = np.random.default_rng(5)
        arr = rng.integers(0, 4, (12, 12)).astype(np.float64)
        got = K.resample_window(arr, 4, 4, "mode")
        want = _window_oracle(arr, 4, 4, "mode")
        assert np.allclose(got, want)

    def test_integer_factor_average_matches_block_reduce(self):
        rng = np.random.default_rng(9)
        arr = rng.integers(0, 256, (16, 24)).astype(np.uint8)
        got = K.resample_window(arr, 8, 12, "average")
        want = K.block_reduce(arr, 2, 2, "average")
        assert np.array_equal(got, want)

    def test_block_reduce_quantiles(self):
        arr = np.arange(16, dtype=np.float64).reshape(4, 4)
        # 2x2 blocks sorted; GDAL rule sorted[ceil(q*4 - 1)]
        med = K.block_reduce(arr, 2, 2, "med")
        q1 = K.block_reduce(arr, 2, 2, "q1")
        q3 = K.block_reduce(arr, 2, 2, "q3")
        blk = arr[:2, :2].ravel()
        srt = np.sort(blk)
        assert med[0, 0] == srt[math.ceil(0.5 * 4 - 1)]
        assert q1[0, 0] == srt[max(0, math.ceil(0.25 * 4 - 1))]
        assert q3[0, 0] == srt[math.ceil(0.75 * 4 - 1)]

    def test_multiband_window(self):
        rng = np.random.default_rng(2)
        arr = rng.uniform(0, 255, (12, 12, 3))
        out = K.resample_window(arr, 5, 5, "med")
        assert out.shape == (5, 5, 3)
        for b in range(3):
            assert np.allclose(out[..., b], _window_oracle(arr[..., b], 5, 5, "med"))

    def test_dispatch(self):
        arr = np.arange(64, dtype=np.float64).reshape(8, 8)
        assert np.array_equal(K.resample(arr, 4, 4, "near"), K.resample_nearest(arr, 4, 4))
        assert np.array_equal(K.resample(arr, 4, 4, "q3"), K.resample_window(arr, 4, 4, "q3"))
        assert np.array_equal(
            K.resample(arr, 16, 16, "cubic"), K.resample_kernel(arr, 16, 16, "cubic")
        )
        with pytest.raises(ValueError):
            K.resample(arr, 4, 4, "gauss_nope")


def _win9(z, r, c):
    # edge-replicated 3x3 window in gdaldem's afWin order
    h, w = z.shape
    idx = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 0), (0, 1), (1, -1), (1, 0), (1, 1)]
    return [z[min(max(r + dr, 0), h - 1), min(max(c + dc, 0), w - 1)] for dr, dc in idx]


class TestDemMetrics:
    @pytest.mark.parametrize("seed", range(3))
    def test_tri_riley_wilson_vs_scalar(self, seed):
        rng = np.random.default_rng(seed)
        z = rng.uniform(0, 100, (9, 11))
        riley = K.tri(z, alg="riley")
        wilson = K.tri(z, alg="wilson")
        for r in range(9):
            for c in range(11):
                win = _win9(z, r, c)
                ctr = win[4]
                nbrs = win[:4] + win[5:]
                assert riley[r, c] == pytest.approx(
                    math.sqrt(sum((n - ctr) ** 2 for n in nbrs)), abs=1e-9
                )
                assert wilson[r, c] == pytest.approx(
                    sum(abs(n - ctr) for n in nbrs) / 8.0, abs=1e-9
                )

    def test_tpi_vs_scalar(self):
        rng = np.random.default_rng(7)
        z = rng.uniform(0, 50, (8, 8))
        got = K.tpi(z)
        for r in range(8):
            for c in range(8):
                win = _win9(z, r, c)
                assert got[r, c] == pytest.approx(
                    win[4] - sum(win[:4] + win[5:]) / 8.0, abs=1e-9
                )

    def test_roughness_vs_scalar(self):
        rng = np.random.default_rng(8)
        z = rng.uniform(0, 50, (8, 8))
        got = K.roughness(z)
        for r in range(8):
            for c in range(8):
                win = _win9(z, r, c)
                assert got[r, c] == pytest.approx(max(win) - min(win), abs=1e-12)

    def test_flat_plane_zero(self):
        z = np.full((6, 6), 13.0)
        assert np.allclose(K.tri(z), 0.0)
        assert np.allclose(K.tpi(z), 0.0)
        assert np.allclose(K.roughness(z), 0.0)

    def test_color_relief_interpolate_and_nearest(self):
        table = [(0.0, 0, 0, 255), (100.0, 0, 255, 0), (200.0, 255, 0, 0)]
        z = np.array([[0.0, 50.0, 100.0, 150.0, 200.0, 250.0]])
        rgb = K.color_relief(z, table)
        assert tuple(rgb[0, 0]) == (0, 0, 255)
        assert tuple(rgb[0, 1]) == (0, 128, 128)  # midpoint blend (round .5 -> even)
        assert tuple(rgb[0, 2]) == (0, 255, 0)
        assert tuple(rgb[0, 3]) == (128, 128, 0)
        assert tuple(rgb[0, 4]) == (255, 0, 0)
        assert tuple(rgb[0, 5]) == (255, 0, 0)  # clamps beyond the table
        nn = K.color_relief(z, table, mode="nearest")
        assert tuple(nn[0, 1]) == (0, 0, 255) or tuple(nn[0, 1]) == (0, 255, 0)
        assert tuple(nn[0, 3]) in ((0, 255, 0), (255, 0, 0))
