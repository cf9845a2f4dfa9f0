"""Knife-edge guards for the hillshade/quantize closed-form fixtures:
the oracle program's discipline is that no fixture value may sit within
float error of a rounding tie (SURVEY section 8)."""

import numpy as np

from gdal_spark.raster import kernels as K
from gdal_spark.raster.quantize import dither_rgb2pct_gdal, median_cut_pct_gdal

N = 16


def test_hillshade_plane_no_round_ties_and_constant_interior():
    for k in range(25):
        a, b = 1 + k % 5, 2 + (3 * k) % 7
        yy, xx = np.meshgrid(np.arange(N), np.arange(N), indexing="ij")
        dem = (a * xx + b * yy).astype(float)
        hs = K.hillshade(dem)[1:-1, 1:-1]
        assert hs.min() == hs.max()
        slope = np.arctan(np.hypot(a, b))
        asp = np.pi / 2 - np.arctan2(b, -a)
        shaded = np.sin(np.deg2rad(45)) * np.cos(slope) + np.cos(
            np.deg2rad(45)
        ) * np.sin(slope) * np.cos(np.deg2rad(315) - asp)
        v = 255 * max(shaded, 0.0)
        # half-even (numpy) vs half-away (DuckDB) can only split ON a tie
        assert abs(v - int(v) - 0.5) > 1e-6
        assert int(np.round(v)) == hs.min()


def test_quantize_fixed_point_colors():
    """Colors at exact 8q multiples survive median-cut + color-cube +
    Floyd-Steinberg verbatim (palette entry ((q+q)<<3)/2 == 8q, zero
    diffusion error), for every nation key the driver fixture uses."""
    for k in range(25):
        qs = [3 + ((k + i * 5) % 7) * 4 for i in range(4)]
        assert len(set(qs)) == 4
        rr, cc = np.meshgrid(np.arange(N), np.arange(N), indexing="ij")
        gray = np.array([8 * q for q in qs], dtype=np.uint8)[(rr + cc) % 4]
        arr = np.stack([gray] * 3, axis=-1)
        pal = median_cut_pct_gdal(arr, 256)
        assert len(pal) == 4
        out = dither_rgb2pct_gdal(arr, pal)
        assert (pal[out] == arr).all()
