"""Median-cut PCT + Floyd-Steinberg dither (alg/gdalmediancut.cpp,
alg/gdaldither.cpp) — structural goldens."""

from __future__ import annotations

import numpy as np

from gdal_spark.raster import quantize as Q


def _img(colors, shape=(16, 16)):
    rng = np.random.default_rng(3)
    idx = rng.integers(0, len(colors), shape)
    return np.array(colors, np.uint8)[idx]


class TestMedianCut:
    def test_few_colors_recovered_exactly(self):
        colors = [(250, 10, 10), (10, 250, 10), (10, 10, 250), (128, 128, 128)]
        pal = Q.median_cut_pct(_img(colors), n_colors=4)
        assert len(pal) == 4
        # every source color has a palette entry within half a 5-bit cell
        for c in colors:
            d = np.abs(pal.astype(int) - np.array(c)).max(axis=1).min()
            assert d <= 16, (c, pal)

    def test_single_color(self):
        img = np.full((8, 8, 3), 77, np.uint8)
        pal = Q.median_cut_pct(img, n_colors=16)
        assert len(pal) == 1
        assert np.abs(pal[0].astype(int) - 77).max() <= 8

    def test_gradient_splits_along_dominant_axis(self):
        # pure red gradient: palette spreads in r, constant g/b
        g = np.zeros((4, 64, 3), np.uint8)
        g[..., 0] = np.tile(np.arange(0, 256, 4, dtype=np.uint8), (4, 1))
        pal = Q.median_cut_pct(g, n_colors=8)
        assert len(pal) == 8
        assert pal[:, 0].max() - pal[:, 0].min() > 150
        assert pal[:, 1].max() <= 16 and pal[:, 2].max() <= 16

    def test_palette_capped(self):
        rng = np.random.default_rng(0)
        noisy = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
        pal = Q.median_cut_pct(noisy, n_colors=32)
        assert len(pal) <= 32


class TestDither:
    def test_exact_palette_image_roundtrips(self):
        colors = [(250, 10, 10), (10, 250, 10), (10, 10, 250)]
        img = _img(colors)
        pal = np.array(colors, np.uint8)
        idx = Q.dither_rgb(img, pal)
        # zero quantization error -> no diffusion -> exact reconstruction
        np.testing.assert_array_equal(Q.apply_pct(idx, pal), img)

    def test_error_diffusion_preserves_mean(self):
        # mid-gray dithered with a black/white palette: mean of the
        # reconstruction approaches the source mean (the whole point of FS)
        img = np.full((32, 32, 3), 100, np.uint8)
        pal = np.array([(0, 0, 0), (255, 255, 255)], np.uint8)
        idx = Q.dither_rgb(img, pal)
        rec = Q.apply_pct(idx, pal).astype(float)
        assert abs(rec.mean() - 100) < 3.0
        assert set(np.unique(idx)) == {0, 1}  # actually dithers

    def test_nearest_no_dither_differs(self):
        img = np.full((8, 8, 3), 100, np.uint8)
        pal = np.array([(0, 0, 0), (255, 255, 255)], np.uint8)
        nd = Q.nearest_index(img, pal)
        assert set(np.unique(nd)) == {0}  # 100 is nearer to 0 than 255

    def test_pipeline_quality(self):
        # full mediancut+dither at 32 colors on a smooth ramp: mean abs
        # reconstruction error well under one 5-bit cell
        x = np.linspace(0, 255, 64)
        img = np.stack(
            [np.tile(x, (16, 1)), np.tile(x[::-1], (16, 1)), np.full((16, 64), 64.0)],
            axis=-1,
        ).astype(np.uint8)
        pal = Q.median_cut_pct(img, n_colors=32)
        idx = Q.dither_rgb(img, pal)
        rec = Q.apply_pct(idx, pal).astype(float)
        assert np.abs(rec - img).mean() < 8.0
