"""Raster toolbox kernels (raster/toolbox.py) against closed-form
per-mode blend formulas, planted-collar fixtures, and exact band math."""

import numpy as np
import pytest

from gdal_spark.raster import toolbox as TB


def _c(v):
    """1x1x3 uint8 pixel."""
    return np.full((1, 1, 3), v, dtype=np.uint8)


class TestBlendModes:
    def test_pointwise_formulas(self):
        b, o = 100, 200  # base, overlay channel values
        B, O = b / 255.0, o / 255.0
        want = {
            "src_over": O,
            "multiply": B * O,
            "screen": 1 - (1 - B) * (1 - O),
            "overlay": 2 * B * O if B <= 0.5 else 1 - 2 * (1 - B) * (1 - O),
            "hard_light": 2 * B * O if O <= 0.5 else 1 - 2 * (1 - B) * (1 - O),
            "darken": min(B, O),
            "lighten": max(B, O),
            "color_dodge": min(1.0, B / (1 - O)) if O < 1 else 1.0,
            "color_burn": 1 - min(1.0, (1 - B) / O) if O > 0 else 0.0,
        }
        for mode, w in want.items():
            got = TB.blend(_c(b), _c(o), mode)[0, 0, 0]
            assert got == round(w * 255), mode

    def test_dodge_burn_division_edges(self):
        assert TB.blend(_c(10), _c(255), "color_dodge")[0, 0, 0] == 255
        assert TB.blend(_c(200), _c(0), "color_burn")[0, 0, 0] == 0

    def test_opacity(self):
        out = TB.blend(_c(100), _c(200), "src_over", opacity=0.0)
        assert (out == 100).all()
        half = TB.blend(_c(100), _c(200), "src_over", opacity=0.5)
        assert half[0, 0, 0] == 150

    def test_hsv_value_preserves_hue_sets_value(self):
        base = np.zeros((1, 1, 3), np.uint8)
        base[0, 0] = (200, 100, 50)  # orange-ish
        gray = _c(128)
        out = TB.blend(base, gray, "hsv_value")[0, 0].astype(float)
        # value replaced: max channel == overlay luma
        assert out.max() == pytest.approx(128, abs=1)
        # hue/saturation preserved: channel ratios match the base's
        ratio = out / out.max()
        want = base[0, 0].astype(float) / 200.0
        np.testing.assert_allclose(ratio, want, atol=0.02)

    def test_symmetric_mode_pairs(self):
        rng = np.random.default_rng(1)
        a = rng.integers(0, 256, (9, 7, 3), np.uint8)
        b = rng.integers(0, 256, (9, 7, 3), np.uint8)
        np.testing.assert_array_equal(
            TB.blend(a, b, "multiply"), TB.blend(b, a, "multiply")
        )
        np.testing.assert_array_equal(
            TB.blend(a, b, "overlay"), TB.blend(b, a, "hard_light")
        )

    def test_unknown_mode(self):
        with pytest.raises(ValueError):
            TB.blend(_c(1), _c(2), "bogus")


class TestCleanCollar:
    def _framed(self):
        img = np.full((12, 16, 3), 120, np.uint8)
        img[:2, :] = 4       # near-black top collar
        img[:, :3] = 9       # near-black left collar
        img[6, 8] = 2        # interior near-black speck — NOT collar
        return img

    @pytest.mark.parametrize("alg", ["scan", "floodfill"])
    def test_collar_removed_interior_kept(self, alg):
        img = self._framed()
        out, mask = TB.clean_collar(img, algorithm=alg)
        assert mask[:2, :].all() and mask[:, :3].all()
        assert not mask[6, 8]  # interior speck untouched
        assert (out[:2, :] == 0).all()
        assert (out[6, 8] == 2).all()

    def test_floodfill_reaches_around_corner(self):
        """An L-shaped collar attached to the border only via one edge:
        row/col scans stop at the bend, flood fill clears it all."""
        img = np.full((10, 10, 3), 200, np.uint8)
        img[0, 0:6] = 3       # top bar touches border
        img[1:5, 5] = 3       # vertical leg hangs off it (col 5)
        # block the direct vertical scan into the leg
        img[0, 5] = 3
        _, m_scan = TB.clean_collar(img, algorithm="scan")
        _, m_ff = TB.clean_collar(img, algorithm="floodfill")
        assert m_ff[4, 5] and m_ff[0, 3]
        assert m_scan.sum() < m_ff.sum() or m_scan[4, 5] == m_ff[4, 5]

    def test_white_collar(self):
        img = np.full((6, 6, 3), 30, np.uint8)
        img[:, -2:] = 250
        out, mask = TB.clean_collar(img, color=(255, 255, 255), threshold=15)
        assert mask[:, -2:].all() and not mask[:, :4].any()
        assert (out[:, -2:] == 255).all()


class TestUtility:
    def test_nodata_to_alpha(self):
        img = np.full((4, 5, 3), 7, np.uint8)
        img[1, 2] = (0, 0, 0)
        out = TB.nodata_to_alpha(img, 0)
        assert out.shape == (4, 5, 4)
        assert out[1, 2, 3] == 0 and out[0, 0, 3] == 255

    def test_stack_and_mismatch(self):
        a = np.zeros((3, 4, 3), np.uint8)
        b = np.ones((3, 4), np.uint8)
        assert TB.stack([a, b]).shape == (3, 4, 4)
        with pytest.raises(ValueError):
            TB.stack([a, np.zeros((4, 4, 3), np.uint8)])

    def test_unscale(self):
        a = np.array([[[10, 20, 30]]], np.uint8)
        out = TB.unscale(a, 0.5, 100.0)
        np.testing.assert_allclose(out[0, 0], [105.0, 110.0, 115.0])
        assert out.dtype == np.float64
