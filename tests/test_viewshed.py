"""Viewshed (alg/viewshed/) — analytic-terrain goldens + LOS cross-check."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.raster import viewshed as V


class TestViewshed:
    def test_flat_all_visible(self):
        dem = np.zeros((21, 21))
        out = V.viewshed(dem, 10, 10, observer_height=2.0)
        assert (out == 255).all()

    def test_wall_shadows_behind(self):
        dem = np.zeros((11, 21))
        dem[:, 14] = 50.0  # tall north-south wall east of the observer
        out = V.viewshed(dem, 10, 5, observer_height=2.0)
        assert (out[:, :14] == 255).all()  # everything before the wall
        assert (out[5, 15:] == 0).all()  # straight-ray shadow
        assert out[5, 14] == 255  # wall top is visible
        # ground right behind the wall is hidden on every row
        assert (out[:, 15] == 0).all()

    def test_uphill_slope_visible(self):
        # terrain rising away from the observer: every cell sees the sky
        dem = np.tile(np.arange(21.0), (21, 1))
        out = V.viewshed(dem, 0, 10, observer_height=2.0)
        assert (out == 255).all()

    def test_downhill_then_rise_hides_valley(self):
        # drop into a valley then rise: valley floor behind the crest of
        # the drop stays visible, but a bump in the valley shadows beyond
        dem = np.zeros((5, 30))
        dem[:, 10] = 5.0
        dem[:, 20] = 4.0  # lower than the first bump -> hidden
        out = V.viewshed(dem, 0, 2, observer_height=1.0)
        assert out[2, 10] == 255
        assert out[2, 20] == 0

    def test_observer_height_uncovers(self):
        dem = np.zeros((5, 30))
        dem[:, 10] = 5.0
        low = V.viewshed(dem, 0, 2, observer_height=1.0)
        high = V.viewshed(dem, 0, 2, observer_height=50.0)
        assert low[2, 25] == 0 and high[2, 25] == 255

    def test_target_height_uncovers(self):
        dem = np.zeros((5, 30))
        dem[:, 10] = 5.0
        t0 = V.viewshed(dem, 0, 2, observer_height=1.0, target_height=0.0)
        t9 = V.viewshed(dem, 0, 2, observer_height=1.0, target_height=30.0)
        assert t0[2, 25] == 0 and t9[2, 25] == 255

    def test_max_distance_masks(self):
        dem = np.zeros((21, 21))
        out = V.viewshed(dem, 10, 10, max_distance=5.0, out_of_range_val=7)
        yy, xx = np.mgrid[0:21, 0:21]
        far = (xx - 10) ** 2 + (yy - 10) ** 2 > 25
        assert (out[far] == 7).all()
        assert (out[~far] == 255).all()

    def test_symmetry_on_symmetric_terrain(self):
        # radially symmetric crater -> viewshed symmetric under x/y flips
        yy, xx = np.mgrid[0:31, 0:31]
        r = np.hypot(xx - 15, yy - 15)
        dem = np.where(np.abs(r - 8) < 1.5, 20.0, 0.0)
        out = V.viewshed(dem, 15, 15, observer_height=2.0)
        np.testing.assert_array_equal(out, out[::-1, :])
        np.testing.assert_array_equal(out, out[:, ::-1])
        np.testing.assert_array_equal(out, out.T)

    def test_modes_run_and_agree_on_flat(self):
        dem = np.zeros((9, 9))
        for m in ("edge", "diagonal", "min", "max"):
            assert (V.viewshed(dem, 4, 4, mode=m) == 255).all()

    def test_agrees_with_los_on_axis_rays(self):
        # along the 8 principal rays the Wang propagation IS the exact
        # sight line, so it must match brute-force LOS exactly
        rng = np.random.default_rng(7)
        dem = rng.uniform(0, 10, (17, 17)).round(1)
        ox = oy = 8
        out = V.viewshed(dem, ox, oy, observer_height=2.0)
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1), (1, 1), (1, -1), (-1, 1), (-1, -1)):
            for d in range(1, 8):
                x, y = ox + dx * d, oy + dy * d
                vis, _ = V.line_of_sight(dem, ox, oy, x, y,
                                         observer_height=2.0, target_height=0.0)
                assert vis == (out[y, x] == 255), (dx, dy, d)


class TestLineOfSight:
    def test_simple(self):
        dem = np.zeros((5, 20))
        assert V.line_of_sight(dem, 0, 2, 19, 2)[0]
        dem[:, 10] = 50.0
        ok, blk = V.line_of_sight(dem, 0, 2, 19, 2)
        assert not ok and blk[0] == 10

    def test_errors(self):
        with pytest.raises(ValueError):
            V.viewshed(np.zeros((4, 4)), 9, 0)
        with pytest.raises(ValueError):
            V.viewshed(np.zeros((4, 4)), 0, 0, mode="bogus")
