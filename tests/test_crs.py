"""Krueger-series Transverse Mercator / UTM (functions/crs.py).

Oracles: a published UTM test vector (CN Tower), projection invariants
(central-meridian easting, equator northing, k0 scale), machine-precision
round-trips, and hub composition consistency.
"""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.functions import crs


class TestUTM:
    def test_published_vector_cn_tower(self):
        # 43.642567 N, 79.387139 W -> UTM 17N 630084 E, 4833439 N (published)
        e, n = crs.utm_forward(np.array([-79.387139]), np.array([43.642567]), "EPSG:32617")
        assert e[0] == pytest.approx(630084.3, abs=1.0)
        assert n[0] == pytest.approx(4833438.6, abs=1.0)

    def test_central_meridian_and_equator(self):
        e, n = crs.utm_forward(np.array([3.0]), np.array([0.0]), "EPSG:32631")
        assert e[0] == pytest.approx(500000.0, abs=1e-6)
        assert n[0] == pytest.approx(0.0, abs=1e-6)

    def test_k0_scale_on_central_meridian(self):
        # northing along the central meridian = k0 * meridian arc length;
        # for 1 deg of latitude near the equator that's ~110574.39 m * k0
        lat = np.array([0.0, 1.0])
        _, n = crs.utm_forward(np.array([3.0, 3.0]), lat, "EPSG:32631")
        assert (n[1] - n[0]) == pytest.approx(110574.389 * 0.9996, rel=1e-5)

    def test_south_zone_false_northing(self):
        e, n = crs.utm_forward(np.array([173.0]), np.array([-41.0]), "EPSG:32760")
        assert 0 < n[0] < 10000000.0  # south rows measure down from 10^7
        lon, lat = crs.utm_inverse(e, n, "EPSG:32760")
        assert lon[0] == pytest.approx(173.0, abs=1e-9)
        assert lat[0] == pytest.approx(-41.0, abs=1e-9)

    @pytest.mark.parametrize("code", ["EPSG:32601", "EPSG:32631", "EPSG:32660", "EPSG:32717"])
    def test_roundtrip_machine_precision(self, code):
        rng = np.random.default_rng(hash(code) % 2**32)
        lon0 = crs._parse_utm(code)[0]
        lon = lon0 + rng.uniform(-3, 3, 500)
        lat = rng.uniform(-80, 84, 500)
        e, n = crs.utm_forward(lon, lat, code)
        lon2, lat2 = crs.utm_inverse(e, n, code)
        assert np.abs(lon2 - lon).max() < 1e-11
        assert np.abs(lat2 - lat).max() < 1e-11

    def test_zone_epsg(self):
        assert crs.utm_zone_epsg(3.0, 48.0) == "EPSG:32631"
        assert crs.utm_zone_epsg(-79.4, 43.6) == "EPSG:32617"
        assert crs.utm_zone_epsg(173.0, -41.0) == "EPSG:32759"
        assert crs.utm_zone_epsg(179.9, -41.0) == "EPSG:32760"


class TestHub:
    def test_utm_to_3857_consistency(self):
        rng = np.random.default_rng(4)
        lon = rng.uniform(0.5, 5.5, 100)
        lat = rng.uniform(-60, 60, 100)
        e, n = crs.utm_forward(lon, lat, "EPSG:32631")
        x, y = crs.transform("EPSG:32631", "EPSG:3857", e, n)
        from gdal_spark.raster.warp import lonlat_to_meters_np

        wx, wy = lonlat_to_meters_np(lon, lat)
        assert np.allclose(x, wx, atol=1e-6)
        assert np.allclose(y, wy, atol=1e-6)

    def test_identity_and_unsupported(self):
        x = np.array([1.0])
        y = np.array([2.0])
        ox, oy = crs.transform("EPSG:4326", "EPSG:4326", x, y)
        assert ox[0] == 1.0 and oy[0] == 2.0
        assert crs.inverse_transform_fn("EPSG:9999", "EPSG:4326") is None
        with pytest.raises(ValueError):
            crs.transform("EPSG:9999", "EPSG:4326", x, y)


class TestWarpUTM:
    def test_warp_array_utm_to_4326_recenters_pattern(self):
        """Warp a UTM-gridded checker to lon/lat and verify pixel values
        land where the inverse transform says they should (nearest)."""
        from gdal_spark.raster.warp import warp_array

        # source: zone-31 grid near (3E, 45N), 100 m pixels, 64x64
        e0, n0 = crs.utm_forward(np.array([2.98]), np.array([45.03]), "EPSG:32631")
        src_gt = (float(e0[0]), 100.0, 0.0, float(n0[0]), 0.0, -100.0)
        yy, xx = np.mgrid[0:64, 0:64]
        arr = ((xx // 8 + yy // 8) % 2 * 255).astype(np.uint8)

        # dst: lon/lat box covering the same area
        lon_tl, lat_tl = crs.utm_inverse(e0, n0, "EPSG:32631")
        dst_gt = (float(lon_tl[0]), 0.001, 0.0, float(lat_tl[0]), 0.0, -0.0007)
        out, mask = warp_array(
            arr, src_gt, dst_gt, 48, 48, src_crs="EPSG:32631",
            dst_crs="EPSG:4326", resample="near", return_mask=True,
            approx_grid=0,
        )
        assert mask.sum() > 48 * 48 * 0.5
        # independent check at a handful of destination pixels
        for r, c in [(5, 5), (20, 33), (40, 10)]:
            lon = dst_gt[0] + (c + 0.5) * dst_gt[1]
            lat = dst_gt[3] + (r + 0.5) * dst_gt[5]
            se, sn = crs.utm_forward(np.array([lon]), np.array([lat]), "EPSG:32631")
            px = (se[0] - src_gt[0]) / src_gt[1] - 0.5
            py = (sn[0] - src_gt[3]) / src_gt[5] - 0.5
            if 0 <= round(px) < 64 and 0 <= round(py) < 64:
                assert out[r, c] == arr[int(round(py)), int(round(px))]

    def test_approx_transformer_matches_exact_within_tolerance(self):
        from gdal_spark.raster.warp import warp_array

        e0, n0 = crs.utm_forward(np.array([2.9]), np.array([44.9]), "EPSG:32631")
        src_gt = (float(e0[0]), 80.0, 0.0, float(n0[0]), 0.0, -80.0)
        rng = np.random.default_rng(6)
        arr = rng.integers(0, 256, (96, 96)).astype(np.uint8)
        lon_tl, lat_tl = crs.utm_inverse(e0, n0, "EPSG:32631")
        dst_gt = (float(lon_tl[0]), 0.0008, 0.0, float(lat_tl[0]), 0.0, -0.0006)
        exact = warp_array(arr, src_gt, dst_gt, 64, 64, src_crs="EPSG:32631",
                           dst_crs="EPSG:4326", resample="bilinear", approx_grid=0)
        approx = warp_array(arr, src_gt, dst_gt, 64, 64, src_crs="EPSG:32631",
                            dst_crs="EPSG:4326", resample="bilinear", approx_grid=16)
        # approx transformer is bounded at 0.125 src px -> tiny value drift
        assert np.mean(np.abs(exact.astype(int) - approx.astype(int)) <= 8) > 0.98
