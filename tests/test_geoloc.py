"""Geolocation-array transformer parity (alg/gdalgeoloc.cpp /
gdalgeolocquadtree.cpp) + the TransformGeolocations golden from
autotest/alg/transformgeoloc.py (WGS84 -> UTM 11N through the engine's
own transverse-mercator kernel — all 8 expected values exact)."""

import numpy as np
import pytest

from gdal_spark.functions.crs import utm_forward
from gdal_spark.raster.geoloc import GeoLocTransformer, transform_geolocations

# a gently warped swath grid: strictly monotone, non-affine
LON = np.array(
    [
        [10.0, 11.0, 12.1],
        [10.1, 11.2, 12.3],
        [10.2, 11.4, 12.6],
    ]
)
LAT = np.array(
    [
        [50.0, 50.1, 50.2],
        [49.0, 49.1, 49.15],
        [48.0, 48.05, 48.1],
    ]
)


def test_forward_at_nodes_and_interior():
    tr = GeoLocTransformer(LON, LAT)
    for iy in range(3):
        for ix in range(3):
            X, Y = tr.pixel_to_geo(ix, iy)
            assert X == LON[iy, ix] and Y == LAT[iy, ix]
    # interior bilinear
    X, Y = tr.pixel_to_geo(0.5, 0.5)
    assert X == pytest.approx((10.0 + 11.0 + 10.1 + 11.2) / 4)
    assert Y == pytest.approx((50.0 + 50.1 + 49.0 + 49.1) / 4)


def test_forward_edge_extension():
    # beyond the right/bottom edge: extrapolate from the closest square
    tr = GeoLocTransformer(LON, LAT)
    X, Y = tr.pixel_to_geo(2.5, 0.0)
    assert X == pytest.approx(12.1 + 0.5 * (12.1 - 11.0))
    X2, Y2 = tr.pixel_to_geo(0.0, 2.5)
    assert Y2 == pytest.approx(48.0 + 0.5 * (48.0 - 49.0))


def test_inverse_roundtrip():
    tr = GeoLocTransformer(LON, LAT)
    pts = [(0.3, 0.7), (1.5, 1.2), (0.1, 1.9), (1.9, 0.1), (1.0, 1.0)]
    for p, l_ in pts:
        X, Y = tr.pixel_to_geo(p, l_)
        p2, l2 = tr.geo_to_pixel(X, Y)
        assert p2 == pytest.approx(p, abs=1e-9)
        assert l2 == pytest.approx(l_, abs=1e-9)
    # a point outside the swath footprint fails (NaN)
    p3, l3 = tr.geo_to_pixel(0.0, 0.0)
    assert np.isnan(p3) and np.isnan(l3)


def test_offsets_steps_and_center_convention():
    # geoloc array subsampled 2x with offset 1, pixel-center origin
    tr = GeoLocTransformer(
        LON, LAT, pixel_offset=1.0, line_offset=1.0,
        pixel_step=2.0, line_step=2.0, origin_top_left=False,
    )
    # raster pixel that lands exactly on geoloc node (1,1):
    # p_arr = (px - 1)/2 - 0.5 = 1  ->  px = 4
    X, Y = tr.pixel_to_geo(4.0, 4.0)
    assert X == LON[1, 1] and Y == LAT[1, 1]
    px, py = tr.geo_to_pixel(X + 1e-9, Y - 1e-9)
    assert px == pytest.approx(4.0, abs=1e-6)
    assert py == pytest.approx(4.0, abs=1e-6)


def test_nodata_rejected():
    lon = LON.copy()
    lon[0, 0] = -999.0
    tr = GeoLocTransformer(lon, LAT, nodata=-999.0)
    X, Y = tr.pixel_to_geo(0.1, 0.1)
    assert np.isnan(X)


def test_transformgeoloc_golden_utm():
    # autotest/alg/transformgeoloc.py test_transformgeoloc_1
    lon = np.array([[-117.0, -116.0], [-116.5, -115.5]])
    lat = np.array([[45.0, 45.5], [44.0, 44.5]])
    E, N = transform_geolocations(
        lon, lat, lambda lo, la: utm_forward(lo, la, "EPSG:32611")
    )
    want_e = [[500000.0, 578126.73752062], [540087.07398217, 619246.88515195]]
    want_n = [
        [4982950.40022655, 5038982.81207855],
        [4871994.34702622, 4928503.38229753],
    ]
    assert np.allclose(E, want_e)
    assert np.allclose(N, want_n)


# ---------------------------------------------------------------------------
# Antimeridian (ShiftGeoX/UnshiftGeoX + dual quad versions,
# gdalgeoloc.h:72-85, gdalgeoloc.cpp:437-449, gdalgeolocquadtree.cpp:137-175)
# ---------------------------------------------------------------------------


def _dateline_swath():
    """10x10 swath whose longitudes march across +/-180:
    lon(col) = wrap(174 + 1.2*col), lat(row) = 10 + 0.5*row."""
    cols = 174.0 + 1.2 * np.arange(10)
    lons = np.where(cols > 180.0, cols - 360.0, cols)
    lon = np.tile(lons, (10, 1))
    lat = 10.0 + 0.5 * np.arange(10)[:, None] + np.zeros((1, 10))
    return lon, lat


def test_dateline_forward_interpolates_across_wrap():
    lon, lat = _dateline_swath()
    tr = GeoLocTransformer(lon, lat, geographic_srs=True)
    # crossing quad: col 5 = 180.0, col 6 = -178.8; midpoint must be
    # -179.4 (the short way), never the naive mean 0.6
    X, Y = tr.pixel_to_geo(5.5, 2.0)
    assert X == pytest.approx(-179.4, abs=1e-9)
    assert Y == pytest.approx(11.0, abs=1e-9)
    # without the geographic flag the naive mean leaks through
    naive = GeoLocTransformer(lon, lat)
    Xn, _ = naive.pixel_to_geo(5.5, 2.0)
    assert Xn == pytest.approx(0.6, abs=1e-9)


def test_dateline_forward_exact_wrap_point():
    lon, lat = _dateline_swath()
    tr = GeoLocTransformer(lon, lat, geographic_srs=True)
    # three quarters into the crossing quad: 180 + 0.75*1.2 = -179.1
    X, _ = tr.pixel_to_geo(5.75, 0.0)
    assert X == pytest.approx(-179.1, abs=1e-9)


def test_dateline_inverse_both_sides():
    lon, lat = _dateline_swath()
    tr = GeoLocTransformer(lon, lat, geographic_srs=True)
    # west of the dateline (non-crossing quad [178.8, 180])
    px, py = tr.geo_to_pixel(179.7, 11.0)
    assert px == pytest.approx(4.75, abs=1e-9)
    assert py == pytest.approx(2.0, abs=1e-9)
    # inside the crossing quad, +180 version: 180 + 0.25*1.2 = 180.3
    px, py = tr.geo_to_pixel(-179.7, 11.0)
    assert px == pytest.approx(5.25, abs=1e-9)
    assert py == pytest.approx(2.0, abs=1e-9)
    # east of the dateline (same quad, other version)
    px, py = tr.geo_to_pixel(-179.4, 11.0)
    assert px == pytest.approx(5.5, abs=1e-9)
    assert py == pytest.approx(2.0, abs=1e-9)


def test_dateline_roundtrip_grid():
    lon, lat = _dateline_swath()
    tr = GeoLocTransformer(lon, lat, geographic_srs=True)
    pts = [(1.25, 3.5), (5.5, 2.0), (5.9, 7.1), (8.25, 4.75)]
    for p, l_ in pts:
        X, Y = tr.pixel_to_geo(p, l_)
        assert -180.0 <= X <= 180.0
        bp, bl = tr.geo_to_pixel(X, Y)
        assert bp == pytest.approx(p, abs=1e-6)
        assert bl == pytest.approx(l_, abs=1e-6)


def test_dateline_wrap_requires_range():
    """Longitudes outside [-180,180] disable the wrap logic, matching
    bGeographicSRSWithMinus180Plus180LongRange's range guard."""
    lon = np.tile(174.0 + 1.2 * np.arange(10), (10, 1))  # up to 184.8
    lat = np.tile(10.0 + 0.5 * np.arange(10)[:, None], (1, 10))
    tr = GeoLocTransformer(lon, lat, geographic_srs=True)
    assert not tr.wrap
