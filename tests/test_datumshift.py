"""Horizontal datum shifts: NTv2 grid round-trip, bilinear shift
application (functions/datumshift.py), ProjCRS +nadgrids / +towgs84
composition, and the published EPSG 9606 Helmert test vector.

Reference semantics: PROJ hgridshift + helmert steps as reached by
ogr/ogrct.cpp:1788; NTv2 layout frmts/raw/ntv2dataset.cpp.
"""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.functions import datumshift as DS
from gdal_spark.functions.crs import (
    ProjCRS,
    geocentric_to_geodetic,
    geodetic_to_geocentric,
    helmert,
    helmert_inverse,
    transform_any,
)
from gdal_spark.raster.shiftgrids import ntv2_decode, ntv2_encode


def _linear_grid(name="t_linear"):
    h, w = 21, 21
    gt = (-110.5, 1.0, 0.0, 45.5, 0.0, -1.0)
    lon_c = gt[0] + (np.arange(w) + 0.5) * gt[1]
    lat_c = gt[3] + (np.arange(h) + 0.5) * gt[5]
    LON, LAT = np.meshgrid(lon_c, lat_c)
    dlat = 0.5 + 0.01 * LON + 0.02 * LAT
    dlon = -1.2 + 0.03 * LON - 0.015 * LAT
    arr = np.stack([dlat, dlon, np.zeros_like(dlat), np.zeros_like(dlat)],
                   axis=-1)
    DS.register_grid(name, arr, gt)
    return arr, gt


def test_ntv2_encode_decode_roundtrip():
    arr, gt = _linear_grid()
    buf = ntv2_encode(arr, gt, system_f="NAD27", system_t="NAD83")
    back, meta = ntv2_decode(buf)
    np.testing.assert_allclose(back, arr.astype(np.float32))
    np.testing.assert_allclose(meta["gt"], gt, atol=1e-12)


def test_linear_field_interpolates_exactly():
    _linear_grid()
    lon = np.array([-100.3, -95.77, -108.1, -90.01])
    lat = np.array([30.2, 41.9, 26.5, 44.99])
    dlat, dlon, ok = DS.interp_shift("t_linear", lon, lat)
    assert ok.all()
    np.testing.assert_allclose(dlat, 0.5 + 0.01 * lon + 0.02 * lat,
                               atol=1e-9)
    np.testing.assert_allclose(dlon, -1.2 + 0.03 * lon - 0.015 * lat,
                               atol=1e-9)


def test_grid_shift_forward_inverse_and_passthrough():
    _linear_grid()
    lon = np.array([-100.3, -95.77, -108.1])
    lat = np.array([30.2, 41.9, 26.5])
    lo2, la2 = DS.grid_shift(lon, lat, "t_linear")
    assert (np.abs(lo2 - lon) * 3600 > 0.5).all()  # shift actually applied
    lo3, la3 = DS.grid_shift(lo2, la2, "t_linear", inverse=True)
    np.testing.assert_allclose(lo3, lon, atol=1e-10)
    np.testing.assert_allclose(la3, lat, atol=1e-10)
    # outside the grid: identity
    lo, la = DS.grid_shift(np.array([10.0]), np.array([0.0]), "t_linear")
    assert lo[0] == 10.0 and la[0] == 0.0


def test_projcrs_nadgrids_pipeline():
    _linear_grid()
    lon = np.array([-100.0])
    lat = np.array([35.0])
    crs27 = ProjCRS("+proj=longlat +datum=NAD27 +nadgrids=t_linear")
    lon84, lat84 = crs27.to_wgs84(lon, lat)
    dlon = -1.2 + 0.03 * -100.0 - 0.015 * 35.0
    dlat = 0.5 + 0.01 * -100.0 + 0.02 * 35.0
    np.testing.assert_allclose((lon - lon84) * 3600, dlon, atol=1e-6)
    np.testing.assert_allclose((lat84 - lat) * 3600, dlat, atol=1e-6)
    rlon, rlat = crs27.from_wgs84(lon84, lat84)
    np.testing.assert_allclose(rlon, lon, atol=1e-10)
    np.testing.assert_allclose(rlat, lat, atol=1e-10)
    # and through transform_any string composition
    o, a = transform_any("+proj=longlat +datum=NAD27 +nadgrids=t_linear",
                         "EPSG:4326", lon, lat)
    np.testing.assert_allclose([o, a], [lon84, lat84])


def test_projcrs_projected_nadgrids_composition():
    """tmerc on clrk66 + grid shift: the projected path composes
    inverse-project -> grid -> WGS84 and round-trips."""
    _linear_grid()
    src = ("+proj=tmerc +lon_0=-99 +k_0=0.9996 +x_0=500000 "
           "+ellps=clrk66 +nadgrids=t_linear")
    p = ProjCRS(src)
    x = np.array([500000.0, 480000.0])
    y = np.array([3900000.0, 4400000.0])
    lon84, lat84 = p.to_wgs84(x, y)
    assert (-110 < lon84).all() and (lon84 < -90).all()
    assert (25 < lat84).all() and (lat84 < 45).all()
    x2, y2 = p.from_wgs84(lon84, lat84)
    np.testing.assert_allclose(x2, x, atol=1e-4)
    np.testing.assert_allclose(y2, y, atol=1e-4)


def test_helmert_epsg_9606_published_vector():
    """EPSG Guidance Note 7-2 position-vector example (WGS72->WGS84):
    tz=4.5 m, rz=0.554\", ds=0.219 ppm maps the given geocentric
    coordinates onto the published outputs within a centimetre."""
    xyz = (3657660.66, 255768.55, 5201382.11)
    want = (3657660.78, 255778.43, 5201387.75)
    tow = [0.0, 0.0, 4.5, 0.0, 0.0, 0.554, 0.219]
    got = helmert(*xyz, tow)
    np.testing.assert_allclose(got, want, atol=0.01)
    back = helmert_inverse(*got, tow)
    np.testing.assert_allclose(back, xyz, atol=1e-6)


def test_towgs84_geodetic_roundtrip_nad27_approx():
    """3-param CONUS-average NAD27 Helmert (-8,160,176): shift size is
    in the documented 10-100 m range and the round trip closes."""
    crs27 = ProjCRS("+proj=longlat +ellps=clrk66 +towgs84=-8,160,176")
    lon = np.array([-100.0])
    lat = np.array([35.0])
    lon84, lat84 = crs27.to_wgs84(lon, lat)
    dist_m = np.hypot((lon84 - lon) * 111320 * np.cos(np.radians(35)),
                      (lat84 - lat) * 110574)
    assert 10.0 < dist_m[0] < 100.0
    rlon, rlat = crs27.from_wgs84(lon84, lat84)
    np.testing.assert_allclose([rlon[0], rlat[0]], [lon[0], lat[0]],
                               atol=1e-9)


def test_nadgrids_precedes_towgs84():
    _linear_grid()
    with_both = ProjCRS(
        "+proj=longlat +ellps=clrk66 +towgs84=-8,160,176 "
        "+nadgrids=t_linear")
    grid_only = ProjCRS("+proj=longlat +ellps=clrk66 +nadgrids=t_linear")
    lon, lat = np.array([-100.0]), np.array([35.0])
    np.testing.assert_array_equal(with_both.to_wgs84(lon, lat),
                                  grid_only.to_wgs84(lon, lat))


def test_register_grid_validation():
    with pytest.raises(ValueError):
        DS.register_grid("bad", np.zeros((1, 5, 2)), (0, 1, 0, 0, 0, -1))


def test_geocentric_roundtrip():
    lon = np.array([-100.0, 10.0])
    lat = np.array([35.0, -45.0])
    x, y, z = geodetic_to_geocentric(lon, lat, 6378137.0, 1 / 298.257223563)
    lo, la = geocentric_to_geodetic(x, y, z, 6378137.0, 1 / 298.257223563)
    np.testing.assert_allclose([lo, la], [lon, lat], atol=1e-9)
