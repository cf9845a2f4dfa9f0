"""RPC transformer parity (alg/gdal_rpc.cpp) against the reference's own
autotest goldens (gcore/transformer.py test_transformer_5, using the
rpc.vrt RPC00B metadata verbatim): iterative pixel->lonlat at threshold
0.05, z=30 variant, RPC_HEIGHT=30 variant, and forward/inverse round
trips. Forward results are asserted at the autotest's 1e-6 degrees."""

import numpy as np
import pytest

from gdal_spark.raster.rpc import RPCInfo, RPCTransformer, rpc_transform_point

RPC_MD = {
    "LINE_OFF": "16201", "SAMP_OFF": "15184", "HEIGHT_OFF": "97",
    "LAT_OFF": "39.7792", "LONG_OFF": "125.7510",
    "LINE_SCALE": "16480", "SAMP_SCALE": "15217", "HEIGHT_SCALE": "501",
    "LAT_SCALE": "0.0900", "LONG_SCALE": "0.1096",
    "LINE_NUM_COEFF": (
        "+5.105608E-04 -2.921055E-02 -1.010407E+00 -1.743729E-02 "
        "-6.604239E-05 -7.871396E-05 +3.027877E-04 -4.323587E-04 "
        "-2.624751E-04 +6.186490E-06 +1.084676E-06 +5.389738E-05 "
        "+4.145232E-06 +3.911486E-07 +1.772434E-05 +3.302960E-06 "
        "+3.006106E-06 +1.662606E-05 +6.051677E-06 -2.657667E-08"
    ),
    "LINE_DEN_COEFF": (
        "+1.000000E+00 -9.652128E-05 +2.488346E-04 +3.089019E-04 "
        "-2.120170E-06 +4.117913E-07 +1.370009E-06 +1.357281E-05 "
        "-4.174324E-06 -3.146787E-06 -7.724587E-06 +3.524480E-04 "
        "-1.303224E-05 -8.507679E-07 -1.670972E-05 +6.781061E-06 "
        "+5.602262E-07 +1.161421E-05 +4.681872E-06 +5.593931E-08"
    ),
    "SAMP_NUM_COEFF": (
        "-2.429563E-04 +1.028320E+00 -3.360972E-02 +3.519600E-03 "
        "-6.568341E-04 +5.951139E-04 -3.875716E-04 +1.260622E-04 "
        "-5.273817E-05 -4.418981E-06 -3.520581E-06 -2.502760E-04 "
        "-4.167704E-05 -5.973233E-05 -1.438949E-04 +7.603041E-06 "
        "+2.358136E-06 -2.275274E-05 +1.602657E-06 -1.716541E-07"
    ),
    "SAMP_DEN_COEFF": (
        "+1.000000E+00 +7.765620E-05 +6.568707E-04 -6.270621E-04 "
        "+5.163170E-05 +6.979463E-06 +2.476334E-07 +1.083558E-04 "
        "-4.043734E-05 -5.819288E-05 +1.778201E-07 +5.665202E-05 "
        "+6.927205E-06 +6.793485E-07 +3.604209E-05 -4.057103E-07 "
        "-8.291254E-07 +1.010650E-05 -2.875552E-06 +5.142751E-08"
    ),
}


def test_transformer_5_forward_golden():
    tr = RPCTransformer(RPC_MD, pix_err_threshold=0.05)
    lon, lat = tr.pixel_to_lonlat(20.5, 10.5)
    assert lon == pytest.approx(125.64830100509131, abs=1e-6)
    assert lat == pytest.approx(39.869433991997553, abs=1e-6)
    # reverse within the pixel-error threshold
    px, ln = tr.lonlat_to_pixel(lon, lat)
    assert px == pytest.approx(20.5, abs=0.05)
    assert ln == pytest.approx(10.5, abs=0.05)


def test_transformer_5_height_30():
    tr = RPCTransformer(RPC_MD, pix_err_threshold=0.05)
    lon, lat = tr.pixel_to_lonlat(20.5, 10.5, 30)
    assert lon == pytest.approx(125.64828521533849, abs=1e-6)
    assert lat == pytest.approx(39.869345204440144, abs=1e-6)
    px, ln = tr.lonlat_to_pixel(lon, lat, 30)
    assert px == pytest.approx(20.5, abs=0.05)
    assert ln == pytest.approx(10.5, abs=0.05)


def test_transformer_5_rpc_height_option():
    tr = RPCTransformer(RPC_MD, rpc_height=30)
    lon, lat = tr.pixel_to_lonlat(20.5, 10.5)
    assert lon == pytest.approx(125.64828521533849, abs=1e-6)
    assert lat == pytest.approx(39.869345204440144, abs=1e-6)
    px, ln = tr.lonlat_to_pixel(lon, lat)
    assert px == pytest.approx(20.5, abs=0.1)
    assert ln == pytest.approx(10.5, abs=0.1)


def test_rpc_direct_is_exact_fixed_point():
    """The direct (lonlat -> pixel) evaluation is the exact model: the
    iterative inverse's converged point back-projects to the target
    within the threshold."""
    rpc = RPCInfo(RPC_MD)
    tr = RPCTransformer(RPC_MD, pix_err_threshold=0.001)
    for target in [(100.25, 200.75), (1500.0, 900.5), (20.5, 10.5)]:
        lon, lat = tr.pixel_to_lonlat(*target)
        bx, by = rpc_transform_point(rpc, lon, lat, 0.0)
        assert bx == pytest.approx(target[0], abs=0.001)
        assert by == pytest.approx(target[1], abs=0.001)


def test_rpc_vectorized():
    rpc = RPCInfo(RPC_MD)
    lons = np.array([125.70, 125.75, 125.80])
    lats = np.array([39.75, 39.78, 39.81])
    hs = np.zeros(3)
    px, ln = rpc_transform_point(rpc, lons, lats, hs)
    for i in range(3):
        p1, l1 = rpc_transform_point(rpc, lons[i], lats[i], 0.0)
        # vectorized and scalar numpy paths may differ by a couple ulp
        assert float(px[i]) == pytest.approx(float(p1), rel=1e-12)
        assert float(ln[i]) == pytest.approx(float(l1), rel=1e-12)


# ---------------------------------------------------------------------------
# RPC_DEM (gcore/transformer.py test_transformer_5 DEM sections)
# ---------------------------------------------------------------------------


def _dem_utm52(pixel_size=200.0):
    """The autotest's /vsimem/dem.tif: 100x100 EPSG:32652, Fill(15),
    gt [213300, ps, 0, 4418700, 0, -ps]."""
    dem = np.full((100, 100), 15.0)
    gt = (213300.0, pixel_size, 0.0, 4418700.0, 0.0, -pixel_size)
    return dem, gt


def test_transformer_5_rpc_dem_height_scale():
    """RPC_DEM + RPC_HEIGHT_SCALE=2 (expectations (4)): constant DEM 15
    at scale 2 == RPC_HEIGHT 30."""
    dem, gt = _dem_utm52()
    tr = RPCTransformer(
        RPC_MD, dem=dem, dem_gt=gt, dem_srs="EPSG:32652",
        rpc_height_scale=2.0,
    )
    lon, lat = tr.pixel_to_lonlat(20.5, 10.5)
    assert lon == pytest.approx(125.64828521533849, abs=1e-6)
    assert lat == pytest.approx(39.869345204440144, abs=1e-6)
    px, ln = tr.lonlat_to_pixel(lon, lat)
    assert px == pytest.approx(20.5, abs=0.05)
    assert ln == pytest.approx(10.5, abs=0.05)


@pytest.mark.parametrize("interp", ["cubic", "near", "bilinear"])
def test_transformer_5_rpc_dem_interpolation(interp):
    """RPC_DEMINTERPOLATION variants (expectations (5)/(6)): on the
    constant DEM every kernel yields the RPC_HEIGHT=30 answer at the
    autotest's 1e-6 deg."""
    dem, gt = _dem_utm52()
    tr = RPCTransformer(
        RPC_MD, dem=dem, dem_gt=gt, dem_srs="EPSG:32652",
        rpc_height_scale=2.0, dem_interp=interp,
    )
    lon, lat = tr.pixel_to_lonlat(20.5, 10.5)
    assert lon == pytest.approx(125.64828521533849, abs=1e-6)
    assert lat == pytest.approx(39.869345204440144, abs=1e-6)
    px, ln = tr.lonlat_to_pixel(lon, lat)
    assert px == pytest.approx(20.5, abs=0.05)
    assert ln == pytest.approx(10.5, abs=0.05)


def test_transformer_5_rpc_dem_outside_extent_errors():
    """Outside the DEM extent the default behaviour is an error in both
    directions (transformer.py:358-366)."""
    dem, gt = _dem_utm52()
    tr = RPCTransformer(
        RPC_MD, dem=dem, dem_gt=gt, dem_srs="EPSG:32652",
        rpc_height_scale=2.0,
    )
    with pytest.raises(ValueError):
        tr.pixel_to_lonlat(40000, 0)
    with pytest.raises(ValueError):
        tr.lonlat_to_pixel(125, 40)


def test_transformer_5_rpc_dem_missing_value():
    """RPC_DEM_MISSING_VALUE=0 admits off-DEM points at height 0
    (transformer.py:369-399, 1m-pixel DEM variant)."""
    dem, gt = _dem_utm52(pixel_size=1.0)
    tr = RPCTransformer(
        RPC_MD, dem=dem, dem_gt=gt, dem_srs="EPSG:32652",
        rpc_height_scale=2.0, dem_missing_value=0.0,
    )
    lon, lat = tr.pixel_to_lonlat(-99.5, 0.5)
    assert lon == pytest.approx(125.64746155942839, abs=1e-6)
    assert lat == pytest.approx(39.869506789921168, abs=1e-6)
    px, ln = tr.lonlat_to_pixel(lon, lat)
    assert px == pytest.approx(-99.5, abs=0.05)
    assert ln == pytest.approx(0.5, abs=0.05)


def test_rpc_dem_terrain_height_actually_used():
    """A sloped DEM changes the answer: the converged lonlat must
    back-project through the height AT that lonlat (self-consistency
    with a non-constant terrain)."""
    dem = np.add.outer(np.zeros(100), np.linspace(50.0, 450.0, 100))
    gt = (213300.0, 200.0, 0.0, 4418700.0, 0.0, -200.0)
    tr = RPCTransformer(RPC_MD, dem=dem, dem_gt=gt, dem_srs="EPSG:32652")
    lon, lat = tr.pixel_to_lonlat(20.5, 10.5)
    h, ok, _, _ = tr._height_at_lonlat(lon, lat)
    assert ok
    assert h > 0.0
    bx, by = rpc_transform_point(RPCInfo(RPC_MD), lon, lat, h)
    assert bx == pytest.approx(20.5, abs=0.1)
    assert by == pytest.approx(10.5, abs=0.1)
    # and the flat-earth answer differs
    lon0, lat0 = RPCTransformer(RPC_MD).pixel_to_lonlat(20.5, 10.5)
    assert abs(lon - lon0) > 1e-7 or abs(lat - lat0) > 1e-7


# ---------------------------------------------------------------------------
# RPC orthorectification (warp_array_rpc)
# ---------------------------------------------------------------------------


def test_warp_rpc_constant_dem_equals_rpc_height():
    """gdalwarp -rpc with a constant DEM at HEIGHT_SCALE=2 must produce
    the same raster as RPC_HEIGHT=30 (the transformer_5 equivalence)."""
    from gdal_spark.raster.gcp import warp_array_rpc

    rng = np.arange(64)
    arr = ((rng[:, None] * 37 + rng[None, :] * 101) % 97).astype(np.uint8)
    dem, gt = _dem_utm52()
    # a fixed output window over the 64x64 source corner (the rpc.vrt
    # scene spans ~7.2e-6 deg/px)
    dst_gt = (125.64800, 5e-6, 0.0, 39.86950, 0.0, -5e-6)
    a, _ = warp_array_rpc(
        arr, RPC_MD, resample="near", dst_gt=dst_gt, out_size=(80, 60),
        dem=dem, dem_gt=gt, dem_srs="EPSG:32652", rpc_height_scale=2.0,
    )
    b, _ = warp_array_rpc(
        arr, RPC_MD, resample="near", dst_gt=dst_gt, out_size=(80, 60),
        rpc_height=30.0,
    )
    assert np.array_equal(a, b)
    assert a.any()


def test_warp_rpc_inverse_consistency():
    """Each non-nodata output pixel equals the source pixel the direct
    RPC maps its center to (near resampling)."""
    from gdal_spark.raster.gcp import warp_array_rpc
    from gdal_spark.raster.rpc import RPCTransformer

    rng = np.arange(64)
    arr = ((rng[:, None] * 37 + rng[None, :] * 101) % 97).astype(np.uint8)
    dst_gt = (125.64800, 5e-6, 0.0, 39.86950, 0.0, -5e-6)
    out, _ = warp_array_rpc(
        arr, RPC_MD, resample="near", dst_gt=dst_gt, out_size=(40, 30),
        rpc_height=30.0,
    )
    tr = RPCTransformer(RPC_MD, rpc_height=30.0)
    hits = 0
    for oy in range(30):
        for ox in range(40):
            lon = dst_gt[0] + (ox + 0.5) * dst_gt[1]
            lat = dst_gt[3] + (oy + 0.5) * dst_gt[5]
            px, ln = tr.lonlat_to_pixel(lon, lat)
            ix, iy = int(round(px - 0.5)), int(round(ln - 0.5))
            if 0 <= ix < 64 and 0 <= iy < 64:
                assert out[oy, ox] == arr[iy, ix]
                hits += 1
    assert hits > 100


def test_warp_rpc_suggested_grid():
    """Without dst_gt the output grid comes from the border sample and
    covers the source footprint."""
    from gdal_spark.raster.gcp import warp_array_rpc

    arr = np.full((32, 32), 7, dtype=np.uint8)
    out, gt = warp_array_rpc(arr, RPC_MD, resample="near", rpc_height=0.0)
    assert out.shape[0] >= 16 and out.shape[1] >= 16
    assert (out == 7).mean() > 0.3  # footprint fills a decent share
    assert gt[1] > 0 and gt[5] < 0
