"""Homography transformer parity (alg/gdal_homography.cpp) against the
reference's own autotest expectations (autotest/alg/gcps2homography.py
tests 1-8): affine fallbacks (<4 GCPs), exact 4-point DLT, identity,
vertex-order independence, the 6-GCP least-squares golden vector, and
failure on a single GCP. Plus inverse round trips and the warp path."""

import numpy as np
import pytest

from gdal_spark.raster.homography import (
    apply_homography,
    compose_homographies,
    gcps_to_homography,
    inv_homography,
)


def _check_gcps(h, gcps, tol=1e-6):
    g = np.asarray(gcps, float)
    X, Y = apply_homography(h, g[:, 0], g[:, 1])
    assert np.allclose(X, g[:, 2], atol=tol * np.abs(g[:, 2]).max())
    assert np.allclose(Y, g[:, 3], atol=tol * np.abs(g[:, 3]).max())


def test_gcps2h_1_three_points_affine():
    h = gcps_to_homography(
        [
            (0.0, 0.0, 400000, 370000),
            (100.0, 0.0, 410000, 370000),
            (100.0, 200.0, 410000, 368000),
        ]
    )
    want = (400000.0, 100.0, 0.0, 370000.0, 0.0, -10.0, 1.0, 0.0, 0.0)
    assert h == pytest.approx(want, abs=1e-6)


def test_gcps2h_2_four_points_near_affine():
    gcps = [
        (0.0, 0.0, 400000, 370000),
        (100.0, 0.0, 410000, 370000),
        (100.0, 200.0, 410000, 368000),
        (0.0, 200.0, 400000, 368000.01),
    ]
    _check_gcps(gcps_to_homography(gcps), gcps)


def test_gcps2h_3_true_projective():
    gcps = [
        (0.0, 0.0, 400000, 370000),
        (100.0, 0.0, 410000, 370000),
        (100.0, 200.0, 410000, 368000),
        (0.0, 200.0, 400000, 360000),
    ]
    h = gcps_to_homography(gcps)
    _check_gcps(h, gcps)
    assert abs(h[7]) + abs(h[8]) > 0  # genuinely projective


def test_gcps2h_4_single_gcp_fails():
    with pytest.raises(ValueError):
        gcps_to_homography([(0.0, 0.0, 400000, 370000)])


def test_gcps2h_5_two_gcp_diagonal():
    h = gcps_to_homography(
        [(0.0, 0.0, 400000, 370000), (100.0, 200.0, 410000, 368000)]
    )
    want = (400000.0, 100.0, 0.0, 370000.0, 0.0, -10.0, 1.0, 0.0, 0.0)
    assert h == pytest.approx(want, abs=1e-6)


def test_gcps2h_6_7_identity_any_order():
    sq = [
        (400000, 370000, 400000, 370000),
        (410000, 370000, 410000, 370000),
        (410000, 368000, 410000, 368000),
        (400000, 368000, 400000, 368000),
    ]
    want = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0, 1.0, 0.0, 0.0)
    assert gcps_to_homography(sq) == pytest.approx(want, abs=1e-6)
    shuffled = [sq[0], sq[2], sq[1], sq[3]]
    assert gcps_to_homography(shuffled) == pytest.approx(want, abs=1e-6)


def test_gcps2h_8_least_squares_golden():
    gcps = [
        (0.01, 0.04, -87.05528672907, 39.22759504228),
        (0.01, 2688.02, -86.97079900719, 39.27075713986),
        (4031.99, 2688.04, -87.05960736744, 39.37569137000),
        (1988.16, 1540.80, -87.055069186699924, 39.304963106777514),
        (1477.41, 2400.83, -87.013419295885001, 39.304705030894979),
        (1466.02, 2376.92, -87.013906298363295, 39.304056190007913),
    ]
    want = (
        -86.9154734797766,
        -0.000822802708802448,
        0.0016903358388202546,
        39.16439874542655,
        0.00038733423466157704,
        -0.0007330693484379306,
        0.9983801902671235,
        9.207539714141043e-06,
        -1.9069099634950863e-05,
    )
    assert gcps_to_homography(gcps) == pytest.approx(want, abs=1e-5)


def test_inverse_roundtrip_and_compose():
    gcps = [
        (0.0, 0.0, 400000, 370000),
        (100.0, 0.0, 410000, 370000),
        (100.0, 200.0, 410000, 368000),
        (0.0, 200.0, 400000, 360000),
    ]
    h = gcps_to_homography(gcps)
    hi = inv_homography(h)
    xs = np.linspace(3, 97, 11)
    ys = np.linspace(7, 193, 11)
    X, Y = apply_homography(h, xs, ys)
    x2, y2 = apply_homography(hi, X, Y)
    assert np.allclose(x2, xs, atol=1e-8)
    assert np.allclose(y2, ys, atol=1e-8)
    # compose(h, inv(h)) == identity up to scale
    ident = compose_homographies(h, hi)
    X3, Y3 = apply_homography(ident, xs, ys)
    assert np.allclose(X3, xs, atol=1e-8) and np.allclose(Y3, ys, atol=1e-8)
    # affine fast path
    ha = [10.0, 2.0, 0.0, 50.0, 0.0, -2.0, 1.0, 0.0, 0.0]
    hai = inv_homography(ha)
    assert hai[6:] == [1.0, 0.0, 0.0]
    X4, Y4 = apply_homography(ha, xs, ys)
    x4, y4 = apply_homography(hai, X4, Y4)
    assert np.allclose(x4, xs) and np.allclose(y4, ys)


def test_warp_with_homography_method():
    from gdal_spark.raster.gcp import warp_array_gcp

    src = (np.arange(256).reshape(16, 16) % 97).astype(np.uint8)
    # exact affine homography GCPs: warp output must equal the source
    gcps = np.array(
        [
            (px, py, 2.0 * px + 10.0, -2.0 * py + 50.0)
            for px, py in [(0, 0), (16, 0), (0, 16), (16, 16), (8, 4)]
        ],
        dtype=np.float64,
    )
    out, gt = warp_array_gcp(
        src, gcps, method="homography", resample="near", out_res=2.0
    )
    assert out.shape == src.shape
    assert np.array_equal(out, src)
    assert gt == pytest.approx((10.0, 2.0, 0.0, 50.0, 0.0, -2.0), abs=1e-9)
