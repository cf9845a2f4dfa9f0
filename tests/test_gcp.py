"""GCP transformers (raster/gcp.py): polynomial orders 1-3 + TPS vs
exact analytic transforms, and the GCP warp path vs the affine warp."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.raster import gcp as G
from gdal_spark.raster import kernels as K
from gdal_spark.raster import warp as WP

rng = np.random.default_rng(7)


def _grid_gcps(fn, w=100, h=80, n=6):
    px, py = np.meshgrid(np.linspace(0, w, n), np.linspace(0, h, n))
    px, py = px.ravel(), py.ravel()
    gx, gy = fn(px, py)
    return np.stack([px, py, gx, gy], axis=1)


def test_poly1_recovers_affine_exactly():
    aff = lambda x, y: (10.0 + 0.5 * x - 0.1 * y, 200.0 + 0.02 * x + 0.4 * y)
    gcps = _grid_gcps(aff)
    tr = G.GCPTransformer(gcps, "poly1")
    assert tr.rms < 1e-9
    qx, qy = rng.uniform(0, 100, 50), rng.uniform(0, 80, 50)
    gx, gy = tr.pixel_to_geo(qx, qy)
    ex, ey = aff(qx, qy)
    np.testing.assert_allclose(gx, ex, atol=1e-9)
    np.testing.assert_allclose(gy, ey, atol=1e-9)
    # inverse model round-trips
    bx, by = tr.geo_to_pixel(gx, gy)
    np.testing.assert_allclose(bx, qx, atol=1e-7)
    np.testing.assert_allclose(by, qy, atol=1e-7)


def test_poly2_poly3_recover_matching_degree():
    quad = lambda x, y: (x + 0.001 * x * y, y + 0.0005 * x * x)
    cub = lambda x, y: (x + 1e-6 * x ** 3, y + 1e-6 * x * y * y)
    for fn, method in [(quad, "poly2"), (cub, "poly3")]:
        tr = G.GCPTransformer(_grid_gcps(fn), method)
        assert tr.rms < 1e-6
        qx, qy = rng.uniform(5, 95, 40), rng.uniform(5, 75, 40)
        gx, gy = tr.pixel_to_geo(qx, qy)
        ex, ey = fn(qx, qy)
        np.testing.assert_allclose(gx, ex, atol=1e-6)
        np.testing.assert_allclose(gy, ey, atol=1e-6)


def test_poly_insufficient_gcps_raises():
    gcps = np.array([[0, 0, 0, 0], [1, 0, 1, 0], [0, 1, 0, 1], [1, 1, 1, 1]], float)
    with pytest.raises(ValueError):
        G.fit_poly(gcps[:, :2], gcps[:, 2:], order=2)


def test_tps_exact_at_gcps_and_affine_reproduction():
    # irregular control points with a non-polynomial warp
    n = 25
    px = rng.uniform(0, 100, n)
    py = rng.uniform(0, 80, n)
    gx = px + 3.0 * np.sin(py / 15.0)
    gy = py + 2.0 * np.cos(px / 20.0)
    gcps = np.stack([px, py, gx, gy], axis=1)
    tr = G.GCPTransformer(gcps, "tps")
    ex, ey = tr.pixel_to_geo(px, py)
    np.testing.assert_allclose(ex, gx, atol=1e-8)  # exact interpolation
    np.testing.assert_allclose(ey, gy, atol=1e-8)
    # pure affine data -> TPS reduces to the affine map everywhere
    aff = lambda x, y: (5.0 + 2.0 * x - 0.5 * y, -3.0 + 0.25 * x + 1.5 * y)
    tr2 = G.GCPTransformer(_grid_gcps(aff, n=4), "tps")
    qx, qy = rng.uniform(10, 90, 30), rng.uniform(10, 70, 30)
    ax, ay = tr2.pixel_to_geo(qx, qy)
    ex2, ey2 = aff(qx, qy)
    np.testing.assert_allclose(ax, ex2, atol=1e-6)
    np.testing.assert_allclose(ay, ey2, atol=1e-6)


def test_tps_interpolates_smooth_warp_between_gcps():
    fn = lambda x, y: (x + 3.0 * np.sin(y / 25.0), y + 2.0 * np.cos(x / 30.0))
    tr = G.GCPTransformer(_grid_gcps(fn, n=9), "tps")
    qx, qy = rng.uniform(10, 90, 100), rng.uniform(10, 70, 100)
    gx, gy = tr.pixel_to_geo(qx, qy)
    ex, ey = fn(qx, qy)
    assert np.max(np.hypot(gx - ex, gy - ey)) < 0.05  # sub-pixel between GCPs


def test_warp_gcp_poly1_matches_affine_warp():
    """GCPs sampled from a plain geotransform: the GCP warp must equal the
    identity-CRS warp onto the same grid."""
    arr = rng.integers(0, 255, (40, 50), dtype=np.uint8).astype(np.float64)
    src_gt = (500.0, 2.0, 0.0, 300.0, 0.0, -1.5)

    def fwd(px, py):
        return K.gt_pixel_to_geo(src_gt, px, py)

    gcps = _grid_gcps(fwd, w=50, h=40, n=4)
    out, dst_gt = G.warp_array_gcp(arr, gcps, "poly1", resample="bilinear")
    ref = WP.warp_array(
        arr, src_gt, dst_gt, out.shape[0], out.shape[1],
        src_crs="EPSG:0", dst_crs="EPSG:0", resample="bilinear", approx_grid=0,
    )
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_warp_gcp_tps_runs_and_covers():
    arr = np.full((30, 30), 7.0)
    fn = lambda x, y: (x * 10.0 + 0.5 * np.sin(y), 400.0 - y * 10.0)
    gcps = _grid_gcps(fn, w=30, h=30, n=5)
    out, dst_gt = G.warp_array_gcp(arr, gcps, "tps", resample="near", nodata=-1.0)
    # interior of the output must be covered by source data
    interior = out[5:-5, 5:-5]
    assert (interior == 7.0).mean() > 0.99
