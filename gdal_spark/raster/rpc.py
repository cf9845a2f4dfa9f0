"""RPC (Rational Polynomial Coefficients, RPC00B) transformer —
alg/gdal_rpc.cpp.

* ``rpc_transform_point`` — (long, lat, height) -> (pixel, line):
  dateline-adjusted normalization (RPCTransformPoint:358-470), the
  20-term RPC00B monomial basis in GDAL's exact order
  (RPCComputeTerms:192-217), numerator/denominator rational evaluation,
  then de-normalization by SAMP/LINE scale+offset.
* ``RPCTransformer`` — the full transformer:
  - reference-point affine seed (GDALCreateRPCTransformerV2:995-1090):
    MIN/MAX long/lat midpoint when provided else LONG/LAT_OFF, the
    "daft result" fallback, finite-difference direction vectors at
    dfLLDelta = 1e-4 evaluated at the reference height, inverted to
    the pixel/line -> long/lat seed geotransform;
  - forward (pixel -> long/lat): RPCInverseTransformPoint's iterative
    refinement — affine initial guess, error = back-projected pixel
    delta, convergence at pix_err_threshold (default 0.1), max 10
    iterations without DEM;
  - inverse (long/lat -> pixel): direct evaluation with
    height = z + height_offset (RPC_HEIGHT), heights scaled by
    RPC_HEIGHT_SCALE applying to DEM heights only (none here).
  RPC_DEM (terrain-driven height) is NOT implemented — documented
  deviation; fixed RPC_HEIGHT covers the autotest's non-DEM cases.
"""

from __future__ import annotations

import numpy as np


class RPCInfo:
    """RPC00B metadata (GDALRPCInfoV2): offsets/scales + 4x20 coeffs."""

    def __init__(self, md: dict):
        g = lambda k: float(md[k])  # noqa: E731
        self.line_off = g("LINE_OFF")
        self.samp_off = g("SAMP_OFF")
        self.lat_off = g("LAT_OFF")
        self.long_off = g("LONG_OFF")
        self.height_off = g("HEIGHT_OFF")
        self.line_scale = g("LINE_SCALE")
        self.samp_scale = g("SAMP_SCALE")
        self.lat_scale = g("LAT_SCALE")
        self.long_scale = g("LONG_SCALE")
        self.height_scale = g("HEIGHT_SCALE")

        def coeffs(k):
            v = md[k]
            vals = (
                [float(x) for x in v.split()]
                if isinstance(v, str)
                else [float(x) for x in v]
            )
            if len(vals) != 20:
                raise ValueError(f"{k} needs 20 coefficients")
            return np.array(vals)

        self.line_num = coeffs("LINE_NUM_COEFF")
        self.line_den = coeffs("LINE_DEN_COEFF")
        self.samp_num = coeffs("SAMP_NUM_COEFF")
        self.samp_den = coeffs("SAMP_DEN_COEFF")
        self.min_long = float(md.get("MIN_LONG", -180.0))
        self.max_long = float(md.get("MAX_LONG", 180.0))
        self.min_lat = float(md.get("MIN_LAT", -90.0))
        self.max_lat = float(md.get("MAX_LAT", 90.0))


def rpc_compute_terms(L, P, H):
    """RPC00B 20-term basis, GDAL's exact order (RPCComputeTerms)."""
    one = np.ones_like(L)
    return np.stack(
        [
            one, L, P, H,
            L * P, L * H, P * H, L * L, P * P, H * H,
            L * P * H, L * L * L, L * P * P, L * H * H, L * L * P,
            P * P * P, P * H * H, L * L * H, P * P * H, H * H * H,
        ]
    )


def rpc_transform_point(rpc: RPCInfo, lon, lat, height):
    """(long, lat, height) -> (pixel, line), vectorized."""
    lon = np.asarray(lon, float)
    lat = np.asarray(lat, float)
    height = np.asarray(height, float)
    diff_long = lon - rpc.long_off
    diff_long = np.where(diff_long < -270, diff_long + 360, diff_long)
    diff_long = np.where(diff_long > 270, diff_long - 360, diff_long)
    L = diff_long / rpc.long_scale
    P = (lat - rpc.lat_off) / rpc.lat_scale
    H = (height - rpc.height_off) / rpc.height_scale
    t = rpc_compute_terms(L, P, H)
    samp = np.tensordot(rpc.samp_num, t, axes=1) / np.tensordot(
        rpc.samp_den, t, axes=1
    )
    line = np.tensordot(rpc.line_num, t, axes=1) / np.tensordot(
        rpc.line_den, t, axes=1
    )
    # RPCs use center-of-upper-left-pixel = (0,0); GDAL pixel space uses
    # top-left corner = (0,0) (RPCTransformPoint:460-466)
    return (
        samp * rpc.samp_scale + rpc.samp_off + 0.5,
        line * rpc.line_scale + rpc.line_off + 0.5,
    )


class RPCTransformer:
    def __init__(
        self,
        rpc: RPCInfo | dict,
        pix_err_threshold: float = 0.1,
        max_iterations: int = 10,
        rpc_height: float = 0.0,
        rpc_height_scale: float = 1.0,
    ):
        self.rpc = rpc if isinstance(rpc, RPCInfo) else RPCInfo(rpc)
        self.pix_err_threshold = (
            pix_err_threshold if pix_err_threshold > 0 else 0.1
        )
        self.max_iterations = max_iterations
        self.height_offset = float(rpc_height)
        self.height_scale = float(rpc_height_scale)
        self._setup_seed()

    # -- GDALCreateRPCTransformerV2:995-1090 ---------------------------------
    def _setup_seed(self):
        r = self.rpc
        ref_pixel = ref_line = -1.0
        ref_long = ref_lat = 0.0
        # GDAL tries the full direct transform first (z=0 above ground ->
        # height = height offset via GetHeightAtLongLat), falling back to
        # RPCTransformPoint at raw height 0 only on failure (:1015-1055)
        if r.min_long != -180.0 or r.max_long != 180.0:
            ref_long = (r.min_long + r.max_long) * 0.5
            ref_lat = (r.min_lat + r.max_lat) * 0.5
            ref_pixel, ref_line = rpc_transform_point(
                r, ref_long, ref_lat, self.height_offset
            )
        if (
            ref_pixel < 0.0 or ref_line < 0.0
            or ref_pixel > 100000 or ref_line > 100000
        ):
            ref_long, ref_lat = r.long_off, r.lat_off
            ref_pixel, ref_line = rpc_transform_point(
                r, ref_long, ref_lat, self.height_offset
            )
        # without a DEM, GDALRPCGetHeightAtLongLat == height offset
        self.ref_z = self.height_offset

        d = 0.0001
        gt = [0.0] * 6
        px1, ln1 = rpc_transform_point(r, ref_long + d, ref_lat, self.ref_z)
        gt[1] = (float(px1) - float(ref_pixel)) / d
        gt[4] = (float(ln1) - float(ref_line)) / d
        px2, ln2 = rpc_transform_point(r, ref_long, ref_lat + d, self.ref_z)
        gt[2] = (float(px2) - float(ref_pixel)) / d
        gt[5] = (float(ln2) - float(ref_line)) / d
        gt[0] = float(ref_pixel) - gt[1] * ref_long - gt[2] * ref_lat
        gt[3] = float(ref_line) - gt[4] * ref_long - gt[5] * ref_lat
        det = gt[1] * gt[5] - gt[2] * gt[4]
        if abs(det) < 1e-15:
            raise ValueError("cannot invert RPC seed geotransform")
        inv_det = 1.0 / det
        self.pl_to_ll = [
            (gt[2] * gt[3] - gt[0] * gt[5]) * inv_det,
            gt[5] * inv_det,
            -gt[2] * inv_det,
            (-gt[1] * gt[3] + gt[0] * gt[4]) * inv_det,
            -gt[4] * inv_det,
            gt[1] * inv_det,
        ]

    # -- direct: long/lat (+z above ground) -> pixel/line --------------------
    def lonlat_to_pixel(self, lon, lat, z=0.0):
        h = np.asarray(z, float) + self.height_offset
        return rpc_transform_point(self.rpc, lon, lat, h)

    # -- iterative: pixel/line (+z) -> long/lat (RPCInverseTransformPoint) ---
    def pixel_to_lonlat(self, pixel, line, z=0.0):
        pixel = np.atleast_1d(np.asarray(pixel, float))
        line = np.atleast_1d(np.asarray(line, float))
        z = np.broadcast_to(np.asarray(z, float), pixel.shape)
        g = self.pl_to_ll
        out_lon = np.empty_like(pixel)
        out_lat = np.empty_like(pixel)
        for idx in np.ndindex(pixel.shape):
            pfx, pfy, pfz = pixel[idx], line[idx], z[idx]
            rx = g[0] + g[1] * pfx + g[2] * pfy
            ry = g[3] + g[4] * pfx + g[5] * pfy
            converged = False
            for _ in range(self.max_iterations):
                dem_h = self.height_offset  # no-DEM GetHeightAtLongLat
                bx, by = rpc_transform_point(self.rpc, rx, ry, pfz + dem_h)
                dx = float(bx) - pfx
                dy = float(by) - pfy
                if max(abs(dx), abs(dy)) < self.pix_err_threshold:
                    converged = True
                    break
                rx = rx - (dx * g[1]) - (dy * g[2])
                ry = ry - (dx * g[4]) - (dy * g[5])
            if not converged:
                raise ValueError(
                    f"RPC inverse failed to converge at ({pfx}, {pfy})"
                )
            out_lon[idx], out_lat[idx] = rx, ry
        if out_lon.size == 1:
            return float(out_lon.ravel()[0]), float(out_lat.ravel()[0])
        return out_lon, out_lat
