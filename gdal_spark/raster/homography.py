"""Homography (projective) GCP transformer — alg/gdal_homography.cpp.

GDAL's 9-double layout (GDALApplyHomography:390-413):

    X = (h[0] + x*h[1] + y*h[2]) / w
    Y = (h[3] + x*h[4] + y*h[5]) / w      with  w = h[6] + x*h[7] + y*h[8]

* ``gcps_to_homography`` transcribes GDALGCPsToHomography: min/max
  normalization of both planes, the 9x9 normal-equation system with the
  rank-fixing extra equation h_norm[6] = 1 (AtA(6,6) += 1, rhs[6] = 1),
  the unit-square convexity check (cross12 * cross23 > 0), and the
  composition with the normalizing homographies. Fewer than 4 GCPs fall
  back to the affine fit (GDALGCPsToGeoTransform path) with w == 1.
* ``inv_homography`` transcribes GDALInvHomography: affine fast path
  when h[7] == h[8] == 0 and h[6] == 1, else the adjugate / det of the
  3x3 matrix (a homography's inverse is its matrix inverse up to scale).
* ``apply_homography`` is vectorized over numpy arrays; |w| <= 1e-15
  raises like the reference returns FALSE.
"""

from __future__ import annotations

import numpy as np


def apply_homography(h, x, y):
    x = np.asarray(x, float)
    y = np.asarray(y, float)
    w = h[6] + x * h[7] + y * h[8]
    if np.any(np.abs(w) <= 1e-15):
        raise ValueError("homography denominator ~ 0")
    X = (h[0] + x * h[1] + y * h[2]) / w
    Y = (h[3] + x * h[4] + y * h[5]) / w
    return X, Y


def _as_matrix(h):
    return np.array(
        [
            [h[1], h[2], h[0]],
            [h[4], h[5], h[3]],
            [h[7], h[8], h[6]],
        ],
        dtype=float,
    )


def _from_matrix(m):
    return [
        m[0, 2], m[0, 0], m[0, 1],
        m[1, 2], m[1, 0], m[1, 1],
        m[2, 2], m[2, 0], m[2, 1],
    ]


def inv_homography(h):
    """GDALInvHomography: affine fast path, else adjugate/det."""
    h = list(map(float, h))
    if h[7] == 0.0 and h[8] == 0.0 and h[6] == 1.0:
        # affine path (gdal_homography.cpp:448-460): 2x2 inverse
        det = h[1] * h[5] - h[2] * h[4]
        if abs(det) < 1e-15:
            raise ValueError("non-invertible affine homography")
        inv_det = 1.0 / det
        return [
            (h[2] * h[3] - h[0] * h[5]) * inv_det,
            h[5] * inv_det,
            -h[2] * inv_det,
            (-h[1] * h[3] + h[0] * h[4]) * inv_det,
            -h[4] * inv_det,
            h[1] * inv_det,
            1.0, 0.0, 0.0,
        ]
    m = _as_matrix(h)
    det = np.linalg.det(m)
    if abs(det) < 1e-15:
        raise ValueError("non-invertible homography")
    return _from_matrix(np.linalg.inv(m))


def compose_homographies(h1, h2):
    """point -> h1 -> h2 (GDALComposeHomographies)."""
    return _from_matrix(_as_matrix(h2) @ _as_matrix(h1))


def gcps_to_homography(gcps: np.ndarray) -> list:
    """(n, 4) rows of (pixel, line, X, Y) -> 9-double homography.

    Transcribes GDALGCPsToHomography (gdal_homography.cpp:160-330).
    """
    g = np.asarray(gcps, float)
    if len(g) < 2:
        raise ValueError("homography needs >= 2 GCPs")
    if len(g) == 2:
        # GDALGCPsToGeoTransform 2-GCP diagonal case (gdal_misc.cpp:3213)
        if g[1, 0] == g[0, 0] or g[1, 1] == g[0, 1]:
            raise ValueError("2-GCP case needs distinct pixel AND line")
        sx = (g[1, 2] - g[0, 2]) / (g[1, 0] - g[0, 0])
        sy = (g[1, 3] - g[0, 3]) / (g[1, 1] - g[0, 1])
        return [
            g[0, 2] - g[0, 0] * sx, sx, 0.0,
            g[0, 3] - g[0, 1] * sy, 0.0, sy,
            1.0, 0.0, 0.0,
        ]
    if len(g) == 3:
        # affine fallback (GDALGCPsToGeoTransform LSQ path; exact for 3)
        from gdal_spark.raster.gcp import fit_poly

        coef, _ = fit_poly(g[:, :2], g[:, 2:4], order=1)
        # fit_poly coef: (out_dim, 3) with columns [1, x, y]
        return [
            coef[0, 0], coef[0, 1], coef[0, 2],
            coef[1, 0], coef[1, 1], coef[1, 2],
            1.0, 0.0, 0.0,
        ]

    px, ln = g[:, 0], g[:, 1]
    gx, gy = g[:, 2], g[:, 3]
    eps = 1e-12
    if (
        np.ptp(px) < eps or np.ptp(ln) < eps
        or np.ptp(gx) < eps or np.ptp(gy) < eps
    ):
        raise ValueError("GCPs degenerate in at least one dimension")

    def norm_h(lo_x, hi_x, lo_y, hi_y):
        return [
            -lo_x / (hi_x - lo_x), 1.0 / (hi_x - lo_x), 0.0,
            -lo_y / (hi_y - lo_y), 0.0, 1.0 / (hi_y - lo_y),
            1.0, 0.0, 0.0,
        ]

    pl_norm = norm_h(px.min(), px.max(), ln.min(), ln.max())
    geo_norm = norm_h(gx.min(), gx.max(), gy.min(), gy.max())
    inv_geo_norm = inv_homography(geo_norm)

    p, l_ = apply_homography(pl_norm, px, ln)
    X, Y = apply_homography(geo_norm, gx, gy)

    AtA = np.zeros((9, 9))
    rhs = np.zeros(9)
    rhs[6] = 1.0
    AtA[6, 6] = 1.0
    one = np.ones_like(p)
    zero = np.zeros_like(p)
    Ax = np.stack([one, p, l_, zero, zero, zero, -X, -X * p, -X * l_])
    Ay = np.stack([zero, zero, zero, one, p, l_, -Y, -Y * p, -Y * l_])
    AtA += Ax @ Ax.T + Ay @ Ay.T
    h_norm = np.linalg.solve(AtA, rhs)
    if abs(h_norm[6]) < 1e-15:
        raise ValueError("homography fit failed (h_norm[6] ~ 0)")

    # unit-square convexity check (:290-318)
    cx, cy = apply_homography(
        h_norm, np.array([0.0, 1, 1, 0]), np.array([0.0, 0, 1, 1])
    )
    cx, cy = cx - cx[0], cy - cy[0]
    cross12 = cx[1] * cy[2] - cx[2] * cy[1]
    cross23 = cx[2] * cy[3] - cx[3] * cy[2]
    if cross12 * cross23 <= 0.0:
        raise ValueError("homography maps unit square to non-convex quad")

    h1p2 = compose_homographies(pl_norm, list(h_norm))
    return compose_homographies(h1p2, inv_geo_norm)
