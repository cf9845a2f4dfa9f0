"""Exact scalar gdal_grid algorithms with full parameter support.

Reference parity: alg/gdalgrid.cpp —
GDALGridInverseDistanceToAPowerNearestNeighbor(PerQuadrant) (:242, :346)
and GDALGridAverage(PerQuadrant). The per-quadrant selection is the
reference's exact round-robin: quadrants are visited 0,1,2,3 cyclically,
each yielding its next-nearest (smoothed-distance-ordered) candidate,
respecting max_points_per_quadrant and stopping at max_points; the node
is nodata unless every quadrant reached min_points_per_quadrant and the
total reached min_points. Verified against the expected values of
autotest/utilities/test_gdal_grid_lib.py.

These are the per-node scalar kernels; the distributed entries in
queries/gridding.py express the common parameterizations as DataFrame
plans and use these in Arrow batches when full parameter generality is
required.
"""

from __future__ import annotations

import numpy as np


def _select_per_quadrant(
    px: np.ndarray, py: np.ndarray, pz: np.ndarray,
    x: float, y: float, radius: float, smoothing: float,
    max_points: int, max_ppq: int,
):
    """Round-robin quadrant candidate selection -> (r2s, z, quadrant
    counts, short-circuit z or None)."""
    dx = px - x
    dy = py - y
    r2 = dx * dx + dy * dy
    r2s = r2 + smoothing * smoothing
    hit = r2s < 1e-13
    if hit.any():
        return None, None, None, float(pz[hit][0])
    within = r2 <= radius * radius
    quad = ((dx >= 0).astype(int) | ((dy >= 0).astype(int) << 1))[within]
    cand_r2s = r2s[within]
    cand_z = pz[within]
    # per-quadrant ascending by smoothed distance (stable like multimap)
    iters = []
    for q in range(4):
        m = quad == q
        order = np.argsort(cand_r2s[m], kind="stable")
        iters.append(list(zip(cand_r2s[m][order], cand_z[m][order])))
    pos = [0, 0, 0, 0]
    counts = [0, 0, 0, 0]
    sel_r2s: list[float] = []
    sel_z: list[float] = []
    finished = 0
    q = 0
    while True:
        if pos[q] >= len(iters[q]) or (max_ppq > 0 and counts[q] >= max_ppq):
            finished |= 1 << q
            if finished == 15:
                break
            q = (q + 1) % 4
            continue
        r2v, zv = iters[q][pos[q]]
        pos[q] += 1
        sel_r2s.append(float(r2v))
        sel_z.append(float(zv))
        counts[q] += 1
        if max_points > 0 and len(sel_r2s) >= max_points:
            break
        q = (q + 1) % 4
    return np.array(sel_r2s), np.array(sel_z), counts, None


def invdist_quadrant(
    px: np.ndarray, py: np.ndarray, pz: np.ndarray, x: float, y: float,
    power: float = 2.0, smoothing: float = 0.0, radius: float = 1.0,
    max_points: int = 12, min_points: int = 0,
    min_points_per_quadrant: int = 0, max_points_per_quadrant: int = 0,
    nodata: float = 0.0,
) -> float:
    """invdist / invdistnn with per-quadrant constraints (alg/gdalgrid.cpp
    GDALGridInverseDistanceToAPowerNearestNeighborPerQuadrant): weight =
    (r2 + smoothing^2) ^ (-power/2)."""
    r2s, z, counts, short = _select_per_quadrant(
        px, py, pz, x, y, radius, smoothing,
        max_points, max_points_per_quadrant,
    )
    if short is not None:
        return short
    if min_points_per_quadrant > 0 and any(
        c < min_points_per_quadrant for c in counts
    ):
        return nodata
    n = len(r2s)
    if n < min_points or n == 0:
        return nodata
    w = 1.0 / np.power(r2s, power / 2.0)
    den = w.sum()
    if den == 0.0:
        return nodata
    return float((w * z).sum() / den)


def average_quadrant(
    px: np.ndarray, py: np.ndarray, pz: np.ndarray, x: float, y: float,
    radius: float = 1.0, max_points: int = 0, min_points: int = 0,
    min_points_per_quadrant: int = 0, max_points_per_quadrant: int = 0,
    nodata: float = 0.0,
) -> float:
    """moving average with per-quadrant constraints
    (GDALGridAveragePerQuadrant)."""
    r2s, z, counts, short = _select_per_quadrant(
        px, py, pz, x, y, radius, 0.0, max_points, max_points_per_quadrant
    )
    if short is not None:
        return short
    if min_points_per_quadrant > 0 and any(
        c < min_points_per_quadrant for c in counts
    ):
        return nodata
    n = len(r2s)
    if n < min_points or n == 0:
        return nodata
    return float(z.mean())
