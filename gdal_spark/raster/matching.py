"""Image feature detection + matching (alg/gdal_simplesurf.cpp,
alg/gdalmatching.cpp — GDALComputeMatchingPoints) in vectorized numpy.

Same pipeline as GDAL's SimpleSURF correlator:
  1. integral image (GDALIntegralImage — summed-area table);
  2. Fast-Hessian blob response at a ladder of box-filter sizes
     (GDALOctaveLayer::ComputeLayer): det H = Dxx*Dyy - (0.9*Dxy)^2
     with Dxx/Dyy/Dxy approximated by box sums on the integral image;
  3. 3D non-maximum suppression across (scale, y, x)
     (GDALOctaveMap::PointIsExtremum) above a threshold;
  4. upright 64-dim descriptor: 4x4 subregions x (sum dx, sum dy,
     sum |dx|, sum |dy|) of Haar responses, L2-normalized
     (GDALSimpleSURF::SetDescriptor);
  5. matching by best/second-best euclidean ratio test at 0.8 with the
     sign-of-Laplacian prefilter (GDALSimpleSURF::MatchFeaturePoints,
     gdal_simplesurf.cpp:369-498).

All stages are whole-array numpy; the per-keypoint descriptor loop runs
over the few hundred detected points, not pixels.
"""

from __future__ import annotations

import numpy as np


def integral_image(img: np.ndarray) -> np.ndarray:
    """Summed-area table with a zero top/left border: S[y, x] = sum of
    img[:y, :x]."""
    s = np.zeros((img.shape[0] + 1, img.shape[1] + 1), dtype=np.float64)
    np.cumsum(np.cumsum(img, axis=0), axis=1, out=s[1:, 1:])
    return s


def _box(s: np.ndarray, y0, y1, x0, x1) -> np.ndarray:
    """Sum over img[y0:y1, x0:x1) for whole-array index grids."""
    return s[y1, x1] - s[y0, x1] - s[y1, x0] + s[y0, x0]


def fast_hessian(img: np.ndarray, size: int) -> tuple[np.ndarray, np.ndarray]:
    """(det, laplacian_sign) of the box-approximated Hessian at odd
    filter ``size`` (9, 15, 21, ... — the SURF ladder)."""
    h, w = img.shape
    s = integral_image(img)
    half = size // 2
    third = size // 3
    yy, xx = np.mgrid[0:h, 0:w]

    def clampy(v):
        return np.clip(v, 0, h)

    def clampx(v):
        return np.clip(v, 0, w)

    # Dyy: three stacked boxes (white, -2*black, white) of height `third`
    lobe = third
    y0 = clampy(yy - (3 * lobe) // 2)
    y1 = clampy(yy + (3 * lobe) // 2 + 1)
    x0 = clampx(xx - half)
    x1 = clampx(xx + half + 1)
    whole = _box(s, y0, y1, x0, x1)
    ym0 = clampy(yy - lobe // 2)
    ym1 = clampy(yy + lobe // 2 + 1)
    mid = _box(s, ym0, ym1, x0, x1)
    dyy = whole - 3.0 * mid
    # Dxx: transpose roles
    xw0 = clampx(xx - (3 * lobe) // 2)
    xw1 = clampx(xx + (3 * lobe) // 2 + 1)
    yw0 = clampy(yy - half)
    yw1 = clampy(yy + half + 1)
    whole = _box(s, yw0, yw1, xw0, xw1)
    xm0 = clampx(xx - lobe // 2)
    xm1 = clampx(xx + lobe // 2 + 1)
    mid = _box(s, yw0, yw1, xm0, xm1)
    dxx = whole - 3.0 * mid
    # Dxy: four diagonal lobes
    q = lobe
    a = _box(s, clampy(yy - q), clampy(yy), clampx(xx + 1), clampx(xx + q + 1))
    b = _box(s, clampy(yy - q), clampy(yy), clampx(xx - q), clampx(xx))
    c = _box(s, clampy(yy + 1), clampy(yy + q + 1), clampx(xx - q), clampx(xx))
    d = _box(s, clampy(yy + 1), clampy(yy + q + 1), clampx(xx + 1), clampx(xx + q + 1))
    dxy = a + c - b - d

    norm = 1.0 / (size * size)
    dxx, dyy, dxy = dxx * norm, dyy * norm, dxy * norm
    det = dxx * dyy - (0.9 * dxy) ** 2
    lap_sign = np.sign(dxx + dyy)
    return det, lap_sign


def detect(
    img: np.ndarray,
    threshold: float = 0.001,
    sizes: tuple[int, ...] = (9, 15, 21, 27),
) -> list[dict]:
    """Feature points as dicts (x, y, size, sign) — 3D non-max
    suppression over the middle layers of the scale ladder."""
    g = img.astype(np.float64)
    if g.max() > 1.0:
        g = g / 255.0
    dets, signs = zip(*(fast_hessian(g, sz) for sz in sizes))
    stack = np.stack(dets)
    pts = []
    for si in range(1, len(sizes) - 1):
        mid = stack[si]
        m = (mid > threshold)
        # strict maximum over the 3x3x3 neighborhood
        for ds in (-1, 0, 1):
            lay = stack[si + ds]
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if ds == 0 and dy == 0 and dx == 0:
                        continue
                    m &= mid >= np.roll(np.roll(lay, dy, 0), dx, 1)
        border = sizes[si]
        m[:border, :] = m[-border:, :] = False
        m[:, :border] = m[:, -border:] = False
        ys, xs = np.nonzero(m)
        for y, x in zip(ys, xs):
            pts.append(
                {
                    "x": int(x), "y": int(y), "size": sizes[si],
                    "sign": float(signs[si][y, x]),
                    "response": float(mid[y, x]),
                }
            )
    pts.sort(key=lambda p: -p["response"])
    return pts


def descriptors(img: np.ndarray, pts: list[dict]) -> np.ndarray:
    """Upright 64-dim SURF descriptor per point: 4x4 subregions of a
    20x20 window, each contributing (sum dx, sum dy, sum |dx|, sum |dy|),
    L2-normalized."""
    g = img.astype(np.float64)
    if g.max() > 1.0:
        g = g / 255.0
    dy, dx = np.gradient(g)
    h, w = g.shape
    out = np.zeros((len(pts), 64), dtype=np.float64)
    for i, p in enumerate(pts):
        scale = max(1, p["size"] // 9)
        r = 10 * scale
        y0, y1 = p["y"] - r, p["y"] + r
        x0, x1 = p["x"] - r, p["x"] + r
        if y0 < 0 or x0 < 0 or y1 > h or x1 > w:
            # clamp: zero-pad outside pixels
            wy = np.clip(np.arange(y0, y1), 0, h - 1)
            wx = np.clip(np.arange(x0, x1), 0, w - 1)
            sub_dx = dx[np.ix_(wy, wx)]
            sub_dy = dy[np.ix_(wy, wx)]
        else:
            sub_dx = dx[y0:y1, x0:x1]
            sub_dy = dy[y0:y1, x0:x1]
        k = 0
        step = (2 * r) // 4
        for sy in range(4):
            for sx in range(4):
                bx = sub_dx[sy * step : (sy + 1) * step, sx * step : (sx + 1) * step]
                by = sub_dy[sy * step : (sy + 1) * step, sx * step : (sx + 1) * step]
                out[i, k : k + 4] = (bx.sum(), by.sum(), np.abs(bx).sum(), np.abs(by).sum())
                k += 4
        n = np.linalg.norm(out[i])
        if n > 0:
            out[i] /= n
    return out


def match_points(
    pts1: list[dict], d1: np.ndarray,
    pts2: list[dict], d2: np.ndarray,
    ratio: float = 0.8,
) -> list[tuple[int, int, float]]:
    """Best/second-best ratio matching with the sign-of-Laplacian
    prefilter (MatchFeaturePoints, ratioThreshold=0.8).  Returns
    (idx1, idx2, dist) triples."""
    if len(pts1) == 0 or len(pts2) == 0:
        return []
    # distance matrix; mismatched laplacian signs are excluded like GDAL
    dist = np.linalg.norm(d1[:, None, :] - d2[None, :, :], axis=2)
    s1 = np.array([p["sign"] for p in pts1])
    s2 = np.array([p["sign"] for p in pts2])
    dist[s1[:, None] != s2[None, :]] = np.inf
    out = []
    for i in range(len(pts1)):
        row = dist[i]
        order = np.argsort(row)
        best, second = order[0], order[1] if len(order) > 1 else order[0]
        if not np.isfinite(row[best]):
            continue
        if len(order) > 1 and np.isfinite(row[second]):
            if row[best] / max(row[second], 1e-12) >= ratio:
                continue
        out.append((i, int(best), float(row[best])))
    return out


def compute_matching_points(
    img1: np.ndarray, img2: np.ndarray, threshold: float = 0.001,
    max_points: int = 200,
) -> list[tuple[int, int, int, int]]:
    """GDALComputeMatchingPoints: (x1, y1, x2, y2) matched pairs."""
    p1 = detect(img1, threshold)[:max_points]
    p2 = detect(img2, threshold)[:max_points]
    d1 = descriptors(img1, p1)
    d2 = descriptors(img2, p2)
    return [
        (p1[i]["x"], p1[i]["y"], p2[j]["x"], p2[j]["y"])
        for i, j, _ in match_points(p1, d1, p2, d2)
    ]
