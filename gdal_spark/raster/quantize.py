"""Color quantization + dithering (alg/gdalmediancut.cpp,
alg/gdaldither.cpp) in numpy.

* ``median_cut_pct`` — GDALComputeMedianCutPCT: histogram the image at
  ``bits`` per channel (GDAL/tiffmedian default 5 -> 32^3 cells), then
  repeatedly split the most-populated box along its longest color axis
  at the pixel-count median until ``n_colors`` boxes remain; each box's
  palette entry is its population-weighted mean color.
* ``dither_rgb`` — GDALDitherRGB2PCT: Floyd-Steinberg error diffusion;
  the error of each quantized pixel propagates 7/16 right, 3/16
  below-left, 5/16 below, 1/16 below-right (gdaldither.cpp:17-24 —
  "the error goes to four neighbors").  Nearest-palette lookup uses the
  same precomputed color-cube map GDAL builds (FindNearestColor over an
  nCLevels^3 cube, gdaldither.cpp:297-348).

Spark integration: quantize+dither is per-image work inside the Arrow
decode batch (mapInPandas) — no shuffle, embarrassingly parallel.
"""

from __future__ import annotations

import numpy as np


def _histogram(arr: np.ndarray, bits: int) -> np.ndarray:
    q = arr.astype(np.uint32) >> (8 - bits)
    n = 1 << bits
    flat = (q[..., 0] * n + q[..., 1]) * n + q[..., 2]
    return np.bincount(flat.ravel(), minlength=n * n * n).reshape(n, n, n)


def median_cut_pct(
    arr: np.ndarray, n_colors: int = 256, bits: int = 5
) -> np.ndarray:
    """(h, w, 3) uint8 -> (<=n_colors, 3) uint8 palette."""
    hist = _histogram(arr, bits)
    n = 1 << bits
    # a box is (r0, r1, g0, g1, b0, b1) inclusive bounds in quantized space
    boxes = [(0, n - 1, 0, n - 1, 0, n - 1)]

    def shrink(b):
        r0, r1, g0, g1, b0, b1 = b
        sub = hist[r0 : r1 + 1, g0 : g1 + 1, b0 : b1 + 1]
        rs = sub.sum(axis=(1, 2)).nonzero()[0]
        gs = sub.sum(axis=(0, 2)).nonzero()[0]
        bs = sub.sum(axis=(0, 1)).nonzero()[0]
        if len(rs) == 0:
            return None
        return (
            r0 + int(rs[0]), r0 + int(rs[-1]),
            g0 + int(gs[0]), g0 + int(gs[-1]),
            b0 + int(bs[0]), b0 + int(bs[-1]),
        )

    def count(b):
        r0, r1, g0, g1, b0, b1 = b
        return int(hist[r0 : r1 + 1, g0 : g1 + 1, b0 : b1 + 1].sum())

    boxes[0] = shrink(boxes[0]) or boxes[0]
    while len(boxes) < n_colors:
        # split the most-populated splittable box (tiffmedian largest_box)
        cand = [
            (count(b), i)
            for i, b in enumerate(boxes)
            if (b[1] > b[0]) or (b[3] > b[2]) or (b[5] > b[4])
        ]
        if not cand:
            break
        _, idx = max(cand)
        r0, r1, g0, g1, b0, b1 = boxes[idx]
        ext = (r1 - r0, g1 - g0, b1 - b0)
        axis = int(np.argmax(ext))
        lo, hi = ((r0, r1), (g0, g1), (b0, b1))[axis]
        marg = hist[r0 : r1 + 1, g0 : g1 + 1, b0 : b1 + 1].sum(
            axis=tuple(a for a in (0, 1, 2) if a != axis)
        )
        csum = np.cumsum(marg)
        half = csum[-1] / 2.0
        cut = int(np.searchsorted(csum, half))
        cut = min(max(cut, 0), (hi - lo) - 1)  # both halves non-empty
        mid = lo + cut
        left = list(boxes[idx])
        right = list(boxes[idx])
        left[2 * axis + 1] = mid
        right[2 * axis] = mid + 1
        lb, rb = shrink(tuple(left)), shrink(tuple(right))
        boxes[idx : idx + 1] = [b for b in (lb, rb) if b is not None]

    # palette entry = population-weighted mean color of the box
    shift = 8 - bits
    idxs = np.arange(n)
    centers = (idxs << shift) + (1 << shift) / 2.0
    pal = []
    for r0, r1, g0, g1, b0, b1 in boxes:
        sub = hist[r0 : r1 + 1, g0 : g1 + 1, b0 : b1 + 1].astype(np.float64)
        tot = sub.sum()
        if tot == 0:
            continue
        r = (sub.sum(axis=(1, 2)) * centers[r0 : r1 + 1]).sum() / tot
        g = (sub.sum(axis=(0, 2)) * centers[g0 : g1 + 1]).sum() / tot
        b = (sub.sum(axis=(0, 1)) * centers[b0 : b1 + 1]).sum() / tot
        pal.append((r, g, b))
    return np.clip(np.round(np.array(pal)), 0, 255).astype(np.uint8)


def _color_cube_map(palette: np.ndarray, bits: int = 5) -> np.ndarray:
    """nCLevels^3 -> palette-index nearest-color cube
    (gdaldither.cpp FindNearestColor)."""
    n = 1 << bits
    shift = 8 - bits
    centers = (np.arange(n) << shift) + (1 << shift) // 2
    rr = centers.reshape(n, 1, 1, 1)
    gg = centers.reshape(1, n, 1, 1)
    bb = centers.reshape(1, 1, n, 1)
    p = palette.astype(np.int64)
    d = (
        (rr - p[:, 0]) ** 2 + (gg - p[:, 1]) ** 2 + (bb - p[:, 2]) ** 2
    )
    return np.argmin(d, axis=3).astype(np.uint8)


def nearest_index(arr: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """Exact nearest-palette index per pixel (no dithering)."""
    p = palette.astype(np.int64)
    a = arr.astype(np.int64)
    d = (
        (a[..., None, 0] - p[:, 0]) ** 2
        + (a[..., None, 1] - p[:, 1]) ** 2
        + (a[..., None, 2] - p[:, 2]) ** 2
    )
    return np.argmin(d, axis=-1).astype(np.uint8)


def dither_rgb(
    arr: np.ndarray, palette: np.ndarray, bits: int = 5
) -> np.ndarray:
    """(h, w, 3) uint8 -> (h, w) palette indices, Floyd-Steinberg
    (gdaldither.cpp four-neighbor error diffusion, serpentine off —
    GDAL scans rows left to right)."""
    h, w, _ = arr.shape
    cube = _color_cube_map(palette, bits)
    shift = 8 - bits
    pal = palette.astype(np.float64)
    work = arr.astype(np.float64).copy()
    out = np.zeros((h, w), dtype=np.uint8)
    for y in range(h):
        row = work[y]
        for x in range(w):
            px = np.clip(row[x], 0, 255)
            qi = (px.astype(np.int64) >> shift)
            idx = int(cube[qi[0], qi[1], qi[2]])
            out[y, x] = idx
            err = px - pal[idx]
            if x + 1 < w:
                row[x + 1] += err * (7 / 16)
            if y + 1 < h:
                nrow = work[y + 1]
                if x > 0:
                    nrow[x - 1] += err * (3 / 16)
                nrow[x] += err * (5 / 16)
                if x + 1 < w:
                    nrow[x + 1] += err * (1 / 16)
    return out


def apply_pct(idx: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """Index raster + palette -> RGB (GDALColorTable expansion)."""
    return palette[idx]
