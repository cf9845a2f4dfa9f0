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


def median_cut_pct_gdal(
    arr: np.ndarray, n_colors: int = 256, bits: int = 5
) -> np.ndarray:
    """Exact GDALComputeMedianCutPCT port (alg/gdalmediancut.cpp:133,440):

    * 5-bit channel histogram (public entry point's nBits);
    * largest_box = first strictly-largest-total splittable box in list
      order, where each split PREPENDS the left half to the list head;
    * split axis prefers R over G over B on extent ties; split index =
      first marginal-cumsum >= total/2 (integer), bumped off the first
      cell; both halves shrunk to their nonzero histogram extent;
    * palette entry = ((min+max) << shift) / 2 per channel, in final
      list order — so the color TABLE matches GDAL entry for entry, not
      just as a set (verified against autotest/alg/dither.py's ref_ct).
    """
    shift = 8 - bits
    n = 1 << bits
    q = (arr.astype(np.int64) >> shift).reshape(-1, 3)
    flat = (q[:, 0] * n + q[:, 1]) * n + q[:, 2]
    hist = np.bincount(flat, minlength=n * n * n).reshape(n, n, n)

    def shrink(b):
        sub = hist[b["rmin"]: b["rmax"] + 1,
                   b["gmin"]: b["gmax"] + 1,
                   b["bmin"]: b["bmax"] + 1]
        rs = sub.sum(axis=(1, 2)).nonzero()[0]
        gs = sub.sum(axis=(0, 2)).nonzero()[0]
        bs = sub.sum(axis=(0, 1)).nonzero()[0]
        if len(rs):
            b["rmin"], b["rmax"] = b["rmin"] + int(rs[0]), b["rmin"] + int(rs[-1])
            b["gmin"], b["gmax"] = b["gmin"] + int(gs[0]), b["gmin"] + int(gs[-1])
            b["bmin"], b["bmax"] = b["bmin"] + int(bs[0]), b["bmin"] + int(bs[-1])

    first_box = {
        "rmin": int(q[:, 0].min()), "rmax": int(q[:, 0].max()),
        "gmin": int(q[:, 1].min()), "gmax": int(q[:, 1].max()),
        "bmin": int(q[:, 2].min()), "bmax": int(q[:, 2].max()),
        "total": int(len(q)),
    }
    boxes = [first_box]  # list order == GDAL's usedboxes linked list

    while len(boxes) < n_colors:
        ptr = None
        for b in boxes:  # largest_box: strict >, scan order
            if (
                (b["rmax"] > b["rmin"] or b["gmax"] > b["gmin"]
                 or b["bmax"] > b["bmin"])
                and (ptr is None or b["total"] > ptr["total"])
            ):
                ptr = b
        if ptr is None:
            break
        # axis: R wins ties over G over B (splitbox axis selection)
        er = ptr["rmax"] - ptr["rmin"]
        eg = ptr["gmax"] - ptr["gmin"]
        eb = ptr["bmax"] - ptr["bmin"]
        if er >= eg and er >= eb:
            axis, lo_k, hi_k, sum_axes = 0, "rmin", "rmax", (1, 2)
        elif eg >= eb:
            axis, lo_k, hi_k, sum_axes = 1, "gmin", "gmax", (0, 2)
        else:
            axis, lo_k, hi_k, sum_axes = 2, "bmin", "bmax", (0, 1)
        sub = hist[ptr["rmin"]: ptr["rmax"] + 1,
                   ptr["gmin"]: ptr["gmax"] + 1,
                   ptr["bmin"]: ptr["bmax"] + 1]
        marg = sub.sum(axis=sum_axes)
        first, last = ptr[lo_k], ptr[hi_k]
        half = ptr["total"] // 2
        csum = np.cumsum(marg)
        idx = int(np.searchsorted(csum, half, side="left"))
        # C loop: stops at first i with cumsum >= half (sum += h; < half)
        i = first + min(idx, last - first)
        if i == first:
            i += 1
        new_cb = dict(ptr)
        new_cb["total"] = int(csum[i - 1 - first])
        ptr["total"] = int(csum[-1] - csum[i - 1 - first])
        new_cb[hi_k] = i - 1
        ptr[lo_k] = i
        shrink(new_cb)
        shrink(ptr)
        boxes.insert(0, new_cb)  # new box goes to the list HEAD

    pal = [
        (
            ((b["rmin"] + b["rmax"]) << shift) // 2,
            ((b["gmin"] + b["gmax"]) << shift) // 2,
            ((b["bmin"] + b["bmax"]) << shift) // 2,
        )
        for b in boxes
    ]
    return np.array(pal, dtype=np.uint8)


def dither_rgb2pct_gdal(arr: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """Exact GDALDitherRGB2PCT port (alg/gdaldither.cpp:144,297-640):
    Floyd-Steinberg variant diffusing to FOUR neighbors — right 2/6,
    below-left 1/6, below 1/6 + remainder, below-right 1/6 — with C
    truncated division for error/6, per-pixel color lookup through the
    precomputed 5-bit color cube (cell representative (i*255)/31, L1
    nearest, lowest index wins ties). Verified against the
    autotest/alg/dither.py checksum in tests/test_autotest_parity.py."""
    h, w = arr.shape[:2]
    pal = palette.astype(np.int64)
    ncl = 32
    # color cube map: nearest palette index per 5-bit cell
    cell = (np.arange(ncl) * 255) // (ncl - 1)
    rr, gg, bb = np.meshgrid(cell, cell, cell, indexing="ij")
    d = (
        np.abs(rr[..., None] - pal[None, None, None, :, 0])
        + np.abs(gg[..., None] - pal[None, None, None, :, 1])
        + np.abs(bb[..., None] - pal[None, None, None, :, 2])
    )
    cube = d.argmin(axis=-1).astype(np.uint8)  # argmin = lowest index ties

    def trunc6(e: int) -> int:
        return -((-e) // 6) if e < 0 else e // 6

    out = np.zeros((h, w), dtype=np.uint8)
    err = np.zeros((w + 2) * 3, dtype=np.int64)
    src = arr.astype(np.int64)
    for y in range(h):
        red = np.clip(src[y, :, 0] + err[3 : 3 + w * 3 : 3], 0, 255)
        green = np.clip(src[y, :, 1] + err[4 : 4 + w * 3 : 3], 0, 255)
        blue = np.clip(src[y, :, 2] + err[5 : 5 + w * 3 : 3], 0, 255)
        err[:] = 0
        last_r = last_g = last_b = 0
        for i in range(w):
            rv = min(255, max(0, int(red[i]) + last_r))
            gv = min(255, max(0, int(green[i]) + last_g))
            bv = min(255, max(0, int(blue[i]) + last_b))
            idx = int(cube[rv * ncl // 256, gv * ncl // 256, bv * ncl // 256])
            out[y, i] = idx
            e = rv - int(pal[idx, 0])
            s = trunc6(e)
            err[i * 3] += s
            err[i * 3 + 6] = s
            err[i * 3 + 3] += e - 5 * s
            last_r = 2 * s
            e = gv - int(pal[idx, 1])
            s = trunc6(e)
            err[i * 3 + 1] += s
            err[i * 3 + 7] = s
            err[i * 3 + 4] += e - 5 * s
            last_g = 2 * s
            e = bv - int(pal[idx, 2])
            s = trunc6(e)
            err[i * 3 + 2] += s
            err[i * 3 + 8] = s
            err[i * 3 + 5] += e - 5 * s
            last_b = 2 * s
    return out
