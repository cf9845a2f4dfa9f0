"""Pixel-fidelity metrics: PSNR and the 64-bit DCT perceptual hash.

PSNR is the per-row invariant from BASELINE.json input_hint (lossy formats
must round-trip at >= 40 dB). phash is the standard published DCT-hash
recipe (resize 32x32 luma -> DCT-II -> top-left 8x8 sans DC -> median
threshold); GDAL itself has no phash — the column comes from the corpus.
"""

from __future__ import annotations

import numpy as np

from gdal_spark.functions.codecs import _dct_matrix


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


_DCT32 = _dct_matrix(32)


def _area_resize_32(gray: np.ndarray) -> np.ndarray:
    """Box/area resample a 2-D array to 32x32 (nearest-bin mean)."""
    h, w = gray.shape
    ys = (np.arange(33) * h // 32).astype(np.int64)
    xs = (np.arange(33) * w // 32).astype(np.int64)
    # cumulative-sum integral image for exact box means
    ii = np.zeros((h + 1, w + 1), dtype=np.float64)
    ii[1:, 1:] = np.cumsum(np.cumsum(gray.astype(np.float64), axis=0), axis=1)
    y0, y1 = ys[:-1], np.maximum(ys[1:], ys[:-1] + 1)
    x0, x1 = xs[:-1], np.maximum(xs[1:], xs[:-1] + 1)
    y1 = np.minimum(y1, h)
    x1 = np.minimum(x1, w)
    sums = ii[y1][:, x1] - ii[y0][:, x1] - ii[y1][:, x0] + ii[y0][:, x0]
    areas = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    return sums / areas


def phash64(arr: np.ndarray) -> int:
    """64-bit DCT perceptual hash of an HxWx3 (or HxW) uint8 image."""
    a = np.asarray(arr, dtype=np.float64)
    gray = a.mean(axis=2) if a.ndim == 3 else a
    small = _area_resize_32(gray)
    coef = _DCT32 @ small @ _DCT32.T
    block = coef[:8, :8].ravel()[1:]  # drop DC
    med = np.median(block)
    bits = (block > med).astype(np.uint64)
    h = np.uint64(0)
    for bit in bits:
        h = (h << np.uint64(1)) | bit
    # signed int64 for Spark LongType
    return int(np.int64(h))
