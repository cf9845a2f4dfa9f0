"""Raster utility kernels: blend compositing, collar cleaning,
nodata->alpha, band stack, unscale.

Reference parity:
  * blend — `gdal raster blend` (apps/gdalalg_raster_blend.h
    CompositionMode: SRC_OVER, HSV_VALUE, MULTIPLY, SCREEN, OVERLAY,
    HARD_LIGHT, DARKEN, LIGHTEN, COLOR_DODGE, COLOR_BURN) with the
    standard Porter-Duff / separable-blend formulas; HSV_VALUE replaces
    the base's HSV value channel with the overlay's intensity (the
    hillshade-coloring composite).
  * clean_collar — `gdal raster clean-collar` / nearblack
    (apps/nearblack_lib.cpp): pixels connected to the image border
    through near-collar-color pixels are forced to the collar color;
    'scan' = row/column edge scans, 'floodfill' = 4-connected BFS
    (GDALNearblackFloodFill).
  * nodata_to_alpha — `gdal raster nodata-to-alpha`.
  * stack — `gdal raster stack` (band concatenation).
  * unscale — `gdal raster unscale` (apply scale/offset metadata).

All pure numpy, invoked per-image from Arrow-batched mapInPandas —
embarrassingly parallel, no shuffle.
"""

from __future__ import annotations

import numpy as np

MODES = (
    "src_over", "hsv_value", "multiply", "screen", "overlay",
    "hard_light", "darken", "lighten", "color_dodge", "color_burn",
)


def _rgb_to_hsv(rgb: np.ndarray):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = rgb.max(-1)
    mn = rgb.min(-1)
    d = mx - mn
    h = np.zeros_like(mx)
    with np.errstate(invalid="ignore", divide="ignore"):
        hr = np.where(d > 0, ((g - b) / d) % 6.0, 0.0)
        hg = np.where(d > 0, (b - r) / d + 2.0, 0.0)
        hb = np.where(d > 0, (r - g) / d + 4.0, 0.0)
    h = np.where(mx == r, hr, np.where(mx == g, hg, hb)) / 6.0
    s = np.where(mx > 0, d / np.maximum(mx, 1e-300), 0.0)
    return h, s, mx


def _hsv_to_rgb(h: np.ndarray, s: np.ndarray, v: np.ndarray) -> np.ndarray:
    i = np.floor(h * 6.0).astype(int) % 6
    f = h * 6.0 - np.floor(h * 6.0)
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    out = np.select(
        [(i == j)[..., None] for j in range(6)],
        [
            np.stack([v, t, p], -1), np.stack([q, v, p], -1),
            np.stack([p, v, t], -1), np.stack([p, q, v], -1),
            np.stack([t, p, v], -1), np.stack([v, p, q], -1),
        ],
    )
    return out


def blend(
    base: np.ndarray, over: np.ndarray, mode: str = "src_over",
    opacity: float = 1.0,
) -> np.ndarray:
    """Composite `over` onto `base` (both HxWx3 uint8); returns uint8.
    out = base*(1-opacity) + blended*opacity."""
    if mode not in MODES:
        raise ValueError(f"unknown blend mode {mode}")
    b = base.astype(np.float64) / 255.0
    o = over.astype(np.float64) / 255.0
    if mode == "src_over":
        blended = o
    elif mode == "multiply":
        blended = b * o
    elif mode == "screen":
        blended = 1.0 - (1.0 - b) * (1.0 - o)
    elif mode == "overlay":
        blended = np.where(b <= 0.5, 2 * b * o, 1 - 2 * (1 - b) * (1 - o))
    elif mode == "hard_light":
        blended = np.where(o <= 0.5, 2 * b * o, 1 - 2 * (1 - b) * (1 - o))
    elif mode == "darken":
        blended = np.minimum(b, o)
    elif mode == "lighten":
        blended = np.maximum(b, o)
    elif mode == "color_dodge":
        with np.errstate(divide="ignore", invalid="ignore"):
            blended = np.where(o >= 1.0, 1.0, np.minimum(1.0, b / (1.0 - o)))
    elif mode == "color_burn":
        with np.errstate(divide="ignore", invalid="ignore"):
            blended = np.where(
                o <= 0.0, 0.0, 1.0 - np.minimum(1.0, (1.0 - b) / o)
            )
    else:  # hsv_value
        h, s, _v = _rgb_to_hsv(b)
        val = 0.299 * o[..., 0] + 0.587 * o[..., 1] + 0.114 * o[..., 2]
        blended = _hsv_to_rgb(h, s, val)
    out = b * (1.0 - opacity) + blended * opacity
    return np.clip(np.round(out * 255.0), 0, 255).astype(np.uint8)


def clean_collar(
    arr: np.ndarray, color=(0, 0, 0), threshold: int = 15,
    algorithm: str = "floodfill",
) -> tuple[np.ndarray, np.ndarray]:
    """nearblack: returns (cleaned, collar_mask). Near-collar pixels
    (every band within `threshold` of `color`, the m_colorThreshold=15
    default) connected to the border are snapped to the exact collar
    color. 'scan' sweeps each row/column inward from both ends (the
    classic nearblack pass); 'floodfill' is the 4-connected BFS of
    GDALNearblackFloodFill — it also reaches collar regions around
    corners the scans miss."""
    col = np.asarray(color, dtype=np.int16)
    near = (
        np.abs(arr.astype(np.int16) - col[None, None, :]) <= threshold
    ).all(axis=2)
    h, w = near.shape
    mask = np.zeros((h, w), dtype=bool)
    if algorithm == "scan":
        for row in range(h):
            j = 0
            while j < w and near[row, j]:
                mask[row, j] = True
                j += 1
            j = w - 1
            while j >= 0 and near[row, j]:
                mask[row, j] = True
                j -= 1
        for colj in range(w):
            i = 0
            while i < h and near[i, colj]:
                mask[i, colj] = True
                i += 1
            i = h - 1
            while i >= 0 and near[i, colj]:
                mask[i, colj] = True
                i -= 1
    elif algorithm == "floodfill":
        # BFS from every near-collar border pixel, vectorized frontier
        frontier = np.zeros_like(mask)
        frontier[0, :] = near[0, :]
        frontier[-1, :] = near[-1, :]
        frontier[:, 0] |= near[:, 0]
        frontier[:, -1] |= near[:, -1]
        mask |= frontier
        while frontier.any():
            grow = np.zeros_like(mask)
            grow[1:, :] |= frontier[:-1, :]
            grow[:-1, :] |= frontier[1:, :]
            grow[:, 1:] |= frontier[:, :-1]
            grow[:, :-1] |= frontier[:, 1:]
            frontier = grow & near & ~mask
            mask |= frontier
    else:
        raise ValueError(f"unknown clean_collar algorithm {algorithm}")
    out = arr.copy()
    out[mask] = np.asarray(color, dtype=arr.dtype)
    return out, mask


def nodata_to_alpha(arr: np.ndarray, nodata) -> np.ndarray:
    """Append an alpha band: 0 where every band equals nodata, else 255."""
    nd = np.asarray(nodata, dtype=arr.dtype)
    if nd.ndim == 0:
        nd = np.repeat(nd, arr.shape[2])
    is_nd = (arr == nd[None, None, :]).all(axis=2)
    alpha = np.where(is_nd, 0, 255).astype(arr.dtype)
    return np.dstack([arr, alpha])


def stack(arrays: list[np.ndarray]) -> np.ndarray:
    """Band-concatenate rasters of identical shape (gdal raster stack)."""
    h, w = arrays[0].shape[:2]
    planes = []
    for a in arrays:
        if a.shape[:2] != (h, w):
            raise ValueError("stack: shape mismatch")
        planes.append(a if a.ndim == 3 else a[:, :, None])
    return np.dstack(planes)


def unscale(arr: np.ndarray, scale: float, offset: float) -> np.ndarray:
    """Apply band scale/offset metadata: float64 true values
    (GDALRasterBand::GetScale/GetOffset semantics)."""
    return arr.astype(np.float64) * scale + offset
