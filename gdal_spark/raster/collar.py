"""nearblack / `gdal raster clean-collar` — apps/nearblack_lib.cpp.

Converts nearly-black (or nearly-white, or arbitrary-color) image
collars to exact black/white and/or carves them out of an alpha/mask
band. Exact transcription of GDALNearblackTwoPassesAlgorithm
(nearblack_lib.cpp:360-537) and ProcessLine (:540-741):

* top-down pass over scanlines — each line processed left->right
  (horizontal + vertical checks) then right->left (horizontal only) —
  followed by a bottom-up pass over the ALREADY-MODIFIED raster with a
  fresh vertical-count array (the bottom-up horizontal check clamps
  maxNonBlack to 0, :466-468);
* a pixel is "near" a collar color when EVERY band is within nearDist
  of that color's band value, for ANY of the colors (:578-601);
* vertical check: per-column non-black run counter; a column stops
  eroding once its count exceeds maxNonBlack; a non-black pixel ON the
  first scanline (from either end) with maxNonBlack > 0 terminates the
  column immediately (:630-637);
* horizontal check: run of non-black pixels tolerated up to
  maxNonBlack (seeded from the vertical counter in grey areas,
  :689-698); scanning stops at the first over-budget run and resumes
  after a column whose vertical count is 0 (:735-739); note the loop
  EXCLUDES the far endpoint (`i != iEnd`, :672), transcribed verbatim;
* replace value is 255 only for the single-color all-255 case, else 0
  (:552-556); erased pixels zero the added alpha band / mask (:718-729).

The distributed form (`clean_collar_images`) maps the kernel over
decoded images in Arrow batches — per-image independent, no shuffle.
"""

from __future__ import annotations

import numpy as np


def _is_near(line: np.ndarray, colors: list[list[int]], near_dist: int):
    """Vector of bools per pixel: near ANY collar color on EVERY band
    (ProcessLine's two nested loops, vectorized per scanline)."""
    w = line.shape[0]
    near_any = np.zeros(w, bool)
    for color in colors:
        ok = np.ones(w, bool)
        for b, cv in enumerate(color):
            pix = line[:, b].astype(np.int64)
            ok &= ~((cv - pix > near_dist) | (pix > near_dist + cv))
        near_any |= ok
    return near_any


def _process_line(
    line: np.ndarray,
    mask: np.ndarray | None,
    i_start: int,
    i_end: int,
    n_src_bands: int,
    has_alpha: bool,
    near_dist: int,
    max_non_black: int,
    colors: list[list[int]],
    counts: np.ndarray,
    do_vertical: bool,
    bottom_up: bool,
    line_from_edge: int,
    replace_value: int,
) -> None:
    is_non_black = ~_is_near(line[:, :n_src_bands], colors, near_dist)

    if do_vertical:
        w = max(i_start + 1, i_end + 1)
        for i in range(w):
            if counts[i] > max_non_black:
                continue
            if is_non_black[i]:
                counts[i] += 1
                if counts[i] > max_non_black:
                    continue
                if line_from_edge == 0 and max_non_black > 0:
                    # valid data right at the raster edge: terminate
                    counts[i] = max_non_black + 1
                    continue
            line[i, :n_src_bands] = replace_value
            if has_alpha:
                line[i, -1] = 0
            if mask is not None:
                mask[i] = 0
        # the horizontal check below re-reads the (modified) scanline,
        # exactly as the reference re-reads pabyLine
        is_non_black = ~_is_near(line[:, :n_src_bands], colors, near_dist)

    if bottom_up:
        max_non_black = 0
    i_dir = 1 if i_start < i_end else -1
    do_test = True
    n_non_black = 0
    i = i_start
    while i != i_end:  # far endpoint excluded, as in the reference
        if do_test:
            if is_non_black[i]:
                if counts[i] <= max_non_black:
                    n_non_black = counts[i]
                else:
                    n_non_black += 1
                if n_non_black > max_non_black:
                    do_test = False
                    i += i_dir
                    continue
                if max_non_black > 0 and i == i_start:
                    do_test = False
                    i += i_dir
                    continue
            line[i, :n_src_bands] = replace_value
            if has_alpha:
                line[i, -1] = 0
            if mask is not None:
                mask[i] = 0
        elif counts[i] == 0:
            do_test = True
            n_non_black = 0
        i += i_dir


def nearblack(
    arr: np.ndarray,
    max_non_black: int = 2,
    near_dist: int = 15,
    white: bool = False,
    colors: list[list[int]] | None = None,
    set_alpha: bool = False,
    set_mask: bool = False,
):
    """-> (out, mask). out has an extra alpha band when set_alpha; mask
    is a uint8 (255/0) array when set_mask, else None."""
    a = np.asarray(arr)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, n_src = a.shape
    if colors is None or not len(colors):
        colors = [[255 if white else 0] * n_src]
    if len(colors[0]) != n_src:
        raise ValueError("color entries must have one value per band")
    replace_value = (
        255 if len(colors) == 1 and colors[0] and colors[0][0] == 255 else 0
    )
    n_dst = n_src + (1 if set_alpha else 0)
    out = np.empty((h, w, n_dst), np.uint8)
    out[:, :, :n_src] = a.astype(np.uint8)
    if set_alpha:
        out[:, :, -1] = 255
    mask = np.full((h, w), 255, np.uint8) if set_mask else None

    counts = np.zeros(w, np.int64)
    for y in range(h):
        m = mask[y] if mask is not None else None
        _process_line(out[y], m, 0, w - 1, n_src, set_alpha, near_dist,
                      max_non_black, colors, counts, True, False, y,
                      replace_value)
        _process_line(out[y], m, w - 1, 0, n_src, set_alpha, near_dist,
                      max_non_black, colors, counts, False, False, y,
                      replace_value)

    counts[:] = 0
    for y in range(h - 1, -1, -1):
        m = mask[y] if mask is not None else None
        _process_line(out[y], m, 0, w - 1, n_src, set_alpha, near_dist,
                      max_non_black, colors, counts, True, True,
                      h - 1 - y, replace_value)
        _process_line(out[y], m, w - 1, 0, n_src, set_alpha, near_dist,
                      max_non_black, colors, counts, False, True,
                      h - 1 - y, replace_value)

    if not set_alpha and arr.ndim == 2:
        return out[:, :, 0], mask
    return out, mask


def nearblack_floodfill(
    arr: np.ndarray,
    max_non_black: int = 2,
    near_dist: int = 15,
    white: bool = False,
    colors: list[list[int]] | None = None,
    set_alpha: bool = False,
    set_mask: bool = False,
):
    """The -alg floodfill variant (apps/nearblack_lib_floodfill.cpp):
    span-fill from every border pixel across pixels near ANY collar
    color (MustSet:100-145), replacing with bNearWhite ? 255 : 0
    (:594 — NOT the two-passes single-color rule). With
    maxNonBlack > 0 the two-passes algorithm runs FIRST and the flood
    fill cleans up its result (:597-618). Interior lakes disconnected
    from the border survive — the semantic difference from two-passes.
    """
    a = np.asarray(arr)
    squeeze = a.ndim == 2
    if squeeze:
        a = a[:, :, None]
    h, w, n_src = a.shape
    if colors is None or not len(colors):
        colors = [[255 if white else 0] * n_src]
    replace_value = 255 if white else 0

    if max_non_black > 0:
        pre, mask = nearblack(
            a, max_non_black=max_non_black, near_dist=near_dist,
            white=white, colors=colors, set_alpha=set_alpha,
            set_mask=True,
        )
        out = pre  # 3D (with alpha appended when set_alpha)
    else:
        n_dst = n_src + (1 if set_alpha else 0)
        out = np.empty((h, w, n_dst), np.uint8)
        out[:, :, :n_src] = a.astype(np.uint8)
        if set_alpha:
            out[:, :, -1] = 255
        mask = np.full((h, w), 255, np.uint8)

    # near-any-color mask on the current (possibly two-passes) data
    near = np.zeros((h, w), bool)
    flat = out[:, :, :n_src].reshape(-1, n_src)
    for color in colors:
        ok = np.ones(flat.shape[0], bool)
        for b, cv in enumerate(color):
            pix = flat[:, b].astype(np.int64)
            ok &= ~((cv - pix > near_dist) | (pix > near_dist + cv))
        near |= ok.reshape(h, w)

    # border-connected flood (4-connectivity), iterative frontier sweep
    visited = np.zeros((h, w), bool)
    frontier = np.zeros((h, w), bool)
    frontier[0, :] = near[0, :]
    frontier[-1, :] = near[-1, :]
    frontier[:, 0] = near[:, 0]
    frontier[:, -1] = near[:, -1]
    while frontier.any():
        visited |= frontier
        grow = np.zeros((h, w), bool)
        grow[1:, :] |= frontier[:-1, :]
        grow[:-1, :] |= frontier[1:, :]
        grow[:, 1:] |= frontier[:, :-1]
        grow[:, :-1] |= frontier[:, 1:]
        frontier = grow & near & ~visited

    out[visited, :n_src] = replace_value
    if set_alpha:
        out[visited, -1] = 0
    mask[visited] = 0
    out = out[:, :, 0] if squeeze and not set_alpha else out
    return out, (mask if set_mask else None)


def clean_collar_images(
    images,
    max_non_black: int = 2,
    near_dist: int = 15,
    white: bool = False,
):
    """Distributed `gdal raster clean-collar`: per-image kernel over
    decoded pixels in Arrow batches; emits per-band checksums + the
    surviving-pixel count (mask sum). No shuffle."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType()),
            T.StructField("checksums", T.ArrayType(T.LongType())),
            T.StructField("n_valid", T.LongType()),
        ]
    )

    def run(batches):
        from gdal_spark.functions import checksum as CK
        from gdal_spark.functions import codecs

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(r.bytes, r.fmt)
                out, m = nearblack(
                    arr, max_non_black=max_non_black, near_dist=near_dist,
                    white=white, set_mask=True,
                )
                rows.append(
                    (
                        r.image_id,
                        [int(c) for c in CK.checksum_image(out.astype(np.int32))],
                        int((m == 255).sum()),
                    )
                )
            yield pd.DataFrame(rows, columns=["image_id", "checksums", "n_valid"])

    return images.mapInPandas(run, schema)
