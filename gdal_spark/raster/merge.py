"""gdal_merge equivalent: georeferenced mosaic paste-in-order.

Re-expresses osgeo_utils/gdal_merge.py over (array, geotransform) pairs:

  * union bounds of all inputs (or explicit ``ul_lr``), pixel size from
    the first input (or ``psize``), -tap grid snapping
    (gdal_merge.py:557-568).
  * output band count: first input's bands, or the SUM of input band
    counts with ``separate`` (gdal_merge.py:569-576).
  * inputs painted IN ORDER, later files fully overwriting earlier ones
    band-by-band; with ``nodata`` (-n) source cells equal to that value
    leave the target untouched (raster_copy_with_nodata).
  * copy windows use the reference's exact +0.1 / +0.5 pixel rounding
    (gdal_merge.py copy_into:319-338).
  * ``init`` pre-fills bands (one value, or one per band).

Distributed form ``merge_tiles``: the output grid is decomposed into
tiles; input georeferencing (a few doubles per image — metadata only,
no pixels) is broadcast, each tile task decodes ONLY the inputs whose
bounds intersect its tile and paints them in input order. At 100 TB the
plan is one codegen scan + Arrow-batched paint stage per tile: work and
bytes are proportional to output area, never to n_inputs x n_tiles.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np


def _bounds(gt, w: int, h: int):
    return gt[0], gt[3], gt[0] + w * gt[1], gt[3] + h * gt[5]


def _nbands(a: np.ndarray) -> int:
    return 1 if a.ndim == 2 else a.shape[2]


def _band(a: np.ndarray, b: int) -> np.ndarray:
    return a if a.ndim == 2 else a[:, :, b - 1]


def _copy_into(
    src: np.ndarray,
    s_gt,
    out: np.ndarray,
    t_gt,
    s_band: int,
    t_band: int,
    nodata=None,
) -> None:
    """reference copy_into window math (gdal_merge.py:294-338)"""
    th, tw = out.shape[:2]
    sh, sw = src.shape[:2]
    t_ulx, t_uly, t_lrx, t_lry = _bounds(t_gt, tw, th)
    s_ulx, s_uly, s_lrx, s_lry = _bounds(s_gt, sw, sh)

    gw_ulx = max(t_ulx, s_ulx)
    gw_lrx = min(t_lrx, s_lrx)
    if t_gt[5] < 0:
        gw_uly = min(t_uly, s_uly)
        gw_lry = max(t_lry, s_lry)
    else:
        gw_uly = max(t_uly, s_uly)
        gw_lry = min(t_lry, s_lry)
    if gw_ulx >= gw_lrx:
        return
    if (t_gt[5] < 0 and gw_uly <= gw_lry) or (t_gt[5] > 0 and gw_uly >= gw_lry):
        return

    tx0 = int((gw_ulx - t_gt[0]) / t_gt[1] + 0.1)
    ty0 = int((gw_uly - t_gt[3]) / t_gt[5] + 0.1)
    txs = int((gw_lrx - t_gt[0]) / t_gt[1] + 0.5) - tx0
    tys = int((gw_lry - t_gt[3]) / t_gt[5] + 0.5) - ty0
    if txs < 1 or tys < 1:
        return
    sx0 = int((gw_ulx - s_gt[0]) / s_gt[1] + 0.1)
    sy0 = int((gw_uly - s_gt[3]) / s_gt[5] + 0.1)
    sxs = int((gw_lrx - s_gt[0]) / s_gt[1] + 0.5) - sx0
    sys_ = int((gw_lry - s_gt[3]) / s_gt[5] + 0.5) - sy0
    if sxs < 1 or sys_ < 1:
        return

    patch = _band(src, s_band)[sy0 : sy0 + sys_, sx0 : sx0 + sxs]
    if (sys_, sxs) != (tys, txs):
        # different resolution: nearest resample like gdal's RasterIO
        yi = (np.arange(tys) * sys_ // tys).clip(0, sys_ - 1)
        xi = (np.arange(txs) * sxs // txs).clip(0, sxs - 1)
        patch = patch[np.ix_(yi, xi)]
    tgt = out[ty0 : ty0 + tys, tx0 : tx0 + txs, t_band - 1]
    if nodata is not None:
        keep = patch == nodata
        out[ty0 : ty0 + tys, tx0 : tx0 + txs, t_band - 1] = np.where(
            keep, tgt, patch
        ).astype(out.dtype)
    else:
        out[ty0 : ty0 + tys, tx0 : tx0 + txs, t_band - 1] = patch.astype(out.dtype)


def gdal_merge(
    inputs,
    separate: bool = False,
    out_type=None,
    psize=None,
    ul_lr=None,
    init=None,
    nodata=None,
    tap: bool = False,
):
    """numpy core. inputs: list of (array (H,W[,C]), geotransform 6-tuple).
    Returns (out array (H, W, bands), output geotransform)."""
    if not inputs:
        raise ValueError("gdal_merge: no inputs")
    if ul_lr is not None:
        ulx, uly, lrx, lry = ul_lr
    else:
        bs = [_bounds(gt, a.shape[1], a.shape[0]) for a, gt in inputs]
        ulx = min(b[0] for b in bs)
        uly = max(b[1] for b in bs)
        lrx = max(b[2] for b in bs)
        lry = min(b[3] for b in bs)
    if psize is None:
        psx, psy = inputs[0][1][1], inputs[0][1][5]
    else:
        psx, psy = psize
    if tap:
        ulx = math.floor(ulx / psx) * psx
        lrx = math.ceil(lrx / psx) * psx
        lry = math.floor(lry / -psy) * -psy
        uly = math.ceil(uly / -psy) * -psy
    gt = (ulx, psx, 0.0, uly, 0.0, psy)
    xsize = int((lrx - ulx) / psx + 0.5)
    ysize = int((lry - uly) / psy + 0.5)

    if separate:
        bands = sum(_nbands(a) for a, _ in inputs)
    else:
        bands = _nbands(inputs[0][0])
    dtype = np.dtype(out_type) if out_type is not None else inputs[0][0].dtype

    out = np.zeros((ysize, xsize, bands), dtype=dtype)
    if init is not None:
        vals = init if isinstance(init, (list, tuple)) else [init]
        for b in range(bands):
            out[:, :, b] = vals[b] if b < len(vals) else vals[0]

    t_band = 1
    for arr, s_gt in inputs:
        if separate:
            for b in range(1, _nbands(arr) + 1):
                _copy_into(arr, s_gt, out, gt, b, t_band, nodata)
                t_band += 1
        else:
            for b in range(1, bands + 1):
                if b <= _nbands(arr):
                    _copy_into(arr, s_gt, out, gt, b, b, nodata)
    return out, gt


def merge_tiles(
    df,
    tile: int = 256,
    fmt_col: str = "fmt",
    bytes_col: str = "bytes",
    init=None,
    nodata=None,
    psize=None,
    out_type=None,
):
    """Distributed gdal_merge over an image table with columns
    (image_id, seq, bytes, fmt, gt array<double>). ``seq`` fixes paint
    order (later overwrites earlier, the reference's file-order rule).

    Plan: one metadata-only aggregate fixes the output grid (bounds +
    the seq-first input's pixel size in a SINGLE aggregated row on the
    driver — never per-image rows, never pixels); the output is decomposed
    into ``tile``-px tiles; each input row is mapped to the tiles its
    bounds intersect (pure-Column math over the broadcast grid), then a
    groupBy(tile) applyInPandas paints intersecting inputs in seq
    order. Output: (tile_x, tile_y, bytes, w, h, gt).
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    # output grid from ONE scalar aggregate (retile.py pattern): bounds
    # via min/max over per-row corner expressions, pixel size from the
    # first input by seq — never a per-image collect (input may be 10^12
    # rows; the old collect was round 2's last driver-memory bottleneck)
    ext = df.select(
        F.min(F.col("gt")[0]).alias("ulx"),
        F.max(F.col("gt")[3]).alias("uly"),
        F.max(F.col("gt")[0] + F.col("w") * F.col("gt")[1]).alias("lrx"),
        F.min(F.col("gt")[3] + F.col("h") * F.col("gt")[5]).alias("lry"),
        F.min_by(F.col("gt"), F.col("seq")).alias("gt0"),
    ).collect()[0]
    ulx, uly, lrx, lry = ext.ulx, ext.uly, ext.lrx, ext.lry
    psx, psy = psize if psize else (ext.gt0[1], ext.gt0[5])
    gt = (ulx, psx, 0.0, uly, 0.0, psy)
    xsize = int((lrx - ulx) / psx + 0.5)
    ysize = int((lry - uly) / psy + 0.5)
    ntx = (xsize + tile - 1) // tile
    nty = (ysize + tile - 1) // tile

    # map each input to intersecting tiles: pure Column math, no UDF
    tx0 = F.floor((F.col("bulx") - F.lit(ulx)) / F.lit(psx * tile)).cast("int")
    tx1 = F.ceil((F.col("blrx") - F.lit(ulx)) / F.lit(psx * tile)).cast("int")
    ty0 = F.floor((F.col("buly") - F.lit(uly)) / F.lit(psy * tile)).cast("int")
    ty1 = F.ceil((F.col("blry") - F.lit(uly)) / F.lit(psy * tile)).cast("int")
    withb = (
        df.withColumn("bulx", F.col("gt")[0])
        .withColumn("buly", F.col("gt")[3])
        .withColumn("blrx", F.col("gt")[0] + F.col("w") * F.col("gt")[1])
        .withColumn("blry", F.col("gt")[3] + F.col("h") * F.col("gt")[5])
        .withColumn("tx0", F.greatest(tx0, F.lit(0)))
        .withColumn("tx1", F.least(tx1, F.lit(ntx)))
        .withColumn("ty0", F.greatest(ty0, F.lit(0)))
        .withColumn("ty1", F.least(ty1, F.lit(nty)))
    )
    exploded = withb.select(
        "image_id", "seq", bytes_col, fmt_col, "gt",
        F.explode(F.sequence("tx0", F.col("tx1") - 1)).alias("tile_x"),
        "ty0", "ty1",
    ).select(
        "image_id", "seq", bytes_col, fmt_col, "gt", "tile_x",
        F.explode(F.sequence("ty0", F.col("ty1") - 1)).alias("tile_y"),
    )

    out_sch = T.StructType(
        [
            T.StructField("tile_x", T.IntegerType()),
            T.StructField("tile_y", T.IntegerType()),
            T.StructField("bytes", T.BinaryType()),
            T.StructField("w", T.IntegerType()),
            T.StructField("h", T.IntegerType()),
            T.StructField("gt", T.ArrayType(T.DoubleType())),
        ]
    )
    dtype = np.dtype(out_type) if out_type is not None else None
    init_v, nodata_v, fmt_c, bytes_c = init, nodata, fmt_col, bytes_col

    def paint(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from gdal_spark.functions import codecs
        from gdal_spark.functions.tiff import tiff_encode

        txk, tyk = int(key[0]), int(key[1])
        tx_px = min(tile, xsize - txk * tile)
        ty_px = min(tile, ysize - tyk * tile)
        t_gt = (
            ulx + txk * tile * psx, psx, 0.0,
            uly + tyk * tile * psy, 0.0, psy,
        )
        pdf = pdf.sort_values("seq")
        first = codecs.decode_image(bytes(pdf.iloc[0][bytes_c]), pdf.iloc[0][fmt_c])
        dt = dtype or first.dtype
        nb = _nbands(first)
        out = np.zeros((ty_px, tx_px, nb), dtype=dt)
        if init_v is not None:
            out[:] = init_v
        for r in pdf.itertuples(index=False):
            arr = codecs.decode_image(bytes(getattr(r, bytes_c)), getattr(r, fmt_c))
            for b in range(1, min(_nbands(arr), nb) + 1):
                _copy_into(arr, tuple(r.gt), out, t_gt, b, b, nodata_v)
        enc = tiff_encode(out[:, :, 0] if nb == 1 else out)
        return pd.DataFrame(
            [(txk, tyk, enc, tx_px, ty_px, list(t_gt))],
            columns=[f.name for f in out_sch.fields],
        )

    return exploded.groupBy("tile_x", "tile_y").applyInPandas(paint, out_sch)
