"""gdal_retile equivalent: regular tiling + pyramid levels.

Re-expresses osgeo_utils/gdal_retile.py:

  * tile grid: offsets advance by (tile - overlap); edge tiles truncate
    (tile_info:87-103, tileImage:414-421).
  * mosaic of the inputs at the FIRST input's pixel size over the union
    extent, pasted with the reference's +0.5 window rounding
    (mosaic_info.getDataSet:214-266); inputs with a different pixel
    size are nearest-resampled by the window read, like the
    RasterIO-based paste.
  * pyramid level N: size = int(prev/2), tile geotransform scale*2,
    pixels = GDALReprojectImage of the previous level's mosaic window
    (createPyramidTile:522-600) — same-CRS affine remap through the
    GWK resampler family (raster/kernels.py), bilinear by default.
  * tiles with no source coverage are skipped (getDataSet None path —
    the non-contiguous autotest case).

Distributed form ``retile_tiles``: level-0 tiles are independent tasks
(bbox-pruned inputs per tile, exactly merge_tiles' shape but with
overlap-extended windows); each pyramid level is one more
explode->groupBy(tile)->paint+warp stage over the PREVIOUS level's
tiles — work per level is proportional to that level's output area, so
the whole pyramid costs ~4/3 of the base scan, the gdal2tiles pipeline
shape the engine already uses (tiles/pipeline.py).
"""

from __future__ import annotations

import numpy as np

from gdal_spark.raster.merge import _bounds, _copy_into, _nbands


def tile_grid(width: int, height: int, tw: int, th: int, overlap: int = 0):
    """(row, col, offx, offy, w, h) per tile, 1-based indices
    (tile_info count formula + tileImage truncation)"""
    ntx = max(1, int((width - tw + (tw - overlap) - 1) / (tw - overlap)) + 1) if width > tw else 1
    nty = max(1, int((height - th + (th - overlap) - 1) / (th - overlap)) + 1) if height > th else 1
    out = []
    for yi in range(1, nty + 1):
        for xi in range(1, ntx + 1):
            offx = (xi - 1) * (tw - overlap)
            offy = (yi - 1) * (th - overlap)
            w = min(tw, width - offx)
            h = min(th, height - offy)
            if w < 1 or h < 1:
                continue
            out.append((yi, xi, offx, offy, w, h))
    return out


def _mosaic(inputs, gt, xsize, ysize, init=None):
    """paste inputs (in order) onto the target grid"""
    first = inputs[0][0]
    nb = max(_nbands(a) for a, _ in inputs)
    out = np.zeros((ysize, xsize, nb), dtype=first.dtype)
    if init is not None:
        out[:] = init
    for arr, s_gt in inputs:
        for b in range(1, _nbands(arr) + 1):
            _copy_into(arr, s_gt, out, gt, b, b)
    return out


def _tri(x):
    return np.maximum(0.0, 1.0 - np.abs(x))


def _affine_resample(src, s_gt, t_gt, out_w, out_h, method="bilinear",
                     alpha_last_band=False):
    """GDALReprojectImage with identical SRS = affine grid remap through
    the GWK resampler (alg/gdalwarpkernel.cpp):

      * src coords at dst pixel centers; the 4-sample bilinear formula is
        only legal when dfXScale > 0.5 (CanUse4SamplesFormula:1041-1054);
        at >=2x downsampling GWKResample:4027 applies the triangle kernel
        widened by 1/scale (radius ceil(1/scale), weights
        tri((i-delta)*scale)) and renormalises by the accumulated weight.
      * when the last band is alpha, GDALReprojectImage:84 maps it to
        src/dst alpha; the warp gates every OUTPUT pixel on the density
        of the CENTER source pixel (pafUnifiedSrcDensity[iSrcOffset],
        gdalwarpkernel.cpp:5660-5680 — "ignores the multi-pixel input of
        bilinear"), resamples color over d>0 pixels only (renormalised,
        GWKResample density skip), and writes dst alpha = density*255.
    """
    jj, ii = np.meshgrid(np.arange(out_w), np.arange(out_h))
    # GWK convention: pixel k spans [k, k+1]
    sx = (t_gt[0] + (jj + 0.5) * t_gt[1] - s_gt[0]) / s_gt[1]
    sy = (t_gt[3] + (ii + 0.5) * t_gt[5] - s_gt[3]) / s_gt[5]
    h, w = src.shape[:2]
    src3 = src if src.ndim == 3 else src[:, :, None]
    nb = src3.shape[2]

    # center source pixel (GWKCheckAndComputeSrcOffsets:5346 truncation)
    cx = np.clip((sx + 1e-10).astype(np.int64), 0, w - 1)
    cy = np.clip((sy + 1e-10).astype(np.int64), 0, h - 1)
    in_img = (sx >= 0) & (sy >= 0) & (sx <= w + 1e-10) & (sy <= h + 1e-10)

    if alpha_last_band:
        density = src3[:, :, nb - 1].astype(np.float64) / 255.0
        write = in_img & (density[cy, cx] > 1e-9)
        dmask = density > 1e-9
    else:
        density = np.ones((h, w))
        write = in_img
        dmask = np.ones((h, w), bool)

    if method in ("near", "nearest"):
        out = src3[cy, cx].astype(np.float64)
        out_d = density[cy, cx]
    else:
        scale = min(abs(s_gt[1] / t_gt[1]), 1.0)  # dfXScale (square pixels)
        radius = 1 if scale > 0.5 else int(np.ceil(1.0 / scale))
        ksc = scale if scale < 1.0 else 1.0
        ix0 = np.floor(sx - 0.5).astype(np.int64)
        iy0 = np.floor(sy - 0.5).astype(np.int64)
        dx = sx - 0.5 - ix0
        dy = sy - 0.5 - iy0
        num = np.zeros((out_h, out_w, nb))
        den = np.zeros((out_h, out_w))
        dnum = np.zeros((out_h, out_w))
        lo = 1 - radius
        for oj in range(lo, radius + 1):
            py = iy0 + oj
            wy = _tri((oj - dy) * ksc)
            okY = (py >= 0) & (py < h)
            pyc = np.clip(py, 0, h - 1)
            for oi in range(lo, radius + 1):
                px = ix0 + oi
                wx = _tri((oi - dx) * ksc)
                ok = okY & (px >= 0) & (px < w)
                pxc = np.clip(px, 0, w - 1)
                ok = ok & dmask[pyc, pxc]
                wgt = np.where(ok, wy * wx, 0.0)
                num += wgt[:, :, None] * src3[pyc, pxc].astype(np.float64)
                dnum += wgt * density[pyc, pxc]
                den += wgt
        good = den > 1e-6
        out = np.where(good[:, :, None], num / np.maximum(den, 1e-30)[:, :, None], 0.0)
        out_d = np.where(good, dnum / np.maximum(den, 1e-30), 0.0)
        write = write & good & (out_d > 1e-5)

    if alpha_last_band:
        out[:, :, nb - 1] = out_d * 255.0
    out = np.where(write[:, :, None], out, 0.0)
    if np.issubdtype(src3.dtype, np.integer):
        info = np.iinfo(src3.dtype)
        out = np.clip(np.floor(out + 0.5), info.min, info.max)
    out = out.astype(src3.dtype)
    return out if src.ndim == 3 else out[:, :, 0]


def _covered(tgt_bounds, input_bounds):
    """closed-set bbox intersection — OGR SetSpatialFilterRect includes
    boundary-touching tile polygons, so gdal_retile creates (all-zero)
    tiles that merely touch a source (the non-contiguous autotest expects
    in1_01_05.tif to exist)."""
    ulx, uly, lrx, lry = tgt_bounds
    for bulx, buly, blrx, blry in input_bounds:
        if bulx <= lrx and blrx >= ulx and blry <= uly and buly >= lry:
            return True
    return False


def retile(
    inputs,
    ps=(256, 256),
    overlap: int = 0,
    levels: int = 0,
    resampling: str = "bilinear",
    nodata=None,
    alpha: bool = False,
):
    """numpy core. inputs: list of (array, geotransform). ``alpha`` marks
    the last band as alpha (GDALReprojectImage auto-detection of
    GCI_AlphaBand, alg/gdalwarper.cpp:135-152).

    Returns {level: [(row, col, array, geotransform), ...]} with level 0
    the base tiling; uncovered tiles are skipped.
    """
    tw, th = ps
    bs = [_bounds(gt, a.shape[1], a.shape[0]) for a, gt in inputs]
    ulx = min(b[0] for b in bs)
    uly = max(b[1] for b in bs)
    lrx = max(b[2] for b in bs)
    lry = min(b[3] for b in bs)
    psx, psy = inputs[0][1][1], inputs[0][1][5]
    gt0 = (ulx, psx, 0.0, uly, 0.0, psy)
    xsize = int((lrx - ulx) / psx + 0.5)
    ysize = int((lry - uly) / psy + 0.5)

    mosaic = _mosaic(inputs, gt0, xsize, ysize, init=nodata)
    out: dict[int, list] = {0: []}
    for yi, xi, ox, oy, w, h in tile_grid(xsize, ysize, tw, th, overlap):
        t_gt = (gt0[0] + ox * psx, psx, 0.0, gt0[3] + oy * psy, 0.0, psy)
        if not _covered(_bounds(t_gt, w, h), bs):
            continue
        out[0].append((yi, xi, mosaic[oy : oy + h, ox : ox + w].copy(), t_gt))

    # each pyramid level's coverage test runs against the PREVIOUS level's
    # created tiles (the reference indexes level N-1 tiles in OGR and asks
    # that index), so boundary-touch tiles cascade outward one ring per
    # level — the non-contiguous autotest expects 1/in1_1_2.tif.
    prev_bounds = [_bounds(gt, a.shape[1], a.shape[0]) for _, _, a, gt in out[0]]
    prev_mosaic, prev_gt = mosaic, gt0
    prev_x, prev_y = xsize, ysize
    for level in range(1, levels + 1):
        lx, ly = int(prev_x / 2), int(prev_y / 2)
        sx, sy = prev_gt[1] * 2, prev_gt[5] * 2
        out[level] = []
        lvl_tiles = []
        for yi, xi, ox, oy, w, h in tile_grid(lx, ly, tw, th, overlap):
            t_gt = (prev_gt[0] + ox * sx, sx, 0.0, prev_gt[3] + oy * sy, 0.0, sy)
            if not _covered(_bounds(t_gt, w, h), prev_bounds):
                continue
            tile = _affine_resample(
                prev_mosaic, prev_gt, t_gt, w, h, resampling,
                alpha_last_band=alpha,
            )
            tile = tile.astype(prev_mosaic.dtype)
            out[level].append((yi, xi, tile, t_gt))
            lvl_tiles.append((tile, t_gt))
        if not lvl_tiles:
            break
        prev_bounds = [_bounds(gt, a.shape[1], a.shape[0]) for a, gt in lvl_tiles]
        prev_gt = (prev_gt[0], sx, 0.0, prev_gt[3], 0.0, sy)
        prev_mosaic = _mosaic(lvl_tiles, prev_gt, lx, ly, init=nodata)
        prev_x, prev_y = lx, ly
    return out


def retile_tiles(
    df,
    ps=(256, 256),
    overlap: int = 0,
    levels: int = 0,
    resampling: str = "bilinear",
    alpha: bool = False,
):
    """Distributed retile over an image table (image_id, seq, bytes,
    fmt, gt, w, h). Level 0: bbox-pruned paint per tile (merge_tiles
    shape, overlap-extended windows). Each pyramid level re-tiles the
    previous level's OUTPUT tiles — one explode -> groupBy(tile) ->
    paint + GWK-resample stage per level, never the full-resolution
    input again. Returns (level, tile_row, tile_col, bytes, w, h, gt).
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    tw, th = ps
    # mosaic extent + reference pixel size via ONE scalar aggregate — never
    # collect per-image metadata (the input may be 10^12 rows)
    ext = df.select(
        F.min(F.col("gt")[0]).alias("ulx"),
        F.max(F.col("gt")[3]).alias("uly"),
        F.max(F.col("gt")[0] + F.col("w") * F.col("gt")[1]).alias("lrx"),
        F.min(F.col("gt")[3] + F.col("h") * F.col("gt")[5]).alias("lry"),
        F.min_by(F.col("gt"), F.col("seq")).alias("gt0"),
    ).collect()[0]
    ulx, uly, lrx, lry = ext.ulx, ext.uly, ext.lrx, ext.lry
    psx, psy = ext.gt0[1], ext.gt0[5]

    out_sch = T.StructType(
        [
            T.StructField("level", T.IntegerType()),
            T.StructField("tile_row", T.IntegerType()),
            T.StructField("tile_col", T.IntegerType()),
            T.StructField("bytes", T.BinaryType()),
            T.StructField("w", T.IntegerType()),
            T.StructField("h", T.IntegerType()),
            T.StructField("gt", T.ArrayType(T.DoubleType())),
        ]
    )

    spark = df.sparkSession

    def level_pass(src_df, l_gt, l_x, l_y, level, resample):
        grid = tile_grid(l_x, l_y, tw, th, overlap)
        grid_rows = [
            (yi, xi, list((l_gt[0] + ox * l_gt[1], l_gt[1], 0.0,
                           l_gt[3] + oy * l_gt[5], 0.0, l_gt[5])), w, h)
            for yi, xi, ox, oy, w, h in grid
        ]
        gdf = spark.createDataFrame(
            pd.DataFrame(
                grid_rows, columns=["tile_row", "tile_col", "tgt", "tw_", "th_"]
            )
        )
        src = (
            src_df.withColumn("bulx", F.col("gt")[0])
            .withColumn("buly", F.col("gt")[3])
            .withColumn("blrx", F.col("gt")[0] + F.col("w") * F.col("gt")[1])
            .withColumn("blry", F.col("gt")[3] + F.col("h") * F.col("gt")[5])
        )
        joined = src.join(
            F.broadcast(gdf),
            (F.col("bulx") <= F.col("tgt")[0] + F.col("tw_") * F.col("tgt")[1])
            & (F.col("blrx") >= F.col("tgt")[0])
            & (F.col("buly") >= F.col("tgt")[3] + F.col("th_") * F.col("tgt")[5])
            & (F.col("blry") <= F.col("tgt")[3]),
        )

        def paint(key, pdf: pd.DataFrame) -> pd.DataFrame:
            from gdal_spark.functions import codecs
            from gdal_spark.functions.tiff import tiff_encode

            row, col = int(key[0]), int(key[1])
            t_gt = tuple(pdf.iloc[0]["tgt"])
            w, h = int(pdf.iloc[0]["tw_"]), int(pdf.iloc[0]["th_"])
            pdf = pdf.sort_values("seq")
            arrs = [
                (codecs.decode_image(bytes(r.bytes), r.fmt), tuple(r.gt))
                for r in pdf.itertuples(index=False)
            ]
            if resample is None:
                # level 0: same-scale window paste
                out = _mosaic(arrs, t_gt, w, h)
            else:
                # paste at source scale over the window, then GWK resample
                s_gt = (t_gt[0], t_gt[1] / 2, 0.0, t_gt[3], 0.0, t_gt[5] / 2)
                win = _mosaic(arrs, s_gt, w * 2, h * 2)
                out = _affine_resample(
                    win, s_gt, t_gt, w, h, resample, alpha_last_band=alpha
                )
            enc = tiff_encode(out[:, :, 0] if out.shape[2] == 1 else out)
            return pd.DataFrame(
                [(level, row, col, enc, w, h, list(t_gt))],
                columns=[f.name for f in out_sch.fields],
            )

        return joined.groupBy("tile_row", "tile_col").applyInPandas(paint, out_sch)

    gt0 = (ulx, psx, 0.0, uly, 0.0, psy)
    xsize = int((lrx - ulx) / psx + 0.5)
    ysize = int((lry - uly) / psy + 0.5)
    result = level_pass(df, gt0, xsize, ysize, 0, None)
    prev = result
    lx, ly, l_gt = xsize, ysize, gt0
    for level in range(1, levels + 1):
        lx, ly = int(lx / 2), int(ly / 2)
        l_gt = (l_gt[0], l_gt[1] * 2, 0.0, l_gt[3], 0.0, l_gt[5] * 2)
        src = prev.select(
            F.concat(F.lit("t"), "tile_row", F.lit("_"), "tile_col").alias("image_id"),
            F.lit(0).alias("seq"),
            "bytes",
            F.lit("tiff").alias("fmt"),
            "gt",
            "w",
            "h",
        ).localCheckpoint()
        lvl = level_pass(src, l_gt, lx, ly, level, resampling)
        result = result.unionByName(lvl)
        prev = lvl
    return result
