"""gdalmove + gdal_edit equivalents: georeferencing edits without pixel IO.

gdalmove (osgeo_utils/gdalmove.py `move`): re-fit the geotransform in a
new SRS from the transformed UL/UR/LL corners (exact at those three
points); report the residual at center/LR in pixels and refuse when it
exceeds the -et threshold.

gdal_edit (osgeo_utils/gdal_edit.py): -a_ullr / -a_ulurll / -unsetgt /
-a_nodata / -mo metadata — in this engine georeferencing lives in table
COLUMNS (gt array, nodata double, meta map), so every edit is a pure
Column expression over the images table: no pixel bytes are touched,
no shuffle, no Python.
"""

from __future__ import annotations

import numpy as np

from gdal_spark.functions.crs import transform_any


def _inv_gt(gt):
    det = gt[1] * gt[5] - gt[2] * gt[4]
    inv1, inv2 = gt[5] / det, -gt[2] / det
    inv4, inv5 = -gt[4] / det, gt[1] / det
    return (
        -(inv1 * gt[0] + inv2 * gt[3]),
        inv1,
        inv2,
        -(inv4 * gt[0] + inv5 * gt[3]),
        inv4,
        inv5,
    )


def move_geotransform(gt, w: int, h: int, s_srs: str, t_srs: str):
    """gdalmove.py move(): returns (new_gt, max_pixel_error) where the
    error is the worst corner/center displacement of the 3-point affine
    fit measured in pixels of the new grid."""
    pl = [(0, 0), (0, h), (w, 0), (w, h), (w / 2.0, h / 2.0)]
    sx = np.array([gt[0] + p * gt[1] + l * gt[2] for p, l in pl])
    sy = np.array([gt[3] + p * gt[4] + l * gt[5] for p, l in pl])
    tx, ty = transform_any(s_srs, t_srs, sx, sy)
    new_gt = (
        float(tx[0]),
        float(tx[2] - tx[0]) / w,
        float(tx[1] - tx[0]) / h,
        float(ty[0]),
        float(ty[2] - ty[0]) / w,
        float(ty[1] - ty[0]) / h,
    )
    inv = _inv_gt(new_gt)
    err = 0.0
    for (p, l), gx, gy in zip(pl, tx, ty):
        np_ = inv[0] + gx * inv[1] + gy * inv[2]
        nl = inv[3] + gx * inv[4] + gy * inv[5]
        err = max(err, abs(np_ - p), abs(nl - l))
    return new_gt, err


def move_images(df, s_srs: str, t_srs: str, threshold: float | None = None):
    """Distributed gdalmove over an image table (gt, w, h, ...): one
    Arrow batch per partition recomputes each row's geotransform; pixel
    bytes never move. Rows whose 3-point fit residual exceeds
    ``threshold`` pixels keep their original gt and get moved=false
    (gdalmove -et refusal)."""
    from pyspark.sql import types as T

    out_sch = T.StructType(
        df.schema.fields
        + [
            T.StructField("moved", T.BooleanType()),
            T.StructField("move_err_px", T.DoubleType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            gts, moved, errs = [], [], []
            for gt, w, h in zip(pdf["gt"], pdf["w"], pdf["h"]):
                ngt, err = move_geotransform(tuple(gt), int(w), int(h), s_srs, t_srs)
                ok = threshold is None or err <= threshold
                gts.append(list(ngt) if ok else list(gt))
                moved.append(bool(ok))
                errs.append(float(err))
            pdf = pdf.copy()
            pdf["gt"] = gts
            pdf["moved"] = moved
            pdf["move_err_px"] = errs
            yield pdf

    return df.mapInPandas(run, out_sch)


def gt_from_ullr(ulx, uly, lrx, lry, w: int, h: int):
    """gdal_edit -a_ullr."""
    return (ulx, (lrx - ulx) / float(w), 0.0, uly, 0.0, (lry - uly) / float(h))


def gt_from_ulurll(ulx, uly, urx, ury, llx, lly, w: int, h: int):
    """gdal_edit -a_ulurll (rotated geotransform from three points)."""
    return (
        ulx,
        (urx - ulx) / float(w),
        (llx - ulx) / float(h),
        uly,
        (ury - uly) / float(w),
        (lly - uly) / float(h),
    )


def edit_images(
    df,
    a_ullr=None,
    a_ulurll=None,
    a_srs=None,
    a_nodata=None,
    unsetgt=False,
    unsetnodata=False,
    mo=None,
):
    """Distributed gdal_edit over an image table: every option is a pure
    Column expression (whole-stage codegen, zero UDFs, zero pixel IO)."""
    from pyspark.sql import functions as F

    out = df
    if a_ullr is not None:
        ulx, uly, lrx, lry = (float(v) for v in a_ullr)
        out = out.withColumn(
            "gt",
            F.array(
                F.lit(ulx),
                (F.lit(lrx) - F.lit(ulx)) / F.col("w"),
                F.lit(0.0),
                F.lit(uly),
                F.lit(0.0),
                (F.lit(lry) - F.lit(uly)) / F.col("h"),
            ),
        )
    if a_ulurll is not None:
        ulx, uly, urx, ury, llx, lly = (float(v) for v in a_ulurll)
        out = out.withColumn(
            "gt",
            F.array(
                F.lit(ulx),
                (F.lit(urx) - F.lit(ulx)) / F.col("w"),
                (F.lit(llx) - F.lit(ulx)) / F.col("h"),
                F.lit(uly),
                (F.lit(ury) - F.lit(uly)) / F.col("w"),
                (F.lit(lly) - F.lit(uly)) / F.col("h"),
            ),
        )
    if unsetgt:
        out = out.withColumn("gt", F.lit(None).cast("array<double>"))
    if a_srs is not None:
        out = out.withColumn("srs", F.lit(a_srs))
    if a_nodata is not None:
        out = out.withColumn("nodata", F.lit(float(a_nodata)))
    if unsetnodata:
        out = out.withColumn("nodata", F.lit(None).cast("double"))
    if mo:
        pairs = []
        for k, v in mo.items():
            pairs.extend([F.lit(str(k)), F.lit(str(v))])
        new_map = F.create_map(*pairs)
        if "meta" in out.columns:
            out = out.withColumn(
                "meta",
                F.map_concat(F.coalesce(F.col("meta"), F.create_map()), new_map),
            )
        else:
            out = out.withColumn("meta", new_map)
    return out
