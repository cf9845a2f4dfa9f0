"""gdal2xyz equivalent: raster -> x y z text / arrays / DataFrame.

Re-expresses osgeo_utils/gdal2xyz.py:

  * pixel-center coords through the full affine (gdal2xyz.py:195-197,
    including the rotation terms gt[2]/gt[4]);
  * coordinate format %.10g when the geotransform looks geographic
    (|origin| and |extent| < 180), else %.3f (gdal2xyz.py:113-121);
  * band format %d for Int32/UInt32 else %g (gdal2xyz.py:107-110);
  * src_nodata matches a pixel only when ALL selected bands equal it
    (np.array_equal on the band vector, gdal2xyz.py:188);
  * skip_nodata drops those rows; dst_nodata (without skip) replaces
    them (gdal2xyz.py:140-142 precedence: skip wins over replace);
  * srcwin + skip decimation iterate rows/cols by stride.

Distributed form ``raster_to_xyz``: decode + explode per image via
mapInPandas — embarrassingly parallel, output rows ∝ pixels, no shuffle.
"""

from __future__ import annotations

import numpy as np


def _formats(gt, xsize, ysize, dtype, n_bands, delim=" "):
    if (
        abs(gt[0]) < 180
        and abs(gt[3]) < 180
        and abs(xsize * gt[1]) < 180
        and abs(ysize * gt[5]) < 180
    ):
        frmt = "%.10g" + delim + "%.10g" + delim + "%s"
    else:
        frmt = "%.3f" + delim + "%.3f" + delim + "%s"
    if np.issubdtype(dtype, np.integer) and np.dtype(dtype).itemsize == 4:
        band_format = (("%d" + delim) * n_bands).rstrip(delim) + "\n"
    else:
        band_format = (("%g" + delim) * n_bands).rstrip(delim) + "\n"
    return frmt, band_format


def gdal2xyz_arrays(
    arr,
    gt,
    band_nums=None,
    srcwin=None,
    skip=1,
    src_nodata=None,
    dst_nodata=None,
    skip_nodata=False,
):
    """numpy core. arr: HxW or HxWxB. Returns (geo_x, geo_y, data) with
    data shaped (n, bands), rows in the reference's y-then-x scan order."""
    a = arr if arr.ndim == 3 else arr[:, :, None]
    if band_nums:
        a = a[:, :, [b - 1 for b in band_nums]]
    h, w, nb = a.shape
    if srcwin is None:
        srcwin = (0, 0, w, h)
    x_skip, y_skip = (skip, skip) if np.isscalar(skip) else skip
    x_off, y_off, x_size, y_size = srcwin

    if src_nodata is not None and np.isscalar(src_nodata):
        src_nodata = [src_nodata] * nb
    if dst_nodata is not None and np.isscalar(dst_nodata):
        dst_nodata = [dst_nodata] * nb
    if src_nodata is None:
        dst_nodata = None
        skip_nodata = False
    replace = (not skip_nodata) and (dst_nodata is not None)

    ys = np.arange(y_off, y_off + y_size, y_skip)
    xs = np.arange(0, x_size, x_skip) + x_off
    jj, ii = np.meshgrid(xs, ys)
    data = a[ii.ravel(), jj.ravel(), :]
    geo_x = gt[0] + (jj.ravel() + 0.5) * gt[1] + (ii.ravel() + 0.5) * gt[2]
    geo_y = gt[3] + (jj.ravel() + 0.5) * gt[4] + (ii.ravel() + 0.5) * gt[5]

    if src_nodata is not None and (skip_nodata or replace):
        nod = np.asarray(src_nodata, dtype=a.dtype)
        is_nod = (data == nod[None, :]).all(axis=1)
        if skip_nodata:
            keep = ~is_nod
            geo_x, geo_y, data = geo_x[keep], geo_y[keep], data[keep]
        elif replace:
            data = np.where(
                is_nod[:, None], np.asarray(dst_nodata, dtype=a.dtype)[None, :], data
            )
    return geo_x, geo_y, data


def gdal2xyz_text(
    arr,
    gt,
    band_nums=None,
    srcwin=None,
    skip=1,
    src_nodata=None,
    dst_nodata=None,
    skip_nodata=False,
    delim=" ",
) -> bytes:
    """exact text form (the file gdal2xyz writes)."""
    a = arr if arr.ndim == 3 else arr[:, :, None]
    h, w = a.shape[:2]
    geo_x, geo_y, data = gdal2xyz_arrays(
        arr, gt, band_nums, srcwin, skip, src_nodata, dst_nodata, skip_nodata
    )
    frmt, band_format = _formats(gt, w, h, data.dtype, data.shape[1], delim)
    lines = [
        frmt % (float(x), float(y), band_format % tuple(v))
        for x, y, v in zip(geo_x, geo_y, data)
    ]
    return "".join(lines).encode("utf-8")


def raster_to_xyz(
    df,
    band_nums=None,
    src_nodata=None,
    dst_nodata=None,
    skip_nodata=False,
    skip=1,
    n_bands=1,
):
    """Distributed gdal2xyz over an image table (image_id, bytes, fmt,
    gt). Returns (image_id, geo_x, geo_y, b1..bn) — one Arrow-batched
    decode+explode per image, no driver involvement, no shuffle."""
    import pandas as pd
    from pyspark.sql import types as T

    nb = len(band_nums) if band_nums else n_bands
    fields = [
        T.StructField("image_id", T.StringType()),
        T.StructField("geo_x", T.DoubleType()),
        T.StructField("geo_y", T.DoubleType()),
    ] + [T.StructField(f"b{i+1}", T.DoubleType()) for i in range(nb)]
    sch = T.StructType(fields)

    def run(batches):
        from gdal_spark.functions import codecs

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                gx, gy, data = gdal2xyz_arrays(
                    arr,
                    tuple(r.gt),
                    band_nums=band_nums,
                    skip=skip,
                    src_nodata=src_nodata,
                    dst_nodata=dst_nodata,
                    skip_nodata=skip_nodata,
                )
                for x, y, v in zip(gx, gy, data):
                    rows.append((r.image_id, float(x), float(y), *map(float, v)))
            yield pd.DataFrame(rows, columns=[f.name for f in sch.fields])

    return df.mapInPandas(run, sch)
