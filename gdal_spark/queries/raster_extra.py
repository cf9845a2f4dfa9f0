"""Remaining raster conversion entries: rasterize, histogram,
as-features, mosaic composite.

Reference coverage:
  * rasterize — GDALRasterizeGeometries scanline burn + MERGE_ALG=ADD
    (alg/gdalrasterize.cpp:999, alg/llrasterize.cpp:197).
  * histogram — GDALRasterBand::GetHistogram bucketing
    (gcore/gdalrasterband.cpp, gcore/gdal_rasterband.h:543ff).
  * as-features — `gdal raster as-features` pixel->row explode
    (apps/gdalalg_raster_as_features.cpp).
  * mosaic — gdalbuildvrt / `gdal raster mosaic` painter's-order
    composite of overlapping sources (apps/gdalbuildvrt_lib.cpp). The
    entry is SELF-CHECKING: each image is split into 4 overlapping
    quadrant crops which are mosaicked back — the composite must
    checksum-equal the original.

All rows-only for the driver (pixel kernels aren't DuckDB-expressible);
pytest + the self-check booleans pin exactness.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from gdal_spark import datagen

N = 24
CAP = 64


def _imgs(spark: SparkSession, n: int = N) -> DataFrame:
    return datagen.images_df(spark, n, with_pixels=True, size_cap=CAP)


_RASTERIZE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("cks", T.IntegerType()),
        T.StructField("burned_px", T.LongType()),
        T.StructField("burned_px_add", T.LongType()),
    ]
)


def raster_rasterize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burn the deterministic polygon fixture (one polygon per image,
    mapped into pixel space) with both REPLACE and MERGE_ALG=ADD."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.functions import checksum as CK
        from gdal_spark.functions import wkb as W
        from gdal_spark.raster import kernels as K

        polys = datagen.polygons_pdf(16)

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                i = int(r.image_id[3:])
                p = polys.iloc[i % 16]
                rings = [
                    ring
                    for poly in W.polygon_rings(bytes(p["wkb"]))
                    for ring in poly
                ]
                # map polygon bbox -> pixel grid of this image
                gt = (
                    p["xmin"], (p["xmax"] - p["xmin"]) / r.w, 0.0,
                    p["ymax"], 0.0, -(p["ymax"] - p["ymin"]) / r.h,
                )
                burn = K.rasterize_burn([(rings, 200.0)], r.h, r.w, gt=gt)
                burn_add = K.rasterize_burn(
                    [(rings, 100.0), (rings, 100.0)], r.h, r.w, gt=gt,
                    merge_add=True,
                )
                q = burn.astype(np.uint8)
                rows.append(
                    (
                        r.image_id, int(CK.checksum(q)),
                        int((burn > 0).sum()), int((burn_add > 0).sum()),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _RASTERIZE_SCHEMA.fields])

    return _imgs(spark).mapInPandas(run, _RASTERIZE_SCHEMA)


_HIST_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bin", T.IntegerType()),
        T.StructField("n_px", T.LongType()),
    ]
)


def raster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bucket gray histogram per image (GetHistogram semantics:
    [min,max) buckets, uniform width)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.functions import codecs

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(r.bytes, r.fmt)
                gray = (
                    0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1] + 0.114 * arr[:, :, 2]
                )
                hist, _ = np.histogram(gray, bins=16, range=(0.0, 256.0))
                for b, c in enumerate(hist.tolist()):
                    rows.append((r.image_id, b, c))
            yield pd.DataFrame(rows, columns=[f.name for f in _HIST_SCHEMA.fields])

    return _imgs(spark).mapInPandas(run, _HIST_SCHEMA)


_FEAT_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("px", T.IntegerType()),
        T.StructField("py", T.IntegerType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("r", T.IntegerType()),
        T.StructField("g", T.IntegerType()),
        T.StructField("b", T.IntegerType()),
    ]
)


def raster_as_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every pixel of an 8x8 overview of each image -> one row with its
    georeferenced center (pixel->geo via the footprint geotransform) —
    the inverse of block packing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.functions import codecs
        from gdal_spark.raster import kernels as K
        from gdal_spark.raster.warp import footprint_gt

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(r.bytes, r.fmt)
                small = K.resample_nearest(arr.astype(np.float64), 8, 8).astype(np.uint8)
                i = int(r.image_id[3:])
                fp = datagen.footprint_np(np.array([i]))
                gt = footprint_gt(
                    fp["lon_min"][0], fp["lat_min"][0],
                    fp["lon_max"][0], fp["lat_max"][0], 8, 8,
                )
                for py in range(8):
                    for px in range(8):
                        gx, gy = K.gt_pixel_to_geo(gt, px + 0.5, py + 0.5)
                        rows.append(
                            (
                                r.image_id, px, py, float(gx), float(gy),
                                int(small[py, px, 0]), int(small[py, px, 1]),
                                int(small[py, px, 2]),
                            )
                        )
            yield pd.DataFrame(rows, columns=[f.name for f in _FEAT_SCHEMA.fields])

    return _imgs(spark, 8).mapInPandas(run, _FEAT_SCHEMA)


_MOSAIC_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("cks_mosaic", T.IntegerType()),
        T.StructField("cks_original", T.IntegerType()),
        T.StructField("exact_match", T.BooleanType()),
    ]
)


def raster_mosaic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Painter's-order composite: split each image into 4 OVERLAPPING
    quadrant crops, mosaic them back onto the original grid; composite
    must equal the original exactly (self-checking oracle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.functions import checksum as CK
        from gdal_spark.functions import codecs

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(r.bytes, r.fmt)
                h, w = arr.shape[:2]
                oy, ox = h // 3, w // 3  # overlap margins
                sources = [
                    (0, 0, arr[0 : h // 2 + oy, 0 : w // 2 + ox]),
                    (0, w // 2 - ox, arr[0 : h // 2 + oy, w // 2 - ox : w]),
                    (h // 2 - oy, 0, arr[h // 2 - oy : h, 0 : w // 2 + ox]),
                    (h // 2 - oy, w // 2 - ox, arr[h // 2 - oy : h, w // 2 - ox : w]),
                ]
                out = np.zeros_like(arr)
                for y0, x0, src in sources:  # later sources overwrite
                    out[y0 : y0 + src.shape[0], x0 : x0 + src.shape[1]] = src
                cm = int(CK.checksum(out[:, :, 0]))
                co = int(CK.checksum(arr[:, :, 0]))
                rows.append((r.image_id, cm, co, bool(np.array_equal(out, arr))))
            yield pd.DataFrame(rows, columns=[f.name for f in _MOSAIC_SCHEMA.fields])

    return _imgs(spark).mapInPandas(run, _MOSAIC_SCHEMA)


_BANDALG_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("cks_ndvi_like", T.IntegerType()),
        T.StructField("cks_expr", T.IntegerType()),
        T.StructField("db_mean", T.DoubleType()),
        T.StructField("reclass_classes", T.IntegerType()),
    ]
)


def raster_band_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VRT derived-band pixel functions over decoded bands
    (frmts/vrt/pixelfunctions.cpp catalog via raster/pixelfuncs.py):
    norm_diff on (r, g), a muparser-style expression band, dB, and a
    reclassify of a quantized band."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.functions import checksum as CK
        from gdal_spark.functions import codecs
        from gdal_spark.raster import pixelfuncs as PF

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(r.bytes, r.fmt).astype(np.float64)
                bands = [arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]]
                nd = PF.apply_named("norm_diff", bands[:2])
                nd_q = np.clip(np.round((nd + 1.0) * 127.5), 0, 255).astype(np.uint8)
                ex = PF.apply_named(
                    "expression", bands,
                    expr="clip(0.299*B1 + 0.587*B2 + 0.114*B3, 0, 255)",
                )
                db = PF.apply_named("dB", [bands[0] + 1.0], fact=20.0)
                quant = PF.apply_named("expression", bands, expr="B1 // 64")
                rc = PF.apply_named(
                    "reclassify", [quant],
                    mapping={0.0: 10.0, 1.0: 20.0, 2.0: 30.0, 3.0: 40.0},
                )
                rows.append(
                    (
                        r.image_id,
                        int(CK.checksum(nd_q)),
                        int(CK.checksum(np.round(ex).astype(np.uint8))),
                        float(db.mean()),
                        int(np.unique(rc).size),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _BANDALG_SCHEMA.fields])

    return _imgs(spark).mapInPandas(run, _BANDALG_SCHEMA)


_TOOLBOX_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("cks_multiply", T.IntegerType()),
        T.StructField("cks_hsv_value", T.IntegerType()),
        T.StructField("cks_screen", T.IntegerType()),
        T.StructField("darken_le_base", T.BooleanType()),
        T.StructField("collar_px", T.LongType()),
        T.StructField("interior_kept", T.BooleanType()),
        T.StructField("alpha_zero_px", T.LongType()),
        T.StructField("unscale_mean", T.DoubleType()),
    ]
)


def raster_toolbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`gdal raster blend/clean-collar/nodata-to-alpha/stack/unscale`
    (apps/gdalalg_raster_blend.h CompositionMode set,
    apps/nearblack_lib.cpp, apps/gdalalg_raster_nodata_to_alpha.cpp):
    per-image checksums for three blend modes over a hillshade overlay,
    a planted near-black collar cleaned by flood fill (interior speck
    must survive), alpha from nodata, and unscale mean. Pixel math is
    pinned by tests/test_toolbox.py closed-form goldens."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.functions import checksum as CK
        from gdal_spark.functions import codecs
        from gdal_spark.raster import kernels as K
        from gdal_spark.raster import toolbox as TB

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(r.bytes, r.fmt)
                luma = (
                    0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1]
                    + 0.114 * arr[:, :, 2]
                )
                hs = K.hillshade(luma)
                over = np.dstack([hs, hs, hs])
                cks = {
                    m: int(CK.checksum(TB.blend(arr, over, m)[:, :, 0]))
                    for m in ("multiply", "hsv_value", "screen")
                }
                dk = TB.blend(arr, over, "darken")
                darken_ok = bool((dk <= arr).all())
                framed = arr.copy()
                framed[:3, :] = 4
                framed[:, :2] = 9
                cy, cx = arr.shape[0] // 2, arr.shape[1] // 2
                framed[cy, cx] = 2
                cleaned, mask = TB.clean_collar(framed)
                interior_kept = bool(
                    not mask[cy, cx] and (cleaned[cy, cx] == 2).all()
                )
                nd = arr.copy()
                nd[:4, :4] = 0
                alpha = TB.nodata_to_alpha(nd, 0)
                us = TB.unscale(arr, 0.5, 100.0)
                rows.append(
                    (
                        r.image_id,
                        cks["multiply"], cks["hsv_value"], cks["screen"],
                        darken_ok,
                        int(mask.sum()), interior_kept,
                        int((alpha[:, :, 3] == 0).sum()),
                        float(us.mean()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _TOOLBOX_SCHEMA.fields]
            )

    return _imgs(spark).mapInPandas(run, _TOOLBOX_SCHEMA)




# --------------------------------------------------------------------------
# RasterIO convolution resampling (gcore/overview.cpp
# GDALResampleChunk_Convolution — the gdal_translate -r path): linear
# ramps are preserved exactly by the normalized symmetric kernel away from
# the image edges, so the oracle is closed-form arithmetic.
# --------------------------------------------------------------------------

_RAMP_W, _RAMP_H = 16, 12  # source ramp dims; downsampled 2x -> 8x6


def raster_resample_ramp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster import kernels as K
    from gdal_spark.sources.tables import load

    n = load(spark, sf_dir, "nation").select("n_nationkey")

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("i", T.IntegerType()),
            T.StructField("j", T.IntegerType()),
            T.StructField("v", T.DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ys, xs = np.mgrid[0:_RAMP_H, 0:_RAMP_W]
        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                a, b, c = float(k), 0.25 + (k % 3) * 0.5, 1.5
                ramp = a + b * xs + c * ys
                out = K.resample_convolution(
                    ramp, _RAMP_H // 2, _RAMP_W // 2, "bilinear"
                )
                # interior only: edge taps clamp, interior is exact
                for i in range(1, _RAMP_H // 2 - 1):
                    for j in range(1, _RAMP_W // 2 - 1):
                        rows.append((k, i, j, round(float(out[i, j]), 6)))
            yield pd.DataFrame(rows, columns=["k", "i", "j", "v"])

    return n.mapInPandas(run, schema=schema)


_RESAMPLE_RAMP_ORACLE = f"""
    WITH idx AS (
        SELECT i.n AS i, j.n AS j
        FROM generate_series(1, {_RAMP_H // 2 - 2}) i(n),
             generate_series(1, {_RAMP_W // 2 - 2}) j(n)
    )
    SELECT n_nationkey AS k, CAST(i AS INT) AS i, CAST(j AS INT) AS j,
           round(n_nationkey
                 + (0.25 + (n_nationkey % 3) * 0.5) * (2 * j + 0.5)
                 + 1.5 * (2 * i + 0.5), 6) AS v
    FROM nation CROSS JOIN idx
"""


# --------------------------------------------------------------------------
# GDALComputeProximity option semantics (alg/gdalproximity.cpp) over a
# single-target grid: distances are closed-form sqrt((x-tx)^2+(y-ty)^2),
# MAXDIST cap -> NODATA, FIXED_BUF_VAL -> plateau; all SQL-expressible.
# --------------------------------------------------------------------------

_PROX_N = 9


def raster_proximity_options(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster import morph
    from gdal_spark.sources.tables import load

    n = load(spark, sf_dir, "nation").select("n_nationkey")

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("y", T.IntegerType()),
            T.StructField("x", T.IntegerType()),
            T.StructField("d2", T.LongType()),
            T.StructField("buf", T.DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                tx, ty = k % 5 + 2, k % 7 + 1
                src = np.zeros((_PROX_N, _PROX_N), np.int32)
                src[ty, tx] = 1
                d = morph.compute_proximity(src, max_dist=4, nodata=-1)
                fb = morph.compute_proximity(
                    src, max_dist=4, nodata=-1, fixed_buf_val=9
                )
                # squared distances of the EDT are exact integers here:
                # emit d*d rounded to int so both engines hash identical
                # values (float32 kernel output vs float64 SQL sqrt would
                # risk last-digit flips)
                d2 = np.where(
                    d >= 0, np.round(d.astype(np.float64) ** 2), -1
                ).astype(np.int64)
                for y in range(_PROX_N):
                    for x in range(_PROX_N):
                        rows.append(
                            (k, y, x, int(d2[y, x]), float(fb[y, x]))
                        )
            yield pd.DataFrame(rows, columns=["k", "y", "x", "d2", "buf"])

    return n.mapInPandas(run, schema=schema)


_PROX_ORACLE = f"""
    WITH idx AS (
        SELECT y.n AS y, x.n AS x
        FROM generate_series(0, {_PROX_N - 1}) y(n),
             generate_series(0, {_PROX_N - 1}) x(n)
    ),
    g AS (
        SELECT n_nationkey AS k, y, x,
               (x - (n_nationkey % 5 + 2)) * (x - (n_nationkey % 5 + 2))
               + (y - (n_nationkey % 7 + 1)) * (y - (n_nationkey % 7 + 1))
               AS dist2
        FROM nation CROSS JOIN idx
    )
    SELECT k, CAST(y AS INT) AS y, CAST(x AS INT) AS x,
           CAST(CASE WHEN dist2 <= 16 THEN dist2 ELSE -1 END AS BIGINT) AS d2,
           CASE WHEN dist2 = 0 THEN 0.0
                WHEN dist2 <= 16 THEN 9.0 ELSE -1.0 END AS buf
    FROM g
"""

def vrt_mosaic_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VRT virtual mosaic through the distributed tile reader
    (frmts/vrt SimpleSource compositing, re-expressed as source-pruned
    tile tasks in gdal_spark/raster/vrt.py read_vrt_tiles): four 16x16
    closed-form DEM quadrants written as GeoTIFFs, mosaicked by a
    VRTDataset XML into one 32x32 raster, materialized as 16x16 tiles,
    and reduced to per-tile sums. The DuckDB oracle recomputes each
    quadrant sum from the closed form ((r*37 + c*101) % 97 + q) so a
    paste-offset, windowing, or codec bug fails the hash compare."""
    import tempfile

    import numpy as np

    from gdal_spark.functions.tiff import tiff_encode
    from gdal_spark.raster import vrt as V

    n = 16
    root = tempfile.mkdtemp(prefix="vrt_mosaic_")
    srcs = []
    r, c = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    for q, (qy, qx) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        dem = (((r * 37 + c * 101) % 97) + q).astype(np.uint8)
        p = os.path.join(root, f"q{q}.tif")
        open(p, "wb").write(tiff_encode(dem))
        srcs.append(
            f"""<SimpleSource>
      <SourceFilename relativeToVRT="1">q{q}.tif</SourceFilename>
      <SourceBand>1</SourceBand>
      <SrcRect xOff="0" yOff="0" xSize="{n}" ySize="{n}"/>
      <DstRect xOff="{qx * n}" yOff="{qy * n}" xSize="{n}" ySize="{n}"/>
    </SimpleSource>"""
        )
    xml = (
        f'<VRTDataset rasterXSize="{2 * n}" rasterYSize="{2 * n}">\n'
        f'  <VRTRasterBand dataType="Float64" band="1">\n    '
        + "\n    ".join(srcs)
        + "\n  </VRTRasterBand>\n</VRTDataset>\n"
    )
    vp = os.path.join(root, "mosaic.vrt")
    open(vp, "w").write(xml)
    tdf = V.read_vrt_tiles(spark, vp, tile=n)

    @pandas_udf(T.DoubleType())
    def tile_sum(data: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series(
            [float(np.frombuffer(bytes(d), "<f8").sum()) for d in data]
        )

    return tdf.select(
        "tx", "ty", F.round(tile_sum(F.col("data")), 4).alias("tile_sum")
    )


_VRT_MOSAIC_ORACLE = """
    WITH base AS (
        SELECT sum((r.range * 37 + c.range * 101) % 97) AS s
        FROM range(16) r CROSS JOIN range(16) c
    )
    SELECT q.range % 2 AS tx, q.range // 2 AS ty,
           round(s + 256 * q.range, 4) AS tile_sum
    FROM base, range(4) q
"""


SPARK = {
    "vrt_mosaic_tiles": vrt_mosaic_tiles,
    "raster_band_algebra": raster_band_algebra,
    "raster_resample_ramp": raster_resample_ramp,
    "raster_proximity_options": raster_proximity_options,
    "raster_toolbox": raster_toolbox,
    "raster_rasterize": raster_rasterize,
    "raster_histogram": raster_histogram,
    "raster_as_features": raster_as_features,
    "raster_mosaic": raster_mosaic,
}

ORACLE: dict[str, str] = {
    "vrt_mosaic_tiles": _VRT_MOSAIC_ORACLE,
    "raster_resample_ramp": _RESAMPLE_RAMP_ORACLE,
    "raster_proximity_options": _PROX_ORACLE,
}
