"""Oracle-backed closed-form entries: VRT pixel functions, viewshed, RAT.

Final closed-form batch (see closedform_raster/_vector/_morph/_dem):

  * VRT derived-band pixel functions (frmts/vrt/pixelfunctions.cpp via
    raster/pixelfuncs.py): norm_diff, the muparser-grammar expression
    band, dB, reclassify — all plain arithmetic over the mod-raster
    bands, recomputed by DuckDB.
  * Viewshed (alg/viewshed Wang-plane propagation): flat terrain with a
    full-height wall column — every cell up to and including the wall is
    visible, everything behind it is shadowed, so the visible count is
    (wall_x + 1) * h in closed form.
  * RAT GFU_PixelCount (gcore/gdal_rat.h:41) through the REAL
    band_histogram_rat path (PNG decode -> luma -> linear binning):
    equal RGB bands make luma == v up to ~1e-14, and the RAT row origin
    of -0.5 keeps every bin boundary half an integer away, so the float
    error can never flip a bin.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.queries.closedform_raster import _mod_raster, _nation

_N = 16


# --------------------------------------------------------------------------
# 1. VRT pixel functions over mod-raster bands.
# --------------------------------------------------------------------------


def raster_band_algebra_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster import pixelfuncs as PF

    sch = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("y", T.IntegerType()),
            T.StructField("x", T.IntegerType()),
            T.StructField("nd", T.DoubleType()),
            T.StructField("luma", T.DoubleType()),
            T.StructField("db", T.DoubleType()),
            T.StructField("rc", T.DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                bands = [
                    _mod_raster(k, _N).astype(np.float64),
                    _mod_raster(k + 1, _N).astype(np.float64),
                    _mod_raster(k + 2, _N).astype(np.float64),
                ]
                nd = PF.apply_named("norm_diff", bands[:2])
                luma = PF.apply_named(
                    "expression", bands,
                    expr="0.299*B1 + 0.587*B2 + 0.114*B3",
                )
                db = PF.apply_named("dB", [bands[0] + 1.0], fact=20.0)
                quant = PF.apply_named("expression", bands, expr="B1 // 32")
                rc = PF.apply_named(
                    "reclassify", [quant],
                    mapping={0.0: 10.0, 1.0: 20.0, 2.0: 30.0, 3.0: 40.0},
                )
                for y in range(_N):
                    for x in range(_N):
                        rows.append(
                            (k, y, x, round(float(nd[y, x]), 4),
                             round(float(luma[y, x]), 4),
                             round(float(db[y, x]), 4), float(rc[y, x]))
                        )
            yield pd.DataFrame(rows, columns=[f.name for f in sch.fields])

    return _nation(spark, sf_dir).mapInPandas(run, sch)


_BAND_ALGEBRA_ORACLE = f"""
    WITH g AS (
        SELECT n_nationkey AS k, y.range AS y, x.range AS x,
               CAST((y.range * 37 + x.range * 101 + n_nationkey * 13) % 97
                    AS DOUBLE) AS b1,
               CAST((y.range * 37 + x.range * 101 + (n_nationkey + 1) * 13) % 97
                    AS DOUBLE) AS b2,
               CAST((y.range * 37 + x.range * 101 + (n_nationkey + 2) * 13) % 97
                    AS DOUBLE) AS b3
        FROM nation CROSS JOIN range({_N}) y CROSS JOIN range({_N}) x
    )
    SELECT k, CAST(y AS INT) AS y, CAST(x AS INT) AS x,
           round(CASE WHEN b1 + b2 = 0 THEN 0.0
                      ELSE (b1 - b2) / (b1 + b2) END, 4) AS nd,
           round(0.299 * b1 + 0.587 * b2 + 0.114 * b3, 4) AS luma,
           round(20.0 * log10(b1 + 1.0), 4) AS db,
           10.0 + 10.0 * floor(b1 / 32) AS rc
    FROM g
"""


# --------------------------------------------------------------------------
# 2. Viewshed: flat terrain + wall column.
# --------------------------------------------------------------------------


def raster_viewshed_wall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster.viewshed import viewshed

    sch = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("n_visible", T.LongType()),
            T.StructField("n_shadow", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                dem = np.zeros((16, 16))
                wx = 8 + k % 4
                dem[:, wx] = 10.0
                out = viewshed(dem, ox=2, oy=8, observer_height=2.0)
                rows.append(
                    (k, int((out == 255).sum()), int((out != 255).sum()))
                )
            yield pd.DataFrame(rows, columns=[f.name for f in sch.fields])

    return _nation(spark, sf_dir).mapInPandas(run, sch)


_VIEWSHED_ORACLE = """
    SELECT n_nationkey AS k,
           CAST((8 + n_nationkey % 4 + 1) * 16 AS BIGINT) AS n_visible,
           CAST(256 - (8 + n_nationkey % 4 + 1) * 16 AS BIGINT) AS n_shadow
    FROM nation
"""


# --------------------------------------------------------------------------
# 3. RAT GFU_PixelCount through the real decode -> luma -> bin path.
# --------------------------------------------------------------------------


def rat_pixel_counts_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster import rat

    sch = T.StructType(
        [
            T.StructField("image_id", T.StringType()),
            T.StructField("bytes", T.BinaryType()),
            T.StructField("fmt", T.StringType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.functions import codecs

        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                v = _mod_raster(k, _N)
                arr = np.repeat(v[:, :, None], 3, axis=2)
                rows.append((f"r{k}", codecs.encode_image(arr, "png"), "png"))
            yield pd.DataFrame(rows, columns=[f.name for f in sch.fields])

    imgs = _nation(spark, sf_dir).mapInPandas(gen, sch)
    hist = rat.band_histogram_rat(imgs, row0_min=-0.5, bin_size=16.0, n_rows=8)
    return hist.select(
        F.substring("image_id", 2, 8).cast("long").alias("k"),
        "rat_row",
        F.col("pixel_count").cast("long").alias("n_px"),
    )


# bin = floor((v + 0.5) / 16): boundaries at 15.5, 31.5, ... are half an
# integer from every luma value, so the ~1e-14 luma error cannot flip one.
_RAT_ORACLE = f"""
    WITH g AS (
        SELECT n_nationkey AS k,
               ((y.range * 37 + x.range * 101 + n_nationkey * 13) % 97 * 2 + 1)
               // 32 AS rat_row
        FROM nation CROSS JOIN range({_N}) y CROSS JOIN range({_N}) x
    )
    SELECT k, CAST(rat_row AS INT) AS rat_row,
           CAST(count(*) AS BIGINT) AS n_px
    FROM g GROUP BY k, rat_row
"""


# --------------------------------------------------------------------------
# 4. Interval-grammar reclassify (gdal raster reclassify,
#    frmts/vrt/vrtreclassifier.cpp) compiled to a codegen CASE chain over
#    lineitem quantities; open bounds tighten by one ulp so the integer
#    quantities land exactly as DuckDB's strict inequalities do.
# --------------------------------------------------------------------------

_RECLASS_MAPPING = "[1, 10] = 1; (10, 25] = 2; (25, 49) = 3; 49 = 4; DEFAULT = 0"


def reclassify_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster.reclassify import reclassify_column

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cls = reclassify_column(F.col("l_quantity"), _RECLASS_MAPPING)
    return (
        li.select(cls.cast("int").alias("qty_class"))
        .groupBy("qty_class")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


_RECLASS_ORACLE = """
    SELECT CAST(CASE WHEN l_quantity >= 1 AND l_quantity <= 10 THEN 1
                     WHEN l_quantity > 10 AND l_quantity <= 25 THEN 2
                     WHEN l_quantity > 25 AND l_quantity < 49 THEN 3
                     WHEN l_quantity = 49 THEN 4
                     ELSE 0 END AS INT) AS qty_class,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY 1
"""


# --------------------------------------------------------------------------
# 5. pixel-info (gdallocationinfo): 'dataset' positions through the inverse
#    geotransform, bilinear GDALRasterInterpolateAtPoint sampling, and the
#    unscale step — every stage recomputed by DuckDB in closed form over
#    the mod-raster.
# --------------------------------------------------------------------------

_PI_GT = [100.0, 2.0, 0.0, 50.0, 0.0, -2.0]
# dataset-CRS positions -> fractional (column, line) strictly inside the
# pixel-center hull [0.5, N-0.5] so bilinear never clamps
_PI_POS = [
    (107.4, 42.6),   # col 3.70, line 3.70
    (121.0, 29.5),   # col 10.50, line 10.25
    (101.3, 48.9),   # col 0.65, line 0.55
    (130.96, 20.08),  # col 15.48, line 14.96
]


def pixel_info_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster.pixel_info import pixel_info

    sch = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("pid", T.IntegerType()),
            T.StructField("col_f", T.DoubleType()),
            T.StructField("line_f", T.DoubleType()),
            T.StructField("raw", T.DoubleType()),
            T.StructField("unscaled", T.DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                arr = _mod_raster(k, _N).astype(np.float64)
                infos = pixel_info(
                    arr, _PI_POS, gt=_PI_GT, pos_crs="dataset",
                    interpolation="bilinear", scale=2.0, offset=10.0,
                )
                for pid, info in enumerate(infos):
                    rows.append(
                        (
                            k, pid, round(info["column"], 4),
                            round(info["line"], 4),
                            round(info["band_1_raw_value"], 4),
                            round(info["band_1_unscaled_value"], 4),
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in sch.fields])

    return _nation(spark, sf_dir).mapInPandas(run, sch)


_PI_POS_SQL = ", ".join(
    f"({i}, {(x - 100.0) / 2.0!r}, {(50.0 - y) / 2.0!r})"
    for i, (x, y) in enumerate(_PI_POS)
)

_PIXEL_INFO_ORACLE = f"""
    WITH pos(pid, c, l) AS (VALUES {_PI_POS_SQL}),
    s AS (
        SELECT n_nationkey AS k, pid, c, l,
               CAST(floor(c - 0.5) AS BIGINT) AS x0,
               CAST(floor(l - 0.5) AS BIGINT) AS y0,
               (c - 0.5) - floor(c - 0.5) AS tx,
               (l - 0.5) - floor(l - 0.5) AS ty
        FROM nation CROSS JOIN pos
    ),
    b AS (
        SELECT k, pid, c, l, tx, ty,
               (y0 * 37 + x0 * 101 + k * 13) % 97 AS v00,
               (y0 * 37 + (x0 + 1) * 101 + k * 13) % 97 AS v01,
               ((y0 + 1) * 37 + x0 * 101 + k * 13) % 97 AS v10,
               ((y0 + 1) * 37 + (x0 + 1) * 101 + k * 13) % 97 AS v11
        FROM s
    )
    SELECT k, CAST(pid AS INT) AS pid,
           round(c, 4) AS col_f, round(l, 4) AS line_f,
           round((v00 * (1 - tx) + v01 * tx) * (1 - ty)
                 + (v10 * (1 - tx) + v11 * tx) * ty, 4) AS raw,
           round(((v00 * (1 - tx) + v01 * tx) * (1 - ty)
                  + (v10 * (1 - tx) + v11 * tx) * ty) * 2.0 + 10.0, 4)
               AS unscaled
    FROM b
"""


# --------------------------------------------------------------------------
# 6. gdal dataset identify (GDALIdentifyDriverEx): encode the mod-raster in
#    a format cycled by nationkey, identify the driver back from the raw
#    bytes alone — DuckDB recomputes the expected short name from k.
# --------------------------------------------------------------------------

_ID_FMTS = ["tiff", "png", "bmp", "pnm", "gif", "tga", "qdct", "cog"]
_ID_DRIVERS = ["GTiff", "PNG", "BMP", "PNM", "GIF", "TGA", "QDCT", "GTiff"]


def dataset_identify_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.functions import codecs
    from gdal_spark.sources.identify import identify_driver

    sch = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("driver", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                fmt = _ID_FMTS[k % len(_ID_FMTS)]
                arr = np.dstack([_mod_raster(k, _N)] * 3)
                data = codecs.encode_image(arr, fmt)
                rows.append((k, identify_driver(data, f"k{k}.{fmt}")))
            yield pd.DataFrame(rows, columns=[f.name for f in sch.fields])

    return _nation(spark, sf_dir).mapInPandas(run, sch)


_ID_CASE = " ".join(
    f"WHEN {i} THEN '{d}'" for i, d in enumerate(_ID_DRIVERS)
)

_IDENTIFY_ORACLE = f"""
    SELECT n_nationkey AS k,
           CASE n_nationkey % {len(_ID_FMTS)} {_ID_CASE} END AS driver
    FROM nation
"""


# --------------------------------------------------------------------------
# Quantize + dither exact-match (closes the quantize/dither oracle gap):
# colors at exact 8*q multiples are FIXED POINTS of the whole
# median-cut -> color-cube -> Floyd-Steinberg pipeline — a single-color
# box's palette entry is ((q+q)<<3)/2 = 8q (alg/gdalmediancut.cpp:440),
# the 5-bit cube cell representative (q*255)//31 stays L1-nearest to its
# own palette entry at >=32 separation (alg/gdaldither.cpp:297), and the
# diffusion error is therefore 0 at every pixel. palette[index[y,x]]
# must equal the source color exactly, which DuckDB recomputes.
# --------------------------------------------------------------------------


def quantize_exact_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster.quantize import (
        dither_rgb2pct_gdal,
        median_cut_pct_gdal,
    )

    _N = 16
    sch = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("y", T.IntegerType()),
            T.StructField("x", T.IntegerType()),
            T.StructField("orig", T.IntegerType()),
            T.StructField("deref", T.IntegerType()),
            T.StructField("n_pal", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                qs = [3 + ((k + i * 5) % 7) * 4 for i in range(4)]
                rr, cc = np.meshgrid(
                    np.arange(_N), np.arange(_N), indexing="ij"
                )
                gray = np.array([8 * q for q in qs], dtype=np.uint8)[
                    (rr + cc) % 4
                ]
                arr = np.stack([gray] * 3, axis=-1)
                pal = median_cut_pct_gdal(arr, 256)
                out = dither_rgb2pct_gdal(arr, pal)
                deref = pal[out][..., 0]
                for y in range(_N):
                    for x in range(_N):
                        rows.append(
                            (k, y, x, int(gray[y, x]), int(deref[y, x]),
                             len(pal))
                        )
            yield pd.DataFrame(rows, columns=[f.name for f in sch.fields])

    return _nation(spark, sf_dir).mapInPandas(run, sch)


_QUANTIZE_ORACLE = """
    SELECT n_nationkey AS k, CAST(y.range AS INT) AS y,
           CAST(x.range AS INT) AS x,
           CAST(8 * (3 + ((n_nationkey + ((y.range + x.range) % 4) * 5) % 7)
                * 4) AS INT) AS orig,
           CAST(8 * (3 + ((n_nationkey + ((y.range + x.range) % 4) * 5) % 7)
                * 4) AS INT) AS deref,
           4 AS n_pal
    FROM nation CROSS JOIN range(16) y CROSS JOIN range(16) x
"""


# --------------------------------------------------------------------------
# gdalenhance -equalize (apps/gdalenhance.cpp ComputeEqualizationLUTs +
# EnhancerCallback): all-integer cum-histogram LUT arithmetic, so DuckDB
# recomputes every output pixel. Two forms in one query: v_out applies
# each image's own LUT (per-dataset semantics); v_glob applies ONE LUT
# from the distributed histogram of ALL images — stage 1 emits tiny
# per-partition partial histograms, one groupBy merges 97 rows, the LUT
# broadcasts back into a pure map (the 100-TB shape for gdalenhance over
# an image corpus).
# --------------------------------------------------------------------------


def raster_equalize_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster.enhance import (
        default_histogram_byte,
        equalization_lut,
        equalize_byte,
    )

    _N = 16
    hist_sch = T.StructType(
        [T.StructField("v", T.IntegerType()), T.StructField("c", T.LongType())]
    )

    def partial_hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            acc = np.zeros(256, dtype=np.int64)
            for k in pdf["n_nationkey"]:
                acc += default_histogram_byte(_mod_raster(int(k)))
            nz = acc.nonzero()[0]
            yield pd.DataFrame({"v": nz.astype(np.int32), "c": acc[nz]})

    nat = _nation(spark, sf_dir)
    merged = (
        nat.mapInPandas(partial_hist, hist_sch).groupBy("v").agg(
            F.sum("c").alias("c")
        )
    ).collect()
    ghist = np.zeros(256, dtype=np.int64)
    for row in merged:
        ghist[row["v"]] = row["c"]
    glut = equalization_lut(ghist)
    b_glut = spark.sparkContext.broadcast(glut)

    sch = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("y", T.IntegerType()),
            T.StructField("x", T.IntegerType()),
            T.StructField("v_out", T.IntegerType()),
            T.StructField("v_glob", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                arr = _mod_raster(k)
                own = equalize_byte(arr)
                glob = equalize_byte(arr, lut=b_glut.value)
                for y in range(_N):
                    for x in range(_N):
                        rows.append(
                            (k, y, x, int(own[y, x]), int(glob[y, x]))
                        )
            yield pd.DataFrame(rows, columns=[f.name for f in sch.fields])

    return nat.mapInPandas(run, sch)


_EQUALIZE_ORACLE = """
    WITH g AS (
        SELECT n_nationkey AS k, y.range AS y, x.range AS x,
               (y.range * 37 + x.range * 101 + n_nationkey * 13) % 97 AS v
        FROM nation CROSS JOIN range(16) y CROSS JOIN range(16) x
    ), h AS (
        SELECT k, v,
               CASE WHEN v = 0 OR v = 255 THEN 0 ELSE count(*) END AS c
        FROM g GROUP BY k, v
    ), cum AS (
        SELECT k, v,
               COALESCE(sum(c) OVER (PARTITION BY k ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 + c // 2 AS ch,
               sum(c) OVER (PARTITION BY k) AS total
        FROM h
    ), lut AS (
        SELECT k, v, least(255, greatest(0, (ch * 256) // total)) AS lv
        FROM cum
    ), gh AS (
        SELECT v, CASE WHEN v = 0 OR v = 255 THEN 0 ELSE count(*) END AS c
        FROM g GROUP BY v
    ), gcum AS (
        SELECT v,
               COALESCE(sum(c) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 + c // 2 AS ch,
               sum(c) OVER () AS total
        FROM gh
    ), glut AS (
        SELECT v, least(255, greatest(0, (ch * 256) // total)) AS lv
        FROM gcum
    )
    SELECT g.k, CAST(g.y AS INT) AS y, CAST(g.x AS INT) AS x,
           CAST(l.lv AS INT) AS v_out, CAST(gl.lv AS INT) AS v_glob
    FROM g JOIN lut l ON g.k = l.k AND g.v = l.v
    JOIN glut gl ON g.v = gl.v
"""


# --------------------------------------------------------------------------
# NITF codec (frmts/nitf): the mod raster goes through the spec-width
# NITF02.10 writer and the NITFImageAccess-transcribed reader; every
# output pixel is the (y*37 + x*101 + k*13) % 97 arithmetic DuckDB
# recomputes, so the driver hash-checks the whole header/subheader/
# block-layout roundtrip.
# --------------------------------------------------------------------------


def nitf_codec_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster.nitf import nitf_encode, read_nitf

    sch = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("y", T.IntegerType()),
            T.StructField("x", T.IntegerType()),
            T.StructField("v", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                arr = _mod_raster(k)
                back = read_nitf(nitf_encode(arr))[0]["array"][:, :, 0]
                for y in range(arr.shape[0]):
                    for x in range(arr.shape[1]):
                        rows.append((k, y, x, int(back[y, x])))
            yield pd.DataFrame(rows, columns=[f.name for f in sch.fields])

    return _nation(spark, sf_dir).mapInPandas(run, sch)


_NITF_ORACLE = """
    SELECT n_nationkey AS k, CAST(y.range AS INT) AS y,
           CAST(x.range AS INT) AS x,
           CAST((y.range * 37 + x.range * 101 + n_nationkey * 13) % 97
                AS INT) AS v
    FROM nation CROSS JOIN range(16) y CROSS JOIN range(16) x
"""


# --------------------------------------------------------------------------
# DTED codec (frmts/dted): signed-magnitude profiles, south-first column
# order, per-column checksums — the mod raster (shifted negative so the
# sign bit is exercised) roundtrips through the writer + reader and
# DuckDB recomputes every height.
# --------------------------------------------------------------------------


def dted_codec_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster.dted import dted_encode, read_dted

    sch = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("y", T.IntegerType()),
            T.StructField("x", T.IntegerType()),
            T.StructField("v", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                arr = (_mod_raster(k).astype(np.int16) - 48)
                h = read_dted(dted_encode(arr), verify_checksum=True)
                assert h["checksum_ok"]
                back = h["array"]
                for y in range(back.shape[0]):
                    for x in range(back.shape[1]):
                        rows.append((k, y, x, int(back[y, x])))
            yield pd.DataFrame(rows, columns=[f.name for f in sch.fields])

    return _nation(spark, sf_dir).mapInPandas(run, sch)


_DTED_ORACLE = """
    SELECT n_nationkey AS k, CAST(y.range AS INT) AS y,
           CAST(x.range AS INT) AS x,
           CAST((y.range * 37 + x.range * 101 + n_nationkey * 13) % 97 - 48
                AS INT) AS v
    FROM nation CROSS JOIN range(16) y CROSS JOIN range(16) x
"""


# --------------------------------------------------------------------------
# USGS DEM codec (frmts/usgsdem): Fortran-D ASCII profiles with the
# south-first lygap anchoring; the mod raster roundtrips through the
# geographic writer + reader and DuckDB recomputes every height
# (negatives exercise the signed token scanner).
# --------------------------------------------------------------------------


def usgsdem_codec_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster.usgsdem import read_usgsdem, usgsdem_encode

    sch = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("y", T.IntegerType()),
            T.StructField("x", T.IntegerType()),
            T.StructField("v", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                arr = (_mod_raster(k).astype(np.int16) - 48)
                back = read_usgsdem(usgsdem_encode(arr))["array"]
                for y in range(back.shape[0]):
                    for x in range(back.shape[1]):
                        rows.append((k, y, x, int(back[y, x])))
            yield pd.DataFrame(rows, columns=[f.name for f in sch.fields])

    return _nation(spark, sf_dir).mapInPandas(run, sch)


_USGSDEM_ORACLE = """
    SELECT n_nationkey AS k, CAST(y.range AS INT) AS y,
           CAST(x.range AS INT) AS x,
           CAST((y.range * 37 + x.range * 101 + n_nationkey * 13) % 97 - 48
                AS INT) AS v
    FROM nation CROSS JOIN range(16) y CROSS JOIN range(16) x
"""


SPARK = {
    "usgsdem_codec_mod": usgsdem_codec_mod,
    "dted_codec_mod": dted_codec_mod,
    "nitf_codec_mod": nitf_codec_mod,
    "raster_equalize_mod": raster_equalize_mod,
    "quantize_exact_mod": quantize_exact_mod,
    "raster_band_algebra_mod": raster_band_algebra_mod,
    "raster_viewshed_wall": raster_viewshed_wall,
    "rat_pixel_counts_mod": rat_pixel_counts_mod,
    "reclassify_intervals": reclassify_intervals,
    "pixel_info_mod": pixel_info_mod,
    "dataset_identify_mod": dataset_identify_mod,
}

ORACLE = {
    "usgsdem_codec_mod": _USGSDEM_ORACLE,
    "dted_codec_mod": _DTED_ORACLE,
    "nitf_codec_mod": _NITF_ORACLE,
    "raster_equalize_mod": _EQUALIZE_ORACLE,
    "quantize_exact_mod": _QUANTIZE_ORACLE,
    "raster_band_algebra_mod": _BAND_ALGEBRA_ORACLE,
    "raster_viewshed_wall": _VIEWSHED_ORACLE,
    "rat_pixel_counts_mod": _RAT_ORACLE,
    "reclassify_intervals": _RECLASS_ORACLE,
    "pixel_info_mod": _PIXEL_INFO_ORACLE,
    "dataset_identify_mod": _IDENTIFY_ORACLE,
}
