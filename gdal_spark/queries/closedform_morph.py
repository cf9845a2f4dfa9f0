"""Oracle-backed closed-form raster<->vector conversion queries.

Same idea as closedform_raster: run the REAL distributed kernels
(polygonize with cross-tile merge, contour with cross-tile stitch, sieve,
fillnodata, pansharpen) over rasters whose pixel values are integer
arithmetic of (row, col, k), so the driver's DuckDB compare gets full
hash-match rows for the §2.8/§2.7 families that were previously
rows-only:

  * polygonize — GDALPolygonize CCL + distributed label-propagation merge
    (alg/gdalrasterpolygonenumerator.cpp): one 16x(16*25) mosaic, one
    k-colored rectangle per section, tile=8 so most rectangles span tile
    borders and exercise the cross-tile union-find merge.
  * contour — marching squares + cross-tile stitch (alg/contour.cpp) on a
    linear ramp: level lines are exact verticals, the interpolated x
    position equals the level, and the stitcher must fuse the per-tile
    chains into ONE 16-point polyline of length 15.
  * sieve — GDALSieveFilter (alg/gdalsievefilter.cpp:178): sub-threshold
    blob of size 1+k%3 merges into the background, the 3x3 keeper
    survives.
  * fillnodata — GDALFillNodata quadrant-nearest inverse-distance fill
    (alg/rasterfill.cpp:396): a single hole in a plane DEM with
    max_search_dist=1.2 keeps exactly the three distance-1 quadrant
    candidates (up, down, right — the bottom-right diagonal at sqrt(2)
    is beyond the cap), so the equal-weight fill is (3v + b)/3 = v + b/3
    closed-form; the nearest-mode fill is the quadrant-0 candidate v - c
    exactly.
  * pansharpen — weighted-Brovey (alg/gdalpansharpen.cpp:592) with dyadic
    weights: every float64 op (pseudo, ratio, product) is bit-identical
    in numpy and DuckDB.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.sources.tables import load

_NK = 25  # nation rows at every sf (TPC-H constant)


def _nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "nation").select("n_nationkey")


# --------------------------------------------------------------------------
# 1. Polygonize with the distributed cross-tile merge.
# --------------------------------------------------------------------------


def raster_polygonize_rects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One mosaic raster 80x80 (5x5 sections of 16x16); section k holds a
    rectangle of class k+1 (width 4+k%4, height 3+k%5 at section offset
    (2+k%6, 2+k%7)) on shared background 0. tile=8 => rectangles straddle
    tile borders; the merge must reunify them (and the background label
    propagation spans the whole 10x10 tile grid). Emit per-class polygon
    count + pixel count."""
    from gdal_spark.raster import polygonize_ops as P

    arr = np.zeros((80, 80), dtype=np.uint8)
    for k in range(_NK):
        r0 = 16 * (k // 5) + 2 + k % 6
        c0 = 16 * (k % 5) + 2 + k % 7
        arr[r0 : r0 + 3 + k % 5, c0 : c0 + 4 + k % 4] = k + 1
    tiles = P.tiles_from_array(spark, arr, 8)
    out = P.polygonize(tiles, 8)
    return (
        out.filter(F.col("cls") > 0)
        .groupBy("cls")
        .agg(
            F.count(F.lit(1)).alias("n_polys"),
            F.sum("npix").alias("n_px"),
        )
        .select((F.col("cls") - 1).cast("long").alias("k"), "n_polys", "n_px")
    )


_POLYGONIZE_ORACLE = """
    SELECT n_nationkey AS k, CAST(1 AS BIGINT) AS n_polys,
           CAST((4 + n_nationkey % 4) * (3 + n_nationkey % 5) AS BIGINT) AS n_px
    FROM nation
"""


# --------------------------------------------------------------------------
# 2. Contour stitch on a linear ramp (v = x): one vertical polyline per
#    level whose interpolated x equals the level exactly.
# --------------------------------------------------------------------------


def raster_contour_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster import contour as C

    yy, xx = np.mgrid[0:16, 0:20].astype(np.float64)
    levels = [2.25 + m + (m % 4) * 0.125 for m in range(12)]
    tiles = C.halo_tiles_from_array(spark, xx.copy(), 8)
    out = C.contour(tiles, 8, levels)

    @F.pandas_udf(T.DoubleType())
    def first_x(wkb: pd.Series) -> pd.Series:
        import struct

        return pd.Series(
            [struct.unpack_from("<d", bytes(b), 9)[0] for b in wkb]
        )

    return out.select(
        F.round("level", 6).alias("level"),
        "n_points", "closed",
        F.round("length", 6).alias("length"),
        F.round(first_x(F.col("wkb")), 6).alias("x0"),
    )


_CONTOUR_ORACLE = """
    SELECT round(2.25 + m.range + (m.range % 4) * 0.125, 6) AS level,
           CAST(16 AS INT) AS n_points, false AS closed,
           round(15.0, 6) AS length,
           round(2.25 + m.range + (m.range % 4) * 0.125, 6) AS x0
    FROM range(12) m
"""


# --------------------------------------------------------------------------
# 3. Sieve: sub-threshold blob -> background; keeper region survives.
# --------------------------------------------------------------------------


def raster_sieve_blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster import morph as M

    sch = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("n_removed", T.LongType()),
            T.StructField("sum_after", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                src = np.zeros((12, 12), dtype=np.int32)
                s = 1 + k % 3
                src[5, 4 : 4 + s] = 1                  # blob, size < 4
                src[8:11, 8:11] = 2 + k % 5            # 9-px keeper
                out = M.sieve(src, threshold=4)
                rows.append(
                    (k, int((out != src).sum()), int(out.sum()))
                )
            yield pd.DataFrame(rows, columns=[f.name for f in sch.fields])

    return _nation(spark, sf_dir).mapInPandas(run, sch)


_SIEVE_ORACLE = """
    SELECT n_nationkey AS k,
           CAST(1 + n_nationkey % 3 AS BIGINT) AS n_removed,
           CAST(9 * (2 + n_nationkey % 5) AS BIGINT) AS sum_after
    FROM nation
"""


# --------------------------------------------------------------------------
# 4. Fillnodata: single hole in a plane DEM fills to the plane value.
# --------------------------------------------------------------------------


def raster_fillnodata_plane(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster import morph as M

    sch = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("filled", T.DoubleType()),
            T.StructField("filled_near", T.DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        xs, ys = np.meshgrid(np.arange(16), np.arange(16), indexing="xy")
        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                b, c = 0.25 * (1 + k % 4), 0.5 * (1 + k % 3)
                arr = k + b * xs + c * ys
                hy, hx = 3 + k % 7, 3 + k % 9
                valid = np.ones((16, 16), dtype=bool)
                valid[hy, hx] = False
                arr2 = arr.copy()
                arr2[hy, hx] = -1.0
                out = M.fillnodata(arr2, valid, max_search_dist=1.2)
                outn = M.fillnodata(arr2, valid, nearest=True)
                rows.append(
                    (k, round(float(out[hy, hx]), 4),
                     float(outn[hy, hx]))
                )
            yield pd.DataFrame(rows, columns=[f.name for f in sch.fields])

    return _nation(spark, sf_dir).mapInPandas(run, sch)


# v = plane value at the hole; weighted fill = (up + down + right)/3
# = v + b/3; nearest-mode fill = the quadrant-0 (top) candidate v - c.
_FILL_ORACLE = """
    WITH p AS (
        SELECT n_nationkey AS k,
               0.25 * (1 + n_nationkey % 4) AS b,
               0.5 * (1 + n_nationkey % 3) AS c,
               n_nationkey
                 + 0.25 * (1 + n_nationkey % 4) * (3 + n_nationkey % 9)
                 + 0.5 * (1 + n_nationkey % 3) * (3 + n_nationkey % 7) AS v
        FROM nation
    )
    SELECT k, round(v + b / 3, 4) AS filled, v - c AS filled_near
    FROM p
"""


# --------------------------------------------------------------------------
# 5. Pansharpen (weighted Brovey, dyadic weights).
# --------------------------------------------------------------------------


def raster_pansharpen_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster import morph as M

    sch = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("y", T.IntegerType()),
            T.StructField("x", T.IntegerType()),
            T.StructField("out0", T.DoubleType()),
            T.StructField("out1", T.DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        r, c = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                ms = np.stack(
                    [((r * 37 + c * 101 + (k + d) * 13) % 97).astype(np.float64)
                     for d in range(3)],
                    axis=2,
                )
                w = [0.25, 0.5, 0.25]
                pseudo = 0.25 * ms[:, :, 0] + 0.5 * ms[:, :, 1] + 0.25 * ms[:, :, 2]
                pan = pseudo + 4.0
                out = M.pansharpen(pan, ms, weights=w)
                for y in range(8):
                    for x in range(8):
                        rows.append(
                            (k, y, x,
                             round(float(out[y, x, 0]), 4),
                             round(float(out[y, x, 1]), 4))
                        )
            yield pd.DataFrame(rows, columns=[f.name for f in sch.fields])

    return _nation(spark, sf_dir).mapInPandas(run, sch)


_PANSHARPEN_ORACLE = """
    WITH g AS (
        SELECT n_nationkey AS k, y.range AS y, x.range AS x,
               CAST((y.range * 37 + x.range * 101 + n_nationkey * 13) % 97
                    AS DOUBLE) AS m0,
               CAST((y.range * 37 + x.range * 101 + (n_nationkey + 1) * 13) % 97
                    AS DOUBLE) AS m1,
               CAST((y.range * 37 + x.range * 101 + (n_nationkey + 2) * 13) % 97
                    AS DOUBLE) AS m2
        FROM nation CROSS JOIN range(8) y CROSS JOIN range(8) x
    )
    SELECT k, CAST(y AS INT) AS y, CAST(x AS INT) AS x,
           round(m0 * ((0.25*m0 + 0.5*m1 + 0.25*m2 + 4.0)
                       / (0.25*m0 + 0.5*m1 + 0.25*m2)), 4) AS out0,
           round(m1 * ((0.25*m0 + 0.5*m1 + 0.25*m2 + 4.0)
                       / (0.25*m0 + 0.5*m1 + 0.25*m2)), 4) AS out1
    FROM g
"""


SPARK = {
    "raster_polygonize_rects": raster_polygonize_rects,
    "raster_contour_levels": raster_contour_levels,
    "raster_sieve_blobs": raster_sieve_blobs,
    "raster_fillnodata_plane": raster_fillnodata_plane,
    "raster_pansharpen_ratio": raster_pansharpen_ratio,
}

ORACLE = {
    "raster_polygonize_rects": _POLYGONIZE_ORACLE,
    "raster_contour_levels": _CONTOUR_ORACLE,
    "raster_sieve_blobs": _SIEVE_ORACLE,
    "raster_fillnodata_plane": _FILL_ORACLE,
    "raster_pansharpen_ratio": _PANSHARPEN_ORACLE,
}
