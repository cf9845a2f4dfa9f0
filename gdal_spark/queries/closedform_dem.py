"""Oracle-backed closed-form DEM / compositing / cutline queries.

Third closed-form batch (see closedform_raster/_vector/_morph): the same
engine kernels over integer-arithmetic rasters so DuckDB recomputes every
value and the driver hash-checks families previously rows-only:

  * gdaldem TPI / TRI (riley + wilson) / roughness stencils
    (apps/gdaldem_lib.cpp:2312-2346, GDALTPIAlg, GDALRoughnessAlg).
  * 3x3 convolution (sharpen kernel) — `gdal raster neighbors` /
    convolve path, interior pixels where edge padding is irrelevant.
  * gdalwarp -cutline (GDALWarpCutlineMasker, alg/gdalwarper.cpp:1530):
    the mercator warp of closedform_raster with a dst-CRS cutline box at
    integer pixel corners — pixels outside the cutline become nodata.
  * gdal_contour -p banded polygons (classify -> distributed polygonize
    -> band bounds) on a linear ramp: vertical strips, one region per
    band, closed-form pixel counts and areas.
  * `gdal raster blend` multiply/screen/darken/lighten compositing
    (gdalalg_raster_blend.cpp): b*o/255 can never land on an exact .5,
    so the uint8 rounding agrees between numpy and SQL bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.queries.closedform_raster import (
    _M_PER_DEG,
    _N,
    _PX_SCHEMA,
    _WARP_DST_GT,
    _WARP_SRC_GT,
    _mod_raster,
    _nation,
)

_GRID_SQL = f"""
    SELECT y.range AS y, x.range AS x
    FROM range({_N}) y CROSS JOIN range({_N}) x
"""


# --------------------------------------------------------------------------
# 1. TPI / TRI / roughness (interior pixels: full 3x3 window, no
#    edge-replication to model).
# --------------------------------------------------------------------------


def raster_dem_metrics_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster import kernels as K

    sch = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("y", T.IntegerType()),
            T.StructField("x", T.IntegerType()),
            T.StructField("tpi", T.DoubleType()),
            T.StructField("tri_w", T.DoubleType()),
            T.StructField("tri_r", T.DoubleType()),
            T.StructField("rough", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                dem = _mod_raster(k).astype(np.float64)
                t = K.tpi(dem)
                tw = K.tri(dem, "wilson")
                tr = K.tri(dem, "riley")
                rg = K.roughness(dem)
                for y in range(1, _N - 1):
                    for x in range(1, _N - 1):
                        rows.append(
                            (k, y, x, float(t[y, x]), float(tw[y, x]),
                             round(float(tr[y, x]), 4), int(rg[y, x]))
                        )
            yield pd.DataFrame(rows, columns=[f.name for f in sch.fields])

    return _nation(spark, sf_dir).mapInPandas(run, sch)


# neighbor aggregate via self-join; tpi/wilson are exact dyadic (x/8).
_DEM_METRICS_ORACLE = f"""
    WITH g AS (
        SELECT n_nationkey AS k, y, x,
               CAST((y * 37 + x * 101 + n_nationkey * 13) % 97 AS DOUBLE) AS v
        FROM nation CROSS JOIN ({_GRID_SQL})
    )
    SELECT a.k, CAST(a.y AS INT) AS y, CAST(a.x AS INT) AS x,
           a.v - sum(b.v) FILTER (b.y != a.y OR b.x != a.x) / 8.0 AS tpi,
           sum(abs(b.v - a.v)) FILTER (b.y != a.y OR b.x != a.x) / 8.0 AS tri_w,
           round(sqrt(sum((b.v - a.v) * (b.v - a.v))
                      FILTER (b.y != a.y OR b.x != a.x)), 4) AS tri_r,
           CAST(max(b.v) - min(b.v) AS INT) AS rough
    FROM g a JOIN g b
      ON a.k = b.k AND abs(a.y - b.y) <= 1 AND abs(a.x - b.x) <= 1
    WHERE a.y BETWEEN 1 AND {_N - 2} AND a.x BETWEEN 1 AND {_N - 2}
    GROUP BY a.k, a.y, a.x, a.v
"""


# --------------------------------------------------------------------------
# 2. Sharpen convolution (integer kernel, interior pixels).
# --------------------------------------------------------------------------


def raster_convolve_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster import morph as M

    sch = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("y", T.IntegerType()),
            T.StructField("x", T.IntegerType()),
            T.StructField("sharp", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                out = M.convolve(_mod_raster(k).astype(np.float64), "sharpen")
                for y in range(1, _N - 1):
                    for x in range(1, _N - 1):
                        rows.append((k, y, x, int(round(out[y, x]))))
            yield pd.DataFrame(rows, columns=[f.name for f in sch.fields])

    return _nation(spark, sf_dir).mapInPandas(run, sch)


# sharpen = 5*center - N - S - E - W, all integers.
_CONVOLVE_ORACLE = f"""
    WITH idx AS (
        SELECT y.range AS y, x.range AS x
        FROM range(1, {_N - 1}) y CROSS JOIN range(1, {_N - 1}) x
    )
    SELECT n_nationkey AS k, CAST(y AS INT) AS y, CAST(x AS INT) AS x,
           CAST(5 * ((y * 37 + x * 101 + n_nationkey * 13) % 97)
                - (((y-1) * 37 + x * 101 + n_nationkey * 13) % 97)
                - (((y+1) * 37 + x * 101 + n_nationkey * 13) % 97)
                - ((y * 37 + (x-1) * 101 + n_nationkey * 13) % 97)
                - ((y * 37 + (x+1) * 101 + n_nationkey * 13) % 97)
                AS INT) AS sharp
    FROM nation CROSS JOIN idx
"""


# --------------------------------------------------------------------------
# 3. Warp with -cutline: dst-CRS box at integer pixel corners.
# --------------------------------------------------------------------------


def raster_warp_cutline_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster import warp as WP

    x0d, dmx = _WARP_DST_GT[0], _WARP_DST_GT[1]
    my0, dmy = _WARP_DST_GT[3], -_WARP_DST_GT[5]
    cut = [np.array(
        [
            [x0d + 4 * dmx, my0 - 13 * dmy],
            [x0d + 12 * dmx, my0 - 13 * dmy],
            [x0d + 12 * dmx, my0 - 3 * dmy],
            [x0d + 4 * dmx, my0 - 3 * dmy],
        ]
    )]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                out = WP.warp_array(
                    _mod_raster(k).astype(np.float64),
                    _WARP_SRC_GT, _WARP_DST_GT, _N, _N,
                    src_crs="EPSG:4326", dst_crs="EPSG:3857",
                    resample="near", approx_grid=0,
                    nodata=255.0, cutline=cut,
                )
                for i in range(_N):
                    for j in range(_N):
                        rows.append((k, i, j, int(round(out[i, j]))))
            yield pd.DataFrame(rows, columns=[f.name for f in _PX_SCHEMA.fields])

    return _nation(spark, sf_dir).mapInPandas(run, _PX_SCHEMA)


# the cutline burns exactly rows 3..12 x cols 4..11 (pixel-center rule on
# integer pixel corners); outside -> nodata 255.
_WARP_CUTLINE_ORACLE = f"""
    WITH idx AS (
        SELECT i.range AS i, j.range AS j
        FROM range({_N}) i CROSS JOIN range({_N}) j
    ),
    m AS (
        SELECT i, j,
               CAST(round((56.0 - degrees(
                   2.0 * atan(exp(radians(65.0 - 1.25 * (i + 0.5))))
                   - pi() / 2.0)) - 0.5) AS INT) AS iy,
               CAST(round(0.25 + 0.9 * j) AS INT) AS ix
        FROM idx
    )
    SELECT n_nationkey AS k, CAST(i AS INT) AS i, CAST(j AS INT) AS j,
           CAST(CASE WHEN i BETWEEN 3 AND 12 AND j BETWEEN 4 AND 11
                THEN (iy * 37 + ix * 101 + n_nationkey * 13) % 97
                ELSE 255 END AS INT) AS v
    FROM nation CROSS JOIN m
"""


# --------------------------------------------------------------------------
# 4. gdal_contour -p banded polygons on a linear ramp.
# --------------------------------------------------------------------------


def contour_polygons_ramp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster.contour import contour_polygons

    yy, xx = np.mgrid[0:16, 0:20].astype(np.float64)
    out = contour_polygons(spark, xx.copy(), [5.5, 12.5], tile=8)
    return (
        out.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_regions"),
            F.sum("npix").alias("n_pix"),
            F.round(F.sum("area"), 4).alias("band_area"),
        )
    )


_CONTOUR_POLY_ORACLE = """
    SELECT CAST(0 AS INT) AS band, CAST(1 AS BIGINT) AS n_regions,
           CAST(96 AS BIGINT) AS n_pix, round(96.0, 4) AS band_area
    UNION ALL
    SELECT 1, 1, 112, round(112.0, 4)
    UNION ALL
    SELECT 2, 1, 112, round(112.0, 4)
"""


# --------------------------------------------------------------------------
# 5. Blend compositing: multiply / screen / darken / lighten.
# --------------------------------------------------------------------------


def raster_toolbox_blend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster import toolbox as TB

    sch = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("y", T.IntegerType()),
            T.StructField("x", T.IntegerType()),
            T.StructField("mul", T.IntegerType()),
            T.StructField("scr", T.IntegerType()),
            T.StructField("dk", T.IntegerType()),
            T.StructField("lt", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 8
        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                b = np.repeat(_mod_raster(k, n)[:, :, None], 3, axis=2)
                o = np.repeat(_mod_raster(k + 5, n)[:, :, None], 3, axis=2)
                mul = TB.blend(b, o, "multiply")
                scr = TB.blend(b, o, "screen")
                dk = TB.blend(b, o, "darken")
                lt = TB.blend(b, o, "lighten")
                for y in range(n):
                    for x in range(n):
                        rows.append(
                            (k, y, x, int(mul[y, x, 0]), int(scr[y, x, 0]),
                             int(dk[y, x, 0]), int(lt[y, x, 0]))
                        )
            yield pd.DataFrame(rows, columns=[f.name for f in sch.fields])

    return _nation(spark, sf_dir).mapInPandas(run, sch)


_BLEND_ORACLE = """
    WITH g AS (
        SELECT n_nationkey AS k, y.range AS y, x.range AS x,
               CAST((y.range * 37 + x.range * 101 + n_nationkey * 13) % 97
                    AS DOUBLE) AS b,
               CAST((y.range * 37 + x.range * 101 + (n_nationkey + 5) * 13) % 97
                    AS DOUBLE) AS o
        FROM nation CROSS JOIN range(8) y CROSS JOIN range(8) x
    )
    SELECT k, CAST(y AS INT) AS y, CAST(x AS INT) AS x,
           CAST(round(b * o / 255.0) AS INT) AS mul,
           CAST(round(255.0 - (255.0 - b) * (255.0 - o) / 255.0) AS INT) AS scr,
           CAST(least(b, o) AS INT) AS dk,
           CAST(greatest(b, o) AS INT) AS lt
    FROM g
"""


# --------------------------------------------------------------------------
# 6. Hillshade on a plane DEM (closes the hillshade oracle gap: the Horn
#    gradient of z = A*x + B*y is EXACTLY (A, B) on interior pixels, so
#    every interior hillshade value is one constant DuckDB recomputes with
#    scalar trig — apps/gdaldem_lib.cpp:809-1086 GDALHillshadeAlg).
# --------------------------------------------------------------------------


def hillshade_plane_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster import kernels as K

    sch = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("hs_min", T.IntegerType()),
            T.StructField("hs_max", T.IntegerType()),
            T.StructField("slope_c", T.DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                a, b = 1 + k % 5, 2 + (3 * k) % 7
                yy, xx = np.meshgrid(
                    np.arange(_N), np.arange(_N), indexing="ij"
                )
                dem = (a * xx + b * yy).astype(np.float64)
                hs = K.hillshade(dem)[1:-1, 1:-1]
                sl = K.slope_deg(dem)[1:-1, 1:-1]
                assert sl.min() == sl.max()
                rows.append(
                    (k, int(hs.min()), int(hs.max()),
                     round(float(sl[0, 0]), 4))
                )
            yield pd.DataFrame(rows, columns=[f.name for f in sch.fields])

    return _nation(spark, sf_dir).mapInPandas(run, sch)


# interior Horn gradient of the plane is (a, b) exactly; fixture (a, b)
# pairs are knife-edge-checked in tests/test_closedform_dem_extra.py so
# round() ties can never split numpy (half-even) from DuckDB (half-away).
_HILLSHADE_PLANE_ORACLE = """
    WITH c AS (
        SELECT n_nationkey AS k,
               CAST(1 + n_nationkey % 5 AS DOUBLE) AS a,
               CAST(2 + (3 * n_nationkey) % 7 AS DOUBLE) AS b
        FROM nation
    ), t AS (
        SELECT k, atan(sqrt(a * a + b * b)) AS slope,
               pi() / 2 - atan2(b, -a) AS aspect_n
        FROM c
    ), v AS (
        SELECT k,
               CAST(round(255 * greatest(
                   sin(radians(45)) * cos(slope)
                   + cos(radians(45)) * sin(slope)
                       * cos(radians(315) - aspect_n), 0)) AS INT) AS hs,
               round(degrees(slope), 4) AS slope_c
        FROM t
    )
    SELECT k, hs AS hs_min, hs AS hs_max, slope_c FROM v
"""


SPARK = {
    "hillshade_plane_mod": hillshade_plane_mod,
    "raster_dem_metrics_mod": raster_dem_metrics_mod,
    "raster_convolve_mod": raster_convolve_mod,
    "raster_warp_cutline_pixels": raster_warp_cutline_pixels,
    "contour_polygons_ramp": contour_polygons_ramp,
    "raster_toolbox_blend": raster_toolbox_blend,
}

ORACLE = {
    "hillshade_plane_mod": _HILLSHADE_PLANE_ORACLE,
    "raster_dem_metrics_mod": _DEM_METRICS_ORACLE,
    "raster_convolve_mod": _CONVOLVE_ORACLE,
    "raster_warp_cutline_pixels": _WARP_CUTLINE_ORACLE,
    "contour_polygons_ramp": _CONTOUR_POLY_ORACLE,
    "raster_toolbox_blend": _BLEND_ORACLE,
}
