"""Oracle-backed closed-form raster queries.

The pixel-kernel entries in raster_extra/raster_pipeline run over the RNG
image fixture, so the driver can only do rows-only checks there (DuckDB
cannot regenerate RNG pixels). This module re-runs the SAME engine kernels
over closed-form rasters — pixel (r, c) of image k holds an integer
arithmetic expression of (r, c, k) — so DuckDB recomputes every output
value exactly and the driver gets full hash-match rows for the kernel
families that were previously pytest-golden only:

  * gdal_translate srcwin+outsize through the REAL `raster.ops.translate`
    DataFrame operator INCLUDING a TIFF encode->decode codec roundtrip on
    both sides of the kernel (gdal_translate_lib.cpp -srcwin/-outsize,
    GRA_NearestNeighbour center convention).
  * GDALInterpolateAtPoint bilinear + near point sampling
    (alg/gdal_interpolateatpoint.cpp pixel-center convention).
  * `gdal raster neighbors` focal sum/min/max windows
    (gdalalg_raster_neighbors.cpp:207 out-of-image exclusion).
  * gdaldem slope (Horn) + hillshade over plane DEMs where the Horn
    stencil is exact (apps/gdaldem_lib.cpp GDALSlopeHornAlg /
    GDALHillshadeAlg).
  * GDALRasterizeGeometries scanline burn, REPLACE + MERGE_ALG=ADD
    (alg/gdalrasterize.cpp:999, alg/llrasterize.cpp pixel-center rule).
  * overview 2x2 average reduction (gcore/overview.cpp average path),
    emitted as the exact block sum to dodge round-half ties.
  * GDALRasterBand::GetHistogram uniform [0,256) bucketing.

Everything runs distributed (mapInPandas over the `nation` parquet table,
one raster per row) — the same partition-parallel shape the RNG-image
entries use, so a codec, windowing, or kernel regression fails the
driver's hash compare.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.sources.tables import load

_N = 16  # closed-form raster side


def _mod_raster(k: int, n: int = _N) -> np.ndarray:
    """v(r, c) = (r*37 + c*101 + k*13) % 97 — exact in every engine."""
    r, c = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    return ((r * 37 + c * 101 + k * 13) % 97).astype(np.uint8)


def _nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "nation").select("n_nationkey")


_GRID_SQL = f"""
    SELECT y.range AS y, x.range AS x
    FROM range({_N}) y CROSS JOIN range({_N}) x
"""


# --------------------------------------------------------------------------
# 1. gdal_translate srcwin + outsize (nearest) through the DataFrame
#    operator with a TIFF codec roundtrip on both sides.
# --------------------------------------------------------------------------

_PX_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("i", T.IntegerType()),
        T.StructField("j", T.IntegerType()),
        T.StructField("v", T.IntegerType()),
    ]
)


def raster_translate_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """translate(srcwin=(k%4, k%3, 8, 8), outsize=(4,4), near): output
    pixel (i, j) samples source center (y0 + 2i + 1, x0 + 2j + 1)."""
    from gdal_spark.raster import ops as O

    sch = T.StructType(
        [
            T.StructField("image_id", T.StringType()),
            T.StructField("bytes", T.BinaryType()),
            T.StructField("w", T.IntegerType()),
            T.StructField("h", T.IntegerType()),
            T.StructField("fmt", T.StringType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.functions.tiff import tiff_encode

        for pdf in batches:
            rows = [
                (f"k{int(k)}", tiff_encode(_mod_raster(int(k))), _N, _N, "tiff")
                for k in pdf["n_nationkey"]
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in sch.fields])

    imgs = _nation(spark, sf_dir).mapInPandas(gen, sch)
    out = O.translate(imgs, srcwin=(2, 1, 8, 8), outsize=(4, 4), resample="near")

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.functions import codecs

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                band = arr[:, :, 0] if arr.ndim == 3 else arr
                k = int(r.image_id[1:])
                for i in range(band.shape[0]):
                    for j in range(band.shape[1]):
                        rows.append((k, i, j, int(band[i, j])))
            yield pd.DataFrame(rows, columns=[f.name for f in _PX_SCHEMA.fields])

    return out.mapInPandas(explode, _PX_SCHEMA)


_TRANSLATE_ORACLE = """
    WITH idx AS (
        SELECT i.range AS i, j.range AS j
        FROM range(4) i CROSS JOIN range(4) j
    )
    SELECT n_nationkey AS k, CAST(i AS INT) AS i, CAST(j AS INT) AS j,
           CAST(((1 + 2*i + 1) * 37 + (2 + 2*j + 1) * 101
                 + n_nationkey * 13) % 97 AS INT) AS v
    FROM nation CROSS JOIN idx
"""


# --------------------------------------------------------------------------
# 2. GDALInterpolateAtPoint bilinear + near over a plane raster.
# --------------------------------------------------------------------------


def point_interpolate_plane(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plane DEM v = a + b*x + c*y with dyadic-rational b, c and dyadic
    sample offsets — bilinear on a plane is exact, so SQL recomputes the
    same float64 bits: v(px, py) = a + b*(px-0.5) + c*(py-0.5)."""
    from gdal_spark.raster import morph as M

    sch = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("vbil", T.DoubleType()),
            T.StructField("vnear", T.DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        xs_idx, ys_idx = np.meshgrid(np.arange(_N), np.arange(_N), indexing="xy")
        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                a, b, c = float(k), 0.25 + (k % 3), 0.5 + (k % 2)
                arr = a + b * xs_idx + c * ys_idx
                px = 1.0 + (k % 5) + 0.25
                py = 1.0 + (k % 7) + 0.5
                vb = M.interpolate_at_point(arr, np.array([px]), np.array([py]))
                vn = M.interpolate_at_point(
                    arr, np.array([px]), np.array([py]), method="near"
                )
                rows.append((k, float(vb[0]), float(vn[0])))
            yield pd.DataFrame(rows, columns=[f.name for f in sch.fields])

    return _nation(spark, sf_dir).mapInPandas(run, sch)


# near: fx = px-0.5 = 0.75 + k%5 -> round() = 1 + k%5 (0.75 rounds up);
# fy = py-0.5 = 1.0 + k%7 -> round() = 1 + k%7.
_INTERP_ORACLE = """
    SELECT n_nationkey AS k,
           n_nationkey
             + (0.25 + n_nationkey % 3) * (0.75 + n_nationkey % 5)
             + (0.5 + n_nationkey % 2) * (1.0 + n_nationkey % 7) AS vbil,
           n_nationkey
             + (0.25 + n_nationkey % 3) * (1 + n_nationkey % 5)
             + (0.5 + n_nationkey % 2) * (1 + n_nationkey % 7) AS vnear
    FROM nation
"""


# --------------------------------------------------------------------------
# 3. Focal window sum/min/max (interior pixels: full 3x3 window).
# --------------------------------------------------------------------------

_FOCAL_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("y", T.IntegerType()),
        T.StructField("x", T.IntegerType()),
        T.StructField("fsum", T.LongType()),
        T.StructField("fmin", T.IntegerType()),
        T.StructField("fmax", T.IntegerType()),
    ]
)


def raster_focal_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster import morph as M

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                arr = _mod_raster(k).astype(np.float64)
                s = M.focal_stat(arr, 3, "sum")
                mn = M.focal_stat(arr, 3, "min")
                mx = M.focal_stat(arr, 3, "max")
                for y in range(1, _N - 1):
                    for x in range(1, _N - 1):
                        rows.append(
                            (k, y, x, int(round(s[y, x])),
                             int(mn[y, x]), int(mx[y, x]))
                        )
            yield pd.DataFrame(rows, columns=[f.name for f in _FOCAL_SCHEMA.fields])

    return _nation(spark, sf_dir).mapInPandas(run, _FOCAL_SCHEMA)


_FOCAL_ORACLE = f"""
    WITH g AS (
        SELECT n_nationkey AS k, y, x,
               (y * 37 + x * 101 + n_nationkey * 13) % 97 AS v
        FROM nation CROSS JOIN ({_GRID_SQL})
    )
    SELECT a.k, CAST(a.y AS INT) AS y, CAST(a.x AS INT) AS x,
           CAST(sum(b.v) AS BIGINT) AS fsum,
           CAST(min(b.v) AS INT) AS fmin,
           CAST(max(b.v) AS INT) AS fmax
    FROM g a JOIN g b
      ON a.k = b.k AND abs(a.y - b.y) <= 1 AND abs(a.x - b.x) <= 1
    WHERE a.y BETWEEN 1 AND {_N - 2} AND a.x BETWEEN 1 AND {_N - 2}
    GROUP BY a.k, a.y, a.x
"""


# --------------------------------------------------------------------------
# 4. gdaldem slope + hillshade over plane DEMs (Horn stencil exact on a
#    plane: dz/dx = b, dz/dy = c at every interior pixel).
# --------------------------------------------------------------------------


def raster_slope_plane(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster import kernels as K

    sch = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("slope", T.DoubleType()),
            T.StructField("shade", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        xs_idx, ys_idx = np.meshgrid(np.arange(_N), np.arange(_N), indexing="xy")
        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                b, c = 0.25 * (1 + k % 4), 0.25 * (1 + k % 3)
                dem = b * xs_idx + c * ys_idx
                sl = K.slope_deg(dem)
                sh = K.hillshade(dem)
                # interior pixel — plane => constant, pick (4, 4)
                rows.append((k, round(float(sl[4, 4]), 4), int(sh[4, 4])))
            yield pd.DataFrame(rows, columns=[f.name for f in sch.fields])

    return _nation(spark, sf_dir).mapInPandas(run, sch)


# hillshade: shaded = sin(45°)cos(s) + cos(45°)sin(s)cos(az - aspect),
# az = 315° = -45° from north; aspect_from_north = pi/2 - atan2(dzdy, -dzdx)
# with dzdy = +c (array-row gradient), dzdx = +b.
_SLOPE_ORACLE = """
    WITH p AS (
        SELECT n_nationkey AS k,
               0.25 * (1 + n_nationkey % 4) AS b,
               0.25 * (1 + n_nationkey % 3) AS c
        FROM nation
    ),
    q AS (
        SELECT k, atan(sqrt(b*b + c*c)) AS s,
               radians(315.0) - (pi()/2 - atan2(c, -b)) AS da
        FROM p
    )
    SELECT k, round(degrees(s), 4) AS slope,
           CAST(round(255.0 * greatest(
                sin(radians(45.0)) * cos(s)
                + cos(radians(45.0)) * sin(s) * cos(da), 0.0)) AS INT) AS shade
    FROM q
"""


# --------------------------------------------------------------------------
# 5. Rasterize: integer-corner box, REPLACE + MERGE_ALG=ADD.
# --------------------------------------------------------------------------

_RB_N = 12


def raster_rasterize_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burn box A [(x0,y0),(x0+4,y0+5)] with value 7+k (REPLACE) and boxes
    A(3) + B(5) with MERGE_ALG=ADD, B = A shifted (+2,+2): pixel-center
    rule burns x in [x0, x0+3], y in [y0, y0+4]."""
    from gdal_spark.raster import kernels as K

    sch = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("y", T.IntegerType()),
            T.StructField("x", T.IntegerType()),
            T.StructField("vrep", T.IntegerType()),
            T.StructField("vadd", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                x0, y0 = k % 5 + 1, k % 3 + 1
                box_a = [np.array(
                    [[x0, y0], [x0 + 4, y0], [x0 + 4, y0 + 5], [x0, y0 + 5]],
                    dtype=np.float64,
                )]
                box_b = [ring + 2.0 for ring in box_a]
                rep = K.rasterize_burn([(box_a, 7.0 + k)], _RB_N, _RB_N)
                add = K.rasterize_burn(
                    [(box_a, 3.0), (box_b, 5.0)], _RB_N, _RB_N, merge_add=True
                )
                for y in range(_RB_N):
                    for x in range(_RB_N):
                        rows.append((k, y, x, int(rep[y, x]), int(add[y, x])))
            yield pd.DataFrame(rows, columns=[f.name for f in sch.fields])

    return _nation(spark, sf_dir).mapInPandas(run, sch)


_RASTERIZE_ORACLE = f"""
    WITH idx AS (
        SELECT y.range AS y, x.range AS x
        FROM range({_RB_N}) y CROSS JOIN range({_RB_N}) x
    ),
    g AS (
        SELECT n_nationkey AS k, y, x,
               n_nationkey % 5 + 1 AS x0, n_nationkey % 3 + 1 AS y0
        FROM nation CROSS JOIN idx
    )
    SELECT k, CAST(y AS INT) AS y, CAST(x AS INT) AS x,
           CAST(CASE WHEN x BETWEEN x0 AND x0 + 3 AND y BETWEEN y0 AND y0 + 4
                     THEN 7 + k ELSE 0 END AS INT) AS vrep,
           CAST((CASE WHEN x BETWEEN x0 AND x0 + 3
                       AND y BETWEEN y0 AND y0 + 4 THEN 3 ELSE 0 END)
              + (CASE WHEN x BETWEEN x0 + 2 AND x0 + 5
                       AND y BETWEEN y0 + 2 AND y0 + 6 THEN 5 ELSE 0 END)
                AS INT) AS vadd
    FROM g
"""


# --------------------------------------------------------------------------
# 6. Overview 2x2 average reduction — emitted as the exact block sum
#    (avg * 4) so no round-half tie can flip between engines.
# --------------------------------------------------------------------------


def raster_overview_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster import kernels as K

    sch = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("i", T.IntegerType()),
            T.StructField("j", T.IntegerType()),
            T.StructField("bsum", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                arr = _mod_raster(k).astype(np.float64)
                out = K.resample(arr, _N // 2, _N // 2, "average")
                for i in range(_N // 2):
                    for j in range(_N // 2):
                        rows.append((k, i, j, int(round(out[i, j] * 4.0))))
            yield pd.DataFrame(rows, columns=[f.name for f in sch.fields])

    return _nation(spark, sf_dir).mapInPandas(run, sch)


_OVERVIEW_ORACLE = f"""
    WITH g AS (
        SELECT n_nationkey AS k, y // 2 AS i, x // 2 AS j,
               (y * 37 + x * 101 + n_nationkey * 13) % 97 AS v
        FROM nation CROSS JOIN ({_GRID_SQL})
    )
    SELECT k, CAST(i AS INT) AS i, CAST(j AS INT) AS j,
           CAST(sum(v) AS BIGINT) AS bsum
    FROM g GROUP BY k, i, j
"""


# --------------------------------------------------------------------------
# 7. GetHistogram uniform bucketing over [0, 256), 16 buckets.
# --------------------------------------------------------------------------


def raster_histogram_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    sch = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("bin", T.IntegerType()),
            T.StructField("n_px", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                hist, _ = np.histogram(
                    _mod_raster(k), bins=16, range=(0.0, 256.0)
                )
                for b, c in enumerate(hist.tolist()):
                    if c:
                        rows.append((k, b, c))
            yield pd.DataFrame(rows, columns=[f.name for f in sch.fields])

    return _nation(spark, sf_dir).mapInPandas(run, sch)


_HIST_ORACLE = f"""
    WITH g AS (
        SELECT n_nationkey AS k,
               ((y * 37 + x * 101 + n_nationkey * 13) % 97) // 16 AS bin
        FROM nation CROSS JOIN ({_GRID_SQL})
    )
    SELECT k, CAST(bin AS INT) AS bin, CAST(count(*) AS BIGINT) AS n_px
    FROM g GROUP BY k, bin
"""


# --------------------------------------------------------------------------
# 8. Warp EPSG:4326 -> EPSG:3857 nearest through the real warp kernel
#    (exact transform path): dst pixel centers back-map through the
#    closed-form inverse mercator, sample the mod raster nearest.
# --------------------------------------------------------------------------

# dst grid in 3857 meters, chosen so every back-mapped center lands well
# inside the source and never within 0.05 px of a round() tie.
_M_PER_DEG = 20037508.342789244 / 180.0
_WARP_SRC_GT = (0.0, 1.0, 0.0, 56.0, 0.0, -1.0)  # lon [0,16], lat [40,56]
_WARP_DST_GT = (0.3 * _M_PER_DEG, 0.9 * _M_PER_DEG, 0.0,
                65.0 * _M_PER_DEG, 0.0, -1.25 * _M_PER_DEG)


def raster_warp_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster import warp as WP

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
                )
                for i in range(_N):
                    for j in range(_N):
                        rows.append((k, i, j, int(round(out[i, j]))))
            yield pd.DataFrame(rows, columns=[f.name for f in _PX_SCHEMA.fields])

    return _nation(spark, sf_dir).mapInPandas(run, _PX_SCHEMA)


# iy = round((56 - lat) - 0.5) with lat = inverse-mercator of the dst row
# center; ix = round(0.25 + 0.9*j) (lon = 0.75 + 0.9*j over 1-degree px).
_WARP_ORACLE = f"""
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
           CAST((iy * 37 + ix * 101 + n_nationkey * 13) % 97 AS INT) AS v
    FROM nation CROSS JOIN m
"""


SPARK = {
    "raster_warp_pixels": raster_warp_pixels,
    "raster_translate_pixels": raster_translate_pixels,
    "point_interpolate_plane": point_interpolate_plane,
    "raster_focal_mod": raster_focal_mod,
    "raster_slope_plane": raster_slope_plane,
    "raster_rasterize_box": raster_rasterize_box,
    "raster_overview_sum": raster_overview_sum,
    "raster_histogram_mod": raster_histogram_mod,
}

ORACLE = {
    "raster_warp_pixels": _WARP_ORACLE,
    "raster_translate_pixels": _TRANSLATE_ORACLE,
    "point_interpolate_plane": _INTERP_ORACLE,
    "raster_focal_mod": _FOCAL_ORACLE,
    "raster_slope_plane": _SLOPE_ORACLE,
    "raster_rasterize_box": _RASTERIZE_ORACLE,
    "raster_overview_sum": _OVERVIEW_ORACLE,
    "raster_histogram_mod": _HIST_ORACLE,
}
