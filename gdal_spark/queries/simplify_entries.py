"""vector simplify / segmentize contract entries.

Reference parity: `gdal vector simplify` (apps/gdalalg_vector_simplify.cpp)
and `gdal vector segmentize` (apps/gdalalg_vector_segmentize.cpp), i.e.
OGRGeometry::Simplify / segmentize (ogr/ogrgeometry.cpp:866) and the
SQLite-dialect ST_Simplify (ogrsqlitesqlfunctions.cpp).

The fixture is engineered so Douglas-Peucker output is analytically
predictable and the DuckDB oracle is pure closed-form arithmetic:

  kind=0  8x6 rectangle whose edges are each subdivided into m = 2+(k%3)
          collinear parts -> simplify(tol=0.1) always recovers the exact
          5-point rectangle ring (collinear deviation is exactly 0, corner
          deviations are 4.8).
  kind=1  8x6 rectangle plus one outward bump vertex at the bottom-edge
          midpoint with deviation d = (k%5)*0.04 (0..0.16, values chosen
          off the 0.1 tolerance knife-edge) -> bump removed iff d <= 0.1,
          i.e. k%5 <= 2; area shrinks by the bump triangle (4*d) exactly
          when removed.

Segmentize: the plain rectangle with max_len s = 1+(k%4) gives
2*ceil(8/s) + 2*ceil(6/s) + 1 ring points (closure counted).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from gdal_spark.sources.tables import load

RECT_W, RECT_H = 8.0, 6.0
TOL = 0.1


def _fixture_wkbs(k: np.ndarray, kind: np.ndarray):
    from gdal_spark.functions import wkb as W

    out = []
    for ki, kd in zip(k, kind):
        x0 = float(ki % 5) * 10.0
        y0 = float(ki // 5) * 10.0
        x1, y1 = x0 + RECT_W, y0 + RECT_H
        corners = [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]
        if kd == 0:
            m = 2 + int(ki % 3)
            pts = []
            for a, b in zip(corners, corners[1:] + corners[:1]):
                for j in range(m):
                    pts.append(
                        (
                            a[0] + (b[0] - a[0]) * j / m,
                            a[1] + (b[1] - a[1]) * j / m,
                        )
                    )
            pts.append(corners[0])
        else:
            d = float(ki % 5) * 0.04
            pts = [
                (x0, y0), ((x0 + x1) / 2.0, y0 - d), (x1, y0),
                (x1, y1), (x0, y1), (x0, y0),
            ]
        out.append(bytearray(W.write_polygon([np.array(pts, dtype=np.float64)])))
    return out


@pandas_udf(T.BinaryType())
def _fixture_udf(k: pd.Series, kind: pd.Series) -> pd.Series:
    return pd.Series(_fixture_wkbs(k.to_numpy(), kind.to_numpy()))


@pandas_udf(T.BinaryType())
def _rect_udf(k: pd.Series) -> pd.Series:
    from gdal_spark.functions import wkb as W

    out = []
    for ki in k.to_numpy():
        x0 = float(ki % 5) * 10.0
        y0 = float(ki // 5) * 10.0
        x1, y1 = x0 + RECT_W, y0 + RECT_H
        out.append(
            bytearray(
                W.write_polygon(
                    [
                        np.array(
                            [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)],
                            dtype=np.float64,
                        )
                    ]
                )
            )
        )
    return pd.Series(out)


def vector_simplify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.functions import st_catalog as ST

    ST.register_all(spark)
    n = load(spark, sf_dir, "nation")
    base = (
        n.select(F.col("n_nationkey").alias("k"))
        .crossJoin(spark.range(2).select(F.col("id").cast("int").alias("kind")))
        .withColumn("wkb", _fixture_udf(F.col("k"), F.col("kind")))
        .withColumn("rect_wkb", _rect_udf(F.col("k")))
        .withColumn("s", (F.lit(1.0) + (F.col("k") % 4).cast("double")))
    )
    base.createOrReplaceTempView("simplify_fixture_q")
    return spark.sql(
        f"""
        SELECT k, kind,
               ST_NPoints(wkb) AS n_in,
               ST_NPoints(ST_Simplify(wkb, {TOL})) AS n_out,
               round(ST_Area(wkb), 6) AS area_in,
               round(ST_Area(ST_Simplify(wkb, {TOL})), 6) AS area_out,
               ST_NPoints(ST_Segmentize(rect_wkb, s)) AS n_seg
        FROM simplify_fixture_q
        """
    )


_SIMPLIFY_ORACLE = """
    WITH base AS (
        SELECT n_nationkey AS k, kind,
               2 + (n_nationkey % 3) AS m,
               (n_nationkey % 5) * 0.04 AS d,
               1.0 + (n_nationkey % 4) AS s
        FROM nation CROSS JOIN (SELECT 0 AS kind UNION ALL SELECT 1) kinds
    )
    SELECT k, kind,
           CAST(CASE WHEN kind = 0 THEN 4 * m + 1 ELSE 6 END AS INT) AS n_in,
           CAST(CASE WHEN kind = 0 OR (k % 5) <= 2 THEN 5 ELSE 6 END AS INT)
               AS n_out,
           round(CASE WHEN kind = 0 THEN 48.0 ELSE 48.0 + 4.0 * d END, 6)
               AS area_in,
           round(CASE WHEN kind = 0 OR (k % 5) <= 2 THEN 48.0
                      ELSE 48.0 + 4.0 * d END, 6) AS area_out,
           CAST(2 * ceil(8.0 / s) + 2 * ceil(6.0 / s) + 1 AS INT) AS n_seg
    FROM base
"""

# --------------------------------------------------------------------------
# Coverage simplification (gdal vector simplify-coverage /
# GEOS CoverageSimplifier via apps/gdalalg_vector_simplify_coverage.cpp)
# --------------------------------------------------------------------------
#
# Per nation key k: one 3-polygon noded coverage instance at x-offset
# 100k —  A = (0,0)-(20,10) below,  B = (0,10)-(10,20) and
# C = (10,10)-(20,20) above.  (10,10) is a T-node on A's top edge: the
# owner pair changes {A,C} -> {A,B} there, so coverage simplify MUST keep
# it even though it is collinear along A's edge (independent per-polygon
# DP drops it and breaks the coverage).  The A-B shared chain carries a
# bump vertex at (5, 10-d), d = (k%5)*0.04 (off the 0.1 knife-edge):
# removed iff d <= 0.1, identically on BOTH sides, transferring the
# 5d bump-triangle area from B back to A.  All unshared edges and the
# B-C shared edge carry m-1 collinear subdivision vertices that always
# vanish.  Everything is closed-form for the DuckDB oracle, including
# the A+B+C = 400 conservation the naive path would violate.

COV_TOL = 0.1


def _coverage_polys(k: int):
    from gdal_spark.functions import wkb as W

    X = float(k) * 100.0
    m = 2 + k % 3
    d = (k % 5) * 0.04

    def sub(a, b):
        """Interior subdivision points of segment a->b (m parts), computed
        from the lexicographically smaller endpoint so both owners of a
        shared edge get BIT-IDENTICAL vertices (a noded coverage requires
        exact vertex equality; 10+10*j/3 != 20-10*(m-j)/3 in floats)."""
        lo, hi = (a, b) if a <= b else (b, a)
        pts = [
            (lo[0] + (hi[0] - lo[0]) * j / m, lo[1] + (hi[1] - lo[1]) * j / m)
            for j in range(1, m)
        ]
        if a > b:
            pts.reverse()
        return pts

    bump = (X + 5.0, 10.0 - d)
    a_ring = (
        [(X, 0.0)] + sub((X, 0.0), (X + 20.0, 0.0))
        + [(X + 20.0, 0.0)] + sub((X + 20.0, 0.0), (X + 20.0, 10.0))
        + [(X + 20.0, 10.0), (X + 10.0, 10.0), bump, (X, 10.0)]
        + sub((X, 10.0), (X, 0.0))
        + [(X, 0.0)]
    )
    b_ring = (
        [(X, 10.0), bump, (X + 10.0, 10.0)]
        + sub((X + 10.0, 10.0), (X + 10.0, 20.0))
        + [(X + 10.0, 20.0)] + sub((X + 10.0, 20.0), (X, 20.0))
        + [(X, 20.0)] + sub((X, 20.0), (X, 10.0))
        + [(X, 10.0)]
    )
    c_ring = (
        [(X + 10.0, 10.0), (X + 20.0, 10.0)]
        + sub((X + 20.0, 10.0), (X + 20.0, 20.0))
        + [(X + 20.0, 20.0)] + sub((X + 20.0, 20.0), (X + 10.0, 20.0))
        + [(X + 10.0, 20.0)] + sub((X + 10.0, 20.0), (X + 10.0, 10.0))
        + [(X + 10.0, 10.0)]
    )
    return [
        W.write_polygon([np.array(r, dtype=np.float64)])
        for r in (a_ring, b_ring, c_ring)
    ]


def coverage_simplify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.operators.coverage import simplify_coverage

    n = load(spark, sf_dir, "nation")

    fixture_schema = T.StructType(
        [
            T.StructField("poly_id", T.LongType()),
            T.StructField("k", T.LongType()),
            T.StructField("poly", T.StringType()),
            T.StructField("wkb", T.BinaryType()),
            T.StructField("n_in", T.IntegerType()),
            T.StructField("area_in", T.DoubleType()),
        ]
    )

    def gen(batches):
        from gdal_spark.functions import geom as G
        from gdal_spark.functions import simplify as S

        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                for i, (name, buf) in enumerate(
                    zip("ABC", _coverage_polys(k))
                ):
                    rows.append(
                        (
                            k * 4 + i, k, name, bytearray(buf),
                            S.n_points_wkb(buf), G.wkb_area(buf),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["poly_id", "k", "poly", "wkb", "n_in", "area_in"],
            )

    fixture = n.select("n_nationkey").mapInPandas(gen, schema=fixture_schema)
    out = simplify_coverage(fixture.select("poly_id", "wkb"), COV_TOL)

    meas_schema = T.StructType(
        [
            T.StructField("poly_id", T.LongType()),
            T.StructField("n_out", T.IntegerType()),
            T.StructField("area_out", T.DoubleType()),
        ]
    )

    def measure(batches):
        from gdal_spark.functions import geom as G
        from gdal_spark.functions import simplify as S

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "poly_id": pdf["poly_id"],
                    "n_out": [S.n_points_wkb(bytes(b)) for b in pdf["wkb"]],
                    "area_out": [G.wkb_area(bytes(b)) for b in pdf["wkb"]],
                }
            )

    meas = out.mapInPandas(measure, schema=meas_schema)
    return (
        fixture.drop("wkb")
        .join(meas, "poly_id")
        .select(
            "k", "poly", "n_in", "n_out",
            F.round("area_in", 6).alias("area_in"),
            F.round("area_out", 6).alias("area_out"),
        )
    )


_COVERAGE_ORACLE = """
    WITH base AS (
        SELECT n_nationkey AS k,
               2 + (n_nationkey % 3) AS m,
               (n_nationkey % 5) * 0.04 AS d,
               CAST((n_nationkey % 5) >= 3 AS INT) AS kept
        FROM nation
    ),
    polys AS (
        SELECT k, 'A' AS poly,
               7 + 3 * (m - 1) AS n_in, 6 + kept AS n_out,
               200.0 - 5.0 * d AS area_in,
               CASE WHEN kept = 1 THEN 200.0 - 5.0 * d ELSE 200.0 END AS area_out
        FROM base
        UNION ALL
        SELECT k, 'B',
               6 + 3 * (m - 1), 5 + kept,
               100.0 + 5.0 * d,
               CASE WHEN kept = 1 THEN 100.0 + 5.0 * d ELSE 100.0 END
        FROM base
        UNION ALL
        SELECT k, 'C', 5 + 3 * (m - 1), 5, 100.0, 100.0 FROM base
    )
    SELECT k, poly, CAST(n_in AS INT) AS n_in, CAST(n_out AS INT) AS n_out,
           round(area_in, 6) AS area_in, round(area_out, 6) AS area_out
    FROM polys
"""

# --------------------------------------------------------------------------
# Coverage validation (gdal vector check-coverage /
# GEOS CoverageValidator via apps/gdalalg_vector_check_coverage.cpp)
# --------------------------------------------------------------------------
#
# Per nation key k: a 2x2 grid of 10x10 cells (A,B,C,D) at x-offset 200k,
# with a planted defect by k%3 —
#   k%3==0  valid coverage
#   k%3==1  D shifted by (-1,-1): overlaps A (area 1), B (9), C (9);
#           B-D and C-D edges stop being shared
#   k%3==2  E duplicates A: two triple-owned edges, one full overlap (100)
# Segment-ownership histogram and overlap pairs/areas are all closed-form.

CHECK_CELL = 20.0


def _check_polys(k: int):
    from gdal_spark.functions import wkb as W

    X = float(k) * 200.0

    def box(x0, y0):
        return W.write_polygon(
            [
                np.array(
                    [
                        (x0, y0), (x0 + 10.0, y0), (x0 + 10.0, y0 + 10.0),
                        (x0, y0 + 10.0), (x0, y0),
                    ],
                    dtype=np.float64,
                )
            ]
        )

    polys = [box(X, 0.0), box(X + 10.0, 0.0), box(X, 10.0)]
    if k % 3 == 1:
        polys.append(box(X + 9.0, 9.0))  # shifted D
    else:
        polys.append(box(X + 10.0, 10.0))
    if k % 3 == 2:
        polys.append(box(X, 0.0))  # E = duplicate of A
    return polys


def coverage_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.operators.coverage import (
        boundary_segment_stats,
        overlap_pairs,
    )

    n = load(spark, sf_dir, "nation")

    fx_schema = T.StructType(
        [
            T.StructField("poly_id", T.LongType()),
            T.StructField("wkb", T.BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                for i, buf in enumerate(_check_polys(k)):
                    rows.append((k * 8 + i, bytearray(buf)))
            yield pd.DataFrame(rows, columns=["poly_id", "wkb"])

    fixture = n.select("n_nationkey").mapInPandas(gen, schema=fx_schema)
    stats = boundary_segment_stats(fixture).withColumn(
        "k", F.floor(F.col("min_owner") / 8)
    )
    seg = stats.groupBy("k").agg(
        F.sum(F.when(F.col("n_owners") == 1, 1).otherwise(0)).alias("n_seg1"),
        F.sum(F.when(F.col("n_owners") == 2, 1).otherwise(0)).alias("n_seg2"),
        F.sum(F.when(F.col("n_owners") >= 3, 1).otherwise(0)).alias(
            "n_seg_over"
        ),
    )
    ov = (
        overlap_pairs(fixture, CHECK_CELL)
        .withColumn("k", F.floor(F.col("poly_a") / 8))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_overlap_pairs"),
            F.round(F.sum("inter_area"), 6).alias("overlap_area"),
        )
    )
    return (
        seg.join(ov, "k", "left")
        .fillna({"n_overlap_pairs": 0, "overlap_area": 0.0})
        .select(
            "k", "n_seg1", "n_seg2", "n_seg_over",
            "n_overlap_pairs", "overlap_area",
        )
    )


_CHECK_ORACLE = """
    SELECT n_nationkey AS k,
           CASE n_nationkey % 3 WHEN 0 THEN 8 WHEN 1 THEN 12 ELSE 6 END
               AS n_seg1,
           CASE n_nationkey % 3 WHEN 0 THEN 4 WHEN 1 THEN 2 ELSE 4 END
               AS n_seg2,
           CASE n_nationkey % 3 WHEN 2 THEN 2 ELSE 0 END AS n_seg_over,
           CASE n_nationkey % 3 WHEN 1 THEN 3 WHEN 2 THEN 1 ELSE 0 END
               AS n_overlap_pairs,
           round(CASE n_nationkey % 3 WHEN 1 THEN 19.0 WHEN 2 THEN 100.0
                 ELSE 0.0 END, 6) AS overlap_area
    FROM nation
"""

# --------------------------------------------------------------------------
# Concave hull (gdal vector concave-hull / GEOS ConcaveHullOfPoints)
# --------------------------------------------------------------------------
#
# Fixture: per nation key, the 21-point L-grid (5x5 minus the 2x2 corner
# block) scaled by s = 1 + k%3. ratio=1.0 -> convex hull (14 ring points,
# area 14*s^2 — the notch is bridged by the long diagonal); ratio=0.4 ->
# the chi-shape erodes the notch down to its sqrt(2)-diagonal corner cut
# (16 ring points, area 12.5*s^2). Both closed-form; derivation in
# tests/test_concave_hull.py.


def concave_hull_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("n_pts", T.IntegerType()),
            T.StructField("area", T.DoubleType()),
        ]
    )

    def run(batches):
        from gdal_spark.operators.tin import concave_hull

        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                s = float(1 + k % 3)
                pts = np.array(
                    [
                        (x, y)
                        for x in range(5)
                        for y in range(5)
                        if not (x >= 3 and y >= 3)
                    ],
                    dtype=np.float64,
                ) * s
                for kind, ratio in (("convex", 1.0), ("concave", 0.4)):
                    ring = concave_hull(pts, ratio)
                    x, yy = ring[:, 0], ring[:, 1]
                    area = 0.5 * abs(
                        float(np.sum(x[:-1] * yy[1:] - x[1:] * yy[:-1]))
                    )
                    rows.append((k, kind, len(ring), round(area, 6)))
            yield pd.DataFrame(rows, columns=["k", "kind", "n_pts", "area"])

    return n.select("n_nationkey").mapInPandas(run, schema=schema)


_CONCAVE_ORACLE = """
    SELECT n_nationkey AS k, kind,
           CASE kind WHEN 'convex' THEN 14 ELSE 16 END AS n_pts,
           round(CASE kind WHEN 'convex' THEN 14.0 ELSE 12.5 END
                 * (1 + n_nationkey % 3) * (1 + n_nationkey % 3), 6) AS area
    FROM nation
    CROSS JOIN (SELECT 'convex' AS kind UNION ALL SELECT 'concave') kinds
"""

# --------------------------------------------------------------------------
# explode-collections + swap-xy (ogr2ogr -explodecollections,
# apps/gdalalg_vector_explode_collections.cpp, gdalalg_vector_swap_xy.cpp)
# --------------------------------------------------------------------------
#
# Per nation key: a multipolygon of p = 2 + k%2 square parts, part j a
# (2+j)x(2+j) square at (100k + 30j, 10j). Explode to parts, swap x/y,
# report per-part area and the swapped bbox corner — all closed-form.


def vector_explode_swap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.operators.vectorops import explode_collections, swap_xy

    n = load(spark, sf_dir, "nation")

    fx_schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("wkb", T.BinaryType()),
        ]
    )

    def gen(batches):
        from gdal_spark.functions import wkb as W

        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                polys = []
                for j in range(2 + k % 2):
                    x0, y0 = k * 100.0 + 30.0 * j, 10.0 * j
                    s = 2.0 + j
                    polys.append(
                        [
                            np.array(
                                [
                                    (x0, y0), (x0 + s, y0), (x0 + s, y0 + s),
                                    (x0, y0 + s), (x0, y0),
                                ],
                                dtype=np.float64,
                            )
                        ]
                    )
                rows.append((k, bytearray(W.write_multipolygon(polys))))
            yield pd.DataFrame(rows, columns=["k", "wkb"])

    fixture = n.select("n_nationkey").mapInPandas(gen, schema=fx_schema)
    parts = swap_xy(explode_collections(fixture))

    meas_schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("part_idx", T.IntegerType()),
            T.StructField("area", T.DoubleType()),
            T.StructField("sx", T.DoubleType()),
            T.StructField("sy", T.DoubleType()),
        ]
    )

    def measure(batches):
        from gdal_spark.functions import geom as G
        from gdal_spark.functions import wkb as W

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                buf = bytes(r.wkb)
                x0, y0, _, _ = W.bbox(buf)
                rows.append(
                    (r.k, r.part_idx, round(G.wkb_area(buf), 6), x0, y0)
                )
            yield pd.DataFrame(
                rows, columns=["k", "part_idx", "area", "sx", "sy"]
            )

    return parts.mapInPandas(measure, schema=meas_schema)


_EXPLODE_ORACLE = """
    SELECT n_nationkey AS k, j AS part_idx,
           round((2.0 + j) * (2.0 + j), 6) AS area,
           10.0 * j AS sx,
           n_nationkey * 100.0 + 30.0 * j AS sy
    FROM nation
    CROSS JOIN (SELECT 0 AS j UNION ALL SELECT 1 UNION ALL SELECT 2) parts
    WHERE j < 2 + n_nationkey % 2
"""

# --------------------------------------------------------------------------
# clean-coverage (apps/gdalalg_vector_clean_coverage.cpp, GEOS
# CoverageCleaner with snapping-distance + min-index overlap merge)
# --------------------------------------------------------------------------
#
# Fixture: nation k -> 10x10 square at (8k, 0.5k): every square overlaps
# its right neighbor in a 2 x 9.5 rectangle, and the 0.5 vertical stagger
# makes every boundary intersection a PROPER crossing (collinear shared
# edges are a documented degeneracy of the GH clipping kernel). All
# coords are jittered by 0.002 * ((k % 3) - 1) so the snap stage
# (tol 0.01, which divides 0.5) must recover the exact grid first.
# min-index: k keeps the overlap, k+1 loses a 2 x 9.5 bottom-left notch.
# Closed-form: area = 100 - 19*(k>0); the notch leaves the top strip, so
# bbox xmin stays 8k and ymin stays 0.5k.


def coverage_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.functions import geom as G
    from gdal_spark.functions import wkb as W
    from gdal_spark.operators.coverage import clean_coverage

    n = load(spark, sf_dir, "nation")

    fx_schema = T.StructType(
        [
            T.StructField("poly_id", T.LongType()),
            T.StructField("wkb", T.BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                j = 0.002 * ((k % 3) - 1)
                x0, y0, s = k * 8.0 + j, 0.5 * k + j, 10.0
                ring = np.array(
                    [
                        (x0, y0), (x0 + s, y0), (x0 + s, y0 + s),
                        (x0, y0 + s), (x0, y0),
                    ],
                    dtype=np.float64,
                )
                rows.append((k, bytearray(W.write_polygon([ring]))))
            yield pd.DataFrame(rows, columns=["poly_id", "wkb"])

    fixture = n.select("n_nationkey").mapInPandas(gen, schema=fx_schema)
    cleaned = clean_coverage(fixture, snap_tol=0.01, cell=16.0)

    meas_schema = T.StructType(
        [
            T.StructField("poly_id", T.LongType()),
            T.StructField("area", T.DoubleType()),
            T.StructField("xmin", T.DoubleType()),
            T.StructField("ymin", T.DoubleType()),
        ]
    )

    def measure(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                buf = bytes(r.wkb)
                x0, y0, _, _ = W.bbox(buf)
                rows.append(
                    (r.poly_id, round(G.wkb_area(buf), 6), x0, y0)
                )
            yield pd.DataFrame(
                rows, columns=["poly_id", "area", "xmin", "ymin"]
            )

    return cleaned.mapInPandas(measure, schema=meas_schema)


_CLEAN_ORACLE = """
    SELECT n_nationkey AS poly_id,
           CASE WHEN n_nationkey = 0 THEN 100.0 ELSE 81.0 END AS area,
           n_nationkey * 8.0 AS xmin,
           n_nationkey * 0.5 AS ymin
    FROM nation
"""

# --------------------------------------------------------------------------
# make-point + check-geometry (apps/gdalalg_vector_make_point.cpp,
# apps/gdalalg_vector_check_geometry.cpp)
# --------------------------------------------------------------------------
#
# make-point: points from supplier coords, roundtripped back out of the WKB.
# check-geometry: per nation key k, k%3 selects the fixture defect —
#   0: bowtie quad (proper self-intersection at the square center)
#   1: square with one repeated consecutive vertex
#   2: valid square
# include_valid=True keeps valid rows with NULL error, so the row count is
# deterministic and the oracle is a closed-form CASE on k%3.


def vector_make_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.functions import wkb as W
    from gdal_spark.operators.vectorops import make_point

    s = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("fid"),
        ((F.col("s_suppkey") % 360) - 180).cast("double").alias("px"),
        ((F.col("s_suppkey") % 170) - 85).cast("double").alias("py"),
    )
    pts = make_point(s, "px", "py").drop("px", "py")

    out_schema = T.StructType(
        [
            T.StructField("fid", T.LongType()),
            T.StructField("x", T.DoubleType()),
            T.StructField("y", T.DoubleType()),
        ]
    )

    def roundtrip(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                t, p = W.parse(bytes(r.wkb))
                assert t == W.WKB_POINT
                rows.append((r.fid, float(p[0]), float(p[1])))
            yield pd.DataFrame(rows, columns=["fid", "x", "y"])

    return pts.mapInPandas(roundtrip, schema=out_schema)


_MAKE_POINT_ORACLE = """
    SELECT s_suppkey AS fid,
           cast(s_suppkey % 360 - 180 AS double) AS x,
           cast(s_suppkey % 170 - 85 AS double) AS y
    FROM supplier
"""


def vector_check_geometry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.functions import wkb as W
    from gdal_spark.operators.vectorops import check_geometry

    n = load(spark, sf_dir, "nation")

    fx_schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("wkb", T.BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                x0 = k * 100.0
                if k % 3 == 0:  # bowtie: crosses at (x0+1, 1)
                    ring = [(x0, 0.0), (x0 + 2, 2.0), (x0 + 2, 0.0),
                            (x0, 2.0), (x0, 0.0)]
                elif k % 3 == 1:  # repeated consecutive vertex at (x0+2, 0)
                    ring = [(x0, 0.0), (x0 + 2, 0.0), (x0 + 2, 0.0),
                            (x0 + 2, 2.0), (x0, 2.0), (x0, 0.0)]
                else:  # valid square
                    ring = [(x0, 0.0), (x0 + 2, 0.0), (x0 + 2, 2.0),
                            (x0, 2.0), (x0, 0.0)]
                buf = W.write_polygon([np.array(ring, dtype=np.float64)])
                rows.append((k, bytearray(buf)))
            yield pd.DataFrame(rows, columns=["k", "wkb"])

    fixture = n.select("n_nationkey").mapInPandas(gen, schema=fx_schema)
    checked = check_geometry(fixture, include_valid=True)
    # sentinel instead of NULL so both engines hash identical values
    return checked.select(
        "k",
        F.coalesce("error", F.lit("valid")).alias("error"),
        F.coalesce("err_x", F.lit(-1.0)).alias("err_x"),
        F.coalesce("err_y", F.lit(-1.0)).alias("err_y"),
    )


_CHECK_GEOM_ORACLE = """
    SELECT n_nationkey AS k,
           CASE n_nationkey % 3
                WHEN 0 THEN 'self-intersection'
                WHEN 1 THEN 'repeated point'
                ELSE 'valid' END AS error,
           CASE n_nationkey % 3
                WHEN 0 THEN n_nationkey * 100.0 + 1.0
                WHEN 1 THEN n_nationkey * 100.0 + 2.0
                ELSE -1.0 END AS err_x,
           CASE n_nationkey % 3
                WHEN 0 THEN 1.0
                WHEN 1 THEN 0.0
                ELSE -1.0 END AS err_y
    FROM nation
"""

# --------------------------------------------------------------------------
# buffer (apps/gdalalg_vector_buffer.cpp, OGRGeometry::Buffer -> GEOS
# Buffer with quadsegs=8 arc discretization, vertices ON the circle)
# --------------------------------------------------------------------------
#
# Per nation k and four geometry kinds, every output is closed-form:
#   poly+  square side s=4+k%3, d=1+(k%2)*0.5: area = s^2 + 4sd + C(d),
#          37 ring points (4 corner arcs x 9 + closure)
#   poly-  same square, -1: area (s-2)^2, 5 points
#   point  disc: area C(d), 33 points
#   line   capsule over a 6-long segment: area 12d + C(d), 35 points
#   donut  same square with a centered s/2 hole, +d: hole erodes to
#          side s/2-2d (vanishing at <= 0, exactly-collapsing at 0):
#          area = dilated outer - max(s/2-2d, 0)^2, npts 37 (+5 if the
#          hole survives)
# where C(d) = (d^2/2) * 32 * sin(pi/16) is the discretized full circle.

_QUADSEGS = 8


def vector_buffer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.functions import buffer as B
    from gdal_spark.functions import geom as G
    from gdal_spark.functions import simplify as SIMP
    from gdal_spark.functions import wkb as W

    n = load(spark, sf_dir, "nation")
    base = n.select(
        F.col("n_nationkey").alias("k"),
        F.explode(
            F.array(*[F.lit(x) for x in ("poly_pos", "poly_neg", "point", "line", "donut")])
        ).alias("kind"),
    )

    out_schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("area", T.DoubleType()),
            T.StructField("npts", T.IntegerType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                k = int(r.k)
                x0 = k * 40.0
                s = 4.0 + k % 3
                d = 1.0 + (k % 2) * 0.5
                if r.kind in ("poly_pos", "poly_neg"):
                    ring = np.array(
                        [(x0, 0.0), (x0 + s, 0.0), (x0 + s, s), (x0, s), (x0, 0.0)],
                        dtype=np.float64,
                    )
                    g = W.write_polygon([ring])
                    dist = d if r.kind == "poly_pos" else -1.0
                elif r.kind == "donut":
                    ring = np.array(
                        [(x0, 0.0), (x0 + s, 0.0), (x0 + s, s), (x0, s), (x0, 0.0)],
                        dtype=np.float64,
                    )
                    h = s / 2.0
                    c0 = x0 + (s - h) / 2.0
                    c1 = (s - h) / 2.0
                    hole = np.array(
                        [(c0, c1), (c0 + h, c1), (c0 + h, c1 + h), (c0, c1 + h), (c0, c1)],
                        dtype=np.float64,
                    )
                    g = W.write_polygon([ring, hole])
                    dist = d
                elif r.kind == "point":
                    g = W.write_point(x0, 20.0)
                    dist = d
                else:
                    g = W.write_linestring(
                        np.array([(x0, 30.0), (x0 + 6.0, 30.0)], dtype=np.float64)
                    )
                    dist = d
                buf = B.buffer_wkb(g, dist, _QUADSEGS)
                rows.append(
                    (
                        k,
                        r.kind,
                        round(G.wkb_area(buf), 6),
                        SIMP.n_points_wkb(buf),
                    )
                )
            yield pd.DataFrame(rows, columns=["k", "kind", "area", "npts"])

    return base.mapInPandas(run, schema=out_schema)


_BUFFER_ORACLE = """
    WITH base AS (
        SELECT n_nationkey AS k, kind,
               4.0 + n_nationkey % 3 AS s,
               1.0 + (n_nationkey % 2) * 0.5 AS d
        FROM nation
        CROSS JOIN (SELECT 'poly_pos' AS kind UNION ALL SELECT 'poly_neg'
                    UNION ALL SELECT 'point' UNION ALL SELECT 'line'
                    UNION ALL SELECT 'donut') kinds
    )
    SELECT k, kind,
           round(CASE kind
                 WHEN 'poly_pos' THEN s*s + 4*s*d + d*d/2*32*sin(pi()/16)
                 WHEN 'poly_neg' THEN (s-2)*(s-2)
                 WHEN 'point'    THEN d*d/2*32*sin(pi()/16)
                 WHEN 'donut'    THEN s*s + 4*s*d + d*d/2*32*sin(pi()/16)
                      - CASE WHEN s/2.0 - 2*d > 1e-9
                             THEN (s/2.0 - 2*d)*(s/2.0 - 2*d) ELSE 0 END
                 ELSE 12.0*d + d*d/2*32*sin(pi()/16) END, 6) AS area,
           CAST(CASE kind WHEN 'poly_pos' THEN 37 WHEN 'poly_neg' THEN 5
                          WHEN 'point' THEN 33
                          WHEN 'donut' THEN
                               CASE WHEN s/2.0 - 2*d > 1e-9 THEN 42 ELSE 37 END
                          ELSE 35 END AS INT) AS npts
    FROM base
"""

SPARK = {
    "vector_simplify": vector_simplify,
    "vector_buffer": vector_buffer,
    "coverage_clean": coverage_clean,
    "vector_make_point": vector_make_point,
    "vector_check_geometry": vector_check_geometry,
    "coverage_simplify": coverage_simplify,
    "coverage_check": coverage_check,
    "vector_concave_hull": concave_hull_entry,
    "vector_explode_swap": vector_explode_swap,
}
ORACLE = {
    "vector_simplify": _SIMPLIFY_ORACLE,
    "vector_buffer": _BUFFER_ORACLE,
    "coverage_clean": _CLEAN_ORACLE,
    "vector_make_point": _MAKE_POINT_ORACLE,
    "vector_check_geometry": _CHECK_GEOM_ORACLE,
    "coverage_simplify": _COVERAGE_ORACLE,
    "coverage_check": _CHECK_ORACLE,
    "vector_concave_hull": _CONCAVE_ORACLE,
    "vector_explode_swap": _EXPLODE_ORACLE,
}


def vector_segmentize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`gdal vector segmentize` / OGRSimpleCurve::segmentize
    (ogr/ogrlinestring.cpp:2645): one descending segment per nation
    (no direction-canonicalization reversal), max length keyed by k;
    DuckDB recomputes floor(sqrt(sqdist/sqmax) - 1e-2) intermediate
    points at j*seg/(n+1)."""
    import numpy as np

    from gdal_spark.functions.simplify import segmentize_line

    sch = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("idx", T.IntegerType()),
            T.StructField("x", T.DoubleType()),
            T.StructField("y", T.DoubleType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                line = np.array([[10.0 + k, 5.0], [0.0, 0.0]])
                pts = segmentize_line(line, 3.0 + (k % 4))
                for i, (x, y) in enumerate(pts):
                    rows.append((k, i, round(float(x), 4), round(float(y), 4)))
            yield pd.DataFrame(rows, columns=[f.name for f in sch.fields])

    return load(spark, sf_dir, "nation").select("n_nationkey").mapInPandas(run, sch)


_SEGMENTIZE_ORACLE = """
    WITH p AS (
        SELECT n_nationkey AS k,
               10.0 + n_nationkey AS x0, 5.0 AS y0,
               0.0 AS x1, 0.0 AS y1,
               3.0 + (n_nationkey % 4) AS maxlen
        FROM nation
    ),
    n AS (
        SELECT *,
               (x1 - x0) * (x1 - x0) + (y1 - y0) * (y1 - y0) AS sqd,
               maxlen * maxlen AS sqmax
        FROM p
    ),
    m AS (
        SELECT *,
               CASE WHEN sqd - sqmax > 1e-5 * sqmax
                    THEN CAST(floor(sqrt(sqd / sqmax) - 0.01) AS INT)
                    ELSE 0 END AS n_int
        FROM n
    )
    SELECT k, CAST(j.range AS INT) AS idx,
           round(x0 + j.range * (x1 - x0) / (n_int + 1), 4) AS x,
           round(y0 + j.range * (y1 - y0) / (n_int + 1), 4) AS y
    FROM m CROSS JOIN range(0, 100) j
    WHERE j.range <= n_int + 1
"""

SPARK["vector_segmentize"] = vector_segmentize
ORACLE["vector_segmentize"] = _SEGMENTIZE_ORACLE
