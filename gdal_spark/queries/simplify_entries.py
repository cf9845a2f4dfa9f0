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

SPARK = {
    "vector_simplify": vector_simplify,
    "coverage_simplify": coverage_simplify,
}
ORACLE = {
    "vector_simplify": _SIMPLIFY_ORACLE,
    "coverage_simplify": _COVERAGE_ORACLE,
}
