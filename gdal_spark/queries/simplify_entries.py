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

SPARK = {"vector_simplify": vector_simplify}
ORACLE = {"vector_simplify": _SIMPLIFY_ORACLE}
