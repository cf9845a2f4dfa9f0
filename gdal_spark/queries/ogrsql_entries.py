"""Contract entries for the OGR SQL dialect front-end (gdal_spark/
ogrsql.py — ogr/swq_parser.y grammar, swq_op_general.cpp semantics).

The Spark side runs REAL OGR SQL text through execute_sql over the
TPC-H-ish layers; the DuckDB oracle states the same queries in ANSI
SQL with the dialect quirks made explicit (case-insensitive string
comparison via lower(), SUBSTR clamping, first-match joins trivial on
unique keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gdal_spark.sources.tables import load


def _layers(spark: SparkSession, sf_dir: str, names):
    return {n: load(spark, sf_dir, n) for n in names}


def ogr_sql_frontend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row query exercising the front-end surface in one statement:
    JOIN (first-match on region's unique key), WHERE with LIKE /
    BETWEEN / IN, SUBSTR + CONCAT + CAST projections, ORDER BY +
    LIMIT + OFFSET."""
    from gdal_spark.ogrsql import execute_sql

    sql = (
        "SELECT n.n_nationkey k, CONCAT(n.n_name, '/', r.r_name) tag, "
        "SUBSTR(n.n_name, 2, 3) frag, CAST(n.n_regionkey AS float) rk "
        "FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey "
        "WHERE n.n_name NOT LIKE '%A' AND n.n_nationkey BETWEEN 1 AND 22 "
        "AND n.n_regionkey IN (0, 1, 2, 3) "
        "ORDER BY n.n_nationkey LIMIT 12 OFFSET 2"
    )
    out = execute_sql(spark, sql, _layers(spark, sf_dir,
                                          ["nation", "region"]))
    return out.select("k", "tag", "frag", F.round("rk", 4).alias("rk"))


_FRONTEND_ORACLE = """
SELECT CAST(n.n_nationkey AS INT) AS k,
       n.n_name || '/' || r.r_name AS tag,
       substr(n.n_name, 2, 3) AS frag,
       round(CAST(n.n_regionkey AS DOUBLE), 4) AS rk
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE n.n_name NOT LIKE '%A' AND n.n_nationkey BETWEEN 1 AND 22
  AND n.n_regionkey IN (0, 1, 2, 3)
ORDER BY n.n_nationkey LIMIT 12 OFFSET 2
"""


def ogr_sql_frontend_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Summary query (OGR SQL has no GROUP BY: aggregates collapse the
    table): MIN/MAX/SUM/COUNT/COUNT DISTINCT with a dialect WHERE
    (case-insensitive string equality)."""
    from gdal_spark.ogrsql import execute_sql

    sql = (
        "SELECT MIN(c_acctbal) lo, MAX(c_acctbal) hi, "
        "COUNT(*) n, COUNT(DISTINCT c_nationkey) nat "
        "FROM customer WHERE c_mktsegment = 'building'"
    )
    out = execute_sql(spark, sql, _layers(spark, sf_dir, ["customer"]))
    return out.select(
        F.round("lo", 2).alias("lo"), F.round("hi", 2).alias("hi"),
        "n", "nat")


_FRONTEND_AGG_ORACLE = """
SELECT round(MIN(c_acctbal), 2) AS lo, round(MAX(c_acctbal), 2) AS hi,
       COUNT(*) AS n, COUNT(DISTINCT c_nationkey) AS nat
FROM customer WHERE lower(c_mktsegment) = 'building'
"""


def ogr_sql_frontend_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL chain + DISTINCT + expression naming through the
    parser."""
    from gdal_spark.ogrsql import execute_sql

    sql = (
        "SELECT DISTINCT r_regionkey + 10 rk FROM region "
        "UNION ALL SELECT n_regionkey + 20 rk FROM nation "
        "WHERE n_nationkey < 5 ORDER BY n_nationkey"
    )
    out = execute_sql(spark, sql, _layers(spark, sf_dir,
                                          ["nation", "region"]))
    return out.select(F.col("rk").cast("long").alias("rk"))


_FRONTEND_UNION_ORACLE = """
SELECT CAST(rk AS BIGINT) AS rk FROM (
  SELECT DISTINCT r_regionkey + 10 AS rk FROM region
  UNION ALL
  SELECT n_regionkey + 20 AS rk FROM nation WHERE n_nationkey < 5
)
"""


SPARK = {
    "ogr_sql_frontend": ogr_sql_frontend,
    "ogr_sql_frontend_agg": ogr_sql_frontend_agg,
    "ogr_sql_frontend_union": ogr_sql_frontend_union,
}
ORACLE = {
    "ogr_sql_frontend": _FRONTEND_ORACLE,
    "ogr_sql_frontend_agg": _FRONTEND_AGG_ORACLE,
    "ogr_sql_frontend_union": _FRONTEND_UNION_ORACLE,
}
