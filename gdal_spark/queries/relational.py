"""OGR-SQL-semantics relational operators (SURVEY.md §2.2-2.6, M1).

OGR SQL is a small dialect (ogr/swq_parser.y): projection, WHERE with
LIKE/ILIKE/IN/BETWEEN/IS NULL, whole-table aggregates, DISTINCT, ORDER BY
+ LIMIT/OFFSET, UNION ALL, and a 1:<=1 first-match JOIN
(ogr_gensql.cpp:1498-1545). GROUP BY/HAVING arrive via the SQLite dialect
(gcore/gdaldataset.cpp:7412) — for us that's just Spark SQL. Everything
here is a thin, declarative DataFrame expression: Catalyst owns pushdown,
pruning, join strategy (§4 — zero custom planner code).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gdal_spark.sources.tables import load


def select_where_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + aliases + arithmetic + LIKE/IN/BETWEEN predicates
    (swq_op_registrar.cpp:29-52 operator set)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_returnflag").isin("A", "R"))
            & F.col("l_quantity").between(10.0, 40.0)
            & F.col("l_linestatus").like("F%")
        )
        .select(
            F.col("l_orderkey").alias("okey"),
            F.col("l_linenumber").alias("lineno"),
            (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
            .alias("net_price"),
            F.col("l_returnflag").alias("rflag"),
        )
    )


def summary_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SWQM_SUMMARY_RECORD single-row aggregate (ogr_gensql.cpp:861):
    MIN/MAX/COUNT/COUNT DISTINCT/SUM/AVG/STDDEV_POP/STDDEV_SAMP."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.count(F.lit(1)).alias("cnt"),
        F.countDistinct("l_returnflag").alias("cnt_distinct_rflag"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.stddev_pop("l_quantity"), 4).alias("stddev_pop_qty"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("stddev_samp_qty"),
    )


def distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SWQM_DISTINCT_LIST. Reference emits first-seen order
    (autotest/ogr/ogr_sql_test.py:198) — not reproducible distributed;
    compared order-insensitively (documented deviation, SURVEY.md §5)."""
    return load(spark, sf_dir, "orders").select("o_orderpriority").distinct()


def order_by_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT/OFFSET (ogr_swq.h:480). Spark plans
    TakeOrderedAndProject for the top-k shape — the distributed analog of
    OGR's single-pass special case (ogr_gensql.cpp:2236)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_totalprice")
        .offset(10)
        .limit(50)
    )


def join_first_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OGR JOIN multiplicity trap: each primary row joins AT MOST ONE
    secondary row — the first the secondary layer yields
    (ogr_gensql.cpp:1498-1545). Distributed restatement: right side
    deduped to its first row per key (row_number over FID order) before
    a plain left join."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    # synthetic lineitem repeats (orderkey, linenumber): extend the FID
    # ordering with value columns so "first" is a total order on both engines
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_quantity", "l_extendedprice"
    )
    first_li = (
        li.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("l_orderkey", "l_quantity", "l_extendedprice")
    )
    return o.join(first_li, o.o_orderkey == first_li.l_orderkey, "left").select(
        "o_orderkey",
        "o_totalprice",
        F.col("l_quantity").alias("first_qty"),
        F.col("l_extendedprice").alias("first_price"),
    )


def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL via OGRUnionLayer field-name reconciliation
    (ogrunionlayer.cpp) == unionByName."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"), F.col("c_acctbal").alias("acctbal")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"), F.col("s_acctbal").alias("acctbal")
    )
    return c.unionByName(s)


def group_by_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQLite-dialect GROUP BY/HAVING == native Spark SQL (TPC-H Q1 shape)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .filter(F.col("count_order") > 10)
    )


def cast_substr_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OGR string functions CONCAT/SUBSTR (1-based, swq_op_registrar.cpp:48)
    + CAST (SWQCastEvaluator)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("fid"),  # FID special field carried as data
        F.concat(F.substring("p_name", 1, 8), F.lit("/"), F.col("p_brand")).alias("tag"),
        F.col("p_size").cast("double").alias("size_f"),
        # explicit floor: Spark cast-to-int truncates, DuckDB rounds — pin it
        F.floor("p_retailprice").alias("price_i"),
    )


def where_is_null_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL / NOT IN / NOT LIKE / parenthesized OR trees
    (swq_op_registrar.cpp:29-42)."""
    e = load(spark, sf_dir, "events")
    return (
        e.filter(
            (~F.col("event_type").isin("click", "view"))
            & F.col("value").isNotNull()
            & (~F.col("event_type").like("%error%") | (F.col("value") > 150.0))
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


def intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT/EXCEPT (SQLite dialect only in reference): nation keys of
    customers minus suppliers' nations, intersected with region 0..3."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nkey"))
    # Restrict the EXCEPT side to negative-balance suppliers so the expected
    # result is non-empty at every sf (a green row on 0 rows proves nothing).
    s = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_nationkey").alias("nkey"))
    )
    n = load(spark, sf_dir, "nation").filter(F.col("n_regionkey") <= 3).select(
        F.col("n_nationkey").alias("nkey")
    )
    return c.intersect(n).exceptAll(s.distinct()).distinct()




def hstore_get_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OGR SQL HSTORE_GET_VALUE (ogr/swq_op_registrar.cpp:48-52) over the
    events props column (JSON key->value side data): extract + aggregate."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    # avg is emitted as an exact integer scaled by 1e4 (round-half-up via pure
    # integer arithmetic) so Spark and the DuckDB oracle hash identical bits —
    # sum(INT) widens differently (BIGINT vs HUGEINT) and round(avg) can flip a
    # half-ulp between engines, so both are pinned to BIGINT.
    return (
        e.select(F.col("event_type").alias("etype"), k.alias("k"))
        .groupBy("etype")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.expr("(sum(k) * 20000 + count(k)) div (2 * count(k))")
            .cast("long")
            .alias("avg_k_e4"),
        )
    )


SPARK = {
    "ogr_select_where_like": select_where_like,
    "ogr_summary_aggregates": summary_aggregates,
    "ogr_distinct": distinct_values,
    "ogr_order_by_limit_offset": order_by_limit_offset,
    "ogr_join_first_match": join_first_match,
    "ogr_union_all": union_all,
    "sqlite_group_by_having": group_by_having,
    "ogr_cast_substr_concat": cast_substr_concat,
    "ogr_where_is_null_not_in": where_is_null_not_in,
    "sqlite_intersect_except": intersect_except,
    "ogr_hstore_get_value": hstore_get_value,
}

ORACLE = {
    "ogr_hstore_get_value": """
        SELECT etype,
               count(*) AS n,
               CAST(sum(k) AS BIGINT) AS sum_k,
               CAST((sum(k) * 20000 + count(k)) // (2 * count(k)) AS BIGINT) AS avg_k_e4
        FROM (
            SELECT event_type AS etype,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events
        ) GROUP BY etype
    """,
    "ogr_select_where_like": """
        SELECT l_orderkey AS okey,
               l_linenumber AS lineno,
               l_extendedprice * (1.0 - l_discount) AS net_price,
               l_returnflag AS rflag
        FROM lineitem
        WHERE l_returnflag IN ('A','R')
          AND l_quantity BETWEEN 10.0 AND 40.0
          AND l_linestatus LIKE 'F%'
    """,
    "ogr_summary_aggregates": """
        SELECT min(l_quantity) AS min_qty,
               max(l_quantity) AS max_qty,
               count(*) AS cnt,
               count(DISTINCT l_returnflag) AS cnt_distinct_rflag,
               round(sum(l_extendedprice), 2) AS sum_price,
               round(avg(l_quantity), 4) AS avg_qty,
               round(stddev_pop(l_quantity), 4) AS stddev_pop_qty,
               round(stddev_samp(l_quantity), 4) AS stddev_samp_qty
        FROM lineitem
    """,
    "ogr_distinct": "SELECT DISTINCT o_orderpriority FROM orders",
    "ogr_order_by_limit_offset": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 50 OFFSET 10
    """,
    "ogr_join_first_match": """
        WITH first_li AS (
            SELECT l_orderkey, l_quantity, l_extendedprice,
                   row_number() OVER (PARTITION BY l_orderkey
                                      ORDER BY l_linenumber, l_quantity, l_extendedprice) AS rn
            FROM lineitem
        )
        SELECT o.o_orderkey, o.o_totalprice,
               f.l_quantity AS first_qty, f.l_extendedprice AS first_price
        FROM orders o LEFT JOIN (SELECT * FROM first_li WHERE rn = 1) f
          ON o.o_orderkey = f.l_orderkey
    """,
    "ogr_union_all": """
        SELECT c_name AS name, c_acctbal AS acctbal FROM customer
        UNION ALL
        SELECT s_name AS name, s_acctbal AS acctbal FROM supplier
    """,
    "sqlite_group_by_having": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        HAVING count(*) > 10
    """,
    "ogr_cast_substr_concat": """
        SELECT p_partkey AS fid,
               concat(substring(p_name, 1, 8), '/', p_brand) AS tag,
               CAST(p_size AS DOUBLE) AS size_f,
               CAST(floor(p_retailprice) AS BIGINT) AS price_i
        FROM part
    """,
    "ogr_where_is_null_not_in": """
        SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        FROM events
        WHERE event_type NOT IN ('click','view')
          AND value IS NOT NULL
          AND (event_type NOT LIKE '%error%' OR value > 150.0)
        GROUP BY event_type
    """,
    "sqlite_intersect_except": """
        SELECT DISTINCT nkey FROM (
            SELECT c_nationkey AS nkey FROM customer
            INTERSECT
            SELECT n_nationkey AS nkey FROM nation WHERE n_regionkey <= 3
        )
        WHERE nkey NOT IN (
            SELECT DISTINCT s_nationkey FROM supplier WHERE s_acctbal < 0
        )
    """,
}
