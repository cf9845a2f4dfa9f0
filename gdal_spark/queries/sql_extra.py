"""SQL-dialect coverage entries beyond the OGR grammar — the operators
GDAL reaches only through its SQLite dialect (SURVEY.md §2.4-2.6:
window functions, date/time functions, approximate distinct) plus the
closed-form EPSG:4326->3857 transform. All fully oracle-checked.

References: SQLite-dialect dispatch gcore/gdaldataset.cpp:7412 (full SQL
surface via ogr/ogrsf_frmts/sqlite/ogrsqlitevirtualogr.cpp); mercator
forward transform constants = gdal2tiles GlobalMercator.LatLonToMeters
(swig/python/gdal-utils/osgeo_utils/gdal2tiles.py:423).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gdal_spark.queries.spatial_sql import _lon_lat_cols, _lonlat_sql
from gdal_spark.sources.tables import load


def ogr_ilike_escape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ILIKE (UTF-8 case-insensitive, swq_test_like
    ogr/swq_op_general.cpp:41) and LIKE ... ESCAPE (the escape-char
    branch of the same matcher) — the two LIKE variants the base
    relational entry doesn't cover."""
    c = load(spark, sf_dir, "customer")
    esc = F.expr(r"replace(c_name, '#', '_') LIKE 'Customer!_00000001%' ESCAPE '!'")
    return (
        c.select(
            "c_custkey",
            F.col("c_mktsegment").ilike("bUiLd%").alias("ilike_hit"),
            esc.alias("esc_hit"),
        )
        .filter(F.col("ilike_hit") | F.col("esc_hit"))
    )


_ILIKE_ORACLE = r"""
    SELECT c_custkey,
           c_mktsegment ILIKE 'bUiLd%' AS ilike_hit,
           replace(c_name, '#', '_') LIKE 'Customer!_00000001%' ESCAPE '!' AS esc_hit
    FROM customer
    WHERE c_mktsegment ILIKE 'bUiLd%'
       OR replace(c_name, '#', '_') LIKE 'Customer!_00000001%' ESCAPE '!'
"""


def window_rank_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking + analytic windows (absent from both OGR dialect grammars;
    native here): per-customer order ranking with lag and running sum."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
        F.round(F.sum("o_totalprice").over(run), 2).alias("running_total"),
    )


_WINDOW_ORACLE = """
    SELECT o_custkey, o_orderkey,
           row_number() OVER w AS rn,
           lag(o_totalprice, 1) OVER w AS prev_price,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_total
    FROM orders WHERE o_custkey < 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
"""


def sql_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function family (OGR SQL has none; SQLite dialect
    inherits SQLite's): truncation, extraction, date arithmetic."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
            F.dayofweek("o_orderdate").alias("dow"),
            F.col("o_totalprice").alias("p"),
        )
        .groupBy("yr", "mo", "dow")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("p"), 2).alias("total"))
    )


_DATETIME_ORACLE = """
    SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
           dayofweek(o_orderdate) + 1 AS dow,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders GROUP BY 1, 2, 3
"""


def approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct (absent in the reference,
    free in Spark): checked against the exact count with a 5% bound so
    the value-hash comparison is deterministic."""
    o = load(spark, sf_dir, "orders")
    agg = o.agg(
        F.countDistinct("o_custkey").alias("n_exact"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("n_approx"),
    )
    return agg.select(
        "n_exact",
        (
            F.abs(F.col("n_approx") - F.col("n_exact"))
            <= 0.05 * F.col("n_exact")
        ).alias("approx_ok"),
    )


_APPROX_ORACLE = """
    SELECT count(DISTINCT o_custkey) AS n_exact, true AS approx_ok FROM orders
"""


def mercator_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EPSG:4326 -> EPSG:3857 forward transform as pure Column math
    (GlobalMercator.LatLonToMeters, gdal2tiles.py:423) with round-trip
    inverse check — the engine's CRS-transform kernel on its SQL-checkable
    closed form."""
    from gdal_spark.functions import mercator as M

    e = load(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    lon, lat = _lon_lat_cols(F.col("event_id"))
    mx, my = M.lonlat_to_meters(lon, lat)
    ilon, ilat = M.meters_to_lonlat(mx, my)
    return e.select(
        "event_id",
        F.round(mx, 3).alias("mx"),
        F.round(my, 3).alias("my"),
        (F.abs(ilon - lon) < 1e-9).alias("rt_lon_ok"),
        (F.abs(ilat - lat) < 1e-9).alias("rt_lat_ok"),
    )


def _mercator_oracle() -> str:
    lon, lat = _lonlat_sql("event_id")
    c_mx = repr(6378137.0 * 3.141592653589793 / 180.0)
    c_a = repr(3.141592653589793 / 360.0)
    c_b = repr(3.141592653589793 / 180.0)
    return f"""
        SELECT event_id,
               round(({lon}) * {c_mx}, 3) AS mx,
               round(ln(tan((90.0 + ({lat})) * {c_a})) / {c_b} * {c_mx}, 3) AS my,
               true AS rt_lon_ok, true AS rt_lat_ok
        FROM events WHERE event_id < 300
    """


def ogr2ogr_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ogr2ogr composition (apps/ogr2ogr_lib.cpp: -where -spat -t_srs
    -select -sql -limit): attribute filter -> spatial bbox filter ->
    reprojection (4326->3857) -> projection/rename -> order/limit, as one
    declarative chain Catalyst fuses into a single stage."""
    from gdal_spark.functions import mercator as M

    e = load(spark, sf_dir, "events")
    lon, lat = _lon_lat_cols(F.col("event_id"))
    mx, my = M.lonlat_to_meters(lon, lat)
    return (
        e.filter(F.col("event_id") % 3 != 0)  # -where
        .filter((lon >= -90.0) & (lon <= 90.0) & (lat >= -45.0) & (lat <= 45.0))  # -spat
        .select(  # -select + -t_srs
            F.col("event_id").alias("fid"),
            F.round(mx, 2).alias("x_3857"),
            F.round(my, 2).alias("y_3857"),
        )
        .orderBy(F.col("fid").asc())
        .limit(100)  # -limit
    )


def _ogr2ogr_oracle() -> str:
    lon, lat = _lonlat_sql("event_id")
    c_mx = repr(6378137.0 * 3.141592653589793 / 180.0)
    c_a = repr(3.141592653589793 / 360.0)
    c_b = repr(3.141592653589793 / 180.0)
    return f"""
        SELECT event_id AS fid,
               round(({lon}) * {c_mx}, 2) AS x_3857,
               round(ln(tan((90.0 + ({lat})) * {c_a})) / {c_b} * {c_mx}, 2) AS y_3857
        FROM events
        WHERE event_id % 3 <> 0
          AND ({lon}) BETWEEN -90.0 AND 90.0
          AND ({lat}) BETWEEN -45.0 AND 45.0
        ORDER BY fid ASC LIMIT 100
    """


SPARK = {
    "ogr_ilike_escape": ogr_ilike_escape,
    "ogr2ogr_pipeline": ogr2ogr_pipeline,
    "window_rank_lag": window_rank_lag,
    "sql_datetime": sql_datetime,
    "approx_count_distinct": approx_count_distinct,
    "mercator_transform": mercator_transform,
}

ORACLE = {
    "ogr_ilike_escape": _ILIKE_ORACLE,
    "ogr2ogr_pipeline": _ogr2ogr_oracle(),
    "window_rank_lag": _WINDOW_ORACLE,
    "sql_datetime": _DATETIME_ORACLE,
    "approx_count_distinct": _APPROX_ORACLE,
    "mercator_transform": _mercator_oracle(),
}


def vector_reproject_boxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ogr2ogr -t_srs on real WKB geometry: nation-derived 4326 boxes run
    through `operators.vectorops.reproject_wkb` (every vertex through the
    vectorized CRS kernel), then the reprojected envelope is extracted
    from the OUTPUT WKB — DuckDB recomputes the spherical-mercator corner
    math (gdal2tiles GlobalMercator constants) directly."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from gdal_spark.operators.vectorops import reproject_wkb
    from gdal_spark.sources.tables import load

    sch = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("wkb", T.BinaryType())]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.functions.wkb import write_polygon

        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                x0 = -150.0 + (k % 5) * 10.0
                y0 = -60.0 + (k // 5) * 20.0
                ring = np.array(
                    [[x0, y0], [x0 + 3, y0], [x0 + 3, y0 + 2], [x0, y0 + 2],
                     [x0, y0]]
                )
                rows.append((k, write_polygon([ring])))
            yield pd.DataFrame(rows, columns=["k", "wkb"])

    boxes = load(spark, sf_dir, "nation").select("n_nationkey").mapInPandas(gen, sch)
    out = reproject_wkb(boxes, "EPSG:4326", "EPSG:3857")

    osch = T.StructType(
        [T.StructField("k", T.LongType())]
        + [T.StructField(n, T.DoubleType()) for n in
           ("mxmin", "mymin", "mxmax", "mymax")]
    )

    def env(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.functions.wkb import bbox

        for pdf in batches:
            rows = []
            for k, b in zip(pdf["k"], pdf["wkb"]):
                x0, y0, x1, y1 = bbox(bytes(b))
                rows.append(
                    (int(k), round(x0, 3), round(y0, 3),
                     round(x1, 3), round(y1, 3))
                )
            yield pd.DataFrame(rows, columns=[f.name for f in osch.fields])

    return out.mapInPandas(env, osch)


def _reproject_boxes_oracle() -> str:
    c_mx = repr(6378137.0 * 3.141592653589793 / 180.0)
    c_a = repr(3.141592653589793 / 360.0)
    c_b = repr(3.141592653589793 / 180.0)

    def merc_y(lat_sql: str) -> str:
        return f"ln(tan((90.0 + ({lat_sql})) * {c_a})) / {c_b} * {c_mx}"

    return f"""
        WITH b AS (
            SELECT n_nationkey AS k,
                   CAST(-150.0 + (n_nationkey % 5) * 10.0 AS DOUBLE) AS x0,
                   CAST(-60.0 + (n_nationkey // 5) * 20.0 AS DOUBLE) AS y0
            FROM nation
        )
        SELECT k,
               round(x0 * {c_mx}, 3) AS mxmin,
               round({merc_y('y0')}, 3) AS mymin,
               round((x0 + 3) * {c_mx}, 3) AS mxmax,
               round({merc_y('y0 + 2')}, 3) AS mymax
        FROM b
    """


SPARK["vector_reproject_boxes"] = vector_reproject_boxes
ORACLE["vector_reproject_boxes"] = _reproject_boxes_oracle()
