"""Driver-contract entries for the layer-algebra operators (§2.3).

Rows-only (geometry kernels are not SQL-expressible in DuckDB without a
spatial extension); exact semantics are pytest-verified against
raster-mask oracles in tests/test_layer_algebra.py. The partition entry
additionally exposes the area identity erase+clip == area(A) as data the
driver can see is ~0."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark import datagen
from gdal_spark.functions import wkb as W
from gdal_spark.operators import layer_algebra as LA

NA, NB = 12, 10


def _b_layer(spark: SparkSession) -> DataFrame:
    """Method layer: A's polygons shifted by 0.35/0.25 of their bbox."""
    import numpy as np

    pdf = datagen.polygons_pdf(NB)
    rows = []
    for r in pdf.itertuples(index=False):
        rings = W.polygon_rings(bytes(r.wkb))[0]
        dx = (r.xmax - r.xmin) * 0.35
        dy = (r.ymax - r.ymin) * 0.25
        moved = [rr + np.array([dx, dy]) for rr in rings]
        rows.append(
            (r.poly_id, bytearray(W.write_polygon(moved)),
             r.xmin + dx, r.ymin + dy, r.xmax + dx, r.ymax + dy)
        )
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["poly_id", "wkb", "xmin", "ymin", "xmax", "ymax"])
    )


def _a_layer(spark: SparkSession) -> DataFrame:
    return datagen.polygons_df(spark, NA).select(
        "poly_id", "wkb", "xmin", "ymin", "xmax", "ymax"
    )


def layer_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        LA.intersection(_a_layer(spark), _b_layer(spark), res=5)
        .select("a_id", "b_id", F.round("area", 9).alias("area"))
        .orderBy("a_id", "b_id")
    )


def layer_erase_clip_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """erase ∪ clip partitions each A feature: residual must be ~0."""
    a = _a_layer(spark)
    b = _b_layer(spark)
    er = LA.erase(a, b, res=5).select("a_id", F.col("area").alias("erase_area"))
    cl = LA.clip(a, b, res=5).select("a_id", F.col("area").alias("clip_area"))

    @F.pandas_udf(T.DoubleType())
    def wkb_area(col: pd.Series) -> pd.Series:
        from gdal_spark.functions import geom as G

        return col.map(lambda buf: G.wkb_area(bytes(buf)))

    base = a.select(F.col("poly_id").alias("a_id"), wkb_area(F.col("wkb")).alias("a_area"))
    out = (
        base.join(er, on="a_id", how="left")
        .join(cl, on="a_id", how="left")
        .fillna(0.0, subset=["erase_area", "clip_area"])
    )
    return out.select(
        "a_id",
        F.round("a_area", 6).alias("a_area"),
        F.round(F.col("erase_area") + F.col("clip_area") - F.col("a_area"), 6).alias("residual"),
    ).orderBy("a_id")


def layer_union_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    un = LA.union_layers(_a_layer(spark), _b_layer(spark), res=5)
    return un.select(
        F.when(F.col("a_id").isNotNull() & F.col("b_id").isNotNull(), "intersection")
        .when(F.col("a_id").isNotNull(), "a_remainder")
        .otherwise("b_remainder")
        .alias("kind")
    ).groupBy("kind").agg(F.count(F.lit(1)).alias("n")).orderBy("kind")


SPARK = {
    "layer_intersection": layer_intersection,
    "layer_erase_clip_partition": layer_erase_clip_partition,
    "layer_union_counts": layer_union_counts,
}

ORACLE: dict[str, str] = {}


def st_sql_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ST_ catalog driven through spark.sql (SQLite-dialect parity,
    ogrsqlitesqlfunctions.cpp): per-polygon area/centroid/validity plus a
    mercator round-trip distance check."""
    from gdal_spark.functions import st_catalog as ST

    ST.register_all(spark)
    datagen.polygons_df(spark, NA).createOrReplaceTempView("st_polys_q")
    return spark.sql(
        """
        select poly_id,
               round(ST_Area(wkb), 9) as st_area,
               ST_IsValid(wkb) as valid,
               ST_Within(ST_Centroid(wkb), ST_Envelope(wkb)) as centroid_in_env,
               round(ST_X(ST_Centroid(wkb)), 6) as cx,
               round(ST_Distance(
                   ST_Transform(ST_Transform(ST_Centroid(wkb), 4326, 3857), 3857, 4326),
                   ST_Centroid(wkb)), 9) as rt_err
        from st_polys_q order by poly_id
        """
    )


SPARK["st_sql_functions"] = st_sql_functions
