"""Contract queries for the OGR vector format drivers.

ogr2ogr_format_chain pushes a nation-derived feature layer through
EVERY implemented container format in sequence
(GeoJSONSeq -> GeoPackage -> CSV/WKT -> Shapefile) and returns the
attributes + coordinates read back off the final shapefile — the
distributed restatement of chained `ogr2ogr -f ...` conversions
(apps/ogr2ogr_lib.cpp; drivers: ogr/ogrsf_frmts/{geojson,gpkg,csv,shape}).
The DuckDB oracle computes the same rows straight from the source table,
so any format driver corrupting a value, a coordinate, or a row count
fails the hash compare.
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from gdal_spark.sources.tables import load


@pandas_udf(T.StructType([T.StructField("x", T.DoubleType()), T.StructField("y", T.DoubleType())]))
def _point_xy(wkb_col: pd.Series) -> pd.DataFrame:
    from gdal_spark.functions import wkb as W

    xs, ys = [], []
    for b in wkb_col:
        x, y = W.parse(bytes(b))[1]
        xs.append(x)
        ys.append(y)
    return pd.DataFrame({"x": xs, "y": ys})


def ogr2ogr_format_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.sources import vector_formats as VF

    n = load(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    # deterministic point per nation (same closed form as the oracle)
    x = (k % 12).cast("double") * 30.0 - 180.0 + 0.25
    y = (k % 7).cast("double") * 25.0 - 87.5 + 0.125

    @pandas_udf(T.BinaryType())
    def mk_point(xx: pd.Series, yy: pd.Series) -> pd.Series:
        from gdal_spark.functions import wkb as W

        return pd.Series(
            [W.write_point(float(a), float(b)) for a, b in zip(xx, yy)]
        )

    feats = n.select(
        k.alias("fid").cast("long"),
        mk_point(x, y).alias("wkb"),
        F.col("n_name").alias("name"),
        F.col("n_regionkey").cast("long").alias("rkey"),
    )
    root = tempfile.mkdtemp(prefix="ogr2ogr_chain_")
    VF.write_geojson_seq(feats, os.path.join(root, "a_seq"))
    d1 = VF.read_geojson_seq(spark, os.path.join(root, "a_seq"))
    VF.write_gpkg(d1, os.path.join(root, "b.gpkg"), layer="nations")
    d2 = VF.read_gpkg(spark, os.path.join(root, "b.gpkg"))
    VF.write_csv_wkt(d2, os.path.join(root, "c_csv"))
    d3 = VF.read_csv_wkt(spark, os.path.join(root, "c_csv"))
    VF.write_shapefile(d3.orderBy("fid"), os.path.join(root, "d.shp"))
    d4 = VF.read_shapefile(spark, os.path.join(root, "d.shp"))
    xy = _point_xy(F.col("wkb"))
    return d4.select(
        F.col("fid").alias("chain_fid"),  # shapefile FID = record number
        "name",
        "rkey",
        F.round(xy["x"], 4).alias("x"),
        F.round(xy["y"], 4).alias("y"),
    )


_CHAIN_ORACLE = """
    SELECT row_number() OVER (ORDER BY n_nationkey) - 1 AS chain_fid,
           n_name AS name,
           CAST(n_regionkey AS BIGINT) AS rkey,
           round((n_nationkey % 12) * 30.0 - 180.0 + 0.25, 4) AS x,
           round((n_nationkey % 7) * 25.0 - 87.5 + 0.125, 4) AS y
    FROM nation
"""

SPARK = {"ogr2ogr_format_chain": ogr2ogr_format_chain}
ORACLE = {"ogr2ogr_format_chain": _CHAIN_ORACLE}
