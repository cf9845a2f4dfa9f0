"""Oracle-backed GeoParquet contract query.

Closed-form boxes derived from `nation` (box k spans x in
[-100 + (k%5)*3, +1], y in [10 + (k//5)*2, +1]) go through the FULL
sink/scan cycle: WKB encode -> `write_geoparquet` (bbox covering struct,
``geo`` footer metadata, Hilbert clustering, one parquet file per
partition) -> `read_geoparquet` with a query window (driver file pruning
on footer bboxes + Catalyst bbox-statistics pushdown) -> surviving rows.
DuckDB recomputes the envelope-intersects set from the closed form, so a
regression anywhere in the writer, metadata, pruning, or filter
semantics flips the driver's hash row.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.sources.tables import load

_WIN = (-98.5, 10.5, -90.5, 15.5)  # query window (x0, y0, x1, y1): 9 of 25 boxes


def geoparquet_bbox_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.sources.geoparquet import read_geoparquet, write_geoparquet

    sch = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("wkb", T.BinaryType())]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.functions.wkb import write_polygon

        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                x0, y0 = -100.0 + (k % 5) * 3.0, 10.0 + (k // 5) * 2.0
                ring = np.array(
                    [[x0, y0], [x0 + 1, y0], [x0 + 1, y0 + 1], [x0, y0 + 1],
                     [x0, y0]],
                    dtype=np.float64,
                )
                rows.append((k, write_polygon([ring])))
            yield pd.DataFrame(rows, columns=["k", "wkb"])

    boxes = load(spark, sf_dir, "nation").select("n_nationkey").mapInPandas(gen, sch)
    path = tempfile.mkdtemp(prefix="gpq_contract_")
    write_geoparquet(boxes, path, wkb_col="wkb", num_files=4)
    out = read_geoparquet(spark, path, bbox=_WIN).select(
        "k",
        F.col("bbox.xmin").alias("bxmin"),
        F.col("bbox.ymin").alias("bymin"),
        F.col("bbox.xmax").alias("bxmax"),
        F.col("bbox.ymax").alias("bymax"),
    )
    return out


_GPQ_ORACLE = f"""
    WITH b AS (
        SELECT n_nationkey AS k,
               -100.0 + (n_nationkey % 5) * 3.0 AS bxmin,
               10.0 + (n_nationkey // 5) * 2.0 AS bymin,
               -99.0 + (n_nationkey % 5) * 3.0 AS bxmax,
               11.0 + (n_nationkey // 5) * 2.0 AS bymax
        FROM nation
    )
    SELECT k, bxmin, bymin, bxmax, bymax FROM b
    WHERE bxmin <= {_WIN[2]} AND bxmax >= {_WIN[0]}
      AND bymin <= {_WIN[3]} AND bymax >= {_WIN[1]}
"""


SPARK = {"geoparquet_bbox_scan": geoparquet_bbox_scan}
ORACLE = {"geoparquet_bbox_scan": _GPQ_ORACLE}
