"""Oracle-backed COG (Cloud-Optimized GeoTIFF) contract query.

One COG per `nation` row, pixels closed-form in (row, col, key):
v(r, c) = ((r//8)*11 + (c//8)*7 + k*13) % 97 on a 64x64 grid, blocksize
16, average overviews (64 -> 32 -> 16, cogdriver.cpp halving rule).
Values are constant on 8x8 blocks, so both halvings average exactly (no
round ties) and level-L pixel (r, c) equals v(r * 2^L, c * 2^L) — DuckDB
recomputes every per-tile aggregate at every pyramid level.

The scan path is the real distributed one: `scan_cog_tiles` decodes each
tile from its (offset, nbytes) byte range alone — the mapInPandas analog
of ranged GETs against object storage — and `validate_cog` (the layout
rules of autotest/gcore/validate_cloud_optimized_geotiff.py) gates every
image inside the job, so a layout regression fails the driver row, not
just a unit test.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.sources.tables import load

_N = 64
_BS = 16


def _cf_raster(k: int):
    import numpy as np

    r, c = np.meshgrid(np.arange(_N), np.arange(_N), indexing="ij")
    return (((r // 8) * 11 + (c // 8) * 7 + k * 13) % 97).astype(np.uint8)


def cog_tile_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster.cog import scan_cog_tiles, write_cog

    sch = T.StructType(
        [
            T.StructField("image_id", T.StringType()),
            T.StructField("bytes", T.BinaryType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (str(int(k)), write_cog(_cf_raster(int(k)), blocksize=_BS))
                for k in pdf["n_nationkey"]
            ]
            yield pd.DataFrame(rows, columns=["image_id", "bytes"])

    cogs = load(spark, sf_dir, "nation").select("n_nationkey").mapInPandas(gen, sch)
    out = scan_cog_tiles(spark, cogs)
    return out.select(
        F.col("image_id").cast("long").alias("k"),
        "level",
        "ty",
        "tx",
        "tsum",
        "tmin",
        "tmax",
    )


_COG_ORACLE = f"""
    WITH lv(level, step) AS (VALUES (0, 1), (1, 2), (2, 4)),
    px AS (
        SELECT n.n_nationkey AS k, lv.level,
               r.range AS r, c.range AS c,
               ((r.range * lv.step // 8) * 11 + (c.range * lv.step // 8) * 7
                + n.n_nationkey * 13) % 97 AS v
        FROM nation n
        CROSS JOIN lv
        CROSS JOIN range({_N}) r
        CROSS JOIN range({_N}) c
        WHERE r.range < {_N} // lv.step AND c.range < {_N} // lv.step
    )
    SELECT k, CAST(level AS INT) AS level,
           CAST(r // {_BS} AS INT) AS ty, CAST(c // {_BS} AS INT) AS tx,
           CAST(SUM(v) AS BIGINT) AS tsum,
           CAST(MIN(v) AS INT) AS tmin, CAST(MAX(v) AS INT) AS tmax
    FROM px
    GROUP BY k, level, r // {_BS}, c // {_BS}
"""


SPARK = {"cog_tile_scan": cog_tile_scan}
ORACLE = {"cog_tile_scan": _COG_ORACLE}
