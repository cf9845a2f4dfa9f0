"""Oracle-backed contract query for the gdal_retile operator.

``retile_pyramid`` drives the REAL distributed pipeline: four
closed-form 16x16 tiles are TIFF-encoded, shipped through
``retile_tiles`` (bbox->tile broadcast join, groupBy(tile) paint, one
explode->paint->GWK-resample stage per pyramid level), decoded and
exploded to pixels. Resampling is "near", whose GWK semantics are the
center-source-pixel pick ``src[int(x + 1e-10)]`` — at an exact 2x
pyramid step that is odd-pixel decimation (alg/gdalwarpkernel.cpp
GWKCheckAndComputeSrcOffsets:5346), so DuckDB can state every output
pixel closed-form:

  * level 0 (ps 16 on the 32x32 mosaic) = the four input tiles;
  * level 1 = mosaic[2i+1, 2j+1].
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from gdal_spark.sources.tables import load

_IN_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("gt", T.ArrayType(T.DoubleType())),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
    ]
)

_PX_SCHEMA = T.StructType(
    [
        T.StructField("level", T.IntegerType()),
        T.StructField("tile_row", T.IntegerType()),
        T.StructField("tile_col", T.IntegerType()),
        T.StructField("i", T.IntegerType()),
        T.StructField("j", T.IntegerType()),
        T.StructField("v", T.IntegerType()),
    ]
)


def retile_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster.retile import retile_tiles

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.functions.tiff import tiff_encode

        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                if k >= 4:
                    continue
                ii, jj = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
                arr = ((ii * 7 + jj * 11 + k * 37) % 199).astype(np.uint8)
                gt = [float((k % 2) * 16), 1.0, 0.0, float(-(k // 2) * 16), 0.0, -1.0]
                rows.append((f"k{k}", k, tiff_encode(arr), "tiff", gt, 16, 16))
            yield pd.DataFrame(rows, columns=[f.name for f in _IN_SCHEMA.fields])

    tiles = (
        load(spark, sf_dir, "nation").select("n_nationkey").mapInPandas(gen, _IN_SCHEMA)
    )
    out = retile_tiles(tiles, ps=(16, 16), levels=1, resampling="near")

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.functions import codecs

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(bytes(r.bytes), "tiff")
                if arr.ndim == 3:
                    arr = arr[:, :, 0]
                for i in range(arr.shape[0]):
                    for j in range(arr.shape[1]):
                        rows.append(
                            (int(r.level), int(r.tile_row), int(r.tile_col),
                             i, j, int(arr[i, j]))
                        )
            yield pd.DataFrame(rows, columns=[f.name for f in _PX_SCHEMA.fields])

    return out.mapInPandas(explode, _PX_SCHEMA)


_RETILE_ORACLE = """
    WITH mosaic AS (
        SELECT i.range AS gi, j.range AS gj,
               ((i.range % 16) * 7 + (j.range % 16) * 11
                + ((i.range // 16) * 2 + (j.range // 16)) * 37) % 199 AS v
        FROM range(32) i CROSS JOIN range(32) j
    ),
    lvl0 AS (
        SELECT 0 AS level,
               CAST(gi // 16 + 1 AS INT) AS tile_row,
               CAST(gj // 16 + 1 AS INT) AS tile_col,
               CAST(gi % 16 AS INT) AS i, CAST(gj % 16 AS INT) AS j,
               CAST(v AS INT) AS v
        FROM mosaic
    ),
    lvl1 AS (
        SELECT 1 AS level, 1 AS tile_row, 1 AS tile_col,
               CAST(m.gi // 2 AS INT) AS i, CAST(m.gj // 2 AS INT) AS j,
               CAST(m.v AS INT) AS v
        FROM mosaic m
        WHERE m.gi % 2 = 1 AND m.gj % 2 = 1
    )
    SELECT * FROM lvl0 UNION ALL SELECT * FROM lvl1
"""

SPARK = {"retile_pyramid": retile_pyramid}
ORACLE = {"retile_pyramid": _RETILE_ORACLE}
