"""Oracle-backed contract queries for the gdal_calc operator.

``raster_calc_expr`` drives the REAL distributed pipeline — closed-form
tiles are TIFF-encoded, shipped through ``calc_tiles`` (decode ->
whitelisted numpy eval on native dtypes -> nodata propagation ->
write-cast -> re-encode), decoded again and exploded to pixels — so
DuckDB hash-checks the whole codec + eval + nodata path:

  * band 1: ``A*2 + B`` on uint8 = wraparound mod 256
    (gdal_calc.py native-dtype eval, autotest test_gdal_calc_py_2a)
  * band 2: ``numpy.maximum(A, B)`` (the numpy.<fn> namespace the
    reference autotest exercises via numpy.max)
  * cells where A == 5 (A's declared input NDV) get output NDV 200 in
    BOTH bands (gdal_calc.py:614,634 logical-or mask + arithmetic
    propagation).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from gdal_spark.sources.tables import load

_N = 16


def _mod_raster(k: int, n: int = _N) -> np.ndarray:
    r, c = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    return ((r * 37 + c * 101 + k * 13) % 97).astype(np.uint8)


_PX_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("i", T.IntegerType()),
        T.StructField("j", T.IntegerType()),
        T.StructField("v", T.IntegerType()),
    ]
)


def raster_calc_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster.calc import calc_tiles

    sch = T.StructType(
        [
            T.StructField("image_id", T.StringType()),
            T.StructField("a_bytes", T.BinaryType()),
            T.StructField("b_bytes", T.BinaryType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.functions.tiff import tiff_encode

        for pdf in batches:
            rows = [
                (
                    f"k{int(k)}",
                    tiff_encode(_mod_raster(int(k))),
                    tiff_encode(_mod_raster(int(k) + 5)),
                )
                for k in pdf["n_nationkey"]
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in sch.fields])

    tiles = (
        load(spark, sf_dir, "nation")
        .select("n_nationkey")
        .mapInPandas(gen, sch)
    )
    out = calc_tiles(
        tiles,
        ["A*2 + B", "numpy.maximum(A, B)"],
        letters={"A": "a_bytes", "B": "b_bytes"},
        nodata={"A": 5},
        nodata_value=200,
    )

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.functions import codecs

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                k = int(r.image_id[1:])
                for b in range(arr.shape[2]):
                    band = arr[:, :, b]
                    for i in range(band.shape[0]):
                        for j in range(band.shape[1]):
                            rows.append((k, b, i, j, int(band[i, j])))
            yield pd.DataFrame(rows, columns=[f.name for f in _PX_SCHEMA.fields])

    return out.mapInPandas(explode, _PX_SCHEMA)


_CALC_ORACLE = f"""
    WITH idx AS (
        SELECT i.range AS i, j.range AS j
        FROM range({_N}) i CROSS JOIN range({_N}) j
    ),
    px AS (
        SELECT n_nationkey AS k, i, j,
               (i*37 + j*101 + n_nationkey*13) % 97 AS a,
               (i*37 + j*101 + (n_nationkey+5)*13) % 97 AS b
        FROM nation CROSS JOIN idx
    )
    SELECT k, CAST(band.range AS INT) AS band,
           CAST(i AS INT) AS i, CAST(j AS INT) AS j,
           CAST(CASE
                WHEN a = 5 THEN 200
                WHEN band.range = 0 THEN (2*a + b) % 256
                ELSE GREATEST(a, b)
           END AS INT) AS v
    FROM px CROSS JOIN range(2) band
"""

def raster_merge_mosaic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gdal_merge paint-order mosaic through the distributed
    merge_tiles painter (gdal_merge.py copy_into window math): image k
    is a constant-(k+10) 16x16 tile at grid slot (k//5, k%5) with 12-px
    spacing, so tiles OVERLAP by 4 px and the reference's
    later-file-overwrites rule decides every contested pixel — each
    output pixel holds max(covering k) + 10. The pipeline ships
    TIFF-encoded tiles through the bbox->tile pruning join and the
    groupBy(tile) paint, then explodes pixels for the hash compare."""
    from gdal_spark.raster.merge import merge_tiles

    sch = T.StructType(
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

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.functions.tiff import tiff_encode

        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                arr = np.full((16, 16), k + 10, np.uint8)
                gt = [float((k % 5) * 12), 1.0, 0.0, float(-(k // 5) * 12), 0.0, -1.0]
                rows.append((f"k{k}", k, tiff_encode(arr), "tiff", gt, 16, 16))
            yield pd.DataFrame(rows, columns=[f.name for f in sch.fields])

    tiles = (
        load(spark, sf_dir, "nation").select("n_nationkey").mapInPandas(gen, sch)
    )
    out = merge_tiles(tiles, tile=32)

    px_sch = T.StructType(
        [
            T.StructField("i", T.IntegerType()),
            T.StructField("j", T.IntegerType()),
            T.StructField("v", T.IntegerType()),
        ]
    )

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.functions import codecs

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(bytes(r.bytes), "tiff")
                band = arr[:, :, 0] if arr.ndim == 3 else arr
                for i in range(r.h):
                    for j in range(r.w):
                        rows.append(
                            (r.tile_y * 32 + i, r.tile_x * 32 + j, int(band[i, j]))
                        )
            yield pd.DataFrame(rows, columns=[f.name for f in px_sch.fields])

    return out.mapInPandas(explode, px_sch)


_MERGE_ORACLE = """
    WITH idx AS (
        SELECT i.range AS i, j.range AS j
        FROM range(64) i CROSS JOIN range(64) j
    )
    SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
           CAST((SELECT MAX(n_nationkey)
                 FROM nation
                 WHERE (n_nationkey % 5) * 12 <= j
                   AND j < (n_nationkey % 5) * 12 + 16
                   AND (n_nationkey // 5) * 12 <= i
                   AND i < (n_nationkey // 5) * 12 + 16) + 10 AS INT) AS v
    FROM idx
"""

SPARK = {
    "raster_calc_expr": raster_calc_expr,
    "raster_merge_mosaic": raster_merge_mosaic,
}
ORACLE = {
    "raster_calc_expr": _CALC_ORACLE,
    "raster_merge_mosaic": _MERGE_ORACLE,
}
