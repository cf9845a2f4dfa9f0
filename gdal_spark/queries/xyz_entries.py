"""Oracle-backed contract queries for gdal2xyz and gdal_edit.

``gdal2xyz_points`` drives the distributed exporter end-to-end: four
closed-form 8x8 tiles are TIFF-encoded, decoded by raster_to_xyz, and
exploded to (geo_x, geo_y, b1) rows with src_nodata=5 skipped —
pixel-center affine coords and the all-bands nodata-skip rule
(osgeo_utils/gdal2xyz.py:188-197) are both SQL-expressible.

``gdal_edit_ullr`` pins the -a_ullr geotransform fit (gdal_edit.py) as
pure Column math over per-image raster sizes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.sources.tables import load

_IN_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("gt", T.ArrayType(T.DoubleType())),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
    ]
)


def _tiles(spark: SparkSession, sf_dir: str):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.functions.tiff import tiff_encode

        for pdf in batches:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                if k >= 4:
                    continue
                ii, jj = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
                arr = ((ii * 7 + jj * 11 + k * 5) % 199).astype(np.uint8)
                gt = [float(k * 80), 10.0, 0.0, float(-k * 80), 0.0, -10.0]
                rows.append((f"k{k}", tiff_encode(arr), "tiff", gt, 8, 8))
            yield pd.DataFrame(rows, columns=[f.name for f in _IN_SCHEMA.fields])

    return (
        load(spark, sf_dir, "nation").select("n_nationkey").mapInPandas(gen, _IN_SCHEMA)
    )


def gdal2xyz_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster.xyz import raster_to_xyz

    return raster_to_xyz(_tiles(spark, sf_dir), src_nodata=5, skip_nodata=True)


_XYZ_ORACLE = """
    WITH px AS (
        SELECT 'k' || CAST(k.range AS VARCHAR) AS image_id,
               k.range * 80 + (j.range + 0.5) * 10.0 AS geo_x,
               -k.range * 80 - (i.range + 0.5) * 10.0 AS geo_y,
               CAST((i.range * 7 + j.range * 11 + k.range * 5) % 199 AS DOUBLE) AS b1
        FROM range(4) k CROSS JOIN range(8) i CROSS JOIN range(8) j
    )
    SELECT image_id, geo_x, geo_y, b1 FROM px WHERE b1 <> 5
"""


def gdal_edit_ullr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.raster.move import edit_images

    edited = edit_images(_tiles(spark, sf_dir), a_ullr=(2, 50, 3, 49), a_nodata=123)
    return edited.select(
        "image_id",
        F.round(F.col("gt")[0], 6).alias("ulx"),
        F.round(F.col("gt")[1], 6).alias("px"),
        F.round(F.col("gt")[3], 6).alias("uly"),
        F.round(F.col("gt")[5], 6).alias("py"),
        F.col("nodata").alias("nodata"),
    )


_EDIT_ORACLE = """
    SELECT 'k' || CAST(k.range AS VARCHAR) AS image_id,
           2.0 AS ulx, ROUND(1.0 / 8, 6) AS px,
           50.0 AS uly, ROUND(-1.0 / 8, 6) AS py,
           123.0 AS nodata
    FROM range(4) k
"""

SPARK = {"gdal2xyz_points": gdal2xyz_points, "gdal_edit_ullr": gdal_edit_ullr}
ORACLE = {"gdal2xyz_points": _XYZ_ORACLE, "gdal_edit_ullr": _EDIT_ORACLE}
