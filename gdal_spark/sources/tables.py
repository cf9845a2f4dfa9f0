"""Loaders for the driver-provided parquet tables.

GDAL's GDALOpenEx probes ~190 drivers (gcore/gdaldataset.cpp:4045); here
every source is parquet/Iceberg and Catalyst handles pushdown — the only
"driver" logic left is the image-codec registry (functions/codecs.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES if os.path.exists(os.path.join(sf_dir, f"{t}.parquet"))}
