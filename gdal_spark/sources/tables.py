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


def load_images(spark: SparkSession, source: str) -> DataFrame:
    """Production images-table loader: Iceberg table identifier
    (`catalog.db.images`) or a parquet path. On a cluster the Iceberg
    path gives snapshot-isolation resume (jobs/tile_job.py --resume),
    partition pruning on the `cell` partition transform, and manifests
    as the GTI-tile-index analog (frmts/gti/gdaltileindexdataset.cpp:84);
    this sandbox ships no iceberg-spark-runtime jar, so tests exercise
    the parquet branch and the Iceberg branch is config-only (same
    DataFrame contract either way)."""
    if "/" not in source and source.count(".") >= 1:
        return spark.read.format("iceberg").load(source)
    return spark.read.parquet(source)
