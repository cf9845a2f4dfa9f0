"""Hive-partitioned dataset writes — `gdal vector partition` semantics
(apps/gdalalg_vector_partition.cpp:31,92-119): hive scheme key=value
directories, NULL partition key -> __HIVE_DEFAULT_PARTITION__, round-trip
read equality. Also the tile-sink layout (partitionBy tz/tx,
gdal2tiles z/x/y addressing)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def test_hive_partition_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, None, 30.0), (4, "a", 40.0)],
        "fid: long, grp: string, v: double",
    )
    out = str(tmp_path / "part")
    df.write.partitionBy("grp").mode("overwrite").parquet(out)

    dirs = {d for d in os.listdir(out) if d.startswith("grp=")}
    assert "grp=a" in dirs and "grp=b" in dirs
    # NULL partition marker — identical to gdal vector partition's
    assert "grp=__HIVE_DEFAULT_PARTITION__" in dirs

    back = spark.read.parquet(out)
    got = {(r.fid, r.grp, r.v) for r in back.collect()}
    assert got == {(1, "a", 10.0), (2, "b", 20.0), (3, None, 30.0), (4, "a", 40.0)}


def test_partition_pruning_in_plan(spark, tmp_path):
    """A filter on the partition key must prune at scan time
    (PartitionFilters), not post-scan — the Iceberg/GTI tile-index
    pruning analog readable straight from the physical plan."""
    df = spark.range(100).withColumn("bucket", F.col("id") % 4)
    out = str(tmp_path / "pruned")
    df.write.partitionBy("bucket").mode("overwrite").parquet(out)

    q = spark.read.parquet(out).filter(F.col("bucket") == 2)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(bucket" in plan or "bucket#" in plan
    assert q.count() == 25


def test_tile_sink_layout(spark, tmp_path):
    """Tile rows written partitionBy(tz, tx) — the z/x/y.png layout of
    gdal2tiles (gdal2tiles.py:1278) as a columnar dataset."""
    rows = [(8, tx, ty, bytes([tx, ty])) for tx in range(2) for ty in range(3)]
    df = spark.createDataFrame(rows, "tz: int, tx: int, ty: int, png: binary")
    out = str(tmp_path / "tiles")
    df.write.partitionBy("tz", "tx").mode("overwrite").parquet(out)
    assert os.path.isdir(os.path.join(out, "tz=8", "tx=1"))
    back = spark.read.parquet(out)
    assert back.count() == 6
    assert {r.ty for r in back.filter("tx = 0").collect()} == {0, 1, 2}
