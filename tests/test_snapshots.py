"""Snapshot-manifest tables (the Iceberg checkpoint-resume contract over
parquet): append lineage, time travel, rollback, overwrite, and the key
correctness property — uncommitted data files are invisible."""

import os

import pytest
from pyspark.sql import functions as F

from gdal_spark.sources.snapshots import SnapshotTable


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id"), (F.col("id") * 2).alias("v"))


def test_append_time_travel_rollback(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    s1 = t.commit(_df(spark, 0, 10))
    s2 = t.commit(_df(spark, 10, 15))
    assert (s1, s2) == (1, 2)
    assert t.read(spark).count() == 15
    # time travel pins the historical snapshot
    assert t.read(spark, snapshot_id=s1).count() == 10
    # history carries lineage + summaries
    snaps = t.snapshots()
    assert [s["snapshot_id"] for s in snaps] == [1, 2]
    assert snaps[1]["parent_snapshot_id"] == 1
    assert snaps[1]["summary"]["total-data-files"] >= snaps[1]["summary"][
        "added-data-files"
    ]
    # rollback flips the hint without touching data
    t.rollback(s1)
    assert t.read(spark).count() == 10
    assert t.read(spark, snapshot_id=s2).count() == 15
    with pytest.raises(ValueError):
        t.rollback(99)


def test_overwrite_replaces_file_set(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_df(spark, 0, 10))
    t.commit(_df(spark, 100, 103), operation="overwrite")
    got = sorted(r.id for r in t.read(spark).collect())
    assert got == [100, 101, 102]


def test_uncommitted_files_invisible(spark, tmp_path):
    """The Iceberg resume-safety property: a crashed writer's parquet
    files are not referenced by any manifest, so readers never see
    them."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_df(spark, 0, 5))
    # simulate a crashed job: data files written, no commit
    orphan = os.path.join(t.data_dir, "crashed-attempt")
    _df(spark, 1000, 1010).write.parquet(orphan)
    assert t.read(spark).count() == 5
    # and a later commit still excludes the orphans
    t.commit(_df(spark, 5, 8))
    assert t.read(spark).count() == 8
    ids = {r.id for r in t.read(spark).collect()}
    assert not any(i >= 1000 for i in ids)


def test_empty_table_raises(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    with pytest.raises(ValueError, match="no committed snapshot"):
        t.read(spark)


def test_tile_job_snapshot_resume(spark, tmp_path):
    """The tile pipeline's snapshot sink: each level commit is a
    snapshot; resume reads only committed tiles, orphans invisible."""
    from gdal_spark.tiles import pipeline as P

    store = str(tmp_path / "tiles")
    t1 = spark.createDataFrame(
        [(8, 1, 2, bytearray(b"x"))], "tz int, tx int, ty int, data binary"
    )
    t2 = spark.createDataFrame(
        [(7, 0, 1, bytearray(b"y"))], "tz int, tx int, ty int, data binary"
    )
    assert P.snapshot_read_tiles(spark, store) is None
    P.snapshot_write_tiles(t1, store)
    P.snapshot_write_tiles(t2, store)
    got = P.snapshot_read_tiles(spark, store)
    assert got.count() == 2 and "ms" in got.columns
    # crashed-writer orphan never surfaces in the resume source
    t1.write.parquet(str(tmp_path / "tiles" / "data" / "orphan"))
    assert P.snapshot_read_tiles(spark, store).count() == 2
