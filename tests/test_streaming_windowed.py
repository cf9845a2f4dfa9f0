"""Watermarked windowed aggregation (streaming/windowed.py): append-mode
finalization, late-within-watermark inclusion, late-beyond-watermark
drop, and state recovery across availableNow runs via the checkpoint.

availableNow semantics: a run processes every staged file, advances the
watermark, and flushes windows finalized by it before terminating — so a
window emits in the run whose data pushes the watermark past its end."""

from __future__ import annotations

import datetime as dt
import uuid


def _t(minute, second=0):
    return dt.datetime(2024, 3, 1, 10, minute, second)


def _write_chunk(spark, path, rows):
    spark.createDataFrame(rows, "ts: timestamp, tile: string").coalesce(1) \
        .write.mode("append").parquet(path)


def _run(spark, src, ckpt, sink):
    from gdal_spark.streaming.windowed import windowed_counts

    stream = spark.readStream.schema("ts timestamp, tile string").parquet(src)
    out = windowed_counts(stream, event_col="ts", keys=("tile",),
                          window_dur="10 minutes", watermark="5 minutes")
    tag = uuid.uuid4().hex

    def write_batch(bdf, batch_id):
        import pyspark.sql.functions as F

        bdf.withColumn("run", F.lit(tag)).write.mode("append").parquet(sink)

    q = (out.writeStream.foreachBatch(write_batch)
         .outputMode("append")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)
    got = spark.read.parquet(sink).filter(f"run = '{tag}'").drop("run")
    return {(r.win_start_s, r.tile): r.n_hits for r in got.collect()}


def test_watermark_finalization_and_late_drop(spark, tmp_path):
    src, ckpt, sink = (str(tmp_path / d) for d in ("in", "ck", "out"))
    base = int(dt.datetime(2024, 3, 1, 10, 0).timestamp())

    # run 1: three hits in [10:00, 10:10) + one at 10:21 -> end-of-run
    # watermark 10:16 finalizes exactly the first window
    _write_chunk(spark, src, [
        (_t(0, 30), "a"), (_t(4), "a"), (_t(9, 59), "a"), (_t(21), "b"),
    ])
    assert _run(spark, src, ckpt, sink) == {(base, "a"): 3}

    # run 2 (state recovered from checkpoint): a LATE event for the
    # finalized window (10:05 < watermark 10:16 -> DROPPED, the window
    # must never re-emit) + 10:40 -> watermark 10:35 finalizes
    # [10:20, 10:30) with its single on-time hit
    _write_chunk(spark, src, [(_t(5), "a"), (_t(40), "c")])
    assert _run(spark, src, ckpt, sink) == {(base + 20 * 60, "b"): 1}

    # run 3: flush event far ahead -> only [10:40, 10:50) remains
    _write_chunk(spark, src, [(dt.datetime(2024, 3, 1, 11, 30), "z")])
    assert _run(spark, src, ckpt, sink) == {(base + 40 * 60, "c"): 1}


def test_late_within_watermark_still_counts(spark, tmp_path):
    src, ckpt, sink = (str(tmp_path / d) for d in ("in", "ck", "out"))
    base = int(dt.datetime(2024, 3, 1, 10, 0).timestamp())

    # run 1: watermark reaches only 10:07 (max 10:12 - 5 min): the
    # [10:00, 10:10) window is still OPEN, nothing finalizes
    _write_chunk(spark, src, [(_t(1), "a"), (_t(12), "b")])
    assert _run(spark, src, ckpt, sink) == {}

    # run 2: 10:08 arrives "late" but AFTER the 10:07 watermark -> it
    # still counts; 10:30 pushes the watermark to 10:25, finalizing both
    # early windows
    _write_chunk(spark, src, [(_t(8), "a"), (_t(30), "b")])
    got = _run(spark, src, ckpt, sink)
    assert got[(base, "a")] == 2          # on-time + late-within-watermark
    assert got[(base + 10 * 60, "b")] == 1
