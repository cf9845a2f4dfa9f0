"""Contract query for the stateful streaming dedup operator.

streaming_dedup_firstseen runs a REAL Structured Streaming job inside
the contract call: the documents table's content fingerprints are staged
as two arrival chunks (ascending doc_id), consumed by two availableNow
passes of the applyInPandasWithState dedup operator over one shared
checkpoint — so the second pass genuinely recovers first-pass state from
disk. Because arrivals are id-ordered, first-seen-wins must equal the
batch answer min(doc_id) per fingerprint, which is exactly what the
DuckDB oracle computes: the streaming operator is held to batch-
equivalence, the strongest correctness statement a streaming dedup can
make (streaming/dedup.py).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gdal_spark.queries.textops import fingerprint


def streaming_dedup_firstseen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.streaming.dedup import dedup_stream

    fps = fingerprint(spark, sf_dir).select(
        F.col("doc_id").cast("long"), F.col("fp")
    )
    mid = fps.agg(F.expr("percentile_approx(doc_id, 0.5)")).collect()[0][0]
    root = tempfile.mkdtemp(prefix="stream_dedup_")
    src, ckpt, sink = (os.path.join(root, d) for d in ("in", "ck", "out"))
    for i, chunk in enumerate(
        (fps.filter(F.col("doc_id") <= mid), fps.filter(F.col("doc_id") > mid))
    ):
        chunk.write.mode("append").parquet(src)
        stream = spark.readStream.schema("doc_id long, fp long").parquet(src)

        def write_batch(bdf, batch_id):
            bdf.write.mode("append").parquet(sink)

        q = (
            dedup_stream(stream)
            .writeStream.foreachBatch(write_batch)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    return spark.read.parquet(sink).select("fp", "doc_id")


_ORACLE = r"""
    SELECT ('0x' || substring(md5(lower(regexp_replace(text, '\s+', ' ', 'g'))), 1, 15))::BIGINT AS fp,
           min(doc_id) AS doc_id
    FROM documents
    GROUP BY fp
"""

SPARK = {"streaming_dedup_firstseen": streaming_dedup_firstseen}
ORACLE = {"streaming_dedup_firstseen": _ORACLE}


def streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked event-time windowed aggregation held to
    batch-equivalence: the events table streams in two id-ordered arrival
    chunks through `streaming.windowed.windowed_counts` (10-minute
    tumbling windows keyed by event_type, 5-minute watermark, append
    mode), then a sentinel event one hour past the horizon flushes every
    real window. The finalized streamed counts must equal the batch
    group-by, which the DuckDB oracle recomputes with epoch-aligned
    10-minute buckets."""
    from gdal_spark.sources.tables import load
    from gdal_spark.streaming.windowed import windowed_counts

    ev = load(spark, sf_dir, "events").select(
        F.col("event_id").cast("long"),
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
    )
    mid = ev.agg(F.expr("percentile_approx(event_id, 0.5)")).collect()[0][0]
    horizon = ev.agg(F.max("ts")).collect()[0][0]
    root = tempfile.mkdtemp(prefix="stream_win_")
    src, ckpt, sink = (os.path.join(root, d) for d in ("in", "ck", "out"))

    import datetime as dt

    sentinel = [(int(-1), horizon + dt.timedelta(hours=1), "__flush__")]
    chunks = (
        ev.filter(F.col("event_id") <= mid).drop("event_id"),
        ev.filter(F.col("event_id") > mid).drop("event_id"),
        spark.createDataFrame(
            sentinel, "event_id long, ts timestamp, event_type string"
        ).drop("event_id"),
    )
    for chunk in chunks:
        # one file per arrival chunk: the file source batches files in
        # listing order, so multi-file chunks could advance the watermark
        # on a later file and then drop an earlier file's events
        chunk.coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema("ts timestamp, event_type string").parquet(src)

        def write_batch(bdf, batch_id):
            bdf.write.mode("append").parquet(sink)

        q = (
            windowed_counts(stream, event_col="ts", keys=("event_type",),
                            window_dur="10 minutes", watermark="5 minutes")
            .writeStream.foreachBatch(write_batch)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    return (
        spark.read.parquet(sink)
        .filter(F.col("event_type") != "__flush__")
        .select("win_start_s", "event_type",
                F.col("n_hits").cast("long").alias("n_hits"))
    )


_WIN_ORACLE = """
    SELECT 600 * (floor(epoch(ts))::BIGINT // 600) AS win_start_s,
           event_type, CAST(COUNT(*) AS BIGINT) AS n_hits
    FROM events
    GROUP BY 1, 2
"""

SPARK["streaming_windowed_counts"] = streaming_windowed_counts
ORACLE["streaming_windowed_counts"] = _WIN_ORACLE
