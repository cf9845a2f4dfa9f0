"""Stateful streaming dedup (streaming/dedup.py): first-seen-wins across
micro-batches with checkpointed state, and the running dup histogram."""

from __future__ import annotations

import os

import pytest


def _write_chunk(spark, path, rows):
    spark.createDataFrame(rows, "doc_id: long, fp: long").coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _run_available(spark, src, ckpt, sink, builder, mode="append"):
    """Run one availableNow pass with a recoverable foreachBatch->parquet
    sink; returns rows appended by THIS run (batch outputs are tagged)."""
    import uuid

    stream = spark.readStream.schema("doc_id long, fp long").parquet(src)
    out = builder(stream)
    run_tag = uuid.uuid4().hex

    def write_batch(bdf, batch_id):
        import pyspark.sql.functions as F

        bdf.withColumn("run", F.lit(run_tag)).write.mode("append").parquet(sink)

    q = (
        out.writeStream.foreachBatch(write_batch)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(sink).filter(f"run = '{run_tag}'").drop("run")


def test_dedup_within_and_across_batches(spark, tmp_path):
    from gdal_spark.streaming.dedup import dedup_stream

    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    # batch 1: fp 10 duplicated in-batch (doc 7 vs 3 -> min id 3 wins)
    _write_chunk(spark, src, [(3, 10), (7, 10), (5, 20)])
    sink = str(tmp_path / "out")
    got = _run_available(spark, src, ckpt, sink, dedup_stream).collect()
    res = {r["fp"]: (r["doc_id"], r["n_prior"]) for r in got}
    assert res == {10: (3, 0), 20: (5, 0)}

    # batch 2 (same checkpoint -> state survives): fp 10 again + new fp 30
    _write_chunk(spark, src, [(9, 10), (11, 30)])
    got2 = _run_available(spark, src, ckpt, sink, dedup_stream).collect()
    res2 = {r["fp"]: (r["doc_id"], r["n_prior"]) for r in got2}
    assert res2 == {30: (11, 0)}  # fp 10 suppressed by state


def test_dup_counts_accumulate(spark, tmp_path):
    from gdal_spark.streaming.dedup import dup_counts_stream

    src = str(tmp_path / "in2")
    ckpt = str(tmp_path / "ck2")
    _write_chunk(spark, src, [(1, 100), (2, 100), (3, 200)])
    sink = str(tmp_path / "out2")
    got = _run_available(spark, src, ckpt, sink, dup_counts_stream, mode="update").collect()
    assert {r["fp"]: r["n_seen"] for r in got} == {100: 2, 200: 1}

    _write_chunk(spark, src, [(4, 100), (5, 300)])
    got2 = _run_available(spark, src, ckpt, sink, dup_counts_stream, mode="update").collect()
    # update mode: only touched fps re-emitted, with cumulative totals
    assert {r["fp"]: r["n_seen"] for r in got2} == {100: 3, 300: 1}


def test_dedup_over_documents_fingerprints(spark, tmp_path):
    """End-to-end with the real corpus: stream the documents table's
    64-bit content fingerprints (textops text_fingerprint) in two halves;
    cross-half duplicates must be admitted exactly once."""
    import pyspark.sql.functions as F

    from gdal_spark.queries.textops import fingerprint as text_fingerprint
    from gdal_spark.streaming.dedup import dedup_stream

    sf = "/root/testdata/sf0.001"
    fps = text_fingerprint(spark, sf).select(
        F.col("doc_id").cast("long"), F.col("fp")
    )
    pdf = fps.toPandas()
    n_unique = pdf["fp"].nunique()
    half = len(pdf) // 2
    src = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ck3")
    _write_chunk(spark, src, list(map(tuple, pdf.iloc[:half].itertuples(index=False))))
    sink = str(tmp_path / "out3")
    a = _run_available(spark, src, ckpt, sink, dedup_stream).count()
    _write_chunk(spark, src, list(map(tuple, pdf.iloc[half:].itertuples(index=False))))
    b = _run_available(spark, src, ckpt, sink, dedup_stream).count()
    assert a + b == n_unique
