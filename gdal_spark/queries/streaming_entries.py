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
