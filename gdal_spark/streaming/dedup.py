"""Streaming ingest dedup: stateful first-seen-wins over a fingerprint.

The batch dedup family (queries/textops.py exact dedup, similarity.py
near-dup) assumes the corpus is at rest; a training-data INGEST pipeline
sees documents/images arrive continuously and must admit each content
fingerprint exactly once across micro-batches. This is the classic
custom stateful streaming operator: ``applyInPandasWithState`` keyed by
fingerprint, state = cumulative occurrence count, emit-on-first-sight.

Scale shape: state is partitioned by the (high-cardinality, uniform)
fingerprint key across the cluster's state store — no skew, no global
structure; each micro-batch shuffles only its own rows (one shuffle on
the group key, the minimum any keyed-state operator pays). State TTL via
processing-time timeout bounds the store for unbounded streams (dedup
horizon = TTL, the same trade Spark's own dropDuplicatesWithinWatermark
makes with event time).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType([T.StructField("n_seen", T.LongType())])


def dedup_stream(
    stream_df: DataFrame,
    fingerprint_col: str = "fp",
    id_col: str = "doc_id",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming DataFrame -> first occurrence of each fingerprint only.

    Output: (fp, doc_id, n_prior) where n_prior is the number of copies
    already seen when this row was admitted (always 0 for the emitted
    winner; the column documents the contract). Within a micro-batch the
    min id wins (deterministic regardless of shuffle order); across
    batches the state store suppresses re-emission.
    """
    out_schema = T.StructType(
        [
            T.StructField("fp", T.LongType()),
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_prior", T.LongType()),
        ]
    )

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs), ignore_index=True)
        prior = state.get[0] if state.exists else 0
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if prior == 0 and len(batch):
            winner = int(batch[id_col].min())
            yield pd.DataFrame({"fp": [key[0]], "doc_id": [winner], "n_prior": [0]})
        state.update((prior + len(batch),))

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        stream_df.selectExpr(
            f"CAST({fingerprint_col} AS LONG) AS fp", f"CAST({id_col} AS LONG) AS {id_col}"
        )
        .groupBy("fp")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )


def dup_counts_stream(
    stream_df: DataFrame, fingerprint_col: str = "fp"
) -> DataFrame:
    """Running duplicate histogram: (fp, n_seen) updated every batch —
    the streaming twin of the batch dedup_exact group counts (update
    output mode; each batch emits only the fingerprints it touched)."""
    out_schema = T.StructType(
        [T.StructField("fp", T.LongType()), T.StructField("n_seen", T.LongType())]
    )

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n = sum(len(p) for p in pdfs)
        total = (state.get[0] if state.exists else 0) + n
        state.update((total,))
        yield pd.DataFrame({"fp": [key[0]], "n_seen": [total]})

    return (
        stream_df.selectExpr(f"CAST({fingerprint_col} AS LONG) AS fp")
        .groupBy("fp")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
