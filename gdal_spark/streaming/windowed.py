"""Event-time windowed aggregation with watermarked late-data handling.

The streaming leg the tile-refresh extension lacked: tumbling (or
sliding) event-time windows over an event stream, keyed by arbitrary
columns, with a watermark bounding how late an event may arrive —
`withWatermark` + `window()` in append mode, so a window row is emitted
exactly once, when the watermark passes its end and it can no longer
change. Events older than the watermark are DROPPED by the engine (the
documented contract of watermarked aggregation): a finalized tile-count
window never retro-changes, which is what makes the downstream tile
refresh idempotent.

Batch-equivalence: on the same finalized horizon the streamed output
must equal the batch group-by — the contract query holds it to a DuckDB
recomputation (same discipline as streaming/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    stream: DataFrame,
    event_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    window_dur: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "5 minutes",
) -> DataFrame:
    """stream -> (win_start_s, win_end_s, *keys, n_hits) in append mode.

    Window starts are epoch-aligned (Spark `window()` convention), and
    emitted as epoch SECONDS so the result is engine-portable."""
    win = (
        F.window(F.col(event_col), window_dur, slide)
        if slide
        else F.window(F.col(event_col), window_dur)
    )
    return (
        stream.withWatermark(event_col, watermark)
        .groupBy(win.alias("win"), *keys)
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .select(
            F.unix_timestamp("win.start").alias("win_start_s"),
            F.unix_timestamp("win.end").alias("win_end_s"),
            *keys,
            "n_hits",
        )
    )
