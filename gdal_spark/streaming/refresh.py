"""Incremental tile refresh: readStream on image arrivals -> foreachBatch
tile upsert.

Each micro-batch: decode/warp ONLY the new images (the same narrow patch
stage as the batch pipeline), pull the currently-stored versions of just
the affected tiles, repaint them with the new patches on top (painter's
order preserved: the stored tile is the base layer, batch images paint
over it in image_id order — identical to what a full batch re-run would
produce when ids arrive in order), and write the new tile versions.

The store is append-only parquet with a monotonically increasing
`version` column; `read_latest_tiles` resolves latest-wins per key —
merge-on-read. On a real cluster the store is an Iceberg table and the
foreachBatch body becomes a single MERGE INTO (snapshot = checkpoint);
the Spark-side dataflow is identical.

No watermarks/event-time: tile refresh is keyed upsert, order-insensitive
across tiles; within a tile, version order decides (processing time) —
matching the reference's last-writer-wins file semantics in gdal2tiles
--resume reruns.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from gdal_spark.tiles import pipeline as P

BASE_MARKER = "\x00stored"  # sorts before any image_id -> painted first


def read_latest_tiles(spark: SparkSession, store: str) -> DataFrame | None:
    try:
        df = spark.read.parquet(store)
    except Exception:
        return None
    w = Window.partitionBy("tz", "tx", "ty").orderBy(F.col("version").desc())
    return df.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")


def _tiles_as_patches(tiles: DataFrame) -> DataFrame:
    """Stored tiles -> pseudo-patches (full alpha, base paint order)."""
    import numpy as np
    import pandas as pd

    def conv(batches):
        from gdal_spark.functions import codecs

        full_alpha = bytearray(np.packbits(np.ones(P.TILE_SIZE * P.TILE_SIZE, dtype=bool)).tobytes())
        cols = [f.name for f in P.PATCH_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                rgb = codecs.png_decode(bytes(r.png))
                rows.append((r.tz, r.tx, r.ty, BASE_MARKER,
                             bytearray(rgb.tobytes()), full_alpha))
            yield pd.DataFrame(rows, columns=cols)

    return tiles.mapInPandas(conv, P.PATCH_SCHEMA)


def refresh_batch(
    batch_images: DataFrame, store: str, tz: int, version: int,
    resample: str = "bilinear",
) -> int:
    """One micro-batch upsert; returns number of tiles (re)written."""
    spark = batch_images.sparkSession
    patches = P.base_patches(batch_images, tz, resample=resample).persist()
    affected = patches.select("tz", "tx", "ty").distinct()

    current = read_latest_tiles(spark, store)
    if current is not None:
        current_affected = current.join(
            F.broadcast(affected), on=["tz", "tx", "ty"], how="left_semi"
        ).persist()
        patches = patches.unionByName(_tiles_as_patches(current_affected))

    tiles = P.composite_tiles(patches).withColumn("version", F.lit(version))
    # lineage: drop the base marker, merge the stored tile's contributors
    tiles = tiles.withColumn(
        "src_ids", F.filter(F.col("src_ids"), lambda s: s != F.lit(BASE_MARKER))
    )
    if current is not None:
        prev_ids = current_affected.select(
            "tz", "tx", "ty", F.col("src_ids").alias("_prev_ids")
        )
        tiles = (
            tiles.join(F.broadcast(prev_ids), on=["tz", "tx", "ty"], how="left")
            .withColumn(
                "src_ids",
                F.array_sort(
                    F.array_union(
                        F.col("src_ids"),
                        F.coalesce(F.col("_prev_ids"), F.array().cast("array<string>")),
                    )
                ),
            )
            .drop("_prev_ids")
        )
    tiles = tiles.withColumn("n_src", F.size("src_ids"))
    n = tiles.count()
    tiles.write.mode("append").parquet(store)
    patches.unpersist()
    return n


def start_refresh_stream(
    spark: SparkSession, images_path: str, store: str, checkpoint: str, tz: int,
    images_schema: T.StructType, trigger_available_now: bool = True,
):
    """readStream over an append-only images directory -> tile upserts.

    Footprints are derived per-batch (datagen.with_footprint for the
    synthetic corpus; on a real corpus footprint columns come with the
    table). Checkpoint dir gives exactly-once batch tracking — together
    with the versioned store this is the resumable-from-checkpoint
    property of the north rule, in streaming form.
    """
    from gdal_spark import datagen

    stream = spark.readStream.schema(images_schema).parquet(images_path)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if "lon_min" not in batch_df.columns:
            batch_df = datagen.with_footprint(batch_df)
        refresh_batch(batch_df, store, tz, version=batch_id)

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def store_path_metrics(spark: SparkSession, store: str) -> DataFrame | None:
    t = read_latest_tiles(spark, store)
    if t is None:
        return None
    return t.groupBy("tz").agg(
        F.count("*").alias("n_tiles"),
        F.sum("n_src").alias("n_contributions"),
        F.avg("ms").alias("avg_ms"),
    )
