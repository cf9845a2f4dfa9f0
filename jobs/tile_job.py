"""spark-submit entrypoint for the tiling north-star job.

Usage (cluster):
  zip -r gdal_spark.zip gdal_spark
  spark-submit --py-files gdal_spark.zip jobs/tile_job.py \
      --images s3://bucket/images_table --output s3://bucket/tiles \
      --tz-max 12 --tz-min 6 --resume

Local smoke (synthetic input, matches the BASELINE.json input_hint shape):
  python jobs/tile_job.py --synthetic 500 --output /tmp/tiles --tz-max 9 --resume

Semantics: gdal2tiles end-to-end (base tiles + overview pyramid), with
--resume restarting from whatever the tile store already holds (the
reference's --resume file-exists check, gdal2tiles.py:1492, as an
anti-join against the store's keys — on Iceberg this is snapshot-based).
A `_metrics` table records per-tile lineage (source image ids) and wall
time, satisfying the north rule's per-partition lineage+metrics.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", help="parquet/iceberg path of the images table")
    ap.add_argument("--synthetic", type=int, default=0, help="generate N synthetic images")
    ap.add_argument("--output", required=True)
    ap.add_argument("--tz-max", type=int, default=0, help="0 = auto (ZoomForPixelSize)")
    ap.add_argument("--tz-min", type=int, default=None)
    ap.add_argument("--resample", default="bilinear", choices=["near", "bilinear"])
    ap.add_argument("--resume", action="store_true")
    ap.add_argument(
        "--snapshot-store", action="store_true",
        help="commit each zoom level as a manifest snapshot "
             "(Iceberg-semantics resume: uncommitted files invisible)",
    )
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from gdal_spark import datagen
    from gdal_spark.session import get_session
    from gdal_spark.tiles import pipeline as P

    spark = get_session(app_name="gdal_spark_tile_job", master=args.master)
    t0 = time.time()

    if args.synthetic:
        images = datagen.with_footprint(
            datagen.images_df(spark, args.synthetic, with_pixels=True, size_cap=128)
        )
    else:
        images = spark.read.parquet(args.images)
        if "lon_min" not in images.columns:
            images = datagen.with_footprint(images)

    tz_max = args.tz_max or P.max_zoom_for(images)
    tz_min = args.tz_min if args.tz_min is not None else max(0, tz_max - 3)

    reader = P.snapshot_read_tiles if args.snapshot_store else P.read_tiles
    existing = reader(spark, args.output) if args.resume else None
    pyramid = P.build_pyramid(
        images, tz_max=tz_max, tz_min=tz_min, resample=args.resample, existing=existing
    )

    n_total = 0
    for tz in sorted(pyramid, reverse=True):
        tiles = pyramid[tz].persist()
        n = tiles.count()
        n_total += n
        if args.snapshot_store:
            P.snapshot_write_tiles(tiles.drop("ms"), args.output)
        else:
            P.write_tiles(tiles.drop("ms"), args.output)
        # lineage + metrics side table (north rule)
        tiles.select(
            "tz", "tx", "ty", "n_src", "src_ids", "ms",
            F.lit(time.time()).alias("written_at"),
        ).write.mode("append").parquet(os.path.join(args.output, "_metrics"))
        tiles.unpersist()

    dt = time.time() - t0
    print(json.dumps({"tiles": n_total, "tz_max": tz_max, "tz_min": tz_min,
                      "sec": round(dt, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
