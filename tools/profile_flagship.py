"""Phase-by-phase profiling of the flagship bench pipeline at a given
parallelism. Usage: python tools/profile_flagship.py <cores> [n_images]"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cores = sys.argv[1] if len(sys.argv) > 1 else "32"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    from pyspark.sql import functions as F

    from gdal_spark import datagen
    from gdal_spark.functions import mercator as M
    from gdal_spark.operators import spatial_join as SJ
    from gdal_spark.session import get_session

    spark = get_session(app_name="profile", master=f"local[{cores}]")

    def bench(label, df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        print(f"{label:28s} {time.time() - t0:7.2f}s")

    imgs = datagen.with_footprint(datagen.images_df(spark, n, with_pixels=False))
    bench("datagen+footprint", imgs)

    polys = datagen.polygons_df(spark, 2000)
    joined = SJ.spatial_join(imgs, polys, res=6, predicate="center_within",
                             broadcast_polygons=True)
    t0 = time.time()
    nc = joined.count()
    print(f"{'join (count, with dedup)':28s} {time.time() - t0:7.2f}s  rows={nc}")

    bench("join+agg", SJ.count_per_polygon(joined))

    cx = (F.col("lon_min") + F.col("lon_max")) / 2
    cy = (F.col("lat_min") + F.col("lat_max")) / 2
    tx, ty = M.lonlat_to_tile(cx, cy, 8)
    tiles = (
        imgs.select(tx.alias("tx"), M.tms_to_xyz(ty, 8).alias("ty"))
        .groupBy("tx", "ty").agg(F.count(F.lit(1)).alias("n"))
    )
    bench("tile assignment", tiles)
    spark.stop()


if __name__ == "__main__":
    main()
