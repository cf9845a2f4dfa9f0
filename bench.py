"""Benchmark harness.

Default mode: runs the headline query suite at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec}, "sf": ..., "images_per_sec": ...}

--scaling mode: runs the flagship images join+tile pipeline at two
parallelism levels (local[8] vs local[32] — the sandbox proxy for N vs 4N
executors) in fresh JVMs and writes BENCH/BASELINE.md with throughput and
scaling efficiency (north-rule gate: >= 0.8).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# images processed by the flagship pipeline per bench run
N_IMAGES_BENCH = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "200000"))
N_POLYGONS_BENCH = int(os.environ.get("SPARK_GRAFT_BENCH_POLYGONS", "2000"))


def _noop_run(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def flagship_pipeline(spark, n_images: int, n_polys: int):
    """The north-star job: images -> footprint -> cell spatial join to
    polygons -> per-polygon counts, PLUS XYZ tile assignment at z=8."""
    from pyspark.sql import functions as F

    from gdal_spark import datagen
    from gdal_spark.functions import mercator as M
    from gdal_spark.operators import spatial_join as SJ

    imgs = datagen.with_footprint(datagen.images_df(spark, n_images, with_pixels=False))
    polys = datagen.polygons_df(spark, n_polys)
    joined = SJ.spatial_join(
        imgs, polys, res=6, predicate="center_within", broadcast_polygons=True,
        carry=[],
    )
    counts = SJ.count_per_polygon(joined)

    cx = (F.col("lon_min") + F.col("lon_max")) / 2
    cy = (F.col("lat_min") + F.col("lat_max")) / 2
    tx, ty = M.lonlat_to_tile(cx, cy, 8)
    tiles = (
        imgs.select(tx.alias("tx"), M.tms_to_xyz(ty, 8).alias("ty"))
        .groupBy("tx", "ty")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return counts, tiles


def run_flagship(master: str, n_images: int) -> dict:
    from gdal_spark.session import get_session

    spark = get_session(app_name="gdal_spark_bench", master=master)
    # warmup: fork+import the Python UDF workers, JIT the codegen'd stages
    # and Arrow serializers on a tiny slice, so the measurement below times
    # the workload, not per-JVM one-time costs (a cluster amortizes these
    # across the whole job lifetime)
    wc, wt = flagship_pipeline(spark, 2000, N_POLYGONS_BENCH)
    _noop_run(wc)
    _noop_run(wt)
    t0 = time.time()
    counts, tiles = flagship_pipeline(spark, n_images, N_POLYGONS_BENCH)
    _noop_run(counts)
    _noop_run(tiles)
    dt = time.time() - t0
    spark.stop()
    return {"sec": dt, "images_per_sec": n_images / dt, "n_images": n_images}


def headline_suite() -> None:
    import __spark_entry__ as E
    from gdal_spark.session import get_session

    spark = get_session(app_name="gdal_spark_bench", master=f"local[{CPUS}]")
    qs = E.queries()
    names = [
        "cell_pip_join",
        "tile_assignment",
        "knn_topk",
        "zonal_stats",
        "sqlite_group_by_having",
        "ogr_join_first_match",
        "dedup_exact",
        "minhash_signatures",
        "simhash16",
        "ann_cosine_topk",
        "ann_lsh_buckets",
        "text_quality_score",
    ]
    timings: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        _noop_run(qs[name](spark, SF_DIR))
        timings[name] = round(time.time() - t0, 3)

    # flagship images pipeline (in-session so suite stays one JSON line)
    t0 = time.time()
    counts, tiles = flagship_pipeline(spark, N_IMAGES_BENCH, N_POLYGONS_BENCH)
    _noop_run(counts)
    _noop_run(tiles)
    flagship_sec = time.time() - t0
    timings["images_join_tile"] = round(flagship_sec, 3)
    spark.stop()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR,
                "images_per_sec": round(N_IMAGES_BENCH / flagship_sec, 1),
                "n_images": N_IMAGES_BENCH,
                "cpus": int(CPUS),
            }
        )
    )


N_IMAGES_SCALING = int(os.environ.get("SPARK_GRAFT_SCALE_IMAGES", "2000000"))


def scaling_report() -> None:
    """Same job, same input, two parallelism levels; efficiency >= 0.8."""
    results = {}
    for cores in (8, 32):
        out = subprocess.run(
            [sys.executable, __file__, "--flagship-once", str(cores),
             str(N_IMAGES_SCALING)],
            capture_output=True, text=True, check=True,
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        results[cores] = json.loads(line)
    r8, r32 = results[8], results[32]
    speedup = r32["images_per_sec"] / r8["images_per_sec"]
    efficiency = speedup / (32 / 8)
    os.makedirs(os.path.join(os.path.dirname(__file__), "BENCH"), exist_ok=True)
    path = os.path.join(os.path.dirname(__file__), "BENCH", "BASELINE.md")
    with open(path, "w") as f:
        f.write(
            f"""# BENCH/BASELINE — scaling evidence (north rule)

Flagship job: images -> footprint -> cell spatial join ({N_POLYGONS_BENCH}
polygons, broadcast) + XYZ z=8 tile assignment, {r8['n_images']:,} synthetic
images (metadata path), identical input at both parallelism levels.
Sandbox proxy for N vs 4N executors: local[8] vs local[32], fresh JVM each.

| parallelism | wall sec | images/sec |
|---|---|---|
| local[8]  (N)  | {r8['sec']:.2f} | {r8['images_per_sec']:.0f} |
| local[32] (4N) | {r32['sec']:.2f} | {r32['images_per_sec']:.0f} |

speedup 8->32 cores: {speedup:.2f}x (ideal 4.0x)
**scaling efficiency: {efficiency:.3f}** (gate: >= 0.8)
"""
        )
    print(json.dumps({"local8": r8, "local32": r32, "efficiency": round(efficiency, 3)}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        scaling_report()
    elif len(sys.argv) > 1 and sys.argv[1] == "--flagship-once":
        cores = sys.argv[2]
        n = int(sys.argv[3]) if len(sys.argv) > 3 else N_IMAGES_BENCH
        print(json.dumps(run_flagship(f"local[{cores}]", n)))
    else:
        headline_suite()
