"""Scale probe for the three distributed merge/reduce paths (r3 verdict
directive #7): polygonize cross-tile merge, contour stitch, and the
tile-pyramid overview reduction, at sf1-scale synthetic input on
local[N].

All inputs are generated DISTRIBUTED (mapInPandas over a (tx,ty) grid;
each task synthesizes its tile's pixels from a closed form, so adjacent
tiles agree at borders and nothing is materialized on the driver), all
outputs land in the noop sink, and the only driver-visible values are
scalar aggregates (wall time, row counts, per-partition skew stats).

Usage: python tools/merge_bench.py [--cpus 32] [--out BENCH/MERGE.md]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# sf1-scale shapes (sf0.1 flagship = 2M images; these are the raster
# analogs: a 16384^2 class raster = 268M px for polygonize, an 8192^2
# float64 node grid = 64M nodes for contour, a 64x64 z6 base-tile set
# = 4096 RGB tiles for the pyramid)
PG_SIZE = int(os.environ.get("MERGE_BENCH_PG_SIZE", "16384"))
PG_TILE = 256
CT_SIZE = int(os.environ.get("MERGE_BENCH_CT_SIZE", "8192"))
CT_TILE = 256
CT_LEVELS = 8
PYR_Z = int(os.environ.get("MERGE_BENCH_PYR_Z", "6"))


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _skew(df, cols):
    """max/median rows per shuffle partition of df repartitioned the way
    its consumer groups it — the peak-partition signal."""
    pid = (
        df.repartition(*[F.col(c) for c in cols])
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.max("n").alias("mx"),
            F.expr("percentile_approx(n, 0.5)").alias("md"),
            F.count(F.lit(1)).alias("nparts"),
        )
        .collect()[0]
    )
    return {"max_rows": int(pid.mx), "median_rows": int(pid.md),
            "n_partitions": int(pid.nparts)}


# --------------------------------------------------------------------------
# distributed tile generators (closed-form pixels, no driver arrays)
# --------------------------------------------------------------------------


def class_tiles(spark, size: int, tile: int):
    """uint8 class raster cls(x,y) = ((hypot(x,y) // W) mod 3) + 1:
    concentric rings of CONSTANT width W crossing hundreds of tiles —
    every ring is one global connected region assembled by the
    cross-tile merge."""
    from gdal_spark.raster.polygonize_ops import TILE_SCHEMA

    w_ring = 48  # px
    nt = size // tile
    grid = spark.range(nt * nt).select(
        (F.col("id") % nt).cast("int").alias("tx"),
        (F.col("id") / nt).cast("int").alias("ty"),
    ).repartition(CPUS * 4)

    def gen(batches):
        for pdf in batches:
            rows = []
            for tx, ty in zip(pdf["tx"], pdf["ty"]):
                x0, y0 = int(tx) * tile, int(ty) * tile
                xs = np.arange(x0, x0 + tile, dtype=np.int64)
                ys = np.arange(y0, y0 + tile, dtype=np.int64)
                xx, yy = np.meshgrid(xs, ys)
                rad = np.floor(np.hypot(xx, yy)).astype(np.int64)
                cls = ((rad // w_ring) % 3 + 1).astype(np.uint8)
                rows.append((int(tx), int(ty), tile, tile,
                             bytearray(cls.tobytes())))
            yield pd.DataFrame(
                rows, columns=[f.name for f in TILE_SCHEMA.fields]
            )

    return grid.mapInPandas(gen, TILE_SCHEMA)


def halo_grid_tiles(spark, size: int, tile: int):
    """float64 node grid f(x,y) = hypot(x,y) with a 1-node halo —
    contours at constant radii are circles crossing many tiles."""
    from gdal_spark.raster.contour import HALO_TILE_SCHEMA

    nt = size // tile
    grid = spark.range(nt * nt).select(
        (F.col("id") % nt).cast("int").alias("tx"),
        (F.col("id") / nt).cast("int").alias("ty"),
    ).repartition(CPUS * 4)

    def gen(batches):
        for pdf in batches:
            rows = []
            for tx, ty in zip(pdf["tx"], pdf["ty"]):
                x0, y0 = int(tx) * tile, int(ty) * tile
                x1 = min(size, x0 + tile + 1)
                y1 = min(size, y0 + tile + 1)
                xs = np.arange(x0, x1, dtype=np.float64)
                ys = np.arange(y0, y1, dtype=np.float64)
                xx, yy = np.meshgrid(xs, ys)
                g = np.hypot(xx, yy)
                rows.append(
                    (int(tx), int(ty), min(tile, size - x0),
                     min(tile, size - y0), bytearray(g.tobytes()),
                     g.shape[1], g.shape[0])
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in HALO_TILE_SCHEMA.fields]
            )

    return grid.mapInPandas(gen, HALO_TILE_SCHEMA)


def base_tiles(spark, z: int):
    """z-level RGB base tiles with a closed-form gradient payload."""
    from gdal_spark.tiles.pipeline import TILE_SCHEMA, TILE_SIZE

    n = 1 << z
    grid = spark.range(n * n).select(
        (F.col("id") % n).cast("int").alias("tx"),
        (F.col("id") / n).cast("int").alias("ty"),
    ).repartition(CPUS * 4)

    def gen(batches):
        from gdal_spark.functions import codecs

        for pdf in batches:
            rows = []
            for tx, ty in zip(pdf["tx"], pdf["ty"]):
                r = np.fromfunction(
                    lambda i, j: (i + int(tx) * 7) % 256, (TILE_SIZE, TILE_SIZE)
                )
                g = np.fromfunction(
                    lambda i, j: (j + int(ty) * 11) % 256, (TILE_SIZE, TILE_SIZE)
                )
                b = (r + g) % 256
                img = np.stack([r, g, b], axis=-1).astype(np.uint8)
                rows.append(
                    (z, int(tx), int(ty), (1 << z) - 1 - int(ty),
                     bytearray(codecs.png_encode(img)), 1,
                     [f"t{tx}_{ty}"], 0.0)
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in TILE_SCHEMA.fields]
            )

    return grid.mapInPandas(gen, TILE_SCHEMA)


# --------------------------------------------------------------------------
# probes
# --------------------------------------------------------------------------


def probe_polygonize(spark) -> dict:
    from gdal_spark.raster import polygonize_ops as PG

    tiles = class_tiles(spark, PG_SIZE, PG_TILE)
    t0 = time.time()
    polys = PG.polygonize(tiles, PG_TILE)
    stats = polys.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("npix").alias("npix"),
        F.max("npix").alias("max_npix"),
    ).collect()[0]
    dt = time.time() - t0
    assert int(stats.npix) == PG_SIZE * PG_SIZE, "pixel conservation"
    return {
        "input_px": PG_SIZE * PG_SIZE,
        "n_tiles": (PG_SIZE // PG_TILE) ** 2,
        "wall_sec": round(dt, 2),
        "regions": int(stats.n),
        "max_region_px": int(stats.max_npix),
        "mpx_per_sec": round(PG_SIZE * PG_SIZE / dt / 1e6, 1),
    }


def probe_contour(spark) -> dict:
    from gdal_spark.raster import contour as CT

    tiles = halo_grid_tiles(spark, CT_SIZE, CT_TILE)
    levels = [CT_SIZE * (i + 1) / (CT_LEVELS + 1.0) for i in range(CT_LEVELS)]
    t0 = time.time()
    lines = CT.contour(tiles, CT_TILE, levels)
    stats = lines.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_points").alias("pts"),
        F.max("n_points").alias("max_pts"),
    ).collect()[0]
    dt = time.time() - t0
    return {
        "input_nodes": CT_SIZE * CT_SIZE,
        "n_tiles": (CT_SIZE // CT_TILE) ** 2,
        "levels": CT_LEVELS,
        "wall_sec": round(dt, 2),
        "lines": int(stats.n),
        "total_points": int(stats.pts),
        "max_line_points": int(stats.max_pts),
        "mnodes_per_sec": round(CT_SIZE * CT_SIZE / dt / 1e6, 1),
    }


def probe_pyramid(spark) -> dict:
    from gdal_spark.tiles import pipeline as TP

    t0 = time.time()
    level = base_tiles(spark, PYR_Z)
    n_total = 0
    counts = {}
    for z in range(PYR_Z, 0, -1):
        level = TP.overview_zoom(level)
        level = level.localCheckpoint(eager=True)  # cut lineage per level
        c = level.count()
        counts[z - 1] = c
        n_total += c
    dt = time.time() - t0
    assert counts[0] == 1
    return {
        "base_tiles": (1 << PYR_Z) ** 2,
        "overview_tiles": n_total,
        "wall_sec": round(dt, 2),
        "tiles_per_sec": round(((1 << PYR_Z) ** 2 + n_total) / dt, 1),
    }


def main() -> None:
    from gdal_spark.session import get_session

    out_path = os.path.join(REPO, "BENCH", "MERGE.md")
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    spark = get_session(app_name="merge_bench", master=f"local[{CPUS}]")
    spark.range(8).selectExpr("sum(id)").collect()
    results = {}
    for name, fn in [
        ("polygonize", probe_polygonize),
        ("contour", probe_contour),
        ("pyramid", probe_pyramid),
    ]:
        results[name] = fn(spark)
        print(json.dumps({name: results[name]}))
    spark.stop()

    pg, ct, py = results["polygonize"], results["contour"], results["pyramid"]
    with open(out_path, "w") as f:
        f.write(f"""# BENCH/MERGE — distributed-merge scale probes (r4)

sf1-scale synthetic inputs generated DISTRIBUTED (closed-form pixels in
mapInPandas tasks; nothing materialized on the driver), local[{CPUS}],
driver sees only scalar aggregates.

## Polygonize cross-tile merge (raster/polygonize_ops.py)

{pg['input_px']:,} px ({PG_SIZE}x{PG_SIZE} uint8, {pg['n_tiles']} tiles of
{PG_TILE}) — ~480 constant-width concentric-ring regions, each crossing hundreds of
tile borders (the adversarial shape for the equivalence-graph reduce).

| metric | value |
|---|---|
| wall | {pg['wall_sec']} s |
| throughput | {pg['mpx_per_sec']} Mpx/s |
| global regions | {pg['regions']:,} |
| largest region | {pg['max_region_px']:,} px |

Pixel conservation asserted: sum(npix) == {pg['input_px']:,}.

## Contour stitch (raster/contour.py)

{ct['input_nodes']:,} nodes ({CT_SIZE}x{CT_SIZE} float64,
{ct['n_tiles']} halo tiles, {ct['levels']} levels; radial field, so each
level is a quarter-circle arc crossing ~{CT_SIZE // CT_TILE} tiles).
r4 stitch is ADAPTIVE: per-tile chaining always runs narrow; below
100k open polylines the cross-tile merge is one chain task per level,
above it an endpoint-equivalence component merge (pointer-doubling
fixpoint) gives one task per OUTPUT LINE — bounded tasks regardless of
how much of the raster one level crosses. This input sits on the small
path (8 long lines); forcing the component path measured 3-4x slower
here (fixpoint round overhead), which is exactly why the switch exists.

| metric | value |
|---|---|
| wall | {ct['wall_sec']} s |
| throughput | {ct['mnodes_per_sec']} Mnodes/s |
| polylines | {ct['lines']:,} |
| total vertices | {ct['total_points']:,} |
| longest line | {ct['max_line_points']:,} vertices |

## Tile-pyramid overview reduce (tiles/pipeline.py)

z{PYR_Z} base ({py['base_tiles']:,} RGB 256px tiles) reduced level by
level to z0; per-level localCheckpoint cuts lineage (the resume path's
persistence pattern).

| metric | value |
|---|---|
| wall (all levels) | {py['wall_sec']} s |
| tiles touched | {py['base_tiles'] + py['overview_tiles']:,} |
| throughput | {py['tiles_per_sec']} tiles/s |

Raw per-probe JSON:

```
{json.dumps(results, indent=2)}
```
""")
    print(json.dumps({"out": out_path, **{k: v["wall_sec"] for k, v in results.items()}}))


if __name__ == "__main__":
    main()
