"""spark-submit entrypoint for the corpus-dedup pipeline.

Usage (cluster):
  zip -r gdal_spark.zip gdal_spark
  spark-submit --py-files gdal_spark.zip jobs/dedup_job.py \
      --documents s3://bucket/documents --output s3://bucket/dedup \
      --stages exact,jaccard,clusters --resume

Local smoke (driver test tables):
  python jobs/dedup_job.py --documents /root/testdata/sf0.01/documents.parquet \
      --output /tmp/dedup --stages exact,jaccard,clusters

Composes the engine's dedup operators into the keep/drop assignment a
training-data pipeline materializes:
  1. exact      — md5-fingerprint groupBy (canonical = min doc_id);
  2. jaccard    — DF-capped shingle-join near-dup pairs (>= 0.5);
  3. clusters   — connected components over the pair graph; survivors =
                  cluster minima.
Each stage writes its own parquet under --output plus a `_metrics` row
(stage, rows, wall sec) — per-stage lineage+metrics, same contract as
jobs/tile_job.py. --resume skips stages whose output already exists
(file-exists resume; on Iceberg this is a snapshot check), so a killed
job restarts where it stopped.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--documents", required=True, help="parquet path of the documents table")
    ap.add_argument("--output", required=True)
    ap.add_argument("--stages", default="exact,jaccard,clusters")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from gdal_spark.operators.components import connected_components
    from gdal_spark.queries import similarity as S
    from gdal_spark.queries import textops as TX
    from gdal_spark.session import get_session

    spark = get_session(app_name="gdal_spark_dedup_job", master=args.master)
    sf_dir = os.path.dirname(args.documents)
    stages = args.stages.split(",")
    metrics = []

    def run_stage(name: str, build):
        out = os.path.join(args.output, name)
        if args.resume and _done(out):
            metrics.append({"stage": name, "rows": None, "sec": 0.0, "resumed": True})
            return spark.read.parquet(out)
        t0 = time.time()
        df = build()
        df.write.mode("overwrite").parquet(out)
        back = spark.read.parquet(out)
        metrics.append(
            {"stage": name, "rows": back.count(), "sec": round(time.time() - t0, 2),
             "resumed": False}
        )
        return back

    pairs = None
    if "exact" in stages:
        run_stage("exact", lambda: TX.dedup_exact(spark, sf_dir))
    if "jaccard" in stages:
        pairs = run_stage("jaccard", lambda: S.token_jaccard_pairs(spark, sf_dir))
    if "clusters" in stages:
        if pairs is None:
            pairs = spark.read.parquet(os.path.join(args.output, "jaccard"))
        p = pairs

        def build_clusters():
            cc = connected_components(p, src="doc_a", dst="doc_b")
            docs = spark.read.parquet(args.documents).select("doc_id")
            return docs.join(
                cc.withColumnRenamed("node", "doc_id"), "doc_id", "left"
            ).select(
                "doc_id",
                F.coalesce("component", "doc_id").alias("cluster_id"),
                (F.coalesce("component", "doc_id") == F.col("doc_id")).alias("survivor"),
            )

        run_stage("clusters", build_clusters)

    spark.createDataFrame(
        [(m["stage"], m["rows"], m["sec"], m["resumed"], time.time()) for m in metrics],
        "stage: string, rows: long, sec: double, resumed: boolean, written_at: double",
    ).write.mode("append").parquet(os.path.join(args.output, "_metrics"))
    print(json.dumps({"stages": metrics}))
    spark.stop()


if __name__ == "__main__":
    main()
