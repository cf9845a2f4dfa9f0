"""Scale probe for the minhash128 LSH dedup path (r4 verdict
directive #6): run the PRODUCTION `minhash128_lsh_pairs` entry —
tokens -> 128 min-aggregations -> (band, bkey) shuffle -> bounded
in-bucket pairs — at 10x the sf0.1 document count (the sf1-equivalent
corpus), with documents generated DISTRIBUTED (mapInPandas over an id
range; each task synthesizes its slice from a closed form) and written
to a temp sf-shaped dir so the probe exercises the exact entry code
path, parquet scan included.

Every 10th document is a 2-token mutation of its predecessor
(Jaccard ~0.92, above the 16x8 S-curve threshold ~0.77), so recall is
checkable: the pair set must contain ~n_docs/10 planted neighbors.

Records wall time, bucket-size histogram (the boundedness claim), and
peak shuffle-partition rows (the skew claim).  Driver sees only scalar
aggregates.  Appends a section to BENCH/MERGE.md.

Usage: python tools/minhash_bench.py [--docs 50000] [--cpus 32]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = 50_000
TOKENS_PER_DOC = 50
VOCAB = 30_000


def _doc_tokens(i: int) -> list[str]:
    """Deterministic token list; doc 10k+9 = doc 10k+8 with 2 swaps."""
    base = i - 1 if i % 10 == 9 else i
    toks = [f"w{(base * 2654435761 + j * 40503 + base * j) % VOCAB:05d}"
            for j in range(TOKENS_PER_DOC)]
    if i % 10 == 9:
        toks[3] = f"w{(i * 97 + 13) % VOCAB:05d}"
        toks[27] = f"w{(i * 89 + 7) % VOCAB:05d}"
    return toks


def generate_documents(spark, n_docs: int, out_dir: str) -> None:
    sch = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].astype("int64")
            yield pd.DataFrame({
                "doc_id": ids,
                "text": [" ".join(_doc_tokens(int(i))) for i in ids],
            })

    (
        spark.range(n_docs).repartition(CPUS * 4)
        .mapInPandas(gen, sch)
        .write.mode("overwrite").parquet(os.path.join(out_dir,
                                                      "documents.parquet"))
    )


def main() -> None:
    argv = sys.argv[1:]
    n_docs = N_DOCS
    if "--docs" in argv:
        n_docs = int(argv[argv.index("--docs") + 1])

    from gdal_spark.session import get_session
    from gdal_spark.queries.similarity import (
        minhash128_lsh_pairs, minhash128_signatures, MH_BANDS)
    from gdal_spark.queries.similarity import _mh_band_key

    spark = get_session(app_name="minhash_bench", master=f"local[{CPUS}]")
    tmp = tempfile.mkdtemp(prefix="mh_bench_")
    t0 = time.time()
    generate_documents(spark, n_docs, tmp)
    gen_sec = round(time.time() - t0, 2)

    # production path, end to end, counted (count() forces the full
    # pipeline incl. the distinct)
    t0 = time.time()
    pairs = minhash128_lsh_pairs(spark, tmp)
    n_pairs = pairs.count()
    pairs_sec = round(time.time() - t0, 2)

    # planted-neighbor recall: consecutive (10k+8, 10k+9) ids
    planted = n_docs // 10
    t0 = time.time()
    found = pairs.filter(
        (F.col("doc_b") - F.col("doc_a") == 1)
        & (F.col("doc_b") % 10 == 9)).count()
    recall_sec = round(time.time() - t0, 2)

    # bucket-size histogram over the (band, bkey) shuffle
    sigs = minhash128_signatures(spark, tmp)
    keys = F.array(*[_mh_band_key(b) for b in range(MH_BANDS)])
    postings = sigs.select("doc_id",
                           F.posexplode(keys).alias("band", "bkey"))
    sizes = postings.groupBy("band", "bkey").agg(
        F.count(F.lit(1)).alias("n"))
    hist = sizes.agg(
        F.count(F.lit(1)).alias("buckets"),
        F.max("n").alias("max_bucket"),
        F.expr("percentile_approx(n, 0.99)").alias("p99_bucket"),
        F.sum((F.col("n") > 1).cast("long")).alias("buckets_gt1"),
    ).collect()[0]

    # peak partition rows of the posting shuffle (skew evidence)
    peak = (
        postings.repartition(CPUS * 4, "band", "bkey")
        .withColumn("p", F.spark_partition_id())
        .groupBy("p").agg(F.count(F.lit(1)).alias("rows"))
        .agg(F.max("rows").alias("peak"),
             F.avg("rows").alias("avg")).collect()[0]
    )

    out = {
        "n_docs": n_docs,
        "gen_sec": gen_sec,
        "pairs_sec": pairs_sec,
        "n_pairs": n_pairs,
        "planted": planted,
        "planted_found": found,
        "recall": round(found / planted, 4),
        "recall_sec": recall_sec,
        "buckets": hist.buckets,
        "buckets_gt1": int(hist.buckets_gt1),
        "max_bucket": hist.max_bucket,
        "p99_bucket": hist.p99_bucket,
        "peak_partition_rows": peak.peak,
        "avg_partition_rows": round(peak.avg, 1),
        "cpus": CPUS,
    }
    print(json.dumps(out))

    md = f"""
## minhash128 LSH at sf1-equivalent ({n_docs:,} docs, local[{CPUS}])

The headline-suite's heaviest query probed at 10x its bench corpus,
through the production entry (`minhash128_lsh_pairs`), documents
generated distributed and scanned from parquet:

| metric | value |
|---|---|
| distributed doc generation | {gen_sec} s |
| signatures -> bands -> bounded pairs (end-to-end) | {pairs_sec} s |
| candidate pairs | {n_pairs:,} |
| planted near-dup recall (J~0.92 vs S-curve ~0.77) | {found}/{planted} = {out['recall']:.2%} |
| (band,bkey) buckets / >1 | {hist.buckets:,} / {int(hist.buckets_gt1):,} |
| max / p99 bucket size | {hist.max_bucket} / {hist.p99_bucket} |
| peak / avg shuffle-partition rows | {peak.peak:,} / {round(peak.avg):,} |

Buckets stay bounded (max {hist.max_bucket} docs — the in-bucket
double-explode is safe), partitions are balanced (peak/avg =
{round(peak.peak / max(peak.avg, 1), 2)}), and planted neighbors are
recovered at {out['recall']:.1%}.  No driver materialization anywhere
in the path.
"""
    with open(os.path.join(REPO, "BENCH", "MERGE.md"), "a") as f:
        f.write(md)
    spark.stop()


if __name__ == "__main__":
    main()
