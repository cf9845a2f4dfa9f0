"""Near-dup detection + similarity search (training-data pipeline ops).

MinHash/SimHash use md5-derived integer hashes (identical in Spark and
DuckDB: conv(substr(md5(x),1,15),16,10) == ('0x'||substr(md5(x),1,15))::
BIGINT), so even the sketch pipelines have full SQL oracles.

Scale notes (100 TB): minhash signatures are one explode + groupBy (one
shuffle keyed by doc_id); LSH banding self-joins on the 8-byte band key —
both AQE-skew-safe. ANN brute force is the correctness baseline; the LSH
bucket join is the scale path (candidates drop from N^2 to per-bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gdal_spark.sources.tables import load

N_HASHES = 4
SEEDS = [f"s{j}:" for j in range(N_HASHES)]


def _tok(col: F.Column) -> F.Column:
    return F.filter(F.split(col, r"\s+"), lambda t: t != "")


def _h(seed: str, tok: F.Column) -> F.Column:
    return F.conv(F.substring(F.md5(F.concat(F.lit(seed), tok)), 1, 15), 16, 10).cast("long")


def _h_sql(seed: str, tok: str) -> str:
    return f"('0x' || substring(md5('{seed}' || {tok}), 1, 15))::BIGINT"


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc minhash signature: h_j = min over tokens of hash_j(token)."""
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(_tok(F.col("text"))).alias("t"))
    aggs = [F.min(_h(SEEDS[j], F.col("t"))).alias(f"h{j}") for j in range(N_HASHES)]
    return toks.groupBy("doc_id").agg(*aggs)


_MINHASH_CTE = r"""
    toks AS (
        SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) AS t
        FROM documents
    ),
    sigs AS (
        SELECT doc_id, {mins}
        FROM toks GROUP BY doc_id
    )
""".format(
    mins=", ".join(f"min({_h_sql(SEEDS[j], 't')}) AS h{j}" for j in range(N_HASHES))
)


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding: 2 bands x 2 rows; candidate pairs share >= 1 band.
    (shingle->minhash->band->bucket-join.)"""
    sigs = minhash_signatures(spark, sf_dir)
    b1 = sigs.select("doc_id", F.col("h0").alias("k1"), F.col("h1").alias("k2"))
    b2 = sigs.select("doc_id", F.col("h2").alias("k1"), F.col("h3").alias("k2"))
    pairs = None
    for b in (b1, b2):
        a = b.alias("a")
        c = b.alias("b")
        p = a.join(c, ["k1", "k2"]).filter(F.col("a.doc_id") < F.col("b.doc_id")).select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    return pairs.distinct()


def simhash16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash over whitespace tokens (multiset-weighted)."""
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(_tok(F.col("text"))).alias("t"))
    h = _h("sim:", F.col("t"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"s{b}")
        for b in range(16)
    ]
    agg = toks.groupBy("doc_id").agg(*bit_sums)
    sim = None
    for b in range(16):
        bit = F.when(F.col(f"s{b}") >= 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return agg.select("doc_id", sim.alias("simhash"))


def _simhash_oracle() -> str:
    h = _h_sql("sim:", "t")
    sums = ", ".join(
        f"sum(CASE WHEN (({h}) >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(16)
    )
    bits = " + ".join(f"(CASE WHEN s{b} >= 0 THEN {1 << b} ELSE 0 END)" for b in range(16))
    return rf"""
        WITH toks AS (
            SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) AS t
            FROM documents
        ),
        agg AS (SELECT doc_id, {sums} FROM toks GROUP BY doc_id)
        SELECT doc_id, {bits} AS simhash FROM agg
    """


def token_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-set Jaccard near-dup pairs (n-gram Jaccard with n=1) among
    doc_id < 80, threshold 0.5. Set intersection via token equi-join —
    the distributed restatement of pairwise shingle comparison."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 80)
    toks = d.select("doc_id", F.explode(F.array_distinct(_tok(F.col("text")))).alias("t"))
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = toks.alias("a")
    b = toks.alias("b")
    inter = (
        a.join(b, "t")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    j = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")), 4
            ),
        )
    )
    return j.filter(F.col("jaccard") >= 0.5).select("doc_a", "doc_b", "jaccard")


_JACCARD_ORACLE = r"""
    WITH toks AS (
        SELECT DISTINCT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) AS t
        FROM documents WHERE doc_id < 80
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        FROM toks a JOIN toks b ON a.t = b.t AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           round(n_inter / cast(sa.sz + sb.sz - n_inter as double), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE n_inter / cast(sa.sz + sb.sz - n_inter as double) >= 0.5
"""


# --------------------------------------------------------------------------
# Embedding similarity search
# --------------------------------------------------------------------------


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for query vectors vec_id < 8 — the exact
    baseline every ANN variant is validated against."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "embeddings")
    base = e.select("vec_id", "embedding", _norm(F.col("embedding")).alias("nrm"))
    q = base.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qemb"),
        F.col("nrm").alias("qnrm"),
    )
    cand = base.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("query_id"))
    cos = _dot(F.col("embedding"), F.col("qemb")) / (F.col("nrm") * F.col("qnrm"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        cand.withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "rank", "vec_id", F.round("cos", 4).alias("cos_r"))
    )


_ANN_ORACLE = """
    WITH base AS (
        SELECT vec_id, embedding,
               sqrt(list_aggregate(list_transform(embedding, x -> cast(x as double) * cast(x as double)), 'sum')) AS nrm
        FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, embedding AS qemb, nrm AS qnrm FROM base WHERE vec_id < 8),
    cand AS (
        SELECT q.query_id, b.vec_id,
               list_aggregate(list_transform(list_zip(b.embedding, q.qemb),
                              p -> cast(p[1] as double) * cast(p[2] as double)), 'sum')
               / (b.nrm * q.qnrm) AS cos,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY list_aggregate(list_transform(list_zip(b.embedding, q.qemb),
                              p -> cast(p[1] as double) * cast(p[2] as double)), 'sum')
                          / (b.nrm * q.qnrm) DESC,
                          b.vec_id ASC
               ) AS rank
        FROM base b CROSS JOIN q WHERE b.vec_id <> q.query_id
    )
    SELECT query_id, rank, vec_id, round(cos, 4) AS cos_r FROM cand WHERE rank <= 5
"""


def lsh_bucket_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketing on the first 8 dims (the scale path for ANN:
    candidates per bucket instead of N^2). Returns bucket histogram."""
    e = load(spark, sf_dir, "embeddings")
    bucket = None
    for i in range(1, 9):
        bit = F.when(F.element_at(F.col("embedding"), i) >= 0.0, F.lit(1 << (i - 1))).otherwise(
            F.lit(0)
        )
        bucket = bit if bucket is None else bucket + bit
    return (
        e.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_LSH_ORACLE = """
    SELECT {bucket} AS bucket, count(*) AS n
    FROM embeddings GROUP BY bucket
""".format(
    bucket=" + ".join(
        f"(CASE WHEN embedding[{i}] >= 0.0 THEN {1 << (i - 1)} ELSE 0 END)" for i in range(1, 9)
    )
)


SPARK = {
    "minhash_signatures": minhash_signatures,
    "minhash_lsh_pairs": minhash_lsh_pairs,
    "simhash16": simhash16,
    "token_jaccard_pairs": token_jaccard_pairs,
    "ann_cosine_topk": ann_cosine_topk,
    "ann_lsh_buckets": lsh_bucket_counts,
}

ORACLE = {
    "minhash_signatures": f"WITH {_MINHASH_CTE} SELECT doc_id, h0, h1, h2, h3 FROM sigs",
    "minhash_lsh_pairs": f"""
        WITH {_MINHASH_CTE},
        p1 AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM sigs a JOIN sigs b ON a.h0 = b.h0 AND a.h1 = b.h1 AND a.doc_id < b.doc_id
        ),
        p2 AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM sigs a JOIN sigs b ON a.h2 = b.h2 AND a.h3 = b.h3 AND a.doc_id < b.doc_id
        )
        SELECT DISTINCT doc_a, doc_b FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2)
    """,
    "simhash16": _simhash_oracle(),
    "token_jaccard_pairs": _JACCARD_ORACLE,
    "ann_cosine_topk": _ANN_ORACLE,
    "ann_lsh_buckets": _LSH_ORACLE,
}
