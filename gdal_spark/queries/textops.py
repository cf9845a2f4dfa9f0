"""Text-analysis operators over the `documents` table (training-data
pipeline ops: token counting, quality scoring, language-ID heuristic,
rolling fingerprint, exact dedup). All pure Column expressions — no UDFs —
so they whole-stage-codegen and scale linearly with the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gdal_spark.sources.tables import load

STOPWORDS = ["the", "and", "of", "to", "a"]


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars_measured"),
    )


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length/punct/digit/space ratios — the standard cheap quality gates."""
    d = load(spark, sf_dir, "documents")
    n = F.length("text").cast("double")
    punct = n - F.length(F.regexp_replace("text", r"[.,;:!?]", ""))
    digit = n - F.length(F.regexp_replace("text", r"[0-9]", ""))
    space = n - F.length(F.regexp_replace("text", r" ", ""))
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_measured"),
        F.round(punct / n, 4).alias("punct_ratio"),
        F.round(digit / n, 4).alias("digit_ratio"),
        F.round(space / n, 4).alias("space_ratio"),
    )


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language heuristic (n-gram language ID reduced to its
    SQL-expressible core so the oracle can replicate it exactly)."""
    d = load(spark, sf_dir, "documents")
    hits = None
    for sw in STOPWORDS:
        pat = f" {sw} "
        h = (F.length("text") - F.length(F.replace(F.col("text"), F.lit(pat), F.lit("")))) / len(pat)
        hits = h if hits is None else hits + h
    toks = F.size(F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != ""))
    ratio = hits / toks.cast("double")
    return d.select(
        "doc_id",
        F.col("lang").alias("label"),
        F.when(ratio >= 0.08, F.lit("en")).otherwise(F.lit("other")).alias("pred"),
        F.round(ratio, 4).alias("stop_ratio"),
    )


def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 of the normalized text folded to int64
    (rolling-hash analog, deterministic across engines)."""
    d = load(spark, sf_dir, "documents")
    norm = F.lower(F.regexp_replace("text", r"\s+", " "))
    fp = F.conv(F.substring(F.md5(norm), 1, 15), 16, 10).cast("long")
    return d.select("doc_id", fp.alias("fp"))


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup (hash-groupBy): canonical = min doc_id per distinct text;
    reports group sizes. At 100 TB group on the md5 fingerprint, never the
    raw text (shuffle payload stays 8 bytes/row)."""
    d = load(spark, sf_dir, "documents")
    norm = F.lower(F.regexp_replace("text", r"\s+", " "))
    fp = F.conv(F.substring(F.md5(norm), 1, 15), 16, 10).cast("long")
    return (
        d.select(F.col("doc_id"), fp.alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("canonical_id"), F.count(F.lit(1)).alias("n_copies"))
    )


SPARK = {
    "text_token_count": token_count,
    "text_quality_score": quality_score,
    "text_lang_id": lang_id,
    "text_fingerprint": fingerprint,
    "dedup_exact": dedup_exact,
}

_STOP_HITS_SQL = " + ".join(
    f"(length(text) - length(replace(text, ' {sw} ', ''))) / {len(sw) + 2}"
    for sw in STOPWORDS
)

ORACLE = {
    "text_token_count": r"""
        SELECT doc_id,
               len(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) AS n_tokens,
               length(text) AS n_chars_measured
        FROM documents
    """,
    "text_quality_score": r"""
        SELECT doc_id,
               length(text) AS n_chars_measured,
               round((length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))
                     / cast(length(text) as double), 4) AS punct_ratio,
               round((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
                     / cast(length(text) as double), 4) AS digit_ratio,
               round((length(text) - length(regexp_replace(text, ' ', '', 'g')))
                     / cast(length(text) as double), 4) AS space_ratio
        FROM documents
    """,
    "text_lang_id": rf"""
        WITH scored AS (
            SELECT doc_id, lang AS label,
                   ({_STOP_HITS_SQL}) /
                   cast(len(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) as double)
                   AS ratio
            FROM documents
        )
        SELECT doc_id, label,
               CASE WHEN ratio >= 0.08 THEN 'en' ELSE 'other' END AS pred,
               round(ratio, 4) AS stop_ratio
        FROM scored
    """,
    "text_fingerprint": r"""
        SELECT doc_id,
               ('0x' || substring(md5(lower(regexp_replace(text, '\s+', ' ', 'g'))), 1, 15))::BIGINT AS fp
        FROM documents
    """,
    "dedup_exact": r"""
        SELECT ('0x' || substring(md5(lower(regexp_replace(text, '\s+', ' ', 'g'))), 1, 15))::BIGINT AS fp,
               min(doc_id) AS canonical_id,
               count(*) AS n_copies
        FROM documents
        GROUP BY fp
    """,
}
