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


def gopher_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style document quality rules (Rae et al. 2021 §A1.1
    heuristics re-expressed on the fixture's scale): word-count bounds,
    mean-word-length band, repetition (distinct-token ratio) floor, and
    stopword presence; ``keep`` = all rules pass. Pure Column expressions
    (array_join/array_distinct, no HOF lambdas, no UDF) — whole-stage
    codegen, the exact shape a 100 TB filter sweep wants."""
    d = load(spark, sf_dir, "documents")
    ts = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    n = F.size(ts)
    mean_wlen = F.length(F.array_join(ts, "")) / n
    distinct_ratio = F.size(F.array_distinct(ts)) / n
    stop_ok = (
        F.array_contains(ts, "the").cast("int") + F.array_contains(ts, "a").cast("int")
    ) >= 1
    r_count = (n >= 20) & (n <= 90)
    r_wlen = (mean_wlen >= 3.0) & (mean_wlen <= 8.0)
    r_rep = distinct_ratio >= 0.35
    out = d.select(
        "doc_id",
        n.alias("n_words"),
        F.round(mean_wlen, 4).alias("mean_wlen"),
        F.round(distinct_ratio, 4).alias("distinct_ratio"),
        r_count.alias("r_count"),
        r_wlen.alias("r_wlen"),
        r_rep.alias("r_rep"),
        stop_ok.alias("r_stop"),
        (r_count & r_wlen & r_rep & stop_ok).alias("keep"),
    )
    return out


SPARK = {
    "text_token_count": token_count,
    "text_quality_score": quality_score,
    "text_lang_id": lang_id,
    "text_fingerprint": fingerprint,
    "dedup_exact": dedup_exact,
    "text_gopher_filters": gopher_filters,
}

_GOPHER_ORACLE = r"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ts
        FROM documents
    ),
    m AS (
        SELECT doc_id,
               len(ts) AS n_words,
               length(list_aggregate(ts, 'string_agg', '')) / len(ts) AS mean_wlen,
               len(list_distinct(ts)) / CAST(len(ts) AS DOUBLE) AS distinct_ratio,
               (list_contains(ts, 'the') OR list_contains(ts, 'a')) AS r_stop
        FROM t
    )
    SELECT doc_id, n_words,
           round(mean_wlen, 4) AS mean_wlen,
           round(distinct_ratio, 4) AS distinct_ratio,
           (n_words >= 20 AND n_words <= 90) AS r_count,
           (mean_wlen >= 3.0 AND mean_wlen <= 8.0) AS r_wlen,
           (distinct_ratio >= 0.35) AS r_rep,
           r_stop,
           ((n_words >= 20 AND n_words <= 90) AND (mean_wlen >= 3.0 AND mean_wlen <= 8.0)
            AND distinct_ratio >= 0.35 AND r_stop) AS keep
    FROM m
"""

_STOP_HITS_SQL = " + ".join(
    f"(length(text) - length(replace(text, ' {sw} ', ''))) / {len(sw) + 2}"
    for sw in STOPWORDS
)

ORACLE = {
    "text_gopher_filters": _GOPHER_ORACLE,
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
