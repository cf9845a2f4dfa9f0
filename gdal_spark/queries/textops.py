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


def decontaminate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (the standard eval-overlap sweep, e.g.
    GPT-3 appx. C / Gopher A.2): token 3-gram shingles of a benchmark
    set (here the deterministic doc_id%37==0 slice) are collected,
    deduped, and every training doc sharing >=1 gram is flagged with its
    hit count. 100 TB shape: the benchmark gram set is tiny (eval suites
    are ~1e6 rows) -> broadcast to the training-gram scan; one shuffle
    for the per-doc count; no self-join of the corpus."""
    d = load(spark, sf_dir, "documents")
    ts = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    grams = F.when(
        F.size(ts) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(ts) - F.lit(2)),
            lambda i: F.concat_ws(" ", F.slice(ts, i, 3)),
        ),
    ).otherwise(F.array())
    g = d.select("doc_id", F.explode(grams).alias("gram"))
    bench = g.filter(F.col("doc_id") % 37 == 0).select("gram").distinct()
    return (
        g.filter(F.col("doc_id") % 37 != 0)
        .join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("n_hits"))
    )


def hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/valid/test split: bucket = md5(doc_id) folded
    to int64 mod 100 (80/10/10). Hash-based splits are reproducible
    across runs and engines — no RNG state, no sampling seed drift — and
    pure Column md5 keeps the 100 TB scan UDF-free."""
    d = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
        ).cast("long")
        % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test")
    )
    return d.select(
        "doc_id", bucket.alias("bucket"), split.alias("split")
    )


# fixture docs carry no PII; plant a deterministic email + IPv4 per row in
# BOTH engines so the redaction path is exercised non-vacuously
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (C4/RefinedWeb-style regex pass): emails -> <EMAIL>,
    IPv4 -> <IP>; reports per-doc match counts and the md5-fold of the
    redacted text. Pure Column regexps (Java and RE2 agree on this
    pattern subset) — whole-stage codegen, linear scan at 100 TB."""
    d = load(spark, sf_dir, "documents")
    planted = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com at 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 ok"),
    )
    red = F.regexp_replace(
        F.regexp_replace(planted, _EMAIL_RE, "<EMAIL>"), _IPV4_RE, "<IP>"
    )
    return d.select(
        "doc_id",
        F.regexp_count(planted, F.lit(_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(planted, F.lit(_IPV4_RE)).cast("long").alias("n_ips"),
        F.conv(F.substring(F.md5(red), 1, 15), 16, 10)
        .cast("long")
        .alias("red_fp"),
    )


def boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detection (C4's repeated-line rule re-expressed on
    shingles): token 2-grams whose document frequency exceeds 50 are
    boilerplate; per doc report distinct grams, boilerplate grams, and
    the ratio. Scale shape: one explode + one groupBy on an 8-byte gram
    key for the DF pass, broadcast of the (small) boilerplate set back
    to the per-doc scan."""
    d = load(spark, sf_dir, "documents")
    ts = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    grams = F.when(
        F.size(ts) >= 2,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(ts) - F.lit(1)),
                lambda i: F.concat_ws(" ", F.slice(ts, i, 2)),
            )
        ),
    ).otherwise(F.array())
    g = d.select("doc_id", F.explode(grams).alias("gram"))
    hot = (
        g.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > 50)
        .select("gram")
    )
    per_doc = g.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams")
    )
    bp = (
        g.join(F.broadcast(hot), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_boiler"))
    )
    return (
        per_doc.join(bp, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("n_boiler", F.lit(0)).alias("n_boiler"),
            F.round(
                F.coalesce("n_boiler", F.lit(0)) / F.col("n_grams"), 4
            ).alias("boiler_ratio"),
        )
    )


_BLOCKLIST = ["src3", "src7", "src11"]


def source_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Provenance filtering: drop documents from blocklisted sources
    (broadcast anti-join — the blocklist is always driver-small) and
    report surviving counts per source."""
    d = load(spark, sf_dir, "documents")
    bl = spark.createDataFrame([(s,) for s in _BLOCKLIST], "source string")
    return (
        d.join(F.broadcast(bl), "source", "left_anti")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms (deterministic tie-break by
    term): tf from one explode+groupBy, document frequency from a
    second distinct groupBy (broadcast back), idf = ln(N/df). The
    per-doc rank window partitions on doc_id — thousands of tiny
    partitions, never a global sort."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    n_docs = d.count()
    ts = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    tok = d.select("doc_id", F.explode(ts).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (
        tok.distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    scored = tf.join(F.broadcast(dfreq), "term").select(
        "doc_id",
        "term",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 4)
        .alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "score", F.col("rnk").cast("int").alias("rnk"))
    )


SPARK = {
    "text_token_count": token_count,
    "text_quality_score": quality_score,
    "text_lang_id": lang_id,
    "text_fingerprint": fingerprint,
    "dedup_exact": dedup_exact,
    "text_gopher_filters": gopher_filters,
    "decontaminate_ngrams": decontaminate_ngrams,
    "hash_split": hash_split,
    "pii_redact": pii_redact,
    "boilerplate_ngrams": boilerplate_ngrams,
    "source_blocklist_filter": source_blocklist_filter,
    "tfidf_topterms": tfidf_topterms,
}

_BOILER_ORACLE = r"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ts
        FROM documents
    ),
    idx AS (
        SELECT doc_id, ts, unnest(range(1, greatest(len(ts), 1))) AS i
        FROM t
    ),
    g AS (
        SELECT DISTINCT doc_id, array_to_string(ts[i:i+1], ' ') AS gram
        FROM idx
    ),
    hot AS (
        SELECT gram FROM g GROUP BY gram HAVING count(*) > 50
    ),
    per_doc AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY doc_id),
    bp AS (
        SELECT g.doc_id, count(*) AS n_boiler
        FROM g JOIN hot USING (gram) GROUP BY g.doc_id
    )
    SELECT p.doc_id, CAST(p.n_grams AS BIGINT) AS n_grams,
           CAST(coalesce(bp.n_boiler, 0) AS BIGINT) AS n_boiler,
           round(coalesce(bp.n_boiler, 0) / CAST(p.n_grams AS DOUBLE), 4)
               AS boiler_ratio
    FROM per_doc p LEFT JOIN bp ON bp.doc_id = p.doc_id
"""

_BLOCKLIST_ORACLE = """
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs
    FROM documents
    WHERE source NOT IN ('src3', 'src7', 'src11')
    GROUP BY source
"""

_TFIDF_ORACLE = r"""
    WITH t AS (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(text, '\s+'),
                                  x -> x <> '')) AS term
        FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
    n AS (SELECT count(*) AS n_docs FROM documents),
    dfreq AS (
        SELECT term, count(DISTINCT doc_id) AS df FROM t GROUP BY term
    ),
    scored AS (
        SELECT tf.doc_id, tf.term,
               round(tf.tf * ln(n.n_docs / CAST(dfreq.df AS DOUBLE)), 4)
                   AS score
        FROM tf JOIN dfreq USING (term) CROSS JOIN n
    ),
    ranked AS (
        SELECT doc_id, term, score,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, term) AS rnk
        FROM scored
    )
    SELECT doc_id, term, score, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 3
"""

_DECONTAM_ORACLE = r"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ts
        FROM documents
    ),
    idx AS (
        SELECT doc_id, ts, unnest(range(1, greatest(len(ts) - 1, 1))) AS i
        FROM t
    ),
    g AS (SELECT doc_id, array_to_string(ts[i:i+2], ' ') AS gram FROM idx),
    bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 37 = 0)
    SELECT g.doc_id, count(DISTINCT g.gram) AS n_hits
    FROM g JOIN bench USING (gram)
    WHERE g.doc_id % 37 <> 0
    GROUP BY g.doc_id
"""

_HASH_SPLIT_ORACLE = r"""
    WITH b AS (
        SELECT doc_id,
               ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                   % 100 AS bucket
        FROM documents
    )
    SELECT doc_id, bucket,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'valid'
                ELSE 'test' END AS split
    FROM b
"""

_PII_ORACLE = r"""
    WITH p AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com at 10.0.'
                    || CAST(doc_id % 256 AS VARCHAR) || '.7 ok' AS planted
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(planted,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
               AS n_emails,
           CAST(len(regexp_extract_all(planted,
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
           ('0x' || substring(md5(
               regexp_replace(
                   regexp_replace(planted,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g'),
                   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')
           ), 1, 15))::BIGINT AS red_fp
    FROM p
"""

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
    "decontaminate_ngrams": _DECONTAM_ORACLE,
    "hash_split": _HASH_SPLIT_ORACLE,
    "pii_redact": _PII_ORACLE,
    "boilerplate_ngrams": _BOILER_ORACLE,
    "source_blocklist_filter": _BLOCKLIST_ORACLE,
    "tfidf_topterms": _TFIDF_ORACLE,
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


def canonicalize_url(col):
    """URL canonicalization for crawl dedup, pure Column (codegen):
    lowercase scheme+host, strip www., drop the fragment, drop utm_*
    query params (removing a dangling '?'/'&'), strip a trailing slash.
    The standard normalization pass before URL-level dedup in
    common-crawl-style pipelines."""
    u = col
    # lowercase scheme://host, keep path case
    u = F.concat(
        F.lower(F.regexp_extract(u, r"^([^/]+//[^/]+)", 1)),
        F.regexp_extract(u, r"^[^/]+//[^/]+(.*)$", 1),
    )
    u = F.regexp_replace(u, r"^(https?://)www\.", r"$1")
    u = F.regexp_replace(u, r"#.*$", "")
    u = F.regexp_replace(u, r"([?&])utm_[^&]*", "$1")
    u = F.regexp_replace(u, r"[?&]+$", "")
    u = F.regexp_replace(u, r"\?&", "?")
    u = F.regexp_replace(u, r"/$", "")
    return u


def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup: synthetic crawl URLs (scheme/host case noise,
    www., utm_ params, fragments, trailing slashes) canonicalize to
    doc_id%50 groups; one groupBy on the canonical key — the same
    shape as exact text dedup, zero UDFs."""
    docs = load(spark, sf_dir, "documents")
    d = F.col("doc_id")
    raw = F.concat(
        F.lit("HTTPS://WWW."), F.col("source"), F.lit(".Example.com/p"),
        (d % 50).cast("string"),
        F.when(d % 3 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(d % 2 == 0,
               F.concat(F.lit("?utm_source=x"),
                        F.when(d % 4 == 0, F.lit("&utm_c=y"))
                        .otherwise(F.lit("")))).otherwise(F.lit("")),
        F.when(d % 5 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    canon = canonicalize_url(raw)
    return (
        docs.select(canon.alias("url"))
        .groupBy("url")
        .agg(F.count("*").alias("n"))
        .select("url", F.col("n").cast("long").alias("n"))
    )


SPARK["url_canonical_dedup"] = url_canonical_dedup
ORACLE["url_canonical_dedup"] = r"""
    SELECT 'https://' || lower(source) || '.example.com/p'
               || (doc_id % 50) AS url,
           count(*) AS n
    FROM documents
    GROUP BY url
"""
