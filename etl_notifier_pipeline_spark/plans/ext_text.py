"""Text-analysis queries (SURVEY §2.10 X3) over the documents table.

Shared SQL fragments mirror extensions.text exactly: the md5-prefix
token hash and the rolling-fold fingerprint are engine-portable, so
even the fingerprinting operator has a true value-level oracle.
"""

from __future__ import annotations

from etl_notifier_pipeline_spark.caching import tracked_persist
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from etl_notifier_pipeline_spark.catalog import load_table
from etl_notifier_pipeline_spark.extensions import text as X
from etl_notifier_pipeline_spark.plans.registry import register

P = X.HASH_MOD
# DuckDB twin of extensions.text.token_hash.
DUCK_HASH = f"(('0x'||substr(md5({{x}}),1,15))::BIGINT % {P})"


@register(
    "x01_token_stats",
    category="text_analysis",
    oracle="""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*) AS avg_tokens,
       MAX(n_chars) AS max_chars
FROM documents
GROUP BY lang
""",
)
def x01_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token statistics per language facet — the first pass of
    any pretraining-data audit. Narrow scan + one small shuffle."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = X.token_count("text")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tok).alias("total_tokens"),
        (F.sum(n_tok).cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
        F.max("n_chars").alias("max_chars"),
    )


@register(
    "x02_term_frequency",
    category="text_analysis",
    oracle="""
SELECT lang, token, n, rank FROM (
  SELECT lang, token, n,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, token) AS rank
  FROM (
    SELECT lang, token, COUNT(*) AS n
    FROM (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY lang, token
  )
) WHERE rank <= 10
""",
)
def x02_term_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 tokens per language: explode -> partial-agg count ->
    ranking window (SURVEY X3 tf pipeline)."""
    d = load_table(spark, sf_dir, "documents")
    return X.term_frequency(d, "text", by="lang", k=10)


@register(
    "x03_quality_features",
    category="text_analysis",
    oracle="""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         / len(string_split(text, ' ')) AS type_token_ratio,
       CAST(len(list_filter(string_split(text, ' '),
            t -> t IN ('the','a','of','and','to','in','is','it'))) AS DOUBLE)
         / len(string_split(text, ' ')) AS stopword_ratio,
       CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
         / len(string_split(text, ' ')) AS mean_token_len
FROM documents
""",
)
def x03_quality_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features (length / diversity / stopword
    ratios) — the cheap pre-filter stage of a data pipeline; pure
    projection, no shuffle, no Python."""
    d = load_table(spark, sf_dir, "documents")
    return X.quality_features(d, "text")


@register(
    "x04_doc_fingerprint",
    category="text_analysis",
    oracle=f"""
SELECT doc_id,
       list_reduce(list_transform(string_split(text, ' '),
                   x -> {DUCK_HASH.format(x='x')}),
                   (acc, h) -> (acc * 31 + h) % {P}) AS fingerprint
FROM documents
""",
)
def x04_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling document fingerprint (content identity
    that, unlike a set hash, distinguishes permuted token order)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", X.doc_fingerprint("text").alias("fingerprint"))


_MARKERS = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "de"),
    "fr": ("le", "la", "et"),
    "de": ("der", "die", "und"),
    "zh": ("zh",),
}
_SCORE_SQL = {
    lang: "len(list_filter(string_split(text, ' '), t -> t IN ("
    + ", ".join(f"'{w}'" for w in words)
    + ")))"
    for lang, words in _MARKERS.items()
}
_BEST_SQL = "greatest(" + ", ".join(_SCORE_SQL[l] for l in sorted(_SCORE_SQL)) + ")"
_PRED_SQL = "CASE " + " ".join(
    f"WHEN {_SCORE_SQL[l]} = {_BEST_SQL} THEN '{l}'" for l in sorted(_SCORE_SQL)
) + " END"


@register(
    "x05_lang_id",
    category="text_analysis",
    oracle=f"""
SELECT doc_id,
       {", ".join(f"{_SCORE_SQL[l]} AS score_{l}" for l in sorted(_SCORE_SQL))},
       {_PRED_SQL} AS predicted_lang
FROM documents
""",
)
def x05_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language-ID heuristic: N parallel HOF score
    reductions + argmax, alphabetic tie-break (see
    extensions.text.lang_id for the production-shape notes)."""
    d = load_table(spark, sf_dir, "documents")
    return X.lang_id(d, "text")


@register(
    "x07_bpe_token_budget",
    category="text_analysis",
    oracle=f"""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(len(regexp_extract_all(text, '{X.BPE_PATTERN}'))) AS BIGINT)
         AS total_bpe_tokens,
       CAST(SUM(len(regexp_extract_all(text, '{X.BPE_PATTERN}'))) AS DOUBLE)
         / COUNT(*) AS avg_bpe_tokens,
       CAST(MAX(len(regexp_extract_all(text, '{X.BPE_PATTERN}'))) AS BIGINT)
         AS max_bpe_tokens
FROM documents
GROUP BY lang
""",
)
def x07_bpe_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM token-budget estimate per language via the BPE pre-tokenizer
    regex (letter/digit/punct runs with an optional leading space) —
    the standard proxy when the merge table isn't in play. The regex
    runs JVM-side (``regexp_extract_all``); one narrow scan, one small
    shuffle. Lookahead-free pattern keeps Spark and DuckDB (RE2)
    token-for-token identical."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = X.bpe_token_count("text")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tok).alias("total_bpe_tokens"),
        (F.sum(n_tok).cast("double") / F.count(F.lit(1))).alias("avg_bpe_tokens"),
        F.max(n_tok).cast("bigint").alias("max_bpe_tokens"),
    )


@register(
    "x08_tfidf_terms",
    category="text_analysis",
    oracle="""
WITH tfc AS (
  SELECT doc_id, token, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
  GROUP BY doc_id, token
),
dfc AS (SELECT token, COUNT(*) AS df FROM tfc GROUP BY token),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT doc_id, token, tf, df, tfidf_ratio, rank FROM (
  SELECT tfc.doc_id, tfc.token, tfc.tf, dfc.df,
         CAST(tfc.tf * n.n_docs AS DOUBLE) / dfc.df AS tfidf_ratio,
         ROW_NUMBER() OVER (
           PARTITION BY tfc.doc_id
           ORDER BY CAST(tfc.tf * n.n_docs AS DOUBLE) / dfc.df DESC, tfc.token
         ) AS rank
  FROM tfc JOIN dfc USING (token) CROSS JOIN n
) WHERE rank <= 3
""",
)
def x08_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by ratio-form tf-idf
    (log-free so the score is bit-exact cross-engine; ranking is
    unchanged since log is monotone). Two counting aggs + one ranking
    window; the corpus-size scalar rides in as a literal."""
    d = load_table(spark, sf_dir, "documents")
    return X.tfidf_top_terms(d, "text", k=3)


_DENY = ("hash", "spark", "join")
_DENY_SQL = ", ".join(f"'{w}'" for w in _DENY)


@register(
    "x09_term_scrub",
    category="text_analysis",
    oracle=f"""
SELECT doc_id,
       array_to_string(list_transform(string_split(text, ' '),
         t -> CASE WHEN t IN ({_DENY_SQL}) THEN '<MASKED>' ELSE t END), ' ')
         AS scrubbed,
       len(list_filter(string_split(text, ' '),
         t -> t IN ({_DENY_SQL}))) AS n_masked
FROM documents
WHERE doc_id % 7 = 0
""",
)
def x09_term_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deny-list scrubbing (the content-policy masking pass of a
    training-data pipeline): token-level replacement via a pure HOF
    transform + rejoin, masked-count via a HOF filter — no regex
    backtracking, no Python, zero shuffle; trivially retargetable to a
    broadcast deny-table at 100 TB."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    toks = F.split(F.col("text"), " ")
    masked = F.transform(
        toks,
        lambda t: F.when(t.isin(*_DENY), F.lit("<MASKED>")).otherwise(t),
    )
    return d.select(
        "doc_id",
        F.array_join(masked, " ").alias("scrubbed"),
        F.size(F.filter(toks, lambda t: t.isin(*_DENY))).alias("n_masked"),
    )


@register(
    "x10_stratified_split",
    category="sampling",
    oracle=f"""
SELECT lang, split, COUNT(*) AS n_docs FROM (
  SELECT lang,
         CASE WHEN {DUCK_HASH.format(x='CAST(doc_id AS VARCHAR)')} % 100 < 80
                THEN 'train'
              WHEN {DUCK_HASH.format(x='CAST(doc_id AS VARCHAR)')} % 100 < 90
                THEN 'val'
              ELSE 'test' END AS split
  FROM documents
) GROUP BY lang, split
""",
)
def x10_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible train/val/test assignment by key hash (never
    rand(): retries and new data must not move existing rows across
    splits) — rolled up per (lang, split). The assignment itself is a
    row-local projection, zero shuffle at any scale."""
    from etl_notifier_pipeline_spark.extensions.sampling import stratified_split

    d = load_table(spark, sf_dir, "documents")
    return (
        stratified_split(d, "doc_id")
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "x11_sequence_packing",
    category="sampling",
    oracle="""
SELECT doc_id, lang, n_tokens,
       CAST((cum - n_tokens) // 4096 AS BIGINT) AS bin_id
FROM (
  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens,
         SUM(len(string_split(text, ' '))) OVER (
           PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum
  FROM documents
)
""",
)
def x11_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequential packing of documents into fixed token-budget
    bins (4096) per language — the start-offset form used to batch
    LLM training sequences: bin = floor(start_token / budget), where
    start_token is the running total before the doc. One running-sum
    window per stratum; integer arithmetic, bit-exact."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = X.token_count("text")
    w = (
        W.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return d.select(
        "doc_id",
        "lang",
        n_tok.alias("n_tokens"),
        F.sum(n_tok).over(w).alias("cum"),
    ).select(
        "doc_id",
        "lang",
        "n_tokens",
        ((F.col("cum") - F.col("n_tokens")) / F.lit(4096))
        .cast("long")
        .alias("bin_id"),
    )


# Word n-gram SQL (1-based lists; [a,b) range — mirrors
# extensions.dedup.shingles exactly).
_TOKS = "string_split(text, ' ')"


def _grams_sql(n: int) -> str:
    joined = " || ' ' || ".join(f"{_TOKS}[i+{j}]" for j in range(n))
    return f"list_transform(range(1, len({_TOKS}) - {n - 2}), i -> {joined})"


@register(
    "x13_repetition_ratio",
    category="text_analysis",
    oracle=f"""
SELECT doc_id,
       n_2grams,
       CASE WHEN n_2grams > 0
            THEN CAST(n_2grams - d_2grams AS DOUBLE) / n_2grams END
         AS dup_2gram_frac,
       n_3grams,
       CASE WHEN n_3grams > 0
            THEN CAST(n_3grams - d_3grams AS DOUBLE) / n_3grams END
         AS dup_3gram_frac,
       CASE WHEN n_2grams > 0
            THEN CAST(n_2grams - d_2grams AS DOUBLE) / n_2grams > 0.2
            ELSE FALSE END AS repetitive
FROM (
  SELECT doc_id,
         len({_grams_sql(2)}) AS n_2grams,
         len(list_distinct({_grams_sql(2)})) AS d_2grams,
         len({_grams_sql(3)}) AS n_3grams,
         len(list_distinct({_grams_sql(3)})) AS d_3grams
  FROM documents
)
""",
)
def x13_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals: the fraction of
    duplicate word 2-grams / 3-grams per document, plus a repetitive
    flag (dup-2gram fraction > 0.2) — the standard cheap filter for
    boilerplate/spam in a pretraining corpus. Pure per-row HOF
    arithmetic (int/int division in double — bit-exact), zero shuffle
    at any scale."""
    d = load_table(spark, sf_dir, "documents")
    return X.repetition_features(d, "text")


# Benchmark ("eval set") sources for the decontamination check.
_EVAL_SOURCES = ("src0", "src1")
_EVAL_SQL = ", ".join(f"'{s}'" for s in _EVAL_SOURCES)
_GRAMS5_HASHED = (
    f"list_distinct(list_transform({_grams_sql(5)}, "
    f"s -> {DUCK_HASH.format(x='s')}))"
)


@register(
    "x14_decontamination",
    category="text_analysis",
    oracle=f"""
WITH ev AS (
  SELECT DISTINCT unnest({_GRAMS5_HASHED}) AS shingle
  FROM documents WHERE source IN ({_EVAL_SQL})
),
ci AS (
  SELECT doc_id, unnest({_GRAMS5_HASHED}) AS shingle
  FROM documents WHERE source NOT IN ({_EVAL_SQL})
)
SELECT ci.doc_id, COUNT(*) AS n_contaminated_shingles
FROM ci JOIN ev ON ci.shingle = ev.shingle
GROUP BY ci.doc_id
""",
)
def x14_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs sharing any word
    5-gram with the eval-set sources, with the count of distinct
    overlapping 5-grams — the n-gram-collision check every training
    pipeline runs before a data release.

    Scale shape: both sides hash their 5-grams to 8-byte ints (the
    engine-portable md5-prefix hash), the eval side dedups to one
    row per distinct shingle and BROADCASTS (eval benchmarks are
    tiny next to the corpus), so the corpus side never shuffles —
    one narrow scan + a broadcast hash join + per-doc count."""
    d = load_table(spark, sf_dir, "documents")
    return X.contamination_counts(
        d, F.col("source").isin(*_EVAL_SOURCES), "text", n=5
    )


@register(
    "x15_weighted_sample",
    category="sampling",
    oracle=f"""
SELECT doc_id, lang, n_tokens, sample_key
FROM (
  SELECT doc_id, lang,
         len({_TOKS}) AS n_tokens,
         {DUCK_HASH.format(x="CAST(doc_id AS VARCHAR) || ':ws'")} % 256
           AS sample_key
  FROM documents
)
WHERE sample_key < least(256, n_tokens)
""",
)
def x15_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted deterministic sampling: keep each document
    with probability min(1, n_tokens/256) — longer docs sampled
    proportionally more — decided by a salted key hash, never rand()
    (retries and incremental data must not flip prior decisions; the
    x10 split contract). Pure integer compare, zero shuffle."""
    from etl_notifier_pipeline_spark.extensions.sampling import weighted_sample

    d = load_table(spark, sf_dir, "documents")
    staged = d.select("doc_id", "lang", X.token_count("text").alias("n_tokens"))
    return weighted_sample(staged, "doc_id", F.col("n_tokens")).select(
        "doc_id", "lang", "n_tokens", "sample_key"
    )


@register(
    "x17_pii_redact",
    category="text_analysis",
    oracle="""
SELECT event_id,
       regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS redacted_props,
       len(regexp_extract_all(props, '[0-9]+')) AS n_redactions
FROM events
WHERE event_id % 11 = 0
""",
)
def x17_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style redaction: mask every digit run in the payload and
    count the redactions — the pattern-scrub pass (SSNs, phone
    numbers, account ids) of a data-release pipeline. Pure
    ``regexp_replace``/``regexp_extract_all`` projection (RE2-safe
    pattern, identical on both engines), zero shuffle; a production
    deny-pattern list is a union of alternations in the same shape."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 11 == 0)
    return ev.select(
        "event_id",
        F.regexp_replace("props", "[0-9]+", "<NUM>").alias("redacted_props"),
        F.size(
            F.regexp_extract_all("props", F.lit("[0-9]+"), F.lit(0))
        ).alias("n_redactions"),
    )


@register(
    "x16_curriculum_bins",
    category="sampling",
    oracle="""
SELECT doc_id, lang, type_token_ratio,
       NTILE(4) OVER (PARTITION BY lang
                      ORDER BY type_token_ratio DESC, doc_id) AS difficulty_bin
FROM (
  SELECT doc_id, lang,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / len(string_split(text, ' ')) AS type_token_ratio
  FROM documents
)
""",
)
def x16_curriculum_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum binning: quartile difficulty bins per language by
    lexical diversity (type/token ratio), doc_id tie-break so NTILE is
    total-ordered and deterministic. One window per stratum. At 100 TB
    the same semantics come from joining approx-quantile boundaries
    (q39's sketch) instead of a per-stratum sort; NTILE is the exact
    spec both implement."""
    d = load_table(spark, sf_dir, "documents")
    ttr = (
        X.distinct_token_count("text").cast("double") / X.token_count("text")
    )
    w = W.partitionBy("lang").orderBy(
        F.col("type_token_ratio").desc(), "doc_id"
    )
    return d.select(
        "doc_id", "lang", ttr.alias("type_token_ratio")
    ).withColumn("difficulty_bin", F.ntile(4).over(w))


@register(
    "x12_column_profile",
    category="profiling",
    oracle="""
SELECT 'o_totalprice' AS column_name,
       COUNT(*) AS n_rows,
       COUNT(o_totalprice) AS n_non_null,
       COUNT(DISTINCT o_totalprice) AS n_distinct,
       CAST(MIN(o_totalprice) AS DOUBLE) AS min_val,
       CAST(MAX(o_totalprice) AS DOUBLE) AS max_val,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_val
FROM orders
UNION ALL
SELECT 'o_custkey',
       COUNT(*), COUNT(o_custkey), COUNT(DISTINCT o_custkey),
       CAST(MIN(o_custkey) AS DOUBLE), CAST(MAX(o_custkey) AS DOUBLE),
       CAST(SUM(CAST(o_custkey AS DECIMAL(12,2))) AS DOUBLE)
FROM orders
""",
)
def x12_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data profiling (the engine's ``df.summary()`` twin): per-column
    row/null/distinct counts + min/max + exact decimal sum, one
    aggregation pass PER OUTPUT ROW but one table scan total — Spark
    computes all columns' aggregates in a single groupBy-less agg and
    unpivots, so a 100-column profile is still one scan + one tiny
    shuffle-free reduce."""
    o = load_table(spark, sf_dir, "orders")
    cols = ["o_totalprice", "o_custkey"]
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n_rows"),
            F.count(F.col(c)).alias(f"{c}__n_non_null"),
            F.countDistinct(F.col(c)).alias(f"{c}__n_distinct"),
            F.min(F.col(c)).cast("double").alias(f"{c}__min_val"),
            F.max(F.col(c)).cast("double").alias(f"{c}__max_val"),
            F.sum(F.col(c).cast("decimal(12,2)")).cast("double").alias(f"{c}__sum_val"),
        ]
    wide = o.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col(f"{c}__n_rows").alias("n_rows"),
            F.col(f"{c}__n_non_null").alias("n_non_null"),
            F.col(f"{c}__n_distinct").alias("n_distinct"),
            F.col(f"{c}__min_val").alias("min_val"),
            F.col(f"{c}__max_val").alias("max_val"),
            F.col(f"{c}__sum_val").alias("sum_val"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


@register(
    "x18_chunk_windows",
    category="text_analysis",
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
e AS (SELECT doc_id, toks, unnest(range(0, len(toks), 4)) AS start FROM t)
SELECT doc_id,
       start // 4 AS chunk_idx,
       CAST(len(toks[start + 1 : start + 8]) AS BIGINT) AS chunk_tokens,
       array_to_string(toks[start + 1 : start + 8], ' ') AS chunk_text
FROM e
""",
)
def x18_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (window=8, stride=4 — 50%
    overlap), the context-window slicing pass of a pretraining
    pipeline. Pure projection + generator: zero shuffle; see
    extensions.text.chunk_token_windows."""
    d = load_table(spark, sf_dir, "documents")
    return X.chunk_token_windows(d, window=8, stride=4)


@register(
    "x19_chunk_dup_stats",
    category="text_analysis",
    oracle="""
WITH t AS (SELECT source, string_split(text, ' ') AS toks FROM documents),
e AS (SELECT source, toks, unnest(range(0, len(toks), 4)) AS start FROM t),
c AS (SELECT source,
             md5(array_to_string(toks[start + 1 : start + 8], ' ')) AS h
      FROM e)
SELECT source,
       COUNT(*) AS n_chunks,
       COUNT(DISTINCT h) AS n_unique,
       1.0 - CAST(COUNT(DISTINCT h) AS DOUBLE) / COUNT(*) AS dup_ratio
FROM c
GROUP BY source
""",
)
def x19_chunk_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level duplication audit per source: chunk the corpus
    (x18's operator), hash each chunk, and report the distinct/dup
    ratio — the window-granularity twin of document dedup, catching
    boilerplate that whole-doc hashing misses.

    Scale shape: the shuffle carries 32-byte md5 hashes, never chunk
    text; countDistinct is Spark's two-phase partial-distinct
    aggregate."""
    d = load_table(spark, sf_dir, "documents")
    chunks = X.chunk_token_windows(
        d.select(F.col("source"), "text"), doc_id_col="source",
        window=8, stride=4,
    )
    return (
        chunks.select("source", F.md5("chunk_text").alias("h"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.countDistinct("h").alias("n_unique"),
            (
                F.lit(1.0)
                - F.countDistinct("h").cast("double") / F.count(F.lit(1))
            ).alias("dup_ratio"),
        )
    )


@register(
    "x20_shard_balance",
    category="sampling",
    oracle=f"""
WITH s AS (
  SELECT {DUCK_HASH.format(x="CAST(doc_id AS VARCHAR) || ':shard'")} % 64
           AS shard_id,
         n_chars
  FROM documents
)
SELECT shard_id, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM s GROUP BY shard_id
""",
)
def x20_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 64-way output-shard assignment + balance audit
    (docs and bytes per shard) — validates the hash layout a
    partitionBy write would use. The assignment itself is a pure
    projection; the audit aggregate is the only (tiny) shuffle."""
    from etl_notifier_pipeline_spark.extensions.sampling import shard_assignment

    d = load_table(spark, sf_dir, "documents")
    return (
        shard_assignment(d, "doc_id", n_shards=64)
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "x21_source_mixture",
    category="sampling",
    oracle=f"""
WITH s AS (
  SELECT source, n_chars,
         {DUCK_HASH.format(x="CAST(doc_id AS VARCHAR) || ':mix'")} % 10000
           AS b,
         CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 2500
              WHEN source IN ('src5','src6','src7','src8','src9') THEN 5000
              ELSE 10000 END AS threshold
  FROM documents
)
SELECT source, COUNT(*) AS n_kept,
       CAST(SUM(n_chars) AS BIGINT) AS kept_chars
FROM s WHERE b < threshold
GROUP BY source
""",
)
def x21_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture resampling audit: downsample five sources to 25%, five
    to 50%, keep the rest, and report surviving docs/chars per source
    — the corpus-mixture knob of a pretraining pipeline, as a
    deterministic zero-shuffle filter (see
    extensions.sampling.mixture_resample; thresholds are driver-side
    rounded integers, so the oracle mirrors them as integer literals).
    """
    from etl_notifier_pipeline_spark.extensions.sampling import mixture_resample

    d = load_table(spark, sf_dir, "documents")
    rates = {f"src{i}": 0.25 for i in range(5)}
    rates.update({f"src{i}": 0.5 for i in range(5, 10)})
    kept = mixture_resample(d, "source", "doc_id", rates)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("kept_chars"),
    )


@register(
    "x22_block_pack_spans",
    category="sampling",
    oracle="""
WITH s AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n,
         SUM(len(string_split(text, ' '))) OVER (
           ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum
  FROM documents
),
b AS (
  SELECT doc_id, n, CAST(cum - n AS BIGINT) AS strt FROM s WHERE n > 0
),
e AS (
  SELECT doc_id, n, strt,
         unnest(range(strt // 4096, (strt + n - 1) // 4096 + 1)) AS blk
  FROM b
)
SELECT doc_id,
       CAST(blk AS BIGINT) AS block_id,
       CAST(GREATEST(strt, blk * 4096) - blk * 4096 AS BIGINT)
         AS offset_in_block,
       CAST(GREATEST(strt, blk * 4096) - strt AS BIGINT) AS doc_offset,
       CAST(LEAST(strt + n, (blk + 1) * 4096)
            - GREATEST(strt, blk * 4096) AS BIGINT) AS tokens_in_block
FROM e
""",
)
def x22_block_pack_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style fixed-block packing: the corpus token stream (docs
    concatenated in doc_id order) cut into 4096-token blocks, one row
    per (doc, block) span — documents cross block boundaries, token
    conservation is exact (vs x11's greedy whole-doc bins).

    The oracle states the spec as ONE global running-sum window (fine
    at sf0.01); the engine computes the identical prefix sums with the
    grouped two-phase form that survives 100 TB (see
    extensions.sampling.block_pack_spans). group_size=128 forces the
    multi-group path on the 500-doc fixture. All-integer output."""
    from etl_notifier_pipeline_spark.extensions.sampling import (
        block_pack_spans,
    )

    d = load_table(spark, sf_dir, "documents")
    docs = d.select("doc_id", X.token_count("text").alias("n_tokens"))
    return block_pack_spans(
        docs, "doc_id", "n_tokens", block=4096, group_size=128
    )


@register(
    "x23_oov_rate",
    category="text_analysis",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
vocab AS (
  SELECT tok FROM (
    SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok
    ORDER BY c DESC, tok LIMIT 16
  )
)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS oov_rate
FROM tok t LEFT JOIN vocab v ON v.tok = t.tok
GROUP BY t.doc_id
""",
)
def x23_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus top-16
    induced vocabulary — the tokenizer-coverage / domain-mismatch
    quality filter (see extensions.text.oov_rate for the scale shape:
    persisted token frame, broadcast vocabulary, map-side partial
    counts)."""
    from etl_notifier_pipeline_spark.extensions.text import oov_rate

    d = load_table(spark, sf_dir, "documents")
    return oov_rate(d, "doc_id", "text", vocab_size=16)


@register(
    "x24_per_source_cap",
    category="sampling",
    oracle=f"""
SELECT doc_id, source, cap_rank FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY {DUCK_HASH.format(x="doc_id::VARCHAR || ':cap'")}, doc_id
         ) AS cap_rank
  FROM documents
) WHERE cap_rank <= 15
""",
)
def x24_per_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain corpus cap: keep the 15 hash-lowest documents of each
    source — deterministic anti-domination sampling (see
    extensions.sampling.per_source_cap; WindowGroupLimit's partial
    pass absorbs hot-domain skew map-side, asserted in
    tests/test_plan_shapes.py)."""
    from etl_notifier_pipeline_spark.extensions.sampling import (
        per_source_cap,
    )

    d = load_table(spark, sf_dir, "documents")
    return per_source_cap(d, "source", "doc_id", cap=15).select(
        "doc_id", "source", "cap_rank"
    )


@register(
    "x25_quality_gate",
    category="text_analysis",
    oracle="""
SELECT doc_id, n_tokens, ttr_milli, stop_milli, score, score >= 640 AS keep
FROM (
  SELECT doc_id, n_tokens,
         (1000 * n_distinct) // n_tokens AS ttr_milli,
         (1000 * n_stop) // n_tokens AS stop_milli,
         (1000 * n_distinct) // n_tokens
           + 2 * ((1000 * n_stop) // n_tokens)
           + LEAST(n_tokens, 200) AS score
  FROM (
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_distinct,
           len(list_filter(string_split(text, ' '),
               t -> t IN ('the','a','of','and','to','in','is','it')))
             AS n_stop
    FROM documents
  )
)
""",
)
def x25_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-style quality gate: a weighted linear score over
    lexical-diversity, stopword-naturalness, and length features,
    thresholded into a keep/drop decision — the shape of a fasttext-
    style quality filter, restricted to INTEGER milli-unit arithmetic
    ((1000*x) div n, integer weights, LEAST cap) so the score and the
    gate are bit-exact cross-engine instead of drifting on float
    transcendentals. Swapping in learned float weights changes only
    the constants, not the plan.

    Scale shape: pure per-row projection — zero shuffle, whole-stage
    codegen, embarrassingly parallel; the token array is built once
    per row and all three features read it."""
    d = load_table(spark, sf_dir, "documents")
    stop_list = ", ".join(f"'{w}'" for w in X.STOPWORDS)
    feats = d.select(
        "doc_id",
        F.size(X.tokens("text")).alias("n_tokens"),
        F.size(F.array_distinct(X.tokens("text"))).alias("n_distinct"),
        F.size(
            F.expr(f"filter(split(text, ' '), t -> t IN ({stop_list}))")
        ).alias("n_stop"),
    )
    scored = feats.select(
        "doc_id",
        "n_tokens",
        F.expr("(1000 * n_distinct) div n_tokens").alias("ttr_milli"),
        F.expr("(1000 * n_stop) div n_tokens").alias("stop_milli"),
        F.expr(
            "(1000 * n_distinct) div n_tokens"
            " + 2 * ((1000 * n_stop) div n_tokens)"
            " + least(n_tokens, 200)"
        ).alias("score"),
    )
    return scored.withColumn("keep", F.col("score") >= 640)


@register("x27_bpe_merges", category="text_analysis")
def x27_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer TRAINING: learn the first 24 merge
    rules from the documents corpus (extensions/bpe.py — word-histogram
    reduction, then per-round pair counting + one-fold rewrites with
    localCheckpoint lineage truncation). Iterative and
    argmax-per-round -> not SQL-expressible; rows-only driver check,
    value gate = exact merge-sequence match against a pure-Python
    reference BPE in tests/test_bpe.py + the oracle-paired machinery
    twin x37_bpe_micro_contract (driver-visible literal oracle)."""
    from etl_notifier_pipeline_spark.extensions.bpe import learn_bpe_merges

    d = load_table(spark, sf_dir, "documents")
    return learn_bpe_merges(d, n_merges=24)


# x27's oracle-paired machinery twin (r12 verdict ask #6, the st06
# pattern): the SAME learn_bpe_merges code path — word histogram,
# weighted pair counting, (count desc, left, right) argmax, one-fold
# left-to-right rewrite, lineage truncation, early stop — runs on a
# scripted micro-corpus whose merge table is derivable BY HAND, so the
# oracle is an analytically-known VALUES literal and the whole trainer
# sits under the driver's hash gate. Derivation (word histogram after
# lowercase + whitespace split: aaab x5, aab x3, ab x2, cd x7, ce x7):
#
#   round 0: pairs (a,a)=2*5+1*3=13, (a,b)=5+3+2=10, (c,d)=7, (c,e)=7
#            -> merge (a,a)->aa @13; aaab=[aa,a,b], aab=[aa,b]
#   round 1: (a,b)=5+2=7, (c,d)=7, (c,e)=7, (aa,a)=5, (aa,b)=3
#            -> count-7 three-way TIE, lexicographic (left,right)
#            picks (a,b)->ab @7 (pins the deterministic tiebreak)
#   round 2: (c,d)=7, (c,e)=7, (aa,ab)=5, (aa,b)=3 -> (c,d)->cd @7
#   round 3: (c,e)=7 -> ce @7
#   round 4: (aa,ab)=5 -> aaab @5   (multi-char symbol merge)
#   round 5: (aa,b)=3 -> aab @3
#   round 6: no adjacent pairs left -> EARLY STOP at 6 of 8 rows
#
# SF-independent by construction (scripted input ignores sf_dir), so
# the tri-scale parity sweep can't drift it.
_X37_CORPUS = [
    "AAAB aaab  AAAB",   # aaab x3 (case fold + multi-space split)
    "aaab aaab",         # aaab x2
    "aab AAB aab",       # aab x3
    "ab Ab",             # ab x2
    "cd CD cd cd",       # cd x4
    "cd cd cd",          # cd x3
    "ce CE ce ce ce ce ce",  # ce x7
]


@register(
    "x37_bpe_micro_contract",
    category="text_analysis",
    oracle="""
SELECT * FROM (VALUES
  (0, 'a',  'a',  'aa',   CAST(13 AS BIGINT)),
  (1, 'a',  'b',  'ab',   CAST(7 AS BIGINT)),
  (2, 'c',  'd',  'cd',   CAST(7 AS BIGINT)),
  (3, 'c',  'e',  'ce',   CAST(7 AS BIGINT)),
  (4, 'aa', 'ab', 'aaab', CAST(5 AS BIGINT)),
  (5, 'aa', 'b',  'aab',  CAST(3 AS BIGINT))
) AS t("rank", "left", "right", merged, pair_count)
""",
)
def x37_bpe_micro_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE trainer machinery under the hash gate: learn_bpe_merges on
    the scripted micro-corpus above (hand-derived merge table in the
    module comment). A wrong pair weight, a broken lexicographic
    tiebreak, an overlapping-merge rewrite bug, or a missed early stop
    each flips a literal. n_merges=8 > the 6 derivable merges, so the
    early-stop path itself is under the gate."""
    from etl_notifier_pipeline_spark.extensions.bpe import learn_bpe_merges

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_X37_CORPUS)], "doc_id long, text string"
    )
    return learn_bpe_merges(docs, n_merges=8)


@register(
    "x28_unigram_lm_score",
    category="text_analysis",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tf AS (SELECT token, COUNT(*) AS tf FROM tok GROUP BY token),
n AS (SELECT CAST(SUM(tf) AS BIGINT) AS total FROM tf)
SELECT t.doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(tf.tf) AS BIGINT) AS tf_sum,
       CAST(SUM(tf.tf) AS DOUBLE) / (n.total * COUNT(*))
         AS mean_token_prob
FROM tok t JOIN tf ON t.token = tf.token, n
GROUP BY t.doc_id, n.total
""",
)
def x28_unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM document scoring (the perplexity-proxy quality
    signal): train the unigram model on the corpus itself (token ->
    global frequency), score each document by its MEAN TOKEN
    PROBABILITY — low = rare/garbage-heavy doc, high = stereotypical.
    The ratio form keeps it exact: mean p = sum(tf(t_i)) / (N * n_doc)
    is integer arithmetic until ONE final double division (the x08
    log-free trick), so cross-engine hashes match bit-for-bit where a
    log-space perplexity would drift on transcendentals.

    Scale shape: pass 1 builds the frequency table (explode ->
    map-side-combined groupBy — the vocab is the working set, not the
    corpus); N derives from the vocab table, no second corpus count;
    pass 2 re-joins tokens to tf on the token key (AQE picks broadcast
    when the vocab fits) and reduces per doc to two integers. The
    1-row N rides along as a broadcast crossJoin. The vocab frame
    persists (r13 plan fix — unpersisted, the N aggregate re-ran the
    corpus explode + vocab shuffle; the audit measured 3 documents
    scans): 2 corpus scans (model build + scoring pass — inherently
    two-pass, the model must exist before scoring), N a cheap agg over
    the vocab cache. The exploded token frame deliberately does NOT
    persist: it is corpus-sized (one row per token occurrence), and
    caching it to save one scan would hold the whole corpus in memory
    — the d04 measured-negative rule."""
    from etl_notifier_pipeline_spark.caching import tracked_persist

    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = tracked_persist(
        tok.groupBy("token").agg(F.count(F.lit(1)).alias("tf"))
    )
    n = tf.agg(F.sum("tf").alias("total"))
    return (
        tok.join(tf, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("tf").alias("tf_sum"),
        )
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "n_tokens",
            "tf_sum",
            (
                F.col("tf_sum").cast("double")
                / (F.col("total") * F.col("n_tokens"))
            ).alias("mean_token_prob"),
        )
    )


@register(
    "x29_substring_dup_fraction",
    category="dedup",
    oracle=f"""
WITH sh AS (
  SELECT doc_id,
         {DUCK_HASH.format(x="substr(text, CAST(i AS INTEGER), 40)")} AS h
  FROM documents, unnest(range(1, len(text) - 38, 20)) AS t(i)
  WHERE len(text) >= 40
), d AS (
  SELECT h, COUNT(DISTINCT doc_id) AS nd FROM sh GROUP BY h
)
SELECT sh.doc_id, COUNT(*) AS n_shingles,
       CAST(SUM(CASE WHEN d.nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_shingles,
       CAST(SUM(CASE WHEN d.nd > 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
         AS dup_fraction
FROM sh JOIN d USING (h)
GROUP BY sh.doc_id
""",
)
def x29_substring_dup_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication fraction per document (40-char
    shingles, stride 20): the boilerplate/quotation duplication measure
    document-level exact dedup (d01) misses. Cross-doc duplication is
    detected by hash GROUPING (one shuffle), never pairwise."""
    d = load_table(spark, sf_dir, "documents")
    return X.substring_dup_stats(d, width=40, stride=20)


@register(
    "x30_token_novelty",
    category="text_analysis",
    oracle="""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents
), first AS (
  SELECT tok, MIN(doc_id) AS first_doc FROM tok GROUP BY tok
)
SELECT tok.doc_id, COUNT(*) AS n_distinct_tokens,
       CAST(SUM(CASE WHEN first_doc = tok.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       CAST(SUM(CASE WHEN first_doc = tok.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS novelty
FROM tok JOIN first USING (tok)
GROUP BY tok.doc_id
""",
)
def x30_token_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document vocabulary novelty: fraction of a doc's distinct
    tokens first seen (min doc_id) in that doc — the vocabulary-growth
    primitive for deciding when more shards stop adding signal."""
    d = load_table(spark, sf_dir, "documents")
    return X.token_novelty(d)


@register(
    "x31_jsonl_roundtrip",
    category="text_analysis",
    oracle="""
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_chars
FROM documents
WHERE doc_id % 5 = 0
GROUP BY lang
""",
)
def x31_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/S2 extended to JSONL (the interchange format LLM-data
    pipelines actually ship): a documents slice is written as
    newline-delimited JSON, re-read through the template-schema
    PERMISSIVE path (sources.ingest.read_jsonl — no inference scan, no
    dead letters expected), and aggregated; the oracle computes the
    same aggregate from the parquet directly, so a value mismatch
    catches any loss in the serialize->parse cycle. Distributed on
    both legs: write and read are N-way file splits."""
    import tempfile

    from pyspark.sql import types as T

    from etl_notifier_pipeline_spark.sources.ingest import read_jsonl, split_corrupt

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    out = tempfile.mkdtemp(prefix="x31_") + "/docs_jsonl"
    d.write.mode("overwrite").json(out)
    template = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    parsed = read_jsonl(spark, out, template=template)
    clean, dead = split_corrupt(parsed)
    # The dead-letter channel exists to make parse regressions
    # OBSERVABLE — check it, don't discard it (r4 ADVICE): a corrupt
    # row here means the serialize->parse cycle lost data, and that
    # must fail loudly, not surface as a puzzling aggregate mismatch.
    n_dead = dead.count()
    if n_dead:
        raise ValueError(
            f"x31 roundtrip produced {n_dead} dead-letter rows; "
            "JSONL serialize->parse is lossy"
        )
    return clean.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


# Count-min sketch: depth x width integer cell grid. Everything is
# md5-derived integer hashing + integer sums, so the SKETCH ITSELF is
# reproducible in SQL — the approximate estimator gets a bit-exact
# oracle (same doctrine as d10's integer PageRank).
_CM_D, _CM_W = 4, 64


@register(
    "x32_count_min_heavy_hitters",
    category="aggregation",
    oracle="""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
),
cm AS (
  SELECT 0 AS r, ((('0x'||substr(md5('0|' || tok),1,15))::BIGINT % 999999937)) % 64 AS cell, COUNT(*) AS c FROM tok GROUP BY 1, 2
  UNION ALL
  SELECT 1 AS r, ((('0x'||substr(md5('1|' || tok),1,15))::BIGINT % 999999937)) % 64 AS cell, COUNT(*) AS c FROM tok GROUP BY 1, 2
  UNION ALL
  SELECT 2 AS r, ((('0x'||substr(md5('2|' || tok),1,15))::BIGINT % 999999937)) % 64 AS cell, COUNT(*) AS c FROM tok GROUP BY 1, 2
  UNION ALL
  SELECT 3 AS r, ((('0x'||substr(md5('3|' || tok),1,15))::BIGINT % 999999937)) % 64 AS cell, COUNT(*) AS c FROM tok GROUP BY 1, 2
),
probes AS (
  SELECT tok, COUNT(*) AS exact_count FROM tok GROUP BY tok
  ORDER BY exact_count DESC, tok LIMIT 10
),
est AS (
  SELECT p.tok AS token, p.exact_count,
       (SELECT c FROM cm WHERE cm.r = 0 AND cm.cell = ((('0x'||substr(md5('0|' || p.tok),1,15))::BIGINT % 999999937)) % 64) AS e0,
       (SELECT c FROM cm WHERE cm.r = 1 AND cm.cell = ((('0x'||substr(md5('1|' || p.tok),1,15))::BIGINT % 999999937)) % 64) AS e1,
       (SELECT c FROM cm WHERE cm.r = 2 AND cm.cell = ((('0x'||substr(md5('2|' || p.tok),1,15))::BIGINT % 999999937)) % 64) AS e2,
       (SELECT c FROM cm WHERE cm.r = 3 AND cm.cell = ((('0x'||substr(md5('3|' || p.tok),1,15))::BIGINT % 999999937)) % 64) AS e3
  FROM probes p
)
SELECT token, exact_count,
       least(e0, e1, e2, e3) AS cm_estimate
FROM est
""",
)
def x32_count_min_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the corpus token stream, probed at the
    exact top-10 tokens: the mergeable-sketch answer to "how often
    does X appear in 100 TB" without a full-cardinality count. The
    sketch is a 4 x 64 integer grid (one narrow shuffle of
    (row, cell) pairs); estimates = min over rows; the CM guarantee
    estimate >= exact holds by construction and both sides of the
    driver check compute identical cells, so even the overestimates
    hash-match.

    Scale shape: sketch build is ONE token pass + a 256-cell
    aggregation (mergeable across shards/days like q77's HLL); the
    probe join broadcasts 10 rows against 256. The 256-row cells
    frame persists (r13 plan-audit fix): each of the 4 probe legs
    broadcasts one row-slice of it, and unpersisted each leg re-ran
    the corpus-sized token aggregation from the token cache — 4
    sketch builds for one sketch.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = tracked_persist(d.select(F.explode(X.tokens("text")).alias("tok")))
    cells = tracked_persist(
        tok.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("r"),
                            (
                                X.token_hash(
                                    F.concat(F.lit(f"{r}|"), F.col("tok"))
                                )
                                % _CM_W
                            ).alias("cell"),
                        )
                        for r in range(_CM_D)
                    ]
                )
            ).alias("c")
        )
        .groupBy("c.r", "c.cell")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    probes = (
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .orderBy(F.col("exact_count").desc(), "tok")
        .limit(10)
        .select(F.col("tok").alias("token"), "exact_count")
    )
    est = probes
    for r in range(_CM_D):
        leg = cells.filter(F.col("r") == r).select(
            F.col("cell").alias(f"cell{r}"), F.col("c").alias(f"e{r}")
        )
        est = est.join(
            F.broadcast(leg),
            (
                X.token_hash(F.concat(F.lit(f"{r}|"), F.col("token"))) % _CM_W
            )
            == F.col(f"cell{r}"),
        )
    return est.select(
        "token",
        "exact_count",
        F.least(*[F.col(f"e{r}") for r in range(_CM_D)]).alias("cm_estimate"),
    )



@register(
    "x33_temperature_mixture",
    category="sampling",
    oracle=f"""
WITH src AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
z AS (
  SELECT list_reduce(
           list_prepend(0.0,
             list_transform(
               list_sort(list({{'source': source, 'n': n}})),
               r -> sqrt(CAST(r.n AS DOUBLE)))),
           (x, y) -> x + y) AS z,
         SUM(n) AS total
  FROM src
),
w AS (
  SELECT src.source, src.n AS n_source,
         CAST(floor(256.0 * (0.5 * CAST(z.total AS DOUBLE))
              * (sqrt(CAST(src.n AS DOUBLE)) / z.z)
              / CAST(src.n AS DOUBLE)) AS BIGINT) AS wt
  FROM src CROSS JOIN z
)
SELECT d.source, COUNT(*) AS n_kept, MIN(w.wt) AS wt
FROM documents d JOIN w ON d.source = w.source
WHERE {DUCK_HASH.format(x="CAST(d.doc_id AS VARCHAR) || ':temp'")} % 256
      < least(256, w.wt)
GROUP BY d.source
""",
)
def x33_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixture (p_s ~ sqrt(n_s), the
    multilingual-balancing resample) targeting half the corpus: the
    per-source keep-weights derive from the data itself; the one
    cross-source float reduction is a SEQUENTIAL fold over the sorted
    source list, so the weight table — and therefore every keep
    decision — is bit-equal cross-engine and cross-partitioning.
    Reported as surviving docs + the applied weight per source."""
    from etl_notifier_pipeline_spark.extensions.sampling import temperature_mixture

    d = load_table(spark, sf_dir, "documents")
    kept = temperature_mixture(d, "source", "doc_id")
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.min("wt").alias("wt"),
    )


@register(
    "x34_bigram_conditionals",
    category="text_analysis",
    oracle="""
WITH toks AS (
  SELECT string_split(text, ' ') AS t FROM documents
),
bi AS (
  SELECT z[1] AS prev, z[2] AS next, COUNT(*) AS c_pair
  FROM (
    SELECT unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS z FROM toks
    WHERE len(t) >= 2
  )
  GROUP BY 1, 2
),
pv AS (
  SELECT prev, CAST(SUM(c_pair) AS BIGINT) AS c_prev FROM bi GROUP BY prev
),
top_prev AS (
  SELECT prev FROM pv ORDER BY c_prev DESC, prev LIMIT 5
)
SELECT prev, next, c_pair, c_prev,
       CAST(c_pair AS DOUBLE) / c_prev AS p, rank
FROM (
  SELECT bi.prev, bi.next, bi.c_pair, pv.c_prev,
         ROW_NUMBER() OVER (
           PARTITION BY bi.prev ORDER BY bi.c_pair DESC, bi.next) AS rank
  FROM bi JOIN pv USING (prev) JOIN top_prev USING (prev)
) WHERE rank <= 3
""",
)
def x34_bigram_conditionals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram conditional next-token table — the n-gram-LM primitive
    (data-quality probes, repetition detection, cheap perplexity
    proxies all start here): P(next | prev) as an exact integer ratio
    (one double division), top-3 continuations for the 5 most frequent
    left tokens.

    Scale shape: the bigram frame reuses the slice+zip_with shingle
    builder (one tokenize per row), aggregates (prev, next) in one
    shuffle; the prev-marginal is a second narrow agg over the
    ALREADY-aggregated bigram frame (never the corpus); top-5 prev is
    a 5-row broadcast. The bigram frame persists (r13 plan fix — the
    audit measured 3 documents scans / 6 exchanges: unpersisted, the
    marginal and the final join each re-ran the corpus explode +
    (prev, next) shuffle): ONE corpus scan, every downstream consumer
    reads the bigram-vocab-sized cache."""
    from pyspark.sql import Window as PW

    from etl_notifier_pipeline_spark.caching import tracked_persist
    from etl_notifier_pipeline_spark.extensions.dedup import shingles

    d = load_table(spark, sf_dir, "documents")
    big = tracked_persist(
        d.select(F.explode(shingles("text", 2)).alias("g"))
        .select(
            F.split("g", " ").getItem(0).alias("prev"),
            F.split("g", " ").getItem(1).alias("next"),
        )
        .groupBy("prev", "next")
        .agg(F.count(F.lit(1)).alias("c_pair"))
    )
    pv = big.groupBy("prev").agg(F.sum("c_pair").alias("c_prev"))
    top_prev = (
        pv.orderBy(F.col("c_prev").desc(), "prev").limit(5).select("prev")
    )
    w = PW.partitionBy("prev").orderBy(F.col("c_pair").desc(), "next")
    return (
        big.join(pv, "prev")
        .join(F.broadcast(top_prev), "prev")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "prev",
            "next",
            "c_pair",
            "c_prev",
            (F.col("c_pair").cast("double") / F.col("c_prev")).alias("p"),
            "rank",
        )
    )


_X36_STOPS = "'the','a','of','and','to','in','is','it'"
_X36_SCORE = (
    "(1000 * n_distinct) // n_tokens"
    " + 2 * ((1000 * n_stop) // n_tokens)"
    " + LEAST(n_tokens, 200)"
)


@register(
    "x36_prep_pipeline",
    category="sampling",
    oracle=f"""
WITH feats AS (
  SELECT doc_id, source, text,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) AS n_distinct,
         len(list_filter(string_split(text, ' '),
             t -> t IN ({_X36_STOPS}))) AS n_stop
  FROM documents
),
gated AS (
  SELECT doc_id, source, text, n_tokens FROM feats
  WHERE {_X36_SCORE} >= 640
),
uniq AS (
  SELECT doc_id, source, n_tokens FROM (
    SELECT doc_id, source, n_tokens,
           ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM gated) WHERE rn = 1
),
kept AS (
  SELECT doc_id, source, n_tokens FROM (
    SELECT doc_id, source, n_tokens,
           ROW_NUMBER() OVER (
             PARTITION BY source
             ORDER BY {DUCK_HASH.format(x="doc_id::VARCHAR || ':cap'")},
                      doc_id
           ) AS cap_rank
    FROM uniq) WHERE cap_rank <= 20
),
g AS (SELECT source, COUNT(*) AS n_gated FROM gated GROUP BY source),
u AS (SELECT source, COUNT(*) AS n_unique FROM uniq GROUP BY source),
k AS (SELECT source, COUNT(*) AS n_kept,
             CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens_kept
      FROM kept GROUP BY source)
SELECT g.source, g.n_gated, u.n_unique, k.n_kept, k.sum_tokens_kept
FROM g LEFT JOIN u ON u.source = g.source
       LEFT JOIN k ON k.source = g.source
""",
)
def x36_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data prep funnel as ONE declarative
    plan — quality gate (x25's bit-exact milli-unit linear score) ->
    exact dedup (lowest-id survivor per md5(text), d01's rule) ->
    per-source cap (x24's salted-hash-order top-20) -> per-source
    funnel accounting (candidates kept at each stage + surviving token
    mass). This is the composition a corpus team actually ships:
    every stage is one of the engine's audited primitives, and chaining
    them stays a single Catalyst plan — the gate's projection pushes
    into the scan below both windows, nothing materializes between
    stages.

    Scale shape: one corpus scan; the dedup window shuffles on
    md5(text) (32 B keys) and the cap window is a WindowGroupLimit
    rank-predicate (per-source skew absorbed map-side, see
    extensions.sampling.per_source_cap); the three stage-counts reuse
    the funnel frames and join on the tiny source key."""
    from etl_notifier_pipeline_spark.extensions.sampling import (
        per_source_cap,
    )

    d = load_table(spark, sf_dir, "documents")
    stop_list = ", ".join(f"'{w}'" for w in X.STOPWORDS)
    feats = d.select(
        "doc_id",
        "source",
        # hash the text HERE so nothing downstream carries the
        # document body: the funnel frames are ~50 B/row however big
        # the corpus documents are
        F.md5("text").alias("h"),
        F.size(X.tokens("text")).alias("n_tokens"),
        F.size(F.array_distinct(X.tokens("text"))).alias("n_distinct"),
        F.size(
            F.expr(f"filter(split(text, ' '), t -> t IN ({stop_list}))")
        ).alias("n_stop"),
    )
    gated = tracked_persist(
        feats.filter(
            F.expr(
                "(1000 * n_distinct) div n_tokens"
                " + 2 * ((1000 * n_stop) div n_tokens)"
                " + least(n_tokens, 200)"
            )
            >= 640
        ).select("doc_id", "source", "h", "n_tokens")
    )
    dup_w = W.partitionBy("h").orderBy("doc_id")
    uniq = tracked_persist(
        gated.withColumn("rn", F.row_number().over(dup_w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "source", "n_tokens")
    )
    kept = per_source_cap(uniq, "source", "doc_id", cap=20)
    g = gated.groupBy("source").agg(F.count(F.lit(1)).alias("n_gated"))
    u = uniq.groupBy("source").agg(F.count(F.lit(1)).alias("n_unique"))
    k = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_tokens").alias("sum_tokens_kept"),
    )
    return g.join(u, "source", "left").join(k, "source", "left")
