"""Distributed BPE vocabulary learning (X3 — tokenizer training).

The byte-pair-encoding trainer a large-scale text pipeline runs before
tokenizing: learn the merge table from the corpus itself (Sennrich et
al., "Neural Machine Translation of Rare Words with Subword Units",
ACL 2016). The engine's x07 applies a *given* BPE-ish pre-tokenizer;
this module LEARNS the merges.

Scale design — the classic two-phase shape every real BPE trainer uses:

1. ONE corpus pass builds the distinct-word histogram
   ``(word, count)``. All subsequent work runs on the histogram, whose
   size is the distinct-word vocabulary (~10^7-10^8 rows at 100 TB),
   not the corpus (~10^11 words) — a 3-4 order-of-magnitude reduction
   before the loop starts.
2. Each merge round on the histogram: count adjacent symbol pairs
   weighted by word count (explode -> map-side-combined groupBy), pick
   the max pair (count desc, pair lexicographic — deterministic), and
   rewrite symbol arrays with ONE JVM-side left-fold (``F.aggregate``)
   that merges left-to-right non-overlapping occurrences, exactly like
   the reference algorithm. The histogram is ``localCheckpoint``-ed
   every round — the d06 lineage-truncation pattern; without it, round
   N's plan nests N fold expressions and analysis time explodes.

Driver-side state is ONLY the learned merge list (N pairs of short
strings) and one collected top-1 row per round — control-plane-sized,
like d06's convergence counter. A production trainer doing 30k+ merges
batches non-conflicting merges per round to amortize passes; the
per-round plan here is identical, just with a top-M
conflict-free-prefix instead of top-1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_histogram(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Phase 1: the corpus-pass word histogram. The shuffle carries
    (word, partial-count) after map-side combine."""
    return (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda w: w != "",
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def _merge_fold(symbols: Column, a: str, b: str) -> Column:
    """Left-to-right non-overlapping merge of adjacent (a, b) into the
    concatenated symbol — the exact reference-BPE rewrite, as one
    whole-stage-codegen fold (no Python per row)."""
    merged = F.array(F.lit(a + b))
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), merged),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def learn_bpe_merges(
    docs: DataFrame,
    n_merges: int = 24,
    *,
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus; returns the merge
    table as a DataFrame (rank, left, right, merged, pair_count) — the
    artifact a downstream tokenizer pass applies.

    Deterministic: pair selection orders by (count desc, left, right);
    integer counts and lexicographic ties cannot vary with partition
    order. Stops early (fewer rows) when no pair reaches
    ``min_count``."""
    spark = docs.sparkSession
    hist = word_histogram(docs, text_col).select(
        F.split(F.col("word"), "").alias("symbols"), "count"
    )
    hist = hist.localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(n_merges):
        pairs = (
            hist.select(
                F.explode(
                    F.zip_with(
                        F.slice(F.col("symbols"), 1, F.size("symbols") - 1),
                        F.slice(F.col("symbols"), 2, F.size("symbols") - 1),
                        lambda l, r: F.struct(
                            l.alias("left"), r.alias("right")
                        ),
                    )
                ).alias("p"),
                "count",
            )
            .groupBy("p.left", "p.right")
            .agg(F.sum("count").alias("pair_count"))
        )
        top = (
            pairs.filter(F.col("pair_count") >= min_count)
            .orderBy(
                F.col("pair_count").desc(), F.col("left"), F.col("right")
            )
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0]["left"], top[0]["right"], top[0]["pair_count"]
        merges.append((rank, a, b, a + b, cnt))
        # one fold rewrite + lineage truncation per round
        hist = hist.select(
            _merge_fold(F.col("symbols"), a, b).alias("symbols"), "count"
        ).localCheckpoint(eager=True)

    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, pair_count bigint"
    )


def bpe_segment(
    docs: DataFrame,
    merge_table: list[tuple[str, str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge table: segment each document's words into
    BPE subword units (merges applied in rank order, each as one fold).
    Returns (id, word, pieces array<string>) exploded per word.

    The merge table is plan-side literals (like MinHash coefficients) —
    tokenizing 100 TB is a single narrow map pass, no shuffle at all."""
    out = docs.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != ""
            )
        ).alias("word"),
    ).withColumn("pieces", F.split(F.col("word"), ""))
    for a, b in merge_table:
        out = out.withColumn("pieces", _merge_fold(F.col("pieces"), a, b))
    return out
