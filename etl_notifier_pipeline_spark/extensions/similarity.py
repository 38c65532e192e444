"""Similarity search over embedding columns (SURVEY §2.10 X2).

Baseline: brute-force cosine top-k — broadcast the (small) query set,
scan the corpus once, per-partition heap via ranking window. The dot
product is a JVM-side HOF fold in double (zip_with + aggregate): no
Python, no UDF, whole-stage codegen.

Scale path: blocked/LSH variants restrict the candidate set before the
exact rerank — ``blocked_near_dup_pairs`` shows the blocking-key shape
(join only within a block), and random-hyperplane LSH drops in the same
way MinHash banding does for text.

Determinism: the fold is a sequential left fold in double, matching
DuckDB's ``list_reduce`` element order, so cosine values are bit-equal
across engines and top-k (tie-broken by id) is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def topk_cosine(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    Plan: broadcast(queries) ⨯ corpus — one corpus scan, no shuffle of
    the corpus; the ranking window shuffles only (query_id, score, id)
    triples. Self-matches are excluded. Tie-break: (score desc, id).
    """
    # Norms are precomputed per row (corpus norms once per vector, not
    # once per (query, vector) pair — the folds are interpreted, so an
    # 8-query workload would otherwise pay 8x the norm cost). Same
    # bits as inline norms: the fold is deterministic.
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm(F.col(vec_col)).alias("c_norm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm"))
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def blocked_near_dup_pairs(
    df: DataFrame,
    block_col: str = "label",
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs within a blocking key.

    The block equi-join keeps the pair space |block|² instead of n² —
    the standard scale move when a cheap partition key exists (shard,
    source, coarse cluster id). AQE's skew-join handles an oversized
    block."""
    l = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
        norm(F.col(vec_col)).alias("norm_a"),
        F.col(block_col).alias("block"),
    )
    r = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
        norm(F.col(vec_col)).alias("norm_b"),
        F.col(block_col).alias("block"),
    )
    return (
        l.join(r, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "block",
            "id_a",
            "id_b",
            (
                dot(F.col("vec_a"), F.col("vec_b"))
                / (F.col("norm_a") * F.col("norm_b"))
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
