"""Graph analytics over candidate-pair graphs (X1 closure toolkit).

``dedup_clusters`` (extensions/dedup.py) answers "which docs are the
same"; this module answers "which member should represent the
cluster": PageRank-style centrality over the near-dup pair graph picks
the most-connected member as the canonical survivor — the importance
heuristic large-scale dedup uses when "lowest id" is too arbitrary
(e.g. keep the most-linked URL of a mirror set).

Determinism contract: the whole iteration is INTEGER arithmetic.
Ranks live in micro-units (int64); each step is

    new_rank = BASE + (0.85-damped sum of floor(rank/outdeg)) // 100

with BASE = (15 * SCALE // 100) // N. Integer sums are
order-independent, so partition layout cannot move a bit, and a pure-
Python reference implementation reproduces the distributed result
EXACTLY (tests/test_graph.py) — the d06 convergence doctrine applied
to a numeric fixpoint.

Scale shape per round: one (src-keyed) contribution join + one dst
groupBy — both shuffles carry (long, long) pairs only; ranks are
``localCheckpoint``-ed each round (lineage truncation, the iterative-
Spark killer d06 documents). The corpus is never touched: nodes exist
only if they appear in a pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000  # rank micro-units


def pair_pagerank(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    *,
    n_iter: int = 10,
    damping_pct: int = 85,
) -> DataFrame:
    """PageRank over an undirected pair graph (each pair contributes
    both directions). Returns (node_id, rank_micro, rank) — micro-unit
    int64 rank plus its double rendering.

    ``damping_pct`` is an integer percentage so the damped sum stays
    in exact integer arithmetic (``* pct // 100``)."""
    edges = (
        pairs.select(
            F.col(src_col).cast("long").alias("src"),
            F.col(dst_col).cast("long").alias("dst"),
        )
        .union(
            pairs.select(
                F.col(dst_col).cast("long").alias("src"),
                F.col(src_col).cast("long").alias("dst"),
            )
        )
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # degree table is node-sized; ride it with the edges so the
    # per-round join is edges x ranks only
    edges = edges.join(deg, "src").persist()
    nodes = edges.select(F.col("src").alias("node_id")).distinct()
    n = nodes.count()
    if n == 0:
        return pairs.sparkSession.createDataFrame(
            [], "node_id long, rank_micro long, rank double"
        )
    base = (15 * SCALE // 100) // n
    init = SCALE // n
    ranks = nodes.select(
        "node_id", F.lit(init).cast("long").alias("rank_micro")
    ).localCheckpoint(eager=True)

    for _ in range(n_iter):
        contribs = (
            edges.join(
                ranks.select(
                    F.col("node_id").alias("src"), "rank_micro"
                ),
                "src",
            )
            .select(
                F.col("dst").alias("node_id"),
                F.expr("rank_micro div outdeg").alias("c"),
            )
            .groupBy("node_id")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contribs, "node_id", "left")
            .select(
                "node_id",
                (
                    F.lit(base).cast("long")
                    + F.expr(
                        f"coalesce(s, 0L) * {damping_pct} div 100"
                    )
                ).alias("rank_micro"),
            )
            .localCheckpoint(eager=True)
        )

    # ranks are eagerly localCheckpointed, so the edge cache is dead
    # weight the moment the loop exits — release it here rather than
    # leaking one edge-sized cache per PageRank call in a sweep.
    edges.unpersist()
    return ranks.select(
        "node_id",
        "rank_micro",
        (F.col("rank_micro").cast("double") / SCALE).alias("rank"),
    )
