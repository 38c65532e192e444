"""Distributed BPE trainer vs a pure-Python reference implementation
(SURVEY §5.5 property-test pattern: exact artifact match, not just
shape)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from etl_notifier_pipeline_spark.catalog import load_table
from etl_notifier_pipeline_spark.extensions.bpe import (
    bpe_segment,
    learn_bpe_merges,
    word_histogram,
)

SF_DIR = "/root/testdata/sf0.001"


def _reference_bpe(word_counts: dict[str, int], n_merges: int, min_count: int):
    """Sennrich-style reference: count adjacent pairs over the word
    histogram, merge the (count desc, pair lexicographic) max,
    left-to-right non-overlapping."""
    hist = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in hist.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        best = None
        for (a, b), c in pairs.items():
            if c < min_count:
                continue
            key = (-c, a, b)
            if best is None or key < best[0]:
                best = (key, a, b, c)
        if best is None:
            break
        _, a, b, cnt = best
        merges.append((rank, a, b, a + b, cnt))
        new_hist: dict[tuple, int] = {}
        for syms, c in hist.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            t = tuple(out)
            new_hist[t] = new_hist.get(t, 0) + c
        hist = new_hist
    return merges


def test_bpe_merges_match_reference(spark):
    docs = load_table(spark, SF_DIR, "documents")
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in learn_bpe_merges(docs, n_merges=16).orderBy("rank").collect()
    ]
    wc = {
        r["word"]: r["count"]
        for r in word_histogram(docs).collect()
    }
    want = _reference_bpe(wc, n_merges=16, min_count=2)
    assert got == want


def test_bpe_segment_roundtrip_and_merge_application(spark):
    """Segmenting with the learned table: concatenated pieces rebuild
    each word exactly, and no adjacent piece pair equals a learned
    merge that should have fired (left-to-right exhaustiveness on the
    FIRST learned merge, whose pair can never survive in any output:
    later merges can legitimately recreate an earlier pair's
    adjacency, the first one has no earlier neighbor)."""
    docs = load_table(spark, SF_DIR, "documents").limit(50)
    merges = [
        (r["left"], r["right"])
        for r in learn_bpe_merges(docs, n_merges=8).orderBy("rank").collect()
    ]
    seg = bpe_segment(docs, merges)
    bad_rt = seg.filter(
        F.concat_ws("", F.col("pieces")) != F.col("word")
    ).count()
    assert bad_rt == 0
    if merges:
        a, b = merges[0]
        leftover = seg.filter(
            F.exists(
                F.zip_with(
                    F.slice(F.col("pieces"), 1, F.size("pieces") - 1),
                    F.slice(F.col("pieces"), 2, F.size("pieces") - 1),
                    lambda l, r: (l == F.lit(a)) & (r == F.lit(b)),
                ),
                lambda x: x,
            )
        ).count()
        assert leftover == 0


def test_x37_micro_contract_literal_matches_reference(spark):
    """Triple lock on the x37 oracle literal: the hand-derived VALUES
    table in plans/ext_text.py must equal the pure-Python reference
    BPE run on the same scripted corpus — so the literal can't drift
    from the derivation, independently of the Spark side (which the
    driver's hash gate compares against the literal)."""
    from etl_notifier_pipeline_spark.plans.ext_text import _X37_CORPUS

    wc: Counter = Counter()
    for t in _X37_CORPUS:
        for w in t.lower().split():
            wc[w] += 1
    assert dict(wc) == {"aaab": 5, "aab": 3, "ab": 2, "cd": 7, "ce": 7}
    want = _reference_bpe(dict(wc), n_merges=8, min_count=2)
    assert want == [
        (0, "a", "a", "aa", 13),
        (1, "a", "b", "ab", 7),
        (2, "c", "d", "cd", 7),
        (3, "c", "e", "ce", 7),
        (4, "aa", "ab", "aaab", 5),
        (5, "aa", "b", "aab", 3),
    ]
