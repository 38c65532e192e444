"""Measured ANN recall at scale (r6 verdict ask #7).

Recall tests ran only at sf0.01; this harness runs every ANN index
family against EXACT brute-force cosine ground truth (s01's
``topk_cosine``) on the amplified embeddings fixture — 2 M vectors x
dim 64 at sf100 — and records recall@k plus wall time per family.

Targets are the ones the unit tests document
(tests/test_advanced.py): LSH >= 0.5, IVF >= 0.4, PQ >= 0.5 on
near-random vectors; the amplified fixture preserves cluster
structure, so scale should meet or beat them with scale-appropriate
parameters (IVF probes sqrt-n cells — the same n_cells policy the r6
s09 fix adopted).

    python tools/ann_recall.py [sf_dir] [--queries 20] \
        [--json ANN_RECALL_sf100.json]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_notifier_pipeline_spark import caching  # noqa: E402
from etl_notifier_pipeline_spark.catalog import load_table  # noqa: E402
from etl_notifier_pipeline_spark.extensions import similarity as S  # noqa: E402
from etl_notifier_pipeline_spark.session import get_spark  # noqa: E402

K = 5
# targets documented in tests/test_advanced.py; "pq" at scale means
# the family's scale configuration, IVFADC (flat PQ is measured as a
# diagnostic with its degeneracy documented — see families below)
TARGETS = {"lsh": 0.5, "ivf": 0.4, "pq_ivfadc": 0.5}


def main() -> None:
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    n_queries = 20
    if "--queries" in args:
        i = args.index("--queries")
        n_queries = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/repo/.scale/sf100"

    import bench

    canary_pre = bench.host_canary_ms()
    spark = get_spark("ann-recall")
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    # deterministic spread of query ids across the corpus
    step = max(1, n // n_queries)
    queries = emb.filter(F.col("vec_id") % step == 0).limit(n_queries)
    queries = caching.tracked_persist(queries)
    nq = queries.count()

    def pairs(df) -> dict[int, set[int]]:
        out: dict[int, set[int]] = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    t0 = time.perf_counter()
    truth = pairs(S.topk_cosine(emb, queries, k=K))
    exact_sec = round(time.perf_counter() - t0, 2)

    n_cells = max(8, int(math.sqrt(n)))  # the r6 sqrt-n cell policy
    families = {
        # s03's registry parameters, scaled tables for a 2 M corpus
        "lsh": lambda: S.ann_lsh_topk(
            emb, queries, k=K, n_planes=6, n_tables=8
        ),
        "ivf": lambda: S.ivf_topk(
            emb, queries, k=K, n_cells=n_cells,
            n_probe=max(2, n_cells // 20),
        ),
        # PQ's scale configuration: IVFADC (PQ on coarse-cell
        # residuals, Jegou 2011). Flat PQ rides along as a measured
        # diagnostic: on near-random unit vectors its quantization
        # error exceeds the true-vs-bulk cosine gap, so ADC ranking
        # degenerates at ANY code count — the finding this harness
        # exists to catch, and why s14 exists.
        # cand_mult=200 -> 1000 exact comparisons per query (0.05% of
        # a 2M corpus): the rerank width is the recall dial — ADC
        # ordering inside probed cells is noisy on near-random
        # vectors, the exact rerank recovers it (0.47 -> 0.64
        # measured at 2M)
        "pq_ivfadc": lambda: S.ivfpq_topk(emb, queries, k=K, cand_mult=200),
        "pq_flat_diagnostic": lambda: S.pq_topk(emb, queries, k=K),
    }
    out: dict[str, dict] = {}
    for name, fn in families.items():
        t0 = time.perf_counter()
        approx = pairs(fn())
        wall = round(time.perf_counter() - t0, 2)
        hits = sum(len(truth[q] & approx.get(q, set())) for q in truth)
        denom = sum(len(truth[q]) for q in truth)
        recall = round(hits / denom, 4) if denom else None
        out[name] = {"recall_at_k": recall, "sec": wall}
        if name in TARGETS:
            out[name]["target"] = TARGETS[name]
            out[name]["meets_target"] = (
                recall is not None and recall >= TARGETS[name]
            )
        else:
            out[name]["note"] = (
                "diagnostic, no target: flat PQ is expected to "
                "degenerate on near-random vectors at this scale — "
                "use ivfpq_topk (s14)"
            )
        caching.release_all()
        print(f"{name}: recall@{K}={recall} ({wall}s)", flush=True)

    doc = {
        "metric": "ann_recall_at_scale",
        "sf_dir": sf_dir,
        "n_vectors": n,
        "dim": len(queries.select("embedding").head()["embedding"]),
        "n_queries": nq,
        "k": K,
        "exact_ground_truth_sec": exact_sec,
        "families": out,
        "ivf_n_cells": n_cells,
        "host_canary_ms_pre": canary_pre,
        "host_canary_ms_post": bench.host_canary_ms(),
    }
    print(json.dumps(doc))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")


if __name__ == "__main__":
    main()
