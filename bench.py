"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

The headline set covers each operator family the engine claims: scan+
agg (q01), star join (q05), window (q08), date rollup (q18), MERGE
shape (m02), text tf (x02), minhash-LSH dedup (d04), cosine top-k
(s01), sessionization (st03), and — added in round 2 — the iterative
graph family via connected-components dedup clusters (d06). Results
are materialized with the noop sink so timings measure compute, not
driver transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_notifier_pipeline_spark import plans  # noqa: E402
from etl_notifier_pipeline_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q01_pricing_summary",
    "q05_revenue_by_nation",
    "q08_topk_per_group",
    "q18_monthly_revenue",
    "m02_upsert",
    "x02_term_frequency",
    "d04_minhash_lsh_pairs",
    "d06_dedup_clusters",
    "s01_cosine_topk",
    "st03_session_window",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Same config as every production path (session.py): AQE on. It
    # costs ~0.2s/query in stage bookkeeping on scan-heavy queries at
    # this tiny scale but wins it back on the multi-stage ones
    # (partition coalescing after wide shuffles), and it's the
    # load-bearing setting at 100 TB — bench what you'd deploy.
    spark = get_spark("bench")
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = plans.get(name).fn
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(2):  # steady-state: best of 2 measured runs
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
