"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

The headline set covers each operator family the engine claims: scan+
agg (q01), star join (q05), window (q08), date rollup (q18), MERGE
shape (m02), text tf (x02), two-phase global prefix-sum block packing
(x22), minhash-LSH dedup (d04), connected-components dedup clusters
(d06), incremental batch-vs-corpus dedup (d13), cosine top-k (s01),
IVF ANN (s04), sessionization (st03), and arbitrary-stateful running
totals (st05).
Results are materialized with the noop sink so timings measure
compute, not driver transfer.

Protocol (r03): warm once, then best-of-3 measured runs per query —
r02's best-of-2 let scheduling jitter drift totals by 20% with no plan
change. The DuckDB twin of every oracle-paired headline query runs
under the same warm+best-of-3 protocol in-process, and rides along in
the JSON (`duckdb` + `ratio_vs_duckdb`), so the ratio is computed by
the harness, not hand-derived later.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_notifier_pipeline_spark import caching, plans  # noqa: E402
from etl_notifier_pipeline_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q01_pricing_summary",
    "q05_revenue_by_nation",
    "q08_topk_per_group",
    "q18_monthly_revenue",
    "m02_upsert",
    "x02_term_frequency",
    "x22_block_pack_spans",
    "d04_minhash_lsh_pairs",
    "d06_dedup_clusters",
    "d13_incremental_dedup",
    "s01_cosine_topk",
    "s04_ivf_topk",
    "st03_session_window",
    "st05_stateful_running_totals",
]

N_RUNS = 3

# DuckDB twins for headline queries whose registry entry is rows-only
# (no ANSI oracle): the twin runs the SAME TASK the way an exact SQL
# engine would, so ratio_vs_duckdb covers the whole headline set.
# - s04 (IVF ANN top-5): exact KNN — identical query set/k to s01's
#   oracle; the IVF index exists to BEAT this exact scan, so the exact
#   scan is the honest comparable.
# - st05 (stateful running totals): its drained final state per user
#   is exactly the per-user count+sum aggregate.
TWIN_SQL: dict[str, str] = {
    "s04_ivf_topk": """
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         (list_reduce(list_transform(range(1, 65),
            i -> q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE), (x, y) -> x + y)
          / (sqrt(list_reduce(list_transform(range(1, 65),
               i -> q.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE), (x, y) -> x + y))
           * sqrt(list_reduce(list_transform(range(1, 65),
               i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE), (x, y) -> x + y))))
           AS cos_sim,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id ORDER BY
           (list_reduce(list_transform(range(1, 65),
              i -> q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE), (x, y) -> x + y)
            / (sqrt(list_reduce(list_transform(range(1, 65),
                 i -> q.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE), (x, y) -> x + y))
             * sqrt(list_reduce(list_transform(range(1, 65),
                 i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE), (x, y) -> x + y))))
           DESC, c.vec_id) AS rank
  FROM embeddings q, embeddings c
  WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id
) WHERE rank <= 5
""",
    "st05_stateful_running_totals": """
SELECT user_id, COUNT(*) AS n_events, SUM(value) AS total_value
FROM events GROUP BY user_id
""",
}


def _duck_path(p: str) -> str:
    """DuckDB needs a glob for Spark-written parquet DIRECTORIES
    (amplified fixtures); driver fixtures are single files."""
    import os as _os

    return p + "/*.parquet" if _os.path.isdir(p) else p


def best_of(n: int, fn) -> float:
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def duckdb_twin_times(
    sf_dir: str,
    names: list[str],
    n_runs: int = N_RUNS,
    warm: bool = True,
) -> dict[str, float | None]:
    """Best-of-N DuckDB wall time per headline query (registry oracle,
    else the TWIN_SQL comparable). Callers MUST mirror the Spark
    side's protocol: pass the same warm flag and n_runs the Spark runs
    used, or the published ratio compares a warm engine to a cold one
    (the r5 asymmetry: scale_bench warmed Spark but not DuckDB)."""
    import duckdb

    from etl_notifier_pipeline_spark.catalog import TABLES, table_path

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS') or os.cpu_count() or 8}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{_duck_path(table_path(sf_dir, t))}')"
        )
    out: dict[str, float | None] = {}
    for name in names:
        oracle = plans.get(name).oracle or TWIN_SQL.get(name)
        if not oracle:
            out[name] = None
            continue
        if warm:
            con.execute(oracle).fetchall()
        out[name] = best_of(n_runs, lambda: con.execute(oracle).fetchall())
    return out


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

        def run() -> None:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

        run()  # warm
        timings[name] = best_of(N_RUNS, run)
        caching.release_all()  # bound cache growth across the sweep
    duck = duckdb_twin_times(sf_dir, HEADLINE)
    spark_paired = sum(t for n, t in timings.items() if duck.get(n) is not None)
    duck_total = sum(t for t in duck.values() if t is not None)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "duckdb": duck,
                "duckdb_total": round(duck_total, 4),
                "ratio_vs_duckdb": (
                    round(spark_paired / duck_total, 4) if duck_total else None
                ),
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
