"""Lakehouse layer at scale: per-commit change_feed + IVM cost on an
amplified multi-commit history (r6 verdict ask #3).

The claim under test: consuming the change feed and maintaining an
aggregate view costs O(changes + groups) per commit, never O(table).
r6 proved this only at sf0.01. This harness builds a 60 M-row keyed
table (BucketedTableStore, capture_cdc=True), applies 10 commits that
each touch ~1% of the keys (upserts + deletes + inserts), and
measures, per commit:

- ``apply_sec``      — the keyed mutation itself (bucket-pruned I/O)
- ``feed_cdc``       — change_feed via the write-time CDC sidecar
                       (wall + input bytes: should track CHANGES)
- ``feed_diff``      — the same commit's feed via snapshot_diff
                       (wall + input bytes: tracks TABLE — the
                       measured contrast that motivates the sidecar)
- ``ivm_sec``        — cdc_agg_delta + merge_aggregates fold into a
                       1000-group stored summary, verified against a
                       full recompute on the final commit

Stage metrics ride on the Spark REST API exactly as tools/
scale_bench.py does. Usage:

    python tools/lakehouse_bench.py [--rows 60000000] [--commits 10] \
        [--json LAKEHOUSE_BENCH.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_notifier_pipeline_spark.operators import change_feed  # noqa: E402
from etl_notifier_pipeline_spark.operators.incremental import (  # noqa: E402
    agg_delta,
    cdc_agg_delta,
    merge_aggregates,
)
from etl_notifier_pipeline_spark.operators.mutations import (  # noqa: E402
    snapshot_diff,
)
from etl_notifier_pipeline_spark.session import get_spark  # noqa: E402
from etl_notifier_pipeline_spark.storage import BucketedTableStore  # noqa: E402

N_GROUPS = 1_000
KINDS = {"d_count": "count", "d_sum": "sum", "d_nn": "count"}


def _measure(spark, df) -> tuple[float, dict]:
    """(wall seconds, stage-metric delta) for materializing df."""
    from tools.scale_bench import _stages

    before = _stages(spark)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    after = _stages(spark)
    delta = {"inputBytes": 0, "shuffleWriteBytes": 0}
    for key, s in after.items():
        if key in before:
            continue
        for f in delta:
            delta[f] += int(s.get(f, 0))
    return wall, delta


def main() -> None:
    args = sys.argv[1:]

    def opt(flag: str, default):
        if flag in args:
            i = args.index(flag)
            val = args[i + 1]
            del args[i : i + 2]
            return type(default)(val) if default is not None else val
        return default

    n_rows = opt("--rows", 60_000_000)
    n_commits = opt("--commits", 10)
    json_out = opt("--json", None)

    import bench

    canary_pre = bench.host_canary_ms()
    spark = get_spark(
        "lakehouse-bench", extra_conf={"spark.ui.enabled": "true"}
    )
    root = tempfile.mkdtemp(prefix="lakehouse_bench_")
    store = BucketedTableStore(
        spark,
        root,
        keys={"t": ["k"]},
        n_buckets=64,
        retain_versions=4,  # each round = 3 commits + its base version
        capture_cdc=True,
    )
    base = spark.range(n_rows).select(
        F.col("id").alias("k"),
        (F.col("id") % N_GROUPS).alias("grp"),
        (F.col("id") % 997).cast("double").alias("v"),
    )
    t0 = time.perf_counter()
    store.overwrite("t", base)
    seed_sec = time.perf_counter() - t0
    print(f"seeded {n_rows:,} rows in {seed_sec:.1f}s", flush=True)

    # stored summary seeded from commit 1 (the IVM consumer)
    view = agg_delta(
        store.read("t", version=1),
        ["grp"],
        {
            "d_count": ("count", F.count(F.lit(1))),
            "d_sum": (
                "sum",
                F.coalesce(
                    F.sum(F.col("v").cast("decimal(18,2)")),
                    F.lit(0).cast("decimal(18,2)"),
                ),
            ),
            "d_nn": ("count", F.count(F.col("v"))),
        },
    ).persist()
    view.count()

    pct = max(1, n_rows // 100)  # ~1% of keys per commit
    commits = []
    for i in range(n_commits):
        # commit i: upsert 1% (keys k % 100 == i get a new value),
        # delete a 0.01% stripe, insert the same count of fresh keys
        ups = (
            spark.range(n_rows)
            .filter(F.col("id") % 100 == i)
            .select(
                F.col("id").alias("k"),
                (F.col("id") % N_GROUPS).alias("grp"),
                (F.col("id") % 997 + 10_000 * (i + 1)).cast("double").alias("v"),
            )
        )
        dels = spark.range(n_rows).filter(
            F.col("id") % 10_000 == i
        ).select(F.col("id").alias("k"))
        ins = spark.range(
            n_rows + i * pct // 100, n_rows + (i + 1) * pct // 100
        ).select(
            F.col("id").alias("k"),
            (F.col("id") % N_GROUPS).alias("grp"),
            F.lit(-1.0).alias("v"),
        )
        t0 = time.perf_counter()
        store.apply_keyed_mutation("t", ups, ["k"], ["v"], "update")
        store.apply_keyed_mutation("t", dels, ["k"], [], "delete")
        store.apply_keyed_mutation("t", ins, ["k"], ["v"], "insert")
        apply_sec = time.perf_counter() - t0
        v_hi = store.current_version("t")
        v_lo = v_hi - 3

        # the CDC-sidecar feed for these three commits
        feed = change_feed(store, "t", ["k"], from_version=v_lo, to_version=v_hi)
        cdc_sec, cdc_m = _measure(spark, feed)
        n_changes = feed.count()

        # contrast: the same feed derived from snapshot diffs only
        diff = None
        for v in range(v_lo, v_hi):
            d = snapshot_diff(
                store.read("t", version=v),
                store.read("t", version=v + 1),
                ["k"],
            ).withColumn("commit_version", F.lit(v + 1).cast("long"))
            diff = d if diff is None else diff.unionByName(d)
        diff_sec, diff_m = _measure(spark, diff)

        # IVM fold: O(changes + groups)
        t0 = time.perf_counter()
        delta = cdc_agg_delta(feed, "grp", "v", value_cast="decimal(18,2)")
        new_view = merge_aggregates(view, delta, ["grp"], KINDS).filter(
            F.col("d_count") > 0
        ).persist()
        new_view.count()
        ivm_sec = time.perf_counter() - t0
        view.unpersist()
        view = new_view

        row = {
            "commit": i + 1,
            "apply_sec": round(apply_sec, 2),
            "n_changes": n_changes,
            "feed_cdc_sec": round(cdc_sec, 2),
            "feed_cdc_input_mb": round(cdc_m["inputBytes"] / 1e6, 1),
            "feed_diff_sec": round(diff_sec, 2),
            "feed_diff_input_mb": round(diff_m["inputBytes"] / 1e6, 1),
            "ivm_sec": round(ivm_sec, 2),
        }
        commits.append(row)
        print(row, flush=True)

    # pure-append commit: change_feed serves it from the manifest's
    # added dirs (appended_dirs fast path, no sidecar, no snapshot
    # join) — feed input bytes should track NEW bytes, the diff
    # contrast tracks the TABLE
    n_app = max(1, n_rows // 100)
    app_lo = 2_000_000_000
    app = spark.range(app_lo, app_lo + n_app).select(
        F.col("id").alias("k"),
        (F.col("id") % N_GROUPS).alias("grp"),
        F.lit(5.0).alias("v"),
    )
    t0 = time.perf_counter()
    store.append("t", app)
    app_apply_sec = time.perf_counter() - t0
    v_hi = store.current_version("t")
    assert store.appended_dirs("t", v_hi), "append commit not detected"
    feed = change_feed(store, "t", ["k"], from_version=v_hi - 1, to_version=v_hi)
    app_sec, app_m = _measure(spark, feed)
    n_app_changes = feed.count()
    diff = snapshot_diff(
        store.read("t", version=v_hi - 1),
        store.read("t", version=v_hi),
        ["k"],
    ).withColumn("commit_version", F.lit(v_hi).cast("long"))
    adiff_sec, adiff_m = _measure(spark, diff)
    t0 = time.perf_counter()
    delta = cdc_agg_delta(feed, "grp", "v", value_cast="decimal(18,2)")
    view = merge_aggregates(view, delta, ["grp"], KINDS).filter(
        F.col("d_count") > 0
    ).persist()
    view.count()
    app_ivm_sec = time.perf_counter() - t0
    append_row = {
        "commit": "append",
        "apply_sec": round(app_apply_sec, 2),
        "n_changes": n_app_changes,
        "feed_fastpath_sec": round(app_sec, 2),
        "feed_fastpath_input_mb": round(app_m["inputBytes"] / 1e6, 1),
        "feed_diff_sec": round(adiff_sec, 2),
        "feed_diff_input_mb": round(adiff_m["inputBytes"] / 1e6, 1),
        "ivm_sec": round(app_ivm_sec, 2),
    }
    print(append_row, flush=True)

    # final equivalence: maintained view == full recompute
    recomputed = (
        store.read("t")
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(18,2)")).alias("s"),
        )
    )
    reported = view.select(
        "grp",
        F.col("d_count").alias("n"),
        F.when(F.col("d_nn") > 0, F.col("d_sum")).alias("s"),
    )
    drift = (
        reported.exceptAll(recomputed).count()
        + recomputed.exceptAll(reported).count()
    )
    doc = {
        "metric": "lakehouse_per_commit",
        "n_rows": n_rows,
        "n_commits": n_commits,
        "seed_sec": round(seed_sec, 1),
        "commits": commits,
        "append_commit": append_row,
        "ivm_drift_rows": drift,
        "host_canary_ms_pre": canary_pre,
        "host_canary_ms_post": bench.host_canary_ms(),
    }
    print(json.dumps(doc))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
