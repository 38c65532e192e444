"""Lakehouse layer at scale: per-commit mutation + change_feed + IVM
cost on an amplified multi-commit history (r6 ask #3, r8 asks #1-2).

Claims under test, each measured per-measurement-canary-stamped
(tools/benchproto, ``canary-per-measurement-v1``):

1. **copy_on_write**: consuming the change feed and maintaining an
   aggregate view costs O(changes + groups) per commit, never
   O(table) — but a SCATTERED 1% key batch rewrites ~every bucket, so
   ``apply_sec`` is O(table) (the measured 46-77 s/commit at 60 M
   rows that motivated merge-on-read).
2. **merge_on_read** (r8's mutation strategy, measured here for the
   first time): the same scattered commits stage only O(batch) delta
   rows, so ``apply_sec`` collapses and — the literal claim — is
   INDEPENDENT of table size (the ``table_size_independence`` rung
   applies the same 600 k-key scattered update to a 6 M and a 60 M
   row table with CDC capture off: near-equal seconds). The price is
   read amplification while deltas stack (``read_amplification``
   rung: full-scan agg at 0/5/10 uncompacted commits) until
   ``compact()`` folds them (its cost = one CoW-style rewrite,
   measured), after which reads are pure base scans again.
3. The IVM consumer (cdc_agg_delta + merge_aggregates) folds the CDC
   sidecar identically over BOTH strategies' histories; final views
   drift 0 rows from a full recompute, and the MoR snapshot equals
   the CoW snapshot bit-for-bit after the same commit stream.

Per-commit measurements ride tools/benchproto.stamped_runs (n_runs=1
one-shots still carry their own canary bracket, so host drift between
commits stays attributable); steady-state reads use n_runs=3 with
dispersion. Stage metrics ride the Spark REST API exactly as
tools/scale_bench.py does. Usage:

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
from tools.benchproto import (  # noqa: E402
    PROTOCOL_VERSION,
    configure_io_canary,
    protocol_header,
    stamped_runs,
)

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


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _base_frame(spark, n_rows: int):
    return spark.range(n_rows).select(
        F.col("id").alias("k"),
        (F.col("id") % N_GROUPS).alias("grp"),
        (F.col("id") % 997).cast("double").alias("v"),
    )


def _commit_batches(spark, n_rows: int, i: int):
    """Commit i's (upserts, deletes, inserts): ~1% scattered upserts,
    a 0.01% delete stripe, 0.01% fresh-key inserts — identical across
    strategies so the rungs stay comparable."""
    pct = max(1, n_rows // 100)
    ups = (
        spark.range(n_rows)
        .filter(F.col("id") % 100 == i)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % N_GROUPS).alias("grp"),
            (F.col("id") % 997 + 10_000 * (i + 1)).cast("double").alias("v"),
        )
    )
    dels = spark.range(n_rows).filter(F.col("id") % 10_000 == i).select(
        F.col("id").alias("k")
    )
    ins = spark.range(
        n_rows + i * pct // 100, n_rows + (i + 1) * pct // 100
    ).select(
        F.col("id").alias("k"),
        (F.col("id") % N_GROUPS).alias("grp"),
        F.lit(-1.0).alias("v"),
    )
    return ups, dels, ins


def _seed_view(store):
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
    return view


def run_rung(spark, root: str, n_rows: int, n_commits: int, strategy: str):
    """One strategy's full commit history. Returns (doc, store, view)."""
    store = BucketedTableStore(
        spark,
        os.path.join(root, strategy),
        keys={"t": ["k"]},
        n_buckets=64,
        # MoR stacks 3 delta commits per round; retention must cover a
        # full round so feeds can read v_lo..v_hi
        retain_versions=4,
        capture_cdc=True,
    )
    seed = stamped_runs(
        lambda: _timed(lambda: store.overwrite("t", _base_frame(spark, n_rows))),
        n_runs=1,
    )
    print(f"[{strategy}] seeded {n_rows:,} rows in {seed['sec']}s", flush=True)
    view = _seed_view(store)

    read_amp = [
        {
            "stacked_commits": 0,
            "read": stamped_runs(lambda: _measure(spark, store.read("t")), n_runs=3),
        }
    ]
    commits = []
    for i in range(n_commits):
        ups, dels, ins = _commit_batches(spark, n_rows, i)

        def one_commit():
            t0 = time.perf_counter()
            store.apply_keyed_mutation(
                "t", ups, ["k"], ["v"], "update", strategy=strategy
            )
            store.apply_keyed_mutation(
                "t", dels, ["k"], [], "delete", strategy=strategy
            )
            store.apply_keyed_mutation(
                "t", ins, ["k"], ["v"], "insert", strategy=strategy
            )
            return time.perf_counter() - t0

        apply = stamped_runs(one_commit, n_runs=1)
        v_hi = store.current_version("t")
        v_lo = v_hi - 3

        feed = change_feed(store, "t", ["k"], from_version=v_lo, to_version=v_hi)
        feed_cdc = stamped_runs(lambda: _measure(spark, feed), n_runs=1)
        n_changes = feed.count()

        row = {
            "commit": i + 1,
            "apply": apply,
            "n_changes": n_changes,
            "feed_cdc": {
                "sec": feed_cdc["sec"],
                "input_mb": round(feed_cdc["inputBytes"] / 1e6, 1),
                "canary_ms": feed_cdc["canary_ms"],
            },
        }
        if strategy == "copy_on_write":
            # the O(table) contrast that motivates the CDC sidecar —
            # proven once here, not re-paid on the MoR rung
            diff = None
            for v in range(v_lo, v_hi):
                d = snapshot_diff(
                    store.read("t", version=v),
                    store.read("t", version=v + 1),
                    ["k"],
                ).withColumn("commit_version", F.lit(v + 1).cast("long"))
                diff = d if diff is None else diff.unionByName(d)
            fd = stamped_runs(lambda: _measure(spark, diff), n_runs=1)
            row["feed_diff"] = {
                "sec": fd["sec"],
                "input_mb": round(fd["inputBytes"] / 1e6, 1),
                "canary_ms": fd["canary_ms"],
            }

        def fold():
            nonlocal view
            delta = cdc_agg_delta(feed, "grp", "v", value_cast="decimal(18,2)")
            new_view = (
                merge_aggregates(view, delta, ["grp"], KINDS)
                .filter(F.col("d_count") > 0)
                .persist()
            )
            new_view.count()
            view.unpersist()
            view = new_view

        row["ivm"] = stamped_runs(lambda: _timed(fold), n_runs=1)
        commits.append(row)
        print(f"[{strategy}] {json.dumps(row)}", flush=True)
        if strategy == "merge_on_read" and (i + 1) in (5, 10):
            read_amp.append(
                {
                    "stacked_commits": i + 1,
                    "read": stamped_runs(
                        lambda: _measure(spark, store.read("t")), n_runs=3
                    ),
                }
            )

    doc = {"seed": seed, "commits": commits}
    if strategy == "merge_on_read":
        compact = stamped_runs(lambda: _timed(lambda: store.compact("t")), n_runs=1)
        read_amp.append(
            {
                "stacked_commits": 0,
                "post_compact": True,
                "read": stamped_runs(
                    lambda: _measure(spark, store.read("t")), n_runs=3
                ),
            }
        )
        doc["read_amplification"] = read_amp
        doc["compact"] = compact
        print(f"[merge_on_read] compact: {json.dumps(compact)}", flush=True)
    return doc, store, view


def append_rung(spark, store, view, n_rows: int):
    """Pure-append commit over the CoW store: change_feed serves it
    from the manifest's added dirs (appended_dirs fast path) — feed
    input bytes track NEW bytes, the diff contrast tracks the TABLE."""
    n_app = max(1, n_rows // 100)
    app_lo = 2_000_000_000
    app = spark.range(app_lo, app_lo + n_app).select(
        F.col("id").alias("k"),
        (F.col("id") % N_GROUPS).alias("grp"),
        F.lit(5.0).alias("v"),
    )
    apply = stamped_runs(lambda: _timed(lambda: store.append("t", app)), n_runs=1)
    v_hi = store.current_version("t")
    assert store.appended_dirs("t", v_hi), "append commit not detected"
    feed = change_feed(store, "t", ["k"], from_version=v_hi - 1, to_version=v_hi)
    fp = stamped_runs(lambda: _measure(spark, feed), n_runs=1)
    n_app_changes = feed.count()
    diff = snapshot_diff(
        store.read("t", version=v_hi - 1),
        store.read("t", version=v_hi),
        ["k"],
    ).withColumn("commit_version", F.lit(v_hi).cast("long"))
    fd = stamped_runs(lambda: _measure(spark, diff), n_runs=1)

    def fold():
        nonlocal view
        delta = cdc_agg_delta(feed, "grp", "v", value_cast="decimal(18,2)")
        view = (
            merge_aggregates(view, delta, ["grp"], KINDS)
            .filter(F.col("d_count") > 0)
            .persist()
        )
        view.count()

    ivm = stamped_runs(lambda: _timed(fold), n_runs=1)
    row = {
        "commit": "append",
        "apply": apply,
        "n_changes": n_app_changes,
        "feed_fastpath": {
            "sec": fp["sec"],
            "input_mb": round(fp["inputBytes"] / 1e6, 1),
            "canary_ms": fp["canary_ms"],
        },
        "feed_diff": {
            "sec": fd["sec"],
            "input_mb": round(fd["inputBytes"] / 1e6, 1),
            "canary_ms": fd["canary_ms"],
        },
        "ivm": ivm,
    }
    print(json.dumps(row), flush=True)
    return row, view


def autocompact_rung(spark, root: str, n_rows: int, n_commits: int):
    """The policy's cost envelope (r9 verdict missing #4): the same
    scattered commit stream as the merge_on_read rung, but with
    ``auto_compact_deltas=5`` — compact() fires automatically whenever
    any bucket stacks more than 5 delta dirs. Measured per round:

    - ``apply``: the 3 sub-commits' wall (INCLUDING any policy
      compaction they trigger — the amortized write-time price);
      ``auto_compactions`` lists the compaction commit versions.
    - ``read``: full-scan agg seconds — the read-time BOUND the policy
      buys (the manual-compact rung measured 69 s at 10 stacked).
    - ``max_stacked`` : deepest per-bucket delta stack after the
      round — must stay <= auto_compact_deltas + 3 (one round's
      sub-commits land before the policy check).
    - ``ivm``: the fold over a feed whose range INCLUDES the policy's
      compaction commits, which change_feed must skip via the manifest
      marker (m21's correctness claim, here at scale).

    Final: maintained view drift vs full recompute (must be 0), and
    the total write-path seconds for comparison against the
    merge_on_read rung's sum(apply) + one manual compact."""
    store = BucketedTableStore(
        spark,
        os.path.join(root, "autocompact"),
        keys={"t": ["k"]},
        n_buckets=64,
        # a round = 3 mutation commits + up to 1 policy compaction;
        # feeds read one round back, so 8 covers it with headroom
        retain_versions=8,
        capture_cdc=True,
        auto_compact_deltas=5,
    )
    seed = stamped_runs(
        lambda: _timed(lambda: store.overwrite("t", _base_frame(spark, n_rows))),
        n_runs=1,
    )
    print(f"[autocompact] seeded {n_rows:,} rows in {seed['sec']}s", flush=True)
    view = _seed_view(store)
    rounds = []
    for i in range(n_commits):
        ups, dels, ins = _commit_batches(spark, n_rows, i)
        v_start = store.current_version("t")
        compactions: list[int] = []

        def one_commit():
            t0 = time.perf_counter()
            for df, op, ob in (
                (ups, "update", ["v"]),
                (dels, "delete", []),
                (ins, "insert", ["v"]),
            ):
                store.apply_keyed_mutation(
                    "t", df, ["k"], ob, op, strategy="merge_on_read"
                )
                if store.last_auto_compact_version is not None:
                    compactions.append(store.last_auto_compact_version)
            return time.perf_counter() - t0

        apply = stamped_runs(one_commit, n_runs=1)
        v_hi = store.current_version("t")
        m = store._manifest("t", v_hi)
        max_stacked = max(
            (len(d) for d in m.get("deltas", {}).values()), default=0
        )
        feed = change_feed(
            store, "t", ["k"], from_version=v_start, to_version=v_hi
        )
        n_changes = feed.count()

        def fold():
            nonlocal view
            delta = cdc_agg_delta(feed, "grp", "v", value_cast="decimal(18,2)")
            new_view = (
                merge_aggregates(view, delta, ["grp"], KINDS)
                .filter(F.col("d_count") > 0)
                .persist()
            )
            new_view.count()
            view.unpersist()
            view = new_view

        row = {
            "commit": i + 1,
            "apply": apply,
            "auto_compactions": compactions,
            "max_stacked_deltas": max_stacked,
            "read": stamped_runs(
                lambda: _measure(spark, store.read("t")), n_runs=2
            ),
            "n_changes": n_changes,
            "ivm": stamped_runs(lambda: _timed(fold), n_runs=1),
        }
        rounds.append(row)
        print(f"[autocompact] {json.dumps(row)}", flush=True)
    doc = {
        "seed": seed,
        "policy": {"auto_compact_deltas": 5},
        "commits": rounds,
        "total_write_path_sec": round(
            sum(r["apply"]["sec"] for r in rounds), 3
        ),
        "n_auto_compactions": sum(len(r["auto_compactions"]) for r in rounds),
        "ivm_drift_rows": _view_drift(store, view),
    }
    return doc


def concurrent_reader_rung(spark, root: str, n_rows: int):
    """A reader RACING the auto-compaction commit (r10 ask #6): the
    autocompact rung measures apply and read sequentially, so the
    atomic-swap path (stage → rename → pointer os.replace, then
    vacuum) is only exercised under load by the crash-injection unit
    tests. This rung stacks deltas to one commit below the policy
    cap, then runs a full-scan (count, decimal-sum) reader loop in a
    second thread while the tripping mutation commit — and the policy
    compaction inside it — lands.

    Consistency contract: every concurrent read must equal the
    snapshot of SOME committed version (resolved post-hoc via time
    travel over the retained versions — the mutation's own commit and
    the compaction commit are both legal landing spots; compaction's
    snapshot is content-identical to its predecessor by the m20
    equivalence tests). ``torn_reads`` must be empty. retain_versions
    is sized so vacuum cannot collect any version the race could have
    observed."""
    import threading

    store = BucketedTableStore(
        spark,
        os.path.join(root, "concurrent_reader"),
        keys={"t": ["k"]},
        n_buckets=64,
        # seed + 5 stacking commits + tripping commit + compaction = 8
        # versions; keep them all so (a) no read's paths get vacuumed
        # mid-scan, (b) post-hoc time travel can re-resolve every
        # legal snapshot.
        retain_versions=12,
        auto_compact_deltas=5,
    )
    seed = stamped_runs(
        lambda: _timed(lambda: store.overwrite("t", _base_frame(spark, n_rows))),
        n_runs=1,
    )
    print(
        f"[concurrent_reader] seeded {n_rows:,} rows in {seed['sec']}s",
        flush=True,
    )

    def scattered_update(i: int):
        return (
            spark.range(n_rows)
            .filter(F.col("id") % 100 == i)
            .select(
                F.col("id").alias("k"),
                (F.col("id") % N_GROUPS).alias("grp"),
                (F.col("id") % 997 + 10_000 * (i + 1))
                .cast("double")
                .alias("v"),
            )
        )

    for i in range(5):
        store.apply_keyed_mutation(
            "t", scattered_update(i), ["k"], ["v"], "update",
            strategy="merge_on_read",
        )
        assert store.last_auto_compact_version is None
    m = store._manifest("t", store.current_version("t"))
    max_stacked = max((len(d) for d in m.get("deltas", {}).values()), default=0)
    print(
        f"[concurrent_reader] stacked {max_stacked} deltas "
        f"(policy cap 5) — next commit trips compaction",
        flush=True,
    )

    observations: list[dict] = []
    reader_errors: list[str] = []
    stop = threading.Event()

    def reader_loop():
        # A reader crash (e.g. FileNotFoundError racing a file swap /
        # vacuum) is exactly the failure this rung exists to catch —
        # it must surface in the artifact as reader_errors and flag
        # the rung, never die silently in the daemon thread leaving a
        # short observations list claiming torn_reads==0.
        while not stop.is_set():
            t0 = time.perf_counter()
            try:
                v_seen = store.current_version("t")
                row = (
                    store.read("t")
                    .agg(
                        F.count(F.lit(1)).alias("c"),
                        F.sum(F.col("v").cast("decimal(18,2)")).alias("s"),
                    )
                    .collect()[0]
                )
            except Exception as exc:  # noqa: BLE001 — recorded, flags the rung
                reader_errors.append(f"{type(exc).__name__}: {exc}")
                return
            observations.append(
                {
                    "v_at_resolve": v_seen,
                    "count": row["c"],
                    "sum": str(row["s"]),
                    "t0": t0,
                    "t1": time.perf_counter(),
                }
            )

    reader = threading.Thread(target=reader_loop, daemon=True)
    reader.start()
    time.sleep(1.0)  # let at least one pre-commit read land

    def tripping_commit():
        t0 = time.perf_counter()
        store.apply_keyed_mutation(
            "t", scattered_update(5), ["k"], ["v"], "update",
            strategy="merge_on_read",
        )
        return time.perf_counter() - t0

    commit_t0 = time.perf_counter()
    apply = stamped_runs(tripping_commit, n_runs=1)
    commit_t1 = time.perf_counter()
    compaction_v = store.last_auto_compact_version
    time.sleep(0.5)  # let at least one post-commit read land
    stop.set()
    reader.join(timeout=600)

    # post-hoc legality: (count, sum) per retained version
    legal = {}
    for v in store.versions("t"):
        row = (
            store.read("t", version=v)
            .agg(
                F.count(F.lit(1)).alias("c"),
                F.sum(F.col("v").cast("decimal(18,2)")).alias("s"),
            )
            .collect()[0]
        )
        legal[v] = (row["c"], str(row["s"]))
    torn = [
        o
        for o in observations
        if (o["count"], o["sum"]) not in legal.values()
    ]
    during = [
        o
        for o in observations
        if o["t1"] >= commit_t0 and o["t0"] <= commit_t1
    ]
    doc = {
        "n_rows": n_rows,
        "policy": {"auto_compact_deltas": 5},
        "stacked_deltas_before_trip": max_stacked,
        "apply_with_compaction": apply,
        "compaction_version": compaction_v,
        "n_reads": len(observations),
        "n_reads_overlapping_commit": len(during),
        "reader_read_sec": [
            round(o["t1"] - o["t0"], 3) for o in observations
        ],
        "legal_snapshots": {str(v): list(p) for v, p in legal.items()},
        "observed": [
            {
                "v_at_resolve": o["v_at_resolve"],
                "count": o["count"],
                "sum": o["sum"],
                "overlaps_commit": o in during,
            }
            for o in observations
        ],
        "torn_reads": [
            {"v_at_resolve": o["v_at_resolve"], "count": o["count"], "sum": o["sum"]}
            for o in torn
        ],
        "reader_errors": reader_errors,
        # consistent ONLY if no read tore AND no reader crashed AND the
        # race was actually exercised — a crashed reader or a commit no
        # read overlapped would otherwise understate the race while the
        # artifact claims torn_reads==0.
        "all_reads_consistent": not torn and not reader_errors and bool(during),
    }
    print(
        f"[concurrent_reader] {len(observations)} reads "
        f"({len(during)} overlapping the tripping commit), "
        f"compaction v{compaction_v}, torn={len(torn)}, "
        f"reader_errors={len(reader_errors)}",
        flush=True,
    )
    if reader_errors:
        print(
            f"[concurrent_reader] RUNG FLAGGED: reader thread crashed: "
            f"{reader_errors}",
            flush=True,
        )
    return doc


def independence_rung(spark, root: str, sizes: list[int], batch: int):
    """The literal merge-on-read claim: apply_sec is independent of
    table size. Same scattered ``batch``-key update against tables of
    each size, CDC capture OFF (capture is the one O(affected
    buckets) read left on the write path — measured separately by the
    main rung). n_runs=3 per size: each run commits another delta, so
    the stamp's dispersion also shows apply staying flat as deltas
    stack."""
    out = []
    # Pre-warm the write path on a throwaway table: the r9 artifact's
    # 6 M cell carried 48% dispersion because its FIRST scattered MoR
    # apply paid one-time JVM/codegen/parquet-writer initialization
    # that the 60 M cell (running second) never saw — polluting the
    # very comparison the rung exists to make (r9 ask #8).
    warm_store = BucketedTableStore(
        spark, os.path.join(root, "indep_warm"), keys={"t": ["k"]},
        n_buckets=64, retain_versions=2, capture_cdc=False,
    )
    warm_store.overwrite("t", _base_frame(spark, max(1, sizes[0] // 10)))
    warm_store.apply_keyed_mutation(
        "t",
        spark.range(0, max(1, sizes[0] // 10), 7).select(
            F.col("id").alias("k"),
            (F.col("id") % N_GROUPS).alias("grp"),
            F.lit(7.0).alias("v"),
        ),
        ["k"], ["v"], "update", strategy="merge_on_read",
    )
    for n in sizes:
        store = BucketedTableStore(
            spark,
            os.path.join(root, f"indep_{n}"),
            keys={"t": ["k"]},
            n_buckets=64,
            retain_versions=6,
            capture_cdc=False,
        )
        store.overwrite("t", _base_frame(spark, n))
        stride = max(1, n // batch)
        ups = spark.range(0, n, stride).select(
            F.col("id").alias("k"),
            (F.col("id") % N_GROUPS).alias("grp"),
            F.lit(7.0).alias("v"),
        )

        def one():
            return _timed(
                lambda: store.apply_keyed_mutation(
                    "t", ups, ["k"], ["v"], "update", strategy="merge_on_read"
                )
            )

        stamp = stamped_runs(one, n_runs=5)
        out.append({"n_rows": n, "batch_rows": min(batch, n), "apply": stamp})
        print(f"[independence] {json.dumps(out[-1])}", flush=True)
    return {
        "sizes": out,
        # Dispersion here is structural, not noise to hide: each run
        # COMMITS a real scattered MoR delta (state advances; a warm
        # re-run of the same commit is impossible), so runs_sec mixes
        # the stack's first-touch costs with steady applies. The
        # independence claim compares the BEST cells — the cleanest
        # apply either table achieved under identical conditions.
        "caveat": (
            "per-run state advances (every run commits another delta) "
            "so dispersion is structural; compare best-of-5 cells"
        ),
    }


def _view_drift(store, view) -> int:
    """Maintained view == full recompute (0 = exact)."""
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
    return (
        reported.exceptAll(recomputed).count()
        + recomputed.exceptAll(reported).count()
    )


def _child(rung: str, root: str, n_rows: int, n_commits: int) -> dict:
    """Run one rung in a FRESH subprocess (the r6 'measure in
    isolation' protocol, docs/SCALE.md): a 30-commit history in one
    JVM accretes session state (stage bookkeeping, block-manager
    residue, GC pressure) that inflated late commits ~2-3x in the
    shared-session version of this harness — per-rung processes make
    each strategy's numbers its own."""
    import subprocess

    out = os.path.join(root, f"{rung}.json")
    subprocess.run(
        [
            sys.executable, os.path.abspath(__file__),
            "--rung", rung, "--root", root,
            "--rows", str(n_rows), "--commits", str(n_commits),
            "--json", out,
        ],
        check=True,
    )
    with open(out) as f:
        return json.load(f)


def main() -> None:
    args = sys.argv[1:]
    # Stamp-dense ladder (dozens of n_runs=1 sub-second stamps): the
    # per-stamp IO canary would add 2 x 256 MB of probe reads per
    # stamp — tens of GB per artifact, perturbing the page cache it
    # exists to observe. CPU canaries stay on. (r13 review fix.)
    configure_io_canary(None, enabled=False)

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
    rung = opt("--rung", "all")
    root = opt("--root", None)
    add_rung = opt("--add-rung", None)

    if add_rung:
        if not json_out:
            raise SystemExit(
                "--add-rung merges into an existing artifact: pass "
                "--json <file> (checked BEFORE the multi-minute rung "
                "runs, not after)"
            )
        # Incremental artifact maintenance: run ONE rung in a fresh
        # subprocess and merge its doc into an existing artifact
        # (every measurement carries its own canary bracket, so rungs
        # from different sessions stay comparable — that's the whole
        # point of canary-per-measurement-v1).
        key = {
            "autocompact": "merge_on_read_autocompact",
            "independence": "table_size_independence",
        }.get(add_rung, add_rung)
        root = tempfile.mkdtemp(prefix="lakehouse_bench_")
        try:
            child = _child(add_rung, root, n_rows, n_commits)
        finally:
            shutil.rmtree(root, ignore_errors=True)
        with open(json_out) as f:
            doc = json.load(f)
        if add_rung == "concurrent_reader":
            # the race stamp belongs INSIDE the autocompact rung's doc
            # (it exercises that rung's policy commit under load)
            doc.setdefault("merge_on_read_autocompact", {})[
                "read_during_compaction"
            ] = child
        else:
            doc[key] = child.get("sizes", child)
        if isinstance(child, dict) and "caveat" in child:
            doc[f"{key}_caveat"] = child["caveat"]
        doc.setdefault("protocol", {})[f"{key}_added"] = protocol_header(
            1, canary=PROTOCOL_VERSION, isolation="one subprocess per rung"
        )
        with open(json_out, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
        print(f"merged rung {add_rung!r} into {json_out}")
        return

    if rung == "all":
        root = tempfile.mkdtemp(prefix="lakehouse_bench_")
        try:
            cow = _child("copy_on_write", root, n_rows, n_commits)
            mor = _child("merge_on_read", root, n_rows, n_commits)
            ac = _child("autocompact", root, n_rows, n_commits)
            indep = _child("independence", root, n_rows, n_commits)
            comp = _child("compare", root, n_rows, n_commits)
        finally:
            shutil.rmtree(root, ignore_errors=True)
        doc = {
            "metric": "lakehouse_per_commit",
            "n_rows": n_rows,
            "n_commits": n_commits,
            "protocol": protocol_header(
                1,
                canary=PROTOCOL_VERSION,
                steady_state_reads_runs=3,
                isolation="one subprocess per rung",
            ),
            "copy_on_write": cow,
            "merge_on_read": mor,
            "merge_on_read_autocompact": ac,
            "table_size_independence": indep["sizes"],
            "table_size_independence_caveat": indep.get("caveat"),
            "ivm_drift_rows": {
                "copy_on_write": cow.pop("ivm_drift_rows"),
                "merge_on_read": mor.pop("ivm_drift_rows"),
            },
            "mor_vs_cow_drift_rows": comp["mor_vs_cow_drift_rows"],
        }
        print(json.dumps(doc))
        if json_out:
            with open(json_out, "w") as f:
                json.dump(doc, f, indent=1, sort_keys=True)
            print(f"wrote {json_out}")
        return

    spark = get_spark(
        f"lakehouse-bench-{rung}", extra_conf={"spark.ui.enabled": "true"}
    )
    if rung in ("copy_on_write", "merge_on_read"):
        doc, store, view = run_rung(spark, root, n_rows, n_commits, rung)
        if rung == "copy_on_write":
            append_row, view = append_rung(spark, store, view, n_rows)
            doc["append_commit"] = append_row
        doc["ivm_drift_rows"] = _view_drift(store, view)
    elif rung == "autocompact":
        doc = autocompact_rung(spark, root, n_rows, n_commits)
    elif rung == "concurrent_reader":
        doc = concurrent_reader_rung(spark, root, n_rows)
    elif rung == "independence":
        doc = independence_rung(
            spark, root,
            sizes=[n_rows // 10, n_rows],
            batch=max(1, n_rows // 100),
        )
    elif rung == "compare":
        # cross-strategy equivalence: after the same commit stream
        # (pre-append — the CoW store took one extra append commit),
        # the MoR snapshot must equal the CoW snapshot exactly
        cow_store = BucketedTableStore(
            spark, os.path.join(root, "copy_on_write"),
            keys={"t": ["k"]}, n_buckets=64, retain_versions=4,
        )
        mor_store = BucketedTableStore(
            spark, os.path.join(root, "merge_on_read"),
            keys={"t": ["k"]}, n_buckets=64, retain_versions=4,
        )
        cow_pre_append = cow_store.read(
            "t", version=cow_store.current_version("t") - 1
        )
        mor_final = mor_store.read("t")
        doc = {
            "mor_vs_cow_drift_rows": (
                cow_pre_append.exceptAll(mor_final).count()
                + mor_final.exceptAll(cow_pre_append).count()
            )
        }
    else:
        raise SystemExit(f"unknown rung {rung!r}")
    with open(json_out, "w") as f:
        json.dump(doc, f, sort_keys=True)
    print(f"[{rung}] wrote {json_out}", flush=True)


if __name__ == "__main__":
    main()
