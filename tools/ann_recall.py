"""Measured ANN recall + break-even at scale (r6 ask #7, r8 ask #4).

r7's version conflated index BUILD with query time, so every index
family looked strictly worse than exact brute force (s01) — worse
latency AND recall < 1.0 — leaving the indexes without a demonstrated
reason to exist. This harness measures the quantities a user actually
chooses by:

- ``build``        — train + encode + WRITE the index to parquet,
                     once per family (the one-time cost)
- ``query_small``  — serve a 20-query batch from the STORED index
                     (reload from parquet; warm best-of-2): the
                     steady-state per-query latency
- ``query_batch``  — serve a --batch (default 1000) query batch from
                     the stored index, cold n_runs=1, symmetric with
                     the exact baseline's protocol
- ``recall_at_k``  — at both rungs, against exact ground truth
- ``break_even_queries`` — build_sec / (exact_per_query −
                     index_per_query): the query volume past which
                     the index wins end-to-end. None when the index
                     never wins.

Every measurement is a tools/benchproto stamp (per-run host canaries
+ dispersion, ``canary-per-measurement-v1``), so host drift between
the 2-minute exact baseline and the index runs is attributable.

Recall targets are the ones the unit tests document
(tests/test_advanced.py): LSH >= 0.5, IVF >= 0.4, IVFADC >= 0.5 on
near-random vectors; the amplified fixture preserves cluster
structure, so scale should meet or beat them with scale-appropriate
parameters (IVF probes sqrt-n cells — the same n_cells policy the r6
s09 fix adopted).

    python tools/ann_recall.py [sf_dir] [--queries 20] [--batch 1000] \
        [--json ANN_RECALL_sf100.json]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_notifier_pipeline_spark import caching  # noqa: E402
from etl_notifier_pipeline_spark.catalog import load_table  # noqa: E402
from etl_notifier_pipeline_spark.extensions import similarity as S  # noqa: E402
from etl_notifier_pipeline_spark.session import get_spark  # noqa: E402
from tools.benchproto import (  # noqa: E402
    configure_io_canary,
    PROTOCOL_VERSION,
    protocol_header,
    stamped_runs,
)

K = 5
TARGETS = {"lsh": 0.5, "ivf": 0.4, "pq_ivfadc": 0.5}


def _pairs(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def _recall(truth: dict[int, set[int]], approx: dict[int, set[int]]) -> float:
    hits = sum(len(truth[q] & approx.get(q, set())) for q in truth)
    denom = sum(len(truth[q]) for q in truth)
    return round(hits / denom, 4) if denom else None


def _measure_maintenance(sf_dir: str, prev: dict, json_out: str) -> None:
    """Measure the index MAINTENANCE economics the s16-s19 lifecycle
    queries pin for correctness (r10): what a 1% ingest batch costs
    via ``ivf_append`` vs a full rebuild, and what a 1% tombstone mask
    costs at serve time vs the unmasked serve — merged into the
    artifact as a ``maintenance`` section. All rungs are stamped
    (``canary-per-measurement-v1``); correctness of both paths is
    oracle-pinned by s18/s16, so this section is pure economics."""
    spark = get_spark(
        "ann-maintenance",
        extra_conf={"spark.sql.broadcastTimeout": "3600"},
    )
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    n_cells = max(8, int(math.sqrt(n)))
    n_probe = max(2, n_cells // 20)
    # the "late ingest batch": 1% of the corpus re-keyed as new ids
    inc = caching.tracked_persist(
        emb.filter(F.col("vec_id") % 100 == 37).select(
            (F.col("vec_id") + F.lit(10_000_000)).alias("vec_id"),
            "embedding",
        )
    )
    n_inc = inc.count()
    root = tempfile.mkdtemp(prefix="ann_maint_")
    box: dict = {}

    def build_base():
        t0 = time.perf_counter()
        idx, params = S.ivf_build(emb, n_cells=n_cells)
        idx.write.mode("overwrite").parquet(f"{root}/base")
        box["params"] = params
        return time.perf_counter() - t0

    build_stamp = stamped_runs(build_base, n_runs=1)
    print(f"build base ({n:,}): {build_stamp['sec']}s", flush=True)

    def append_inc():
        t0 = time.perf_counter()
        S.ivf_append(box["params"], inc).write.mode("append").parquet(
            f"{root}/base"
        )
        return time.perf_counter() - t0

    append_stamp = stamped_runs(append_inc, n_runs=1)
    print(f"append ({n_inc:,}): {append_stamp['sec']}s", flush=True)

    def rebuild_all():
        t0 = time.perf_counter()
        idx2, _ = S.ivf_build(
            emb.select("vec_id", "embedding").unionByName(inc),
            n_cells=n_cells,
        )
        idx2.write.mode("overwrite").parquet(f"{root}/rebuilt")
        return time.perf_counter() - t0

    rebuild_stamp = stamped_runs(rebuild_all, n_runs=1)
    print(f"rebuild ({n + n_inc:,}): {rebuild_stamp['sec']}s", flush=True)

    stored = spark.read.parquet(f"{root}/base")
    step = max(1, n // 1000)
    q_batch = caching.tracked_persist(
        emb.filter(F.col("vec_id") % step == 0).limit(1000)
    )
    nq = q_batch.count()
    tombs = emb.filter(F.col("vec_id") % 100 == 11).select("vec_id")
    n_tombs = tombs.count()

    def serve(exclude):
        t0 = time.perf_counter()
        S.ivf_query(
            stored, box["params"], q_batch, k=K,
            n_probe=n_probe, exclude=exclude,
        ).collect()
        return time.perf_counter() - t0

    unmasked = stamped_runs(lambda: serve(None), n_runs=1)
    print(f"serve unmasked ({nq} q): {unmasked['sec']}s", flush=True)
    masked = stamped_runs(lambda: serve(tombs), n_runs=1)
    print(f"serve masked ({n_tombs:,} tombs): {masked['sec']}s", flush=True)

    # IVFADC: the costliest build (coarse train + residual codebooks +
    # encode), so the append-vs-rebuild ratio is the one that decides
    # whether a compressed index can keep up with an ingest stream.
    pq_box: dict = {}

    def pq_build_base():
        t0 = time.perf_counter()
        idx, params = S.ivfpq_build(emb)
        idx.write.mode("overwrite").parquet(f"{root}/pq_base")
        pq_box["params"] = params
        return time.perf_counter() - t0

    pq_build_stamp = stamped_runs(pq_build_base, n_runs=1)
    print(f"ivfpq build ({n:,}): {pq_build_stamp['sec']}s", flush=True)

    def pq_append_inc():
        t0 = time.perf_counter()
        S.ivfpq_append(pq_box["params"], inc).write.mode("append").parquet(
            f"{root}/pq_base"
        )
        return time.perf_counter() - t0

    pq_append_stamp = stamped_runs(pq_append_inc, n_runs=1)
    print(f"ivfpq append ({n_inc:,}): {pq_append_stamp['sec']}s", flush=True)

    def pq_rebuild_all():
        t0 = time.perf_counter()
        idx2, _ = S.ivfpq_build(
            emb.select("vec_id", "embedding").unionByName(inc)
        )
        idx2.write.mode("overwrite").parquet(f"{root}/pq_rebuilt")
        return time.perf_counter() - t0

    pq_rebuild_stamp = stamped_runs(pq_rebuild_all, n_runs=1)
    print(
        f"ivfpq rebuild ({n + n_inc:,}): {pq_rebuild_stamp['sec']}s",
        flush=True,
    )

    prev["maintenance"] = {
        "corpus_rows": n,
        "increment_rows": n_inc,
        "ivf_build": build_stamp,
        "ivf_append": append_stamp,
        "rebuild_with_increment": rebuild_stamp,
        "append_vs_rebuild_speedup": round(
            rebuild_stamp["sec"] / append_stamp["sec"], 2
        ),
        "ivfpq_build": pq_build_stamp,
        "ivfpq_append": pq_append_stamp,
        "ivfpq_rebuild_with_increment": pq_rebuild_stamp,
        "ivfpq_append_vs_rebuild_speedup": round(
            pq_rebuild_stamp["sec"] / pq_append_stamp["sec"], 2
        ),
        "n_queries": nq,
        "tombstone_rows": n_tombs,
        "serve_unmasked": unmasked,
        "serve_masked": masked,
        "mask_overhead_pct": round(
            (masked["sec"] - unmasked["sec"]) / unmasked["sec"] * 100, 1
        ),
        "protocol": protocol_header(
            1, canary=PROTOCOL_VERSION, single_run_rungs=True
        ),
    }
    with open(json_out, "w") as f:
        json.dump(prev, f, indent=1, sort_keys=True)
    print(f"wrote {json_out} (maintenance section)", flush=True)
    shutil.rmtree(root, ignore_errors=True)


def _measure_frontier(
    sf_dir: str, prev: dict, json_out: str, n_batch: int
) -> None:
    """Measure the recall/latency FRONTIER per family (r10 ask #3):
    the main harness records ONE operating point per family, so a user
    tuning recall-vs-cost has no curve. This rung sweeps the recall
    dial of each family — IVF ``n_probe``, LSH ``n_tables``, IVFADC
    ``cand_mult`` — at the same 1000-query batch rung and emits
    (recall@5, s/query) pairs, merged into the artifact as a
    ``frontier`` section.

    One index build per family: IVF and IVFADC query-time dials need
    no rebuild; LSH is built once at max(n_tables) — per-table
    hyperplanes are seed-deterministic (seed=42+t), so a query at
    fewer tables only emits buckets for tables 0..n-1 and the
    (tbl, bkt) equi-join never touches the extra tables' rows. Recall
    ground truth is recomputed unstamped (not stored in the artifact);
    every swept point is a cold single-run stamp, symmetric with the
    main harness's query_batch protocol."""
    spark = get_spark(
        "ann-frontier",
        extra_conf={"spark.sql.broadcastTimeout": "3600"},
    )
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    dim = len(emb.select("embedding").head()["embedding"])
    step = max(1, n // n_batch)
    q_batch = caching.tracked_persist(
        emb.filter(F.col("vec_id") % step == 0).limit(n_batch)
    )
    nq = q_batch.count()
    if prev.get("exact_batch", {}).get("n_queries") != nq:
        raise SystemExit(
            "--frontier rung mismatch: exact_batch was measured at "
            f"{prev.get('exact_batch', {}).get('n_queries')} queries, "
            f"this run uses {nq} — match --batch"
        )
    truth: dict[int, set[int]] = {}
    t0 = time.perf_counter()
    truth.update(_pairs(S.topk_cosine(emb, q_batch, k=K)))
    print(
        f"ground truth ({nq} q, unstamped): "
        f"{time.perf_counter() - t0:.1f}s",
        flush=True,
    )
    exact_per_q = prev["exact_batch"]["sec"] / nq

    n_cells = max(8, int(math.sqrt(n)))
    root = tempfile.mkdtemp(prefix="ann_frontier_")
    frontier: dict[str, dict] = {}

    def flush():
        prev["frontier"] = {
            **frontier,
            "n_queries_batch": nq,
            "exact_sec_per_query": round(exact_per_q, 4),
            "protocol": protocol_header(
                1,
                canary=PROTOCOL_VERSION,
                cold_single_run_points=True,
                one_build_per_family=True,
            ),
        }
        with open(json_out, "w") as f:
            json.dump(prev, f, indent=1, sort_keys=True)

    def sweep(name, build, points, query_of):
        """points: list of (label, param_value); query_of(stored,
        params, value) -> result DataFrame for the swept value."""
        path = os.path.join(root, name)
        t0 = time.perf_counter()
        idx, params = build()
        idx.write.mode("overwrite").parquet(path)
        build_sec = round(time.perf_counter() - t0, 3)
        stored = spark.read.parquet(path)
        cells = []
        for label, value in points:
            got: dict[int, set[int]] = {}

            def once(value=value):
                t0 = time.perf_counter()
                res = _pairs(query_of(stored, params, value))
                wall = time.perf_counter() - t0
                got.clear()
                got.update(res)
                return wall

            try:
                stamp = stamped_runs(once, n_runs=1)
            except Exception as e:  # noqa: BLE001 — keep the sweep
                cells.append(
                    {"point": label, "error": f"{type(e).__name__}: {e}"[:300]}
                )
                frontier[name] = {"build_sec": build_sec, "points": cells}
                flush()
                print(f"{name} {label}: FAILED {e}", flush=True)
                continue
            rec = _recall(truth, got)
            per_q = stamp["sec"] / nq
            cells.append(
                {
                    "point": label,
                    "recall_at_k": rec,
                    "query_batch": stamp,
                    "sec_per_query": round(per_q, 4),
                    "speedup_vs_exact": round(exact_per_q / per_q, 2),
                }
            )
            frontier[name] = {"build_sec": build_sec, "points": cells}
            flush()
            print(
                f"{name} {label}: recall={rec} "
                f"{stamp['sec']}s ({per_q * 1000:.0f} ms/q, "
                f"{exact_per_q / per_q:.1f}x exact)",
                flush=True,
            )

    probes = sorted(
        {
            max(2, n_cells // 40),
            max(2, n_cells // 20),
            max(2, n_cells // 10),
            max(2, n_cells // 5),
        }
    )
    sweep(
        "ivf",
        lambda: S.ivf_build(emb, n_cells=n_cells),
        [(f"n_probe={p}", p) for p in probes],
        lambda stored, params, p: S.ivf_query(
            stored, params, q_batch, k=K, n_probe=p
        ),
    )
    table_counts = [4, 8, 16]
    sweep(
        "lsh",
        lambda: S.lsh_build(
            emb, n_planes=6, n_tables=max(table_counts), dim=dim
        ),
        [(f"n_tables={t}", t) for t in table_counts],
        lambda stored, params, t: S.lsh_query(
            stored, {**params, "n_tables": t}, q_batch, k=K
        ),
    )
    sweep(
        "pq_ivfadc",
        lambda: S.ivfpq_build(emb),
        [(f"cand_mult={c}", c) for c in (50, 200, 800)],
        lambda stored, params, c: S.ivfpq_query(
            stored, params, q_batch, k=K, cand_mult=c
        ),
    )
    flush()
    print(f"wrote {json_out} (frontier section)", flush=True)
    shutil.rmtree(root, ignore_errors=True)


def _measure_code_budget(
    sf_dir: str, prev: dict, json_out: str, n_batch: int
) -> None:
    """Test the binding-constraint claim at docs/SCALE.md (r11 ask #5 /
    r12 ask #3): the IVFADC frontier showed its cand_mult rerank dial
    nearly free (recall ceiling ~0.77 at m=8 subquantizers x 256
    codes) and the doc CLAIMS 'the compressed index's recall ceiling,
    not its shortlist, is the binding constraint' — i.e. more code
    budget, not a wider shortlist, is what could buy IVF-0.88
    territory. This rung MEASURES it: build a second IVFADC index at
    DOUBLE the code budget (m=16 subquantizers, 4-dim subspaces, same
    256 codes -> 16 bytes/vector instead of 8) and serve the same
    1000-query batch at the frontier's dominating shortlist point
    (cand_mult=800) plus the main stamp's 200. Merged into the
    artifact as a ``code_budget`` section next to ``frontier``."""
    spark = get_spark(
        "ann-code-budget",
        extra_conf={"spark.sql.broadcastTimeout": "3600"},
    )
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    step = max(1, n // n_batch)
    q_batch = caching.tracked_persist(
        emb.filter(F.col("vec_id") % step == 0).limit(n_batch)
    )
    nq = q_batch.count()
    if prev.get("exact_batch", {}).get("n_queries") != nq:
        raise SystemExit(
            "--code-budget rung mismatch: exact_batch was measured at "
            f"{prev.get('exact_batch', {}).get('n_queries')} queries, "
            f"this run uses {nq} — match --batch"
        )
    truth: dict[int, set[int]] = {}
    t0 = time.perf_counter()
    truth.update(_pairs(S.topk_cosine(emb, q_batch, k=K)))
    print(
        f"ground truth ({nq} q, unstamped): "
        f"{time.perf_counter() - t0:.1f}s",
        flush=True,
    )
    exact_per_q = prev["exact_batch"]["sec"] / nq

    root = tempfile.mkdtemp(prefix="ann_codebudget_")
    path = os.path.join(root, "ivfadc_m16")
    t0 = time.perf_counter()
    idx, params = S.ivfpq_build(emb, m=16)
    idx.write.mode("overwrite").parquet(path)
    build_sec = round(time.perf_counter() - t0, 3)
    print(f"ivfadc m=16 build: {build_sec}s", flush=True)
    stored = spark.read.parquet(path)

    points = []
    doc_section = {
        "m": 16,
        "n_codes": 256,
        "bytes_per_vector": 16,
        "build_sec": build_sec,
        "baseline_family": "pq_ivfadc (m=8, 8 bytes/vector)",
        "points": points,
        "n_queries_batch": nq,
        "exact_sec_per_query": round(exact_per_q, 4),
        "protocol": protocol_header(
            1, canary=PROTOCOL_VERSION, cold_single_run_points=True
        ),
    }

    def flush():
        prev["code_budget"] = doc_section
        with open(json_out, "w") as f:
            json.dump(prev, f, indent=1, sort_keys=True)

    for c in (200, 800):
        got: dict[int, set[int]] = {}

        def once(c=c):
            t0 = time.perf_counter()
            res = _pairs(
                S.ivfpq_query(stored, params, q_batch, k=K, cand_mult=c)
            )
            wall = time.perf_counter() - t0
            got.clear()
            got.update(res)
            return wall

        try:
            stamp = stamped_runs(once, n_runs=1)
        except Exception as e:  # noqa: BLE001 — keep earlier points
            points.append(
                {"point": f"cand_mult={c}",
                 "error": f"{type(e).__name__}: {e}"[:300]}
            )
            flush()
            print(f"m16 cand_mult={c}: FAILED {e}", flush=True)
            continue
        rec = _recall(truth, got)
        per_q = stamp["sec"] / nq
        points.append(
            {
                "point": f"cand_mult={c}",
                "recall_at_k": rec,
                "query_batch": stamp,
                "sec_per_query": round(per_q, 4),
                "speedup_vs_exact": round(exact_per_q / per_q, 2),
            }
        )
        flush()
        print(
            f"m16 cand_mult={c}: recall={rec} {stamp['sec']}s "
            f"({per_q * 1000:.0f} ms/q)",
            flush=True,
        )
    flush()
    print(f"wrote {json_out} (code_budget section)", flush=True)
    shutil.rmtree(root, ignore_errors=True)


def _carry_sections(prev: dict | None, json_out: str | None) -> dict:
    """The --frontier / --maintenance rungs MERGE their sections into
    an existing artifact; a plain (or --family) run used to rewrite the
    JSON wholesale and silently drop them (it lost 353 lines of measured
    frontier+maintenance data in r11). Collect any previously merged
    sections to carry forward — from --merge's source if given, else
    from whatever already sits at --json."""
    sources = [prev] if prev else []
    if json_out and os.path.exists(json_out):
        try:
            sources.append(json.load(open(json_out)))
        except (OSError, json.JSONDecodeError):
            pass
    out: dict = {}
    for section in ("frontier", "maintenance", "code_budget"):
        # --merge's source wins; the artifact at --json backstops a
        # section the merge source never carried
        for source in sources:
            if section in source:
                out[section] = source[section]
                break
    return out


def main() -> None:
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    n_small = 20
    if "--queries" in args:
        i = args.index("--queries")
        n_small = int(args[i + 1])
        del args[i : i + 2]
    n_batch = 1000
    if "--batch" in args:
        i = args.index("--batch")
        n_batch = int(args[i + 1])
        del args[i : i + 2]
    # --merge: reuse the exact-baseline STAMPS and the untouched
    # families' cells from an existing artifact, rerunning only
    # --family (comma list). Ground-truth neighbor pairs are not
    # stored in the artifact, so the exact searches still run once —
    # unstamped — to recompute them (a family rerun must not
    # re-measure a baseline it isn't changing).
    merge_from = None
    if "--merge" in args:
        i = args.index("--merge")
        merge_from = args[i + 1]
        del args[i : i + 2]
    fam_filter = None
    if "--family" in args:
        i = args.index("--family")
        fam_filter = set(args[i + 1].split(","))
        del args[i : i + 2]
        if merge_from is None:
            # Without a prior artifact to carry the unselected families
            # from, a filtered run would silently DROP them (and the
            # pq_flat diagnostic) from the written artifact.
            raise SystemExit("--family requires --merge (carry the others)")
    maintenance = "--maintenance" in args
    if maintenance:
        args.remove("--maintenance")
    frontier = "--frontier" in args
    if frontier:
        args.remove("--frontier")
    code_budget = "--code-budget" in args
    if code_budget:
        args.remove("--code-budget")
    sf_dir = args[0] if args else "/root/repo/.scale/sf100"
    configure_io_canary(sf_dir)  # probe what this run measures
    prev = json.load(open(merge_from)) if merge_from else None
    carry_sections = _carry_sections(prev, json_out)
    if maintenance:
        if prev is None or not json_out:
            raise SystemExit("--maintenance requires --merge and --json")
        return _measure_maintenance(sf_dir, prev, json_out)
    if frontier:
        if prev is None or not json_out:
            raise SystemExit("--frontier requires --merge and --json")
        return _measure_frontier(sf_dir, prev, json_out, n_batch)
    if code_budget:
        if prev is None or not json_out:
            raise SystemExit("--code-budget requires --merge and --json")
        return _measure_code_budget(sf_dir, prev, json_out, n_batch)

    spark = get_spark(
        "ann-recall",
        extra_conf={
            # the 1000-query exact/LSH batch rungs at 2 M vectors build
            # broadcast sides for minutes under load; the 300 s default
            # future timeout killed the first r10 attempt mid-harness
            "spark.sql.broadcastTimeout": "3600",
        },
    )
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    dim = len(emb.select("embedding").head()["embedding"])

    def query_set(nq: int):
        step = max(1, n // nq)
        q = emb.filter(F.col("vec_id") % step == 0).limit(nq)
        q = caching.tracked_persist(q)
        return q, q.count()

    q_small, nq_small = query_set(n_small)
    q_batch, nq_batch = query_set(n_batch)

    # exact baselines (s01 brute force): ground truth AND the thing an
    # index must amortize past. Small rung warm best-of-2; batch rung
    # cold n_runs=1 (symmetric with each index's batch run).
    truth_small: dict = {}
    truth_batch: dict = {}

    def exact_run(queries, sink: dict):
        t0 = time.perf_counter()
        got = _pairs(S.topk_cosine(emb, queries, k=K))
        wall = time.perf_counter() - t0
        sink.clear()
        sink.update(got)
        return wall

    if prev is not None:
        # the carried stamps are only valid at the SAME rung sizes —
        # exact_per_q below divides the carried seconds by the current
        # nq; a --batch/--queries mismatch would corrupt every
        # speedup/break-even stamp by the ratio
        for key, nq_now in (("exact_small", nq_small), ("exact_batch", nq_batch)):
            nq_prev = prev[key].get("n_queries")
            if nq_prev != nq_now:
                raise SystemExit(
                    f"--merge rung mismatch: {key} was measured at "
                    f"{nq_prev} queries, this run uses {nq_now} — "
                    f"rerun without --merge (or match --queries/--batch)"
                )
        exact_run(q_small, truth_small)
        exact_run(q_batch, truth_batch)
        exact_small = {
            k: v for k, v in prev["exact_small"].items() if k != "n_queries"
        }
        exact_batch = {
            k: v for k, v in prev["exact_batch"].items() if k != "n_queries"
        }
        print(
            f"exact baselines reused from {merge_from} "
            f"(ground truth recomputed unstamped)",
            flush=True,
        )
    else:
        exact_small = stamped_runs(
            lambda: exact_run(q_small, truth_small), n_runs=2
        )
        print(
            f"exact small ({nq_small} q): {exact_small['sec']}s", flush=True
        )
        exact_batch = stamped_runs(
            lambda: exact_run(q_batch, truth_batch), n_runs=1
        )
        print(
            f"exact batch ({nq_batch} q): {exact_batch['sec']}s", flush=True
        )

    n_cells = max(8, int(math.sqrt(n)))  # the r6 sqrt-n cell policy
    root = tempfile.mkdtemp(prefix="ann_idx_")
    families = {
        # s03's registry parameters, scaled tables for a 2 M corpus
        "lsh": {
            "build": lambda: S.lsh_build(
                emb, n_planes=6, n_tables=8, dim=dim
            ),
            "query": lambda idx, p, q: S.lsh_query(idx, p, q, k=K),
        },
        "ivf": {
            "build": lambda: S.ivf_build(emb, n_cells=n_cells),
            # n_cells/10, the r11 frontier's measured knee: recall@5
            # 0.57 -> 0.73 for 1.26x the probe cost (the r10 n_cells/20
            # point sat below the curve's useful region).
            "query": lambda idx, p, q: S.ivf_query(
                idx, p, q, k=K, n_probe=max(2, n_cells // 10)
            ),
        },
        # PQ's scale configuration: IVFADC (PQ on coarse-cell
        # residuals, Jegou 2011). cand_mult=200 -> 1000 exact
        # comparisons per query (0.05% of a 2M corpus): the rerank
        # width is the recall dial.
        "pq_ivfadc": {
            "build": lambda: S.ivfpq_build(emb),
            "query": lambda idx, p, q: S.ivfpq_query(
                idx, p, q, k=K, cand_mult=200
            ),
        },
    }
    out: dict[str, dict] = {}

    def flush(doc_families):
        """Write the artifact after EVERY family: a late-family
        failure (the r10 IVFADC maxResultSize kill) must not discard
        the measured exact baseline + earlier families."""
        if not json_out:
            return
        doc = {
            "metric": "ann_recall_at_scale",
            "sf_dir": sf_dir,
            "n_vectors": n,
            "dim": dim,
            "k": K,
            "protocol": protocol_header(
                1,
                canary=PROTOCOL_VERSION,
                small_rung_runs=2,
                batch_rung_runs=1,
                build_includes_parquet_write=True,
                queries_served_from_stored_index=True,
            ),
            "exact_small": {**exact_small, "n_queries": nq_small},
            "exact_batch": {**exact_batch, "n_queries": nq_batch},
            "families": doc_families,
            "ivf_n_cells": n_cells,
            **carry_sections,
        }
        if carry_sections:
            print(
                f"carrying previously merged sections: "
                f"{sorted(carry_sections)}",
                flush=True,
            )
        with open(json_out, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)

    for name, fam in families.items():
        if fam_filter is not None and name not in fam_filter:
            carried = (prev or {}).get("families", {}).get(name)
            if carried is not None:
                out[name] = carried
                print(f"{name}: carried from {merge_from}", flush=True)
            continue
        path = os.path.join(root, name)
        params_box: dict = {}

        def build(fam=fam, path=path):
            t0 = time.perf_counter()
            idx, params = fam["build"]()
            idx.write.mode("overwrite").parquet(path)
            params_box["params"] = params
            return time.perf_counter() - t0

        try:
            build_stamp = stamped_runs(build, n_runs=1)
            stored = spark.read.parquet(path)
            params = params_box["params"]

            approx_small: dict = {}
            approx_batch: dict = {}

            def qrun(queries, sink, fam=fam, stored=stored, params=params):
                t0 = time.perf_counter()
                got = _pairs(fam["query"](stored, params, queries))
                wall = time.perf_counter() - t0
                sink.clear()
                sink.update(got)
                return wall

            q_small_stamp = stamped_runs(
                lambda: qrun(q_small, approx_small), n_runs=2
            )
            q_batch_stamp = stamped_runs(
                lambda: qrun(q_batch, approx_batch), n_runs=1
            )
            rec_small = _recall(truth_small, approx_small)
            rec_batch = _recall(truth_batch, approx_batch)

            exact_per_q = exact_batch["sec"] / nq_batch
            index_per_q = q_batch_stamp["sec"] / nq_batch
            saves = exact_per_q - index_per_q
            cell = {
                "build": build_stamp,
                "query_small": q_small_stamp,
                "query_batch": q_batch_stamp,
                "n_queries_small": nq_small,
                "n_queries_batch": nq_batch,
                "recall_at_k_small": rec_small,
                "recall_at_k_batch": rec_batch,
                "batch_speedup_vs_exact": round(
                    exact_batch["sec"] / q_batch_stamp["sec"], 2
                ),
                "break_even_queries": (
                    int(math.ceil(build_stamp["sec"] / saves))
                    if saves > 0
                    else None
                ),
            }
            if name in TARGETS:
                cell["target"] = TARGETS[name]
                cell["meets_target"] = (
                    rec_batch is not None and rec_batch >= TARGETS[name]
                )
            out[name] = cell
            flush(out)
            print(
                f"{name}: build={build_stamp['sec']}s "
                f"q{nq_small}={q_small_stamp['sec']}s "
                f"q{nq_batch}={q_batch_stamp['sec']}s "
                f"recall={rec_small}/{rec_batch} "
                f"speedup={cell['batch_speedup_vs_exact']}x "
                f"break_even={cell['break_even_queries']}",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 — harness resilience:
            # record the failure IN the artifact and keep measuring
            # the remaining families (r10: one family's kill cost the
            # whole 45-minute run)
            out[name] = {"error": f"{type(e).__name__}: {e}"[:500]}
            flush(out)
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


    # flat-PQ diagnostic rides along one-shot at the small rung: on
    # near-random unit vectors whole-vector quantization error exceeds
    # the true-vs-bulk cosine gap, so ADC ranking degenerates at ANY
    # code count — the finding this harness exists to catch, and why
    # s14 (IVFADC) exists. Reruns with the PQ family; carried on a
    # non-PQ --family rerun.
    if fam_filter is not None and "pq_ivfadc" not in fam_filter:
        carried = (prev or {}).get("families", {}).get("pq_flat_diagnostic")
        if carried is None:
            carried = (prev or {}).get("pq_flat_diagnostic")
        if carried is not None:
            out["pq_flat_diagnostic"] = carried
        flush(out)
        if json_out:
            print(f"wrote {json_out}")
        shutil.rmtree(root, ignore_errors=True)
        return
    diag: dict = {}

    def flat_pq():
        t0 = time.perf_counter()
        got = _pairs(S.pq_topk(emb, q_small, k=K))
        wall = time.perf_counter() - t0
        diag.clear()
        diag.update(got)
        return wall

    flat_stamp = stamped_runs(flat_pq, n_runs=1)
    out["pq_flat_diagnostic"] = {
        "one_shot": flat_stamp,
        "recall_at_k_small": _recall(truth_small, diag),
        "note": (
            "diagnostic, no target: flat PQ is expected to degenerate "
            "on near-random vectors at this scale — use ivfpq (s14)"
        ),
    }

    flush(out)
    if json_out:
        print(f"wrote {json_out}")
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
