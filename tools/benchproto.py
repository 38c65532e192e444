"""Shared measurement protocol for every scale artifact (r7 verdict
ask #6).

r7's adjudication gap: DEPLOY/ZONEMAP/LAKEHOUSE/ANN bracketed WHOLE
runs with one canary pair (ANN's spanned 240 s), so a per-query drift
like q01 3.0 s -> 4.1 s across artifacts on an unchanged plan was
unattributable — shared-VM CPU speed here measurably varies 3.5x
within a day (docs/SCALE.md). The fix is mechanical and shared: every
MEASUREMENT (not artifact) is bracketed by its own host-speed canary
(bench.host_canary_ms — a fixed numpy sort+cumsum kernel, ~50 ms), and
every stamped dict carries run count, per-run seconds, per-run canary
brackets, and dispersion. A reviewer separates noise from regression
by comparing sec x (canary_ref / canary_this) per run, and the
dispersion says whether best-of-N converged.

Usage (all scale tools):

    from tools.benchproto import stamped_runs
    entry = stamped_runs(lambda: run_query())            # 3 runs
    entry = stamped_runs(one_commit, n_runs=1)           # one-shot,
        # still canary-bracketed so drift stays attributable

``run_once`` returns either seconds or (seconds, extra_metrics_dict);
the extras of the BEST run are merged into the stamp.
"""

from __future__ import annotations

import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROTOCOL_VERSION = "canary-per-measurement-v1"


def stamped_runs(run_once, n_runs: int = 3) -> dict:
    """Run ``run_once`` ``n_runs`` times, each run bracketed by its
    own host canary. Returns the protocol stamp:

    - ``sec``            best run (the headline, as every artifact
                         before r8 reported — comparable backwards)
    - ``runs_sec``       every run's wall seconds
    - ``canary_ms``      [pre, post] canary per run (consecutive runs
                         share the boundary canary — n_runs+1 kernels
                         total, so the bracket cost stays ~50 ms/run)
    - ``dispersion_pct`` (max-min)/median * 100 across runs — did
                         best-of-N converge, or is the host unstable?
                         ``None`` when n_runs == 1: a one-shot stamp
                         carries no convergence information, and a
                         literal 0.0 would read as a convergence CLAIM
                         (r9 verdict, what's-wrong #2)
    """
    import bench

    runs: list[float] = []
    canaries: list[list[float]] = []
    extras: list[dict | None] = []
    c_prev = bench.host_canary_ms()
    for _ in range(n_runs):
        r = run_once()
        sec, extra = r if isinstance(r, tuple) else (r, None)
        c_next = bench.host_canary_ms()
        runs.append(round(float(sec), 3))
        canaries.append([c_prev, c_next])
        extras.append(extra)
        c_prev = c_next
    best_i = min(range(n_runs), key=lambda i: runs[i])
    med = statistics.median(runs)
    stamp = {
        "sec": runs[best_i],
        "runs_sec": runs,
        "canary_ms": canaries,
        "dispersion_pct": (
            round(100.0 * (max(runs) - min(runs)) / med, 1)
            if n_runs > 1 and med
            else None
        ),
    }
    if extras[best_i]:
        # protocol keys are reserved: an extra named e.g. "sec" would
        # silently overwrite the stamped wall time — colliding extras
        # land under a namespaced "extra" dict instead
        clash = {k: v for k, v in extras[best_i].items() if k in stamp}
        stamp.update(
            {k: v for k, v in extras[best_i].items() if k not in stamp}
        )
        if clash:
            stamp["extra"] = clash
    return stamp


def protocol_header(n_runs: int, **kw) -> dict:
    """The artifact-level protocol block every JSON carries."""
    return {"runs": n_runs, "canary": PROTOCOL_VERSION, **kw}
