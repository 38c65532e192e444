"""tools/benchproto protocol-stamp invariants (r8 ADVICE, low):
median must be the true median for even run counts, and run_once
extras must never overwrite reserved protocol keys."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.benchproto import stamped_runs  # noqa: E402


def test_even_n_runs_uses_true_median_for_dispersion():
    # runs 1.0, 2.0, 3.0, 10.0 -> median 2.5 (upper-middle would be 3.0)
    seq = iter([1.0, 2.0, 3.0, 10.0])
    stamp = stamped_runs(lambda: next(seq), n_runs=4)
    assert stamp["sec"] == 1.0
    assert stamp["runs_sec"] == [1.0, 2.0, 3.0, 10.0]
    # dispersion = (10-1)/2.5*100 = 360.0 with the true median
    assert stamp["dispersion_pct"] == 360.0
    # n_runs+1 canaries -> n_runs brackets of 2
    assert len(stamp["canary_ms"]) == 4
    assert all(len(pair) == 2 for pair in stamp["canary_ms"])


def test_extras_cannot_clobber_protocol_keys():
    stamp = stamped_runs(
        lambda: (2.0, {"sec": 99.0, "runs_sec": [0], "rows": 7}),
        n_runs=1,
    )
    # protocol keys survive; colliding extras land namespaced
    assert stamp["sec"] == 2.0
    assert stamp["runs_sec"] == [2.0]
    assert stamp["rows"] == 7
    assert stamp["extra"] == {"sec": 99.0, "runs_sec": [0]}


def test_best_run_extras_merged():
    seq = iter([(3.0, {"rows": 30}), (1.0, {"rows": 10}), (2.0, {"rows": 20})])
    stamp = stamped_runs(lambda: next(seq), n_runs=3)
    assert stamp["sec"] == 1.0 and stamp["rows"] == 10
    assert "extra" not in stamp


def test_single_run_stamp_has_null_dispersion():
    """r9 what's-wrong #2: a one-shot stamp (n_runs=1) must label
    dispersion None — 0.0 would read as a convergence claim the single
    run cannot make."""
    from tools.benchproto import stamped_runs

    stamp = stamped_runs(lambda: 1.5, n_runs=1)
    assert stamp["dispersion_pct"] is None
    assert stamp["sec"] == 1.5 and stamp["runs_sec"] == [1.5]
