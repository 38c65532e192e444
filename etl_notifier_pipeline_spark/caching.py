"""Tracked persist — bounded cache lifetime across multi-query sweeps.

Several query builders persist a shared intermediate frame (hashed
shingle sets, SimHash bands, IVF cell assignments, token explodes)
because two or more legs of the returned lazy plan consume it. The
persist cannot be released inside the builder — the consumer has not
materialized yet — but leaving it pinned forever means a 164-query
parity/bench sweep accumulates cached blocks until LRU eviction churn
sets in (r4 ADVICE).

Contract: builders call :func:`tracked_persist` instead of
``df.persist()``; harnesses (``bench.py``, ``tools/parity.py``, test
fixtures) call :func:`release_all` after each query's action
completes. A single-query user who never calls ``release_all`` gets
exactly the old behavior (persist until session end) — the pattern is
strictly opt-in for sweep drivers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for later :func:`release_all`."""
    df = df.persist()
    _TRACKED.append(df)
    return df


def release_all() -> int:
    """Unpersist every tracked frame; returns how many were released.

    Safe to call at any time: unpersisting a frame mid-plan only drops
    cached blocks (Spark recomputes), it never breaks correctness.
    """
    n = len(_TRACKED)
    for df in _TRACKED:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
    _TRACKED.clear()
    return n
