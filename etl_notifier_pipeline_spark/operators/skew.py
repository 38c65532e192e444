"""Skew-handling join helper (brief: 'skewed keys hurt … salting for
skew, AQE for runtime re-plan').

AQE's skew-join splitting (on by default in session.py) handles most
skew at runtime; ``salted_join`` is the explicit fallback for the cases
AQE can't fix — e.g. a shuffled aggregation-free join where one key
holds half the table, or pre-AQE engines. Mechanics:

- the skewed (big) side gets a deterministic salt in [0, n): derived by
  hashing a distinguishing column (NOT rand() — retries/speculative
  tasks must salt identically or results are nondeterministic);
- the small side is replicated n× with every salt value (explode);
- the join key becomes (key, salt): the hot key's rows now spread over
  n reducers instead of one.

Aggregations over salted joins need no unsalting step here because the
join output is row-identical to the unsalted join (asserted in tests).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, Column]],
    *,
    n_salts: int = 8,
    salt_source: Column | str | None = None,
) -> DataFrame:
    """Two-stage aggregation for hot group keys: stage 1 aggregates on
    (keys, salt) — the hot key's rows spread over ``n_salts`` reducers —
    stage 2 re-aggregates the per-salt partials on the keys alone (a
    tiny |keys|×n_salts frame).

    ``aggs`` maps output column -> (merge fn name, partial expression),
    where the merge fn re-combines partials: ``sum`` for sum/count
    partials, ``min``/``max`` for extrema. Only decomposable aggregates
    belong here (that's what makes two-stage correct); AVG = salted SUM
    + salted COUNT divided afterwards.

    Spark's own partial aggregation (map-side combine) already handles
    most group-by skew; this operator is for the residual case — e.g.
    high-cardinality partials (collect-style) or a combine-less
    aggregation path — and as the explicit, plan-visible form of the
    two-stage idiom. The salt is deterministic (hash, never rand()).
    """
    if salt_source is None:
        others = [c for c in df.columns if c not in keys] or list(keys)
        salt = F.pmod(F.xxhash64(*others), F.lit(n_salts))
    else:
        c = F.col(salt_source) if isinstance(salt_source, str) else salt_source
        salt = F.pmod(F.xxhash64(c), F.lit(n_salts))
    partial = (
        df.withColumn(SALT_COL, salt.cast("int"))
        .groupBy(*keys, SALT_COL)
        .agg(*[expr.alias(out) for out, (_, expr) in aggs.items()])
    )
    merged = [
        getattr(F, merge_fn)(out).alias(out)
        for out, (merge_fn, _) in aggs.items()
    ]
    return partial.groupBy(*keys).agg(*merged)


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    *,
    n_salts: int = 8,
    salt_source: Column | str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed big side with a (replicable) small side on ``keys``
    with an ``n_salts``-way salt. ``salt_source`` is the column whose
    hash spreads the hot key's rows (defaults to the whole row via
    xxhash64 of all non-key columns).

    Only ``inner`` and ``left`` are accepted: the small side is
    replicated ``n_salts`` times, so for right/full-outer joins every
    unmatched small-side row would surface once per salt — the salted
    result would not be row-identical to the unsalted join.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "replicating the small side breaks outer-join row identity"
        )
    if salt_source is None:
        others = [c for c in skewed.columns if c not in keys] or list(keys)
        salt = F.pmod(F.xxhash64(*others), F.lit(n_salts))
    else:
        c = F.col(salt_source) if isinstance(salt_source, str) else salt_source
        salt = F.pmod(F.xxhash64(c), F.lit(n_salts))
    left = skewed.withColumn(SALT_COL, salt.cast("int"))
    right = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return left.join(right, [*keys, SALT_COL], how).drop(SALT_COL)
