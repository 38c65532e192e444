"""As-of join (SURVEY §2.3 absent list: range/as-of).

Spark has no native ASOF JOIN; the engine composes one:

- ``asof_join`` (default): equi-join on the partition key with the
  range predicate, then keep the latest right row per left row via a
  ranking window. Correct for any data; the join inflates to
  |left ⨝_key right| before the window prunes it, so it fits when the
  per-key fan-out is bounded (the usual case: events × dimension
  versions).
- For unbounded fan-out, the scale path is the union-sort trick or
  per-key ``applyInPandas`` + ``pd.merge_asof`` (documented here,
  selectable via ``strategy="pandas"``) — sorts each key group once
  instead of materializing the pair blow-up.

DuckDB's native ``ASOF JOIN`` is the oracle for both.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    *,
    right_values: Sequence[str],
    strategy: str = "window",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_time`` <= ``left_time`` within the same ``on`` key
    (backward as-of). Left rows with no match keep NULL values.
    """
    if strategy == "pandas":
        return _asof_join_pandas(left, right, on, left_time, right_time, right_values)
    lid = "__asof_lid"
    # localCheckpoint (r13, corrected from persist after review): the
    # id-marked left frame feeds BOTH the range join and the no-match
    # anti-join restore, and the two consumers must agree on every
    # monotonically_increasing_id value. A persist() does NOT
    # guarantee that — evicted or executor-lost cached partitions are
    # RECOMPUTED, re-evaluating the id expression with possibly
    # different values per consumer (duplicate/lost rows in the
    # restore), and caching.release_all()'s "safe at any time"
    # contract would silently reintroduce the same divergence.
    # localCheckpoint materializes eagerly and TRUNCATES LINEAGE:
    # there is no recompute path, so the ids are one materialization's
    # by construction (fail-stop on block loss, like every iterative
    # operator in dedup.py — wrong-answer is not a failure mode).
    lmark = left.withColumn(
        lid, F.monotonically_increasing_id()
    ).localCheckpoint()
    # NULL right timestamps can never satisfy "greatest rt <= lt";
    # drop them up front so the isNull arm below only ever matches
    # left rows with no key match at all (left-join padding).
    r = right.filter(F.col(right_time).isNotNull()).select(
        *on, F.col(right_time).alias("__rt"), *[F.col(c) for c in right_values]
    )
    joined = lmark.join(r, list(on), "left").filter(
        F.col("__rt").isNull() | (F.col("__rt") <= F.col(left_time))
    )
    # Deterministic pick among equal timestamps: smallest right-value
    # tuple wins (no unique right key is guaranteed to exist).
    w = W.partitionBy(lid).orderBy(
        F.col("__rt").desc_nulls_last(), *[F.col(c).asc_nulls_last() for c in right_values]
    )
    best = joined.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    # Rows whose every candidate violated the range predicate were
    # filtered out entirely; restore them with NULL right-values.
    missing = lmark.join(best.select(lid), lid, "left_anti")
    nulls = [F.lit(None).cast(dict(r.dtypes)["__rt"]).alias("__rt")] + [
        F.lit(None).cast(dict(r.dtypes)[c]).alias(c) for c in right_values
    ]
    out = best.select(*lmark.columns, "__rt", *right_values).unionByName(
        missing.select(*lmark.columns, *nulls)
    )
    return out.drop(lid, "__rt")


def _asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    right_values: Sequence[str],
) -> DataFrame:
    """Scale path: cogroup both sides by key, ``pd.merge_asof`` per
    group (one sort each, no pair blow-up). Arrow-batched."""
    import pandas as pd

    from pyspark.sql import types as T

    out_fields = left.schema.fields + [right.schema[c] for c in right_values]
    out_schema = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in out_fields]
    )
    lcols = list(left.columns)

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if l.empty:
            return pd.DataFrame(columns=[f.name for f in out_schema.fields])
        l = l.sort_values(left_time)
        if r.empty:
            for c in right_values:
                l[c] = None
            return l[[f.name for f in out_schema.fields]]
        # rt ascending (merge_asof requirement); among equal rt, value
        # columns DESCENDING so merge_asof's pick (last tied row) is the
        # smallest value tuple — the same deterministic choice as the
        # window strategy's ranking tie-break.
        r = r[r[right_time].notna()].sort_values(
            [right_time, *right_values],
            ascending=[True] + [False] * len(right_values),
        )[[right_time, *right_values]]
        if r.empty:
            for c in right_values:
                l[c] = None
            return l[[f.name for f in out_schema.fields]]
        m = pd.merge_asof(
            l, r, left_on=left_time, right_on=right_time, direction="backward"
        )
        return m[[f.name for f in out_schema.fields]]

    return (
        left.groupBy(*on)
        .cogroup(right.groupBy(*on))
        .applyInPandas(lambda l, r: merge(l, r), out_schema)
    )
