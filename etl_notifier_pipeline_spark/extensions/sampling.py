"""Dataset splitting / sampling operators for training pipelines.

A training corpus needs reproducible splits: the split must be a pure
function of a stable row key — never ``rand()`` (re-runs, retries, and
added data would reshuffle rows across splits, leaking val/test into
train). The engine derives the split from the same engine-portable
md5-prefix hash as the dedup operators, so assignments are identical
across engines (DuckDB-oracle-checkable) and across runs, and adding
new rows never moves an existing row's split.

Spark's built-ins (``randomSplit``, ``sampleBy``) are seed-stable only
per partitioning — a repartition changes the sample. Hash-based
assignment has no such coupling: it is row-local, shuffle-free, and
embarrassingly parallel at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_notifier_pipeline_spark.extensions.text import token_hash


def split_bucket(key: Column, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets) from a stable key."""
    return token_hash(key.cast("string")) % n_buckets


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight: Column,
    *,
    resolution: int = 256,
    salt: str = ":ws",
) -> DataFrame:
    """Keep each row with probability ``min(1, weight/resolution)``,
    decided by a salted hash of the key — deterministic (retries and
    incremental data never flip prior decisions), row-local, zero
    shuffle. ``weight`` must be an integer-valued Column (the compare
    is pure integer arithmetic, bit-exact cross-engine); rows with
    weight >= resolution are always kept.

    Adds ``sample_key`` (the hash residue) for audit."""
    key = token_hash(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    return df.withColumn("sample_key", key % resolution).filter(
        F.col("sample_key") < F.least(F.lit(resolution), weight)
    )


def stratified_split(
    df: DataFrame,
    key_col: str,
    *,
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Assign train/val/test by hash bucket of the key column.

    Percentages are integer bucket counts out of 100 (exact, no float
    thresholds); the remainder is test. Pure projection — zero shuffle.
    """
    b = split_bucket(F.col(key_col))
    split = (
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)


def shard_assignment(
    df: DataFrame, key_col: str, n_shards: int = 64
) -> DataFrame:
    """Deterministic output-shard assignment: shard = md5-hash(key) %
    n_shards — the write-layout step of a training-data pipeline
    (stable across retries/partitioning, unlike rand() or
    monotonically_increasing_id; adding docs never moves old ones).

    Scale shape: a pure projection (no shuffle); the subsequent
    ``.repartition(n_shards, "shard_id")`` or partitionBy write is
    where the one unavoidable exchange happens, carrying data exactly
    once.
    """
    h = token_hash(F.col(key_col).cast("string"))
    return df.withColumn("shard_id", h % n_shards)


def mixture_resample(
    df: DataFrame,
    source_col: str,
    key_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    n_buckets: int = 10_000,
) -> DataFrame:
    """Per-source mixture resampling: keep each row iff its
    deterministic hash bucket falls under its source's acceptance rate
    — the up/down-weighting knob a pretraining pipeline uses to hit a
    target corpus mixture (e.g. downsample crawl, keep all reference
    text). Rates are fractions in [0, 1]; rate 1.0 keeps everything.

    rand()-free and keyed on ``key_col``: the same row is kept or
    dropped identically across retries, partitionings, and corpus
    growth (supersets keep supersets); raising a rate only ADDS rows,
    never swaps them — so mixture tuning is an incremental re-read,
    not a reshuffle of what was already sampled.

    Scale shape: pure projection + filter (the rate map compiles to a
    CASE chain, broadcast-free); no shuffle at all.
    """
    for s, r in rates.items():
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for {s!r} must be in [0,1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0,1], got {default_rate}")
    rate = F.lit(default_rate)
    for s, r in sorted(rates.items()):
        rate = F.when(F.col(source_col) == s, F.lit(r)).otherwise(rate)
    bucket = split_bucket(F.col(key_col), n_buckets)
    return df.filter(bucket < (rate * n_buckets).cast("bigint"))
