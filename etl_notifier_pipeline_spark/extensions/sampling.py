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
    df: DataFrame, key_col: str, n_shards: int = 64, salt: str = ":shard"
) -> DataFrame:
    """Deterministic output-shard assignment: shard = md5-hash(key +
    salt) % n_shards — the write-layout step of a training-data
    pipeline (stable across retries/partitioning, unlike rand() or
    monotonically_increasing_id; adding docs never moves old ones).

    ``salt`` decorrelates the shard lattice from the OTHER hash-keyed
    decisions on the same key (split_bucket's train/test split,
    mixture_resample) — without it every op would consult the same
    ``H(key) % n`` value and compose as min(), not independently
    (weighted_sample's ':ws' salt exists for the same reason).

    Scale shape: a pure projection (no shuffle); the subsequent
    ``.repartition(n_shards, "shard_id")`` or partitionBy write is
    where the one unavoidable exchange happens, carrying data exactly
    once.
    """
    h = token_hash(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    return df.withColumn("shard_id", h % n_shards)


def mixture_resample(
    df: DataFrame,
    source_col: str,
    key_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    n_buckets: int = 10_000,
    salt: str = ":mix",
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

    ``salt`` decorrelates this pass from other hash-keyed decisions on
    the same key (see shard_assignment) so chained sampling passes
    compose with rate r1*r2, not min(r1, r2).

    Scale shape: pure projection + filter (the rate map compiles to a
    CASE chain of INTEGER bucket thresholds — computed driver-side
    with round(), so non-dyadic rates like 0.7 keep exactly
    round(0.7*n_buckets) buckets instead of being bitten by double
    truncation); no shuffle at all.
    """
    for s, r in rates.items():
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for {s!r} must be in [0,1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0,1], got {default_rate}")
    threshold = F.lit(int(round(default_rate * n_buckets)))
    for s, r in sorted(rates.items()):
        threshold = F.when(
            F.col(source_col) == s, F.lit(int(round(r * n_buckets)))
        ).otherwise(threshold)
    bucket = split_bucket(
        F.concat(F.col(key_col).cast("string"), F.lit(salt)), n_buckets
    )
    return df.filter(bucket < threshold)
