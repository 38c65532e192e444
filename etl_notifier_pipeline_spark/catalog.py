"""Fixture-table catalog: load the driver's parquet tables for a scale dir.

Tables (per /root/repo/TESTDATA.md): region nation customer supplier part
orders lineitem events documents embeddings — one parquet file each under
``/root/testdata/sf{0.001,0.01,0.1}/``.

``load_tables`` returns plain DataFrames (lazy parquet scans — Catalyst
pushes filters/column pruning into them); ``register_views`` additionally
registers each as a temp view so SQL-expressed operators can refer to the
same names the DuckDB oracle uses.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(table_path(sf_dir, name))
    # Parquet TIMESTAMP(NANOS) columns arrive as long (see session.py
    # nanosAsLong); normalize to microsecond timestamps like every
    # other engine reading the same file (DuckDB truncates ns -> us).
    # Parquet TIMESTAMP with isAdjustedToUTC=false reads as
    # TIMESTAMP_NTZ on Spark >= 3.4 when inferTimestampNTZ is on;
    # normalize to TIMESTAMP (session tz is pinned UTC, so the cast is
    # a wall-clock no-op) so strict chrono functions (unix_micros,
    # window, watermarks) analyze on every runtime.
    for field in df.schema.fields:
        if (
            field.name == "ts"
            and field.dataType.simpleString() == "bigint"
            and name == "events"
        ):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif field.dataType.simpleString() == "timestamp_ntz":
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {
        name: load_table(spark, sf_dir, name)
        for name in TABLES
        if os.path.exists(table_path(sf_dir, name))
    }


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view named after itself."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
