"""Versioned parquet table store with atomic overwrite (SURVEY §7 M2 risk 1).

Plain parquet has no ACID: an in-place overwrite that fails mid-write
corrupts the table. The reference leans on Postgres transactions
(``process-pipeline.py:36-64``); without Delta, the engine gets
atomicity from the classic versioned-directory + pointer-file swap:

    <root>/<table>/v=<n>/part-*.parquet
    <root>/<table>/_CURRENT        # contains "v=<n>"

- writers write the full new version directory, then atomically
  replace ``_CURRENT`` (os.replace is atomic on POSIX) — readers
  resolving through the pointer never observe a partial write;
- single-writer-per-table discipline is assumed (documented divergence
  from the reference's race-prone MAX+1 versioning, SURVEY §4 O7);
  on a real deployment this maps to one Delta/Iceberg commit, which
  this class is the minimal stand-in for.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class TableStore:
    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _pointer(self, table: str) -> str:
        return os.path.join(self._dir(table), "_CURRENT")

    def exists(self, table: str) -> bool:
        return os.path.exists(self._pointer(table))

    def current_version(self, table: str) -> int | None:
        if not self.exists(table):
            return None
        with open(self._pointer(table)) as f:
            return int(f.read().strip().removeprefix("v="))

    def path(self, table: str) -> str:
        v = self.current_version(table)
        if v is None:
            raise FileNotFoundError(f"no such table: {table}")
        return os.path.join(self._dir(table), f"v={v}")

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self.path(table))

    def overwrite(self, table: str, df: DataFrame) -> int:
        """Write a complete new version, then atomically swap the
        pointer. Readers either see the old version or the new one."""
        v = (self.current_version(table) or 0) + 1
        target = os.path.join(self._dir(table), f"v={v}")
        df.write.mode("overwrite").parquet(target)
        tmp = self._pointer(table) + ".tmp"
        with open(tmp, "w") as f:
            f.write(f"v={v}")
        os.replace(tmp, self._pointer(table))
        self._vacuum(table, keep=2)
        return v

    def append(self, table: str, df: DataFrame) -> int:
        """Ledger-style append = read current ∪ new, as a new version.
        (On Delta this is a plain transactional append; here the swap
        keeps the same all-or-nothing property.)"""
        if self.exists(table):
            df = self.read(table).unionByName(df)
        return self.overwrite(table, df)

    def _vacuum(self, table: str, keep: int) -> None:
        v = self.current_version(table)
        for name in os.listdir(self._dir(table)):
            if name.startswith("v="):
                n = int(name.removeprefix("v="))
                if n <= v - keep:
                    shutil.rmtree(os.path.join(self._dir(table), name), ignore_errors=True)
