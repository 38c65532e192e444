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

    def _manifest(self, table: str, v: int) -> list[str]:
        """Version dirs whose files version ``v`` references. A version
        with no manifest file (pre-manifest layout) is self-contained."""
        p = os.path.join(self._dir(table), f"v={v}", "_manifest.txt")
        if os.path.exists(p):
            with open(p) as f:
                return f.read().split()
        return [f"v={v}"]

    def read(self, table: str) -> DataFrame:
        v = self.current_version(table)
        if v is None:
            raise FileNotFoundError(f"no such table: {table}")
        dirs = [os.path.join(self._dir(table), d) for d in self._manifest(table, v)]
        return self.spark.read.parquet(*dirs)

    def _commit(self, table: str, v: int, manifest: list[str]) -> None:
        """Write the manifest into the version dir (underscore-prefixed,
        so parquet readers skip it), then atomically swap the pointer."""
        mpath = os.path.join(self._dir(table), f"v={v}", "_manifest.txt")
        with open(mpath, "w") as f:
            f.write("\n".join(manifest))
        tmp = self._pointer(table) + ".tmp"
        with open(tmp, "w") as f:
            f.write(f"v={v}")
        os.replace(tmp, self._pointer(table))
        self._vacuum(table, keep=2)

    def overwrite(self, table: str, df: DataFrame) -> int:
        """Write a complete new version, then atomically swap the
        pointer. Readers either see the old version or the new one."""
        v = (self.current_version(table) or 0) + 1
        target = os.path.join(self._dir(table), f"v={v}")
        df.write.mode("overwrite").parquet(target)
        self._commit(table, v, [f"v={v}"])
        return v

    def append(self, table: str, df: DataFrame) -> int:
        """File-level append: write ONLY the new rows' files into the
        next version dir; the new manifest references the prior
        version's files plus the new dir. Appending N rows to an M-row
        table writes O(N) bytes, not O(M+N) — at 100 TB ledger scale
        append-as-rewrite was the control plane's biggest cost (r01).
        The pointer swap keeps the same all-or-nothing property; on
        Delta/Iceberg this maps to a plain transactional append."""
        cur = self.current_version(table)
        if cur is None:
            return self.overwrite(table, df)
        # Fail fast on column drift (the old read-union-overwrite path
        # got this from unionByName; multi-dir parquet reads would
        # instead resolve columns permissively and yield silent NULLs).
        existing = set(self.read(table).columns)
        if set(df.columns) != existing:
            raise ValueError(
                f"append to {table!r}: columns {sorted(set(df.columns))} "
                f"do not match table columns {sorted(existing)}"
            )
        v = cur + 1
        target = os.path.join(self._dir(table), f"v={v}")
        df.write.mode("overwrite").parquet(target)
        self._commit(table, v, [*self._manifest(table, cur), f"v={v}"])
        return v

    def _vacuum(self, table: str, keep: int) -> None:
        """Delete version dirs neither recent nor referenced by any of
        the last ``keep`` versions' manifests (readers resolving an
        older pointer get a grace window, as before)."""
        v = self.current_version(table)
        referenced: set[str] = set()
        for recent in range(max(1, v - keep + 1), v + 1):
            if os.path.isdir(os.path.join(self._dir(table), f"v={recent}")):
                referenced.update(self._manifest(table, recent))
        for name in os.listdir(self._dir(table)):
            if name.startswith("v=") and name not in referenced:
                n = int(name.removeprefix("v="))
                if n <= v - keep:
                    shutil.rmtree(os.path.join(self._dir(table), name), ignore_errors=True)


class CatalogTableStore:
    """Metastore-backed TableStore twin (SURVEY §1.3's
    ``df.write.saveAsTable`` mapping): tables live in the session
    catalog / warehouse dir under a namespace instead of the
    pointer-file layout. Same duck-typed surface the control plane uses
    (exists/read/overwrite/append), so ``Ledger``/``ApprovalPipeline``
    run unchanged against either backend.

    Trade-offs vs ``TableStore`` (deliberate, documented): the catalog
    handles concurrent readers and name resolution, and ``append`` is a
    true file-level append; but plain-parquet ``saveAsTable`` overwrite
    is not atomic mid-write — pick THIS backend when a metastore is the
    deployment target (with Delta/Iceberg providing the transactional
    overwrite), the pointer-swap backend when it is not.
    """

    def __init__(self, spark: SparkSession, namespace: str = "engine") -> None:
        self.spark = spark
        self.namespace = namespace
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {namespace}")

    def _qualified(self, table: str) -> str:
        return f"{self.namespace}.{table}"

    def exists(self, table: str) -> bool:
        return self.spark.catalog.tableExists(self._qualified(table))

    def read(self, table: str) -> DataFrame:
        return self.spark.table(self._qualified(table))

    def overwrite(self, table: str, df: DataFrame) -> int:
        # Self-referential overwrites (the mutation pattern: read t,
        # transform, write t) must materialize first — saveAsTable
        # cannot scan the table it is truncating. localCheckpoint keeps
        # the materialization distributed (executor-local blocks, no
        # driver collect).
        if self.exists(table):
            df = df.localCheckpoint()
        df.write.mode("overwrite").format("parquet").saveAsTable(
            self._qualified(table)
        )
        return 0

    def append(self, table: str, df: DataFrame) -> int:
        df.write.mode("append").format("parquet").saveAsTable(self._qualified(table))
        return 0
