"""Subprocess worker for the cross-process commit-CAS race test.

Run as: python tests/_cas_worker.py <store_root> <table> <worker_id>
        <n_commits> <ready_file> <go_file> [bucketed]

Spawns its OWN SparkSession (a second JVM — a genuinely independent
OS process against the pytest session's JVM), touches <ready_file>,
waits for <go_file>, then commits ``n_commits`` appends through the
same TableStore (or, with the ``bucketed`` flag, BucketedTableStore)
root the parent races, retrying on ConcurrentWriteError like any
optimistic-concurrency client. Exits 0 only if every commit
eventually landed.
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    root, table, worker_id, n_commits, ready_file, go_file = sys.argv[1:7]
    bucketed = len(sys.argv) > 7 and sys.argv[7] == "bucketed"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from pyspark.sql import SparkSession

    from etl_notifier_pipeline_spark.storage import (
        BucketedTableStore,
        ConcurrentWriteError,
        TableStore,
    )

    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"cas-worker-{worker_id}")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "2")
        .getOrCreate()
    )
    store = (
        BucketedTableStore(
            spark, root, keys={table: ["worker", "seq", "i"]}, n_buckets=4
        )
        if bucketed
        else TableStore(spark, root)
    )
    with open(ready_file, "w") as f:
        f.write("ready")
    deadline = time.monotonic() + 120
    while not os.path.exists(go_file):
        if time.monotonic() > deadline:
            raise TimeoutError("parent never signaled go")
        time.sleep(0.02)

    for seq in range(int(n_commits)):
        df = spark.createDataFrame(
            [(worker_id, seq, i) for i in range(3)],
            "worker string, seq long, i long",
        )
        for _attempt in range(100):
            try:
                store.append(table, df)
                break
            except ConcurrentWriteError:
                time.sleep(0.01)  # loser: re-read current and retry
        else:
            raise RuntimeError(f"commit never succeeded: {worker_id}/{seq}")
    spark.stop()


if __name__ == "__main__":
    main()
