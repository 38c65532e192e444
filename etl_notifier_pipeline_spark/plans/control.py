"""Control-plane + mutation queries (SURVEY §2.3 J2-J5, §2.9 ST1/ST4/ST5).

Each query drives the engine's mutation/ledger library on deterministic
slices of the ``events`` fixture (target = one event_type, incoming =
another) so the driver's DuckDB oracle can replay the MERGE semantics
in pure SQL. The interesting property being checked is batch-internal
conflict resolution: FIRST-row-wins for insert (the reference's
executemany + ON CONFLICT DO NOTHING order), LAST-row-wins for upsert
(later EXCLUDED rows overwrite earlier ones).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_notifier_pipeline_spark.catalog import load_table
from etl_notifier_pipeline_spark.operators import (
    delete_by_keys,
    filter_new_deletes,
    insert_if_absent,
    upsert,
)
from etl_notifier_pipeline_spark.plans.registry import register

_EVENT_COLS = ["event_id", "user_id", "event_type", "value"]


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.col("value").cast("double").alias("value")
    )

_EV_SQL = "SELECT event_id, user_id, event_type, CAST(value AS DOUBLE) AS value FROM events"


@register(
    "m01_insert_if_absent",
    category="mutation",
    oracle=f"""
WITH ev AS ({_EV_SQL}),
target AS (SELECT * FROM ev WHERE event_type = 'purchase'),
incoming AS (SELECT * FROM ev WHERE event_type = 'signup'),
first_in AS (
  SELECT event_id, user_id, event_type, value FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
    FROM incoming) WHERE rn = 1
)
SELECT * FROM target
UNION ALL
SELECT f.* FROM first_in f
WHERE NOT EXISTS (SELECT 1 FROM target t WHERE t.user_id = f.user_id)
""",
)
def m01_insert_if_absent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — INSERT ... ON CONFLICT DO NOTHING
    (``process-pipeline.py:152-174``): purchases are the table, signups
    the arriving batch, keyed by user_id; first batch row per key wins."""
    ev = _events(spark, sf_dir)
    target = ev.filter(F.col("event_type") == "purchase")
    incoming = ev.filter(F.col("event_type") == "signup")
    return insert_if_absent(target, incoming, ["user_id"], ["event_id"])


@register(
    "m02_upsert",
    category="mutation",
    oracle=f"""
WITH ev AS ({_EV_SQL}),
target AS (SELECT * FROM ev WHERE event_type = 'purchase'),
incoming AS (SELECT * FROM ev WHERE event_type = 'click'),
last_in AS (
  SELECT event_id, user_id, event_type, value FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
    FROM incoming) WHERE rn = 1
)
SELECT t.* FROM target t
WHERE NOT EXISTS (SELECT 1 FROM last_in l WHERE l.user_id = t.user_id)
UNION ALL
SELECT * FROM last_in
""",
)
def m02_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — ON CONFLICT DO UPDATE / MERGE
    (``process-pipeline.py:177-207``): clicks upsert into purchases by
    user_id; last batch row per key wins (EXCLUDED semantics)."""
    ev = _events(spark, sf_dir)
    target = ev.filter(F.col("event_type") == "purchase")
    incoming = ev.filter(F.col("event_type") == "click")
    return upsert(target, incoming, ["user_id"], ["event_id"])


@register(
    "m03_delete_by_keys",
    category="mutation",
    oracle=f"""
WITH ev AS ({_EV_SQL})
SELECT * FROM ev t
WHERE NOT EXISTS (
  SELECT 1 FROM ev d WHERE d.event_type = 'error' AND d.user_id = t.user_id)
""",
)
def m03_delete_by_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 — keyed delete (``process-pipeline.py:209-234``): drop every
    event of users who ever errored; one anti-join instead of one
    DELETE statement per key."""
    ev = _events(spark, sf_dir)
    del_keys = ev.filter(F.col("event_type") == "error").select("user_id")
    return delete_by_keys(ev, del_keys, ["user_id"])


@register(
    "m04_delete_queue_dedup",
    category="mutation",
    oracle=f"""
WITH ev AS ({_EV_SQL}),
new_deletes AS (
  SELECT user_id, MIN(event_id) AS event_id FROM ev
  WHERE event_type = 'error' GROUP BY user_id),
pending AS (
  SELECT DISTINCT user_id FROM ev
  WHERE event_type = 'error' AND event_id % 2 = 0)
SELECT n.user_id, n.event_id FROM new_deletes n
WHERE NOT EXISTS (SELECT 1 FROM pending p WHERE p.user_id = n.user_id)
""",
)
def m04_delete_queue_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 + ST4 — queue-then-execute delete dedup
    (``process-pipeline.py:285-296``): incoming delete requests minus
    those already pending (pending = even-event_id errors), one
    anti-join instead of a COUNT(*) probe per row."""
    ev = _events(spark, sf_dir)
    errs = ev.filter(F.col("event_type") == "error")
    new_deletes = errs.groupBy("user_id").agg(F.min("event_id").alias("event_id"))
    pending = errs.filter(F.col("event_id") % 2 == 0).select("user_id")
    return filter_new_deletes(new_deletes, pending, ["user_id"])


@register(
    "m05_idempotency_filter",
    category="ledger",
    oracle="""
SELECT e.event_id, e.user_id, e.event_type
FROM events e
WHERE NOT EXISTS (
  SELECT 1 FROM events p WHERE p.event_id = e.event_id AND p.event_id % 3 = 0)
""",
)
def m05_idempotency_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST1 — exactly-once ledger check (``process-pipeline.py:89-101``):
    already-processed event_ids (here: multiples of 3) are filtered out
    by one anti-join against the ledger, not a point SELECT per event."""
    ev = load_table(spark, sf_dir, "events")
    ledger = ev.filter(F.col("event_id") % 3 == 0).select("event_id")
    return ev.join(ledger, ["event_id"], "left_anti").select(
        "event_id", "user_id", "event_type"
    )


@register(
    "m06_file_versioning",
    category="ledger",
    oracle="""
SELECT event_id, user_id,
       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS file_version
FROM events
""",
)
def m06_file_versioning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/O7 — per-file monotone versioning (``data-query.py:70-85``'s
    MAX+1) computed set-at-a-time as row_number over the arrival order:
    user_id stands in for file_name, ts for arrival time."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id", "user_id", F.row_number().over(w).alias("file_version")
    )


@register(
    "m07_status_transition",
    category="ledger",
    oracle="""
SELECT CASE WHEN event_type = 'purchase' THEN 'approved'
            WHEN event_type = 'error' THEN 'rejected'
            ELSE NULL END AS status,
       COUNT(*) AS n
FROM events
GROUP BY 1
""",
)
def m07_status_transition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12/ST5-6 — the approve/reject -> approved/rejected/NULL status
    mapping (``process-pipeline.py:468``) as a codegen'd CASE, with the
    per-status ledger counts the notifier reports."""
    ev = load_table(spark, sf_dir, "events")
    status = (
        F.when(F.col("event_type") == "purchase", F.lit("approved"))
        .when(F.col("event_type") == "error", F.lit("rejected"))
        .otherwise(F.lit(None).cast("string"))
    )
    return ev.groupBy(status.alias("status")).agg(F.count(F.lit(1)).alias("n"))


@register(
    "m08_scd2_upsert",
    category="mutation",
    oracle="""
WITH cur AS (
  SELECT c_custkey, c_name, c_acctbal,
         '2025-01-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to
  FROM customer
),
inc AS (
  SELECT c_custkey, c_name, c_acctbal + 100.0 AS c_acctbal
  FROM customer WHERE c_custkey % 10 = 0
  UNION ALL
  SELECT c_custkey + 1000000 AS c_custkey, c_name, c_acctbal
  FROM customer WHERE c_custkey % 97 = 0
),
changed AS (
  SELECT t.c_custkey FROM cur t JOIN inc i USING (c_custkey)
  WHERE t.c_name IS DISTINCT FROM i.c_name
     OR t.c_acctbal IS DISTINCT FROM i.c_acctbal
)
SELECT c_custkey, c_name, c_acctbal, valid_from, '2026-01-01' AS valid_to
FROM cur WHERE c_custkey IN (SELECT c_custkey FROM changed)
UNION ALL
SELECT c_custkey, c_name, c_acctbal, valid_from, valid_to
FROM cur WHERE c_custkey NOT IN (SELECT c_custkey FROM changed)
UNION ALL
SELECT i.c_custkey, i.c_name, i.c_acctbal,
       '2026-01-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to
FROM inc i
WHERE i.c_custkey IN (SELECT c_custkey FROM changed)
   OR i.c_custkey NOT IN (SELECT c_custkey FROM cur)
""",
)
def m08_scd2_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 row-history upsert (operators/scd.py): changed keys close
    their current version at the effective timestamp and insert a new
    current row; unchanged rows emit no spurious versions; new keys
    insert as current. One broadcast-incoming plan over a single
    target scan — the engine-native form of a Delta MERGE
    close-and-insert. Deterministic effective timestamp by contract."""
    from etl_notifier_pipeline_spark.operators.scd import scd2_upsert

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    target = c.withColumn("valid_from", F.lit("2025-01-01")).withColumn(
        "valid_to", F.lit(None).cast("string")
    )
    incoming = (
        c.filter(F.col("c_custkey") % 10 == 0)
        .withColumn("c_acctbal", F.col("c_acctbal") + F.lit(100.0))
        .unionByName(
            c.filter(F.col("c_custkey") % 97 == 0).withColumn(
                "c_custkey", F.col("c_custkey") + F.lit(1000000)
            )
        )
    )
    return scd2_upsert(target, incoming, ["c_custkey"], "2026-01-01")


@register(
    "m09_incremental_agg_maintenance",
    category="mutation",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total_value,
       CAST(MAX(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS max_value,
       CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) / COUNT(*)
         AS avg_value
FROM events GROUP BY event_type
""",
)
def m09_incremental_agg_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Materialized-summary maintenance, value-checked against its
    declarative spec: the events table arrives as three batches
    (event_id mod 3 — simulating arrival files), each folded into the
    running summary with agg_delta + merge_aggregates; the oracle is
    the PLAIN aggregate over everything. Hash-equality proves the
    incremental path is exactly the declarative aggregate — the
    contract that lets a 100 TB dashboard read O(delta + groups) per
    batch instead of re-scanning the corpus
    (operators/incremental.py; reference parity:
    process-pipeline.py:193-196 applies increments row-wise).

    avg is ALGEBRAIC: maintained as (sum, count), derived on read —
    never merged directly (avg of avgs is wrong under unequal batch
    sizes)."""
    from etl_notifier_pipeline_spark.operators.incremental import (
        agg_delta,
        merge_aggregates,
    )

    ev = load_table(spark, sf_dir, "events")
    val = F.col("value").cast("decimal(10,2)")
    aggs = {
        "n_events": ("count", F.count(F.lit(1))),
        "total_value": ("sum", F.sum(val)),
        "max_value": ("max", F.max(val)),
    }
    kinds = {name: kind for name, (kind, _) in aggs.items()}
    batches = [ev.filter(F.col("event_id") % 3 == i) for i in range(3)]
    summary = agg_delta(batches[0], ["event_type"], aggs)
    for b in batches[1:]:
        summary = merge_aggregates(
            summary, agg_delta(b, ["event_type"], aggs), ["event_type"], kinds
        )
    return summary.select(
        "event_type",
        "n_events",
        F.col("total_value").cast("double").alias("total_value"),
        F.col("max_value").cast("double").alias("max_value"),
        (F.col("total_value").cast("double") / F.col("n_events")).alias(
            "avg_value"
        ),
    )


@register(
    "m10_time_travel_read",
    category="mutation",
    oracle="""
SELECT CAST(c_custkey AS BIGINT) AS ckey, c_name AS name,
       c_mktsegment AS seg
FROM customer
WHERE c_custkey <= 40
""",
)
def m10_time_travel_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot read AS OF a prior commit (BucketedTableStore time
    travel): commit 1 loads 40 customers, commit 2 upserts a mutated
    segment over half of them — reading version 1 must return the
    PRE-mutation table exactly (the oracle reproduces commit 1's
    contents from the fixture). The Delta/Iceberg `VERSION AS OF`
    capability on the engine's own storage backend; version dirs are
    immutable after the pointer swap, so the historical read costs one
    manifest lookup, never a log replay."""
    import tempfile

    from etl_notifier_pipeline_spark.storage import BucketedTableStore

    store = BucketedTableStore(
        spark, tempfile.mkdtemp(prefix="m10_"), keys={"cust": ["ckey"]},
        n_buckets=8,
    )
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") <= 40
    ).select(
        F.col("c_custkey").alias("ckey"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("seg"),
    )
    v1 = store.overwrite("cust", cust)
    mutated = cust.filter(F.col("ckey") <= 20).withColumn(
        "seg", F.lit("MUTATED")
    ).withColumn("__file_order", F.monotonically_increasing_id())
    store.apply_keyed_mutation(
        "cust", mutated, ["ckey"], ["__file_order"], "update"
    )
    return store.read("cust", version=v1)


@register(
    "m11_schema_evolution",
    category="mutation",
    oracle="""
SELECT CAST(c_custkey AS BIGINT) AS ckey, c_name AS name,
       CAST(NULL AS VARCHAR) AS seg
FROM customer WHERE c_custkey <= 30
UNION ALL
SELECT CAST(c_custkey AS BIGINT), c_name, c_mktsegment
FROM customer WHERE c_custkey > 30 AND c_custkey <= 60
""",
)
def m11_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-style mergeSchema append on the engine's own store: v1
    commits (ckey, name); the next batch appends WITH a new ``seg``
    column under merge_schema=True; reading back must surface the
    widened schema with NULL backfill on pre-evolution rows — exactly
    the oracle's UNION. The manifest carries an evolution flag so only
    evolved tables pay the parquet footer-merge read; appends stay
    O(new bytes)."""
    import tempfile

    from etl_notifier_pipeline_spark.storage import TableStore

    store = TableStore(spark, tempfile.mkdtemp(prefix="m11_"))
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ckey"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("seg"),
    )
    store.overwrite("cust", cust.filter(F.col("ckey") <= 30).drop("seg"))
    store.append(
        "cust",
        cust.filter((F.col("ckey") > 30) & (F.col("ckey") <= 60)),
        merge_schema=True,
    )
    return store.read("cust").select("ckey", "name", "seg")


@register(
    "m10_version_diff",
    category="mutation",
    oracle=f"""
WITH ev AS ({_EV_SQL}),
v1 AS (SELECT * FROM ev WHERE event_type = 'purchase'),
incoming AS (SELECT * FROM ev WHERE event_type = 'click'),
last_in AS (
  SELECT event_id, user_id, event_type, value FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
    FROM incoming) WHERE rn = 1
),
up AS (
  SELECT t.* FROM v1 t
  WHERE NOT EXISTS (SELECT 1 FROM last_in l WHERE l.user_id = t.user_id)
  UNION ALL
  SELECT * FROM last_in
),
v2 AS (
  SELECT * FROM up t
  WHERE NOT EXISTS (
    SELECT 1 FROM ev d WHERE d.event_type = 'error' AND d.user_id = t.user_id)
)
SELECT COALESCE(o.user_id, n.user_id) AS user_id,
       CASE WHEN o.user_id IS NULL THEN 'insert'
            WHEN n.user_id IS NULL THEN 'delete'
            ELSE 'update' END AS change,
       o.event_id AS old_event_id, o.event_type AS old_event_type,
       o.value AS old_value,
       n.event_id AS new_event_id, n.event_type AS new_event_type,
       n.value AS new_value
FROM v1 o FULL OUTER JOIN v2 n ON o.user_id = n.user_id
WHERE o.user_id IS NULL OR n.user_id IS NULL
   OR (o.event_id IS DISTINCT FROM n.event_id
       OR o.event_type IS DISTINCT FROM n.event_type
       OR o.value IS DISTINCT FROM n.value)
""",
)
def m10_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture between two RETAINED versions of a real
    versioned table — the Delta CHANGE DATA FEED / table_changes
    operation, earned from plain snapshots: v1 = purchases keyed by
    user, v2 = v1 after a click-upsert (m02's MERGE) and an
    error-user delete (m03), both written through TableStore so the
    diff reads v1 back via TIME TRAVEL (``read(table, version=1)``)
    rather than from a kept DataFrame. ``snapshot_diff`` classifies
    per key: insert (new user from clicks), update (click overwrote a
    purchase), delete (error user dropped); unchanged rows are
    filtered with a null-safe struct comparison. The oracle replays
    both states declaratively and full-outer-joins them with
    IS DISTINCT FROM semantics."""
    import tempfile

    from etl_notifier_pipeline_spark.operators import snapshot_diff
    from etl_notifier_pipeline_spark.storage import TableStore

    ev = _events(spark, sf_dir)
    v1 = ev.filter(F.col("event_type") == "purchase")
    incoming = ev.filter(F.col("event_type") == "click")
    v2 = delete_by_keys(
        upsert(v1, incoming, ["user_id"], ["event_id"]),
        ev.filter(F.col("event_type") == "error").select("user_id"),
        ["user_id"],
    )
    store = TableStore(spark, tempfile.mkdtemp(prefix="m10_"))
    store.overwrite("t", v1)
    store.overwrite("t", v2)
    diff = snapshot_diff(
        store.read("t", version=1), store.read("t", version=2), ["user_id"]
    )
    return diff.select(
        "user_id",
        "change",
        F.col("old_row.event_id").alias("old_event_id"),
        F.col("old_row.event_type").alias("old_event_type"),
        F.col("old_row.value").alias("old_value"),
        F.col("new_row.event_id").alias("new_event_id"),
        F.col("new_row.event_type").alias("new_event_type"),
        F.col("new_row.value").alias("new_value"),
    )


@register(
    "m13_change_feed",
    category="mutation",
    oracle=f"""
WITH ev AS ({_EV_SQL}),
s1 AS (
  SELECT event_id, user_id, event_type, value FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
    FROM ev WHERE event_type = 'purchase') WHERE rn = 1
),
last_click AS (
  SELECT event_id, user_id, event_type, value FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
    FROM ev WHERE event_type = 'click') WHERE rn = 1
),
s2 AS (
  SELECT t.* FROM s1 t
  WHERE NOT EXISTS (SELECT 1 FROM last_click l WHERE l.user_id = t.user_id)
  UNION ALL
  SELECT * FROM last_click
),
s3 AS (
  SELECT * FROM s2 t
  WHERE NOT EXISTS (
    SELECT 1 FROM ev d WHERE d.event_type = 'error' AND d.user_id = t.user_id)
),
d12 AS (
  SELECT COALESCE(o.user_id, n.user_id) AS user_id,
         CASE WHEN o.user_id IS NULL THEN 'insert'
              WHEN n.user_id IS NULL THEN 'delete'
              ELSE 'update' END AS change,
         o.event_id AS old_event_id, o.event_type AS old_event_type,
         o.value AS old_value,
         n.event_id AS new_event_id, n.event_type AS new_event_type,
         n.value AS new_value,
         CAST(2 AS BIGINT) AS commit_version
  FROM s1 o FULL OUTER JOIN s2 n ON o.user_id = n.user_id
  WHERE o.user_id IS NULL OR n.user_id IS NULL
     OR o.event_id IS DISTINCT FROM n.event_id
     OR o.event_type IS DISTINCT FROM n.event_type
     OR o.value IS DISTINCT FROM n.value
),
d23 AS (
  SELECT COALESCE(o.user_id, n.user_id) AS user_id,
         CASE WHEN o.user_id IS NULL THEN 'insert'
              WHEN n.user_id IS NULL THEN 'delete'
              ELSE 'update' END AS change,
         o.event_id, o.event_type, o.value,
         n.event_id, n.event_type, n.value,
         CAST(3 AS BIGINT)
  FROM s2 o FULL OUTER JOIN s3 n ON o.user_id = n.user_id
  WHERE o.user_id IS NULL OR n.user_id IS NULL
     OR o.event_id IS DISTINCT FROM n.event_id
     OR o.event_type IS DISTINCT FROM n.event_type
     OR o.value IS DISTINCT FROM n.value
)
SELECT * FROM d12 UNION ALL SELECT * FROM d23
""",
)
def m13_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-commit CHANGE DATA FEED over the versioned store — Delta's
    ``table_changes(t, from, to)``: three commits are written through
    TableStore (v1 = last purchase per user; v2 = v1 after the click
    MERGE; v3 = v2 after the error-user delete, retain_versions=3 so
    the whole history stays diffable), then ``change_feed`` unions the
    per-commit snapshot diffs, each row tagged with the
    ``commit_version`` that produced it. The oracle replays all three
    states declaratively and unions the two IS DISTINCT FROM diffs.
    The replayability invariant (applying the feed to v1 reconstructs
    v3 exactly) is pinned in tests/test_mutations.py."""
    import tempfile

    from pyspark.sql.window import Window

    from etl_notifier_pipeline_spark.operators import change_feed
    from etl_notifier_pipeline_spark.storage import TableStore

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
    s1 = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    s2 = upsert(
        s1, ev.filter(F.col("event_type") == "click"), ["user_id"], ["event_id"]
    )
    s3 = delete_by_keys(
        s2,
        ev.filter(F.col("event_type") == "error").select("user_id"),
        ["user_id"],
    )
    store = TableStore(
        spark, tempfile.mkdtemp(prefix="m13_"), retain_versions=3
    )
    for state in (s1, s2, s3):
        store.overwrite("t", state)
    feed = change_feed(store, "t", ["user_id"])
    return feed.select(
        "user_id",
        "change",
        F.col("old_row.event_id").alias("old_event_id"),
        F.col("old_row.event_type").alias("old_event_type"),
        F.col("old_row.value").alias("old_value"),
        F.col("new_row.event_id").alias("new_event_id"),
        F.col("new_row.event_type").alias("new_event_type"),
        F.col("new_row.value").alias("new_value"),
        "commit_version",
    )


@register(
    "m18_restore",
    category="mutation",
    oracle=f"""
WITH ev AS ({_EV_SQL}),
s1 AS (
  SELECT event_id, user_id, event_type, value FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
    FROM ev WHERE event_type = 'purchase') WHERE rn = 1
),
last_click AS (
  SELECT event_id, user_id, event_type, value FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
    FROM ev WHERE event_type = 'click') WHERE rn = 1
),
s2 AS (
  SELECT t.* FROM (
    SELECT t.* FROM s1 t
    WHERE NOT EXISTS (SELECT 1 FROM last_click l WHERE l.user_id = t.user_id)
    UNION ALL
    SELECT * FROM last_click) t
  WHERE NOT EXISTS (
    SELECT 1 FROM ev d WHERE d.event_type = 'error' AND d.user_id = t.user_id)
)
SELECT COALESCE(o.user_id, n.user_id) AS user_id,
       CASE WHEN o.user_id IS NULL THEN 'insert'
            WHEN n.user_id IS NULL THEN 'delete'
            ELSE 'update' END AS change,
       o.event_id AS old_event_id, o.event_type AS old_event_type,
       o.value AS old_value,
       n.event_id AS new_event_id, n.event_type AS new_event_type,
       n.value AS new_value,
       CAST(3 AS BIGINT) AS commit_version
FROM s2 o FULL OUTER JOIN s1 n ON o.user_id = n.user_id
WHERE o.user_id IS NULL OR n.user_id IS NULL
   OR o.event_id IS DISTINCT FROM n.event_id
   OR o.event_type IS DISTINCT FROM n.event_type
   OR o.value IS DISTINCT FROM n.value
""",
)
def m18_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE TABLE ... TO VERSION AS OF — Delta's rollback — on the
    engine's own store: v1 = last purchase per user; v2 = v1 after a
    click MERGE plus an error-user delete (a bad batch to undo);
    ``store.restore("t", 1)`` then commits v3 as a METADATA-ONLY
    rollback (v3's manifest re-references v1's immutable files — zero
    data bytes move, O(1) whatever the table size, pinned in
    tests/test_mutations.py). The returned frame is the restore
    commit's own change feed — the reverse diff that undid the bad
    batch, read via real time travel on both sides — so the oracle
    (s2 full-outer-join s1, IS DISTINCT FROM) checks both that the
    rollback happened and that the store serves v1's exact contents
    afterwards."""
    import tempfile

    from pyspark.sql.window import Window

    from etl_notifier_pipeline_spark.operators import change_feed
    from etl_notifier_pipeline_spark.storage import TableStore

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
    s1 = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    s2 = delete_by_keys(
        upsert(
            s1,
            ev.filter(F.col("event_type") == "click"),
            ["user_id"],
            ["event_id"],
        ),
        ev.filter(F.col("event_type") == "error").select("user_id"),
        ["user_id"],
    )
    store = TableStore(
        spark, tempfile.mkdtemp(prefix="m18_"), retain_versions=3
    )
    store.overwrite("t", s1)
    store.overwrite("t", s2)
    store.restore("t", 1)
    feed = change_feed(store, "t", ["user_id"], from_version=2, to_version=3)
    return feed.select(
        "user_id",
        "change",
        F.col("old_row.event_id").alias("old_event_id"),
        F.col("old_row.event_type").alias("old_event_type"),
        F.col("old_row.value").alias("old_value"),
        F.col("new_row.event_id").alias("new_event_id"),
        F.col("new_row.event_type").alias("new_event_type"),
        F.col("new_row.value").alias("new_value"),
        "commit_version",
    )


@register(
    "m15_metadata_agg",
    category="mutation",
    oracle="""
SELECT COUNT(*) AS n_rows,
       MIN(l_shipdate) AS min_l_shipdate,
       MAX(l_shipdate) AS max_l_shipdate,
       MIN(l_extendedprice) AS min_l_extendedprice,
       MAX(l_extendedprice) AS max_l_extendedprice
FROM lineitem
""",
)
def m15_metadata_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only aggregate — COUNT(*)/MIN/MAX answered purely from
    the store's per-file stats sidecar, zero data files opened (the
    Delta/Iceberg log-only fast path; footer row counts are exact and
    footer min/max ignore NULLs exactly like SQL MIN/MAX). The oracle
    must scan; at 100 TB the engine answers from kilobytes of
    manifest. The timestamp column rides the metadata path; the
    double column deliberately exercises the NaN-safe fallback
    (footer max excludes NaN while SQL MAX returns it, so float
    columns always re-scan — identical answer, honest cost)."""
    import tempfile

    from etl_notifier_pipeline_spark.storage import TableStore

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_extendedprice"
    )
    store = TableStore(spark, tempfile.mkdtemp(prefix="m15_"))
    store.overwrite("li", li)
    meta_side = store.stats_aggregate("li", ["l_shipdate"])
    scan_side = store.stats_aggregate("li", ["l_extendedprice"]).select(
        "min_l_extendedprice", "max_l_extendedprice"
    )
    return meta_side.crossJoin(scan_side)


@register(
    "m16_keyed_point_read",
    category="mutation",
    oracle="""
SELECT CAST(c_custkey AS BIGINT) AS ckey, c_name AS name,
       c_mktsegment AS seg
FROM customer
WHERE c_custkey % 10 = 0 AND c_custkey <= 200
""",
)
def m16_keyed_point_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key point read on the bucketed store: the requested keys
    hash to their owning buckets, ONLY those buckets' files are opened
    (path-level pruning, the read-side twin of apply_keyed_mutation),
    and a broadcast semi-join selects the rows — O(table·min(k,B)/B)
    bytes for k keys, the engine's answer to the reference's Postgres
    PK-btree point SELECT. The bytes bound is pinned in
    tests/test_bucketed_store.py."""
    import tempfile

    from etl_notifier_pipeline_spark.storage import BucketedTableStore

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("ckey"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("seg"),
    )
    store = BucketedTableStore(
        spark, tempfile.mkdtemp(prefix="m16_"), keys={"cust": ["ckey"]},
        n_buckets=16,
    )
    store.overwrite("cust", cust)
    wanted = cust.filter(
        (F.col("ckey") % 10 == 0) & (F.col("ckey") <= 200)
    ).select("ckey")
    return store.read_keyed("cust", wanted)


def _three_commit_history(spark: SparkSession, sf_dir: str):
    """The shared m13/m14/m17 mutation history: commit 1 = last
    purchase per user, commit 2 = MERGE of even-user clicks (update-
    heavy), commit 3 = delete of error-flagged users. Mirrors the
    oracle CTEs s1/s2/s3."""
    from pyspark.sql.window import Window

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
    s1 = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    s2 = upsert(
        s1,
        ev.filter(
            (F.col("event_type") == "click") & (F.col("user_id") % 2 == 0)
        ),
        ["user_id"],
        ["event_id"],
    )
    s3 = delete_by_keys(
        s2,
        ev.filter(
            (F.col("event_type") == "error") & (F.col("user_id") % 7 == 0)
        ).select("user_id"),
        ["user_id"],
    )
    return s1, s2, s3


@register(
    "m14_cdc_incremental_view",
    category="mutation",
    oracle=f"""
WITH ev AS ({_EV_SQL}),
s1 AS (
  SELECT event_id, user_id, event_type, value FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
    FROM ev WHERE event_type = 'purchase') WHERE rn = 1
),
last_click AS (
  SELECT event_id, user_id, event_type, value FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
    FROM ev WHERE event_type = 'click' AND user_id % 2 = 0) WHERE rn = 1
),
s2 AS (
  SELECT t.* FROM s1 t
  WHERE NOT EXISTS (SELECT 1 FROM last_click l WHERE l.user_id = t.user_id)
  UNION ALL
  SELECT * FROM last_click
),
s3 AS (
  SELECT * FROM s2 t
  WHERE NOT EXISTS (
    SELECT 1 FROM ev d WHERE d.event_type = 'error'
      AND d.user_id % 7 = 0 AND d.user_id = t.user_id)
)
SELECT event_type,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM s3 GROUP BY event_type
""",
)
def m14_cdc_incremental_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental VIEW MAINTENANCE from the change data feed: a
    per-event_type (count, sum) aggregate is seeded from commit 1 and
    then maintained purely from each commit's CDC delta —
    ``cdc_agg_delta`` retracts old_row contributions and asserts
    new_row contributions (updates handle group migration exactly;
    groups retracted to zero rows are dropped), ``merge_aggregates``
    folds the signed delta into the stored summary. Per commit the
    work is O(changes + groups), never O(table) — the materialized-
    view-over-CDF pattern (Delta CDF + MERGE-maintained gold table).
    The oracle aggregates the FINAL state directly; equality proves
    the maintained view never drifted across an update-heavy MERGE
    commit and a delete commit. Same three-commit history as m13."""
    import tempfile

    from pyspark.sql.window import Window

    from etl_notifier_pipeline_spark.operators import change_feed
    from etl_notifier_pipeline_spark.operators.incremental import (
        agg_delta,
        cdc_agg_delta,
        merge_aggregates,
    )
    from etl_notifier_pipeline_spark.storage import TableStore

    store = TableStore(
        spark, tempfile.mkdtemp(prefix="m14_"), retain_versions=3
    )
    for state in _three_commit_history(spark, sf_dir):
        store.overwrite("t", state)

    kinds = {"d_count": "count", "d_sum": "sum", "d_nn": "count"}
    view = agg_delta(
        store.read("t", version=1),
        ["event_type"],
        {
            "d_count": ("count", F.count(F.lit(1))),
            "d_sum": (
                "sum",
                F.coalesce(
                    F.sum(F.col("value").cast("decimal(12,2)")),
                    F.lit(0).cast("decimal(12,2)"),
                ),
            ),
            # non-NULL value count: lets the reader report SUM as NULL
            # when a group's values are all NULL (see cdc_agg_delta)
            "d_nn": ("count", F.count(F.col("value"))),
        },
    )
    store.overwrite("view", view)
    for v in (2, 3):
        feed = change_feed(
            store, "t", ["user_id"], from_version=v - 1, to_version=v
        )
        delta = cdc_agg_delta(feed, "event_type", "value")
        merged = merge_aggregates(
            store.read("view"), delta, ["event_type"], kinds
        ).filter(F.col("d_count") > 0)
        store.overwrite("view", merged)
    return store.read("view").select(
        "event_type",
        F.col("d_count").alias("n_rows"),
        F.when(F.col("d_nn") > 0, F.col("d_sum"))
        .cast("double")
        .alias("total_value"),
    )


@register(
    "m12_zone_map_scan",
    category="mutation",
    oracle="""
SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m-%d') AS ship_month,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate BETWEEN TIMESTAMP '2000-01-01 00:00:00'
                     AND TIMESTAMP '2000-12-31 23:59:59'
GROUP BY 1
""",
)
def m12_zone_map_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-skipping scan over the engine's own store: lineitem is
    committed, OPTIMIZE-clustered on l_shipdate (range repartition +
    intra-file sort — each file owns a disjoint date slice), then a
    one-year range is read through ``read_where``, which consults the
    per-file zone maps harvested from parquet footers at commit and
    opens only the files whose [min,max] admit the range (~3 of 8 here;
    on a 100 TB table this is the difference between a full scan and a
    handful of files — Delta/Iceberg data skipping earned from plain
    parquet + a stats sidecar). Equality with the oracle's full-scan
    filter is exactly the soundness claim of min/max pruning; the
    skipping ratio itself is asserted in tests/test_bucketed_store.py.
    """
    import tempfile

    from etl_notifier_pipeline_spark.storage import TableStore

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_extendedprice"
    )
    store = TableStore(spark, tempfile.mkdtemp(prefix="m12_"))
    store.overwrite("li", li)
    store.optimize_layout("li", "l_shipdate", n_files=8)
    import datetime

    lo = datetime.datetime(2000, 1, 1)
    hi = datetime.datetime(2000, 12, 31, 23, 59, 59)
    pruned = store.read_where("li", [("l_shipdate", "between", (lo, hi))])
    return pruned.groupBy(
        F.date_format(
            F.date_trunc("month", F.col("l_shipdate")), "yyyy-MM-dd"
        ).alias("ship_month")
    ).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


@register(
    "m17_cdc_minmax_view",
    category="mutation",
    oracle=f"""
WITH ev AS ({_EV_SQL}),
s1 AS (
  SELECT event_id, user_id, event_type, value FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
    FROM ev WHERE event_type = 'purchase') WHERE rn = 1
),
last_click AS (
  SELECT event_id, user_id, event_type, value FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
    FROM ev WHERE event_type = 'click' AND user_id % 2 = 0) WHERE rn = 1
),
s2 AS (
  SELECT t.* FROM s1 t
  WHERE NOT EXISTS (SELECT 1 FROM last_click l WHERE l.user_id = t.user_id)
  UNION ALL
  SELECT * FROM last_click
),
s3 AS (
  SELECT * FROM s2 t
  WHERE NOT EXISTS (
    SELECT 1 FROM ev d WHERE d.event_type = 'error'
      AND d.user_id % 7 = 0 AND d.user_id = t.user_id)
)
SELECT event_type,
       COUNT(*) AS n_rows,
       MIN(value) AS min_value,
       MAX(value) AS max_value,
       CAST(CAST(AVG(CAST(value AS DECIMAL(12,2))) AS DECIMAL(16,6)) AS DOUBLE)
         AS avg_value
FROM s3 GROUP BY event_type
""",
)
def m17_cdc_minmax_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for NON-INVERTIBLE aggregates
    (min/max, plus avg re-derived from sum/count): m14 handles
    count/sum by signed retraction, but a deleted row that WAS the
    group max has no retraction — the engine's answer is
    ``refresh_aggregates`` (operators/incremental.py): re-aggregate
    ONLY the CDC-touched groups from the current snapshot, carry all
    untouched groups' stored rows forward. Per commit:
    O(changes + touched-group rows), never O(table). Same three-commit
    history as m13/m14 — commit 2's MERGE moves values up (max-
    affecting) and commit 3's delete removes users whose rows may hold
    a group extreme; the oracle aggregates the final state directly,
    so equality proves the maintained min/max never drifted."""
    import tempfile

    from etl_notifier_pipeline_spark.operators import change_feed
    from etl_notifier_pipeline_spark.operators.incremental import (
        refresh_aggregates,
    )
    from etl_notifier_pipeline_spark.storage import TableStore

    store = TableStore(
        spark, tempfile.mkdtemp(prefix="m17_"), retain_versions=3
    )
    for state in _three_commit_history(spark, sf_dir):
        store.overwrite("t", state)

    exprs = {
        "n_rows": F.count(F.lit(1)),
        "min_value": F.min("value"),
        "max_value": F.max("value"),
        "sum_value": F.coalesce(
            F.sum(F.col("value").cast("decimal(12,2)")),
            F.lit(0).cast("decimal(12,2)"),
        ),
        "nn_value": F.count(F.col("value")),
    }
    view = (
        store.read("t", version=1)
        .groupBy("event_type")
        .agg(*[e.alias(n) for n, e in exprs.items()])
    )
    store.overwrite("view", view)
    for v in (2, 3):
        feed = change_feed(
            store, "t", ["user_id"], from_version=v - 1, to_version=v
        )
        refreshed = refresh_aggregates(
            store.read("view"),
            store.read("t", version=v),
            feed,
            "event_type",
            exprs,
        )
        store.overwrite("view", refreshed)
    return store.read("view").select(
        "event_type",
        "n_rows",
        "min_value",
        "max_value",
        F.when(
            F.col("nn_value") > 0,
            (F.col("sum_value") / F.col("nn_value")).cast("decimal(16,6)"),
        )
        .cast("double")
        .alias("avg_value"),
    )


@register(
    "m19_ivm_mixed_view",
    category="mutation",
    oracle=f"""
WITH ev AS ({_EV_SQL}),
s1 AS (
  SELECT event_id, user_id, event_type, value FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
    FROM ev WHERE event_type = 'purchase') WHERE rn = 1
),
last_click AS (
  SELECT event_id, user_id, event_type, value FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
    FROM ev WHERE event_type = 'click' AND user_id % 2 = 0) WHERE rn = 1
),
s2 AS (
  SELECT t.* FROM s1 t
  WHERE NOT EXISTS (SELECT 1 FROM last_click l WHERE l.user_id = t.user_id)
  UNION ALL
  SELECT * FROM last_click
),
s3 AS (
  SELECT * FROM s2 t
  WHERE NOT EXISTS (
    SELECT 1 FROM ev d WHERE d.event_type = 'error'
      AND d.user_id % 7 = 0 AND d.user_id = t.user_id)
),
moments AS (
  SELECT event_type,
         COUNT(*) AS n_rows,
         COUNT(value) AS nn,
         CAST(COALESCE(SUM(CAST(value AS DECIMAL(12,2))), 0) AS DECIMAL(18,2)) AS sum_v,
         CAST(COALESCE(SUM(CAST(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))
                            AS DECIMAL(24,4))), 0) AS DECIMAL(24,4)) AS sumsq_v,
         MIN(value) AS min_value,
         MAX(value) AS max_value,
         CAST(CAST(AVG(CAST(value AS DECIMAL(12,2))) AS DECIMAL(16,6)) AS DOUBLE) AS avg_value
  FROM s3 GROUP BY event_type
)
SELECT event_type, n_rows, min_value, max_value, avg_value,
       CASE WHEN nn > 1 THEN
         CAST(CAST(SQRT(
           CAST(sumsq_v * CAST(nn AS DECIMAL(10,0)) - sum_v * sum_v AS DOUBLE)
           / (nn * (nn - 1))
         ) AS DECIMAL(16,6)) AS DOUBLE)
       END AS stddev_value
FROM moments
""",
)
def m19_ivm_mixed_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One materialized view mixing INVERTIBLE and NON-INVERTIBLE
    aggregates, maintained from the change feed (r7 verdict ask #7):
    count/sum/avg/stddev ride the signed moment fold
    (``cdc_moment_delta`` — Σv and Σv² are invertible even though
    avg/stddev are only algebraic) while min/max ride per-touched-group
    re-aggregation (``refresh_aggregates`` — no retraction exists for
    an extreme). Per commit the invertible side costs O(changes), the
    non-invertible side O(changes + touched-group rows); the stored
    view is never recomputed from scratch. The oracle aggregates the
    FINAL state with the same exact-decimal moment formulas, so
    equality proves neither half drifted across an update-heavy MERGE
    and a delete commit — including deletes of rows that WERE a group
    extreme. Same three-commit history as m13/m14/m17."""
    import tempfile

    from etl_notifier_pipeline_spark.operators import change_feed
    from etl_notifier_pipeline_spark.operators.incremental import (
        cdc_moment_delta,
        merge_aggregates,
        refresh_aggregates,
    )
    from etl_notifier_pipeline_spark.storage import TableStore

    store = TableStore(
        spark, tempfile.mkdtemp(prefix="m19_"), retain_versions=3
    )
    for state in _three_commit_history(spark, sf_dir):
        store.overwrite("t", state)

    # -- invertible half: (count, Σv, nn, Σv²) seeded from v1 ---------------
    dec, sq_dec = "decimal(18,2)", "decimal(24,4)"
    v = F.col("value").cast("decimal(12,2)")

    def pin(df: DataFrame) -> DataFrame:
        """Pin the moment columns' decimal widths so repeated folds
        don't creep toward precision-loss territory (the stddev
        exactness argument needs sum_v² to stay inside DECIMAL(38))."""
        return df.select(
            "event_type",
            F.col("d_count").cast("long").alias("d_count"),
            F.col("d_sum").cast(dec).alias("d_sum"),
            F.col("d_nn").cast("long").alias("d_nn"),
            F.col("d_sumsq").cast(sq_dec).alias("d_sumsq"),
        )

    inv = pin(
        store.read("t", version=1)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("d_count"),
            F.coalesce(F.sum(v), F.lit(0).cast(dec)).alias("d_sum"),
            F.count("value").alias("d_nn"),
            F.coalesce(
                F.sum((v * v).cast(sq_dec)), F.lit(0).cast(sq_dec)
            ).alias("d_sumsq"),
        )
    )
    store.overwrite("inv", inv)
    # -- non-invertible half: min/max seeded from v1 ------------------------
    mm_exprs = {"min_value": F.min("value"), "max_value": F.max("value")}
    store.overwrite(
        "mm",
        store.read("t", version=1)
        .groupBy("event_type")
        .agg(*[e.alias(n) for n, e in mm_exprs.items()]),
    )
    kinds = {
        "d_count": "count", "d_sum": "sum", "d_nn": "count",
        "d_sumsq": "sum",
    }
    for ver in (2, 3):
        feed = change_feed(
            store, "t", ["user_id"], from_version=ver - 1, to_version=ver
        )
        merged = merge_aggregates(
            store.read("inv"),
            cdc_moment_delta(feed, "event_type", "value"),
            ["event_type"],
            kinds,
        ).filter(F.col("d_count") > 0)
        store.overwrite("inv", pin(merged))
        store.overwrite(
            "mm",
            refresh_aggregates(
                store.read("mm"),
                store.read("t", version=ver),
                feed,
                "event_type",
                mm_exprs,
            ),
        )
    # exact-decimal moments -> one cast to double -> IEEE arithmetic:
    # bit-identical to the oracle's same-shaped expression
    nn = F.col("d_nn")
    num = (
        F.col("d_sumsq") * nn.cast("decimal(10,0)")
        - F.col("d_sum") * F.col("d_sum")
    )
    inv_df, mm_df = store.read("inv"), store.read("mm")
    return inv_df.join(
        mm_df, inv_df["event_type"].eqNullSafe(mm_df["event_type"])
    ).select(
        inv_df["event_type"],
        F.col("d_count").alias("n_rows"),
        "min_value",
        "max_value",
        F.when(nn > 0, (F.col("d_sum") / nn).cast("decimal(16,6)"))
        .cast("double")
        .alias("avg_value"),
        F.when(
            nn > 1,
            F.sqrt(num.cast("double") / (nn * (nn - F.lit(1)))).cast(
                "decimal(16,6)"
            ),
        )
        .cast("double")
        .alias("stddev_value"),
    )


@register(
    "m20_merge_on_read",
    category="mutation",
    oracle=f"""
WITH ev AS ({_EV_SQL}),
s1 AS (
  SELECT event_id, user_id, event_type, value FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
    FROM ev WHERE event_type = 'purchase') WHERE rn = 1
),
last_click AS (
  SELECT event_id, user_id, event_type, value FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
    FROM ev WHERE event_type = 'click' AND user_id % 2 = 0) WHERE rn = 1
),
s2 AS (
  SELECT t.* FROM s1 t
  WHERE NOT EXISTS (SELECT 1 FROM last_click l WHERE l.user_id = t.user_id)
  UNION ALL
  SELECT * FROM last_click
),
s3 AS (
  SELECT * FROM s2 t
  WHERE NOT EXISTS (
    SELECT 1 FROM ev d WHERE d.event_type = 'error'
      AND d.user_id % 7 = 0 AND d.user_id = t.user_id)
)
SELECT event_type,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM s3 GROUP BY event_type
""",
)
def m20_merge_on_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read mutation commits (r7 verdict ask #3): the same
    three-commit history as m13/m14 applied through
    ``BucketedTableStore.apply_keyed_mutation(strategy=
    'merge_on_read')`` — the MERGE commit and the delete commit each
    write ONLY an O(batch) delta (upserted rows + key tombstones
    stacked in the manifest), never rewriting the touched buckets;
    reads reconcile (delta shadows base, newest ``__mor_seq`` wins,
    tombstone deletes) and ``compact()`` then folds the deltas into
    the base. The returned aggregate runs over the COMPACTED table,
    and the pre-compact reconciled read is asserted equal in
    tests/test_bucketed_store.py — so oracle equality proves the
    delta-commit path, the reconciliation and the fold all preserve
    exactly the copy-on-write MERGE semantics. At 100 TB this is the
    Delta deletion-vector / Iceberg merge-on-read answer to r7's
    measured O(table)-per-commit scattered-key wall
    (LAKEHOUSE_BENCH.json apply_sec 46-77 s)."""
    import tempfile

    from pyspark.sql.window import Window

    from etl_notifier_pipeline_spark.storage import BucketedTableStore

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
    s1 = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    store = BucketedTableStore(
        spark, tempfile.mkdtemp(prefix="m20_"),
        keys={"t": ["user_id"]}, n_buckets=16, retain_versions=4,
    )
    store.overwrite("t", s1)
    store.apply_keyed_mutation(
        "t",
        ev.filter(
            (F.col("event_type") == "click") & (F.col("user_id") % 2 == 0)
        ),
        ["user_id"],
        ["event_id"],
        "update",
        strategy="merge_on_read",
    )
    store.apply_keyed_mutation(
        "t",
        ev.filter(
            (F.col("event_type") == "error") & (F.col("user_id") % 7 == 0)
        ).select("user_id"),
        ["user_id"],
        [],
        "delete",
        strategy="merge_on_read",
    )
    store.compact("t")
    return (
        store.read("t")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )


@register(
    "m21_ivm_over_mor",
    category="mutation",
    oracle=f"""
WITH ev AS ({_EV_SQL}),
s1 AS (
  SELECT event_id, user_id, event_type, value FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
    FROM ev WHERE event_type = 'purchase') WHERE rn = 1
),
last_click AS (
  SELECT event_id, user_id, event_type, value FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
    FROM ev WHERE event_type = 'click' AND user_id % 2 = 0) WHERE rn = 1
),
s2 AS (
  SELECT t.* FROM s1 t
  WHERE NOT EXISTS (SELECT 1 FROM last_click l WHERE l.user_id = t.user_id)
  UNION ALL
  SELECT * FROM last_click
),
s3 AS (
  SELECT * FROM s2 t
  WHERE NOT EXISTS (
    SELECT 1 FROM ev d WHERE d.event_type = 'error'
      AND d.user_id % 7 = 0 AND d.user_id = t.user_id)
)
SELECT event_type,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM s3 GROUP BY event_type
""",
)
def m21_ivm_over_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVM consumer over a MERGE-ON-READ commit chain with the
    delta-stack auto-compact policy engaged (r8 verdict ask #6): the
    same three-commit history as m20, but the maintained aggregate is
    folded from ``change_feed`` — whose source commits are MoR delta
    commits (write-time CDC sidecars over O(batch) deltas) and whose
    range INCLUDES the auto-triggered ``compact()`` commit, which the
    feed must recognize as a zero-change layout rewrite (manifest
    ``compaction`` marker) and skip rather than re-derive. Oracle
    equality on the maintained view therefore proves, end to end:
    MoR CDC sidecars carry exactly the copy-on-write change
    semantics, auto-compaction fires without corrupting the feed, and
    the fold (``cdc_agg_delta`` + ``merge_aggregates``) reconstructs
    the final aggregate bit-for-bit without ever recomputing the
    view. m20's compacted-snapshot aggregate checks the DATA path;
    this checks the FEED path over the identical history."""
    import tempfile

    from pyspark.sql.window import Window

    from etl_notifier_pipeline_spark.operators import change_feed
    from etl_notifier_pipeline_spark.operators.incremental import (
        cdc_agg_delta,
        merge_aggregates,
    )
    from etl_notifier_pipeline_spark.storage import BucketedTableStore

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
    s1 = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    store = BucketedTableStore(
        spark, tempfile.mkdtemp(prefix="m21_"),
        keys={"t": ["user_id"]}, n_buckets=16, retain_versions=6,
        capture_cdc=True,
        # any bucket exceeding ONE stacked delta dir triggers
        # compact() right after the commit: the delete commit stacks a
        # second delta on buckets the update already touched, so the
        # chain ends v1 seed, v2 MoR update, v3 MoR delete, v4
        # compaction — and the feed below must skip v4
        auto_compact_deltas=1,
    )
    store.overwrite("t", s1)
    dec = "decimal(18,2)"
    view = (
        store.read("t", version=1)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("d_count"),
            F.coalesce(
                F.sum(F.col("value").cast("decimal(12,2)")),
                F.lit(0).cast(dec),
            ).cast(dec).alias("d_sum"),
            F.count("value").alias("d_nn"),
        )
    )
    store.apply_keyed_mutation(
        "t",
        ev.filter(
            (F.col("event_type") == "click") & (F.col("user_id") % 2 == 0)
        ),
        ["user_id"],
        ["event_id"],
        "update",
        strategy="merge_on_read",
    )
    store.apply_keyed_mutation(
        "t",
        ev.filter(
            (F.col("event_type") == "error") & (F.col("user_id") % 7 == 0)
        ).select("user_id"),
        ["user_id"],
        [],
        "delete",
        strategy="merge_on_read",
    )
    # the policy must actually have fired: the follow-up compaction
    # commit (exposed separately from the mutation's own version —
    # r9 advice #2) is the head, stacked deltas folded away
    v_final = store.last_auto_compact_version
    assert v_final is not None, "auto-compact did not fire"
    assert store.is_compaction("t", v_final), "auto-compact did not fire"
    assert not store._manifest("t", v_final).get("deltas")
    feed = change_feed(
        store, "t", ["user_id"], from_version=1, to_version=v_final
    )
    folded = merge_aggregates(
        view,
        cdc_agg_delta(feed, "event_type", "value", value_cast="decimal(12,2)"),
        ["event_type"],
        {"d_count": "count", "d_sum": "sum", "d_nn": "count"},
    ).filter(F.col("d_count") > 0)
    return folded.select(
        "event_type",
        F.col("d_count").alias("n_rows"),
        F.when(F.col("d_nn") > 0, F.col("d_sum"))
        .cast("double")
        .alias("total_value"),
    )


@register(
    "m22_vacuum_retention",
    category="mutation",
    oracle=f"""
WITH ev AS ({_EV_SQL}),
s1 AS (
  SELECT event_id, user_id, event_type, value FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
    FROM ev WHERE event_type = 'purchase') WHERE rn = 1
),
last_click AS (
  SELECT event_id, user_id, event_type, value FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
    FROM ev WHERE event_type = 'click') WHERE rn = 1
),
s2 AS (
  SELECT t.* FROM s1 t
  WHERE NOT EXISTS (SELECT 1 FROM last_click l WHERE l.user_id = t.user_id)
  UNION ALL
  SELECT * FROM last_click
),
s3 AS (
  SELECT t.* FROM s2 t
  WHERE NOT EXISTS (
    SELECT 1 FROM ev d WHERE d.event_type = 'error' AND d.user_id = t.user_id)
),
first_signup AS (
  SELECT event_id, user_id, event_type, value FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
    FROM ev WHERE event_type = 'signup') WHERE rn = 1
),
s4 AS (
  SELECT t.* FROM s3 t
  WHERE NOT EXISTS (SELECT 1 FROM first_signup f WHERE f.user_id = t.user_id)
  UNION ALL
  SELECT * FROM first_signup
)
SELECT event_type,
       COUNT(*) AS n_rows,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS sum_value,
       CAST(2 AS BIGINT) AS n_retained_versions,
       CAST(3 AS BIGINT) AS min_retained_version
FROM s4 GROUP BY event_type
""",
)
def m22_vacuum_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VACUUM / retention (Delta ``VACUUM``, Iceberg
    ``expire_snapshots``): the storage-cost bound that makes a
    many-commit table operable at 100 TB. A ``retain_versions=2``
    store takes four commits (purchases -> click upsert -> error-user
    delete -> signup upsert); the per-commit vacuum deletes version
    dirs that are older than the horizon AND unreferenced by any
    retained manifest, so disk holds ~2 snapshots however long the
    commit stream runs (the manifest-reference check keeps restore()'s
    metadata-only commits safe: a re-referenced old dir survives).

    VALUE-checked end to end: the head read after vacuuming must equal
    the oracle's four-stage replay bit-for-bit (decimal sums) — a
    vacuum that deleted a still-referenced file would lose rows here —
    and the retained-horizon literals (2 versions, oldest = v3) ride
    in the output so the oracle also pins WHAT was vacuumed.
    Unreadability of vacuumed versions + physical dir deletion are
    asserted in tests/test_mutations.py."""
    import tempfile

    from pyspark.sql.window import Window

    from etl_notifier_pipeline_spark.storage import TableStore

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
    s1 = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    store = TableStore(
        spark, tempfile.mkdtemp(prefix="m22_"), retain_versions=2
    )
    store.overwrite("t", s1)  # v1
    store.overwrite(  # v2
        "t",
        upsert(
            store.read("t"),
            ev.filter(F.col("event_type") == "click"),
            ["user_id"],
            ["event_id"],
        ),
    )
    store.overwrite(  # v3 — v1 falls off the horizon here
        "t",
        delete_by_keys(
            store.read("t"),
            ev.filter(F.col("event_type") == "error").select("user_id"),
            ["user_id"],
        ),
    )
    store.overwrite(  # v4 — v2 vacuumed; {v3, v4} retained
        "t",
        upsert(
            store.read("t"),
            ev.filter(F.col("event_type") == "signup"),
            ["user_id"],
            ["event_id"],
        ),
    )
    retained = store.versions("t")
    return (
        store.read("t")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(10,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .withColumn(
            "n_retained_versions", F.lit(len(retained)).cast("long")
        )
        .withColumn(
            "min_retained_version", F.lit(min(retained)).cast("long")
        )
    )


@register(
    "m23_zorder_skipping",
    category="mutation",
    oracle="""
SELECT l_partkey % 16 AS part_bucket,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
       MIN(l_orderkey) AS min_orderkey,
       MAX(l_orderkey) AS max_orderkey
FROM lineitem
WHERE l_partkey BETWEEN 100 AND 400
  AND l_suppkey BETWEEN 5 AND 60
GROUP BY 1
""",
)
def m23_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimensional data skipping (Delta's OPTIMIZE ZORDER BY):
    the table is rewritten on a bit-interleaved Z-order key over
    (l_partkey, l_suppkey) — ``optimize_layout(zorder=True)`` — so
    EVERY listed column's per-file [min,max] stays narrow
    simultaneously, and a 2-D box predicate prunes files through the
    zone maps on BOTH dimensions (lexicographic clustering is
    selective on the leading column only). ``read_where`` serves the
    box from the pruned file set; oracle equality over the surviving
    rows is the soundness claim of Z-order + min/max skipping, and
    the skipping RATIO (zorder beats lexicographic on the trailing
    dimension) is asserted in tests/test_bucketed_store.py. At 100 TB
    this is the difference between "fast for one predicate column"
    and "fast for any box over the clustered columns"."""
    import tempfile

    from etl_notifier_pipeline_spark.storage import TableStore

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    store = TableStore(spark, tempfile.mkdtemp(prefix="m23_"))
    store.overwrite("li", li)
    store.optimize_layout(
        "li", ["l_partkey", "l_suppkey"], n_files=16, zorder=True
    )
    box = store.read_where(
        "li",
        [
            ("l_partkey", "between", (100, 400)),
            ("l_suppkey", "between", (5, 60)),
        ],
    )
    return (
        box.groupBy((F.col("l_partkey") % 16).alias("part_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_qty"),
            F.min("l_orderkey").alias("min_orderkey"),
            F.max("l_orderkey").alias("max_orderkey"),
        )
    )
