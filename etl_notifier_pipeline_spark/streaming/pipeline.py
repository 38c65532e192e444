"""Streaming approval pipeline (SURVEY §3 EP1-EP4 on Structured Streaming).

The reference's event flow — GCS arrival -> pending control row + email
(EP1), human click -> Pub/Sub (EP2), approved message -> CSV ingest +
keyed mutation + ledger update + email (EP3), scheduled delete drain
(EP4) — re-expressed as a Structured Streaming job:

- the approval stream is any streaming DataFrame of JSON payloads with
  the reference's message shape (``approval-handler.py:51-62``);
  ``decode_approval_stream`` handles the base64+JSON transport encoding
  (``process-pipeline.py:448``).
- ``run_batch`` is the ``foreachBatch`` body: idempotency anti-join
  (ST1), per-operation dispatch to the mutation library (EP3 step d),
  ledger status transitions (ST2), poison-row dead-lettering (ST3) and
  a notification hook per outcome (S14/ST6).
- exactly-once: redelivered event_ids are dropped against the ledger,
  and every effect is an idempotent TableStore swap keyed by content —
  the Spark checkpoint gives at-least-once delivery on top.

The notifier replaces the reference's Microsoft-Graph email sender
(``process-pipeline.py:389-410``) with a pluggable interface; the
default just logs. No network calls anywhere.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_notifier_pipeline_spark.functions import decode_event_payload
from etl_notifier_pipeline_spark.ledger import Ledger
from etl_notifier_pipeline_spark.operators import delete_by_keys, insert_if_absent, upsert
from etl_notifier_pipeline_spark.sources.ingest import read_csv_all_string
from etl_notifier_pipeline_spark.storage import TableStore

log = logging.getLogger(__name__)


def approval_event_schema() -> T.StructType:
    """The Pub/Sub payload shape (``approval-handler.py:51-62``)."""
    return T.StructType(
        [
            T.StructField("event_id", T.StringType(), False),
            T.StructField("action", T.StringType(), True),
            T.StructField("file_name", T.StringType(), True),
            T.StructField("table_name", T.StringType(), True),
            T.StructField("operation", T.StringType(), True),
            T.StructField("bucket", T.StringType(), True),
            T.StructField("file_version", T.StringType(), True),
            T.StructField("provided_timestamp", T.StringType(), True),
            T.StructField("approval_timestamp", T.StringType(), True),
            T.StructField("remote_address", T.StringType(), True),
        ]
    )


def decode_approval_stream(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """base64(JSON) transport frame -> typed columns
    (``process-pipeline.py:438-457``), with the reference's lowercase
    normalization of action/operation."""
    payload = decode_event_payload(F.col(value_col), approval_event_schema())
    return (
        raw.select(payload.alias("p"))
        .select("p.*")
        .withColumn("action", F.lower("action"))
        .withColumn("operation", F.lower("operation"))
    )


class Notifier:
    """S14 — notification hook interface (email in the reference)."""

    def notify(self, subject: str, body: str) -> None:  # pragma: no cover
        raise NotImplementedError


class LogNotifier(Notifier):
    def __init__(self) -> None:
        self.sent: list[tuple[str, str]] = []

    def notify(self, subject: str, body: str) -> None:
        self.sent.append((subject, body))
        log.info("notify: %s — %s", subject, body)


OUTCOME_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType(), False),
        T.StructField("operation", T.StringType(), True),
        T.StructField("table_name", T.StringType(), True),
        T.StructField("file_name", T.StringType(), True),
        T.StructField("bucket", T.StringType(), True),
        T.StructField("status", T.StringType(), False),
        T.StructField("details", T.StringType(), True),
        T.StructField("approval_timestamp", T.StringType(), True),
    ]
)


def render_result_notifications(outcomes: DataFrame) -> DataFrame:
    """S14 — the reference's per-operation result email
    (``process-pipeline.py:366-387``: subject ``"{Status}: {Op}
    Operation on {table}"`` + an HTML body with file/event/bucket/
    timestamp lines) rendered as pure Column expressions
    (``format_string``/``initcap``), so body templating for a
    100 TB-scale outcome stream stays JVM-side — no driver string
    formatting per event.
    """
    ok = F.col("status").isin("approved")
    status_word = F.when(ok, F.lit("Success")).otherwise(F.lit("Failure"))
    subject = F.format_string(
        "%s: %s Operation on %s",
        status_word, F.initcap("operation"), F.col("table_name"),
    )
    body = F.format_string(
        "<html><body><p>Dear User,</p>"
        "<p>The <strong>%s</strong> operation on table <strong>%s</strong> "
        "via file <strong>%s</strong> (Event ID: %s) has finished processing.</p>"
        "<p><strong>Status:</strong> %s</p>"
        "<p><strong>Details:</strong></p><p>%s</p>"
        "<p><strong>Bucket:</strong> %s</p>"
        "<p><strong>Timestamp:</strong> %s</p>"
        "<p>Best regards,<br>Your Data Engineering Team</p></body></html>",
        F.col("operation"), F.col("table_name"), F.col("file_name"),
        F.col("event_id"), status_word, F.coalesce("details", F.lit("")),
        F.coalesce("bucket", F.lit("")), F.coalesce("approval_timestamp", F.lit("")),
    )
    return outcomes.select(
        "event_id", subject.alias("subject"), body.alias("body")
    )


@dataclass
class ApprovalPipeline:
    spark: SparkSession
    notifier: Notifier
    keys: dict[str, list[str]]  # table -> primary-key columns (replaces S6 catalog)
    csv_root: str  # where "bucket" files live locally
    # Default backend is the incremental BucketedTableStore (built at
    # ``store_root``, or a temp dir if unset): keyed mutations rewrite
    # O(affected buckets), not O(table) — the 100 TB-survivable default.
    # Pass ``store=`` explicitly (e.g. a plain full-rewrite TableStore)
    # to opt out.
    store: TableStore | None = None
    store_root: str | None = None
    # Driver-side staging iterates the micro-batch's approval events
    # (human-in-the-loop click rates — tens, not millions). Nothing
    # upstream enforces that assumption, so this cap does: a batch
    # larger than this raises BEFORE materializing on the driver
    # (the collect is bounded to cap+1 rows either way). A trip means
    # something machine-scale is feeding the approval topic — that is
    # a wiring bug to surface, not a load to absorb.
    max_events_per_batch: int = 10_000

    def __post_init__(self) -> None:
        if self.store is None:
            import tempfile

            from etl_notifier_pipeline_spark.storage import BucketedTableStore

            root = self.store_root or tempfile.mkdtemp(prefix="pipeline_store_")
            self.store = BucketedTableStore(self.spark, root, keys=self.keys)
        self.ledger = Ledger(self.spark, self.store)
        self.dead_letters: list[dict] = []

    # -- EP3 body -----------------------------------------------------------

    def run_batch(self, events: DataFrame, batch_id: int = 0) -> None:
        """foreachBatch body: dedup, stage, coalesce, dispatch, ledger,
        notify.

        Driver-side iteration here is over *events in the micro-batch*
        (a handful of file approvals), never over data rows — each
        event fans out to distributed DataFrame plans. Scale-critical
        batching, all O(1)-rewrites-per-batch where the reference (and
        r01/r02 of this engine) was O(events):

        - ledger status transitions accumulate and apply as ONE
          ``mark_many`` per micro-batch;
        - approved mutations coalesce into runs of consecutive
          same-``(table, operation)`` events (per table — tables are
          independent, so interleaved tables don't break a run), each
          run applying ONE combined mutation plan + ONE table
          overwrite. Two hundred approved inserts into one table in a
          batch = one read + one write of that table, not two hundred.
          Cross-event precedence rides on an ``__event_seq`` column
          (batch order) ahead of ``__file_order``, so first/last-
          per-key winners match the sequential semantics exactly;
        - notification subject/body render JVM-side via
          ``render_result_notifications`` (S14).

        Failure granularity: per-event validation (unknown action/op,
        missing file, missing key columns) dead-letters individually at
        staging; a storage failure while applying a coalesced run
        dead-letters that run's events together (they share one write).
        """
        fresh = self.ledger.filter_unprocessed(events)
        outcomes: list[tuple] = []
        batch_dead: list[dict] = []

        def fail(ev: dict, exc: Exception) -> None:  # ST3: dead letter
            batch_dead.append({**ev, "error": str(exc)})
            add_outcome(ev, "failed", str(exc))

        def add_outcome(ev: dict, status: str, details: str) -> None:
            outcomes.append((
                ev["event_id"], ev.get("operation") or "unknown",
                ev.get("table_name") or "", ev.get("file_name") or "",
                ev.get("bucket") or "", status, details,
                ev.get("approval_timestamp"),
            ))

        # Stage 1: validate + stage every event; build per-table runs
        # of consecutive (operation, column-signature) — files with
        # different headers can't union, so a header change starts a
        # new run (each still applies exactly as sequential would).
        runs_by_table: dict[str, list] = {}  # table -> [(run key, items)]
        run_order: list[tuple[str, int]] = []  # (table, run index) in arrival order
        # Policy-bounded collect: never pull more than cap+1 rows to
        # the driver, and refuse the batch past the cap (see
        # ``max_events_per_batch``).
        cap = self.max_events_per_batch
        staged_rows = fresh.limit(cap + 1).collect()
        if len(staged_rows) > cap:
            raise ValueError(
                f"approval micro-batch exceeds max_events_per_batch="
                f"{cap}: approval events are a human-scale control "
                f"plane; a machine-scale feed on this topic is a "
                f"wiring bug (raise the cap explicitly to override)"
            )
        for row in staged_rows:
            ev = row.asDict()
            try:
                staged = self._stage_event(ev)
            except Exception as exc:
                fail(ev, exc)
                continue
            if staged is None:
                add_outcome(
                    ev, "rejected",
                    f"Rejected by approver; table {ev['table_name']} unchanged.",
                )
                continue
            table, op, incoming = staged
            run_key = (op, tuple(sorted(incoming.columns)))
            runs = runs_by_table.setdefault(table, [])
            if not runs or runs[-1][0] != run_key:
                runs.append((run_key, []))
                run_order.append((table, len(runs) - 1))
            runs[-1][1].append((ev, incoming))

        # Stage 2: ONE combined mutation plan + ONE overwrite per run.
        for table, idx in run_order:
            (op, _), items = runs_by_table[table][idx]
            try:
                details_by_event = self._apply_run(table, op, items)
            except Exception as exc:
                for ev, _ in items:
                    fail(ev, exc)
                continue
            for ev, _ in items:
                add_outcome(ev, "approved", details_by_event[ev["event_id"]])

        if not outcomes:
            return
        if batch_dead:
            # Durable dead-letter queue: one append per batch (the
            # in-memory list is a convenience view; the table is the
            # record — a restart must not lose poison events).
            self.dead_letters.extend(batch_dead)
            self.store.append(
                "dead_letters",
                self.spark.createDataFrame(
                    [
                        (d["event_id"], d.get("operation"), d.get("table_name"),
                         d.get("file_name"), d.get("bucket"), d["error"],
                         d.get("approval_timestamp"))
                        for d in batch_dead
                    ],
                    "event_id string, operation string, table_name string, "
                    "file_name string, bucket string, error string, "
                    "approval_timestamp string",
                ),
            )
        odf = self.spark.createDataFrame(outcomes, OUTCOME_SCHEMA)
        self.ledger.mark_many(
            odf.select(
                "event_id", "status",
                F.lit(True).alias("is_processed"), "approval_timestamp",
            )
        )
        for r in render_result_notifications(odf).collect():
            self.notifier.notify(r["subject"], r["body"])

    def _stage_event(self, ev: dict) -> tuple[str, str, DataFrame] | None:
        """Validate one approval event and stage its CSV; return
        ``None`` for rejections, else ``(table, op, incoming)`` with
        ``__event_id``/``__file_order`` helper columns attached.

        Every per-event failure mode lives here (so one poison event
        never sinks a coalesced run): unknown action, unknown
        operation, missing CSV, missing primary-key registration, and
        incoming files lacking the declared key columns.
        """
        status = ev.get("action")
        status = {"approve": "approved", "reject": "rejected"}.get(status or "")
        if status is None:
            raise ValueError(f"unknown action {ev.get('action')!r}")
        if status == "rejected":  # EP3 step 7: ledger update only
            return None

        table, op = ev["table_name"], ev["operation"]
        if op not in ("insert", "update", "delete"):
            raise ValueError(f"unknown operation {op!r}")
        keys = self.keys.get(table)
        if op in ("update", "delete") and not keys:
            # mirrors the reference's no-primary-key abort
            # (process-pipeline.py:179-181, 262-264)
            raise ValueError(f"no primary key registered for table {table}")
        incoming = read_csv_all_string(
            self.spark, f"{self.csv_root}/{ev['file_name']}"
        )
        missing = [k for k in (keys or []) if k not in incoming.columns]
        if missing and op != "insert":
            raise ValueError(
                f"incoming file {ev['file_name']} lacks key columns {missing}"
            )
        # Reference conflict semantics are POSITIONAL (executemany file
        # order): first row per key wins for insert, last for update.
        # Capture file order at read time — a single-file read's
        # monotonically_increasing_id is ordered by file offset.
        return table, op, (
            incoming
            .withColumn("__event_id", F.lit(ev["event_id"]))
            .withColumn("__file_order", F.monotonically_increasing_id())
        )

    def _apply_run(
        self, table: str, op: str, items: list[tuple[dict, DataFrame]]
    ) -> dict[str, str]:
        """Apply ONE coalesced mutation for a run of same-(table, op)
        events; return per-event details strings.

        The staged frames union with an ``__event_seq`` literal (batch
        position) so ``(__event_seq, __file_order)`` totally orders all
        rows of the run exactly as sequential application would have:
        insert keeps the FIRST row per key across the whole run, update
        the LAST — identical winners, one table write.
        """
        keys = self.keys.get(table)
        combined = None
        for seq, (_, inc) in enumerate(items):
            inc = inc.withColumn("__event_seq", F.lit(seq))
            combined = inc if combined is None else combined.unionByName(inc)
        order = ["__event_seq", "__file_order"]
        helper = ["__event_id", "__event_seq", "__file_order"]

        if op == "delete":
            # ST4: queue, don't execute (two-phase). queue_deletes
            # dedups intra-batch keeping the earliest event per key —
            # the same winner sequential queueing picks.
            reqs = combined.select(
                F.col("__event_id").alias("event_id"),
                F.lit(table).alias("target_table"),
                F.to_json(F.struct(*[F.col(k) for k in keys])).alias("key_json"),
            )
            queued = self.ledger.queue_deletes(reqs)
            counts = {
                r["event_id"]: r["n"]
                for r in queued.groupBy("event_id")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            return {
                ev["event_id"]: (
                    f"Stored delete queries for {counts.get(ev['event_id'], 0)} "
                    "rows into delete_control."
                )
                for ev, _ in items
            }

        details = (
            f"Inserted file rows into {table} (conflicts skipped)."
            if op == "insert"
            else f"Upserted file rows into {table}."
        )
        if keys and hasattr(self.store, "apply_keyed_mutation"):
            # Incremental backend (BucketedTableStore / Delta-shaped):
            # the store rewrites only the buckets the incoming keys
            # hash into — O(affected buckets), not O(table).
            self.store.apply_keyed_mutation(table, combined, keys, order, op)
            return {ev["event_id"]: details for ev, _ in items}
        if not self.store.exists(table):
            # S8: create on first arrival — all-string from headers
            self.store.overwrite(table, combined.drop(*helper).limit(0))
        target = self.store.read(table)
        if op == "insert":
            result = (
                insert_if_absent(target, combined, keys, order)
                if keys
                else target.unionByName(combined.drop(*helper))
            )
        else:
            result = upsert(target, combined, keys, order)
        self.store.overwrite(table, result)
        return {ev["event_id"]: details for ev, _ in items}

    # -- EP4: scheduled delete drain ---------------------------------------

    def drain_deletes(self) -> int:
        def apply(pending: DataFrame) -> None:
            for table_row in pending.select("target_table").distinct().collect():
                table = table_row["target_table"]
                keys = self.keys[table]
                key_schema = T.StructType(
                    [T.StructField(k, T.StringType()) for k in keys]
                )
                key_df = (
                    pending.filter(F.col("target_table") == table)
                    .select(F.from_json("key_json", key_schema).alias("k"))
                    .select("k.*")
                )
                if hasattr(self.store, "apply_keyed_mutation"):
                    self.store.apply_keyed_mutation(table, key_df, keys, [], "delete")
                else:
                    self.store.overwrite(
                        table, delete_by_keys(self.store.read(table), key_df, keys)
                    )

        return self.ledger.drain_deletes(apply)

    # -- streaming entry ----------------------------------------------------

    def start(self, raw_stream: DataFrame, checkpoint: str):
        """Attach the pipeline to a raw transport stream
        (base64-JSON ``value`` column) with exactly-once foreachBatch."""
        decoded = decode_approval_stream(raw_stream)
        return (
            decoded.writeStream.foreachBatch(
                lambda df, bid: self.run_batch(df, bid)
            )
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
