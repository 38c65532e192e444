"""etl_notifier_pipeline_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the capabilities of the reference pipeline
``ashish2085/etl-notifier-pipeline`` (an event-driven, approval-gated
CSV -> Postgres ETL on GCP) as an idiomatic Spark engine:

- batch + streaming CSV/parquet ingestion with the reference's schema
  policy (header -> all-string default, template-schema cast, empty-file
  error; see reference ``process-pipeline.py:104-130, 332-343``),
- keyed mutations with MERGE semantics (insert-if-absent / upsert /
  delete-by-keys; reference ``process-pipeline.py:152-234``),
- an exactly-once control ledger + two-phase approval-gated deletes
  (reference ``process-pipeline.py:89-101, 255-315``, ``delete-control.py``),
- Structured Streaming equivalents of the Pub/Sub event flow,
- the LLM-data-pipeline extension operators (dedup, similarity search,
  text analysis, multimodal columns) designed for 100 TB scale.

Everything is DataFrame/Catalyst-first: declarative plans, predicate
pushdown, broadcast joins for dims, AQE on. Python UDFs only where the
built-ins genuinely cannot express the semantics (Arrow-batched).
"""

from etl_notifier_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
