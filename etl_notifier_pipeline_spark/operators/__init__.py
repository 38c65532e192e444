from etl_notifier_pipeline_spark.operators.mutations import (
    MissingKeyError,
    delete_by_keys,
    deleted_count,
    filter_new_deletes,
    insert_if_absent,
    snapshot_diff,
    upsert,
)

__all__ = [
    "MissingKeyError",
    "delete_by_keys",
    "deleted_count",
    "filter_new_deletes",
    "insert_if_absent",
    "snapshot_diff",
    "upsert",
]
