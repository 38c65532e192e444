from etl_notifier_pipeline_spark.operators.mutations import (
    MissingKeyError,
    apply_change_feed,
    change_feed,
    delete_by_keys,
    deleted_count,
    filter_new_deletes,
    insert_if_absent,
    snapshot_diff,
    upsert,
)

__all__ = [
    "MissingKeyError",
    "apply_change_feed",
    "change_feed",
    "delete_by_keys",
    "deleted_count",
    "filter_new_deletes",
    "insert_if_absent",
    "snapshot_diff",
    "upsert",
]
