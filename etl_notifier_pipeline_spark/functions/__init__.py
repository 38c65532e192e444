from etl_notifier_pipeline_spark.functions.scalar import (
    action_to_status,
    decode_event_payload,
    file_stem,
    iso_utc_ts,
    path_operation,
    sanitize_identifier,
    table_name_expr,
)

__all__ = [
    "action_to_status",
    "decode_event_payload",
    "file_stem",
    "iso_utc_ts",
    "path_operation",
    "sanitize_identifier",
    "table_name_expr",
]
