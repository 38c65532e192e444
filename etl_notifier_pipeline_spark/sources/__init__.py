from etl_notifier_pipeline_spark.sources.ingest import (
    EmptyInputError,
    cast_to_template,
    derive_table_name,
    read_csv_all_string,
    read_csv_typed,
)

__all__ = [
    "EmptyInputError",
    "cast_to_template",
    "derive_table_name",
    "read_csv_all_string",
    "read_csv_typed",
]
