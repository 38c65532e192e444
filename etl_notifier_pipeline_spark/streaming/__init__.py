from etl_notifier_pipeline_spark.streaming.pipeline import (
    ApprovalPipeline,
    LogNotifier,
    Notifier,
    approval_event_schema,
)

__all__ = [
    "ApprovalPipeline",
    "LogNotifier",
    "Notifier",
    "approval_event_schema",
]
