"""Scalar function surface (SURVEY §2.8, F1-F14) as Column expressions.

Every string/derivation the reference performs row-at-a-time in Python
is re-expressed as a JVM-side, codegen-able Column expression — no
Python in the hot path. Each helper cites the reference site it covers.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def ts_micros(col: Column | str) -> Column:
    """Microseconds-since-epoch from any timestamp flavor.

    ``unix_micros`` is strict: it rejects TIMESTAMP_NTZ (how Spark >= 3.4
    reads isAdjustedToUTC=false parquet when NTZ inference is on). The
    engine pins the session timezone to UTC, so NTZ -> TIMESTAMP is a
    wall-clock no-op and one cast makes every chrono expression
    runtime-portable.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast(T.TimestampType()))


def file_stem(col: Column | str) -> Column:
    """F1 — strip last extension (``data-query.py:64``)."""
    return F.regexp_replace(F.col(col) if isinstance(col, str) else col, r"\.[^.]*$", "")


def sanitize_identifier(col: Column | str) -> Column:
    """F2 — non-alphanumerics -> ``_`` then lowercase (``data-query.py:65``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_replace(c, "[^a-zA-Z0-9_]", "_"))


def table_name_expr(file_name: Column | str) -> Column:
    """F1+F2 composed — file name -> table name (``data-query.py:62-68``)."""
    return sanitize_identifier(file_stem(file_name))


def path_operation(path: Column | str) -> Column:
    """F4 — first path segment, lowered = operation (``data-query.py:223``)."""
    c = F.col(path) if isinstance(path, str) else path
    return F.lower(F.element_at(F.split(c, "/"), 1))


def action_to_status(action: Column | str) -> Column:
    """F12 — approve/reject -> approved/rejected/NULL
    (``process-pipeline.py:468``)."""
    c = F.lower(F.col(action) if isinstance(action, str) else action)
    return (
        F.when(c == "approve", F.lit("approved"))
        .when(c == "reject", F.lit("rejected"))
        .otherwise(F.lit(None).cast("string"))
    )


def iso_utc_ts() -> Column:
    """F10 — ISO-8601 "Z" current timestamp string (``data-query.py:232``)."""
    return F.date_format(F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")


def decode_event_payload(value: Column | str, schema: T.StructType) -> Column:
    """F8+F9 — base64-encoded JSON event -> typed struct
    (``process-pipeline.py:448``: ``json.loads(base64.b64decode(data))``).
    """
    c = F.col(value) if isinstance(value, str) else value
    return F.from_json(F.unbase64(c).cast("string"), schema)
