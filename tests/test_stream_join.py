"""Stream-stream join (SURVEY §2.9 absent-machinery list): signups
joined with purchases of the same user within a bounded event-time
interval, under watermarks on both sides — the state-bounded form of
the correlation join at scale."""

from __future__ import annotations

import json

from pyspark.sql import functions as F


def test_stream_stream_interval_join(spark, tmp_path):
    src = tmp_path / "ev"
    src.mkdir()
    rows = [
        {"event_id": 1, "ts": "2024-01-01 00:00:00", "user_id": 1, "event_type": "signup"},
        {"event_id": 2, "ts": "2024-01-01 00:10:00", "user_id": 1, "event_type": "purchase"},
        {"event_id": 3, "ts": "2024-01-01 02:00:00", "user_id": 1, "event_type": "purchase"},
        {"event_id": 4, "ts": "2024-01-01 00:05:00", "user_id": 2, "event_type": "signup"},
        {"event_id": 5, "ts": "2024-01-01 00:20:00", "user_id": 3, "event_type": "purchase"},
    ]
    (src / "a.json").write_text("\n".join(map(json.dumps, rows)))
    schema = "event_id long, ts string, user_id long, event_type string"

    def stream():
        return (
            spark.readStream.schema(schema)
            .json(str(src))
            .withColumn("ts", F.to_timestamp("ts"))
        )

    signups = (
        stream()
        .filter(F.col("event_type") == "signup")
        .select(
            F.col("user_id").alias("s_user"),
            F.col("ts").alias("s_ts"),
            F.col("event_id").alias("s_id"),
        )
        .withWatermark("s_ts", "1 hour")
    )
    purchases = (
        stream()
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("p_id"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = signups.join(
        purchases,
        (F.col("s_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select("s_user", "s_id", "p_id")
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_ss_join")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    got = {(r["s_user"], r["s_id"], r["p_id"]) for r in spark.table("t_ss_join").collect()}
    # user 1: purchase at +10min joins; purchase at +2h is outside the
    # interval; user 2 has no purchase; user 3's purchase has no signup
    assert got == {(1, 1, 2)}


def test_stream_stream_interval_join_left_outer(spark, tmp_path):
    """Outer form: unmatched signups emit a NULL-purchase row once the
    watermark passes their interval end (a sentinel event advances
    it); matched rows are identical to the inner join."""
    src = tmp_path / "ev"
    src.mkdir()
    rows = [
        {"event_id": 1, "ts": "2024-01-01 00:00:00", "user_id": 1, "event_type": "signup"},
        {"event_id": 2, "ts": "2024-01-01 00:10:00", "user_id": 1, "event_type": "purchase"},
        {"event_id": 4, "ts": "2024-01-01 00:05:00", "user_id": 2, "event_type": "signup"},
        {"event_id": 5, "ts": "2024-01-01 00:20:00", "user_id": 3, "event_type": "purchase"},
    ]
    sentinel = [
        {"event_id": 9, "ts": "2024-01-02 00:00:00", "user_id": 9, "event_type": "purchase"},
        {"event_id": 10, "ts": "2024-01-02 00:00:00", "user_id": 9, "event_type": "signup"},
    ]
    (src / "a.json").write_text("\n".join(map(json.dumps, rows)))
    (src / "b.json").write_text("\n".join(map(json.dumps, sentinel)))
    schema = "event_id long, ts string, user_id long, event_type string"

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
            .withColumn("ts", F.to_timestamp("ts"))
        )

    signups = (
        stream()
        .filter(F.col("event_type") == "signup")
        .select(
            F.col("user_id").alias("s_user"),
            F.col("ts").alias("s_ts"),
            F.col("event_id").alias("s_id"),
        )
        .withWatermark("s_ts", "0 seconds")
    )
    purchases = (
        stream()
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("p_id"),
        )
        .withWatermark("p_ts", "0 seconds")
    )
    joined = signups.join(
        purchases,
        (F.col("s_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 1 HOUR")),
        "leftOuter",
    ).select("s_user", "s_id", "p_id")
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_ss_join_outer")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    got = {
        (r["s_user"], r["s_id"], r["p_id"])
        for r in spark.table("t_ss_join_outer")
        .filter(F.col("s_user") != 9)
        .collect()
    }
    # user 1 matches; user 2's signup emits with NULL purchase
    assert got == {(1, 1, 2), (2, 4, None)}
