"""Stream-stream interval-join state expiry: a late event beyond the
watermark must not produce a match, because the opposite side's
state has already been expired — the bounded-memory contract that
makes the join runnable forever (see streaming/joins.py)."""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import functions as F


def _write(spark, path, rows):
    spark.createDataFrame(rows).coalesce(1).write.mode("append").parquet(path)


def _ev(hh, mm, etype, eid, user=1):
    return Row(
        ts=f"2024-01-01 {hh:02d}:{mm:02d}:00",
        event_type=etype,
        user_id=user,
        event_id=eid,
    )


def _ev2(hh, mm, etype, eid):
    return _ev(hh, mm, etype, eid, user=2)


def test_interval_join_drops_late_purchase(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    # batch 1: a click at 00:00 and its matching purchase at 00:10,
    # plus a user-2 click+purchase pair at 02:00. The far-future pair
    # advances BOTH sides' watermark nodes (the global watermark is
    # the MIN across nodes, and each side only sees its own filtered
    # rows) to 01:00 — which expires user-1 click state older than
    # 00:30 when batch 1 commits.
    _write(
        spark,
        src,
        [
            _ev(0, 0, "click", 1),
            _ev(0, 10, "purchase", 2),
            _ev2(2, 0, "click", 5),
            _ev2(2, 0, "purchase", 6),
        ],
    )

    schema = "ts string, event_type string, user_id bigint, event_id bigint"
    stream = (
        spark.readStream.schema(schema)
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .withWatermark("ts", "1 hour")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
        )
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "1 hour")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
        )
    )
    joined = clicks.join(
        purchases,
        (F.col("click_user") == F.col("user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")
        ),
    ).select("click_id", "purchase_id")
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_late_sink")
        .start()
    )
    try:
        q.processAllAvailable()
        first = {
            (r.click_id, r.purchase_id)
            for r in spark.table("ssj_late_sink").collect()
        }
        assert first == {(1, 2), (5, 6)}

        # batch 2: a LATE purchase at 00:20 — inside the click's
        # 30-minute interval, but behind the watermark: the click's
        # state is expired, so NO new match may appear.
        _write(spark, src, [_ev(0, 20, "purchase", 4)])
        q.processAllAvailable()
        final = {
            (r.click_id, r.purchase_id)
            for r in spark.table("ssj_late_sink").collect()
        }
        assert final == {(1, 2), (5, 6)}, final
    finally:
        q.stop()
