"""Watermark semantics: in append mode a finalized window emits once,
and late data beyond the watermark is dropped — the state-bounding
contract that keeps streaming aggregation memory finite at scale."""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import functions as F


def _write_batch(spark, path, rows, n):
    spark.createDataFrame(rows).coalesce(1).write.mode(
        "append"
    ).parquet(path)
    # wait not needed: file source lists on each trigger


def test_late_data_dropped_after_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)

    def ev(minute: int, key: str):
        return Row(
            ts=f"2024-01-01 00:{minute:02d}:00", k=key
        )

    # batch 1: events in windows [00:00) and [00:05); max ts 00:30
    # → watermark advances to 00:20, finalizing both windows.
    _write_batch(
        spark, src, [ev(1, "a"), ev(2, "a"), ev(6, "b"), ev(30, "c")], 1
    )

    schema = "ts string, k string"
    stream = (
        spark.readStream.schema(schema)
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"), "k")
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("w"), "k", "n")
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_sink")
        .start()
    )
    try:
        q.processAllAvailable()
        first = {(str(r.w), r.k): r.n for r in spark.table("late_sink").collect()}
        # windows ending ≤ watermark (00:20) are finalized and emitted
        assert first[("2024-01-01 00:00:00", "a")] == 2
        assert first[("2024-01-01 00:05:00", "b")] == 1

        # batch 2: a LATE event for the already-finalized 00:00 window
        # plus a fresh one
        _write_batch(spark, src, [ev(1, "a"), ev(35, "c")], 2)
        q.processAllAvailable()
        final = {(str(r.w), r.k): r.n for r in spark.table("late_sink").collect()}
        # the late event did NOT re-emit or bump the finalized window
        assert final[("2024-01-01 00:00:00", "a")] == 2
    finally:
        q.stop()
