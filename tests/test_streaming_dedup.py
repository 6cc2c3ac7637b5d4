"""Streaming dedup: duplicates arriving across micro-batches are
dropped via keyed state bounded by a watermark — the streaming face
of the dedup operator family."""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_stream_dedup_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)

    def write(rows):
        spark.createDataFrame(rows).coalesce(1).write.mode("append").parquet(src)

    def ev(eid, minute):
        return Row(event_id=eid, ts=f"2024-01-01 00:{minute:02d}:00")

    write([ev(1, 1), ev(2, 2), ev(1, 1)])  # dup within batch

    stream = (
        spark.readStream.schema("event_id long, ts string")
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "30 minutes")
        .dropDuplicates(["event_id"])
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_sink")
        .start()
    )
    try:
        q.processAllAvailable()
        # duplicate of id=1 arriving in a LATER batch is dropped too
        write([ev(1, 3), ev(3, 4)])
        q.processAllAvailable()
        got = sorted(r.event_id for r in spark.table("dedup_sink").collect())
        assert got == [1, 2, 3]
    finally:
        q.stop()
