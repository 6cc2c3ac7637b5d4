"""Streaming fingerprint dedup: the streaming face of
dedup_fingerprint — normalized-hash keyed state drops near-identical
documents arriving across micro-batches."""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from map_reduce_server_spark.functions.hashing import md5_long


def test_streaming_dedup_by_fingerprint(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)

    def write(rows):
        spark.createDataFrame(rows).coalesce(1).write.mode("append").parquet(src)

    def doc(did, text, minute):
        return Row(doc_id=did, text=text, ts=f"2024-01-01 00:{minute:02d}:00")

    # same text modulo case/whitespace → same fingerprint
    write([doc(1, "Spark Makes Join Fast", 1), doc(2, "other text", 2)])

    normalized = F.regexp_replace(F.lower(F.trim(F.col("text"))), " +", " ")
    stream = (
        spark.readStream.schema("doc_id long, text string, ts string")
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withColumn("fingerprint", md5_long(normalized))
        .withWatermark("ts", "30 minutes")
        .dropDuplicates(["fingerprint"])
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("fp_dedup_sink")
        .start()
    )
    try:
        q.processAllAvailable()
        # a later batch re-submits doc 1's text with different case and
        # doubled spaces — must be recognized as a duplicate
        write([doc(3, "spark  makes  join  fast", 3), doc(4, "fresh doc", 4)])
        q.processAllAvailable()
        got = sorted(r.doc_id for r in spark.table("fp_dedup_sink").collect())
        assert got == [1, 2, 4]
    finally:
        q.stop()
