"""applyInPandasWithState: the final state after streaming the whole
bounded input must equal the batch aggregate."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from map_reduce_server_spark.streaming.stateful import running_counts_stream
from map_reduce_server_spark.tables import load_table


def test_stateful_running_counts_match_batch(spark, sf_small):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_small}/events.parquet").schema
    stage = tempfile.mkdtemp(prefix="mrss_state_")
    os.symlink(
        f"{sf_small}/events.parquet", os.path.join(stage, "events.parquet")
    )
    try:
        stream = (
            spark.readStream.schema(schema).format("parquet").load(stage)
        )
        if dict(stream.dtypes).get("ts") == "bigint":
            stream = stream.withColumn(
                "ts", F.expr("timestamp_micros(ts div 1000)")
            )
        out = running_counts_stream(stream)
        q = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName("state_out")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        shutil.rmtree(stage, ignore_errors=True)

    # last emitted row per event_type == final state
    got = {
        r.event_type: (r.n_events, r.total_value)
        for r in spark.table("state_out").collect()
    }
    expected = {
        r.event_type: (r.n, round(r.total, 2))
        for r in load_table(spark, sf_small, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(30,2)"))
            .cast("double")
            .alias("total"),
        )
        .collect()
    }
    assert got == expected
