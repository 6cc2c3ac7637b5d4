"""foreachBatch sink: the custom-sink pattern for exactly-once-style
writes (batch id available for idempotence) — completes the streaming
sink surface next to memory/file sinks."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_foreachbatch_writes_each_microbatch(spark, tmp_path):
    src = str(tmp_path / "src")
    dest = str(tmp_path / "dest")
    os.makedirs(src, exist_ok=True)
    seen_batches: list[int] = []

    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string"
    ).coalesce(1).write.mode("append").parquet(src)

    def sink(batch_df, batch_id: int) -> None:
        # idempotent layout: one directory per batch id — a re-run of
        # the same batch overwrites instead of duplicating
        seen_batches.append(batch_id)
        batch_df.write.mode("overwrite").parquet(f"{dest}/batch={batch_id}")

    stream = spark.readStream.schema("id long, v string").parquet(src)
    q = stream.writeStream.foreachBatch(sink).start()
    try:
        q.processAllAvailable()
        spark.createDataFrame([(3, "c")], "id long, v string").coalesce(
            1
        ).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    assert len(seen_batches) >= 2
    total = spark.read.option("recursiveFileLookup", "false").parquet(
        f"{dest}/batch=*"
    )
    assert sorted(r.id for r in total.collect()) == [1, 2, 3]


def test_parquet_zstd_roundtrip(spark, sf_small, tmp_path):
    """Columnar codec support: zstd-compressed parquet write+read."""
    from map_reduce_server_spark.tables import load_table

    li = load_table(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    out = str(tmp_path / "zstd")
    li.write.mode("overwrite").option("compression", "zstd").parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == li.count()
    assert back.agg(F.sum("l_orderkey")).first()[0] == li.agg(
        F.sum("l_orderkey")
    ).first()[0]
