"""The ANN scale path made literal: write the corpus partitioned by
LSH bucket, and verify a bucket-filtered query prunes partitions at
the scan (reads 1/2^H of the data) — what ann_topk_lsh computes on
the fly becomes a storage layout at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_server_spark.operators.similarity import _bucket_col, _emb
from map_reduce_server_spark.plans import explain_str


def test_bucket_partitioned_ann_prunes(spark, sf_small, tmp_path):
    out = str(tmp_path / "emb_by_bucket")
    emb = _emb(spark, sf_small).withColumn("bucket", _bucket_col(F.col("vec")))
    emb.write.mode("overwrite").partitionBy("bucket").parquet(out)

    corpus = spark.read.parquet(out)
    one_bucket = corpus.filter(F.col("bucket") == 3)
    plan = explain_str(one_bucket)
    # partition pruning visible at the scan
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters")[1].split("\n")[0]
    # and the filtered read matches the computed bucket assignment
    expected = emb.filter(F.col("bucket") == 3).count()
    assert one_bucket.count() == expected > 0
