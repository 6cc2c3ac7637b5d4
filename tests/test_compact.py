"""Compaction: fragmented output rewritten at a target file size."""

from __future__ import annotations

import glob

from map_reduce_server_spark.io.compact import write_compacted
from map_reduce_server_spark.tables import load_table


def test_write_compacted_reduces_file_count(spark, sf_small, tmp_path):
    li = load_table(spark, sf_small, "lineitem").repartition(16)
    out = str(tmp_path / "compacted")
    # target far larger than the data → everything compacts to 1 file
    n = write_compacted(li, out, target_file_bytes=512 * 1024 * 1024)
    assert n == 1
    files = glob.glob(out + "/part-*")
    assert len(files) == 1
    assert spark.read.parquet(out).count() == li.count()


def test_write_compacted_splits_at_small_target(spark, sf_small, tmp_path):
    li = load_table(spark, sf_small, "lineitem")
    out = str(tmp_path / "split")
    n = write_compacted(li, out, target_file_bytes=16 * 1024)
    files = glob.glob(out + "/part-*")
    assert len(files) == n > 1
    assert spark.read.parquet(out).count() == li.count()
