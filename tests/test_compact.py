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


def test_write_compacted_metachar_path(spark, sf_small, tmp_path):
    """A destination containing glob metacharacters must compact and
    clean up: the staging RE-READ goes through Hadoop glob
    resolution (read paths are patterns, write paths are literal),
    so an unescaped '[1]' failed after the full staging write and
    leaked the staged copy."""
    import os

    li = load_table(spark, sf_small, "lineitem").repartition(4)
    out = str(tmp_path / "run[1]" / "compacted")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    n = write_compacted(li, out, target_file_bytes=512 * 1024 * 1024)
    assert n == 1
    assert not os.path.exists(out.rstrip("/") + "_staging")
    from map_reduce_server_spark.io.compact import _hadoop_glob_escape

    assert (
        spark.read.parquet(_hadoop_glob_escape(out)).count() == li.count()
    )


def test_write_compacted_returns_actual_file_count(spark, sf_small, tmp_path):
    """The parquet writer skips empty partitions: a wider-than-rows
    repartition writes fewer files than requested, and the return
    value must report what was actually written."""
    tiny = load_table(spark, sf_small, "region")  # 5 rows, tiny bytes
    out = str(tmp_path / "tiny")
    n = write_compacted(tiny, out, target_file_bytes=64)
    files = glob.glob(out + "/part-*")
    assert len(files) == n


def test_write_compacted_file_uri(spark, sf_small, tmp_path):
    """A URI destination takes the Hadoop FileSystem branch end to
    end — measure (recursive listing, hidden files excluded),
    staging cleanup, and the final part-file count — exercised via
    file: since no DFS runs locally; the FS API calls are identical
    for hdfs://or s3a:// (previously any URI raised ValueError)."""
    import os

    li = load_table(spark, sf_small, "lineitem").repartition(8)
    local = str(tmp_path / "uri_out")
    out = "file://" + local
    n = write_compacted(li, out, target_file_bytes=512 * 1024 * 1024)
    assert n == 1
    assert len(glob.glob(local + "/part-*")) == 1
    assert not os.path.exists(local + "_staging")
    assert spark.read.parquet(out).count() == li.count()


def test_write_compacted_file_uri_splits(spark, sf_small, tmp_path):
    """The Hadoop-FS measure must return the REAL staged byte count:
    a small target then yields >1 file, proving the size didn't
    collapse to 0 (the failure the old URI guard existed to stop)."""
    li = load_table(spark, sf_small, "lineitem")
    local = str(tmp_path / "uri_split")
    out = "file://" + local
    n = write_compacted(li, out, target_file_bytes=16 * 1024)
    files = glob.glob(local + "/part-*")
    assert len(files) == n > 1
    assert spark.read.parquet(out).count() == li.count()
