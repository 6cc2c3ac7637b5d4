"""Compaction: fragmented output rewritten at a target file size."""

from __future__ import annotations

import glob

import pytest

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


def test_write_compacted_partitioned(spark, sf_small, tmp_path):
    """Hive-partitioned compaction: small partitions compact to one
    file each, the layout keys the directories, and the data
    round-trips. A global-coalesce compactor would scatter every
    hive partition across every task — the per-directory file count
    is the real assertion."""
    import os

    from map_reduce_server_spark.io.compact import (
        write_compacted_partitioned,
    )

    orders = load_table(spark, sf_small, "orders").repartition(8)
    out = str(tmp_path / "by_prio")
    n = write_compacted_partitioned(
        orders, out, ["o_orderpriority"], target_file_bytes=512 * 1024 * 1024
    )
    part_dirs = [
        d for d in os.listdir(out) if d.startswith("o_orderpriority=")
    ]
    assert len(part_dirs) == 5  # the 5 TPC-H priorities
    # each small partition compacted to exactly one data file
    for d in part_dirs:
        files = [
            f
            for f in os.listdir(os.path.join(out, d))
            if f.startswith("part-")
        ]
        assert len(files) == 1, (d, files)
    assert n == 5
    got = spark.read.parquet(out)
    assert got.count() == orders.count()
    assert not os.path.exists(out + "_staging")


def test_write_compacted_partitioned_splits_skew(spark, sf_small, tmp_path):
    """A partition whose bytes exceed the target must split into
    multiple files (maxRecordsPerFile rolling), not collapse to one
    giant file — the skewed-partition half of the contract."""
    import os

    from map_reduce_server_spark.io.compact import (
        write_compacted_partitioned,
    )

    li = load_table(spark, sf_small, "lineitem")
    out = str(tmp_path / "by_flag")
    # Shrink AQE's coalescing targets so the tiny test dataset keeps
    # its shuffle partitions apart: the salt provides the CAPACITY
    # for parallel writers, and AQE sizes the actual parallelism —
    # at sf0.001 it correctly coalesces to one task unless told the
    # advisory partition is 16 KB (at 100 TB the partitions dwarf
    # any advisory size and stay parallel on their own).
    advisory = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    min_size = "spark.sql.adaptive.coalescePartitions.minPartitionSize"
    old_adv, old_min = spark.conf.get(advisory), spark.conf.get(min_size)
    spark.conf.set(advisory, "16k")
    spark.conf.set(min_size, "4k")
    try:
        write_compacted_partitioned(
            li, out, ["l_returnflag"], target_file_bytes=32 * 1024
        )
    finally:
        spark.conf.set(advisory, old_adv)
        spark.conf.set(min_size, old_min)
    sizes = {}
    writer_tasks = {}
    for d in os.listdir(out):
        if not d.startswith("l_returnflag="):
            continue
        files = [
            f
            for f in os.listdir(os.path.join(out, d))
            if f.startswith("part-")
        ]
        sizes[d] = len(files)
        # part-NNNNN-... encodes the writing task's partition id
        writer_tasks[d] = {f.split("-")[1] for f in files}
    assert max(sizes.values()) > 1, sizes
    # the salt must spread a skewed hive partition over MULTIPLE
    # writer tasks (review r9: an unsalted repartition on the
    # partition columns funnels each partition through one task —
    # a 10 TB partition would be written serially)
    assert max(len(t) for t in writer_tasks.values()) > 1, writer_tasks
    assert spark.read.parquet(out).count() == li.count()


def test_write_compacted_partitioned_null_keys_and_maps(spark, tmp_path):
    """Review r9 regressions, pinned: NULL partition keys must land
    in __HIVE_DEFAULT_PARTITION__ (a null-unsafe salt join silently
    DROPPED them), and map-typed data columns must compact (Spark's
    hash() rejects maps recursively — the salt simply EXCLUDES any
    column containing a map, per _contains_map; diversity still
    comes from the remaining columns + spark_partition_id)."""
    import os

    from pyspark.sql import functions as F

    from map_reduce_server_spark.io.compact import (
        write_compacted_partitioned,
    )

    df = spark.range(100).select(
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.col("id") % 3)
        .alias("grp"),
        F.col("id").alias("v"),
        F.create_map(F.lit("k"), F.col("id")).alias("m"),
    )
    out = str(tmp_path / "nullable")
    write_compacted_partitioned(df, out, ["grp"])
    got = spark.read.parquet(out)
    assert got.count() == 100  # NULL-keyed rows survived
    assert any(
        d.startswith("grp=__HIVE_DEFAULT_PARTITION__")
        for d in os.listdir(out)
    )
    # map column round-trips
    assert got.filter("v = 7").collect()[0]["m"] == {"k": 7}


def test_write_compacted_partitioned_nested_maps(spark, tmp_path):
    """Spark's hash() rejects MapType RECURSIVELY — a map nested in
    an array must also be excluded from the salt hash (review r9:
    a top-level isinstance check missed array<map<...>>)."""
    from pyspark.sql import functions as F

    from map_reduce_server_spark.io.compact import (
        write_compacted_partitioned,
    )

    df = spark.range(20).select(
        (F.col("id") % 2).alias("grp"),
        F.array(F.create_map(F.lit("k"), F.col("id"))).alias("am"),
    )
    out = str(tmp_path / "nested")
    write_compacted_partitioned(df, out, ["grp"])
    got = spark.read.parquet(out)
    assert got.count() == 20
    assert got.filter("am[0]['k'] = 7").count() == 1


def test_write_compacted_partitioned_reserved_name_collision(
    spark, tmp_path
):
    from pyspark.sql import functions as F

    from map_reduce_server_spark.io.compact import (
        write_compacted_partitioned,
    )

    df = spark.range(5).select(
        F.col("id").alias("grp"), F.lit(1).alias("__mrss_salt")
    )
    with pytest.raises(ValueError, match="reserved names"):
        write_compacted_partitioned(df, str(tmp_path / "x"), ["grp"])


def test_write_compacted_file_uri_final_write_failure_cleans_staging(
    spark, sf_small, tmp_path, monkeypatch
):
    """A final-write failure on the Hadoop FileSystem branch must
    still remove the staged copy: `_staged_copy` promises staging
    removal on EVERY exit path, and the file:-URI branch cleans up
    via `fs.delete`, not shutil — so the local-branch guarantee
    needs its own proof here. The failure is injected at the exact
    call site (DataFrameWriter.parquet on the destination path);
    the staging write and the getContentSummary measure run for
    real first."""
    import os

    import pyspark.sql.readwriter as rw

    li = load_table(spark, sf_small, "region")
    local = str(tmp_path / "uri_fail")
    out = "file://" + local

    orig = rw.DataFrameWriter.parquet

    def failing(self, p, *a, **k):
        if p == out:
            raise RuntimeError("simulated destination write failure")
        return orig(self, p, *a, **k)

    monkeypatch.setattr(rw.DataFrameWriter, "parquet", failing)
    with pytest.raises(RuntimeError, match="destination write failure"):
        write_compacted(li, out, target_file_bytes=512 * 1024 * 1024)
    # staged copy removed through the FileSystem API, dest untouched
    assert not os.path.exists(local + "_staging")
    assert not os.path.exists(local)
