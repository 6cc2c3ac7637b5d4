"""Output compaction — the small-files problem.

A 1000-executor job writing a partition per task produces thousands
of small files; downstream scans then pay per-file open costs and
the namenode/object-store pays per-object metadata. The standard
cure is write → measure → rewrite at a target file size. The
measure step reads only filesystem metadata, never data — locally
via os.walk, on any Hadoop-visible filesystem (hdfs://, s3a://,
file:) via the FileSystem API, so the operator is real on DFS, not
an exception."""

from __future__ import annotations

import math
import os
import re
import shutil

from pyspark.sql import DataFrame

# Characters Hadoop's globStatus treats as pattern syntax in a READ
# path; backslash-escaping them makes the path literal. (Write paths
# are never globbed.)
_HADOOP_GLOB = re.compile(r"([{}\[\]*?\\])")


def _hadoop_glob_escape(path: str) -> str:
    """Escape ``path`` for Spark/Hadoop read-path glob resolution —
    a staging dir under ``run[1]/`` must re-read as a literal path,
    not fail (or worse, match a sibling) as a character class."""
    return _HADOOP_GLOB.sub(r"\\\1", path)


def _is_uri(path: str) -> bool:
    return "://" in path or path.startswith("file:")


def _hadoop_fs(spark, path: str):
    """(FileSystem, Path) for a URI, resolved through the session's
    Hadoop configuration — the same resolution the write itself uses,
    so measure and write cannot disagree about which FS they mean."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def _dir_bytes_local(path: str) -> int:
    """Local-filesystem staging size. os.walk on a URI (hdfs://,
    s3a://, even file:/) silently yields nothing — which would
    collapse the rewrite to ONE serialized file and no-op the
    staging cleanup — so this path handles plain local dirs only;
    URIs take the Hadoop FileSystem branch."""
    if _is_uri(path) or not os.path.isdir(path):
        raise ValueError(
            f"_dir_bytes_local: {path!r} is not a local directory"
        )
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            if not f.startswith("_") and not f.startswith("."):
                total += os.path.getsize(os.path.join(root, f))
    return total


def _dir_bytes_hadoop(spark, path: str) -> int:
    """Staging size via the Hadoop FileSystem API — a recursive file
    listing, metadata-only however large the data. Hidden files
    (``_SUCCESS``, committer leftovers) are excluded exactly as the
    local walk excludes them, so the two branches measure the same
    bytes for the same data."""
    fs, jpath = _hadoop_fs(spark, path)
    it = fs.listFiles(jpath, True)
    total = 0
    while it.hasNext():
        status = it.next()
        name = status.getPath().getName()
        if not name.startswith("_") and not name.startswith("."):
            total += status.getLen()
    return total


def write_compacted(
    df: DataFrame,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Write ``df`` as parquet with files sized ~target_file_bytes.

    Two-phase: stage the data once (parallel write, true on-disk
    size becomes known), then rewrite coalesced to
    ``ceil(total / target)`` files. Returns the ACTUAL final file
    count (the parquet writer skips empty partitions, so a
    wider-than-rows repartition yields fewer files than requested).
    On a cluster the staging write is the job's normal output and the
    rewrite is a cheap metadata-sized follow-up job.

    Destinations may be plain local paths (measured with os.walk) or
    any URI the session's Hadoop configuration can resolve —
    ``file:``, ``hdfs://``, ``s3a://`` — measured, cleaned up, and
    counted through the FileSystem API (metadata-only at any scale).
    """
    staging = path.rstrip("/") + "_staging"
    uri = _is_uri(path)
    df.write.mode("overwrite").parquet(staging)
    spark = df.sparkSession
    try:
        total = (
            _dir_bytes_hadoop(spark, staging)
            if uri
            else _dir_bytes_local(staging)
        )
        n_files = max(1, math.ceil(total / target_file_bytes))
        staged = spark.read.parquet(_hadoop_glob_escape(staging))
        # coalesce only narrows; going wider (splitting huge files)
        # needs a real repartition
        if n_files <= staged.rdd.getNumPartitions():
            staged = staged.coalesce(n_files)
        else:
            staged = staged.repartition(n_files)
        staged.write.mode("overwrite").parquet(path)
    finally:
        # any failure after staging (metachar path resolution, final
        # write error, interrupt) must not leak a full staged copy
        if uri:
            try:
                fs, jstaging = _hadoop_fs(spark, staging)
                fs.delete(jstaging, True)
            except Exception:
                pass
        else:
            shutil.rmtree(staging, ignore_errors=True)
    if uri:
        fs, jpath = _hadoop_fs(spark, path)
        return sum(
            1
            for status in fs.listStatus(jpath)
            if status.getPath().getName().startswith("part-")
        )
    return sum(1 for f in os.listdir(path) if f.startswith("part-"))
