"""Output compaction — the small-files problem.

A 1000-executor job writing a partition per task produces thousands
of small files; downstream scans then pay per-file open costs and
the namenode/object-store pays per-object metadata. The standard
cure is write → measure → rewrite at a target file size. The
measure step reads only filesystem metadata, never data."""

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


def _dir_bytes(path: str) -> int:
    """Local-filesystem staging size. os.walk on a URI (hdfs://,
    s3a://, even file:/) silently yields nothing — which would
    collapse the rewrite to ONE serialized file and no-op the
    staging cleanup — so refuse anything that is not a local dir;
    cluster deployments measure via the Hadoop FileSystem API
    instead (docstring of write_compacted).
    """
    if "://" in path or path.startswith("file:") or not os.path.isdir(path):
        raise ValueError(
            f"write_compacted measures staging size locally; {path!r} "
            "is not a local directory (use the Hadoop FS API on a cluster)"
        )
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            if not f.startswith("_") and not f.startswith("."):
                total += os.path.getsize(os.path.join(root, f))
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
    """
    staging = path.rstrip("/") + "_staging"
    # refuse non-local destinations BEFORE the expensive staging
    # write: _dir_bytes would reject them anyway, but only after the
    # full dataset had been staged (and a URI staging path could not
    # even be cleaned up by shutil)
    if "://" in path or path.startswith("file:"):
        raise ValueError(
            f"write_compacted measures staging size locally; {path!r} "
            "is not a local directory (use the Hadoop FS API on a cluster)"
        )
    df.write.mode("overwrite").parquet(staging)
    try:
        total = _dir_bytes(staging)
        n_files = max(1, math.ceil(total / target_file_bytes))
        spark = df.sparkSession
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
        shutil.rmtree(staging, ignore_errors=True)
    return sum(
        1 for f in os.listdir(path) if f.startswith("part-")
    )
