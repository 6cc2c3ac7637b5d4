"""Output compaction — the small-files problem.

A 1000-executor job writing a partition per task produces thousands
of small files; downstream scans then pay per-file open costs and
the namenode/object-store pays per-object metadata. The standard
cure is write → measure → rewrite at a target file size. The
measure step reads only filesystem metadata, never data — locally
via os.walk, on any Hadoop-visible filesystem (hdfs://, s3a://,
file:) via the FileSystem API. Which branch runs is decided by
HADOOP'S OWN path resolution (scheme in the path, else
fs.defaultFS), never by string-sniffing: a scheme-less path on a
cluster whose defaultFS is HDFS stages to HDFS, so it must be
measured and cleaned up there too."""

from __future__ import annotations

import contextlib
import math
import os
import re
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Characters Hadoop's globStatus treats as pattern syntax in a READ
# path; backslash-escaping them makes the path literal. (Write paths
# are never globbed.)
_HADOOP_GLOB = re.compile(r"([{}\[\]*?\\])")


def _hadoop_glob_escape(path: str) -> str:
    """Escape ``path`` for Spark/Hadoop read-path glob resolution —
    a staging dir under ``run[1]/`` must re-read as a literal path,
    not fail (or worse, match a sibling) as a character class."""
    return _HADOOP_GLOB.sub(r"\\\1", path)


def _hadoop_fs(spark, path: str):
    """(FileSystem, Path) for ``path``, resolved through the
    session's Hadoop configuration — the same resolution the write
    itself uses (explicit scheme wins, else fs.defaultFS), so
    measure/cleanup and the write cannot disagree about which
    filesystem they mean."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def _dir_bytes_local(path: str) -> int:
    """Local-filesystem staging size: a recursive walk summing data
    files, hidden committer markers (``_SUCCESS``, ``.*.crc``)
    excluded."""
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            if not f.startswith("_") and not f.startswith("."):
                total += os.path.getsize(os.path.join(root, f))
    return total


def _dir_bytes_hadoop(fs, jpath) -> int:
    """Staging size via ``FileSystem.getContentSummary`` — ONE
    metadata RPC however many files were staged (a per-file listing
    loop from the driver would cost thousands of Py4J+namenode round
    trips for exactly the many-small-files case this module exists
    to fix). The summary counts committer markers too; on a real DFS
    those are zero bytes (``_SUCCESS``), and on checksummed local
    filesystems the ``.crc`` side files add <1% — noise against a
    128 MB file-size target."""
    return fs.getContentSummary(jpath).getLength()


@contextlib.contextmanager
def _staged_copy(df: DataFrame, path: str):
    """Stage ``df`` as parquet at ``<path>_staging``; yield
    ``(staged_df, total_bytes, use_local)`` and own the staging
    lifecycle — the measure branch, and removal of the staged copy
    on EVERY exit (mid-staging task failure, metachar path
    resolution, final-write error, interrupt). The caller's final
    write must happen inside the with-block, while the staged files
    still exist. ONE definition shared by both compactors: the
    use_local heuristic and cleanup semantics are subtle enough that
    two hand-synced copies would drift."""
    spark = df.sparkSession
    staging = path.rstrip("/") + "_staging"
    fs, jstaging = _hadoop_fs(spark, staging)
    # Local fast path ONLY for a scheme-less path that Hadoop itself
    # resolves to the local filesystem; any explicit scheme (even
    # file:) exercises the FileSystem branch end to end.
    use_local = "://" not in staging and not staging.startswith(
        "file:"
    ) and fs.getScheme() == "file"
    try:
        df.write.mode("overwrite").parquet(staging)
        total = (
            _dir_bytes_local(staging)
            if use_local
            else _dir_bytes_hadoop(fs, jstaging)
        )
        yield spark.read.parquet(_hadoop_glob_escape(staging)), total, use_local
    finally:
        if use_local:
            shutil.rmtree(staging, ignore_errors=True)
        else:
            try:
                fs.delete(jstaging, True)
            except Exception:
                pass


def _count_part_files(spark, path: str, use_local: bool) -> int:
    """Count final ``part-*`` data files (recursively — covers both
    flat and hive-partitioned layouts). Runs over the COMPACTED file
    set, which the target size keeps small; listStatus/listFiles are
    literal (no glob interpretation), so metachar destinations count
    correctly."""
    if use_local:
        return sum(
            1
            for _, _, files in os.walk(path)
            for f in files
            if f.startswith("part-")
        )
    fs, jpath = _hadoop_fs(spark, path)
    it = fs.listFiles(jpath, True)
    count = 0
    while it.hasNext():
        if it.next().getPath().getName().startswith("part-"):
            count += 1
    return count


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

    Destinations may be plain local paths, or URIs/defaultFS-relative
    paths on any filesystem the session's Hadoop configuration can
    resolve (``file:``, ``hdfs://``, ``s3a://``) — measured, cleaned
    up, and counted through the FileSystem API, metadata-only at any
    data size. The filesystem is resolved BEFORE the staging write,
    and the staging write runs inside the cleanup scope: a failure
    at ANY point after staging starts (mid-write task failure,
    interrupt, final-write error) still removes the staged copy.
    """
    with _staged_copy(df, path) as (staged, total, use_local):
        n_files = max(1, math.ceil(total / target_file_bytes))
        # coalesce only narrows; going wider (splitting huge files)
        # needs a real repartition
        if n_files <= staged.rdd.getNumPartitions():
            staged = staged.coalesce(n_files)
        else:
            staged = staged.repartition(n_files)
        staged.write.mode("overwrite").parquet(path)
    return _count_part_files(df.sparkSession, path, use_local)


def _contains_map(dt) -> bool:
    """True if ``dt`` contains a MapType anywhere (Spark's ``hash``
    rejects maps recursively — existsRecursively — so a top-level
    isinstance check is not enough)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dt, MapType):
        return True
    if isinstance(dt, ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def write_compacted_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Hive-partitioned compaction: write ``df`` partitioned by
    ``partition_cols`` with data files sized ~target_file_bytes
    WITHIN each partition directory.

    :func:`write_compacted`'s global ``ceil(total/target)`` count is
    wrong for a partitioned layout — a global repartition scatters
    every hive partition's rows across every output task, writing up
    to ``n_tasks`` small files per directory. Instead: stage once
    (true on-disk size and row count become known), derive the
    on-disk bytes-per-row, convert the byte target to a row target,
    then rewrite shuffled on (partition columns, bounded salt) with
    ``maxRecordsPerFile`` rolling files at the row target. The salt
    is ``hash(input partition id, row) % ceil(partition_rows /
    row_target)`` via a NULL-SAFE broadcast join of per-partition
    counts (one row per hive partition — bounded; NULL partition
    keys group, join, and land in ``__HIVE_DEFAULT_PARTITION__``
    like any other value), so a SKEWED partition spreads over as
    many shuffle keys as it needs files — a 10 TB partition gets
    ~80k distinct salt values, so no single task is forced to write
    it alone. The salt provides the CAPACITY; the realized write
    parallelism is whatever AQE / ``spark.sql.shuffle.partitions``
    sizes the rewrite stage to (see ``docs/SCALING.md``) — a small
    partition meanwhile keeps
    salt 0 everywhere and still compacts to a single file. The
    input-partition-id term bounds the degenerate all-identical-rows
    partition (pure row hashes would collapse to one salt) to one
    scan split per salt while staying deterministic under stage
    replay; columns containing maps (at any nesting) are excluded
    from the salt hash — Spark's ``hash`` rejects them recursively.

    Sizing tolerance, deliberate: bytes-per-row is measured on the
    staged files, which still CONTAIN the partition columns (the
    final files move them into directory names) — so the row target
    errs small, keeping files under target. Post-shuffle row order
    can also change compression in either direction; like every
    estimate-based compactor, the target is approximate, not a
    guarantee.

    Returns the total final data-file count.
    """
    from map_reduce_server_spark.stagecut import stage_cut

    # Spark resolves column names case-insensitively by default, so
    # the collision guard must too (a user '__MRSS_SALT' would
    # otherwise be silently replaced and then dropped).
    reserved = {"__mrss_n", "__mrss_splits", "__mrss_salt"} | {
        f"__mrss_k_{c}".lower() for c in partition_cols
    }
    if reserved & {c.lower() for c in df.columns}:
        raise ValueError(
            "write_compacted_partitioned: input columns collide with "
            f"reserved names {sorted(reserved)}"
        )
    if any("." in c or "`" in c for c in partition_cols):
        # partition column names flow through groupBy/alias string
        # resolution, where dots parse as struct access — reject
        # loudly instead of mis-resolving after the staging write
        raise ValueError(
            "write_compacted_partitioned: partition column names may "
            "not contain '.' or '`'"
        )
    spark = df.sparkSession
    with _staged_copy(df, path) as (staged, total, use_local):
        # ONE pass over staging: the per-partition counts table is
        # tiny (a row per hive partition) and stage-cut so the total
        # below and the broadcast join both reuse it instead of
        # re-scanning the staged files.
        counts = stage_cut(
            staged.groupBy(*partition_cols).agg(
                F.count("*").alias("__mrss_n")
            )
        )
        # ONE bounded driver scalar (the sum of a stage-cut
        # per-partition count table — never row data): the byte
        # target must become a maxRecordsPerFile DRIVER value, so
        # some scalar action is inherent to the operator.
        n_rows = (
            counts.agg(F.sum("__mrss_n").alias("n")).first()["n"] or 0
        )
        bytes_per_row = max(1.0, total / n_rows) if n_rows else 1.0
        rows_per_file = max(1, int(target_file_bytes / bytes_per_row))
        splits = counts.select(
            *[
                F.col(c).alias(f"__mrss_k_{c}")
                for c in partition_cols
            ],
            F.ceil(F.col("__mrss_n") / rows_per_file).alias(
                "__mrss_splits"
            ),
        )
        # NULL = NULL is NULL under a plain equi join — NULL-keyed
        # rows would silently vanish; eqNullSafe keeps them
        cond = None
        for c in partition_cols:
            term = staged[c].eqNullSafe(F.col(f"__mrss_k_{c}"))
            cond = term if cond is None else cond & term
        # Salt diversity comes from hashable columns (Spark's hash
        # rejects MapType anywhere in a type, recursively — skip
        # those columns; bracket access resolves dotted names
        # literally) plus the input partition id, which alone bounds
        # the worst case to one scan split per salt.
        hashable = [
            staged[f.name]
            for f in staged.schema.fields
            if not _contains_map(f.dataType)
        ]
        joined = staged.join(F.broadcast(splits), cond).withColumn(
            "__mrss_salt",
            F.pmod(
                F.hash(F.spark_partition_id(), *hashable),
                F.col("__mrss_splits"),
            ),
        )
        salted = joined.repartition(
            *[joined[c] for c in partition_cols], joined["__mrss_salt"]
        ).drop(
            "__mrss_splits",
            "__mrss_salt",
            *[f"__mrss_k_{c}" for c in partition_cols],
        )
        (
            salted.write.mode("overwrite")
            .option("maxRecordsPerFile", rows_per_file)
            .partitionBy(*partition_cols)
            .parquet(path)
        )
    return _count_part_files(spark, path, use_local)
