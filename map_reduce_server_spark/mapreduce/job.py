"""The reference's observable contract, on Spark.

Reference pipeline (``master/__main__.py:220-467``):

1. list + sort input files, deal file i to map task ``i % num_mappers``
   (``master/__main__.py:288-297``);
2. stream each file through the mapper executable, stdin→stdout
   (``worker/__main__.py:105-131``);
3. sort all mapped lines lexicographically **by whole line**
   (``worker/__main__.py:141`` + master k-way merge
   ``master/__main__.py:236-249``);
4. walk the merged stream, incrementing a dense rank whenever the
   line changes, and deal each line to reducer
   ``rank % num_reducers`` (``master/__main__.py:249-256``) — so all
   copies of a line land together and distinct lines round-robin in
   sorted order;
5. stream each reducer partition (sorted) through the reducer
   executable; copy outputs to ``outputfile{NN}``
   (``master/__main__.py:448-467``).

Spark mapping: (2)/(5) are ``RDD.pipe``; (3)+(4) are one
``repartitionAndSortWithinPartitions`` with a partitioner keyed by
the dense rank of the line — computed distributedly via
``sortBy().zipWithIndex()`` over the distinct lines (two narrow
passes; no driver-side data). Spark's scheduler/shuffle/retries
subsume the reference's entire control plane (SURVEY.md §2.C).
"""

from __future__ import annotations

import os
import shlex
import tempfile
from dataclasses import dataclass
from urllib.parse import unquote, urlparse

from pyspark.accumulators import AccumulatorParam
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from map_reduce_server_spark.io.sinks import write_numbered_text
from map_reduce_server_spark.io.tempdirs import cleanup_at_exit


class _SetAccumulator(AccumulatorParam):
    """Set-union accumulator (which file ranks the scan actually
    touched); set semantics stay correct under task retries."""

    def zero(self, value):
        return set()

    def addInPlace(self, a, b):
        a |= b
        return a

# Above this many input files, run_job switches from one-RDD-per-file
# plan construction to a single directory scan (see _mapped_lines_*).
_DIRECTORY_SCAN_THRESHOLD = 64


@dataclass(frozen=True)
class MapReduceJob:
    """Mirror of the reference's job message (``submit.py:59-67``)."""

    input_directory: str
    output_directory: str
    mapper_executable: str
    reducer_executable: str
    num_mappers: int = 4
    num_reducers: int = 2


def run_jobs(spark: SparkSession, jobs: list[MapReduceJob]) -> list[list[str]]:
    """FIFO multi-job queue parity (reference holds queued jobs and
    runs one at a time: ``master/__main__.py:209-218``, verified by
    its ``tests/test_master_04.py``). On Spark this is a sequential
    driver loop — each job's stages still run fully parallel inside
    the cluster; use Spark FAIR scheduler pools if concurrent jobs
    are ever wanted.
    """
    return [run_job(spark, job) for job in jobs]


def _list_input_files(input_dir: str) -> list[str]:
    """Sorted file list, as the reference's master builds it
    (``master/__main__.py:288-289``)."""
    return sorted(
        os.path.join(input_dir, f)
        for f in os.listdir(input_dir)
        if os.path.isfile(os.path.join(input_dir, f))
    )


def round_robin_file_assignment(
    files: list[str], num_mappers: int
) -> list[list[str]]:
    """The reference's file→map-task dealing (``master/__main__.py:
    288-297``, asserted literally by its ``tests/test_master_02.py:
    137-159``): sorted file *i* goes to task ``i % num_mappers``, so
    task *m* holds files ``m, m+num_mappers, …``. Both ingestion
    plans group files into tasks with this dealing, which also bounds
    the number of concurrent mapper processes to ``num_mappers``.
    """
    tasks: list[list[str]] = [[] for _ in range(num_mappers)]
    for i, f in enumerate(sorted(files)):
        tasks[i % num_mappers].append(f)
    return tasks


def _pipe_cmd(executable: str) -> str:
    """Quote an executable path for RDD.pipe."""
    return " ".join(shlex.quote(p) for p in shlex.split(executable))


# Filename characters Hadoop path resolution mangles: ',' splits a
# multi-path string into separate paths, and glob metacharacters are
# expanded by globStatus instead of matched literally.
_PATH_UNSAFE = set(",{}[]*?\\")


def _needs_alias(path: str) -> bool:
    # test the FULL path, not just the basename: a ',' or glob
    # metacharacter in a directory component mangles Hadoop path
    # resolution exactly the same way (',' splits the path string,
    # '[1]' glob-expands against sibling dirs)
    return os.path.basename(path).startswith(("_", ".")) or any(
        c in _PATH_UNSAFE for c in path
    )


def _stage_hidden_aliases(
    files: list[str],
) -> tuple[list[str], dict[str, str]]:
    """Hadoop input formats silently skip files whose basename starts
    with ``_`` or ``.`` — even when the file is named explicitly —
    and mis-resolve names containing ``,`` (multi-path separator) or
    glob metacharacters, while the reference processes all of them
    (its master lists with ``os.listdir``,
    ``master/__main__.py:288-289``). Re-expose each such file through
    a safely-named symlink in a job-scoped staging directory so the
    scan reads it.

    Returns ``(scan_paths, alias_resolver)`` where ``scan_paths[i]``
    is the path to scan for ``files[i]`` and ``alias_resolver`` maps
    the absolute path of every scan path (alias or original) back to
    the listed file.

    Cluster note: the staging dir comes from ``tempfile`` on the
    driver; on a multi-node cluster point ``TMPDIR`` at the shared
    filesystem that also hosts the input (symlinks are same-FS
    metadata either way). In local mode this is unconditionally fine.
    """
    alias_dir = None
    scan_paths: list[str] = []
    resolver: dict[str, str] = {}
    for rank, f in enumerate(files):
        resolver[os.path.abspath(f)] = f
        if _needs_alias(f):
            if alias_dir is None:
                alias_dir = tempfile.mkdtemp(prefix="mrs-hidden-")
                # the aliases must outlive this (lazy) job's actions;
                # interpreter-exit cleanup bounds the accumulation a
                # long-lived job queue would otherwise suffer
                cleanup_at_exit(alias_dir)
            alias = os.path.join(alias_dir, f"f{rank:08d}")
            os.symlink(os.path.abspath(f), alias)
            resolver[os.path.abspath(alias)] = f
            scan_paths.append(alias)
        else:
            scan_paths.append(f)
    return scan_paths, resolver


def group_partition(mapped, num_reducers: int):
    """The reference's group stage (``master/__main__.py:249-256``) as
    a distributed plan: dense-rank the distinct lines in global
    sorted order, send every line to partition ``rank % R``, sorted
    within partitions.

    Shuffle economics: the line multiset is first collapsed to
    (line, count) with ``reduceByKey`` — a map-side combine, so the
    shuffle carries each distinct line once, not every duplicate
    (the reference ships every line twice over TCP). Ranking then
    runs on the collapsed set (sortByKey + zipWithIndex, both
    cluster-side), and duplicates are re-expanded only AFTER the
    final partition-local sort. No driver data path anywhere, unlike
    the reference's master-side merge+partition walk.
    """
    counts = mapped.map(lambda line: (line, 1)).reduceByKey(
        lambda a, b: a + b
    )
    ranked = counts.sortByKey().zipWithIndex()  # ((line, count), rank)
    by_rank = ranked.map(
        lambda it: ((it[1] % num_reducers, it[0][0]), it[0][1])
    )
    return (
        by_rank.repartitionAndSortWithinPartitions(
            numPartitions=num_reducers, partitionFunc=lambda key: key[0]
        )
        # ((partition, line), count) sorted by line → expand duplicates
        # LAZILY: a heavy-hitter line must stream out of the iterator,
        # not materialize count references in one list
        .flatMap(lambda kv: __import__("itertools").repeat(kv[0][1], kv[1]))
    )


def _mapped_lines_per_file(
    spark: SparkSession, files: list[str], mapper: str, num_mappers: int
):
    """Map stage, small-file-count plan: one RDD (and one mapper
    subprocess) per input file, grouped into ``num_mappers`` Spark
    tasks by the reference's dealing (sorted file *i* → task
    ``i % num_mappers``, ``master/__main__.py:288-297``). Driver plan
    construction is O(files) RDD objects — fine up to ~100 files, the
    reference's own operating envelope (its tests top out at 8 files).

    A 0-byte file yields zero Hadoop splits, so ``textFile`` alone
    would never run the mapper for it — but the reference pipes every
    file (``worker/__main__.py:109-117``) and mappers may emit output
    on empty stdin (``wc -l`` prints ``0``). One explicit empty
    partition restores that contract.
    """
    sc = spark.sparkContext
    scan_paths, _ = _stage_hidden_aliases(files)
    cmd = _pipe_cmd(mapper)
    # checkCode=True: a mapper/reducer exiting non-zero fails the task
    # (and Spark's retry takes over) instead of silently truncating
    # output — the analog of the reference's task reassignment
    # (master/__main__.py:128-146) with correctness on top.
    piped = {
        f: (
            sc.parallelize([], 1)
            if os.path.getsize(p) == 0
            else sc.textFile(p, minPartitions=1).coalesce(1)
        ).pipe(cmd, checkCode=True)
        for f, p in zip(files, scan_paths)
    }
    # Narrow coalesce(1) per task group: each parent (per-file, already
    # piped) partition is computed sequentially inside one Spark task —
    # exactly a reference worker walking its file list.
    tasks = [
        sc.union([piped[f] for f in task]).coalesce(1)
        for task in round_robin_file_assignment(files, num_mappers)
        if task
    ]
    return sc.union(tasks)


def _mapped_lines_directory(
    spark: SparkSession, files: list[str], mapper: str, num_mappers: int
):
    """Map stage, large-file-count plan: ONE multi-file scan (O(1)
    driver-side RDDs regardless of file count), files dealt to
    ``num_mappers`` tasks by sorted rank mod M exactly as the
    reference's master does (``master/__main__.py:288-297``), and one
    mapper subprocess PER FILE inside each task — preserving the
    reference's per-file stdin contract (``worker/__main__.py:109-117``)
    without per-file driver plan objects.

    File ranks are authoritative from the driver's plain-path sorted
    listing, NOT from sorting the percent-encoded URIs
    ``input_file_name`` returns (whose order differs for special
    characters). URIs resolve to ranks EXECUTOR-side against a
    broadcast path→rank map (``unquote(urlparse(uri).path)``, the
    exact inverse of Spark's URI encoding) — a previous revision
    collected the distinct URIs first, which cost a full extra read
    of all input data before the real job. An unknown URI fails the
    task immediately; the converse hazard — a listed non-empty file
    the scan silently skipped — is caught by a set accumulator of
    scanned ranks, checked after the job's action completes (returned
    as a ``validate`` callable; run_job invokes it after the write).
    A sentinel row per listed file guarantees a mapper subprocess
    even for files that contributed no rows (empty files).

    Line order within a file survives the shuffle: the scan tags each
    row with ``monotonically_increasing_id`` (partition-ordinal
    encoding) and the shuffle sorts each task's rows by (file rank,
    id). Within-file ascending ids rely on Spark enumerating a file's
    splits in offset order when packing ``FilePartition``s — true for
    Spark's stable size-descending split sort (equal-size body splits
    keep offset order, the short tail split sorts after) but an
    implementation detail, not API contract; pinned by
    ``tests/test_mapreduce_facade.py::test_multi_split_file_line_order``
    so a Spark upgrade that breaks it fails visibly.
    """
    sc = spark.sparkContext
    scan_paths, resolver = _stage_hidden_aliases(files)
    df = spark.read.text(scan_paths).select(
        F.input_file_name().alias("f"),
        F.monotonically_increasing_id().alias("seq"),
        "value",
    )
    rank_of = {f: i for i, f in enumerate(files)}  # files pre-sorted
    path_rank = sc.broadcast(
        {p: rank_of[listed] for p, listed in resolver.items()}
    )
    seen_ranks = sc.accumulator(set(), _SetAccumulator())

    def keyed_partition(rows):
        # URI resolution is per-FILE work, not per-row: a task reads
        # whole file splits, so the raw URI string repeats for long
        # runs of rows. Memoize uri -> rank and report each rank to
        # the accumulator once per task, not once per line. Set
        # semantics make task-retry double-adds harmless (the only
        # accumulator guarantee inside a transformation).
        rank_cache: dict[str, int] = {}
        reported: set[int] = set()
        for r in rows:
            rank = rank_cache.get(r[0])
            if rank is None:
                path = os.path.abspath(unquote(urlparse(r[0]).path))
                rank = path_rank.value.get(path)
                if rank is None:
                    raise RuntimeError(
                        f"scanned file {path!r} is not in the input listing"
                    )
                rank_cache[r[0]] = rank
            if rank not in reported:
                seen_ranks.add({rank})
                reported.add(rank)
            yield ((rank % num_mappers, rank, r[1]), r[2])

    keyed = df.rdd.mapPartitions(keyed_partition)
    # seq=-1 sorts ahead of every data row of the same file.
    sentinels = sc.parallelize(
        [((rank % num_mappers, rank, -1), None) for rank in range(len(files))],
        max(1, min(num_mappers, len(files))),
    )
    shuffled = sc.union([sentinels, keyed]).repartitionAndSortWithinPartitions(
        numPartitions=num_mappers, partitionFunc=lambda k: k[0]
    )
    cmd = shlex.split(mapper)

    def pipe_per_file(it):
        import itertools
        import subprocess
        import tempfile

        for _rank, rows in itertools.groupby(it, key=lambda kv: kv[0][1]):
            # Spool this file's lines to local disk, then stream them
            # through one mapper subprocess (bounded memory both ways).
            with tempfile.TemporaryFile() as tf:
                for _k, value in rows:
                    if value is None:  # per-file sentinel, not data
                        continue
                    tf.write(value.encode("utf-8"))
                    tf.write(b"\n")
                tf.seek(0)
                with subprocess.Popen(
                    cmd, stdin=tf, stdout=subprocess.PIPE
                ) as proc:
                    assert proc.stdout is not None
                    for line in proc.stdout:
                        yield line.decode("utf-8").rstrip("\n")
                if proc.returncode != 0:
                    raise RuntimeError(
                        f"Pipe function `{cmd}' exited with status "
                        f"{proc.returncode}"
                    )

    expected = {rank_of[f] for f in files if os.path.getsize(f) != 0}

    def validate() -> None:
        missing = expected - set(seen_ranks.value)
        if missing:
            names = [files[r] for r in sorted(missing)]
            raise RuntimeError(
                f"input files listed but never scanned: {names!r}"
            )

    return shuffled.mapPartitions(pipe_per_file), validate


def run_job(spark: SparkSession, job: MapReduceJob) -> list[str]:
    """Execute a MapReduce job; returns the output file paths.

    Semantics parity notes:
    - per-FILE mapper granularity: the mapper executable sees exactly
      one file's lines on stdin (reference contract
      ``worker/__main__.py:109-117``);
    - grouping key is the ENTIRE line (quirk §8.2 of SURVEY.md):
      ``a\\t1`` and ``a\\t2`` are different groups;
    - reducer partition of a distinct line = dense rank in global
      sorted order mod num_reducers, and lines within a partition
      arrive sorted.

    Both plans deal files to ``num_mappers`` tasks by sorted rank mod
    M (reference ``master/__main__.py:288-297``) with one mapper
    subprocess per file. Ingestion scales with file count: up to 64
    files the plan is one RDD per file (exact per-file lineage);
    beyond that it is a single multi-file scan — O(1) driver-side
    plan objects at 100k files, where the per-file plan would
    bottleneck the driver. Hidden (``_``/``.``-prefixed) and 0-byte
    files are processed on both plans, exactly as the reference's
    ``os.listdir``-driven master does.
    """
    if job.num_mappers < 1 or job.num_reducers < 1:
        # fail at the driver with a clear message — a 0 would
        # otherwise surface as a ZeroDivisionError inside an
        # executor lambda during the group stage
        raise ValueError(
            "num_mappers and num_reducers must be >= 1, got "
            f"{job.num_mappers}/{job.num_reducers}"
        )
    files = _list_input_files(job.input_directory)
    if not files:
        raise ValueError(f"no input files in {job.input_directory}")

    validate = None
    if len(files) > _DIRECTORY_SCAN_THRESHOLD:
        mapped, validate = _mapped_lines_directory(
            spark, files, job.mapper_executable, job.num_mappers
        )
    else:
        mapped = _mapped_lines_per_file(
            spark, files, job.mapper_executable, job.num_mappers
        )

    grouped = group_partition(mapped, job.num_reducers)

    # --- reduce stage: pipe each sorted partition through the reducer.
    reduced = grouped.pipe(_pipe_cmd(job.reducer_executable), checkCode=True)

    # --- finalize: outputfileNN naming (master/__main__.py:456-463).
    # Explicit schema: toDF would need to infer from data and raises
    # on a job whose total output is empty — the reference writes
    # (empty) outputfileNN files instead.
    out_df = spark.createDataFrame(
        reduced.map(lambda line: (line,)), "value string"
    )
    # validate runs as the sink's pre_finalize hook: accumulator
    # values are final only after the job's action (the staging
    # write), and a listed non-empty file the scan silently skipped
    # must fail the job BEFORE any outputfileNN appears — complete-
    # looking but data-missing output is worse than no output.
    return write_numbered_text(
        out_df, job.output_directory, pre_finalize=validate
    )
