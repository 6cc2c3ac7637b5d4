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
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from map_reduce_server_spark.io.sinks import write_numbered_text

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
    task *m* holds files ``m, m+num_mappers, …``.

    ``run_job`` itself uses per-file partitions (finer granularity,
    same observable outputs); this helper exists for callers that
    want the reference's exact task grouping — e.g. to bound the
    number of concurrent mapper processes.
    """
    tasks: list[list[str]] = [[] for _ in range(num_mappers)]
    for i, f in enumerate(sorted(files)):
        tasks[i % num_mappers].append(f)
    return tasks


def _pipe_cmd(executable: str) -> str:
    """Quote an executable path for RDD.pipe."""
    return " ".join(shlex.quote(p) for p in shlex.split(executable))


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
        .flatMap(lambda kv: [kv[0][1]] * kv[1])
    )


def _mapped_lines_per_file(spark: SparkSession, files: list[str], mapper: str):
    """Map stage, small-file-count plan: one RDD partition per input
    file, piped through the mapper. Driver plan construction is
    O(files) RDD objects — fine up to ~100 files, the reference's own
    operating envelope (its tests top out at 8 files)."""
    sc = spark.sparkContext
    per_file = [sc.textFile(f, minPartitions=1).coalesce(1) for f in files]
    # checkCode=True: a mapper/reducer exiting non-zero fails the task
    # (and Spark's retry takes over) instead of silently truncating
    # output — the analog of the reference's task reassignment
    # (master/__main__.py:128-146) with correctness on top.
    return sc.union(per_file).pipe(_pipe_cmd(mapper), checkCode=True)


def _mapped_lines_directory(
    spark: SparkSession, input_dir: str, mapper: str, num_mappers: int
):
    """Map stage, large-file-count plan: ONE directory scan (O(1)
    driver-side RDDs regardless of file count), files dealt to
    ``num_mappers`` tasks by sorted rank mod M exactly as the
    reference's master does (``master/__main__.py:288-297``), and one
    mapper subprocess PER FILE inside each task — preserving the
    reference's per-file stdin contract (``worker/__main__.py:109-117``)
    without per-file driver plan objects.

    Line order within a file survives the shuffle: the scan tags each
    row with ``monotonically_increasing_id`` (partition-ordinal
    encoding; directory splits are enumerated per file in offset
    order, so the id is ascending within every file) and the shuffle
    sorts each task's rows by (file rank, id).
    """
    df = spark.read.text(input_dir).select(
        F.input_file_name().alias("f"),
        F.monotonically_increasing_id().alias("seq"),
        "value",
    )
    # Dense rank of each file in sorted order — a distributed job over
    # the (tiny) distinct-file set; only the rank table is broadcast.
    ranks = (
        df.select("f")
        .distinct()
        .rdd.map(lambda r: r[0])
        .sortBy(lambda p: p)
        .zipWithIndex()
        .toDF(["f", "rank"])
    )
    keyed = (
        df.join(F.broadcast(ranks), "f")
        .select("rank", "seq", "value")
        .rdd.map(lambda r: ((r[0] % num_mappers, r[0], r[1]), r[2]))
        .repartitionAndSortWithinPartitions(
            numPartitions=num_mappers, partitionFunc=lambda k: k[0]
        )
    )
    cmd = shlex.split(_pipe_cmd(mapper))

    def pipe_per_file(it):
        import itertools
        import subprocess
        import tempfile

        for _rank, rows in itertools.groupby(it, key=lambda kv: kv[0][1]):
            # Spool this file's lines to local disk, then stream them
            # through one mapper subprocess (bounded memory both ways).
            with tempfile.TemporaryFile() as tf:
                for _k, value in rows:
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

    return keyed.mapPartitions(pipe_per_file)


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

    Ingestion scales with file count: up to 64 files the plan is one
    partition per file (exact task granularity); beyond that it is a
    single directory scan with per-file subprocess granularity inside
    ``num_mappers`` tasks — O(1) driver-side plan objects at 100k
    files, where the per-file plan would bottleneck the driver.
    """
    files = _list_input_files(job.input_directory)
    if not files:
        raise ValueError(f"no input files in {job.input_directory}")

    if len(files) > _DIRECTORY_SCAN_THRESHOLD:
        mapped = _mapped_lines_directory(
            spark, job.input_directory, job.mapper_executable, job.num_mappers
        )
    else:
        mapped = _mapped_lines_per_file(
            spark, files, job.mapper_executable
        )

    grouped = group_partition(mapped, job.num_reducers)

    # --- reduce stage: pipe each sorted partition through the reducer.
    reduced = grouped.pipe(_pipe_cmd(job.reducer_executable), checkCode=True)

    # --- finalize: outputfileNN naming (master/__main__.py:456-463).
    out_df = reduced.map(lambda line: (line,)).toDF(["value"])
    return write_numbered_text(out_df, job.output_directory)
