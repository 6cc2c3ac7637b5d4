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

from map_reduce_server_spark.io.sinks import write_numbered_text


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


def run_job(spark: SparkSession, job: MapReduceJob) -> list[str]:
    """Execute a MapReduce job; returns the output file paths.

    Semantics parity notes:
    - per-FILE mapper granularity: each input file is one partition,
      so the mapper executable sees exactly one file's lines on stdin
      (reference contract ``worker/__main__.py:109-117``);
    - grouping key is the ENTIRE line (quirk §8.2 of SURVEY.md):
      ``a\\t1`` and ``a\\t2`` are different groups;
    - reducer partition of a distinct line = dense rank in global
      sorted order mod num_reducers, and lines within a partition
      arrive sorted.
    """
    sc = spark.sparkContext
    files = _list_input_files(job.input_directory)
    if not files:
        raise ValueError(f"no input files in {job.input_directory}")

    # --- map stage: one partition per input file, piped through the
    # mapper. minPartitions=1 per file keeps file==partition.
    per_file = [sc.textFile(f, minPartitions=1).coalesce(1) for f in files]
    # checkCode=True: a mapper/reducer exiting non-zero fails the task
    # (and Spark's retry takes over) instead of silently truncating
    # output — the analog of the reference's task reassignment
    # (master/__main__.py:128-146) with correctness on top.
    mapped = sc.union(per_file).pipe(
        _pipe_cmd(job.mapper_executable), checkCode=True
    )

    grouped = group_partition(mapped, job.num_reducers)

    # --- reduce stage: pipe each sorted partition through the reducer.
    reduced = grouped.pipe(_pipe_cmd(job.reducer_executable), checkCode=True)

    # --- finalize: outputfileNN naming (master/__main__.py:456-463).
    out_df = reduced.map(lambda line: (line,)).toDF(["value"])
    return write_numbered_text(out_df, job.output_directory)
