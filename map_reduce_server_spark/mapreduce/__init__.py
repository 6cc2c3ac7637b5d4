"""Reference-parity MapReduce façade on Spark primitives."""

from map_reduce_server_spark.mapreduce.job import MapReduceJob, run_job, run_jobs

__all__ = ["MapReduceJob", "run_job", "run_jobs"]
