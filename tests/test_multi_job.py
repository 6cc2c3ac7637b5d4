"""FIFO multi-job queue parity (reference ``master/__main__.py:209-218``,
its ``tests/test_master_04.py``): queued jobs run in order, outputs
land in their own directories."""

from __future__ import annotations

import os

from map_reduce_server_spark.mapreduce import MapReduceJob, run_jobs

_EXAMPLES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "map_reduce_server_spark",
    "mapreduce",
    "examples",
)


def test_two_jobs_fifo(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    (d / "f1").write_text("alpha beta\nalpha gamma\n")
    out1, out2 = str(tmp_path / "o1"), str(tmp_path / "o2")
    jobs = [
        MapReduceJob(
            input_directory=str(d),
            output_directory=out1,
            mapper_executable=f"python3 {_EXAMPLES}/wc_map.py",
            reducer_executable=f"python3 {_EXAMPLES}/wc_reduce.py",
            num_mappers=1,
            num_reducers=1,
        ),
        MapReduceJob(
            input_directory=str(d),
            output_directory=out2,
            mapper_executable="cat",
            reducer_executable="cat",
            num_mappers=1,
            num_reducers=2,
        ),
    ]
    results = run_jobs(spark, jobs)
    assert len(results) == 2
    wc = dict(
        line.split("\t")
        for line in open(os.path.join(out1, "outputfile01")).read().splitlines()
    )
    assert wc == {"alpha": "2", "beta": "1", "gamma": "1"}
    assert sorted(os.listdir(out2)) == ["outputfile01", "outputfile02"]
