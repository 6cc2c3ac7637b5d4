"""The stage-cut policy: localCheckpoint by default, reliable
checkpoint when the cluster conf asks for it (ADVICE round 7:
executor-local cut blocks are unrecoverable on executor loss, so
long pipelines on real clusters need the switch)."""

from __future__ import annotations

import tempfile

import pytest

from map_reduce_server_spark.stagecut import RELIABLE_CONF, stage_cut


def _plan(df) -> str:
    return df._jdf.queryExecution().toString()


def test_default_is_local_checkpoint(spark):
    df = spark.range(100).transform(stage_cut)
    assert df.count() == 100
    # lineage severed: the plan is a checkpoint scan, not a Range
    assert "Range" not in _plan(df)


def test_reliable_mode_uses_reliable_checkpoint(spark):
    with tempfile.TemporaryDirectory() as d:
        spark.sparkContext.setCheckpointDir(d)
        spark.conf.set(RELIABLE_CONF, "true")
        try:
            df = spark.range(50).transform(stage_cut)
            assert df.count() == 50
            assert "Range" not in _plan(df)
            # a reliable checkpoint writes RDD blocks under the dir
            import os

            files = [
                os.path.join(r, f)
                for r, _, fs in os.walk(d)
                for f in fs
            ]
            assert files, "reliable checkpoint wrote nothing"
        finally:
            spark.conf.set(RELIABLE_CONF, "false")


def test_reliable_mode_without_dir_fails_loudly(spark):
    # a fresh context normally has no checkpoint dir; simulate the
    # misconfiguration contract: conf on + no dir => loud error, not
    # a silent fallback to non-replicated local blocks. (The session
    # is shared across tests, so only assert when no dir is set.)
    if spark.sparkContext._jsc.sc().getCheckpointDir().isEmpty():
        spark.conf.set(RELIABLE_CONF, "true")
        try:
            with pytest.raises(Exception):
                spark.range(10).transform(stage_cut).count()
        finally:
            spark.conf.set(RELIABLE_CONF, "false")
