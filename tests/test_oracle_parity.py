"""The correctness gate, run locally: every registered query with an
oracle must hash-match DuckDB at sf0.001 (fast) — the driver runs the
same comparison at sf0.01."""

from __future__ import annotations

import pytest

from map_reduce_server_spark import registry

registry.load_all()

_ORACLE_NAMES = sorted(registry.all_oracles())


@pytest.mark.parametrize("name", _ORACLE_NAMES)
def test_query_matches_oracle(spark, sf_small, name):
    from tests.oracle_utils import compare_to_oracle

    qfn = registry.all_queries()[name]
    oracle = registry.all_oracles()[name]
    df = qfn(spark, sf_small)
    ok, msg = compare_to_oracle(df, oracle, sf_small)
    assert ok, f"{name}: {msg}"


def test_every_query_runs(spark, sf_small):
    """Queries without oracles still must run and return a schema."""
    for name, fn in registry.all_queries().items():
        df = fn(spark, sf_small)
        assert df.columns, f"{name} returned no columns"


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
