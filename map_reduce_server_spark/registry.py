"""Central query registry feeding ``__spark_entry__.py``.

Every operator the engine implements registers a named query
(``(spark, sf_dir) -> DataFrame``) and, when SQL-expressible, a
DuckDB oracle SQL twin. This replaces the reference's golden-file
test corpus (reference ``tests/testdata/correct/*``) with an
executable oracle, per SURVEY.md §5.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}
# Queries worth timing at sf0.1 (bench.py headline set).
BENCH_QUERIES: list[str] = []


def register(
    name: str,
    oracle: str | None = None,
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a named query, its oracle SQL, bench flag."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = " ".join(oracle.split())
        if bench:
            BENCH_QUERIES.append(name)
        return fn

    return deco


_LOADED = False


def load_all() -> None:
    """Import every operator module so registrations run."""
    global _LOADED
    if _LOADED:
        return
    # Imports are for registration side effects only.
    from map_reduce_server_spark.operators import (  # noqa: F401
        advanced,
        clustering,
        dedup,
        multimodal,
        relational,
        similarity,
        subqueries,
        text,
        udf,
    )
    from map_reduce_server_spark.mapreduce import queries  # noqa: F401
    from map_reduce_server_spark.streaming import events  # noqa: F401

    _LOADED = True


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    load_all()
    return dict(ORACLE)


def bench_query_names() -> list[str]:
    load_all()
    return list(BENCH_QUERIES)
