"""The engine's reproducibility contract: exact decimal aggregation
must produce bit-identical doubles under ANY partitioning — the
property that makes results stable from 1 core to 1000 executors and
comparable against external oracles."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from map_reduce_server_spark.functions.exact import dsum
from map_reduce_server_spark.tables import load_table


@pytest.mark.parametrize("n_parts", [1, 3, 17])
def test_dsum_partition_invariant(spark, sf_small, n_parts):
    li = load_table(spark, sf_small, "lineitem").select("l_extendedprice")
    base = li.coalesce(1).agg(dsum("l_extendedprice").alias("s")).first().s
    shuffled = (
        li.repartition(n_parts)
        .agg(dsum("l_extendedprice").alias("s"))
        .first()
        .s
    )
    assert base == shuffled  # exact equality, not approx


def test_plain_double_sum_is_not(spark, sf_small):
    """Documenting WHY dsum exists: the float sum over different
    partitionings is allowed to differ in the last ulps (if it ever
    stops differing, this test still holds — it only asserts dsum's
    equality, plain sum is merely observed)."""
    li = load_table(spark, sf_small, "lineitem").select("l_extendedprice")
    a = li.coalesce(1).agg(F.sum("l_extendedprice").alias("s")).first().s
    b = li.repartition(13).agg(F.sum("l_extendedprice").alias("s")).first().s
    # plain sums are *approximately* equal; dsum is exactly equal
    assert abs(a - b) < 1e-3


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    values=st.lists(
        st.floats(
            min_value=-1e6,
            max_value=1e6,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=50,
    ),
    n_parts=st.integers(min_value=1, max_value=8),
)
def test_dsum_matches_python_decimal(spark, values, n_parts):
    from decimal import ROUND_HALF_UP, Decimal

    df = spark.createDataFrame([(v,) for v in values], ["v"]).repartition(
        n_parts
    )
    got = df.agg(dsum("v").alias("s")).first().s
    # Spark casts double→decimal via the SHORTEST decimal
    # representation (java BigDecimal.valueOf), then HALF_UP — so the
    # reference must start from repr(v), not Decimal(v): Decimal(v)
    # quantizes the exact binary expansion, which loses ties like
    # 2.675 (binary 2.67499...) to 2.67 where Spark and DuckDB both
    # give 2.68.
    expected = float(
        sum(
            Decimal(repr(v)).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
            for v in values
        )
    )
    assert got == pytest.approx(expected, abs=0)  # exact


def test_dsum_fails_loud_on_uncastable(spark):
    """The input-envelope contract: NaN, infinities, and decimal
    overflow RAISE (matching the DuckDB twin's cast error) instead of
    silently casting to NULL and vanishing from the sum under the
    non-ANSI session; genuinely NULL inputs stay skipped by SUM, and
    davg's numerator/denominator therefore agree on the row set."""
    import math

    import pytest as pt
    from pyspark.errors import SparkRuntimeException

    from map_reduce_server_spark.functions.exact import davg

    for bad in (math.nan, math.inf, -math.inf, 1e29):
        df = spark.createDataFrame([(1.5,), (bad,), (2.5,)], ["v"])
        with pt.raises(SparkRuntimeException, match="not representable"):
            df.agg(dsum("v").alias("s")).first()
    # NULLs are data, not garbage: both engines' SUM/COUNT skip them
    df = spark.createDataFrame([(1.5,), (None,), (2.5,)], ["v"])
    row = df.agg(dsum("v").alias("s"), davg("v").alias("a")).first()
    assert row.s == 4.0 and row.a == 2.0


def test_q40_matches_python_floor_reference(spark):
    """qsum40/qmean40 equal a pure-Python floor(v*2^40) reference
    bit-for-bit, including the k/2^13 decimal-cast-midpoint values
    that broke the old decimal bridge, and NULLs are skipped by both
    the sum and qmean40's denominator."""
    import math

    from map_reduce_server_spark.functions.exact import qmean40, qsum40

    vals = [
        0.1983642578125,      # 1625/8192 — exact scale-12 midpoint
        0.0010986328125,
        -0.1983642578125,
        0.3333333333333333,
        1.0,
        -1e-12,
        None,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    row = df.agg(qsum40(F.col("v")).alias("s"),
                 qmean40(F.col("v")).alias("m")).first()
    q = 2.0**40
    ints = [math.floor(v * q) for v in vals if v is not None]
    assert row.s == sum(ints) / q
    assert row.m == (sum(ints) / len(ints)) / q  # COUNT(v), not COUNT(*)


def test_q40_twin_parity_with_duckdb(spark):
    """The SQL twins replay qsum40/qmean40 bit-for-bit in DuckDB on
    midpoint-laden input."""
    import duckdb

    from map_reduce_server_spark.functions.exact import (
        qmean40,
        qsum40,
        sql_qmean40,
        sql_qsum40,
    )

    vals = [k / 8192.0 for k in range(-20, 21)] + [0.1983642578125, None]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    srow = df.agg(qsum40(F.col("v")).alias("s"),
                  qmean40(F.col("v")).alias("m")).first()
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    orow = con.execute(
        f"SELECT {sql_qsum40('v')} AS s, {sql_qmean40('v')} AS m FROM t"
    ).fetchone()
    con.close()
    assert repr(srow.s) == repr(orow[0])
    assert repr(srow.m) == repr(orow[1])


def test_q40_fails_loud_on_out_of_envelope(spark):
    """NaN, Inf, and |v| >= 2^23 must raise (bigint-wrap guard), not
    silently vanish from the sum; NULL passes through."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    from map_reduce_server_spark.functions.exact import qsum40

    for bad in (float("nan"), float("inf"), -float("inf"), 2.0**23):
        df = spark.createDataFrame([(1.0,), (bad,)], "v double")
        with pytest.raises((SparkRuntimeException, Py4JJavaError)):
            df.agg(qsum40(F.col("v")).alias("s")).first()
