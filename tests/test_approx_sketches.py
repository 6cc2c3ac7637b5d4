"""Bounded-error verification of the approximate sketches.

``q_approx_sketches`` itself returns boolean bound checks (so the
driver's hash gate verifies them); these tests additionally assert
the numeric bounds directly, so a bound-flag bug cannot hide behind
an always-true column.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_server_spark.operators.advanced import q_approx_sketches
from map_reduce_server_spark.tables import load_table


def test_sketch_bound_flags_true(spark, sf_small):
    rows = q_approx_sketches(spark, sf_small).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.cd_within_3rsd, r
        assert r.median_within_rank_bound, r


def test_approx_count_distinct_numeric_bound(spark, sf_small):
    li = load_table(spark, sf_small, "lineitem")
    row = li.agg(
        F.count_distinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) <= 3 * 0.01 * row.exact, row


def test_percentile_approx_numeric_bound(spark, sf_small):
    li = load_table(spark, sf_small, "lineitem")
    row = li.agg(
        F.percentile_approx(
            "l_extendedprice", F.lit(0.5), F.lit(10000)
        ).alias("approx"),
        F.expr("percentile(l_extendedprice, 0.499)").alias("lo"),
        F.expr("percentile(l_extendedprice, 0.501)").alias("hi"),
    ).collect()[0]
    assert row.lo <= row.approx <= row.hi, row
