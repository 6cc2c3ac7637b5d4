"""The AQE skew-split demonstration behind the staged
q_skew_join_hint: under lowered skew thresholds the executed
adaptive plan must actually split the hot partition (skew=true), and
the split must be result-invisible.

Runs in a derived session (``spark.newSession()``: same JVM, own
SQLConf) so the lowered thresholds never leak into the shared
fixture session. The thresholds are what a 100 TB cluster's
defaults (256 MB / factor 5) are to its partition sizes — scaled to
sf0.1's; the PLAN SHAPE is identical.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_server_spark.operators.udf import q_skew_join_hint

SF = "/root/testdata/sf0.1"

_SKEW_CONF = {
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
}


def _executed_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_skew_split_fires_and_is_result_invisible(spark):
    s = spark.newSession()
    for k, v in _SKEW_CONF.items():
        s.conf.set(k, v)
    df = q_skew_join_hint(s, SF)
    plan = _executed_plan(df)
    assert "skew=true" in plan, plan[:2000]
    assert "SortMergeJoin" in plan
    # result-invisibility: identical rows under default thresholds
    # in the untouched fixture session
    base = {
        (r.p_brand, r.n_items, r.revenue)
        for r in q_skew_join_hint(spark, SF).collect()
    }
    split = {(r.p_brand, r.n_items, r.revenue) for r in df.collect()}
    assert split == base


def test_skew_fact_is_actually_skewed(spark):
    """The crafted key must put a strong majority of rows on the hot
    value — otherwise the demonstration demonstrates nothing."""
    from map_reduce_server_spark.tables import load_table

    li = load_table(spark, SF, "lineitem")
    k = F.when(
        F.col("l_orderkey") % 3 == 0, F.col("l_partkey") % 50 + 1
    ).otherwise(1)
    counts = (
        li.select(k.alias("k")).groupBy("k").count().orderBy(F.desc("count"))
    )
    rows = counts.collect()
    total = sum(r["count"] for r in rows)
    assert rows[0]["k"] == 1
    assert rows[0]["count"] > 0.6 * total
