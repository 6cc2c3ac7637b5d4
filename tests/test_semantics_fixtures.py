"""Hand-computed fixtures for the sequence/interval/changelog
operators: tiny inputs where the correct answer is verifiable by
inspection, complementing the corpus-level DuckDB oracles (the
reference's golden-file strategy, SURVEY.md §5, applied to the
extension surface)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from map_reduce_server_spark import registry

registry.load_all()


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_funnel_stage_logic(spark):
    """Stages must be ordered subsequences: a purchase BEFORE the
    signup chain must not count."""
    rows = [
        # user 1: full ordered funnel s->c->v->p with noise
        (1, _ts(1), 1, "signup"), (2, _ts(2), 1, "error"),
        (3, _ts(3), 1, "click"), (4, _ts(4), 1, "view"),
        (5, _ts(5), 1, "purchase"),
        # user 2: purchase first, then signup+click only -> stage 2
        (6, _ts(1), 2, "purchase"), (7, _ts(2), 2, "signup"),
        (8, _ts(3), 2, "click"),
        # user 3: no signup at all -> stage 0
        (9, _ts(1), 3, "click"), (10, _ts(2), 3, "view"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"]
    )
    df = df.withColumn("value", F.lit(1.0)).withColumn(
        "props", F.lit("{}")
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
        got = {
            r.stage_reached: r.n_users
            for r in registry.QUERIES["q_funnel"](spark, d).collect()
        }
    assert got == {4: 1, 2: 1, 0: 1}


def test_scd2_intervals(spark, sf_small):
    """Adjacent versions must tile each customer's history: every
    valid_to equals the next valid_from, exactly one current row per
    customer, and same-timestamp orders version by orderkey."""
    df = registry.QUERIES["q_scd2_customer_orders"](spark, sf_small)
    rows = df.collect()
    by_cust: dict[int, list] = {}
    for r in rows:
        by_cust.setdefault(r.o_custkey, []).append(r)
    for cust, vs in by_cust.items():
        vs.sort(key=lambda r: (r.valid_from, r.o_orderkey))
        currents = [r for r in vs if r.is_current]
        assert len(currents) == 1, cust
        assert vs[-1].is_current and vs[-1].valid_to is None
        for prev, nxt in zip(vs, vs[1:]):
            assert prev.valid_to == nxt.valid_from, cust


def test_cdc_apply_latest_op_wins(spark, sf_small):
    """Replay the synthesized changelog in plain Python and compare
    survivor sets + last payloads with the operator."""
    from map_reduce_server_spark.tables import load_table

    orders = load_table(spark, sf_small, "orders").collect()
    latest: dict[int, tuple] = {}
    n_ops: dict[int, int] = {}
    for o in orders:
        n_ops[o.o_custkey] = n_ops.get(o.o_custkey, 0) + 1
        key = (o.o_orderdate, o.o_orderkey)
        if o.o_custkey not in latest or key > latest[o.o_custkey][0]:
            op = "D" if o.o_orderkey % 19 == 0 else "U"
            latest[o.o_custkey] = (key, op, o.o_totalprice)
    expected = {
        ck: (v[2], n_ops[ck])
        for ck, v in latest.items()
        if v[1] != "D"
    }
    got = {
        r.c_custkey: (r.last_price, r.n_ops)
        for r in registry.QUERIES["q_cdc_apply"](spark, sf_small).collect()
    }
    assert got == expected
