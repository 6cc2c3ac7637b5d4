"""Differential plan fuzzing: random filter/group/aggregate plans
rendered TWICE from one AST — once through the engine's DataFrame
API, once as DuckDB SQL — and compared with the driver's own
comparator. This is the registry's oracle gate generalized from 203
hand-written pairs to the whole (restricted) plan space: any
divergence is either an engine-portability physics (NULL rendering,
numeric type widening, rounding) that the recipes in
``functions/exact.py`` / ``functions/hashing.py`` must absorb, or a
genuine bug in how a plan was rendered.

The grammar is deliberately confined to the repo's PORTABLE subset —
exact-decimal sums for doubles (never bare float SUM), bigint-cast
integer sums (DuckDB widens SUM(BIGINT) to HUGEINT, which fetchdf
would render as float64), and no DATE outputs — so every generated
plan is one the engine's own queries are allowed to write. Leaves
draw only from lineitem columns verified NULL-free at all SFs; the
three-valued-logic plane is covered separately by the hand-written
NULL-guard tests (the fuzz here must isolate ENGINE divergence, not
re-test SQL NULL semantics).
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import Column
from pyspark.sql import functions as F

from map_reduce_server_spark.functions import exact
from map_reduce_server_spark.tables import load_table
from tests.oracle_utils import compare_to_oracle, duck_connection

SF = "/root/testdata/sf0.001"

# value envelopes measured at sf0.001 (superset-safe at other SFs:
# literals outside the data range just make emptier predicates)
NUM_COLS = {
    "l_quantity": (0.0, 55.0),
    "l_extendedprice": (800.0, 110000.0),
    "l_discount": (0.0, 0.11),
    "l_tax": (0.0, 0.09),
}
INT_COLS = {
    "l_orderkey": (0, 1600),
    "l_partkey": (0, 220),
    "l_suppkey": (0, 10),
    "l_linenumber": (1, 8),
}
STR_COLS = {"l_returnflag": ["A", "N", "R"], "l_linestatus": ["O", "F"]}
GROUP_COLS = ["l_returnflag", "l_linestatus", "l_suppkey", "l_linenumber"]
MONEY_COLS = sorted(NUM_COLS)
CMP_OPS = ["<", "<=", ">", ">=", "=", "<>"]


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF)
    yield con
    con.close()


# --- predicate AST ---------------------------------------------------------


@st.composite
def _num_leaf(draw):
    col = draw(st.sampled_from(sorted(NUM_COLS)))
    lo, hi = NUM_COLS[col]
    # 2-decimal literals: exactly the data's own quantization, and
    # repr() renders them identically for both parsers
    cents = draw(st.integers(int(lo * 100), int(hi * 100)))
    return ("num", col, draw(st.sampled_from(CMP_OPS)), cents / 100.0)


@st.composite
def _int_leaf(draw):
    col = draw(st.sampled_from(sorted(INT_COLS)))
    lo, hi = INT_COLS[col]
    return ("int", col, draw(st.sampled_from(CMP_OPS)), draw(st.integers(lo, hi)))


@st.composite
def _str_leaf(draw):
    col = draw(st.sampled_from(sorted(STR_COLS)))
    if draw(st.booleans()):
        vals = draw(
            st.lists(
                st.sampled_from(STR_COLS[col]),
                min_size=1,
                max_size=len(STR_COLS[col]),
                unique=True,
            )
        )
        return ("in", col, sorted(vals))
    return ("str", col, draw(st.sampled_from(["=", "<>"])), draw(st.sampled_from(STR_COLS[col])))


@st.composite
def _ts_leaf(draw):
    base = dt.date(1994, 12, 1)
    day = base + dt.timedelta(days=draw(st.integers(0, 2600)))
    return ("ts", draw(st.sampled_from(CMP_OPS)), day.isoformat())


_LEAF = st.one_of(_num_leaf(), _int_leaf(), _str_leaf(), _ts_leaf())

PRED = st.recursive(
    _LEAF,
    lambda kids: st.one_of(
        st.tuples(st.sampled_from(["and", "or"]), kids, kids),
        st.tuples(st.just("not"), kids),
    ),
    max_leaves=4,
)

_PY_OPS = {
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "=": lambda a, b: a == b,
    "<>": lambda a, b: a != b,
}


def pred_col(p) -> Column:
    kind = p[0]
    if kind == "and":
        return pred_col(p[1]) & pred_col(p[2])
    if kind == "or":
        return pred_col(p[1]) | pred_col(p[2])
    if kind == "not":
        return ~pred_col(p[1])
    if kind in ("num", "int"):
        _, col, op, lit = p
        return _PY_OPS[op](F.col(col), F.lit(lit))
    if kind == "str":
        _, col, op, lit = p
        return _PY_OPS[op](F.col(col), F.lit(lit))
    if kind == "in":
        return F.col(p[1]).isin(p[2])
    if kind == "ts":
        _, op, day = p
        lit = F.expr(f"TIMESTAMP_NTZ '{day} 00:00:00'")
        return _PY_OPS[op](F.col("l_shipdate"), lit)
    raise AssertionError(p)


def pred_sql(p) -> str:
    kind = p[0]
    if kind in ("and", "or"):
        return f"({pred_sql(p[1])} {kind.upper()} {pred_sql(p[2])})"
    if kind == "not":
        return f"(NOT {pred_sql(p[1])})"
    if kind == "num":
        _, col, op, lit = p
        return f"({col} {op} {lit!r})"
    if kind == "int":
        _, col, op, lit = p
        return f"({col} {op} {lit})"
    if kind == "str":
        _, col, op, lit = p
        return f"({col} {op} '{lit}')"
    if kind == "in":
        vals = ", ".join(f"'{v}'" for v in p[2])
        return f"({p[1]} IN ({vals}))"
    if kind == "ts":
        _, op, day = p
        return f"(l_shipdate {op} TIMESTAMP '{day} 00:00:00')"
    raise AssertionError(p)


# --- aggregate specs -------------------------------------------------------

_AGG_SPEC = st.one_of(
    st.just(("count_star",)),
    st.tuples(st.just("count"), st.sampled_from(GROUP_COLS + MONEY_COLS)),
    st.tuples(
        st.sampled_from(["min", "max"]),
        st.sampled_from(
            sorted(INT_COLS) + sorted(STR_COLS) + MONEY_COLS + ["l_shipdate"]
        ),
    ),
    st.tuples(st.just("sum_int"), st.sampled_from(sorted(INT_COLS))),
    st.tuples(st.just("dsum"), st.sampled_from(MONEY_COLS)),
    st.tuples(st.just("davg"), st.sampled_from(MONEY_COLS)),
    st.tuples(st.just("nuniq"), st.sampled_from(GROUP_COLS)),
)

AGGS = st.lists(_AGG_SPEC, min_size=1, max_size=4, unique=True)
KEYS = st.lists(st.sampled_from(GROUP_COLS), unique=True, max_size=2)


def agg_pair(spec, alias: str) -> tuple[Column, str]:
    kind = spec[0]
    if kind == "count_star":
        return F.count(F.lit(1)), "COUNT(*)"
    col = spec[1]
    if kind == "count":
        return F.count(col), f"COUNT({col})"
    if kind in ("min", "max"):
        return getattr(F, kind)(col), f"{kind.upper()}({col})"
    if kind == "sum_int":
        # DuckDB widens SUM(BIGINT) to HUGEINT and fetchdf would
        # render that as float64 — cast back on the oracle side
        return F.sum(col), f"CAST(SUM({col}) AS BIGINT)"
    if kind == "dsum":
        return exact.dsum(col), exact.sql_dsum(col)
    if kind == "davg":
        return exact.davg(col), exact.sql_davg(col)
    if kind == "nuniq":
        return F.countDistinct(col), f"COUNT(DISTINCT {col})"
    raise AssertionError(spec)


def _run_agg_plan(spark, duck, pred, keys, aggs):
    df = load_table(spark, SF, "lineitem").filter(pred_col(pred))
    pairs = [agg_pair(s, f"a{i}") for i, s in enumerate(aggs)]
    cols = [c.alias(f"a{i}") for i, (c, _) in enumerate(pairs)]
    out = df.groupBy(*keys).agg(*cols) if keys else df.agg(*cols)
    select = ", ".join(
        list(keys) + [f"{s} AS a{i}" for i, (_, s) in enumerate(pairs)]
    )
    sql = f"SELECT {select} FROM lineitem WHERE {pred_sql(pred)}"
    if keys:
        sql += f" GROUP BY {', '.join(keys)}"
    ok, msg = compare_to_oracle(out, sql, SF, con=duck)
    assert ok, f"{msg}\nplan: pred={pred} keys={keys} aggs={aggs}\nsql: {sql}"


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=PRED, keys=KEYS, aggs=AGGS)
# empty input, no keys: the NULL-aggregate rendering corner (Spark
# None vs duckdb NaN must canonicalize identically per dtype)
@example(
    pred=("num", "l_quantity", "<", 0.5),
    keys=[],
    aggs=[
        ("count_star",),
        ("min", "l_orderkey"),
        ("max", "l_extendedprice"),
        ("dsum", "l_discount"),
    ],
)
# full-table global aggregate over every family at once
@example(
    pred=("num", "l_quantity", ">=", 0.0),
    keys=["l_returnflag", "l_linestatus"],
    aggs=[
        ("sum_int", "l_orderkey"),
        ("davg", "l_extendedprice"),
        ("nuniq", "l_suppkey"),
        ("min", "l_shipdate"),
    ],
)
def test_fuzz_filter_group_aggregate(spark, duck, pred, keys, aggs):
    _run_agg_plan(spark, duck, pred, keys, aggs)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=PRED)
@example(pred=("not", ("in", "l_returnflag", ["A", "N", "R"])))
@example(
    pred=("or", ("ts", "<", "1995-06-01"), ("ts", ">=", "2001-06-01"))
)
def test_fuzz_filter_rowset(spark, duck, pred):
    """Row-exact predicate check: the filtered key multiset must
    match DuckDB's — catches comparison-semantics divergence that an
    aggregate could mask (two wrong rows cancelling in a SUM)."""
    df = (
        load_table(spark, SF, "lineitem")
        .filter(pred_col(pred))
        .select("l_orderkey", "l_linenumber", "l_returnflag")
    )
    sql = (
        "SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem "
        f"WHERE {pred_sql(pred)}"
    )
    ok, msg = compare_to_oracle(df, sql, SF, con=duck)
    assert ok, f"{msg}\nplan: pred={pred}\nsql: {sql}"
