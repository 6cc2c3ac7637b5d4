"""Three-valued-logic differential fuzz: random predicates over a
NULLABLE synthetic table, evaluated as a Spark filter and as a
DuckDB WHERE clause over the SAME parquet file. The main plan fuzz
(test_differential_fuzz.py) deliberately draws only from NULL-free
columns to isolate engine divergence from SQL NULL semantics; this
file covers the excluded plane — AND/OR/NOT Kleene logic, IS [NOT]
NULL, and null-safe equality (Spark ``<=>`` vs DuckDB ``IS NOT
DISTINCT FROM``) — where WHERE keeps only TRUE (never UNKNOWN) on
both engines.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import Column
from pyspark.sql import functions as F


def _rows():
    """Deterministic nullable grid: every (i, s, d) null-pattern and
    value combination the leaves can distinguish appears."""
    ivals = [None, 0, 1, 2, 5]
    svals = [None, "", "a", "b"]
    dvals = [None, -1.5, 0.0, 2.5]
    rows = []
    rid = 0
    for i in ivals:
        for s in svals:
            for d in dvals:
                rows.append((rid, i, s, d))
                rid += 1
    return rows


@pytest.fixture(scope="module")
def null_table(spark, tmp_path_factory):
    """(spark DataFrame, duckdb connection with view `t`) over ONE
    shared parquet file."""
    import duckdb

    path = str(tmp_path_factory.mktemp("nullfuzz") / "t.parquet")
    spark.createDataFrame(
        _rows(), "id long, i long, s string, d double"
    ).coalesce(1).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW t AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    yield df, con
    con.close()


_COLS = {"i": [0, 1, 2, 5], "s": ["", "a", "b"], "d": [-1.5, 0.0, 2.5]}
_OPS = ["<", "<=", ">", ">=", "=", "<>"]


@st.composite
def _leaf(draw):
    col = draw(st.sampled_from(sorted(_COLS)))
    kind = draw(st.sampled_from(["cmp", "isnull", "notnull", "eqns", "in"]))
    if kind == "cmp":
        return ("cmp", col, draw(st.sampled_from(_OPS)), draw(st.sampled_from(_COLS[col])))
    if kind == "in":
        vals = draw(
            st.lists(st.sampled_from(_COLS[col]), min_size=1, max_size=3, unique=True)
        )
        return ("in", col, sorted(vals, key=str))
    if kind == "eqns":
        # null-safe equality against a value OR against NULL itself
        lit = draw(st.sampled_from(_COLS[col] + [None]))
        return ("eqns", col, lit)
    return (kind, col)


_PRED = st.recursive(
    _leaf(),
    lambda kids: st.one_of(
        st.tuples(st.sampled_from(["and", "or"]), kids, kids),
        st.tuples(st.just("not"), kids),
    ),
    max_leaves=5,
)

_PY_OPS = {
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "=": lambda a, b: a == b,
    "<>": lambda a, b: a != b,
}


def _col(p) -> Column:
    k = p[0]
    if k == "and":
        return _col(p[1]) & _col(p[2])
    if k == "or":
        return _col(p[1]) | _col(p[2])
    if k == "not":
        return ~_col(p[1])
    if k == "cmp":
        return _PY_OPS[p[2]](F.col(p[1]), F.lit(p[3]))
    if k == "in":
        return F.col(p[1]).isin(p[2])
    if k == "eqns":
        return F.col(p[1]).eqNullSafe(F.lit(p[2]))
    if k == "isnull":
        return F.col(p[1]).isNull()
    if k == "notnull":
        return F.col(p[1]).isNotNull()
    raise AssertionError(p)


def _lit_sql(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return f"'{v}'"
    return repr(v)


def _sql(p) -> str:
    k = p[0]
    if k in ("and", "or"):
        return f"({_sql(p[1])} {k.upper()} {_sql(p[2])})"
    if k == "not":
        return f"(NOT {_sql(p[1])})"
    if k == "cmp":
        return f"({p[1]} {p[2]} {_lit_sql(p[3])})"
    if k == "in":
        return f"({p[1]} IN ({', '.join(_lit_sql(v) for v in p[2])}))"
    if k == "eqns":
        return f"({p[1]} IS NOT DISTINCT FROM {_lit_sql(p[2])})"
    if k == "isnull":
        return f"({p[1]} IS NULL)"
    if k == "notnull":
        return f"({p[1]} IS NOT NULL)"
    raise AssertionError(p)


@settings(
    max_examples=40,
    deadline=None,
    print_blob=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=_PRED)
# UNKNOWN under NOT stays UNKNOWN: NOT(i < 1) over a NULL i must
# keep the row OUT on both engines
@example(pred=("not", ("cmp", "i", "<", 1)))
# null-safe equality against NULL selects exactly the NULL rows
@example(pred=("eqns", "d", None))
# Kleene OR: (TRUE OR UNKNOWN) = TRUE rescues NULL-i rows
@example(pred=("or", ("isnull", "i"), ("cmp", "i", ">", 99)))
# Kleene AND: (FALSE AND UNKNOWN) = FALSE on both
@example(pred=("and", ("cmp", "s", "=", "zz"), ("cmp", "i", "<", 1)))
def test_fuzz_null_predicate_logic(null_table, pred):
    df, con = null_table
    got = sorted(r.id for r in df.filter(_col(pred)).select("id").collect())
    want = sorted(
        r[0]
        for r in con.execute(f"SELECT id FROM t WHERE {_sql(pred)}").fetchall()
    )
    assert got == want, f"pred={pred}\nsql={_sql(pred)}"


@settings(
    max_examples=25,
    deadline=None,
    print_blob=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    mode=st.sampled_from(["rollup", "cube"]),
    keys=st.lists(
        st.sampled_from(["i", "s"]), min_size=1, max_size=2, unique=True
    ),
    pred=_PRED,
)
# NULL-i rows only, rolled up on i: the grid contains a LEAF row with
# key NULL (gid=0, the genuine NULL group) AND a subtotal row with
# key NULL (gid=1) — identical key renderings distinguished ONLY by
# grouping_id, on both engines
@example(mode="rollup", keys=["i"], pred=("isnull", "i"))
# mixed NULL/non-NULL keys through a full cube
@example(mode="cube", keys=["i", "s"], pred=("or", ("isnull", "i"), ("isnull", "s")))
def test_fuzz_null_key_grids(null_table, mode, keys, pred):
    """Super-aggregate grids over NULLABLE keys: the main grid fuzz
    (test_differential_fuzz.py) draws NULL-free columns, so the
    NULL-leaf-vs-subtotal-marker plane — where a genuine NULL group
    key renders exactly like a rollup subtotal — is covered here.
    grouping_id must disambiguate identically on both engines, and
    COUNT(d) must skip NULLs inside every grid level."""
    from hypothesis import assume

    df, con = null_table
    filtered = df.filter(_col(pred))
    # empty input under a grid containing the () set is a PINNED
    # divergence (DuckDB emits one n=0 row, Spark emits nothing)
    assume(filtered.limit(1).count() == 1)
    out = getattr(filtered, mode)(*keys).agg(
        F.grouping_id(*keys).alias("gid"),
        F.count(F.lit(1)).alias("n"),
        F.count("d").alias("nd"),
    )
    cols = keys + ["gid", "n", "nd"]
    got = sorted(
        (tuple(r[c] for c in cols) for r in out.collect()),
        key=repr,
    )
    sql = (
        f"SELECT {', '.join(keys)}, "
        f"CAST(grouping_id({', '.join(keys)}) AS BIGINT) AS gid, "
        "COUNT(*) AS n, COUNT(d) AS nd "
        f"FROM t WHERE {_sql(pred)} "
        f"GROUP BY {mode.upper()}({', '.join(keys)})"
    )
    want = sorted((tuple(r) for r in con.execute(sql).fetchall()), key=repr)
    assert got == want, f"mode={mode} keys={keys} pred={pred}\nsql={sql}"
