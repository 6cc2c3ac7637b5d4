"""Self-check: run every registered query against its DuckDB oracle.

The packaged twin of the test-suite comparator
(``tests/oracle_utils.py``) so a user of the standalone repo can run
the correctness gate without pytest:

    python -m map_reduce_server_spark verify --sf-dir /data/sf0.01

Comparison contract (same as the grading driver): row count, sorted
column names, and order-insensitive canonical values (floats via
repr of float64 — bit-identical values required, which the engine
guarantees via exact decimal aggregation and portable hashing).
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal


def _canon_value(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        return repr(float(v))
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, int):
        return str(int(v))
    return str(v)


def _canonical_rows(df) -> list[tuple[str, ...]]:
    # Column-wise (Series.tolist), NOT iterrows: iterrows upcasts
    # each row to a common dtype, so an int64 beside a float column
    # becomes float64 — ints above 2^53 would canonicalize lossily
    # and distinct keys could compare equal. tolist() preserves each
    # column's own dtype as native Python values.
    cols = sorted(df.columns)
    col_values = [df[c].tolist() for c in cols]
    return sorted(
        tuple(_canon_value(v) for v in vals) for vals in zip(*col_values)
    )


def oracle_connection(sf_dir: str):
    """A DuckDB connection with every parquet table bound as a view."""
    import duckdb

    from map_reduce_server_spark.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def compare(
    spark_df, oracle_sql: str, sf_dir: str, con=None
) -> tuple[bool, str]:
    """Run the Spark result against the DuckDB oracle; (ok, message).

    Pass ``con`` (from :func:`oracle_connection`) to reuse one
    connection across a sweep; otherwise a fresh one is opened and
    closed per call.
    """
    sdf = spark_df.toPandas()
    own_con = con is None
    if own_con:
        con = oracle_connection(sf_dir)
    try:
        odf = con.execute(oracle_sql).fetchdf()
    finally:
        if own_con:
            con.close()
    if sorted(sdf.columns) != sorted(odf.columns):
        return False, (
            f"schema mismatch: spark={sorted(sdf.columns)} "
            f"oracle={sorted(odf.columns)}"
        )
    if len(sdf) != len(odf):
        return False, f"row count mismatch: spark={len(sdf)} oracle={len(odf)}"
    srows, orows = _canonical_rows(sdf), _canonical_rows(odf)
    if srows != orows:
        diffs = [
            f"spark={s} oracle={o}" for s, o in zip(srows, orows) if s != o
        ][:3]
        return False, "value mismatch: " + " | ".join(diffs)
    return True, "ok"


def verify_all(
    spark, sf_dir: str, names: list[str] | None = None
) -> dict[str, tuple[bool, str]]:
    """Run the gate for ``names`` (default: every oracle-checked
    query); returns {name: (ok, message)}."""
    from map_reduce_server_spark import registry

    registry.load_all()
    targets = names if names is not None else sorted(registry.ORACLE)
    out: dict[str, tuple[bool, str]] = {}
    con = oracle_connection(sf_dir)
    try:
        for name in targets:
            # Explain a bad explicit name instead of surfacing a bare
            # KeyError that reads like a correctness failure.
            if name not in registry.QUERIES:
                out[name] = (False, "unknown query name (typo?)")
                continue
            if name not in registry.ORACLE:
                out[name] = (
                    False,
                    "registered but has no SQL oracle (rows-only "
                    "query) — nothing to verify here",
                )
                continue
            try:
                out[name] = compare(
                    registry.QUERIES[name](spark, sf_dir),
                    registry.ORACLE[name],
                    sf_dir,
                    con=con,
                )
            except Exception as e:  # surface, don't abort the sweep
                out[name] = (False, repr(e)[:300])
            release_session_blocks(spark)
    finally:
        con.close()
    return out


def release_session_blocks(spark) -> None:
    """Drop blocks a consumed query left pinned in the session.

    Iterative/multi-consumer operators ``stage_cut`` compact
    intermediates (edge lists, shingle tables, rank vectors); the
    blocks can only be released AFTER the result is consumed, which
    the operator itself never sees. A long-lived session sweeping
    many queries (this gate; any REPL doing the same) otherwise
    accumulates dead blocks until the executor heap tips over —
    observed as GCLocker allocation failures ~60 queries into an
    sf0.1 sweep on a default-heap session. Call between queries once
    the previous result has been fully read.
    """
    try:
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
        spark.catalog.clearCache()
    except Exception:
        pass  # cleanup must never fail the sweep
