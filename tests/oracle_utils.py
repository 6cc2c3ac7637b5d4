"""Local replica of the driver's DuckDB-oracle comparison.

Mirrors the driver contract in ``__spark_entry__.py``: run the Spark
query and the oracle SQL on the same parquet tables, compare row
count, schema (sorted column names), and an order-insensitive value
comparison. Strict: values must match exactly after canonical
string formatting (floats via repr of float64 — bit-identical values
required, which the engine guarantees via exact decimal aggregation).
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb
import pandas as pd

from map_reduce_server_spark.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


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
    if isinstance(v, (int,)):
        return str(int(v))
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    # Column-wise (Series.tolist), NOT iterrows: iterrows upcasts
    # each row to a common dtype, so an int64 beside a float column
    # becomes float64 — ints above 2^53 would canonicalize lossily
    # and distinct keys could compare equal. tolist() preserves each
    # column's own dtype as native Python values. Mirrors
    # map_reduce_server_spark/verify.py exactly.
    cols = sorted(df.columns)
    col_values = [df[c].tolist() for c in cols]
    return sorted(
        tuple(_canon_value(v) for v in vals) for vals in zip(*col_values)
    )


def compare_to_oracle(
    spark_df, oracle_sql: str, sf_dir: str
) -> tuple[bool, str]:
    """Return (match, message)."""
    sdf = spark_df.toPandas()
    con = duck_connection(sf_dir)
    odf = con.execute(oracle_sql).fetchdf()
    con.close()

    if sorted(sdf.columns) != sorted(odf.columns):
        return False, f"schema mismatch: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    if len(sdf) != len(odf):
        return False, f"row count mismatch: spark={len(sdf)} oracle={len(odf)}"
    srows = canonical_rows(sdf)
    orows = canonical_rows(odf)
    if srows != orows:
        diffs = [
            f"  spark={s} oracle={o}"
            for s, o in zip(srows, orows)
            if s != o
        ][:5]
        return False, "value mismatch (first diffs):\n" + "\n".join(diffs)
    return True, "ok"
