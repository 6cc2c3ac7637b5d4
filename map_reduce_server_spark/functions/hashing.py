"""Deterministic, engine-portable hashing primitives.

MinHash / SimHash / fingerprinting need hash families that are (a)
deterministic, (b) computable identically in Spark SQL and any ANSI
oracle, and (c) JVM-side (no Python UDF in the hot path). md5 is
available everywhere with identical output, so we derive:

- ``md5_long(col)``  — first 15 hex chars of md5 as a non-negative
  int64 (60 bits). Used for fingerprints and SimHash bit sources.
- ``seeded_md5(col, seed)`` — md5 over ``"{seed}:" || value``:
  a cheap universal-ish family indexed by seed, used as the MinHash
  permutation family (min over lexicographic md5 hex strings is a
  valid min-wise hash).

All of these stay inside whole-stage codegen (pure built-ins).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_hex(col: Column) -> Column:
    """md5 hex digest (32 chars) of a string column."""
    return F.md5(col.cast("string"))


def md5_long(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative bigint."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("bigint")


def seeded_md5(col: Column, seed: int) -> Column:
    """Seeded md5 hex string — one member of the MinHash family."""
    return F.md5(F.concat(F.lit(f"{seed}:"), col.cast("string")))


# DuckDB oracle twins -------------------------------------------------

def sql_md5_long(expr: str) -> str:
    """DuckDB twin of :func:`md5_long` (hex-literal cast)."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def sql_seeded_md5(expr: str, seed: int) -> str:
    """DuckDB twin of :func:`seeded_md5`."""
    return f"md5('{seed}:' || {expr})"
