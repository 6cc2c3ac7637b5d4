"""Order-independent numeric aggregation helpers.

Floating-point sums are order-dependent, and Spark's partial
aggregation order differs run to run (and from any external engine).
Summing after an exact cast to DECIMAL makes the aggregate
associative and therefore bit-reproducible regardless of partitioning
— which is exactly what you want both for oracle comparison at sf0.01
and for run-to-run stability on a 1000-executor cluster. The final
cast back to DOUBLE keeps output schemas simple.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Exact (decimal) sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(30,{scale})")).cast("double")


def davg(col: Column | str, scale: int = 2, ndigits: int = 6) -> Column:
    """Reproducible average: exact decimal sum / count, rounded.

    Division happens in double on identical inputs, so the result is
    bit-identical across engines; rounding just bounds the printed
    precision.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.sum(c.cast(f"decimal(30,{scale})")).cast("double") / F.count(c),
        ndigits,
    )


def sql_dsum(expr: str, scale: int = 2) -> str:
    """DuckDB oracle twin of :func:`dsum`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(30,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 2, ndigits: int = 6) -> str:
    """DuckDB oracle twin of :func:`davg`."""
    return (
        f"ROUND(CAST(SUM(CAST(({expr}) AS DECIMAL(30,{scale}))) AS DOUBLE)"
        f" / COUNT({expr}), {ndigits})"
    )
