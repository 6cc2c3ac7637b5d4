"""Vector math over ``array<float>`` embedding columns — JVM-side.

Dot products / norms / cosine are expressed with ``zip_with`` +
``aggregate`` higher-order functions: they run inside codegen, never
leave the JVM, and fold left-to-right so results are deterministic
and identical to a sequential loop in an external oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    """L2 norm (sequential fold, deterministic)."""
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; arrays must be cast to array<double> first."""
    return dot(a, b) / (norm(a) * norm(b))


def as_double_array(col: Column) -> Column:
    """Cast array<float> to array<double> for stable arithmetic."""
    return col.cast("array<double>")
