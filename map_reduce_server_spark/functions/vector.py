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
    """Cosine similarity; arrays must be cast to array<double> first.

    NULL (not NaN, not an error) when either vector is all-zero: the
    explicit guard keeps both engines' zero-vector behavior identical
    — raw 0/0 is NULL in Spark but NaN in DuckDB, and NaN sorts
    ABOVE every real under DESC there, which would put a zero vector
    at rank 1 of every oracle top-k. NULL sorts last and fails >=
    filters in both engines. ``sql_cosine`` is the oracle twin; the
    sqrt arrangement (sqrt(aa)*sqrt(bb), not sqrt(aa*bb)) must match
    it to the last ulp because the ANN windows rank on the UNROUNDED
    value.
    """
    aa = dot(a, a)
    bb = dot(b, b)
    return F.when(
        (aa > 0) & (bb > 0), dot(a, b) / (F.sqrt(aa) * F.sqrt(bb))
    )


# DuckDB oracle twin of :func:`cosine` — same guard, same sqrt
# arrangement. Keep the two in lockstep (ulp-level parity matters).
SQL_COSINE = (
    "CASE WHEN list_dot_product({a}, {a}) > 0"
    " AND list_dot_product({b}, {b}) > 0"
    " THEN list_dot_product({a}, {b}) /"
    " (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
    " END"
)


def as_double_array(col: Column) -> Column:
    """Cast array<float> to array<double> for stable arithmetic."""
    return col.cast("array<double>")


# --- symmetric int8 quantization contract -----------------------------------
# The scale (max |x|, 0.0 for an empty vector) and the dequantization
# arithmetic (floor(x*127/scale + 0.5) * scale/127 — explicit half-up
# so both engines place half-way values identically) live HERE, once:
# embedding_quantize_int8 and ann_topk_quantized both replay them, and
# the SQL twins below are the only oracle spellings.


def max_abs(v: Column) -> Column:
    """Greatest |x| over the vector — 0.0 for an empty array (the
    greatest-fold init), matching SQL_MAX_ABS's coalesce."""
    return F.aggregate(
        F.transform(v, lambda x: F.abs(x)),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )


def int8_quantize(v: Column, mx: Column) -> Column:
    """Quantized int codes: floor(x·127/mx + 0.5) per element."""
    return F.transform(
        v, lambda x: F.floor(x * 127.0 / mx + 0.5).cast("int")
    )


def int8_reconstruct(v: Column, mx: Column) -> Column:
    """Dequantized vector: floor(x·127/mx + 0.5)·mx/127 per element."""
    return F.transform(
        v, lambda x: F.floor(x * 127.0 / mx + 0.5) * mx / 127.0
    )


SQL_MAX_ABS = "coalesce(list_max(list_transform({v}, x -> abs(x))), 0.0)"

SQL_QUANT = (
    "list_transform({v}, x -> CAST(floor(x * 127.0 / {mx} + 0.5) AS INTEGER))"
)

SQL_RECON = (
    "list_transform({v}, x -> floor(x * 127.0 / {mx} + 0.5) * {mx} / 127.0)"
)
