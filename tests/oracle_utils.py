"""Local replica of the driver's DuckDB-oracle comparison.

Thin re-export of the packaged comparator
(``map_reduce_server_spark.verify``) — the two used to be hand-synced
copies and drifted; the comparator IS the correctness gate, so there
is exactly ONE implementation now. Mirrors the driver contract in
``__spark_entry__.py``: run the Spark query and the oracle SQL on the
same parquet tables, compare row count, schema (sorted column
names), and an order-insensitive value comparison. Strict: values
must match exactly after canonical string formatting (floats via
repr of float64 — bit-identical values required, which the engine
guarantees via exact decimal aggregation).
"""

from __future__ import annotations

from map_reduce_server_spark.verify import (
    _canon_value,  # noqa: F401  (fixture tests canonicalize scalars)
    _canonical_rows as canonical_rows,
    compare as compare_to_oracle,
    oracle_connection as duck_connection,
)

__all__ = [
    "canonical_rows",
    "compare_to_oracle",
    "duck_connection",
    "_canon_value",
]
