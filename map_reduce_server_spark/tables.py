"""Parquet table access for the synthetic star schema.

The reference's only source is a directory of line-oriented text
files (reference ``mapreduce/master/__main__.py:288-289``); the new
engine's primary source is columnar parquet so Catalyst gets
predicate pushdown + column pruning for free. Text-dir reading for
the MapReduce façade lives in :mod:`map_reduce_server_spark.io`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale
# factor (region=5 rows, nation=25 rows always; supplier/part grow
# slowly). Used by operators to hint broadcast joins explicitly.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one star-schema table from ``{sf_dir}/{name}.parquet``.

    ``events.ts`` is physically TIMESTAMP(NANOS), which Spark's
    vectorized parquet reader rejects; with
    ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as a nanos
    long and is converted here (integer division — exact; the
    synthetic data has zero sub-microsecond residue).
    """
    if name == "events":
        # Defensive: the config is runtime-settable; the driver's own
        # session may not have it.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.expr("timestamp_micros(ts div 1000)")
        ).select("event_id", "ts", "user_id", "event_type", "value", "props")
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL entry path)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
