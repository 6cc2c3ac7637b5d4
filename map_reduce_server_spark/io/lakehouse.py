"""Lakehouse table-format connectors (Delta / Iceberg / Hudi).

The jars are not in this container, so the connectors are gated
behind import/config probes that fail with actionable messages.
The engine's operators never depend on them — q_upsert shows the
MERGE pattern in plain Spark — but at a real 100 TB deployment these
are how you'd get ACID upserts, time travel, and compaction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_DELTA_HINT = (
    "Delta Lake requires the delta-spark package and "
    "spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension; "
    "neither is present in this environment."
)
_ICEBERG_HINT = (
    "Apache Iceberg requires the iceberg-spark-runtime jar and a "
    "catalog config (spark.sql.catalog.*); not present in this "
    "environment."
)


def delta_available() -> bool:
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def write_delta(df: DataFrame, path: str) -> None:
    if not delta_available():
        raise NotImplementedError(_DELTA_HINT)
    df.write.format("delta").mode("overwrite").save(path)


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    if not delta_available():
        raise NotImplementedError(_DELTA_HINT)
    return spark.read.format("delta").load(path)


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Table  # noqa: B018
        return True
    except Exception:
        return False


def write_iceberg(spark: SparkSession, df: DataFrame, table: str) -> None:
    if not iceberg_available(spark):
        raise NotImplementedError(_ICEBERG_HINT)
    df.writeTo(table).createOrReplace()
