"""SparkSession factory with scale-conscious defaults.

The reference engine hand-rolls its runtime (master/worker TCP/UDP,
reference ``mapreduce/master/__main__.py:56-68``); on Spark the
runtime already exists, so the only thing to configure is the SQL
engine: AQE on (runtime re-planning, skew-join handling), shuffle
partitions pinned to a fixed 32-partition upper bound that AQE
coalesces down locally (they'd be sized to the cluster at 100 TB),
Arrow for any Python-side exchange, and a pinned
UTC session timezone so results compare exactly against external
oracles.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "map_reduce_server_spark",
    cpus: str | int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or ``*``. On a real
    cluster the ``master`` setting comes from spark-submit and these
    SQL configs carry over unchanged.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # AQE: coalesce post-shuffle partitions, convert to broadcast
        # joins at runtime, split skewed partitions — all essential at
        # 100 TB and harmless locally.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # fixed upper bound (NOT derived from the cpus argument):
        # AQE coalesces down when data is small, so oversizing is
        # harmless while matching the 32-thread bench box.
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        # Spark 4 defaults ANSI mode ON, where x/0 THROWS; every
        # DuckDB oracle (and the SQL the engine's users write against
        # it) expects the NULL-on-zero convention, so a degenerate
        # group (n=1 variance, all-zero revenue) would crash Spark
        # while the oracle returns a NULL row. Pinned off here AND in
        # registry.pinned (the driver's vanilla session).
        .config("spark.sql.ansi.enabled", "false")
        # non-ANSI re-enables legacy size(NULL) = -1; oracles need
        # NULL-in-NULL-out (mirrors registry.pinned)
        .config("spark.sql.legacy.sizeOfNull", "false")
        # events.parquet carries TIMESTAMP(NANOS); Spark has no nanos
        # type, so read as long and convert (see tables.load_table).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for key, val in (extra_conf or {}).items():
        builder = builder.config(key, val)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
