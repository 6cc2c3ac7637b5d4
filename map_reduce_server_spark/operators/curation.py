"""Corpus-curation pipeline compositions.

The single-operator building blocks (MinHash-LSH candidates,
connected components, quality scores, hash splits) live in
``dedup.py`` / ``clustering.py`` / ``text.py``; this module registers
the COMPOSED pipelines a training-data curation pass actually runs,
each still fully oracle-checked:

- ``dedup_minhash_keep_one`` — the end-to-end fuzzy dedup: candidate
  pairs → transitive closure → one canonical survivor per group.
- ``q_domain_mixture`` — deterministic per-source rebalancing toward
  a uniform domain mix, with EXACT rational sampling (hash % n < k),
  no floating-point rates anywhere.
- ``q_profile_columns`` — one-scan data profiling (null count,
  distinct count, min/max per column) in long format.
- ``q_scd2_customer_orders`` — slowly-changing-dimension (type 2)
  interval build from an event-style fact.

The reference has no notion of any of this (its pipeline surface is
wordcount/grep executables, reference ``tests/testdata/exec/``);
these exist for the 100 TB training-data mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from map_reduce_server_spark.functions.hashing import md5_long, sql_md5_long
from map_reduce_server_spark.registry import register
from map_reduce_server_spark.tables import load_table


# ---------------------------------------------------------------------------
# End-to-end fuzzy dedup: keep one representative per near-dup group
# ---------------------------------------------------------------------------


def _sql_keep_one_oracle() -> str:
    from map_reduce_server_spark.operators.clustering import (
        _sql_dedup_cluster_oracle,
    )

    return f"""
    SELECT CAST(cluster_id AS BIGINT) AS keep_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_members
    FROM ({_sql_dedup_cluster_oracle()}) clustered
    GROUP BY cluster_id
    """


@register("dedup_minhash_keep_one", oracle=_sql_keep_one_oracle())
def dedup_minhash_keep_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete fuzzy-dedup pass a corpus curation pipeline runs:
    MinHash-LSH candidate pairs → connected components → keep the
    smallest doc_id of each duplicate group (singletons keep
    themselves). Returns one row per SURVIVING document with its
    group size — the survivor set IS the deduplicated corpus.

    Scale: adds a single groupBy on cluster_id (8-byte keys) on top
    of ``dedup_cluster``; document text never shuffles anywhere in
    the pipeline. The oracle replays the whole composition, recursive
    closure included, in one DuckDB statement.
    """
    from map_reduce_server_spark.operators.clustering import dedup_cluster

    clustered = dedup_cluster(spark, sf_dir)
    return (
        clustered.groupBy(F.col("cluster_id").alias("keep_doc_id"))
        .agg(F.count("*").alias("n_members"))
    )


# ---------------------------------------------------------------------------
# Domain-mixture rebalancing (deterministic, exact-rational sampling)
# ---------------------------------------------------------------------------


@register(
    "q_domain_mixture",
    oracle=f"""
    WITH counts AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_source
      FROM documents GROUP BY source
    ),
    target AS (SELECT MIN(n_source) AS n_target FROM counts)
    SELECT d.doc_id, d.source
    FROM documents d
    JOIN counts USING (source) CROSS JOIN target
    WHERE {sql_md5_long("'mix:' || CAST(d.doc_id AS VARCHAR)")}
          % n_source < n_target
    """,
)
def q_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebalance the corpus toward a uniform source mix: every source
    is thinned to (approximately) the smallest source's size by
    keeping doc_id iff ``md5(doc) % n_source < n_target``.

    The keep-rate n_target/n_source is applied as EXACT integer
    arithmetic — no float thresholds, so the decision is bit-identical
    on any engine and any partitioning, and a document's fate never
    flips when unrelated partitions move. Per-source counts are a
    broadcast-joined aggregate (one row per source); the fact table
    is scanned once.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("n_source"))
    target = counts.agg(F.min("n_source").alias("n_target"))
    h = md5_long(F.concat(F.lit("mix:"), F.col("doc_id").cast("string")))
    return (
        docs.join(F.broadcast(counts), "source")
        .join(F.broadcast(target))
        .filter(h % F.col("n_source") < F.col("n_target"))
        .select("doc_id", "source")
    )


# ---------------------------------------------------------------------------
# One-pass column profiling
# ---------------------------------------------------------------------------

# (column, portable min/max expression) — doubles go through a fixed
# DECIMAL so min/max strings format identically on both engines
# (Java prints 5.0E7, DuckDB 50000000.0 — decimals sidestep it).
# {T} is the dialect's unbounded string type (Spark: STRING,
# DuckDB: VARCHAR).
_PROFILE_COLS = (
    ("o_orderkey", "CAST({c} AS {T})"),
    ("o_custkey", "CAST({c} AS {T})"),
    ("o_orderstatus", "CAST({c} AS {T})"),
    ("o_totalprice", "CAST(CAST({c} AS DECIMAL(18,2)) AS {T})"),
    ("o_orderdate", "CAST({c} AS {T})"),
    ("o_orderpriority", "CAST({c} AS {T})"),
)


def _sql_profile_oracle() -> str:
    parts = [
        f"""
        SELECT '{c}' AS column_name,
               CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
               MIN({tmpl.format(c=c, T='VARCHAR')}) AS min_val,
               MAX({tmpl.format(c=c, T='VARCHAR')}) AS max_val
        FROM orders
        """
        for c, tmpl in _PROFILE_COLS
    ]
    return " UNION ALL ".join(parts)


@register("q_profile_columns", oracle=_sql_profile_oracle())
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data profiling in ONE scan: per-column null count, exact
    distinct count, and min/max, emitted in long format.

    The naive form is one scan per column (the oracle's UNION ALL —
    fine for DuckDB at sf0.01, wrong at 100 TB). The Spark plan
    computes every column's aggregates in a single pass: Catalyst
    plans multi-column COUNT(DISTINCT) as one Expand + two-level
    aggregate, so the fact table is read once regardless of column
    count; the final stack() to long format touches 6 rows.
    """
    orders = load_table(spark, sf_dir, "orders")
    aggs = []
    for c, tmpl in _PROFILE_COLS:
        val = F.expr(tmpl.format(c=c, T="STRING"))
        aggs += [
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__null"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(val).alias(f"{c}__min"),
            F.max(val).alias(f"{c}__max"),
        ]
    wide = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__null, {c}__distinct, {c}__min, {c}__max"
        for c, _ in _PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
            "(column_name, n_null, n_distinct, min_val, max_val)"
        )
    )


# ---------------------------------------------------------------------------
# SCD2 dimension build
# ---------------------------------------------------------------------------


@register(
    "q_scd2_customer_orders",
    oracle="""
    SELECT o_custkey, o_orderkey,
           o_orderdate AS valid_from,
           LEAD(o_orderdate) OVER w AS valid_to,
           (LEAD(o_orderdate) OVER w IS NULL) AS is_current
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_scd2_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) build: each customer's
    order stream becomes versioned rows with [valid_from, valid_to)
    intervals and an is_current flag — the standard way a warehouse
    tracks attribute history, built here with one window pass (no
    self-join). The window ORDER BY ends in the unique o_orderkey so
    same-day orders version deterministically on every engine.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
    )
    valid_to = F.lead("o_orderdate").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").alias("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )
