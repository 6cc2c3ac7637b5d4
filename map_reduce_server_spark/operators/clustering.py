"""Near-duplicate clustering: connected components over the
MinHash-LSH candidate graph.

The canonical last stage of corpus dedup: LSH yields candidate
*pairs*; keeping one representative per duplicate *group* needs the
transitive closure. Implemented as iterative min-label propagation —
each iteration is one shuffle-join (label ← min(label of self and
neighbors)), repeated until a fixpoint. The driver loop only checks
a converged-count per iteration (a scalar), never data; at 100 TB
each iteration is a plain distributed join, and the iteration count
is O(graph diameter), which for near-dup graphs is tiny.

This is the contract's "genuinely iterative algorithm" case — no
single SQL statement expresses the fixpoint, so the driver records
the weaker rows-only check; exactness is pinned by unit tests on
hand-built graphs (tests/test_clustering.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_server_spark.registry import register
from map_reduce_server_spark.tables import load_table


def connected_components(
    edges: DataFrame, max_iter: int = 50
) -> DataFrame:
    """Connected components of an undirected graph.

    ``edges``: DataFrame[src: long, dst: long]. Returns
    DataFrame[node: long, component: long] where component is the
    smallest node id in the node's component.

    Convergence: each iteration combines neighbor-min propagation
    with a pointer-jumping step (label ← label(label)), so label
    distances roughly HALVE per round — O(log diameter) iterations
    instead of O(diameter) for plain propagation (a diameter-10⁶
    chain converges in ~20 rounds). Non-convergence within
    ``max_iter`` RAISES instead of silently returning wrong labels.
    """
    # Materialize the edge list ONCE before fanning out: nodes, adj,
    # and labels all derive from it, and without this checkpoint each
    # derivation re-evaluates the (potentially expensive) upstream
    # candidate-pair pipeline — measured as ~2× the whole LSH stage
    # inside dedup_cluster at sf0.1.
    edges = edges.select("src", "dst").localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    # undirected adjacency (both directions + self-loop keeps isolated
    # correctness trivially and simplifies the min computation)
    adj = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .union(nodes.select(F.col("node").alias("src"), F.col("node").alias("dst")))
        .distinct()
    )
    # localCheckpoint each iteration: truncates the lineage so the
    # logical plan stays O(1) deep instead of O(iterations) — without
    # it Catalyst re-analyzes an exponentially growing tree.
    adj = adj.localCheckpoint(eager=True)
    labels = nodes.select("node", F.col("node").alias("component")).localCheckpoint(
        eager=True
    )
    for _ in range(max_iter):
        # candidate label for each node: min over neighbors' labels
        # (self-loop includes the node's own label)
        propagated = (
            adj.join(labels, adj.dst == labels.node)
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("component").alias("cand"))
        )
        # pointer jump: follow the candidate label one more hop —
        # labels form a forest rooted at component minima, so
        # label(label(u)) ≤ label(u) and chains compress geometrically.
        jump = labels.select(
            F.col("node").alias("cand"), F.col("component").alias("cand_comp")
        )
        updated = (
            labels.join(propagated, "node")
            .join(jump, "cand")
            .select(
                "node",
                F.least("component", "cand", "cand_comp").alias("component"),
                (
                    F.least("cand", "cand_comp") < F.col("component")
                ).alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = updated.filter("changed").limit(1).count()
        labels = updated.select("node", "component")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations; "
        "the label forest is still contracting — raise max_iter "
        "(convergence needs ~log2(graph diameter) iterations)"
    )


def _sql_dedup_cluster_oracle() -> str:
    from map_reduce_server_spark.operators.dedup import _SQL_MINHASH_CAND

    return f"""
    WITH RECURSIVE
    pairs AS (SELECT doc_a, doc_b FROM {_SQL_MINHASH_CAND} c),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(a, b) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
    ),
    comp AS (
      SELECT a AS node, LEAST(a, MIN(b)) AS component
      FROM reach GROUP BY a
    )
    SELECT d.doc_id,
           CAST(COALESCE(c.component, d.doc_id) AS BIGINT) AS cluster_id
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
    """


@register("dedup_cluster", oracle=_sql_dedup_cluster_oracle(), bench=True)
def dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate groups: connected components over MinHash-LSH
    candidate pairs; every document labeled with its group's smallest
    doc_id (documents with no near-dup candidate form singletons).

    The oracle replays the fixpoint as a DuckDB recursive CTE
    (transitive closure + min label), so even this iterative
    algorithm is value-checked, not just rows-counted.
    """
    from map_reduce_server_spark.operators.dedup import dedup_minhash_lsh

    pairs = dedup_minhash_lsh(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    comp = connected_components(pairs)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return (
        docs.join(comp, docs.doc_id == comp.node, "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("cluster_id"),
        )
    )
