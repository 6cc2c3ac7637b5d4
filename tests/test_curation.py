"""Curation-pipeline properties beyond oracle parity: survivor-set
arithmetic for keep-one dedup and mixture bounds for the domain
rebalancer."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_server_spark import registry
from map_reduce_server_spark.tables import load_table

registry.load_all()


def test_keep_one_partitions_the_corpus(spark, sf_small):
    """Group sizes must sum to the corpus size (every document is in
    exactly one group), keepers must be real doc_ids, and each keeper
    must be the minimum of its own group."""
    docs = load_table(spark, sf_small, "documents")
    survivors = registry.QUERIES["dedup_minhash_keep_one"](spark, sf_small)
    total = survivors.agg(F.sum("n_members")).first()[0]
    assert total == docs.count()
    # keepers ⊆ corpus
    missing = survivors.join(
        docs, survivors.keep_doc_id == docs.doc_id, "left_anti"
    ).count()
    assert missing == 0


def test_keep_one_consistent_with_cluster(spark, sf_small):
    """keep-one must be exactly the per-cluster min of dedup_cluster."""
    clustered = registry.QUERIES["dedup_cluster"](spark, sf_small)
    expected = sorted(
        (r.cluster_id, r.n)
        for r in clustered.groupBy("cluster_id")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    got = sorted(
        (r.keep_doc_id, r.n_members)
        for r in registry.QUERIES["dedup_minhash_keep_one"](
            spark, sf_small
        ).collect()
    )
    assert got == expected


def test_domain_mixture_bounds(spark, sf_small):
    """Each source's survivor count must be ≤ its input count and
    within binomial noise of the smallest source's size; survivors
    must be a subset of the corpus."""
    docs = load_table(spark, sf_small, "documents")
    before = {
        r.source: r.n
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    target = min(before.values())
    mixed = registry.QUERIES["q_domain_mixture"](spark, sf_small)
    after = {
        r.source: r.n
        for r in mixed.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for source, n_before in before.items():
        n_after = after.get(source, 0)
        assert n_after <= n_before
        # 5-sigma binomial tolerance around the exact-rational target
        import math

        p = target / n_before
        sigma = math.sqrt(n_before * p * (1 - p))
        assert abs(n_after - target) <= max(5 * sigma, 5), (
            source, n_before, n_after, target
        )
    # the smallest source survives whole
    smallest = min(before, key=before.get)
    assert after[smallest] == before[smallest]


def test_kmeans_assigns_every_vector(spark, sf_small):
    """Every embedding gets exactly one cluster; labels are drawn
    from the K seed ids."""
    from map_reduce_server_spark.operators.similarity import _KM_K

    emb_n = load_table(spark, sf_small, "embeddings").count()
    assigned = registry.QUERIES["kmeans_embeddings"](spark, sf_small)
    rows = assigned.collect()
    assert len(rows) == emb_n
    assert len({r.vec_id for r in rows}) == emb_n
    assert len({r.cluster for r in rows}) <= _KM_K


def test_jaccard_prefix_filter_loses_nothing(spark, sf_small):
    """Prefix filtering is an optimization, not an approximation:
    the candidate-pruned result must exactly equal the brute-force
    every-shared-shingle join filtered to the same threshold."""
    from pyspark.sql import functions as F

    from map_reduce_server_spark.operators.dedup import (
        _PJ_THRESHOLD,
        shingles_df,
    )

    sh = shingles_df(spark, sf_small)
    sz = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    sa = sz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    sb = sz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    j = F.col("n_common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    )
    brute = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(j >= _PJ_THRESHOLD)
        .select("doc_a", "doc_b", j.alias("jaccard"))
        .collect()
    }
    pruned = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in registry.QUERIES["dedup_jaccard_prefix"](
            spark, sf_small
        ).collect()
    }
    assert pruned == brute
    assert brute  # the corpus contains qualifying pairs


def test_pack_sequences_conservation(spark, sf_small):
    """Invariants over the real corpus: per-source token totals are
    conserved by packing, sequence ids are contiguous from 0, and
    every sequence except possibly the last per source reaches the
    budget once its successor exists (no premature bin starts)."""
    from map_reduce_server_spark import registry
    from map_reduce_server_spark.operators.curation import _PACK_BUDGET
    from pyspark.sql import functions as F
    from map_reduce_server_spark.tables import load_table

    manifest = {
        (r.source, r.seq_id): (r.n_docs, r.n_tokens)
        for r in registry.QUERIES["q_pack_sequences"](
            spark, sf_small
        ).collect()
    }
    docs = load_table(spark, sf_small, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")
    truth = {
        r.source: r.total
        for r in docs.groupBy("source")
        .agg(F.sum(F.size(toks)).alias("total"))
        .collect()
    }
    by_source: dict[str, dict[int, tuple]] = {}
    for (src, seq), v in manifest.items():
        by_source.setdefault(src, {})[seq] = v
    assert set(by_source) == set(truth)
    for src, seqs in by_source.items():
        ids = sorted(seqs)
        assert ids == list(range(len(ids))), src  # contiguous from 0
        assert sum(v[1] for v in seqs.values()) == truth[src], src
        # every non-final sequence must have crossed the budget
        # boundary together with its successor's existence
        running = 0
        for i in ids[:-1]:
            running += seqs[i][1]
            assert running >= (i + 1) * _PACK_BUDGET, (src, i)
