"""Round-15 optimization pin: row-local BM25 equals the exploded form.

``_bm25_scored`` now computes per-doc ``dl`` and per-term ``tf`` as
array ops inside each document's own row (zero corpus shuffles); the
former shape exploded the token stream and aggregated it twice. The
scores must be BIT-identical — same integers into the same double
expression tree, same round points, same fixed-order term fold — so
this pins exact equality (not approx) against the legacy formulation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_server_spark.functions.tokens import word_tokens_col
from map_reduce_server_spark.operators.retrieval import (
    _BM25_B,
    _BM25_K1,
    _BM25_TERMS,
    _bm25_scored,
)
from map_reduce_server_spark.tables import load_table


def _legacy_bm25_scored(docs):
    """The pre-round-15 formulation: explode tokens, aggregate dl and
    tf, broadcast dfreq/stats, pivot-fold in fixed term order."""
    tok = docs.select("doc_id", F.explode(word_tokens_col()).alias("token"))
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    tf = (
        tok.filter(F.col("token").isin(*_BM25_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count("*").cast("double").alias("df"))
    part = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "token",
            F.round(
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                    + 1.0
                )
                * (F.col("tf") * (_BM25_K1 + 1.0))
                / (
                    F.col("tf")
                    + _BM25_K1
                    * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
                ),
                9,
            ).alias("s"),
        )
    )
    add = None
    for t in _BM25_TERMS:
        term = F.coalesce(
            F.max(F.when(F.col("token") == t, F.col("s"))), F.lit(0.0)
        )
        add = term if add is None else add + term
    return part.groupBy("doc_id").agg(F.round(add, 6).alias("score"))


def test_rowlocal_bm25_equals_exploded(spark, sf_medium):
    docs = load_table(spark, sf_medium, "documents")
    new = _bm25_scored(docs)
    old = _legacy_bm25_scored(docs)
    # exact (bit-level) score equality, both directions
    assert new.exceptAll(old).isEmpty()
    assert old.exceptAll(new).isEmpty()


def test_rowlocal_bm25_domain_excludes_tokenless_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "join filter window join"),
            (2, "   "),  # tokenless: absent from legacy dl, must stay out
            (3, "nothing relevant here"),
            (4, None),
        ],
        ["doc_id", "text"],
    )
    got = {(r.doc_id, r.score) for r in _bm25_scored(docs).collect()}
    # doc 3 has tokens but no query terms -> not matched; 2/4 tokenless
    assert {d for d, _ in got} == {1}
    old = {(r.doc_id, r.score) for r in _legacy_bm25_scored(docs).collect()}
    assert got == old
