"""Hot-bucket behavior of MinHash-LSH candidate generation.

The one scale hazard of LSH candidate generation is a hot band
bucket: n documents sharing a band key expand to n(n-1)/2 pairs.
``minhash_candidate_pairs(max_bucket_size=...)`` must drop oversized
buckets BEFORE pair expansion, bounding the output, while leaving
normal buckets untouched.
"""

from __future__ import annotations

from map_reduce_server_spark.operators.dedup import (
    _MINHASH_K,
    minhash_candidate_pairs,
)


def _wide(spark, rows):
    cols = ["doc_id"] + [f"m{i}" for i in range(_MINHASH_K)]
    return spark.createDataFrame(rows, cols)


def test_uncapped_hot_bucket_is_quadratic(spark):
    # 60 identical signatures → one hot bucket per band → C(60,2) pairs
    rows = [tuple([i] + ["x"] * _MINHASH_K) for i in range(60)]
    pairs = minhash_candidate_pairs(_wide(spark, rows))
    assert pairs.count() == 60 * 59 // 2


def test_bucket_cap_bounds_pair_expansion(spark):
    # 60-doc hot group + a 3-doc normal duplicate group
    rows = [tuple([i] + ["x"] * _MINHASH_K) for i in range(60)]
    rows += [tuple([100 + i] + [f"y{j}" for j in range(_MINHASH_K)]) for i in range(3)]
    got = minhash_candidate_pairs(_wide(spark, rows), max_bucket_size=10)
    pairs = {(r.doc_a, r.doc_b) for r in got.collect()}
    # hot bucket dropped entirely; the small group survives intact
    assert pairs == {(100, 101), (100, 102), (101, 102)}


def test_bucket_cap_keeps_buckets_at_the_cap(spark):
    rows = [tuple([i] + ["x"] * _MINHASH_K) for i in range(5)]
    got = minhash_candidate_pairs(_wide(spark, rows), max_bucket_size=5)
    assert got.count() == 5 * 4 // 2


def test_simhash_bucket_cap(spark):
    from map_reduce_server_spark.operators.dedup import simhash_pairs

    # 40 identical fingerprints (hot bucket in all 4 bands) + one
    # distinct near-pair differing in a single low bit (hamming 1).
    rows = [(i, 7, 7) for i in range(40)]
    rows += [
        (100, 1 << 20, (5 << 16) | 9),
        (101, (1 << 20) | 1, (5 << 16) | 9),
    ]
    halves = spark.createDataFrame(rows, ["doc_id", "lo", "hi"])
    uncapped = simhash_pairs(halves)
    assert uncapped.count() == 40 * 39 // 2 + 1
    capped = simhash_pairs(halves, max_bucket_size=10)
    got = {(r.doc_a, r.doc_b, r.hamming) for r in capped.collect()}
    assert got == {(100, 101, 1)}


def test_lsh_recall_vs_exact_jaccard(spark, sf_small):
    """Quantified recall: of all document pairs with exact 3-gram
    Jaccard >= 0.7, the banded MinHash candidates (b=6, r=2 -> catch
    probability 1-(1-J^2)^6 >= 98% at J=0.7) must retain at least
    90%. Deterministic: the hash family is fixed, so this measures
    the actual corpus, not a random draw."""
    from map_reduce_server_spark import registry
    from map_reduce_server_spark.operators.dedup import shingles_df

    sh = shingles_df(spark, sf_small, distinct=True).collect()
    sets: dict[int, set] = {}
    for r in sh:
        sets.setdefault(r.doc_id, set()).add(r.shingle)
    ids = sorted(sets)
    truth = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter and inter / len(sets[a] | sets[b]) >= 0.7:
                truth.add((a, b))
    assert truth, "fixture corpus must contain near-dup pairs"
    cand = {
        (r.doc_a, r.doc_b)
        for r in registry.QUERIES["dedup_minhash_lsh"](
            spark, sf_small
        ).collect()
    }
    recall = len(truth & cand) / len(truth)
    assert recall >= 0.9, (recall, sorted(truth - cand)[:10])
