"""Vector math (zip_with/aggregate fold) vs numpy ground truth."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from map_reduce_server_spark.functions.vector import as_double_array, cosine, dot, norm


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = np.random.RandomState(7)
    rows = [
        (i, rng.randn(16).astype("float32").tolist(), rng.randn(16).astype("float32").tolist())
        for i in range(20)
    ]
    return spark.createDataFrame(
        rows, "id long, a array<float>, b array<float>"
    )


def test_dot_norm_cosine_match_numpy(vec_df):
    out = vec_df.select(
        "id",
        "a",
        "b",
        dot(as_double_array(F.col("a")), as_double_array(F.col("b"))).alias("d"),
        norm(as_double_array(F.col("a"))).alias("na"),
        cosine(
            as_double_array(F.col("a")), as_double_array(F.col("b"))
        ).alias("c"),
    ).collect()
    for r in out:
        a = np.array(r.a, dtype="float64")
        b = np.array(r.b, dtype="float64")
        # sequential left fold == numpy within float tolerance
        assert math.isclose(r.d, float(np.dot(a, b)), rel_tol=1e-12)
        assert math.isclose(r.na, float(np.linalg.norm(a)), rel_tol=1e-12)
        expected_c = float(
            np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
        )
        assert math.isclose(r.c, expected_c, rel_tol=1e-12)


def test_quantized_ann_recall_vs_float(spark, sf_small):
    """Int8 reconstruction must preserve neighbor structure: per
    query, the quantized top-5 overlaps the float top-5 by >= 3 of 5
    on the fixture corpus (deterministic — fixed hash-free math)."""
    from map_reduce_server_spark import registry

    registry.load_all()

    def topk(name):
        out: dict[int, set] = {}
        for r in registry.QUERIES[name](spark, sf_small).collect():
            out.setdefault(r.query_id, set()).add(r.neighbor_id)
        return out

    exact = topk("ann_topk_bruteforce")
    quant = topk("ann_topk_quantized")
    assert set(exact) == set(quant)
    for q in exact:
        overlap = len(exact[q] & quant[q])
        assert overlap >= 3, (q, exact[q], quant[q])
