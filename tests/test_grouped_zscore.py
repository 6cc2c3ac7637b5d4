"""applyInPandas grouped-map UDF: per-group z-score."""

from __future__ import annotations

import math

from map_reduce_server_spark.operators.udf import grouped_zscore
from map_reduce_server_spark.tables import load_table

from pyspark.sql import functions as F


def test_grouped_zscore(spark, sf_small):
    ev = load_table(spark, sf_small, "events").select(
        "event_type", "value"
    )
    out = grouped_zscore(ev, "event_type", "value")
    rows = out.collect()
    assert len(rows) == ev.count()
    # per group: mean(z) ≈ 0, std(z) ≈ 1
    by_group: dict[str, list[float]] = {}
    for r in rows:
        by_group.setdefault(r.event_type, []).append(r.zscore)
    for zs in by_group.values():
        n = len(zs)
        mean = sum(zs) / n
        var = sum((z - mean) ** 2 for z in zs) / (n - 1)
        assert abs(mean) < 1e-9
        assert math.isclose(math.sqrt(var), 1.0, rel_tol=1e-9)
