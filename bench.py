#!/usr/bin/env python3
"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and print ONE JSON line.

Each query is fully materialized via the noop sink (forces every
operator, no driver-side result transfer). Timings are per-query
wall seconds; the headline metric is total wall time for the suite.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from map_reduce_server_spark import get_spark, registry


def materialize(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    registry.load_all()
    spark = get_spark(app_name="mrss-bench")

    names = registry.bench_query_names()
    timings: dict[str, float] = {}
    # Warm the JVM/codegen path once with the cheapest query so the
    # first measured query doesn't pay one-time session costs.
    materialize(registry.QUERIES[names[0]](spark, sf_dir).limit(1))
    # Untimed fixture staging (e.g. the façade's text input dir):
    # the bench measures the engine, not parquet→text conversion.
    for name in names:
        hook = registry.PREPARE.get(name)
        if hook is not None:
            hook(spark, sf_dir)

    total0 = time.time()
    for name in names:
        t0 = time.time()
        materialize(registry.QUERIES[name](spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)
    total = round(time.time() - total0, 3)

    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
