#!/usr/bin/env python3
"""Capture .explain('formatted') for bench queries into plans/r16/.

Usage: python plans/r16/capture_plans.py <suffix> [name ...]
  suffix: 'before' or 'after'
  names:  bench query names (default: all of registry.BENCH_QUERIES)

Writes plans/r16/<name>_<suffix>.txt. Queries that stage_cut eagerly
will run their upstream jobs during construction — that is inherent
to capturing the *executed* plan shape of the final stage.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from map_reduce_server_spark import get_spark, registry  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    registry.load_all()
    names = sys.argv[2:] or registry.bench_query_names()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="mrss-plans")
    out_dir = os.path.dirname(os.path.abspath(__file__))
    for name in names:
        hook = registry.PREPARE.get(name)
        if hook is not None:
            hook(spark, sf_dir)
        spark.sparkContext.setJobDescription(f"plan: {name}")
        df = registry.QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
