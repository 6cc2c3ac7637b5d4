"""Regenerate docs/PLANS.md: the physical plan of every bench-suite
query at sf0.001, with AQE off so join strategies and codegen spans
are visible.

Usage: ``python -m map_reduce_server_spark.plans.dump``
"""

from __future__ import annotations

import os
import sys

from map_reduce_server_spark import get_spark, registry
from map_reduce_server_spark.plans.inspect import explain_str

_HEADER = """\
# PLANS — physical plans of the bench suite (sf0.001 shapes)

AQE is disabled for this dump so codegen spans and join strategies
are visible (AQE is ON at runtime and only improves these plans).
Per plan, check: `PushedFilters` (predicate pushdown), `ReadSchema`
(column pruning), `BroadcastHashJoin` on dimension joins,
`[codegen id]` spans, `WindowGroupLimit` before window top-k.
Iterative/façade queries (dedup_cluster, mr_wordcount) show the plan
of their FINAL stage; their upstream stages are materialized
separately by design (checkpointed edge list / piped RDDs).
"""


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        "docs",
        "PLANS.md",
    )
    registry.load_all()
    spark = get_spark(app_name="mrss-plans")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sections = [_HEADER]
    for name in registry.bench_query_names():
        hook = registry.PREPARE.get(name)
        if hook is not None:
            hook(spark, sf_dir)
        df = registry.QUERIES[name](spark, sf_dir)
        sections.append(f"\n## {name}\n\n```\n{explain_str(df)}```\n")
    with open(out_path, "w") as f:
        f.write("".join(sections))
    print(f"wrote {out_path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
