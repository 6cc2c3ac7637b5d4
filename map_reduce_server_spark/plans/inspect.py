"""Physical-plan inspection helpers.

There is no custom optimizer here — Catalyst is the optimizer
(SURVEY.md §4.1: the reference has none at all). What the engine owns
is *verifying* that the plans it declares come out the way a 100 TB
deployment needs: filters pushed to the scan, columns pruned,
dimensions broadcast, codegen unbroken. These helpers make those
properties assertable in tests and inspectable in notebooks.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """Capture ``df.explain(mode)`` output as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every scan in the plan."""
    out = []
    for chunk in explain_str(df).split("PushedFilters: ")[1:]:
        out.append(chunk.split("\n")[0].strip())
    return out


def read_schema(df: DataFrame) -> list[str]:
    """ReadSchema strings (one per scan) — the pruning evidence."""
    out = []
    for chunk in explain_str(df).split("ReadSchema: ")[1:]:
        out.append(chunk.split("\n")[0].strip())
    return out


def join_strategies(df: DataFrame) -> list[str]:
    """Join operator names appearing in the physical plan."""
    plan = explain_str(df)
    found = []
    for name in (
        "BroadcastHashJoin",
        "SortMergeJoin",
        "ShuffledHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
    ):
        if name in plan:
            found.append(name)
    return found
