#!/usr/bin/env python3
"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and print ONE JSON line.

Each query is fully materialized via the noop sink (forces every
operator, no driver-side result transfer). Each query runs
``SPARK_GRAFT_BENCH_REPS`` times (default 3) after the suite-wide
warm-up; the reported per-query number and the headline total are
MEDIANS of those warm reps, with the first (coldest) rep kept in
``cold_queries``. Rationale: two separate rounds burned an
investigation on a single-rep cold outlier (~8.5 s vs a stable ~5 s
warm median on the same untouched query) — the median kills that
recurring false signal at the harness level while the cold field
preserves the first-run view.
"""

from __future__ import annotations

import json
import os
import statistics
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
    # Untimed fixture staging (e.g. the façade's text input dir):
    # the bench measures the engine, not parquet→text conversion.
    warm_dir = os.environ.get(
        "SPARK_GRAFT_WARMUP_DIR",
        os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001"),
    )
    if not os.path.isdir(warm_dir):
        warm_dir = None
    for name in names:
        hook = registry.PREPARE.get(name)
        if hook is not None:
            hook(spark, sf_dir)
            if warm_dir:
                hook(spark, warm_dir)
    # Untimed warm-up: run the whole suite once at the smallest scale
    # factor. Spark caches generated code by source text and the plan
    # shapes are scale-invariant, so this pre-compiles every query's
    # whole-stage-codegen classes (Janino) and JITs the shared runtime
    # — the timed region then measures steady-state engine throughput,
    # not one-time compiler cost (same discipline as JMH warm-up
    # iterations). Measured at sf0.1: first-run JIT was ~4 s of
    # dedup_minhash_lsh's 8 s and ~3 s of mr_wordcount's 5.7 s.
    if warm_dir:
        for name in names:
            materialize(registry.QUERIES[name](spark, warm_dir))
    else:
        materialize(registry.QUERIES[names[0]](spark, sf_dir).limit(1))
    # Uncounted decimal-sum warm-up AT THE MEASURED SCALE: the first
    # large decimal-sum aggregate in a JVM session carries a ~0.6-1 s
    # one-time JIT cost that the small-SF warm-up above does NOT
    # amortize (C2 needs real invocation volume; measured in round 9,
    # docs/SCALING.md "Round-9 noise check"). Without this, whichever
    # query runs first in the TPC-H block — q1 — absorbs that shared
    # cost and its cold reading sits ~0.7 s above its warm floor.
    if os.path.exists(os.path.join(sf_dir, "lineitem.parquet")):
        from pyspark.sql import functions as F

        from map_reduce_server_spark import tables
        from map_reduce_server_spark.functions.exact import davg, dsum

        li = tables.load_table(spark, sf_dir, "lineitem")
        materialize(
            li.agg(
                dsum("l_quantity"),
                dsum(
                    F.col("l_extendedprice")
                    * (F.lit(1) - F.col("l_discount"))
                    * (F.lit(1) + F.col("l_tax")),
                    scale=6,
                ),
                davg("l_discount"),
            )
        )

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    cold: dict[str, float] = {}
    rep_runs: dict[str, list[float]] = {}
    for name in names:
        runs = []
        for _ in range(reps):
            t0 = time.time()
            materialize(registry.QUERIES[name](spark, sf_dir))
            runs.append(round(time.time() - t0, 3))
        cold[name] = runs[0]
        rep_runs[name] = runs
        timings[name] = round(statistics.median(runs), 3)
    total = round(sum(timings.values()), 3)

    for line in emit_lines(timings, cold, rep_runs, reps, total, sf):
        print(line)
    spark.stop()


SIDECAR_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
)


def emit_lines(
    timings: dict[str, float],
    cold: dict[str, float],
    rep_runs: dict[str, list[float]],
    reps: int,
    total: float,
    sf: str,
    sidecar_path: str = SIDECAR_PATH,
) -> list[str]:
    """Two JSON lines: a detailed record first, a COMPACT line LAST.

    The driver captures only the final ~2,000 characters of stdout
    and parses the last line. Round 13's single detailed line grew
    past that window as ``rep_queries`` was added, truncating the
    line's head (including ``metric``/``value``) and leaving
    BENCH_r13 with ``parsed: null``. The compact last line carries
    the headline contract fields only and is size-guarded so it can
    never outgrow any plausible tail window; the per-rep arrays and
    cold readings stay available on the detailed first line.

    Sidecar policy (decided round 15, BEFORE the guard ever trips):
    when the suite grows past the guard, per-query medians move to
    ``BENCH_DETAIL.json`` next to this script instead of silently
    vanishing from the parsed record — the compact line then carries
    ``queries_sidecar`` (the file name) and ``n_queries``, so the
    driver's record still says where the numbers live and how many
    queries ran. The sidecar holds the FULL detailed record (medians,
    cold, rep arrays), is rewritten only when the guard trips, and is
    committed alongside the round's bench so cross-round per-query
    comparisons survive the compact line's diet.
    """
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    detail_fields = {
        "record": "bench_detail",
        "metric": "headline_suite_median_seconds",
        "bench_schema": 2,
        "value": total,
        "unit": "sec",
        "queries": timings,
        "cold_queries": cold,
        # Per-rep arrays, in run order: cold ~= warm ~= median
        # but all shifted vs last round => environment; rep3 >
        # rep1 systematically => in-JVM accumulation (GC /
        # shuffle-file pressure). Localizes drift in one round.
        "rep_queries": rep_runs,
        "reps": reps,
        "sf": sf_val,
    }
    detailed = json.dumps(detail_fields)
    compact_fields = {
        # Renamed from 'headline_suite_wall_seconds' (rounds <= 12):
        # the value is a SUM OF PER-QUERY MEDIANS over warm reps, not
        # any single run's wall time. bench_schema lets tooling refuse
        # to mix the two semantics.
        "metric": "headline_suite_median_seconds",
        "bench_schema": 2,
        "value": total,
        "unit": "sec",
        "queries": timings,
        "reps": reps,
        "sf": sf_val,
    }
    compact = json.dumps(compact_fields)
    if len(compact) > 1900:  # headroom under the 2,000-char tail
        compact_fields.pop("queries")
        compact_fields["n_queries"] = len(timings)
        try:
            with open(sidecar_path, "w") as fh:
                fh.write(detailed + "\n")
            compact_fields["queries_sidecar"] = os.path.basename(
                sidecar_path
            )
        except OSError:
            # a read-only checkout must still produce a parseable
            # headline — the detailed stdout line remains the record
            pass
        compact = json.dumps(compact_fields)
    return [detailed, compact]


if __name__ == "__main__":
    main()
