"""bench.py output contract: the driver captures only the LAST ~2,000
characters of stdout and parses the LAST line as the headline JSON.

Round 13 regression: the single detailed line (with ``rep_queries``)
outgrew that window, its head — ``metric``/``value`` — was truncated
away, and BENCH_r13.json recorded ``parsed: null``. These tests pin
the fix: bench emits a compact, size-guarded line LAST that survives
a 2,000-char tail truncation no matter how large the suite grows.
"""

from __future__ import annotations

import json

import bench

TAIL = 2000


def _tail_last_line(lines: list[str]) -> str:
    out = "\n".join(lines) + "\n"
    return out[-TAIL:].strip().splitlines()[-1]


def _fake_suite(n_queries: int) -> tuple[dict, dict, dict]:
    names = [f"q_synthetic_benchmark_name_{i:03d}" for i in range(n_queries)]
    timings = {n: 12.345 for n in names}
    cold = {n: 13.456 for n in names}
    rep_runs = {n: [13.456, 12.345, 12.001] for n in names}
    return timings, cold, rep_runs


def test_last_line_parses_after_tail_truncation():
    timings, cold, rep_runs = _fake_suite(22)
    lines = bench.emit_lines(timings, cold, rep_runs, 3, 271.59, "0.1")
    rec = json.loads(_tail_last_line(lines))
    assert rec["metric"] == "headline_suite_median_seconds"
    assert rec["bench_schema"] == 2
    assert rec["value"] == 271.59
    assert rec["unit"] == "sec"
    assert rec["sf"] == 0.1
    assert rec["reps"] == 3
    # queries fit at the current suite size and must be present
    assert set(rec["queries"]) == set(timings)


def test_compact_line_bounded_even_for_huge_suite(tmp_path):
    # 200 queries would blow the window with the per-query dict; the
    # size guard must drop "queries" but keep the headline parseable.
    # sidecar_path is pinned to tmp so the contract test never writes
    # into the repo root.
    timings, cold, rep_runs = _fake_suite(200)
    lines = bench.emit_lines(
        timings, cold, rep_runs, 3, 2469.0, "0.1",
        sidecar_path=str(tmp_path / "BENCH_DETAIL.json"),
    )
    assert len(lines[-1]) <= 1900
    rec = json.loads(_tail_last_line(lines))
    assert rec["metric"] == "headline_suite_median_seconds"
    assert rec["value"] == 2469.0


def test_detailed_line_precedes_and_keeps_rep_arrays():
    timings, cold, rep_runs = _fake_suite(5)
    lines = bench.emit_lines(timings, cold, rep_runs, 3, 61.7, "0.01")
    assert len(lines) == 2
    detail = json.loads(lines[0])
    assert detail["record"] == "bench_detail"
    assert detail["rep_queries"] == rep_runs
    assert detail["cold_queries"] == cold
    assert detail["sf"] == 0.01


def test_guard_trip_writes_sidecar_and_references_it(tmp_path):
    """When the compact line outgrows the guard, per-query medians
    must land in the sidecar file and the compact line must say so
    (queries_sidecar + n_queries) — never silently vanish."""
    timings, cold, rep_runs = _fake_suite(200)
    sidecar = tmp_path / "BENCH_DETAIL.json"
    lines = bench.emit_lines(
        timings, cold, rep_runs, 3, 2469.0, "0.1", sidecar_path=str(sidecar)
    )
    rec = json.loads(_tail_last_line(lines))
    assert "queries" not in rec
    assert rec["n_queries"] == 200
    assert rec["queries_sidecar"] == "BENCH_DETAIL.json"
    side = json.loads(sidecar.read_text())
    assert side["record"] == "bench_detail"
    assert set(side["queries"]) == set(timings)
    assert side["rep_queries"] == rep_runs


def test_no_sidecar_below_guard(tmp_path):
    """At the current suite size the compact line keeps its queries
    and no sidecar is written."""
    timings, cold, rep_runs = _fake_suite(22)
    sidecar = tmp_path / "BENCH_DETAIL.json"
    lines = bench.emit_lines(
        timings, cold, rep_runs, 3, 271.59, "0.1", sidecar_path=str(sidecar)
    )
    rec = json.loads(_tail_last_line(lines))
    assert set(rec["queries"]) == set(timings)
    assert not sidecar.exists()
