"""CLI parity: the submit interface mirrors the reference's
``mapreduce-submit`` client (``submit.py:15-49``)."""

from __future__ import annotations

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_EXAMPLES = os.path.join(
    _REPO, "map_reduce_server_spark", "mapreduce", "examples"
)


def _run_cli(*args: str) -> subprocess.CompletedProcess:
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    return subprocess.run(
        [sys.executable, "-m", "map_reduce_server_spark", *args],
        cwd=_REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )


def test_register_rejects_collapse_unsafe_literals():
    """registry.register stores oracles whitespace-collapsed; a
    quoted literal containing a tab, newline, or 2+ spaces would be
    silently rewritten into a DIFFERENT literal (this bit
    mr_wordcount's '[ <tab>]' regex class, collapsed to '[ ]' —
    masked only because the corpus has no tabs). The guard must
    refuse such oracles at registration, and must NOT false-positive
    on whitespace BETWEEN literals."""
    import pytest

    from map_reduce_server_spark import registry

    for bad in (
        "SELECT 'a  b' AS t",          # double space inside literal
        "SELECT 'a\tb' AS t",           # tab inside literal
        "SELECT 'a\nb' AS t",           # newline inside literal
    ):
        with pytest.raises(ValueError, match="whitespace collapsing"):
            registry.register("x_guard_probe", oracle=bad)(lambda s, d: None)
        # a refused registration must leave no partial entry behind
        assert "x_guard_probe" not in registry.QUERIES
    # whitespace between literals (outside quotes) is fine
    registry.register(
        "x_guard_probe", oracle="SELECT 'a' AS x,\n       'b' AS y"
    )(lambda s, d: None)
    assert registry.ORACLE.pop("x_guard_probe") == "SELECT 'a' AS x, 'b' AS y"
    registry.QUERIES.pop("x_guard_probe", None)


def test_register_lint_handles_escaped_quotes():
    """A doubled quote ('') is SQL's escaped apostrophe — it must not
    flip the lint's inside/outside-quote parity. A '--' INSIDE a
    literal containing an escaped quote is data (must register); a
    '--' OUTSIDE quotes after such a literal is still a comment (must
    refuse); collapse-unsafe whitespace inside the literal is still
    caught."""
    import pytest

    from map_reduce_server_spark import registry

    # '--' inside an escaped-quote literal: legitimate data
    registry.register(
        "x_quote_probe", oracle="SELECT 'it''s -- fine' AS t"
    )(lambda s, d: None)
    assert registry.ORACLE.pop("x_quote_probe") == (
        "SELECT 'it''s -- fine' AS t"
    )
    registry.QUERIES.pop("x_quote_probe", None)
    # real comment after an escaped-quote literal: still refused
    with pytest.raises(ValueError, match="line comment"):
        registry.register(
            "x_quote_probe", oracle="SELECT 'a''b' AS t -- trailing"
        )(lambda s, d: None)
    # unsafe whitespace inside an escaped-quote literal: still caught
    with pytest.raises(ValueError, match="whitespace collapsing"):
        registry.register(
            "x_quote_probe", oracle="SELECT 'a''b  c' AS t"
        )(lambda s, d: None)
    assert "x_quote_probe" not in registry.QUERIES


def test_register_lint_quote_runs():
    """Quote runs of length >= 3 (a literal BEGINNING with an escaped
    apostrophe, e.g. ''''a' meaning the value 'a) collapse the opening
    quote together with the escape pair, so the lint's reported span
    boundaries can shift — but the inside/outside-quote PARITY the
    classification relies on must hold for every run length (ADVICE
    round 7). Pin it: data stays data, unsafe stays refused."""
    import pytest

    from map_reduce_server_spark import registry

    # leading escaped quote, safe content: must register verbatim
    registry.register(
        "x_run_probe", oracle="SELECT '''ok' AS t"
    )(lambda s, d: None)
    assert registry.ORACLE.pop("x_run_probe") == "SELECT '''ok' AS t"
    registry.QUERIES.pop("x_run_probe", None)
    # '--' inside a leading-escaped-quote literal: data, must register
    registry.register(
        "x_run_probe", oracle="SELECT '''a--b' AS t"
    )(lambda s, d: None)
    assert registry.ORACLE.pop("x_run_probe") == "SELECT '''a--b' AS t"
    registry.QUERIES.pop("x_run_probe", None)
    # unsafe whitespace inside such a literal: still caught
    with pytest.raises(ValueError, match="whitespace collapsing"):
        registry.register(
            "x_run_probe", oracle="SELECT '''a  b' AS t"
        )(lambda s, d: None)
    # quote-run of 4 ('''' = empty-ish literal value ' followed by
    # more): parity must survive into the tail of the query too
    with pytest.raises(ValueError, match="line comment"):
        registry.register(
            "x_run_probe", oracle="SELECT '''''' AS t -- trailing"
        )(lambda s, d: None)
    assert "x_run_probe" not in registry.QUERIES


def test_cli_list():
    res = _run_cli("list")
    assert res.returncode == 0
    lines = dict(
        line.split("\t") for line in res.stdout.strip().splitlines()
    )
    assert lines["q1_pricing_summary"] == "oracle"
    assert lines["dedup_cluster"] == "oracle"  # recursive-CTE oracle
    # sketches verify via bound-check booleans since round 2
    assert lines["q_approx_sketches"] == "oracle"
    assert len(lines) >= 80


def test_cli_submit_wordcount(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    (d / "f1").write_text("red blue red\n")
    out = str(tmp_path / "out")
    res = _run_cli(
        "submit",
        "-i", str(d),
        "-o", out,
        "-m", f"python3 {_EXAMPLES}/wc_map.py",
        "-r", f"python3 {_EXAMPLES}/wc_reduce.py",
        "--nmappers", "1",
        "--nreducers", "1",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    body = open(os.path.join(out, "outputfile01")).read().splitlines()
    assert sorted(body) == ["blue\t1", "red\t2"]


def test_cli_unknown_query():
    res = _run_cli("query", "no_such_query")
    assert res.returncode == 2
    assert "unknown query" in res.stderr


def test_verify_sweep_releases_blocks(spark, sf_small):
    """After verify_all consumes a checkpoint-heavy query, no
    persistent RDD blocks may remain pinned in the session — the
    leak that OOMed long multi-query sweeps (verify.py)."""
    from map_reduce_server_spark.verify import verify_all

    results = verify_all(spark, sf_small, ["dedup_cluster"])
    assert results["dedup_cluster"][0], results["dedup_cluster"][1]
    leftover = spark.sparkContext._jsc.getPersistentRDDs()
    assert leftover.size() == 0, f"{leftover.size()} blocks still pinned"
