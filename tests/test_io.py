"""Source/sink unit tests."""

from __future__ import annotations

import os

import pytest

from map_reduce_server_spark.io import read_text_dir, write_numbered_text


def test_read_text_dir_tracks_file(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    (d / "alpha.txt").write_text("one\ntwo\n")
    (d / "beta.txt").write_text("three\n")
    df = read_text_dir(spark, str(d))
    rows = {(r.file, r.value) for r in df.collect()}
    assert rows == {
        ("alpha.txt", "one"),
        ("alpha.txt", "two"),
        ("beta.txt", "three"),
    }


def test_write_numbered_text(spark, tmp_path):
    df = spark.createDataFrame([("x",), ("y",), ("z",)], ["value"]).repartition(2)
    out = str(tmp_path / "out")
    paths = write_numbered_text(df, out)
    assert [os.path.basename(p) for p in paths] == [
        "outputfile01",
        "outputfile02",
    ]
    lines = []
    for p in paths:
        lines.extend(open(p).read().splitlines())
    assert sorted(lines) == ["x", "y", "z"]
    assert not os.path.exists(os.path.join(out, "_staging"))


def test_write_numbered_text_pre_finalize_failure_leaves_dest_intact(
    spark, tmp_path
):
    """pre_finalize runs after the distributed write action but
    before the destination is touched: if it raises (post-action
    input validation failing), previous output files survive
    unchanged and no staging residue is left — a failed job must
    never leave complete-looking but data-missing output."""
    import pytest

    out = str(tmp_path / "out")
    first = spark.createDataFrame([("old1",), ("old2",)], ["value"]).repartition(2)
    write_numbered_text(first, out)
    before = {
        p: open(os.path.join(out, p)).read() for p in sorted(os.listdir(out))
    }

    def boom():
        raise RuntimeError("input file silently skipped")

    second = spark.createDataFrame([("new",)], ["value"]).coalesce(1)
    with pytest.raises(RuntimeError, match="silently skipped"):
        write_numbered_text(second, out, pre_finalize=boom)
    after = {
        p: open(os.path.join(out, p)).read() for p in sorted(os.listdir(out))
    }
    assert after == before  # old outputs intact, no staging dir left


def test_write_numbered_text_metachar_output_dir(spark, tmp_path):
    """An output dir containing glob metacharacters must finalize
    correctly: an unescaped glob over the staging dir matches
    nothing, which silently fabricated EMPTY outputfileNN files and
    deleted the staged data (total output loss with a success
    return)."""
    df = spark.createDataFrame([("x",), ("y",)], ["value"]).repartition(2)
    out = str(tmp_path / "run[1]" / "out,dir")
    paths = write_numbered_text(df, out)
    lines = []
    for p in paths:
        lines.extend(open(p).read().splitlines())
    assert sorted(lines) == ["x", "y"]
    assert not os.path.exists(os.path.join(out, "_staging"))


def test_events_ntz_normalization_is_tz_proof(spark, tmp_path):
    """The timestamp[us]-without-UTC-adjustment events encoding
    (read as TIMESTAMP_NTZ) must normalize to the same UTC instants
    whatever the session timezone at call time — the NTZ->zoned cast
    resolves the zone at analysis time, so normalize_events_ts pins
    UTC itself rather than trusting callers (review-sweep class:
    host-TZ-sensitive semantics)."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from map_reduce_server_spark.tables import load_table

    sf_dir = str(tmp_path)
    wall = datetime.datetime(2024, 3, 10, 6, 30, 0)  # US DST morning
    tbl = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array([wall], pa.timestamp("us")),  # no tz => NTZ
        }
    )
    pq.write_table(tbl, f"{sf_dir}/events.parquet")
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        df = load_table(spark, sf_dir, "events")
        assert dict(df.dtypes)["ts"] == "timestamp"
        [row] = df.collect()
        # session TZ is UTC after the load (pinned); the rendered
        # wall time must equal the file's wall time — the instant was
        # attached AS UTC, not shifted by America/New_York
        assert row["ts"] == wall
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_events_tz_pin_warns_on_non_utc_session(spark, tmp_path, sf_small):
    """Pinning the session timezone to UTC from a session configured
    with a DIFFERENT zone is a surprising global mutation — the
    engine must say so loudly instead of reconfiguring the session in
    silence (ADVICE r8). The warning must fire through the REAL entry
    paths (load_table, the registry's pinned wrapper), which write
    the conf before normalize_events_ts ever reads it — a warning
    only a direct normalize_events_ts call can reach would leave the
    advertised scenario (a user session with its own zone running any
    query) still silent (review r9)."""
    import datetime
    import warnings as _w

    import pyarrow as pa
    import pyarrow.parquet as pq

    from map_reduce_server_spark import registry
    from map_reduce_server_spark.tables import load_table

    registry.load_all()
    sf_dir = str(tmp_path)
    tbl = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array(
                [datetime.datetime(2024, 1, 1)], pa.timestamp("us")
            ),
        }
    )
    pq.write_table(tbl, f"{sf_dir}/events.parquet")
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        with pytest.warns(UserWarning, match="pinning .* to UTC"):
            load_table(spark, sf_dir, "events")
        # the registry's pinned wrapper pins BEFORE the query body
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        with pytest.warns(UserWarning, match="pinning .* to UTC"):
            registry.QUERIES["q1_pricing_summary"](spark, sf_small)
        # and from an already-UTC session: silent (the common path)
        with _w.catch_warnings():
            _w.simplefilter("error")
            load_table(spark, sf_dir, "events")
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_register_views_is_per_session(spark, sf_small):
    """Temp views are per-SparkSession: the idempotence cache must
    not let a sibling session (spark.newSession()) skip registration
    on the strength of the first session's entry, and a dropTempView
    in-session must trigger re-registration, not downstream
    TABLE_OR_VIEW_NOT_FOUND (ADVICE r8)."""
    from map_reduce_server_spark.tables import TABLES, register_views

    register_views(spark, sf_small)
    sibling = spark.newSession()
    try:
        assert not sibling.catalog.tableExists(TABLES[0])
        register_views(sibling, sf_small)
        assert sibling.sql("SELECT count(*) AS n FROM region").collect()[
            0
        ]["n"] > 0
        # catalog reset within a session re-registers on next call —
        # for ANY dropped view, not just the first (review r9: a
        # TABLES[0]-only staleness probe missed the other nine)
        spark.catalog.dropTempView("lineitem")
        register_views(spark, sf_small)
        assert spark.catalog.tableExists("lineitem")
    finally:
        for name in TABLES:
            sibling.catalog.dropTempView(name)


def test_xml_roundtrip(spark, sf_small, tmp_path):
    """Spark 4's NATIVE xml data source round-trips a real table —
    schema and values intact. Unregistered (driver-window budget),
    but pins that the engine's source/sink surface includes XML
    alongside parquet/csv/json/orc/text."""
    from map_reduce_server_spark.tables import load_table

    region = load_table(spark, sf_small, "region")
    out = str(tmp_path / "region_xml")
    (
        region.write.format("xml")
        .option("rowTag", "region")
        .mode("overwrite")
        .save(out)
    )
    back = (
        spark.read.format("xml").option("rowTag", "region").load(out)
    ).select(*region.columns)  # xml infers columns alphabetically
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, region.collect())
    )


def test_write_numbered_text_trailing_empty_needs_n_parts(spark, tmp_path):
    """Trailing empty partitions: derivable only from the caller's
    n_parts (the text writer emits no file for them, and the sink
    must not re-execute the plan to count partitions). With n_parts
    they materialize as empty files; without, the written files
    alone bound the output."""
    from pyspark.sql import Row

    rdd = (
        spark.sparkContext.parallelize([(0, "alpha")])
        .partitionBy(3, lambda k: k)  # partitions 1 and 2 stay empty
        .map(lambda kv: Row(value=kv[1]))
    )
    df = spark.createDataFrame(rdd, "value string")
    out = str(tmp_path / "with_n")
    paths = write_numbered_text(df, out, n_parts=3)
    assert [os.path.basename(p) for p in paths] == [
        "outputfile01", "outputfile02", "outputfile03",
    ]
    assert os.path.getsize(paths[1]) == 0
    assert os.path.getsize(paths[2]) == 0

    out2 = str(tmp_path / "without_n")
    paths2 = write_numbered_text(df, out2)
    assert [os.path.basename(p) for p in paths2] == ["outputfile01"]
