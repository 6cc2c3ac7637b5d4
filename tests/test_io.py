"""Source/sink unit tests."""

from __future__ import annotations

import os

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
