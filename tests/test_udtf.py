"""Python UDTF (table function) — the remaining corner of the UDF
surface (§2.D UDF/UDAF/UDTF): one input row → many output rows with
a declared schema. Kept test-only: explode() covers the same ground
JVM-side and is what the engine actually uses."""

from __future__ import annotations

from pyspark.sql.functions import lit, udtf


@udtf(returnType="word: string, length: int")
class Tokenize:
    def eval(self, text: str):
        for w in text.split(" "):
            yield w, len(w)


def test_udtf_tokenize(spark):
    Tokenize_reg = Tokenize  # direct call form
    rows = Tokenize_reg(lit("spark makes join fast")).collect()
    got = [(r.word, r.length) for r in rows]
    assert got == [("spark", 5), ("makes", 5), ("join", 4), ("fast", 4)]


def test_udtf_lateral_join(spark):
    spark.udtf.register("tokenize", Tokenize)
    df = spark.createDataFrame(
        [(1, "a bb"), (2, "ccc")], ["id", "txt"]
    )
    df.createOrReplaceTempView("udtf_in")
    out = spark.sql(
        """
        SELECT id, t.word, t.length
        FROM udtf_in, LATERAL tokenize(txt) t
        ORDER BY id, word
        """
    ).collect()
    assert [(r.id, r.word, r.length) for r in out] == [
        (1, "a", 1),
        (1, "bb", 2),
        (2, "ccc", 3),
    ]
