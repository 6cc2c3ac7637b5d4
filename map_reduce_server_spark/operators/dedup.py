"""Deduplication operators — exact, MinHash-LSH, SimHash, n-gram
Jaccard, embedding-cosine — over ``documents`` / ``embeddings``.

The reference has no dedup (its group stage merely counts distinct
*lines*, reference ``master/__main__.py:250-253``); these are the
north-star training-data-pipeline operators (BASELINE.json).

Scale design: every variant is a shuffle-on-key plan. Exact dedup
groups on a 60-bit fingerprint (8 bytes shuffled, not the document).
MinHash/SimHash use banding so candidate generation is an equi-join
on (band, signature) — never an all-pairs product. The md5-derived
hash family is engine-portable, so every stage has a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_server_spark.functions.hashing import md5_long, sql_md5_long
from map_reduce_server_spark.registry import register
from map_reduce_server_spark.tables import load_table

# --- shared shingling (word 3-grams over non-empty lowercase tokens) -------

_SQL_TOKS = "list_filter(string_split(lower(text), ' '), x -> x <> '')"
_SQL_SHINGLES = f"""
  (SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, greatest(len({_SQL_TOKS}) - 1, 1)),
                 i -> {_SQL_TOKS}[i] || ' ' || {_SQL_TOKS}[i+1]
                      || ' ' || {_SQL_TOKS}[i+2])) AS shingle
   FROM documents)
"""


def shingles_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (doc_id, 3-word-shingle) pairs."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")
    with_toks = docs.select("doc_id", toks.alias("ts"))
    n = F.size(F.col("ts"))
    shingle_arr = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(1), n - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("ts"), i),
                F.element_at(F.col("ts"), i + 1),
                F.element_at(F.col("ts"), i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        with_toks.select("doc_id", F.explode(shingle_arr).alias("shingle"))
        .distinct()
    )


# --- exact dedup ------------------------------------------------------------


@register(
    "dedup_exact",
    oracle="""
    SELECT text, CAST(MIN(doc_id) AS BIGINT) AS keeper_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY text
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-group on the full text, keep min doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("text").agg(
        F.min("doc_id").alias("keeper_id"), F.count("*").alias("n_copies")
    )


@register(
    "dedup_fingerprint",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id,
             {sql_md5_long("regexp_replace(lower(trim(text)), ' +', ' ', 'g')")}
               AS fingerprint
      FROM documents
    )
    SELECT fingerprint, CAST(MIN(doc_id) AS BIGINT) AS keeper_id,
           COUNT(*) AS n_copies
    FROM fp GROUP BY fingerprint
    """,
)
def dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-fingerprint dedup: at 100 TB this shuffles 8-byte
    keys instead of documents — the scale path for exact dedup."""
    docs = load_table(spark, sf_dir, "documents")
    normalized = F.regexp_replace(F.lower(F.trim(F.col("text"))), " +", " ")
    return (
        docs.select("doc_id", md5_long(normalized).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keeper_id"), F.count("*").alias("n_copies"))
    )


# --- n-gram Jaccard (exact, shingle-join formulation) -----------------------


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH sh AS ({_SQL_SHINGLES}),
    sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           round(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 6)
             AS jaccard
    FROM pairs
    JOIN sz sa ON doc_a = sa.doc_id
    JOIN sz sb ON doc_b = sb.doc_id
    ORDER BY jaccard DESC, doc_a, doc_b
    LIMIT 20
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most-similar document pairs by exact 3-gram Jaccard.

    Distributed formulation: explode shingles, equi-join on shingle
    (never an all-pairs product), count common, join sizes. At scale
    the shingle join gets prefix filtering / LSH (see
    ``dedup_minhash_lsh``) — this exact variant is the ground truth.
    """
    sh = shingles_df(spark, sf_dir)
    sz = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    sa = sz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    sb = sz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "doc_a", "doc_b")
        .limit(20)
    )


# --- MinHash + LSH -----------------------------------------------------------

_MINHASH_K = 12  # signature length; bands of r=1 → high-recall config


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, seed, h): min-wise signature per document and seed.

    One-pass formulation: each (doc, shingle) row projects all K
    seeded hashes as columns, a single groupBy(doc_id) takes the K
    mins (partial aggregation combines map-side, so the shuffle
    carries K strings per doc per partition — not K× the shingle
    set), and the wide row unpivots to (seed, h) pairs for banding.
    ~2× faster than exploding a seeds dimension and equivalent
    value-for-value.
    """
    sh = shingles_df(spark, sf_dir)
    projected = sh.select(
        "doc_id",
        *[
            F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle"))).alias(f"m{i}")
            for i in range(_MINHASH_K)
        ],
    )
    wide = projected.groupBy("doc_id").agg(
        *[F.min(f"m{i}").alias(f"m{i}") for i in range(_MINHASH_K)]
    )
    return wide.unpivot(
        ids=["doc_id"],
        values=[f"m{i}" for i in range(_MINHASH_K)],
        variableColumnName="seed_name",
        valueColumnName="h",
    ).select(
        "doc_id",
        F.substring("seed_name", 2, 6).cast("int").alias("seed"),
        "h",
    )


def _sql_minhash_sig() -> str:
    return f"""
    (SELECT doc_id, seed,
            MIN(md5(CAST(seed AS VARCHAR) || ':' || shingle)) AS h
     FROM ({_SQL_SHINGLES}) sh
     CROSS JOIN (SELECT unnest(range({_MINHASH_K})) AS seed) seeds
     GROUP BY doc_id, seed)
    """


@register(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH sig AS ({_sql_minhash_sig()})
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM sig a JOIN sig b
      ON a.seed = b.seed AND a.h = b.h AND a.doc_id < b.doc_id
    """,
    bench=True,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs (shingle → K minhashes → band
    bucket join).

    The min-wise hash family is ``min(md5(seed:shingle))`` per seed
    (lexicographic min over hex digests — a valid permutation
    approximation, engine-portable). Bands of r=1: a pair is a
    candidate iff it collides on any of the K signature positions,
    i.e. P(candidate) = 1-(1-J)^K — the high-recall end of the LSH
    tradeoff. Candidate generation is a self-equi-join on
    (seed, h): at 100 TB this shuffles only (doc_id, 32-byte hash)
    pairs, K per document, never the corpus and never all pairs.
    """
    sig = minhash_signatures(spark, sf_dir)
    a = sig.alias("a")
    b = sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a.seed") == F.col("b.seed"))
            & (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


@register(
    "dedup_keep_one",
    oracle=f"""
    SELECT doc_id, lang, source FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (
               PARTITION BY {sql_md5_long("regexp_replace(lower(trim(text)), ' +', ' ', 'g')")}
               ORDER BY doc_id
             ) AS rn
      FROM documents
    ) t WHERE rn = 1
    """,
)
def dedup_keep_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keep-one-row-per-duplicate-group pattern: window
    row_number over the normalized fingerprint, keep the smallest
    doc_id — the projection-preserving form of dedup (vs
    dedup_exact's aggregate form). One shuffle on the 8-byte
    fingerprint at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    normalized = F.regexp_replace(F.lower(F.trim(F.col("text"))), " +", " ")
    w = Window.partitionBy(md5_long(normalized)).orderBy("doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source")
    )


@register(
    "dedup_minhash_estimate",
    oracle=f"""
    WITH sig AS ({_sql_minhash_sig()}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sig a JOIN sig b
        ON a.seed = b.seed AND a.h = b.h AND a.doc_id < b.doc_id
    ),
    agree AS (
      SELECT c.doc_a, c.doc_b,
             COUNT(*) FILTER (WHERE sa.h = sb.h) AS n_agree
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.doc_a
      JOIN sig sb ON sb.doc_id = c.doc_b AND sb.seed = sa.seed
      GROUP BY c.doc_a, c.doc_b
    )
    SELECT doc_a, doc_b,
           round(CAST(n_agree AS DOUBLE) / {_MINHASH_K}, 6) AS est_jaccard
    FROM agree
    """,
)
def dedup_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard estimation from signature agreement: for every LSH
    candidate pair, est_J = (#agreeing minhash positions)/K — the
    sketch-side similarity used to rank/filter candidates without
    touching the documents again (at 100 TB the signatures are 12×32
    bytes per doc; the texts never reshuffle)."""
    sig = minhash_signatures(spark, sf_dir).localCheckpoint(
        eager=True  # reused by candidates AND agreement
    )
    a = sig.alias("a")
    b = sig.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.seed") == F.col("b.seed"))
            & (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sig.select(
        F.col("doc_id").alias("doc_a"), "seed", F.col("h").alias("ha")
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"), "seed", F.col("h").alias("hb")
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "seed"])
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count_if(F.col("ha") == F.col("hb")).alias("n_agree")
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("n_agree").cast("double") / _MINHASH_K, 6).alias(
                "est_jaccard"
            ),
        )
    )


# --- SimHash -----------------------------------------------------------------


@register(
    "dedup_simhash",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, unnest({_SQL_TOKS}) AS token FROM documents
    ), th AS (
      SELECT doc_id, token,
             CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) AS h
      FROM tok
    ), bits AS (
      SELECT doc_id, b,
             SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM th CROSS JOIN (SELECT unnest(range(32)) AS b) bb
      GROUP BY doc_id, b
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
                AS BIGINT) AS simhash
    FROM bits GROUP BY doc_id
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash fingerprint per document (distinct-token basis).

    Bit b of the fingerprint is the sign of Σ_tokens (±1 from bit b
    of the token hash). Near-dup pairing at scale then bands the
    fingerprint (pigeonhole: hamming ≤ k ⇒ one of k+1 bands equal)
    — see ``dedup_simhash_pairs``.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")
    tok = docs.select(
        "doc_id", F.explode(F.array_distinct(toks)).alias("token")
    )
    th = tok.select(
        "doc_id",
        F.conv(F.substring(F.md5("token"), 1, 8), 16, 10)
        .cast("bigint")
        .alias("h"),
    )
    bits_idx = spark.range(32).select(F.col("id").cast("int").alias("b"))
    bits = (
        th.crossJoin(F.broadcast(bits_idx))
        .select(
            "doc_id",
            "b",
            F.expr(
                "CASE WHEN (shiftright(h, b) & CAST(1 AS BIGINT)) = 1 "
                "THEN 1 ELSE -1 END"
            ).alias("contrib"),
        )
        .groupBy("doc_id", "b")
        .agg(F.sum("contrib").alias("s"))
    )
    return bits.groupBy("doc_id").agg(
        F.sum(
            F.expr(
                "CASE WHEN s > 0 THEN shiftleft(CAST(1 AS BIGINT), b) "
                "ELSE CAST(0 AS BIGINT) END"
            )
        )
        .cast("bigint")
        .alias("simhash")
    )


@register(
    "dedup_simhash_pairs",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, unnest({_SQL_TOKS}) AS token FROM documents
    ), th AS (
      SELECT doc_id, token,
             CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) AS h
      FROM tok
    ), bits AS (
      SELECT doc_id, b,
             SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM th CROSS JOIN (SELECT unnest(range(32)) AS b) bb
      GROUP BY doc_id, b
    ), fp AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
                  AS BIGINT) AS simhash
      FROM bits GROUP BY doc_id
    ), bands AS (
      SELECT doc_id, simhash, band,
             (simhash >> (band * 8)) & 255 AS bkey
      FROM fp CROSS JOIN (SELECT unnest(range(4)) AS band) bb
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.simhash AS ha, b.simhash AS hb
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming
    FROM cand
    WHERE bit_count(xor(ha, hb)) <= 6
    """,
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: band the 32-bit fingerprint into 4
    bytes, equi-join on (band, byte), verify hamming ≤ 6.

    Note 4 bands only *guarantee* recall for hamming ≤ 3; ≤ 6 keeps
    high-but-not-total recall — the standard LSH tradeoff, and the
    oracle applies the identical candidate rule so results agree.
    """
    fp = dedup_simhash(spark, sf_dir)
    bands_idx = spark.range(4).select(F.col("id").cast("int").alias("band"))
    bands = fp.crossJoin(F.broadcast(bands_idx)).select(
        "doc_id",
        "simhash",
        "band",
        F.expr(
            "shiftright(simhash, band * 8) & CAST(255 AS BIGINT)"
        ).alias("bkey"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return cand.select(
        "doc_a", "doc_b", hamming.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= 6)
