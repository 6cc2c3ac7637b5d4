"""Text-analysis operators over the ``documents`` table.

Generalizes the reference's two shipped text workloads — wordcount
(``tests/testdata/exec/wc_map.sh:12`` + ``wc_reduce.sh:14``) and grep
(``tests/testdata/exec/grep_map.py:20-28``) — into JVM-side
DataFrame plans, then adds the LLM-pipeline text ops (token stats,
quality scoring, language ID, fingerprinting). Everything stays in
whole-stage codegen: no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_server_spark.functions.hashing import md5_long, sql_md5_long
from map_reduce_server_spark.registry import register
from map_reduce_server_spark.tables import load_table

# Tokenization contract (shared with every oracle): lowercase, split
# on single spaces, keep empty tokens (the reference's empty-string
# key is legal and aggregated — golden file `word_count_correct.txt`
# line 1 is the empty key; SURVEY.md §1.2).
_STOPWORDS = ("the", "a", "and", "of", "to")


def tokens_col(col: Column, keep_empty: bool = True) -> Column:
    toks = F.split(F.lower(col), " ")
    if keep_empty:
        return toks
    return F.filter(toks, lambda x: x != "")


_SQL_TOKENS = "string_split(lower(text), ' ')"
_SQL_NE_TOKENS = f"list_filter({_SQL_TOKENS}, x -> x <> '')"


@register(
    "wordcount",
    oracle=f"""
    SELECT word, COUNT(*) AS n
    FROM (SELECT unnest({_SQL_TOKENS}) AS word FROM documents) t
    GROUP BY word
    """,
    bench=True,
)
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's canonical workload: tokenize → group → count.

    Spark restatement of ``wc_map.sh`` + ``wc_reduce.sh`` — Catalyst
    plans a partial+final hash aggregate where the reference needed a
    full sort + pipe (SURVEY.md §2.B#9-11). Empty tokens kept.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens_col(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


@register(
    "grep",
    oracle="""
    SELECT doc_id, text FROM documents
    WHERE contains(lower(text), 'join')
    """,
)
def grep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring filter — the reference's grep query
    (``grep_map.py:27-28``: keep lines where query ∈ lower(line))."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.lower(F.col("text")).contains("join")).select(
        "doc_id", "text"
    )


@register(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_SQL_NE_TOKENS}) AS INTEGER) AS n_tokens,
           CAST(len(list_distinct({_SQL_NE_TOKENS})) AS INTEGER) AS n_distinct,
           CAST(length(text) AS INTEGER) AS text_len,
           round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                 / greatest(len({_SQL_NE_TOKENS}), 1), 6) AS avg_token_len
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace tokenizer) + basic length stats."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"), keep_empty=False)
    n_toks = F.size(toks)
    return docs.select(
        "doc_id",
        n_toks.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.length("text").alias("text_len"),
        F.round(
            F.length(F.regexp_replace("text", " ", "")).cast("double")
            / F.greatest(n_toks, F.lit(1)),
            6,
        ).alias("avg_token_len"),
    )


_SQL_STOPLIST = ", ".join(f"'{w}'" for w in _STOPWORDS)


@register(
    "text_quality",
    bench=True,
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SQL_NE_TOKENS} AS toks, text FROM documents
    )
    SELECT doc_id,
           round(CAST(len(list_filter(toks, x -> x IN ({_SQL_STOPLIST})))
                      AS DOUBLE) / greatest(len(toks), 1), 6) AS stopword_ratio,
           round(CAST(len(list_distinct(toks)) AS DOUBLE)
                 / greatest(len(toks), 1), 6) AS distinct_ratio,
           round(CAST(length(regexp_replace(text, '[a-z ]', '', 'g'))
                      AS DOUBLE) / greatest(length(text), 1), 6) AS nonalpha_ratio,
           CASE WHEN len(toks) BETWEEN 5 AND 10000
                 AND len(list_distinct(toks)) >= 3
                THEN 1 ELSE 0 END AS passes_quality
    FROM t
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality scoring (stopword / distinct /
    non-alpha ratios + a pass/fail gate) — the C4-style cheap filter
    stage of a training-data pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"), keep_empty=False)
    n = F.greatest(F.size(toks), F.lit(1))
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    n_dist = F.size(F.array_distinct(toks))
    return docs.select(
        "doc_id",
        F.round(n_stop.cast("double") / n, 6).alias("stopword_ratio"),
        F.round(n_dist.cast("double") / n, 6).alias("distinct_ratio"),
        F.round(
            F.length(F.regexp_replace("text", "[a-z ]", "")).cast("double")
            / F.greatest(F.length("text"), F.lit(1)),
            6,
        ).alias("nonalpha_ratio"),
        F.when(
            F.size(toks).between(5, 10000) & (n_dist >= 3), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("passes_quality"),
    )


# Marker-word tables per language for the n-gram/stopword language-ID
# heuristic. (The synthetic corpus is English-vocab for every lang
# label, so the heuristic output is uniform — the point here is the
# operator shape: per-language marker scoring + deterministic argmax.)
_LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "fr": ("le", "la", "et"),
    "es": ("el", "los", "y"),
    "de": ("der", "und", "die"),
}


def _sql_marker_count(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in _LANG_MARKERS[lang])
    return f"len(list_filter({_SQL_NE_TOKENS}, x -> x IN ({lst})))"


@register(
    "text_lang_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id,
             {_sql_marker_count('en')} AS s_en,
             {_sql_marker_count('fr')} AS s_fr,
             {_sql_marker_count('es')} AS s_es,
             {_sql_marker_count('de')} AS s_de
      FROM documents
    )
    SELECT doc_id,
           CASE
             WHEN s_en = 0 AND s_fr = 0 AND s_es = 0 AND s_de = 0 THEN 'unknown'
             WHEN s_en >= s_fr AND s_en >= s_es AND s_en >= s_de THEN 'en'
             WHEN s_fr >= s_es AND s_fr >= s_de THEN 'fr'
             WHEN s_es >= s_de THEN 'es'
             ELSE 'de'
           END AS lang_guess
    FROM scored
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic with a deterministic argmax."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"), keep_empty=False)

    def marker_count(lang: str) -> Column:
        arr = F.array(*[F.lit(w) for w in _LANG_MARKERS[lang]])
        return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))

    scored = docs.select(
        "doc_id",
        marker_count("en").alias("s_en"),
        marker_count("fr").alias("s_fr"),
        marker_count("es").alias("s_es"),
        marker_count("de").alias("s_de"),
    )
    return scored.select(
        "doc_id",
        F.when(
            (F.col("s_en") == 0)
            & (F.col("s_fr") == 0)
            & (F.col("s_es") == 0)
            & (F.col("s_de") == 0),
            F.lit("unknown"),
        )
        .when(
            (F.col("s_en") >= F.col("s_fr"))
            & (F.col("s_en") >= F.col("s_es"))
            & (F.col("s_en") >= F.col("s_de")),
            F.lit("en"),
        )
        .when(
            (F.col("s_fr") >= F.col("s_es")) & (F.col("s_fr") >= F.col("s_de")),
            F.lit("fr"),
        )
        .when(F.col("s_es") >= F.col("s_de"), F.lit("es"))
        .otherwise(F.lit("de"))
        .alias("lang_guess"),
    )


@register(
    "text_tfidf",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_SQL_NE_TOKENS}) AS token FROM documents
    ),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS n_in_doc FROM tok
      GROUP BY doc_id, token
    ),
    doclen AS (
      SELECT doc_id, CAST(SUM(n_in_doc) AS BIGINT) AS doc_len FROM tf
      GROUP BY doc_id
    ),
    df AS (
      SELECT token, COUNT(*) AS n_docs_with FROM tf GROUP BY token
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.token,
           round((CAST(tf.n_in_doc AS DOUBLE) / doc_len)
                 * ln(CAST(n_docs AS DOUBLE) / n_docs_with), 6) AS tfidf
    FROM tf
    JOIN doclen USING (doc_id)
    JOIN df USING (token)
    CROSS JOIN n
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-based TF-IDF per (document, token).

    Explicit DataFrame formulation rather than ml.feature's
    HashingTF (whose murmur-hash buckets aren't externally
    comparable): tf = count/doc_len, idf = ln(N/df). The df table is
    tiny (vocabulary-sized) and broadcast; the corpus shuffles once
    on doc_id and once on token — both unavoidable and both on
    compact keys.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(tokens_col(F.col("text"), keep_empty=False)).alias("token"),
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("n_in_doc"))
    doclen = tf.groupBy("doc_id").agg(F.sum("n_in_doc").alias("doc_len"))
    df = tf.groupBy("token").agg(F.count("*").alias("n_docs_with"))
    n_docs = docs.count()  # scalar driver-side (a count, not data)
    return (
        tf.join(doclen, "doc_id")
        .join(F.broadcast(df), "token")
        .select(
            "doc_id",
            "token",
            F.round(
                (F.col("n_in_doc").cast("double") / F.col("doc_len"))
                * F.log(F.lit(float(n_docs)) / F.col("n_docs_with")),
                6,
            ).alias("tfidf"),
        )
    )


# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation
# marks — the RE2/Java-regex-portable core of a GPT-style pattern
# (no lookarounds, so Spark and the oracle agree byte for byte).
_BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


@register(
    "text_bpe_tokens",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '{_BPE_PATTERN}'))
                AS INTEGER) AS n_bpe_tokens,
           CAST(len(list_distinct(regexp_extract_all(lower(text),
                '{_BPE_PATTERN}'))) AS INTEGER) AS n_distinct_bpe
    FROM documents
    """,
)
def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex (BPE-style) token counting — the tokenizer-shaped cost
    model for training-data sizing, kept fully JVM-side."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(_BPE_PATTERN), 0)
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_bpe"),
    )


@register(
    "text_train_test_split",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN {sql_md5_long("'split:' || CAST(doc_id AS VARCHAR)")}
                     % 100 < 80
                THEN 'train' ELSE 'test' END AS split
    FROM documents
    """,
)
def text_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/20 train-test split by hashing the document
    id — reproducible across runs, engines, and cluster layouts
    (unlike randomSplit, whose assignment depends on partitioning),
    and stable under corpus growth: a document never changes split.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = md5_long(
        F.concat(F.lit("split:"), F.col("doc_id").cast("string"))
    ) % 100
    return docs.select(
        "doc_id",
        F.when(bucket < 80, F.lit("train")).otherwise(F.lit("test")).alias(
            "split"
        ),
    )


@register(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           {sql_md5_long("regexp_replace(lower(trim(text)), ' +', ' ', 'g')")}
             AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: 60-bit hash of whitespace-normalized text
    (the exact-dedup key at scale: group/join on an 8-byte int instead
    of a multi-KB string)."""
    docs = load_table(spark, sf_dir, "documents")
    normalized = F.regexp_replace(F.lower(F.trim(F.col("text"))), " +", " ")
    return docs.select("doc_id", md5_long(normalized).alias("fingerprint"))
