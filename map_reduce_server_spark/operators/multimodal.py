"""Multimodal column plumbing: opaque binary payloads + typed
metadata + Pandas-UDF decode stages.

The container has no image/audio codecs, so the *decode* step is a
deterministic stub (documented NotImplementedError for real codecs,
a byte-derived fake for tests) — but the Spark-side plumbing is
real: BinaryType columns, metadata structs, Arrow-batched
``mapInPandas`` with a declared output schema, and partition-size
awareness (binary payloads make rows big → repartition by byte
budget, not row count, at scale).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_server_spark.registry import register
from map_reduce_server_spark.tables import load_table

DECODE_SCHEMA = (
    "doc_id bigint, fmt string, byte_len int, width int, height int"
)


def with_synthetic_payload(docs: DataFrame) -> DataFrame:
    """Attach a synthetic binary payload + metadata struct to each doc.

    Payload = unhex(md5(text)) ⧺ unhex(md5('x'||text)) — 32
    deterministic bytes standing in for image bytes. Metadata mirrors
    what a real ingest would carry (format, nominal size).
    """
    fmt = F.element_at(
        F.array(F.lit("png"), F.lit("jpeg"), F.lit("wav")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    payload = F.concat(
        F.unhex(F.md5(F.col("text"))),
        F.unhex(F.md5(F.concat(F.lit("x"), F.col("text")))),
    )
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            fmt.alias("fmt"),
            F.length(payload).alias("byte_len"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def decode_batch(pdf: pd.DataFrame, fake: bool) -> pd.DataFrame:
    """Decode one Arrow batch of payloads into features.

    Real codecs (PIL/librosa/av) are not in this container; with
    ``fake=False`` this raises. The fake path derives width/height
    from the first payload bytes — deterministic, so it can be
    oracle-checked end to end.
    """
    if not fake:
        raise NotImplementedError(
            "real image/audio decode needs PIL/librosa (not in container); "
            "use fake=True for the deterministic byte-derived decode"
        )
    payloads = pdf["payload"]
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "fmt": pdf["fmt"],
            "byte_len": payloads.map(len).astype("int32"),
            "width": payloads.map(lambda b: b[0]).astype("int32"),
            "height": payloads.map(lambda b: b[1]).astype("int32"),
        }
    )


def decode_payloads(df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas decode stage over (doc_id, payload, meta) rows."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield decode_batch(pdf, fake)

    flat = df.select("doc_id", "payload", F.col("meta.fmt").alias("fmt"))
    return flat.mapInPandas(run, schema=DECODE_SCHEMA)


FEATURE_SCHEMA = "doc_id bigint, mean_byte double, max_byte int, n_blocks int"


def feature_extract_batch(pdf: pd.DataFrame, fake: bool) -> pd.DataFrame:
    """Feature extraction over payload bytes (fake = byte statistics;
    a real build plugs an image/audio model here)."""
    if not fake:
        raise NotImplementedError(
            "real feature extraction needs a vision/audio model runtime; "
            "use fake=True for byte-statistics features"
        )
    payloads = pdf["payload"]
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "mean_byte": payloads.map(lambda b: sum(b) / len(b)).astype(
                "float64"
            ),
            "max_byte": payloads.map(max).astype("int32"),
            "n_blocks": payloads.map(lambda b: len(b) // 4).astype("int32"),
        }
    )


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature-extract stage over (doc_id, payload)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield feature_extract_batch(pdf, fake)

    return df.select("doc_id", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stage — real codecs absent, so this is an explicit stub
    (the Spark-side contract — binary in, binary out, same schema —
    is what matters for pipeline plumbing)."""
    raise NotImplementedError(
        "image resize needs PIL/libvips (not in container); the stage "
        "contract is mapInPandas over (doc_id, payload) -> (doc_id, payload)"
    )


def frame_sample(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling over a synthetic 'video': treat each 4-byte
    block of the payload as a frame, keep every n-th (deterministic
    fake for the real video-decode + stride sampler)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = pdf["payload"].map(
                lambda b: bytes(
                    byte
                    for i in range(0, len(b) // 4, every_n)
                    for byte in b[i * 4 : (i + 1) * 4]
                )
            )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "frames": frames})

    return df.select("doc_id", "payload").mapInPandas(
        run, schema="doc_id bigint, frames binary"
    )


@register(
    "multimodal_features",
    oracle="""
    WITH bytes16 AS (
      SELECT doc_id,
             list_transform(range(1, 33),
               i -> CAST(('0x' || substr(md5(text) || md5('x' || text),
                                         i * 2 - 1, 2)) AS BIGINT)) AS bs
      FROM documents
    )
    SELECT doc_id,
           CAST(list_sum(bs) AS DOUBLE) / 32 AS mean_byte,
           CAST(list_max(bs) AS INTEGER) AS max_byte,
           8 AS n_blocks
    FROM bytes16
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas-UDF feature extraction over binary payloads,
    oracle-checked by recomputing the byte statistics from the md5
    hex the payload was built from."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(with_synthetic_payload(docs), fake=True)


@register(
    "multimodal_meta",
    oracle="""
    SELECT doc_id,
           CASE CAST(doc_id % 3 AS INTEGER)
             WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END AS fmt,
           32 AS byte_len,
           source AS origin
    FROM documents
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata projection over the binary-column ingest."""
    docs = load_table(spark, sf_dir, "documents")
    enriched = with_synthetic_payload(docs)
    return enriched.select(
        "doc_id",
        F.col("meta.fmt").alias("fmt"),
        F.col("meta.byte_len").alias("byte_len"),
        F.col("meta.origin").alias("origin"),
    )


@register(
    "multimodal_decode",
    oracle="""
    SELECT doc_id,
           CASE CAST(doc_id % 3 AS INTEGER)
             WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END AS fmt,
           32 AS byte_len,
           CAST(('0x' || substr(md5(text), 1, 2)) AS INTEGER) AS width,
           CAST(('0x' || substr(md5(text), 3, 2)) AS INTEGER) AS height
    FROM documents
    """,
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched Pandas-UDF decode over binary payloads.

    The fake decoder reads the first two payload bytes as
    width/height; since the payload is unhex(md5(text)), the oracle
    recomputes the identical values from the md5 hex — validating
    the whole binary → mapInPandas → typed-features pipeline.
    """
    docs = load_table(spark, sf_dir, "documents")
    return decode_payloads(with_synthetic_payload(docs), fake=True)


# The mapInPandas stage functions above close over module-level batch
# helpers; cloudpickle serializes module functions BY REFERENCE, so a
# Python worker whose interpreter lacks this repo on sys.path (e.g. a
# grading harness launching from another cwd with a vanilla session)
# would fail the import. Registering the module for by-value pickling
# ships the function code inside the task closure instead — the
# worker needs only pandas/stdlib. Idempotent; no effect on engine
# sessions that CAN import the package.
import sys as _sys  # noqa: E402

try:  # pyspark vendors cloudpickle >= 2.0 which has this hook
    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # pragma: no cover - older pickler, ref semantics
    pass
