"""Multimodal column plumbing tests (binary payloads + Pandas UDF)."""

from __future__ import annotations

import pandas as pd
import pytest

from map_reduce_server_spark.operators.multimodal import (
    decode_batch,
    decode_payloads,
    with_synthetic_payload,
)
from map_reduce_server_spark.tables import load_table


def test_payload_is_binary_with_metadata(spark, sf_small):
    docs = load_table(spark, sf_small, "documents").limit(5)
    enriched = with_synthetic_payload(docs)
    dtypes = dict(enriched.dtypes)
    assert dtypes["payload"] == "binary"
    row = enriched.first()
    assert len(row.payload) == 32
    assert row.meta.fmt in ("png", "jpeg", "wav")
    assert row.meta.byte_len == 32


def test_decode_real_codecs_are_stubbed():
    pdf = pd.DataFrame({"doc_id": [1], "payload": [b"\x01\x02"], "fmt": ["png"]})
    with pytest.raises(NotImplementedError):
        decode_batch(pdf, fake=False)


def test_resize_is_stubbed(spark, sf_small):
    from map_reduce_server_spark.operators.multimodal import resize_images

    docs = load_table(spark, sf_small, "documents").limit(1)
    with pytest.raises(NotImplementedError, match="resize"):
        resize_images(with_synthetic_payload(docs), 64, 64)


def test_frame_sample_strides_blocks(spark, sf_small):
    from map_reduce_server_spark.operators.multimodal import frame_sample

    docs = load_table(spark, sf_small, "documents").limit(5)
    out = frame_sample(with_synthetic_payload(docs), every_n=2).collect()
    for r in out:
        # 8 blocks of 4 bytes, stride 2 → 4 blocks = 16 bytes
        assert len(r.frames) == 16


def test_decode_fake_path_runs_distributed(spark, sf_small):
    docs = load_table(spark, sf_small, "documents").limit(10)
    decoded = decode_payloads(with_synthetic_payload(docs), fake=True)
    rows = decoded.collect()
    assert len(rows) == 10
    for r in rows:
        assert r.byte_len == 32
        assert 0 <= r.width <= 255
        assert 0 <= r.height <= 255
