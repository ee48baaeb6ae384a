"""Multimodal column plumbing tests — real Spark-side schema/batching,
stubbed decode (no codecs in this container)."""

from __future__ import annotations

import pytest

from postgres_debezium_clickhouse_spark.operators.multimodal import (
    attach_fake_media,
    decode_media,
    extract_features,
    media_byte_stats,
)


def _media(spark):
    docs = spark.createDataFrame([(1, "abcd"), (2, "xyz")], ["doc_id", "text"])
    return attach_fake_media(docs)


def test_attach_media_schema(spark):
    m = _media(spark)
    assert dict(m.dtypes)["media"] == "binary"
    meta = m.first().media_meta
    assert meta.media_type == "image" and meta.uri == "memory://doc/1"


def test_media_byte_stats_no_python(spark):
    out = {r.doc_id: r.n_bytes for r in media_byte_stats(_media(spark)).collect()}
    assert out == {1: 4, 2: 3}


def test_extract_features_deterministic_histogram(spark):
    out = {r.doc_id: r for r in extract_features(_media(spark)).collect()}
    # 'abcd' bytes: 97,98,99,100 → mod4 = 1,2,3,0 → hist [1,1,1,1]/4
    assert out[1].feature == [0.25, 0.25, 0.25, 0.25]
    assert out[1].n_bytes == 4
    assert abs(sum(out[2].feature) - 1.0) < 1e-9


def test_decode_stub_raises(spark):
    with pytest.raises(NotImplementedError):
        decode_media(b"bytes", "image")
