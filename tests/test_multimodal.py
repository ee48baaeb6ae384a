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


def test_decode_media_dispatch(spark):
    # r5: PNG/JPEG, WAV, and Y4M decode for REAL.  The error contract:
    # recognized-but-malformed blobs raise ValueError (uniformly, across
    # all three modalities); genuinely unsupported formats raise
    # NotImplementedError (honest no-codec guard).
    from postgres_debezium_clickhouse_spark.operators.audio import wav_encode
    from postgres_debezium_clickhouse_spark.operators.imaging import png_encode
    from postgres_debezium_clickhouse_spark.operators.video import y4m_encode

    d = decode_media(png_encode(2, 2, bytes(range(12)), 3), "image")
    assert (d["format"], d["width"], d["height"]) == ("png", 2, 2)
    a = decode_media(wav_encode([1, -2, 3], 8000, 1), "audio")
    assert (a["format"], a["n_frames"], a["samples"]) == ("wav", 3, [1, -2, 3])
    v = decode_media(y4m_encode(1, 1, [bytes([9, 8, 7])]), "video")
    assert (v["format"], len(v["frames"])) == ("y4m", 1)
    # Unknown formats: honest NotImplementedError (no codec in container).
    with pytest.raises(NotImplementedError):
        decode_media(b"not-an-image", "image")
    with pytest.raises(NotImplementedError):
        decode_media(b"ID3\x04mp3-ish-bytes", "audio")
    with pytest.raises(NotImplementedError):
        decode_media(b"\x00\x00\x00 ftypisom", "video")
    # Recognized container, corrupt payload: normalized ValueError.
    with pytest.raises(ValueError):
        decode_media(b"RIFF....WAVE", "audio")  # RIFF missing fmt/data chunks
    with pytest.raises(ValueError):
        decode_media(png_encode(2, 2, bytes(range(12)), 3)[:20], "image")
    with pytest.raises(ValueError):
        decode_media(b"YUV4MPEG2 W2 H2 C444\nFRAME\n\x00", "video")


def test_resize_media_fixed_size(spark):
    from postgres_debezium_clickhouse_spark.operators.multimodal import resize_media

    out = {r.doc_id: r for r in resize_media(_media(spark), width=2, height=3).collect()}
    assert all(len(bytes(r.thumb)) == 6 for r in out.values())  # exact target size
    assert bytes(out[1].thumb)[:4] == b"abcd"  # content-derived, deterministic
    assert (out[1].width, out[1].height) == (2, 3)


def test_sample_frames_expansion(spark):
    from postgres_debezium_clickhouse_spark.operators.multimodal import sample_frames

    frames = sample_frames(_media(spark), n_frames=2).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {1, 2}
    assert [r.frame_index for r in sorted(by_doc[1], key=lambda x: x.frame_index)] == [0, 1]
    # 'abcd' with 2 frames: step 2 → b'ab', b'cd'
    assert [bytes(r.frame) for r in sorted(by_doc[1], key=lambda x: x.frame_index)] == [b"ab", b"cd"]


def test_read_media_from_uris_fetches_file_blobs(spark, tmp_path):
    from postgres_debezium_clickhouse_spark.operators.multimodal import (
        read_media_from_uris,
    )

    blobs = {1: b"\x00\x01binary-one", 2: b"\xffsecond"}
    uris = []
    for k, b in blobs.items():
        p = tmp_path / f"blob{k}.bin"
        p.write_bytes(b)
        uris.append((k, f"file://{p}"))
    df = spark.createDataFrame(uris + [(3, None)], ["doc_id", "uri"])
    out = {r.doc_id: r.media for r in read_media_from_uris(df).collect()}
    assert bytes(out[1]) == blobs[1] and bytes(out[2]) == blobs[2]
    assert out[3] is None


def test_multimodal_pipeline_every_stage_engages(spark):
    """The composed pipeline's four routes must each consume a non-empty
    subset at the smallest fixture — otherwise a gate is dead code and the
    oracle's value check degenerates to pass-through."""
    from postgres_debezium_clickhouse_spark.plans.llm_queries import (
        q_llm_multimodal_pipeline,
    )

    rows = q_llm_multimodal_pipeline(spark, "/root/testdata/sf0.001").collect()
    by_stage = {}
    for r in rows:
        by_stage.setdefault(r.stage, []).append(r)
    assert set(by_stage) == {"deadletter", "too_small", "too_dark", "survived"}
    for r in by_stage["deadletter"]:
        assert r.n_pixels is None and r.shard is None
    for r in by_stage["survived"]:
        assert r.shard is not None and 0 <= r.shard < 8
    for s in ("too_small", "too_dark"):
        assert all(r.shard is None for r in by_stage[s])
