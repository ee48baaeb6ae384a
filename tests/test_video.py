"""Tests for the stdlib Y4M video codec (operators/video.py)."""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from postgres_debezium_clickhouse_spark.operators.video import (
    decode_video,
    decode_video_frames,
    synth_videos,
    y4m_decode,
    y4m_encode,
)


@given(
    w=st.integers(1, 6),
    h=st.integers(1, 6),
    nf=st.integers(1, 5),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=40, deadline=None)
def test_y4m_roundtrip_property(w, h, nf, seed):
    rng = random.Random(seed)
    frames = [bytes(rng.randrange(256) for _ in range(w * h * 3)) for _ in range(nf)]
    d = y4m_decode(y4m_encode(w, h, frames, fps=(30, 1)))
    assert (d["width"], d["height"], d["fps_num"]) == (w, h, 30)
    assert d["frames"] == frames


def test_y4m_rejects_bad_input():
    with pytest.raises(ValueError, match="magic"):
        y4m_decode(b"RIFF....AVI " + bytes(16))
    with pytest.raises(NotImplementedError):
        decode_video(b"\x00\x00\x00\x18ftypmp42")  # mp4 box
    # truncated last frame must raise, not yield wrong stats
    blob = y4m_encode(2, 2, [bytes(12)])
    with pytest.raises(ValueError, match="truncated"):
        y4m_decode(blob[:-3])
    # unsupported subsampling must raise
    with pytest.raises(ValueError, match="subsampling"):
        y4m_decode(b"YUV4MPEG2 W2 H2 F25:1 C420jpeg\n" + b"FRAME\n" + bytes(6))


def test_decode_video_frames_matches_closed_form(spark):
    ids = spark.createDataFrame([(d,) for d in range(1, 9)], ["doc_id"])
    rows = decode_video_frames(synth_videos(ids)).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for d in range(1, 9):
        w, h, nf = 2 + d % 3, 2 + d % 5, 1 + d % 4
        frames = sorted(by_doc[d], key=lambda r: r.frame_index)
        assert len(frames) == nf
        plane = w * h
        for f, r in enumerate(frames):
            assert (r.width, r.height, r.n_frames) == (w, h, nf)
            vals = [(d * 11 + ((f * 3 + p) * plane + k) * 5) % 256
                    for p in range(3) for k in range(plane)]
            assert r.sum_y == sum(vals[:plane])
            assert r.sum_u == sum(vals[plane:2 * plane])
            assert r.sum_v == sum(vals[2 * plane:])
            assert (r.min_b, r.max_b) == (min(vals), max(vals))
