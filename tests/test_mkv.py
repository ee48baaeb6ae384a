"""WebM/Matroska EBML metadata walk (r17): varint grammar, both
doctypes, non-default timescale, dead-letter classes fuzz-pinned."""

from __future__ import annotations

import random

import pytest

from postgres_debezium_clickhouse_spark.operators.mkv import (
    mkv_encode_meta_fixture,
    mkv_meta_walk,
)


def test_walk_webm_video_only():
    b = mkv_encode_meta_fixture("webm", 640, 360, duration_ticks=2500.0)
    m = mkv_meta_walk(b)
    assert m["doctype"] == "webm" and m["format"] == "webm"
    assert m["timescale_ns"] == 1_000_000
    assert m["duration_ms"] == 2500
    assert (m["width"], m["height"]) == (640, 360)
    assert m["video_codec"] == "V_VP9" and m["audio_codec"] is None
    assert m["n_tracks"] == 1


def test_walk_mkv_audio_and_custom_timescale():
    # 500_000 ns/tick: 3000 ms = 6000 ticks
    b = mkv_encode_meta_fixture(
        "matroska", 128, 72, duration_ticks=6000.0, timescale_ns=500_000,
        video_codec="V_AV1", audio_codec="A_OPUS")
    m = mkv_meta_walk(b)
    assert m["format"] == "mkv" and m["doctype"] == "matroska"
    assert m["duration_ms"] == 3000
    assert m["n_tracks"] == 2
    assert m["video_codec"] == "V_AV1" and m["audio_codec"] == "A_OPUS"


def test_deadletter_classes():
    with pytest.raises(ValueError, match="EBML"):
        mkv_meta_walk(b"\x00\x01\x02\x03" + bytes(32))
    enc = mkv_encode_meta_fixture("webm", 64, 36, 100.0, encrypted=True)
    with pytest.raises(NotImplementedError, match="encrypted"):
        mkv_meta_walk(enc)
    # unknown-size element (streamed): size varint all-ones
    b = bytearray(mkv_encode_meta_fixture("webm", 64, 36, 100.0))
    seg_id = b.index(bytes.fromhex("18538067"))
    size_pos = seg_id + 4
    width = 8 - b[size_pos].bit_length() + 1
    for i in range(width):
        b[size_pos + i] = 0xFF if i else (b[size_pos] | (0xFF >> width))
    with pytest.raises(NotImplementedError, match="unknown-size"):
        mkv_meta_walk(bytes(b))


def test_fuzz_never_wrong_only_deadletter():
    b = mkv_encode_meta_fixture("webm", 320, 180, 1200.0,
                                audio_codec="A_VORBIS")
    rng = random.Random(21)
    for _ in range(3000):
        bb = bytearray(b)
        for _f in range(rng.randint(1, 3)):
            bb[rng.randrange(len(bb))] = rng.randrange(256)
        try:
            mkv_meta_walk(bytes(bb))
        except (ValueError, NotImplementedError):
            pass
    for cut in range(1, len(b), 3):
        try:
            mkv_meta_walk(b[:cut])
        except (ValueError, NotImplementedError):
            pass


def test_default_timescale_element_absent():
    # r17 second-pass review: the spec-default timescale is now encoded
    # by OMITTING the element, so the walk's absent-element default
    # path carries real fixture coverage
    b = mkv_encode_meta_fixture("webm", 64, 36, duration_ticks=1250.0)
    assert bytes.fromhex("2AD7B1") not in b
    m = mkv_meta_walk(b)
    assert m["timescale_ns"] == 1_000_000 and m["duration_ms"] == 1250
