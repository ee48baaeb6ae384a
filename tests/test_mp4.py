"""MP4/ISOBMFF metadata walk (r17): spec-shaped encoder, both mvhd
layouts, dead-letter classes (fragmented/encrypted/corrupt) fuzz-pinned."""

from __future__ import annotations

import random

import pytest

from postgres_debezium_clickhouse_spark.operators.mp4 import (
    mp4_encode_meta_fixture,
    mp4_meta_walk,
)


def test_walk_basic_video_only():
    b = mp4_encode_meta_fixture(
        width=320, height=240, n_video_samples=5,
        duration=2500, timescale=1000, brand="isom",
    )
    m = mp4_meta_walk(b)
    assert m["brand"] == "isom"
    assert m["timescale"] == 1000 and m["duration_ms"] == 2500
    assert (m["width"], m["height"]) == (320, 240)
    assert m["video_codec"] == "avc1" and m["audio_codec"] is None
    assert m["n_tracks"] == 1 and m["n_video_samples"] == 5


def test_walk_audio_track_and_mvhd_v1():
    b = mp4_encode_meta_fixture(
        width=64, height=48, n_video_samples=3,
        duration=1800, timescale=600, brand="mp42",
        video_codec="hvc1", with_audio=True, mvhd_v1=True,
    )
    m = mp4_meta_walk(b)
    assert m["brand"] == "mp42"
    assert m["duration_ms"] == 3000          # 1800 units @ 600/s
    assert m["n_tracks"] == 2
    assert m["video_codec"] == "hvc1" and m["audio_codec"] == "mp4a"
    assert m["n_video_samples"] == 3


def test_deadletter_classes():
    with pytest.raises(ValueError, match="ftyp"):
        mp4_meta_walk(b"\x00" * 32)
    frag = mp4_encode_meta_fixture(32, 32, 2, 1000, fragmented=True)
    with pytest.raises(NotImplementedError, match="fragmented"):
        mp4_meta_walk(frag)
    enc = mp4_encode_meta_fixture(32, 32, 2, 1000, encrypted=True)
    with pytest.raises(NotImplementedError, match="encrypted"):
        mp4_meta_walk(enc)
    # stts/stsz disagreement is corrupt, not silently wrong
    good = bytearray(mp4_encode_meta_fixture(32, 32, 4, 1000))
    stts_off = bytes(good).index(b"stts")
    good[stts_off + 12:stts_off + 16] = (9).to_bytes(4, "big")
    with pytest.raises(ValueError):
        mp4_meta_walk(bytes(good))


def test_fuzz_never_wrong_only_deadletter():
    b = mp4_encode_meta_fixture(48, 32, 3, 1500, with_audio=True)
    rng = random.Random(19)
    for _ in range(3000):
        bb = bytearray(b)
        for _f in range(rng.randint(1, 3)):
            bb[rng.randrange(len(bb))] = rng.randrange(256)
        try:
            mp4_meta_walk(bytes(bb))
        except (ValueError, NotImplementedError):
            pass
    for cut in range(1, len(b), 7):
        try:
            mp4_meta_walk(b[:cut])
        except (ValueError, NotImplementedError):
            pass
