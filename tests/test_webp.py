"""WebP header walk (r17): all three wire variants' bit-packings,
reserved-bit and consistency dead-letter classes fuzz-pinned."""

from __future__ import annotations

import random
import struct

import pytest

from postgres_debezium_clickhouse_spark.operators.webp import (
    webp_encode_meta_fixture,
    webp_meta_walk,
)


def test_lossy_vp8_dims():
    m = webp_meta_walk(webp_encode_meta_fixture("lossy", 33, 27))
    assert m["variant"] == "lossy"
    assert (m["width"], m["height"]) == (33, 27)
    assert m["has_alpha"] is False and m["is_animated"] is False
    assert m["n_frames"] == 1


def test_lossless_vp8l_bitfield():
    for w, h, a in [(1, 1, False), (16383, 1, True), (640, 480, True)]:
        m = webp_meta_walk(webp_encode_meta_fixture("lossless", w, h, alpha=a))
        assert m["variant"] == "lossless"
        assert (m["width"], m["height"], m["has_alpha"]) == (w, h, a)


def test_extended_vp8x_flags_and_animation():
    m = webp_meta_walk(webp_encode_meta_fixture(
        "extended", 120, 90, alpha=True, animated=True, n_frames=4,
        exif=True, icc=True))
    assert m["variant"] == "extended"
    assert (m["width"], m["height"]) == (120, 90)
    assert m["has_alpha"] and m["is_animated"] and m["has_exif"]
    assert m["n_frames"] == 4
    still = webp_meta_walk(webp_encode_meta_fixture("extended", 120, 90))
    assert still["is_animated"] is False and still["n_frames"] == 1


def test_deadletter_classes():
    with pytest.raises(ValueError, match="RIFF/WEBP"):
        webp_meta_walk(b"RIFFxxxxWAVE" + bytes(8))
    b = webp_encode_meta_fixture("lossy", 40, 30)
    # break the VP8 start code
    bad = bytearray(b)
    bad[b.index(b"\x9d\x01\x2a")] = 0x00
    with pytest.raises(ValueError, match="start code"):
        webp_meta_walk(bytes(bad))
    # RIFF size mismatch
    bad2 = bytearray(b)
    bad2[4:8] = struct.pack("<I", len(b))
    with pytest.raises(ValueError, match="RIFF size"):
        webp_meta_walk(bytes(bad2))
    # reserved VP8X flag bits
    bx = bytearray(webp_encode_meta_fixture("extended", 50, 40))
    off = bx.index(b"VP8X") + 8
    bx[off] |= 0x80
    with pytest.raises(ValueError, match="reserved"):
        webp_meta_walk(bytes(bx))
    # animation flag without ANIM chunks
    ba = bytearray(webp_encode_meta_fixture("extended", 50, 40))
    ba[ba.index(b"VP8X") + 8] |= 0x02
    with pytest.raises(ValueError, match="ANIM"):
        webp_meta_walk(bytes(ba))


def test_fuzz_never_wrong_only_deadletter():
    blobs = [
        webp_encode_meta_fixture("lossy", 48, 32),
        webp_encode_meta_fixture("lossless", 64, 40, alpha=True),
        webp_encode_meta_fixture("extended", 100, 80, animated=True,
                                 n_frames=3, exif=True),
    ]
    rng = random.Random(20)
    for b in blobs:
        for _ in range(1000):
            bb = bytearray(b)
            for _f in range(rng.randint(1, 3)):
                bb[rng.randrange(len(bb))] = rng.randrange(256)
            try:
                webp_meta_walk(bytes(bb))
            except ValueError:
                pass
        for cut in range(1, len(b), 5):
            try:
                webp_meta_walk(b[:cut])
            except ValueError:
                pass
