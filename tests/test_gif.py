"""GIF codec (r10): pure-stdlib LZW decode of the third major image
format — lossless, so round trips are byte-exact, unlike JPEG."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from postgres_debezium_clickhouse_spark.operators.gif import (
    _lzw_decode, _lzw_encode, gif_decode, gif_encode,
)

PAL256 = bytes(c for i in range(256) for c in (i, (i * 7) % 256, (i * 13) % 256))


def _expected(pal, idx):
    return b"".join(pal[3 * i:3 * i + 3] for i in idx)


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(1, 40), h=st.integers(1, 30),
    seed=st.integers(0, 999), interlace=st.booleans(),
)
def test_roundtrip_exact(w, h, seed, interlace):
    idx = bytes((5 * seed + 11 * i) % 256 for i in range(w * h))
    d = gif_decode(gif_encode(w, h, idx, PAL256, interlace=interlace))
    assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
    assert d["pixels"] == _expected(PAL256, idx)


def test_lzw_table_growth_and_kwkwk():
    # long runs with a 4-color palette force code-width growth and the
    # KwKwK (code == next_code) branch
    pal = bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255])
    idx = bytes([(i // 7) % 4 for i in range(64 * 64)])
    d = gif_decode(gif_encode(64, 64, idx, pal))
    assert d["pixels"] == _expected(pal, idx)
    # raw LZW round trip across a CLEAR-triggering table overflow
    data = bytes((i * 31 + i // 5) % 4 for i in range(20000))
    assert _lzw_decode(_lzw_encode(data, 2), 2, len(data)) == data


def test_gif89a_extensions_are_skipped():
    blob = bytearray(gif_encode(5, 4, bytes(20), PAL256))
    blob[:6] = b"GIF89a"
    # splice a Graphics Control Extension before the image descriptor
    at = blob.index(0x2C, 13 + 768)
    gce = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])
    spliced = bytes(blob[:at]) + gce + bytes(blob[at:])
    d = gif_decode(spliced)
    assert (d["width"], d["height"]) == (5, 4)
    assert d["pixels"] == _expected(PAL256, bytes(20))


def test_corruption_classes():
    good = gif_encode(6, 6, bytes(range(36)), PAL256)
    with pytest.raises(ValueError, match="signature"):
        gif_decode(b"NOTGIF" + good[6:])
    with pytest.raises(ValueError, match="truncated GIF"):
        gif_decode(good[:20])
    with pytest.raises(ValueError, match="no image frame"):
        gif_decode(good[:13 + 768] + b"\x3b")
    # LZW stream cut mid-codes
    with pytest.raises(ValueError, match="truncated GIF"):
        gif_decode(good[:-8])


def test_decode_image_dispatch_gif():
    from postgres_debezium_clickhouse_spark.operators.imaging import decode_image

    idx = bytes((3 * i) % 256 for i in range(24))
    d = decode_image(gif_encode(6, 4, idx, PAL256))
    assert d["format"] == "gif" and d["pixels"] == _expected(PAL256, idx)


def test_spark_fixture_closed_form(spark):
    from pyspark.sql import functions as F

    from postgres_debezium_clickhouse_spark.operators.imaging import (
        decode_images, synth_gif_images,
    )

    ids = spark.range(0, 25).select(F.col("id").alias("doc_id"))
    out = {r.doc_id: r for r in decode_images(synth_gif_images(ids)).collect()}
    assert len(out) == 25
    for d, r in out.items():
        w, h = 3 + d % 5, 2 + d % 7
        vals = [(5 * d + 11 * i) % 256 for i in range(w * h)]
        assert (r.format, r.width, r.height, r.channels) == ("gif", w, h, 3)
        assert r.sum_r == sum(vals)
        assert r.sum_g == sum((v * 7) % 256 for v in vals)
        assert r.sum_b == sum((v * 13) % 256 for v in vals)


def test_fuzz_corruption_never_escapes_deadletter_classes():
    """Same exhaustive-catch contract as the JPEG fuzz test: corrupt
    GIFs may only raise the two dead-letter classes."""
    import random

    blob = gif_encode(12, 10, bytes((11 * i) % 256 for i in range(120)), PAL256)
    rng = random.Random(7)
    for _ in range(1500):
        b = bytearray(blob)
        for _f in range(rng.randint(1, 4)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            gif_decode(bytes(b))
        except (ValueError, NotImplementedError):
            pass
    for cut in range(1, len(blob), 7):
        try:
            gif_decode(blob[:cut])
        except (ValueError, NotImplementedError):
            pass
