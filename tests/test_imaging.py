"""Tests for the stdlib image codec (operators/imaging.py) — the real
PNG decode path plus the JPEG header parser and their Spark surface."""

from __future__ import annotations

import random
import struct
import zlib
from binascii import crc32

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from postgres_debezium_clickhouse_spark.operators.imaging import (
    PNG_SIG,
    decode_image,
    decode_images,
    jpeg_dims,
    jpeg_header_bytes,
    png_decode,
    png_encode,
    synth_images,
)


# ---------------------------------------------------------------------------
# pure-Python codec
# ---------------------------------------------------------------------------

@given(
    w=st.integers(1, 9),
    h=st.integers(1, 9),
    ch=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_property(w, h, ch, seed):
    rng = random.Random(seed)
    px = bytes(rng.randrange(256) for _ in range(w * h * ch))
    d = png_decode(png_encode(w, h, px, ch))
    assert (d["width"], d["height"], d["channels"]) == (w, h, ch)
    assert d["pixels"] == px


def test_png_all_filters_exercised():
    # height 5+ → the encoder's y%5 cycle hits filters 0..4; a decoder bug
    # in any un-filter branch corrupts the round trip.
    px = bytes((i * 37) % 256 for i in range(6 * 7 * 3))
    assert png_decode(png_encode(6, 7, px, 3))["pixels"] == px


def test_png_rejects_corrupt_crc():
    blob = bytearray(png_encode(3, 2, bytes(18), 3))
    blob[20] ^= 0xFF  # flip a byte inside IHDR data
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(blob))


def test_png_rejects_bad_signature_and_unsupported():
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"GIF89a" + bytes(32))
    # 16-bit depth: build an IHDR claiming depth 16
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    chunk = struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + struct.pack(
        ">I", crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="bit depth"):
        png_decode(PNG_SIG + chunk)


def test_png_rejects_truncated_idat():
    # valid chunks but IDAT inflates to the wrong size → loud failure
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(
            ">I", crc32(t + d) & 0xFFFFFFFF)

    idat = zlib.compress(bytes(10))  # too short for 4x4 RGB
    blob = PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="size mismatch"):
        png_decode(blob)


def test_jpeg_dims_walks_past_other_segments():
    # APP0 before SOF0 — the walker must skip by segment length
    sof = struct.pack(">BHHB", 8, 33, 44, 3) + b"\x01\x11\x00\x02\x11\x00\x03\x11\x00"
    blob = (b"\xff\xd8"
            + b"\xff\xe0" + struct.pack(">H", 6) + b"JFIF"
            + b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
            + b"\xff\xd9")
    assert jpeg_dims(blob) == {"width": 44, "height": 33, "channels": 3}
    assert jpeg_dims(jpeg_header_bytes(640, 480)) == {
        "width": 640, "height": 480, "channels": 3}


def test_decode_image_dispatch():
    p = decode_image(png_encode(2, 3, bytes(range(18)), 3))
    assert p["format"] == "png" and p["pixels"] is not None
    j = decode_image(jpeg_header_bytes(10, 20))
    assert j["format"] == "jpeg" and j["pixels"] is None
    with pytest.raises(NotImplementedError):
        decode_image(b"RIFF....WEBP")


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

def test_decode_images_matches_closed_form(spark):
    ids = spark.createDataFrame([(d,) for d in range(1, 13)], ["doc_id"])
    out = {r.doc_id: r for r in decode_images(synth_images(ids)).collect()}
    assert len(out) == 12
    for d in range(1, 13):
        r = out[d]
        w, h = 3 + d % 5, 2 + d % 7
        assert (r.width, r.height, r.channels) == (w, h, 3)
        if d % 4 == 0:
            assert r.format == "jpeg" and r.sum_r is None
        else:
            assert r.format == "png"
            assert r.n_pixels == w * h
            for c, col in enumerate(("sum_r", "sum_g", "sum_b")):
                assert getattr(r, col) == sum(
                    (d * 7 + p * 3 + c) % 256 for p in range(w * h))


def test_nn_resize_identity_and_scaling():
    from postgres_debezium_clickhouse_spark.operators.imaging import nn_resize

    # 2×2 RGB: distinct per-pixel values
    px = bytes(range(12))
    assert nn_resize(px, 2, 2, 3, 2, 2) == px            # identity
    up = nn_resize(px, 2, 2, 3, 4, 4)                     # 2× upsample: each src pixel 4×
    assert len(up) == 4 * 4 * 3
    assert up[0:3] == px[0:3] and up[3:6] == px[0:3]      # row 0: sx = 0,0,1,1
    assert up[6:9] == px[3:6] and up[9:12] == px[3:6]
    down = nn_resize(px, 2, 2, 3, 1, 1)                   # downsample keeps top-left
    assert down == px[0:3]


def test_resize_images_real_values_and_deadletter(spark):
    from pyspark.sql import functions as F

    from postgres_debezium_clickhouse_spark.operators.imaging import resize_images

    ids = spark.range(1, 8).withColumnRenamed("id", "doc_id")  # 4 is the only jpeg
    out = {r.doc_id: r for r in resize_images(synth_images(ids), 4, 4).collect()}
    for d, r in out.items():
        w, h = 3 + d % 5, 2 + d % 7
        assert (r.src_w, r.src_h, r.width, r.height) == (w, h, 4, 4)
        if d % 4 == 0:
            assert r.format == "jpeg" and r.sum_r is None
        else:
            exp = [0, 0, 0]
            for y in range(4):
                for x in range(4):
                    sy, sx = y * h // 4, x * w // 4
                    for c in range(3):
                        exp[c] += (d * 7 + (sy * w + sx) * 3 + c) % 256
            assert [r.sum_r, r.sum_g, r.sum_b] == exp

    dl = resize_images(
        synth_images(ids).withColumn(
            "media",
            F.when(F.col("doc_id") == 2, F.expr("substring(media, 1, 20)"))
            .otherwise(F.col("media")),
        ),
        4, 4, strict=False,
    ).collect()
    bad = [r for r in dl if r.doc_id == 2]
    assert len(bad) == 1 and bad[0].err == "truncated PNG chunk"
    assert all(r.err is None for r in dl if r.doc_id != 2)


def test_jpeg_fill_run_to_eof_raises_valueerror():
    # review finding (r6): a blob ending inside a 0xFF fill run indexed
    # past the end and leaked IndexError through the dead-letter catch
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xff")
    with pytest.raises(ValueError):
        jpeg_dims(b"\xff\xd8\xff\xff\xff")
    # a legal fill run before a real marker still parses
    d = jpeg_dims(b"\xff\xd8\xff\xff\xc0" + bytes([0, 17, 8, 0, 2, 0, 3, 3])
                  + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]) + b"\xff\xd9")
    assert (d["width"], d["height"]) == (3, 2)


# ---------------------------------------------------------------------------
# dHash perceptual near-dup (r9)
# ---------------------------------------------------------------------------

def test_dhash_one_pixel_edit_is_near_identical_pure_python():
    """The planted contract at the function level: a one-pixel edit moves
    the dHash by ≤ a few bits; a different image is tens of bits away."""
    from postgres_debezium_clickhouse_spark.operators.imaging import (
        decode_image, dhash_halves, png_encode, rgb_to_gray,
    )

    def make(d, perturb=0):
        w, h = 8 + d % 5, 8 + d % 3
        px = bytes(
            (d * d * 3 + i * i * 7 + i * d + c * 11
             + (perturb if i == 0 else 0)) % 256
            for i in range(w * h) for c in range(3)
        )
        dec = decode_image(png_encode(w, h, px, 3))
        return dhash_halves(rgb_to_gray(dec["pixels"], 3), w, h)

    def ham(a, b):
        return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")

    for d in (1, 4, 13):
        assert ham(make(d), make(d, perturb=128)) <= 2
    assert ham(make(1), make(2)) > 10
    # halves stay inside 32 bits (portability contract with the oracle)
    hi, lo = make(7)
    assert 0 <= hi < (1 << 32) and 0 <= lo < (1 << 32)


def test_dhash_images_deadletters_jpeg(spark):
    """JPEG is header-only decode — no pixels, no hash: strict raises,
    permissive routes to the err column like every other codec gap."""
    import pytest as _pt

    from postgres_debezium_clickhouse_spark.operators.imaging import (
        dhash_images, jpeg_header_bytes, png_encode,
    )

    rows = [
        (1, png_encode(9, 8, bytes(i % 256 for i in range(9 * 8 * 3)), 3)),
        (2, jpeg_header_bytes(4, 4, 3)),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "media"])
    out = {r.doc_id: r.err for r in dhash_images(df, strict=False).collect()}
    assert out[1] is None and "no pixels" in out[2]
    with _pt.raises(Exception):
        dhash_images(df, strict=True).collect()


def test_dhash_near_dups_bands_find_planted_pair(spark):
    from pyspark.sql import functions as F

    from postgres_debezium_clickhouse_spark.operators.imaging import (
        dhash_images, dhash_near_dups, synth_dhash_images,
    )

    base = spark.range(0, 12).select(F.col("id").alias("doc_id"))
    dup = synth_dhash_images(
        base.filter(F.col("doc_id") == 4), perturb=128
    ).withColumn("doc_id", F.col("doc_id") + 1000)
    hashes = dhash_images(synth_dhash_images(base).unionByName(dup))
    pairs = {(r.doc_a, r.doc_b): r.near_dup for r in dhash_near_dups(hashes).collect()}
    assert pairs.get((4, 1004)) is True


def test_dhash_hot_band_cap_bounds_fanout(spark):
    """ADVICE r9 / verdict item 3: a degenerate band value shared by many
    images (solid-color thumbnails → identical dHash, every band hot)
    must NOT fan out k²/2 candidates.  With k=60 identical hashes and
    cap=10 the salted join bounds distinct pairs to ~⌈k/cap⌉·C(cap,2)
    per sub-bucket set — an order of magnitude under C(60,2)=1770 — and
    a planted genuine near-dup pair outside the hot bucket must still be
    found (the cap only slices degenerate buckets, never normal ones)."""
    from pyspark.sql import functions as F

    from postgres_debezium_clickhouse_spark.operators.imaging import (
        dhash_images, dhash_near_dups, synth_dhash_images,
    )

    k, cap = 60, 10
    # the hot cluster: 60 docs with the same (hi, lo) — the solid-color
    # analogue where every one of the 4 band buckets holds all k docs
    hot = spark.range(0, k).select(
        (F.col("id") + 10_000).alias("doc_id"),
        F.lit(0).cast("long").alias("dhash_hi"),
        F.lit(0).cast("long").alias("dhash_lo"),
    )
    # a normal planted near-dup pair, well away from the hot value
    base = spark.range(0, 12).select(F.col("id").alias("doc_id"))
    dup = synth_dhash_images(
        base.filter(F.col("doc_id") == 4), perturb=128
    ).withColumn("doc_id", F.col("doc_id") + 1000)
    normal = dhash_images(synth_dhash_images(base).unionByName(dup)).select(
        "doc_id", "dhash_hi", "dhash_lo"
    )
    out = dhash_near_dups(
        hot.unionByName(normal), max_band_bucket=cap
    ).collect()
    hot_pairs = [r for r in out if r.doc_a >= 10_000 and r.doc_b >= 10_000]
    # uncapped would emit C(60,2)=1770 hot pairs; salted ≈ 6·C(10,2)=270
    assert 0 < len(hot_pairs) <= k * cap // 2 + k
    assert all(r.hamming == 0 and r.near_dup for r in hot_pairs)
    assert any(r.doc_a == 4 and r.doc_b == 1004 and r.near_dup for r in out)


def test_bmp_roundtrip_and_classes():
    """r10: uncompressed 24-bit BMP — exact roundtrip through the
    bottom-up/BGR/padding inversions, top-down variant, dead-letter
    classes for the unsupported shapes."""
    import struct as _st

    from postgres_debezium_clickhouse_spark.operators.imaging import (
        bmp_decode, bmp_encode, decode_image,
    )

    for w, h in ((5, 3), (4, 4), (1, 1), (7, 2)):
        px = bytes((i * 7 + c * 11) % 256 for i in range(w * h) for c in range(3))
        d = decode_image(bmp_encode(w, h, px))
        assert (d["format"], d["width"], d["height"]) == ("bmp", w, h)
        assert d["pixels"] == px
    # top-down (negative height) variant decodes identically
    blob = bytearray(bmp_encode(3, 2, bytes(range(18))))
    _st.pack_into("<i", blob, 22, -2)
    rows = bmp_decode(bytes(bmp_encode(3, 2, bytes(range(18)))))["pixels"]
    flipped = bmp_decode(bytes(blob))["pixels"]
    assert flipped == rows[9:] + rows[:9]       # rows swapped
    import pytest as _pt

    with _pt.raises(ValueError, match="signature"):
        bmp_decode(b"XX" + bytes(60))
    with _pt.raises(ValueError, match="truncated BMP pixel"):
        bmp_decode(bytes(bmp_encode(5, 3, bytes(45)))[:-8])
    b2 = bytearray(bmp_encode(2, 2, bytes(12)))
    _st.pack_into("<H", b2, 28, 8)
    with _pt.raises(NotImplementedError, match="8-bit"):
        bmp_decode(bytes(b2))
    b3 = bytearray(bmp_encode(2, 2, bytes(12)))
    _st.pack_into("<I", b3, 30, 1)
    with _pt.raises(NotImplementedError, match="compressed BMP"):
        bmp_decode(bytes(b3))


def test_tiff_roundtrip_both_orders_and_strips():
    """r10: baseline TIFF — both byte orders, gray + RGB, multi-strip
    assembly, dead-letter classes for compressed/tiled/deep variants."""
    import struct as _st

    import pytest as _pt

    from postgres_debezium_clickhouse_spark.operators.imaging import (
        decode_image, tiff_decode, tiff_encode,
    )

    for w, h, ch in ((6, 5, 3), (4, 7, 1), (1, 1, 3)):
        px = bytes((i * 7 + c * 11) % 256 for i in range(w * h) for c in range(ch))
        for be in (False, True):
            for rps in (None, 2):
                d = decode_image(tiff_encode(w, h, px, ch, big_endian=be,
                                             rows_per_strip=rps))
                assert (d["format"], d["width"], d["height"], d["channels"]) == \
                    ("tiff", w, h, ch)
                assert d["pixels"] == px
    with _pt.raises(ValueError, match="byte-order"):
        tiff_decode(b"XX*\x00" + bytes(20))
    blob = bytearray(tiff_encode(4, 4, bytes(48), 3))
    with _pt.raises(ValueError, match="truncated TIFF"):
        tiff_decode(bytes(blob[:30]))
    # compression 7 (JPEG-in-TIFF) → honest dead-letter (5/32773 decode
    # for real since the LZW/PackBits work — see the matrix test)
    good = tiff_encode(4, 4, bytes(48), 3)
    ifd = _st.unpack_from("<I", good, 4)[0]
    n = _st.unpack_from("<H", good, ifd)[0]
    b2 = bytearray(good)
    for i in range(n):
        base = ifd + 2 + 12 * i
        if _st.unpack_from("<H", b2, base)[0] == 259:
            _st.pack_into("<H", b2, base + 8, 7)
    with _pt.raises(NotImplementedError, match="compression 7"):
        tiff_decode(bytes(b2))


def test_tiff_lzw_packbits_predictor_matrix():
    """r10: TIFF compression 5 (LZW, MSB-first with EarlyChange — whose
    encoder must mirror the decoder's LAGGED table, two off-by-ones
    found by this boundary sweep) and 32773 (PackBits), with and
    without predictor 2 (horizontal differencing), across byte orders
    and strip layouts — exact roundtrips all."""
    import pytest as _pt

    from postgres_debezium_clickhouse_spark.operators.imaging import (
        _tiff_lzw_decode, _tiff_lzw_encode, tiff_decode, tiff_encode,
    )

    for comp in (1, 5, 32773):
        for pred in (1, 2):
            for w, h, ch, be, rps in ((6, 5, 3, False, 2), (4, 7, 1, True, 3),
                                      (20, 15, 3, False, None)):
                px = bytes((i * 7 + c * 11) % 256
                           for i in range(w * h) for c in range(ch))
                d = tiff_decode(tiff_encode(
                    w, h, px, ch, big_endian=be, rows_per_strip=rps,
                    compression=comp, predictor=pred))
                assert d["pixels"] == px, (comp, pred, w, h, ch)
    # LZW width boundaries incl. a 12-bit table reset (large input)
    data = bytes((i * 31 + i // 5) % 48 for i in range(150_000))
    assert _tiff_lzw_decode(_tiff_lzw_encode(data), len(data)) == data
    # corrupt LZW strip → dead-letter class
    good = tiff_encode(8, 8, bytes(192), 3, compression=5)
    with _pt.raises(ValueError):
        tiff_decode(good[:-10])


def test_tiff_fuzz_corruption_never_escapes_deadletter_classes():
    """Same exhaustive-catch contract as JPEG/GIF: corrupt TIFFs across
    the whole compression × predictor matrix may only raise the two
    dead-letter classes (measured CLEAN at 9000 byte-flips + every 11th
    truncation)."""
    import random

    from postgres_debezium_clickhouse_spark.operators.imaging import (
        tiff_decode, tiff_encode,
    )

    px = bytes((i * 7 + c * 11) % 256 for i in range(80) for c in range(3))
    rng = random.Random(5)
    for comp in (1, 5, 32773):
        blob = tiff_encode(10, 8, px, 3, compression=comp, rows_per_strip=3)
        for _ in range(800):
            b = bytearray(blob)
            for _f in range(rng.randint(1, 4)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            try:
                tiff_decode(bytes(b))
            except (ValueError, NotImplementedError):
                pass
        for cut in range(4, len(blob), 11):
            try:
                tiff_decode(blob[:cut])
            except (ValueError, NotImplementedError):
                pass


def test_png_adam7_roundtrip_and_classes():
    """r12 — Adam7 interlace: every pass unfilters as its own image and
    scatters onto the 8x8 grid.  Exact roundtrips across sizes that
    exercise EMPTY passes (width or height too small for a pass's
    origin), channel counts, and the sequential==interlaced pixel
    identity; truncated pass data and bad interlace methods reject as
    ValueError."""
    import random
    import struct
    import zlib
    from binascii import crc32

    from postgres_debezium_clickhouse_spark.operators.imaging import (
        PNG_SIG, _chunk, png_decode, png_encode,
    )

    rng = random.Random(11)
    for (w, h, ch) in [(1, 1, 1), (2, 3, 3), (8, 8, 4), (5, 7, 2),
                       (9, 1, 3), (1, 9, 3), (16, 11, 3)]:
        px = bytes(rng.randrange(256) for _ in range(w * h * ch))
        il = png_decode(png_encode(w, h, px, ch, interlace=1))
        assert il["pixels"] == px, (w, h, ch)
        assert (il["width"], il["height"]) == (w, h)
    # interlace method 2 is not a thing — reject at IHDR
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 2)
    blob = (PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"\x00" * 14))
            + _chunk(b"IEND", b""))
    import pytest
    with pytest.raises(ValueError, match="interlace"):
        png_decode(blob)
    with pytest.raises(ValueError, match="interlace"):
        png_encode(2, 2, b"\x00" * 12, 3, interlace=2)
    # truncated interlaced pass data: re-zip a short stream behind a
    # valid IHDR → size-mismatch ValueError, never a silent partial
    good = png_encode(8, 8, bytes(range(192)), 3, interlace=1)
    # splice a shortened IDAT into the same chunks
    pos, idat_off = 8, None
    while pos + 8 <= len(good):
        (ln,) = struct.unpack(">I", good[pos:pos + 4])
        if good[pos + 4:pos + 8] == b"IDAT":
            idat_off = (pos, ln)
        pos += 12 + ln
    off, ln = idat_off
    raw = zlib.decompress(good[off + 8:off + 8 + ln])
    short = zlib.compress(raw[:-7])
    rebuilt = good[:off] + _chunk(b"IDAT", short) + good[off + 12 + ln:]
    with pytest.raises(ValueError):
        png_decode(rebuilt)


def test_png_text_metadata_roundtrip_all_kinds():
    """r13: tEXt/zTXt/iTXt roundtrip — layouts, the zTXt deflate path,
    and iTXt UTF-8 (non-ASCII) all recovered in file order."""
    from postgres_debezium_clickhouse_spark.operators.imaging import (
        png_encode, png_text_metadata,
    )

    px = bytes(range(18))
    blob = png_encode(3, 2, px, 3, text_chunks=[
        ("text", "Title", "doc 42"),
        ("ztxt", "Comment", "squeezed value"),
        ("itxt", "Description", "en", "résumé é"),
        ("text", "Software", "pdc-spark"),
    ])
    assert png_text_metadata(blob) == [
        ("text", "Title", "doc 42"),
        ("ztxt", "Comment", "squeezed value"),
        ("itxt", "Description", "résumé é"),
        ("text", "Software", "pdc-spark"),
    ]
    # metadata chunks are ancillary: the pixel decode ignores them
    from postgres_debezium_clickhouse_spark.operators.imaging import png_decode
    assert png_decode(blob)["pixels"] == px


def test_png_text_metadata_malformed_loud():
    """r13: every malformed-metadata class normalizes to ValueError —
    the codec fuzz contract."""
    import struct
    import zlib
    from binascii import crc32

    import pytest

    from postgres_debezium_clickhouse_spark.operators.imaging import (
        _chunk, png_encode, png_text_metadata, PNG_SIG,
    )

    def with_chunk(raw: bytes, ctype: bytes) -> bytes:
        base = png_encode(3, 2, bytes(range(18)), 3)
        ihdr_end = 8 + 12 + 13
        return base[:ihdr_end] + _chunk(ctype, raw) + base[ihdr_end:]

    for raw, ctype in [
        (b"NoSeparatorHere", b"tEXt"),          # missing NUL
        (b"\x00value", b"tEXt"),                # empty keyword
        (b"K\x00\x07" + zlib.compress(b"v"), b"zTXt"),   # bad method
        (b"K\x00\x00" + b"not-deflate", b"zTXt"),        # corrupt stream
        (b"K\x00\x05\x00en\x00\x00v", b"iTXt"),          # bad comp flag
        (b"K\x00\x00\x00en", b"iTXt"),                   # missing seps
        (b"K\x00\x00\x00en\x00\x00\xff\xfe", b"iTXt"),   # bad UTF-8
    ]:
        with pytest.raises(ValueError):
            png_text_metadata(with_chunk(raw, ctype))

    # CRC flip inside a valid tEXt chunk
    good = png_encode(3, 2, bytes(range(18)), 3,
                      text_chunks=[("text", "Title", "x")])
    pos = good.index(b"tEXt")
    blob = bytearray(good)
    blob[pos + 6] ^= 0xFF
    with pytest.raises(ValueError):
        png_text_metadata(bytes(blob))

    # 3000-case deterministic byte-flip sweep: ValueError or a clean
    # (possibly altered-text) result — never any other exception type
    ok = 0
    for i in range(3000):
        b = bytearray(good)
        b[i % len(good)] ^= 1 << (i % 8)
        try:
            png_text_metadata(bytes(b))
            ok += 1
        except ValueError:
            pass
    assert ok >= 0  # the sweep's real assertion is "no foreign exception"


def test_jpeg_exif_roundtrip_both_byte_orders():
    """r14: APP1 Exif build → parse round-trip, II and MM, inline and
    out-of-line values, Exif sub-IFD, GPS-absent."""
    from postgres_debezium_clickhouse_spark.operators.imaging import (
        exif_app1_bytes, jpeg_exif_metadata, jpeg_header_bytes,
    )

    base = jpeg_header_bytes(5, 4, 3)
    for be in (False, True):
        app1 = exif_app1_bytes(
            "pdc", "cam 2", 6,
            "2024:03:09 10:41:33", "2023:12:09 08:47:05",
            (1, 250), big_endian=be,
        )
        m = jpeg_exif_metadata(base[:2] + app1 + base[2:])
        assert m["has_exif"] and m["byte_order"] == ("MM" if be else "II")
        assert m["orientation"] == 6 and m["make"] == "pdc"
        assert m["model"] == "cam 2" and m["n_ifd0"] == 5
        assert m["datetime"] == "2024:03:09 10:41:33"
        assert m["datetime_original"] == "2023:12:09 08:47:05"
        assert (m["exposure_num"], m["exposure_den"]) == (1, 250)
        assert m["has_gps"] is False
    # no APP1 at all: absence is data
    m = jpeg_exif_metadata(base)
    assert m["has_exif"] is False and m["orientation"] is None
    # non-JPEG: loud
    import pytest
    with pytest.raises(ValueError):
        jpeg_exif_metadata(b"\x00\x01")


def test_jpeg_exif_fuzz_corruption_never_escapes_valueerror():
    """r14: byte-flip + truncation sweep over an EXIF-bearing JPEG —
    every outcome is a clean parse or ValueError, never a foreign
    exception (the codec fuzz contract)."""
    from postgres_debezium_clickhouse_spark.operators.imaging import (
        exif_app1_bytes, jpeg_exif_metadata, jpeg_header_bytes,
    )

    base = jpeg_header_bytes(5, 4, 3)
    app1 = exif_app1_bytes(
        "pdc", "cam 1", 3, "2024:03:02 10:07:33",
        "2023:12:02 08:14:05", (1, 125), big_endian=True,
    )
    good = base[:2] + app1 + base[2:]
    ok = 0
    for i in range(3000):
        b = bytearray(good)
        b[i % len(good)] ^= 1 << (i % 8)
        try:
            jpeg_exif_metadata(bytes(b))
            ok += 1
        except ValueError:
            pass
    for cut in range(0, len(good), 7):
        try:
            jpeg_exif_metadata(good[:cut])
        except ValueError:
            pass
    assert ok >= 0  # the sweep's real assertion is "no foreign exception"


# ---------------------------------------------------------------- Netpbm

@given(
    w=st.integers(1, 9),
    h=st.integers(1, 9),
    ch=st.sampled_from([1, 3]),
    raw=st.booleans(),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=60, deadline=None)
def test_pnm_roundtrip_property(w, h, ch, raw, seed):
    import random

    from postgres_debezium_clickhouse_spark.operators.imaging import (
        pnm_decode,
        pnm_encode,
    )

    rng = random.Random(seed)
    px = bytes(rng.randrange(256) for _ in range(w * h * ch))
    d = pnm_decode(pnm_encode(w, h, px, ch, raw=raw, comment="x # y"))
    assert (d["width"], d["height"], d["channels"]) == (w, h, ch)
    assert d["pixels"] == px
    assert d["format"] == ("pgm" if ch == 1 else "ppm")


def test_pnm_header_comments_whitespace_and_errors():
    from postgres_debezium_clickhouse_spark.operators.imaging import (
        decode_image,
        pnm_decode,
    )

    # comments legal anywhere whitespace is, incl. between samples
    blob = b"P2 # c1\n# c2\n 2 # dims\n1\n255\n7 # mid\n 9\n# tail\n"
    d = pnm_decode(blob)
    assert d["pixels"] == bytes([7, 9])
    # 16-bit maxval routes to the honest dead-letter class
    with pytest.raises(NotImplementedError, match="16-bit"):
        pnm_decode(b"P5 1 1 65535 \x00\x00")
    # raw payload must match dims exactly
    with pytest.raises(ValueError, match="size mismatch"):
        pnm_decode(b"P6 2 1 255\n" + bytes(5))
    with pytest.raises(ValueError, match="size mismatch"):
        pnm_decode(b"P6 2 1 255\n" + bytes(7))
    # sample above maxval is corruption, not data
    with pytest.raises(ValueError, match="exceeds maxval"):
        pnm_decode(b"P5 1 1 100 \xff")
    with pytest.raises(ValueError, match="trailing"):
        pnm_decode(b"P2 1 1 255 7 junk")
    # dispatch: P2/P5/P3/P6 decode; P1/P4 raise honestly
    assert decode_image(b"P6 1 1 255\n\x01\x02\x03")["format"] == "ppm"
    with pytest.raises(NotImplementedError, match="PBM"):
        decode_image(b"P4 1 1 \x80")


def test_pnm_fuzz_never_escapes_valueerror():
    import random

    from postgres_debezium_clickhouse_spark.operators.imaging import (
        decode_image,
        pnm_encode,
    )

    rng = random.Random(14)
    for raw in (False, True):
        base = pnm_encode(4, 3, bytes((j * 11) % 256 for j in range(36)),
                          3, raw=raw, comment="fuzz")
        for _ in range(1500):
            b = bytearray(base)
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            try:
                decode_image(bytes(b))
            except (ValueError, NotImplementedError):
                pass
        for cut in range(len(base)):
            try:
                decode_image(base[:cut])
            except (ValueError, NotImplementedError):
                pass


def test_synth_netpbm_matches_closed_form(spark):
    from postgres_debezium_clickhouse_spark.operators.imaging import (
        decode_images,
        synth_netpbm_images,
    )

    ids = spark.createDataFrame([(d,) for d in range(1, 13)], ["doc_id"])
    out = {r.doc_id: r for r in
           decode_images(synth_netpbm_images(ids)).collect()}
    for d in range(1, 13):
        r = out[d]
        w, h = 3 + d % 5, 2 + d % 7
        ch = 1 if d % 4 < 2 else 3
        vals = [(d * 7 + i * 3 + c * 5) % 256
                for i in range(w * h) for c in range(ch)]
        assert (r.format, r.width, r.height, r.channels) == (
            "pgm" if ch == 1 else "ppm", w, h, ch)
        assert r.n_pixels == w * h
        assert r.sum_r == sum(vals[0::ch])
        assert (r.sum_g is None) == (ch == 1)
        assert (r.min_px, r.max_px) == (min(vals), max(vals))
