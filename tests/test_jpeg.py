"""Baseline-sequential JPEG codec (r10, verdict item 8) + progressive
(r16, verdict item 1): full T.81 pixel decode — Huffman entropy decode,
dequantize, IDCT, chroma upsampling, restart markers, and the Annex G
progressive process (spectral selection + successive approximation) —
plus the fixture encoders that make the first-principles oracle
possible."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from postgres_debezium_clickhouse_spark.operators.jpeg import (
    AC_CHROMA_BITS, AC_CHROMA_VALS, AC_LUMA_BITS, AC_LUMA_VALS,
    DC_CHROMA_BITS, DC_CHROMA_VALS, DC_LUMA_BITS, DC_LUMA_VALS, ZIGZAG,
    _BitWriter, _canonical_codes, _fdct, _idct,
    jpeg_decode, jpeg_encode_baseline, jpeg_encode_progressive,
)


def _quad_pixels(w, h, ch, seed=0):
    return bytes(
        (seed * 3 + i * i * 7 + i * seed + c * 11) % 256
        for i in range(w * h) for c in range(ch)
    )


def test_dct_is_orthonormal():
    rng = np.random.RandomState(0)
    b = rng.rand(8, 8) * 255
    assert np.abs(_idct(_fdct(b)) - b).max() < 1e-9


@settings(max_examples=15, deadline=None)
@given(
    w=st.integers(1, 24), h=st.integers(1, 20),
    ch=st.sampled_from([1, 3]), seed=st.integers(0, 500),
)
def test_roundtrip_within_float_rounding(w, h, ch, seed):
    px = _quad_pixels(w, h, ch, seed)
    d = jpeg_decode(jpeg_encode_baseline(w, h, px, ch))
    assert (d["width"], d["height"], d["channels"]) == (w, h, ch)
    got = np.frombuffer(d["pixels"], dtype=np.uint8).astype(int)
    exp = np.frombuffer(px, dtype=np.uint8).astype(int)
    # 4 = the analytic quant=1 bound (0.5 coeff rounding × ‖basis‖₁²
    # + output rounding); ±2 was an undersampled first cut
    assert np.abs(got - exp).max() <= 4


def _flat_420_jpeg(w, h, rgb, dri=0, n_mcux=None):
    """Hand-assembled 4:2:0 JPEG of a flat color — every block is
    DC-only, so the stream is exactly derivable: tests the decoder's
    multi-block MCU interleave, chroma upsampling, and (with dri) the
    restart-marker path, none of which the 4:4:4 encoder emits."""
    r, g, b = rgb
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    out = bytearray(b"\xff\xd8")

    def seg(marker, payload):
        out.extend(b"\xff" + bytes([marker]))
        out.extend(struct.pack(">H", len(payload) + 2))
        out.extend(payload)

    seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    seg(0xDB, bytes([0x01]) + bytes([1] * 64))
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([3])
    sof += bytes([1, 0x22, 0])          # Y: 2x2 sampling
    sof += bytes([2, 0x11, 1])          # Cb
    sof += bytes([3, 0x11, 1])          # Cr
    seg(0xC0, bytes(sof))
    for tid, bits, vals in (
        (0x00, DC_LUMA_BITS, DC_LUMA_VALS), (0x10, AC_LUMA_BITS, AC_LUMA_VALS),
        (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS), (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ):
        seg(0xC4, bytes([tid] + bits[1:] + vals))
    if dri:
        seg(0xDD, struct.pack(">H", dri))
    seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    dc_y = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_y = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    def cat(v):
        return int(abs(v)).bit_length()

    mcus_x = -(-w // 16)
    mcus_y = -(-h // 16)
    wr = _BitWriter()
    pred = [0, 0, 0]

    def emit_dc_only(dc, dc_codes, ac_codes, ci):
        diff = dc - pred[ci]
        pred[ci] = dc
        s = cat(diff)
        c, ln = dc_codes[s]
        wr.write(c, ln)
        if s:
            wr.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        c, ln = ac_codes[0x00]          # EOB
        wr.write(c, ln)

    mcu_i = 0
    entropy_parts = []
    for _my in range(mcus_y):
        for _mx in range(mcus_x):
            if dri and mcu_i and mcu_i % dri == 0:
                entropy_parts.append(wr.flush())
                entropy_parts.append(bytes([0xFF, 0xD0 + ((mcu_i // dri - 1) % 8)]))
                wr = _BitWriter()
                pred = [0, 0, 0]
            for _ in range(4):          # 2x2 Y blocks
                emit_dc_only(int(round(8 * (y - 128))), dc_y, ac_y, 0)
            emit_dc_only(int(round(8 * (cb - 128))), dc_c, ac_c, 1)
            emit_dc_only(int(round(8 * (cr - 128))), dc_c, ac_c, 2)
            mcu_i += 1
    entropy_parts.append(wr.flush())
    out.extend(b"".join(entropy_parts))
    out.extend(b"\xff\xd9")
    return bytes(out)


@pytest.mark.parametrize("w,h", [(16, 16), (16, 8), (24, 18)])
def test_decodes_420_subsampled(w, h):
    rgb = (90, 150, 210)
    d = jpeg_decode(_flat_420_jpeg(w, h, rgb))
    assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(h, w, 3).astype(int)
    for c in range(3):
        assert np.abs(got[..., c] - rgb[c]).max() <= 2


def test_decodes_restart_markers():
    d = jpeg_decode(_flat_420_jpeg(48, 16, (200, 40, 120), dri=1))
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(16, 48, 3).astype(int)
    for c, v in enumerate((200, 40, 120)):
        assert np.abs(got[..., c] - v).max() <= 2


def test_unsupported_processes_deadletter_class():
    """r16: SOF2 DECODES now — the dead-letter class is narrowed to
    arithmetic / hierarchical / lossless / 12-bit (verdict item 1)."""
    blob = bytearray(jpeg_encode_baseline(8, 8, _quad_pixels(8, 8, 3), 3))
    i = blob.index(b"\xff\xc0")
    for m in (0xC9, 0xCA, 0xCB):       # arithmetic coding
        blob[i + 1] = m
        with pytest.raises(NotImplementedError, match="non-baseline"):
            jpeg_decode(bytes(blob))
    for m in (0xC3, 0xC5, 0xC6, 0xC7):  # lossless / differential / hier
        blob[i + 1] = m
        with pytest.raises(NotImplementedError, match="non-baseline"):
            jpeg_decode(bytes(blob))
    # a baseline stream REWRITTEN to SOF2 is corrupt (its SOS header is
    # a full-band baseline scan, invalid as a progressive DC scan) —
    # ValueError class, not a silent wrong decode
    blob[i + 1] = 0xC2
    with pytest.raises(ValueError):
        jpeg_decode(bytes(blob))


def test_progressive_roundtrip_matches_baseline_exactly():
    """The progressive entropy path must reconstruct the SAME quantized
    coefficients as the baseline path → bit-identical pixels from both
    encoders, across quant levels (lossy included) and channel counts."""
    rng = np.random.RandomState(16)
    for trial in range(8):
        w, h = int(rng.randint(1, 40)), int(rng.randint(1, 40))
        ch = 3 if trial % 2 else 1
        q = [1, 4, 16][trial % 3]
        px = bytes(rng.randint(0, 256, w * h * ch, dtype=np.uint8))
        db = jpeg_decode(jpeg_encode_baseline(w, h, px, ch, quant=q))
        dp = jpeg_decode(jpeg_encode_progressive(w, h, px, ch, quant=q))
        assert (dp["width"], dp["height"], dp["channels"]) == (w, h, ch)
        assert dp["pixels"] == db["pixels"]


def test_progressive_eob_runs_and_sparse_refinement():
    """Long EOB runs (constant image: every AC block empty → EOBn with
    r>0 across the whole plane) and quant=16 sparsity (AC refinement
    correction bits + newly-significant insertions) decode exactly."""
    w, h = 64, 64
    const = np.full((h, w, 3), 128, np.uint8).tobytes()
    d = jpeg_decode(jpeg_encode_progressive(w, h, const, 3))
    assert d["pixels"] == const
    gx = np.tile(np.arange(w) % 256, (h, 1)).astype(np.uint8)
    grad = np.stack([gx, gx // 2, 255 - gx], -1).astype(np.uint8).tobytes()
    for q in (1, 16):
        db = jpeg_decode(jpeg_encode_baseline(w, h, grad, 3, quant=q))
        dp = jpeg_decode(jpeg_encode_progressive(w, h, grad, 3, quant=q))
        assert dp["pixels"] == db["pixels"]


@settings(max_examples=10, deadline=None)
@given(
    w=st.integers(1, 24), h=st.integers(1, 20),
    ch=st.sampled_from([1, 3]), seed=st.integers(0, 500),
)
def test_progressive_roundtrip_within_float_rounding(w, h, ch, seed):
    px = _quad_pixels(w, h, ch, seed)
    d = jpeg_decode(jpeg_encode_progressive(w, h, px, ch))
    assert (d["width"], d["height"], d["channels"]) == (w, h, ch)
    got = np.frombuffer(d["pixels"], dtype=np.uint8).astype(int)
    exp = np.frombuffer(px, dtype=np.uint8).astype(int)
    assert np.abs(got - exp).max() <= 4  # same analytic quant=1 bound


def test_corruption_is_valueerror_class():
    good = jpeg_encode_baseline(8, 8, _quad_pixels(8, 8, 3), 3)
    with pytest.raises(ValueError, match="truncated JPEG entropy"):
        jpeg_decode(good[:-20])        # cut inside the scan
    with pytest.raises(ValueError, match="bad SOI"):
        jpeg_decode(b"\x00\x00" + good[2:])


def test_decode_image_full_pixels_and_header_only_fallback():
    from postgres_debezium_clickhouse_spark.operators.imaging import (
        decode_image, jpeg_header_bytes,
    )

    px = _quad_pixels(9, 10, 3, seed=4)
    full = decode_image(jpeg_encode_baseline(9, 10, px, 3))
    assert full["format"] == "jpeg" and full["pixels"] is not None
    assert len(full["pixels"]) == 9 * 10 * 3
    hdr = decode_image(jpeg_header_bytes(9, 10, 3))
    assert hdr["pixels"] is None and (hdr["width"], hdr["height"]) == (9, 10)


def test_spark_fixture_roundtrip(spark):
    from pyspark.sql import functions as F

    from postgres_debezium_clickhouse_spark.operators.imaging import (
        jpeg_roundtrip_check, synth_jpeg_images,
    )

    ids = spark.range(0, 30).select(F.col("id").alias("doc_id"))
    out = jpeg_roundtrip_check(synth_jpeg_images(ids)).collect()
    assert len(out) == 30
    for r in out:
        assert r.pixels_ok, r
        assert (r.width, r.height) == (8 + r.doc_id % 5, 8 + r.doc_id % 3)


def test_fuzz_corruption_never_escapes_deadletter_classes():
    """The dead-letter catch (`except (ValueError, NotImplementedError)`)
    must be exhaustive: 1500 random byte-flip corruptions + every 7th
    truncation of a valid stream may fail, but only with those two
    classes — a raw IndexError/StopIteration would crash the executor
    instead of routing to the err column (this sweep originally found
    380 such escapes; jpeg_decode now normalizes them)."""
    import random

    px = _quad_pixels(12, 10, 3, seed=9)
    blob = jpeg_encode_baseline(12, 10, px, 3)
    rng = random.Random(42)
    for _ in range(1500):
        b = bytearray(blob)
        for _f in range(rng.randint(1, 4)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            jpeg_decode(bytes(b))
        except (ValueError, NotImplementedError):
            pass
    for cut in range(1, len(blob), 7):
        try:
            jpeg_decode(blob[:cut])
        except (ValueError, NotImplementedError):
            pass


def test_fuzz_progressive_never_escapes_deadletter_classes():
    """r16: same exhaustiveness sweep over a PROGRESSIVE base stream —
    byte-flips land in scan headers (Ss/Se/Ah/Al), per-scan DHTs, EOB
    runs and refinement bits; only the two dead-letter classes may
    escape."""
    import random

    px = _quad_pixels(12, 10, 3, seed=9)
    blob = jpeg_encode_progressive(12, 10, px, 3)
    rng = random.Random(16)
    for _ in range(1500):
        b = bytearray(blob)
        for _f in range(rng.randint(1, 4)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            jpeg_decode(bytes(b))
        except (ValueError, NotImplementedError):
            pass
    for cut in range(1, len(blob), 7):
        try:
            jpeg_decode(blob[:cut])
        except (ValueError, NotImplementedError):
            pass


def test_progressive_restart_markers_and_eobrun_reset():
    """r16: DRI/RSTn inside PROGRESSIVE scans — hand-assembled 32x8
    grayscale SOF2 stream (DRI=2): the DC-first scan resets its DPCM
    predictor at each restart, the DC-refinement scan realigns its raw
    bit stream, and the AC scan expects a FRESH symbol right after the
    RST (the first interval ends in an exactly-consumed EOB run; block
    2 then carries a REAL coefficient, so any bit misalignment or
    carried-over run state after the marker shows up as wrong pixel
    values, not just a parse difference).  A spec-VALID stream cannot
    carry an EOB run ACROSS a restart (intervals are independently
    decodable), so the decoder's defensive eobrun=0 reset is not
    value-pinnable — this pins everything that is."""
    dc_codes = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    # tiny AC table: EOB0 '0', EOBn r=1 '10', (run0,s6) '110'
    ac_bits = [0] * 17
    ac_bits[1], ac_bits[2], ac_bits[3] = 1, 1, 1
    ac_vals = [0x00, 0x10, 0x06]
    ac_codes = _canonical_codes(ac_bits, ac_vals)

    vals = [100, 120, 140, 160]                   # per-MCU flat gray
    coefs = [round(8 * (v - 128) / 3) for v in vals]   # DC quant = 3

    out = bytearray(b"\xff\xd8")

    def seg(marker, payload):
        out.extend(b"\xff" + bytes([marker]))
        out.extend(struct.pack(">H", len(payload) + 2))
        out.extend(payload)

    q = bytes([3] + [1] * 63)                     # DC=3, AC=1 (zigzag)
    seg(0xDB, bytes([0x00]) + q)
    seg(0xC2, bytes([8]) + struct.pack(">HH", 8, 32) + bytes([1, 1, 0x11, 0]))
    seg(0xC4, bytes([0x00] + DC_LUMA_BITS[1:] + DC_LUMA_VALS))
    seg(0xC4, bytes([0x10] + ac_bits[1:] + ac_vals))
    seg(0xDD, struct.pack(">H", 2))               # DRI = 2

    def cat(v):
        return int(abs(v)).bit_length()

    def emit_dc(wr, diff):
        s = cat(diff)
        c, ln = dc_codes[s]
        wr.write(c, ln)
        if s:
            wr.write(diff if diff >= 0 else diff + (1 << s) - 1, s)

    # scan 1: DC first, Ah=0 Al=1 (values c>>1, DPCM resets at RST)
    seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01]))
    wr = _BitWriter()
    pred = 0
    for i, c in enumerate(coefs):
        if i == 2:
            out.extend(wr.flush())
            out.extend(b"\xff\xd0")               # RST0
            wr = _BitWriter()
            pred = 0
        v1 = c >> 1
        emit_dc(wr, v1 - pred)
        pred = v1
    out.extend(wr.flush())
    # scan 2: AC 1..63 first, Al=0 — interval 1 is one exactly-consumed
    # EOB run (blocks 0,1); after the RST, block 2 opens with a REAL
    # coefficient (+1 at zigzag k=1) so the fresh-symbol expectation is
    # value-observable; block 3 is a plain EOB
    seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00]))
    wr = _BitWriter()
    c2, l2 = ac_codes[0x10]
    wr.write(c2, l2)
    wr.write(0, 1)                                # ext bits: run = 2
    out.extend(wr.flush())
    out.extend(b"\xff\xd1")                       # RST1 (index continues)
    wr = _BitWriter()
    c3, l3 = ac_codes[0x06]
    wr.write(c3, l3)                              # block2: (run 0, s=6)
    wr.write(40, 6)                               # magnitude bits: +40
    c0, l0 = ac_codes[0x00]
    wr.write(c0, l0)                              # EOB for block 2
    wr.write(c0, l0)                              # block 3: empty
    out.extend(wr.flush())
    # scan 3: DC refinement Ah=1 Al=0 — one raw bit per block (c & 1)
    seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10]))
    wr = _BitWriter()
    for i, c in enumerate(coefs):
        if i == 2:
            out.extend(wr.flush())
            out.extend(b"\xff\xd2")               # RST2
            wr = _BitWriter()
        wr.write(c & 1, 1)
    out.extend(wr.flush())
    out.extend(b"\xff\xd9")

    d = jpeg_decode(bytes(out))
    assert (d["width"], d["height"], d["channels"]) == (32, 8, 1)
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(8, 32)
    for i, v in enumerate(vals):
        block = got[:, i * 8:(i + 1) * 8].astype(int)
        if i != 2:
            assert np.abs(block - v).max() <= 1, (i, v, block[0, 0])
    # block 2 carries the post-restart AC coefficient: expected pixels
    # from the same IDCT the decoder uses, natural position (0, 1)
    B = np.zeros((8, 8))
    B[0, 0] = coefs[2] * 3                        # DC quant = 3
    B[0, 1] = 40.0                                # the planted AC, q=1
    exp2 = np.clip(np.round(_idct(B) + 128.0), 0, 255).astype(int)
    assert np.abs(got[:, 16:24].astype(int) - exp2).max() <= 1
    assert exp2.std() > 0                         # genuinely non-flat
