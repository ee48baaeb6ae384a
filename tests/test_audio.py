"""Tests for the stdlib WAV codec (operators/audio.py)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from postgres_debezium_clickhouse_spark.operators.audio import (
    decode_audio,
    decode_waveforms,
    synth_waveforms,
    wav_decode,
    wav_encode,
)


@given(
    n=st.integers(1, 40),
    ch=st.sampled_from([1, 2]),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip_property(n, ch, rate, seed):
    import random

    rng = random.Random(seed)
    samples = [rng.randrange(-32768, 32768) for _ in range(n * ch)]
    d = wav_decode(wav_encode(samples, rate, ch))
    assert (d["channels"], d["sample_rate"], d["n_frames"]) == (ch, rate, n)
    assert d["samples"] == samples


def test_wav_rejects_non_wav_and_bad_width():
    with pytest.raises(ValueError, match="RIFF"):
        wav_decode(b"OggS" + bytes(40))
    with pytest.raises(NotImplementedError):
        decode_audio(b"\xff\xfb" + bytes(16))  # mp3 frame sync


def test_decode_waveforms_matches_closed_form(spark):
    ids = spark.createDataFrame([(d,) for d in range(1, 10)], ["doc_id"])
    out = {r.doc_id: r for r in decode_waveforms(synth_waveforms(ids)).collect()}
    for d in range(1, 10):
        r = out[d]
        n, ch = 20 + d % 50, 2 if d % 3 == 0 else 1
        assert (r.channels, r.sample_rate, r.n_frames) == (ch, 8000 + (d % 4) * 4000, n)
        samples = [((d * 31 + j * 7) % 2003) - 1001 for j in range(n * ch)]
        assert (r.s_sum, r.s_min, r.s_max) == (sum(samples), min(samples), max(samples))


def test_audio_energy_windows_values_and_tail(spark):
    from pyspark.sql import functions as F

    from postgres_debezium_clickhouse_spark.operators.audio import (
        audio_energy_windows,
        synth_waveforms,
    )

    ids = spark.range(0, 6).withColumnRenamed("id", "doc_id")
    out = audio_energy_windows(synth_waveforms(ids), window_frames=16).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for d, rows in by_doc.items():
        ch = 2 if d % 3 == 0 else 1
        nf = 20 + d % 50
        samples = [((d * 31 + j * 7) % 2003) - 1001 for j in range(nf * ch)]
        rows.sort(key=lambda r: r.window_index)
        assert sum(r.n_frames for r in rows) == nf
        assert rows[-1].n_frames == nf - 16 * (len(rows) - 1)  # short tail kept
        for r in rows:
            win = samples[r.window_index * 16 * ch:(r.window_index + 1) * 16 * ch]
            assert r.sq_sum == sum(s * s for s in win)
            assert r.s_peak == max(abs(s) for s in win)

    # dead-letter mode: corrupt blob → one err row, clean docs unaffected
    media = synth_waveforms(ids).withColumn(
        "media",
        F.when(F.col("doc_id") == 3, F.expr("substring(media, 1, 6)"))
        .otherwise(F.col("media")),
    )
    dl = audio_energy_windows(media, window_frames=16, strict=False).collect()
    bad = [r for r in dl if r.doc_id == 3]
    assert len(bad) == 1 and bad[0].err is not None and bad[0].sq_sum is None
    assert all(r.err is None for r in dl if r.doc_id != 3)


def test_g711_expansion_matches_audioop():
    """The ITU G.711 tables, independently pinned: every one of the 256
    mu-law and A-law codes must expand to exactly what the stdlib
    audioop tables say (import-gated: audioop is removed in 3.13)."""
    import struct as _struct

    audioop = pytest.importorskip("audioop")
    from postgres_debezium_clickhouse_spark.operators.audio import (
        alaw_expand, mulaw_expand,
    )

    for b in range(256):
        assert mulaw_expand(b) == _struct.unpack(
            "<h", audioop.ulaw2lin(bytes([b]), 2))[0]
        assert alaw_expand(b) == _struct.unpack(
            "<h", audioop.alaw2lin(bytes([b]), 2))[0]


def test_g711_wav_roundtrip_and_dispatch():
    from postgres_debezium_clickhouse_spark.operators.audio import (
        alaw_expand, decode_audio, mulaw_expand, wav_encode_g711,
    )

    codes = bytes((5 * 3 + 7 * i) % 256 for i in range(50))
    for law, expand, tag_name in (("mulaw", mulaw_expand, 7), ("alaw", alaw_expand, 6)):
        d = decode_audio(wav_encode_g711(codes, law, 8000, 1))
        assert d["format"] == "wav" and d["channels"] == 1
        assert d["sample_rate"] == 8000 and d["n_frames"] == 50
        assert d["samples"] == [expand(b) for b in codes]
    # stereo frame accounting
    d = decode_audio(wav_encode_g711(codes, "mulaw", 16000, 2))
    assert d["channels"] == 2 and d["n_frames"] == 25
    # PCM files still take the stdlib path untouched
    from postgres_debezium_clickhouse_spark.operators.audio import wav_encode

    d = decode_audio(wav_encode([1, -2, 3], 8000, 1))
    assert d["samples"] == [1, -2, 3]


def test_g711_unsupported_tag_and_truncation():
    import struct as _struct

    from postgres_debezium_clickhouse_spark.operators.audio import (
        wav_decode, wav_encode_g711,
    )

    blob = bytearray(wav_encode_g711(bytes(10), "mulaw"))
    i = blob.index(b"fmt ") + 8
    _struct.pack_into("<H", blob, i, 3)         # IEEE float: unsupported
    with pytest.raises(NotImplementedError, match="format tag 3"):
        wav_decode(bytes(blob))
    with pytest.raises(ValueError, match="truncated chunk"):
        wav_decode(bytes(wav_encode_g711(bytes(10), "mulaw"))[:-4])


def test_ima_adpcm_decode_blocks_and_stereo():
    """IMA ADPCM (tag 0x11): the state machine, multi-block mono, and
    the stereo 4-byte-group interleave, against a hand-run reference."""
    from postgres_debezium_clickhouse_spark.operators.audio import (
        decode_audio, ima_adpcm_step, wav_encode_ima_adpcm,
    )

    nibs = [(3 + 5 * j) % 16 for j in range(16)]
    d = decode_audio(wav_encode_ima_adpcm([nibs], [100], [20]))
    pred, idx = 100, 20
    exp = [100]
    for nb in nibs:
        pred, idx = ima_adpcm_step(pred, idx, nb)
        exp.append(pred)
    assert d["samples"] == exp and d["n_frames"] == 17 and d["channels"] == 1
    # stereo: channels decode independently, output interleaved
    d2 = decode_audio(wav_encode_ima_adpcm(
        [nibs, nibs[::-1]], [100, -200], [20, 5]))
    assert d2["channels"] == 2 and d2["n_frames"] == 17
    assert d2["samples"][0::2][0] == 100 and d2["samples"][1::2][0] == -200
    l_pred, l_idx = 100, 20
    r_pred, r_idx = -200, 5
    for j in range(16):
        l_pred, l_idx = ima_adpcm_step(l_pred, l_idx, nibs[j])
        r_pred, r_idx = ima_adpcm_step(r_pred, r_idx, nibs[::-1][j])
        assert d2["samples"][2 + 2 * j] == l_pred
        assert d2["samples"][3 + 2 * j] == r_pred
    # clamping: max-magnitude nibbles from a saturated predictor stay int16
    d3 = decode_audio(wav_encode_ima_adpcm([[7] * 8], [32700], [88]))
    assert max(d3["samples"]) <= 32767
    d4 = decode_audio(wav_encode_ima_adpcm([[15] * 8], [-32700], [88]))
    assert min(d4["samples"]) >= -32768
    # corruption classes
    import struct as _struct

    blob = bytearray(wav_encode_ima_adpcm([nibs], [0], [0]))
    i = blob.index(b"data") + 8 + 2
    blob[i] = 89                              # step index out of range
    with pytest.raises(ValueError, match="step index"):
        decode_audio(bytes(blob))


def test_ms_adpcm_decode_and_stereo():
    """MS ADPCM (tag 2): two-tap predictor state machine with truncating
    division, block header history samples (s2 then s1 lead the
    output), stereo nibble interleave, against a hand-run reference."""
    from postgres_debezium_clickhouse_spark.operators.audio import (
        MSADPCM_COEFFS, decode_audio, msadpcm_step, wav_encode_ms_adpcm,
    )

    nibs = [(5 + 3 * j) % 16 for j in range(12)]
    d = decode_audio(wav_encode_ms_adpcm([nibs], [1], [300], [1000], [-500]))
    s1, s2, delta = 1000, -500, 300
    c1, c2 = MSADPCM_COEFFS[1]
    exp = [-500, 1000]
    for nb in nibs:
        samp, _, delta = msadpcm_step(s1, s2, delta, c1, c2, nb)
        s2, s1 = s1, samp
        exp.append(samp)
    assert d["samples"] == exp and d["n_frames"] == 14
    d2 = decode_audio(wav_encode_ms_adpcm(
        [nibs, nibs[::-1]], [0, 3], [256, 400], [100, 200], [-100, -200]))
    assert d2["channels"] == 2 and d2["samples"][:4] == [-100, -200, 100, 200]
    # negative-predictor truncating division is the subtle bit: -255//256
    # must be 0 (C semantics), not -1 (python floor)
    from postgres_debezium_clickhouse_spark.operators.audio import _trunc_div

    assert _trunc_div(-255, 256) == 0 and _trunc_div(-257, 256) == -1
    # corruption class
    blob = bytearray(wav_encode_ms_adpcm([nibs], [1], [300], [0], [0]))
    i = blob.index(b"data") + 8
    blob[i] = 9                                  # coef index out of range
    with pytest.raises(ValueError, match="coefficient index"):
        decode_audio(bytes(blob))

# ---------------------------------------------------------------- AIFF

@given(
    n=st.integers(1, 40),
    ch=st.sampled_from([1, 2]),
    rate=st.sampled_from([8000, 11025, 44100, 192000]),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=40, deadline=None)
def test_aiff_roundtrip_property(n, ch, rate, seed):
    import random

    from postgres_debezium_clickhouse_spark.operators.audio import (
        aiff_decode,
        aiff_encode,
    )

    rng = random.Random(seed)
    samples = [rng.randrange(-32768, 32768) for _ in range(n * ch)]
    d = aiff_decode(aiff_encode(samples, rate, ch))
    assert (d["channels"], d["sample_rate"], d["n_frames"]) == (ch, rate, n)
    assert d["samples"] == samples


def test_aiff_f80_field_and_dispatch():
    """The 80-bit extended-float rate field: exact for integer rates
    (incl. odd mantissas), rejects fractional/zero/negative; dispatch
    routes FORM/AIFF for real and FORM/AIFC to the honest
    NotImplementedError."""
    import struct

    from postgres_debezium_clickhouse_spark.operators.audio import (
        _f80_decode,
        _f80_encode,
        aiff_decode,
        aiff_encode,
    )

    for rate in (1, 7, 8000, 11025, 44100, 48000, 96001, 2**30):
        assert _f80_decode(_f80_encode(rate)) == rate
    # 44100.5: exponent 15, mantissa with a sub-integer bit set
    e = 15
    mant = (44100 << (63 - e)) | (1 << (63 - e - 1))
    with pytest.raises(ValueError, match="non-integer"):
        _f80_decode(struct.pack(">HQ", 16383 + e, mant))
    with pytest.raises(ValueError, match="zero"):
        _f80_decode(struct.pack(">HQ", 16383, 0))
    with pytest.raises(ValueError, match="negative"):
        _f80_decode(struct.pack(">HQ", 0x8000 | (16383 + e), 44100 << 48))
    blob = aiff_encode([1, -2, 3], 8000, 1)
    assert decode_audio(blob)["format"] == "aiff"
    with pytest.raises(NotImplementedError, match="AIFF-C"):
        decode_audio(blob[:8] + b"AIFC" + blob[12:])


def test_aiff_chunk_walk_padding_and_mismatch():
    """IFF even-padding: an odd-sized ANNO chunk before COMM must be
    skipped with its pad byte; COMM frames vs SSND payload mismatch
    raises (truncation cannot silently agree)."""
    import struct

    from postgres_debezium_clickhouse_spark.operators.audio import (
        aiff_decode,
        aiff_encode,
    )

    base = aiff_encode([5, 6, 7], 22050, 1)
    # splice an odd-length ANNO chunk right after the FORM type
    anno = b"ANNO" + struct.pack(">I", 3) + b"abc" + b"\x00"
    spliced = base[:12] + anno + base[12:]
    spliced = spliced[:4] + struct.pack(">I", len(spliced) - 8) + spliced[8:]
    d = aiff_decode(spliced)
    assert d["samples"] == [5, 6, 7] and d["sample_rate"] == 22050
    # drop the last sample's bytes: SSND no longer matches COMM
    with pytest.raises(ValueError, match="truncated chunk|size mismatch"):
        aiff_decode(base[:-2])


def test_aiff_fuzz_never_escapes_valueerror():
    """The dead-letter contract under corruption: byte flips and
    truncations over a valid AIFF must normalize to ValueError /
    NotImplementedError — never struct.error or an index crash."""
    import random

    from postgres_debezium_clickhouse_spark.operators.audio import (
        aiff_encode,
    )

    rng = random.Random(14)
    base = aiff_encode([((j * 7) % 200) - 100 for j in range(24)], 11025, 2)
    for _ in range(3000):
        b = bytearray(base)
        b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        try:
            decode_audio(bytes(b))
        except (ValueError, NotImplementedError):
            pass
    for cut in range(len(base)):
        try:
            decode_audio(base[:cut])
        except (ValueError, NotImplementedError):
            pass


def test_decode_aiff_waveforms_matches_closed_form(spark):
    from postgres_debezium_clickhouse_spark.operators.audio import (
        synth_aiff_waveforms,
    )

    ids = spark.createDataFrame([(d,) for d in range(1, 10)], ["doc_id"])
    out = {r.doc_id: r for r in
           decode_waveforms(synth_aiff_waveforms(ids)).collect()}
    for d in range(1, 10):
        r = out[d]
        n, ch = 18 + d % 41, 2 if d % 4 == 0 else 1
        assert (r.format, r.channels, r.sample_rate, r.n_frames) == (
            "aiff", ch, 11025 * (1 + d % 3), n)
        samples = [((d * 37 + j * 11) % 1999) - 999 for j in range(n * ch)]
        assert (r.s_sum, r.s_min, r.s_max) == (
            sum(samples), min(samples), max(samples))


def test_mp3_meta_walk_and_deadletter_classes():
    """r16 (verdict item 8): frame-accurate MP3 metadata walk — ID3v2.3
    tags, CBR/VBR detection, Xing frame count, exact duration — and the
    corrupt/unsupported paths stay in the two dead-letter classes
    (sample decode itself still raises honestly in decode_audio)."""
    import random

    import pytest as _pytest

    from postgres_debezium_clickhouse_spark.operators.audio import (
        decode_audio,
        mp3_encode_meta_fixture,
        mp3_meta_walk,
    )

    blob = mp3_encode_meta_fixture(
        7, sr_index=2, mono=False, vbr=True,
        tags={"TIT2": "t", "TPE1": "a", "TALB": "b"},
    )
    m = mp3_meta_walk(blob)
    assert m["n_frames"] == 7 and m["xing_frames"] == 7
    assert m["bitrate_mode"] == "VBR" and m["sample_rate"] == 32000
    assert m["duration_ms"] == 7 * 1152 * 1000 // 32000
    assert m["tags"] == {"TIT2": "t", "TPE1": "a", "TALB": "b"}
    cbr = mp3_meta_walk(mp3_encode_meta_fixture(5))
    assert cbr["bitrate_mode"] == "CBR" and cbr["xing_frames"] is None
    assert (cbr["kbps_min"], cbr["kbps_max"]) == (128, 128)
    # sample decode is still honest about mp3
    with _pytest.raises(NotImplementedError):
        decode_audio(blob)
    # dead-letter classes: truncation ladder + byte flips
    for cut in range(1, len(blob), 11):
        try:
            mp3_meta_walk(blob[:cut])
        except (ValueError, NotImplementedError):
            pass
    rng = random.Random(16)
    for _ in range(1500):
        b = bytearray(blob)
        for _f in range(rng.randint(1, 3)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            mp3_meta_walk(bytes(b))
        except (ValueError, NotImplementedError):
            pass


def test_flac_meta_walk_and_deadletter_classes():
    """r16: FLAC STREAMINFO bit-unpacking (20/3/5/36-bit fields) +
    VORBIS_COMMENT tags; corrupt streams stay in the ValueError class."""
    import random

    import pytest as _pytest

    from postgres_debezium_clickhouse_spark.operators.audio import (
        flac_encode_meta_fixture,
        flac_meta_walk,
    )

    b = flac_encode_meta_fixture(96000, 2, 12345678901,  # >32-bit samples
                                 {"TITLE": "x", "ARTIST": "y"},
                                 bits_per_sample=24)
    m = flac_meta_walk(b)
    assert m["sample_rate"] == 96000 and m["channels"] == 2
    assert m["bits_per_sample"] == 24
    assert m["total_samples"] == 12345678901          # full 36-bit field
    assert m["duration_ms"] == 12345678901 * 1000 // 96000
    assert m["tags"] == {"TITLE": "x", "ARTIST": "y"}
    with _pytest.raises(ValueError, match="magic"):
        flac_meta_walk(b"fLaX" + b[4:])
    for cut in range(1, len(b), 3):
        try:
            flac_meta_walk(b[:cut])
        except ValueError:
            pass
    rng = random.Random(16)
    for _ in range(1500):
        bb = bytearray(b)
        bb[rng.randrange(len(bb))] = rng.randrange(256)
        try:
            flac_meta_walk(bytes(bb))
        except (ValueError, NotImplementedError):
            pass


def test_mp3_info_tag_is_cbr():
    """r16 review: LAME writes 'Info' (same structure as 'Xing') on CBR
    streams — the tag carries the frame count but must not flip
    bitrate_mode to VBR."""
    from postgres_debezium_clickhouse_spark.operators.audio import (
        mp3_encode_meta_fixture,
        mp3_meta_walk,
    )

    blob = bytearray(mp3_encode_meta_fixture(6, vbr=False))
    # plant an 'Info' header in the first frame's side-info region
    xoff = 4 + 32                     # MPEG1 stereo
    blob[xoff:xoff + 4] = b"Info"
    blob[xoff + 4:xoff + 8] = (0x01).to_bytes(4, "big")
    blob[xoff + 8:xoff + 12] = (6).to_bytes(4, "big")
    m = mp3_meta_walk(bytes(blob))
    assert m["bitrate_mode"] == "CBR" and m["xing_frames"] == 6


def test_mp3_trailing_id3v1_tag_terminates_walk_cleanly():
    # r16 ADVICE: a trailing 128-byte ID3v1 block ('TAG' + fields) is
    # extremely common on real MP3s and must not dead-letter as a lost
    # frame sync; same for the 227-byte ID3v1 extended block ('TAG+'
    # immediately before the ID3v1 tag).
    from postgres_debezium_clickhouse_spark.operators.audio import (
        mp3_encode_meta_fixture,
        mp3_meta_walk,
    )

    base = mp3_encode_meta_fixture(7, tags={"TIT2": "t"})
    ref = mp3_meta_walk(base)
    id3v1 = b"TAG" + b"\x00" * 125
    m = mp3_meta_walk(base + id3v1)
    assert m["n_frames"] == ref["n_frames"] == 7
    assert m["duration_ms"] == ref["duration_ms"]
    ext = b"TAG+" + b"\x00" * 223
    m2 = mp3_meta_walk(base + ext + id3v1)
    assert m2["n_frames"] == 7
    # a tag-only blob (zero frames) still dead-letters honestly
    import pytest as _pytest
    with _pytest.raises(ValueError, match="no MPEG frames"):
        mp3_meta_walk(id3v1)
    # mid-stream 'TAG' bytes that are NOT a trailing block still raise
    with _pytest.raises(ValueError):
        mp3_meta_walk(base + id3v1 + b"junk")


def test_id3v2_utf16_text_frames():
    # r17: enc=1 (UTF-16 with BOM, both endiannesses — the Windows
    # encoder default) and enc=2 (UTF-16BE, v2.4) decode; 16-bit NUL
    # terminates
    from postgres_debezium_clickhouse_spark.operators.audio import (
        id3v2_decode,
        mp3_encode_meta_fixture,
        mp3_meta_walk,
    )

    def frame(fid, enc, payload):
        body = bytes([enc]) + payload
        return (fid.encode() + len(body).to_bytes(4, "big")
                + b"\x00\x00" + body)

    def tag(*frames):
        body = b"".join(frames)
        sz = len(body)
        syncsafe = bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F,
                          (sz >> 7) & 0x7F, sz & 0x7F])
        return b"ID3\x03\x00\x00" + syncsafe + body

    t = tag(
        frame("TIT2", 1, "Tïtle".encode("utf-16")),          # LE BOM
        frame("TPE1", 1, b"\xfe\xff" + "Ärtist".encode("utf-16-be")),  # BE BOM
        frame("TALB", 2, "Albüm".encode("utf-16-be")
              + b"\x00\x00trailing"),                        # NUL-terminated
        frame("TCON", 0, b"Rock"),
    )
    tags, end = id3v2_decode(t)
    assert tags["TIT2"] == "Tïtle"
    assert tags["TPE1"] == "Ärtist"
    assert tags["TALB"] == "Albüm"
    assert tags["TCON"] == "Rock"
    assert end == len(t)
    # rides through the full walk on a real frame stream
    stream = t + mp3_encode_meta_fixture(3)
    m = mp3_meta_walk(stream)
    assert m["tags"]["TIT2"] == "Tïtle" and m["n_frames"] == 3
