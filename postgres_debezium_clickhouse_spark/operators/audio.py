"""Real audio decode, stdlib-only — the audio half of the multimodal path.

WAV/PCM needs no external codec: the stdlib ``wave`` module parses the
RIFF/fmt/data chunks and ``struct`` unpacks the 16-bit PCM frames.  That
makes the audio modality decodable for REAL in this container, the same
move as the PNG decoder (operators/imaging.py): a deterministic encoder
synthesizes fixtures whose samples are a closed-form function of doc_id,
the decoder runs inside ``mapInPandas``, and a DuckDB oracle recomputes
the integer sample statistics from first principles — so the chunk walk,
frame unpack, and channel handling are value-checked end to end.

Compressed codecs (mp3/aac/flac) genuinely need libraries the container
lacks and raise honestly (swap in soundfile/pyav inside the same batch
loop on real infra).

Scale: decode is embarrassingly parallel (no shuffle); partition by blob
bytes, not rows — see operators/multimodal.py's sizing notes.
"""

from __future__ import annotations

from ._pipe import pipe_map
from .dedup import spread_for_compute as _spread

import io
import struct
import wave
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def wav_encode(samples: list[int], sample_rate: int = 8000, channels: int = 1) -> bytes:
    """Write a real RIFF/WAVE file (16-bit PCM).  ``samples`` are
    interleaved int16 frames (len must be a multiple of ``channels``)."""
    if len(samples) % channels:
        raise ValueError("sample count not a multiple of channels")
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    try:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(b"".join(struct.pack("<h", s) for s in samples))
    finally:
        w.close()
    return buf.getvalue()


def _f80_encode(rate: int) -> bytes:
    """80-bit IEEE 754 extended float, big-endian — the AIFF COMM
    chunk's sampleRate field (the one format oddity AIFF has over
    RIFF): 1 sign bit, 15-bit exponent (bias 16383), 64-bit mantissa
    with an EXPLICIT integer bit (bit 63).  Integer rates encode
    exactly: mantissa = rate << (63 − ⌊log₂ rate⌋)."""
    if rate <= 0:
        raise ValueError("sample rate must be positive")
    e = rate.bit_length() - 1
    return struct.pack(">HQ", 16383 + e, rate << (63 - e))


def _f80_decode(b: bytes) -> int:
    """Inverse of ``_f80_encode`` for the integer rates real AIFF files
    carry; fractional rates raise (wrong stats are worse than no
    stats — the wav_decode posture)."""
    if len(b) != 10:
        raise ValueError("bad 80-bit extended-float field")
    se, mant = struct.unpack(">HQ", b)
    if se & 0x8000:
        raise ValueError("negative sample rate")
    if mant == 0:
        raise ValueError("zero sample rate")
    shift = 63 - (se - 16383)
    if shift < 0:
        return mant << (-shift)
    if shift > 0 and mant & ((1 << shift) - 1):
        raise ValueError("non-integer sample rate unsupported")
    return mant >> shift


def aiff_encode(samples: list[int], sample_rate: int = 8000,
                channels: int = 1) -> bytes:
    """Write a real FORM/AIFF file (16-bit big-endian PCM): COMM
    (channels, numSampleFrames, sampleSize 16, 80-bit-float rate) +
    SSND (offset/blockSize 0, then the interleaved frames)."""
    if len(samples) % channels:
        raise ValueError("sample count not a multiple of channels")
    comm = struct.pack(
        ">hIh", channels, len(samples) // channels, 16
    ) + _f80_encode(sample_rate)
    ssnd = struct.pack(">II", 0, 0) + b"".join(
        struct.pack(">h", s) for s in samples
    )
    chunks = b"COMM" + struct.pack(">I", len(comm)) + comm
    chunks += b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    if len(ssnd) % 2:
        chunks += b"\x00"
    return b"FORM" + struct.pack(">I", 4 + len(chunks)) + b"AIFF" + chunks


def aiff_decode(blob: bytes) -> dict:
    """Decode an AIFF: {channels, sample_rate, n_frames, samples} with
    ``samples`` the interleaved int16 list — the big-endian sibling of
    ``wav_decode`` with the same ValueError normalization contract.
    Chunk sizes are even-padded per the IFF spec; ``n_frames`` comes
    from COMM and is cross-checked against the SSND payload so a
    truncated blob cannot silently agree.  Only 16-bit PCM (plain
    AIFF) is supported; AIFF-C compression types raise in
    ``decode_audio``."""
    if blob[:4] != b"FORM" or blob[8:12] != b"AIFF":
        raise ValueError("not an AIFF (bad FORM/AIFF header)")
    try:
        comm = ssnd = None
        pos = 12
        while pos + 8 <= len(blob):
            cid = blob[pos:pos + 4]
            (sz,) = struct.unpack(">I", blob[pos + 4:pos + 8])
            body = blob[pos + 8:pos + 8 + sz]
            if len(body) != sz:
                raise ValueError("truncated chunk body")
            if cid == b"COMM":
                comm = body
            elif cid == b"SSND":
                ssnd = body
            pos += 8 + sz + (sz & 1)  # IFF even padding
        if comm is None or ssnd is None:
            raise ValueError("missing COMM/SSND chunk")
        if len(comm) < 18:
            raise ValueError("short COMM chunk")
        ch, n, bits = struct.unpack(">hIh", comm[:8])
        rate = _f80_decode(comm[8:18])
        if bits != 16:
            raise ValueError(f"unsupported sample size {bits}-bit")
        if ch <= 0:
            raise ValueError("bad channel count")
        if len(ssnd) < 8:
            raise ValueError("short SSND chunk")
        (off,) = struct.unpack(">I", ssnd[:4])
        data = ssnd[8 + off:8 + off + n * ch * 2]
        if len(data) != n * ch * 2:
            raise ValueError("SSND data size mismatch vs COMM frames")
        samples = list(struct.unpack(f">{n * ch}h", data))
    except (struct.error, EOFError, OverflowError, MemoryError) as e:
        raise ValueError(f"malformed AIFF: {e}") from e
    return {
        "channels": ch,
        "sample_rate": rate,
        "n_frames": n,
        "samples": samples,
    }


def mulaw_expand(b: int) -> int:
    """G.711 µ-law byte → linear int16 (ITU-T G.711, public spec;
    verified bit-exact against the stdlib ``audioop.ulaw2lin`` table in
    tests/test_audio.py).  Closed-form integer arithmetic, so DuckDB
    oracles recompute it exactly."""
    u = ~b & 0xFF
    sign = u & 0x80
    e = (u >> 4) & 7
    m = u & 0x0F
    mag = (((m << 3) + 0x84) << e) - 0x84
    return -mag if sign else mag


def alaw_expand(b: int) -> int:
    """G.711 A-law byte → linear int16 (sign bit SET = negative after
    the 0x55 toggle — audioop-verified)."""
    u = b ^ 0x55
    sign = u & 0x80
    e = (u >> 4) & 7
    m = u & 0x0F
    mag = (m << 4) + 8 if e == 0 else ((m << 4) + 0x108) << (e - 1)
    return mag if sign else -mag


def wav_encode_g711(codes: bytes, law: str, sample_rate: int = 8000,
                    channels: int = 1) -> bytes:
    """Fixture-grade RIFF writer for G.711 streams: format tag 7 (µ-law)
    or 6 (A-law), 8 bits per sample — the telephony WAV variants the
    stdlib ``wave`` module refuses to write."""
    tag = {"mulaw": 7, "alaw": 6}[law]
    fmt = struct.pack(
        "<HHIIHH", tag, channels, sample_rate, sample_rate * channels,
        channels, 8,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(codes)) + codes
        + (b"\x00" if len(codes) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


#: IMA/DVI ADPCM tables (public spec: IMA Digital Audio Pack, 1992;
#: the WAV format-tag-0x11 codec every RIFF reference documents).
IMA_STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
IMA_INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]


def ima_adpcm_step(pred: int, idx: int, nibble: int) -> tuple[int, int]:
    """One IMA ADPCM state-machine step → (new predictor, new index).
    Integer-exact; the DuckDB oracle restates this arithmetic as a
    recursive CTE, so the two engines run the SAME machine."""
    step = IMA_STEP_TABLE[idx]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + IMA_INDEX_TABLE[nibble]))
    return pred, idx


def _ima_decode(data: bytes, ch: int, block_align: int) -> list[int]:
    """Decode an IMA-ADPCM data chunk (MS WAV block layout): per block,
    a 4-byte header per channel (int16 predictor, step index, reserved),
    then interleaved 4-byte (8-nibble) per-channel groups; low nibble
    first.  Returns interleaved int16 samples."""
    if block_align < 4 * ch or (block_align - 4 * ch) % (4 * ch):
        raise ValueError("bad IMA ADPCM block align")
    out: list[int] = []
    for off in range(0, len(data), block_align):
        block = data[off:off + block_align]
        if len(block) < 4 * ch:
            raise ValueError("truncated IMA ADPCM block")
        pred, idx = [], []
        for c in range(ch):
            p = struct.unpack_from("<h", block, 4 * c)[0]
            i = block[4 * c + 2]
            if i > 88:
                raise ValueError("IMA ADPCM step index out of range")
            pred.append(p)
            idx.append(i)
            # the header predictor IS the block's first sample per channel
        out.extend(pred)
        pos = 4 * ch
        chans: list[list[int]] = [[] for _ in range(ch)]
        while pos < len(block):
            for c in range(ch):
                group = block[pos:pos + 4]
                if len(group) < 4:
                    raise ValueError("truncated IMA ADPCM group")
                for byte in group:
                    for nib in (byte & 0x0F, byte >> 4):
                        pred[c], idx[c] = ima_adpcm_step(pred[c], idx[c], nib)
                        chans[c].append(pred[c])
                pos += 4
        for j in range(len(chans[0])):
            for c in range(ch):
                out.append(chans[c][j])
    return out


#: MS ADPCM tables (public spec: Microsoft WAVE ADPCM, multimedia
#: standards update 1994; the other compressed tag real RIFF files use).
MSADPCM_COEFFS = [(256, 0), (512, -256), (0, 0), (192, 64), (240, 0),
                  (460, -208), (392, -232)]
MSADPCM_ADAPT = [230, 230, 230, 230, 307, 409, 512, 614,
                 768, 614, 512, 409, 307, 230, 230, 230]


def msadpcm_step(s1: int, s2: int, delta: int, coef1: int, coef2: int,
                 nibble: int) -> tuple[int, int, int]:
    """One MS ADPCM step → (new sample, new s1-shifted-to-s2 handled by
    caller, new delta).  Returns (sample, sample, new_delta) pieces:
    caller shifts s2←s1, s1←sample.  Signed 4-bit nibble; both engines
    (this and the DuckDB recursive-CTE oracle) run identical integer
    arithmetic: floor-toward-minus-infinity division via arithmetic
    shift semantics is avoided — the spec uses TRUNCATING ``/ 256`` and
    ``/ 256`` on the adapt step, matched with int() semantics here and
    DuckDB's ``//`` carefully (predictor term can be negative, so we
    use truncation explicitly on both sides)."""
    signed = nibble - 16 if nibble >= 8 else nibble
    pred = _trunc_div(s1 * coef1 + s2 * coef2, 256) + signed * delta
    pred = max(-32768, min(32767, pred))
    delta = _trunc_div(MSADPCM_ADAPT[nibble] * delta, 256)
    if delta < 16:
        delta = 16
    return pred, pred, delta


def _trunc_div(a: int, b: int) -> int:
    """C-style truncating integer division (toward zero) — what the MS
    ADPCM reference code's ``/`` does; Python's ``//`` floors, which
    differs on negatives."""
    q = abs(a) // b
    return -q if a < 0 else q


def _msadpcm_decode(data: bytes, ch: int, block_align: int) -> list[int]:
    """Decode an MS-ADPCM data chunk: per block and channel, a 7-byte
    header (coef index, initial delta int16, sample1 int16, sample2
    int16 — interleaved by channel per spec field order), the first TWO
    output samples per channel being sample2 then sample1, then one
    4-bit nibble per sample, high nibble first, channels interleaved
    nibble-by-nibble."""
    hdr = 7 * ch
    if block_align <= hdr:
        raise ValueError("bad MS ADPCM block align")
    out: list[int] = []
    for off in range(0, len(data), block_align):
        block = data[off:off + block_align]
        if len(block) < hdr:
            raise ValueError("truncated MS ADPCM block")
        pred_idx = [block[c] for c in range(ch)]
        if any(i >= len(MSADPCM_COEFFS) for i in pred_idx):
            raise ValueError("MS ADPCM coefficient index out of range")
        delta = [struct.unpack_from("<h", block, ch + 2 * c)[0] for c in range(ch)]
        s1 = [struct.unpack_from("<h", block, 3 * ch + 2 * c)[0] for c in range(ch)]
        s2 = [struct.unpack_from("<h", block, 5 * ch + 2 * c)[0] for c in range(ch)]
        # first two decoded samples per channel are sample2 then sample1
        for c in range(ch):
            out.append(s2[c])
        for c in range(ch):
            out.append(s1[c])
        chans: list[list[int]] = [[] for _ in range(ch)]
        nib_i = 0
        for byte in block[hdr:]:
            for nib in (byte >> 4, byte & 0x0F):
                c = nib_i % ch
                coef1, coef2 = MSADPCM_COEFFS[pred_idx[c]]
                samp, _, delta[c] = msadpcm_step(
                    s1[c], s2[c], delta[c], coef1, coef2, nib
                )
                s2[c], s1[c] = s1[c], samp
                chans[c].append(samp)
                nib_i += 1
        for j in range(len(chans[0])):
            for c in range(ch):
                if j < len(chans[c]):
                    out.append(chans[c][j])
    return out


def wav_encode_ms_adpcm(nibbles_per_chan: list[list[int]],
                        coef_idx: list[int], deltas: list[int],
                        s1s: list[int], s2s: list[int],
                        sample_rate: int = 8000) -> bytes:
    """Fixture-grade MS-ADPCM WAV writer: one block, explicit header
    state, nibble streams given directly (closed form for the oracle).
    Per-channel nibble counts must match; total nibbles must be even."""
    ch = len(nibbles_per_chan)
    n = len(nibbles_per_chan[0])
    if any(len(x) != n for x in nibbles_per_chan) or (n * ch) % 2:
        raise ValueError("per-channel nibble counts must match; total even")
    block = bytearray()
    block.extend(coef_idx[c] for c in range(ch))
    for c in range(ch):
        block.extend(struct.pack("<h", deltas[c]))
    for c in range(ch):
        block.extend(struct.pack("<h", s1s[c]))
    for c in range(ch):
        block.extend(struct.pack("<h", s2s[c]))
    flat = []
    for j in range(n):
        for c in range(ch):
            flat.append(nibbles_per_chan[c][j] & 0x0F)
    for k in range(0, len(flat), 2):
        block.append((flat[k] << 4) | flat[k + 1])
    block_align = len(block)
    samples_per_block = 2 + n
    fmt = struct.pack(
        "<HHIIHHHHH", 2, ch, sample_rate,
        sample_rate * block_align // samples_per_block, block_align, 4,
        4, samples_per_block, len(MSADPCM_COEFFS),
    )
    for c1, c2 in MSADPCM_COEFFS:
        fmt += struct.pack("<hh", c1, c2)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(block)) + bytes(block)
        + (b"\x00" if len(block) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_encode_ima_adpcm(nibbles_per_chan: list[list[int]],
                         predictors: list[int], indexes: list[int],
                         sample_rate: int = 8000) -> bytes:
    """Fixture-grade IMA-ADPCM WAV writer: ONE block, explicit initial
    state, nibble streams given directly (a closed form the oracle can
    restate — encoding from PCM would hide the state machine behind an
    encoder's choices).  Per-channel nibble counts must be equal and a
    multiple of 8 (whole 4-byte groups)."""
    ch = len(nibbles_per_chan)
    n = len(nibbles_per_chan[0])
    if any(len(x) != n for x in nibbles_per_chan) or n % 8:
        raise ValueError("per-channel nibble counts must match and be ×8")
    block = bytearray()
    for c in range(ch):
        block.extend(struct.pack("<h", predictors[c]))
        block.extend([indexes[c], 0])
    for g in range(0, n, 8):
        for c in range(ch):
            nibs = nibbles_per_chan[c][g:g + 8]
            for k in range(0, 8, 2):
                block.append((nibs[k] & 0x0F) | ((nibs[k + 1] & 0x0F) << 4))
    block_align = len(block)
    samples_per_block = 1 + n
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, ch, sample_rate,
        sample_rate * block_align // samples_per_block, block_align, 4,
        2, samples_per_block,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(block)) + bytes(block)
        + (b"\x00" if len(block) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _g711_decode(blob: bytes) -> dict | None:
    """Manual RIFF walk for the compressed WAV format tags the stdlib
    ``wave`` module cannot parse: 6 = A-law, 7 = µ-law (G.711 tables),
    0x11 = IMA/DVI ADPCM, 2 = MS ADPCM (r10 — both block-structured
    state machines).
    Returns None when the fmt chunk says plain PCM (tag 1) so the
    stdlib path keeps handling it."""
    i = 12
    fmt = data = None
    while i + 8 <= len(blob):
        cid = blob[i:i + 4]
        (sz,) = struct.unpack("<I", blob[i + 4:i + 8])
        chunk = blob[i + 8:i + 8 + sz]
        if len(chunk) != sz:
            raise ValueError("malformed WAV: truncated chunk")
        if cid == b"fmt ":
            fmt = chunk
        elif cid == b"data":
            data = chunk
        i += 8 + sz + (sz & 1)
    if fmt is None or len(fmt) < 16:
        raise ValueError("malformed WAV: no fmt chunk")
    tag, ch, rate = struct.unpack("<HHI", fmt[:8])
    if tag == 1:
        return None
    if tag not in (2, 6, 7, 0x11):
        raise NotImplementedError(
            f"unsupported WAV format tag {tag}; wire in soundfile/pyav"
        )
    if data is None:
        raise ValueError("malformed WAV: no data chunk")
    if tag == 0x11:
        (block_align,) = struct.unpack("<H", fmt[12:14])
        samples = _ima_decode(data, ch, block_align)
    elif tag == 2:
        (block_align,) = struct.unpack("<H", fmt[12:14])
        samples = _msadpcm_decode(data, ch, block_align)
    else:
        expand = mulaw_expand if tag == 7 else alaw_expand
        samples = [expand(b) for b in data]
    if len(samples) % ch:
        raise ValueError("data chunk size mismatch")
    return {
        "channels": ch,
        "sample_rate": rate,
        "n_frames": len(samples) // ch,
        "samples": samples,
    }


def wav_decode(blob: bytes) -> dict:
    """Decode a WAV: {channels, sample_rate, n_frames, samples} with
    ``samples`` the interleaved int16 list.  Only 16-bit PCM is supported
    — anything else raises loudly (wrong stats are worse than no stats)."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF/WAVE header)")
    g711 = _g711_decode(blob)
    if g711 is not None:
        return g711
    # Normalize stdlib parse failures to ValueError so callers can write ONE
    # except clause across media types (the PNG path's contract —
    # operators/imaging.py png_decode): wave.open throws raw wave.Error on a
    # RIFF container missing fmt/data chunks, struct.error/EOFError on
    # truncated chunk headers, and chunk.py's seek a bare RuntimeError on
    # chunk-size fields corrupted past the buffer (found by the hypothesis
    # bit-flip sweep in tests/test_deadletter_media.py).
    try:
        w = wave.open(io.BytesIO(blob), "rb")
        try:
            if w.getsampwidth() != 2:
                raise ValueError(f"unsupported sample width {w.getsampwidth() * 8}-bit")
            ch, rate, n = w.getnchannels(), w.getframerate(), w.getnframes()
            raw = w.readframes(n)
        finally:
            w.close()
    except (wave.Error, struct.error, EOFError, RuntimeError, OSError) as e:
        raise ValueError(f"malformed WAV: {e}") from e
    if len(raw) != n * ch * 2:
        raise ValueError("data chunk size mismatch")
    return {
        "channels": ch,
        "sample_rate": rate,
        "n_frames": n,
        "samples": list(struct.unpack(f"<{n * ch}h", raw)),
    }


def decode_audio(blob: bytes) -> dict:
    """Dispatch on magic bytes.  WAV decodes for real; compressed codecs
    raise until a library is wired in."""
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        return {"format": "wav", **wav_decode(blob)}
    if blob[:4] == b"FORM" and blob[8:12] == b"AIFF":
        return {"format": "aiff", **aiff_decode(blob)}
    if blob[:4] == b"FORM" and blob[8:12] == b"AIFC":
        raise NotImplementedError(
            "AIFF-C compression types not supported; wire in soundfile/pyav"
        )
    raise NotImplementedError("no stdlib codec for this audio format; wire in soundfile/pyav")


AUDIO_DECODE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("format", T.StringType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_frames", T.LongType()),      # from the DECODED data chunk
    T.StructField("s_sum", T.LongType()),         # integer-exact sample stats
    T.StructField("s_min", T.IntegerType()),
    T.StructField("s_max", T.IntegerType()),
])


#: Permissive-mode output: decode columns + dead-letter ``err`` column
#: (see operators/imaging.py DECODE_DEADLETTER_SCHEMA for the policy).
AUDIO_DEADLETTER_SCHEMA = T.StructType(
    AUDIO_DECODE_SCHEMA.fields + [T.StructField("err", T.StringType())]
)


def decode_waveforms(media_df: DataFrame, id_col: str = "doc_id",
                     media_col: str = "media", strict: bool = True) -> DataFrame:
    """Real WAV decode over a binary column via ``mapInPandas`` — emits
    integer-exact sample statistics computed from the decoded PCM stream
    (``n_frames`` from the data chunk, not the header, so a truncated
    blob cannot silently agree).

    ``strict=False`` is dead-letter mode (the reference's
    ``kafka_skip_broken_messages`` policy applied to media): a corrupt or
    unsupported blob becomes one row with ``err`` set, stats NULL, and
    the job survives."""
    schema = AUDIO_DECODE_SCHEMA if strict else AUDIO_DEADLETTER_SCHEMA

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {f.name: [] for f in schema.fields}
            for doc_id, blob in zip(pdf[id_col], pdf[media_col]):
                try:
                    d = decode_audio(bytes(blob))
                except (ValueError, NotImplementedError) as e:
                    if strict:
                        raise
                    rows["doc_id"].append(doc_id)
                    for k in ("format", "channels", "sample_rate",
                              "n_frames", "s_sum", "s_min", "s_max"):
                        rows[k].append(None)
                    rows["err"].append(str(e))
                    continue
                s = d["samples"]
                rows["doc_id"].append(doc_id)
                rows["format"].append(d["format"])
                rows["channels"].append(d["channels"])
                rows["sample_rate"].append(d["sample_rate"])
                rows["n_frames"].append(d["n_frames"])
                rows["s_sum"].append(sum(s) if s else None)
                rows["s_min"].append(min(s) if s else None)
                rows["s_max"].append(max(s) if s else None)
                if not strict:
                    rows["err"].append(None)
            yield pd.DataFrame(rows)

    return pipe_map(media_df, _decode, schema=schema)


AUDIO_ENERGY_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("window_index", T.IntegerType()),
    T.StructField("n_frames", T.LongType()),      # frames in THIS window (tail may be short)
    T.StructField("sq_sum", T.LongType()),        # integer-exact Σ sample² over the window
    T.StructField("s_peak", T.IntegerType()),     # max |sample| in the window
])


def audio_energy_windows(media_df: DataFrame, window_frames: int = 16,
                         id_col: str = "doc_id", media_col: str = "media",
                         strict: bool = True) -> DataFrame:
    """Audio feature extraction over decoded PCM: fixed-size frame windows
    with integer-exact energy (Σ sample², summed over channels) and peak
    amplitude — the windowed-energy shape every audio curation pass needs
    (silence trimming, clipping detection, loudness gating), kept in exact
    integers so the DuckDB oracle recomputes it from the synth formula.
    One blob → ceil(n_frames/window) rows: the audio row-expansion shape,
    mirroring the video path's frame rows.

    ``strict=False`` routes corrupt blobs to one err row (see
    decode_waveforms); the schema gains ``err``."""
    schema = (AUDIO_ENERGY_SCHEMA if strict else
              T.StructType(AUDIO_ENERGY_SCHEMA.fields + [T.StructField("err", T.StringType())]))

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {f.name: [] for f in schema.fields}
            for doc_id, blob in zip(pdf[id_col], pdf[media_col]):
                try:
                    d = decode_audio(bytes(blob))
                except (ValueError, NotImplementedError) as e:
                    if strict:
                        raise
                    rows["doc_id"].append(doc_id)
                    for k in ("window_index", "n_frames", "sq_sum", "s_peak"):
                        rows[k].append(None)
                    rows["err"].append(str(e))
                    continue
                ch, samples = d["channels"], d["samples"]
                step = window_frames * ch
                for wi in range(0, len(samples), step):  # empty → zero rows
                    win = samples[wi:wi + step]
                    rows["doc_id"].append(doc_id)
                    rows["window_index"].append(wi // step)
                    rows["n_frames"].append(len(win) // ch)
                    rows["sq_sum"].append(sum(s * s for s in win))
                    rows["s_peak"].append(max(abs(s) for s in win))
                    if not strict:
                        rows["err"].append(None)
            yield pd.DataFrame(rows)

    return pipe_map(media_df, _extract, schema=schema)


WAV_BLOB_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media", T.BinaryType()),
])


def synth_g711_waveforms(ids_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """G.711 telephony-WAV fixture (r10): for doc ``d``,

        n_codes = 40 + d % 17   (mono, 8 kHz)
        code(i) = (5d + 7i) % 256
        law     = µ-law (tag 7) if d even else A-law (tag 6)

    The decoded samples are ``mulaw_expand/alaw_expand`` of the code
    bytes — pure integer closed forms DuckDB restates exactly, so the
    RIFF walk for non-PCM tags AND both expansion tables are
    value-checked end to end (the audioop cross-check in
    tests/test_audio.py independently pins the tables)."""

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                codes = bytes((5 * d + 7 * i) % 256 for i in range(40 + d % 17))
                ids.append(d)
                blobs.append(
                    wav_encode_g711(codes, "mulaw" if d % 2 == 0 else "alaw")
                )
            yield pd.DataFrame({"doc_id": ids, "media": blobs})

    return pipe_map(_spread(ids_df.select(id_col)), _synth, schema=WAV_BLOB_SCHEMA)


def synth_aiff_waveforms(ids_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic AIFF fixture: for doc ``d``,

        n_frames    = 18 + d % 41
        channels    = 2 if d % 4 = 0 else 1
        sample_rate = 11025 * (1 + d % 3)    (odd-mantissa rates, so the
                                              80-bit-float field is
                                              exercised beyond powers of 2)
        sample(j)   = ((d*37 + j*11) % 1999) - 999   (interleaved index j)

    — closed forms DuckDB reproduces with a ``range()`` cross join,
    value-checking the FORM/COMM/SSND walk, the big-endian frame unpack,
    and the extended-float rate decode end to end."""

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                n, ch = 18 + d % 41, 2 if d % 4 == 0 else 1
                rate = 11025 * (1 + d % 3)
                samples = [((d * 37 + j * 11) % 1999) - 999 for j in range(n * ch)]
                ids.append(d)
                blobs.append(aiff_encode(samples, rate, ch))
            yield pd.DataFrame({"doc_id": ids, "media": blobs})

    return pipe_map(_spread(ids_df.select(id_col)), _synth, schema=WAV_BLOB_SCHEMA)


def synth_waveforms(ids_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic WAV fixture: for doc ``d``,

        n_frames    = 20 + d % 50
        channels    = 2 if d % 3 = 0 else 1
        sample_rate = 8000 + (d % 4) * 4000
        sample(j)   = ((d*31 + j*7) % 2003) - 1001   (interleaved index j)

    — closed forms DuckDB reproduces with a ``range()`` cross join, giving
    the decode path a first-principles oracle."""

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                n, ch = 20 + d % 50, 2 if d % 3 == 0 else 1
                rate = 8000 + (d % 4) * 4000
                samples = [((d * 31 + j * 7) % 2003) - 1001 for j in range(n * ch)]
                ids.append(d)
                blobs.append(wav_encode(samples, rate, ch))
            yield pd.DataFrame({"doc_id": ids, "media": blobs})

    return pipe_map(_spread(ids_df.select(id_col)), _synth, schema=WAV_BLOB_SCHEMA)


# ---------------------------------------------------------------- MP3 meta

#: MPEG-1 Layer III bitrate table (kbps, index 1..14; 0 = free, 15 =
#: bad) and MPEG-2/2.5 Layer III — public ISO/IEC 11172-3 tables.
_MP3_KBPS_V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                   160, 192, 224, 256, 320]
_MP3_KBPS_V2_L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80,
                   96, 112, 128, 144, 160]
_MP3_RATES = {3: [44100, 48000, 32000],      # MPEG-1
              2: [22050, 24000, 16000],      # MPEG-2
              0: [11025, 12000, 8000]}       # MPEG-2.5
_MP3_MODES = ["stereo", "joint_stereo", "dual_channel", "mono"]


def _syncsafe(n: int) -> bytes:
    return bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                  (n >> 7) & 0x7F, n & 0x7F])


def _unsyncsafe(b: bytes) -> int:
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def id3v2_decode(blob: bytes) -> tuple[dict, int]:
    """(text frames as {id: value}, byte offset past the tag) from an
    ID3v2.3/2.4 header at offset 0; ({}, 0) when no tag."""
    if blob[:3] != b"ID3":
        return {}, 0
    if len(blob) < 10:
        raise ValueError("truncated ID3v2 header")
    ver = blob[3]
    if ver not in (3, 4):
        raise NotImplementedError(f"ID3v2.{ver} tags")
    if blob[5] & 0x80:
        raise NotImplementedError("ID3v2 unsynchronisation")
    size = _unsyncsafe(blob[6:10])
    if 10 + size > len(blob):
        raise ValueError("ID3v2 size exceeds blob")
    tags: dict[str, str] = {}
    p, end = 10, 10 + size
    while p + 10 <= end:
        fid = blob[p:p + 4]
        if fid == b"\x00\x00\x00\x00":
            break                                  # padding
        fsize = (_unsyncsafe(blob[p + 4:p + 8]) if ver == 4
                 else int.from_bytes(blob[p + 4:p + 8], "big"))
        if p + 10 + fsize > end:
            raise ValueError("ID3v2 frame overruns tag")
        body = blob[p + 10:p + 10 + fsize]
        if fid[:1] == b"T" and body:
            enc, text = body[0], body[1:]
            if enc == 0:
                tags[fid.decode("latin-1")] = text.split(b"\x00")[0].decode(
                    "latin-1"
                )
            elif enc == 3:
                tags[fid.decode("latin-1")] = text.split(b"\x00")[0].decode(
                    "utf-8", "replace"
                )
            elif enc in (1, 2):
                # UTF-16 (r17): enc 1 = BOM-prefixed (the Windows
                # encoder default — common in the wild, not rare),
                # enc 2 = BE without BOM (v2.4); terminator is the
                # 16-bit NUL pair at an even offset
                raw = text
                for q in range(0, len(raw) - 1, 2):
                    if raw[q:q + 2] == b"\x00\x00":
                        raw = raw[:q]
                        break
                codec = "utf-16" if enc == 1 else "utf-16-be"
                tags[fid.decode("latin-1")] = raw.decode(codec, "replace")
        p += 10 + fsize
    return tags, end


def mp3_meta_walk(blob: bytes) -> dict:
    """Frame-accurate MP3 METADATA walk (verdict item 8) — the triage
    signal a crawl pipeline needs from the dominant audio container
    without an MDCT decoder: ID3v2 text tags, per-frame header parse
    (sync / version / layer / bitrate / sample rate / channel mode,
    ISO/IEC 11172-3 header layout), Xing/Info VBR header detection in
    the first frame's side-info region, frame count and the exact
    stream duration those frame headers imply.  SAMPLE decode still
    raises honestly in ``decode_audio`` (full Layer III synthesis is
    out of scope; wire in pyav on real infra).

    Corrupt streams (bad sync mid-walk, frame overruns, truncated
    headers) raise ValueError — the dead-letter class."""
    tags, pos = id3v2_decode(blob)
    if pos >= len(blob):
        raise ValueError("no MPEG frames after ID3v2 tag")
    n_frames = 0
    kbps_seen: set[int] = set()
    sr = mode = version_bits = None
    xing_frames = None
    xing_is_vbr = False
    samples_per_frame = 0
    while pos < len(blob):
        # trailing ID3v1 (128 B, 'TAG') / ID3v1 extended (+227 B,
        # 'TAG+' immediately before it) terminate the walk cleanly —
        # extremely common on real-world MP3s, not a lost sync
        # (r16 ADVICE item: these were dead-lettered as corrupt).
        if pos + 128 == len(blob) and blob[pos:pos + 3] == b"TAG":
            break
        if pos + 355 == len(blob) and blob[pos:pos + 4] == b"TAG+":
            break
        if pos + 4 > len(blob):
            raise ValueError("truncated MP3 frame header")
        h = blob[pos:pos + 4]
        if not (h[0] == 0xFF and (h[1] & 0xE0) == 0xE0):
            raise ValueError("lost MP3 frame sync")
        vbits = (h[1] >> 3) & 0x03
        layer = (h[1] >> 1) & 0x03
        if vbits == 1 or layer == 0:
            raise ValueError("reserved MP3 version/layer")
        if layer != 1:                         # 01 = Layer III
            raise NotImplementedError("MPEG Layer I/II frame walk")
        protection = h[1] & 0x01
        bidx = (h[2] >> 4) & 0x0F
        sidx = (h[2] >> 2) & 0x03
        padding = (h[2] >> 1) & 0x01
        chmode = (h[3] >> 6) & 0x03
        if bidx in (0, 15) or sidx == 3:
            raise ValueError("free/bad MP3 bitrate or sample rate")
        kbps = (_MP3_KBPS_V1_L3 if vbits == 3 else _MP3_KBPS_V2_L3)[bidx]
        rate = _MP3_RATES[vbits][sidx]
        spf = 1152 if vbits == 3 else 576
        flen = (144000 if vbits == 3 else 72000) * kbps // rate + padding
        if flen < 4 or pos + flen > len(blob):
            raise ValueError("MP3 frame overruns blob")
        if n_frames == 0:
            sr, mode, version_bits, samples_per_frame = (
                rate, chmode, vbits, spf
            )
            side = (17 if chmode == 3 else 32) if vbits == 3 else (
                9 if chmode == 3 else 17
            )
            xoff = pos + 4 + (2 if protection == 0 else 0) + side
            magic = blob[xoff:xoff + 4]
            if magic in (b"Xing", b"Info"):
                flags = int.from_bytes(blob[xoff + 4:xoff + 8], "big")
                if flags & 0x01:
                    xing_frames = int.from_bytes(
                        blob[xoff + 8:xoff + 12], "big"
                    )
                # LAME semantics (r16 review): 'Xing' marks VBR; 'Info'
                # is the SAME structure written for CBR streams — it
                # carries the frame count but must not flip the mode
                xing_is_vbr = magic == b"Xing"
        elif rate != sr or vbits != version_bits:
            raise ValueError("MP3 sample rate changed mid-stream")
        kbps_seen.add(kbps)
        n_frames += 1
        pos += flen
    if n_frames == 0:
        raise ValueError("no MPEG frames")
    return {
        "format": "mp3",
        "version": {3: "MPEG1", 2: "MPEG2", 0: "MPEG2.5"}[version_bits],
        "sample_rate": sr,
        "mode": _MP3_MODES[mode],
        "n_frames": n_frames,
        "bitrate_mode": "VBR" if (xing_is_vbr or len(kbps_seen) > 1)
                        else "CBR",
        "kbps_min": min(kbps_seen),
        "kbps_max": max(kbps_seen),
        "duration_ms": n_frames * samples_per_frame * 1000 // sr,
        "xing_frames": xing_frames,
        "tags": tags,
    }


def mp3_encode_meta_fixture(
    n_frames: int,
    sr_index: int = 0,
    mono: bool = False,
    vbr: bool = False,
    tags: "dict[str, str] | None" = None,
) -> bytes:
    """Frame-accurate fixture MP3 (MPEG-1 Layer III headers, zeroed
    payloads): ID3v2.3 text tags, then ``n_frames`` frames — CBR 128
    kbps, or VBR alternating 128/192 kbps with a Xing header (frame
    count) in the first frame's side-info region.  Every frame length
    is exact per the public formula, so the walk's arithmetic is what
    the oracle checks."""
    out = bytearray()
    if tags:
        body = bytearray()
        for fid, val in tags.items():
            payload = b"\x00" + val.encode("latin-1")
            body.extend(fid.encode("latin-1"))
            body.extend(len(payload).to_bytes(4, "big"))
            body.extend(b"\x00\x00")
            body.extend(payload)
        out.extend(b"ID3\x03\x00\x00" + _syncsafe(len(body)) + body)
    sr = _MP3_RATES[3][sr_index]
    chmode = 3 if mono else 0
    for i in range(n_frames):
        bidx = (9 if not vbr or i % 2 == 0 else 11)   # 128 / 192 kbps
        kbps = _MP3_KBPS_V1_L3[bidx]
        flen = 144000 * kbps // sr
        frame = bytearray(flen)
        frame[0] = 0xFF
        frame[1] = 0xE0 | (3 << 3) | (1 << 1) | 1     # MPEG1, L3, no CRC
        frame[2] = (bidx << 4) | (sr_index << 2)
        frame[3] = chmode << 6
        if vbr and i == 0:
            xoff = 4 + (17 if mono else 32)
            frame[xoff:xoff + 4] = b"Xing"
            frame[xoff + 4:xoff + 8] = (0x01).to_bytes(4, "big")
            frame[xoff + 8:xoff + 12] = n_frames.to_bytes(4, "big")
        out.extend(frame)
    return bytes(out)


MP3_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("title", T.StringType()),
    T.StructField("artist", T.StringType()),
    T.StructField("version", T.StringType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("mode", T.StringType()),
    T.StructField("n_frames", T.LongType()),
    T.StructField("bitrate_mode", T.StringType()),
    T.StructField("kbps_min", T.IntegerType()),
    T.StructField("kbps_max", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("xing_frames", T.LongType()),
])


def mp3_metadata(media_df: DataFrame, id_col: str = "doc_id",
                 media_col: str = "media") -> DataFrame:
    """``mp3_meta_walk`` over a binary column via ``mapInPandas`` — one
    typed metadata row per blob (ID3 title/artist + frame-walk stats).
    Same no-shuffle scale shape as every media decoder; corrupt blobs
    raise loudly (wrap with a dead-letter catch upstream if the
    transport is at-least-once)."""

    def _walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {f.name: [] for f in MP3_META_SCHEMA.fields}
            for doc_id, blob in zip(pdf[id_col], pdf[media_col]):
                m = mp3_meta_walk(bytes(blob))
                rows["doc_id"].append(int(doc_id))
                rows["title"].append(m["tags"].get("TIT2"))
                rows["artist"].append(m["tags"].get("TPE1"))
                for k in ("version", "sample_rate", "mode", "n_frames",
                          "bitrate_mode", "kbps_min", "kbps_max",
                          "duration_ms", "xing_frames"):
                    rows[k].append(m[k])
            yield pd.DataFrame(rows)

    return pipe_map(media_df, _walk, schema=MP3_META_SCHEMA)


def synth_mp3_streams(ids_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Frame-accurate MP3 fixture, closed-form in doc_id ``d``:
    n_frames = 5 + d%7, sample rate index d%3, mono when d odd, VBR
    (alternating 128/192 + Xing) when d ≡ 1 mod 4, ID3v2.3 tags
    TIT2 = 'track d' / TPE1 = 'artist d%5'."""

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                ids.append(d)
                blobs.append(mp3_encode_meta_fixture(
                    n_frames=5 + d % 7, sr_index=d % 3, mono=bool(d % 2),
                    vbr=(d % 4 == 1),
                    tags={"TIT2": f"track {d}", "TPE1": f"artist {d % 5}"},
                ))
            yield pd.DataFrame({id_col: ids, "media": blobs})

    return pipe_map(_spread(ids_df.select(id_col)), _synth, schema=f"{id_col} long, media binary")


# ---------------------------------------------------------------- FLAC meta

def parse_vorbis_comments(data: bytes, what: str = "vorbis") -> dict[str, str]:
    """The shared VORBIS_COMMENT wire lexer (xiph.org: little-endian
    length-prefixed vendor string, entry count, ``KEY=value`` entries)
    — used by the FLAC block walk here and the Ogg Vorbis/Opus comment
    headers (operators/ogg.py); one implementation so the walks cannot
    diverge (r18 self-review)."""
    tags: dict[str, str] = {}
    p = 0
    if p + 4 > len(data):
        raise ValueError(f"truncated {what} comment")
    vlen = int.from_bytes(data[p:p + 4], "little")
    p += 4 + vlen                                   # vendor string
    if p + 4 > len(data):
        raise ValueError(f"truncated {what} comment")
    n = int.from_bytes(data[p:p + 4], "little")
    p += 4
    for _ in range(n):
        if p + 4 > len(data):
            raise ValueError(f"truncated {what} comment entry")
        clen = int.from_bytes(data[p:p + 4], "little")
        p += 4
        entry = data[p:p + clen]
        if len(entry) != clen:
            raise ValueError(f"truncated {what} comment entry")
        p += clen
        if b"=" in entry:
            k, v = entry.split(b"=", 1)
            tags[k.decode("utf-8", "replace").upper()] = \
                v.decode("utf-8", "replace")
    return tags


def flac_meta_walk(blob: bytes) -> dict:
    """FLAC metadata walk (public format spec, xiph.org: ``fLaC`` magic,
    then metadata blocks — 1-byte header = last-flag bit + 7-bit type,
    3-byte big-endian length): STREAMINFO (type 0, mandatory first —
    sample rate 20 bits, channels-1 3 bits, bits-per-sample-1 5 bits,
    total samples 36 bits, unencoded-stream MD5) + VORBIS_COMMENT
    (type 4 — little-endian length-prefixed UTF-8 ``KEY=value`` pairs,
    the tag plane).  The lossless sibling of ``mp3_meta_walk``: the
    crawl-triage columns (duration, channel count, tags) without frame
    decode, which raises honestly in ``decode_audio``.

    Corrupt streams raise ValueError (dead-letter class)."""
    if blob[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (bad magic)")
    pos = 4
    info = None
    tags: dict[str, str] = {}
    last = False
    while not last:
        if pos + 4 > len(blob):
            raise ValueError("truncated FLAC metadata block header")
        hdr = blob[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        blen = int.from_bytes(blob[pos + 1:pos + 4], "big")
        body = blob[pos + 4:pos + 4 + blen]
        if len(body) != blen:
            raise ValueError("truncated FLAC metadata block")
        if btype == 0:                              # STREAMINFO
            if blen != 34:
                raise ValueError("FLAC STREAMINFO must be 34 bytes")
            bits = int.from_bytes(body[10:18], "big")
            sample_rate = (bits >> 44) & 0xFFFFF
            channels = ((bits >> 41) & 0x07) + 1
            bps = ((bits >> 36) & 0x1F) + 1
            total = bits & 0xFFFFFFFFF              # 36 bits
            if sample_rate == 0:
                raise ValueError("FLAC sample rate 0")
            info = {
                "sample_rate": sample_rate, "channels": channels,
                "bits_per_sample": bps, "total_samples": total,
                "md5": body[18:34].hex(),
                "duration_ms": total * 1000 // sample_rate,
            }
        elif btype == 4:                            # VORBIS_COMMENT
            tags.update(parse_vorbis_comments(body, "vorbis"))
        elif btype == 127:
            raise ValueError("invalid FLAC metadata block type 127")
        pos += 4 + blen
    if info is None:
        raise ValueError("FLAC stream without STREAMINFO")
    return {"format": "flac", **info, "tags": tags}


def flac_encode_meta_fixture(
    sample_rate: int,
    channels: int,
    total_samples: int,
    tags: "dict[str, str] | None" = None,
    bits_per_sample: int = 16,
) -> bytes:
    """Metadata-complete FLAC fixture: fLaC magic + STREAMINFO +
    optional VORBIS_COMMENT (no audio frames — the walk never reads
    past the last metadata block, exactly like a real triage probe)."""
    out = bytearray(b"fLaC")
    body = bytearray(34)
    body[0:2] = (4096).to_bytes(2, "big")           # min block size
    body[2:4] = (4096).to_bytes(2, "big")
    bits = (sample_rate << 44) | ((channels - 1) << 41) | (
        (bits_per_sample - 1) << 36
    ) | total_samples
    body[10:18] = bits.to_bytes(8, "big")
    body[18:34] = bytes(
        (sample_rate + i * channels) % 256 for i in range(16)
    )
    last = 0x80 if not tags else 0x00
    out.append(last | 0x00)
    out.extend(len(body).to_bytes(3, "big"))
    out.extend(body)
    if tags:
        vc = bytearray()
        vendor = b"pdc-spark"
        vc.extend(len(vendor).to_bytes(4, "little"))
        vc.extend(vendor)
        vc.extend(len(tags).to_bytes(4, "little"))
        for k, v in tags.items():
            entry = f"{k}={v}".encode()
            vc.extend(len(entry).to_bytes(4, "little"))
            vc.extend(entry)
        out.append(0x80 | 0x04)
        out.extend(len(vc).to_bytes(3, "big"))
        out.extend(vc)
    return bytes(out)


FLAC_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("title", T.StringType()),
    T.StructField("artist", T.StringType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("bits_per_sample", T.IntegerType()),
    T.StructField("total_samples", T.LongType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("md5", T.StringType()),
])


def flac_metadata(media_df: DataFrame, id_col: str = "doc_id",
                  media_col: str = "media") -> DataFrame:
    """``flac_meta_walk`` over a binary column via ``mapInPandas`` —
    no shuffle, one typed row per blob (the mp3_metadata twin)."""

    def _walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {f.name: [] for f in FLAC_META_SCHEMA.fields}
            for doc_id, blob in zip(pdf[id_col], pdf[media_col]):
                m = flac_meta_walk(bytes(blob))
                rows["doc_id"].append(int(doc_id))
                rows["title"].append(m["tags"].get("TITLE"))
                rows["artist"].append(m["tags"].get("ARTIST"))
                for k in ("sample_rate", "channels", "bits_per_sample",
                          "total_samples", "duration_ms", "md5"):
                    rows[k].append(m[k])
            yield pd.DataFrame(rows)

    return pipe_map(media_df, _walk, schema=FLAC_META_SCHEMA)


def synth_flac_streams(ids_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """FLAC metadata fixture, closed-form in doc_id ``d``: sample rate
    [44100, 48000, 96000][d%3], channels 1 + d%2, total samples
    1000·(1 + d%11); every 3rd doc carries VORBIS_COMMENT tags
    (TITLE='flac d', ARTIST='artist d%5'), the rest STREAMINFO only."""

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                ids.append(d)
                blobs.append(flac_encode_meta_fixture(
                    sample_rate=[44100, 48000, 96000][d % 3],
                    channels=1 + d % 2,
                    total_samples=1000 * (1 + d % 11),
                    tags=(
                        {"TITLE": f"flac {d}", "ARTIST": f"artist {d % 5}"}
                        if d % 3 == 0 else None
                    ),
                ))
            yield pd.DataFrame({id_col: ids, "media": blobs})

    return pipe_map(_spread(ids_df.select(id_col)), _synth, schema=f"{id_col} long, media binary")
