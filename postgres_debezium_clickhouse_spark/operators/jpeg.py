"""Baseline-sequential + progressive JPEG codec, pure stdlib + numpy
(r10 baseline, r16 progressive — verdict item 1) — makes the dominant
real-world image format REAL in the multimodal decode path, like
PNG/WAV/Y4M before it (imaging.py module docstring).  Everything here
is the public ITU-T T.81 (1992) spec: DQT/DHT/SOF0/SOF2/SOS segment
parse, Huffman entropy decode with byte unstuffing, DPCM DC + RLE AC,
dequantize, de-zigzag, 8×8 IDCT, chroma upsampling for arbitrary
sampling factors, BT.601 YCbCr→RGB.  The progressive process (SOF2 —
the MAJORITY coding of real-web JPEGs) is the full Annex G Huffman
path: multi-scan spectral selection (Ss..Se bands), successive
approximation (Ah/Al point transforms) for both DC (bit-append
refinement) and AC (EOB-run decoding + correction bits on
history-nonzero coefficients), coefficients accumulated per component
across scans and reconstructed once at EOI.  The Huffman tables in the
ENCODERS are the T.81 Annex K typical tables (baseline; public
constants) or per-scan canonical fixed-length tables (progressive —
Annex K has no EOBn symbols); the DECODER always reads tables from the
stream's own DHT segments, so it decodes any baseline or progressive
JPEG, not just ours.

Out of scope — these raise the honest ``NotImplementedError`` that
routes to the dead-letter path (tests/test_deadletter_media.py):
arithmetic coding (SOF9+), hierarchical, lossless, 12-bit precision.
Restart markers (DRI/RSTn) ARE handled — real encoders emit them
routinely.

The encoder exists for first-principles fixtures: 4:4:4 (or grayscale),
all-ones quant tables by default so the DCT round-trip error is pure
float rounding (≤2/255 per sample), which is what lets the
``multimodal_decode_jpeg`` oracle pin pixel values, not just dims.

Reference surface: the same opaque-media column contract as
imaging.decode_images (SURVEY §2 multimodal rows).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- constants

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# T.81 Annex K.3 "typical" Huffman tables (public spec constants)
DC_LUMA_BITS = [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# DCT-II basis matrix: M[u, x] = c(u)/2 · cos((2x+1)uπ/16)
_M = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0) / 2.0
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _fdct(block: np.ndarray) -> np.ndarray:
    return _M @ block @ _M.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _M.T @ coef @ _M


# ---------------------------------------------------------------- huffman

def _canonical_codes(bits: list[int], vals: list[int]):
    """(symbol → (code, length)) from a T.81 BITS/HUFFVAL spec.  bits is
    1-indexed by code length (bits[L] = #codes of length L)."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], vals: list[int]):
    """((length, code) → symbol) for the stream-side walk."""
    return {(l, c): s for s, (c, l) in _canonical_codes(bits, vals).items()}


class JpegHeaderOnly(ValueError):
    """Valid JPEG headers (SOI/SOF) but EOI before any SOS — a dims-only
    stream.  A dedicated subclass so decode_image can degrade to
    header-only metadata by TYPE rather than by matching the message
    text (which silently broke the degrade path whenever reworded)."""


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:           # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


class _BitReader:
    """Entropy-segment bit reader with FF00 unstuffing; stops at any
    non-RST marker (position left ON the FF)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy data")
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
            if nxt == 0x00:
                self.pos += 2
            else:
                raise ValueError("truncated JPEG entropy data (marker hit)")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Consume an RSTn marker at a byte boundary and reset bit state."""
        self.acc = self.nbits = 0
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos] != 0xFF
            or not 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            raise ValueError("expected JPEG restart marker")
        self.pos += 2

    def decode_symbol(self, table) -> int:
        code, length = 0, 0
        while length <= 16:
            code = (code << 1) | self.bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map an s-bit magnitude to its signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# ---------------------------------------------------------------- decoder

def jpeg_decode(blob: bytes) -> dict:
    """Decode a baseline-sequential JPEG → {format, width, height,
    channels, pixels} with interleaved 8-bit RGB (or grayscale) bytes —
    the same contract as imaging.png_decode.  Raises ValueError for
    corrupt/truncated streams and NotImplementedError for progressive /
    arithmetic / hierarchical processes (dead-letter classes).

    Exception normalization (same contract as audio.wav_decode): corrupt
    streams can drive the segment/entropy parse into raw IndexError /
    StopIteration / struct.error (found by the fuzz sweep in
    tests/test_jpeg.py) — everything non-(ValueError|NotImplementedError)
    is re-raised as ValueError so the dead-letter catch stays exhaustive
    by construction."""
    try:
        return _jpeg_decode_impl(blob)
    except (ValueError, NotImplementedError):
        raise
    except (IndexError, KeyError, StopIteration, struct.error,
            ZeroDivisionError, OverflowError) as e:
        raise ValueError(f"corrupt JPEG ({type(e).__name__})") from e


def _jpeg_decode_impl(blob: bytes) -> dict:
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    i = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    restart_interval = 0
    prog_coefs = None       # per-comp zigzag coef planes (progressive)
    prog_scans = 0
    while True:
        if i + 1 >= len(blob):
            raise ValueError(
                "truncated JPEG (no EOI)" if prog_scans
                else "truncated JPEG (no SOS)"
            )
        if blob[i] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = blob[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        i += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            if prog_scans:
                return _reconstruct_progressive(sof, prog_coefs, qt)
            raise JpegHeaderOnly("truncated JPEG (EOI before SOS)")
        if i + 2 > len(blob):
            raise ValueError("truncated JPEG segment header")
        seglen = struct.unpack(">H", blob[i:i + 2])[0]
        seg = blob[i + 2:i + seglen]
        if len(seg) != seglen - 2:
            # name the SOF case: it's the documented dead-letter message
            # (tests/test_deadletter_media.py pins it, same as jpeg_dims)
            if 0xC0 <= marker <= 0xCF and marker != 0xC4:
                raise ValueError("truncated JPEG SOF segment")
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:                      # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                j += 1
                if pq:
                    raise NotImplementedError("16-bit JPEG quant tables")
                tbl = np.zeros(64)
                for z in range(64):
                    tbl[ZIGZAG[z]] = seg[j + z]
                qt[tq] = tbl.reshape(8, 8)
                j += 64
        elif marker == 0xC4:                    # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = [0] + list(seg[j + 1:j + 17])
                n = sum(bits)
                vals = list(seg[j + 17:j + 17 + n])
                huff[(tc, th)] = _decode_table(bits, vals)
                j += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):      # SOF0/1 baseline, SOF2 prog
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError("non-8-bit JPEG precision")
            if w == 0 or h == 0:
                raise ValueError("zero-dimension JPEG frame")
            comps = []
            for c in range(nc):
                cid, sampling, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append(
                    {"id": cid, "h": sampling >> 4, "v": sampling & 0x0F, "tq": tq}
                )
            sof = {"w": w, "h": h, "comps": comps, "prog": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("non-baseline JPEG process")
        elif marker == 0xDD:                    # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:                    # SOS → entropy data follows
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                ci, comp = next(
                    (j, x) for j, x in enumerate(sof["comps"]) if x["id"] == cs
                )
                scan.append(
                    {**comp, "ci": ci, "td": tables >> 4, "ta": tables & 0x0F}
                )
            if not sof["prog"]:
                return _decode_scan(
                    blob, i + seglen, sof, scan, qt, huff, restart_interval
                )
            # progressive: accumulate this scan's coefficients, keep
            # walking markers (more DHT/SOS follow) until EOI
            if len(seg) < 4 + 2 * ns:
                raise ValueError("truncated JPEG scan header")
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            if prog_coefs is None:
                prog_coefs = _alloc_coef_planes(sof)
            i = _decode_prog_scan(
                blob, i + seglen, sof, scan, ss, se, ahal >> 4, ahal & 0x0F,
                huff, restart_interval, prog_coefs,
            )
            prog_scans += 1
            continue
        # APPn / COM / others: skipped
        i += seglen


def _decode_scan(blob, pos, sof, scan, qt, huff, restart_interval):
    w, h = sof["w"], sof["h"]
    max_h = max(c["h"] for c in scan)
    max_v = max(c["v"] for c in scan)
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    planes = []
    for c in scan:
        planes.append(
            np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64)
        )
    rdr = _BitReader(blob, pos)
    pred = [0] * len(scan)
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                rdr.restart()
                pred = [0] * len(scan)
            for ci, c in enumerate(scan):
                dc_tbl = huff.get((0, c["td"]))
                ac_tbl = huff.get((1, c["ta"]))
                q = qt.get(c["tq"])
                if dc_tbl is None or ac_tbl is None or q is None:
                    raise ValueError("JPEG scan references missing table")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64)
                        s = rdr.decode_symbol(dc_tbl)
                        diff = _extend(rdr.bits(s), s) if s else 0
                        pred[ci] += diff
                        coef[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = rdr.decode_symbol(ac_tbl)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16          # ZRL
                                    continue
                                break                # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run overflows block")
                            coef[k] = _extend(rdr.bits(s), s)
                            k += 1
                        block = np.zeros((8, 8))
                        for z in range(64):
                            block[ZIGZAG[z] // 8, ZIGZAG[z] % 8] = coef[z]
                        spatial = _idct(block * q) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = spatial
            mcu_i += 1
    return _planes_to_pixels(scan, planes, w, h, max_h, max_v)


def _planes_to_pixels(comps, planes, w, h, max_h, max_v) -> dict:
    """Shared baseline/progressive tail: upsample each component plane
    to full resolution by replication, crop to (h, w), color-convert."""
    full = []
    ys = np.arange(h)
    xs = np.arange(w)
    for ci, c in enumerate(comps):
        p = planes[ci][
            np.ix_(ys * c["v"] // max_v, xs * c["h"] // max_h)
        ]
        full.append(p)
    if len(full) == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return {
            "format": "jpeg", "width": w, "height": h, "channels": 1,
            "pixels": out.tobytes(),
        }
    if len(full) != 3:
        raise NotImplementedError(f"{len(full)}-component JPEG")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return {
        "format": "jpeg", "width": w, "height": h, "channels": 3,
        "pixels": out.tobytes(),
    }


# ------------------------------------------------------ progressive decode
#
# T.81 Annex G (Huffman progressive): a SOF2 frame carries MANY scans,
# each coding one spectral band (Ss..Se) of one-or-more components at
# one bit of precision (successive approximation Ah/Al).  Coefficients
# accumulate in per-component planes across scans; dequant + IDCT runs
# ONCE at EOI.  Decode rules below mirror the spec's G.1.2 (and agree
# with the public libjpeg behavior): DC-first is baseline DPCM with the
# result left-shifted by Al; DC-refine appends one raw bit at position
# Al; AC-first is baseline RLE plus EOBn run symbols ((r<<4)|0 ends
# 2^r-1+ext additional blocks); AC-refine codes newly-significant
# coefficients as ±2^Al and interleaves one correction bit per
# history-nonzero coefficient passed over (including through ZRL and
# EOB runs).

def _mcu_grid(sof):
    max_h = max(c["h"] for c in sof["comps"])
    max_v = max(c["v"] for c in sof["comps"])
    mcus_x = -(-sof["w"] // (8 * max_h))
    mcus_y = -(-sof["h"] // (8 * max_v))
    return max_h, max_v, mcus_x, mcus_y


def _comp_block_dims(sof, c):
    """Non-interleaved block coverage: ceil(component samples / 8) per
    axis (T.81 B.2.3) — NOT the MCU-padded grid."""
    max_h, max_v, _, _ = _mcu_grid(sof)
    samples_w = -(-(sof["w"] * c["h"]) // max_h)
    samples_h = -(-(sof["h"] * c["v"]) // max_v)
    return -(-samples_h // 8), -(-samples_w // 8)


def _alloc_coef_planes(sof):
    """One int32 plane (block_rows, block_cols, 64) per component,
    zigzag-indexed, sized to the MCU-padded grid so interleaved DC
    scans fit."""
    _, _, mcus_x, mcus_y = _mcu_grid(sof)
    return [
        np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int32)
        for c in sof["comps"]
    ]


def _scan_units(sof, scan):
    """Yield per-MCU lists of (scan_idx, block_row, block_col) in scan
    order: single-component scans are non-interleaved (raster over the
    component's own ceil-dims), multi-component scans interleave h×v
    blocks per MCU (T.81 B.2.3 / G.1)."""
    if len(scan) == 1:
        ch, cw = _comp_block_dims(sof, scan[0])
        for by in range(ch):
            for bx in range(cw):
                yield [(0, by, bx)]
        return
    _, _, mcus_x, mcus_y = _mcu_grid(sof)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            unit = []
            for si, c in enumerate(scan):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        unit.append((si, my * c["v"] + by, mx * c["h"] + bx))
            yield unit


def _decode_prog_scan(blob, pos, sof, scan, ss, se, ah, al,
                      huff, restart_interval, coefs) -> int:
    """Decode one progressive scan's entropy segment into ``coefs``;
    returns the byte offset of the next marker."""
    if ss > se or se > 63 or al > 13:
        raise ValueError("invalid JPEG progressive scan header")
    rdr = _BitReader(blob, pos)
    if ss == 0:
        if se != 0:
            raise ValueError("JPEG DC scan with Se != 0")
        _prog_dc_scan(rdr, sof, scan, ah, al, huff, restart_interval, coefs)
    else:
        if len(scan) != 1:
            raise ValueError("JPEG AC scan must be single-component")
        _prog_ac_scan(rdr, sof, scan, ss, se, ah, al, huff,
                      restart_interval, coefs)
    return _next_marker_pos(blob, rdr.pos)


def _prog_dc_scan(rdr, sof, scan, ah, al, huff, restart_interval, coefs):
    pred = [0] * len(scan)
    dc_tbls = []
    for c in scan:
        t = huff.get((0, c["td"])) if ah == 0 else None
        if ah == 0 and t is None:
            raise ValueError("JPEG scan references missing table")
        dc_tbls.append(t)
    mcu_i = 0
    for unit in _scan_units(sof, scan):
        if restart_interval and mcu_i and mcu_i % restart_interval == 0:
            rdr.restart()
            pred = [0] * len(scan)
        for si, by, bx in unit:
            blk = coefs[scan[si]["ci"]][by, bx]
            if ah == 0:
                s = rdr.decode_symbol(dc_tbls[si])
                diff = _extend(rdr.bits(s), s) if s else 0
                pred[si] += diff
                blk[0] = pred[si] << al
            elif rdr.bit():
                blk[0] |= 1 << al
        mcu_i += 1


def _prog_ac_scan(rdr, sof, scan, ss, se, ah, al, huff,
                  restart_interval, coefs):
    c = scan[0]
    ac_tbl = huff.get((1, c["ta"]))
    if ac_tbl is None:
        raise ValueError("JPEG scan references missing table")
    arr = coefs[c["ci"]]
    eobrun = 0
    blk_i = 0
    for unit in _scan_units(sof, scan):
        if restart_interval and blk_i and blk_i % restart_interval == 0:
            rdr.restart()
            eobrun = 0
        (_, by, bx), = unit
        blk = arr[by, bx]
        if ah == 0:
            if eobrun > 0:
                eobrun -= 1
            else:
                k = ss
                while k <= se:
                    rs = rdr.decode_symbol(ac_tbl)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:
                            k += 16              # ZRL
                            continue
                        eobrun = (1 << r) - 1    # EOBn: this block ends too
                        if r:
                            eobrun += rdr.bits(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("JPEG AC run overflows band")
                    blk[k] = _extend(rdr.bits(s), s) << al
                    k += 1
        else:
            eobrun = _refine_ac_block(rdr, blk, ss, se, al, eobrun, ac_tbl)
        blk_i += 1


def _refine_ac_block(rdr, blk, ss, se, al, eobrun, ac_tbl) -> int:
    """AC successive-approximation refinement of one block (T.81
    G.1.2.3): newly-significant coefficients arrive as ±2^Al; every
    history-nonzero coefficient passed over contributes one correction
    bit (1 → add 2^Al toward larger magnitude, unless that bit is
    already set)."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = rdr.decode_symbol(ac_tbl)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r              # counts this block too
                    if r:
                        eobrun += rdr.bits(r)
                    break
                # ZRL: r=15 → skip 16 history-zero positions below
            else:
                if s != 1:
                    raise ValueError("invalid JPEG refinement magnitude")
                newval = p1 if rdr.bit() else m1
            while k <= se:
                v = int(blk[k])
                if v != 0:
                    if rdr.bit() and not (v & p1):
                        blk[k] = v + (p1 if v >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:                           # correction-bit tail
            v = int(blk[k])
            if v != 0 and rdr.bit() and not (v & p1):
                blk[k] = v + (p1 if v >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _next_marker_pos(blob, pos) -> int:
    """After a scan's entropy bytes: skip pad bits/fill bytes to the
    next real marker (position OF the 0xFF)."""
    while pos + 1 < len(blob):
        if blob[pos] == 0xFF and blob[pos + 1] not in (0x00,):
            return pos
        pos += 1
    raise ValueError("truncated JPEG (no marker after scan)")


def _reconstruct_progressive(sof, coefs, qt) -> dict:
    """Dequantize + de-zigzag + batched IDCT every component plane, then
    the shared upsample/color tail.  The IDCT is one einsum per
    component (vectorized over all blocks), so reconstruction cost is
    the baseline path's, independent of scan count."""
    max_h, max_v, _, _ = _mcu_grid(sof)
    natural = np.array(ZIGZAG)
    planes = []
    for ci, c in enumerate(sof["comps"]):
        q = qt.get(c["tq"])
        if q is None:
            raise ValueError("JPEG component references missing quant table")
        zz = coefs[ci].astype(np.float64)        # (bh, bw, 64) zigzag order
        nat = np.empty_like(zz)
        nat[..., natural] = zz
        bh, bw = zz.shape[:2]
        blocks = nat.reshape(bh, bw, 8, 8) * q
        spatial = np.einsum("ab,ijbc,cd->ijad", _M.T, blocks, _M) + 128.0
        planes.append(spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8))
    return _planes_to_pixels(sof["comps"], planes, sof["w"], sof["h"],
                             max_h, max_v)


# ---------------------------------------------------------------- encoder

def _encode_block(coef, pred, dc_codes, ac_codes, wr) -> int:
    """DPCM DC + RLE AC Huffman encode of one quantized zigzag block;
    returns the new DC predictor."""
    dc = int(coef[0])
    diff = dc - pred
    s = _category(diff)
    code, length = dc_codes[s]
    wr.write(code, length)
    if s:
        v = diff if diff >= 0 else diff + (1 << s) - 1
        wr.write(v, s)
    last_nz = 0
    for k in range(63, 0, -1):
        if coef[k]:
            last_nz = k
            break
    k, run = 1, 0
    while k <= last_nz:
        v = int(coef[k])
        if v == 0:
            run += 1
        else:
            while run > 15:
                c, ln = ac_codes[0xF0]
                wr.write(c, ln)      # ZRL
                run -= 16
            s = _category(v)
            c, ln = ac_codes[(run << 4) | s]
            wr.write(c, ln)
            wr.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        k += 1
    if last_nz < 63:
        c, ln = ac_codes[0x00]
        wr.write(c, ln)              # EOB
    return dc


def jpeg_encode_baseline(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 3,
    quant: int = 1,
) -> bytes:
    """Fixture-grade baseline JPEG encoder: 4:4:4 (or grayscale), Annex K
    Huffman tables, flat quant tables of value ``quant`` (1 = the DCT
    round-trip is exact up to float rounding, so oracles can pin pixels).
    Interleaved MCUs, no subsampling, no restart markers."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")
    arr = np.frombuffer(pixels, dtype=np.uint8).astype(np.float64)
    arr = arr.reshape(height, width, channels)
    if channels == 3:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comps = [y, cb, cr]
    else:
        comps = [arr[..., 0]]
    qtbl = np.full((8, 8), float(quant))

    out = bytearray(b"\xff\xd8")                     # SOI

    def seg(marker: int, payload: bytes) -> None:
        out.extend(b"\xff" + bytes([marker]))
        out.extend(struct.pack(">H", len(payload) + 2))
        out.extend(payload)

    zz = bytes(int(qtbl[ZIGZAG[z] // 8, ZIGZAG[z] % 8]) for z in range(64))
    seg(0xDB, bytes([0x00]) + zz)                    # DQT id 0
    if channels == 3:
        seg(0xDB, bytes([0x01]) + zz)                # DQT id 1 (chroma)
    sof = bytearray([8])
    sof.extend(struct.pack(">HH", height, width))
    sof.append(channels)
    for c in range(channels):
        sof.extend([c + 1, 0x11, 0 if c == 0 else 1])
    seg(0xC0, bytes(sof))
    tables = [
        (0x00, DC_LUMA_BITS, DC_LUMA_VALS), (0x10, AC_LUMA_BITS, AC_LUMA_VALS),
    ]
    if channels == 3:
        tables += [
            (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
        ]
    for tid, bits, vals in tables:
        seg(0xC4, bytes([tid] + bits[1:] + vals))
    sos = bytearray([channels])
    for c in range(channels):
        sos.extend([c + 1, 0x00 if c == 0 else 0x11])
    sos.extend([0, 63, 0])
    seg(0xDA, bytes(sos))

    enc = {
        0: (
            _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS),
            _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS),
        ),
        1: (
            _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS),
            _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS),
        ),
    }
    wr = _BitWriter()
    mcus_x, mcus_y = -(-width // 8), -(-height // 8)
    pred = [0] * channels
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, plane in enumerate(comps):
                blk = np.zeros((8, 8))
                ys, xs = my * 8, mx * 8
                tile = plane[ys:ys + 8, xs:xs + 8]
                # edge replication padding
                th, tw = tile.shape
                blk[:th, :tw] = tile
                if tw < 8:
                    blk[:th, tw:] = tile[:, -1:]
                if th < 8:
                    blk[th:, :] = blk[th - 1:th, :]
                coefs = np.round(_fdct(blk - 128.0) / qtbl)
                zzc = np.array(
                    [coefs[ZIGZAG[z] // 8, ZIGZAG[z] % 8] for z in range(64)]
                )
                dc_codes, ac_codes = enc[0 if ci == 0 else 1]
                pred[ci] = _encode_block(zzc, pred[ci], dc_codes, ac_codes, wr)
    out.extend(wr.flush())
    out.extend(b"\xff\xd9")                          # EOI
    return bytes(out)


# ------------------------------------------------------ progressive encoder

# libjpeg's well-known default progressive scan script (public
# knowledge): DC of all components at Al=1 then refined, luma AC split
# into a 1..5 band and a 6..63 band at Al=2 refined twice, chroma AC in
# one 1..63 band at Al=1 refined once.  Entries: (comps, Ss, Se, Ah, Al).
_PROG_SCRIPT_3 = [
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((2,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
]
_PROG_SCRIPT_1 = [
    ((0,), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0,), 0, 0, 1, 0),
    ((0,), 1, 63, 1, 0),
]


def _quantized_zigzag_planes(width, height, pixels, channels, quant):
    """FDCT + flat-quant every 8×8 block of every component (4:4:4 or
    grayscale, edge-replication padding — the baseline encoder's block
    math) → list of (block_rows, block_cols, 64) int32 arrays in zigzag
    order, plus the quant table."""
    arr = np.frombuffer(pixels, dtype=np.uint8).astype(np.float64)
    arr = arr.reshape(height, width, channels)
    if channels == 3:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comps = [y, cb, cr]
    else:
        comps = [arr[..., 0]]
    qtbl = np.full((8, 8), float(quant))
    bx_n, by_n = -(-width // 8), -(-height // 8)
    planes = []
    for plane in comps:
        out = np.zeros((by_n, bx_n, 64), dtype=np.int32)
        for my in range(by_n):
            for mx in range(bx_n):
                blk = np.zeros((8, 8))
                tile = plane[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]
                th, tw = tile.shape
                blk[:th, :tw] = tile
                if tw < 8:
                    blk[:th, tw:] = tile[:, -1:]
                if th < 8:
                    blk[th:, :] = blk[th - 1:th, :]
                coefs = np.round(_fdct(blk - 128.0) / qtbl)
                for z in range(64):
                    out[my, mx, z] = int(coefs[ZIGZAG[z] // 8, ZIGZAG[z] % 8])
        planes.append(out)
    return planes, qtbl


class _OpSink:
    """Collects a scan's entropy stream as ("sym", s) / ("bits", v, n)
    ops so the per-scan Huffman table can be built AFTER the symbol
    alphabet is known (Annex K tables lack EOBn — progressive encoders
    must ship their own DHT, as libjpeg does with optimized tables)."""

    def __init__(self):
        self.ops = []
        self.syms = set()

    def sym(self, s):
        self.ops.append(("sym", s))
        self.syms.add(s)

    def bits(self, v, n):
        if n:
            self.ops.append(("bits", v, n))

    def table_spec(self):
        """Canonical fixed-length code over the used alphabet: n symbols
        at length L = bit_length(n), leaving the all-1s code unused as
        T.81 requires."""
        syms = sorted(self.syms)
        n = max(len(syms), 1)
        length = max(n.bit_length(), 1)
        bits = [0] * 17
        bits[length] = len(syms)
        return bits, syms

    def emit(self, wr, codes):
        for op in self.ops:
            if op[0] == "sym":
                code, length = codes[op[1]]
                wr.write(code, length)
            else:
                wr.write(op[1], op[2])


def _enc_prog_dc(planes, comp_ids, ah, al, sink):
    """DC scan: Ah=0 → DPCM of the point-transformed (arithmetic >> Al)
    values, interleaved across components; Ah>0 → one raw bit per block
    (bit Al of the two's-complement DC)."""
    pred = {ci: 0 for ci in comp_ids}
    by_n, bx_n = planes[comp_ids[0]].shape[:2]
    for my in range(by_n):
        for mx in range(bx_n):
            for ci in comp_ids:
                dc = int(planes[ci][my, mx, 0])
                if ah == 0:
                    val = dc >> al
                    diff = val - pred[ci]
                    pred[ci] = val
                    s = _category(diff)
                    sink.sym(s)
                    if s:
                        sink.bits(diff if diff >= 0 else diff + (1 << s) - 1, s)
                else:
                    sink.bits((dc >> al) & 1, 1)


def _enc_prog_ac_first(plane, ss, se, al, sink):
    """AC first scan (Ah=0): baseline RLE on the point-transformed
    magnitudes plus EOBn run coding across blocks."""
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            sink.sym(r << 4)
            sink.bits(eobrun - (1 << r), r)
            eobrun = 0

    by_n, bx_n = plane.shape[:2]
    for my in range(by_n):
        for mx in range(bx_n):
            blk = plane[my, mx]
            run = 0
            for k in range(ss, se + 1):
                v = int(blk[k])
                t = (v if v >= 0 else -v) >> al
                if t == 0:
                    run += 1
                    continue
                flush_eob()
                while run > 15:
                    sink.sym(0xF0)
                    run -= 16
                s = t.bit_length()
                sink.sym((run << 4) | s)
                sink.bits(t if v >= 0 else (~t) & ((1 << s) - 1), s)
                run = 0
            if run:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
    flush_eob()


def _enc_prog_ac_refine(plane, ss, se, al, sink):
    """AC refinement scan (Ah=Al+1): newly-significant coefficients as
    (run<<4)|1 + sign bit; correction bits of history-nonzero
    coefficients buffered and flushed in decoder read order.  TWO
    buffers, as the decoder's read order demands: ``be`` holds the
    correction bits of blocks absorbed into the pending EOB run
    (decoder reads them in those blocks' correction tails, i.e. right
    after the EOBn symbol), ``br`` holds the current block's bits since
    the last symbol (decoder reads them while advancing past the next
    ZRL / newly-significant symbol)."""
    eobrun = 0
    be = []          # correction bits attached to the pending EOB run
    br = []          # correction bits since the last emitted symbol

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            sink.sym(r << 4)
            sink.bits(eobrun - (1 << r), r)
            for b in be:
                sink.bits(b, 1)
            be.clear()
            eobrun = 0

    def flush_br():
        for b in br:
            sink.bits(b, 1)
        br.clear()

    by_n, bx_n = plane.shape[:2]
    for my in range(by_n):
        for mx in range(bx_n):
            blk = plane[my, mx]
            absv = [((int(v) if v >= 0 else -int(v)) >> al)
                    for v in blk[ss:se + 1]]
            eob = 0
            for j, t in enumerate(absv):
                if t == 1:
                    eob = j + 1
            run = 0
            for j, t in enumerate(absv):
                if t == 0:
                    run += 1
                    continue
                while run > 15 and j < eob:
                    flush_eob()
                    sink.sym(0xF0)
                    run -= 16
                    flush_br()
                if t > 1:
                    br.append(t & 1)
                    continue
                flush_eob()
                sink.sym((run << 4) | 1)
                sink.bits(1 if int(blk[ss + j]) >= 0 else 0, 1)
                flush_br()
                run = 0
            if run or br:
                eobrun += 1
                be.extend(br)
                br.clear()
                if eobrun == 0x7FFF:
                    flush_eob()
    flush_eob()


def jpeg_encode_progressive(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 3,
    quant: int = 1,
) -> bytes:
    """Fixture-grade PROGRESSIVE (SOF2) encoder: same 4:4:4/grayscale +
    flat-quant block math as ``jpeg_encode_baseline``, entropy-coded in
    the libjpeg default scan script — so every Annex G decode path (DC
    first/refine, AC spectral bands, AC refinement with EOB runs and
    correction bits) is exercised, and quant=1 keeps the round trip
    inside the same analytic ±4 band the baseline oracle pins.  Each
    scan ships its own canonical DHT (Annex K tables lack the EOBn
    symbols progressive needs)."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")
    planes, qtbl = _quantized_zigzag_planes(
        width, height, pixels, channels, quant
    )
    script = _PROG_SCRIPT_3 if channels == 3 else _PROG_SCRIPT_1

    out = bytearray(b"\xff\xd8")                     # SOI

    def seg(marker: int, payload: bytes) -> None:
        out.extend(b"\xff" + bytes([marker]))
        out.extend(struct.pack(">H", len(payload) + 2))
        out.extend(payload)

    zz = bytes(int(qtbl[ZIGZAG[z] // 8, ZIGZAG[z] % 8]) for z in range(64))
    seg(0xDB, bytes([0x00]) + zz)
    if channels == 3:
        seg(0xDB, bytes([0x01]) + zz)
    sof = bytearray([8])
    sof.extend(struct.pack(">HH", height, width))
    sof.append(channels)
    for c in range(channels):
        sof.extend([c + 1, 0x11, 0 if c == 0 else 1])
    seg(0xC2, bytes(sof))                            # SOF2: progressive

    for comp_ids, ss, se, ah, al in script:
        sink = _OpSink()
        if ss == 0:
            _enc_prog_dc(planes, list(comp_ids), ah, al, sink)
        elif ah == 0:
            _enc_prog_ac_first(planes[comp_ids[0]], ss, se, al, sink)
        else:
            _enc_prog_ac_refine(planes[comp_ids[0]], ss, se, al, sink)
        table_class = 0 if ss == 0 else 1
        needs_table = not (ss == 0 and ah > 0)       # DC refine: raw bits
        codes = {}
        if needs_table:
            bits, vals = sink.table_spec()
            seg(0xC4, bytes([table_class << 4] + bits[1:] + vals))
            spec = _canonical_codes(bits, vals)
            codes = spec
        sos = bytearray([len(comp_ids)])
        for ci in comp_ids:
            # every scan ships its own table as id 0 of its class
            sos.extend([ci + 1, 0x00])
        sos.extend([ss, se, (ah << 4) | al])
        seg(0xDA, bytes(sos))
        wr = _BitWriter()
        sink.emit(wr, codes)
        out.extend(wr.flush())
    out.extend(b"\xff\xd9")                          # EOI
    return bytes(out)
