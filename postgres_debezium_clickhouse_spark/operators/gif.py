"""GIF codec (r10) — pure-stdlib LZW decode of the third major image
format after PNG (r5) and JPEG (r10), from the public GIF87a/GIF89a
specification (CompuServe 1987/1989; LZW per Welch 1984).  GIF is
LOSSLESS (palette indices round-trip exactly), so unlike JPEG its
oracle can pin integer-exact channel sums, PNG-style.

Decoder surface: logical screen descriptor, global/local color tables,
interlaced and sequential frames, extension-block skipping (GCE/comment/
application), sub-block reassembly, full LZW with code-width growth and
CLEAR handling.  The FIRST image frame is returned as interleaved RGB —
the decode_images contract; animation frame sampling stays the video
path's job.  Corrupt streams raise ValueError (dead-letter class).

The encoder exists for first-principles fixtures: GIF87a, one frame,
global 256-color palette, optional interlace."""

from __future__ import annotations

import struct

GIF_SIGS = (b"GIF87a", b"GIF89a")


# ---------------------------------------------------------------- LZW

def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytes:
    """GIF-flavor LZW: LSB-first bit packing, CLEAR/EOI codes, code width
    grows after the table fills, capped at 12 bits."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader state
    acc = nbits = pos = 0

    def read_code(width: int) -> int | None:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                return None
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    def fresh_table():
        return {i: bytes([i]) for i in range(clear)}

    table = fresh_table()
    width = min_code_size + 1
    prev: bytes | None = None
    next_code = eoi + 1
    while True:
        code = read_code(width)
        if code is None:
            raise ValueError("truncated GIF LZW stream")
        if code == clear:
            table = fresh_table()
            width = min_code_size + 1
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise ValueError("GIF LZW code before table entry")
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]          # the KwKwK case
        else:
            raise ValueError("GIF LZW code out of sequence")
        out.extend(entry)
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) >= expected:
            break
    if len(out) < expected:
        raise ValueError("GIF LZW output short of image size")
    return bytes(out[:expected])


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------- decoder

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: list[bytes], height: int) -> list[bytes]:
    out: list[bytes | None] = [None] * height
    i = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, height, step):
            out[y] = rows[i]
            i += 1
    return out  # type: ignore[return-value]


def gif_decode(blob: bytes) -> dict:
    """First image frame of a GIF → {format, width, height, channels,
    pixels} (interleaved RGB; frame-local dims).  Same contract as
    png_decode/jpeg_decode."""
    if blob[:6] not in GIF_SIGS:
        raise ValueError("not a GIF (bad signature)")
    if len(blob) < 13:
        raise ValueError("truncated GIF header")
    flags = blob[10]
    i = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = blob[i:i + 3 * n]
        if len(gct) != 3 * n:
            raise ValueError("truncated GIF global color table")
        i += 3 * n
    while True:
        if i >= len(blob):
            raise ValueError("truncated GIF (no trailer)")
        introducer = blob[i]
        i += 1
        if introducer == 0x3B:                  # trailer
            raise ValueError("GIF has no image frame")
        if introducer == 0x21:                  # extension: label + sub-blocks
            i += 1
            while True:
                if i >= len(blob):
                    raise ValueError("truncated GIF extension")
                sz = blob[i]
                i += 1
                if sz == 0:
                    break
                i += sz
            continue
        if introducer != 0x2C:
            raise ValueError(f"unknown GIF block 0x{introducer:02x}")
        if i + 9 > len(blob):
            raise ValueError("truncated GIF image descriptor")
        _left, _top, iw, ih = struct.unpack("<HHHH", blob[i:i + 8])
        iflags = blob[i + 8]
        i += 9
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            pal = blob[i:i + 3 * n]
            if len(pal) != 3 * n:
                raise ValueError("truncated GIF local color table")
            i += 3 * n
        if pal is None:
            raise ValueError("GIF frame has no color table")
        if i >= len(blob):
            raise ValueError("truncated GIF (no LZW size)")
        min_code_size = blob[i]
        i += 1
        if not 2 <= min_code_size <= 11:
            raise ValueError("bad GIF LZW minimum code size")
        chunks = []
        while True:
            if i >= len(blob):
                raise ValueError("truncated GIF image data")
            sz = blob[i]
            i += 1
            if sz == 0:
                break
            chunks.append(blob[i:i + sz])
            if len(chunks[-1]) != sz:
                raise ValueError("truncated GIF sub-block")
            i += sz
        indices = _lzw_decode(b"".join(chunks), min_code_size, iw * ih)
        npal = len(pal) // 3
        if max(indices) >= npal:
            raise ValueError("GIF index outside color table")
        rows = [indices[y * iw:(y + 1) * iw] for y in range(ih)]
        if iflags & 0x40:
            rows = _deinterlace(rows, ih)
        px = bytearray()
        for row in rows:
            for idx in row:
                px.extend(pal[3 * idx:3 * idx + 3])
        return {
            "format": "gif", "width": iw, "height": ih, "channels": 3,
            "pixels": bytes(px),
        }


# ---------------------------------------------------------------- encoder

def gif_encode(width: int, height: int, indices: bytes, palette: bytes,
               interlace: bool = False) -> bytes:
    """Fixture-grade GIF87a: one frame, global color table (palette must
    be 3·2^n bytes, n ∈ 1..8), optional interlace."""
    npal = len(palette) // 3
    if npal & (npal - 1) or not 2 <= npal <= 256 or len(palette) % 3:
        raise ValueError("palette must hold a power-of-two color count")
    if len(indices) != width * height:
        raise ValueError("index buffer size mismatch")
    if indices and max(indices) >= npal:
        raise ValueError("index outside palette")
    pal_bits = max(npal.bit_length() - 1, 1)
    out = bytearray(b"GIF87a")
    out.extend(struct.pack("<HH", width, height))
    out.append(0x80 | (pal_bits - 1))           # GCT present, size
    out.extend([0, 0])                           # bg color, aspect
    out.extend(palette)
    out.append(0x2C)                             # image descriptor
    out.extend(struct.pack("<HHHH", 0, 0, width, height))
    out.append(0x40 if interlace else 0x00)
    if interlace:
        rows = [indices[y * width:(y + 1) * width] for y in range(height)]
        seq = []
        for start, step in _INTERLACE_PASSES:
            for y in range(start, height, step):
                seq.append(rows[y])
        indices = b"".join(seq)
    min_code_size = max(pal_bits, 2)
    out.append(min_code_size)
    lzw = _lzw_encode(indices, min_code_size)
    for j in range(0, len(lzw), 255):
        chunk = lzw[j:j + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)                                # block terminator
    out.append(0x3B)                             # trailer
    return bytes(out)
