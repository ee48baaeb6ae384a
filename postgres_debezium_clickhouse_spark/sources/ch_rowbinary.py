"""ClickHouse RowBinary / RowBinaryWithNamesAndTypes (r12).

Reference surface: the reference's ClickHouse tables speak the server's
native wire formats; RowBinary is the documented compact row format
(CH docs, "Formats for Input and Output Data"): each row is the
concatenation of its field encodings with NO delimiters —

* ``Int64`` / ``UInt64``  — 8-byte little-endian,
* ``Float64``             — IEEE 754 little-endian,
* ``UInt8``               — 1 byte,
* ``String``              — LEB128 varint length + UTF-8 bytes,
* ``Nullable(T)``         — one 0/1 null-flag byte, then T iff 0.

``RowBinaryWithNamesAndTypes`` prefixes the stream with a LEB128 column
count, then the names as Strings, then the type names as Strings — the
self-describing dump form ``clickhouse-client … FORMAT
RowBinaryWithNamesAndTypes`` emits and the one implemented here (the
header is what makes a dump safely re-readable).

Spark-first shape (same as sources/avro.py and sources/protobuf.py):
dumps are opaque blobs on object storage → ``binaryFile`` scan →
executor-parallel ``mapInPandas`` decode, one Arrow batch per file, no
shuffle.  Pure stdlib (struct + the LEB128 loop).  Error contract:
every corrupt input normalizes to ``ValueError`` (the dead-letter
mode's catch depends on it) — fuzz-pinned in tests/test_ch_rowbinary.py.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: supported CH type name → (spark type, fixed byte width or None)
_TYPES = {
    "Int64": (T.LongType(), 8),
    "UInt64": (T.LongType(), 8),
    "Float64": (T.DoubleType(), 8),
    "UInt8": (T.IntegerType(), 1),
    "String": (T.StringType(), None),
}


def _leb128_encode(n: int) -> bytes:
    if n < 0:
        raise ValueError(f"varint must be non-negative, got {n}")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _leb128_decode(blob: bytes, pos: int) -> tuple[int, int]:
    shift = n = 0
    for _ in range(10):  # 64-bit varints need ≤10 bytes — bound the loop
        if pos >= len(blob):
            raise ValueError("truncated varint")
        b = blob[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7
    raise ValueError("varint too long")


def _parse_type(ch_type: str) -> tuple[str, bool, str | None]:
    """→ (base type name, nullable, array element type or None).
    ``Array(T)`` carries a LEB128 element count then T encodings (CH
    spec); ``Array(Nullable(T))`` is intentionally unsupported here —
    reject loudly rather than half-implement."""
    elem = None
    if ch_type.startswith("Array(") and ch_type.endswith(")"):
        elem = ch_type[6:-1]
        if elem not in _TYPES:
            raise ValueError(f"unsupported RowBinary type {ch_type!r}")
        return "Array", False, elem
    if ch_type.startswith("Nullable(") and ch_type.endswith(")"):
        base, nullable = ch_type[9:-1], True
    else:
        base, nullable = ch_type, False
    if base not in _TYPES:
        raise ValueError(f"unsupported RowBinary type {ch_type!r}")
    return base, nullable, None


def _write_str(s: str) -> bytes:
    raw = s.encode("utf-8")
    return _leb128_encode(len(raw)) + raw


def _read_str(blob: bytes, pos: int) -> tuple[str, int]:
    ln, pos = _leb128_decode(blob, pos)
    if pos + ln > len(blob):
        raise ValueError("truncated String field")
    try:
        return blob[pos:pos + ln].decode("utf-8"), pos + ln
    except UnicodeDecodeError as e:
        raise ValueError(f"bad UTF-8 in String field: {e}") from e


def _write_field(v, base: str) -> bytes:
    if base in ("Int64", "UInt64"):
        return struct.pack("<q" if base == "Int64" else "<Q", int(v))
    if base == "Float64":
        return struct.pack("<d", float(v))
    if base == "UInt8":
        iv = int(v)
        if not 0 <= iv <= 255:
            raise ValueError(f"UInt8 out of range: {iv}")
        return bytes([iv])
    return _write_str(str(v))  # String


def _read_field(blob: bytes, pos: int, base: str):
    if base in ("Int64", "UInt64", "Float64"):
        if pos + 8 > len(blob):
            raise ValueError(f"truncated {base} field")
        fmt = {"Int64": "<q", "UInt64": "<Q", "Float64": "<d"}[base]
        v = struct.unpack_from(fmt, blob, pos)[0]
        # UInt64 lands in a Spark LongType column: a legitimate dump
        # value ≥ 2^63 would overflow during the Arrow conversion with
        # a confusing non-ValueError — reject it loudly here instead,
        # keeping the module's corrupt-input ValueError contract
        if base == "UInt64" and v > 0x7FFF_FFFF_FFFF_FFFF:
            raise ValueError(
                f"UInt64 value {v} exceeds signed 64-bit range "
                "(LongType cannot represent it)"
            )
        return v, pos + 8
    if base == "UInt8":
        if pos >= len(blob):
            raise ValueError("truncated UInt8 field")
        return blob[pos], pos + 1
    return _read_str(blob, pos)  # String


def rowbinary_encode(rows: list[dict], schema: list[tuple[str, str]]) -> bytes:
    """Fixture writer: one RowBinaryWithNamesAndTypes dump."""
    out = bytearray(_leb128_encode(len(schema)))
    for name, _t in schema:
        out += _write_str(name)
    for _n, ch_type in schema:
        _parse_type(ch_type)  # validate
        out += _write_str(ch_type)
    for row in rows:
        for name, ch_type in schema:
            base, nullable, elem = _parse_type(ch_type)
            v = row.get(name)
            if nullable:
                out += b"\x01" if v is None else b"\x00"
                if v is None:
                    continue
            elif v is None:
                raise ValueError(f"NULL in non-Nullable column {name!r}")
            if base == "Array":
                out += _leb128_encode(len(v))
                for x in v:
                    out += _write_field(x, elem)
            else:
                out += _write_field(v, base)
    return bytes(out)


def rowbinary_decode(blob: bytes, schema: list[tuple[str, str]]) -> list[dict]:
    """Decode one dump, VALIDATING the header against ``schema`` — a
    name/type mismatch is a wrong-table read and must fail loudly."""
    ncols, pos = _leb128_decode(blob, 0)
    if ncols != len(schema):
        raise ValueError(f"header has {ncols} columns, expected {len(schema)}")
    for name, _t in schema:
        got, pos = _read_str(blob, pos)
        if got != name:
            raise ValueError(f"header column {got!r}, expected {name!r}")
    for _n, ch_type in schema:
        got, pos = _read_str(blob, pos)
        if got != ch_type:
            raise ValueError(f"header type {got!r}, expected {ch_type!r}")
    rows = []
    while pos < len(blob):
        row = {}
        for name, ch_type in schema:
            base, nullable, elem = _parse_type(ch_type)
            if nullable:
                if pos >= len(blob):
                    raise ValueError("truncated null flag")
                flag = blob[pos]
                pos += 1
                if flag == 1:
                    row[name] = None
                    continue
                if flag != 0:
                    raise ValueError(f"bad null flag {flag}")
            if base == "Array":
                n, pos = _leb128_decode(blob, pos)
                # a flipped length byte must fail as truncation, not OOM
                if n > len(blob) - pos:
                    raise ValueError("array length exceeds remaining bytes")
                arr = []
                for _ in range(n):
                    x, pos = _read_field(blob, pos, elem)
                    arr.append(x)
                row[name] = arr
            else:
                row[name], pos = _read_field(blob, pos, base)
        rows.append(row)
    return rows


def _spark_schema(schema: list[tuple[str, str]]) -> T.StructType:
    fields = []
    for name, ch_type in schema:
        base, nullable, elem = _parse_type(ch_type)
        dt = (T.ArrayType(_TYPES[elem][0]) if base == "Array"
              else _TYPES[base][0])
        fields.append(T.StructField(name, dt, nullable))
    return T.StructType(fields)


def read_rowbinary(
    spark: SparkSession, path_glob: str, schema: list[tuple[str, str]]
) -> DataFrame:
    """Typed scan over RowBinaryWithNamesAndTypes dumps: ``binaryFile``
    listing → executor-parallel ``mapInPandas`` decode (one Arrow batch
    per dump), no shuffle — the sources/protobuf.py shape."""
    out_schema = _spark_schema(schema)
    names = [n for n, _t in schema]

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for blob in pdf["content"]:
                rows = rowbinary_decode(bytes(blob), schema)
                yield pd.DataFrame(
                    {n: [r[n] for r in rows] for n in names}
                    if rows else {n: [] for n in names}
                )

    return (
        spark.read.format("binaryFile").load(path_glob)
        .select("content")
        .mapInPandas(_decode, out_schema)
    )
