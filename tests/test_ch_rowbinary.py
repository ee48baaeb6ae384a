"""ClickHouse RowBinaryWithNamesAndTypes source (r12) —
sources/ch_rowbinary.py.  Mirrors test_protobuf.py's strategy: type
matrix roundtrip, null flags, header validation, varint edges, and a
corruption sweep pinning the ValueError contract."""

from __future__ import annotations

import random

import pytest

from postgres_debezium_clickhouse_spark.sources.ch_rowbinary import (
    _leb128_decode, _leb128_encode, read_rowbinary, rowbinary_decode,
    rowbinary_encode,
)

SCHEMA = [
    ("k", "Int64"),
    ("status", "String"),
    ("price", "Nullable(Float64)"),
    ("flag", "UInt8"),
    ("note", "Nullable(String)"),
]

ROWS = [
    {"k": -5, "status": "O", "price": 12.5, "flag": 1, "note": "héllo\tworld"},
    {"k": 2 ** 62, "status": "", "price": None, "flag": 0, "note": None},
    {"k": 0, "status": "x" * 300, "price": -0.0, "flag": 255, "note": ""},
]


def test_leb128_edges():
    for n in (0, 1, 127, 128, 300, 2 ** 32, 2 ** 63 - 1):
        blob = _leb128_encode(n)
        got, pos = _leb128_decode(blob, 0)
        assert (got, pos) == (n, len(blob))
    with pytest.raises(ValueError, match="truncated"):
        _leb128_decode(b"\x80\x80", 0)
    with pytest.raises(ValueError, match="too long"):
        _leb128_decode(b"\x80" * 11, 0)


def test_roundtrip_type_matrix():
    blob = rowbinary_encode(ROWS, SCHEMA)
    back = rowbinary_decode(blob, SCHEMA)
    assert back == ROWS
    # empty dump (header only) decodes to zero rows
    assert rowbinary_decode(rowbinary_encode([], SCHEMA), SCHEMA) == []


def test_header_validation_is_loud():
    blob = rowbinary_encode(ROWS, SCHEMA)
    wrong_name = [("kk",) + SCHEMA[0][1:]] + SCHEMA[1:]
    with pytest.raises(ValueError, match="header column"):
        rowbinary_decode(blob, [("kk", "Int64")] + SCHEMA[1:])
    with pytest.raises(ValueError, match="header type"):
        rowbinary_decode(blob, [("k", "UInt64")] + SCHEMA[1:])
    with pytest.raises(ValueError, match="columns"):
        rowbinary_decode(blob, SCHEMA[:3])
    del wrong_name


def test_null_in_non_nullable_rejected():
    with pytest.raises(ValueError, match="non-Nullable"):
        rowbinary_encode([{"k": None, "status": "a", "price": 1.0,
                           "flag": 0, "note": None}], SCHEMA)
    with pytest.raises(ValueError, match="unsupported"):
        rowbinary_encode([], [("k", "Int32")])


def test_corruption_sweep_normalizes_to_valueerror():
    """Byte flips + truncations over a real dump must never leak
    anything past ValueError (struct.error, UnicodeDecodeError,
    IndexError all normalized) — the dead-letter contract."""
    blob = rowbinary_encode(ROWS * 5, SCHEMA)
    rng = random.Random(9)
    for t in range(1500):
        b = bytearray(blob)
        if t % 2:
            i = rng.randrange(len(b))
            b[i] ^= 1 << rng.randrange(8)
        else:
            b = b[:rng.randrange(len(b))]
        try:
            rowbinary_decode(bytes(b), SCHEMA)
        except ValueError:
            pass
        except Exception as e:  # pragma: no cover - the assertion target
            raise AssertionError(
                f"case {t}: leaked {type(e).__name__}: {e}"
            ) from e


def test_read_rowbinary_typed_scan(spark, tmp_path):
    import os

    d = str(tmp_path / "rb")
    os.makedirs(d)
    for i, chunk in enumerate((ROWS[:2], ROWS[2:])):
        with open(os.path.join(d, f"part{i}.bin"), "wb") as fh:
            fh.write(rowbinary_encode(chunk, SCHEMA))
    df = read_rowbinary(spark, d, SCHEMA)
    got = sorted(
        ((r.k, r.status, r.price, r.flag, r.note) for r in df.collect()),
    )
    want = sorted(
        (r["k"], r["status"], r["price"], r["flag"], r["note"]) for r in ROWS
    )
    assert got == want
    assert [f.name for f in df.schema.fields] == [n for n, _ in SCHEMA]


def test_array_types_roundtrip_and_bounds():
    """r12 — Array(T): LEB128 element count + T encodings.  Roundtrip
    incl. empty arrays; a corrupted length byte fails as truncation
    (never an allocation bomb); Array(Nullable(T)) rejects loudly."""
    sch = [("k", "Int64"), ("tags", "Array(Int64)"),
           ("names", "Array(String)")]
    rows = [
        {"k": 1, "tags": [1, -2, 3], "names": ["a", "bb", ""]},
        {"k": 2, "tags": [], "names": []},
    ]
    blob = rowbinary_encode(rows, sch)
    assert rowbinary_decode(blob, sch) == rows
    with pytest.raises(ValueError, match="unsupported"):
        rowbinary_encode([], [("x", "Array(Nullable(Int64))")])
    # corruption sweep over the array dump too
    rng = random.Random(13)
    for t in range(800):
        b = bytearray(blob)
        if t % 2:
            i = rng.randrange(len(b))
            b[i] ^= 1 << rng.randrange(8)
        else:
            b = b[:rng.randrange(len(b))]
        try:
            rowbinary_decode(bytes(b), sch)
        except ValueError:
            pass
        except Exception as e:  # pragma: no cover
            raise AssertionError(f"case {t}: leaked {type(e).__name__}: {e}")


def test_uint64_above_signed_range_rejected():
    """r13 ADVICE fix: a UInt64 value ≥ 2^63 cannot live in a Spark
    LongType column — it must die as a loud ValueError at decode time,
    not a confusing Arrow conversion failure later."""
    import struct as _struct

    schema = [("k", "UInt64")]
    blob = rowbinary_encode([{"k": 5}], schema)
    # patch the row payload to 2^63 (header is everything before the
    # 8-byte little-endian value at the end)
    bad = blob[:-8] + _struct.pack("<Q", 2**63)
    with pytest.raises(ValueError, match="UInt64.*signed 64-bit"):
        rowbinary_decode(bad, schema)
    # 2^63 - 1 still round-trips
    ok = blob[:-8] + _struct.pack("<Q", 2**63 - 1)
    assert rowbinary_decode(ok, schema) == [{"k": 2**63 - 1}]
