"""Protobuf wire-format source (r10 module, r11 tests — ADVICE r10: the
module shipped unreferenced; these tests mirror test_avro.py and pin its
claimed contracts: roundtrip across the full type matrix, corrupt bytes →
ValueError, wire-type mismatch detection, zigzag/packed decode, Confluent
frame edge cases, unknown-field forward-compat skip)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from postgres_debezium_clickhouse_spark.sources.protobuf import (
    confluent_frame, confluent_unframe, proto_decode, proto_dump_decode,
    proto_dump_encode, proto_encode, proto_schema_to_spark, read_proto,
    read_proto_stream,
)

DESC = {
    "name": "order", "fields": [
        {"name": "id", "type": "int64", "number": 1},
        {"name": "name", "type": "string", "number": 2},
        {"name": "price", "type": "double", "number": 3},
        {"name": "ratio", "type": "float", "number": 4},
        {"name": "delta", "type": "sint64", "number": 5},
        {"name": "ok", "type": "bool", "number": 6},
        {"name": "kind", "type": "enum", "number": 7,
         "symbols": ["a", "b", "c"]},
        {"name": "raw", "type": "bytes", "number": 8},
        {"name": "tags", "type": "repeated_int64", "number": 9},
        {"name": "ws", "type": "repeated_double", "number": 10},
        {"name": "who", "type": "message", "number": 11, "message": {
            "name": "who", "fields": [
                {"name": "cust", "type": "int64", "number": 1},
                {"name": "seg", "type": "string", "number": 2},
            ],
        }},
    ],
}


def _recs(lo, hi):
    return [
        {"id": i, "name": f"n{i}",
         "price": None if i % 3 == 0 else i * 1.5,
         "ratio": float(i % 4),          # exact in float32
         "delta": (-1) ** i * i * 3,     # zigzag both signs
         "ok": bool(i % 2),
         "kind": ["a", "b", "c"][i % 3],
         "raw": bytes([i % 256, (i * 7) % 256]),
         "tags": [i, -i, i * 2],         # packed varints, negatives
         "ws": [i * 0.5, -i * 2.0],
         "who": None if i % 5 == 0 else {"cust": i * 10, "seg": f"s{i % 3}"}}
        for i in range(lo, hi)
    ]


def test_roundtrip_full_type_matrix():
    for rec in _recs(0, 300):
        out = proto_decode(proto_encode(DESC, rec), DESC)
        assert out == rec


def test_explicit_presence_none_fields_omitted_from_wire():
    rec = {"id": 7}
    blob = proto_encode(DESC, rec)
    # only field 1 on the wire: tag 0x08 + varint 7
    assert blob == b"\x08\x07"
    out = proto_decode(blob, DESC)
    assert out["id"] == 7
    assert all(out[f["name"]] is None for f in DESC["fields"]
               if f["name"] != "id")


def test_negative_int64_is_ten_byte_varint_and_zigzag_is_short():
    d_int = {"name": "x", "fields": [{"name": "v", "type": "int64", "number": 1}]}
    d_sint = {"name": "x", "fields": [{"name": "v", "type": "sint64", "number": 1}]}
    b_int = proto_encode(d_int, {"v": -1})
    b_sint = proto_encode(d_sint, {"v": -1})
    assert len(b_int) == 11 and len(b_sint) == 2     # spec: -1 → 10-byte varint vs zigzag 1
    assert proto_decode(b_int, d_int) == {"v": -1}
    assert proto_decode(b_sint, d_sint) == {"v": -1}
    big = (1 << 62) + 12345
    for d, v in ((d_int, -big), (d_sint, -big), (d_int, big), (d_sint, big)):
        assert proto_decode(proto_encode(d, {"v": v}), d) == {"v": v}


def test_unknown_fields_skipped_by_wire_type():
    """Forward compat: a NEWER writer's extra fields (one per wire type)
    must be skipped, not break the decode."""
    wide = {"name": "w", "fields": DESC["fields"] + [
        {"name": "extra_v", "type": "int64", "number": 20},
        {"name": "extra_d", "type": "double", "number": 21},
        {"name": "extra_s", "type": "string", "number": 22},
        {"name": "extra_f", "type": "float", "number": 23},
    ]}
    rec = _recs(1, 2)[0]
    blob = proto_encode(wide, {**rec, "extra_v": -9, "extra_d": 2.5,
                               "extra_s": "zz", "extra_f": 1.0})
    assert proto_decode(blob, DESC) == rec


def test_corruption_classes_raise_value_error():
    rec = _recs(1, 2)[0]
    blob = proto_encode(DESC, rec)
    with pytest.raises(ValueError, match="truncated"):
        proto_decode(blob[:-1], DESC)
    # wire-type mismatch on a KNOWN field: field 1 as length-delimited
    with pytest.raises(ValueError, match="wire type"):
        proto_decode(b"\x0a\x01x", DESC)
    # enum index out of range
    with pytest.raises(ValueError, match="enum index"):
        proto_decode(b"\x38\x09", DESC)
    # invalid utf-8 in a string field
    with pytest.raises(ValueError, match="utf-8"):
        proto_decode(b"\x12\x02\xff\xfe", DESC)
    # packed double body not a multiple of 8
    with pytest.raises(ValueError, match="multiple of 8"):
        proto_decode(b"\x52\x03abc", DESC)
    # unterminated varint
    with pytest.raises(ValueError, match="varint"):
        proto_decode(b"\x08\xff\xff\xff\xff\xff\xff\xff\xff\xff\xff\xff", DESC)
    # reserved wire types 3/4 (groups) on an UNKNOWN field
    # tag varint for field 99, wire 3: (99 << 3) | 3 = 795 → 0x9b 0x06
    with pytest.raises(ValueError, match="wire type"):
        proto_decode(b"\x9b\x06", DESC)


def test_descriptor_validation():
    with pytest.raises(NotImplementedError, match="unsupported field type"):
        proto_encode({"name": "x", "fields": [
            {"name": "m", "type": "map", "number": 1}]}, {})
    with pytest.raises(NotImplementedError, match="duplicate field number"):
        proto_encode({"name": "x", "fields": [
            {"name": "a", "type": "int64", "number": 1},
            {"name": "b", "type": "int64", "number": 1}]}, {})
    with pytest.raises(NotImplementedError, match="bad field number"):
        proto_encode({"name": "x", "fields": [
            {"name": "a", "type": "int64", "number": 0}]}, {})
    with pytest.raises(NotImplementedError, match="enum field needs"):
        proto_encode({"name": "x", "fields": [
            {"name": "k", "type": "enum", "number": 1}]}, {})


def test_confluent_frame_edge_cases():
    payload = proto_encode(DESC, _recs(3, 4)[0])
    # common [0] index list compresses to the single-byte shortcut
    framed = confluent_frame(payload, schema_id=42)
    assert framed[0] == 0 and framed[1:5] == (42).to_bytes(4, "big")
    assert framed[5] == 0 and framed[6:] == payload
    sid, idx, body = confluent_unframe(framed)
    assert (sid, idx, body) == (42, [0], payload)
    # explicit multi-level message index
    framed2 = confluent_frame(payload, schema_id=7, indexes=[1, 2, 3])
    assert confluent_unframe(framed2) == (7, [1, 2, 3], payload)
    with pytest.raises(ValueError, match="bad magic"):
        confluent_unframe(b"\x01" + framed[1:])
    with pytest.raises(ValueError, match="bad magic"):
        confluent_unframe(b"\x00\x00\x01")          # too short
    with pytest.raises(ValueError, match="implausible"):
        # zigzag(-1) = 1 varint-encodes as 0x01... craft count = -1
        confluent_unframe(b"\x00" + (1).to_bytes(4, "big") + b"\x01")


def test_dump_roundtrip_and_truncation():
    recs = _recs(0, 400)
    blob = proto_dump_encode(DESC, recs, schema_id=5)
    assert proto_dump_decode(blob, DESC) == recs
    with pytest.raises(ValueError):
        proto_dump_decode(blob[:-3], DESC)


def test_schema_mapping():
    st = proto_schema_to_spark(DESC)
    assert isinstance(st, T.StructType)
    assert st["id"].dataType == T.LongType()
    assert st["price"].dataType == T.DoubleType()
    assert st["ratio"].dataType == T.FloatType()
    assert st["kind"].dataType == T.StringType()        # enum → string
    assert st["tags"].dataType == T.ArrayType(T.LongType())
    assert st["ws"].dataType == T.ArrayType(T.DoubleType())
    assert isinstance(st["who"].dataType, T.StructType)
    assert st["who"].dataType["cust"].dataType == T.LongType()


def test_read_proto_parallel_files(spark, tmp_path):
    d = tmp_path / "proto"
    d.mkdir()
    for part in range(4):
        recs = _recs(part * 100, part * 100 + 100)
        (d / f"part-{part}.pb").write_bytes(
            proto_dump_encode(DESC, recs, schema_id=part + 1)
        )
    df = read_proto(spark, str(d), DESC)
    assert [f.name for f in df.schema.fields] == [
        "id", "name", "price", "ratio", "delta", "ok", "kind", "raw",
        "tags", "ws", "who",
    ]
    rows = {r.id: r for r in df.collect()}
    assert len(rows) == 400
    assert rows[7].price == 10.5 and rows[9].price is None
    assert rows[8].kind == "c" and list(rows[5].tags) == [5, -5, 10]
    assert rows[11].delta == -33 and rows[10].who is None
    assert rows[11].who.cust == 110 and rows[11].who.seg == "s2"


def test_read_proto_stream_micro_batches(spark, tmp_path):
    src = tmp_path / "stream_src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    for part in range(3):
        (src / f"p{part}.pb").write_bytes(
            proto_dump_encode(DESC, _recs(part * 50, part * 50 + 50))
        )
    stream = read_proto_stream(spark, str(src), DESC)
    q = (stream.writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .option("maxFilesPerTrigger", "1")
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 150
    assert {r.id for r in got.select("id").collect()} == set(range(150))
