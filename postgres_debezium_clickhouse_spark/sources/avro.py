"""Avro source — Object Container Files (r10) + Confluent
Schema-Registry single-message wire format (r16), pure stdlib.

Debezium's OTHER wire format: with a Schema Registry the connector ships
Avro instead of JSON envelopes (public Debezium docs; the reference's
JSON path is abcsvb-connector-secure.json's converter choice) — and on
the wire that is NOT OCF: each Kafka value is magic ``0x00`` + 4-byte
big-endian schema id + raw Avro body (``confluent_frame_*`` /
``decode_confluent_messages`` below, with schema-id → writer-schema
registry lookup and reader-schema resolution).  Spark's
own avro module is an external jar this container lacks (same
infra-blocked class as the Kafka jar — tests/test_live_sources.py), so
this module implements the public Apache Avro 1.11 spec directly:

* OCF framing: ``Obj\\x01`` magic, file-metadata map (``avro.schema``
  JSON + ``avro.codec``), 16-byte sync marker, then (count, byte-size,
  payload, sync) blocks; codecs ``null`` and ``deflate`` (raw zlib).
* Binary encoding: zigzag-varint int/long, little-endian float/double,
  length-prefixed bytes/string, record fields in schema order, arrays
  in count-blocks (negative count = size-prefixed per spec), unions as
  (branch-index, value), enums as index, fixed as raw bytes.

Spark surface: ``read_avro`` lists files, parses ONE header driver-side
to map the writer schema onto a Spark StructType, then decodes all
files inside ``mapInPandas`` over a ``binaryFile`` scan — embarrassingly
parallel, no shuffle, the same scale shape as every media codec.
Corrupt files raise ValueError (dead-letter class, normalized like the
JPEG/WAV decoders); schema features outside the supported subset
(flat-ish records, nullable unions, arrays of scalars, nested records,
enum/fixed) raise NotImplementedError honestly.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------- snappy

def snappy_decompress(data: bytes) -> bytes:
    """Raw Snappy block decompression, pure Python (public format:
    google/snappy format_description.txt).  Preamble = uncompressed
    length as little-endian base-128 varint; then a tag stream — 00
    literal, 01 one-byte-offset copy, 10 two-byte-offset copy, 11
    four-byte-offset copy — with overlapping copies done byte-wise per
    the spec (that is how snappy encodes runs)."""
    n = shift = pos = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated snappy preamble")
        b = data[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 35:
            raise ValueError("malformed snappy preamble")
    out = bytearray()
    while pos < len(data):
        tag = data[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:                            # literal
            ln = tag >> 2
            if ln >= 60:
                nb = ln - 59
                if pos + nb > len(data):
                    raise ValueError("truncated snappy literal length")
                ln = int.from_bytes(data[pos:pos + nb], "little")
                pos += nb
            ln += 1
            if pos + ln > len(data):
                raise ValueError("truncated snappy literal")
            out += data[pos:pos + ln]
            pos += ln
            continue
        if kind == 1:                            # copy, 1-byte offset
            if pos >= len(data):
                raise ValueError("truncated snappy copy")
            ln = ((tag >> 2) & 0x07) + 4
            off = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:                          # copy, 2-byte offset
            if pos + 2 > len(data):
                raise ValueError("truncated snappy copy")
            ln = (tag >> 2) + 1
            off = int.from_bytes(data[pos:pos + 2], "little")
            pos += 2
        else:                                    # copy, 4-byte offset
            if pos + 4 > len(data):
                raise ValueError("truncated snappy copy")
            ln = (tag >> 2) + 1
            off = int.from_bytes(data[pos:pos + 4], "little")
            pos += 4
        if off == 0 or off > len(out):
            raise ValueError("snappy copy offset out of range")
        start = len(out) - off
        for i in range(ln):                      # may overlap: byte-wise
            out.append(out[start + i])
    if len(out) != n:
        raise ValueError("snappy output length mismatch")
    return bytes(out)


def snappy_compress_literal(data: bytes) -> bytes:
    """Fixture-grade Snappy encoder: a VALID stream of pure literals
    (ratio 1.0 — the spec allows it; real encoders emit copies, which
    the decoder above handles)."""
    out = bytearray()
    n = len(data)
    while True:
        out.append((n & 0x7F) | (0x80 if n > 0x7F else 0))
        n >>= 7
        if not n:
            break
    pos = 0
    while pos < len(data):
        chunk = data[pos:pos + 65536]
        ln = len(chunk) - 1
        if ln < 60:
            out.append(ln << 2)
        else:
            out.append(61 << 2)                  # 61 ⇒ TWO extra length bytes
            out.extend((ln & 0xFFFF).to_bytes(2, "little"))
        out.extend(chunk)
        pos += len(chunk)
    return bytes(out)


# ---------------------------------------------------------------- binary core

def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n >= 0 else (n << 1) ^ (n >> 63)


class _Reader:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.d[self.pos:self.pos + n]
        if len(b) != n:
            raise ValueError("truncated Avro data")
        self.pos += n
        return b

    def varint(self) -> int:
        shift = acc = 0
        while True:
            if self.pos >= len(self.d):
                raise ValueError("truncated Avro varint")
            b = self.d[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                return _zigzag_decode(acc)
            shift += 7
            if shift > 70:
                raise ValueError("malformed Avro varint")


def _write_varint(out: bytearray, n: int) -> None:
    u = ((n << 1) ^ (n >> 63)) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _decode_value(r: _Reader, schema):
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return None
        if t == "boolean":
            return r.read(1) != b"\x00"
        if t in ("int", "long"):
            return r.varint()
        if t == "float":
            return struct.unpack("<f", r.read(4))[0]
        if t == "double":
            return struct.unpack("<d", r.read(8))[0]
        if t == "bytes":
            return bytes(r.read(r.varint()))
        if t == "string":
            return r.read(r.varint()).decode("utf-8")
        raise NotImplementedError(f"Avro type {t!r}")
    if isinstance(schema, list):                       # union
        idx = r.varint()
        if not 0 <= idx < len(schema):
            raise ValueError("Avro union index out of range")
        return _decode_value(r, schema[idx])
    t = schema["type"]
    if t == "record":
        return {f["name"]: _decode_value(r, f["type"]) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = r.varint()
            if n == 0:
                return out
            if n < 0:
                n = -n
                r.varint()                             # byte size, unused
            for _ in range(n):
                out.append(_decode_value(r, schema["items"]))
    if t == "map":
        out = {}
        while True:
            n = r.varint()
            if n == 0:
                return out
            if n < 0:
                n = -n
                r.varint()
            for _ in range(n):
                k = r.read(r.varint()).decode("utf-8")
                out[k] = _decode_value(r, schema["values"])
    if t == "enum":
        idx = r.varint()
        symbols = schema["symbols"]
        if not 0 <= idx < len(symbols):
            raise ValueError("Avro enum index out of range")
        return symbols[idx]
    if t == "fixed":
        return bytes(r.read(schema["size"]))
    return _decode_value(r, t)                         # {"type": "long"} wrapper


def _encode_value(out: bytearray, schema, v) -> None:
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return
        if t == "boolean":
            out.append(1 if v else 0)
        elif t in ("int", "long"):
            _write_varint(out, int(v))
        elif t == "float":
            out.extend(struct.pack("<f", v))
        elif t == "double":
            out.extend(struct.pack("<d", v))
        elif t == "bytes":
            _write_varint(out, len(v))
            out.extend(v)
        elif t == "string":
            b = v.encode("utf-8")
            _write_varint(out, len(b))
            out.extend(b)
        else:
            raise NotImplementedError(f"Avro type {t!r}")
        return
    if isinstance(schema, list):                       # union: pick branch
        for i, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch["type"]
            if v is None and bt == "null":
                _write_varint(out, i)
                return
            if v is not None and bt != "null":
                _write_varint(out, i)
                _encode_value(out, branch, v)
                return
        raise ValueError("no matching Avro union branch")
    t = schema["type"]
    if t == "record":
        for f in schema["fields"]:
            _encode_value(out, f["type"], v[f["name"]])
        return
    if t == "array":
        if v:
            _write_varint(out, len(v))
            for item in v:
                _encode_value(out, schema["items"], item)
        _write_varint(out, 0)
        return
    if t == "enum":
        _write_varint(out, schema["symbols"].index(v))
        return
    if t == "fixed":
        out.extend(v)
        return
    raise NotImplementedError(f"Avro type {t!r}")


# ---------------------------------------------------------------- OCF framing

def avro_ocf_decode(blob: bytes) -> tuple[dict, list]:
    """(writer schema, records) from one Object Container File."""
    r = _Reader(blob)
    if r.read(4) != MAGIC:
        raise ValueError("not an Avro OCF (bad magic)")
    meta = _decode_value(r, {"type": "map", "values": "bytes"})
    try:
        schema = json.loads(meta["avro.schema"].decode())
    except (KeyError, json.JSONDecodeError, UnicodeDecodeError) as e:
        raise ValueError(f"bad Avro file metadata: {e}") from e
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate", "snappy"):
        raise NotImplementedError(f"Avro codec {codec!r}; wire in zstd")
    sync = r.read(16)
    records = []
    while r.pos < len(r.d):
        n = r.varint()
        size = r.varint()
        payload = r.read(size)
        if r.read(16) != sync:
            raise ValueError("Avro block sync mismatch")
        if codec == "deflate":
            try:
                payload = zlib.decompress(payload, -15)
            except zlib.error as e:
                raise ValueError(f"bad Avro deflate block: {e}") from e
        elif codec == "snappy":
            # Avro snappy framing: snappy block + 4-byte BIG-endian
            # CRC32 of the UNCOMPRESSED data (Avro spec, data block
            # codecs) — verified, not skipped
            if len(payload) < 4:
                raise ValueError("truncated Avro snappy block")
            body, crc = payload[:-4], payload[-4:]
            payload = snappy_decompress(body)
            if zlib.crc32(payload) & 0xFFFFFFFF != int.from_bytes(crc, "big"):
                raise ValueError("Avro snappy block CRC mismatch")
        br = _Reader(payload)
        for _ in range(n):
            records.append(_decode_value(br, schema))
        if br.pos != len(payload):
            raise ValueError("Avro block size mismatch")
    return schema, records


def avro_ocf_encode(schema: dict, records: list, codec: str = "deflate",
                    records_per_block: int = 1000) -> bytes:
    """Fixture-grade OCF writer (null/deflate codecs, fixed sync)."""
    out = bytearray(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    _write_varint(out, len(meta))
    for k, v in meta.items():
        kb = k.encode()
        _write_varint(out, len(kb))
        out.extend(kb)
        _write_varint(out, len(v))
        out.extend(v)
    _write_varint(out, 0)
    sync = bytes(range(16))
    out.extend(sync)
    for i in range(0, len(records), records_per_block):
        chunk = records[i:i + records_per_block]
        body = bytearray()
        for rec in chunk:
            _encode_value(body, schema, rec)
        payload = bytes(body)
        if codec == "deflate":
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            payload = co.compress(payload) + co.flush()
        elif codec == "snappy":
            payload = snappy_compress_literal(payload) + (
                zlib.crc32(payload) & 0xFFFFFFFF
            ).to_bytes(4, "big")
        _write_varint(out, len(chunk))
        _write_varint(out, len(payload))
        out.extend(payload)
        out.extend(sync)
    return bytes(out)


# ---------------------------------------------------------------- Spark surface

_AVRO_TO_SPARK = {
    "null": T.NullType(), "boolean": T.BooleanType(), "int": T.IntegerType(),
    "long": T.LongType(), "float": T.FloatType(), "double": T.DoubleType(),
    "bytes": T.BinaryType(), "string": T.StringType(),
}


def avro_schema_to_spark(schema) -> T.DataType:
    """Writer schema → Spark type (the supported subset; unions must be
    ["null", X] nullability unions — general unions have no Spark
    analogue and raise honestly)."""
    if isinstance(schema, str):
        if schema in _AVRO_TO_SPARK:
            return _AVRO_TO_SPARK[schema]
        raise NotImplementedError(f"Avro type {schema!r}")
    if isinstance(schema, list):
        branches = [b for b in schema if b != "null"]
        if len(branches) != 1:
            raise NotImplementedError("general Avro unions have no Spark analogue")
        return avro_schema_to_spark(branches[0])
    t = schema["type"]
    if t == "record":
        return T.StructType(
            [
                T.StructField(f["name"], avro_schema_to_spark(f["type"]), True)
                for f in schema["fields"]
            ]
        )
    if t == "array":
        return T.ArrayType(avro_schema_to_spark(schema["items"]), True)
    if t == "map":
        return T.MapType(T.StringType(), avro_schema_to_spark(schema["values"]), True)
    if t == "enum":
        return T.StringType()
    if t == "fixed":
        return T.BinaryType()
    return avro_schema_to_spark(t)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Typed DataFrame from a directory/glob of Avro OCFs.  ONE header is
    parsed driver-side to fix the output schema (top-level record
    required — a column-less scalar file has no tabular shape); the file
    BODIES are decoded in parallel inside ``mapInPandas`` over a
    binaryFile scan.  All files must share the driver-sampled schema
    (the usual single-topic contract); a mismatching file fails its task
    loudly rather than silently coercing."""
    files_df = spark.read.format("binaryFile").load(path)
    first = files_df.select("path", "content").limit(1).collect()
    if not first:
        raise FileNotFoundError(f"no files at {path}")
    # header-only parse driver-side (magic + metadata map); the bodies
    # are decoded on executors like every other file
    schema, _ = _header_only(bytes(first[0]["content"]))
    if not (isinstance(schema, dict) and schema.get("type") == "record"):
        raise NotImplementedError("top-level Avro schema must be a record")
    spark_schema = avro_schema_to_spark(schema)
    assert isinstance(spark_schema, T.StructType)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in spark_schema.fields]
        for pdf in batches:
            rows: dict[str, list] = {c: [] for c in cols}
            for blob in pdf["content"]:
                fschema, records = avro_ocf_decode(bytes(blob))
                if fschema != schema:
                    raise ValueError(
                        "Avro writer schema differs from the driver-sampled one"
                    )
                for rec in records:
                    for c in cols:
                        rows[c].append(rec.get(c))
            yield pd.DataFrame(rows, columns=cols)

    return files_df.select("content").mapInPandas(_decode, schema=spark_schema)


def read_avro_stream(spark: SparkSession, path: str,
                     avro_schema: dict) -> DataFrame:
    """Streaming twin of ``read_avro``: new OCF files arriving under
    ``path`` become typed micro-batches (binaryFile stream source →
    executor-parallel body decode).  A stream cannot sample a header
    before files exist, so the writer schema is an explicit argument —
    the Schema-Registry contract made literal; files whose embedded
    schema differs fail their trigger loudly (poison-file policy is the
    caller's dead-letter wrapper, like every other source)."""
    if not (isinstance(avro_schema, dict) and avro_schema.get("type") == "record"):
        raise NotImplementedError("top-level Avro schema must be a record")
    spark_schema = avro_schema_to_spark(avro_schema)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in spark_schema.fields]
        for pdf in batches:
            rows: dict[str, list] = {c: [] for c in cols}
            for blob in pdf["content"]:
                fschema, records = avro_ocf_decode(bytes(blob))
                if fschema != avro_schema:
                    raise ValueError(
                        "Avro writer schema differs from the declared one"
                    )
                for rec in records:
                    for c in cols:
                        rows[c].append(rec.get(c))
            yield pd.DataFrame(rows, columns=cols)

    binary_file_schema = (
        "path string, modificationTime timestamp, length long, content binary"
    )
    return (
        spark.readStream.format("binaryFile")
        .schema(binary_file_schema)
        .load(path)
        .select("content")
        .mapInPandas(_decode, schema=spark_schema)
    )


def _header_only(blob: bytes) -> tuple[dict, None]:
    r = _Reader(blob)
    if r.read(4) != MAGIC:
        raise ValueError("not an Avro OCF (bad magic)")
    meta = _decode_value(r, {"type": "map", "values": "bytes"})
    try:
        schema = json.loads(meta["avro.schema"].decode())
    except (KeyError, json.JSONDecodeError) as e:
        raise ValueError(f"bad Avro file metadata: {e}") from e
    return schema, None


# ------------------------------------------- Confluent Schema Registry wire

#: Confluent wire-format magic byte (public docs: "Wire format" —
#: docs.confluent.io serializer reference): every Kafka message value is
#: 0x00, then the 4-byte big-endian schema id, then the raw Avro binary
#: body with NO OCF framing.
CONFLUENT_MAGIC = 0x00


def confluent_frame_encode(schema_id: int, schema: dict, record: dict) -> bytes:
    """One Kafka-message value in the Confluent wire format: magic 0x00 +
    big-endian uint32 schema id + raw Avro binary record body."""
    out = bytearray([CONFLUENT_MAGIC])
    out.extend(struct.pack(">I", schema_id))
    _encode_value(out, schema, record)
    return bytes(out)


def confluent_frame_decode(blob: bytes, registry: dict[int, dict]) -> tuple[int, dict]:
    """(schema_id, record) from one wire-format message.  ``registry``
    is the schema-id → writer-schema table (what the Schema Registry's
    GET /schemas/ids/{id} returns, materialized — the reference
    ecosystem's dictionary/dict_get pattern).  Unknown ids and trailing
    bytes raise ValueError (dead-letter class)."""
    if not blob or blob[0] != CONFLUENT_MAGIC:
        raise ValueError("not Confluent wire format (bad magic byte)")
    if len(blob) < 5:
        raise ValueError("truncated Confluent frame (no schema id)")
    schema_id = struct.unpack(">I", blob[1:5])[0]
    schema = registry.get(schema_id)
    if schema is None:
        raise ValueError(f"schema id {schema_id} not in registry")
    r = _Reader(blob[5:])
    try:
        rec = _decode_value(r, schema)
    except (IndexError, KeyError, struct.error) as e:
        raise ValueError(f"corrupt Avro body ({type(e).__name__})") from e
    if r.pos != len(r.d):
        raise ValueError("trailing bytes after Avro body")
    return schema_id, rec


def resolve_avro_record(record: dict, writer_schema: dict,
                        reader_schema: dict) -> dict:
    """Avro schema RESOLUTION (spec §"Schema Resolution", the subset
    registry evolution actually uses): reader fields match writer fields
    by name; reader-only fields take their declared ``default`` (the
    registry's backward-compatibility contract guarantees one exists);
    writer-only fields are ignored."""
    writer_names = {f["name"] for f in writer_schema["fields"]}
    out = {}
    for f in reader_schema["fields"]:
        name = f["name"]
        if name in writer_names:
            out[name] = record.get(name)
        elif "default" in f:
            out[name] = f["default"]
        else:
            raise ValueError(
                f"reader field {name!r} absent from writer schema and has "
                "no default — schemas are not backward compatible"
            )
    return out


def decode_confluent_messages(
    messages: DataFrame,
    registry: dict[int, dict],
    reader_schema: dict,
    value_col: str = "value",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Typed DataFrame from a Kafka-shaped message frame (one BINARY
    wire-format value per row — what the raw bronze wire log stores):
    per message, magic/id parse → registry lookup → Avro body decode
    with the message's OWN writer schema → resolution into the single
    ``reader_schema`` (so a topic mid-migration, carrying several
    schema ids at once, lands in one typed table — the evolution story
    ``cdc_json_schema_envelope`` tells for JSON, now for Avro).

    Scale: the registry dict (id → writer schema) is closure-captured
    into the mapInPandas decoder — a broadcast-sized dictionary table
    exactly like a ClickHouse ``dict_get`` dimension; the decode is
    embarrassingly parallel over message rows, no shuffle.  A
    ``schema_id`` column is emitted for observability (count messages
    per schema version while a migration drains)."""
    if not (isinstance(reader_schema, dict)
            and reader_schema.get("type") == "record"):
        raise NotImplementedError("reader schema must be a record")
    spark_schema = avro_schema_to_spark(reader_schema)
    assert isinstance(spark_schema, T.StructType)
    keep = list(keep_cols or [])
    out_schema = T.StructType(
        [messages.schema[c] for c in keep]
        + [T.StructField("schema_id", T.IntegerType())]
        + list(spark_schema.fields)
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in spark_schema.fields]
        for pdf in batches:
            rows: dict[str, list] = {c: [] for c in keep}
            rows["schema_id"] = []
            for c in cols:
                rows[c] = []
            for i, blob in enumerate(pdf[value_col]):
                sid, rec = confluent_frame_decode(bytes(blob), registry)
                resolved = resolve_avro_record(rec, registry[sid], reader_schema)
                for c in keep:
                    rows[c].append(pdf[c].iloc[i])
                rows["schema_id"].append(sid)
                for c in cols:
                    rows[c].append(resolved.get(c))
            yield pd.DataFrame(rows, columns=keep + ["schema_id"] + cols)

    return messages.select(*keep, value_col).mapInPandas(
        _decode, schema=out_schema
    )
