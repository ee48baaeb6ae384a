"""WARC (Web ARChive, ISO 28500 / WARC 1.1) source — the container
format every web-scale training corpus starts life in (CommonCrawl
publishes crawls as gzipped WARCs; C4/FineWeb/Dolma/RefinedWeb all open
with a WARC pass).  Not a reference format (the reference ingests
Debezium topics), but the S6 object-store surface a corpus pipeline on
this engine needs first.

Implemented from the PUBLIC spec, stdlib-only (like sources/avro.py and
sources/protobuf.py — no warcio in this environment, and the format is
simple enough that the spec is the cleaner dependency):

- record = ``WARC/1.0\\r\\n`` (or 1.1) + ``Name: value\\r\\n`` headers +
  blank line + exactly ``Content-Length`` payload bytes + ``\\r\\n\\r\\n``
- mandatory headers: WARC-Type, WARC-Record-ID, WARC-Date,
  Content-Length (spec §5); response/request records carry
  WARC-Target-URI
- ``.warc.gz`` files are CONCATENATED GZIP MEMBERS, one record per
  member (the CommonCrawl convention, spec annex C) — readable with a
  zlib loop, seekable by member at scale

Scale shape: ``read_warc`` is a binaryFile scan + Arrow ``mapInPandas``
parse — embarrassingly parallel over files, no shuffle, the same plan
as every codec in operators/imaging.py.  At 100 TB the unit of
parallelism is the WARC segment file (~1 GB each in CommonCrawl), which
is exactly what the scan bin-packs.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_CRLF = b"\r\n"
_VERSION_RE = re.compile(rb"^WARC/(\d+\.\d+)$")


def warc_record_encode(headers: dict, payload: bytes,
                       version: str = "1.0") -> bytes:
    """One WARC record, spec-shaped.  ``Content-Length`` is computed —
    passing it in ``headers`` is an error (the one field that cannot be
    allowed to drift from the payload)."""
    if any(k.lower() == "content-length" for k in headers):
        raise ValueError("Content-Length is computed from the payload")
    out = [f"WARC/{version}".encode()]
    for k, v in headers.items():
        out.append(f"{k}: {v}".encode())
    out.append(f"Content-Length: {len(payload)}".encode())
    head = _CRLF.join(out) + _CRLF + _CRLF
    return head + payload + _CRLF + _CRLF


def warc_encode_segment(records: list[tuple[dict, bytes]],
                        gzip_members: bool = False) -> bytes:
    """A segment file: records back-to-back; with ``gzip_members`` each
    record becomes its own gzip member (the CommonCrawl .warc.gz
    layout — members are independently decompressible, which is what
    makes a 1 GB segment random-accessible by offset index)."""
    blobs = []
    for headers, payload in records:
        raw = warc_record_encode(headers, payload)
        if gzip_members:
            co = zlib.compressobj(9, zlib.DEFLATED, 31)
            raw = co.compress(raw) + co.flush()
        blobs.append(raw)
    return b"".join(blobs)


def _gunzip_members(blob: bytes) -> bytes:
    """Decompress concatenated gzip members (stdlib gzip.decompress
    stops at the first member on some versions; the zlib loop is the
    portable spelling)."""
    out = []
    while blob:
        d = zlib.decompressobj(31)
        out.append(d.decompress(blob))
        blob = d.unused_data
    return b"".join(out)


def warc_parse(blob: bytes, source: str = "<bytes>") -> list[dict]:
    """Parse one (decompressed) WARC file into record dicts:
    ``{offset, warc_type, record_id, warc_date, target_uri,
    content_type, content_length, payload}``.  LOUD on malformation —
    a bad version line, a missing mandatory header, or a truncated
    payload names the file and offset rather than yielding a short
    read (the dead-letter policy every codec in this engine shares)."""
    records = []
    pos = 0
    n = len(blob)
    while pos < n:
        # tolerate trailing CRLF padding between records
        while pos < n and blob[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        start = pos
        head_end = blob.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            raise ValueError(f"{source}@{start}: unterminated WARC header")
        lines = blob[pos:head_end].split(_CRLF)
        m = _VERSION_RE.match(lines[0])
        if not m:
            raise ValueError(
                f"{source}@{start}: bad WARC version line {lines[0]!r}")
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            k, sep, v = ln.partition(b":")
            if not sep:
                raise ValueError(f"{source}@{start}: bad header line {ln!r}")
            headers[k.strip().decode().lower()] = v.strip().decode()
        missing = {"warc-type", "warc-record-id", "warc-date",
                   "content-length"} - set(headers)
        if missing:
            raise ValueError(
                f"{source}@{start}: missing mandatory headers {sorted(missing)}")
        clen = int(headers["content-length"])
        body_start = head_end + 4
        if body_start + clen > n:
            raise ValueError(
                f"{source}@{start}: payload truncated "
                f"({n - body_start} of {clen} bytes)")
        records.append({
            "offset": start,
            "warc_type": headers["warc-type"],
            "record_id": headers["warc-record-id"],
            "warc_date": headers["warc-date"],
            "target_uri": headers.get("warc-target-uri"),
            "content_type": headers.get("content-type"),
            "content_length": clen,
            "payload": blob[body_start:body_start + clen],
        })
        pos = body_start + clen
    return records


WARC_SCHEMA = T.StructType([
    T.StructField("file", T.StringType()),
    T.StructField("offset", T.LongType()),
    T.StructField("warc_type", T.StringType()),
    T.StructField("record_id", T.StringType()),
    T.StructField("warc_date", T.StringType()),
    T.StructField("target_uri", T.StringType()),
    T.StructField("content_type", T.StringType()),
    T.StructField("content_length", T.LongType()),
    T.StructField("payload", T.BinaryType()),
])


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """One row per WARC record from a directory/glob of ``.warc`` /
    ``.warc.gz`` segment files.  binaryFile scan → executor-parallel
    ``mapInPandas`` parse (Arrow batches, no Python per row beyond the
    per-record header walk) — no shuffle; downstream type filters
    (``warc_type = 'response'``) prune before anything heavy runs."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_SCHEMA.fields]
        for pdf in batches:
            rows: dict[str, list] = {c: [] for c in cols}
            for fname, blob in zip(pdf["path"], pdf["content"]):
                data = bytes(blob)
                if str(fname).endswith(".gz"):
                    data = _gunzip_members(data)
                for rec in warc_parse(data, source=str(fname)):
                    rows["file"].append(str(fname))
                    for c in cols[1:]:
                        rows[c].append(rec[c])
            yield pd.DataFrame(rows)

    return (
        spark.read.format("binaryFile").load(path)
        .select("path", "content")
        .mapInPandas(_decode, WARC_SCHEMA)
    )
