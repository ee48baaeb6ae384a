"""Ogg container walk (r18): hand-built page assertions against
RFC 3533 / Vorbis I / RFC 7845 structures, CRC verification, cross-page
packet reassembly, honest chained/grouped/unknown-codec classes, and
byte-flip fuzz (never wrong, only dead-letter)."""

from __future__ import annotations

import random
import struct

import pytest

from postgres_debezium_clickhouse_spark.operators.ogg import (
    ogg_encode_fixture,
    ogg_meta_walk,
    ogg_page_crc,
)


def test_page_crc_spec_vector():
    # CRC over 'OggS' page bytes must use poly 0x04C11DB7, init 0,
    # no reflection, no final xor: check against a from-first-
    # principles bitwise implementation on a sample page
    data = bytes(range(64))

    def bitwise(buf: bytes) -> int:
        reg = 0
        for byte in buf:
            for i in range(7, -1, -1):
                bit = (byte >> i) & 1
                top = (reg >> 31) & 1
                reg = ((reg << 1) & 0xFFFFFFFF)
                if top ^ bit:
                    reg ^= 0x04C11DB7
        return reg

    assert ogg_page_crc(data) == bitwise(data)


def test_vorbis_walk_fields():
    blob = ogg_encode_fixture(
        "vorbis", 44100, 2, 44100 * 3,
        tags={"TITLE": "t", "ARTIST": "a"})
    m = ogg_meta_walk(blob)
    assert m["codec"] == "vorbis"
    assert m["channels"] == 2
    assert m["sample_rate"] == 44100
    assert m["pre_skip"] is None
    assert m["duration_ms"] == 3000
    assert m["tags"] == {"TITLE": "t", "ARTIST": "a"}
    assert m["page_count"] == 3


def test_opus_walk_fields_pre_skip_excluded():
    blob = ogg_encode_fixture(
        "opus", 16000, 1, 412 + 960 * 5, pre_skip=412,
        tags={"TITLE": "o"})
    m = ogg_meta_walk(blob)
    assert m["codec"] == "opus"
    assert m["sample_rate"] == 16000     # informational input rate
    assert m["pre_skip"] == 412
    # RFC 7845 §4: duration excludes pre-skip, at 48 kHz
    assert m["duration_ms"] == 960 * 5 * 1000 // 48000 == 100
    assert m["tags"]["TITLE"] == "o"


def test_split_comment_packet_reassembled_across_pages():
    blob = ogg_encode_fixture(
        "vorbis", 8000, 1, 4000, tags={"TITLE": "long"},
        vendor="v" * 400, split_comment=True)
    m = ogg_meta_walk(blob)
    assert m["tags"]["TITLE"] == "long"
    assert m["page_count"] == 4
    # the middle page really does carry the continuation flag
    second = blob.index(b"OggS", 4)
    third = blob.index(b"OggS", second + 4)
    assert blob[third + 5] & 0x01


def test_zero_lacing_terminator_for_255_multiple_packet():
    # a packet of exactly 255 bytes must end with a 0 lacing value
    from postgres_debezium_clickhouse_spark.operators.ogg import _lace
    assert _lace(255) == b"\xff\x00"
    assert _lace(254) == b"\xfe"
    assert _lace(510) == b"\xff\xff\x00"


def test_crc_corruption_dead_letters():
    blob = bytearray(ogg_encode_fixture("vorbis", 8000, 1, 4000))
    blob[-3] ^= 0x01                    # flip a data byte, CRC now wrong
    with pytest.raises(ValueError, match="CRC"):
        ogg_meta_walk(bytes(blob))


def test_chained_stream_not_implemented():
    a = ogg_encode_fixture("vorbis", 8000, 1, 4000)
    b = ogg_encode_fixture("opus", 48000, 1, 312 + 960)
    with pytest.raises(NotImplementedError, match="chained or grouped"):
        ogg_meta_walk(a + b)


def test_unknown_codec_not_implemented():
    # a structurally valid stream whose first packet is not
    # vorbis/opus (e.g. Theora) is honest scope, not corruption
    from postgres_debezium_clickhouse_spark.operators.ogg import (
        _lace, _page)
    ident = b"\x80theora" + bytes(20)
    comment = b"\x81theora" + bytes(8)
    serial = 7
    blob = (_page(serial, 0, 0, 0x02, _lace(len(ident)), ident)
            + _page(serial, 1, 0, 0x04, _lace(len(comment)), comment))
    with pytest.raises(NotImplementedError, match="unsupported Ogg codec"):
        ogg_meta_walk(blob)


def test_missing_comment_header_dead_letters():
    from postgres_debezium_clickhouse_spark.operators.ogg import (
        _lace, _page)
    ident = (b"\x01vorbis" + (0).to_bytes(4, "little") + bytes([1])
             + (8000).to_bytes(4, "little")
             + (0).to_bytes(4, "little") * 3 + b"\xb8\x01")
    blob = _page(5, 0, 0, 0x02 | 0x04, _lace(len(ident)), ident)
    with pytest.raises(ValueError, match="missing Vorbis comment"):
        ogg_meta_walk(blob)


def test_fuzz_never_wrong_only_deadletter():
    rng = random.Random(18)
    blobs = [
        ogg_encode_fixture("vorbis", 44100, 2, 44100,
                           tags={"TITLE": "x"}),
        ogg_encode_fixture("opus", 48000, 1, 312 + 960 * 3),
        ogg_encode_fixture("vorbis", 8000, 1, 4000, vendor="v" * 400,
                           split_comment=True),
    ]
    for b in blobs:
        base = ogg_meta_walk(b)
        for _ in range(1000):
            bb = bytearray(b)
            for _f in range(rng.randint(1, 3)):
                bb[rng.randrange(len(bb))] = rng.randrange(256)
            try:
                ogg_meta_walk(bytes(bb))
            except (ValueError, NotImplementedError):
                pass
        for cut in range(1, len(b), 7):
            try:
                ogg_meta_walk(b[:cut])
            except (ValueError, NotImplementedError):
                pass
        assert ogg_meta_walk(b) == base    # walk never mutates input


def test_spark_plumbing_and_closed_form(spark):
    from postgres_debezium_clickhouse_spark.operators.ogg import (
        ogg_metadata, synth_ogg_docs)

    ids = spark.range(0, 60, 1, 4).withColumnRenamed("id", "doc_id")
    out = ogg_metadata(synth_ogg_docs(ids)).collect()
    assert len(out) == 60
    by_id = {r["doc_id"]: r for r in out}
    for d in range(60):
        r = by_id[d]
        if d % 2 == 0:
            assert r["codec"] == "vorbis"
            assert r["sample_rate"] == [8000, 44100, 48000][d % 3]
            assert r["duration_ms"] == 500 * (1 + d % 7)
            assert r["pre_skip"] is None
        else:
            assert r["codec"] == "opus"
            assert r["pre_skip"] == 312 + 100 * (d % 4)
            assert r["duration_ms"] == 20 * (1 + d % 9)
        assert r["channels"] == 1 + d % 2
        assert r["page_count"] == (4 if d % 5 == 0 else 3)
        assert r["title"] == (f"ogg {d}" if d % 3 == 0 else None)
