"""gzip member / zstd frame walks (r18): stdlib-gzip cross-validation
in BOTH directions, trailer verification, multi-member files, zstd
structure walk over hand-built raw-block frames (no zstd codec exists
in this container — raw blocks are spec-decodable by any real zstd,
and the writer is built from the RFC 8878 field tables), fuzz."""

from __future__ import annotations

import gzip as stdlib_gzip
import random
import struct
import zlib

import pytest

from postgres_debezium_clickhouse_spark.operators.compressed import (
    gzip_encode_member,
    gzip_members_walk,
    zstd_encode_raw_frame,
    zstd_frames_walk,
    zstd_skippable_frame,
)


def test_gzip_cross_validation_with_stdlib():
    data = b"the quick brown fox " * 20
    ours = gzip_encode_member(data, name="a.txt", mtime=123)
    assert stdlib_gzip.decompress(ours) == data      # stdlib reads ours
    theirs = stdlib_gzip.compress(data)
    m = gzip_members_walk(theirs)                    # we read stdlib's
    assert m["n_members"] == 1
    assert m["total_uncompressed"] == len(data)


def test_gzip_multi_member_and_fields():
    blob = (gzip_encode_member(b"first", name="f1", mtime=10)
            + gzip_encode_member(b"second longer payload", mtime=20)
            + stdlib_gzip.compress(b"third"))
    m = gzip_members_walk(blob)
    assert m["n_members"] == 3
    assert m["names"] == ["f1"]
    assert m["mtime_first"] == 10 and m["os_first"] == 3
    assert m["total_uncompressed"] == 5 + 21 + 5


def test_gzip_trailer_verification():
    good = bytearray(gzip_encode_member(b"payload data here"))
    bad_crc = bytearray(good)
    bad_crc[-5] ^= 0xFF
    with pytest.raises(ValueError, match="CRC32 mismatch"):
        gzip_members_walk(bytes(bad_crc))
    bad_isize = bytearray(good)
    bad_isize[-1] ^= 0xFF
    with pytest.raises(ValueError, match="ISIZE mismatch"):
        gzip_members_walk(bytes(bad_isize))
    with pytest.raises(ValueError, match="bad gzip magic"):
        gzip_members_walk(b"\x00" * 20)
    with pytest.raises(ValueError, match="truncated gzip deflate"):
        gzip_members_walk(bytes(good[:-12]))


def test_zstd_structure_walk():
    data = b"z" * 300
    blob = (zstd_skippable_frame(b"meta", nibble=5)
            + zstd_encode_raw_frame(data, with_size=True, checksum=True,
                                    dict_id=120)
            + zstd_encode_raw_frame(b"y" * 50, with_size=False))
    m = zstd_frames_walk(blob)
    assert m["n_frames"] == 2 and m["n_skippable"] == 1
    assert m["content_size"] is None                 # one frame omits it
    assert m["dict_id"] == 120 and m["has_checksum"]
    assert m["window_log"] == 21
    m2 = zstd_frames_walk(zstd_encode_raw_frame(data, with_size=True))
    assert m2["content_size"] == 300
    assert m2["n_blocks"] == (300 + 63) // 64
    # single-segment small frame has no window descriptor
    m3 = zstd_frames_walk(zstd_encode_raw_frame(b"abc", with_size=True))
    assert m3["window_log"] is None and m3["content_size"] == 3


def test_zstd_deadletter_classes():
    with pytest.raises(ValueError, match="bad zstd magic"):
        zstd_frames_walk(b"\x00\x01\x02\x03rest")
    fr = bytearray(zstd_encode_raw_frame(b"abcd" * 20, with_size=True))
    # reserved block type (set both type bits of the first block header)
    bad = bytearray(fr)
    # frame: magic(4) fhd(1) fcs(1) then block header
    bad[6] |= 0x06
    with pytest.raises(ValueError, match="reserved block type"):
        zstd_frames_walk(bytes(bad))
    with pytest.raises(ValueError, match="truncated|overruns"):
        zstd_frames_walk(bytes(fr[:-3]))
    # reserved frame-header bit
    bad2 = bytearray(fr)
    bad2[4] |= 0x08
    with pytest.raises(ValueError, match="reserved bit"):
        zstd_frames_walk(bytes(bad2))


def test_fuzz_never_wrong_only_deadletter():
    rng = random.Random(518)
    blobs = [
        gzip_encode_member(b"fuzz target one " * 8, name="n"),
        (zstd_skippable_frame(b"s")
         + zstd_encode_raw_frame(b"fuzz target two " * 30,
                                 checksum=True, dict_id=7)),
    ]
    walks = [gzip_members_walk, zstd_frames_walk]
    for b, walk in zip(blobs, walks):
        base = walk(b)
        for _ in range(1200):
            bb = bytearray(b)
            for _f in range(rng.randint(1, 3)):
                bb[rng.randrange(len(bb))] = rng.randrange(256)
            try:
                walk(bytes(bb))
            except ValueError:
                pass
        for cut in range(1, len(b), 5):
            try:
                walk(b[:cut])
            except ValueError:
                pass
        assert walk(b) == base


def test_spark_plumbing_and_closed_form(spark):
    from postgres_debezium_clickhouse_spark.operators.compressed import (
        gzip_metadata, synth_gzip_docs, synth_zstd_docs, zstd_metadata)

    ids = spark.range(0, 60, 1, 4).withColumnRenamed("id", "doc_id")
    gz = {r["doc_id"]: r for r in
          gzip_metadata(synth_gzip_docs(ids)).collect()}
    for d in range(60):
        r = gz[d]
        L = 14 + len(str(d))
        assert r["n_members"] == 1 + d % 3
        assert r["first_name"] == "m0.txt"
        assert r["mtime_first"] == 1_700_000_000 + d
        assert r["total_uncompressed"] == sum(
            L * (4 + (d + m) % 5) for m in range(1 + d % 3))
    zs = {r["doc_id"]: r for r in
          zstd_metadata(synth_zstd_docs(ids)).collect()}
    for d in range(60):
        r = zs[d]
        L = (13 + len(str(d))) * (8 + d % 7)
        n_f = 1 + d % 2
        assert r["n_frames"] == n_f
        assert r["n_skippable"] == (1 if d % 4 == 0 else 0)
        if d % 5 == 0:
            assert r["content_size"] is None
        else:
            assert r["content_size"] == n_f * L
        assert r["has_checksum"] == (d % 2 == 1)
        assert r["n_blocks"] == n_f * ((L + 63) // 64)
        if d % 3 == 0:
            assert r["dict_id"] == 100 + d % 50
        non_single = d % 5 == 0 or L > 255
        assert r["window_log"] == (21 if non_single else None)
