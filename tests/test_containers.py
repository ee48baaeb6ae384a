"""ZIP container walk + Office/EPUB metadata (r16): checked against the
independent stdlib zipfile writer; dead-letter classes fuzz-pinned."""

from __future__ import annotations

import io
import random
import zipfile

import pytest

from postgres_debezium_clickhouse_spark.operators.containers import (
    office_meta,
    zip_read_member,
    zip_walk,
)


def _make(entries, comment=b""):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data, method in entries:
            zi = zipfile.ZipInfo(name, (2026, 1, 1, 0, 0, 0))
            zi.compress_type = method
            zf.writestr(zi, data)
        if comment:
            zf.comment = comment
    return buf.getvalue()


def test_walk_and_member_reads_against_stdlib_writer():
    b = _make([
        ("a/b.txt", "hello " * 100, zipfile.ZIP_DEFLATED),
        ("stored.bin", b"\x00\x01\x02", zipfile.ZIP_STORED),
    ], comment=b"trailing archive comment")
    w = zip_walk(b)
    assert w["n_members"] == 2
    by = {m["name"]: m for m in w["members"]}
    assert by["a/b.txt"]["usize"] == 600 and by["a/b.txt"]["method"] == 8
    assert zip_read_member(b, by["a/b.txt"]) == b"hello " * 100
    assert zip_read_member(b, by["stored.bin"]) == b"\x00\x01\x02"


def test_office_kinds_and_core_props():
    core = ("<cp:coreProperties xmlns:dc='x'><dc:title>T</dc:title>"
            "<dc:creator>C</dc:creator></cp:coreProperties>")
    docx = _make([
        ("[Content_Types].xml", "<Types/>", zipfile.ZIP_DEFLATED),
        ("word/document.xml", "<w/>", zipfile.ZIP_DEFLATED),
        ("docProps/core.xml", core, zipfile.ZIP_DEFLATED),
    ])
    m = office_meta(docx)
    assert (m["format"], m["title"], m["creator"]) == ("docx", "T", "C")
    epub = _make([
        ("mimetype", "application/epub+zip", zipfile.ZIP_STORED),
        ("OEBPS/book.opf",
         "<package><metadata><dc:title>E</dc:title>"
         "<dc:creator>A</dc:creator></metadata></package>",
         zipfile.ZIP_DEFLATED),
        ("ch1.xhtml", "<html/>", zipfile.ZIP_DEFLATED),
    ])
    me = office_meta(epub)
    assert (me["format"], me["title"], me["creator"]) == ("epub", "E", "A")
    # epub WITHOUT an opf: kind still detected, metadata honestly NULL
    bare = _make([
        ("mimetype", "application/epub+zip", zipfile.ZIP_STORED),
    ])
    assert office_meta(bare)["format"] == "epub"
    assert office_meta(bare)["title"] is None
    pptx = _make([
        ("[Content_Types].xml", "<Types/>", zipfile.ZIP_DEFLATED),
        ("ppt/presentation.xml", "<p/>", zipfile.ZIP_DEFLATED),
    ])
    assert office_meta(pptx)["format"] == "pptx"
    assert office_meta(_make([("x", "y", zipfile.ZIP_STORED)]))["format"] == "zip"


def test_deadletter_classes():
    b = _make([("f.txt", "data" * 50, zipfile.ZIP_DEFLATED)])
    with pytest.raises(ValueError, match="end-of-central"):
        zip_walk(b"not a zip at all")
    # corrupt the deflate stream -> CRC/size mismatch or bad inflate
    w = zip_walk(b)
    bad = bytearray(b)
    bad[40] ^= 0xFF
    with pytest.raises((ValueError, NotImplementedError)):
        zip_read_member(bytes(bad), zip_walk(bytes(bad))["members"][0])
    rng = random.Random(16)
    for _ in range(2000):
        bb = bytearray(b)
        for _f in range(rng.randint(1, 3)):
            bb[rng.randrange(len(bb))] = rng.randrange(256)
        try:
            ww = zip_walk(bytes(bb))
            for mem in ww["members"]:
                zip_read_member(bytes(bb), mem)
        except (ValueError, NotImplementedError):
            pass
    for cut in range(1, len(b), 5):
        try:
            zip_walk(b[:cut])
        except (ValueError, NotImplementedError):
            pass


def test_eocd_signature_inside_comment():
    # r16 ADVICE (medium): a comment containing the 4-byte EOCD
    # signature is spec-legal; a bare rfind picks the fake record and
    # silently returns n_members=0.  The validated backward scan must
    # find the REAL record (comment-length check like stdlib zipfile).
    evil = b"spec-legal junk " + b"PK\x05\x06" + b"\x00" * 18 + b" more"
    b = _make([("f.txt", "payload " * 20, zipfile.ZIP_DEFLATED)],
              comment=evil)
    # (this container's stdlib zipfile is itself fooled — namelist()
    # returns [] — so the walk is deliberately STRICTER than it: each
    # candidate must run exactly to end-of-blob)
    w = zip_walk(b)
    assert w["n_members"] == 1
    assert zip_read_member(b, w["members"][0]) == b"payload " * 20


def _to_zip64(entries):
    """Spec-driven ZIP64 archive builder (APPNOTE §4.3.14-15, §4.5.3):
    local headers + data written by stdlib, then a hand-built central
    directory with per-entry 0x0001 extras (all three fields sentinel),
    ZIP64 EOCD record, locator, and a sentinel EOCD."""
    import struct
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in entries:
            zi = zipfile.ZipInfo(name, (2026, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, data)
        infos = [(i.filename, i.header_offset, i.CRC, i.compress_size,
                  i.file_size) for i in zf.infolist()]
    raw = buf.getvalue()
    # true CD start: first central-header signature
    cd_off = raw.index(b"PK\x01\x02")
    local = raw[:cd_off]
    out = bytearray(local)
    for name, off, crc, csize, usize in infos:
        nb = name.encode()
        extra = struct.pack("<HHQQQ", 0x0001, 24, usize, csize, off)
        out += b"PK\x01\x02"
        out += struct.pack("<HHHHHHIIIHHHHHII",
                           45, 45, 0, 8, 0, 0x2100, crc,
                           0xFFFFFFFF, 0xFFFFFFFF,
                           len(nb), len(extra), 0, 0, 0, 0, 0xFFFFFFFF)
        out += nb + extra
    cd_size = len(out) - cd_off
    e64_off = len(out)
    out += b"PK\x06\x06" + struct.pack(
        "<QHHIIQQQQ", 44, 45, 45, 0, 0,
        len(infos), len(infos), cd_size, cd_off)
    out += b"PK\x06\x07" + struct.pack("<IQI", 0, e64_off, 1)
    out += b"PK\x05\x06" + struct.pack(
        "<HHHHIIH", 0xFFFF, 0xFFFF, 0xFFFF, 0xFFFF,
        0xFFFFFFFF, 0xFFFFFFFF, 0)
    return bytes(out)


def test_zip64_walk_and_reads():
    entries = [(f"f{j}.txt", f"zip64 member {j} " * 40) for j in range(3)]
    b = _to_zip64(entries)
    assert b"PK\x06\x06" in b and b"PK\x06\x07" in b
    # independent reader cross-check: stdlib reads the hand-built wire
    with zipfile.ZipFile(io.BytesIO(b)) as zf:
        assert sorted(zf.namelist()) == [e[0] for e in entries]
        for name, data in entries:
            assert zf.read(name) == data.encode()
    w = zip_walk(b)
    assert w["n_members"] == 3
    for (name, data), mem in zip(entries,
                                 sorted(w["members"], key=lambda m: m["name"])):
        assert mem["name"] == name
        assert mem["usize"] == len(data)
        assert zip_read_member(b, mem) == data.encode()
    # fuzz the ZIP64 wire form too: never a wrong answer, only dead-letter
    rng = random.Random(17)
    for _ in range(1500):
        bb = bytearray(b)
        for _f in range(rng.randint(1, 3)):
            bb[rng.randrange(len(bb))] = rng.randrange(256)
        try:
            ww = zip_walk(bytes(bb))
            for mem in ww["members"]:
                zip_read_member(bytes(bb), mem)
        except (ValueError, NotImplementedError):
            pass
