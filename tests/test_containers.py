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
