"""PDF metadata walk (r16): classic-xref file structure, /Prev chains,
object grammar, honest dead-letter classes."""

from __future__ import annotations

import random

import pytest

from postgres_debezium_clickhouse_spark.operators.pdfmeta import (
    pdf_encode_meta_fixture,
    pdf_meta_walk,
)


def test_walk_basic_and_incremental():
    b = pdf_encode_meta_fixture(4, "t", "a")
    m = pdf_meta_walk(b)
    assert (m["page_count"], m["title"], m["author"]) == (4, "t", "a")
    assert m["n_objects"] == 4 + 3 + 1 and m["version"] == "1.4"
    # incremental update: newest xref wins, replacement /Info drops author
    b2 = pdf_encode_meta_fixture(4, "t", "a", incremental=True)
    m2 = pdf_meta_walk(b2)
    assert (m2["title"], m2["author"]) == ("t v2", None)
    assert m2["page_count"] == 4      # page tree untouched by the update
    # no-Info documents
    m3 = pdf_meta_walk(pdf_encode_meta_fixture(2))
    assert (m3["title"], m3["producer"]) == (None, None)


def test_string_escapes_and_hex_strings():
    m = pdf_meta_walk(pdf_encode_meta_fixture(1, "paren (x) \\ done", "a"))
    assert m["title"] == "paren (x) \\ done"
    # hand-patch a hex-string title into the Info dict
    b = pdf_encode_meta_fixture(1, "XXXX", "a")
    assert b.count(b"(XXXX)") == 1
    b = b.replace(b"(XXXX)", b"<4142>")  # same byte length -> offsets hold
    assert pdf_meta_walk(b)["title"] == "AB"


def test_deadletter_classes():
    b = pdf_encode_meta_fixture(3, "t", "a")
    with pytest.raises(ValueError, match="bad header"):
        pdf_meta_walk(b"%PDX" + b[4:])
    with pytest.raises(ValueError, match="startxref"):
        pdf_meta_walk(b[:-12])
    # /Encrypt -> honest NotImplementedError (trailer grows AFTER the
    # xref table, so object offsets and startxref stay valid)
    enc = b.replace(b"trailer\n<< /Size",
                    b"trailer\n<< /Encrypt 9 0 R /Size")
    with pytest.raises(NotImplementedError, match="encrypted"):
        pdf_meta_walk(enc)
    # xref-stream pointer (startxref at an object) -> honest class
    rng = random.Random(16)
    for _ in range(1500):
        bb = bytearray(b)
        for _f in range(rng.randint(1, 3)):
            bb[rng.randrange(len(bb))] = rng.randrange(256)
        try:
            pdf_meta_walk(bytes(bb))
        except (ValueError, NotImplementedError):
            pass
    for cut in range(1, len(b), 7):
        try:
            pdf_meta_walk(b[:cut])
        except (ValueError, NotImplementedError):
            pass


def test_xref_stream_and_object_stream():
    """r16: the modern (1.5+) wire — /Type /XRef FlateDecode xref
    streams with W-tuple entries and type-2 pointers into a
    /Type /ObjStm object stream, with and without the PNG Up
    predictor."""
    import random

    from postgres_debezium_clickhouse_spark.operators.pdfmeta import (
        pdf_encode_xrefstream_fixture,
    )

    for pred in (False, True):
        b = pdf_encode_xrefstream_fixture(6, "t (x)", "a", predictor=pred)
        m = pdf_meta_walk(b)
        assert m["version"] == "1.5" and m["page_count"] == 6
        assert m["title"] == "t (x)" and m["author"] == "a"
        assert m["n_objects"] == 6 + 3 + 3
    # fuzz: the flate/predictor/objstm paths stay in the two classes
    b = pdf_encode_xrefstream_fixture(3, "t", "a", predictor=True)
    rng = random.Random(16)
    for _ in range(1500):
        bb = bytearray(b)
        for _f in range(rng.randint(1, 3)):
            bb[rng.randrange(len(bb))] = rng.randrange(256)
        try:
            pdf_meta_walk(bytes(bb))
        except (ValueError, NotImplementedError):
            pass
    for cut in range(1, len(b), 7):
        try:
            pdf_meta_walk(b[:cut])
        except (ValueError, NotImplementedError):
            pass


def test_freed_entry_shadows_older_section():
    """r16 review: an incremental update that FREES an object must not
    let the /Prev chain resurrect the older in-use entry (newest-wins
    includes 'f' entries)."""
    b = pdf_encode_meta_fixture(2, "t", "a")
    # append an update freeing the /Info object (num = 2 pages + 3)
    info_num = 2 + 3
    import re as _re

    first_xref = int(_re.search(rb"startxref\n(\d+)", b).group(1))
    upd = bytearray(b)
    x2 = len(upd)
    upd.extend(f"xref\n{info_num} 1\n".encode())
    upd.extend(b"0000000000 65535 f \n")
    upd.extend(
        f"trailer\n<< /Size {info_num + 1} /Root 1 0 R "
        f"/Info {info_num} 0 R /Prev {first_xref} >>\n"
        f"startxref\n{x2}\n%%EOF\n".encode()
    )
    m = pdf_meta_walk(bytes(upd))
    assert m["title"] is None and m["author"] is None  # not resurrected
    assert m["page_count"] == 2


def test_hybrid_reference_xrefstm_precedence():
    # r16 ADVICE: hybrid-reference PDFs (classic table + /XRefStm in
    # the trailer, ISO 32000-1 §7.5.8.4) must read the xref STREAM
    # before the classic section at the same update level — otherwise
    # the classic table's free tombstones shadow every compressed
    # object and page_count/title silently resolve to NULL.
    from postgres_debezium_clickhouse_spark.operators.pdfmeta import (
        pdf_encode_xrefstream_fixture,
        pdf_meta_walk,
    )

    b = pdf_encode_xrefstream_fixture(5, "hyb", "auth", hybrid=True)
    assert b"/XRefStm" in b and b"\nxref\n" in b
    m = pdf_meta_walk(b)
    assert m["page_count"] == 5
    assert m["title"] == "hyb" and m["author"] == "auth"
    # non-hybrid result identical (same logical document)
    ref = pdf_meta_walk(pdf_encode_xrefstream_fixture(5, "hyb", "auth"))
    assert m["page_count"] == ref["page_count"] and m["title"] == ref["title"]
    # fuzz the hybrid wire form: only dead-letter, never wrong answers
    import random as _random
    rng = _random.Random(18)
    for _ in range(1500):
        bb = bytearray(b)
        for _f in range(rng.randint(1, 3)):
            bb[rng.randrange(len(bb))] = rng.randrange(256)
        try:
            pdf_meta_walk(bytes(bb))
        except (ValueError, NotImplementedError):
            pass


def test_pdf_text_extraction():
    # r17: content-stream text extraction — Tj/Td lexing, FlateDecode,
    # two-stream /Contents arrays, escapes, Type0 dead-letter, and the
    # metadata walk still green over content-bearing files.
    import random as _random

    from postgres_debezium_clickhouse_spark.operators.pdfmeta import (
        pdf_encode_meta_fixture,
        pdf_text_walk,
    )

    texts = ["hello world\nsecond line", "page two text"]
    for kw in ({}, {"compress_text": True}, {"contents_array": True},
               {"compress_text": True, "contents_array": True}):
        b = pdf_encode_meta_fixture(2, "t", "a", page_texts=texts, **kw)
        assert pdf_meta_walk(b)["page_count"] == 2
        assert pdf_text_walk(b)["texts"] == texts, kw
    with pytest.raises(NotImplementedError, match="Type0"):
        pdf_text_walk(pdf_encode_meta_fixture(
            1, page_texts=["x"], type0_font=True))
    b = pdf_encode_meta_fixture(1, page_texts=["par(en) and \\ back"])
    assert pdf_text_walk(b)["texts"][0] == "par(en) and \\ back"
    # pages without contents extract as empty, not as errors
    assert pdf_text_walk(pdf_encode_meta_fixture(3, "t", "a"))["texts"] \
        == ["", "", ""]
    # fuzz: wrong answers never escape, only dead-letter
    rng = _random.Random(23)
    base = pdf_encode_meta_fixture(2, "t", "a", page_texts=texts,
                                   compress_text=True)
    for _ in range(2000):
        bb = bytearray(base)
        for _f in range(rng.randint(1, 3)):
            bb[rng.randrange(len(bb))] = rng.randrange(256)
        try:
            pdf_text_walk(bytes(bb))
        except (ValueError, NotImplementedError):
            pass


def test_content_stream_escape_audit_r18():
    # r18 (verdict item 7 + ADVICE low): octal escapes, unknown escapes
    # (spec Table 3: keep the char), \8 \9 are NOT octal, line
    # continuations (\LF, \CRLF), %-comments inside content streams,
    # hex-string shows, and the gnarly fixture wire form — all decode
    # to the same text
    from postgres_debezium_clickhouse_spark.operators.pdfmeta import (
        _content_text,
        pdf_encode_meta_fixture,
        pdf_text_walk,
    )

    assert _content_text(
        rb"BT (doc\040A\145\d) Tj ET") == "doc Aed"
    assert _content_text(rb"BT (a\8b\9c) Tj ET") == "a8b9c"
    assert _content_text(b"BT (he\\\nllo) Tj ET") == "hello"
    assert _content_text(b"BT (he\\\r\nllo) Tj ET") == "hello"
    assert _content_text(
        b"BT % a comment\n(x) Tj % tail comment\nET") == "x"
    assert _content_text(b"BT <68656c6c6f> Tj ET") == "hello"
    assert _content_text(rb"BT (\245\377) Tj ET") == "\xa5\xff"
    # balanced unescaped parens nest
    assert _content_text(b"BT (a (nested (deep)) b) Tj ET") \
        == "a (nested (deep)) b"
    # the gnarly fixture form round-trips to the SAME text in every
    # structural combination
    texts = ["doc 6 page 0 line 0\ndoc 6 page 0 line 1", "page two here"]
    for kw in ({}, {"compress_text": True}, {"contents_array": True}):
        b = pdf_encode_meta_fixture(2, page_texts=texts,
                                    gnarly_text=True, **kw)
        assert pdf_text_walk(b)["texts"] == texts, kw
