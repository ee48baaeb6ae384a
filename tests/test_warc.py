"""WARC source (sources/warc.py): spec-shaped encode/parse roundtrip,
CommonCrawl gzip-member layout, loud malformation failures, and the
distributed read path."""

import pytest

from postgres_debezium_clickhouse_spark.sources.warc import (
    _gunzip_members,
    warc_encode_segment,
    warc_parse,
    warc_record_encode,
)


def _rec(i, typ="response", payload=b"hello"):
    return (
        {"WARC-Type": typ, "WARC-Record-ID": f"<urn:r:{i}>",
         "WARC-Date": "2024-01-01T00:00:00Z",
         "WARC-Target-URI": f"https://x/{i}"},
        payload,
    )


def test_roundtrip_plain_and_gzip_members():
    recs = [_rec(0, "warcinfo"), _rec(1), _rec(2, payload=b"\r\n\r\nbody")]
    plain = warc_encode_segment(recs)
    parsed = warc_parse(plain)
    assert [r["warc_type"] for r in parsed] == ["warcinfo", "response",
                                                "response"]
    assert parsed[2]["payload"] == b"\r\n\r\nbody"  # CRLFs inside payload OK
    assert parsed[1]["content_length"] == 5
    gz = warc_encode_segment(recs, gzip_members=True)
    assert gz != plain and _gunzip_members(gz) == plain
    assert warc_parse(_gunzip_members(gz)) == parsed
    # offsets are real file positions: re-parse from each offset
    assert plain[parsed[1]["offset"]:].startswith(b"WARC/1.0\r\n")


def test_content_length_is_computed_not_trusted():
    with pytest.raises(ValueError, match="computed"):
        warc_record_encode({"WARC-Type": "x", "Content-Length": "3"}, b"abc")


def test_malformed_records_fail_loudly():
    good = warc_encode_segment([_rec(1)])
    with pytest.raises(ValueError, match="bad WARC version"):
        warc_parse(b"WORC/1.0\r\n" + good[10:], source="f")
    with pytest.raises(ValueError, match="truncated"):
        warc_parse(good[:-9], source="f")  # payload cut short
    with pytest.raises(ValueError, match="missing mandatory"):
        warc_parse(warc_record_encode({"WARC-Type": "response"}, b"x"))
    with pytest.raises(ValueError, match="unterminated"):
        warc_parse(b"WARC/1.0\r\nWARC-Type: x\r\n")


def test_read_warc_distributed(spark, tmp_path):
    from postgres_debezium_clickhouse_spark.sources.warc import read_warc

    (tmp_path / "a.warc").write_bytes(
        warc_encode_segment([_rec(0, "warcinfo"), _rec(1)]))
    (tmp_path / "b.warc.gz").write_bytes(
        warc_encode_segment([_rec(2), _rec(3, "request")],
                            gzip_members=True))
    df = read_warc(spark, str(tmp_path))
    rows = {r.record_id: r for r in df.collect()}
    assert len(rows) == 4
    assert rows["<urn:r:2>"].warc_type == "response"
    assert bytes(rows["<urn:r:1>"].payload) == b"hello"
    assert rows["<urn:r:3>"].target_uri == "https://x/3"
