"""SRT/WebVTT parsing (r18): timing grammar in both formats, VTT
markup stripping + NOTE/identifier/settings handling, corruption
classes, fuzz, and the closed-form Spark fixture."""

from __future__ import annotations

import random

import pytest

from postgres_debezium_clickhouse_spark.operators.subtitles import (
    srt_parse,
    subtitle_walk,
    vtt_parse,
)

SRT = """1
00:00:01,000 --> 00:00:02,500
hello there

2
00:00:03,000 --> 00:00:04,000
second cue
continued line
"""

VTT = """WEBVTT - header text

NOTE
a comment block

intro-cue
00:01.000 --> 00:02.500 position:10%
<b>hello</b> <c.yellow>there</c>

00:00:03.000 --> 00:00:04.000
plain <v Speaker>voice</v> text <00:00:03.500>karaoke
"""


def test_srt_basic():
    cues = srt_parse(SRT)
    assert [c["index"] for c in cues] == [1, 2]
    assert cues[0]["start_ms"] == 1000 and cues[0]["end_ms"] == 2500
    assert cues[1]["text"] == "second cue\ncontinued line"


def test_vtt_markup_and_short_timestamps():
    cues = vtt_parse(VTT)
    assert len(cues) == 2
    assert cues[0]["start_ms"] == 1000 and cues[0]["end_ms"] == 2500
    assert cues[0]["text"] == "hello there"
    assert cues[1]["text"] == "plain voice text karaoke"


def test_walk_stats():
    m = subtitle_walk(SRT)
    assert m["format"] == "srt"
    assert m["n_cues"] == 2
    assert m["first_start_ms"] == 1000
    assert m["last_end_ms"] == 4000
    assert m["speech_ms"] == 1500 + 1000
    assert m["text"] == "hello there second cue continued line"
    assert m["n_chars"] == len(m["text"])
    assert subtitle_walk(VTT)["format"] == "vtt"


def test_corruption_classes():
    with pytest.raises(ValueError, match="numeric index"):
        srt_parse("x\n00:00:01,000 --> 00:00:02,000\nhi")
    with pytest.raises(ValueError, match="bad SRT timing"):
        srt_parse("1\n00:00:01.000 --> 00:00:02.000\nhi")  # dot = VTT
    with pytest.raises(ValueError, match="end <= start"):
        srt_parse("1\n00:00:02,000 --> 00:00:02,000\nhi")
    with pytest.raises(ValueError, match="regress"):
        srt_parse("1\n00:00:05,000 --> 00:00:06,000\na\n\n"
                  "2\n00:00:01,000 --> 00:00:02,000\nb")
    with pytest.raises(ValueError, match="out of range"):
        srt_parse("1\n00:00:61,000 --> 00:01:02,000\nhi")
    with pytest.raises(ValueError, match="WEBVTT signature"):
        vtt_parse("00:00:01.000 --> 00:00:02.000\nhi")
    with pytest.raises(ValueError, match="no cues"):
        vtt_parse("WEBVTT\n\nNOTE\nonly a note")


def test_fuzz_never_wrong_only_deadletter():
    rng = random.Random(418)
    for base in (SRT, VTT):
        want = subtitle_walk(base)
        for _ in range(800):
            chars = list(base)
            for _f in range(rng.randint(1, 3)):
                chars[rng.randrange(len(chars))] = chr(rng.randrange(32, 127))
            try:
                subtitle_walk("".join(chars))
            except ValueError:
                pass
        assert subtitle_walk(base) == want


def test_spark_plumbing_and_closed_form(spark):
    from postgres_debezium_clickhouse_spark.operators.subtitles import (
        subtitle_stats, synth_subtitle_docs)

    ids = spark.range(0, 60, 1, 4).withColumnRenamed("id", "doc_id")
    out = subtitle_stats(synth_subtitle_docs(ids)).collect()
    assert len(out) == 60
    for r in out:
        d = r["doc_id"]
        n = 2 + d % 5
        assert r["format"] == ("srt" if d % 2 == 0 else "vtt")
        assert r["n_cues"] == n
        assert r["first_start_ms"] == 100 * (d % 7)
        assert r["last_end_ms"] == (2000 * (n - 1) + 100 * (d % 7)
                                    + 900 + 100 * ((n - 1) % 3))
        assert r["speech_ms"] == sum(900 + 100 * (c % 3)
                                     for c in range(n))
        assert r["text"] == " ".join(f"doc {d} cue {c}"
                                     for c in range(n))


def test_vtt_edge_blocks_r18_review():
    # no blank line after the signature: the first cue must not drop
    cues = vtt_parse("WEBVTT\n00:01.000 --> 00:02.000\nhello\n\n"
                     "00:03.000 --> 00:04.000\nworld\n")
    assert len(cues) == 2 and cues[0]["text"] == "hello"
    # header TEXT lines (no -->) stay header, not cues
    cues = vtt_parse("WEBVTT - x\nKind: captions\n\n"
                     "00:01.000 --> 00:02.000\nhi\n")
    assert len(cues) == 1
    # an identifier that merely STARTS with NOTE is a cue
    cues = vtt_parse("WEBVTT\n\nNOTES-1\n00:01.000 --> 00:02.000\nkept\n")
    assert len(cues) == 1 and cues[0]["text"] == "kept"
    # whole-keyword NOTE with trailing text on the same line is skipped
    cues = vtt_parse("WEBVTT\n\nNOTE a comment\n\n"
                     "00:01.000 --> 00:02.000\nok\n")
    assert len(cues) == 1 and cues[0]["text"] == "ok"
