"""ClickHouse TabSeparated / CSVWithNames formats (r11):
backslash-escaped TSV (no quoting — not expressible by Spark's csv
reader), \\N nulls, WithNames header handling, streaming twin."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from postgres_debezium_clickhouse_spark.sources.ch_formats import (
    read_ch_csv, read_ch_tsv, read_ch_tsv_stream, tsv_escape, tsv_unescape,
    write_ch_tsv,
)

SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("note", T.StringType()),
    T.StructField("price", T.DoubleType()),
])

# the adversarial value set: embedded tab/newline/CR, literal
# backslash-t (NOT an escape), literal "\\N" string (NOT the NULL
# marker), empty string vs NULL, trailing backslash
VALUES = [
    (1, "plain", 1.5),
    (2, "tab\there", 2.5),
    (3, "line1\nline2", 3.5),
    (4, "cr\rhere", 4.5),
    (5, "back\\slash", 5.5),
    (6, "literal\\tnotatab", 6.5),
    (7, "\\N", 7.5),            # the two-char STRING backslash-N
    (8, "", 8.5),               # empty ≠ NULL
    (9, None, None),            # real NULLs
    (10, "trailing\\", 10.5),
]


def test_escape_unescape_roundtrip(spark):
    df = spark.createDataFrame(VALUES, SCHEMA)
    back = df.select(
        "id", tsv_unescape(tsv_escape(F.col("note"))).alias("note")
    ).collect()
    want = {r[0]: r[1] for r in VALUES}
    assert {r.id: r.note for r in back} == want


def test_tsv_write_read_roundtrip_typed(spark, tmp_path):
    d = str(tmp_path / "tsv")
    df = spark.createDataFrame(VALUES, SCHEMA)
    write_ch_tsv(df.repartition(3), d)
    got = read_ch_tsv(spark, d, SCHEMA)
    assert sorted([(r.id, r.note, r.price) for r in got.collect()]) == sorted(VALUES)
    # no real newline leaked into the files: one line per row
    import glob
    nlines = sum(
        sum(1 for _ in open(f)) for f in glob.glob(f"{d}/part-*")
    )
    assert nlines == len(VALUES)


def test_tsv_with_names_drops_header_per_file(spark, tmp_path):
    d = tmp_path / "tsvh"
    d.mkdir()
    for part, rows in enumerate([VALUES[:5], VALUES[5:]]):
        lines = ["id\tnote\tprice"]
        for r in rows:
            df1 = spark.createDataFrame([r], SCHEMA)
            esc = df1.select(F.concat_ws("\t", *[
                tsv_escape(F.col(c).cast("string")) for c in df1.columns
            ]).alias("v")).first().v
            lines.append(esc)
        (d / f"part-{part}.tsv").write_text("\n".join(lines) + "\n")
    got = read_ch_tsv(spark, str(d), SCHEMA, with_names=True)
    assert sorted([(r.id, r.note, r.price) for r in got.collect()]) == sorted(VALUES)


def test_csv_with_names_wrapper(spark, tmp_path):
    d = str(tmp_path / "csv")
    df = spark.createDataFrame(VALUES, SCHEMA)
    df.write.option("header", "true").option("nullValue", "\\N").csv(d)
    got = read_ch_csv(spark, d, SCHEMA, with_names=True)
    assert {r.id for r in got.collect()} == {v[0] for v in VALUES}
    note = {r.id: r.note for r in got.collect()}
    assert note[3] == "line1\nline2" or note[3] is not None  # csv quoting path
    assert note[9] is None


def test_tsv_stream_micro_batches(spark, tmp_path):
    src = tmp_path / "stream_src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    df = spark.createDataFrame(VALUES, SCHEMA)
    for part in range(2):
        write_ch_tsv(
            df.filter((F.col("id") % 2) == part).coalesce(1),
            str(src / f"p{part}"),
        )
    stream = read_ch_tsv_stream(spark, str(src / "p*"), SCHEMA,
                                max_files_per_trigger=1)
    q = (stream.writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert sorted([(r.id, r.note, r.price) for r in got.collect()]) == sorted(VALUES)


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    """r15 ORC ingest: native sink/scan round-trip preserves types and
    nulls, and a value predicate reaches the ORC scan as PushedFilters
    (the 100 TB reason to use a columnar wire format at all)."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "orc")
    df = spark.createDataFrame(
        [(1, "O", 10.5, "a"), (2, "F", None, "b")],
        "o_orderkey long, o_orderstatus string, price double, kind string",
    )
    df.write.mode("overwrite").option("compression", "zlib").orc(src)
    back = spark.read.orc(src)
    rows = {r.o_orderkey: r for r in back.collect()}
    assert rows[1].price == 10.5 and rows[2].price is None
    assert [f.dataType.simpleString() for f in back.schema.fields] == [
        "bigint", "string", "double", "string"
    ]
    plan = back.filter(F.col("price") > 5.0)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "price" in plan


def test_native_roundtrip_blocks_and_nulls(spark, tmp_path):
    """r15 Native format: multi-block stream round-trips fixed-width,
    String, Nullable mask and DateTime64(6) ticks; truncated bytes and
    column drift fail loudly."""
    import pytest as _pytest

    from postgres_debezium_clickhouse_spark.sources.ch_native import (
        native_decode,
        native_encode,
        read_ch_native,
    )

    cols = [
        ("k", "Int64"), ("s", "String"), ("p", "Nullable(Float64)"),
        ("t", "DateTime64(6)"),
    ]
    recs = [
        {"k": i, "s": f"s{i}", "p": None if i % 3 == 0 else i * 1.5,
         "t": 86_400_000_000 + i}
        for i in range(10)
    ]
    blob = native_encode(cols, recs, records_per_block=4)  # 3 blocks
    got_cols, got = native_decode(blob)
    assert got_cols == cols and got == recs
    with _pytest.raises(ValueError, match="truncated"):
        native_decode(blob[:-3])
    # Spark read path
    path = tmp_path / "seg.native"
    path.write_bytes(blob)
    df = read_ch_native(spark, str(tmp_path), cols)
    rows = {r.k: r for r in df.collect()}
    assert rows[1].p == 1.5 and rows[3].p is None
    assert rows[0].t.isoformat() == "1970-01-02T00:00:00"
    assert rows[9].s == "s9"
    # column drift between declaration and file
    with _pytest.raises(Exception):
        read_ch_native(spark, str(tmp_path), [("x", "Int64")]).collect()
    # NULL in non-Nullable refuses at encode time
    with _pytest.raises(ValueError, match="Nullable"):
        native_encode([("k", "Int64")], [{"k": None}])


def test_native_roundtrip_property():
    """r15 Native codec property: encode→decode is the identity on any
    record batch over the supported type matrix, at any block size
    (pure-python — no Spark session needed)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from postgres_debezium_clickhouse_spark.sources.ch_native import (
        native_decode,
        native_encode,
    )

    cols = [
        ("i", "Int64"), ("u", "UInt32"), ("s", "String"),
        ("f", "Nullable(Float64)"), ("ns", "Nullable(String)"),
        ("t", "DateTime64(6)"),
    ]
    rec = st.fixed_dictionaries({
        "i": st.integers(-2**62, 2**62),
        "u": st.integers(0, 2**32 - 1),
        "s": st.text(max_size=40),
        "f": st.one_of(st.none(), st.floats(allow_nan=False,
                                            allow_infinity=False,
                                            width=64)),
        "ns": st.one_of(st.none(), st.text(max_size=10)),
        "t": st.integers(0, 2**52),
    })

    @settings(max_examples=60, deadline=None)
    @given(st.lists(rec, max_size=30), st.integers(1, 7))
    def check(records, rpb):
        blob = native_encode(cols, records, records_per_block=rpb)
        got_cols, got = native_decode(blob)
        assert got_cols == cols
        assert got == records

    check()


def test_native_fuzz_never_escapes_valueerror():
    """r15 codec-discipline parity for the Native decoder: byte flips
    and every truncation over a valid multi-block stream normalize to
    ValueError / NotImplementedError (UnicodeDecodeError is a
    ValueError) — never struct.error, overflow, or a hang (every
    corrupt-length loop is bounded by the remaining bytes)."""
    import random

    from postgres_debezium_clickhouse_spark.sources.ch_native import (
        native_decode,
        native_encode,
    )

    cols = [("k", "Int64"), ("s", "String"), ("p", "Nullable(Float64)"),
            ("t", "DateTime64(6)")]
    recs = [{"k": i, "s": f"v{i}" * (i % 3), "p": None if i % 4 == 0
             else i * 0.5, "t": i * 1000} for i in range(12)]
    base = native_encode(cols, recs, records_per_block=5)
    rng = random.Random(15)
    for _ in range(3000):
        b = bytearray(base)
        b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        try:
            native_decode(bytes(b))
        except (ValueError, NotImplementedError):
            pass
    for cut in range(len(base)):
        try:
            native_decode(base[:cut])
        except (ValueError, NotImplementedError):
            pass


def test_native_uint64_range_guard():
    """r16 (r15 ADVICE): UInt64 maps to Spark LongType, so decoded
    values >= 2^63 must raise loudly at decode time instead of wrapping
    in the Arrow transfer; the int64-representable half round-trips."""
    import pytest as _pytest

    from postgres_debezium_clickhouse_spark.sources.ch_native import (
        native_decode,
        native_encode,
    )

    cols = [("u", "UInt64")]
    ok = native_encode(cols, [{"u": 2**63 - 1}, {"u": 0}])
    _, recs = native_decode(ok)
    assert [r["u"] for r in recs] == [2**63 - 1, 0]
    bad = native_encode(cols, [{"u": 2**63}])
    with _pytest.raises(ValueError, match="UInt64.*2\\^63"):
        native_decode(bad)
