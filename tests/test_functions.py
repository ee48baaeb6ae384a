"""Unit tests for the scalar layer (SURVEY §2.3 F1-F17)."""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from postgres_debezium_clickhouse_spark import functions as fx

SAMPLE = '{"payload": {"after": {"id": 4, "price": "19.99"}, "source": {"ts_ms": 1724118407000}}}'


def test_json_extract_string(spark):
    df = spark.createDataFrame([(SAMPLE,)], ["value"])
    row = df.select(
        fx.json_extract_string("value", "payload", "after", "price").alias("p"),
        fx.json_extract_string("value", "payload", "after", "missing").alias("m"),
    ).first()
    assert row.p == "19.99"
    assert row.m is None


def test_json_extract_long_and_has(spark):
    df = spark.createDataFrame([(SAMPLE,), ("{}",), ("not json",)], ["value"])
    out = df.select(
        fx.json_extract_long("value", "payload", "source", "ts_ms").alias("ts"),
        fx.json_has("value", "payload", "after").alias("has"),
    ).collect()
    assert out[0].ts == 1724118407000 and out[0].has is True
    assert out[1].ts is None and out[1].has is False
    assert out[2].ts is None and out[2].has is False


def test_json_extract_struct_parses_once_and_permissive(spark):
    partial = T.StructType([T.StructField("payload", T.StructType([
        T.StructField("after", T.StructType([T.StructField("id", T.LongType())])),
    ]))])
    df = spark.createDataFrame([(SAMPLE,), ("BROKEN{",)], ["value"])
    rows = df.select(fx.json_extract_struct("value", partial).alias("x")).collect()
    assert rows[0].x.payload.after.id == 4
    assert rows[1].x is None or rows[1].x.payload is None  # PERMISSIVE, T2


def test_casts_permissive(spark):
    df = spark.createDataFrame([("42", "19.99"), ("nope", "bad")], ["i", "f"])
    out = df.select(fx.to_int32("i").alias("i"), fx.to_float64("f").alias("f")).collect()
    assert (out[0].i, out[0].f) == (42, 19.99)
    assert out[1].i is None and out[1].f is None  # ANSI off: null, not error


def test_to_datetime64_trims_z(spark):
    df = spark.createDataFrame([("2024-08-20T02:26:47.326449Z",)], ["s"])
    ts = df.select(fx.to_datetime64("s").alias("ts")).first().ts
    assert ts == datetime.datetime(2024, 8, 20, 2, 26, 47, 326449)


def test_trim_right_only_trailing(spark):
    df = spark.createDataFrame([("ZabcZZ",)], ["s"])
    assert df.select(fx.trim_right("s", "Z").alias("o")).first().o == "Zabc"


def test_micro_ts_roundtrip(spark):
    us = 1724118407326449
    df = spark.createDataFrame([(us,)], ["us"])
    row = df.select(
        fx.micros_to_ts("us").alias("ts"),
        fx.ts_to_micros(fx.micros_to_ts("us")).alias("rt"),
    ).first()
    assert row.rt == us
    assert row.ts.microsecond == 326449


def test_rand_int_bounds_and_uuid(spark):
    df = spark.range(200).select(fx.rand_int(5, seed=7).alias("r"), fx.gen_uuid().alias("u"))
    rows = df.collect()
    assert all(1 <= r.r <= 5 for r in rows)
    assert len({r.u for r in rows}) == 200


def test_round2_and_enum(spark):
    df = spark.createDataFrame([(3.14159, 0), (2.5, 9)], ["x", "b"])
    out = df.select(
        fx.round2("x").alias("r"),
        fx.enum_by_bucket(F.col("b"), {0: "pending", 1: "paid"}, "completed").alias("e"),
    ).collect()
    assert out[0].r == 3.14 and out[0].e == "pending"
    assert out[1].r == 2.5 and out[1].e == "completed"


def test_ts_minus_random_days_within_bounds(spark):
    base = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame([Row(ts=base)] * 50)
    out = df.select(fx.ts_minus_random_days("ts", 730).alias("t")).collect()
    lo = base - datetime.timedelta(days=730)
    assert all(lo <= r.t <= base for r in out)
