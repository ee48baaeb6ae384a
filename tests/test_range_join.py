"""Interval-join operator tests (bucketed range join)."""

from __future__ import annotations

import datetime

import pytest

from postgres_debezium_clickhouse_spark.operators.range_join import interval_join


def _ts(s: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, 0, 0, 0) + datetime.timedelta(seconds=s)


def test_interval_join_bounds_inclusive(spark):
    left = spark.createDataFrame([(1, _ts(100), "L")], "k INT, lts TIMESTAMP, tag STRING")
    right = spark.createDataFrame(
        [(1, _ts(99), "before"), (1, _ts(100), "at0"), (1, _ts(110), "mid"),
         (1, _ts(160), "at-upper"), (1, _ts(161), "after"), (2, _ts(110), "other-key")],
        "k INT, rts TIMESTAMP, rtag STRING",
    )
    out = interval_join(left, right, on=["k"], left_ts="lts", right_ts="rts", lower_s=0, upper_s=60)
    assert {r.rtag for r in out.collect()} == {"at0", "mid", "at-upper"}


def test_interval_join_negative_lower(spark):
    """Window reaching backwards: [-30, +30] around each left row."""
    left = spark.createDataFrame([(1, _ts(100))], "k INT, lts TIMESTAMP")
    right = spark.createDataFrame(
        [(1, _ts(75), "in-back"), (1, _ts(65), "too-early"), (1, _ts(125), "in-fwd")],
        "k INT, rts TIMESTAMP, rtag STRING",
    )
    out = interval_join(left, right, on=["k"], left_ts="lts", right_ts="rts", lower_s=-30, upper_s=30)
    assert {r.rtag for r in out.collect()} == {"in-back", "in-fwd"}


def test_interval_join_rejects_inverted_bounds(spark):
    df = spark.createDataFrame([(1, _ts(0))], "k INT, ts TIMESTAMP")
    with pytest.raises(ValueError):
        interval_join(df, df, on=["k"], left_ts="ts", right_ts="ts", lower_s=10, upper_s=5)


def test_interval_join_no_nested_loop(spark):
    left = spark.createDataFrame([(1, _ts(0))], "k INT, lts TIMESTAMP")
    right = spark.createDataFrame([(1, _ts(10), 5)], "k INT, rts TIMESTAMP, v INT")
    df = interval_join(left, right, on=["k"], left_ts="lts", right_ts="rts", lower_s=0, upper_s=60)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
