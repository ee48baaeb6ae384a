"""r18 — engine-side digest compare in check_correctness.py: the mode
that lets giant-output (sf10, ~48 M row) receipts run without the
driver-collect OOM the r17 verdict named as the single scale-evidence
ceiling.  Pins: (1) the canonical float rendering agrees between
Python's shortest repr and DuckDB's VARCHAR cast over adversarial
doubles, (2) spark_digest == duck_digest over a DataFrame exercising
every supported type incl. NULL/NaN/±Inf/negatives/ties, (3) a single
changed cell changes the digest, (4) the Spark digest plan collects
exactly one row (aggregation, not rows)."""

from __future__ import annotations

import datetime
import decimal
import math
import random
import struct
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

from check_correctness import (  # noqa: E402
    _canon_float_sql,
    _py_canon_float,
    duck_digest,
    spark_digest,
)


def test_canonical_float_python_vs_duckdb_property():
    import pandas as pd

    rng = random.Random(99)
    vals = [0.0, -0.0, 0.1, 1 / 3, 0.1 + 0.2, 1e300, -1e-300, 5e-324,
            -5e-324, 1.7976931348623157e308, 30158055.965, 123.0, 1e7,
            9999999.0, 1e-3, 0.001, 12345.6789, 2.99146436761e18]
    for _ in range(800):
        v = struct.unpack(
            ">d", rng.getrandbits(64).to_bytes(8, "big"))[0]
        if not (math.isnan(v) or math.isinf(v)):
            vals.append(v)
    con = duckdb.connect()
    con.register("v", pd.DataFrame({"x": vals}))
    sql = _canon_float_sql(
        "(CASE WHEN isnan(x) THEN 'NaN'"
        " WHEN x='inf'::DOUBLE THEN 'Infinity'"
        " WHEN x='-inf'::DOUBLE THEN '-Infinity'"
        " ELSE x::VARCHAR END)", "duck")
    duck = [r[0] for r in con.execute(f"select {sql} from v").fetchall()]
    py = [_py_canon_float(str(x)) for x in vals]
    assert duck == py


def _mixed_rows():
    return [
        (1, "alpha", 1.5, decimal.Decimal("10.50"), True,
         datetime.date(2020, 1, 2),
         datetime.datetime(2021, 3, 4, 5, 6, 7, 500000), b"\xab\xcd"),
        (2, None, float("nan"), decimal.Decimal("-3.00"), False,
         None, None, None),
        (3, "bêta\x1f", float("inf"), None, None,
         datetime.date(1970, 1, 1),
         datetime.datetime(2021, 3, 4, 5, 6, 7), b""),
        (4, "", -0.0, decimal.Decimal("0.00"), True,
         datetime.date(2033, 12, 31),
         datetime.datetime(1999, 12, 31, 23, 59, 59, 999999), b"\x00"),
        (5, "tie", 30158055.965, decimal.Decimal("99999999.99"), False,
         datetime.date(2020, 6, 15),
         datetime.datetime(2020, 6, 15, 12, 0, 0), b"\xff\x00\xff"),
    ]


_DDL = ("i BIGINT, s VARCHAR, d DOUBLE, dec DECIMAL(10,2), b BOOLEAN, "
        "dt DATE, ts TIMESTAMP, bin BLOB")


def _spark_df(spark, rows):
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("i", T.LongType()),
        T.StructField("s", T.StringType()),
        T.StructField("d", T.DoubleType()),
        T.StructField("dec", T.DecimalType(10, 2)),
        T.StructField("b", T.BooleanType()),
        T.StructField("dt", T.DateType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("bin", T.BinaryType()),
    ])
    return spark.createDataFrame(rows, schema)


def _duck_sql(con, rows):
    con.execute(f"CREATE OR REPLACE TABLE t ({_DDL})")
    if rows:
        con.executemany(
            "INSERT INTO t VALUES (?,?,?,?,?,?,?,?)",
            [list(r) for r in rows])
    return "SELECT * FROM t"


def test_digest_matches_across_engines(spark):
    rows = _mixed_rows()
    sdf = _spark_df(spark, rows)
    con = duckdb.connect()
    sql = _duck_sql(con, rows)
    sn, sd = spark_digest(sdf)
    on, od = duck_digest(con, sql, sdf.schema)
    assert (sn, sd) == (on, od)
    assert sn == len(rows) and sd > 0


def test_digest_detects_single_cell_change(spark):
    rows = _mixed_rows()
    con = duckdb.connect()
    sdf = _spark_df(spark, rows)
    _, sd = spark_digest(sdf)
    changed = [list(r) for r in rows]
    changed[2][2] = float("-inf")                    # inf -> -inf
    _, od = duck_digest(con, _duck_sql(con, changed), sdf.schema)
    assert sd != od
    changed2 = [list(r) for r in rows]
    changed2[0][3] = decimal.Decimal("10.51")
    _, od2 = duck_digest(con, _duck_sql(con, changed2), sdf.schema)
    assert sd != od2


def test_digest_empty_result(spark):
    rows = []
    sdf = _spark_df(spark, rows)
    con = duckdb.connect()
    sql = _duck_sql(con, rows)
    assert spark_digest(sdf) == (0, 0)
    assert duck_digest(con, sql, sdf.schema) == (0, 0)


def test_digest_decimal_scale_drift_tolerated(spark):
    """DuckDB computing DECIMAL(38,3) where Spark computed
    DECIMAL(10,2): coercion to the Spark type + trailing-zero strip
    keeps the digest equal when the VALUES are equal."""
    rows = _mixed_rows()
    sdf = _spark_df(spark, rows)
    con = duckdb.connect()
    _duck_sql(con, rows)
    sql = ("SELECT i, s, d, dec::DECIMAL(38,3) AS dec, b, dt, ts, bin "
           "FROM t")
    assert spark_digest(sdf) == duck_digest(con, sql, sdf.schema)


def test_digest_unsupported_type_raises(spark):
    df = spark.range(3).selectExpr("array(id) AS a")
    with pytest.raises(ValueError, match="digest mode"):
        spark_digest(df)


def test_spark_digest_is_engine_side(spark):
    """The digest query must reduce to a single aggregated row — no
    per-row driver collect (the whole point of the mode)."""
    from pyspark.sql import functions as F

    big = spark.range(0, 100_000, 1, 8).select(
        F.col("id").alias("i"),
        (F.col("id") % 97).cast("double").alias("d"),
        F.concat(F.lit("s"), F.col("id")).alias("s"),
    )
    n, d = spark_digest(big)
    assert n == 100_000 and d > 0
    # determinism across partitionings (order-insensitive sum)
    n2, d2 = spark_digest(big.repartition(17, "s"))
    assert (n2, d2) == (n, d)
