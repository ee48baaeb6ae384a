"""Salted-aggregation tests: exactness + the salt actually spreads rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_debezium_clickhouse_spark.operators.skew import salted_agg


def test_salted_agg_equals_plain(spark):
    # one pathologically hot key (80% of rows) + a long tail
    rows = [(1, float(i % 7)) for i in range(800)] + [(k, float(k)) for k in range(2, 102) for _ in range(2)]
    df = spark.createDataFrame(rows, "k INT, v DOUBLE")
    salted = salted_agg(df, ["k"], {"s": F.col("v")}, n_salts=8, count_alias="n")
    plain = df.groupBy("k").agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
    assert {tuple(r) for r in salted.collect()} == {tuple(r) for r in plain.collect()}


def test_salt_spreads_hot_key(spark):
    df = spark.createDataFrame([(1, 1.0)] * 1000, "k INT, v DOUBLE").repartition(8)
    salted = df.withColumn("__salt", F.pmod(F.monotonically_increasing_id(), F.lit(8)))
    n_partials = salted.groupBy("k", "__salt").count().count()
    assert n_partials > 1  # the hot key's phase-1 work is split across salts
