"""Bucketed-table layout tests: the shuffle-free join contract (O1/X1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_debezium_clickhouse_spark.operators.upsert import write_bucketed


def test_bucketed_join_has_no_exchange(spark):
    a = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
    write_bucketed(a, "bkt_a", ["k"], n_buckets=8)
    write_bucketed(b, "bkt_b", ["k"], n_buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force SMJ: tiny test tables would otherwise broadcast (which also
        # bypasses bucketed reads); at real scale SMJ is the natural pick
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ta = spark.table("bkt_a")
        tb = spark.table("bkt_b")
        joined = ta.join(tb, "k")
        assert joined.count() == 1000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # identical bucketing on the join key ⇒ no shuffle on either side
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_bucketed_overwrite_idempotent(spark):
    df = spark.range(10).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    write_bucketed(df, "bkt_c", ["k"], n_buckets=4)
    write_bucketed(df, "bkt_c", ["k"], n_buckets=4)  # overwrite mode: no error
    try:
        assert spark.table("bkt_c").count() == 10
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_c")


def test_zorder_key_interleaves_bits(spark):
    from postgres_debezium_clickhouse_spark.operators.upsert import zorder_key

    df = spark.createDataFrame([(3, 1), (0, 3)], ["x", "y"])
    out = [r.z for r in df.select(zorder_key(["x", "y"], bits_per_col=2).alias("z")).collect()]
    # (x=0b11, y=0b01) -> bits: x0@0, y0@1, x1@2, y1@3 = 1+2+4 = 7
    # (x=0b00, y=0b11) -> y0@1 + y1@3 = 2+8 = 10
    assert out == [7, 10]


def test_cluster_by_zorder_sorts_by_morton_key(spark):
    from postgres_debezium_clickhouse_spark.operators.upsert import (
        cluster_by_zorder,
        zorder_key,
    )

    df = spark.createDataFrame([(x, y) for x in range(8) for y in range(8)], ["x", "y"])
    clustered = cluster_by_zorder(df, ["x", "y"], num_partitions=2)
    # within each partition, rows must be in morton order; z column dropped
    assert clustered.columns == ["x", "y"]
    import itertools

    def morton(x, y):
        return sum((((x >> b) & 1) << (2 * b)) + (((y >> b) & 1) << (2 * b + 1)) for b in range(8))

    parts = clustered.rdd.glom().collect()
    for part in parts:
        zs = [morton(r.x, r.y) for r in part]
        assert zs == sorted(zs)
