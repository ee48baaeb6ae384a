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


def test_hotkey_dedup_partial_agg_neutralizes_skew(spark, sf_dir):
    """VERDICT r6 #6 — the latest-wins dedup under a 50%-one-key event
    distribution: (a) the plan must place a PARTIAL aggregate before the
    single key exchange (each map partition collapses the hot key to one
    candidate row, so the hot reduce task receives at most
    n_map_partitions rows — skew neutralized without AQE/salting), and
    (b) the hot key's winner must be the max-version update."""
    from postgres_debezium_clickhouse_spark.plans.cdc_queries import cdc_hotkey_state

    df = cdc_hotkey_state(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_max" in plan  # map-side combine BEFORE the exchange
    # the partial agg must sit below the exchange in the tree (appears
    # after it in top-down toString output)
    assert plan.index("partial_max") > plan.index("Exchange hashpartitioning")

    import pyspark.sql.functions as F

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    max_key = orders.agg(F.max("o_orderkey")).collect()[0][0]
    hot = df.filter(F.col("key") == -1).collect()
    assert len(hot) == 1
    assert hot[0].status == f"H{max_key % 10}"
    assert hot[0].ts_ms == 5_000_000 + max_key
    # the hot key accounted for half of all input events, yet every other
    # key's snapshot image is intact
    assert df.count() == orders.count() + 1


def test_aqe_skew_join_engages_and_initial_partitions_interaction(spark):
    """AQE skew-join evidence (the JOIN-side backstop; the agg paths are
    partial-agg/salting): with a 50%-one-key fact side, lowered skew
    thresholds, and an initialPartitionNum comparable to key cardinality,
    the final adaptive plan must read `SortMergeJoin(skew=true)` over
    `AQEShuffleRead skewed`.

    Measured interaction worth pinning: with the session's scale-oriented
    initialPartitionNum (2048) the splitter does NOT engage at this data
    size (the hot key sits alone in a near-empty partition map and the
    split never fires) — so at 100 TB the engine's first-line skew answers
    remain the map-side partial aggregate and salted_agg, with AQE
    skew-join as a backstop whose thresholds/partitioning must be sized
    together.  Documented in docs/SCALE.md."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum": "16",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1b",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        fact = spark.range(200_000).select(
            F.when(F.col("id") % 2 == 0, 0).otherwise(F.col("id") % 1000).alias("k"),
            F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("pad"),
        )
        dim = spark.range(1000).select(
            F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("dv")
        )
        j = fact.join(dim, "k")
        assert len(j.collect()) == 200_000  # every fact row matched
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:800]
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
