"""SummingMergeTree-mode sink + table TTL (streaming/pipeline.py r8):
per-key running sums must equal the batch groupBy regardless of batch
boundaries; TTL expiry is a committed tombstone mutation (pre-TTL state
stays time-travelable)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

import postgres_debezium_clickhouse_spark.streaming.pipeline as pl

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("grp", T.StringType()),
        T.StructField("v", T.DoubleType()),
    ]
)


@pytest.fixture()
def dirs(tmp_path):
    return {n: str(tmp_path / n) for n in ("src", "silver", "ckpt")}


def _run_summing(spark, dirs, rows, batch_no):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").json(
        dirs["src"] + f"/b{batch_no}"
    )
    stream = spark.readStream.schema(SCHEMA).json(dirs["src"] + f"/b{batch_no}")
    q = pl.silver_summing_stream(
        stream, dirs["silver"], dirs["ckpt"] + f"/b{batch_no}",
        keys=["k", "grp"], sum_cols=["v"], available_now=True,
    )
    assert q.awaitTermination(120)


def test_summing_sums_across_batches(spark, dirs):
    _run_summing(spark, dirs, [(1, "a", 1.10), (1, "a", 2.20), (2, "b", 5.00)], 0)
    _run_summing(spark, dirs, [(1, "a", 0.70), (3, "a", 9.99)], 1)
    state = {
        (r.k, r.grp): (float(r.v), r["__n_rows"])
        for r in pl.read_silver(spark, dirs["silver"]).collect()
    }
    assert state == {
        (1, "a"): (4.0, 3),     # 1.10+2.20+0.70 exact in decimal
        (2, "b"): (5.0, 1),
        (3, "a"): (9.99, 1),
    }
    # one row per key — rows collapsed on merge, SummingMergeTree-style
    assert pl.read_silver(spark, dirs["silver"]).count() == 3


def test_summing_empty_batch_publishes_nothing(spark, dirs):
    _run_summing(spark, dirs, [(1, "a", 1.0)], 0)
    v1 = pl.silver_versions(dirs["silver"])
    _run_summing(spark, dirs, [], 1)
    assert pl.silver_versions(dirs["silver"]) == v1


def test_ttl_expires_rows_and_keeps_history(spark, dirs):
    base = spark.createDataFrame(
        [(i, f"u{i}", 1000 + i) for i in range(20)], "k long, val string, ts long"
    ).withColumn("__deleted", F.lit(False))
    manifest = {"version": 0, "n_buckets": 4, "files": []}
    pl._publish_buckets(base, dirs["silver"], ["k"], manifest, set(range(4)))
    n = pl.ttl_silver(spark, dirs["silver"], ["k"], "ts", F.lit(1010))
    assert n == 10                       # ts 1000..1009 expired
    live = {r.k for r in pl.read_silver(spark, dirs["silver"]).collect()}
    assert live == set(range(10, 20))
    # pre-TTL state reachable by time travel; expired rows are tombstones
    v0 = pl.silver_versions(dirs["silver"])[0]
    before = pl.read_silver(spark, dirs["silver"], as_of_version=v0)
    assert before.count() == 20
    tomb = pl.read_silver(spark, dirs["silver"], include_deleted=True)
    assert tomb.filter(F.col("__deleted")).count() == 10
    # idempotent: nothing left under the cutoff
    assert pl.ttl_silver(spark, dirs["silver"], ["k"], "ts", F.lit(1010)) == 0


def test_agg_spec_min_max_across_batches(spark, dirs):
    def run(rows, batch_no):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").json(
            dirs["src"] + f"/b{batch_no}"
        )
        stream = spark.readStream.schema(SCHEMA).json(dirs["src"] + f"/b{batch_no}")
        q = pl.silver_summing_stream(
            stream, dirs["silver"], dirs["ckpt"] + f"/b{batch_no}",
            keys=["grp"],
            agg_spec={"v_sum": ("v", "sum"), "v_min": ("v", "min"),
                      "v_max": ("v", "max")},
            available_now=True,
        )
        assert q.awaitTermination(120)

    run([(1, "a", 5.0), (2, "a", 1.0), (3, "b", 7.0)], 0)
    run([(4, "a", 9.0), (5, "b", -2.0)], 1)
    state = {r.grp: (float(r.v_sum), r.v_min, r.v_max, r["__n_rows"])
             for r in pl.read_silver(spark, dirs["silver"]).collect()}
    assert state == {"a": (15.0, 1.0, 9.0, 3), "b": (5.0, -2.0, 7.0, 2)}


def test_agg_spec_rejects_unknown_op(spark, dirs):
    import os

    os.makedirs(dirs["src"], exist_ok=True)
    stream = spark.readStream.schema(SCHEMA).json(dirs["src"])
    with pytest.raises(ValueError, match="op must be one of"):
        pl.silver_summing_stream(
            stream, dirs["silver"], dirs["ckpt"], keys=["grp"],
            agg_spec={"x": ("v", "avg")},
        )
    with pytest.raises(ValueError, match="sum_cols and/or agg_spec"):
        pl.silver_summing_stream(
            stream, dirs["silver"], dirs["ckpt"], keys=["grp"])


def test_merge_stage_width_stays_bounded(spark, dirs):
    """Regression guard for the r8 shuffle-width cliff: a persisted
    aggregate (the foreachBatch merges persist the per-batch partial)
    must still be AQE-coalesced — with
    canChangeCachedPlanOutputPartitioning at its FALSE default, a cached
    plan materializes the shuffle at initialPartitionNum uncoalesced
    (measured: 2048-task stages per trigger, stream_summing_state 20.6s
    -> 3.4s at sf0.001).  The session conf (session.py) must keep the
    fix; this test recreates the scale session's initialPartitionNum and
    asserts no merge stage runs ultra-wide."""
    import threading

    from pyspark.sql import functions as F

    tracker = spark.sparkContext.statusTracker()
    seen = []
    stop = threading.Event()

    def poll():
        while not stop.is_set():
            for sid in tracker.getActiveStageIds() or []:
                info = tracker.getStageInfo(sid)
                if info:
                    seen.append(info.numTasks)
            stop.wait(0.01)

    df = spark.createDataFrame(
        [(i % 50, float(i)) for i in range(10_000)], "k long, v double"
    )
    t = threading.Thread(target=poll, daemon=True)
    t.start()
    prev = spark.conf.get("spark.sql.adaptive.coalescePartitions.initialPartitionNum")
    try:
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum", "2048")
        agg = df.groupBy("k").agg(F.sum("v").alias("s"))
        agg.persist()
        try:
            agg.count()
            agg.select("k").distinct().count()
        finally:
            agg.unpersist()
    finally:
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum", prev)
        stop.set()
        t.join(2)
    assert seen, "listener saw no stages"
    assert max(seen) <= 256, f"cached-plan shuffle ran a {max(seen)}-task stage"
