"""Lifecycle semantics tests: snapshot→stream handoff (T5), heartbeat
listener (T6), include lists (S5), trigger recompute (D6), transaction
metadata (T9), observe metrics (A4)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from postgres_debezium_clickhouse_spark.operators.transforms import apply_triggers, unwrap_envelope
from postgres_debezium_clickhouse_spark.schemas import TABLE_REGISTRY, envelope_schema, ORDERS_CDC_ROW
from postgres_debezium_clickhouse_spark.streaming.lifecycle import (
    HeartbeatListener,
    observe_counts,
    snapshot_then_stream,
    tables_to_capture,
)

COLS = ["id", "val", "op", "ts_ms", "offset"]


def test_snapshot_then_stream_no_double_count(spark):
    """T5 — rows present in BOTH the snapshot and the early stream (the
    at-least-once overlap window) must collapse, not double-apply."""
    snap = spark.createDataFrame(
        [(1, "s1", "r", 100, 1), (2, "s2", "r", 100, 2), (3, "s3", "r", 100, 3)], COLS
    )
    # stream replays key 1's snapshot-era state AND updates key 2
    stream = spark.createDataFrame(
        [(1, "s1", "c", 100, 10), (2, "s2-new", "u", 200, 11), (3, None, "d", 300, 12)], COLS
    )
    out = {r.id: r.val for r in snapshot_then_stream(snap, stream, keys=["id"]).collect()}
    assert out == {1: "s1", 2: "s2-new"}  # 3 deleted; 1 not duplicated


def test_snapshot_then_stream_equals_pure_batch(spark):
    """Handoff consistency: snapshot+tail == applying ALL events as one batch."""
    from postgres_debezium_clickhouse_spark.operators.upsert import apply_cdc

    snap = spark.createDataFrame([(1, "a", "r", 100, 1), (2, "b", "r", 100, 2)], COLS)
    tail = spark.createDataFrame([(1, "a2", "u", 200, 3), (2, "b2", "u", 150, 4)], COLS)
    merged = snapshot_then_stream(snap, tail, keys=["id"])
    pure = apply_cdc(snap.unionByName(tail), keys=["id"], version_col="ts_ms", tiebreak_col="offset")
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in pure.collect()}


def test_heartbeat_listener(spark, tmp_path):
    """T6 — progress events give a RUNNING status; unknown queries report
    UNKNOWN."""
    listener = HeartbeatListener()
    spark.streams.addListener(listener)
    try:
        df = spark.readStream.format("rate").option("rowsPerSecond", "10").load()
        q = (
            df.writeStream.format("noop")
            .queryName("hb_test")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        deadline = time.time() + 60
        while time.time() < deadline and "hb_test" not in listener.progress:
            time.sleep(0.5)
        q.stop()
        assert listener.status("hb_test")["state"] == "RUNNING"
        assert listener.status("nope") == {"state": "UNKNOWN"}
    finally:
        spark.streams.removeListener(listener)


def test_tables_to_capture_include_exclude():
    assert set(tables_to_capture(TABLE_REGISTRY, include=["orders"])) == {"orders"}
    assert "orders" not in tables_to_capture(TABLE_REGISTRY, exclude=["orders"])
    assert tables_to_capture(TABLE_REGISTRY) == TABLE_REGISTRY
    # include wins over exclude (Debezium precedence)
    assert set(tables_to_capture(TABLE_REGISTRY, include=["customer"], exclude=["customer"])) == {"customer"}


def test_apply_triggers_recomputes(spark):
    df = spark.createDataFrame(
        [(1, "x", None)], "id INT, val STRING, updated_at TIMESTAMP"
    )
    out = apply_triggers(df, {"updated_at": F.current_timestamp()}).first()
    assert out.updated_at is not None


def test_transaction_metadata_carried(spark):
    """T9 — provide.transaction.metadata: the txn struct survives unwrap."""
    env = envelope_schema(ORDERS_CDC_ROW)
    msg = (
        '{"payload": {"after": {"o_orderkey": 1, "o_custkey": 2, "o_orderstatus": "O",'
        ' "o_totalprice": "10.5", "o_orderdate": 1000, "o_orderpriority": "HI"},'
        ' "source": {"ts_ms": 5, "db": "poc", "table": "orders"}, "op": "c", "ts_ms": 5,'
        ' "transaction": {"id": "txn-9", "total_order": 3, "data_collection_order": 1}}}'
    )
    parsed = spark.createDataFrame([(msg,)], ["value"]).withColumn("j", F.from_json("value", env))
    row = unwrap_envelope(parsed, drop_deletes=True, keep_transaction=True).first()
    assert row["__txn"].id == "txn-9" and row["__txn"].total_order == 3
    # default path stays lean: no __txn column
    assert "__txn" not in unwrap_envelope(parsed).columns


def test_observe_counts_batch(spark):
    df = observe_counts(spark.range(7), "m")
    df.collect()
    # observed metrics surface on the DataFrame's last execution
    assert df.count() == 7


def test_late_event_dropped_after_eviction(spark):
    """VERDICT r6 #8 — the windowed events path's late-data policy,
    end-to-end: the registered query's final sink must show the closed
    window WITHOUT the late row (one emission, no duplicate, open window
    withheld).  The semantics line (drop only guaranteed once the window
    was evicted in an earlier trigger) is documented on the query."""
    from postgres_debezium_clickhouse_spark.plans.ops_queries import (
        stream_late_events,
    )

    rows = stream_late_events(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 1  # no duplicate emission, no open-window leak
    r = rows[0]
    assert r.window_start.hour == 10 and r.event_type == "view"
    assert r.n_events == 2  # late 10:45 row did NOT re-enter the window
