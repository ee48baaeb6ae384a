"""Property-style tests for the latest-wins upsert (W1/W2/S8/T3/T4) — the
ReplacingMergeTree+FINAL contract (basic_example/clickhouse.sql:51-52,82)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from postgres_debezium_clickhouse_spark.operators.upsert import (
    apply_cdc,
    cluster_by_key,
    latest_wins,
    with_ingest_seq,
)

COLS = ["id", "val", "op", "ts_ms", "offset"]

#: event log: key 1 created then updated (out of order), key 2 with an
#: equal-ts conflict (offset must break the tie), key 3 deleted, key 4
#: delivered twice (duplicate delivery).
EVENTS = [
    (1, "a1", "c", 100, 10),
    (1, "a3", "u", 300, 12),   # winner for key 1
    (1, "a2", "u", 200, 11),
    (2, "b-lo", "c", 100, 20),
    (2, "b-hi", "u", 100, 21),  # same ts: higher offset wins (W2)
    (3, "c1", "c", 100, 30),
    (3, "c-del", "d", 200, 31),
    (4, "d1", "c", 100, 40),
    (4, "d1", "c", 100, 40),   # exact duplicate delivery (T1 at-least-once)
]


def _state(spark, events, **kw):
    df = spark.createDataFrame(events, COLS)
    out = apply_cdc(df, keys=["id"], version_col="ts_ms", tiebreak_col="offset", **kw)
    return {r.id: r for r in out.collect()}


def test_latest_wins_max_version(spark):
    df = spark.createDataFrame(EVENTS, COLS)
    out = latest_wins(df, ["id"], ["ts_ms", "offset"])
    got = {r.id: r.val for r in out.collect()}
    assert got == {1: "a3", 2: "b-hi", 3: "c-del", 4: "d1"}


def test_order_insensitive(spark):
    """T3 — the same final state for ANY arrival order (the reference's
    no-watermark design, init_transpassport.sql:86-89)."""
    base = _state(spark, EVENTS)
    for seed in (1, 2, 3):
        shuffled = EVENTS[:]
        random.Random(seed).shuffle(shuffled)
        assert _state(spark, shuffled) == base


def test_delete_drop_mode(spark):
    st = _state(spark, EVENTS, delete_mode="drop")
    assert 3 not in st  # deleted key vanishes (init.sql:63)
    assert st[1].val == "a3"
    assert st[2].val == "b-hi"  # equal-ts tie → insert order (offset)
    assert st[4].val == "d1"  # duplicates collapse


def test_delete_rewrite_mode(spark):
    st = _state(spark, EVENTS, delete_mode="rewrite")
    assert st[3]["__deleted"] is True  # tombstone kept (abcsvb-connector-secure.json:33)
    assert st[1]["__deleted"] is False


def test_invalid_delete_mode(spark):
    df = spark.createDataFrame(EVENTS, COLS)
    try:
        apply_cdc(df, keys=["id"], delete_mode="nope")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_merge_with_current_touches_only_batch_keys(spark):
    """S8 scale contract: merging a batch against existing silver state
    rewrites ONLY keys present in the batch (changed_keys_only)."""
    current = spark.createDataFrame(
        [(1, "old1", "c", 50, 1), (99, "keep", "c", 50, 2)], COLS
    )
    batch = spark.createDataFrame([(1, "new1", "u", 500, 100)], COLS)
    out = apply_cdc(batch, keys=["id"], version_col="ts_ms", tiebreak_col="offset", current=current)
    got = {r.id: r.val for r in out.collect()}
    assert got == {1: "new1", 99: "keep"}


def test_merge_old_version_in_batch_loses_to_current(spark):
    """Out-of-order re-delivery of an OLD version must not regress silver."""
    current = spark.createDataFrame([(1, "v2", "u", 200, 5)], COLS)
    stale = spark.createDataFrame([(1, "v1", "u", 100, 99)], COLS)
    out = apply_cdc(stale, keys=["id"], version_col="ts_ms", tiebreak_col="offset", current=current)
    assert out.collect()[0].val == "v2"


def test_ingest_seq_monotonic_and_cluster_preserves_rows(spark):
    df = spark.createDataFrame(EVENTS, COLS)
    seq = with_ingest_seq(df)
    assert seq.filter(F.col("__ingest_seq").isNull()).count() == 0
    clustered = cluster_by_key(df, ["id"], num_partitions=2)
    assert clustered.count() == df.count()
    assert clustered.rdd.getNumPartitions() == 2


def test_schema_evolution_additive_both_directions(spark):
    """A column added by the source appears (NULL for old rows); a column
    the source dropped is preserved in the store (NULL for new rows)."""
    batch1 = spark.createDataFrame(
        [(1, "a1", "c", 100, 10), (2, "b1", "c", 100, 20)], COLS
    )
    silver = apply_cdc(batch1, keys=["id"], version_col="ts_ms", tiebreak_col="offset")
    # source evolved: 'val' dropped, 'val2' added; only key 2 touched
    batch2 = spark.createDataFrame(
        [(2, "B2", "u", 200, 21)], ["id", "val2", "op", "ts_ms", "offset"]
    )
    out = {
        r.id: r
        for r in apply_cdc(
            batch2, keys=["id"], version_col="ts_ms", tiebreak_col="offset", current=silver
        ).collect()
    }
    assert set(out) == {1, 2}
    assert out[1].val == "a1" and out[1].val2 is None   # untouched row keeps history
    assert out[2].val2 == "B2" and out[2].val is None   # evolved row, old col NULL


def test_latest_wins_keep_first(spark):
    from postgres_debezium_clickhouse_spark.operators.upsert import latest_wins

    df = spark.createDataFrame(EVENTS, COLS)
    out = {r.id: r.val for r in latest_wins(df, ["id"], ["ts_ms", "offset"], keep="first").collect()}
    # min version (then min offset) per key: the creation image everywhere
    assert out == {1: "a1", 2: "b-lo", 3: "c1", 4: "d1"}


def test_apply_cdc_rejects_unknown_delete_mode(spark):
    import pytest as _pytest

    df = spark.createDataFrame(EVENTS, COLS)
    with _pytest.raises(ValueError, match="delete_mode"):
        apply_cdc(df, keys=["id"], delete_mode="purge")


def test_backfill_batch_falls_back_to_shuffle_semi_join(spark):
    """T5 guard — a snapshot/backfill 'batch' (whole-table scale) must not
    broadcast its key set: with the threshold forced low the plan uses a
    shuffle semi/anti join (no BroadcastExchange), results unchanged."""
    current = spark.createDataFrame(
        [(i, f"old{i}", "c", 50, i) for i in range(1, 8)], COLS
    )
    batch = spark.createDataFrame(
        [(i, f"new{i}", "u", 500, 100 + i) for i in range(1, 6)], COLS
    )
    kw = dict(keys=["id"], version_col="ts_ms", tiebreak_col="offset", current=current)
    small = apply_cdc(batch, **kw)                          # broadcast path
    big = apply_cdc(batch, max_broadcast_keys=0, **kw)      # forced shuffle path
    assert "BroadcastExchange" not in big._jdf.queryExecution().executedPlan().toString()
    assert {tuple(r) for r in big.collect()} == {tuple(r) for r in small.collect()}
    got = {r.id: r.val for r in big.collect()}
    assert got == {1: "new1", 2: "new2", 3: "new3", 4: "new4", 5: "new5",
                   6: "old6", 7: "old7"}


def test_delete_drop_null_op_rows_survive(spark):
    """A caller-supplied current state without an op column is padded with
    NULL op; NULL != 'd' is NULL in SQL, so a non-null-safe filter would
    silently drop those winning rows (ADVICE r2)."""
    current = spark.createDataFrame([(1, "keep", 100, 1)], ["id", "val", "ts_ms", "offset"])
    batch = spark.createDataFrame([(2, "new", "c", 200, 2)], COLS)
    out = apply_cdc(batch, keys=["id"], version_col="ts_ms",
                    tiebreak_col="offset", current=current, delete_mode="drop")
    got = {r.id: r.val for r in out.collect()}
    assert got == {1: "keep", 2: "new"}
    # rewrite mode: NULL op must flag False, not NULL
    out2 = apply_cdc(batch, keys=["id"], version_col="ts_ms",
                     tiebreak_col="offset", current=current, delete_mode="rewrite")
    flags = {r.id: r["__deleted"] for r in out2.collect()}
    assert flags == {1: False, 2: False}


def test_latest_wins_tie_on_full_version_is_deterministic(spark):
    """r7: the orderable-payload agg path (max over struct(versions, rest))
    breaks full-version-tuple ties by the payload's lexicographic order —
    deterministic, where max_by left the winner arbitrary."""
    rows = [(1, "zzz", 100, 5), (1, "aaa", 100, 5), (1, "mmm", 100, 5)]
    df = spark.createDataFrame(rows, ["id", "val", "ts_ms", "offset"])
    for _ in range(3):
        out = latest_wins(df, ["id"], ["ts_ms", "offset"])
        assert [(r.id, r.val) for r in out.collect()] == [(1, "zzz")]
    first = latest_wins(df, ["id"], ["ts_ms", "offset"], keep="first")
    assert [(r.id, r.val) for r in first.collect()] == [(1, "aaa")]


def test_latest_wins_map_column_falls_back_to_max_by(spark):
    """MapType payloads are not orderable — the agg strategy must route to
    the max_by form (struct ordering would fail analysis) and still pick
    the max-version row."""
    df = spark.createDataFrame(
        [(1, {"a": 1}, 100, 1), (1, {"b": 2}, 200, 2)],
        "id int, m map<string,int>, ts_ms long, offset long",
    )
    out = latest_wins(df, ["id"], ["ts_ms", "offset"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "max_by" in plan
    got = out.collect()
    assert len(got) == 1 and got[0].m == {"b": 2}


def test_toast_carry_forward_vs_naive_merge(spark):
    """r12 verdict item 4 — Debezium TOAST semantics: an update with the
    `__debezium_unavailable_value` placeholder for an unchanged TOASTed
    column must NOT overwrite the real value; the merge carries the
    latest non-placeholder value forward.  The naive merge provably
    differs on the same events."""
    from postgres_debezium_clickhouse_spark.operators.upsert import (
        DEBEZIUM_UNAVAILABLE as PH,
        apply_cdc,
    )

    events = spark.createDataFrame(
        [
            # key 1: real → placeholder update (real note must survive)
            (1, "note-1", "A", "r", 1, 10),
            (1, PH, "B", "u", 2, 11),
            # key 2: real → placeholder → real → placeholder (latest
            # real wins, across interleaved placeholders)
            (2, "note-2", "A", "r", 1, 20),
            (2, PH, "B", "u", 2, 21),
            (2, "fresh-2", "C", "u", 3, 22),
            (2, PH, "D", "u", 4, 23),
            # key 3: never a real value (stream started mid-life) —
            # placeholder KEPT, not faked to NULL
            (3, PH, "B", "u", 2, 30),
            # key 4: placeholder then delete under rewrite mode later;
            # here drop mode: delete wins → key disappears
            (4, "note-4", "A", "r", 1, 40),
            (4, None, "A", "d", 2, 41),
        ],
        "k long, note string, status string, op string, ts_ms long, offset long",
    )
    out = {r.k: r for r in apply_cdc(
        events, keys=["k"], version_col="ts_ms", tiebreak_col="offset",
        delete_mode="drop", carry_forward_cols=["note"],
    ).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].note == "note-1" and out[1].status == "B"
    assert out[2].note == "fresh-2" and out[2].status == "D"
    assert out[3].note == PH                      # honest: never known
    naive = {r.k: r for r in apply_cdc(
        events, keys=["k"], version_col="ts_ms", tiebreak_col="offset",
        delete_mode="drop",
    ).collect()}
    assert naive[1].note == PH and naive[2].note == PH   # the bug class


def test_toast_carry_forward_uses_current_silver_state(spark):
    """Steady-state stream: the silver current state participates as a
    prior version, so a placeholder-only micro-batch keeps the stored
    value — and rewrite-mode deletes still tombstone."""
    from postgres_debezium_clickhouse_spark.operators.upsert import (
        DEBEZIUM_UNAVAILABLE as PH,
        apply_cdc,
    )

    current = spark.createDataFrame(
        [(1, "stored-1", "A", "u", 5, 100), (2, "stored-2", "A", "u", 5, 110)],
        "k long, note string, status string, op string, ts_ms long, offset long",
    )
    batch = spark.createDataFrame(
        [(1, PH, "Z", "u", 6, 200), (2, None, None, "d", 6, 210)],
        "k long, note string, status string, op string, ts_ms long, offset long",
    )
    out = {r.k: r for r in apply_cdc(
        batch, keys=["k"], version_col="ts_ms", tiebreak_col="offset",
        delete_mode="rewrite", current=current,
        carry_forward_cols=["note"],
    ).collect()}
    assert out[1].note == "stored-1" and out[1].status == "Z"
    assert out[1]["__deleted"] is False
    assert out[2]["__deleted"] is True


def test_unavailable_value_flags_detector(spark):
    """The transforms-side half: per-column flags + summary boolean."""
    from postgres_debezium_clickhouse_spark.operators.transforms import (
        unavailable_value_flags,
    )
    from postgres_debezium_clickhouse_spark.operators.upsert import (
        DEBEZIUM_UNAVAILABLE as PH,
    )

    df = spark.createDataFrame(
        [(1, PH, "x"), (2, "ok", None)], "k long, a string, b string"
    )
    out = {r.k: r for r in unavailable_value_flags(df).collect()}
    assert out[1]["__unavail_a"] is True and out[1]["__has_unavailable"] is True
    assert out[2]["__unavail_a"] is False and out[2]["__has_unavailable"] is False
    assert out[2]["__unavail_b"] is False      # NULL is not the placeholder
