"""Layered-staging (transpassport) pipeline semantics.

Pins the two behaviors that distinguish init_transpassport.sql from the
basic path: version-LESS ReplacingMergeTree (insert order wins, even
against a newer source timestamp) and the JSONHas MV filter (deletes never
reach the final table, so deleted keys keep their last non-delete image).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_debezium_clickhouse_spark.plans.staging_queries import (
    passport_staging,
    trn_passport_current,
    trn_passport_ts_version,
)


def test_insert_order_beats_skewed_clock(spark, sf_dir):
    cur = trn_passport_current(spark, sf_dir)
    # an updated key (%5==0): the update arrived later (offset) with an
    # OLDER source ts — version-less semantics keep it anyway
    row = cur.filter(F.col("trn_id") == "T5").first()
    assert row is not None
    assert row.gate_id == "G99"
    assert row.created_by == "gate-sync"
    # a never-updated key keeps the snapshot image
    row = cur.filter(F.col("trn_id") == "T1").first()
    assert row.gate_id == "G1"
    assert row.created_by == "system"


def test_ts_version_prefers_snapshot(spark, sf_dir):
    ts = trn_passport_ts_version(spark, sf_dir)
    # same key, same log: ts-versioned dedup picks the snapshot (ts 5e6)
    # over the clock-skewed update (ts 4.4e6)
    row = ts.filter(F.col("trn_id") == "T5").first()
    assert row.gate_id == "G5"
    assert row.created_by == "system"
    assert row.ts_ms == 5_000_000


def test_deletes_filtered_before_dedup(spark, sf_dir):
    staging = passport_staging(spark, sf_dir)
    n_keys = staging.select(F.col("key")).distinct().count()
    cur = trn_passport_current(spark, sf_dir)
    # delete events exist in staging for %13==0 keys, but the JSONHas
    # filter drops them before dedup: every key survives into the final
    assert cur.count() == n_keys
    assert cur.filter(F.col("trn_id") == "T13").first() is not None
