"""r10 store-lifecycle parity ops: system.parts-style describe, FREEZE
(zero-copy hardlink snapshot), and restore-to-version (append-only
rollback through the normal commit path)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import postgres_debezium_clickhouse_spark.streaming.pipeline as pl


def _seed(spark, path, n=300, n_buckets=4):
    df = spark.createDataFrame(
        [(i, (i * 7919) % 1000, f"v{i}") for i in range(n)],
        "k long, sec long, val string",
    ).withColumn("__deleted", F.lit(False))
    pl._publish_buckets(
        df, path, ["k"], {"version": 0, "n_buckets": n_buckets, "files": []},
        set(range(n_buckets)),
    )


def test_describe_silver_lists_every_live_file(spark, tmp_path):
    path = str(tmp_path / "store")
    _seed(spark, path)
    pl.add_projection(spark, path, ["k"], "by_sec", ["sec"])
    rows = pl.describe_silver(spark, path).collect()
    m = pl._read_manifest(path)
    n_expected = len(m["files"]) + len(m["projections"]["by_sec"]["files"])
    assert len(rows) == n_expected
    assert {r.layout for r in rows} == {"primary", "proj:by_sec"}
    assert all(r.bytes > 0 for r in rows)
    assert {r.bucket for r in rows} == set(range(4))
    assert all(r.version == m["version"] for r in rows)


def test_freeze_is_zero_copy_and_immune_to_source_changes(spark, tmp_path):
    path = str(tmp_path / "store")
    snap = str(tmp_path / "snap")
    _seed(spark, path)
    pl.add_projection(spark, path, ["k"], "by_sec", ["sec"])
    n = pl.freeze_silver(path, snap)
    m = pl._read_manifest(path)
    assert n == len(m["files"]) + len(m["projections"]["by_sec"]["files"])
    # zero-copy: same inode
    rel = m["files"][0]
    assert os.stat(os.path.join(path, rel)).st_ino == \
        os.stat(os.path.join(snap, rel)).st_ino
    before = {(r.k, r.val) for r in pl.read_silver(spark, path).collect()}
    assert {(r.k, r.val) for r in pl.read_silver(spark, snap).collect()} == before
    # mutate + vacuum the live store: the snapshot must not move
    pl.mutate_silver(spark, path, ["k"], where=F.col("k") % 3 == 0, delete=True)
    pl.vacuum_silver(path, grace_s=0.0, retain_history=1)
    assert {(r.k, r.val) for r in pl.read_silver(spark, snap).collect()} == before
    with pytest.raises(FileExistsError):
        pl.freeze_silver(path, snap)


def test_restore_silver_rolls_back_as_new_version(spark, tmp_path):
    path = str(tmp_path / "store")
    _seed(spark, path)
    v1 = pl._read_manifest(path)["version"]
    good = {(r.k, r.val) for r in pl.read_silver(spark, path).collect()}
    # the "bad" mutation: delete a third, rewrite some values
    pl.mutate_silver(spark, path, ["k"], where=F.col("k") % 3 == 0, delete=True)
    pl.mutate_silver(spark, path, ["k"], where=F.col("k") % 3 == 1,
                     set_exprs={"val": F.lit("CLOBBERED")})
    assert {(r.k, r.val) for r in pl.read_silver(spark, path).collect()} != good
    v_new = pl.restore_silver(spark, path, ["k"], v1)
    assert v_new > v1 + 2                      # append-only: a NEW version
    assert {(r.k, r.val) for r in pl.read_silver(spark, path).collect()} == good
    # the bad versions remain reachable for audit
    assert pl.read_silver(spark, path, as_of_version=v_new - 1).filter(
        F.col("val") == "CLOBBERED").count() > 0
    # restoring PRESERVES tombstone semantics: delete, restore to the
    # deleted version, tombstones still hide the rows
    pl.ttl_silver(spark, path, ["k"], "sec", F.lit(100))
    v_ttl = pl._read_manifest(path)["version"]
    n_after_ttl = pl.read_silver(spark, path).count()
    pl.restore_silver(spark, path, ["k"], v_ttl)
    assert pl.read_silver(spark, path).count() == n_after_ttl
