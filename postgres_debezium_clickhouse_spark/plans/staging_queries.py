"""Layered-staging parity — the transpassport/logtrans pipeline.

The reference's second basic-example deployment (init_transpassport.sql,
init_logtrans.sql) is a FOUR-layer pipeline, one layer more than the basic
path:

    Kafka engine table (raw _value)                        [layer 1]
      → MV → staging MergeTree (value_json, partition, offset,
               ORDER BY offset)                            [layer 2]
      → MV(JSONExtract*, WHERE JSONHas(payload.after))     [layer 3]
      → version-LESS ReplacingMergeTree() ORDER BY trn_id  [layer 4]

Two semantics distinguish it from the basic path:

- **Version-less dedup** (init_transpassport.sql:60): ``ReplacingMergeTree()``
  with NO version argument keeps the last-INSERTED row per key — insert
  order (Kafka offset), not ``source.ts_ms``, decides the winner.  The
  fixture's update events carry an OLDER source timestamp than the snapshot
  (clock-skewed source) at a LATER offset, so the two modes give different
  answers and each oracle pins its own.
- **Deletes never reach the final table** (init_transpassport.sql:90): the
  MV's ``WHERE JSONHas(value_json,'payload','after')`` filter drops them
  before dedup, so a deleted key retains its last non-delete image.

Scale notes: layer 2→4 is ONE hash shuffle on the table key (the max_by
aggregation in ``latest_wins`` does map-side partial combine, so only one
candidate row per key per map partition crosses the wire); the JSON parse is
parse-once (``json_extract_struct``) and narrow.  At 100 TB the staging
layer is an append-only partitioned parquet table and the final layer is
the keyed silver store — both already demonstrated by S7/S8.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import eval_once_barrier, json_extract_struct
from ..operators.upsert import latest_wins
from ..sources.cdc import PASSPORT_ENVELOPE_WIRE, passport_cdc_events

_FINAL_COLS = [
    "trn_no", "trn_id", "nationality", "doctype", "passport_number",
    "gender", "birthday", "expire_date", "surname", "given_name",
    "gate_id", "site_id", "created_by", "created_datetime", "issuer",
]


def passport_staging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layer 2 — the staging table shape (init_transpassport.sql:22-29 /
    init_logtrans.sql:22-29): key, raw value_json, Kafka lineage, insert
    order.  The reference keeps offset as Int32; we keep Int64 — a 100 TB
    topic partition overflows 2^31 offsets."""
    ev = passport_cdc_events(spark, sf_dir)
    return ev.select(
        F.col("key"),
        F.col("value").alias("value_json"),
        F.col("partition").cast("string").alias("partition_str"),
        F.col("offset"),
    )


def trn_passport_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layers 3+4 — JSONExtract MV + JSONHas filter into the version-less
    final table (init_transpassport.sql:66-91): last INSERT wins per trn_id
    even when its source clock is behind (offset is the only version)."""
    staging = passport_staging(spark, sf_dir)
    flat = (
        # eval_once_barrier: the JSONHas filter must not duplicate the parse
        eval_once_barrier(
            staging.withColumn("j", json_extract_struct("value_json", PASSPORT_ENVELOPE_WIRE)), "j"
        )
        .filter(F.col("j.payload.after").isNotNull())  # JSONHas(...'after')
        .select("j.payload.after.*", "offset")
    )
    return latest_wins(flat, keys=["trn_id"], version_cols=["offset"]).select(*_FINAL_COLS)


def trn_passport_ts_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The contrast the reference's own comment contemplates
    (init_transpassport.sql:85-89, the commented-out ``_version`` column):
    the SAME log deduped by ``source.ts_ms`` instead of insert order.  The
    clock-skewed updates (older ts, later offset) now LOSE to the snapshot —
    different final state from trn_passport_current by construction."""
    staging = passport_staging(spark, sf_dir)
    flat = (
        eval_once_barrier(
            staging.withColumn("j", json_extract_struct("value_json", PASSPORT_ENVELOPE_WIRE)), "j"
        )
        .filter(F.col("j.payload.after").isNotNull())
        .select(
            F.col("j.payload.after.trn_id").alias("trn_id"),
            F.col("j.payload.after.gate_id").alias("gate_id"),
            F.col("j.payload.after.created_by").alias("created_by"),
            F.col("j.payload.source.ts_ms").alias("ts_ms"),
            F.col("offset"),
        )
    )
    return latest_wins(flat, keys=["trn_id"], version_cols=["ts_ms", "offset"]).select(
        "trn_id", "gate_id", "created_by", "ts_ms"
    )


QUERIES = {
    "trn_passport_current": trn_passport_current,
    "trn_passport_ts_version": trn_passport_ts_version,
}

ORACLES = {
    # version-less: the %5==0 update (later offset) wins despite older ts;
    # %13==0 deletes are filtered before dedup, so every key survives.
    "trn_passport_current": """
        SELECT CAST(c_custkey AS INT) AS trn_no,
               'T' || CAST(c_custkey AS VARCHAR) AS trn_id,
               'N' || CAST(c_nationkey AS VARCHAR) AS nationality,
               'PASSPORT' AS doctype,
               'P' || CAST(c_custkey AS VARCHAR) AS passport_number,
               CASE WHEN c_custkey % 2 = 0 THEN 'F' ELSE 'M' END AS gender,
               CAST(1950 + c_custkey % 50 AS VARCHAR) || '-06-15' AS birthday,
               '2030-12-31' AS expire_date,
               c_mktsegment AS surname,
               c_name AS given_name,
               CASE WHEN c_custkey % 5 = 0 THEN 'G99'
                    ELSE 'G' || CAST(c_custkey % 10 AS VARCHAR) END AS gate_id,
               'S' || CAST(c_custkey % 5 AS VARCHAR) AS site_id,
               CASE WHEN c_custkey % 5 = 0 THEN 'gate-sync' ELSE 'system' END AS created_by,
               strftime(TIMESTAMP '2024-03-01 00:00:00' + to_seconds(c_custkey),
                        '%Y-%m-%d %H:%M:%S') AS created_datetime,
               'TH-IMM' AS issuer
        FROM customer
    """,
    # ts-versioned: the snapshot (ts 5e6) beats the skewed update (ts 4.4e6)
    # for every key — the pre-update image everywhere.
    "trn_passport_ts_version": """
        SELECT 'T' || CAST(c_custkey AS VARCHAR) AS trn_id,
               'G' || CAST(c_custkey % 10 AS VARCHAR) AS gate_id,
               'system' AS created_by,
               CAST(5000000 AS BIGINT) AS ts_ms
        FROM customer
    """,
}
