"""Streaming pipeline: the materialized-view registry and the bronze/silver
write paths (SURVEY §2.1 S7-S8/S10, §2.8 D5, §2.9).

ClickHouse's ``CREATE MATERIALIZED VIEW … TO target AS SELECT …``
(basic_example/init.sql:31-35,52-63) is insert-triggered incremental
compute — exactly a Structured Streaming query.  The registry here is the
engine-side replacement for connector REST registration
(basic_example/start.sh:67-74): ``Pipeline.register_mv`` creates/replaces a
named streaming query; re-registering stops the old one (the PUT-connector
equivalent).

Mapping:
- offset tracking  → checkpointLocation (T1; Kafka consumer-group offsets,
  clickhouse.sql:18 / debezium_offsets topic, docker-compose.yml:87-89)
- poison messages  → PERMISSIVE from_json + corrupt filter (T2;
  kafka_skip_broken_messages=1, clickhouse.sql:20)
- backpressure     → maxOffsetsPerTrigger / maxFilesPerTrigger (T7;
  max.batch.size=1024, abcsvb-connector-secure.json:44)
- heartbeats       → StreamingQueryListener progress events (T6;
  heartbeat.interval.ms, debezium-pg-connector.json:15)
- error policy     → fail-fast: query.exception() surfaced on await (T8;
  errors.tolerance=none, abcsvb-connector-secure.json:51-53)

Scale: bronze append is shuffle-free (narrow projection → partitioned
parquet).  Silver upsert shuffles only the micro-batch by key and merges
against the keyed silver store via ``apply_cdc(changed_keys_only=True)`` —
never a full-table rewrite per trigger.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.upsert import apply_cdc, cluster_by_key


def bronze_append_stream(
    records: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: list[str] | None = None,
    available_now: bool = False,
) -> StreamingQuery:
    """S7 — durable raw archive: append-mode parquet sink with Kafka lineage
    + ingestion_time (init_clickhouse_raw_tables.sql:28-37).  Exactly-once
    to the file sink via the checkpoint (T1)."""
    bronze = records.withColumn("ingestion_time", F.current_timestamp())
    writer = (
        bronze.writeStream.format("parquet")
        .outputMode("append")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def silver_upsert_stream(
    events: DataFrame,
    path: str,
    checkpoint: str,
    keys: list[str],
    version_col: str = "ts_ms",
    tiebreak_col: str | None = "offset",
    delete_mode: str = "drop",
    available_now: bool = False,
) -> StreamingQuery:
    """S8 — the ReplacingMergeTree-equivalent keyed upsert sink: per
    micro-batch, merge the batch into the silver store with latest-wins
    semantics (eager FINAL — downstream readers never need dedup-on-read).

    The store ALWAYS retains tombstones (``__deleted`` rows) internally,
    regardless of ``delete_mode``: physically dropping a delete would lose
    its version, so an older version of the same key arriving in a LATER
    micro-batch (cross-batch disorder) would resurrect the row.  The
    ``delete_mode`` argument selects the READ semantics: 'drop' filters
    tombstones in ``read_silver`` (init.sql:63 behavior), 'rewrite' exposes
    them (abcsvb-connector-secure.json:33-34).  Use ``read_silver`` (or
    filter ``__deleted`` yourself) to consume the store.

    foreachBatch because the merge is keyed state over an external store;
    the merge itself is `operators.upsert.apply_cdc` (batch-tested logic —
    streaming is a thin shell, SURVEY §7.3 M4).
    """

    def _merge(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        current = None
        if os.path.isdir(path) and any(f.endswith(".parquet") for f in os.listdir(path)):
            current = spark.read.parquet(path)
        merged = apply_cdc(
            batch,
            keys=keys,
            version_col=version_col,
            tiebreak_col=tiebreak_col,
            delete_mode="rewrite",  # tombstones must persist across batches
            current=current,
        )
        # O1 clustering: key-sorted layout → parquet min/max row-group
        # skipping for key lookups (the sparse-index equivalent).
        out = cluster_by_key(merged, keys)
        tmp = f"{path}__staging_{batch_id}"
        out.write.mode("overwrite").parquet(tmp)
        final = spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(path)

    writer = events.writeStream.foreachBatch(_merge).option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_silver(
    spark: SparkSession,
    path: str,
    keys: list[str],
    drop_tombstones_below_version: int | None = None,
    version_col: str = "ts_ms",
) -> int:
    """The ClickHouse background-merge / ``OPTIMIZE TABLE … FINAL``
    analogue, run on demand: rewrite the silver store key-clustered
    (restoring the O1 layout after many incremental merges) and optionally
    garbage-collect tombstones whose version is older than a replay
    horizon.

    Tombstones younger than the horizon MUST stay (they guard against
    late-arriving older versions — see silver_upsert_stream); once the
    source can no longer deliver events older than ``version``, the
    tombstone is dead weight.  Returns the number of rows removed.
    """
    from ..operators.upsert import cluster_by_key

    df = spark.read.parquet(path)
    before = df.count()
    if drop_tombstones_below_version is not None:
        df = df.filter(
            ~(F.col("__deleted") & (F.col(version_col) < drop_tombstones_below_version))
        )
    compacted = cluster_by_key(df, keys)
    tmp = f"{path}__compact"
    compacted.write.mode("overwrite").parquet(tmp)
    final = spark.read.parquet(tmp)
    n_after = final.count()
    final.write.mode("overwrite").parquet(path)
    return before - n_after


def read_silver(spark: SparkSession, path: str, include_deleted: bool = False) -> DataFrame:
    """Read the silver store written by ``silver_upsert_stream``.

    ``include_deleted=False`` = the basic-path drop semantics (init.sql:63);
    True = rewrite semantics with the ``__deleted`` flag exposed
    (abcsvb-connector-secure.json:33-34).  Tombstones always exist in the
    store (see silver_upsert_stream) — this is where the two reference
    delete modes diverge."""
    df = spark.read.parquet(path)
    if include_deleted:
        return df
    return df.filter(~F.col("__deleted")).drop("__deleted")


@dataclass
class MaterializedView:
    name: str
    query: StreamingQuery
    target: str


@dataclass
class Pipeline:
    """S10/D5 — named-streaming-query registry: the engine-side analogue of
    Kafka-Connect REST registration (start.sh:67-74) + ClickHouse's MV DDL
    (init.sql:31).  ``register_mv`` is create-or-replace: an existing query
    under the same name is stopped first (the PUT semantics,
    connect.txt:1-34)."""

    spark: SparkSession
    views: dict[str, MaterializedView] = field(default_factory=dict)

    def register_mv(
        self,
        name: str,
        source: DataFrame,
        transform: Callable[[DataFrame], DataFrame],
        target_path: str,
        checkpoint: str,
        available_now: bool = False,
    ) -> MaterializedView:
        """D5 — ``CREATE [OR REPLACE] MATERIALIZED VIEW name TO target AS
        transform(source)`` (init.sql:31-35): registers the transform as a
        named streaming query appending to ``target_path``.  Re-registering
        an existing name stops the old query first (the PUT-reconfigure
        lifecycle, connect.txt:20-31)."""
        if name in self.views:
            self.views[name].query.stop()
        transformed = transform(source)
        writer = (
            transformed.writeStream.format("parquet")
            .outputMode("append")
            .option("path", target_path)
            .option("checkpointLocation", checkpoint)
            .queryName(name)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        mv = MaterializedView(name=name, query=writer.start(), target=target_path)
        self.views[name] = mv
        return mv

    def capture_table(
        self,
        table: str,
        events: DataFrame,
        base_dir: str,
        registry: dict[str, dict] | None = None,
        available_now: bool = False,
    ) -> dict[str, StreamingQuery]:
        """S10 one-call table capture — the ``POST /connectors`` equivalent
        (start.sh:67-74): wire BOTH layers for one registry table from a
        Kafka-shaped event stream: bronze raw archive + silver keyed upsert,
        each with its own checkpoint.  Returns the two queries keyed
        'bronze'/'silver'."""
        from ..schemas import TABLE_REGISTRY

        spec = (registry or TABLE_REGISTRY)[table]
        bronze_q = bronze_append_stream(
            events.selectExpr("value AS value_json", "CAST(partition AS STRING) AS partition_str", "offset AS offset_num"),
            path=f"{base_dir}/bronze/{table}",
            checkpoint=f"{base_dir}/ckpt/bronze_{table}",
            available_now=available_now,
        )
        from ..sources.cdc import parse_envelope
        from ..schemas import envelope_schema

        p = F.col("j.payload")
        parsed = parse_envelope(events, envelope_schema(spec["row"]))
        flat = parsed.select(
            *[F.coalesce(p.after[k], p.before[k]).alias(k) for k in spec["keys"]],
            *[p.after[f.name].alias(f.name) for f in spec["row"].fields if f.name not in spec["keys"]],
            p.op.alias("op"),
            p.source["ts_ms"].alias("ts_ms"),
            F.col("offset"),
        )
        silver_q = silver_upsert_stream(
            flat,
            path=f"{base_dir}/silver/{table}",
            checkpoint=f"{base_dir}/ckpt/silver_{table}",
            keys=spec["keys"],
            available_now=available_now,
        )
        return {"bronze": bronze_q, "silver": silver_q}

    def drop_mv(self, name: str) -> None:
        """D2 — idempotent drop (DROP VIEW IF EXISTS, clickhouse.sql:2-6)."""
        mv = self.views.pop(name, None)
        if mv is not None:
            mv.query.stop()

    def await_all(self, timeout_s: float | None = None) -> None:
        """T8 — fail-fast: surface the first query exception."""
        for mv in self.views.values():
            mv.query.awaitTermination(timeout_s)
            if mv.query.exception() is not None:
                raise mv.query.exception()

    def stop_all(self) -> None:
        for mv in list(self.views.values()):
            mv.query.stop()
        self.views.clear()


def corrupt_filter(parsed: DataFrame, payload_col: str = "j") -> tuple[DataFrame, DataFrame]:
    """T2 — split good/poison messages after PERMISSIVE parse: NULL payload
    = unparseable (kafka_skip_broken_messages equivalent).  Returns (good,
    dead_letter)."""
    good = parsed.filter(F.col(payload_col).isNotNull() & F.col(f"{payload_col}.payload").isNotNull())
    dead = parsed.filter(F.col(payload_col).isNull() | F.col(f"{payload_col}.payload").isNull())
    return good, dead
