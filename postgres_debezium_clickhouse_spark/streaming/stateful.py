"""Custom stateful streaming operators via ``applyInPandasWithState`` —
the extension point for semantics Spark's built-in streaming operators
can't express (SURVEY §2.10: the engine's UDF surface is pandas-based,
Arrow-batched; state lives in the state store, checkpointed with the
query).

Two operators the reference pipeline family needs:

- ``stateful_dedup``      — emit only the FIRST occurrence of each key
  across the whole stream (cross-batch); unlike ``dropDuplicates`` +
  watermark, the horizon is controlled by an explicit state timeout, and
  unlike the silver upsert it never rewrites a store — O(state) memory,
  O(batch) work.
- ``stateful_running_agg`` — per-key cumulative count/sum emitted every
  time the key appears (the trigger-time running aggregate; ClickHouse
  users emulate this with AggregatingMergeTree, we hold the accumulator in
  the state store).

Scale: state is partitioned by the grouping key across executors (hash
shuffle per micro-batch — the same shuffle a keyed aggregate needs); the
state store is RocksDB-backed on a real cluster
(``spark.sql.streaming.stateStore.providerClass``), checkpointed for
exactly-once recovery (T1).  Timeouts bound state size.
"""

from __future__ import annotations

from collections.abc import Iterator
from contextlib import contextmanager

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def rocksdb_state_confs(
    bounded_memory_mb: int | None = 1024,
    changelog_checkpointing: bool = True,
) -> dict[str, str]:
    """The production state-store configuration for stateful streaming at
    scale.  The default HDFS-backed provider keeps all state as JVM heap
    objects — at 100 TB-pipeline key cardinalities that is an OOM, not a
    tuning problem.  RocksDB keeps state off-heap/on-disk per partition:

    - ``changelogCheckpointing`` writes per-batch deltas instead of
      re-uploading full RocksDB snapshots every commit (bounds checkpoint
      I/O by state CHANGED, not state HELD);
    - ``boundedMemoryUsage`` caps the total block-cache+memtable budget
      across all state partitions on an executor, so state pressure spills
      to local disk instead of evicting the executor.

    Returns plain conf k/v so callers can apply it per-session (these are
    runtime-settable) or bake it into spark-submit."""
    confs = {
        "spark.sql.streaming.stateStore.providerClass": ROCKSDB_PROVIDER,
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": str(
            changelog_checkpointing
        ).lower(),
    }
    if bounded_memory_mb is not None:
        confs["spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage"] = "true"
        confs["spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB"] = str(bounded_memory_mb)
    return confs


@contextmanager
def state_store_confs(spark: SparkSession, confs: dict[str, str]):
    """Apply state-store confs for the duration of a block, restoring the
    previous values after — streaming queries capture the conf at start, so
    scoping avoids leaking the provider choice into unrelated queries in a
    shared session (tests, notebooks)."""
    prev: dict[str, str | None] = {}
    for k, v in confs.items():
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
        spark.conf.set(k, v)
    try:
        yield spark
    finally:
        for k, old in prev.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)


def stateful_dedup(
    stream: DataFrame,
    key_col: str,
    out_schema: T.StructType,
    timeout_ms: int | None = None,
) -> DataFrame:
    """Emit each key's rows only until the key is first seen; afterwards the
    key is swallowed for as long as its state lives.

    ``out_schema`` must match the input row schema (pass-through operator).
    With ``timeout_ms`` set, a key's memory expires after that processing-
    time idle period (bounded state at 100 TB; the dedup horizon contract).
    """

    def dedup(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        seen = state.exists
        if not seen:
            first_emitted = False
            for pdf in pdfs:
                if not first_emitted and len(pdf) > 0:
                    yield pdf.iloc[:1]
                    first_emitted = True
            if first_emitted:
                state.update((True,))
                if timeout_ms is not None:
                    state.setTimeoutDuration(timeout_ms)
        else:
            for _ in pdfs:  # drain
                pass
            if timeout_ms is not None:
                state.setTimeoutDuration(timeout_ms)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if timeout_ms is not None else GroupStateTimeout.NoTimeout
    )
    return stream.groupBy(key_col).applyInPandasWithState(
        dedup,
        outputStructType=out_schema,
        stateStructType=T.StructType([T.StructField("seen", T.BooleanType())]),
        outputMode="append",
        timeoutConf=timeout,
    )


def stateful_running_agg(
    stream: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key cumulative (count, sum) emitted on every appearance of the
    key — the state-store-backed running aggregate."""
    out_schema = T.StructType(
        [
            T.StructField(key_col, T.LongType()),
            T.StructField("running_count", T.LongType()),
            T.StructField("running_sum", T.DoubleType()),
        ]
    )

    def acc(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        count, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            count += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((count, total))
        yield pd.DataFrame({key_col: [key[0]], "running_count": [count], "running_sum": [total]})

    return stream.groupBy(key_col).applyInPandasWithState(
        acc,
        outputStructType=out_schema,
        stateStructType=T.StructType(
            [T.StructField("count", T.LongType()), T.StructField("total", T.DoubleType())]
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
