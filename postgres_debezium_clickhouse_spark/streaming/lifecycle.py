"""Streaming lifecycle semantics: snapshot→stream handoff (T5), heartbeat /
liveness observability (T6), and the registry-driven multi-table pipeline
(S4/S5/S10).

Reference behavior mirrored:
- ``snapshot.mode=initial`` (debezium-pg-connector.json:18): one consistent
  full read — every row emitted with ``op='r'`` and ``snapshot:"first"``
  markers (value.json:830) — then continuous WAL streaming.  The engine's
  handoff: run the snapshot through the SAME latest-wins merge as the
  stream, so ``op='r'`` rows are ordinary upserts and replays/overlaps at
  the boundary cannot double-count (SURVEY §2.9 T5).
- ``heartbeat.interval.ms`` (debezium-pg-connector.json:15) + connector
  ``/status`` polling (start-high-volume-cdc.sh:65): a
  ``StreamingQueryListener`` exposing per-query progress/liveness.
- ``table.include.list`` (abcsvb-connector-secure.json:57): the schema
  registry (schemas.TABLE_REGISTRY) drives which tables get pipelines.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQueryListener

from ..operators.upsert import apply_cdc


def snapshot_then_stream(
    snapshot: DataFrame,
    stream_events: DataFrame,
    keys: list[str],
    version_col: str = "ts_ms",
    tiebreak_col: str | None = "offset",
    delete_mode: str = "drop",
) -> DataFrame:
    """T5 — consistent snapshot + change stream → current state, with a
    replay-safe boundary.

    ``snapshot`` rows must carry ``op='r'`` and the snapshot version (the
    source ts_ms at snapshot time); ``stream_events`` any mix of c/u/d.
    Because both sides flow through ONE latest-wins merge keyed on
    ``keys``/(version, tiebreak), events that were captured both in the
    snapshot and the early stream (the at-least-once overlap window) collapse
    instead of double-applying — the property the reference gets from
    ReplacingMergeTree(ts_ms) (clickhouse.sql:51).
    """
    events = snapshot.unionByName(stream_events, allowMissingColumns=True)
    return apply_cdc(
        events,
        keys=keys,
        version_col=version_col,
        tiebreak_col=tiebreak_col,
        delete_mode=delete_mode,
    )


@dataclass
class HeartbeatListener(StreamingQueryListener):
    """T6 — liveness tracking: last-progress wall clock + rows/sec per query
    (the ``heartbeat.interval.ms`` + ``/status`` endpoint equivalent).

    Attach with ``spark.streams.addListener(listener)``; read
    ``listener.status(name)`` from monitoring code.
    """

    progress: dict[str, dict] = field(default_factory=dict)
    started: dict[str, float] = field(default_factory=dict)
    terminated: dict[str, str | None] = field(default_factory=dict)

    def onQueryStarted(self, event) -> None:
        self.started[event.name or event.id] = time.time()

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self.progress[p.name or p.id] = {
            "ts": time.time(),
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "rows_per_sec": p.processedRowsPerSecond,
        }

    def onQueryTerminated(self, event) -> None:
        self.terminated[str(event.id)] = event.exception

    def onQueryIdle(self, event) -> None:
        pass

    def status(self, name: str, stale_after_s: float = 60.0) -> dict:
        """Connector-/status-style summary: RUNNING / STALE / UNKNOWN."""
        p = self.progress.get(name)
        if p is None:
            return {"state": "UNKNOWN"}
        age = time.time() - p["ts"]
        return {
            "state": "STALE" if age > stale_after_s else "RUNNING",
            "last_progress_age_s": age,
            **p,
        }


def observe_counts(df: DataFrame, name: str = "metrics") -> DataFrame:
    """A4 — row-count observability on any (batch or streaming) DataFrame:
    metrics surface in ``StreamingQueryProgress.observedMetrics`` / the
    QueryExecutionListener, the Kafka-UI row-count monitoring equivalent
    (docker-compose.yml:31-46)."""
    from pyspark.sql import functions as F

    return df.observe(name, F.count(F.lit(1)).alias("n_rows"))


def tables_to_capture(
    registry: dict[str, dict],
    include: list[str] | None = None,
    exclude: list[str] | None = None,
) -> dict[str, dict]:
    """S5 — ``table.include.list`` semantics over the schema registry
    (abcsvb-connector-secure.json:57: only listed tables are captured;
    include wins over exclude, matching Debezium's precedence rule)."""
    if include is not None:
        return {t: spec for t, spec in registry.items() if t in include}
    if exclude is not None:
        return {t: spec for t, spec in registry.items() if t not in exclude}
    return dict(registry)
