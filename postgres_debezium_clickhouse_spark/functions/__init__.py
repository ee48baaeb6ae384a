"""Scalar / JSON / time helper functions (SURVEY §2.3, F1-F17).

Thin, named wrappers over ``pyspark.sql.functions`` so that every scalar the
reference uses has a greppable, tested equivalent.  All of these stay
JVM-side (whole-stage codegen) — no Python UDFs.

Reference functions mirrored (file:line into /root/reference/):
- JSONExtractString / JSONExtractInt / JSONHas —
  basic_example/clickhouse.sql:59-66, basic_example/init.sql:54-63
- toInt32 / toFloat64 — clickhouse.sql:72,76
- toDateTime64(trimRight(x,'Z'), 6, 'UTC') — clickhouse.sql:77-78
- now() DEFAULT — large_dbtable_example/init_clickhouse_raw_tables.sql:34
- gen_random_uuid / random / round / interval arithmetic / CASE enums —
  basic_example/init_postgresql_data.sql:40,121-149
- MicroTimestamp (µs epoch int64) — basic_example/value.json:93-99,780
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "json_extract_string",
    "json_extract_long",
    "json_has",
    "json_extract_struct",
    "eval_once_barrier",
    # count_rows_keeping is deliberately NOT exported (ADVICE r18): its
    # contract is count-columns-only — see its docstring
    "to_int32",
    "to_float64",
    "to_datetime64",
    "trim_right",
    "ingestion_now",
    "gen_uuid",
    "rand_int",
    "round2",
    "ts_minus_random_days",
    "enum_by_bucket",
    "micros_to_ts",
    "ts_to_micros",
]


def _json_path(*path: str) -> str:
    return "$." + ".".join(path)


def json_extract_string(col: Column | str, *path: str) -> Column:
    """F1 — ClickHouse ``JSONExtractString(v, 'payload','after','id')``
    (clickhouse.sql:59-65) → ``get_json_object(v, '$.payload.after.id')``."""
    return F.get_json_object(F.col(col) if isinstance(col, str) else col, _json_path(*path))


def json_extract_long(col: Column | str, *path: str) -> Column:
    """F2 — ``JSONExtractInt(v, 'payload','source','ts_ms')``
    (clickhouse.sql:66) with 64-bit semantics."""
    return json_extract_string(col, *path).cast("long")


def json_has(col: Column | str, *path: str) -> Column:
    """F3 — ``JSONHas(v, 'payload', 'after')`` (init.sql:63): the reference
    uses this to drop deletes/tombstones/malformed messages."""
    return json_extract_string(col, *path).isNotNull()


def json_extract_struct(col: Column | str, partial_schema) -> Column:
    """F1-F3, scale path — extract MANY paths with ONE parse.

    Each ``get_json_object`` call re-parses the whole JSON string, so a
    projection with k extractions does k parses per row — the dominant cost
    on wide CDC messages (measured 5× slower than parse-once on the bench).
    This helper is still schema-on-read (callers declare only the paths they
    want, not the registered table schema): PERMISSIVE ``from_json`` with a
    partial StructType parses once and prunes everything else.  Use this
    whenever extracting ≥2 paths from the same string.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.from_json(c, partial_schema)


def eval_once_barrier(df, col_name: str):
    """r18-opt (guide §4.4's duplication, for built-in expressions) —
    re-emit a derived column through a one-element explode so a downstream
    filter on it cannot be pushed below the projection that computes it.

    Catalyst pushes any deterministic filter through a Project by
    substituting the alias's defining expression — a filter on a
    ``from_json``-derived column therefore re-evaluates the WHOLE parse in
    the pushed-down Filter (seen live in the executed
    ``cdc_json_extract_path`` plan: two Jackson parses per row, the
    dominant cost of the query).  Built-ins cannot be marked
    non-deterministic the way UDFs can, but filters on a GENERATED column
    cannot cross the Generate, so ``explode(array(col))`` pins exactly one
    evaluation.  A 1-element array explode is row-preserving (nulls ride
    the array) and value-identical; filters on OTHER columns still push
    through a Generate, so scan pushdown for non-derived predicates is
    unaffected.  Same idiom as ``similarity.with_ivf_cell``'s argmin."""
    return df.withColumn(col_name, F.explode(F.array(F.col(col_name))))


def count_rows_keeping(col: Column | str) -> Column:
    """r18-opt (guide §2.4 remove shuffles outright) — ``count(1)``
    spelled so ``col`` stays a required input of the aggregation.

    CONTRACT (ADVICE r18 — not a general row counter): ``col`` MUST be a
    count-typed column that is never NULL and never −1 (grouped
    ``count(...)`` outputs are always ≥ 1).  Passed anything nullable or
    −1-valued it silently UNDERCOUNTS.  It is intentionally absent from
    ``__all__``; use it only for the exchange-reuse alignment pattern
    below, inside this package.

    Sibling aggregations fanning out from one shared table only share a
    single shuffle stage (AQE exchange reuse) when every branch's copy
    of that table canonicalizes identically.  A plain ``count(1)`` lets
    the optimizer drop the parent's count column in count-only branches
    (column pruning, then RemoveRedundantAggregates collapses the chain
    into a per-branch distinct), so each branch plans a DIFFERENT
    subtree and re-reads and re-aggregates the source from scratch.
    Counting ``nullif(col, -1)`` is the same row count whenever ``col``
    is a count column (always >= 1: never null, never -1), but the
    optimizer cannot prove the nullif non-null — a bare
    ``count(non-null col)`` is rewritten straight back to ``count(1)``
    — so ``col`` stays required and the shared subtree stays
    canonically identical across branches."""
    c = F.col(col) if isinstance(col, str) else col
    return F.count(F.nullif(c, F.lit(-1).cast("long")))


def to_int32(col: Column | str) -> Column:
    """F4 — ``toInt32(id)`` (clickhouse.sql:72)."""
    return (F.col(col) if isinstance(col, str) else col).cast("int")


def to_float64(col: Column | str) -> Column:
    """F5 — ``toFloat64(price)`` (clickhouse.sql:76); the decimal-as-string
    → numeric cast (decimal.handling.mode=string,
    debezium-pg-connector.json:19)."""
    return (F.col(col) if isinstance(col, str) else col).cast("double")


def trim_right(col: Column | str, ch: str) -> Column:
    """F7 — ``trimRight(s, 'Z')`` (clickhouse.sql:77-78).

    regexp_replace rather than rtrim: pyspark's two-arg rtrim argument order
    has differed across versions, the regex form is unambiguous.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, f"[{ch}]+$", "")


def to_datetime64(col: Column | str) -> Column:
    """F6+F7 — ``toDateTime64(trimRight(created_at,'Z'), 6, 'UTC')``
    (clickhouse.sql:77-78): ISO-8601-with-Z string → µs-precision timestamp
    (session tz is pinned UTC in session.py)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_timestamp(trim_right(c, "Z"))


def ingestion_now() -> Column:
    """F8 — ``ingestion_time DateTime DEFAULT now()``
    (init_clickhouse_raw_tables.sql:34)."""
    return F.current_timestamp()


def gen_uuid() -> Column:
    """F10 — ``gen_random_uuid()`` (init_postgresql_data.sql:40)."""
    return F.expr("uuid()")


def rand_int(n: int, seed: int | None = None) -> Column:
    """F11 — ``floor(random()*n)+1`` (init_postgresql_data.sql:121-125)."""
    r = F.rand(seed) if seed is not None else F.rand()
    return (F.floor(r * n) + 1).cast("int")


def round2(col: Column | str) -> Column:
    """F12 — ``round(x::NUMERIC, 2)`` (init_postgresql_data.sql:131)."""
    return F.round(F.col(col) if isinstance(col, str) else col, 2)


def ts_minus_random_days(col: Column | str, days: int, seed: int = 42) -> Column:
    """F13 — ``NOW() - (random() * INTERVAL '730 days')``
    (init_postgresql_data.sql:134)."""
    c = F.col(col) if isinstance(col, str) else col
    secs = (F.rand(seed) * F.lit(days * 86400)).cast("long")
    return F.timestamp_add("SECOND", -secs, c)


def enum_by_bucket(bucket: Column, mapping: dict[int, str], default: str) -> Column:
    """F14 — ``CASE floor(random()*10) WHEN 0 THEN 'pending' … END``
    (init_postgresql_data.sql:137-142) as a when-chain."""
    out: Column | None = None
    for k, v in mapping.items():
        cond = bucket == k
        out = F.when(cond, v) if out is None else out.when(cond, v)
    assert out is not None
    return out.otherwise(default)


def micros_to_ts(col: Column | str) -> Column:
    """F17 — Debezium MicroTimestamp int64 µs → timestamp
    (value.json:96-99; sample 1724118407326449 at value.json:780).

    Returned as TIMESTAMP_NTZ: the engine pins the session to UTC
    (session.py), so NTZ wall time ≡ UTC instant, and NTZ is what parquet
    fixture scans produce — keeping one timestamp type across the engine.
    """
    return F.timestamp_micros(F.col(col) if isinstance(col, str) else col).cast("timestamp_ntz")


def ts_to_micros(col: Column | str) -> Column:
    """Inverse of F17 — timestamp → µs epoch (used by the synthetic envelope
    generator to produce wire-format values).  Accepts TIMESTAMP or
    TIMESTAMP_NTZ (NTZ is interpreted in the UTC session zone)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))
