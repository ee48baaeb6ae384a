"""Debezium envelope schemas and the per-table schema registry.

The reference ships the envelope contract as captured sample messages
(basic_example/value.json:760-842 payload, basic_example/key.json:2-17 key).
Every CDC message is ``{schema, payload:{before, after, source, op, ts_ms,
transaction}}``; the secure connector strips the self-describing ``schema``
block (abcsvb-connector-secure.json:27-30 ``schemas.enable=false``), so the
engine treats the schema as a *registered constant* per table — exactly what
these StructTypes are.

Type-mapping decisions mirrored from the reference connectors:
- decimals arrive as STRINGS (``decimal.handling.mode=string``,
  basic_example/debezium-pg-connector.json:19) and are cast downstream,
  mirroring ``toFloat64(price)`` (basic_example/clickhouse.sql:76);
- timestamps arrive as int64 MICROSECONDS since epoch
  (``io.debezium.time.MicroTimestamp``, value.json:93-99 and the
  ``created_datetime: 1724118407326449`` sample at value.json:780);
- ``op`` ∈ {c,u,d,r} (value.json:721-725,839), ``source.ts_ms`` is the
  version used for latest-wins conflict resolution (clickhouse.sql:51).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Envelope building blocks
# ---------------------------------------------------------------------------

#: payload.source — subset of Debezium's source block that the reference
#: actually consumes (value.json:647-720; ts_ms read at clickhouse.sql:66).
SOURCE_STRUCT = T.StructType(
    [
        T.StructField("version", T.StringType()),
        T.StructField("connector", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("snapshot", T.StringType()),
        T.StructField("db", T.StringType()),
        T.StructField("schema", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("txId", T.LongType()),
        T.StructField("lsn", T.LongType()),
    ]
)

#: payload.transaction — present when provide.transaction.metadata=true
#: (abcsvb-connector-secure.json:50; value.json:731-754).
TRANSACTION_STRUCT = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("total_order", T.LongType()),
        T.StructField("data_collection_order", T.LongType()),
    ]
)


def envelope_schema(row_schema: T.StructType) -> T.StructType:
    """Full Debezium payload envelope for a table with ``row_schema`` rows.

    Matches value.json:760-842: ``{payload: {before, after, source, op,
    ts_ms, transaction}}``.  We model the *payload* level only — the
    embedded Kafka-Connect ``schema`` block (value.json:2-759) is config we
    pre-register, not data we parse.
    """
    payload = T.StructType(
        [
            T.StructField("before", row_schema),
            T.StructField("after", row_schema),
            T.StructField("source", SOURCE_STRUCT),
            T.StructField("op", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("transaction", TRANSACTION_STRUCT),
        ]
    )
    return T.StructType([T.StructField("payload", payload)])


def pruned_envelope(
    row_schema: T.StructType,
    *,
    after: list[str] | None = None,
    before: list[str] | tuple = (),
    source: list[str] | tuple = ("ts_ms",),
    op: bool = True,
    ts_ms: bool = False,
    transaction: bool = False,
) -> T.StructType:
    """Envelope schema pruned to exactly the fields one query consumes.

    Catalyst's JSON expression optimization cannot prune ``from_json`` here:
    the parsed column is referenced by several downstream expressions, so
    CollapseProject keeps the parse in its own Project and the
    GetStructField-over-from_json pattern the rule rewrites never forms
    (verified on the optimized plan — the full envelope survived).  Parsing
    with an explicitly pruned StructType makes Jackson *skip* the unused
    subtrees (``before`` images, 9 of 10 ``source`` fields, ``transaction``)
    instead of converting them — measured ~20% of flagship-query CPU at
    sf0.1 (BASELINE.md r7 note).

    ``after``/``before`` list field names from ``row_schema`` (None = all
    fields, empty = omit the struct entirely); ``source`` prunes
    SOURCE_STRUCT the same way.  Field order always follows the registered
    schema so results are bit-identical to the full parse.
    """

    def _sub(names, base: T.StructType):
        if names is None:
            return base
        keep = set(names)
        if not keep:
            return None
        missing = keep - {f.name for f in base.fields}
        if missing:
            raise ValueError(f"unknown envelope fields: {sorted(missing)}")
        return T.StructType([f for f in base.fields if f.name in keep])

    fields = []
    b = _sub(before, row_schema)
    if b is not None:
        fields.append(T.StructField("before", b))
    a = _sub(after, row_schema)
    if a is not None:
        fields.append(T.StructField("after", a))
    s = _sub(source, SOURCE_STRUCT)
    if s is not None:
        fields.append(T.StructField("source", s))
    if op:
        fields.append(T.StructField("op", T.StringType()))
    if ts_ms:
        fields.append(T.StructField("ts_ms", T.LongType()))
    if transaction:
        fields.append(T.StructField("transaction", TRANSACTION_STRUCT))
    return T.StructType([T.StructField("payload", T.StructType(fields))])


def key_schema(key_fields: list[tuple[str, T.DataType]]) -> T.StructType:
    """Kafka message key: PK struct (key.json:15-17 ``{"id": 4}``)."""
    payload = T.StructType([T.StructField(n, t) for n, t in key_fields])
    return T.StructType([T.StructField("payload", payload)])


# ---------------------------------------------------------------------------
# Table registry (schema regime 1: fixed, declared — SURVEY §1.2)
# ---------------------------------------------------------------------------

#: products row as it crosses the wire — mirrors
#: basic_example/init_postgresql_data.sql:11-20 with Debezium's wire types:
#: NUMERIC(10,2) price → string, TIMESTAMPTZ → µs-epoch long.
PRODUCTS_ROW = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("price", T.StringType()),  # decimal.handling.mode=string
        T.StructField("category", T.StringType()),
        T.StructField("stock_quantity", T.IntegerType()),
        T.StructField("created_at", T.LongType()),  # MicroTimestamp
        T.StructField("updated_at", T.LongType()),  # MicroTimestamp
    ]
)

#: orders-table CDC row used by the synthetic generator over the driver
#: fixtures (sources/cdc.py) — same wire conventions as PRODUCTS_ROW.
ORDERS_CDC_ROW = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.StringType()),  # decimal-as-string
        T.StructField("o_orderdate", T.LongType()),  # MicroTimestamp
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

#: customer-table CDC row (PII masking target — abcsvb-connector-secure.json:36).
CUSTOMER_CDC_ROW = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.StringType()),  # decimal-as-string
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

ORDERS_ENVELOPE = envelope_schema(ORDERS_CDC_ROW)
CUSTOMER_ENVELOPE = envelope_schema(CUSTOMER_CDC_ROW)
PRODUCTS_ENVELOPE = envelope_schema(PRODUCTS_ROW)

#: registry: table name → (row schema, primary-key columns, version column)
#: — the engine-side analogue of the Debezium table.include.list + the
#: ClickHouse ORDER BY/version declarations (clickhouse.sql:51-52).
TABLE_REGISTRY: dict[str, dict] = {
    "orders": {"row": ORDERS_CDC_ROW, "keys": ["o_orderkey"], "version": "ts_ms"},
    "customer": {"row": CUSTOMER_CDC_ROW, "keys": ["c_custkey"], "version": "ts_ms"},
    "products": {"row": PRODUCTS_ROW, "keys": ["id"], "version": "ts_ms"},
}

#: object-store typed event row (minio_cdc_example/clickhouse_minio.sql:14-26:
#: ``id Int64, message String, timestamp DateTime``).
MINIO_EVENT_ROW = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("message", T.StringType()),
        T.StructField("timestamp", T.TimestampType()),
    ]
)
