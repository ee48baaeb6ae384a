"""CDC pipeline queries — the reference's flagship path as Spark plans.

Pipeline shape (SURVEY §3.1): synthetic Debezium envelope log → PERMISSIVE
parse → existence filter → latest-wins versioned dedup → typed casts.  This
reproduces, end-to-end, ClickHouse's

    Kafka engine table → MV(JSONExtract*) → ReplacingMergeTree(ts_ms)
    → SELECT ... FINAL  (basic_example/clickhouse.sql:10-82)

Every query here has a DuckDB oracle that reconstructs the same final state
in pure SQL from the orders/customer fixtures — possible because the event
generator (sources/cdc.py) is deterministic.

Scale notes: the dedup shuffle hashes on the table key only; dimension-free.
The parse + projection stages are narrow (no shuffle).  At 100 TB the same
plan applies per-table; AQE handles key skew (session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import (
    eval_once_barrier,
    json_extract_struct,
    micros_to_ts,
    to_float64,
)
from ..operators.transforms import mask_fields, unwrap_envelope
from ..operators.upsert import apply_cdc
from ..schemas import (
    CUSTOMER_ENVELOPE,
    ORDERS_CDC_ROW,
    ORDERS_ENVELOPE,
    pruned_envelope,
)
from ..sources.cdc import (
    bronze_projection,
    customer_cdc_events,
    orders_cdc_events,
    parse_envelope,
)

# ---------------------------------------------------------------------------
# Spark queries
# ---------------------------------------------------------------------------

import pyspark.sql.types as _T

#: pruned parse schemas (r7): Catalyst cannot prune from_json here (the
#: parsed column feeds several expressions, so the Project never collapses
#: into the GetStructField-over-from_json shape OptimizeJsonExprs rewrites —
#: verified on the optimized plan), so each query declares exactly the
#: envelope subtree it consumes and Jackson skips the rest.  Results are
#: bit-identical to the full-envelope parse (same oracle hashes).
_ENV_CURRENT = pruned_envelope(
    ORDERS_CDC_ROW, after=None, before=["o_orderkey"], source=["ts_ms"]
)
_ENV_STATUS_PRICE = pruned_envelope(
    ORDERS_CDC_ROW,
    after=["o_orderkey", "o_orderstatus", "o_totalprice"],
    before=["o_orderkey", "o_orderstatus", "o_totalprice"],
    source=["ts_ms"],
)


def _orders_parsed(
    spark: SparkSession, sf_dir: str, envelope: _T.StructType = ORDERS_ENVELOPE
) -> DataFrame:
    return parse_envelope(orders_cdc_events(spark, sf_dir), envelope)


def cdc_current_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: typed, deduplicated current state of ``orders`` — the
    ``products_usable_vw`` equivalent (clickhouse.sql:70-82).

    Exercises S1 (static shape), P2, P3, W1, W2, S8, T3, T4(drop), F5, F17.
    """
    p = F.col("j.payload")
    events = _orders_parsed(spark, sf_dir, _ENV_CURRENT).select(
        F.coalesce(p.after.o_orderkey, p.before.o_orderkey).alias("o_orderkey"),
        p.after.o_custkey.alias("o_custkey"),
        p.after.o_orderstatus.alias("o_orderstatus"),
        p.after.o_totalprice.alias("o_totalprice_str"),
        p.after.o_orderdate.alias("o_orderdate_us"),
        p.after.o_orderpriority.alias("o_orderpriority"),
        p.op.alias("op"),
        p.source.ts_ms.alias("ts_ms"),
        F.col("offset"),
    )
    merged = apply_cdc(
        events, keys=["o_orderkey"], version_col="ts_ms", tiebreak_col="offset", delete_mode="drop"
    )
    return merged.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        to_float64("o_totalprice_str").alias("o_totalprice"),
        micros_to_ts("o_orderdate_us").alias("o_orderdate"),
        "o_orderpriority",
        "op",
        "ts_ms",
    )


def cdc_json_extract_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The JSONExtract* route (F1-F3) mirroring products_final_mv
    (clickhouse.sql:57-68) + init.sql:63's JSONHas filter: deletes are
    DROPPED BEFORE dedup, so deleted keys keep their last non-delete image —
    deliberately different semantics from cdc_current_state (basic path).

    Schema-on-read via ``json_extract_struct``: declares only the four paths
    it wants (not the registered envelope) and parses each message ONCE —
    repeated ``get_json_object`` would re-parse per extraction (measured 5×
    slower; see functions.json_extract_struct)."""
    import pyspark.sql.types as T

    partial = T.StructType([T.StructField("payload", T.StructType([
        T.StructField("after", T.StructType([
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.StringType()),
        ])),
        T.StructField("source", T.StructType([T.StructField("ts_ms", T.LongType())])),
    ]))])
    raw = orders_cdc_events(spark, sf_dir)
    x = F.col("x")
    flat = (
        # eval_once_barrier: without it the JSONHas filter is pushed below
        # the projection and the whole from_json runs TWICE per row (seen
        # in the executed plan; the parse is this query's dominant cost)
        eval_once_barrier(raw.withColumn("x", json_extract_struct("value", partial)), "x")
        .filter(x.getField("payload").getField("after").isNotNull())  # JSONHas
        .select(
            x["payload"]["after"]["o_orderkey"].alias("o_orderkey"),
            x["payload"]["after"]["o_orderstatus"].alias("o_orderstatus"),
            to_float64(x["payload"]["after"]["o_totalprice"]).alias("o_totalprice"),
            x["payload"]["source"]["ts_ms"].alias("ts_ms"),
            F.lit("x").alias("op"),
            F.col("offset"),
        )
    )
    merged = apply_cdc(
        flat, keys=["o_orderkey"], version_col="ts_ms", tiebreak_col="offset", delete_mode="drop",
        op_col="op",
    )
    return merged.select("o_orderkey", "o_orderstatus", "o_totalprice", "ts_ms")


def cdc_rewrite_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete rewrite mode (T4): tombstones survive as ``__deleted=true``
    rows with the ``before`` image (delete.handling.mode=rewrite,
    abcsvb-connector-secure.json:33-34)."""
    p = F.col("j.payload")
    ev = _orders_parsed(spark, sf_dir, _ENV_STATUS_PRICE).select(
        F.coalesce(p.after.o_orderkey, p.before.o_orderkey).alias("o_orderkey"),
        F.when(p.op == "d", p.before.o_orderstatus).otherwise(p.after.o_orderstatus).alias("o_orderstatus"),
        to_float64(
            F.when(p.op == "d", p.before.o_totalprice).otherwise(p.after.o_totalprice)
        ).alias("o_totalprice"),
        p.op.alias("op"),
        p.source.ts_ms.alias("ts_ms"),
        F.col("offset"),
    )
    merged = apply_cdc(
        ev, keys=["o_orderkey"], version_col="ts_ms", tiebreak_col="offset", delete_mode="rewrite"
    )
    return merged.select("o_orderkey", "o_orderstatus", "o_totalprice", "__deleted")


def cdc_changed_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r14 — Debezium's ``ExtractChangedRecordState`` SMT
    (io.debezium.transforms.ExtractChangedRecordState): for every
    update event, the set of columns whose before/after images differ
    — the audit surface the SMT emits as headers.  Computed
    GENERICALLY like the SMT (iterate the row schema, null-safe
    compare each field's wire value), then aggregated into the
    which-columns-actually-change histogram a pipeline operator reads.

    The fixture's closed form: update-1 (+100.0, status→'U') changes
    o_totalprice always and o_orderstatus iff the original status
    wasn't already 'U'; update-2 ('U'→'V') changes both always; the
    other four columns never change — so the oracle is exact counts
    over the orders fixture (×2 for the duplicate deliveries, which
    are distinct EVENTS and counted as such).

    Plan: narrow parse + map-side array build + one explode and one
    hash agg on a ≤|schema|-cardinality key.  No joins."""
    p = F.col("j.payload")
    ev = _orders_parsed(spark, sf_dir).filter(p.op == "u")
    fields = [f.name for f in ORDERS_CDC_ROW.fields]
    changed = F.array_compact(
        F.array(*[
            F.when(
                ~p.after.getField(f).eqNullSafe(p.before.getField(f)),
                F.lit(f),
            )
            for f in fields
        ])
    )
    return (
        ev.select(F.explode(changed).alias("column_name"))
        .groupBy("column_name")
        .agg(F.count(F.lit(1)).cast("long").alias("n_changes"))
    )


def cdc_content_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r14 — Debezium's ``ContentBasedRouter`` SMT
    (io.debezium.transforms.ContentBasedRouter): re-route each record
    by an expression over the PAYLOAD (the docs' canonical example
    routes on ``value.op``), not the table name — the complement of
    cdc_multiplex_route's topic/table routing.  Routing rule here, a
    typical ops split: deletes → ``tombstone``; surviving events whose
    after-image total is ≥ 200,000 → ``high-value``; else
    ``default``.  Output is the per-route event histogram.

    The oracle is a pure closed form over the orders fixture (the
    generator's event multiplicities: snapshot ×1 per row, update-1
    ×2 at +100 for keys % 3 = 0, update-2 ×2 at +200 for keys % 9 =
    0, delete ×1 for keys % 7 = 0) — a mis-routed op class or a
    wrong string→double wire parse shifts a bucket and
    hash-mismatches.

    Plan: pruned parse → map-side CASE → one hash agg on a 3-value
    key.  No joins; the cost of reading the stream once."""
    p = F.col("j.payload")
    env = pruned_envelope(
        ORDERS_CDC_ROW, after=["o_totalprice"], before=None, source=None
    )
    ev = _orders_parsed(spark, sf_dir, env).select(
        p.op.alias("op"),
        to_float64(p.after.o_totalprice).alias("total"),
    )
    route = (
        F.when(F.col("op") == "d", F.lit("tombstone"))
        .when(F.col("total") >= 200000.0, F.lit("high-value"))
        .otherwise(F.lit("default"))
    )
    return (
        ev.select(route.alias("route"))
        .groupBy("route")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )


def cdc_timezone_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — Debezium's ``TimezoneConverter`` SMT
    (io.debezium.transforms.TimezoneConverter, shipped in the
    reference's own Debezium 2.4): re-render the ZonedTimestamp field
    the products feed carries (``created_at``, ISO-8601-with-Z — the
    exact input of the reference's ``toDateTime64(trimRight(created_at,
    'Z'), 6, 'UTC')`` cast, clickhouse.sql:77-78) at the deploy
    locale's fixed offset ``+07:00``.  Same instant, different
    rendering: the oracle reconstructs BOTH strings from the part
    fixture's closed form, so a wrong shift, a dropped microsecond
    field, or an instant change all hash-mismatch.

    Plan: pruned parse → map-only convert (cast + interval + format).
    No joins, no shuffle; fuses into the wire-log scan."""
    from ..operators.transforms import timezone_convert_fields
    from ..sources.cdc import PRODUCTS_WIRE_ROW, products_cdc_events

    env = pruned_envelope(
        PRODUCTS_WIRE_ROW, after=["id", "created_at"], before=None,
        source=["ts_ms"],
    )
    p = F.col("j.payload")
    ev = (
        # barrier: the existence filter would otherwise duplicate the parse
        eval_once_barrier(parse_envelope(products_cdc_events(spark, sf_dir), env), "j")
        .filter(p.after.isNotNull())
        .select(
            p.after["id"].cast("int").alias("id"),
            p.op.alias("op"),
            p.source.ts_ms.alias("ts_ms"),
            p.after["created_at"].alias("created_at_utc"),
            p.after["created_at"].alias("created_at"),
        )
    )
    conv = timezone_convert_fields(ev, ["created_at"], "+07:00")
    return conv.select(
        "id", "op", "ts_ms", "created_at_utc",
        F.col("created_at").alias("created_at_bkk"),
    )


def cdc_partition_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — Debezium's ``PartitionRouting`` SMT
    (io.debezium.transforms.partitions.PartitionRouting): target
    partition = hash(payload fields) mod partition count — how
    operators pin one entity's events to one partition so per-key
    ordering survives repartitioned topics.  The reference keeps
    partition lineage as a first-class column end-to-end
    (init_logtrans.sql:35, init_clickhouse_raw_tables.sql:32); this
    SMT is the control knob for it.  Routed here by ``o_custkey``
    (after image, before image for deletes) into 16 partitions; output
    is the per-partition event histogram plus distinct-key counts.

    The oracle replays the generator's event-multiplicity closed form
    (×1 snapshot, ×2 update-1 on %3 keys, ×2 update-2 on %9, ×1 delete
    on %7) and the md5-portable bucket recipe bit-for-bit — a single
    mis-hashed or mis-imaged event shifts a bucket and mismatches.

    Plan: pruned parse → map-side hash → one agg on a 16-value key."""
    from ..operators.transforms import partition_route

    env = pruned_envelope(
        ORDERS_CDC_ROW, after=["o_custkey"], before=["o_custkey"],
        source=None,
    )
    p = F.col("j.payload")
    ev = _orders_parsed(spark, sf_dir, env).select(
        F.coalesce(p.after.o_custkey, p.before.o_custkey).alias("o_custkey")
    )
    routed = partition_route(ev, ["o_custkey"], 16)
    return routed.groupBy("target_partition").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("o_custkey").cast("long").alias("n_keys"),
    )


def cdc_header_to_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — Debezium's ``HeaderToValue`` SMT
    (io.debezium.transforms.HeaderToValue): move named Kafka record
    HEADERS into the value (``headers.list`` → ``fields.list``,
    ``operation=move``).  The generator's r15 header plane carries
    ``src_region`` (key-derived), ``evt_seq`` (event-class slot) and a
    ``trace`` id; the query moves the first two into the value and
    leaves ``trace`` header-side — so the output checks BOTH the moved
    values and the move's selectivity (exactly one header left).

    The oracle reconstructs every event's offset from the generator
    multiplicities (the cdc_multiplex_route closed form) and re-derives
    both header values — per-event rows, full value hash.

    Plan: map-only (element_at + map_filter) on the record scan; no
    parse of the JSON value is even needed — headers are a separate
    plane, exactly why the SMT exists."""
    from ..operators.transforms import header_to_value

    rec = orders_cdc_events(spark, sf_dir)
    moved = header_to_value(
        rec, ["src_region", "evt_seq"], operation="move"
    )
    return moved.select(
        F.col("offset").cast("long").alias("offset"),
        "src_region",
        F.col("evt_seq").cast("long").alias("evt_seq"),
        F.size("headers").cast("int").alias("n_headers_left"),
    )


def cdc_header_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — Kafka Connect's ``InsertHeader`` + ``DropHeaders`` SMT pair
    (org.apache.kafka.connect.transforms.InsertHeader / DropHeaders):
    the standard trust-boundary chain — stamp every record with a
    static provenance header (``header=pipeline``,
    ``value.literal=cdc-poc``), then scrub the internal headers
    (``headers=trace,evt_seq`` plus one absent name, pinning the
    no-op contract) before records leave the cluster.  The reference
    persists exactly this kind of pipeline lineage as first-class
    columns in its raw archive (init_clickhouse_raw_tables.sql:28-48);
    header SMTs are how Connect operators carry it without touching
    the value.

    The output checks all three planes: the inserted literal, the
    surviving generator header (``src_region``, key-derived), and the
    exact post-scrub key set (``array_sort(map_keys)``) — a leaked
    ``trace`` or a dropped ``src_region`` mismatches every row.

    Plan: map-only (map_filter + map_concat) on the record scan; no
    value parse, no shuffle — at 100 TB this chain rides the scan."""
    from ..operators.transforms import drop_headers, insert_header

    rec = orders_cdc_events(spark, sf_dir)
    stamped = insert_header(rec, "pipeline", "cdc-poc")
    scrubbed = drop_headers(stamped, ["trace", "evt_seq", "x_absent"])
    h = F.col("headers")
    return scrubbed.select(
        F.col("offset").cast("long").alias("offset"),
        F.element_at(h, "pipeline").alias("pipeline"),
        F.element_at(h, "src_region").alias("src_region"),
        F.concat_ws(",", F.array_sort(F.map_keys(h))).alias("header_keys"),
    )


def cdc_shard_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — Debezium's ``ByLogicalTableRouter`` SMT
    (io.debezium.transforms.ByLogicalTableRouter): merge the per-shard
    CDC topics of a partitioned table into ONE logical topic, tagging
    each record with its physical origin
    (``key.enforce.uniqueness`` → ``__dbz__physicalTableIdentifier``)
    so same-key rows from different shards never collapse.  The orders
    log is re-addressed to four shard topics
    (``poc.public.orders_shard_<k%4>`` — derivable from the record
    OFFSET alone, offset = key·10 + slot, so no JSON parse is needed),
    routed back to ``orders_all`` by regex, and unioned with the
    customer topic to pin the SMT's pass-through contract (non-matching
    topic survives untouched, NULL physical id).

    The oracle replays the generator's event multiplicities per shard
    plus the 1-event-per-customer snapshot — a mis-route, a lost
    physical tag, or a pass-through regression each shifts a row.

    Plan: map-only rlike/regexp_replace + one hash agg on a 5-value
    key; the routing itself never shuffles."""
    from ..operators.transforms import logical_table_route

    rec = orders_cdc_events(spark, sf_dir).withColumn(
        "topic",
        F.concat(
            F.lit("poc.public.orders_shard_"),
            (F.expr("offset div 10") % 4).cast("string"),
        ),
    )
    both = rec.unionByName(
        customer_cdc_events(spark, sf_dir), allowMissingColumns=True
    )
    routed = logical_table_route(
        both, r"poc\.public\.orders_shard_\d+", "poc.public.orders_all"
    )
    return routed.groupBy(
        "topic",
        F.col("__dbz__physicalTableIdentifier").alias("physical_table"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct(F.expr("offset div 10")).cast("long").alias("n_keys"),
    )


def cdc_regex_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — Kafka Connect's ``RegexRouter`` SMT
    (org.apache.kafka.connect.transforms.RegexRouter — the stock
    topic-rename transform every Debezium deployment reaches for when
    a sink maps topics to table names): whole-name-match the topic
    against ``topic.regex`` and substitute capture groups into
    ``topic.replacement``.  Here ``poc\\.public\\.(orders)`` →
    ``cdc_$1`` strips the connector namespace from the orders feed
    while the customer topic — not matching — passes through
    UNTOUCHED, pinning both halves of the SMT's contract (Java
    ``matches()`` anchors both ends; non-matches are identity).

    The oracle replays the generator's event-multiplicity closed form
    per topic.  Plan: map-only rlike + regexp_replace over the record
    scan, then one hash agg on a 2-value key — no shuffle in the
    routing itself."""
    from ..operators.transforms import regex_router

    rec = orders_cdc_events(spark, sf_dir).unionByName(
        customer_cdc_events(spark, sf_dir), allowMissingColumns=True
    )
    routed = regex_router(rec, r"poc\.public\.(orders)", "cdc_$1")
    return routed.groupBy("topic").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("partition").cast("long").alias("n_partitions"),
    )


def cdc_value_to_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — Kafka Connect's ``ValueToKey`` SMT
    (org.apache.kafka.connect.transforms.ValueToKey, chained with
    ``ExtractField$Key`` in the documented re-keying recipe): replace
    the record KEY with a struct of named VALUE fields, so compaction
    and partition ordering follow a business key — here the orders
    feed re-keyed from primary key to ``o_custkey`` (after image,
    before image for deletes, the key Debezium would see on each).

    Output is the per-new-key event histogram; the oracle re-derives
    every key's event count from the generator multiplicities and the
    exact ``to_json`` rendering (``{"o_custkey":<k>}``) — a wrong
    field source (after-only would NULL the deletes) or a format
    drift both mismatch.

    Plan: pruned parse → map-side key build → one hash agg keyed by
    customer (map-side combine; customer cardinality-bounded)."""
    from ..operators.transforms import value_to_key

    env = pruned_envelope(
        ORDERS_CDC_ROW, after=["o_custkey"], before=["o_custkey"],
        source=(),
    )
    p = F.col("j.payload")
    ev = _orders_parsed(spark, sf_dir, env).select(
        F.coalesce(p.after.o_custkey, p.before.o_custkey).alias("o_custkey"),
        "key",
    )
    rekeyed = value_to_key(ev, ["o_custkey"])
    return rekeyed.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )


def cdc_cast_smt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — Kafka Connect's ``Cast`` SMT
    (org.apache.kafka.connect.transforms.Cast$Value,
    ``spec=o_orderkey:string,o_custkey:int32,o_totalprice:float64``):
    spec-driven field casts on the unwrapped value — the stock fix-up
    when the wire carries decimals as strings
    (``decimal.handling.mode=string``, the shape this feed actually
    uses) but the sink wants real types.  Uses the Connect schema
    type names, mapped to Spark types inside the operator.

    Applied to the snapshot image (op='r') so the oracle is the
    orders fixture itself under the same three casts — any type-map
    or parse drift mismatches.  Plan: pruned parse → map-only casts;
    fuses into the scan."""
    from ..operators.transforms import cast_fields

    env = pruned_envelope(
        ORDERS_CDC_ROW,
        after=["o_orderkey", "o_custkey", "o_totalprice"],
        before=(), source=(),
    )
    p = F.col("j.payload")
    snap = (
        _orders_parsed(spark, sf_dir, env)
        .filter(p.op == "r")
        .select(
            p.after.o_orderkey.alias("o_orderkey"),
            p.after.o_custkey.alias("o_custkey"),
            p.after.o_totalprice.alias("o_totalprice"),
        )
    )
    return cast_fields(
        snap,
        {"o_orderkey": "string", "o_custkey": "int32",
         "o_totalprice": "float64"},
    )


def cdc_replace_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — Kafka Connect's ``ReplaceField`` SMT
    (org.apache.kafka.connect.transforms.ReplaceField$Value,
    ``exclude=o_orderpriority`` +
    ``renames=o_orderstatus:status,o_orderdate:order_date_us``):
    drop and rename value fields in-flight — the lightweight schema
    shim between a source's column names and a sink's.

    Applied to the snapshot image; the oracle is the orders fixture
    under the same exclude/rename (the µs-epoch date passes through
    NUMERICALLY — rename must not touch values).  Plan: pruned parse
    → one projection; fuses into the scan."""
    from ..operators.transforms import replace_fields

    env = pruned_envelope(
        ORDERS_CDC_ROW,
        after=["o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate",
               "o_orderpriority"],
        before=(), source=(),
    )
    p = F.col("j.payload")
    snap = (
        _orders_parsed(spark, sf_dir, env)
        .filter(p.op == "r")
        .select(
            p.after.o_orderkey.alias("o_orderkey"),
            p.after.o_custkey.alias("o_custkey"),
            p.after.o_orderstatus.alias("o_orderstatus"),
            p.after.o_orderdate.alias("o_orderdate"),
            p.after.o_orderpriority.alias("o_orderpriority"),
        )
    )
    return replace_fields(
        snap,
        exclude=["o_orderpriority"],
        renames={"o_orderstatus": "status", "o_orderdate": "order_date_us"},
    )


def cdc_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — Kafka Connect's ``Flatten`` SMT
    (org.apache.kafka.connect.transforms.Flatten$Value,
    ``delimiter=_``): recursively lift every nested field to a
    top-level ``parent_child`` column — the blunt alternative to
    ``ExtractNewRecordState`` when the sink cannot store nested
    records but wants the envelope's source/op metadata kept.

    The pruned two-level Debezium envelope flattens to
    ``payload_before_o_orderkey`` / ``payload_after_o_orderkey`` /
    ``payload_source_ts_ms`` / ``payload_op`` / ``payload_ts_ms``;
    the oracle re-derives all five per event from the generator's
    closed form (6 event classes), keyed by offset — so a lost leaf,
    a wrong naming recipe, or a before/after swap all mismatch.

    Plan: pruned parse → ONE projection of leaf references (the
    operator walks the schema driver-side; no JSON re-parse, no
    Python per row)."""
    from ..operators.transforms import flatten_struct

    env = pruned_envelope(
        ORDERS_CDC_ROW, after=["o_orderkey"], before=["o_orderkey"],
        source=["ts_ms"], ts_ms=True,
    )
    parsed = _orders_parsed(spark, sf_dir, env).select(
        F.col("offset").cast("long").alias("offset"),
        F.col("j.payload").alias("payload"),
    )
    return flatten_struct(parsed, "_").select(
        "offset",
        "payload_before_o_orderkey",
        "payload_after_o_orderkey",
        "payload_source_ts_ms",
        "payload_op",
        "payload_ts_ms",
    )


def cdc_insert_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — Kafka Connect's ``InsertField`` SMT
    (org.apache.kafka.connect.transforms.InsertField$Value,
    ``static.field`` + ``topic.field``/``partition.field``/
    ``offset.field``/``timestamp.field``): stamp each value with a
    static provenance marker and the record-plane metadata — exactly
    the lineage the reference persists as first-class columns in its
    raw archive tables (init_clickhouse_raw_tables.sql:28-48:
    ``_topic/_partition/_offset/_timestamp``).

    The oracle re-derives all four metadata planes per event from the
    generator closed form (partition = key mod 8, offset = key·10 +
    slot, record time = event-date ms + slot) — a missing plane or a
    ms/µs slip mismatches.  Plan: map-only column attaches on the
    record scan; no parse of the value is needed."""
    from ..operators.transforms import insert_fields

    rec = orders_cdc_events(spark, sf_dir)
    out = insert_fields(
        rec,
        static={"source_system": "poc-cdc"},
        topic_field="__kafka_topic",
        partition_field="__kafka_partition",
        offset_field="__kafka_offset",
        timestamp_field="__kafka_ts",
    )
    return out.select(
        F.col("offset").cast("long").alias("offset"),
        "source_system",
        "__kafka_topic",
        F.col("__kafka_partition").cast("int").alias("__kafka_partition"),
        F.col("__kafka_offset").cast("long").alias("__kafka_offset"),
        "__kafka_ts",
    )


def cdc_timestamp_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — Kafka Connect's ``TimestampRouter`` SMT
    (org.apache.kafka.connect.transforms.TimestampRouter,
    ``topic.format=${topic}-${timestamp}`` +
    ``timestamp.format=yyyyMMdd``): re-address each record to a topic
    derived from its RECORD TIMESTAMP — how sinks get daily physical
    tables from one logical feed (the reference's raw archive keeps
    ``_timestamp`` for exactly this partition lineage,
    init_clickhouse_raw_tables.sql:32).

    The record time is the wire log's epoch-ms plane (event-date ms +
    slot); the oracle re-renders every event's day with the same ms
    arithmetic — including the slot offset, so even a midnight-edge
    event that the +slot shift tips into the next day must agree.

    Plan: map-only format + concat, then one hash agg on the daily
    topic key (day-cardinality-bounded)."""
    from ..operators.transforms import timestamp_router

    rec = orders_cdc_events(spark, sf_dir)
    routed = timestamp_router(
        rec, "${topic}-${timestamp}", "yyyyMMdd"
    )
    return routed.groupBy("topic").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )


def cdc_hoist_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — Kafka Connect's ``HoistField`` SMT
    (org.apache.kafka.connect.transforms.HoistField$Value,
    ``field=order``): wrap the record's value fields into ONE struct
    named by ``field`` — the inverse of ``Flatten``, for sinks that
    expect the payload nested under a single envelope key.  The
    record-plane ``offset`` stays top-level (the partial-hoist
    contract: only the named value columns nest), and the hoisted
    struct is rendered ``to_json`` so the oracle checks the exact
    nesting byte-for-byte.

    Plan: pruned parse → one projection + to_json; map-only, fuses
    into the scan."""
    from ..operators.transforms import hoist_field

    env = pruned_envelope(
        ORDERS_CDC_ROW,
        after=["o_orderkey", "o_custkey", "o_orderstatus"],
        before=(), source=(),
    )
    p = F.col("j.payload")
    snap = (
        _orders_parsed(spark, sf_dir, env)
        .filter(p.op == "r")
        .select(
            F.col("offset").cast("long").alias("offset"),
            p.after.o_orderkey.alias("o_orderkey"),
            p.after.o_custkey.alias("o_custkey"),
            p.after.o_orderstatus.alias("o_orderstatus"),
        )
    )
    hoisted = hoist_field(
        snap, "order", cols=["o_orderkey", "o_custkey", "o_orderstatus"]
    )
    return hoisted.select(
        "offset", F.to_json(F.col("order")).alias("order_json")
    )


def cdc_timestamp_converter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — Kafka Connect's ``TimestampConverter`` SMT
    (org.apache.kafka.connect.transforms.TimestampConverter$Value):
    one temporal field, three target representations — the Debezium
    MicroTimestamp int64 the orders feed actually carries
    (``o_orderdate``, ``unix.precision=microseconds``) converted to a
    real ``Timestamp``, a rendered ``string``
    (``format=yyyy-MM-dd HH:mm:ss.SSSSSS``), and an epoch-ms ``unix``
    — plus the string ROUND-TRIPPED back to Timestamp, pinning the
    parse direction too.

    The oracle recomputes all four from the fixture with the same µs
    arithmetic and UTC rendering.  Map-only; fuses into the scan."""
    from ..operators.transforms import convert_timestamp_field

    env = pruned_envelope(
        ORDERS_CDC_ROW, after=["o_orderkey", "o_orderdate"],
        before=(), source=(),
    )
    p = F.col("j.payload")
    snap = (
        _orders_parsed(spark, sf_dir, env)
        .filter(p.op == "r")
        .select(
            p.after.o_orderkey.alias("o_orderkey"),
            p.after.o_orderdate.alias("od_us"),
        )
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    # chained exactly like a real connector config would chain the SMT:
    # µs-int64 → Timestamp, then Timestamp → string / unix-ms, then the
    # string parsed back
    out = convert_timestamp_field(
        snap, "od_us", "Timestamp", unix_precision="microseconds",
        out="od_ts",
    )
    out = convert_timestamp_field(out, "od_ts", "string", fmt=fmt,
                                  out="od_str")
    out = convert_timestamp_field(
        out, "od_ts", "unix", unix_precision="milliseconds", out="od_ms",
    )
    out = convert_timestamp_field(out, "od_str", "Timestamp", fmt=fmt,
                                  out="od_rt")
    return out.select("o_orderkey", "od_ts", "od_str",
                      F.col("od_ms").cast("long").alias("od_ms"), "od_rt")


def cdc_filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — Kafka Connect's ``Filter`` SMT gated by PREDICATES
    (org.apache.kafka.connect.transforms.Filter +
    ``predicates``: RecordIsTombstone, TopicNameMatches — the
    documented drop-tombstones / route-by-topic recipe): the input is
    the orders wire log PLUS the delete tombstones Debezium really
    emits after each delete record (value = null, modeled at the
    spare offset slot 4) PLUS the customer topic; the chain drops
    tombstones first, then keeps only ``poc.public.orders``.

    The output (one row) counts surviving events and keys — a broken
    tombstone predicate inflates n_events by the delete count, a
    broken topic predicate adds a customer row.  Plan: both filters
    are map-only and push into the record scan; the synthesized
    tombstone branch is a filtered projection of the same scan."""
    from ..operators.transforms import (
        filter_records,
        record_is_tombstone,
        topic_name_matches,
    )

    rec = orders_cdc_events(spark, sf_dir)
    tomb = (
        rec.filter(F.col("offset") % 10 == 3)
        .withColumn("value", F.lit(None).cast("string"))
        .withColumn("offset", F.col("offset") + 1)
    )
    allrec = rec.unionByName(tomb).unionByName(
        customer_cdc_events(spark, sf_dir), allowMissingColumns=True
    )
    kept = filter_records(allrec, record_is_tombstone())
    kept = filter_records(
        kept, topic_name_matches(r"poc\.public\.orders"), negate=True
    )
    return kept.groupBy("topic").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct(F.expr("offset div 10")).cast("long").alias("n_keys"),
    )


def cdc_masked_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8+P9 — unwrap + PII masking in-flight (MaskField SMT,
    abcsvb-connector-secure.json:36-37): c_name replaced by its sha2-256."""
    parsed = parse_envelope(customer_cdc_events(spark, sf_dir), CUSTOMER_ENVELOPE)
    unwrapped = unwrap_envelope(parsed, drop_deletes=True)
    masked = mask_fields(unwrapped, ["c_name"], mode="hash")
    return masked.select(
        "c_custkey",
        "c_name",
        F.col("c_nationkey").cast("int").alias("c_nationkey"),
        to_float64("c_acctbal").alias("c_acctbal"),
        "c_mktsegment",
    )


def cdc_truncated_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — Debezium's connector-level column reshaping options next to
    the MaskField SMT: ``column.truncate.to.N.chars`` (ship the first N
    chars — the bandwidth guard for wide text) and
    ``column.mask.with.N.chars`` (fixed ``*``×N, LENGTH-HIDING — even
    the value's length leaks nothing, the documented contrast with
    truncate).  c_name truncates to 12, c_mktsegment masks to 6 stars;
    c_acctbal rides through untouched to pin selectivity.

    Map-only on the unwrapped customer feed; the oracle restates both
    reshapes from the customer fixture."""
    from ..operators.transforms import mask_columns_fixed, truncate_columns

    parsed = parse_envelope(customer_cdc_events(spark, sf_dir), CUSTOMER_ENVELOPE)
    unwrapped = unwrap_envelope(parsed, drop_deletes=True)
    out = truncate_columns(unwrapped, {"c_name": 12})
    out = mask_columns_fixed(out, {"c_mktsegment": 6})
    return out.select(
        "c_custkey",
        "c_name",
        F.length("c_name").cast("int").alias("name_len"),
        "c_mktsegment",
        to_float64("c_acctbal").alias("c_acctbal"),
    )


def products_usable_vw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE reference flagship, field for field (products_usable_vw,
    clickhouse.sql:70-82): JSON-extracted strings → latest-wins FINAL dedup
    → ``toInt32(id)``, ``toFloat64(price)``,
    ``toDateTime64(trimRight(created_at,'Z'), 6, 'UTC')`` — F4-F7 on the
    wire shapes the reference actually produces (decimal-as-string,
    ISO-8601-with-Z)."""
    from ..functions import to_datetime64, to_int32
    from ..sources.cdc import PRODUCTS_WIRE_ROW, products_cdc_events

    # pruned parse (r7): only before.id is consumed — skip the other four
    # before-image strings instead of converting them
    env = pruned_envelope(PRODUCTS_WIRE_ROW, after=None, before=["id"], source=["ts_ms"])
    p = F.col("j.payload")
    ev = parse_envelope(products_cdc_events(spark, sf_dir), env).select(
        F.coalesce(p.after["id"], p.before["id"]).cast("long").alias("key"),
        p.after["id"].alias("id_str"),
        p.after["name"].alias("name"),  # bracket access: .name is Column.name()
        p.after["price"].alias("price_str"),
        p.after["stock_quantity"].alias("stock_str"),
        p.after["created_at"].alias("created_str"),
        p.op.alias("op"),
        p.source.ts_ms.alias("ts_ms"),
        F.col("offset"),
    )
    merged = apply_cdc(ev, keys=["key"], version_col="ts_ms", tiebreak_col="offset", delete_mode="drop")
    return merged.select(
        to_int32("id_str").alias("id"),
        F.col("name"),
        to_float64("price_str").alias("price"),
        to_int32("stock_str").alias("stock_quantity"),
        to_datetime64("created_str").alias("created_at"),
    )


def silver_cross_table_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytics over TWO silver current states — the end state the whole
    reference pipeline exists to serve (usable views are queried jointly):
    orders current state (latest-wins, deletes dropped) joined to the
    masked customer dimension, revenue per market segment.

    Scale shape: the dimension (customer silver) broadcasts; the fact-side
    current state arrives pre-deduped from its own merge — no re-dedup at
    query time, one agg shuffle on the segment key."""
    orders_cur = cdc_current_state(spark, sf_dir).select("o_custkey", "o_totalprice")
    cust_cur = cdc_masked_customers(spark, sf_dir).select("c_custkey", "c_mktsegment")
    return (
        orders_cur.join(F.broadcast(cust_cur), orders_cur.o_custkey == cust_cur.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


def cdc_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed between two points in the log (operators/
    transforms.diff_states): the state as of ts ≤ 3e6 (snapshot + first
    updates) diffed against the final state.  Second updates (%9 keys,
    ts 3e6+key) surface as 'u' with the new image; deletes (%7 keys,
    ts 4e6+key) as 'd'; everything else is unchanged and drops out —
    the delta a downstream layer consumes instead of a full recompute."""
    from ..operators.transforms import diff_states

    p = F.col("j.payload")
    events = _orders_parsed(spark, sf_dir, _ENV_STATUS_PRICE).select(
        F.coalesce(p.after.o_orderkey, p.before.o_orderkey).alias("o_orderkey"),
        p.after.o_orderstatus.alias("o_orderstatus"),
        to_float64(p.after.o_totalprice).alias("o_totalprice"),
        p.op.alias("op"),
        p.source.ts_ms.alias("ts_ms"),
        F.col("offset"),
    )
    prev = apply_cdc(
        events.filter(F.col("ts_ms") <= 3_000_000),
        keys=["o_orderkey"], version_col="ts_ms", tiebreak_col="offset", delete_mode="drop",
    )
    nxt = apply_cdc(
        events, keys=["o_orderkey"], version_col="ts_ms", tiebreak_col="offset", delete_mode="drop"
    )
    return diff_states(
        prev, nxt, keys=["o_orderkey"], compare_cols=["o_orderstatus", "o_totalprice"]
    )


def cdc_deadletter_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 on the scoreboard — poison messages (every offset %101==0 is
    deterministically truncated to invalid JSON) survive the PERMISSIVE
    parse as NULL payloads and split into the dead-letter side; the good
    side flows on.  The reference caps this with
    ``kafka_skip_broken_messages=1`` (clickhouse.sql:20); the engine keeps
    the poison rows addressable instead of dropping them."""
    from ..streaming.pipeline import corrupt_filter

    ev = orders_cdc_events(spark, sf_dir)
    corrupted = ev.withColumn(
        "value",
        F.when(F.col("offset") % 101 == 0, F.expr("substring(value, 1, 10)")).otherwise(
            F.col("value")
        ),
    )
    parsed = parse_envelope(corrupted, ORDERS_ENVELOPE)
    good, dead = corrupt_filter(parsed)
    return good.select(F.lit("good").alias("side")).union(
        dead.select(F.lit("dead").alias("side"))
    ).groupBy("side").agg(F.count(F.lit(1)).alias("n"))


def cdc_connect_dlq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — Kafka Connect's DLQ contract
    (operators/transforms.dlq_route; ``errors.tolerance=all`` +
    ``errors.deadletterqueue.topic.name`` + context headers): the
    poison slice (offset ≡0 mod 101, deterministically truncated to
    invalid JSON — the cdc_deadletter_stats plant) re-produced to
    ``dlq.poc-connector`` with the original value bytes untouched and
    the full ``__connect.errors.*`` header set — the record shape a
    Connect DLQ consumer replays from.

    The output checks the context planes per DLQ record: original
    topic/partition/offset round-tripped through the headers, the
    stage/exception identity, the header-set cardinality, and the
    untouched-truncated-value length (10 — the plant's cut).  Oracle:
    offsets from the generator multiplicities filtered to %101.

    Plan: permissive parse → poison filter → map-only DLQ projection;
    the DLQ side is the tiny slice, nothing corpus-sized reshuffles."""
    from ..operators.transforms import dlq_route
    from ..streaming.pipeline import corrupt_filter

    ev = orders_cdc_events(spark, sf_dir)
    corrupted = ev.withColumn(
        "value",
        F.when(
            F.col("offset") % 101 == 0, F.expr("substring(value, 1, 10)")
        ).otherwise(F.col("value")),
    )
    parsed = parse_envelope(corrupted, ORDERS_ENVELOPE)
    _good, dead = corrupt_filter(parsed)
    dlq = dlq_route(
        dead,
        dlq_topic="dlq.poc-connector",
        connector="poc-connector",
        stage="VALUE_CONVERTER",
        exception_class="org.apache.kafka.connect.errors.DataException",
        exception_message=F.lit(
            "Converting byte[] to Kafka Connect data failed"
        ),
    )
    h = F.col("headers")
    return dlq.select(
        F.col("topic").alias("dlq_topic"),
        F.element_at(h, "__connect.errors.topic").alias("err_topic"),
        F.element_at(h, "__connect.errors.partition")
        .cast("int")
        .alias("err_partition"),
        F.element_at(h, "__connect.errors.offset")
        .cast("long")
        .alias("err_offset"),
        F.element_at(h, "__connect.errors.stage").alias("err_stage"),
        F.element_at(h, "__connect.errors.exception.class.name").alias(
            "err_class"
        ),
        F.size(h).cast("int").alias("n_headers"),
        F.length("value").cast("int").alias("value_len"),
    )


def cdc_first_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``latest_wins(keep='first')`` — the min_by path: the EARLIEST
    version per key (first-touch image), the batch form of the streaming
    first-occurrence dedup (stateful_dedup).  On the orders log the first
    event per key is always the snapshot read."""
    from ..operators.upsert import latest_wins

    p = F.col("j.payload")
    events = _orders_parsed(spark, sf_dir, _ENV_STATUS_PRICE).select(
        F.coalesce(p.after.o_orderkey, p.before.o_orderkey).alias("o_orderkey"),
        p.after.o_orderstatus.alias("o_orderstatus"),
        to_float64(p.after.o_totalprice).alias("o_totalprice"),
        p.op.alias("op"),
        p.source.ts_ms.alias("ts_ms"),
        F.col("offset"),
    )
    return latest_wins(events, ["o_orderkey"], ["ts_ms", "offset"], keep="first").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "op", "ts_ms"
    )


def cdc_multiplex_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 on the data path — one consumer over MULTIPLE topics (the
    ``table.include.list`` runtime shape: Debezium emits
    ``<prefix>.<schema>.<table>`` per table, clickhouse.sql:17): the fan-in
    union is routed by table name parsed from the topic, summarized per
    destination table.  At scale this is the one-consumer-many-tables
    deployment; each routed branch feeds its own silver store."""
    orders_ev = orders_cdc_events(spark, sf_dir).select("topic", "offset")
    cust_ev = customer_cdc_events(spark, sf_dir).select("topic", "offset")
    fanin = orders_ev.unionByName(cust_ev)
    table = F.element_at(F.split("topic", "\\."), 3)
    return (
        fanin.withColumn("dest_table", table)
        .groupBy("dest_table")
        .agg(F.count(F.lit(1)).alias("n_events"), F.max("offset").alias("max_offset"))
    )


def cdc_bronze_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7/P1/P4/S3 — bronze raw-archive projection with Kafka lineage
    (init_clickhouse_raw_tables.sql:28-48), summarized per partition
    (ingestion_time excluded: wall-clock is nondeterministic)."""
    bronze = bronze_projection(orders_cdc_events(spark, sf_dir))
    return bronze.groupBy("partition_str").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("offset_num").alias("max_offset"),
    )


def cdc_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r5 (VERDICT r4 What's-missing #3): drift DETECTION over a wire log
    whose source evolved — every event dropped ``o_orderpriority`` and
    rows with ``o_orderkey % 5 = 0`` gained an unregistered
    ``loyalty_tier`` column.  The report must surface exactly those two
    facts with counts and first-seen offsets.  ``to_json`` omits null
    fields, so the conditional extra column round-trips through a REAL
    JSON wire image, and the detector's ``json_object_keys`` diff is
    value-checked end to end."""
    from ..operators.transforms import schema_drift_report

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    after = F.struct(
        F.col("o_orderkey"),
        F.col("o_orderstatus"),
        F.col("o_totalprice"),
        # null when not %5 — to_json omits null fields, so only every 5th
        # event carries the unregistered key in its actual wire image
        F.when(F.col("o_orderkey") % 5 == 0, F.lit("gold")).alias("loyalty_tier"),
    )
    wire = orders.select(
        F.col("o_orderkey").alias("offset"),
        F.to_json(F.struct(F.struct(after.alias("after")).alias("payload"))).alias("value"),
    )
    # registry still expects the pre-evolution column set
    expected = ["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]
    return schema_drift_report(wire, expected)


def cdc_hotkey_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r7 (VERDICT r6 #6) — skew-stress evidence for the latest-wins
    upsert: a synthetic micro-batch where 50% of ALL events hit one key
    (a hot entity receiving an update per source row — the worst realistic
    CDC skew: one row updated millions of times between triggers).

    Why this is safe at 100 TB without AQE skew-join or salting: the dedup
    is an AGGREGATION, not a join, and ``latest_wins`` plans a PARTIAL
    (map-side) aggregate before the key exchange — every map partition
    collapses the hot key to ONE candidate row locally, so the reduce task
    for the hot key receives at most n_map_partitions rows regardless of
    the key's event multiplicity.  Skew is neutralized by construction;
    AQE skew handling (which only applies to joins) never needs to
    engage.  tests/test_skew.py asserts the partial-aggregate plan shape
    on this exact query.

    The hot key is −1 (disjoint from every real o_orderkey) so the final
    state is closed-form: all snapshot images unchanged + one hot row
    whose winning update carries the MAX source o_orderkey's image."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    snap = orders.select(
        F.col("o_orderkey").alias("key"),
        F.col("o_orderstatus").alias("status"),
        F.lit(1_000_000).cast("long").alias("ts_ms"),
        (F.col("o_orderkey") * 10).alias("offset"),
        F.lit("r").alias("op"),
    )
    hot = orders.select(
        F.lit(-1).cast("long").alias("key"),
        F.concat(F.lit("H"), (F.col("o_orderkey") % 10).cast("string")).alias("status"),
        (F.lit(5_000_000) + F.col("o_orderkey")).alias("ts_ms"),
        (F.col("o_orderkey") * 10 + 7).alias("offset"),
        F.lit("u").alias("op"),
    )
    merged = apply_cdc(
        snap.unionByName(hot), keys=["key"], version_col="ts_ms",
        tiebreak_col="offset", delete_mode="drop",
    )
    return merged.select("key", "status", "ts_ms")


def cdc_toast_carry_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r13 (T4+) — Debezium TOAST/unavailable-value semantics: updates
    carry ``__debezium_unavailable_value`` for unchanged TOASTed columns
    when replica identity is not FULL (the reference's REPLICA IDENTITY
    FULL, init_postgresql_data.sql:73-75, is the workaround this merge
    feature replaces).  Planted deterministic event schedule over
    ``orders``:

    - snapshot read (real ``note``) for keys %5 != 0 — %5 keys simulate
      a stream that started mid-life, so their placeholders can never be
      resolved and must be KEPT (not faked to NULL);
    - %3 keys: update with the placeholder (unchanged TOAST) — the
      naive merge would overwrite the real note with the placeholder;
    - %9 keys: later update with a genuinely new note;
    - %6 keys: a final placeholder-only update on top of everything;
    - %7 keys: delete (drop mode).

    The merge is ``apply_cdc(carry_forward_cols=["note"])`` — one
    shuffle, carry-forward argmaxes riding the same groupBy."""
    from ..operators.upsert import DEBEZIUM_UNAVAILABLE as PH

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus"
    )
    k = F.col("o_orderkey")

    def ev(df: DataFrame, note, status, op: str, ts, off) -> DataFrame:
        return df.select(
            k.alias("o_orderkey"),
            note.alias("note"),
            status.alias("status"),
            F.lit(op).alias("op"),
            ts.cast("long").alias("ts_ms"),
            off.cast("long").alias("offset"),
        )

    null_s = F.lit(None).cast("string")
    events = (
        ev(orders.filter(k % 5 != 0), F.concat(F.lit("note-"), k),
           F.col("o_orderstatus"), "r", F.lit(1000000), k * 10)
        .unionByName(ev(orders.filter(k % 3 == 0), F.lit(PH), F.lit("U"),
                        "u", F.lit(2000000) + k, k * 10 + 1))
        .unionByName(ev(orders.filter(k % 9 == 0),
                        F.concat(F.lit("fresh-"), k), F.lit("V"),
                        "u", F.lit(3000000) + k, k * 10 + 2))
        .unionByName(ev(orders.filter(k % 6 == 0), F.lit(PH), F.lit("W"),
                        "u", F.lit(4000000) + k, k * 10 + 3))
        .unionByName(ev(orders.filter(k % 7 == 0), null_s, null_s,
                        "d", F.lit(5000000) + k, k * 10 + 4))
    )
    merged = apply_cdc(
        events, keys=["o_orderkey"], version_col="ts_ms",
        tiebreak_col="offset", delete_mode="drop",
        carry_forward_cols=["note"],
    )
    return merged.select("o_orderkey", "note", "status", "op", "ts_ms")


def cdc_set_schema_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — Kafka Connect's ``SetSchemaMetadata`` SMT
    (org.apache.kafka.connect.transforms.SetSchemaMetadata$Value,
    ``schema.name`` + ``schema.version``): rewrite the value schema's
    identity — how operators re-namespace a feed for a consumer that
    validates by schema name — while the PAYLOAD stays byte-identical.
    Runs over the schemas.enable JSON frame (cdc_json_schema_envelope's
    wire, v1 string-price plane): the new name/version come from the
    SMT config, the old version is read from the wire, and the payload
    is emitted as the RAW substring so the oracle pins
    byte-exactness (a re-serialization that reordered or re-rendered
    one field would mismatch).

    Map-only JSON ops on the scan; no shuffle."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey")
    schema = F.struct(
        F.lit("struct").alias("type"),
        F.lit("poc.public.orders.Value").alias("name"),
        F.lit(1).alias("version"),
        F.array(
            F.struct(F.lit("o_orderkey").alias("field"),
                     F.lit("int64").alias("type")),
            F.struct(F.lit("price").alias("field"),
                     F.lit("string").alias("type")),
        ).alias("fields"),
    )
    payload = F.struct(
        k.alias("o_orderkey"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("string")
        .alias("price"),
    )
    wire = orders.select(
        F.to_json(
            F.struct(schema.alias("schema"), payload.alias("payload"))
        ).alias("value")
    )
    old_version = F.get_json_object("value", "$.schema.version").cast("int")
    return wire.select(
        F.get_json_object("value", "$.payload.o_orderkey")
        .cast("long")
        .alias("o_orderkey"),
        F.lit("poc.reshaped.orders.Value").alias("schema_name"),
        old_version.alias("old_version"),
        (old_version + 1).cast("int").alias("schema_version"),
        F.get_json_object("value", "$.payload").alias("payload_raw"),
    )


def cdc_schema_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — Debezium's SCHEMA-CHANGE EVENT stream (the
    ``<topic.prefix>`` schema topic / internal schema history that a
    relational connector replays on restart; public shape:
    ``SchemaChangeValue`` with ``databaseName``/``ddl``/``tableChanges``
    [{type: CREATE|ALTER|DROP, id, table.columns}]).  The reference's
    DDL lives in init SQL files; under Debezium every one of those
    statements becomes an event on this topic — this query rebuilds
    the CURRENT schema registry from the event log alone.

    Deterministic DDL churn over sharded order tables (one per nation):
    CREATE (4 columns) for every shard, ALTER ADD COLUMN for keys ≡0
    mod 3 (5 columns), DROP for keys ≡0 mod 5 — so the registry state
    exercises create-only, altered, and dropped outcomes, latest-wins
    by the event sequence.

    Plan: to_json generator → ``from_json`` typed parse → explode of
    ``tableChanges`` → ONE hash agg per table id (count + ``max_by``
    latest state — no window, map-side combinable)."""
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    k = F.col("n_nationkey").cast("long")
    tbl = F.concat(F.lit("poc.public.orders_"), k.cast("string"))
    base_cols = F.array(
        F.lit("o_orderkey"), F.lit("o_custkey"), F.lit("o_status"),
        F.lit("o_totalprice"),
    )

    def ev(df: DataFrame, typ: str, cols, ddl, seq_slot: int) -> DataFrame:
        changes = F.array(
            F.struct(
                F.lit(typ).alias("type"),
                tbl.alias("id"),
                F.struct(
                    (cols if cols is not None
                     else F.lit(None).cast("array<string>")).alias("columns")
                ).alias("table"),
            )
        )
        payload = F.struct(
            F.struct((F.lit(1000) + k).alias("ts_ms")).alias("source"),
            F.lit("poc").alias("databaseName"),
            ddl.alias("ddl"),
            changes.alias("tableChanges"),
        )
        return df.select(
            F.to_json(F.struct(payload.alias("payload"))).alias("value"),
            (k * 10 + seq_slot).alias("offset"),
        )

    creates = ev(
        nation, "CREATE", base_cols,
        F.concat(F.lit("CREATE TABLE orders_"), k.cast("string"),
                 F.lit(" (o_orderkey bigint primary key, ...)")), 0,
    )
    alters = ev(
        nation.filter(k % 3 == 0), "ALTER",
        F.concat(base_cols, F.array(F.lit("note"))),
        F.concat(F.lit("ALTER TABLE orders_"), k.cast("string"),
                 F.lit(" ADD COLUMN note text")), 1,
    )
    drops = ev(
        nation.filter(k % 5 == 0), "DROP", None,
        F.concat(F.lit("DROP TABLE orders_"), k.cast("string")), 2,
    )
    wire = creates.unionByName(alters).unionByName(drops)

    env = (
        "payload struct<source:struct<ts_ms:long>, databaseName:string, "
        "ddl:string, tableChanges:array<struct<type:string, id:string, "
        "table:struct<columns:array<string>>>>>"
    )
    parsed = wire.select(
        F.from_json("value", env).alias("j"), F.col("offset")
    ).select(
        F.col("offset"),
        F.col("j.payload.databaseName").alias("db"),
        F.explode("j.payload.tableChanges").alias("chg"),
    )
    per = parsed.select(
        "offset", "db",
        F.col("chg.type").alias("chg_type"),
        F.col("chg.id").alias("table_id"),
        F.size(F.col("chg.table.columns")).alias("n_cols_raw"),
    )
    ncols = F.when(F.col("n_cols_raw") >= 0, F.col("n_cols_raw"))
    return per.groupBy("table_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_changes"),
        F.max_by("chg_type", "offset").alias("last_type"),
        (F.max_by("chg_type", "offset") != "DROP").alias("table_exists"),
        F.max_by(ncols, F.col("offset")).cast("int").alias("n_columns"),
    )


def cdc_json_schema_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — Kafka Connect's JsonConverter with ``schemas.enable=true``
    (org.apache.kafka.connect.json.JsonConverter): every value is
    framed ``{"schema": {...}, "payload": {...}}`` — the default
    Debezium JSON wire when no Schema Registry is deployed (the
    reference's connector configs set ``value.converter.schemas.
    enable``; its ClickHouse DDL extracts from ``payload`` and
    DISCARDS the schema block, clickhouse.sql:57-68).  This query
    keeps the schema block and uses it: two interleaved schema
    VERSIONS declare ``price`` as Connect ``string``
    (decimal-as-string, v1, even keys) vs ``double`` (v2, odd keys),
    and extraction dispatches on the DECLARED type — the engine reads
    the contract from the wire, not from configuration.

    Parse shape: ``get_json_object`` pulls the schema and payload
    blocks; ``from_json`` types the schema (name/version/fields);
    the declared price type comes from ``filter(fields, ...)`` —
    all JVM-side, one map pass, no shuffle."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey")

    def framed(df: DataFrame, version: int, price_field) -> DataFrame:
        price_type = "string" if version == 1 else "double"
        schema = F.struct(
            F.lit("struct").alias("type"),
            F.lit("poc.public.orders.Value").alias("name"),
            F.lit(version).alias("version"),
            F.array(
                F.struct(F.lit("o_orderkey").alias("field"),
                         F.lit("int64").alias("type")),
                F.struct(F.lit("o_orderstatus").alias("field"),
                         F.lit("string").alias("type")),
                F.struct(F.lit("price").alias("field"),
                         F.lit(price_type).alias("type")),
            ).alias("fields"),
        )
        payload = F.struct(
            k.alias("o_orderkey"),
            F.col("o_orderstatus"),
            price_field.alias("price"),
        )
        return df.select(
            F.to_json(
                F.struct(schema.alias("schema"), payload.alias("payload"))
            ).alias("value")
        )

    dec = F.col("o_totalprice").cast("decimal(18,2)")
    v1 = framed(orders.filter(k % 2 == 0), 1, dec.cast("string"))
    v2 = framed(orders.filter(k % 2 != 0), 2, dec)
    wire = v1.unionByName(v2)

    sch = F.from_json(
        F.get_json_object("value", "$.schema"),
        "type string, name string, version int, "
        "fields array<struct<field:string,type:string>>",
    )
    parsed = wire.select(
        sch.alias("s"),
        F.get_json_object("value", "$.payload.o_orderkey")
        .cast("long")
        .alias("o_orderkey"),
        F.get_json_object("value", "$.payload.price").alias("price_raw"),
    )
    declared = F.expr("filter(s.fields, f -> f.field = 'price')")[0]["type"]
    return parsed.select(
        "o_orderkey",
        F.col("s.name").alias("schema_name"),
        F.col("s.version").cast("int").alias("schema_version"),
        declared.alias("price_type"),
        F.col("price_raw").cast("double").alias("price"),
        F.size("s.fields").cast("int").alias("n_fields"),
    )


def cdc_reselect_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — Debezium's ``ReselectColumnsPostProcessor``
    (operators/transforms.reselect_columns): repair TOAST
    placeholder and NULL columns by re-selecting the CURRENT value
    from the source table — the post-processor alternative to the
    reference's REPLICA IDENTITY FULL workaround
    (init_postgresql_data.sql:73-75).

    Planted deterministic schedule over ``orders`` (the
    cdc_toast_carry_forward note plane, one event class per trigger):

    - snapshot read with a real ``note`` for every key (clean rows
      must BYPASS the repair join untouched);
    - %3 keys: update carrying the TOAST placeholder
      (``reselect.unavailable.values``);
    - %4 keys: update carrying NULL (``reselect.null.values``);
    - the source's CURRENT note is ``db-note-<k>`` — deliberately
      different from every event-time value, pinning that reselect
      takes the database's present value, not the event's past;
    - %13 keys are DELETED from the source — their flagged events
      must keep the placeholder/NULL (no row found → skip).

    Plan: the flagged slice filters before the join (only repairs
    shuffle); clean rows union around it.  At 100 TB this replaces
    Debezium's per-event JDBC point-SELECT with one batched join."""
    from ..operators.transforms import reselect_columns
    from ..operators.upsert import DEBEZIUM_UNAVAILABLE as PH

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey")
    k = F.col("o_orderkey")

    def ev(df: DataFrame, note, op: str, off) -> DataFrame:
        return df.select(
            k.alias("o_orderkey"),
            note.alias("note"),
            F.lit(op).alias("op"),
            off.cast("long").alias("offset"),
        )

    events = (
        ev(orders, F.concat(F.lit("note-"), k), "r", k * 10)
        .unionByName(ev(orders.filter(k % 3 == 0), F.lit(PH), "u", k * 10 + 1))
        .unionByName(
            ev(orders.filter(k % 4 == 0), F.lit(None).cast("string"), "u",
               k * 10 + 2)
        )
    )
    current = orders.filter(k % 13 != 0).select(
        k.alias("o_orderkey"), F.concat(F.lit("db-note-"), k).alias("note")
    )
    out = reselect_columns(
        events, current, keys=["o_orderkey"], columns=["note"]
    )
    return out.select(
        "offset",
        "o_orderkey",
        "op",
        "note",
        F.col("note__reselected").alias("reselected"),
    )


def cdc_outbox_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r13 — Debezium OUTBOX EVENT ROUTER
    (operators/transforms.outbox_route; the documented
    ``io.debezium.transforms.outbox.EventRouter`` SMT and the
    transactional-outbox pattern it implements).  A planted outbox feed
    is derived from orders: every order INSERTs one domain event
    (aggregatetype cycling order/shipment/invoice on k mod 3, payload a
    closed-form JSON of the key and k mod 7); keys %11 == 0 also carry
    an UPDATE record and %13 == 0 a DELETE record — the outbox
    anti-pattern rows the SMT must SKIP (outbox tables are insert-only;
    services delete rows right after insert and those deletes must not
    re-emit events).  The routed output re-extracts the payload's
    bucket via JSON path, proving the value survives routing intact.
    Oracle: the closed form over orders — exactly one routed record per
    order, none for the update/delete rows."""
    from ..operators.transforms import outbox_route

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey")
    agg_type = F.expr(
        "element_at(array('order', 'shipment', 'invoice'), "
        "cast(o_orderkey % 3 as int) + 1)"
    )
    evt_type = F.expr(
        "element_at(array('OrderCreated', 'ShipmentCreated', "
        "'InvoiceCreated'), cast(o_orderkey % 3 as int) + 1)"
    )
    payload = F.concat(
        F.lit('{"orderkey":'), k.cast("string"),
        F.lit(',"bucket":'), (k % 7).cast("string"), F.lit("}"),
    )

    def row(df, op, typ, pay):
        return df.select(
            agg_type.alias("aggregatetype"),
            k.cast("long").alias("aggregateid"),
            typ.alias("type"),
            pay.alias("payload"),
            F.lit(op).alias("op"),
        )

    outbox = (
        row(orders, "c", evt_type, payload)
        .unionByName(row(orders.filter(k % 11 == 0), "u",
                         F.lit("ShouldNotRoute"),
                         F.lit('{"ignored":true}')))
        .unionByName(row(orders.filter(k % 13 == 0), "d",
                         F.lit(None).cast("string"),
                         F.lit(None).cast("string")))
    )
    return outbox_route(outbox).withColumn(
        "bucket", F.get_json_object("value", "$.bucket").cast("long")
    )


QUERIES = {
    "cdc_current_state": cdc_current_state,
    "cdc_outbox_route": cdc_outbox_route,
    "cdc_toast_carry_forward": cdc_toast_carry_forward,
    "cdc_hotkey_state": cdc_hotkey_state,
    "cdc_schema_drift": cdc_schema_drift,
    "cdc_json_extract_path": cdc_json_extract_path,
    "cdc_rewrite_mode": cdc_rewrite_mode,
    "cdc_changed_columns": cdc_changed_columns,
    "cdc_content_route": cdc_content_route,
    "cdc_timezone_convert": cdc_timezone_convert,
    "cdc_partition_route": cdc_partition_route,
    "cdc_header_to_value": cdc_header_to_value,
    "cdc_header_ops": cdc_header_ops,
    "cdc_reselect_columns": cdc_reselect_columns,
    "cdc_json_schema_envelope": cdc_json_schema_envelope,
    "cdc_schema_history": cdc_schema_history,
    "cdc_set_schema_metadata": cdc_set_schema_metadata,
    "cdc_shard_route": cdc_shard_route,
    "cdc_regex_router": cdc_regex_router,
    "cdc_value_to_key": cdc_value_to_key,
    "cdc_cast_smt": cdc_cast_smt,
    "cdc_replace_field": cdc_replace_field,
    "cdc_flatten": cdc_flatten,
    "cdc_insert_field": cdc_insert_field,
    "cdc_timestamp_router": cdc_timestamp_router,
    "cdc_timestamp_converter": cdc_timestamp_converter,
    "cdc_hoist_field": cdc_hoist_field,
    "cdc_filter_predicate": cdc_filter_predicate,
    "cdc_masked_customers": cdc_masked_customers,
    "cdc_truncated_columns": cdc_truncated_columns,
    "cdc_connect_dlq": cdc_connect_dlq,
    "cdc_bronze_stats": cdc_bronze_stats,
    "products_usable_vw": products_usable_vw,
    "silver_cross_table_revenue": silver_cross_table_revenue,
    "cdc_deadletter_stats": cdc_deadletter_stats,
    "cdc_change_feed": cdc_change_feed,
    "cdc_multiplex_route": cdc_multiplex_route,
    "cdc_first_image": cdc_first_image,
}

# ---------------------------------------------------------------------------
# DuckDB oracles — reconstruct the deterministic generator's final state
# (sources/cdc.py: updates for keys %3==0 (+100, status U), %9==0 (+200, V),
# deletes for %7==0, snapshot ts 1e6, update ts 2e6/3e6+key, delete 4e6+key)
# ---------------------------------------------------------------------------

_FINAL_STATUS = (
    "CASE WHEN o_orderkey % 9 = 0 THEN 'V' "
    "WHEN o_orderkey % 3 = 0 THEN 'U' ELSE o_orderstatus END"
)
_FINAL_PRICE = (
    "CAST(CASE WHEN o_orderkey % 9 = 0 THEN o_totalprice + 200.0 "
    "WHEN o_orderkey % 3 = 0 THEN o_totalprice + 100.0 "
    "ELSE o_totalprice END AS DOUBLE)"
)
_FINAL_TS = (
    "CAST(CASE WHEN o_orderkey % 9 = 0 THEN 3000000 + o_orderkey "
    "WHEN o_orderkey % 3 = 0 THEN 2000000 + o_orderkey "
    "ELSE 1000000 END AS BIGINT)"
)
_FINAL_OP = "CASE WHEN o_orderkey % 3 = 0 THEN 'u' ELSE 'r' END"

ORACLES = {
    "cdc_outbox_route": """
        SELECT 'outbox.event.' || CASE CAST(o_orderkey % 3 AS INT)
                   WHEN 0 THEN 'order' WHEN 1 THEN 'shipment'
                   ELSE 'invoice' END AS topic,
               CAST(o_orderkey AS VARCHAR) AS key,
               CASE CAST(o_orderkey % 3 AS INT)
                   WHEN 0 THEN 'OrderCreated' WHEN 1 THEN 'ShipmentCreated'
                   ELSE 'InvoiceCreated' END AS event_type,
               '{"orderkey":' || CAST(o_orderkey AS VARCHAR)
                 || ',"bucket":' || CAST(o_orderkey % 7 AS VARCHAR)
                 || '}' AS value,
               CAST(o_orderkey % 7 AS BIGINT) AS bucket
        FROM orders
    """,
    # closed-form replay of the planted TOAST schedule: a key appears
    # iff it has any surviving event (%7 deletes drop; %5-and-not-%3
    # keys never emitted anything); note = latest NON-placeholder value
    # (fresh for %9, the snapshot note otherwise) except the
    # started-mid-life %15 keys whose only values were placeholders —
    # those keep the placeholder verbatim (the honest-keep contract)
    "cdc_toast_carry_forward": """
        SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
               CASE WHEN o_orderkey % 9 = 0 THEN 'fresh-' || o_orderkey
                    WHEN o_orderkey % 3 = 0 AND o_orderkey % 5 = 0
                         THEN '__debezium_unavailable_value'
                    ELSE 'note-' || o_orderkey END AS note,
               CASE WHEN o_orderkey % 6 = 0 THEN 'W'
                    WHEN o_orderkey % 9 = 0 THEN 'V'
                    WHEN o_orderkey % 3 = 0 THEN 'U'
                    ELSE o_orderstatus END AS status,
               CASE WHEN o_orderkey % 3 = 0 THEN 'u' ELSE 'r' END AS op,
               CAST(CASE WHEN o_orderkey % 6 = 0 THEN 4000000 + o_orderkey
                         WHEN o_orderkey % 9 = 0 THEN 3000000 + o_orderkey
                         WHEN o_orderkey % 3 = 0 THEN 2000000 + o_orderkey
                         ELSE 1000000 END AS BIGINT) AS ts_ms
        FROM orders
        WHERE o_orderkey % 7 <> 0
          AND (o_orderkey % 5 <> 0 OR o_orderkey % 3 = 0)
    """,
    # closed-form drift facts: the fixture drops o_orderpriority everywhere
    # and adds loyalty_tier on %5 keys, so the detector's JSON-key diff
    # must reproduce these exact counts/offsets (HAVING guards the
    # degenerate empty-group case at tiny SFs)
    "cdc_schema_drift": """
        SELECT 'loyalty_tier' AS field, 'unknown' AS kind,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(MIN(o_orderkey) AS BIGINT) AS first_offset
        FROM orders WHERE o_orderkey % 5 = 0 HAVING COUNT(*) > 0
        UNION ALL
        SELECT 'o_orderpriority', 'missing',
               CAST(COUNT(*) AS BIGINT), CAST(MIN(o_orderkey) AS BIGINT)
        FROM orders HAVING COUNT(*) > 0
    """,
    # snapshot images survive untouched; the hot key's winner is the
    # max-o_orderkey update (ts 5e6+key strictly increasing)
    "cdc_hotkey_state": """
        SELECT o_orderkey AS key, o_orderstatus AS status,
               CAST(1000000 AS BIGINT) AS ts_ms
        FROM orders
        UNION ALL
        SELECT CAST(-1 AS BIGINT), 'H' || CAST(MAX(o_orderkey) % 10 AS VARCHAR),
               CAST(5000000 + MAX(o_orderkey) AS BIGINT)
        FROM orders
    """,
    "cdc_current_state": f"""
        SELECT o_orderkey, o_custkey,
               {_FINAL_STATUS} AS o_orderstatus,
               {_FINAL_PRICE} AS o_totalprice,
               o_orderdate,
               o_orderpriority,
               {_FINAL_OP} AS op,
               {_FINAL_TS} AS ts_ms
        FROM orders WHERE o_orderkey % 7 <> 0
    """,
    "cdc_json_extract_path": f"""
        SELECT o_orderkey,
               {_FINAL_STATUS} AS o_orderstatus,
               {_FINAL_PRICE} AS o_totalprice,
               {_FINAL_TS} AS ts_ms
        FROM orders
    """,
    "cdc_content_route": """
        WITH counts AS (
            SELECT
                CAST((SELECT COUNT(*) FROM orders WHERE o_orderkey % 7 = 0)
                     AS BIGINT) AS n_tomb,
                CAST((SELECT COUNT(*) FROM orders
                      WHERE o_totalprice >= 200000)
                   + 2 * (SELECT COUNT(*) FROM orders
                          WHERE o_orderkey % 3 = 0
                            AND o_totalprice + 100.0 >= 200000)
                   + 2 * (SELECT COUNT(*) FROM orders
                          WHERE o_orderkey % 9 = 0
                            AND o_totalprice + 200.0 >= 200000)
                     AS BIGINT) AS n_high,
                CAST((SELECT COUNT(*) FROM orders)
                   + 2 * (SELECT COUNT(*) FROM orders WHERE o_orderkey % 3 = 0)
                   + 2 * (SELECT COUNT(*) FROM orders WHERE o_orderkey % 9 = 0)
                   + (SELECT COUNT(*) FROM orders WHERE o_orderkey % 7 = 0)
                     AS BIGINT) AS n_all
            FROM (SELECT 1)
        )
        SELECT 'tombstone' AS route, n_tomb AS n_events FROM counts
        UNION ALL
        SELECT 'high-value' AS route, n_high AS n_events FROM counts
        UNION ALL
        SELECT 'default' AS route, n_all - n_tomb - n_high AS n_events
        FROM counts
    """,
    # both renderings of the SAME instant, reconstructed from the part
    # fixture's closed form (created_at = 2024-01-01T00:00:00Z + key
    # seconds, µs-formatted): snapshot ×1 per key, update ×1 on %4 keys
    "cdc_timezone_convert": """
        WITH ev AS (
            SELECT p_partkey AS id, 'r' AS op,
                   CAST(1000000 AS BIGINT) AS ts_ms
            FROM part
            UNION ALL
            SELECT p_partkey, 'u', CAST(2000000 + p_partkey AS BIGINT)
            FROM part WHERE p_partkey % 4 = 0
        )
        SELECT CAST(id AS INT) AS id, op, ts_ms,
               strftime(TIMESTAMP '2024-01-01 00:00:00'
                        + to_seconds(CAST(id AS BIGINT)),
                        '%Y-%m-%dT%H:%M:%S.%f') || 'Z' AS created_at_utc,
               strftime(TIMESTAMP '2024-01-01 00:00:00'
                        + to_seconds(CAST(id AS BIGINT))
                        + INTERVAL 7 HOUR,
                        '%Y-%m-%dT%H:%M:%S.%f') || '+07:00'
                   AS created_at_bkk
        FROM ev
    """,
    # event-multiplicity closed form × the md5-portable bucket recipe
    # (first 15 hex digits of md5(custkey-string) mod 16)
    "cdc_partition_route": """
        WITH ev AS (
            SELECT o_custkey,
                   1 + CASE WHEN o_orderkey % 3 = 0 THEN 2 ELSE 0 END
                     + CASE WHEN o_orderkey % 9 = 0 THEN 2 ELSE 0 END
                     + CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END AS n
            FROM orders
        ),
        b AS (
            SELECT CAST(CAST(concat('0x',
                       substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))
                       AS BIGINT) % 16 AS INT) AS target_partition,
                   o_custkey, n
            FROM ev
        )
        SELECT target_partition,
               CAST(SUM(n) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_keys
        FROM b GROUP BY target_partition
    """,
    # per-shard event multiplicities (shard = key%4) for the routed
    # orders topics; the customer topic passes through untouched
    # (NULL physical id, 1 snapshot event per customer)
    "cdc_shard_route": """
        WITH s AS (
            SELECT CAST(o_orderkey % 4 AS INT) AS shard,
                   1 + CASE WHEN o_orderkey % 3 = 0 THEN 2 ELSE 0 END
                     + CASE WHEN o_orderkey % 9 = 0 THEN 2 ELSE 0 END
                     + CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END AS n
            FROM orders
        )
        SELECT 'poc.public.orders_all' AS topic,
               'poc.public.orders_shard_' || CAST(shard AS VARCHAR)
                   AS physical_table,
               CAST(SUM(n) AS BIGINT) AS n_events,
               CAST(COUNT(*) AS BIGINT) AS n_keys
        FROM s GROUP BY shard
        UNION ALL
        SELECT 'poc.public.customer', NULL,
               CAST(COUNT(*) AS BIGINT), CAST(COUNT(*) AS BIGINT)
        FROM customer
    """,
    # every event's offset from the generator multiplicities (the
    # cdc_multiplex_route closed form); src_region = key%4 map,
    # evt_seq = the offset slot, trace stays header-side (1 left)
    "cdc_header_to_value": """
        WITH ev AS (
            SELECT o_orderkey AS k, o_orderkey * 10 + 0 AS off FROM orders
            UNION ALL SELECT o_orderkey, o_orderkey * 10 + 1
                FROM orders WHERE o_orderkey % 3 = 0
            UNION ALL SELECT o_orderkey, o_orderkey * 10 + 5
                FROM orders WHERE o_orderkey % 3 = 0
            UNION ALL SELECT o_orderkey, o_orderkey * 10 + 2
                FROM orders WHERE o_orderkey % 9 = 0
            UNION ALL SELECT o_orderkey, o_orderkey * 10 + 6
                FROM orders WHERE o_orderkey % 9 = 0
            UNION ALL SELECT o_orderkey, o_orderkey * 10 + 3
                FROM orders WHERE o_orderkey % 7 = 0
        )
        SELECT CAST(off AS BIGINT) AS offset,
               CASE CAST(k % 4 AS INT)
                   WHEN 0 THEN 'us' WHEN 1 THEN 'eu' WHEN 2 THEN 'ap'
                   ELSE 'sa' END AS src_region,
               CAST(off % 10 AS BIGINT) AS evt_seq,
               CAST(1 AS INT) AS n_headers_left
        FROM ev
    """,
    # SetSchemaMetadata: identity rewritten, payload byte-exact (the
    # oracle re-renders the compact JSON the generator emitted)
    "cdc_set_schema_metadata": """
        SELECT o_orderkey,
               'poc.reshaped.orders.Value' AS schema_name,
               CAST(1 AS INT) AS old_version,
               CAST(2 AS INT) AS schema_version,
               '{"o_orderkey":' || CAST(o_orderkey AS VARCHAR)
                   || ',"price":"'
                   || CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)
                   || '"}' AS payload_raw
        FROM orders
    """,
    # schema-change events: latest-wins registry state restated from
    # the DDL-churn closed form (CREATE all, ALTER %3, DROP %5)
    "cdc_schema_history": """
        SELECT 'poc.public.orders_' || CAST(n_nationkey AS VARCHAR)
                   AS table_id,
               CAST(1 + CASE WHEN n_nationkey % 3 = 0 THEN 1 ELSE 0 END
                      + CASE WHEN n_nationkey % 5 = 0 THEN 1 ELSE 0 END
                    AS BIGINT) AS n_changes,
               CASE WHEN n_nationkey % 5 = 0 THEN 'DROP'
                    WHEN n_nationkey % 3 = 0 THEN 'ALTER'
                    ELSE 'CREATE' END AS last_type,
               n_nationkey % 5 <> 0 AS table_exists,
               CASE WHEN n_nationkey % 5 = 0 THEN NULL
                    WHEN n_nationkey % 3 = 0 THEN CAST(5 AS INT)
                    ELSE CAST(4 AS INT) END AS n_columns
        FROM nation
    """,
    # JsonConverter schemas.enable frame: declared type dispatch per
    # version parity; price round-trips decimal-string -> double
    "cdc_json_schema_envelope": """
        SELECT o_orderkey,
               'poc.public.orders.Value' AS schema_name,
               CAST(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 2 END
                    AS INT) AS schema_version,
               CASE WHEN o_orderkey % 2 = 0 THEN 'string'
                    ELSE 'double' END AS price_type,
               CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)
                    AS DOUBLE) AS price,
               CAST(3 AS INT) AS n_fields
        FROM orders
    """,
    # ReselectColumnsPostProcessor: snapshot rows untouched; %3
    # placeholder and %4 NULL events repaired to the CURRENT db-note
    # unless the key is gone from the source (%13 → kept as-is)
    "cdc_reselect_columns": """
        WITH ph AS (SELECT '__debezium_unavailable_value' AS v)
        SELECT CAST(o_orderkey * 10 AS BIGINT) AS offset,
               o_orderkey, 'r' AS op,
               'note-' || CAST(o_orderkey AS VARCHAR) AS note,
               FALSE AS reselected
        FROM orders
        UNION ALL
        SELECT CAST(o_orderkey * 10 + 1 AS BIGINT), o_orderkey, 'u',
               CASE WHEN o_orderkey % 13 <> 0
                    THEN 'db-note-' || CAST(o_orderkey AS VARCHAR)
                    ELSE (SELECT v FROM ph) END,
               o_orderkey % 13 <> 0
        FROM orders WHERE o_orderkey % 3 = 0
        UNION ALL
        SELECT CAST(o_orderkey * 10 + 2 AS BIGINT), o_orderkey, 'u',
               CASE WHEN o_orderkey % 13 <> 0
                    THEN 'db-note-' || CAST(o_orderkey AS VARCHAR)
                    ELSE NULL END,
               o_orderkey % 13 <> 0
        FROM orders WHERE o_orderkey % 4 = 0
    """,
    # InsertHeader + DropHeaders: offsets from the generator
    # multiplicities; pipeline = the inserted literal, src_region
    # survives the scrub, key set is exactly {pipeline, src_region}
    "cdc_header_ops": """
        WITH ev AS (
            SELECT o_orderkey AS k, o_orderkey * 10 + 0 AS off FROM orders
            UNION ALL SELECT o_orderkey, o_orderkey * 10 + 1
                FROM orders WHERE o_orderkey % 3 = 0
            UNION ALL SELECT o_orderkey, o_orderkey * 10 + 5
                FROM orders WHERE o_orderkey % 3 = 0
            UNION ALL SELECT o_orderkey, o_orderkey * 10 + 2
                FROM orders WHERE o_orderkey % 9 = 0
            UNION ALL SELECT o_orderkey, o_orderkey * 10 + 6
                FROM orders WHERE o_orderkey % 9 = 0
            UNION ALL SELECT o_orderkey, o_orderkey * 10 + 3
                FROM orders WHERE o_orderkey % 7 = 0
        )
        SELECT CAST(off AS BIGINT) AS offset,
               'cdc-poc' AS pipeline,
               CASE CAST(k % 4 AS INT)
                   WHEN 0 THEN 'us' WHEN 1 THEN 'eu' WHEN 2 THEN 'ap'
                   ELSE 'sa' END AS src_region,
               'pipeline,src_region' AS header_keys
        FROM ev
    """,
    # RegexRouter: orders topic renamed by the anchored capture-group
    # substitution, customer passes through; counts from the generator
    # multiplicities, partitions from the key-mod-8 plane
    "cdc_regex_router": """
        SELECT 'cdc_orders' AS topic,
               CAST((SELECT COUNT(*) FROM orders)
                  + 2 * (SELECT COUNT(*) FROM orders WHERE o_orderkey % 3 = 0)
                  + 2 * (SELECT COUNT(*) FROM orders WHERE o_orderkey % 9 = 0)
                  + (SELECT COUNT(*) FROM orders WHERE o_orderkey % 7 = 0)
                  AS BIGINT) AS n_events,
               CAST((SELECT COUNT(DISTINCT o_orderkey % 8) FROM orders)
                  AS BIGINT) AS n_partitions
        UNION ALL
        SELECT 'poc.public.customer',
               CAST((SELECT COUNT(*) FROM customer) AS BIGINT),
               CAST((SELECT COUNT(DISTINCT c_custkey % 8) FROM customer)
                  AS BIGINT)
    """,
    # ValueToKey: every event re-keyed to its customer; per-key counts
    # from the multiplicities, key rendered exactly as to_json does
    "cdc_value_to_key": """
        WITH ev AS (
            SELECT o_custkey,
                   1 + CASE WHEN o_orderkey % 3 = 0 THEN 2 ELSE 0 END
                     + CASE WHEN o_orderkey % 9 = 0 THEN 2 ELSE 0 END
                     + CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END AS n
            FROM orders
        )
        SELECT '{"o_custkey":' || CAST(o_custkey AS VARCHAR) || '}' AS key,
               CAST(SUM(n) AS BIGINT) AS n_events
        FROM ev GROUP BY o_custkey
    """,
    "cdc_cast_smt": """
        SELECT CAST(o_orderkey AS VARCHAR) AS o_orderkey,
               CAST(o_custkey AS INT) AS o_custkey,
               CAST(o_totalprice AS DOUBLE) AS o_totalprice
        FROM orders
    """,
    "cdc_replace_field": """
        SELECT o_orderkey, o_custkey, o_orderstatus AS status,
               epoch_us(o_orderdate) AS order_date_us
        FROM orders
    """,
    # Flatten: all five envelope leaves per event from the generator's
    # 6-class closed form, keyed by offset
    "cdc_flatten": """
        WITH ev AS (
            SELECT o_orderkey * 10 AS off, CAST(NULL AS BIGINT) AS bef,
                   o_orderkey AS aft, CAST(1000000 AS BIGINT) AS ts,
                   'r' AS op
            FROM orders
            UNION ALL SELECT o_orderkey * 10 + 1, o_orderkey, o_orderkey,
                   2000000 + o_orderkey, 'u'
                FROM orders WHERE o_orderkey % 3 = 0
            UNION ALL SELECT o_orderkey * 10 + 5, o_orderkey, o_orderkey,
                   2000000 + o_orderkey, 'u'
                FROM orders WHERE o_orderkey % 3 = 0
            UNION ALL SELECT o_orderkey * 10 + 2, o_orderkey, o_orderkey,
                   3000000 + o_orderkey, 'u'
                FROM orders WHERE o_orderkey % 9 = 0
            UNION ALL SELECT o_orderkey * 10 + 6, o_orderkey, o_orderkey,
                   3000000 + o_orderkey, 'u'
                FROM orders WHERE o_orderkey % 9 = 0
            UNION ALL SELECT o_orderkey * 10 + 3, o_orderkey,
                   CAST(NULL AS BIGINT), 4000000 + o_orderkey, 'd'
                FROM orders WHERE o_orderkey % 7 = 0
        )
        SELECT CAST(off AS BIGINT) AS offset,
               bef AS payload_before_o_orderkey,
               aft AS payload_after_o_orderkey,
               CAST(ts AS BIGINT) AS payload_source_ts_ms,
               op AS payload_op,
               CAST(ts AS BIGINT) AS payload_ts_ms
        FROM ev
    """,
    # InsertField: all four metadata planes per event (partition =
    # key mod 8, record time = event-date ms + slot)
    "cdc_insert_field": """
        WITH ev AS (
            SELECT o_orderkey AS k, o_orderkey * 10 AS off, 0 AS slot,
                   o_orderdate
            FROM orders
            UNION ALL SELECT o_orderkey, o_orderkey * 10 + 1, 1, o_orderdate
                FROM orders WHERE o_orderkey % 3 = 0
            UNION ALL SELECT o_orderkey, o_orderkey * 10 + 5, 5, o_orderdate
                FROM orders WHERE o_orderkey % 3 = 0
            UNION ALL SELECT o_orderkey, o_orderkey * 10 + 2, 2, o_orderdate
                FROM orders WHERE o_orderkey % 9 = 0
            UNION ALL SELECT o_orderkey, o_orderkey * 10 + 6, 6, o_orderdate
                FROM orders WHERE o_orderkey % 9 = 0
            UNION ALL SELECT o_orderkey, o_orderkey * 10 + 3, 3, o_orderdate
                FROM orders WHERE o_orderkey % 7 = 0
        )
        SELECT CAST(off AS BIGINT) AS offset,
               'poc-cdc' AS source_system,
               'poc.public.orders' AS __kafka_topic,
               CAST(k % 8 AS INT) AS __kafka_partition,
               CAST(off AS BIGINT) AS __kafka_offset,
               make_timestamp((epoch_us(o_orderdate) // 1000 + slot) * 1000)
                   AS __kafka_ts
        FROM ev
    """,
    # TimestampRouter: daily topics from the record-time plane with the
    # same ms arithmetic (slot offset included — midnight edges agree)
    "cdc_timestamp_router": """
        WITH ev AS (
            SELECT 0 AS slot, o_orderdate FROM orders
            UNION ALL SELECT 1, o_orderdate
                FROM orders WHERE o_orderkey % 3 = 0
            UNION ALL SELECT 5, o_orderdate
                FROM orders WHERE o_orderkey % 3 = 0
            UNION ALL SELECT 2, o_orderdate
                FROM orders WHERE o_orderkey % 9 = 0
            UNION ALL SELECT 6, o_orderdate
                FROM orders WHERE o_orderkey % 9 = 0
            UNION ALL SELECT 3, o_orderdate
                FROM orders WHERE o_orderkey % 7 = 0
        )
        SELECT 'poc.public.orders-' || strftime(
                   make_timestamp((epoch_us(o_orderdate) // 1000 + slot)
                                  * 1000),
                   '%Y%m%d') AS topic,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM ev GROUP BY 1
    """,
    # HoistField: exact to_json nesting of the hoisted struct, offset
    # (snapshot slot 0 = key·10) left top-level
    "cdc_hoist_field": """
        SELECT CAST(o_orderkey * 10 AS BIGINT) AS offset,
               '{"o_orderkey":' || CAST(o_orderkey AS VARCHAR)
               || ',"o_custkey":' || CAST(o_custkey AS VARCHAR)
               || ',"o_orderstatus":"' || o_orderstatus || '"}'
                   AS order_json
        FROM orders
    """,
    # TimestampConverter: µs-int64 → Timestamp / rendered string /
    # epoch-ms / string-parse round-trip, all UTC
    "cdc_timestamp_converter": """
        SELECT o_orderkey,
               make_timestamp(epoch_us(o_orderdate)) AS od_ts,
               strftime(make_timestamp(epoch_us(o_orderdate)),
                        '%Y-%m-%d %H:%M:%S.%f') AS od_str,
               CAST(epoch_us(o_orderdate) // 1000 AS BIGINT) AS od_ms,
               make_timestamp(epoch_us(o_orderdate)) AS od_rt
        FROM orders
    """,
    # Filter + predicates: tombstones dropped (delete count must NOT
    # inflate n_events), customer topic dropped (no second row)
    "cdc_filter_predicate": """
        SELECT 'poc.public.orders' AS topic,
               CAST((SELECT COUNT(*) FROM orders)
                  + 2 * (SELECT COUNT(*) FROM orders WHERE o_orderkey % 3 = 0)
                  + 2 * (SELECT COUNT(*) FROM orders WHERE o_orderkey % 9 = 0)
                  + (SELECT COUNT(*) FROM orders WHERE o_orderkey % 7 = 0)
                  AS BIGINT) AS n_events,
               CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_keys
    """,
    "cdc_changed_columns": """
        SELECT 'o_totalprice' AS column_name,
               CAST(2 * (SELECT COUNT(*) FROM orders WHERE o_orderkey % 3 = 0)
                  + 2 * (SELECT COUNT(*) FROM orders WHERE o_orderkey % 9 = 0)
                  AS BIGINT) AS n_changes
        UNION ALL
        SELECT 'o_orderstatus' AS column_name,
               CAST(2 * (SELECT COUNT(*) FROM orders
                         WHERE o_orderkey % 3 = 0 AND o_orderstatus <> 'U')
                  + 2 * (SELECT COUNT(*) FROM orders WHERE o_orderkey % 9 = 0)
                  AS BIGINT) AS n_changes
    """,
    "cdc_rewrite_mode": """
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN o_orderstatus
                    WHEN o_orderkey % 9 = 0 THEN 'V'
                    WHEN o_orderkey % 3 = 0 THEN 'U'
                    ELSE o_orderstatus END AS o_orderstatus,
               CAST(CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice
                    WHEN o_orderkey % 9 = 0 THEN o_totalprice + 200.0
                    WHEN o_orderkey % 3 = 0 THEN o_totalprice + 100.0
                    ELSE o_totalprice END AS DOUBLE) AS o_totalprice,
               (o_orderkey % 7 = 0) AS __deleted
        FROM orders
    """,
    # Connect DLQ: poison offsets (%101) from the multiplicities, all
    # context planes restated; value_len 10 = the plant's truncation
    "cdc_connect_dlq": """
        WITH ev AS (
            SELECT o_orderkey AS k, o_orderkey * 10 + 0 AS off FROM orders
            UNION ALL SELECT o_orderkey, o_orderkey * 10 + 1
                FROM orders WHERE o_orderkey % 3 = 0
            UNION ALL SELECT o_orderkey, o_orderkey * 10 + 5
                FROM orders WHERE o_orderkey % 3 = 0
            UNION ALL SELECT o_orderkey, o_orderkey * 10 + 2
                FROM orders WHERE o_orderkey % 9 = 0
            UNION ALL SELECT o_orderkey, o_orderkey * 10 + 6
                FROM orders WHERE o_orderkey % 9 = 0
            UNION ALL SELECT o_orderkey, o_orderkey * 10 + 3
                FROM orders WHERE o_orderkey % 7 = 0
        )
        SELECT 'dlq.poc-connector' AS dlq_topic,
               'poc.public.orders' AS err_topic,
               CAST(k % 8 AS INT) AS err_partition,
               CAST(off AS BIGINT) AS err_offset,
               'VALUE_CONVERTER' AS err_stage,
               'org.apache.kafka.connect.errors.DataException' AS err_class,
               CAST(7 AS INT) AS n_headers,
               CAST(10 AS INT) AS value_len
        FROM ev WHERE off % 101 = 0
    """,
    # truncate.to.12.chars + mask.with.6.chars, restated from customer
    "cdc_truncated_columns": """
        SELECT c_custkey,
               substring(c_name, 1, 12) AS c_name,
               CAST(LEAST(length(c_name), 12) AS INT) AS name_len,
               CASE WHEN c_mktsegment IS NOT NULL THEN '******' END
                   AS c_mktsegment,
               CAST(c_acctbal AS DOUBLE) AS c_acctbal
        FROM customer
    """,
    "cdc_masked_customers": """
        SELECT c_custkey,
               sha256(c_name) AS c_name,
               CAST(c_nationkey AS INT) AS c_nationkey,
               CAST(c_acctbal AS DOUBLE) AS c_acctbal,
               c_mktsegment
        FROM customer
    """,
    "products_usable_vw": """
        SELECT CAST(p_partkey AS INT) AS id,
               p_name AS name,
               CAST(CASE WHEN p_partkey % 4 = 0 THEN p_retailprice + 50.0
                         ELSE p_retailprice END AS DOUBLE) AS price,
               CAST(p_size AS INT) AS stock_quantity,
               TIMESTAMP '2024-01-01 00:00:00' + to_seconds(p_partkey) AS created_at
        FROM part
        WHERE p_partkey % 11 <> 0
    """,
    "silver_cross_table_revenue": f"""
        WITH orders_cur AS (
            SELECT o_custkey, {_FINAL_PRICE} AS o_totalprice
            FROM orders WHERE o_orderkey % 7 <> 0
        )
        SELECT c.c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(SUM(o.o_totalprice), 2) AS revenue
        FROM orders_cur o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
    """,
    # first event per key = the snapshot read (ts 1e6, unmodified image)
    "cdc_first_image": """
        SELECT o_orderkey, o_orderstatus,
               CAST(o_totalprice AS DOUBLE) AS o_totalprice,
               'r' AS op, CAST(1000000 AS BIGINT) AS ts_ms
        FROM orders
    """,
    "cdc_multiplex_route": """
        WITH ev AS (
            SELECT 'orders' AS dest_table, o_orderkey * 10 + 0 AS off FROM orders
            UNION ALL SELECT 'orders', o_orderkey * 10 + 1 FROM orders WHERE o_orderkey % 3 = 0
            UNION ALL SELECT 'orders', o_orderkey * 10 + 5 FROM orders WHERE o_orderkey % 3 = 0
            UNION ALL SELECT 'orders', o_orderkey * 10 + 2 FROM orders WHERE o_orderkey % 9 = 0
            UNION ALL SELECT 'orders', o_orderkey * 10 + 6 FROM orders WHERE o_orderkey % 9 = 0
            UNION ALL SELECT 'orders', o_orderkey * 10 + 3 FROM orders WHERE o_orderkey % 7 = 0
            UNION ALL SELECT 'customer', c_custkey * 10 FROM customer
        )
        SELECT dest_table, CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(MAX(off) AS BIGINT) AS max_offset
        FROM ev GROUP BY dest_table
    """,
    # prev state (ts ≤ 3e6) vs final: %9 keys updated again → 'u' with the
    # +200/V image; %7 keys deleted → 'd' with NULL image; rest unchanged
    "cdc_change_feed": """
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN 'd' ELSE 'u' END AS change_op,
               CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE 'V' END AS o_orderstatus,
               CASE WHEN o_orderkey % 7 = 0 THEN NULL
                    ELSE CAST(o_totalprice + 200.0 AS DOUBLE) END AS o_totalprice
        FROM orders
        WHERE o_orderkey % 7 = 0 OR o_orderkey % 9 = 0
    """,
    "cdc_deadletter_stats": """
        WITH ev AS (
            SELECT o_orderkey * 10 + 0 AS offset_num FROM orders
            UNION ALL SELECT o_orderkey * 10 + 1 FROM orders WHERE o_orderkey % 3 = 0
            UNION ALL SELECT o_orderkey * 10 + 5 FROM orders WHERE o_orderkey % 3 = 0
            UNION ALL SELECT o_orderkey * 10 + 2 FROM orders WHERE o_orderkey % 9 = 0
            UNION ALL SELECT o_orderkey * 10 + 6 FROM orders WHERE o_orderkey % 9 = 0
            UNION ALL SELECT o_orderkey * 10 + 3 FROM orders WHERE o_orderkey % 7 = 0
        )
        SELECT side, CAST(COUNT(*) AS BIGINT) AS n FROM (
            SELECT CASE WHEN offset_num % 101 = 0 THEN 'dead' ELSE 'good' END AS side
            FROM ev)
        GROUP BY side
    """,
    "cdc_bronze_stats": """
        WITH ev AS (
            SELECT CAST(o_orderkey % 8 AS VARCHAR) AS partition_str,
                   1 + 2 * CAST(o_orderkey % 3 = 0 AS INT)
                     + 2 * CAST(o_orderkey % 9 = 0 AS INT)
                     + CAST(o_orderkey % 7 = 0 AS INT) AS n,
                   o_orderkey * 10 + CASE WHEN o_orderkey % 9 = 0 THEN 6
                                          WHEN o_orderkey % 3 = 0 THEN 5
                                          WHEN o_orderkey % 7 = 0 THEN 3
                                          ELSE 0 END AS max_off
            FROM orders
        )
        SELECT partition_str,
               CAST(SUM(n) AS BIGINT) AS n_events,
               CAST(MAX(max_off) AS BIGINT) AS max_offset
        FROM ev GROUP BY partition_str
    """,
}
