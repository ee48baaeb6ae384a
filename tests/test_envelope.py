"""Envelope schema + synthetic CDC generator tests (S1/S4/P2/P3/T2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_debezium_clickhouse_spark.schemas import (
    ORDERS_ENVELOPE,
    TABLE_REGISTRY,
    envelope_schema,
    key_schema,
)
from postgres_debezium_clickhouse_spark.sources.cdc import (
    bronze_projection,
    orders_cdc_events,
    parse_envelope,
)
from postgres_debezium_clickhouse_spark.streaming.pipeline import corrupt_filter
from pyspark.sql import types as T


def test_generator_event_mix(spark, sf_dir):
    ev = orders_cdc_events(spark, sf_dir)
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    parsed = parse_envelope(ev, ORDERS_ENVELOPE)
    ops = {r.op: r.n for r in parsed.groupBy(F.col("j.payload.op").alias("op")).agg(F.count("*").alias("n")).collect()}
    assert ops["r"] == n_orders                      # snapshot covers every row (T5)
    assert ops["u"] > 0 and ops["d"] > 0
    # duplicate delivery: updates emitted twice at distinct offsets
    upd = parsed.filter(F.col("j.payload.op") == "u")
    assert upd.count() == 2 * upd.dropDuplicates(["value"]).count()


def test_envelope_roundtrip_fields(spark, sf_dir):
    parsed = parse_envelope(orders_cdc_events(spark, sf_dir), ORDERS_ENVELOPE)
    row = parsed.filter(F.col("j.payload.op") == "r").select(
        "j.payload.after.o_orderkey", "j.payload.source.ts_ms", "j.payload.source.table",
        "j.payload.before",
    ).first()
    assert row.o_orderkey is not None
    assert row.ts_ms == 1_000_000
    assert row.table == "orders"
    assert row.before is None  # snapshot rows carry no before image


def test_delete_carries_full_before_image(spark, sf_dir):
    """REPLICA IDENTITY FULL (init_postgresql_data.sql:73-75): deletes ship
    the complete old row in ``before`` and a null ``after``."""
    parsed = parse_envelope(orders_cdc_events(spark, sf_dir), ORDERS_ENVELOPE)
    d = parsed.filter(F.col("j.payload.op") == "d").select("j.payload.*").first()
    assert d.after is None
    assert d.before.o_orderkey is not None and d.before.o_totalprice is not None


def test_corrupt_messages_split_not_crash(spark):
    """T2 — kafka_skip_broken_messages equivalent: PERMISSIVE parse routes
    poison messages to the dead-letter side."""
    good = '{"payload": {"op": "c", "ts_ms": 5}}'
    records = spark.createDataFrame([(good,), ("NOT JSON {",), (None,)], ["value"])
    parsed = records.withColumn("j", F.from_json("value", ORDERS_ENVELOPE))
    ok, dead = corrupt_filter(parsed)
    assert ok.count() == 1
    assert dead.count() == 2


def test_key_schema_parse(spark):
    ks = key_schema([("id", T.IntegerType())])
    df = spark.createDataFrame([('{"payload": {"id": 4}}',)], ["key"])
    assert df.select(F.from_json("key", ks).alias("k")).first().k.payload.id == 4


def test_registry_covers_envelope(spark):
    for name, spec in TABLE_REGISTRY.items():
        env = envelope_schema(spec["row"])
        names = env["payload"].dataType.fieldNames()
        assert set(names) == {"before", "after", "source", "op", "ts_ms", "transaction"}
        assert all(k in [f.name for f in spec["row"].fields] for k in spec["keys"])


def test_bronze_projection_filters_empties(spark):
    records = spark.createDataFrame(
        [("x", "{}", 0, 1), ("y", "", 0, 2), ("z", None, 1, 3)],
        ["key", "value", "partition", "offset"],
    )
    out = bronze_projection(records)
    rows = out.collect()
    assert [r.offset_num for r in rows] == [1]
    assert rows[0].ingestion_time is not None


def test_wire_cache_invalidates_when_fixture_changes(spark, tmp_path):
    """The materialized wire log must rebuild when the base fixture is
    regenerated in place — path identity alone would serve stale events."""
    import shutil

    from pyspark.sql import functions as F

    from postgres_debezium_clickhouse_spark.sources.cdc import orders_cdc_events

    fixture_dir = tmp_path / "sfx"
    fixture_dir.mkdir()
    src = spark.range(1, 20).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 5).alias("o_custkey"),
        F.lit("O").alias("o_orderstatus"),
        (F.col("id") * 10.0).alias("o_totalprice"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("o_orderdate"),
        F.lit("1-URGENT").alias("o_orderpriority"),
    )
    src.coalesce(1).write.mode("overwrite").parquet(str(fixture_dir / "orders.parquet"))
    n1 = orders_cdc_events(spark, str(fixture_dir)).count()

    # regenerate the fixture IN PLACE with more rows
    src2 = spark.range(1, 40).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 5).alias("o_custkey"),
        F.lit("O").alias("o_orderstatus"),
        (F.col("id") * 10.0).alias("o_totalprice"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("o_orderdate"),
        F.lit("1-URGENT").alias("o_orderpriority"),
    )
    tmp_out = fixture_dir / "orders_new.parquet"
    src2.coalesce(1).write.mode("overwrite").parquet(str(tmp_out))
    shutil.rmtree(fixture_dir / "orders.parquet")
    tmp_out.rename(fixture_dir / "orders.parquet")

    n2 = orders_cdc_events(spark, str(fixture_dir)).count()
    assert n2 > n1  # stale cache would have returned n1 again


def test_pruned_envelope_parse_is_bit_identical(spark, sf_dir):
    """r7 regression guard for schemas.pruned_envelope: parsing with the
    pruned schema must extract values bit-identical to the full-envelope
    parse for every field the pruned schema keeps — pruning may only skip
    subtrees, never change what a kept path yields."""
    from pyspark.sql import functions as F

    from postgres_debezium_clickhouse_spark.schemas import (
        ORDERS_CDC_ROW,
        ORDERS_ENVELOPE,
        pruned_envelope,
    )
    from postgres_debezium_clickhouse_spark.sources.cdc import (
        orders_cdc_events,
        parse_envelope,
    )

    pruned = pruned_envelope(
        ORDERS_CDC_ROW, after=None, before=["o_orderkey"], source=["ts_ms"]
    )
    ev = orders_cdc_events(spark, sf_dir)
    p = F.col("j.payload")
    cols = [
        F.coalesce(p.after.o_orderkey, p.before.o_orderkey).alias("k"),
        p.after.o_orderstatus.alias("st"),
        p.after.o_totalprice.alias("pr"),
        p.op.alias("op"),
        p.source.ts_ms.alias("ts"),
        F.col("offset"),
    ]
    key = lambda r: tuple((x is None, str(x)) for x in r)  # noqa: E731
    full_rows = sorted(map(tuple, parse_envelope(ev, ORDERS_ENVELOPE).select(*cols).collect()), key=key)
    pruned_rows = sorted(map(tuple, parse_envelope(ev, pruned).select(*cols).collect()), key=key)
    assert full_rows == pruned_rows


def test_pruned_envelope_rejects_unknown_fields():
    import pytest

    from postgres_debezium_clickhouse_spark.schemas import (
        ORDERS_CDC_ROW,
        pruned_envelope,
    )

    with pytest.raises(ValueError, match="unknown envelope fields"):
        pruned_envelope(ORDERS_CDC_ROW, before=["nope"])


def test_pruned_envelope_random_subsets_extract_identically(spark, sf_dir):
    """Property: for ANY subset of after/before/source fields, the pruned
    parse yields the same values for the kept paths as the full parse.
    Hypothesis drives the subset choice; one shared parsed-full baseline
    keeps the test fast."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F

    from postgres_debezium_clickhouse_spark.schemas import (
        ORDERS_CDC_ROW,
        ORDERS_ENVELOPE,
        SOURCE_STRUCT,
        pruned_envelope,
    )
    from postgres_debezium_clickhouse_spark.sources.cdc import (
        orders_cdc_events,
        parse_envelope,
    )

    row_fields = [f.name for f in ORDERS_CDC_ROW.fields]
    src_fields = [f.name for f in SOURCE_STRUCT.fields]
    ev = orders_cdc_events(spark, sf_dir).limit(200).localCheckpoint(eager=True)

    def extract(env, after, before, source):
        p = F.col("j.payload")
        cols = [F.col("offset")]
        for f in after:
            cols.append(p.after.getField(f).alias(f"a_{f}"))
        for f in before:
            cols.append(p.before.getField(f).alias(f"b_{f}"))
        for f in source:
            cols.append(p.source.getField(f).alias(f"s_{f}"))
        rows = parse_envelope(ev, env).select(*cols).collect()
        key = lambda r: tuple((x is None, str(x)) for x in r)  # noqa: E731
        return sorted(map(tuple, rows), key=key)

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        after=st.sets(st.sampled_from(row_fields), min_size=1),
        before=st.sets(st.sampled_from(row_fields)),
        source=st.sets(st.sampled_from(src_fields), min_size=1),
    )
    def prop(after, before, source):
        env = pruned_envelope(
            ORDERS_CDC_ROW, after=sorted(after), before=sorted(before),
            source=sorted(source),
        )
        a, b, s = sorted(after), sorted(before), sorted(source)
        # before=() omits the struct — only compare when kept
        assert extract(env, a, b, s) == extract(ORDERS_ENVELOPE, a, b, s)

    prop()


def test_flagship_plan_parses_pruned_schema(spark, sf_dir):
    """Regression pin for the r7 CPU win: cdc_current_state's optimized
    plan must parse with the PRUNED envelope — no `transaction` subtree,
    no source fields beyond ts_ms, before-image limited to the key.  A
    revert to the registered full envelope would silently re-decode ~40%
    more of every message at 100 TB."""
    from postgres_debezium_clickhouse_spark.plans.cdc_queries import cdc_current_state

    plan = (
        cdc_current_state(spark, sf_dir)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    i = plan.find("from_json")
    assert i >= 0
    frag = plan[i : plan.index(" AS ", i)]
    assert "transaction" not in frag
    assert frag.count("ts_ms") == 1          # source.ts_ms only
    assert "txId" not in frag and "lsn" not in frag
    # before image = the key only
    before = frag[frag.index("before") : frag.index("after")]
    assert "o_orderkey" in before and "o_orderstatus" not in before
