"""SMT transform tests (P6/P8/P9/P10 — abcsvb-connector-secure.json:31-49)."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_debezium_clickhouse_spark.operators.transforms import (
    check_violations,
    mask_fields,
    sanitize_field_names,
    unwrap_envelope,
)
from postgres_debezium_clickhouse_spark.schemas import ORDERS_ENVELOPE
from postgres_debezium_clickhouse_spark.sources.cdc import orders_cdc_events, parse_envelope


def test_unwrap_drop_deletes(spark, sf_dir):
    parsed = parse_envelope(orders_cdc_events(spark, sf_dir), ORDERS_ENVELOPE)
    out = unwrap_envelope(parsed, drop_deletes=True)
    assert "__op" in out.columns and "o_orderkey" in out.columns
    assert out.filter(F.col("__op") == "d").count() == 0
    assert out.filter(F.col("__table") != "orders").count() == 0


def test_unwrap_rewrite_keeps_deletes_with_before_image(spark, sf_dir):
    parsed = parse_envelope(orders_cdc_events(spark, sf_dir), ORDERS_ENVELOPE)
    out = unwrap_envelope(parsed, drop_deletes=False)
    dels = out.filter(F.col("__deleted"))
    assert dels.count() > 0
    assert dels.filter(F.col("o_orderkey").isNull()).count() == 0  # image from before


def test_mask_fields_hash_and_literal(spark):
    df = spark.createDataFrame([(1, "alice", "x")], ["id", "name", "other"])
    h = mask_fields(df, ["name", "missing_col"], mode="hash").first()
    assert len(h.name) == 64 and h.other == "x"  # sha2-256 hex, others untouched
    lit = mask_fields(df, ["name"], mode="literal").first()
    assert lit.name == "***"


def test_mask_deterministic_joinable(spark):
    """hash mode must stay joinable: equal plaintext → equal mask."""
    df = spark.createDataFrame([(1, "bob"), (2, "bob"), (3, "eve")], ["id", "name"])
    out = mask_fields(df, ["name"]).groupBy("name").count().collect()
    assert sorted(r["count"] for r in out) == [1, 2]


def test_sanitize_field_names(spark):
    df = spark.createDataFrame([(1, 2)], ["weird name!", "ok_col"])
    assert sanitize_field_names(df).columns == ["weird_name_", "ok_col"]


def test_check_violations(spark):
    df = spark.createDataFrame([(5, 1.0), (0, -2.0), (3, None)], ["quantity", "unit_price"])
    out = check_violations(
        df,
        {
            "quantity_pos": F.col("quantity") > 0,
            "price_nonneg": F.col("unit_price") >= 0,
        },
    ).collect()
    assert [r["__valid"] for r in out] == [True, False, False]
    assert out[1].quantity_pos is False and out[0].price_nonneg is True


def test_diff_states_classifies_all_ops(spark):
    from postgres_debezium_clickhouse_spark.operators.transforms import diff_states

    prev = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["id", "s", "v"]
    )
    nxt = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (4, "d", 40.0)], ["id", "s", "v"]
    )
    out = {r.id: (r.change_op, r.s) for r in diff_states(prev, nxt, ["id"]).collect()}
    # 1 unchanged -> absent; 2 updated; 3 deleted (NULL image); 4 created
    assert out == {2: ("u", "B"), 3: ("d", None), 4: ("c", "d")}


def test_change_feed_round_trip(spark):
    """Algebraic contract: applying the diff to prev reproduces next."""
    import random as _random

    from postgres_debezium_clickhouse_spark.operators.transforms import (
        apply_change_feed,
        diff_states,
    )

    rng = _random.Random(7)
    prev_rows = [(i, rng.choice("abc"), float(rng.randint(0, 5))) for i in range(80)]
    # next: drop some keys, mutate some, add new ones
    nxt_rows = [
        (i, rng.choice("abc"), float(rng.randint(0, 5)))
        for i in range(80) if rng.random() > 0.2
    ] + [(i, "new", 1.0) for i in range(100, 110)]
    prev = spark.createDataFrame(prev_rows, ["id", "s", "v"])
    nxt = spark.createDataFrame(nxt_rows, ["id", "s", "v"])

    delta = diff_states(prev, nxt, ["id"])
    rebuilt = apply_change_feed(prev, delta, ["id"])
    assert sorted(map(tuple, rebuilt.collect())) == sorted(map(tuple, nxt.collect()))


def test_schema_drift_report_detects_and_stays_silent(spark):
    """Unknown/missing fields surface with counts + first offsets;
    tombstones (no after image) are skipped; zero drift → ZERO rows (the
    no-news-is-no-rows contract that makes the report alert-able)."""
    from postgres_debezium_clickhouse_spark.operators.transforms import (
        schema_drift_report,
    )

    rows = [
        (10, '{"payload":{"after":{"id":1,"val":"a","extra":1}}}'),
        (11, '{"payload":{"after":{"id":2,"val":"b"}}}'),
        (12, '{"payload":{"after":{"id":3,"extra":2}}}'),   # also missing val
        (13, '{"payload":{"after":null}}'),                  # tombstone: skipped
    ]
    raw = spark.createDataFrame(rows, ["offset", "value"])
    out = {(r.field, r.kind): r for r in schema_drift_report(raw, ["id", "val"]).collect()}
    assert set(out) == {("extra", "unknown"), ("val", "missing")}
    assert out[("extra", "unknown")].n_rows == 2
    assert out[("extra", "unknown")].first_offset == 10
    assert out[("val", "missing")].n_rows == 1
    assert out[("val", "missing")].first_offset == 12

    clean = spark.createDataFrame(rows[1:2], ["offset", "value"])
    assert schema_drift_report(clean, ["id", "val"]).count() == 0


def test_split_on_drift_quarantine_and_widen_policies(spark):
    """The drift POLICY hook: quarantine routes unknown-field events to
    the dead-letter frame (verbatim, replayable) while conforming rows —
    including tombstones and rows with MISSING fields — keep flowing;
    widen quarantines nothing (additive evolution downstream)."""
    import pytest as _pytest

    from postgres_debezium_clickhouse_spark.operators.transforms import (
        split_on_drift,
    )

    rows = [
        (10, '{"payload":{"after":{"id":1,"val":"a","extra":1}}}'),  # drifted
        (11, '{"payload":{"after":{"id":2,"val":"b"}}}'),            # conforming
        (12, '{"payload":{"after":{"id":3}}}'),      # missing val: conforming
        (13, '{"payload":{"after":null}}'),          # tombstone: conforming
    ]
    raw = spark.createDataFrame(rows, ["offset", "value"])

    ok, bad = split_on_drift(raw, ["id", "val"], policy="quarantine")
    assert sorted(r.offset for r in ok.collect()) == [11, 12, 13]
    quarantined = bad.collect()
    assert [r.offset for r in quarantined] == [10]
    # dead-letter rows are the ORIGINAL wire bytes — replayable as-is
    assert quarantined[0].value == rows[0][1]
    assert ok.columns == raw.columns and bad.columns == raw.columns

    ok_w, bad_w = split_on_drift(raw, ["id", "val"], policy="widen")
    assert ok_w.count() == 4 and bad_w.count() == 0

    with _pytest.raises(ValueError, match="policy"):
        split_on_drift(raw, ["id", "val"], policy="dropit")


def test_timezone_convert_fields_fixed_offsets(spark):
    """r15 TimezoneConverter SMT analogue: same instant, re-rendered at
    the target fixed offset; inputs may carry Z or any explicit offset;
    NULLs pass through; epoch-integer columns are out of scope by the
    fields list; malformed zones refuse loudly."""
    import pytest as _pytest

    from postgres_debezium_clickhouse_spark.operators.transforms import (
        timezone_convert_fields,
    )

    df = spark.createDataFrame(
        [
            (1, "2024-01-01T00:00:05.000000Z"),
            (2, None),
            (3, "2024-06-01T23:30:00.000000+02:00"),
        ],
        "id long, created_at string",
    )
    got = {r.id: r.created_at for r in
           timezone_convert_fields(df, ["created_at"], "+07:00").collect()}
    assert got[1] == "2024-01-01T07:00:05.000000+07:00"
    assert got[2] is None
    # 23:30+02:00 = 21:30Z = next day 04:30+07:00 — instant preserved
    assert got[3] == "2024-06-02T04:30:00.000000+07:00"
    neg = {r.id: r.created_at for r in
           timezone_convert_fields(df, ["created_at"], "-03:30").collect()}
    assert neg[1] == "2023-12-31T20:30:05.000000-03:30"
    z = {r.id: r.created_at for r in
         timezone_convert_fields(df, ["created_at"], "Z").collect()}
    assert z[3] == "2024-06-01T21:30:00.000000Z"
    with _pytest.raises(ValueError, match="fixed offset"):
        timezone_convert_fields(df, ["created_at"], "Asia/Bangkok")


def test_partition_route_deterministic_and_bounded(spark):
    """r15 PartitionRouting SMT analogue: stable md5-portable buckets in
    [0, n); NULL fields hash as the '__null' literal (same entity class
    always co-locates); multi-field routing differs from single-field."""
    import pytest as _pytest

    from postgres_debezium_clickhouse_spark.operators.transforms import (
        partition_route,
    )

    df = spark.createDataFrame(
        [(1, "A"), (2, None), (3, "B"), (1, "A")], "k long, v string"
    )
    one = partition_route(df, ["k"], 16).collect()
    assert all(0 <= r.target_partition < 16 for r in one)
    by_k = {}
    for r in one:
        by_k.setdefault(r.k, set()).add(r.target_partition)
    assert all(len(s) == 1 for s in by_k.values())  # same key, same bucket
    # hashing is over the declared fields, not row identity
    two = {(r.k, r.v): r.target_partition
           for r in partition_route(df, ["k", "v"], 16).collect()}
    assert two[(1, "A")] is not None and two[(2, None)] is not None
    with _pytest.raises(ValueError, match="positive"):
        partition_route(df, ["k"], 0)


def test_header_to_value_move_and_copy(spark):
    """r15 HeaderToValue SMT analogue: move surfaces the header as a
    value column AND removes it from the map; copy leaves the map
    intact; absent headers yield NULL; fields.list renames; bad
    operation refuses."""
    import pytest as _pytest

    from postgres_debezium_clickhouse_spark.operators.transforms import (
        header_to_value,
    )

    df = spark.createDataFrame(
        [(1, {"a": "x", "b": "y", "c": "z"}), (2, {"b": "q"})],
        "id long, headers map<string,string>",
    )
    moved = {r.id: r for r in
             header_to_value(df, ["a", "b"], operation="move").collect()}
    assert (moved[1].a, moved[1].b) == ("x", "y")
    assert moved[1].headers == {"c": "z"}
    assert moved[2].a is None and moved[2].b == "q"
    assert moved[2].headers == {}
    copied = {r.id: r for r in
              header_to_value(df, ["a"], fields=["fa"],
                              operation="copy").collect()}
    assert copied[1].fa == "x" and copied[1].headers["a"] == "x"
    with _pytest.raises(ValueError, match="move"):
        header_to_value(df, ["a"], operation="delete")
    with _pytest.raises(ValueError, match="length"):
        header_to_value(df, ["a", "b"], fields=["only_one"])


def test_logical_table_route_merge_and_passthrough(spark):
    """r15 ByLogicalTableRouter SMT analogue: matching shard topics
    rewrite to the logical topic and carry their physical origin;
    non-matching topics pass through with a NULL identifier;
    key.enforce.uniqueness=False drops the tag but still reroutes."""
    from postgres_debezium_clickhouse_spark.operators.transforms import (
        logical_table_route,
    )

    df = spark.createDataFrame(
        [
            (1, "poc.public.orders_shard_0"),
            (2, "poc.public.orders_shard_3"),
            (3, "poc.public.customer"),
        ],
        "k long, topic string",
    )
    got = {r.k: r for r in logical_table_route(
        df, r"poc\.public\.orders_shard_\d+", "poc.public.orders_all"
    ).collect()}
    assert got[1].topic == got[2].topic == "poc.public.orders_all"
    assert got[1]["__dbz__physicalTableIdentifier"] == "poc.public.orders_shard_0"
    assert got[2]["__dbz__physicalTableIdentifier"] == "poc.public.orders_shard_3"
    assert got[3].topic == "poc.public.customer"
    assert got[3]["__dbz__physicalTableIdentifier"] is None
    anon = {r.k: r for r in logical_table_route(
        df, r"poc\.public\.orders_shard_\d+", "poc.public.orders_all",
        enforce_key_uniqueness=False,
    ).collect()}
    assert anon[1].topic == "poc.public.orders_all"
    assert anon[1]["__dbz__physicalTableIdentifier"] is None


def test_regex_router_anchoring_and_groups(spark):
    """r15 RegexRouter: Java matches() anchoring (partial match must NOT
    route), capture-group substitution, non-match identity."""
    from postgres_debezium_clickhouse_spark.operators.transforms import (
        regex_router,
    )

    df = spark.createDataFrame(
        [("poc.public.orders",), ("poc.public.orders.extra",),
         ("other.topic",)],
        "topic string",
    )
    out = {r.topic for r in
           regex_router(df, r"poc\.public\.(\w+)", "cdc_$1").collect()}
    # the dotted third segment makes \w+ fail the WHOLE-name match —
    # partial matches must not route
    assert out == {"cdc_orders", "poc.public.orders.extra", "other.topic"}


def test_value_to_key_rendering(spark):
    """r15 ValueToKey: key becomes the to_json struct of the named value
    fields, in spec order, replacing the old key."""
    from postgres_debezium_clickhouse_spark.operators.transforms import (
        value_to_key,
    )

    df = spark.createDataFrame(
        [("old", 7, "x")], "key string, a long, b string"
    )
    row = value_to_key(df, ["b", "a"]).collect()[0]
    assert row.key == '{"b":"x","a":7}'


def test_cast_fields_connect_type_names(spark):
    """r15 Cast SMT: Connect schema type names map to Spark types;
    unknown names fall through to Spark's own cast vocabulary."""
    from postgres_debezium_clickhouse_spark.operators.transforms import (
        cast_fields,
    )

    df = spark.createDataFrame([("12.50", 3)], "p string, k long")
    out = cast_fields(df, {"p": "float64", "k": "string"})
    assert dict(out.dtypes) == {"p": "double", "k": "string"}
    assert out.collect()[0].p == 12.5


def test_replace_fields_order_and_noop_rename(spark):
    """r15 ReplaceField: exclude applies before include and renames;
    renaming an excluded field is a no-op, not an error."""
    from postgres_debezium_clickhouse_spark.operators.transforms import (
        replace_fields,
    )

    df = spark.createDataFrame([(1, 2, 3)], "a long, b long, c long")
    out = replace_fields(
        df, exclude=["b"], renames={"a": "x", "b": "never"}
    )
    assert out.columns == ["x", "c"]
    out2 = replace_fields(df, include=["a", "b"], exclude=["b"])
    assert out2.columns == ["a"]


def test_flatten_struct_recursion_and_prune(spark):
    """r15 Flatten SMT: nested structs lift to delimiter-joined leaf
    columns; non-struct columns pass through; deep nesting recurses."""
    from postgres_debezium_clickhouse_spark.operators.transforms import (
        flatten_struct,
    )

    df = spark.createDataFrame(
        [(1, ((2, 3), "s"))],
        "id long, outer struct<inner: struct<a: long, b: long>, tag: string>",
    )
    out = flatten_struct(df)
    assert out.columns == ["id", "outer_inner_a", "outer_inner_b",
                           "outer_tag"]
    row = out.collect()[0]
    assert (row.id, row.outer_inner_a, row.outer_inner_b, row.outer_tag) \
        == (1, 2, 3, "s")
    dotted = flatten_struct(df, delimiter=".")
    assert "outer.inner.a" in dotted.columns


def test_insert_fields_metadata_planes(spark):
    """r15 InsertField: static value + all four record-plane metadata
    fields; timestamp surfaces as a real TIMESTAMP from epoch ms."""
    import datetime

    from postgres_debezium_clickhouse_spark.operators.transforms import (
        insert_fields,
    )

    df = spark.createDataFrame(
        [("t", 2, 30, 86_400_000, "v")],
        "topic string, partition int, offset long, timestamp long, "
        "value string",
    )
    row = insert_fields(
        df, static={"src": "poc"}, topic_field="mt", partition_field="mp",
        offset_field="mo", timestamp_field="mts",
    ).collect()[0]
    assert (row.src, row.mt, row.mp, row.mo) == ("poc", "t", 2, 30)
    assert row.mts == datetime.datetime(1970, 1, 2, 0, 0)


def test_timestamp_router_placeholders(spark):
    """r15 TimestampRouter: ${topic}/${timestamp} substitution with a
    SimpleDateFormat-style pattern, UTC rendering, literals kept."""
    from postgres_debezium_clickhouse_spark.operators.transforms import (
        timestamp_router,
    )

    df = spark.createDataFrame(
        [("logs", 86_400_000 + 3_600_000)], "topic string, timestamp long"
    )
    assert timestamp_router(df).collect()[0].topic == "logs-19700102"
    out = timestamp_router(
        df, "pre-${timestamp}-${topic}-post", "yyyyMMdd-HH"
    ).collect()[0]
    assert out.topic == "pre-19700102-01-logs-post"


def test_filter_predicates(spark):
    """r15 Filter SMT + predicates: tombstone/topic/header predicates
    compose; negate keeps instead of drops."""
    from postgres_debezium_clickhouse_spark.operators.transforms import (
        filter_records,
        has_header_key,
        record_is_tombstone,
        topic_name_matches,
    )

    df = spark.createDataFrame(
        [("a.b", "v1", {"h": "1"}), ("a.b", None, {}), ("a.c", "v2", None)],
        "topic string, value string, headers map<string,string>",
    )
    kept = filter_records(df, record_is_tombstone())
    assert kept.count() == 2  # the null-value record dropped
    only_ab = filter_records(df, topic_name_matches(r"a\.b"), negate=True)
    assert {r.topic for r in only_ab.collect()} == {"a.b"}
    with_h = filter_records(df, has_header_key("h"), negate=True)
    assert with_h.count() == 1


def test_timestamp_converter_matrix(spark):
    """r15 TimestampConverter: source inferred from column type
    (epoch-long at unix.precision / string+format / timestamp), all
    three targets, UTC; bad configs refuse."""
    import datetime

    import pytest as _pytest

    from postgres_debezium_clickhouse_spark.operators.transforms import (
        convert_timestamp_field,
    )

    df = spark.createDataFrame(
        [(86_400_000_000, "1970-01-02 00:00:00.000000")],
        "us long, s string",
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    out = convert_timestamp_field(df, "us", "Timestamp",
                                  unix_precision="microseconds", out="ts")
    row = convert_timestamp_field(
        convert_timestamp_field(out, "ts", "string", fmt=fmt, out="r"),
        "ts", "unix", unix_precision="milliseconds", out="ms",
    ).collect()[0]
    assert row.ts == datetime.datetime(1970, 1, 2)
    assert row.r == "1970-01-02 00:00:00.000000"
    assert row.ms == 86_400_000
    parsed = convert_timestamp_field(df, "s", "Timestamp", fmt=fmt,
                                     out="p").collect()[0]
    assert parsed.p == datetime.datetime(1970, 1, 2)
    with _pytest.raises(ValueError, match="target.type"):
        convert_timestamp_field(df, "us", "Date")
    with _pytest.raises(ValueError, match="unix.precision"):
        convert_timestamp_field(df, "us", "unix", unix_precision="weeks")
    with _pytest.raises(ValueError, match="format"):
        convert_timestamp_field(df, "s", "Timestamp")


def test_hoist_field_partial_and_full(spark):
    """r15 HoistField: named columns nest under the field, others stay
    top-level; default hoists everything."""
    from postgres_debezium_clickhouse_spark.operators.transforms import (
        hoist_field,
    )

    df = spark.createDataFrame([(1, "a", 2)], "id long, x string, y long")
    part = hoist_field(df, "payload", cols=["x", "y"])
    assert part.columns == ["id", "payload"]
    row = part.collect()[0]
    assert (row.id, row.payload.x, row.payload.y) == (1, "a", 2)
    full = hoist_field(df, "v")
    assert full.columns == ["v"]
    assert full.collect()[0].v.id == 1


def test_insert_and_drop_headers(spark):
    """r15 InsertHeader/DropHeaders: literal stamp with last-write-wins
    on a pre-existing key; scrub removes named keys, absent key no-op."""
    from postgres_debezium_clickhouse_spark.operators.transforms import (
        drop_headers,
        insert_header,
    )

    df = spark.createDataFrame(
        [(1, {"trace": "t-1", "pipeline": "old", "keep": "k"})],
        "id long, headers map<string,string>",
    )
    stamped = insert_header(df, "pipeline", "cdc-poc")
    hs = stamped.collect()[0].headers
    assert hs["pipeline"] == "cdc-poc" and hs["trace"] == "t-1"
    scrubbed = drop_headers(stamped, ["trace", "absent"])
    hs2 = scrubbed.collect()[0].headers
    assert sorted(hs2) == ["keep", "pipeline"]


def test_reselect_columns(spark):
    """r15 ReselectColumnsPostProcessor: placeholder and NULL trigger,
    current-value wins, missing source row skips, clean rows bypass;
    per-trigger knobs honored."""
    import pytest as _pytest

    from postgres_debezium_clickhouse_spark.operators.transforms import (
        reselect_columns,
    )

    PH = "__debezium_unavailable_value"
    events = spark.createDataFrame(
        [(1, "real", 10), (2, PH, 20), (3, None, 30), (4, PH, 40)],
        "id long, v string, off long",
    )
    src = spark.createDataFrame(
        [(1, "db1"), (2, "db2"), (3, "db3")], "id long, v string"
    )
    out = {r.id: r for r in reselect_columns(
        events, src, ["id"], ["v"]).collect()}
    assert (out[1].v, out[1].v__reselected) == ("real", False)
    assert (out[2].v, out[2].v__reselected) == ("db2", True)
    assert (out[3].v, out[3].v__reselected) == ("db3", True)
    assert (out[4].v, out[4].v__reselected) == (PH, False)  # no source row
    # nulls=False: NULL rows are clean (and must not be filter-dropped)
    out2 = {r.id: r for r in reselect_columns(
        events, src, ["id"], ["v"], nulls=False).collect()}
    assert (out2[3].v, out2[3].v__reselected) == (None, False)
    assert out2[2].v == "db2"
    with _pytest.raises(ValueError):
        reselect_columns(events, src, ["id"], ["v"],
                         unavailable=False, nulls=False)


def test_truncate_and_fixed_mask_columns(spark):
    """r15 column.truncate.to.N.chars / column.mask.with.N.chars:
    truncate keeps prefixes and passes short values; fixed mask hides
    length; NULL stays NULL in both."""
    from postgres_debezium_clickhouse_spark.operators.transforms import (
        mask_columns_fixed,
        truncate_columns,
    )

    df = spark.createDataFrame(
        [(1, "abcdefgh", "SEGMENT"), (2, "ab", None)],
        "id long, name string, seg string",
    )
    t = {r.id: r for r in truncate_columns(df, {"name": 4}).collect()}
    assert t[1].name == "abcd" and t[2].name == "ab"
    m = {r.id: r for r in mask_columns_fixed(df, {"seg": 3}).collect()}
    assert m[1].seg == "***" and m[2].seg is None
