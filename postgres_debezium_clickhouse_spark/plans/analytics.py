"""Batch analytics surface: FK-lattice joins, aggregations, windows, set
ops, event-time windows (SURVEY §2.4-§2.7, §2.9 T10).

The reference's join surface is its Postgres FK lattice
(basic_example/init_postgresql_data.sql:50-51;
large_dbtable_example/init_postgresql_data_scenario2.sql:47,59-60) and the
correlated per-key SUM update (scenario2:174-179); its aggregate surface is
SUM-per-key/MAX/latest-per-key (§2.5).  We express those over the driver's
star-schema fixtures plus the free Spark SQL surface (rollup, distinct
aggs, set ops, ranking windows).

Numeric-parity discipline for the DuckDB oracles: monetary aggregates are
summed as DECIMAL(18,2) (exact, order-insensitive) and only cast to DOUBLE
at the end — floating-point sums would differ between engines in the last
bits depending on accumulation order.

Scale notes: every dimension join below is broadcast-able (region/nation/
customer are tiny vs lineitem) — Catalyst picks broadcast-hash under the
64 MB threshold (session.py); the explicit ``broadcast()`` hints pin it.
Aggregations are partial (map-side combine) by construction via groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.transforms import check_violations
from ..sources.files import load_table

DEC = "decimal(18,2)"


def _dec(c: str) -> F.Column:
    return F.col(c).cast(DEC)


# --- J1/A1: FK-lattice star join -------------------------------------------


def star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — the FK equi-join lattice (init_postgresql_data.sql:50-51) as a
    star join: revenue per region/nation.  Dims are broadcast; the only
    shuffle is the final groupBy on (r_name, n_name) — 25 keys, trivially
    AQE-coalesced."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    rev = (_dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))).alias("rev")
    joined = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        joined.groupBy("r_name", "n_name")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


def order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/A1 — the decorrelated form of the reference's correlated scalar
    subquery (scenario2:174-179 ``UPDATE … SET total_amount = (SELECT
    SUM(line_total) …)``): per-order aggregate joined back to the header.
    One shuffle on l_orderkey (the aggregation); the join reuses that
    partitioning (sort-merge on the same key, no extra exchange)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    line_total = (_dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))).alias("lt")
    per_order = lineitem.groupBy("l_orderkey").agg(F.sum(line_total).cast("double").alias("computed_total"))
    return orders.join(per_order, orders.o_orderkey == per_order.l_orderkey, "inner").select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        "computed_total",
    )


def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 + deterministic top-k: top 10 customers by order revenue
    (tie-break c_custkey so LIMIT is well-defined)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    rev = orders.groupBy("o_custkey").agg(F.sum(_dec("o_totalprice")).cast("double").alias("revenue"))
    return (
        rev.join(F.broadcast(customer), rev.o_custkey == customer.c_custkey)
        .select("c_custkey", "c_name", "revenue")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(10)
    )


# --- A2/A3/W1/W2: scalar max, argmax, window dedup -------------------------


def max_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — scalar MAX (scenario2:152 ``SELECT MAX(id)``)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.max("o_orderkey").alias("max_orderkey"),
        F.max(F.col("o_totalprice").cast("double")).alias("max_totalprice"),
    )


def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/W1 — latest-per-key argmax (the FINAL-dedup pattern applied to a
    business question): each customer's most recent order, orderkey as the
    W2-style tie-break."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    return (
        orders.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", F.col("o_totalprice").cast("double").alias("o_totalprice"))
    )


def lineitem_version_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/W2/O2 — treat lineitems of an order as versions: keep the
    max-linenumber row per orderkey (ReplacingMergeTree semantics over a
    batch table, dropDuplicates-with-ordering)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic fixture, so
    # tie-break on further columns to keep the winner deterministic (the
    # reference's W2 insert-order tie-break, init_transpassport.sql:60).
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_linenumber").desc(),
        F.col("l_quantity").desc(),
        F.col("l_extendedprice").desc(),
        F.col("l_partkey").desc(),
        F.col("l_suppkey").desc(),
    )
    return (
        lineitem.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("l_orderkey", "l_linenumber", F.col("l_quantity").cast("double").alias("l_quantity"))
    )


# --- Q1-style pricing summary (A1/F12/F15) ---------------------------------


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/F12/F15 — grouped SUM/AVG/COUNT over lineitem (TPC-H Q1 shape;
    exercises the reference's qty*price−discount arithmetic,
    init_postgresql_data.sql:46)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    disc_price = (_dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))).alias("dp")
    g = (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
            F.round(F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1)), 2).alias("avg_qty"),
        )
    )
    return g


# --- F13/F14: CASE enums, interval arithmetic ------------------------------


def order_price_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14 — CASE/WHEN enum assignment (init_postgresql_data.sql:137-142)."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 150000, "mid")
        .otherwise("high")
    )
    return orders.groupBy(bucket.alias("price_bucket")).agg(F.count(F.lit(1)).alias("n_orders"))


def recent_orders_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13 — timestamp − interval arithmetic (init_postgresql_data.sql:134
    ``NOW() - random()*INTERVAL '730 days'`` shape, deterministic anchor):
    orders within 730 days before the max order date, counted per year."""
    orders = load_table(spark, sf_dir, "orders")
    anchor = orders.agg(F.max("o_orderdate").alias("mx"))
    return (
        orders.join(F.broadcast(anchor))
        .filter(F.col("o_orderdate") >= F.col("mx") - F.expr("INTERVAL 730 DAYS"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


def line_totals_computed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7/F12/F15 — the STORED generated column
    (init_postgresql_data.sql:46) as a computed projection with round()."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    lt = F.round((_dec("l_quantity") * _dec("l_extendedprice")).cast("double") - F.col("l_discount"), 2)
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        lt.alias("line_total"),
    )


def check_violation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 — row-level CHECK predicates (init_postgresql_data.sql:43-45)
    evaluated as validation flags; returns the violation tally."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    flagged = check_violations(
        lineitem,
        {
            "chk_qty_pos": F.col("l_quantity") > 0,
            "chk_price_nonneg": F.col("l_extendedprice") >= 0,
            "chk_disc_range": (F.col("l_discount") >= 0) & (F.col("l_discount") <= 1),
        },
    )
    return flagged.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("__valid"), 0).otherwise(1)).alias("n_invalid"),
    )


# --- free SQL surface: distinct aggs, rollup, set ops ----------------------


def segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation per market segment."""
    customer = load_table(spark, sf_dir, "customer")
    return customer.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(_dec("c_acctbal")).cast("double").alias("sum_acctbal"),
    )


def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus) — grouping-set surface."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"))
    )


def repeat_buyer_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set ops (INTERSECT): customers ordering both early and late in the
    dataset's date range."""
    orders = load_table(spark, sf_dir, "orders")
    early = orders.filter(F.year("o_orderdate") <= 1995).select("o_custkey")
    late = orders.filter(F.year("o_orderdate") >= 1997).select("o_custkey")
    return early.intersect(late)


# --- events: JSON extraction + event-time windows (F1-F3, T10) -------------


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F3 on real data — extract ``props.k`` from the events table's
    JSON column, aggregate per event_type."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.withColumn("k_value", k)
        .filter(F.col("k_value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.sum("k_value").alias("sum_k"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def events_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T10 — tumbling event-time window (1 hour) per event_type.  Uses the
    streaming-compatible ``window()`` operator; in batch it's the same
    Catalyst expression."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum(_dec("value")).cast("double"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T10 — session windows (10-minute gap) per user over event time.
    Spark merges events whose gap windows overlap (diff < gap ⇒ same
    session)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


def events_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T10 — SLIDING event-time windows (2h window, 1h slide): each event
    contributes to two windows.  Batch form of the streaming windowed agg
    (same `window()` expression works under readStream + watermark)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def events_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): each purchase event attributed to
    the user's latest at-or-before click — one key shuffle, no range
    explosion.  Oracle uses DuckDB's native ASOF JOIN."""
    from ..operators.asof import asof_join

    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("purchase_ts")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    return asof_join(
        purchases, clicks, on=["user_id"], left_ts="purchase_ts", right_ts="click_ts",
        tiebreak="click_id", right_prefix="",
    ).select("purchase_id", "user_id", "click_id", "click_ts")


def events_next_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — FORWARD as-of join (operators/asof.py ``direction=
    'forward'``; pandas merge_asof direction, ClickHouse ASOF with the
    reversed inequality): each click attached to the user's NEXT
    purchase at-or-after it, plus the time-to-convert in seconds — the
    mirror of the attribution query and the standard conversion-lag
    measurement.  Same single-key-shuffle plan, mirrored window.  The
    oracle re-derives every match with an explicit forward ROW_NUMBER
    (ts asc, event_id asc — the operator's inclusive/earliest-wins
    contract)."""
    from ..operators.asof import asof_join

    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id",
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    j = asof_join(
        clicks, purchases, on=["user_id"], left_ts="click_ts",
        right_ts="purchase_ts", tiebreak="purchase_id", right_prefix="",
        direction="forward",
    )
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    return j.select(
        "click_id", "user_id", "purchase_id", "purchase_ts",
        ((us("purchase_ts") - us("click_ts")) / F.lit(1e6))
        .alias("secs_to_convert"),
    )


def events_attribution_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a match horizon (pandas merge_asof ``tolerance``):
    a click older than 30 minutes no longer earns the attribution — the
    standard marketing-attribution window."""
    from ..operators.asof import asof_join

    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("purchase_ts")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    return asof_join(
        purchases, clicks, on=["user_id"], left_ts="purchase_ts", right_ts="click_ts",
        tiebreak="click_id", right_prefix="", tolerance_seconds=1800,
    ).select("purchase_id", "user_id", "click_id")


def events_errors_after_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (operators/range_join.py): per signup event, how many
    error events the same user hit within the following hour —
    time-bucket expansion, one (key, bin) shuffle, never a nested loop."""
    from ..operators.range_join import interval_join

    events = load_table(spark, sf_dir, "events")
    signups = events.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"), "user_id", F.col("ts").alias("signup_ts")
    )
    errors = events.filter(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("error_id"), F.col("ts").alias("error_ts")
    )
    pairs = interval_join(
        signups, errors, on=["user_id"], left_ts="signup_ts", right_ts="error_ts",
        lower_s=0, upper_s=3600,
    )
    return (
        pairs.groupBy("signup_id", "user_id")
        .agg(F.count(F.lit(1)).alias("n_errors_1h"))
    )


def events_user_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral transition counts: (previous event_type → event_type)
    pairs per user ordered by time — the funnel/Markov-step primitive
    (lag window over the event stream)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    steps = events.select(
        "user_id",
        F.lag("event_type", 1).over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    return steps.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n_transitions"))


def events_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r8: the ClickHouse ``windowFunnel(window)(ts, cond1, cond2, cond3)``
    analogue with EXPLICIT, deterministic semantics — the earliest-anchored
    chain with a per-step window: t1 = the user's earliest signup, t2 = the
    earliest click in [t1, t1+24h], t3 = the earliest purchase in
    [t2, t2+24h]; funnel level = how deep the cascade reaches.  (CH's own
    implementation is similarly earliest-anchored; stating the anchor rule
    makes the result a pure function of the event set, which is what lets
    the oracle pin every level by value.)  Three filtered per-user aggs —
    each pass touches only its condition's events, all map-side
    combinable; output is O(levels)."""
    ev = load_table(spark, sf_dir, "events")
    win = F.expr("INTERVAL 24 HOURS")  # 24h: all three levels populated at fixture scale
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id").agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter((F.col("ts") >= F.col("t1")) & (F.col("ts") <= F.col("t1") + win))
        .groupBy("user_id").agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter((F.col("ts") >= F.col("t2")) & (F.col("ts") <= F.col("t2") + win))
        .groupBy("user_id").agg(F.min("ts").alias("t3"))
    )
    users = ev.select("user_id").distinct()
    level = (
        F.when(F.col("t3").isNotNull(), 3)
        .when(F.col("t2").isNotNull(), 2)
        .when(F.col("t1").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        users.join(s1, "user_id", "left")
        .join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select("user_id", level.alias("funnel_level"))
        .groupBy("funnel_level")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def events_window_funnel_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r12 — ClickHouse ``windowFunnel(window, 'strict_dedup')``: a
    REPEAT of an already-matched condition interrupts the chain (CH
    docs: "if the same condition holds for the sequence of events, then
    such repeating event interrupts further processing").  Deterministic
    restatement over the earliest-anchored cascade: t1 = earliest
    signup; the step-2 click c (earliest in [t1, t1+24h]) counts only if
    NO second signup falls strictly between t1 and c; the step-3
    purchase p (earliest in [c, c+24h]) only if no signup OR click falls
    strictly between c and p.  Each break check is one filtered per-user
    min-aggregate — same join lattice as the base mode, all map-side
    combinable.

    r19-opt (guide §5 cache-when-reused): each cascade level is consumed
    by 2+ downstream branches, and the lazy composition re-planned the
    whole upstream lattice under every consumer — the executed plan
    scanned `events` 20× with zero exchange reuse (pruned column sets and
    inferred filters diverge per consumer, so AQE never canonicalizes the
    subtrees equal).  The reused levels are per-user aggregates
    (≤ |users| rows × 2-3 columns — index-sized, the r18 LSH-band-key
    materialization class), so each gets one eager localCheckpoint:
    events is scanned once per funnel step, inside the timed region, per
    run."""
    ev = load_table(spark, sf_dir, "events")
    win = F.expr("INTERVAL 24 HOURS")
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id").agg(F.min("ts").alias("t1"))
        .localCheckpoint(eager=True)  # consumed by s2 and the final join
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter((F.col("ts") >= F.col("t1")) & (F.col("ts") <= F.col("t1") + win))
        .groupBy("user_id").agg(F.min("ts").alias("t2"), F.min("t1").alias("t1k"))
        .localCheckpoint(eager=True)  # consumed by b2 and s2ok
    )
    # dedup break for step 2: another signup strictly inside (t1, t2)
    b2 = (
        ev.filter(F.col("event_type") == "signup")
        .join(s2, "user_id")
        .filter((F.col("ts") > F.col("t1k")) & (F.col("ts") < F.col("t2")))
        .select("user_id").distinct().withColumn("__b2", F.lit(1))
    )
    s2ok = (
        s2.join(b2, "user_id", "left").filter(F.col("__b2").isNull())
        .localCheckpoint(eager=True)  # consumed by s3 and the final join
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2ok.select("user_id", "t2"), "user_id")
        .filter((F.col("ts") >= F.col("t2")) & (F.col("ts") <= F.col("t2") + win))
        .groupBy("user_id").agg(F.min("ts").alias("t3"), F.min("t2").alias("t2k"))
        .localCheckpoint(eager=True)  # consumed by b3 and s3ok
    )
    # dedup break for step 3: a signup or click strictly inside (t2, t3)
    b3 = (
        ev.filter(F.col("event_type").isin("signup", "click"))
        .join(s3, "user_id")
        .filter((F.col("ts") > F.col("t2k")) & (F.col("ts") < F.col("t3")))
        .select("user_id").distinct().withColumn("__b3", F.lit(1))
    )
    s3ok = s3.join(b3, "user_id", "left").filter(F.col("__b3").isNull())
    users = ev.select("user_id").distinct()
    level = (
        F.when(F.col("t3").isNotNull(), 3)
        .when(F.col("t2").isNotNull(), 2)
        .when(F.col("t1").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        users.join(s1, "user_id", "left")
        .join(s2ok.select("user_id", "t2"), "user_id", "left")
        .join(s3ok.select("user_id", "t3"), "user_id", "left")
        .select("user_id", level.alias("funnel_level"))
        .groupBy("funnel_level")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def events_window_funnel_increase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r12 — ClickHouse ``windowFunnel(window, 'strict_increase')``:
    conditions apply only to events with STRICTLY increasing timestamps
    (CH docs) — the base mode's ``>=`` step boundaries become ``>``, so
    a click sharing its timestamp with the anchoring signup (or a
    purchase with the click) no longer advances the funnel.  Same
    three-filtered-aggregate lattice as the base mode; completes the
    windowFunnel mode matrix (default / strict_order / strict_dedup /
    strict_increase)."""
    ev = load_table(spark, sf_dir, "events")
    win = F.expr("INTERVAL 24 HOURS")
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id").agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + win))
        .groupBy("user_id").agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter((F.col("ts") > F.col("t2")) & (F.col("ts") <= F.col("t2") + win))
        .groupBy("user_id").agg(F.min("ts").alias("t3"))
    )
    users = ev.select("user_id").distinct()
    level = (
        F.when(F.col("t3").isNotNull(), 3)
        .when(F.col("t2").isNotNull(), 2)
        .when(F.col("t1").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        users.join(s1, "user_id", "left")
        .join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select("user_id", level.alias("funnel_level"))
        .groupBy("funnel_level")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def events_window_funnel_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r11 — ClickHouse ``windowFunnel(window, 'strict_order')``: the
    chain breaks on ANY intervening event ("in A→B→D→C, D stops finding
    A→B→C" — the CH docs' own example), so steps must be IMMEDIATELY
    consecutive in the user's event stream, each within the window of
    the previous step.  Deterministic restatement: events ordered by
    (ts, event_id); anchor = the user's earliest signup; level 2 iff the
    very next event is a click within 24h; level 3 iff the one after is
    a purchase within 24h of the click.  One per-user window (lead ×4)
    — a single hash shuffle, no joins."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    win = F.expr("INTERVAL 24 HOURS")
    seq = ev.select(
        "user_id", "ts", "event_type",
        F.lead("event_type", 1).over(w).alias("n1_type"),
        F.lead("ts", 1).over(w).alias("n1_ts"),
        F.lead("event_type", 2).over(w).alias("n2_type"),
        F.lead("ts", 2).over(w).alias("n2_ts"),
        F.row_number().over(w).alias("__rn"),
    )
    ws = Window.partitionBy("user_id").orderBy(F.col("__rn").asc())
    anchors = (
        seq.filter(F.col("event_type") == "signup")
        .withColumn("__sn", F.row_number().over(ws))
        .filter(F.col("__sn") == 1)
    )
    step2 = (F.col("n1_type") == "click") & (F.col("n1_ts") <= F.col("ts") + win)
    step3 = step2 & (F.col("n2_type") == "purchase") & (
        F.col("n2_ts") <= F.col("n1_ts") + win
    )
    level = F.when(step3, 3).when(step2, 2).otherwise(1)
    users = ev.select("user_id").distinct()
    return (
        users.join(anchors.select("user_id", level.alias("lv")),
                   "user_id", "left")
        .select("user_id", F.coalesce("lv", F.lit(0)).alias("funnel_level"))
        .groupBy("funnel_level")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def events_sequence_next_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r14 — ClickHouse ``sequenceNextNode('forward', 'first_match')(ts,
    event_type, event_type = 'signup', event_type = 'click')``: the
    path-analysis aggregate — find the FIRST place the user's event
    stream matches the adjacent chain signup→click and return the event
    that comes NEXT (CH docs: "returns a value of the next event that
    matched an event chain"; NULL when the chain ends the stream).
    Aggregated here into the classic what-do-users-do-next histogram.

    Deterministic restatement (the events_window_funnel_strict
    discipline): the stream is ordered by (ts, event_id); "first match"
    = the match at the smallest stream position.  One per-user window
    (lead ×2 + row_number) — a single hash shuffle, per-user bounded
    frames, no joins."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    seq = ev.select(
        "user_id", "event_type",
        F.lead("event_type", 1).over(w).alias("n1_type"),
        F.lead("event_type", 2).over(w).alias("n2_type"),
        F.row_number().over(w).alias("__rn"),
    )
    ws = Window.partitionBy("user_id").orderBy(F.col("__rn").asc())
    first_match = (
        seq.filter(
            (F.col("event_type") == "signup") & (F.col("n1_type") == "click")
        )
        .withColumn("__mn", F.row_number().over(ws))
        .filter(F.col("__mn") == 1)
    )
    return (
        first_match.groupBy(F.col("n2_type").alias("next_node"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


def events_weighted_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r11 — ClickHouse ``quantileExactWeighted(q)(x, w)``: the exact
    weighted quantile (each value counted with an integer weight —
    CH's recommendation over plain quantileExact when rows carry
    repetition counts).  Deterministic restatement of CH's own rule:
    the answer is the first value, in ascending order, whose RUNNING
    weight reaches q × total weight.  One per-group sort window for the
    cumulative weight + one min-aggregate per quantile — no collect, no
    UDF; weights here are the deterministic 1 + user_id mod 3."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value",
        (F.lit(1) + F.col("user_id") % 3).cast("long").alias("wt"),
    )
    g = ev.groupBy("event_type", "value").agg(F.sum("wt").alias("w"))
    win = Window.partitionBy("event_type").orderBy("value")
    tot = Window.partitionBy("event_type")
    c = g.select(
        "event_type", "value",
        F.sum("w").over(win).alias("cum"),
        F.sum("w").over(tot).alias("tw"),
    )
    def q(p):
        return F.min(
            F.when(F.col("cum") >= p * F.col("tw"), F.col("value"))
        )
    return c.groupBy("event_type").agg(
        q(0.5).alias("p50_weighted"),
        q(0.9).alias("p90_weighted"),
        F.max("tw").cast("long").alias("total_weight"),
    )


def events_micro_ts_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F17 — µs-epoch ↔ timestamp round trip (MicroTimestamp,
    value.json:96-99)."""
    from ..functions import micros_to_ts, ts_to_micros

    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        ts_to_micros("ts").alias("ts_us"),
        micros_to_ts(ts_to_micros("ts")).alias("ts_rt"),
    )


def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median / p95) per event type —
    ``percentile`` is a full-sort-per-group aggregate; at 100 TB prefer
    ``approx_percentile`` (t-digest, combinable) and accept the error bound,
    but the EXACT form is what an oracle can pin."""
    events = load_table(spark, sf_dir, "events")
    pct = F.expr("percentile(value, array(0.5D, 0.95D))")
    return (
        events.groupBy("event_type")
        .agg(pct.alias("p"))
        .select(
            "event_type",
            F.round(F.col("p")[0], 4).alias("p50"),
            F.round(F.col("p")[1], 4).alias("p95"),
        )
    )


def events_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score anomaly flagging per event type (|value − µ| > 3σ) — the
    standard monitoring pass over a metric stream.  Two aggregations (per-
    type stats broadcast back over the events), no window."""
    events = load_table(spark, sf_dir, "events")
    stats = events.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    return (
        events.join(F.broadcast(stats), "event_type")
        .withColumn("z", F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 4))
        .filter(F.abs(F.col("z")) > 3)
        .select("event_id", "event_type", F.round("value", 4).alias("value"), "z")
    )


def events_anomalies_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r12 — ROBUST anomaly flagging: modified z-score over the median
    absolute deviation (Iglewicz & Hoaglin 1993's 0.6745·|x−med|/MAD
    rule, the standard robust alternative when the metric stream itself
    contains the outliers that inflate σ — the fixture's exponential
    values make the contrast real: the z-score query's 3σ cut and this
    3.5-modified-z cut flag different tails).  Median and MAD are EXACT
    per-type percentile(0.5) aggregates (two passes: med, then the
    deviation median) broadcast back over the events — no window, no
    sort of the full stream.  Scores round via floor(x·1e4+0.5)/1e4
    (the engine-portable half-rule)."""
    events = load_table(spark, sf_dir, "events")
    med = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    mad = (
        events.join(F.broadcast(med), "event_type")
        .select("event_type", F.abs(F.col("value") - F.col("med")).alias("d"))
        .groupBy("event_type")
        .agg(F.expr("percentile(d, 0.5)").alias("mad"))
    )
    mz = F.floor(
        F.lit(0.6745) * (F.col("value") - F.col("med")) / F.col("mad") * 1e4
        + 0.5
    ) / 1e4
    return (
        events.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .withColumn("mz", mz)
        .filter(F.abs(F.col("mz")) > 3.5)
        .select("event_id", "event_type",
                F.round("value", 4).alias("value"), "mz")
    )


def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — CUSUM change-point detection over the hourly event rate
    (Page 1954, the classic sequential drift detector every
    monitoring pipeline reimplements): has the arrival rate drifted
    above its long-run mean, and when did the excursion start?

    Exactness: the textbook recursion S_t = max(0, S_{t-1} + (x_t−μ))
    is not a prefix sum — but it EQUALS prefix_t − min(0, min_{k≤t}
    prefix_k), which is two windowed aggregates.  Everything stays in
    EXACT INTEGER units: deviations are cross-multiplied
    (d_t = x_t·n_hours − total, so μ = total/n_hours never becomes a
    float), and the alarm threshold is ``total`` in the same units
    (a sustained one-mean-hour surplus).  Alarm hours and CUSUM values
    are bit-exact in any engine.

    Scale: one hash agg events→hours, then ordered windows over the
    |hours| table only (720 rows per month of data — bounded metadata,
    like every bucket-table window here)."""
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_ts")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    wall = Window.partitionBy()
    wcum = Window.orderBy("hour_ts").rowsBetween(
        Window.unboundedPreceding, 0
    )
    hourly = hourly.select(
        "*",
        F.count(F.lit(1)).over(wall).cast("long").alias("n_hours"),
        F.sum("n_events").over(wall).cast("long").alias("total"),
    )
    d = F.col("n_events") * F.col("n_hours") - F.col("total")
    hourly = hourly.withColumn("pfx", F.sum(d).over(wcum).cast("long"))
    runmin = F.least(F.lit(0).cast("long"), F.min("pfx").over(wcum))
    cusum = (F.col("pfx") - runmin).cast("long")
    return hourly.select(
        "hour_ts",
        "n_events",
        cusum.alias("cusum_units"),
        (cusum > F.col("total")).alias("alarm"),
    )


def ch_exponential_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — ClickHouse's ``exponentialMovingAverage(halflife)(v, t)``
    aggregate over the hourly event rate (halflife = 1 hour): each
    bucket's EMA weights past buckets by 2^(−Δhours) — TIME-AWARE, so
    a gap hour decays by its true distance, not by row adjacency (the
    sf0.001 fixture has gap hours; row-windowed EMA would be wrong
    there, and CH's aggregate is defined on time).

    Exactness: the kernel truncates at 32 taps (tail weight < 2⁻³²,
    below the round-6 output quantum for any bounded rate) and the
    truncated sum is computed in EXACT INTEGER numerator units —
    Σ x·2^(31−Δh) via shiftleft — identically on both engines; the
    only double is the final numerator/2³¹ presentation.

    Scale: one events→hours hash agg, then a 31-row sliding frame over
    the |hours| bucket table (720 rows/month) with an in-row fold —
    the event stream itself is never windowed."""
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_ts")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    hourly = hourly.withColumn(
        "h_epoch", (F.unix_timestamp("hour_ts") / 3600).cast("long")
    )
    wf = Window.orderBy("h_epoch").rowsBetween(-31, 0)
    lst = F.collect_list(F.struct("h_epoch", "n_events")).over(wf)
    num = F.expr(
        "aggregate(__frame, 0L, (acc, e) -> acc + IF(__h - e.h_epoch <= 31, "
        "e.n_events * shiftleft(1L, CAST(31 - (__h - e.h_epoch) AS INT)), 0L))"
    )
    out = (
        hourly.withColumn("__frame", lst)
        .withColumn("__h", F.col("h_epoch"))
        .withColumn("ewma_num", num.cast("long"))
    )
    return out.select(
        "hour_ts",
        "n_events",
        "ewma_num",
        F.expr(
            "floor((ewma_num / 2147483648.0) * 1e6 + 0.5) / 1e6"
        ).alias("ewma"),
    )


def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r8: cohort retention matrix — the ClickHouse ``retention()``
    aggregate's standard product-analytics use (reference surface: CH
    retention/windowFunnel family).  Cohort = the user's first active ISO
    week; a cell (cohort, week_offset) counts distinct cohort users active
    that many weeks later, with the rate over the cohort size.  Two
    user-keyed aggregations plus one small join — the per-user frame is
    the only shuffle at any scale, and the output is O(weeks²)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    )
    first = ev.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    active = ev.distinct()
    off = (
        (F.unix_timestamp("wk") - F.unix_timestamp("cohort")) / (7 * 86400)
    ).cast("long")
    ret = (
        active.join(first, "user_id")
        .groupBy(F.col("cohort"), off.alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    size = first.groupBy("cohort").agg(F.countDistinct("user_id").alias("cohort_users"))
    return (
        ret.join(size, "cohort")
        .select(
            F.col("cohort").cast("date").alias("cohort_week"),
            "week_offset",
            "n_active",
            "cohort_users",
            F.round(F.col("n_active") / F.col("cohort_users"), 6).alias("retention"),
        )
    )


def events_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r8: event-sequence pattern matching — the ClickHouse
    ``sequenceMatch('(?1).*(?2)')`` analogue: per user, did a ``signup``
    ever precede a ``purchase``?  Each user's events collapse to an
    ordered symbol string (s = signup, p = purchase, x = other; total
    order via (ts, event_id)) and the pattern is one regex over it — the
    general form handles any CH sequence pattern by rewriting ``(?N)`` to
    its symbol and ``.*`` verbatim.  One per-user shuffle; per-user
    sequences are bounded by nature at any corpus scale."""
    ev = load_table(spark, sf_dir, "events")
    sym = (
        F.when(F.col("event_type") == "signup", F.lit("s"))
        .when(F.col("event_type") == "purchase", F.lit("p"))
        .otherwise(F.lit("x"))
    )
    per_user = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("ts"), F.col("event_id"), sym.alias("sym")))
        ).alias("seq")
    )
    s = F.expr("concat_ws('', transform(seq, e -> e.sym))")
    return per_user.select(
        "user_id",
        F.size("seq").cast("long").alias("n_events"),
        s.rlike("s.*p").alias("matched"),
    )


def events_sequence_match_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r13 — ClickHouse ``sequenceMatch('(?1)(?t<=3600)(?2)')``: the
    TIME-CONSTRAINED sequence operator (CH's ``(?t<=N)`` — the matched
    pair must occur within N seconds), completing the sequence family
    next to the unconstrained match, the non-overlapping count, and the
    funnel matrix.  Per user: does any purchase follow a signup within
    one hour?  The untimed query matches ~everyone with both events;
    at 3600 s only a minority survives — the constraint is the signal.
    Plan: signup and purchase projections join per user on the time
    band, distinct matched users, left-joined back to the per-user
    event counts — two narrow scans + one user-key shuffle; the pair
    join is bounded per user at any scale."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.unix_timestamp(F.col("ts").cast("timestamp")).alias("ts_s")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_timestamp(F.col("ts").cast("timestamp")).alias("ts_p")
    )
    matched = (
        s.join(p, "user_id")
        .filter((F.col("ts_p") >= F.col("ts_s"))
                & (F.col("ts_p") - F.col("ts_s") <= 3600))
        .select("user_id").distinct()
        .withColumn("__m", F.lit(True))
    )
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return per_user.join(matched, "user_id", "left").select(
        "user_id", "n_events",
        F.coalesce("__m", F.lit(False)).alias("matched_1h"),
    )


def events_sequence_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r12 — ClickHouse ``sequenceCount('(?1).*(?2)')``: the COUNT of
    NON-OVERLAPPING signup→purchase chains per user (CH docs: the search
    for the next chain starts after the current one completes).
    Deterministic restatement over the same (ts, event_id)-ordered
    symbol string as ``events_sequence_match``: non-overlapping count =
    the matches of the LAZY pattern ``s[^p]*p`` scanned left to right
    (each chain closes at the first purchase after its signup — exactly
    CH's restart-after-completion rule).  Emitted as the distribution
    (n_chains, n_users); one per-user shuffle."""
    ev = load_table(spark, sf_dir, "events")
    sym = (
        F.when(F.col("event_type") == "signup", F.lit("s"))
        .when(F.col("event_type") == "purchase", F.lit("p"))
        .otherwise(F.lit("x"))
    )
    per_user = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("ts"), F.col("event_id"), sym.alias("sym")))
        ).alias("seq")
    )
    s = F.expr("concat_ws('', transform(seq, e -> e.sym))")
    return (
        per_user.select(F.regexp_count(s, F.lit("s[^p]*p")).alias("n_chains"))
        .groupBy("n_chains")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(F.col("n_chains").cast("long").alias("n_chains"), "n_users")
    )


def events_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — Count-Min frequency sketch (Cormode & Muthukrishnan 2005;
    operators/sketch.countmin_cells/estimate): per-user event
    frequencies estimated from a 3×256 cell table vs the exact counts
    — the output carries both plus the overestimate, which the CMS
    one-sided guarantee says is ALWAYS ≥ 0 (an underestimate anywhere
    is a bug, and would hash-mismatch the oracle).  With ~1.5k users
    into 256 counters the collisions are real, deterministic, and
    replayed exactly by the oracle's double-hash arithmetic.

    Plan: one map-side-combinable aggregate onto the ≤ 768-row cell
    table, broadcast back over the per-user probe — nothing
    stream-sized shuffles twice."""
    from ..operators.sketch import countmin_cells, countmin_estimate

    ev = load_table(spark, sf_dir, "events").select("user_id")
    cells = countmin_cells(ev, "user_id")
    exact = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact")
    )
    est = countmin_estimate(cells, exact.select("user_id"), "user_id")
    return exact.join(est, "user_id").select(
        "user_id",
        "n_exact",
        F.col("cms_est").cast("long").alias("cms_est"),
        (F.col("cms_est") - F.col("n_exact")).cast("long")
        .alias("overestimate"),
    )


def events_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r12 — KMV set-operation estimates (Beyer et al. 2007 §4 multiset
    algebra / the theta-sketch family): per event_type pair, the
    distinct-user estimates of A, B, A∪B (the union sketch is itself a
    KMV sketch), A∩B (Jaccard × union — the standard composition) and
    A\\B, all from the deterministic md5-keyed sketches alone — the
    query pattern audience-overlap systems run against stored sketch
    states instead of raw data.  Because the sketches are
    deterministic, the DuckDB oracle rebuilds them hash-for-hash and
    the ESTIMATES are compared as exact values (and sub-k regimes
    collapse to exact set algebra).  Sketch build = the two-level
    bounded group-by; the pair join is 5×5 types — metadata-sized."""
    from ..operators.sketch import kmv_set_ops, kmv_sketch

    ev = load_table(spark, sf_dir, "events")
    sk = kmv_sketch(ev, "event_type", "user_id", k=256)
    return kmv_set_ops(sk.withColumnRenamed("grp", "event_type"),
                       "event_type", k=256)


def events_retention_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r12 — the ClickHouse ``retention(cond1, …, condN)`` aggregate
    (distinct from the week-cohort table ``events_cohort_retention``
    already covers): per user an array where r[1] = cond1 ever held and
    r[i] = cond1 AND cond_i (CH's documented rule — later conditions
    count only for users satisfying the first).  Conditions here:
    signup / click / purchase.  Emitted as the summed funnel the CH
    pattern ``sum(r[i])`` produces, plus round-6 conversion ratios.
    One map-side-combinable per-user agg + one scalar agg."""
    ev = load_table(spark, sf_dir, "events")

    def has(t: str) -> F.Column:
        return F.max((F.col("event_type") == t).cast("int"))

    per_user = ev.groupBy("user_id").agg(
        has("signup").alias("c1"), has("click").alias("c2"),
        has("purchase").alias("c3"),
    )
    r1 = F.col("c1")
    r2 = F.col("c1") * F.col("c2")
    r3 = F.col("c1") * F.col("c3")
    return per_user.agg(
        F.sum(r1).cast("long").alias("n_cond1"),
        F.sum(r2).cast("long").alias("n_cond1_and_2"),
        F.sum(r3).cast("long").alias("n_cond1_and_3"),
        F.round(F.sum(r2) / F.sum(r1), 6).alias("ratio_2"),
        F.round(F.sum(r3) / F.sum(r1), 6).alias("ratio_3"),
    )


def events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r8: dense time-series gap filling — the ClickHouse ``ORDER BY …
    WITH FILL STEP INTERVAL 1 HOUR`` analogue: per event_type, every hour
    between that type's first and last qualifying event appears exactly
    once, zero-filled where no event landed.  The fixture is made sparse
    (value >= 200 keeps ~1% of events) so real gaps exist and the fill
    path is actually exercised.  Plan shape: one grouped agg for the
    counts, one tiny per-type bounds agg exploded through ``sequence()``
    into the dense grid (O(types × hours) rows — never O(events)), one
    left join + coalesce."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") >= 200)
    hour = F.date_trunc("hour", F.col("ts"))
    counts = ev.groupBy(hour.alias("h"), "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    bounds = counts.groupBy("event_type").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = bounds.select(
        "event_type",
        F.explode(
            F.expr("sequence(h0, h1, interval 1 hour)")
        ).alias("h"),
    )
    return (
        grid.join(counts, ["event_type", "h"], "left")
        .select(
            "event_type",
            F.col("h").alias("hour"),
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.col("n").isNull().alias("filled"),
        )
    )


def events_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r13 — ClickHouse ``ORDER BY … WITH FILL … INTERPOLATE (col)``:
    where events_hourly_gapfill ZERO-fills the dense grid, INTERPOLATE
    carries the previous row's value into filled rows (CH's default
    interpolate expression is the column itself = carry-forward).  Per
    event_type the hourly MEAN of value rides the grid; gap hours
    repeat the last present mean, flagged ``interpolated``.  Mean
    determinism: per-row value folds to the exact integer
    floor(v·1e6+0.5), BIGINT-summed, one double division at the end
    (the center_normalize lesson: never round doubles through DECIMAL
    per element).  Carry-forward = one last_value(IGNORE NULLS) window
    over the grid — O(types × hours), never O(events)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") >= 200)
    hour = F.date_trunc("hour", F.col("ts"))
    metrics = ev.groupBy(hour.alias("h"), "event_type").agg(
        F.sum(F.expr("cast(floor(value * 1e6 + 0.5) as bigint)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        "h", "event_type",
        (F.floor(F.col("s") / 1e6 / F.col("n") * 1e4 + 0.5) / 1e4)
        .alias("mean_v"),
    )
    bounds = metrics.groupBy("event_type").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = bounds.select(
        "event_type",
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("h"),
    )
    w = (
        Window.partitionBy("event_type").orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    joined = grid.join(metrics, ["event_type", "h"], "left")
    return joined.select(
        "event_type",
        F.col("h").alias("hour"),
        F.last("mean_v", ignorenulls=True).over(w).alias("mean_value"),
        F.col("mean_v").isNull().alias("interpolated"),
    )


def orders_first_last_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r13 — the value-navigation window family (first_value /
    last_value / nth_value, completing the rank/lag/lead and
    ntile/percent_rank families): per customer under the
    (o_orderdate, o_orderkey) total order, every order row carries the
    customer's first, latest, and second order price (NULL when no
    second order exists).  Full-partition frames stated explicitly —
    the default ORDER BY frame would make last_value the CURRENT row,
    the classic window trap.  One hash shuffle on the customer key."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    price = F.col("o_totalprice").cast("decimal(18,2)")
    return orders.select(
        "o_custkey", "o_orderkey",
        F.first(price).over(w).cast("double").alias("first_price"),
        F.last(price).over(w).cast("double").alias("last_price"),
        F.nth_value(price, 2).over(w).cast("double").alias("second_price"),
    )


def events_uniq_upto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r9 — the ClickHouse ``uniqUpTo(N)(col)`` aggregate
    (operators/sketch.uniq_upto): exact distinct users per event_type
    while ≤ N, else N+1, with bounded state (the N+1-smallest-values
    order-statistics algebra — see the operator).  Run at two Ns that
    straddle the fixture's 150 distinct users per type: N=100 must
    saturate at 101 (the "more than N" answer), N=200 must return the
    exact 150 — both closed-form for the oracle."""
    from ..operators.sketch import uniq_upto

    ev = load_table(spark, sf_dir, "events")
    lo = uniq_upto(ev, "event_type", "user_id", n=100).withColumnRenamed("u", "u100")
    hi = uniq_upto(ev, "event_type", "user_id", n=200).withColumnRenamed("u", "u200")
    return lo.join(hi, "event_type")


def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r11 — the CH ``histogram(n)(x)`` use case with DETERMINISTIC
    equal-width bins (CH's adaptive variant is explicitly
    merge-order-dependent — its docs warn the result is not exact — so
    the reproducible form users actually chart is fixed bins over the
    global [min, max]).  Two passes: a scalar min/max agg broadcast to
    every row (1-row crossJoin — the text.py totals idiom), then one
    groupBy on the bucket index.  Bucket arithmetic is pure IEEE double
    ops, identical in the oracle."""
    events = load_table(spark, sf_dir, "events")
    b = events.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    wdt = (F.col("mx") - F.col("mn")) / 10
    bucket = F.least(
        F.floor((F.col("value") - F.col("mn")) / wdt), F.lit(9)
    ).cast("int")
    return (
        events.crossJoin(F.broadcast(b))
        .groupBy(bucket.alias("bucket"), "mn", "mx")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            (F.col("mn") + F.col("bucket") * wdt).cast("double").alias("lo"),
            (F.col("mn") + (F.col("bucket") + 1) * wdt).cast("double")
            .alias("hi"),
            F.col("n").cast("long").alias("n"),
        )
    )


QUERIES = {
    "events_weighted_quantiles": events_weighted_quantiles,
    "events_window_funnel_strict": events_window_funnel_strict,
    "events_sequence_next_node": events_sequence_next_node,
    "events_window_funnel_dedup": events_window_funnel_dedup,
    "events_sequence_count": events_sequence_count,
    "events_kmv_setops": events_kmv_setops,
    "events_countmin_sketch": events_countmin_sketch,
    "events_anomalies_mad": events_anomalies_mad,
    "events_cusum_drift": events_cusum_drift,
    "ch_exponential_moving_average": ch_exponential_moving_average,
    "events_retention_agg": events_retention_agg,
    "events_window_funnel_increase": events_window_funnel_increase,
    "events_value_histogram": events_value_histogram,
    "star_join_revenue": star_join_revenue,
    "order_totals": order_totals,
    "top_customers": top_customers,
    "max_order": max_order,
    "latest_order_per_customer": latest_order_per_customer,
    "lineitem_version_dedup": lineitem_version_dedup,
    "pricing_summary": pricing_summary,
    "order_price_buckets": order_price_buckets,
    "recent_orders_interval": recent_orders_interval,
    "line_totals_computed": line_totals_computed,
    "check_violation_counts": check_violation_counts,
    "segment_stats": segment_stats,
    "revenue_rollup": revenue_rollup,
    "repeat_buyer_keys": repeat_buyer_keys,
    "events_json_extract": events_json_extract,
    "events_hourly_counts": events_hourly_counts,
    "events_sessionization": events_sessionization,
    "events_sliding_counts": events_sliding_counts,
    "events_user_funnel": events_user_funnel,
    "events_purchase_attribution": events_purchase_attribution,
    "events_next_conversion": events_next_conversion,
    "events_attribution_tolerance": events_attribution_tolerance,
    "events_errors_after_signup": events_errors_after_signup,
    "events_micro_ts_roundtrip": events_micro_ts_roundtrip,
    "events_value_percentiles": events_value_percentiles,
    "events_value_anomalies": events_value_anomalies,
    "events_cohort_retention": events_cohort_retention,
    "events_uniq_upto": events_uniq_upto,
    "events_hourly_gapfill": events_hourly_gapfill,
    "events_sequence_match": events_sequence_match,
    "events_sequence_match_time": events_sequence_match_time,
    "events_gapfill_interpolate": events_gapfill_interpolate,
    "orders_first_last_window": orders_first_last_window,
    "events_window_funnel": events_window_funnel,
}

ORACLES = {
    "star_join_revenue": """
        SELECT r.r_name, n.n_name,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_lineitems
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, n.n_name
    """,
    "order_totals": """
        SELECT o.o_orderkey,
               CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
               t.computed_total
        FROM orders o
        JOIN (SELECT l_orderkey,
                     CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                              * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS computed_total
              FROM lineitem GROUP BY l_orderkey) t
          ON o.o_orderkey = t.l_orderkey
    """,
    "top_customers": """
        SELECT c.c_custkey, c.c_name, t.revenue
        FROM (SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
              FROM orders GROUP BY o_custkey) t
        JOIN customer c ON t.o_custkey = c.c_custkey
        ORDER BY t.revenue DESC, c.c_custkey ASC
        LIMIT 10
    """,
    "max_order": """
        SELECT MAX(o_orderkey) AS max_orderkey,
               MAX(CAST(o_totalprice AS DOUBLE)) AS max_totalprice
        FROM orders
    """,
    "latest_order_per_customer": """
        SELECT o_custkey, o_orderkey, o_orderdate, CAST(o_totalprice AS DOUBLE) AS o_totalprice
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                                           ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
              FROM orders)
        WHERE rn = 1
    """,
    "lineitem_version_dedup": """
        SELECT l_orderkey, l_linenumber, CAST(l_quantity AS DOUBLE) AS l_quantity
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                           ORDER BY l_linenumber DESC, l_quantity DESC,
                                                    l_extendedprice DESC, l_partkey DESC,
                                                    l_suppkey DESC) AS rn
              FROM lineitem)
        WHERE rn = 1
    """,
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
               COUNT(*) AS count_order,
               ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 2) AS avg_qty
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "order_price_buckets": """
        SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                    WHEN o_totalprice < 150000 THEN 'mid'
                    ELSE 'high' END AS price_bucket,
               COUNT(*) AS n_orders
        FROM orders GROUP BY 1
    """,
    "recent_orders_interval": """
        SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year, COUNT(*) AS n_orders
        FROM orders
        WHERE o_orderdate >= (SELECT MAX(o_orderdate) FROM orders) - INTERVAL 730 DAY
        GROUP BY 1
    """,
    "line_totals_computed": """
        SELECT l_orderkey, l_linenumber,
               ROUND(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE)
                     - l_discount, 2) AS line_total
        FROM lineitem
    """,
    "check_violation_counts": """
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN l_quantity > 0 AND l_extendedprice >= 0
                             AND l_discount BETWEEN 0 AND 1 THEN 0 ELSE 1 END) AS BIGINT) AS n_invalid
        FROM lineitem
    """,
    "segment_stats": """
        SELECT c_mktsegment,
               CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        FROM customer GROUP BY c_mktsegment
    """,
    "revenue_rollup": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "repeat_buyer_keys": """
        SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) <= 1995
        INTERSECT
        SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) >= 1997
    """,
    "events_json_extract": """
        SELECT event_type,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               COUNT(*) AS n_events
        FROM events
        WHERE json_extract_string(props, '$.k') IS NOT NULL
        GROUP BY event_type
    """,
    "events_hourly_counts": """
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               COUNT(*) AS n_events,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "events_sessionization": """
        WITH g AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                          OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 10 MINUTE
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ),
        s AS (
            SELECT user_id, ts,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS UNBOUNDED PRECEDING) AS session_id
            FROM g
        )
        SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
        FROM s GROUP BY user_id, session_id
    """,
    "events_sliding_counts": """
        WITH w AS (
            SELECT date_trunc('hour', ts) AS window_start, event_type FROM events
            UNION ALL
            SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR, event_type FROM events
        )
        SELECT window_start, event_type, COUNT(*) AS n_events
        FROM w GROUP BY window_start, event_type
    """,
    "events_errors_after_signup": """
        SELECT s.event_id AS signup_id, s.user_id, COUNT(*) AS n_errors_1h
        FROM (SELECT * FROM events WHERE event_type = 'signup') s
        JOIN (SELECT * FROM events WHERE event_type = 'error') e
          ON s.user_id = e.user_id
         AND e.ts >= s.ts AND e.ts <= s.ts + INTERVAL 3600 SECOND
        GROUP BY s.event_id, s.user_id
    """,
    "events_purchase_attribution": """
        SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id, c.ts AS click_ts
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    # forward as-of replayed with an explicit earliest-wins window
    # (ts asc, event_id asc — the operator's inclusive contract);
    # µs-normalized timestamps, lag in exact µs/1e6 seconds
    "events_next_conversion": """
        WITH c AS (SELECT event_id AS click_id, user_id,
                          make_timestamp(epoch_us(ts)) AS click_ts
                   FROM events WHERE event_type = 'click'),
        p AS (SELECT user_id, event_id AS purchase_id,
                     make_timestamp(epoch_us(ts)) AS purchase_ts
              FROM events WHERE event_type = 'purchase'),
        cand AS (
            SELECT c.click_id, c.user_id, c.click_ts,
                   p.purchase_id, p.purchase_ts,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.click_id
                       ORDER BY p.purchase_ts ASC NULLS LAST,
                                p.purchase_id ASC NULLS LAST) AS rn
            FROM c LEFT JOIN p ON p.user_id = c.user_id
                              AND p.purchase_ts >= c.click_ts
        )
        SELECT click_id, user_id, purchase_id, purchase_ts,
               CAST(epoch_us(purchase_ts) - epoch_us(click_ts) AS DOUBLE)
                   / 1e6 AS secs_to_convert
        FROM cand WHERE rn = 1
    """,
    "events_attribution_tolerance": """
        SELECT p.event_id AS purchase_id, p.user_id,
               CASE WHEN c.ts >= p.ts - INTERVAL 30 MINUTE THEN c.event_id END AS click_id
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    "events_user_funnel": """
        WITH s AS (SELECT user_id,
                          LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS from_type,
                          event_type AS to_type
                   FROM events)
        SELECT from_type, to_type, COUNT(*) AS n_transitions
        FROM s WHERE from_type IS NOT NULL
        GROUP BY from_type, to_type
    """,
    "events_value_anomalies": """
        WITH s AS (SELECT event_type, AVG(value) AS mu, STDDEV_SAMP(value) AS sigma
                   FROM events GROUP BY event_type)
        SELECT e.event_id, e.event_type,
               ROUND(e.value, 4) AS value,
               ROUND((e.value - s.mu) / s.sigma, 4) AS z
        FROM events e JOIN s USING (event_type)
        WHERE ABS((e.value - s.mu) / s.sigma) > 3
    """,
    "events_value_percentiles": """
        SELECT event_type,
               ROUND(quantile_cont(value, 0.5), 4) AS p50,
               ROUND(quantile_cont(value, 0.95), 4) AS p95
        FROM events GROUP BY event_type
    """,
    "events_micro_ts_roundtrip": """
        SELECT event_id, epoch_us(ts) AS ts_us, make_timestamp(epoch_us(ts)) AS ts_rt
        FROM events
    """,
}


ORACLES["events_uniq_upto"] = """
    SELECT event_type,
           LEAST(COUNT(DISTINCT user_id), 101) AS u100,
           LEAST(COUNT(DISTINCT user_id), 201) AS u200
    FROM events GROUP BY event_type
"""

ORACLES["events_cohort_retention"] = """
    WITH ev AS (SELECT user_id, date_trunc('week', ts) AS wk FROM events),
    first AS (SELECT user_id, MIN(wk) AS cohort FROM ev GROUP BY user_id),
    active AS (SELECT DISTINCT user_id, wk FROM ev),
    ret AS (
        SELECT f.cohort,
               CAST(date_diff('day', f.cohort, a.wk) / 7 AS BIGINT) AS week_offset,
               COUNT(DISTINCT a.user_id) AS n_active
        FROM active a JOIN first f USING (user_id)
        GROUP BY f.cohort, week_offset
    ),
    sz AS (SELECT cohort, COUNT(DISTINCT user_id) AS cohort_users
           FROM first GROUP BY cohort)
    SELECT CAST(r.cohort AS DATE) AS cohort_week, r.week_offset, r.n_active,
           s.cohort_users,
           ROUND(r.n_active * 1.0 / s.cohort_users, 6) AS retention
    FROM ret r JOIN sz s USING (cohort)
"""

ORACLES["events_gapfill_interpolate"] = """
    WITH m AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               FLOOR(CAST(SUM(CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT))
                          AS DOUBLE) / 1e6 / COUNT(*) * 1e4 + 0.5) / 1e4
                 AS mean_v
        FROM events WHERE value >= 200
        GROUP BY event_type, h
    ),
    b AS (SELECT event_type, MIN(h) AS h0, MAX(h) AS h1
          FROM m GROUP BY event_type),
    grid AS (
        SELECT b.event_type, g.h
        FROM b, LATERAL (SELECT unnest(generate_series(b.h0, b.h1,
                                                       INTERVAL 1 HOUR)) AS h) g
    ),
    j AS (SELECT grid.event_type, grid.h, m.mean_v
          FROM grid LEFT JOIN m
            ON grid.event_type = m.event_type AND grid.h = m.h)
    SELECT event_type, h AS hour,
           last_value(mean_v IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS mean_value,
           mean_v IS NULL AS interpolated
    FROM j
"""

ORACLES["orders_first_last_window"] = """
    SELECT o_custkey, o_orderkey,
           CAST(FIRST_VALUE(CAST(o_totalprice AS DECIMAL(18,2))) OVER w
                AS DOUBLE) AS first_price,
           CAST(LAST_VALUE(CAST(o_totalprice AS DECIMAL(18,2))) OVER w
                AS DOUBLE) AS last_price,
           CAST(NTH_VALUE(CAST(o_totalprice AS DECIMAL(18,2)), 2) OVER w
                AS DOUBLE) AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING)
"""

ORACLES["events_sequence_match_time"] = """
    WITH s AS (SELECT user_id, CAST(epoch(ts) AS BIGINT) AS ts_s
               FROM events WHERE event_type = 'signup'),
         p AS (SELECT user_id, CAST(epoch(ts) AS BIGINT) AS ts_p
               FROM events WHERE event_type = 'purchase'),
         m AS (SELECT DISTINCT s.user_id
               FROM s JOIN p ON s.user_id = p.user_id
                AND p.ts_p >= s.ts_s AND p.ts_p - s.ts_s <= 3600)
    SELECT e.user_id, COUNT(*) AS n_events,
           (m.user_id IS NOT NULL) AS matched_1h
    FROM events e LEFT JOIN m ON e.user_id = m.user_id
    GROUP BY e.user_id, m.user_id
"""

ORACLES["events_sequence_match"] = """
    WITH s AS (
        SELECT user_id,
               COUNT(*) AS n_events,
               string_agg(CASE WHEN event_type = 'signup' THEN 's'
                               WHEN event_type = 'purchase' THEN 'p'
                               ELSE 'x' END, '' ORDER BY ts, event_id) AS seq
        FROM events GROUP BY user_id
    )
    SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
           regexp_matches(seq, 's.*p') AS matched
    FROM s
"""


ORACLES["ch_exponential_moving_average"] = """
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS hour_ts,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1
    ),
    e AS (
        SELECT hourly.*,
               CAST(epoch(hour_ts) // 3600 AS BIGINT) AS h_epoch
        FROM hourly
    ),
    f AS (
        SELECT e.*,
               list({'h': h_epoch, 'x': n_events}) OVER (
                   ORDER BY h_epoch
                   ROWS BETWEEN 31 PRECEDING AND CURRENT ROW) AS frame
        FROM e
    )
    SELECT hour_ts, n_events,
           CAST(list_sum(list_transform(frame,
                ev -> CASE WHEN h_epoch - ev.h <= 31
                           THEN ev.x * (CAST(1 AS BIGINT)
                                << CAST(31 - (h_epoch - ev.h) AS INT))
                           ELSE 0 END)) AS BIGINT) AS ewma_num,
           FLOOR((CAST(list_sum(list_transform(frame,
                ev -> CASE WHEN h_epoch - ev.h <= 31
                           THEN ev.x * (CAST(1 AS BIGINT)
                                << CAST(31 - (h_epoch - ev.h) AS INT))
                           ELSE 0 END)) AS BIGINT) / 2147483648.0)
                 * 1e6 + 0.5) / 1e6 AS ewma
    FROM f
"""

ORACLES["events_cusum_drift"] = """
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS hour_ts,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1
    ),
    t AS (
        SELECT hourly.*,
               CAST(COUNT(*) OVER () AS BIGINT) AS n_hours,
               CAST(SUM(n_events) OVER () AS BIGINT) AS total
        FROM hourly
    ),
    p AS (
        SELECT t.*,
               CAST(SUM(n_events * n_hours - total) OVER (
                    ORDER BY hour_ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS pfx
        FROM t
    ),
    c AS (
        SELECT p.*,
               pfx - LEAST(CAST(0 AS BIGINT), MIN(pfx) OVER (
                    ORDER BY hour_ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                   AS cusum_units
        FROM p
    )
    SELECT hour_ts, n_events,
           CAST(cusum_units AS BIGINT) AS cusum_units,
           cusum_units > total AS alarm
    FROM c
"""

ORACLES["events_anomalies_mad"] = """
    WITH med AS (
        SELECT event_type, median(value) AS med
        FROM events GROUP BY event_type
    ),
    mad AS (
        SELECT e.event_type, median(abs(e.value - m.med)) AS mad
        FROM events e JOIN med m USING (event_type)
        GROUP BY e.event_type
    )
    SELECT e.event_id, e.event_type,
           ROUND(e.value, 4) AS value,
           FLOOR(0.6745 * (e.value - m.med) / d.mad * 1e4 + 0.5) / 1e4 AS mz
    FROM events e
    JOIN med m USING (event_type)
    JOIN mad d USING (event_type)
    WHERE ABS(FLOOR(0.6745 * (e.value - m.med) / d.mad * 1e4 + 0.5) / 1e4)
          > 3.5
"""

# CMS replayed exactly: 3×256 cells from the md5 double-hash, est =
# min over the item's three cells, overestimate provably ≥ 0
ORACLES["events_countmin_sketch"] = """
    WITH cnts AS (
        SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
    ),
    hh AS (
        SELECT user_id, n,
               CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)),
                                        1, 15)) AS BIGINT) AS h1,
               CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)),
                                        16, 15)) AS BIGINT) AS h2
        FROM cnts
    ),
    k AS (SELECT 0 AS i UNION ALL SELECT 1 UNION ALL SELECT 2),
    cells AS (
        SELECT i, (h1 + i * h2) % 256 AS pos, SUM(n) AS c
        FROM hh, k GROUP BY 1, 2
    ),
    probe AS (SELECT user_id, i, (h1 + i * h2) % 256 AS pos FROM hh, k),
    est AS (
        SELECT p.user_id, MIN(c.c) AS cms_est
        FROM probe p JOIN cells c ON c.i = p.i AND c.pos = p.pos
        GROUP BY p.user_id
    )
    SELECT h.user_id, CAST(h.n AS BIGINT) AS n_exact,
           CAST(e.cms_est AS BIGINT) AS cms_est,
           CAST(e.cms_est - h.n AS BIGINT) AS overestimate
    FROM hh h JOIN est e USING (user_id)
"""

ORACLES["events_kmv_setops"] = """
    WITH h AS (
        SELECT DISTINCT event_type,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv
        FROM events
    ),
    sk AS (
        SELECT event_type, (list(hv ORDER BY hv))[1:256] AS s
        FROM h GROUP BY event_type
    ),
    p AS (
        SELECT a.event_type AS group_a, b.event_type AS group_b,
               a.s AS sa, b.s AS sb,
               list_sort(list_distinct(list_concat(a.s, b.s)))[1:256] AS uk
        FROM sk a JOIN sk b ON a.event_type < b.event_type
    ),
    e AS (
        SELECT group_a, group_b, sa, sb, uk,
               CASE WHEN len(sa) >= 256
                    THEN 255.0 / (sa[256] / 1152921504606846976.0)
                    ELSE CAST(len(sa) AS DOUBLE) END AS est_a,
               CASE WHEN len(sb) >= 256
                    THEN 255.0 / (sb[256] / 1152921504606846976.0)
                    ELSE CAST(len(sb) AS DOUBLE) END AS est_b,
               CASE WHEN len(uk) >= 256
                    THEN 255.0 / (uk[256] / 1152921504606846976.0)
                    ELSE CAST(len(uk) AS DOUBLE) END AS est_u,
               len(list_intersect(uk, list_intersect(sa, sb))) * 1.0
                   / len(uk) AS jac
        FROM p
    )
    SELECT group_a, group_b,
           ROUND(est_a, 4) AS est_a,
           ROUND(est_b, 4) AS est_b,
           ROUND(est_u, 4) AS est_union,
           ROUND(jac * est_u, 4) AS est_intersect,
           ROUND(est_a - jac * est_u, 4) AS est_diff_a
    FROM e
"""

ORACLES["events_retention_agg"] = """
    WITH u AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS c1,
               MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c2,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c3
        FROM events GROUP BY user_id
    )
    SELECT CAST(SUM(c1) AS BIGINT) AS n_cond1,
           CAST(SUM(c1 * c2) AS BIGINT) AS n_cond1_and_2,
           CAST(SUM(c1 * c3) AS BIGINT) AS n_cond1_and_3,
           ROUND(SUM(c1 * c2) * 1.0 / SUM(c1), 6) AS ratio_2,
           ROUND(SUM(c1 * c3) * 1.0 / SUM(c1), 6) AS ratio_3
    FROM u
"""


ORACLES["events_sequence_count"] = """
    WITH s AS (
        SELECT user_id,
               string_agg(CASE WHEN event_type = 'signup' THEN 's'
                               WHEN event_type = 'purchase' THEN 'p'
                               ELSE 'x' END, '' ORDER BY ts, event_id) AS seq
        FROM events GROUP BY user_id
    ),
    n AS (SELECT len(regexp_extract_all(seq, 's[^p]*p')) AS n_chains FROM s)
    SELECT CAST(n_chains AS BIGINT) AS n_chains,
           COUNT(*) AS n_users
    FROM n GROUP BY n_chains
"""


ORACLES["events_hourly_gapfill"] = """
    WITH c AS (
        SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n
        FROM events WHERE value >= 200
        GROUP BY event_type, h
    ),
    b AS (SELECT event_type, MIN(h) AS h0, MAX(h) AS h1 FROM c GROUP BY event_type),
    grid AS (
        SELECT b.event_type, g.h
        FROM b, LATERAL (SELECT unnest(generate_series(b.h0, b.h1,
                                                       INTERVAL 1 HOUR)) AS h) g
    )
    SELECT grid.event_type, grid.h AS hour,
           COALESCE(c.n, 0) AS n_events,
           c.n IS NULL AS filled
    FROM grid LEFT JOIN c ON grid.event_type = c.event_type AND grid.h = c.h
"""


ORACLES["events_window_funnel"] = """
    WITH s1 AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN s1 USING (user_id)
        WHERE e.event_type = 'click'
          AND e.ts >= s1.t1 AND e.ts <= s1.t1 + INTERVAL 24 HOUR
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN s2 USING (user_id)
        WHERE e.event_type = 'purchase'
          AND e.ts >= s2.t2 AND e.ts <= s2.t2 + INTERVAL 24 HOUR
        GROUP BY e.user_id
    ),
    lv AS (
        SELECT u.user_id,
               CASE WHEN s3.t3 IS NOT NULL THEN 3
                    WHEN s2.t2 IS NOT NULL THEN 2
                    WHEN s1.t1 IS NOT NULL THEN 1
                    ELSE 0 END AS funnel_level
        FROM (SELECT DISTINCT user_id FROM events) u
        LEFT JOIN s1 USING (user_id)
        LEFT JOIN s2 USING (user_id)
        LEFT JOIN s3 USING (user_id)
    )
    SELECT funnel_level, COUNT(*) AS n_users FROM lv GROUP BY funnel_level
"""

ORACLES["events_window_funnel_dedup"] = """
    WITH s1 AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2, MIN(s1.t1) AS t1k
        FROM events e JOIN s1 USING (user_id)
        WHERE e.event_type = 'click'
          AND e.ts >= s1.t1 AND e.ts <= s1.t1 + INTERVAL 24 HOUR
        GROUP BY e.user_id
    ),
    s2ok AS (
        SELECT s2.user_id, s2.t2 FROM s2
        WHERE NOT EXISTS (
            SELECT 1 FROM events e
            WHERE e.user_id = s2.user_id AND e.event_type = 'signup'
              AND e.ts > s2.t1k AND e.ts < s2.t2)
    ),
    s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t3, MIN(s2ok.t2) AS t2k
        FROM events e JOIN s2ok USING (user_id)
        WHERE e.event_type = 'purchase'
          AND e.ts >= s2ok.t2 AND e.ts <= s2ok.t2 + INTERVAL 24 HOUR
        GROUP BY e.user_id
    ),
    s3ok AS (
        SELECT s3.user_id, s3.t3 FROM s3
        WHERE NOT EXISTS (
            SELECT 1 FROM events e
            WHERE e.user_id = s3.user_id
              AND e.event_type IN ('signup', 'click')
              AND e.ts > s3.t2k AND e.ts < s3.t3)
    ),
    lv AS (
        SELECT u.user_id,
               CASE WHEN s3ok.t3 IS NOT NULL THEN 3
                    WHEN s2ok.t2 IS NOT NULL THEN 2
                    WHEN s1.t1 IS NOT NULL THEN 1
                    ELSE 0 END AS funnel_level
        FROM (SELECT DISTINCT user_id FROM events) u
        LEFT JOIN s1 USING (user_id)
        LEFT JOIN s2ok USING (user_id)
        LEFT JOIN s3ok USING (user_id)
    )
    SELECT funnel_level, COUNT(*) AS n_users FROM lv GROUP BY funnel_level
"""

ORACLES["events_window_funnel_increase"] = """
    WITH s1 AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN s1 USING (user_id)
        WHERE e.event_type = 'click'
          AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL 24 HOUR
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN s2 USING (user_id)
        WHERE e.event_type = 'purchase'
          AND e.ts > s2.t2 AND e.ts <= s2.t2 + INTERVAL 24 HOUR
        GROUP BY e.user_id
    ),
    lv AS (
        SELECT u.user_id,
               CASE WHEN s3.t3 IS NOT NULL THEN 3
                    WHEN s2.t2 IS NOT NULL THEN 2
                    WHEN s1.t1 IS NOT NULL THEN 1
                    ELSE 0 END AS funnel_level
        FROM (SELECT DISTINCT user_id FROM events) u
        LEFT JOIN s1 USING (user_id)
        LEFT JOIN s2 USING (user_id)
        LEFT JOIN s3 USING (user_id)
    )
    SELECT funnel_level, COUNT(*) AS n_users FROM lv GROUP BY funnel_level
"""

ORACLES["events_value_histogram"] = """
    WITH b AS (SELECT MIN(value) AS mn, MAX(value) AS mx FROM events),
    x AS (
        SELECT LEAST(CAST(FLOOR((value - mn) / ((mx - mn) / 10)) AS INT),
                     9) AS bucket,
               mn, mx
        FROM events, b
    )
    SELECT bucket,
           CAST(mn + bucket * ((mx - mn) / 10) AS DOUBLE) AS lo,
           CAST(mn + (bucket + 1) * ((mx - mn) / 10) AS DOUBLE) AS hi,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM x GROUP BY bucket, mn, mx
"""

ORACLES["events_window_funnel_strict"] = """
    WITH seq AS (
        SELECT user_id, ts, event_type,
               LEAD(event_type, 1) OVER w AS n1_type,
               LEAD(ts, 1) OVER w AS n1_ts,
               LEAD(event_type, 2) OVER w AS n2_type,
               LEAD(ts, 2) OVER w AS n2_ts,
               ROW_NUMBER() OVER w AS rn
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    anchors AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                ORDER BY rn ASC) AS sn
            FROM seq WHERE event_type = 'signup'
        ) WHERE sn = 1
    ),
    lv AS (
        SELECT user_id,
               CASE WHEN n1_type = 'click'
                         AND n1_ts <= ts + INTERVAL 24 HOUR
                         AND n2_type = 'purchase'
                         AND n2_ts <= n1_ts + INTERVAL 24 HOUR THEN 3
                    WHEN n1_type = 'click'
                         AND n1_ts <= ts + INTERVAL 24 HOUR THEN 2
                    ELSE 1 END AS l
        FROM anchors
    ),
    users AS (SELECT DISTINCT user_id FROM events)
    SELECT COALESCE(lv.l, 0) AS funnel_level,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM users LEFT JOIN lv USING (user_id)
    GROUP BY COALESCE(lv.l, 0)
"""

ORACLES["events_sequence_next_node"] = """
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type, 1) OVER w AS n1_type,
               LEAD(event_type, 2) OVER w AS n2_type,
               ROW_NUMBER() OVER w AS rn
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    m AS (
        SELECT * FROM (
            SELECT user_id, n2_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY rn ASC) AS mn
            FROM seq
            WHERE event_type = 'signup' AND n1_type = 'click'
        ) WHERE mn = 1
    )
    SELECT n2_type AS next_node, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM m GROUP BY n2_type
"""

ORACLES["events_weighted_quantiles"] = """
    WITH g AS (
        SELECT event_type, value, SUM(1 + user_id % 3) AS w
        FROM events GROUP BY event_type, value
    ),
    c AS (
        SELECT event_type, value,
               SUM(w) OVER (PARTITION BY event_type ORDER BY value) AS cum,
               SUM(w) OVER (PARTITION BY event_type) AS tw
        FROM g
    )
    SELECT event_type,
           MIN(CASE WHEN cum >= 0.5 * tw THEN value END) AS p50_weighted,
           MIN(CASE WHEN cum >= 0.9 * tw THEN value END) AS p90_weighted,
           CAST(MAX(tw) AS BIGINT) AS total_weight
    FROM c GROUP BY event_type
"""
