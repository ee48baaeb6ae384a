"""The free Spark-SQL surface the engine exposes beyond the reference's own
operators (SURVEY §2.4-2.8): semi/anti/outer joins, ranking windows, set
operations, CUBE/ROLLUP, correlated-subquery decorrelation (X10), top-k, and
the D1-D4 DDL lifecycle.  The reference needs only a subset of these, but a
user switching from it gets the whole relational algebra; every query here
is oracle-checked against DuckDB.

Scale notes: each query is a single declarative plan — Catalyst picks
broadcast vs sort-merge (dims under the 64 MB threshold broadcast;
fact-fact joins sort-merge with AQE skew handling).  Nothing here collects
or loops on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.files import load_table, register_views

DEC = "decimal(18,2)"


def _dec(c: str) -> F.Column:
    return F.col(c).cast(DEC)


# --- joins beyond the FK lattice -------------------------------------------


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (the NOT EXISTS shape Catalyst plans as a broadcast
    anti join for small builds): customers with no high-value order — the
    filter keeps the anti set non-empty at every fixture SF."""
    customer = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        customer.join(big, customer.c_custkey == big.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def customers_with_orders_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): dedup-free 'has at least one order'."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_mktsegment")
    )


def customer_order_counts_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join + group: customers with their order count, zeros
    included — aggregate-then-join (pre-aggregation before the join keeps
    the shuffle on the smaller grouped side, the scale-correct order)."""
    customer = load_table(spark, sf_dir, "customer")
    counts = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        customer.join(counts, customer.c_custkey == counts.o_custkey, "left")
        .select("c_custkey", F.coalesce("n_orders", F.lit(0)).alias("n_orders"))
    )


def nation_supplier_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join over nation × supplier-presence."""
    nation = load_table(spark, sf_dir, "nation")
    sup = (
        load_table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return (
        nation.join(sup, nation.n_nationkey == sup.s_nationkey, "full_outer")
        .select(
            F.col("n_nationkey").cast("int").alias("n_nationkey"),
            "n_name",
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


# --- ranking / frame windows ------------------------------------------------


def supplier_balance_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / lag in one pass (free window surface, SURVEY
    §2.6): suppliers ranked by account balance within nation."""
    sup = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey").asc())
    return sup.select(
        "s_suppkey",
        F.col("s_nationkey").cast("int").alias("s_nationkey"),
        F.col("s_acctbal").alias("s_acctbal"),
        F.rank().over(w).cast("long").alias("bal_rank"),
        F.dense_rank().over(w).cast("long").alias("bal_dense_rank"),
        F.lag("s_suppkey", 1).over(w).alias("prev_suppkey"),
    )


def orders_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-spec window (rowsBetween unbounded-preceding → current): running
    order count per customer in date order."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("orders_so_far"),
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("spend_so_far"),
    )


def orders_trailing_30d_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window with VALUE bounds (not row counts): per customer,
    the average order price over the trailing 30 days of each order —
    orders 31+ days back fall out of the frame regardless of how many rows
    sit between.  Ordered on epoch-days so the range arithmetic is integer
    and engine-portable."""
    orders = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day.cast("long"))
        .rangeBetween(-30, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.avg(_dec("o_totalprice")).over(w).cast("double"), 4).alias("avg_30d"),
        F.count(F.lit(1)).over(w).alias("n_in_window"),
    )


# --- set operations ---------------------------------------------------------


def buyer_segment_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT in one result: customer keys tagged by
    which set operation produced them."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    buyers = orders.select(F.col("o_custkey").alias("k")).distinct()
    auto = customer.filter(F.col("c_mktsegment") == "AUTOMOBILE").select(F.col("c_custkey").alias("k"))
    return (
        buyers.intersect(auto).withColumn("tag", F.lit("auto_buyer"))
        .unionByName(auto.exceptAll(buyers).withColumn("tag", F.lit("auto_no_orders")))
    )


# --- grouping sets / cube ---------------------------------------------------


def lineitem_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) with grouping id — the
    grouping-sets surface (free in Spark, SURVEY §2.5)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.grouping_id().cast("long").alias("gid"),
        )
    )


# --- top-k / distinct aggregates -------------------------------------------


def orders_status_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 — dedup-as-set-semantics (``dropDuplicates``): the distinct
    (status, priority) combinations — the Replacing-merge collapse without a
    version column (clickhouse.sql:51)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select("o_orderstatus", "o_orderpriority").dropDuplicates()


def top_parts_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT (Spark plans TakeOrderedAndProject — a per-partition
    top-k then a driver-side k-merge, no global sort)."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.orderBy(F.col("p_retailprice").desc(), F.col("p_partkey").asc())
        .select("p_partkey", "p_name", "p_retailprice")
        .limit(10)
    )


def segment_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group (expand + two-phase agg under the hood)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_distinct_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def orders_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts by priority (rows) × status (columns) — the
    wide-format reporting shape (explicit value list keeps the plan static,
    the scale-correct pivot form: no extra distinct-scan to discover
    columns)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("n_f"),
            F.coalesce("O", F.lit(0)).alias("n_o"),
            F.coalesce("P", F.lit(0)).alias("n_p"),
        )
    )


def events_props_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral explode over semi-structured data: count occurrences of each
    top-level key in the events ``props`` JSON column
    (schema-discovery-style op over schema-on-read data)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.select(
            F.explode(F.json_object_keys("props")).alias("key"),
            F.get_json_object("props", "$.k").cast("long").alias("kv"),
        )
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("kv").alias("n_distinct_values"),
            F.sum("kv").alias("sum_values"),
        )
    )


def salted_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe grouped SUM: the salted two-phase plan (operators/skew.py)
    must produce bit-identical results to the plain groupBy — the oracle IS
    the plain aggregation."""
    from ..operators.skew import salted_agg

    orders = load_table(spark, sf_dir, "orders")
    return salted_agg(
        orders,
        keys=["o_custkey"],
        sum_cols={"revenue": _dec("o_totalprice")},
        n_salts=8,
        count_alias="n_orders",
    ).select("o_custkey", F.col("revenue").cast("double").alias("revenue"), "n_orders")


# --- X10: correlated scalar subquery through the SQL text surface ----------


def sql_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/X10 — the reference's correlated UPDATE subquery
    (init_postgresql_data_scenario2.sql:174-179) expressed as SQL text;
    Catalyst decorrelates it into aggregate + left join automatically."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey,
               CAST((SELECT SUM(CAST(l_quantity AS DECIMAL(18,2)))
                     FROM lineitem WHERE l_orderkey = o_orderkey) AS DOUBLE) AS total_qty
        FROM orders
        """
    )


def sql_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery predicate — Catalyst rewrites it to a left-semi hash
    join (verify: no per-row subquery execution in the plan)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_orderstatus
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'BUILDING')
        """
    )


def sql_scalar_subquery_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery in the projection — computed once and
    broadcast as a literal into every row (one extra tiny job, no per-row
    re-execution)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p_partkey,
               CAST(p_retailprice AS DOUBLE) AS price,
               ROUND(CAST(p_retailprice - (SELECT AVG(p_retailprice) FROM part)
                     AS DOUBLE), 4) AS price_vs_avg
        FROM part
        """
    )


def zorder_customer_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1+ — the Morton/Z-order key (operators/upsert.zorder_key) over two
    dimensions, the multi-column data-skipping layout.  Emitted as a value
    query so the bit-interleave itself is oracle-pinned; the physical
    clustering (cluster_by_zorder) is exercised in tests."""
    from ..operators.upsert import zorder_key

    cust = load_table(spark, sf_dir, "customer").withColumn(
        "ckey_mod", (F.col("c_custkey") % 256).cast("bigint")
    ).withColumn("nkey", F.col("c_nationkey").cast("bigint"))
    return cust.select(
        "c_custkey",
        zorder_key(["ckey_mod", "nkey"], bits_per_col=8).alias("zkey"),
    )


#: the same interleave formula, generated for the DuckDB oracle
_Z_SQL = " + ".join(
    f"((((c_custkey % 256) >> {b}) & 1) << {b * 2}) + (((c_nationkey >> {b}) & 1) << {b * 2 + 1})"
    for b in range(8)
)


# --- D1-D4: DDL lifecycle ---------------------------------------------------


def ddl_view_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1-D4 — CREATE DATABASE IF NOT EXISTS / USE-equivalent / CREATE OR
    REPLACE VIEW / idempotent DROP (init.sql:1-9, clickhouse.sql:2-6,70):
    the catalog lifecycle, then a query through the view."""
    register_views(spark, sf_dir)
    spark.sql("CREATE DATABASE IF NOT EXISTS analytics")
    spark.sql("DROP VIEW IF EXISTS analytics_region_vw")  # D2: idempotent re-init
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW analytics_region_vw AS "
        "SELECT r_regionkey, r_name FROM region"
    )
    return spark.sql(
        "SELECT n.n_name, v.r_name FROM nation n JOIN analytics_region_vw v "
        "ON n.n_regionkey = v.r_regionkey"
    )


def ch_dict_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r9 — the ClickHouse external-dictionary lookup
    (``dictGetOrDefault('customers', 'name', o_custkey, 'unknown')``):
    orders enriched from a customer dictionary via
    ``operators.transforms.dict_get`` — broadcast lookup, CH's
    missing-key default semantics exercised for real by restricting the
    dictionary to c_custkey < 500 (every other order gets the
    defaults).  One broadcast hash join, fact side never shuffles."""
    from ..operators.transforms import dict_get

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    dim = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 500)
        .select("c_custkey", "c_name", "c_acctbal")
    )
    return dict_get(
        orders, dim, key="o_custkey", dict_key="c_custkey",
        attrs={
            "cust_name": ("c_name", "unknown"),
            "cust_acctbal": ("c_acctbal", 0.0),
        },
    ).select(
        "o_orderkey", "o_custkey", "cust_name",
        F.col("cust_acctbal").cast("double").alias("cust_acctbal"),
    )


def ch_with_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r9 — the ClickHouse ``GROUP BY … WITH TOTALS`` modifier: the
    grouped result plus ONE extra row carrying the whole-input aggregate
    (group key NULL) — exactly Spark's ROLLUP at one level, so Catalyst
    plans a single pass with grouping sets, not a second scan."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total"),
        )
    )


def ch_limit_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r9 — the ClickHouse ``ORDER BY … LIMIT n BY group`` clause: the
    top-2 orders per customer by price (deterministic tie-break on
    orderkey).  Spark shape: one ranked window partitioned by the group
    key — a single hash shuffle on o_custkey, no global sort (the CH
    clause's whole point is per-group limits without a global top-k)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 2)
        .select(
            "o_custkey", "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("__rn").cast("int").alias("rank_in_customer"),
        )
    )


def ch_limit_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r14 — the ClickHouse/ANSI ``ORDER BY … LIMIT n WITH TIES``
    clause: the global top-n plus every row TYING the boundary value —
    as a SET, exactly the rows whose key ≥ the n-th key (DESC), a pure
    function of the data (no tie-break needed, which is the clause's
    point).  The 20 most recent order dates here, ties included.

    Scale shape: NOT a global rank window (one reducer sorting the
    table).  Two phases — (1) the boundary key via a real top-n
    (Spark plans ``TakeOrderedAndProject``, every partition
    contributes ≤ n rows), (2) a broadcast 1-row boundary + a
    map-side ``>=`` filter over the scan.  At 100 TB phase 2 is a
    projection-cheap filtered scan; nothing corpus-sized shuffles."""
    orders = load_table(spark, sf_dir, "orders")
    n = 20
    boundary = (
        orders.select("o_orderdate")
        .orderBy(F.col("o_orderdate").desc())
        .limit(n)
        .groupBy().agg(F.min("o_orderdate").alias("__cut"))
    )
    return (
        orders.join(F.broadcast(boundary))
        .filter(F.col("o_orderdate") >= F.col("__cut"))
        .select(
            "o_orderkey", "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
        )
    )


def ch_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — the ClickHouse/ANSI ``GROUP BY GROUPING SETS`` clause with
    the ``GROUPING()`` marker function (CH ≥ 22.6 supports the full
    form; CUBE/ROLLUP — already covered by ``lineitem_cube`` /
    ``revenue_rollup`` — are its two shorthands): the
    status×priority detail, the per-status subtotal, and the grand
    total in ONE pass, each row tagged with which keys are aggregated
    away (the disambiguator between a grouped NULL and a rolled-up
    slot).

    Spark shape: the native ``groupingSets`` lowering — Catalyst plans
    a single Expand + hash aggregate (one scan, one shuffle on the
    expanded key), NOT three scans unioned; at 100 TB the Expand
    multiplies rows by the set count BEFORE the partial aggregate, so
    the map-side combine still bounds what shuffles."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupingSets(
        [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
        "o_orderstatus", "o_orderpriority",
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(_dec("o_totalprice")).cast("double").alias("total"),
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
    )


def ch_any_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — the ClickHouse ``LEFT ANY JOIN`` strictness: each left row
    matches AT MOST ONE right row (CH's documented cure for join-key
    multiplicity explosions).  CH picks an unspecified right row; a
    distributed engine must not ship nondeterminism, so this
    re-expression STRENGTHENS the contract to first-by-sort-key —
    lexicographic min of (l_linenumber, l_partkey, l_quantity); the
    fixture's line numbers can repeat within an order, so the ordering
    key extends through the emitted values, making the OUTPUT a pure
    function of the data on every run and partitioning.

    Spark shape (the scale-correct order): pre-aggregate the right
    side to one row per key with ``min_by`` (map-side combinable — the
    shuffle carries one row per key, NOT the raw multiplicity), then a
    plain equi-join; Catalyst broadcasts when small, sort-merges with
    AQE skew splitting when not.  Joining raw-then-deduping would
    shuffle the full lineitem multiplicity first."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    one = li.groupBy("l_orderkey").agg(
        F.min(
            F.struct(
                F.col("l_linenumber"), F.col("l_partkey"), F.col("l_quantity")
            )
        ).alias("__any")
    )
    return (
        orders.join(one, orders.o_orderkey == one.l_orderkey, "left")
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.col("__any.l_partkey").alias("any_partkey"),
            F.col("__any.l_quantity").cast("double").alias("any_quantity"),
        )
    )


def ch_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — the ClickHouse ``ASOF JOIN`` clause (equi-keys + one
    inequality, CH's flagship non-ANSI join: quotes-to-trades, state
    as-of event time): each order joined to its customer's latest
    event at-or-before the order date — LEFT ASOF semantics (orders
    with no prior event survive with NULLs, ``ASOF LEFT JOIN``).

    Rides the engine's as-of operator (operators/asof.py): tag both
    inputs, union, ONE keyed window with last(ignorenulls) — a single
    hash shuffle on the customer key, no range explosion, no per-row
    lookup.  Ties on the event timestamp break on event_id (largest
    wins — CH ASOF takes the closest value, and a deterministic
    engine must define 'closest' under ties).  The oracle re-derives
    the winner with an explicit ROW_NUMBER over the same ordering."""
    from ..operators.asof import asof_join

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    events = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("o_custkey"),
        "event_id",
        "event_type",
        "ts",
    )
    j = asof_join(
        orders, events, on=["o_custkey"], left_ts="o_orderdate",
        right_ts="ts", tiebreak="event_id", right_prefix="last_",
    )
    return j.select(
        "o_orderkey",
        "o_custkey",
        F.col("last_event_id").alias("last_event_id"),
        F.col("last_event_type").alias("last_event_type"),
        F.col("last_ts").alias("last_event_ts"),
    )


def ch_time_bucket_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — the ClickHouse time-bucketing function family beyond the
    hour/day truncs already exercised: ``toStartOfFifteenMinutes``
    (interval buckets below the named-unit ladder), ``toMonday``
    (week-start as DATE), ``toStartOfQuarter``, ``toYYYYMM`` (the
    numeric partition-key idiom CH table definitions use), and
    ``formatDateTime`` — all over the event stream's µs timestamps.

    Map-only projections (trunc + format in whole-stage codegen); at
    100 TB these fuse into the scan and exist to FEED partition-pruned
    layouts, which is why the YYYYMM integer matters.  The oracle
    recomputes each bucket with DuckDB's calendar functions — Monday
    week-start and quarter boundaries must agree exactly."""
    events = load_table(spark, sf_dir, "events")
    q15_us = F.lit(15 * 60 * 1_000_000)
    # the fixture reads as TIMESTAMP_NTZ; unix_micros wants TIMESTAMP —
    # the session zone is pinned UTC, so the cast preserves the instant
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    return events.select(
        "event_id",
        F.timestamp_micros(
            (F.floor(ts_us / q15_us) * q15_us).cast("long")
        ).alias("start_15min"),
        F.date_trunc("week", F.col("ts")).cast("date").alias("monday"),
        F.date_trunc("quarter", F.col("ts")).cast("date").alias("quarter_start"),
        F.date_format("ts", "yyyyMM").cast("int").alias("yyyymm"),
        F.date_format("ts", "yyyy-MM-dd HH:mm").alias("formatted"),
    )


def ch_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — the ClickHouse ``dateDiff`` vs ``age`` semantic pair (the
    documented trap: dateDiff counts BOUNDARY CROSSINGS — 23:59 to
    00:01 is one 'day' — while age counts COMPLETE elapsed units) plus
    ``toRelativeHourNum`` and the month-add clamp, over the event
    stream against a fixed anchor (2024-02-01, in-range at every SF).

    Every output is exact: boundary diffs are calendar arithmetic,
    ages are floor-divided epoch deltas (integer), month diff is the
    explicit (y·12+m) crossing count, and ``addMonths`` on late-January
    days pins the Feb-29 leap clamp both engines share.  Map-only."""
    events = load_table(spark, sf_dir, "events")
    anchor = "TIMESTAMP '2024-02-01 00:00:00'"
    ts_s = "unix_seconds(cast(ts as timestamp))"
    anchor_s = f"unix_seconds({anchor})"
    return events.select(
        "event_id",
        F.expr(f"datediff(date({anchor}), date(ts))")
        .cast("int")
        .alias("date_diff_days"),
        F.expr(
            f"(2024 * 12 + 2) - (year(ts) * 12 + month(ts))"
        ).cast("int").alias("date_diff_months"),
        F.expr(f"floor(({anchor_s} - {ts_s}) / 86400)")
        .cast("long")
        .alias("age_days"),
        F.expr(f"floor(({anchor_s} - {ts_s}) / 3600)")
        .cast("long")
        .alias("age_hours"),
        F.expr(f"floor({ts_s} / 3600)").cast("long").alias("rel_hour_num"),
        F.expr("add_months(date(ts), 1)").alias("plus_month"),
    )


def ch_array_enumerate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — ClickHouse's array-enumeration family over a planted
    per-order array with real repeats ([k%3, k%5, k%3, k%7, k%3]):
    ``arrayEnumerateUniq`` (per-element occurrence index — 1,1,2,1,3
    shape wherever the k%3 value recurs), ``arrayEnumerateDense``
    (first-occurrence dense rank), and ``arrayUniq`` — the trio CH's
    funnel/dedup array idioms build on.  Arrays emit joined as strings
    (scalar-column contract), every element value-checked.  Map-only,
    zero shuffles."""
    orders = load_table(spark, sf_dir, "orders")
    k = "o_orderkey"
    a = (
        f"array(CAST({k} % 3 AS BIGINT), CAST({k} % 5 AS BIGINT), "
        f"CAST({k} % 3 AS BIGINT), CAST({k} % 7 AS BIGINT), "
        f"CAST({k} % 3 AS BIGINT))"
    )
    uniq_idx = (
        "transform(sequence(1, 5), i -> size(filter(slice(__a, 1, i), "
        "x -> x = element_at(__a, i))))"
    )
    dense = "transform(__a, x -> array_position(array_distinct(__a), x))"
    j = "array_join(transform({x}, v -> CAST(v AS STRING)), ',')"
    return (
        orders.select(k, F.expr(a).alias("__a"))
        .select(
            k,
            F.expr(j.format(x=uniq_idx)).alias("enum_uniq"),
            F.expr(j.format(x=dense)).alias("enum_dense"),
            F.expr("size(array_distinct(__a))").cast("int").alias("n_uniq"),
        )
    )


def ch_sample_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r9 — the ClickHouse ``SAMPLE f`` clause: a DETERMINISTIC f-fraction
    of the table keyed on the sampling key's hash (CH samples by
    intHash of the PK so repeated queries see the SAME subset — unlike
    Bernoulli rand() sampling).  Portable hash: the md5-60-bit idiom
    every sketch oracle shares; keep rows whose key hash falls in the
    lowest 10% of the hash space.  Map-only: the filter pushes to the
    scan side of any downstream plan."""
    from ..operators.sketch import KMV_HASH_SPACE, kmv_hash_expr

    orders = load_table(spark, sf_dir, "orders")
    cut = int(KMV_HASH_SPACE * 0.10)
    return orders.filter(kmv_hash_expr("o_orderkey") < cut).select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    )


def ch_array_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r11 — the ClickHouse ``ARRAY JOIN`` clause family in one query:
    LEFT ARRAY JOIN (rows with empty arrays survive with NULLs — CH's
    LEFT variant; the plain variant is the same plan minus the
    null-preserving explode), multiple PARALLEL arrays unrolled in
    LOCKSTEP (CH zips same-length arrays — NOT a cross product), and
    ``arrayEnumerate`` (the element index CH exposes alongside).

    Spark shape: build the arrays in one projection, ``arrays_zip`` the
    parallel arrays, ``posexplode_outer`` for the null-preserving
    index+element unroll — map-only, zero shuffles, whole-stage codegen
    end to end.  Array content is a pure function of o_orderkey
    (``[k%3, k%5]`` filtered to positives; empty when both divide), so
    every exploded row is closed-form for the oracle."""
    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    items = F.filter(
        F.array((k % 3).cast("long"), (k % 5).cast("long")),
        lambda x: x > 0,
    )
    df = orders.select(
        k.alias("o_orderkey"),
        items.alias("items"),
        F.transform(items, lambda x: x * 10.0).alias("tens"),
    )
    return df.select(
        "o_orderkey",
        F.posexplode_outer(F.arrays_zip("items", "tens")).alias("idx", "z"),
    ).select(
        "o_orderkey",
        F.col("idx").cast("int").alias("idx"),
        F.col("z.items").alias("item"),
        F.col("z.tens").cast("double").alias("item_x10"),
    )


def ch_running_diff_neighbor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r11 — ClickHouse's block-order inspection functions, given the
    WELL-DEFINED distributed semantics CH itself recommends migrating to
    (their docs deprecate ``neighbor``/``runningDifference`` in favor of
    window functions precisely because block order is arbitrary):
    ``runningDifference(v)`` = v − lag(v), ``neighbor(v, −1/+1)`` =
    lag/lead, over an EXPLICIT per-user event-time order.  One hash
    shuffle on user_id, no global sort."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    return events.select(
        "user_id", "event_id",
        F.col("value").alias("v"),
        (F.col("value") - F.lag("value").over(w)).alias("running_diff"),
        F.lag("value").over(w).alias("prev_v"),
        F.lead("value").over(w).alias("next_v"),
    )


def ch_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r12 — the ClickHouse array-transform function family over a
    deterministic per-order array: ``arrayCumSum`` (running prefix
    sums), ``arrayDifference`` (first element 0, then x[i]−x[i−1]),
    ``arrayCompact`` (consecutive duplicates collapsed — the planted
    array repeats (k+1)%7 non-consecutively and k%5 consecutively, so
    compact removes exactly one), plus ``arraySum``.  Arrays are
    emitted joined as strings (the driver's canonicalizer takes scalar
    columns only), so every ELEMENT is value-checked, not a reduction.
    Map-only over orders — zero shuffles."""
    orders = load_table(spark, sf_dir, "orders")
    k = "o_orderkey"
    a = (
        f"array(CAST({k} % 5 AS BIGINT), CAST({k} % 5 AS BIGINT), "
        f"CAST(({k} + 1) % 7 AS BIGINT), CAST(({k} * 3) % 11 AS BIGINT), "
        f"CAST(({k} + 1) % 7 AS BIGINT))"
    )
    cum = (
        "aggregate(__a, "
        "named_struct('out', CAST(array() AS array<bigint>), 's', CAST(0 AS BIGINT)), "
        "(st, x) -> named_struct('out', concat(st.out, array(st.s + x)), "
        "'s', st.s + x), st -> st.out)"
    )
    diff = (
        "transform(sequence(1, 5), i -> "
        "IF(i = 1, CAST(0 AS BIGINT), "
        "element_at(__a, i) - element_at(__a, i - 1)))"
    )
    compact = (
        "transform(filter(sequence(1, 5), i -> i = 1 "
        "OR element_at(__a, i) != element_at(__a, i - 1)), "
        "i -> element_at(__a, i))"
    )
    j = "array_join(transform({x}, v -> CAST(v AS STRING)), ',')"
    return (
        orders.select(k, F.expr(a).alias("__a"))
        .select(
            k,
            F.expr(j.format(x="__a")).alias("arr"),
            F.expr(j.format(x=cum)).alias("cum_sum"),
            F.expr(j.format(x=diff)).alias("difference"),
            F.expr(j.format(x=compact)).alias("compact"),
            F.expr(
                "aggregate(__a, CAST(0 AS BIGINT), (s, x) -> s + x)"
            ).alias("arr_sum"),
        )
    )


def ch_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r12 — the ClickHouse map-function family over a deterministic
    per-order map {s<k%3>: k%7, t<k%5>: k%11}: ``mapKeys`` /
    ``mapValues`` (emitted sorted+joined so every entry is
    value-checked), ``mapContains`` ('s0' membership), element access
    with a default (``m['s0']`` / CH's bracket-or-default idiom), and
    ``mapFilter`` (entries with value > 4, emitted as a sorted k=v
    list).  Map-only over orders — zero shuffles; the sibling of
    ``ch_array_functions``."""
    orders = load_table(spark, sf_dir, "orders")
    k = "o_orderkey"
    m = (
        f"map(concat('s', CAST({k} % 3 AS STRING)), CAST({k} % 7 AS BIGINT), "
        f"concat('t', CAST({k} % 5 AS STRING)), CAST({k} % 11 AS BIGINT))"
    )
    return (
        orders.select(k, F.expr(m).alias("__m"))
        .select(
            k,
            F.expr("array_join(array_sort(map_keys(__m)), ',')").alias("keys"),
            F.expr(
                "array_join(transform(array_sort(map_values(__m)),"
                " v -> CAST(v AS STRING)), ',')"
            ).alias("vals"),
            F.expr("array_contains(map_keys(__m), 's0')").alias("has_s0"),
            F.expr("coalesce(element_at(__m, 's0'), CAST(-1 AS BIGINT))")
            .alias("s0_or_default"),
            F.expr(
                "array_join(array_sort(transform("
                " map_entries(map_filter(__m, (x, v) -> v > 4)),"
                " e -> concat(e.key, '=', CAST(e.value AS STRING)))), ',')"
            ).alias("filtered"),
        )
    )


def ch_url_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r13 — the ClickHouse URL function family (``protocol`` /
    ``domain`` / ``domainWithoutWWW`` / ``topLevelDomain`` / ``path`` /
    ``queryString`` / ``extractURLParameter`` / ``cutQueryString``,
    CH's URL-functions doc page) over a deterministic per-order URL
    ``https://[www.]shop<k%7>.example(.co.uk|.org)/cat/<k%5>/item
    ?id=<k>&ref=aff<k%3>``.  The engine PARSES with Spark's JVM-side
    ``parse_url`` (codegen, no UDF); the URL is a closed form of
    o_orderkey, so the oracle reconstructs every part directly — the
    parse itself is what's under test.  Map-only, zero shuffles.
    ``extractURLParameter`` on a missing key mirrors CH's ''-default."""
    orders = load_table(spark, sf_dir, "orders")
    k = "o_orderkey"
    host = (
        f"concat(IF({k} % 4 = 0, 'www.', ''), 'shop', "
        f"CAST({k} % 7 AS STRING), '.example', "
        f"IF({k} % 3 = 0, '.co.uk', '.org'))"
    )
    url = (
        f"concat('https://', __host, '/cat/', CAST({k} % 5 AS STRING), "
        f"'/item?id=', CAST({k} AS STRING), '&ref=aff', "
        f"CAST({k} % 3 AS STRING))"
    )
    return (
        orders.select(k, F.expr(host).alias("__host"))
        .select(k, "__host", F.expr(url).alias("__url"))
        .select(
            k,
            F.expr("parse_url(__url, 'PROTOCOL')").alias("protocol"),
            F.expr("parse_url(__url, 'HOST')").alias("domain"),
            F.expr(
                "regexp_replace(parse_url(__url, 'HOST'), '^www\\\\.', '')"
            ).alias("domain_no_www"),
            F.expr(
                "substring_index(parse_url(__url, 'HOST'), '.', -1)"
            ).alias("tld"),
            F.expr("parse_url(__url, 'PATH')").alias("url_path"),
            F.expr("parse_url(__url, 'QUERY')").alias("query_string"),
            F.expr("CAST(parse_url(__url, 'QUERY', 'id') AS BIGINT)")
            .alias("param_id"),
            F.expr("parse_url(__url, 'QUERY', 'ref')").alias("param_ref"),
            F.expr("coalesce(parse_url(__url, 'QUERY', 'zz'), '')")
            .alias("param_missing"),
            F.expr("substring_index(__url, '?', 1)").alias("cut_query"),
        )
    )


def ch_agg_combinators_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — the second ClickHouse combinator family next to
    ch_agg_combinators' -If/-Array: ``-Distinct`` (sumDistinct /
    countDistinct over the planted k%5 plane — dedup INSIDE the
    aggregate, Spark's sum_distinct/count_distinct natively),
    ``-OrNull`` (empty aggregation set → NULL instead of the default),
    and ``-OrDefault`` (the coalesce twin: empty set → the type
    default 0).  The empty set is PLANTED structurally (the predicate
    excludes status 'P' by construction — the fixture's statuses are
    uniform, so no value bound empties a group at every SF), making
    the P-group's (NULL, 0) pair deterministic at any scale — a wrong
    empty-set convention flips exactly one group.

    One hash agg on the 3-value status key; distinct adds the standard
    partial-distinct expand, nothing corpus-sized."""
    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    dec = _dec("o_totalprice")
    never_p = (F.col("o_totalprice") > 450000) & (
        F.col("o_orderstatus") != "P"
    )
    base = orders.select(
        "o_orderstatus",
        (k % 5).cast("long").alias("k5"),
        dec.alias("price"),
        never_p.alias("big"),
    )
    big_price = F.when(F.col("big"), F.col("price"))
    return base.groupBy("o_orderstatus").agg(
        F.sum_distinct(F.col("k5")).cast("long").alias("sum_distinct_k5"),
        F.count_distinct(F.col("k5")).cast("long").alias("uniq_exact_k5"),
        F.count(big_price).cast("long").alias("count_big"),
        F.max(big_price).cast("double").alias("max_or_null_big"),
        F.coalesce(F.max(big_price).cast("double"), F.lit(0.0)).alias(
            "max_or_default_big"
        ),
        F.coalesce(_dec2dbl(F.sum(big_price)), F.lit(0.0)).alias(
            "sum_or_default_big"
        ),
    )


def ch_agg_combinators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r13 — ClickHouse aggregate COMBINATORS (``-If`` and ``-Array``,
    CH's combinators doc page) over orders grouped by o_orderpriority:
    ``countIf`` / ``sumIf`` / ``avgIf`` / ``minIf`` (conditional
    aggregation without a pre-filter — Spark's FILTER clause /
    conditional aggregate, one shuffle on the group key with map-side
    partial aggregation), plus ``sumArray`` and ``uniqArray`` over a
    planted per-row array [k%3, k%7].  CH's empty-set conventions are
    mirrored explicitly: sumIf → 0, minIf → 0, avgIf → NULL (CH nan ≡
    SQL NULL here).  ``uniqArray`` (distinct elements across all the
    group's arrays) is computed as explode → COUNT(DISTINCT) in a
    second aggregation over the SAME shuffle key and joined back
    (5-row post-agg join) — never a per-group collect_list, which
    would materialize the whole group's arrays in one row at 100 TB."""
    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    dec = _dec("o_totalprice")
    is_f = F.col("o_orderstatus") == "F"
    is_o = F.col("o_orderstatus") == "O"
    is_p = F.col("o_orderstatus") == "P"
    arr = F.array((k % 3).cast("long"), (k % 7).cast("long"))
    base = orders.select(
        "o_orderpriority", "o_orderstatus", k.alias("k"),
        dec.alias("price"), arr.alias("arr"),
    )
    sum_f = F.sum(F.when(is_f, F.col("price"))).cast("double")
    cnt_f = F.sum(F.when(is_f, 1).otherwise(0))
    main = base.groupBy("o_orderpriority").agg(
        F.count(F.when(is_f, 1)).alias("count_if_f"),
        F.coalesce(F.sum(F.when(is_o, F.col("price"))).cast("double"),
                   F.lit(0.0)).alias("sum_if_o"),
        F.when(
            cnt_f > 0,
            F.floor(sum_f / cnt_f * 1e4 + 0.5) / 1e4,
        ).alias("avg_if_f"),
        F.coalesce(F.min(F.when(is_p, F.col("price"))).cast("double"),
                   F.lit(0.0)).alias("min_if_p"),
        F.sum(F.expr(
            "aggregate(arr, CAST(0 AS BIGINT), (s, x) -> s + x)"
        )).alias("sum_array"),
    )
    uniq = (
        base.select("o_orderpriority", F.explode("arr").alias("e"))
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("e").alias("uniq_array"))
    )
    return main.join(uniq, "o_orderpriority")


def ch_moving_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r13 — ClickHouse's moving/delta aggregate family given the
    well-defined windowed semantics (CH's ``groupArrayMovingSum(3)`` /
    ``groupArrayMovingAvg(3)`` emit per-position moving windows over
    the group's insertion order; ``deltaSum`` sums positive deltas in
    block order — both order-sensitive, so like
    ``ch_running_diff_neighbor`` this pins the EXPLICIT per-customer
    (o_orderdate, o_orderkey) order CH's own docs recommend migrating
    to): per order row the 3-row moving sum/avg of o_totalprice, plus
    the partition-wide positive-delta sum.  One hash shuffle on
    o_custkey; DECIMAL(18,2) sums cast to double (exact in the cents
    domain), avg via the engine-portable floor(x·1e4+0.5)/1e4."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w3 = w.rowsBetween(-2, 0)
    wall = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    stepped = orders.select(
        "o_custkey", "o_orderkey", "o_orderdate",
        _dec("o_totalprice").alias("price"),
        (_dec("o_totalprice") - F.lag(_dec("o_totalprice")).over(w))
        .alias("delta"),
        F.sum(_dec("o_totalprice")).over(w3).cast("double")
        .alias("moving_sum3"),
        F.count("*").over(w3).alias("__n3"),
    )
    return stepped.select(
        "o_custkey", "o_orderkey",
        "moving_sum3",
        (F.floor(F.col("moving_sum3") / F.col("__n3") * 1e4 + 0.5) / 1e4)
        .alias("moving_avg3"),
        F.sum(
            F.when(F.col("delta") > 0, F.col("delta")).otherwise(F.lit(0))
        ).over(wall).cast("double").alias("delta_sum"),
    )


def ch_string_search_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r13 — the ClickHouse string-SEARCH function family (CH's
    string-search-functions doc page) over the documents corpus:
    ``position`` (1-based, 0 when absent), ``positionCaseInsensitive``
    (a planted ' TABLE' suffix on doc_id %7 rows makes the
    case-folded find differ from the sensitive one), ``multiSearchAny``
    (any of ['merge','window','batch'] present), and
    ``multiSearchFirstIndex`` (1-based index of the FIRST pattern
    found, 0 when none — CH's documented return), plus
    ``countSubstrings`` (non-overlapping, via the replace-length
    identity both engines share).  Map-only, zero shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    t2 = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 7 == 0, F.lit(" TABLE")).otherwise(F.lit("")),
    )
    return docs.select("doc_id", t2.alias("__t")).select(
        "doc_id",
        F.expr("instr(__t, 'table')").cast("long").alias("pos_table"),
        F.expr("instr(lower(__t), 'table')").cast("long").alias("pos_table_ci"),
        F.expr(
            "instr(__t, 'merge') > 0 OR instr(__t, 'window') > 0 "
            "OR instr(__t, 'batch') > 0"
        ).alias("multi_any"),
        F.expr(
            "array_position(transform(array('merge', 'window', 'batch'), "
            "p -> instr(__t, p) > 0), true)"
        ).cast("long").alias("multi_first_index"),
        ((F.length("__t") - F.expr("length(replace(__t, 'ta', ''))")) / 2)
        .cast("long").alias("count_ta"),
    )


def supplier_rank_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r13 — the distribution-rank window family next to
    supplier_balance_ranks' rank/dense_rank/lag: ``ntile(4)`` balance
    quartiles per nation, ``percent_rank`` ((rank−1)/(n−1), exact
    integer ratio → bit-identical doubles in both engines) and
    ``cume_dist`` — the window functions a percentile-bucketing report
    uses.  Fully deterministic under the (acctbal DESC, suppkey ASC)
    total order; one hash shuffle on the nation key."""
    supplier = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey").asc()
    )
    return supplier.select(
        "s_suppkey",
        F.col("s_nationkey").cast("int").alias("s_nationkey"),
        "s_acctbal",
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume_dist"),
    )


# --- ClickHouse statistical aggregates (welchTTest / studentTTest /
# corr / covar / simpleLinearRegression) ------------------------------------
#
# Determinism contract: the only FP-dangerous step is summation, and both
# engines sum EXACT DECIMALs (order-independent); every double expression
# below is a shared Python string, so Spark (F.expr) and DuckDB evaluate
# the IDENTICAL tree on identical inputs — /, *, sqrt are IEEE
# exactly-rounded, hence bit-equal outputs; floor-round-6 is the final
# presentation guard.

_R6 = "floor(({x}) * 1e6 + 0.5) / 1e6"


def _dec2dbl(c: F.Column) -> F.Column:
    """Exact-decimal → double through the DECIMAL STRING: above 2^53 the
    engines' native decimal→double casts diverge (Java BigDecimal's
    single correct rounding vs DuckDB's int128→double then scale
    division — two roundings), while string→double is correctly-rounded
    strtod in both.  Same exact digits in, same double out."""
    return c.cast("string").cast("double")


def _r6(x: str) -> str:
    return _R6.format(x=x)


_V1 = "((sxx1 - (sx1 * sx1) / n1d) / (n1d - 1))"
_V2 = "((sxx2 - (sx2 * sx2) / n2d) / (n2d - 1))"
_Q1 = f"({_V1} / n1d)"
_Q2 = f"({_V2} / n2d)"
_MDIFF = "((sx1 / n1d) - (sx2 / n2d))"
_WELCH_EXPRS = {
    "mean_1": _r6("sx1 / n1d"),
    "mean_2": _r6("sx2 / n2d"),
    "var_1": _r6(_V1),
    "var_2": _r6(_V2),
    "t_welch": _r6(f"{_MDIFF} / sqrt({_Q1} + {_Q2})"),
    "df_welch": _r6(
        f"(({_Q1} + {_Q2}) * ({_Q1} + {_Q2}))"
        f" / ((({_Q1} * {_Q1}) / (n1d - 1)) + (({_Q2} * {_Q2}) / (n2d - 1)))"
    ),
    "t_student": _r6(
        f"{_MDIFF} / sqrt((((n1d - 1) * {_V1} + (n2d - 1) * {_V2})"
        f" / (n1d + n2d - 2)) * (1 / n1d + 1 / n2d))"
    ),
}


def ch_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — ClickHouse's two-sample t-test aggregates
    (``welchTTest(x, group)`` / ``studentTTest``): is the mean order
    value of open ('O') orders different from fulfilled ('F')?  Welch's
    unequal-variance t with the Welch–Satterthwaite df, plus Student's
    pooled-variance t — the A/B-significance surface a warehouse
    exposes as one aggregate.

    Spark shape: ONE map-side-combined scalar aggregate over the scan
    (conditional DECIMAL sums per group — no pivot, no second pass);
    the t/df formulas are a handful of scalar doubles on the single
    result row.  At 100 TB the whole test is one reduce of six exact
    numbers.  Float discipline: see the module-level determinism
    contract above ``_WELCH_EXPRS``."""
    orders = load_table(spark, sf_dir, "orders")
    d = _dec("o_totalprice")
    is1 = F.col("o_orderstatus") == "O"
    is2 = F.col("o_orderstatus") == "F"
    agg = orders.agg(
        F.count(F.when(is1, 1)).cast("long").alias("n1"),
        F.count(F.when(is2, 1)).cast("long").alias("n2"),
        _dec2dbl(F.sum(F.when(is1, d))).alias("sx1"),
        _dec2dbl(F.sum(F.when(is1, d * d))).alias("sxx1"),
        _dec2dbl(F.sum(F.when(is2, d))).alias("sx2"),
        _dec2dbl(F.sum(F.when(is2, d * d))).alias("sxx2"),
    ).select(
        "*",
        F.col("n1").cast("double").alias("n1d"),
        F.col("n2").cast("double").alias("n2d"),
    )
    return agg.select(
        "n1",
        "n2",
        *[F.expr(e).alias(name) for name, e in _WELCH_EXPRS.items()],
    )


_SXY = "(nd * sxy - sx * sy)"
_SXXN = "(nd * sxx - sx * sx)"
_SYYN = "(nd * syy - sy * sy)"
_SLOPE = f"({_SXY} / {_SXXN})"
_STATS_EXPRS = {
    "corr_xy": _r6(f"{_SXY} / (sqrt({_SXXN}) * sqrt({_SYYN}))"),
    "covar_pop": _r6("(sxy - (sx * sy) / nd) / nd"),
    "covar_samp": _r6("(sxy - (sx * sy) / nd) / (nd - 1)"),
    "stddev_pop_x": _r6("sqrt((sxx - (sx * sx) / nd) / nd)"),
    "slope": _r6(_SLOPE),
    "intercept": _r6(f"(sy - {_SLOPE} * sx) / nd"),
}


def ch_stats_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — ClickHouse's regression/correlation aggregate family
    (``corr`` / ``covarPop`` / ``covarSamp`` / ``stddevPop`` /
    ``simpleLinearRegression(x, y)``): per returnflag, how does
    extended price move with quantity — the one-pass sufficient-
    statistics form (n, Σx, Σy, Σx², Σy², Σxy) every engine's
    regression aggregate reduces to.

    Spark shape: one hash aggregate on the 3-value returnflag key,
    all six sufficient statistics as EXACT DECIMAL sums in the same
    map-side combine; the six derived doubles are per-group scalars.
    Nothing here gets worse at 100 TB: the shuffle carries 6 decimals
    × 3 groups.  Float discipline: shared expression strings (see
    ``_WELCH_EXPRS`` contract)."""
    li = load_table(spark, sf_dir, "lineitem")
    x = _dec("l_quantity")
    y = _dec("l_extendedprice")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        _dec2dbl(F.sum(x)).alias("sx"),
        _dec2dbl(F.sum(y)).alias("sy"),
        _dec2dbl(F.sum(x * x)).alias("sxx"),
        _dec2dbl(F.sum(y * y)).alias("syy"),
        _dec2dbl(F.sum(x * y)).alias("sxy"),
    ).select("*", F.col("n").cast("double").alias("nd"))
    return agg.select(
        "l_returnflag",
        "n",
        *[F.expr(e).alias(name) for name, e in _STATS_EXPRS.items()],
    )


_MW_Z = (
    "((u2ad / 2) - (nad * nbd) / 2)"
    " / sqrt(((nad * nbd) / 12) * ((nad + nbd + 1)"
    " - tie / ((nad + nbd) * (nad + nbd - 1))))"
)


def ch_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — ClickHouse's ``mannWhitneyUTest(x, group)`` aggregate: the
    nonparametric two-sample test (do 'A' and 'R' returnflag lines
    draw quantities from the same distribution?) — rank-based, so the
    whole computation reduces to the VALUE HISTOGRAM, not the rows.

    Exactness: quantities take ~50 distinct values, so the engine
    aggregates to per-value (count_A, count_B) first (one map-side-
    combined shuffle on the value), then computes midrank sums in
    DOUBLED-RANK INTEGER UNITS (rank2 = 2·prefix + t + 1 — the ½s of
    midranks never materialize as floats) over the 50-row aggregate.
    U, the rank sums, and the tie term Σ(t³−t) (DECIMAL — t³ overflows
    int64 at sf10) are all exact; only the final z-statistic is a
    mirrored double DAG (normal approximation with the standard tie
    correction), round-6 guarded.

    At 100 TB nothing changes: the shuffle carries |distinct values|
    rows; the windows below run over those rows only."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("A", "R")
    )
    q = F.col("l_quantity").cast("decimal(18,2)")
    per = li.groupBy(q.alias("v")).agg(
        F.count(F.when(F.col("l_returnflag") == "A", 1)).cast("long").alias("ca"),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).cast("long").alias("cb"),
    )
    wv = Window.orderBy("v")
    wall = Window.partitionBy()
    t = (F.col("ca") + F.col("cb")).cast("long")
    per = per.withColumn("t", t).withColumn(
        "pfx",
        F.coalesce(
            F.sum("t").over(wv.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).cast("long"),
    )
    rank2 = (F.lit(2) * F.col("pfx") + F.col("t") + 1).cast("long")
    agg = per.select(
        F.col("ca"), F.col("cb"), F.col("t"), rank2.alias("rank2")
    ).agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
        F.sum(F.col("ca") * F.col("rank2")).cast("long").alias("r2a"),
        F.sum(F.col("cb") * F.col("rank2")).cast("long").alias("r2b"),
        _dec2dbl(
            F.sum(
                F.col("t").cast("decimal(38,0)")
                * F.col("t").cast("decimal(38,0)")
                * F.col("t").cast("decimal(38,0)")
                - F.col("t").cast("decimal(38,0)")
            )
        ).alias("tie"),
    )
    agg = agg.select(
        "*",
        (F.col("r2a") - F.col("na") * (F.col("na") + 1))
        .cast("long")
        .alias("u2a"),
        (F.col("r2b") - F.col("nb") * (F.col("nb") + 1))
        .cast("long")
        .alias("u2b"),
    ).select(
        "*",
        F.col("na").cast("double").alias("nad"),
        F.col("nb").cast("double").alias("nbd"),
        F.col("u2a").cast("double").alias("u2ad"),
    )
    return agg.select(
        "na", "nb", "u2a", "u2b",
        F.col("tie").alias("tie_term"),  # exact via the decimal string
        F.expr(_r6(_MW_Z)).alias("z_stat"),
    )


def ch_kolmogorov_smirnov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — ClickHouse's ``kolmogorovSmirnovTest(x, group)`` aggregate:
    the distribution-shape companion to mannWhitneyUTest — the largest
    gap between the two empirical CDFs of line quantity for 'A' vs 'R'
    returnflags.

    Exactness: same value-histogram reduction as ch_mann_whitney
    (one map-side-combined shuffle to ~50 rows), then
    D = max_v |cumA·nB − cumB·nA| / (nA·nB) — the numerator is an
    EXACT BIGINT max over the histogram rows (cross-multiplied CDFs,
    no float division inside the max), and only the final ratio and
    the asymptotic √(nA·nB/(nA+nB))·D statistic are a mirrored double
    DAG.  3-output-scalar row at any input size."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("A", "R")
    )
    q = F.col("l_quantity").cast("decimal(18,2)")
    per = li.groupBy(q.alias("v")).agg(
        F.count(F.when(F.col("l_returnflag") == "A", 1)).cast("long").alias("ca"),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).cast("long").alias("cb"),
    )
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    per = per.select(
        F.sum("ca").over(wv).cast("long").alias("cuma"),
        F.sum("cb").over(wv).cast("long").alias("cumb"),
        F.sum("ca").over(wall).cast("long").alias("na"),
        F.sum("cb").over(wall).cast("long").alias("nb"),
    )
    agg = per.groupBy("na", "nb").agg(
        F.max(
            F.abs(F.col("cuma") * F.col("nb") - F.col("cumb") * F.col("na"))
        )
        .cast("long")
        .alias("d_num")
    ).select(
        "na", "nb", "d_num",
        F.col("na").cast("double").alias("nad"),
        F.col("nb").cast("double").alias("nbd"),
        F.col("d_num").cast("double").alias("dnd"),
    )
    d = "(dnd / (nad * nbd))"
    return agg.select(
        "na", "nb", "d_num",
        F.expr(_r6(d)).alias("d_stat"),
        F.expr(_r6(f"sqrt((nad * nbd) / (nad + nbd)) * {d}")).alias(
            "ks_stat"
        ),
    )


_ENT_SLNC = " + ".join(
    f"(CASE WHEN c{i}d > 0 THEN c{i}d * ln(c{i}d) ELSE 0 END)"
    for i in range(1, 6)
)
_ENT_SQ = " + ".join(f"c{i}d * c{i}d" for i in range(1, 6))
_ENT_PAIRS = " + ".join(f"c{i}d * (c{i}d - 1)" for i in range(1, 6))
_ENT_EXPRS = {
    "entropy_bits": _r6(f"(ln(nd) - ({_ENT_SLNC}) / nd) / ln(2)"),
    "gini_impurity": _r6(f"1 - ({_ENT_SQ}) / (nd * nd)"),
    "simpson_index": _r6(f"({_ENT_PAIRS}) / (nd * (nd - 1))"),
}
_PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")


def ch_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — ClickHouse's diversity aggregates (``entropy(x)`` plus the
    Gini-impurity / Simpson-index pair every class-balance report
    wants next to it): per order status, how spread out are the
    priorities?

    Exactness: the five priority values are a CLOSED enum, so the
    per-group distribution pivots into five exact integer counts
    (conditional counts, one map-side-combined agg — no second
    shuffle, no collect), and every float formula is a shared
    expression string with a FIXED term order (c1..c5) — the log-sum
    never depends on aggregation order.  Shannon entropy in bits and
    Simpson's Σc(c−1)/n(n−1) use the round-6-log discipline; Gini is
    pure div/mul.  Scale: 3 output rows regardless of input size."""
    orders = load_table(spark, sf_dir, "orders")
    counts = [
        F.count(F.when(F.col("o_orderpriority") == p, 1))
        .cast("long")
        .alias(f"c{i}")
        for i, p in enumerate(_PRIORITIES, 1)
    ]
    agg = orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n"), *counts
    )
    agg = agg.select(
        "*",
        F.col("n").cast("double").alias("nd"),
        *[F.col(f"c{i}").cast("double").alias(f"c{i}d") for i in range(1, 6)],
    )
    return agg.select(
        "o_orderstatus",
        "n",
        *[F.col(f"c{i}") for i in range(1, 6)],
        *[F.expr(e).alias(name) for name, e in _ENT_EXPRS.items()],
    )


def ch_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — ClickHouse's string-distance function family
    (``editDistance`` / ``byteHammingDistance`` /
    ``stringJaccardIndex`` / ``ngramDistance``-style trigram overlap):
    the fuzzy-matching primitives under entity resolution and
    near-duplicate candidate scoring, evaluated over adjacent-key part
    name pairs (a deterministic pair generator with real lexical
    variety — TPC-H names share word vocabulary).

    Determinism: every output is an exact INTEGER — edit distance,
    byte-Hamming (mismatches over the common prefix length + the
    length difference, CH's any-length contract), and the two
    set-similarity ratios DECOMPOSED into numerator/denominator pairs
    (trigram-set and charset intersection/union sizes) instead of a
    float division — the ratio is the caller's one division away, and
    the oracle stays bit-exact by construction.

    Spark shape: all JVM-side — ``levenshtein`` is a built-in;
    Hamming and the n-gram sets are ``transform``/``array_distinct``/
    ``array_intersect`` over ``sequence`` (whole-stage codegen, no
    Python).  The pair generator is a key+1 equi-join — one hash
    shuffle, no window over a global order, no cartesian."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    a = part.select(F.col("p_partkey").alias("pk"), F.col("p_name").alias("a"))
    b = part.select(
        (F.col("p_partkey") - 1).alias("pk"), F.col("p_name").alias("b")
    )
    pairs = a.join(b, "pk")

    def trigrams(c: str) -> F.Column:
        return F.array_distinct(
            F.expr(
                f"transform(sequence(1, length({c}) - 2),"
                f" i -> substring({c}, i, 3))"
            )
        )

    def charset(c: str) -> F.Column:
        return F.array_distinct(
            F.expr(
                f"transform(sequence(1, length({c})),"
                f" i -> substring({c}, i, 1))"
            )
        )

    mism = F.expr(
        "size(filter(transform(sequence(1, least(length(a), length(b))),"
        " i -> substring(a, i, 1) != substring(b, i, 1)), x -> x))"
    )
    ta, tb = trigrams("a"), trigrams("b")
    ca, cb = charset("a"), charset("b")
    tri_i = F.size(F.array_intersect(ta, tb))
    chr_i = F.size(F.array_intersect(ca, cb))
    return pairs.select(
        F.col("pk").alias("p_partkey"),
        F.levenshtein("a", "b").cast("long").alias("edit_distance"),
        (mism + F.abs(F.length("a") - F.length("b")))
        .cast("long")
        .alias("byte_hamming"),
        tri_i.cast("long").alias("trigram_inter"),
        (F.size(ta) + F.size(tb) - tri_i).cast("long").alias("trigram_union"),
        chr_i.cast("long").alias("charset_inter"),
        (F.size(ca) + F.size(cb) - chr_i).cast("long").alias("charset_union"),
    )


QUERIES = {
    "ch_array_functions": ch_array_functions,
    "ch_url_functions": ch_url_functions,
    "ch_string_search_functions": ch_string_search_functions,
    "supplier_rank_distribution": supplier_rank_distribution,
    "ch_agg_combinators": ch_agg_combinators,
    "ch_moving_aggregates": ch_moving_aggregates,
    "ch_map_functions": ch_map_functions,
    "ch_array_join": ch_array_join,
    "ch_running_diff_neighbor": ch_running_diff_neighbor,
    "ch_dict_get": ch_dict_get,
    "ch_with_totals": ch_with_totals,
    "ch_limit_by": ch_limit_by,
    "ch_limit_with_ties": ch_limit_with_ties,
    "ch_grouping_sets": ch_grouping_sets,
    "ch_any_join": ch_any_join,
    "ch_asof_join": ch_asof_join,
    "ch_welch_ttest": ch_welch_ttest,
    "ch_stats_functions": ch_stats_functions,
    "ch_string_distance": ch_string_distance,
    "ch_mann_whitney": ch_mann_whitney,
    "ch_entropy": ch_entropy,
    "ch_kolmogorov_smirnov": ch_kolmogorov_smirnov,
    "ch_agg_combinators_null": ch_agg_combinators_null,
    "ch_date_functions": ch_date_functions,
    "ch_array_enumerate": ch_array_enumerate,
    "ch_time_bucket_functions": ch_time_bucket_functions,
    "ch_sample_clause": ch_sample_clause,
    "customers_without_orders": customers_without_orders,
    "customers_with_orders_semi": customers_with_orders_semi,
    "customer_order_counts_outer": customer_order_counts_outer,
    "nation_supplier_full_outer": nation_supplier_full_outer,
    "supplier_balance_ranks": supplier_balance_ranks,
    "orders_running_totals": orders_running_totals,
    "buyer_segment_setops": buyer_segment_setops,
    "lineitem_cube": lineitem_cube,
    "orders_status_dedup": orders_status_dedup,
    "top_parts_by_price": top_parts_by_price,
    "segment_distinct_stats": segment_distinct_stats,
    "orders_status_pivot": orders_status_pivot,
    "events_props_keys": events_props_keys,
    "salted_customer_revenue": salted_customer_revenue,
    "sql_correlated_subquery": sql_correlated_subquery,
    "sql_in_subquery": sql_in_subquery,
    "sql_scalar_subquery_select": sql_scalar_subquery_select,
    "zorder_customer_locality": zorder_customer_locality,
    "orders_trailing_30d_avg": orders_trailing_30d_avg,
    "ddl_view_roundtrip": ddl_view_roundtrip,
}

_DEC_PRICE = "CAST(o_totalprice AS DECIMAL(18,2))"

ORACLES = {
    # the same _WELCH_EXPRS strings the Spark query evaluates — the
    # double DAG is textually identical on both sides
    "ch_welch_ttest": f"""
        WITH s AS (
            SELECT
                CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END)
                     AS BIGINT) AS n1,
                CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END)
                     AS BIGINT) AS n2,
                CAST(CAST(SUM(CASE WHEN o_orderstatus = 'O'
                              THEN {_DEC_PRICE} END) AS VARCHAR)
                     AS DOUBLE) AS sx1,
                CAST(CAST(SUM(CASE WHEN o_orderstatus = 'O'
                              THEN {_DEC_PRICE} * {_DEC_PRICE} END)
                     AS VARCHAR) AS DOUBLE) AS sxx1,
                CAST(CAST(SUM(CASE WHEN o_orderstatus = 'F'
                              THEN {_DEC_PRICE} END) AS VARCHAR)
                     AS DOUBLE) AS sx2,
                CAST(CAST(SUM(CASE WHEN o_orderstatus = 'F'
                              THEN {_DEC_PRICE} * {_DEC_PRICE} END)
                     AS VARCHAR) AS DOUBLE) AS sxx2
            FROM orders
        ),
        d AS (
            SELECT s.*, CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d
            FROM s
        )
        SELECT n1, n2,
               {_WELCH_EXPRS['mean_1']} AS mean_1,
               {_WELCH_EXPRS['mean_2']} AS mean_2,
               {_WELCH_EXPRS['var_1']} AS var_1,
               {_WELCH_EXPRS['var_2']} AS var_2,
               {_WELCH_EXPRS['t_welch']} AS t_welch,
               {_WELCH_EXPRS['df_welch']} AS df_welch,
               {_WELCH_EXPRS['t_student']} AS t_student
        FROM d
    """,
    "ch_stats_functions": f"""
        WITH s AS (
            SELECT l_returnflag,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                        AS VARCHAR) AS DOUBLE) AS sx,
                   CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                        AS VARCHAR) AS DOUBLE) AS sy,
                   CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                            * CAST(l_quantity AS DECIMAL(18,2)))
                        AS VARCHAR) AS DOUBLE) AS sxx,
                   CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                            * CAST(l_extendedprice AS DECIMAL(18,2)))
                        AS VARCHAR) AS DOUBLE) AS syy,
                   CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                            * CAST(l_extendedprice AS DECIMAL(18,2)))
                        AS VARCHAR) AS DOUBLE) AS sxy
            FROM lineitem GROUP BY l_returnflag
        ),
        d AS (SELECT s.*, CAST(n AS DOUBLE) AS nd FROM s)
        SELECT l_returnflag, n,
               {_STATS_EXPRS['corr_xy']} AS corr_xy,
               {_STATS_EXPRS['covar_pop']} AS covar_pop,
               {_STATS_EXPRS['covar_samp']} AS covar_samp,
               {_STATS_EXPRS['stddev_pop_x']} AS stddev_pop_x,
               {_STATS_EXPRS['slope']} AS slope,
               {_STATS_EXPRS['intercept']} AS intercept
        FROM d
    """,
    # dateDiff = boundary crossings, age = complete units — the CH
    # semantic pair restated with DuckDB calendar arithmetic
    "ch_date_functions": """
        SELECT event_id,
               CAST(date_diff('day', CAST(ts AS DATE),
                              DATE '2024-02-01') AS INT) AS date_diff_days,
               CAST((2024 * 12 + 2)
                    - (year(ts) * 12 + month(ts)) AS INT)
                   AS date_diff_months,
               CAST(FLOOR((epoch(TIMESTAMP '2024-02-01 00:00:00')
                           - FLOOR(epoch(ts))) / 86400) AS BIGINT)
                   AS age_days,
               CAST(FLOOR((epoch(TIMESTAMP '2024-02-01 00:00:00')
                           - FLOOR(epoch(ts))) / 3600) AS BIGINT)
                   AS age_hours,
               CAST(FLOOR(FLOOR(epoch(ts)) / 3600) AS BIGINT)
                   AS rel_hour_num,
               CAST(CAST(ts AS DATE) + INTERVAL 1 MONTH AS DATE)
                   AS plus_month
        FROM events
    """,
    # occurrence-index and dense-rank enumerations, every element
    # value-checked through the joined string
    "ch_array_enumerate": """
        WITH t AS (
            SELECT o_orderkey,
                   [CAST(o_orderkey % 3 AS BIGINT),
                    CAST(o_orderkey % 5 AS BIGINT),
                    CAST(o_orderkey % 3 AS BIGINT),
                    CAST(o_orderkey % 7 AS BIGINT),
                    CAST(o_orderkey % 3 AS BIGINT)] AS a
            FROM orders
        )
        SELECT o_orderkey,
               array_to_string(list_transform(range(1, 6),
                   i -> CAST(len(list_filter(a[1:CAST(i AS INT)],
                        x -> x = a[CAST(i AS INT)])) AS VARCHAR)), ',')
                   AS enum_uniq,
               array_to_string(list_transform(a,
                   x -> CAST(len(list_distinct(
                        a[1:list_position(a, x)])) AS VARCHAR)), ',')
                   AS enum_dense,
               CAST(len(list_distinct(a)) AS INT) AS n_uniq
        FROM t
    """,
    # planted-empty P group pins the -OrNull/-OrDefault conventions
    "ch_agg_combinators_null": """
        WITH base AS (
            SELECT o_orderstatus,
                   CAST(o_orderkey % 5 AS BIGINT) AS k5,
                   CASE WHEN o_totalprice > 450000
                             AND o_orderstatus <> 'P'
                        THEN CAST(o_totalprice AS DECIMAL(18,2)) END
                       AS big_price
            FROM orders
        )
        SELECT o_orderstatus,
               CAST(SUM(DISTINCT k5) AS BIGINT) AS sum_distinct_k5,
               CAST(COUNT(DISTINCT k5) AS BIGINT) AS uniq_exact_k5,
               CAST(COUNT(big_price) AS BIGINT) AS count_big,
               CAST(MAX(big_price) AS DOUBLE) AS max_or_null_big,
               COALESCE(CAST(MAX(big_price) AS DOUBLE), 0.0)
                   AS max_or_default_big,
               COALESCE(CAST(CAST(SUM(big_price) AS VARCHAR) AS DOUBLE),
                        0.0) AS sum_or_default_big
        FROM base GROUP BY o_orderstatus
    """,
    # cross-multiplied CDF gap as an exact integer max over the value
    # histogram; only the final ratios are doubles
    "ch_kolmogorov_smirnov": f"""
        WITH per AS (
            SELECT CAST(l_quantity AS DECIMAL(18,2)) AS v,
                   CAST(COUNT(CASE WHEN l_returnflag = 'A' THEN 1 END)
                        AS BIGINT) AS ca,
                   CAST(COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END)
                        AS BIGINT) AS cb
            FROM lineitem WHERE l_returnflag IN ('A', 'R')
            GROUP BY 1
        ),
        c AS (
            SELECT CAST(SUM(ca) OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cuma,
                   CAST(SUM(cb) OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cumb,
                   CAST(SUM(ca) OVER () AS BIGINT) AS na,
                   CAST(SUM(cb) OVER () AS BIGINT) AS nb
            FROM per
        ),
        s AS (
            SELECT na, nb,
                   CAST(MAX(ABS(cuma * nb - cumb * na)) AS BIGINT) AS d_num
            FROM c GROUP BY na, nb
        ),
        d AS (
            SELECT s.*, CAST(na AS DOUBLE) AS nad, CAST(nb AS DOUBLE) AS nbd,
                   CAST(d_num AS DOUBLE) AS dnd
            FROM s
        )
        SELECT na, nb, d_num,
               {_r6('(dnd / (nad * nbd))')} AS d_stat,
               {_r6('sqrt((nad * nbd) / (nad + nbd)) * (dnd / (nad * nbd))')}
                   AS ks_stat
        FROM d
    """,
    # closed-enum pivot to five exact counts; the shared fixed-order
    # expression strings do the rest
    "ch_entropy": f"""
        WITH s AS (
            SELECT o_orderstatus,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   {', '.join(
                       "CAST(COUNT(CASE WHEN o_orderpriority = '"
                       + p + "' THEN 1 END) AS BIGINT) AS c" + str(i)
                       for i, p in enumerate(_PRIORITIES, 1))}
            FROM orders GROUP BY o_orderstatus
        ),
        d AS (
            SELECT s.*, CAST(n AS DOUBLE) AS nd,
                   {', '.join(
                       "CAST(c" + str(i) + " AS DOUBLE) AS c" + str(i) + "d"
                       for i in range(1, 6))}
            FROM s
        )
        SELECT o_orderstatus, n, c1, c2, c3, c4, c5,
               {_ENT_EXPRS['entropy_bits']} AS entropy_bits,
               {_ENT_EXPRS['gini_impurity']} AS gini_impurity,
               {_ENT_EXPRS['simpson_index']} AS simpson_index
        FROM d
    """,
    # midrank sums in doubled-rank integer units over the value
    # histogram; tie term as exact DECIMAL; z from the shared _MW_Z
    # string
    "ch_mann_whitney": f"""
        WITH per AS (
            SELECT CAST(l_quantity AS DECIMAL(18,2)) AS v,
                   CAST(COUNT(CASE WHEN l_returnflag = 'A' THEN 1 END)
                        AS BIGINT) AS ca,
                   CAST(COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END)
                        AS BIGINT) AS cb
            FROM lineitem WHERE l_returnflag IN ('A', 'R')
            GROUP BY 1
        ),
        r AS (
            SELECT ca, cb, ca + cb AS t,
                   2 * CAST(COALESCE(SUM(ca + cb) OVER (
                       ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) + (ca + cb) + 1 AS rank2
            FROM per
        ),
        s AS (
            SELECT CAST(SUM(ca) AS BIGINT) AS na,
                   CAST(SUM(cb) AS BIGINT) AS nb,
                   CAST(SUM(ca * rank2) AS BIGINT) AS r2a,
                   CAST(SUM(cb * rank2) AS BIGINT) AS r2b,
                   CAST(CAST(SUM(CAST(t AS DECIMAL(38,0))
                                 * CAST(t AS DECIMAL(38,0))
                                 * CAST(t AS DECIMAL(38,0))
                                 - CAST(t AS DECIMAL(38,0))) AS VARCHAR)
                        AS DOUBLE) AS tie
            FROM r
        ),
        u AS (
            SELECT s.*,
                   CAST(r2a - na * (na + 1) AS BIGINT) AS u2a,
                   CAST(r2b - nb * (nb + 1) AS BIGINT) AS u2b,
                   CAST(na AS DOUBLE) AS nad, CAST(nb AS DOUBLE) AS nbd,
                   CAST(r2a - na * (na + 1) AS DOUBLE) AS u2ad
            FROM s
        )
        SELECT na, nb, u2a, u2b,
               tie AS tie_term,
               {_r6(_MW_Z)} AS z_stat
        FROM u
    """,
    # exact integer distances over the key+1 pair generator; DuckDB's
    # levenshtein is the same unit-cost DP as Spark's
    "ch_string_distance": """
        WITH pairs AS (
            SELECT x.p_partkey AS pk, x.p_name AS a, y.p_name AS b
            FROM part x JOIN part y ON x.p_partkey = y.p_partkey - 1
        ),
        g AS (
            SELECT pk, a, b,
                   list_distinct(list_transform(range(1, length(a) - 1),
                       i -> substring(a, CAST(i AS INT), 3))) AS ta,
                   list_distinct(list_transform(range(1, length(b) - 1),
                       i -> substring(b, CAST(i AS INT), 3))) AS tb,
                   list_distinct(list_transform(range(1, length(a) + 1),
                       i -> substring(a, CAST(i AS INT), 1))) AS ca,
                   list_distinct(list_transform(range(1, length(b) + 1),
                       i -> substring(b, CAST(i AS INT), 1))) AS cb
            FROM pairs
        )
        SELECT pk AS p_partkey,
               CAST(levenshtein(a, b) AS BIGINT) AS edit_distance,
               CAST(len(list_filter(list_transform(
                        range(1, least(length(a), length(b)) + 1),
                        i -> substring(a, CAST(i AS INT), 1)
                             <> substring(b, CAST(i AS INT), 1)),
                        x -> x))
                    + abs(length(a) - length(b)) AS BIGINT) AS byte_hamming,
               CAST(len(list_intersect(ta, tb)) AS BIGINT) AS trigram_inter,
               CAST(len(ta) + len(tb) - len(list_intersect(ta, tb))
                    AS BIGINT) AS trigram_union,
               CAST(len(list_intersect(ca, cb)) AS BIGINT) AS charset_inter,
               CAST(len(ca) + len(cb) - len(list_intersect(ca, cb))
                    AS BIGINT) AS charset_union
        FROM g
    """,
    "ch_grouping_sets": """
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_priority
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
    """,
    "ch_any_join": """
        WITH ranked AS (
            SELECT l_orderkey, l_partkey, l_quantity,
                   ROW_NUMBER() OVER (
                       PARTITION BY l_orderkey
                       ORDER BY l_linenumber, l_partkey, l_quantity
                   ) AS rn
            FROM lineitem
        )
        SELECT o.o_orderkey, o.o_orderstatus,
               one.l_partkey AS any_partkey,
               CAST(one.l_quantity AS DOUBLE) AS any_quantity
        FROM orders o
        LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) one
            ON o.o_orderkey = one.l_orderkey
    """,
    # buckets recomputed with DuckDB's calendar functions over the
    # µs-normalized event time (the fixture carries nanos)
    "ch_time_bucket_functions": """
        WITH e AS (
            SELECT event_id, make_timestamp(epoch_us(ts)) AS ts
            FROM events
        )
        SELECT event_id,
               make_timestamp((epoch_us(ts) // 900000000) * 900000000)
                   AS start_15min,
               CAST(date_trunc('week', ts) AS DATE) AS monday,
               CAST(date_trunc('quarter', ts) AS DATE) AS quarter_start,
               CAST(strftime(ts, '%Y%m') AS INT) AS yyyymm,
               strftime(ts, '%Y-%m-%d %H:%M') AS formatted
        FROM e
    """,
    # events timestamps normalized to µs first (the fixture carries
    # nanos; Spark reads them µs-truncated — epoch_us matches)
    "ch_asof_join": """
        WITH e AS (
            SELECT user_id, event_id, event_type,
                   make_timestamp(epoch_us(ts)) AS ts
            FROM events
        ),
        cand AS (
            SELECT o.o_orderkey, o.o_custkey, e.event_id, e.event_type,
                   e.ts,
                   ROW_NUMBER() OVER (
                       PARTITION BY o.o_orderkey
                       ORDER BY e.ts DESC NULLS LAST,
                                e.event_id DESC NULLS LAST
                   ) AS rn
            FROM orders o
            LEFT JOIN e ON e.user_id = o.o_custkey
                       AND e.ts <= o.o_orderdate
        )
        SELECT o_orderkey, o_custkey,
               event_id AS last_event_id,
               event_type AS last_event_type,
               ts AS last_event_ts
        FROM cand WHERE rn = 1
    """,
    "ch_map_functions": """
        WITH t AS (
            SELECT o_orderkey,
                   's' || CAST(o_orderkey % 3 AS VARCHAR) AS k1,
                   CAST(o_orderkey % 7 AS BIGINT) AS v1,
                   't' || CAST(o_orderkey % 5 AS VARCHAR) AS k2,
                   CAST(o_orderkey % 11 AS BIGINT) AS v2
            FROM orders
        )
        SELECT o_orderkey,
               k1 || ',' || k2 AS keys,               -- 's…' < 't…' always
               CAST(LEAST(v1, v2) AS VARCHAR) || ','
                   || CAST(GREATEST(v1, v2) AS VARCHAR) AS vals,
               o_orderkey % 3 = 0 AS has_s0,
               CASE WHEN o_orderkey % 3 = 0 THEN v1
                    ELSE CAST(-1 AS BIGINT) END AS s0_or_default,
               COALESCE(array_to_string(
                   list_filter(
                       [CASE WHEN v1 > 4
                             THEN k1 || '=' || CAST(v1 AS VARCHAR) END,
                        CASE WHEN v2 > 4
                             THEN k2 || '=' || CAST(v2 AS VARCHAR) END],
                       x -> x IS NOT NULL),
                   ','), '') AS filtered
        FROM t
    """,
    "ch_array_functions": """
        WITH t AS (
            SELECT o_orderkey,
                   [CAST(o_orderkey % 5 AS BIGINT),
                    CAST(o_orderkey % 5 AS BIGINT),
                    CAST((o_orderkey + 1) % 7 AS BIGINT),
                    CAST((o_orderkey * 3) % 11 AS BIGINT),
                    CAST((o_orderkey + 1) % 7 AS BIGINT)] AS a
            FROM orders
        )
        SELECT o_orderkey,
               array_to_string(list_transform(a, v -> CAST(v AS VARCHAR)), ',')
                   AS arr,
               array_to_string(list_transform(range(1, 6),
                   i -> CAST(CAST(list_sum(a[1:CAST(i AS INT)]) AS BIGINT)
                             AS VARCHAR)), ',') AS cum_sum,
               array_to_string(list_transform(range(1, 6),
                   i -> CAST(CASE WHEN i = 1 THEN 0
                             ELSE a[CAST(i AS INT)] - a[CAST(i - 1 AS INT)]
                             END AS VARCHAR)), ',') AS difference,
               array_to_string(list_transform(
                   list_filter(range(1, 6), i -> i = 1
                       OR a[CAST(i AS INT)] <> a[CAST(i - 1 AS INT)]),
                   i -> CAST(a[CAST(i AS INT)] AS VARCHAR)), ',') AS compact,
               CAST(list_sum(a) AS BIGINT) AS arr_sum
        FROM t
    """,
    # closed form of the planted URL (the Spark side actually parses
    # with parse_url; the oracle reconstructs each part from k)
    "ch_url_functions": """
        WITH t AS (
            SELECT o_orderkey AS k,
                   (CASE WHEN o_orderkey % 4 = 0 THEN 'www.' ELSE '' END)
                     || 'shop' || CAST(o_orderkey % 7 AS VARCHAR)
                     || '.example'
                     || (CASE WHEN o_orderkey % 3 = 0
                              THEN '.co.uk' ELSE '.org' END) AS host
            FROM orders
        )
        SELECT k AS o_orderkey,
               'https' AS protocol,
               host AS domain,
               CASE WHEN k % 4 = 0 THEN substr(host, 5)
                    ELSE host END AS domain_no_www,
               CASE WHEN k % 3 = 0 THEN 'uk' ELSE 'org' END AS tld,
               '/cat/' || CAST(k % 5 AS VARCHAR) || '/item' AS url_path,
               'id=' || CAST(k AS VARCHAR) || '&ref=aff'
                 || CAST(k % 3 AS VARCHAR) AS query_string,
               CAST(k AS BIGINT) AS param_id,
               'aff' || CAST(k % 3 AS VARCHAR) AS param_ref,
               '' AS param_missing,
               'https://' || host || '/cat/' || CAST(k % 5 AS VARCHAR)
                 || '/item' AS cut_query
        FROM t
    """,
    "ch_string_search_functions": """
        WITH t AS (
            SELECT doc_id,
                   text || CASE WHEN doc_id % 7 = 0 THEN ' TABLE'
                                ELSE '' END AS s
            FROM documents
        )
        SELECT doc_id,
               CAST(strpos(s, 'table') AS BIGINT) AS pos_table,
               CAST(strpos(lower(s), 'table') AS BIGINT) AS pos_table_ci,
               (strpos(s, 'merge') > 0 OR strpos(s, 'window') > 0
                OR strpos(s, 'batch') > 0) AS multi_any,
               CAST(COALESCE(list_position(
                   list_transform(['merge', 'window', 'batch'],
                                  p -> strpos(s, p) > 0), true), 0)
                    AS BIGINT) AS multi_first_index,
               CAST((length(s) - length(replace(s, 'ta', ''))) / 2
                    AS BIGINT) AS count_ta
        FROM t
    """,
    "ch_agg_combinators": """
        WITH base AS (
            SELECT o_orderpriority, o_orderstatus,
                   CAST(o_totalprice AS DECIMAL(18,2)) AS price,
                   CAST(o_orderkey % 3 AS BIGINT) AS e1,
                   CAST(o_orderkey % 7 AS BIGINT) AS e2
            FROM orders
        ),
        main AS (
            SELECT o_orderpriority,
                   COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS count_if_f,
                   COALESCE(CAST(SUM(price) FILTER (WHERE o_orderstatus = 'O')
                                 AS DOUBLE), 0.0) AS sum_if_o,
                   CASE WHEN COUNT(*) FILTER (WHERE o_orderstatus = 'F') > 0
                        THEN FLOOR(
                            CAST(SUM(price) FILTER (WHERE o_orderstatus = 'F')
                                 AS DOUBLE)
                            / COUNT(*) FILTER (WHERE o_orderstatus = 'F')
                            * 1e4 + 0.5) / 1e4
                   END AS avg_if_f,
                   COALESCE(CAST(MIN(price) FILTER (WHERE o_orderstatus = 'P')
                                 AS DOUBLE), 0.0) AS min_if_p,
                   CAST(SUM(e1 + e2) AS BIGINT) AS sum_array
            FROM base GROUP BY o_orderpriority
        ),
        uniq AS (
            SELECT o_orderpriority, COUNT(DISTINCT e) AS uniq_array
            FROM (SELECT o_orderpriority, unnest([e1, e2]) AS e FROM base)
            GROUP BY o_orderpriority
        )
        SELECT m.o_orderpriority, m.count_if_f, m.sum_if_o, m.avg_if_f,
               m.min_if_p, m.sum_array, u.uniq_array
        FROM main m JOIN uniq u USING (o_orderpriority)
    """,
    "supplier_rank_distribution": """
        SELECT s_suppkey, CAST(s_nationkey AS INT) AS s_nationkey, s_acctbal,
               CAST(NTILE(4) OVER w AS INT) AS quartile,
               PERCENT_RANK() OVER w AS pct_rank,
               CUME_DIST() OVER w AS cume_dist
        FROM supplier
        WINDOW w AS (PARTITION BY s_nationkey
                     ORDER BY s_acctbal DESC, s_suppkey ASC)
    """,
    "ch_moving_aggregates": """
        WITH s AS (
            SELECT o_custkey, o_orderkey,
                   CAST(o_totalprice AS DECIMAL(18,2))
                     - LAG(CAST(o_totalprice AS DECIMAL(18,2))) OVER w
                     AS delta,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w3
                        AS DOUBLE) AS moving_sum3,
                   COUNT(*) OVER w3 AS n3
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey),
                   w3 AS (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        )
        SELECT o_custkey, o_orderkey, moving_sum3,
               FLOOR(moving_sum3 / n3 * 1e4 + 0.5) / 1e4 AS moving_avg3,
               CAST(SUM(CASE WHEN delta > 0 THEN delta ELSE CAST(0 AS DECIMAL(18,2)) END)
                    OVER (PARTITION BY o_custkey) AS DOUBLE) AS delta_sum
        FROM s
    """,
    "ch_running_diff_neighbor": """
        SELECT user_id, event_id, value AS v,
               value - LAG(value) OVER w AS running_diff,
               LAG(value) OVER w AS prev_v,
               LEAD(value) OVER w AS next_v
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    """,
    "ch_array_join": """
        WITH base AS (
            SELECT o_orderkey,
                   list_filter([CAST(o_orderkey % 3 AS BIGINT),
                                CAST(o_orderkey % 5 AS BIGINT)],
                               x -> x > 0) AS items
            FROM orders
        ),
        exploded AS (
            SELECT o_orderkey,
                   CAST(unnest(range(len(items))) AS INT) AS idx,
                   unnest(items) AS item
            FROM base WHERE len(items) > 0
            UNION ALL
            SELECT o_orderkey, NULL, NULL FROM base WHERE len(items) = 0
        )
        SELECT o_orderkey, idx, item,
               CAST(item * 10.0 AS DOUBLE) AS item_x10
        FROM exploded
    """,
    "ch_with_totals": """
        SELECT o_orderstatus, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY ROLLUP (o_orderstatus)
    """,
    "ch_dict_get": """
        SELECT o.o_orderkey, o.o_custkey,
               COALESCE(c.c_name, 'unknown') AS cust_name,
               CAST(COALESCE(c.c_acctbal, 0.0) AS DOUBLE) AS cust_acctbal
        FROM orders o
        LEFT JOIN (SELECT c_custkey, c_name, c_acctbal FROM customer
                   WHERE c_custkey < 500) c
          ON o.o_custkey = c.c_custkey
    """,
    "ch_limit_with_ties": """
        SELECT o_orderkey, o_orderdate,
               CAST(o_totalprice AS DOUBLE) AS o_totalprice
        FROM orders
        WHERE o_orderdate >= COALESCE(
            (SELECT o_orderdate FROM orders
             ORDER BY o_orderdate DESC LIMIT 1 OFFSET 19),
            (SELECT MIN(o_orderdate) FROM orders)
        )
    """,
    "ch_limit_by": """
        SELECT o_custkey, o_orderkey,
               CAST(o_totalprice AS DOUBLE) AS o_totalprice,
               CAST(rn AS INT) AS rank_in_customer
        FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                     ROW_NUMBER() OVER (PARTITION BY o_custkey
                         ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
              FROM orders)
        WHERE rn <= 2
    """,
    "ch_sample_clause": """
        SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
        FROM orders
        WHERE CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT)
              < CAST(0.10 * 1152921504606846976 AS BIGINT)
    """,
    "customers_without_orders": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
    "customers_with_orders_semi": """
        SELECT c_custkey, c_mktsegment
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    "customer_order_counts_outer": """
        SELECT c.c_custkey, COALESCE(t.n_orders, 0) AS n_orders
        FROM customer c
        LEFT JOIN (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey) t
          ON c.c_custkey = t.o_custkey
    """,
    "nation_supplier_full_outer": """
        SELECT CAST(n.n_nationkey AS INT) AS n_nationkey, n.n_name,
               COALESCE(s.n_suppliers, 0) AS n_suppliers
        FROM nation n
        FULL OUTER JOIN (SELECT s_nationkey, COUNT(*) AS n_suppliers
                         FROM supplier GROUP BY s_nationkey) s
          ON n.n_nationkey = s.s_nationkey
    """,
    "supplier_balance_ranks": """
        SELECT s_suppkey, CAST(s_nationkey AS INT) AS s_nationkey, s_acctbal,
               CAST(RANK() OVER w AS BIGINT) AS bal_rank,
               CAST(DENSE_RANK() OVER w AS BIGINT) AS bal_dense_rank,
               LAG(s_suppkey, 1) OVER w AS prev_suppkey
        FROM supplier
        WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey ASC)
    """,
    "orders_running_totals": """
        SELECT o_custkey, o_orderkey,
               COUNT(*) OVER w AS orders_so_far,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS spend_so_far
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    "buyer_segment_setops": """
        WITH buyers AS (SELECT DISTINCT o_custkey AS k FROM orders),
             auto AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
        SELECT k, 'auto_buyer' AS tag FROM (SELECT k FROM buyers INTERSECT SELECT k FROM auto)
        UNION ALL
        SELECT k, 'auto_no_orders' AS tag FROM (SELECT k FROM auto EXCEPT ALL SELECT k FROM buyers)
    """,
    "lineitem_cube": """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "orders_status_dedup": """
        SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    """,
    "top_parts_by_price": """
        SELECT p_partkey, p_name, p_retailprice
        FROM part ORDER BY p_retailprice DESC, p_partkey ASC LIMIT 10
    """,
    "segment_distinct_stats": """
        SELECT o_orderstatus,
               COUNT(DISTINCT o_custkey) AS n_distinct_customers,
               COUNT(*) AS n_orders
        FROM orders GROUP BY o_orderstatus
    """,
    "orders_status_pivot": """
        SELECT o_orderpriority,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
               COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
               COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        FROM orders GROUP BY o_orderpriority
    """,
    "events_props_keys": """
        SELECT k AS key, COUNT(*) AS n,
               COUNT(DISTINCT kv) AS n_distinct_values,
               CAST(SUM(kv) AS BIGINT) AS sum_values
        FROM (SELECT unnest(json_keys(props)) AS k,
                     CAST(json_extract_string(props, '$.k') AS BIGINT) AS kv
              FROM events)
        GROUP BY k
    """,
    "salted_customer_revenue": """
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_orders
        FROM orders GROUP BY o_custkey
    """,
    "orders_trailing_30d_avg": """
        SELECT o_custkey, o_orderkey,
               ROUND(CAST(AVG(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE), 4) AS avg_30d,
               COUNT(*) OVER w AS n_in_window
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY datediff('day', DATE '1970-01-01', o_orderdate)
                     RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
    """,
    "zorder_customer_locality": f"""
        SELECT c_custkey, CAST({_Z_SQL} AS BIGINT) AS zkey
        FROM customer
    """,
    "sql_in_subquery": """
        SELECT o_orderkey, o_custkey, o_orderstatus
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'BUILDING')
    """,
    "sql_scalar_subquery_select": """
        SELECT p_partkey,
               CAST(p_retailprice AS DOUBLE) AS price,
               ROUND(CAST(p_retailprice - (SELECT AVG(p_retailprice) FROM part)
                     AS DOUBLE), 4) AS price_vs_avg
        FROM part
    """,
    "sql_correlated_subquery": """
        SELECT o_orderkey,
               CAST((SELECT SUM(CAST(l_quantity AS DECIMAL(18,2)))
                     FROM lineitem WHERE l_orderkey = o_orderkey) AS DOUBLE) AS total_qty
        FROM orders
    """,
    "ddl_view_roundtrip": """
        SELECT n.n_name, r.r_name
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
}
