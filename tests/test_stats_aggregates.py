"""r15 statistical aggregates: ORACLE-INDEPENDENT hand-computed guards
(the planted-contrast discipline — a degeneracy that shifts Spark and
DuckDB identically still fails here).

Each test writes a tiny planted fixture shaped like the real table and
asserts values computed BY HAND (or via an independent formula path),
not via the engine's own expressions.
"""

from __future__ import annotations

import math

import pytest

from postgres_debezium_clickhouse_spark.plans.sql_surface import (
    ch_entropy,
    ch_kolmogorov_smirnov,
    ch_mann_whitney,
    ch_stats_functions,
    ch_welch_ttest,
)


def _write_lineitem(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i + 1, 1, 1, 1, float(q), float(p), 0.0, 0.0, f, "O",
          "1995-01-01 00:00:00")
         for i, (f, q, p) in enumerate(rows)],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate string",
    ).withColumn("l_shipdate", __import__("pyspark.sql.functions",
                                          fromlist=["F"]).to_timestamp(
                                              "l_shipdate"))
    df.write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    return str(tmp_path)


def _write_orders(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i + 1, 1, st, float(tp), "1995-01-01 00:00:00", pr)
         for i, (st, tp, pr) in enumerate(rows)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", __import__("pyspark.sql.functions",
                                           fromlist=["F"]).to_timestamp(
                                               "o_orderdate"))
    df.write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    return str(tmp_path)


def test_mann_whitney_hand_computed(spark, tmp_path):
    """A = {1, 2, 2}, B = {2, 3}: midranks 1, 3, 3, 3, 5 →
    R_A = 7, U_A = 7 − 3·4/2 = 1; U_B = 11 − 2·3/2 = 8... wait
    R_B = 3 + 5 = 8, U_B = 8 − 3 = 5; U_A + U_B = 6 = n_A·n_B ✓.
    Doubled units: u2a = 2, u2b = 10.  Tie term: t=1,3,1 →
    Σ(t³−t) = 24."""
    sf = _write_lineitem(spark, tmp_path, [
        ("A", 1, 10), ("A", 2, 10), ("A", 2, 10),
        ("R", 2, 10), ("R", 3, 10),
    ])
    row = ch_mann_whitney(spark, sf).collect()[0]
    assert (row.na, row.nb) == (3, 2)
    assert (row.u2a, row.u2b) == (2, 10)
    assert row.u2a + row.u2b == 2 * row.na * row.nb
    assert row.tie_term == 24.0
    # z from the standard formula, independently in python floats
    u = row.u2a / 2
    mu = 3 * 2 / 2
    n = 5
    var = (3 * 2 / 12) * ((n + 1) - 24 / (n * (n - 1)))
    assert abs(row.z_stat - (u - mu) / math.sqrt(var)) < 1e-6


def test_kolmogorov_smirnov_hand_computed(spark, tmp_path):
    """A = {1, 2}, B = {2, 3}: CDF gaps at v=1: |1·2 − 0·2| = 2;
    v=2: |2·2 − 1·2| = 2; v=3: |2·2 − 2·2| = 0 → d_num = 2,
    D = 2/4 = 0.5."""
    sf = _write_lineitem(spark, tmp_path, [
        ("A", 1, 10), ("A", 2, 10), ("R", 2, 10), ("R", 3, 10),
    ])
    row = ch_kolmogorov_smirnov(spark, sf).collect()[0]
    assert (row.na, row.nb, row.d_num) == (2, 2, 2)
    assert row.d_stat == 0.5
    assert abs(row.ks_stat - math.sqrt(4 / 4) * 0.5) < 1e-6


def test_welch_and_student_hand_computed(spark, tmp_path):
    """O = {1, 2, 3}, F = {2, 4, 6, 8}: means 2 and 5, sample vars 1
    and 20/3 — checked against python's statistics module (an
    independent computation path)."""
    import statistics

    sf = _write_orders(spark, tmp_path, [
        ("O", 1, "1-URGENT"), ("O", 2, "1-URGENT"), ("O", 3, "1-URGENT"),
        ("F", 2, "1-URGENT"), ("F", 4, "1-URGENT"),
        ("F", 6, "1-URGENT"), ("F", 8, "1-URGENT"),
    ])
    row = ch_welch_ttest(spark, sf).collect()[0]
    x1, x2 = [1, 2, 3], [2, 4, 6, 8]
    assert (row.n1, row.n2) == (3, 4)
    assert row.mean_1 == statistics.mean(x1)
    assert row.mean_2 == statistics.mean(x2)
    assert abs(row.var_1 - statistics.variance(x1)) < 1e-6
    assert abs(row.var_2 - statistics.variance(x2)) < 1e-6
    q1 = statistics.variance(x1) / 3
    q2 = statistics.variance(x2) / 4
    t = (statistics.mean(x1) - statistics.mean(x2)) / math.sqrt(q1 + q2)
    df = (q1 + q2) ** 2 / (q1 ** 2 / 2 + q2 ** 2 / 3)
    assert abs(row.t_welch - t) < 1e-6
    assert abs(row.df_welch - df) < 1e-6
    sp2 = (2 * statistics.variance(x1) + 3 * statistics.variance(x2)) / 5
    ts = (2 - 5) / math.sqrt(sp2 * (1 / 3 + 1 / 4))
    assert abs(row.t_student - ts) < 1e-6


def test_stats_functions_hand_computed(spark, tmp_path):
    """x = (1, 2, 3), y = (2, 4, 6): perfect line y = 2x → corr 1,
    slope 2, intercept 0; covar_pop = 4/3, stddev_pop_x = sqrt(2/3)."""
    sf = _write_lineitem(spark, tmp_path, [
        ("A", 1, 2), ("A", 2, 4), ("A", 3, 6),
    ])
    row = ch_stats_functions(spark, sf).collect()[0]
    assert row.n == 3
    assert row.corr_xy == 1.0
    assert row.slope == 2.0
    assert row.intercept == 0.0
    assert abs(row.covar_pop - 4 / 3) < 1e-6
    assert abs(row.covar_samp - 2.0) < 1e-6
    assert abs(row.stddev_pop_x - math.sqrt(2 / 3)) < 1e-6


def test_entropy_hand_computed(spark, tmp_path):
    """4 urgent + 4 high of status O → entropy 1 bit exactly,
    Gini = 0.5, Simpson = Σc(c−1)/n(n−1) = 24/56 = 3/7; a one-priority
    group has entropy 0 and Gini 0."""
    rows = [("O", 10, "1-URGENT")] * 4 + [("O", 10, "2-HIGH")] * 4
    rows += [("F", 10, "5-LOW")] * 3
    sf = _write_orders(spark, tmp_path, rows)
    out = {r.o_orderstatus: r for r in ch_entropy(spark, sf).collect()}
    assert out["O"].entropy_bits == 1.0
    assert out["O"].gini_impurity == 0.5
    assert abs(out["O"].simpson_index - 3 / 7) < 1e-6
    assert out["F"].entropy_bits == 0.0
    assert out["F"].gini_impurity == 0.0
    assert out["F"].simpson_index == 1.0


def test_mann_whitney_no_ties_textbook(spark, tmp_path):
    """Textbook no-tie case: A = {1, 3}, B = {2, 4}: R_A = 1+3 = 4,
    U_A = 4 − 3 = 1; tie term 0."""
    sf = _write_lineitem(spark, tmp_path, [
        ("A", 1, 10), ("A", 3, 10), ("R", 2, 10), ("R", 4, 10),
    ])
    row = ch_mann_whitney(spark, sf).collect()[0]
    assert (row.u2a, row.u2b) == (2, 6)
    assert row.tie_term == 0.0


def _write_events(spark, tmp_path, rows):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, "
              "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def test_date_functions_boundary_vs_complete_units(spark, tmp_path):
    """r15 dateDiff-vs-age hand case: one second before midnight is ONE
    day by boundary crossing but ZERO complete days elapsed — the CH
    semantic trap, pinned; Jan-31 +1 month clamps to leap Feb-29."""
    import datetime

    from postgres_debezium_clickhouse_spark.plans.sql_surface import (
        ch_date_functions,
    )

    sf = _write_events(spark, tmp_path, [
        (1, "2024-01-31 23:59:59", 1, "click", 1.0, "{}"),
        (2, "2024-01-31 00:00:00", 1, "click", 1.0, "{}"),
    ])
    out = {r.event_id: r for r in ch_date_functions(spark, sf).collect()}
    assert out[1].date_diff_days == 1      # boundary crossed
    assert out[1].age_days == 0            # no complete day elapsed
    assert out[1].age_hours == 0
    assert out[2].age_days == 1            # a full day from midnight
    assert out[1].plus_month == datetime.date(2024, 2, 29)  # leap clamp
    assert out[1].date_diff_months == 1


def test_array_enumerate_hand_case(spark, tmp_path):
    """r15 enumeration trio on a fully hand-derivable key: 105 → a =
    [0, 0, 0, 0, 0] (105 ≡ 0 mod 3, 5, 7) gives occurrence indices
    1..5 and dense rank 1 throughout; 101 → [2, 1, 2, 3, 2]."""
    from pyspark.sql import functions as F

    from postgres_debezium_clickhouse_spark.plans.sql_surface import (
        ch_array_enumerate,
    )

    df = spark.createDataFrame(
        [(105, 1, "O", 1.0, "1995-01-01 00:00:00", "1-URGENT"),
         (101, 1, "O", 1.0, "1995-01-01 00:00:00", "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    df.write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    out = {r.o_orderkey: r for r in
           ch_array_enumerate(spark, str(tmp_path)).collect()}
    assert out[105].enum_uniq == "1,2,3,4,5"
    assert out[105].enum_dense == "1,1,1,1,1"
    assert out[105].n_uniq == 1
    # 101: %3=2, %5=1, %3=2, %7=3, %3=2 -> [2,1,2,3,2]
    assert out[101].enum_uniq == "1,1,2,1,3"
    assert out[101].enum_dense == "1,2,1,3,1"
    assert out[101].n_uniq == 3
