"""Every unpartitioned (single-partition) Window in the package must sit
over a BOUNDED frame — post-limit or post-aggregation metadata, never the
data stream (verdict r9 item 4).

Two layers:

1. **Inventory guard** — grep the package for ``Window.orderBy`` sites
   and assert each is in the documented allowlist below, so a new
   unpartitioned window cannot land without stating its bound here.
2. **Plan assertions** — for the rank-after-top-k idiom (sketch topK,
   vocab coverage, id-order seeds) the executed plan must show the
   global sort-limit (``TakeOrderedAndProject``) FEEDING the Window, so
   the single-partition exchange carries ≤ k rows by construction.

The remaining ``WindowExec: No Partition Defined`` warnings in sweep
logs map 1:1 to this allowlist — each frame's bound is stated inline.
"""

from __future__ import annotations

import pathlib
import re

from pyspark.sql import functions as F

PKG = pathlib.Path(__file__).resolve().parents[1] / "postgres_debezium_clickhouse_spark"

# file -> (bound statement). Every Window.orderBy( site in the package
# must appear here with its boundedness argument.
BOUNDED_SITES = {
    "operators/sketch.py": "rank window over the orderBy().limit(k) cut — ≤ k rows",
    "operators/text.py": "vocab_coverage rank over the orderBy().limit(max(ks)) cut — ≤ max(ks) rows",
    "operators/similarity.py": "idorder seed cells over .limit(n_centroids) — ≤ n_centroids rows",
    "operators/curation.py": "shard-offset cumsum over the 256-shard count table (groupBy __shard output); unimax prefix windows over the |languages|-row aggregate",
    "plans/sql_surface.py": "mann-whitney midrank + kolmogorov-smirnov CDF cumsums over the |distinct l_quantity| (~50-row) value histogram",
    "plans/llm_quality_queries.py": "AUC rank over the held-out eval set — fixture-bounded guard, not a corpus pass",
    "plans/analytics.py": "CUSUM prefix/run-min cumsums over the hourly bucket table (|hours| rows, ~720/month)",
    "plans/llm_corpus_queries.py": "unigram vocab rank over the trained piece table — ≤ seed_size + alphabet rows (vocab metadata, never corpus)",
}


def test_every_unpartitioned_window_is_allowlisted():
    sites = {}
    for py in PKG.rglob("*.py"):
        text = py.read_text()
        for m in re.finditer(r"Window\.orderBy", text):
            rel = str(py.relative_to(PKG))
            sites.setdefault(rel, 0)
            sites[rel] += 1
    unknown = set(sites) - set(BOUNDED_SITES)
    assert not unknown, (
        f"new unpartitioned Window site(s) {unknown} — state the frame's "
        "bound in tests/test_bounded_windows.py BOUNDED_SITES or partition it"
    )


def _window_child_is_take_ordered(df) -> bool:
    """True iff the executed plan's (single) Window node is fed by a
    global sort-limit (TakeOrderedAndProject), i.e. the window input is
    the ≤k-row cut, not the full upstream frame."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the tree prints children below their parent at deeper indent; the
    # TakeOrderedAndProject must appear AFTER the Window line (downstream
    # of it in execution order = its input)
    wpos = plan.find("Window")
    tpos = plan.find("TakeOrderedAndProject")
    return wpos != -1 and tpos != -1 and tpos > wpos


def test_topk_sketch_ranks_over_the_limit_cut(spark):
    from postgres_debezium_clickhouse_spark.operators.sketch import space_saving_topk

    items = spark.range(0, 5000, 1, 8).select(
        (F.col("id") % 97).cast("string").alias("token")
    )
    out = space_saving_topk(items, "token", k=5, capacity=64)
    assert _window_child_is_take_ordered(out), (
        "space_saving_topk must cut to k rows (TakeOrderedAndProject) "
        "BEFORE the rank window — the single-partition exchange would "
        "otherwise carry the full candidate recount"
    )
    rows = out.collect()
    assert [r.rank for r in rows] == list(range(1, 6))


def test_vocab_coverage_ranks_over_the_limit_cut(spark, sf_dir):
    from postgres_debezium_clickhouse_spark.operators.text import vocab_coverage

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    out = vocab_coverage(docs, ks=[5, 10])
    assert _window_child_is_take_ordered(out)


# ---------------------------------------------------------------------------
# Degenerately-KEYED windows (r13 verdict #1): a Window.partitionBy(query_id)
# over a corpus-scored relation is keyed, but naively each key's partition
# would receive ~|corpus| rows — one reducer sorting the whole corpus' scores
# per query at 100 TB.  Resolution (r14, measured): Spark ≥ 3.5's
# InsertWindowGroupLimit rewrites filter(row_number() <= k) into a map-side
# `WindowGroupLimit … Partial` BELOW the exchange — each task ships only k
# rows per (task, query), so the exchange input is ≤ |Q|·k·n_partitions.
# Every per-query top-k must ride bounded_query_topk (the one site that
# emits the shape the rewrite fires on) and the plan tests below pin the
# Partial group-limit under the exchange so a regression fails loudly.
# ---------------------------------------------------------------------------

QUERY_KEYED_ALLOWED = {
    # bounded_query_topk: the centralized contract; exchange input bounded
    # by the native Partial WindowGroupLimit (plan-pinned below)
    "bounded_query_topk",
    # ivfpq_rerank_topk: window input is the broadcast shortlist fetch-back,
    # ≤ |Q|·shortlist rows by construction
    "ivfpq_rerank_topk",
}


def test_per_query_topk_windows_are_allowlisted():
    text = (PKG / "operators" / "similarity.py").read_text()
    # map each Window.partitionBy(query_id...) site to its enclosing def
    sites = []
    # assignment sites only (the helper's docstring NAMES the funnel shape)
    for m in re.finditer(r"=\s*Window\.partitionBy\(query_id", text):
        prefix = text[: m.start()]
        fn = re.findall(r"^def (\w+)", prefix, re.M)[-1]
        sites.append(fn)
    assert set(sites) == QUERY_KEYED_ALLOWED and len(sites) == len(QUERY_KEYED_ALLOWED), (
        f"per-query Window sites {sites} != allowlist {sorted(QUERY_KEYED_ALLOWED)} — "
        "a raw Window.partitionBy(query_id) over a corpus-scored relation is the "
        "r13 one-reducer-per-query funnel; route it through bounded_query_topk "
        "or state its input bound here"
    )


def _exchange_input_is_group_limited(df) -> bool:
    """True iff the per-query exchange's INPUT is the map-side bounded
    cut: a `WindowGroupLimit … Partial` line appears BELOW the
    query-keyed Exchange in the plan print (deeper = its input), so
    each task ships ≤ k rows per query and no reducer ever receives the
    scored corpus."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    epos = plan.find("Exchange hashpartitioning(query_id")
    ppos = plan.find("Partial")
    return (
        epos != -1
        and ppos != -1
        and ppos > epos
        and "WindowGroupLimit" in plan[epos:ppos]
    )


def test_brute_force_topk_exchange_is_bounded(spark, sf_dir):
    from postgres_debezium_clickhouse_spark.operators.similarity import (
        cosine_topk, hamming_topk, l2_topk, lsh_ann_topk,
    )

    corpus = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = corpus.orderBy("vec_id").limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    for fn in (cosine_topk, l2_topk, hamming_topk, lsh_ann_topk):
        out = fn(corpus, queries, k=5)
        assert _exchange_input_is_group_limited(out), (
            f"{fn.__name__}: the per-query exchange must be fed by the "
            "map-side Partial WindowGroupLimit cut, not the scored corpus "
            "(InsertWindowGroupLimit stopped firing — check k vs "
            "spark.sql.optimizer.windowGroupLimitThreshold and the "
            "row_number()+filter shape in bounded_query_topk)"
        )


def test_precut_topk_matches_single_window_reference(spark):
    """Value identity incl. tie-breaks: the two-phase cut must return
    bit-identical rows to the naive single-window plan, across partition
    counts (1 vs 8) and with deliberately tied scores."""
    from pyspark.sql import Window

    from postgres_debezium_clickhouse_spark.operators.similarity import (
        bounded_query_topk,
    )

    # 4 queries × 400 candidates; hamming-like integer score with heavy
    # ties (score = candidate % 7) so the id tie-break decides most ranks
    rows = spark.range(0, 1600, 1, 8).select(
        (F.col("id") % 4).cast("long").alias("query_id"),
        F.col("id").alias("neighbor_id"),
        (F.col("id") % 7).cast("int").alias("score"),
    )
    ref_w = Window.partitionBy("query_id").orderBy(
        F.col("score").asc(), F.col("neighbor_id").asc()
    )
    ref = (
        rows.withColumn("__rn", F.row_number().over(ref_w))
        .filter(F.col("__rn") <= 6)
        .select("query_id", "neighbor_id", "score")
        .orderBy("query_id", "neighbor_id")
        .collect()
    )
    for nparts in (1, 8):
        got = (
            bounded_query_topk(
                rows.repartition(nparts), 6, "query_id",
                order=[("score", "asc"), ("neighbor_id", "asc")],
                out_cols=["neighbor_id", "score"],
            )
            .orderBy("query_id", "neighbor_id")
            .collect()
        )
        assert got == ref, f"two-phase top-k diverged at nparts={nparts}"


def test_precut_topk_desc_negation_ties(spark):
    """Desc keys ride exact negation — verify desc ordering + id asc
    tie-break matches the reference window, including score 0 rows
    (-0.0 must compare equal to 0.0)."""
    from pyspark.sql import Window

    from postgres_debezium_clickhouse_spark.operators.similarity import (
        bounded_query_topk,
    )

    rows = spark.range(0, 900, 1, 8).select(
        (F.col("id") % 3).cast("long").alias("query_id"),
        F.col("id").alias("neighbor_id"),
        F.round((F.col("id") % 5).cast("double") / 4, 6).alias("cosine"),
    )
    ref_w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    ref = (
        rows.withColumn("__rn", F.row_number().over(ref_w))
        .filter(F.col("__rn") <= 7)
        .select("query_id", "neighbor_id", "cosine")
        .orderBy("query_id", "neighbor_id")
        .collect()
    )
    got = (
        bounded_query_topk(
            rows, 7, "query_id",
            order=[("cosine", "desc"), ("neighbor_id", "asc")],
            out_cols=["neighbor_id", "cosine"],
        )
        .orderBy("query_id", "neighbor_id")
        .collect()
    )
    assert got == ref


def test_limit_with_ties_plan_is_takeordered_not_global_window(spark):
    """ch_limit_with_ties's 100 TB claim, pinned in the executed plan:
    the boundary comes from a real top-n (TakeOrderedAndProject — every
    partition contributes ≤ n rows) joined as a 1-row broadcast, and NO
    Window operator appears anywhere (the naive WITH TIES shape is a
    global rank window: one reducer sorting the table)."""
    from postgres_debezium_clickhouse_spark.plans.sql_surface import (
        ch_limit_with_ties,
    )

    df = ch_limit_with_ties(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # and the semantics: every returned date >= the 20th-greatest date,
    # with at least 20 rows (ties can only add)
    rows = df.collect()
    assert len(rows) >= 20
    cut = sorted((r.o_orderdate for r in rows), reverse=True)[19]
    assert all(r.o_orderdate >= cut for r in rows)
