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
    "operators/curation.py": "shard-offset cumsum over the 256-shard count table (groupBy __shard output)",
    "plans/llm_quality_queries.py": "AUC rank over the held-out eval set — fixture-bounded guard, not a corpus pass",
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
