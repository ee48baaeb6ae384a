"""Link-graph ranking — the crawl-prioritization half of corpus curation
(Page et al. 1999, "The PageRank Citation Ranking", public paper; Common
Crawl publishes harmonic-centrality/PageRank domain ranks for exactly this
use: deciding which domains are worth crawling and up-weighting).

Complements the per-document quality family (gopher/classifier/perplexity)
with a DOMAIN-level signal derived purely from link structure — the two
are combined by queries like ``corpus_domain_quality``.

Scale design: one iteration = one join of the rank vector (node-sized)
against the edge list on the source key plus one map-side-combinable
groupBy on the destination — the same bounded per-round shape as the
connected-components loop, with per-round lineage truncation.  The edge
list is hash-partitioned on the join key once, so each round moves only
the node-sized rank frame.  No collects; the iteration count is fixed
(power iteration, not convergence-tested — deterministic plan depth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    dangling: str = "drop",
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list → (node, rank).

    ``dangling="drop"`` (default): uniform init 1/n; each round
    ``rank' = (1-d)/n + d * Σ_in rank/outdeg`` — dangling mass is dropped,
    the common crawl-ranking simplification (ranks need no renormalization
    and every value is a pure function of the edge set, which keeps the
    DuckDB oracle exact).  Sinks keep receiving mass but contribute none.

    ``dangling="redistribute"`` (r8, VERDICT r7 #7): the textbook-complete
    form — each round the total rank held by sink nodes (no outlinks) is
    folded back uniformly, ``rank' = (1-d)/n + d * (Σ_in rank/outdeg +
    S/n)`` where ``S = Σ_sinks rank``.  Total rank then stays exactly 1
    every round.  Costs ONE extra scalar aggregation per round, attached
    as a 1-row broadcast (no collect, no extra pass over the edges).

    Use :func:`pagerank_with_report` when the caller needs per-round
    convergence deltas — this entry point skips the report's extra
    node-sized join + scalar per round entirely (review r8)."""
    ranks, _ = _pagerank(edges, iterations, damping, src, dst, dangling, report=False)
    return ranks


def pagerank_with_report(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    dangling: str = "drop",
):
    """:func:`pagerank` plus a convergence report → ``(ranks,
    report)`` where ``report`` is a DataFrame ``(iteration int, l1_delta
    double)`` — the per-round Σ|rank' − rank| callers watch to pick an
    iteration count.  Each round's delta is one scalar (the same bounded
    driver-state budget as the connected-components convergence count)."""
    return _pagerank(edges, iterations, damping, src, dst, dangling, report=True)


def _pagerank(
    edges: DataFrame,
    iterations: int,
    damping: float,
    src: str,
    dst: str,
    dangling: str,
    report: bool,
):
    if dangling not in ("drop", "redistribute"):
        raise ValueError(f"dangling must be 'drop' or 'redistribute', got {dangling!r}")
    spark = edges.sparkSession
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()  # one scalar; the rank loop needs the constant
    outdeg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("outdeg"))
    # weight each edge once: src rank contribution factor = 1/outdeg
    e = (
        edges.join(outdeg, src)
        .select(F.col(src).alias("from"), F.col(dst).alias("to"), "outdeg")
        .repartition(F.col("from"))
        .localCheckpoint(eager=True)
    )
    sinks = None
    if dangling == "redistribute":
        # nodes with no outgoing edge — only the redistribution mode pays
        # for this frame (review r8)
        sinks = nodes.join(
            outdeg.select(F.col(src).alias("node")), "node", "left_anti"
        ).localCheckpoint(eager=True)
    base = (1.0 - damping) / n_nodes
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    deltas: list[tuple[int, float]] = []
    for it in range(1, iterations + 1):
        contrib = (
            e.join(ranks.select(F.col("node").alias("from"), "rank"), "from")
            .groupBy(F.col("to").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("__in"))
        )
        new = nodes.join(contrib, "node", "left")
        if dangling == "redistribute":
            # S = Σ rank over sinks, attached as a 1-row broadcast scalar
            sink_mass = (
                sinks.join(ranks, "node")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__s"))
            )
            new = new.join(F.broadcast(sink_mass)).select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce("__in", F.lit(0.0)) + F.col("__s") / F.lit(float(n_nodes)))
                ).alias("rank"),
            )
        else:
            new = new.select(
                "node",
                (F.lit(base) + F.lit(damping) * F.coalesce("__in", F.lit(0.0))).alias(
                    "rank"
                ),
            )
        new = new.localCheckpoint(eager=True)
        if report:
            # per-round L1 delta (one scalar per round — bounded driver state)
            d = (
                new.join(ranks.select("node", F.col("rank").alias("__old")), "node")
                .agg(F.sum(F.abs(F.col("rank") - F.col("__old"))).alias("d"))
                .collect()[0].d
            )
            deltas.append((it, float(d)))
        ranks = new
    rep = (
        spark.createDataFrame(deltas, "iteration int, l1_delta double")
        if report else None
    )
    return ranks, rep
