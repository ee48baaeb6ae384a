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
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list → (node, rank).

    Simplified standard form: uniform init 1/n; each round
    ``rank' = (1-d)/n + d * Σ_in rank/outdeg`` (dangling mass is dropped,
    the common simplification — ranks then need no renormalization and
    every value is a pure function of the edge set, which keeps the
    DuckDB oracle exact).  Nodes = every distinct endpoint; sinks keep
    receiving mass but contribute none."""
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
    base = (1.0 - damping) / n_nodes
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    for _ in range(iterations):
        contrib = (
            e.join(ranks.select(F.col("node").alias("from"), "rank"), "from")
            .groupBy(F.col("to").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("__in"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (F.lit(base) + F.lit(damping) * F.coalesce("__in", F.lit(0.0))).alias(
                    "rank"
                ),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
