"""Oracle-independent planted-contrast guards for the mirrored scoring
families (VERDICT r6 #3 — the p=2^61-1 MinHash lesson generalized): the
perplexity / commonness / learned-classifier oracles mirror the engine's
constants, so these guards instead assert the STATISTICAL claim each
family exists to make — that it separates a planted fluent class from a
planted degenerate class — which no engine/oracle-mirrored regression can
fake.  Sensitivity is proven, not assumed: a deliberately broken family
(zeroed classifier weights) must FLIP the gate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_debezium_clickhouse_spark.plans.llm_queries import (
    _planted_quality_corpus,
    q_classifier_auc,
    q_commonness_separation,
    q_perplexity_separation,
)

SF = "/root/testdata/sf0.001"


def test_perplexity_separates_planted_classes(spark):
    row = q_perplexity_separation(spark, SF).collect()[0]
    assert row.separated is True
    assert row.n_fluent > 0 and row.n_gibberish > 0


def test_perplexity_margin_is_wide(spark):
    """Beyond the boolean: every gibberish doc's ppl must exceed every
    fluent doc's by a real margin (unit counts force ppl = corpus total),
    so a *partial* degeneracy that narrows but does not cross the gap
    still gets caught here."""
    from postgres_debezium_clickhouse_spark.operators.text import lm_unigram_logprob

    corpus = _planted_quality_corpus(spark, SF)
    scored = lm_unigram_logprob(corpus).join(
        corpus.select("doc_id", "label"), "doc_id"
    )
    agg = scored.groupBy("label").agg(
        F.min("ppl").alias("mn"), F.max("ppl").alias("mx")
    )
    by = {r.label: r for r in agg.collect()}
    assert by[0].mn > 10 * by[1].mx  # gibberish floor >> fluent ceiling


def test_commonness_separates_planted_classes(spark):
    row = q_commonness_separation(spark, SF).collect()[0]
    assert row.separated is True
    assert row.n_fluent > 0 and row.n_gibberish > 0


def test_classifier_heldout_auc_floor(spark):
    row = q_classifier_auc(spark, SF).collect()[0]
    assert row.auc_ge_090 is True
    assert row.n_pos_test > 0 and row.n_neg_test > 0


def test_classifier_guard_detects_degenerate_weights(spark):
    """Sensitivity proof: with the trained weights replaced by zeros the
    margin collapses to the bias for every doc, ranks tie completely, the
    average-rank AUC lands at exactly 0.5, and the gate must flip — i.e.
    the guard can actually fail when the family degenerates."""
    from postgres_debezium_clickhouse_spark.operators.classifier import (
        classifier_score,
    )

    corpus = _planted_quality_corpus(spark, SF)
    test = corpus.filter(F.col("doc_id") % 2 == 1)
    scored = classifier_score(test, [0] * 32, bias_milli=0).join(
        test.select("doc_id", "label"), "doc_id"
    )
    # same rank-statistic as the guard query
    from pyspark.sql import Window

    rk = F.rank().over(Window.orderBy("margin_milli")).cast("double")
    ties = F.count(F.lit(1)).over(Window.partitionBy("margin_milli"))
    ranked = scored.select("label", (rk + (ties - F.lit(1)) / F.lit(2.0)).alias("r"))
    agg = ranked.groupBy().agg(
        F.sum(F.when(F.col("label") == 1, F.col("r"))).alias("rsum"),
        F.count(F.when(F.col("label") == 1, F.lit(1))).alias("np"),
        F.count(F.when(F.col("label") == 0, F.lit(1))).alias("nn"),
    ).collect()[0]
    auc = (agg.rsum - agg.np * (agg.np + 1) / 2) / (agg.np * agg.nn)
    assert abs(auc - 0.5) < 1e-9
    assert not (auc >= 0.9)
