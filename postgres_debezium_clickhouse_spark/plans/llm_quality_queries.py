"""Quality-guard family: Gopher rules, adaptive thresholds, learned classifier + AUC guard, the oracle-independent planted-contrast separation guards, and the composed filter report.

Split out of plans/llm_queries.py (r7 verdict item 8); the
aggregator there merges every family's QUERIES/ORACLES so the driver
contract (__spark_entry__._MODULES) is unchanged.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.classifier import classifier_score
from ..operators.text import (
    adaptive_length_threshold,
    boilerplate_ngrams,
    commonness_score,
    gopher_rules,
)
from ..sources.files import load_table
from .llm_common import CLS_DIM as _CLS_DIM
from .llm_common import CLS_WEIGHTS as _CLS_WEIGHTS
from .llm_common import planted_quality_corpus as _planted_quality_corpus


def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gopher_rules(load_table(spark, sf_dir, "documents"))


def q_quality_adaptive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language P10 token-count cutoff via discrete order statistics
    (engine-portable integer index, no interpolating percentile)."""
    return adaptive_length_threshold(load_table(spark, sf_dir, "documents"))


def q_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick linear classifier scoring pass with the deterministic
    demo weight vector (the trained path is exercised in
    tests/test_classifier.py — training is iterative ML, not SQL)."""
    return classifier_score(load_table(spark, sf_dir, "documents"), _CLS_WEIGHTS)


def q_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out-AUC guard for the learned quality classifier
    (operators/classifier.py train_quality_classifier → classifier_score):
    train on the even-doc_id half of the planted corpus, score the odd
    half, and compute the rank-statistic AUC (average ranks over score
    ties).  A healthy hashing-trick LR separates the disjoint vocabularies
    essentially perfectly; a degenerate family (dead buckets, zeroed
    weights, broken export) collapses AUC toward 0.5 and flips the gate."""
    from ..operators.classifier import classifier_score, train_quality_classifier
    from pyspark.sql import Window

    corpus = _planted_quality_corpus(spark, sf_dir)
    train = corpus.filter(F.col("doc_id") % 2 == 0)
    test = corpus.filter(F.col("doc_id") % 2 == 1)
    weights, bias = train_quality_classifier(
        train, train.select("doc_id", "label"), dim=32
    )
    scored = classifier_score(test, weights, bias_milli=bias).join(
        test.select("doc_id", "label"), "doc_id"
    )
    # Mann-Whitney AUC with average ranks over ties (rank() is MIN-rank
    # for tied scores — no tie-break column in the ordering, or the ties
    # correction would double-count); the held-out set is intentionally
    # small (a guard, not a corpus pass), so the one single-partition rank
    # window is bounded by design.
    rk = F.rank().over(Window.orderBy("margin_milli")).cast("double")
    ties = F.count(F.lit(1)).over(Window.partitionBy("margin_milli"))
    ranked = scored.select(
        "label", (rk + (ties - F.lit(1)) / F.lit(2.0)).alias("r")
    )
    agg = ranked.groupBy().agg(
        F.sum(F.when(F.col("label") == 1, F.col("r"))).alias("rsum"),
        F.count(F.when(F.col("label") == 1, F.lit(1))).alias("np"),
        F.count(F.when(F.col("label") == 0, F.lit(1))).alias("nn"),
    )
    auc = (F.col("rsum") - F.col("np") * (F.col("np") + 1) / 2) / (
        F.col("np") * F.col("nn")
    )
    return agg.select(
        (auc >= 0.9).alias("auc_ge_090"),
        F.col("np").alias("n_pos_test"),
        F.col("nn").alias("n_neg_test"),
    )


def q_perplexity_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planted-contrast guard for the unigram-LM perplexity family
    (operators/text.py lm_unigram_logprob): every gibberish doc's ppl must
    exceed every fluent doc's ppl — unit-count tokens give avg_logprob =
    −ln(total), the corpus maximum, so a healthy LM separates the classes
    with a wide margin; a degenerate one (collapsed counts) cannot."""
    from ..operators.text import lm_unigram_logprob

    corpus = _planted_quality_corpus(spark, sf_dir)
    scored = lm_unigram_logprob(corpus).join(corpus.select("doc_id", "label"), "doc_id")
    return scored.groupBy().agg(
        (
            F.min(F.when(F.col("label") == 0, F.col("ppl")))
            > F.max(F.when(F.col("label") == 1, F.col("ppl")))
        ).alias("separated"),
        F.count(F.when(F.col("label") == 1, F.lit(1))).alias("n_fluent"),
        F.count(F.when(F.col("label") == 0, F.lit(1))).alias("n_gibberish"),
    )


def q_commonness_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planted-contrast guard for the token-commonness family
    (operators/text.py commonness_score): fluent docs' tokens recur across
    the corpus (df ≈ n_fluent/... high), gibberish tokens have df = 1, so
    every fluent doc must out-score every gibberish doc."""
    corpus = _planted_quality_corpus(spark, sf_dir)
    scored = commonness_score(corpus).join(corpus.select("doc_id", "label"), "doc_id")
    return scored.groupBy().agg(
        (
            F.min(F.when(F.col("label") == 1, F.col("commonness")))
            > F.max(F.when(F.col("label") == 0, F.col("commonness")))
        ).alias("separated"),
        F.count(F.when(F.col("label") == 1, F.lit(1))).alias("n_fluent"),
        F.count(F.when(F.col("label") == 0, F.lit(1))).alias("n_gibberish"),
    )


def q_langid_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r7: planted-contrast guard for the marker-token language-ID family
    (operators/text.py language_id) — each doc's text is built IN the
    language doc_id % 4 dictates (marker tokens + a per-doc unique filler),
    and the detector must recover every planted label.  The oracle states
    the class counts and the all-correct verdict from doc_id arithmetic
    alone (same oracle-independence pattern as the perplexity guard)."""
    from ..operators.text import language_id

    phrases = F.array(
        F.lit("the cat sat and the dog ran a mile"),      # en markers
        F.lit("el gato y la casa con el perro"),          # es markers
        F.lit("der hund und der mann und die katze"),     # de markers
        F.lit("le chat et le chien et la maison"),        # fr markers
    )
    expected = F.element_at(
        F.array(F.lit("en"), F.lit("es"), F.lit("de"), F.lit("fr")),
        (F.col("doc_id") % 4).cast("int") + 1,
    )
    planted = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        expected.alias("planted_lang"),
        F.concat(
            F.element_at(phrases, (F.col("doc_id") % 4).cast("int") + 1),
            F.lit(" w"), F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    scored = language_id(planted).join(planted.select("doc_id", "planted_lang"), "doc_id")
    return (
        scored.groupBy("planted_lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(F.col("detected_lang") == F.col("planted_lang")).alias("all_correct"),
        )
    )


def q_quality_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r7: planted-contrast guard for the composite quality gate
    (operators/text.py quality_score) — 'good' docs (30 distinct per-doc
    words, in-bounds length, no stopwords) must ALL keep; 'degenerate'
    docs (one stopword repeated 60×: diversity ~0.017, stopword ratio 1.0)
    must ALL drop.  A silently-degenerated gate (thresholds collapsed,
    ratios mis-computed) flips a verdict; the oracle states both verdicts
    as constants from doc_id arithmetic alone."""
    from ..operators.text import quality_score

    good = F.expr(
        "concat_ws(' ', transform(sequence(0, 29),"
        " i -> concat('w', doc_id, 'x', i)))"
    )
    bad = F.expr("concat_ws(' ', transform(sequence(0, 59), i -> 'the'))")
    is_bad = F.col("doc_id") % 3 == 0
    planted = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(is_bad, F.lit("degenerate")).otherwise(F.lit("good")).alias("cls"),
        F.when(is_bad, bad).otherwise(good).alias("text"),
    )
    scored = quality_score(planted).join(planted.select("doc_id", "cls"), "doc_id")
    return scored.groupBy("cls").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min(F.col("keep") == (F.col("cls") == "good")).alias("all_verdicts_correct"),
    )


def q_llm_filter_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed RefinedWeb/CCNet-style filter decision per document:
    Gopher rule conjunction + learned classifier sign + cross-doc
    boilerplate bound + unigram-LM perplexity bound, with the final keep
    verdict — every signal individually oracle-checked above, this checks
    the composed decision.  Docs too short to have 5-gram boilerplate
    evidence pass that gate vacuously (left join + coalesce true).

    One lazy plan; the two shuffle-bearing signals (boilerplate df,
    unigram LM) stay independent branches so neither blocks the map-only
    signals (gopher, classifier) from fusing into their scan."""
    from ..operators.text import lm_unigram_logprob

    docs = load_table(spark, sf_dir, "documents")
    g = gopher_rules(docs).select("doc_id", F.col("passes").alias("gopher_ok"))
    c = classifier_score(docs, _CLS_WEIGHTS).select(
        "doc_id", F.col("pred_keep").alias("clf_ok")
    )
    b = boilerplate_ngrams(docs).select(
        "doc_id", (F.col("boilerplate_ratio") <= 0.2).alias("boiler_ok")
    )
    p = lm_unigram_logprob(docs).select(
        "doc_id", (F.col("avg_logprob") >= -3.42).alias("ppl_ok")
    )
    boiler = F.coalesce(F.col("boiler_ok"), F.lit(True))
    return (
        g.join(c, "doc_id")
        .join(b, "doc_id", "left")
        .join(p, "doc_id")
        .select(
            "doc_id",
            "gopher_ok",
            "clf_ok",
            boiler.alias("boiler_ok"),
            "ppl_ok",
            (F.col("gopher_ok") & F.col("clf_ok") & boiler & F.col("ppl_ok")).alias("keep"),
        )
    )


def q_fineweb_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r13 — the FineWeb custom line-level filters (Penedo et al. 2024
    §3.1; operators/text.fineweb_rules), completing the public filter
    trio next to quality_gopher_rules and text_c4_line_filter.  Planted
    multi-line pages make each rule fire on a known cohort: doc_id
    %5 == 0 pages carry NO punctuation-terminated lines (punct rule),
    %4 == 0 pages gain twelve 5-char 'tiny.' lines (short-line rule),
    %3 == 0 pages repeat their own first line twice more (duplicated-
    line-characters rule — length-independent by construction).  The
    oracle rebuilds the same pages and replays all three
    integer-exact threshold tests."""
    from ..operators.text import fineweb_rules

    docs = load_table(spark, sf_dir, "documents")
    k = F.col("doc_id")
    t = F.trim(F.col("text"))
    l2 = F.when(
        k % 5 == 0, F.lit("planted line number two without any ending mark")
    ).otherwise(
        F.lit("this first planted line terminates with proper punctuation.")
    )
    l3 = F.when(
        k % 5 == 0, F.lit("planted line number three equally unpunctuated")
    ).otherwise(
        F.lit("so does this second planted sentence, clearly and visibly.")
    )
    mid = (
        F.when(k % 4 == 0, F.expr("repeat('\ntiny.', 12)"))
        .when(k % 5 == 0,
              F.lit("\na fourth line here with no terminal mark at all"))
        .otherwise(
            F.lit("\na fourth line that is long enough and ends"
                  " with a period."))
    )
    tail = F.when(k % 3 == 0, F.concat(F.lit("\n"), t, F.lit("\n"), t)).otherwise(
        F.lit("\na fifth line without terminal punctuation here"
              "\nand a sixth line also lacking punctuation at its end")
    )
    page = F.concat(F.concat_ws("\n", t, l2, l3), mid, tail)
    return fineweb_rules(docs.select("doc_id", page.alias("text")))


QUERIES = {
    "quality_fineweb_rules": q_fineweb_rules,
    "quality_gopher_rules": q_gopher_rules,
    "quality_adaptive_filter": q_quality_adaptive_filter,
    "quality_classifier_score": q_classifier_score,
    "quality_classifier_auc": q_classifier_auc,
    "text_perplexity_separation": q_perplexity_separation,
    "text_commonness_separation": q_commonness_separation,
    "text_langid_separation": q_langid_separation,
    "text_quality_separation": q_quality_separation,
    "llm_filter_report": q_llm_filter_report,
}

ORACLES = {
    "quality_fineweb_rules": """
        WITH pg AS (
            SELECT doc_id,
                   trim(text) || chr(10)
                   || CASE WHEN doc_id % 5 = 0
                           THEN 'planted line number two without any ending mark'
                           ELSE 'this first planted line terminates with proper punctuation.'
                      END || chr(10)
                   || CASE WHEN doc_id % 5 = 0
                           THEN 'planted line number three equally unpunctuated'
                           ELSE 'so does this second planted sentence, clearly and visibly.'
                      END
                   || CASE WHEN doc_id % 4 = 0
                           THEN repeat(chr(10) || 'tiny.', 12)
                           WHEN doc_id % 5 = 0
                           THEN chr(10) || 'a fourth line here with no terminal mark at all'
                           ELSE chr(10) || 'a fourth line that is long enough and ends with a period.'
                      END
                   || CASE WHEN doc_id % 3 = 0
                           THEN chr(10) || trim(text) || chr(10) || trim(text)
                           ELSE chr(10) || 'a fifth line without terminal punctuation here'
                                || chr(10) || 'and a sixth line also lacking punctuation at its end'
                      END AS page
            FROM documents
        ),
        ln AS (SELECT doc_id, unnest(string_split(page, chr(10))) AS line
               FROM pg),
        per_line AS (
            SELECT doc_id, line, length(line) AS l,
                   CASE WHEN regexp_matches(line, '[.!?"]$')
                        THEN 1 ELSE 0 END AS p,
                   CASE WHEN length(line) < 30 THEN 1 ELSE 0 END AS s
            FROM ln
        ),
        dup AS (
            SELECT doc_id, CAST(SUM((c - 1) * l) AS BIGINT)
                     AS dup_line_chars
            FROM (SELECT doc_id, line, COUNT(*) AS c, MIN(l) AS l
                  FROM per_line GROUP BY doc_id, line)
            GROUP BY doc_id
        ),
        agg AS (
            SELECT doc_id, COUNT(*) AS n_lines,
                   CAST(SUM(p) AS BIGINT) AS punct_lines,
                   CAST(SUM(s) AS BIGINT) AS short_lines,
                   CAST(SUM(l) AS BIGINT) AS total_line_chars
            FROM per_line GROUP BY doc_id
        )
        SELECT a.doc_id, a.n_lines, a.punct_lines, a.short_lines,
               a.total_line_chars, d.dup_line_chars,
               a.punct_lines * 100 >= a.n_lines * 12 AS punct_ok,
               a.short_lines * 100 <= a.n_lines * 67 AS short_ok,
               d.dup_line_chars * 10 <= a.total_line_chars AS dup_ok,
               (a.punct_lines * 100 >= a.n_lines * 12
                AND a.short_lines * 100 <= a.n_lines * 67
                AND d.dup_line_chars * 10 <= a.total_line_chars) AS passes
        FROM agg a JOIN dup d USING (doc_id)
    """,
    "quality_gopher_rules": """
        WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents),
        s AS (SELECT doc_id,
                     CAST(len(tk) AS BIGINT) AS n_words,
                     CAST(list_sum(list_transform(tk, x -> length(x))) AS BIGINT) AS sum_len,
                     CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS BIGINT) AS n_sym,
                     CAST(len(list_intersect(list_distinct(tk), ['the', 'a', 'and', 'of'])) AS BIGINT) AS n_stop_distinct
              FROM t)
        SELECT doc_id,
               n_words,
               ROUND(sum_len * 1.0 / n_words, 6) AS mean_word_len,
               ROUND(n_sym * 1.0 / n_words, 6) AS symbol_word_ratio,
               n_stop_distinct,
               (n_words >= 50 AND n_words <= 100000) AS words_ok,
               (sum_len >= 3 * n_words AND sum_len <= 10 * n_words) AS mean_len_ok,
               (n_sym * 10 < n_words) AS symbol_ok,
               (n_stop_distinct >= 2) AS stop_ok,
               ((n_words >= 50 AND n_words <= 100000)
                AND (sum_len >= 3 * n_words AND sum_len <= 10 * n_words)
                AND (n_sym * 10 < n_words)
                AND (n_stop_distinct >= 2)) AS passes
        FROM s
    """,
    "quality_adaptive_filter": """
        WITH d AS (SELECT doc_id, lang,
                          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                   FROM documents),
        ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                       ORDER BY n_tokens ASC, doc_id ASC) AS rn,
                      COUNT(*) OVER (PARTITION BY lang) AS cnt
                   FROM d),
        thr AS (SELECT lang, n_tokens AS threshold_tokens FROM ranked
                WHERE rn = GREATEST(CAST(FLOOR((cnt * 1 + 9) / 10) AS BIGINT), 1))
        SELECT d.lang, COUNT(*) AS n_docs,
               MIN(t.threshold_tokens) AS threshold_tokens,
               CAST(SUM(CASE WHEN d.n_tokens < t.threshold_tokens THEN 1 ELSE 0 END) AS BIGINT) AS n_below
        FROM d JOIN thr t USING (lang)
        GROUP BY d.lang
    """,
    "quality_classifier_score": f"""
    WITH w AS (SELECT {_CLS_WEIGHTS} AS wv),
    toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    scored AS (
        SELECT doc_id, tk,
               CAST(list_sum(list_transform(tk,
                   t -> wv[('0x' || substr(md5(t), 1, 8))::BIGINT % {_CLS_DIM} + 1]))
                   AS BIGINT) AS m
        FROM toks, w)
    SELECT doc_id,
           len(tk) AS n_tokens,
           m AS margin_milli,
           ROUND(m / 1000.0, 6) AS margin,
           m > 0 AS pred_keep
    FROM scored
""",
    "quality_classifier_auc": """
    SELECT true AS auc_ge_090,
           COUNT(*) FILTER (WHERE doc_id % 3 <> 0) AS n_pos_test,
           COUNT(*) FILTER (WHERE doc_id % 3 = 0) AS n_neg_test
    FROM documents WHERE doc_id % 2 = 1
""",
    "text_perplexity_separation": """
    SELECT true AS separated,
           COUNT(*) FILTER (WHERE doc_id % 3 <> 0) AS n_fluent,
           COUNT(*) FILTER (WHERE doc_id % 3 = 0) AS n_gibberish
    FROM documents
""",
    "text_commonness_separation": """
    SELECT true AS separated,
           COUNT(*) FILTER (WHERE doc_id % 3 <> 0) AS n_fluent,
           COUNT(*) FILTER (WHERE doc_id % 3 = 0) AS n_gibberish
    FROM documents
""",
    "text_langid_separation": """
    SELECT CASE doc_id % 4 WHEN 0 THEN 'en' WHEN 1 THEN 'es'
                           WHEN 2 THEN 'de' ELSE 'fr' END AS planted_lang,
           COUNT(*) AS n_docs, true AS all_correct
    FROM documents GROUP BY 1
""",
    "text_quality_separation": """
    SELECT CASE WHEN doc_id % 3 = 0 THEN 'degenerate' ELSE 'good' END AS cls,
           COUNT(*) AS n_docs, true AS all_verdicts_correct
    FROM documents GROUP BY 1
""",
    "llm_filter_report": f"""
    WITH w AS (SELECT {_CLS_WEIGHTS} AS wv),
    toks AS (SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents),
    gop AS (SELECT doc_id,
                   (CAST(len(tk) AS BIGINT) >= 50 AND CAST(len(tk) AS BIGINT) <= 100000
                    AND CAST(list_sum(list_transform(tk, x -> length(x))) AS BIGINT) >= 3 * len(tk)
                    AND CAST(list_sum(list_transform(tk, x -> length(x))) AS BIGINT) <= 10 * len(tk)
                    AND CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS BIGINT) * 10 < len(tk)
                    AND len(list_intersect(list_distinct(tk), ['the', 'a', 'and', 'of'])) >= 2)
                   AS gopher_ok
            FROM toks),
    clf AS (SELECT doc_id,
                   CAST(list_sum(list_transform(tk,
                       t -> wv[('0x' || substr(md5(t), 1, 8))::BIGINT % {_CLS_DIM} + 1]))
                       AS BIGINT) > 0 AS clf_ok
            FROM toks, w),
    g AS (SELECT doc_id,
                 unnest(list_distinct([array_to_string(tk[i:i+4], ' ')
                                       for i in range(1, len(tk) - 3)])) AS ngram
          FROM toks WHERE len(tk) >= 5),
    dfreq AS (SELECT ngram, COUNT(*) AS df FROM g GROUP BY ngram),
    boil AS (SELECT g.doc_id,
                    (ROUND(SUM(CASE WHEN d.df >= 3 THEN 1 ELSE 0 END) * 1.0
                           / COUNT(*), 6) <= 0.2) AS boiler_ok
             FROM g JOIN dfreq d USING (ngram) GROUP BY g.doc_id),
    tu AS (SELECT doc_id, unnest(tk) AS token FROM toks),
    uni AS (SELECT token, count(*) AS cnt FROM tu GROUP BY token),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM uni),
    ppl AS (SELECT tu.doc_id,
                   (ROUND(sum(ln(u.cnt)) / count(*) - ln(tot.total), 6) >= -3.42)
                   AS ppl_ok
            FROM tu JOIN uni u USING (token), tot GROUP BY tu.doc_id, tot.total)
    SELECT t.doc_id, gop.gopher_ok, clf.clf_ok,
           COALESCE(boil.boiler_ok, TRUE) AS boiler_ok, ppl.ppl_ok,
           (gop.gopher_ok AND clf.clf_ok AND COALESCE(boil.boiler_ok, TRUE)
            AND ppl.ppl_ok) AS keep
    FROM toks t
    JOIN gop USING (doc_id)
    JOIN clf USING (doc_id)
    LEFT JOIN boil USING (doc_id)
    JOIN ppl USING (doc_id)
""",
}
