"""Text-analysis family: stats, lang-ID, quality score, token counts, fingerprints, repetition, boilerplate, PII scrub, TF-IDF, commonness, HTML/URL extraction, LM perplexity, Unicode repair, vocabulary reports.

Split out of plans/llm_queries.py (r7 verdict item 8); the
aggregator there merges every family's QUERIES/ORACLES so the driver
contract (__spark_entry__._MODULES) is unchanged.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text import (
    boilerplate_ngrams,
    commonness_score,
    fingerprint,
    language_id,
    quality_score,
    repetition_score,
    text_stats,
    tfidf_top_terms,
    token_count_regex,
    vocab_topk,
)
from ..operators.curation import pii_scrub
from ..sources.files import load_table
from .llm_common import SHINGLES as _SHINGLES


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_stats(load_table(spark, sf_dir, "documents"))


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return language_id(load_table(spark, sf_dir, "documents"))


def q_text_main_content_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r17 — the COMPOSITION the r16 verdict's item-3 done-criterion
    names: main-content extraction feeding quality scoring, exactly
    where real curation runs it (extract article → THEN score).  The
    fixture is the chrome-vs-article page with VARIED article words
    ('w'||(t%13) at global token position t, so diversity/length are
    non-degenerate); main_content keeps h1+paragraphs, quality_score
    runs over the EXTRACTED text only, and the oracle restates every
    quality column from the closed-form token stream — chrome leaking
    into the extraction would flip len_ok/diversity and fail the
    hash."""
    from ..operators.text import main_content, quality_score

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    h = F.lit(2) + F.col("doc_id") % 4
    np_ = F.lit(1) + F.col("doc_id") % 3
    wc = F.lit(18) + (F.col("doc_id") % 5) * 2
    docs = (docs.withColumn("__h", h).withColumn("__np", np_)
            .withColumn("__wc", wc))
    h1 = F.expr("concat_ws(' ', transform(sequence(0, __h - 1),"
                " i -> concat('w', i % 13)))")
    paras = F.expr(
        "concat_ws('', transform(sequence(0, __np - 1),"
        " p -> concat('<p>', concat_ws(' ', transform("
        "sequence(0, __wc - 1),"
        " i -> concat('w', (__h + p * __wc + i) % 13))), '</p>')))"
    )
    html = F.concat(
        F.lit("<nav><a>n1</a> <a>n2</a> <a>n3</a></nav><h1>"), h1,
        F.lit("</h1>"), paras,
        F.lit("<div><a>r r</a> x</div>"
              "<footer><a>f</a> <a>f2</a></footer>"),
    )
    main = main_content(docs.withColumn("html", html))
    qual = quality_score(
        main.select("doc_id", F.col("main_text").alias("text"),
                    "n_content_blocks", "n_words_main"),
        text_col="text",
    )
    return (
        main.select("doc_id", "n_content_blocks", "n_words_main")
        .join(qual, "doc_id")
        .select("doc_id", "n_content_blocks", "n_words_main",
                "token_diversity", "stopword_ratio", "len_ok", "keep")
    )


def q_text_langid_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r17 — TRAINED language ID (operators/classifier.py
    train_langid_classifier/langid_score): replaces the stopword-marker
    heuristic with a real multinomial hashing-trick classifier
    (fastText shape, Joulin 2016) while keeping oracle independence —
    the planted multilingual fixture (per doc: 6 shared words + 10
    language-specific words, language = doc_id%4) is scored by a model
    TRAINED on it, and the DuckDB oracle states only the planted
    labels: one misclassified document fails the value hash.  Training
    runs once on the fixture (sample-scale pyspark.ml); scoring is
    map-only integer aggregates — the 100 TB path."""
    from ..operators.classifier import (
        langid_score,
        train_langid_classifier,
    )

    langs = ["en", "es", "de", "fr"]
    lang_c = F.element_at(F.array(*[F.lit(lang) for lang in langs]),
                          (F.col("doc_id") % 4 + 1).cast("int"))
    shared = [F.concat(F.lit("sh"), ((F.col("doc_id") + j) % 4).cast("string"))
              for j in range(6)]
    langw = [F.concat(lang_c, F.lit("t"),
                      ((F.col("doc_id") + i) % 6).cast("string"))
             for i in range(10)]
    docs = (
        load_table(spark, sf_dir, "documents").select("doc_id")
        .withColumn("lang", lang_c)
        .withColumn("text", F.concat_ws(" ", *shared, *langw))
    )
    # train on a bounded SAMPLE (the operator's design: the per-bucket
    # count features are O(dim·tokens) per row and exist only at
    # training time); score the FULL corpus map-only.  doc_id is dense
    # from 0, so this is a deterministic 20k-doc cap at any SF.
    models = train_langid_classifier(
        docs.filter(F.col("doc_id") < 20_000), langs)
    return langid_score(docs, models).select("doc_id", "detected_lang")


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_score(load_table(spark, sf_dir, "documents"))


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_count_regex(load_table(spark, sf_dir, "documents"))


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprint(load_table(spark, sf_dir, "documents"))


def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_score(load_table(spark, sf_dir, "documents"))


def q_text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return boilerplate_ngrams(load_table(spark, sf_dir, "documents"))


def q_text_main_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r17 — main-content extraction (operators/text.py main_content):
    the boilerpipe step real curation runs before quality scoring.
    Planted chrome-vs-article fixture per doc: a link-dense nav, an
    <h1> of 2+d%4 words, 1+d%3 article paragraphs of 18+2*(d%5) words,
    a link-heavy 'related' block, and a footer — the published
    NumWordsRulesClassifier rules (Kohlschütter WSDM 2010) must keep
    exactly the h1 + paragraphs and drop all three chrome blocks; the
    oracle restates every kept-block decision closed-form."""
    from ..operators.text import main_content

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    h = F.lit(2) + F.col("doc_id") % 4
    np_ = F.lit(1) + F.col("doc_id") % 3
    wc = F.lit(18) + (F.col("doc_id") % 5) * 2
    html = F.concat(
        F.lit("<nav><a>n1</a> <a>n2</a> <a>n3</a></nav><h1>"),
        F.rtrim(F.repeat(F.lit("w "), h)),
        F.lit("</h1>"),
        F.repeat(F.concat(F.lit("<p>"), F.rtrim(F.repeat(F.lit("w "), wc)),
                          F.lit("</p>")), np_),
        F.lit("<div><a>r r</a> x</div>"
              "<footer><a>f</a> <a>f2</a></footer>"),
    )
    return main_content(docs.withColumn("html", html))


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over the corpus.  The fixture texts carry no PII, so a
    deterministic contact line (email + long number) is appended per doc —
    the scrub path is actually exercised, and the oracle builds the same
    line."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com tel 55512345678"),
        ),
    )
    return pii_scrub(docs)


def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tfidf_top_terms(load_table(spark, sf_dir, "documents"), k=3)


#: BM25 eval queries: fixture-vocab terms plus one corpus-absent term
#: ('zzz' — must contribute nothing, not NULL the score).
_BM25_QUERIES = [
    (1, "spark table merge scan"),
    (2, "query filter join window"),
    (3, "the customer zzz"),
]


def q_text_bigram_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r12 — bigram LM + stupid backoff (Brants et al. 2007): the step
    up the n-gram ladder from text_lm_perplexity's unigram score.  The
    fixture's random-order bag-of-words text keeps most transitions in
    the BACKOFF branch while frequent adjacent pairs hit the bigram
    branch, so both score paths carry driver evidence.  Scores sum as
    round-6 DECIMAL(20,6) — order-independent, so the oracle's means
    are bit-identical."""
    from ..operators.text import lm_bigram_stupid_backoff

    return lm_bigram_stupid_backoff(
        load_table(spark, sf_dir, "documents")
    )


def q_text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r12 — Okapi BM25 top-5 retrieval (operators/text.bm25_topk): the
    lexical-retrieval baseline next to the embedding ANN family, and
    the ranking decontamination sweeps actually use.  Determinism
    contract mirrored by the oracle: round-6 idf log, round-6 per-term
    contributions, DECIMAL(20,6) order-independent score sum, (score
    desc, doc_id asc) ties."""
    from ..operators.text import bm25_topk

    return bm25_topk(
        load_table(spark, sf_dir, "documents"), _BM25_QUERIES, k=5,
    )


def q_text_commonness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-commonness (mean corpus df ratio over distinct tokens) — the
    log-free perplexity proxy."""
    return commonness_score(load_table(spark, sf_dir, "documents"))


def q_text_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r6: markup → text extraction.  Each document is wrapped in a
    deterministic HTML shell (title header, paragraph body, a script
    block that must vanish WITH its contents, an ``&amp;`` entity);
    ``strip_markup`` recovers the text.  The oracle rebuilds the same
    shell and runs the identical RE2-subset regex chain in DuckDB, so
    tag removal, block elision, entity decode, and whitespace collapse
    are all value-checked per document."""
    from ..operators.text import strip_markup

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("<html><head><style>p{color:red}</style></head><body><h1>Doc "),
            F.col("doc_id").cast("string"),
            F.lit("</h1>\n<p class=\"body\">"),
            F.col("text"),
            F.lit("</p> &amp; <script type=\"text/javascript\">var x = \"<p>\";</script></body></html>"),
        ).alias("html"),
    )
    return strip_markup(docs)


def q_text_url_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r6: URL/domain extraction — deterministic URLs are injected into
    each document (closed forms of doc_id) and the extractor must recover
    every one with its domain; the oracle runs the identical RE2-subset
    regexes in DuckDB."""
    from ..operators.text import extract_urls

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" see https://src"), (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.com/doc/"), F.col("doc_id").cast("string"),
            F.lit(" and http://cdn.example.org/a/"), (F.col("doc_id") % 13).cast("string"),
        ).alias("text"),
    )
    return extract_urls(docs)


def q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity scoring with the corpus's own unigram LM —
    occurrence-weighted log-space quality signal."""
    from ..operators.text import lm_unigram_logprob

    return lm_unigram_logprob(load_table(spark, sf_dir, "documents"))


def q_corpus_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r13 (verdict item 7) — CCNet head/middle/tail bucketing (Wenzek
    et al. 2020 §4.4): per-language perplexity terciles over the
    corpus-trained unigram LM, rank-cut at ceil(n/3)/ceil(2n/3) with
    round-6-score + doc-id tie-breaks so the DuckDB replay is exact.
    Completes the CCNet chain: paragraph dedup (r12) → LM score (r5) →
    bucket (this)."""
    from ..operators.text import ccnet_perplexity_buckets

    return ccnet_perplexity_buckets(load_table(spark, sf_dir, "documents"))


def q_text_normalize_unicode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r7: Unicode repair over a deterministically denormalized fixture —
    every doc gains a decomposed e+COMBINING-ACUTE sequence (NFC must
    compose it), doc_id %4 == 0 rows gain a BEL control char (must strip),
    %6 == 0 rows gain a U+FFFD replacement char (mojibake count).  The
    oracle reruns the same strip+NFC chain with DuckDB's nfc_normalize —
    two independent UAX#15 implementations must agree byte-for-byte on
    every normalized string."""
    from ..operators.text import normalize_unicode

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" cafe\u0301"),  # DECOMPOSED e + U+0301 (explicit escape)
            F.when(F.col("doc_id") % 4 == 0, F.lit("\x07ding")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 6 == 0, F.lit(" �")).otherwise(F.lit("")),
        ).alias("text"),
    )
    return normalize_unicode(docs)


def q_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vocab_topk(load_table(spark, sf_dir, "documents"), k=100)


def q_corpus_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r6: vocabulary-coverage curve — fraction of token occurrences
    covered by the top-k vocab at k ∈ {10, 30, 100}; the report that sizes
    a tokenizer's vocabulary before training it."""
    from ..operators.text import vocab_coverage

    return vocab_coverage(load_table(spark, sf_dir, "documents"))


def q_text_c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r13 — C4's line-level cleaning rules (Raffel et al. 2020 §2.2)
    over a deterministically planted multi-line page per document: the
    doc's own text rides as line 1 (no terminal punctuation in the
    fixture, so the punctuation rule actually fires on real data), then
    planted lines exercising every rule — a <5-word line, a
    no-terminal-punct line, kept lines, 'lorem ipsum' on doc_id %17,
    a curly brace on %23, and a %19 variant with only 2 retainable
    lines (the min-lines page drop).  The oracle rebuilds the same page
    and replays the rules with DuckDB list lambdas — two independent
    regex/word-count implementations must agree on every page verdict
    AND the rewritten text byte-for-byte."""
    from ..operators.text import c4_line_filter

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.trim(F.col("text")),
            F.lit("tiny line."),
            F.when(F.col("doc_id") % 19 == 0, F.lit("four words no punct"))
            .otherwise(F.lit("this line has exactly five words.")),
            F.lit("no terminal punctuation so this line drops"),
            F.concat(F.lit("unique line for doc "),
                     F.col("doc_id").cast("string"),
                     F.lit(" with terminal punctuation.")),
            F.when(F.col("doc_id") % 17 == 0,
                   F.lit("this page contains lorem ipsum text now."))
            .otherwise(
                F.lit("an ordinary closing sentence appears right here.")),
            F.when(F.col("doc_id") % 23 == 0,
                   F.lit("code token { appears in this line."))
            .when(F.col("doc_id") % 19 == 0, F.lit("nope."))
            .otherwise(F.lit("final line is good too.")),
        ).alias("text"),
    )
    return c4_line_filter(docs)


def q_corpus_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r13 — Zipf exponent fit (operators/text.zipf_fit): OLS of
    ln(freq) on ln(rank) over the top-100 vocabulary, the standard
    corpus-health diagnostic next to corpus_vocab_coverage.  Fully
    value-oracled: round-6 logs and DECIMAL(20,6) sums make the OLS
    inputs exact in both engines."""
    from ..operators.text import zipf_fit

    return zipf_fit(load_table(spark, sf_dir, "documents"), top_n=100)


def q_text_trigram_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r13 — trigram stupid backoff (Brants et al. 2007 §4,
    operators/text.lm_trigram_stupid_backoff): the full
    trigram→bigram→unigram backoff ladder over the corpus's own
    counts, one rung above text_bigram_backoff.  Fully value-oracled
    with the same round-6-log / DECIMAL-sum / floor-mean discipline."""
    from ..operators.text import lm_trigram_stupid_backoff

    return lm_trigram_stupid_backoff(load_table(spark, sf_dir, "documents"))


def q_text_bigram_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r14 — interpolated Kneser-Ney bigram scoring
    (operators/text.lm_bigram_kneser_ney, D = 0.75): the top of the
    smoothing ladder (MLE → stupid backoff → Jelinek-Mercer → KN).
    Counts train on the EVEN doc_ids only and ALL docs are scored, so
    odd docs carry genuinely unseen bigrams — the planted contrast:
    raw MLE assigns them ln 0 (infinite perplexity), KN's
    λ(w₁)·P_cont(w₂) mass keeps them finite (n_unseen counts them
    per doc).  Same round-6-log / DECIMAL-sum / floor-mean discipline
    as the JM/backoff siblings."""
    from ..operators.text import lm_bigram_kneser_ney

    docs = load_table(spark, sf_dir, "documents")
    return lm_bigram_kneser_ney(
        docs, train_docs=docs.filter(F.col("doc_id") % 2 == 0)
    )


def q_text_bigram_modified_kneser_ney(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """r14 — MODIFIED Kneser-Ney bigram scoring
    (operators/text.lm_bigram_modified_kneser_ney): Chen & Goodman
    1999 §3's uniformly-best variant — three count-class discounts
    D₁/D₂/D₃₊ estimated from the train table's own count-of-counts by
    the leave-one-out closed form, replacing the single fixed D = 0.75
    of text_bigram_kneser_ney.  Same even-doc_ids train split (odd
    docs carry genuinely unseen bigrams), same OOV accounting, same
    round-6-log / DECIMAL-sum / floor-mean discipline; the
    count-of-counts regime (n₁,n₂,n₃ > 0) is guarded in-plan and the
    oracle hardcodes the boolean."""
    from ..operators.text import lm_bigram_modified_kneser_ney

    docs = load_table(spark, sf_dir, "documents")
    return lm_bigram_modified_kneser_ney(
        docs, train_docs=docs.filter(F.col("doc_id") % 2 == 0)
    )


def q_text_bigram_witten_bell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r14 — Witten-Bell smoothed bigram scoring
    (operators/text.lm_bigram_witten_bell): the parameter-free classic
    completing the smoothing family — the mixture weight is the
    context's own type/token ratio, total on any corpus (no
    count-of-counts regime, the contrast with modified KN).  Same
    even-doc_ids train split and round-6-log / DECIMAL-sum /
    floor-mean discipline as the KN siblings."""
    from ..operators.text import lm_bigram_witten_bell

    docs = load_table(spark, sf_dir, "documents")
    return lm_bigram_witten_bell(
        docs, train_docs=docs.filter(F.col("doc_id") % 2 == 0)
    )


def q_text_trigram_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — interpolated TRIGRAM Kneser-Ney scoring
    (operators/text.lm_trigram_kneser_ney, D = 0.75 at both upper
    levels, continuation counts below the top): completes the trigram
    ladder whose last rung was stupid backoff — and the contrast
    matters, KN is a PROPER distribution (sums to 1 per context) where
    stupid backoff is an unnormalized score.  Counts train on the EVEN
    doc_ids only and ALL docs are scored, so odd docs carry genuinely
    unseen trigrams (``n_unseen``) that the λ(w₁w₂)·P_KN(w₃|w₂) mass
    keeps finite.  Same round-6-log / DECIMAL-sum / floor-mean
    discipline as the whole smoothing family."""
    from ..operators.text import lm_trigram_kneser_ney

    docs = load_table(spark, sf_dir, "documents")
    return lm_trigram_kneser_ney(
        docs, train_docs=docs.filter(F.col("doc_id") % 2 == 0)
    )


def q_text_trigram_witten_bell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — Witten-Bell smoothed TRIGRAM scoring
    (operators/text.lm_trigram_witten_bell): the parameter-free member
    completing the trigram ladder (stupid backoff → interpolated KN →
    WB) — type-count mixture weights over RAW counts at every level,
    total on any corpus (no count-of-counts regime).  Same even-doc_ids
    train split (odd docs carry genuinely unseen trigrams) and
    round-6-log / DECIMAL-sum / floor-mean discipline as the family."""
    from ..operators.text import lm_trigram_witten_bell

    docs = load_table(spark, sf_dir, "documents")
    return lm_trigram_witten_bell(
        docs, train_docs=docs.filter(F.col("doc_id") % 2 == 0)
    )


def q_text_trigram_interpolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — Jelinek-Mercer interpolated TRIGRAM scoring
    (operators/text.lm_trigram_interpolated, λ = 0.5/0.3/0.15/0.05
    with the uniform 1/V backstop): the fourth and final smoothing
    family on the trigram rung — the ladder now carries stupid
    backoff, Kneser-Ney, Witten-Bell and JM at both orders.  Same
    even-doc_ids train split (odd docs carry genuinely unseen
    trigrams and OOV words, exercising every mixture component) and
    round-6-log / DECIMAL-sum / floor-mean discipline."""
    from ..operators.text import lm_trigram_interpolated

    docs = load_table(spark, sf_dir, "documents")
    return lm_trigram_interpolated(
        docs, train_docs=docs.filter(F.col("doc_id") % 2 == 0)
    )


def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r14 — Flesch Reading Ease + Flesch-Kincaid grade
    (operators/text.readability_scores): the classic readability pair
    edu-quality pipelines rank pages with, over exact integer
    word/sentence/vowel-group counts and one mirrored double dag per
    score.  Pure map pass — no shuffle."""
    from ..operators.text import readability_scores

    return readability_scores(load_table(spark, sf_dir, "documents"))


def q_text_bigram_interpolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r13 — Jelinek-Mercer interpolated bigram scoring
    (operators/text.lm_bigram_interpolated, λ = 0.7): the PROPER-
    probability smoothing family next to stupid backoff — same count
    tables, one mixture formula for seen and unseen transitions alike.
    Same round-6-log / DECIMAL-sum / floor-mean discipline."""
    from ..operators.text import lm_bigram_interpolated

    return lm_bigram_interpolated(load_table(spark, sf_dir, "documents"))


def q_text_watermark_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — LLM watermark detection (operators/text.watermark_zscore;
    Kirchenbauer et al. 2023): per document, the one-proportion
    z-score of the hash-seeded green-token fraction (γ = 0.25) — the
    synthetic-text triage signal a crawl pipeline runs next to
    benchmark decontamination.  Natural fixture text scores near 0;
    the oracle replays the pair hash and the one shared z dag."""
    from ..operators.text import watermark_zscore

    return watermark_zscore(load_table(spark, sf_dir, "documents"))


def q_text_5gram_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r16 (verdict item 5) — interpolated 5-GRAM Kneser-Ney scoring
    (operators/text.lm_5gram_kneser_ney, D = 0.75 at every level,
    continuation counts below the top — the KenLM production order for
    the CCNet-style perplexity filter).  Counts train on the EVEN
    doc_ids only and ALL docs are scored; at order 5 the even/odd
    split makes MOST eval 5-grams genuinely unseen, so the score mass
    flows through the full four-λ interpolation chain — the real
    sparsity regime of an order-5 crawl filter.  Same round-6-log /
    DECIMAL-sum / floor-mean discipline as the whole smoothing
    family."""
    from ..operators.text import lm_5gram_kneser_ney

    docs = load_table(spark, sf_dir, "documents")
    return lm_5gram_kneser_ney(
        docs, train_docs=docs.filter(F.col("doc_id") % 2 == 0)
    )


QUERIES = {
    "text_watermark_zscore": q_text_watermark_zscore,
    "text_stats": q_text_stats,
    "text_c4_line_filter": q_text_c4_line_filter,
    "corpus_zipf_fit": q_corpus_zipf_fit,
    "text_trigram_backoff": q_text_trigram_backoff,
    "text_bigram_interpolated": q_text_bigram_interpolated,
    "text_bigram_kneser_ney": q_text_bigram_kneser_ney,
    "text_bigram_modified_kneser_ney": q_text_bigram_modified_kneser_ney,
    "text_trigram_kneser_ney": q_text_trigram_kneser_ney,
    "text_5gram_kneser_ney": q_text_5gram_kneser_ney,
    "text_trigram_witten_bell": q_text_trigram_witten_bell,
    "text_trigram_interpolated": q_text_trigram_interpolated,
    "text_readability": q_text_readability,
    "text_bigram_witten_bell": q_text_bigram_witten_bell,
    "text_lang_id": q_lang_id,
    "text_langid_trained": q_text_langid_trained,
    "text_quality_score": q_quality_score,
    "text_token_count": q_token_count,
    "text_fingerprint": q_fingerprint,
    "text_repetition": q_repetition,
    "text_boilerplate": q_text_boilerplate,
    "text_main_content": q_text_main_content,
    "text_main_content_pipeline": q_text_main_content_pipeline,
    "text_pii_scrub": q_pii_scrub,
    "text_tfidf_top_terms": q_tfidf,
    "text_bm25_topk": q_text_bm25_topk,
    "text_bigram_backoff": q_text_bigram_backoff,
    "text_commonness": q_text_commonness,
    "text_html_extract": q_text_html_extract,
    "text_url_extract": q_text_url_extract,
    "text_lm_perplexity": q_lm_perplexity,
    "corpus_ccnet_buckets": q_corpus_ccnet_buckets,
    "text_normalize_unicode": q_text_normalize_unicode,
    "corpus_vocab_topk": q_vocab,
    "corpus_vocab_coverage": q_corpus_vocab_coverage,
}

ORACLES = {
    # pair hash replayed ('0x'-md5 prefix mod 100 < 25), one shared z dag
    "text_watermark_zscore": """
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS tk
            FROM documents
        ),
        p AS (
            SELECT doc_id,
                   list_transform(range(1, len(tk)),
                       i -> tk[CAST(i AS INT)] || '|'
                            || tk[CAST(i + 1 AS INT)]) AS pairs
            FROM t WHERE len(tk) >= 2
        ),
        c AS (
            SELECT doc_id,
                   CAST(len(pairs) AS BIGINT) AS n_scored,
                   CAST(len(list_filter(pairs, s ->
                       ('0x' || substring(md5(s), 1, 4))::BIGINT % 100 < 25))
                       AS BIGINT) AS n_green
            FROM p
        )
        SELECT doc_id, n_scored, n_green,
               FLOOR(((n_green - 25 * n_scored / 100.0)
                      / sqrt(n_scored * 0.25 * (1.0 - 0.25)))
                     * 1e6 + 0.5) / 1e6 AS z_score,
               n_green * 100 > 25 * n_scored AS above_expected
        FROM c
    """,
    "corpus_zipf_fit": """
        WITH toks AS (
            SELECT unnest(list_filter(string_split(text, ' '),
                                      x -> x <> '')) AS token
            FROM documents
        ),
        freqs AS (SELECT token, COUNT(*) AS freq FROM toks GROUP BY token),
        top AS (SELECT token, freq,
                       ROW_NUMBER() OVER (ORDER BY freq DESC, token ASC)
                         AS rank
                FROM freqs
                ORDER BY freq DESC, token ASC LIMIT 100),
        xy AS (SELECT FLOOR(ln(rank) * 1e6 + 0.5) / 1e6 AS x,
                      FLOOR(ln(freq) * 1e6 + 0.5) / 1e6 AS y
               FROM top),
        sums AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(SUM(CAST(x AS DECIMAL(20,6))) AS DOUBLE) AS sx,
                   CAST(SUM(CAST(y AS DECIMAL(20,6))) AS DOUBLE) AS sy,
                   CAST(SUM(CAST(FLOOR(x * y * 1e6 + 0.5) / 1e6
                                 AS DECIMAL(20,6))) AS DOUBLE) AS sxy,
                   CAST(SUM(CAST(FLOOR(x * x * 1e6 + 0.5) / 1e6
                                 AS DECIMAL(20,6))) AS DOUBLE) AS sxx,
                   CAST(SUM(CAST(FLOOR(y * y * 1e6 + 0.5) / 1e6
                                 AS DECIMAL(20,6))) AS DOUBLE) AS syy
            FROM xy
        )
        SELECT CAST(n AS BIGINT) AS n_points,
               FLOOR((n * sxy - sx * sy) / (n * sxx - sx * sx) * 1e6 + 0.5)
                 / 1e6 AS slope,
               FLOOR((sy - (FLOOR((n * sxy - sx * sy) / (n * sxx - sx * sx)
                                  * 1e6 + 0.5) / 1e6) * sx) / n * 1e6 + 0.5)
                 / 1e6 AS intercept,
               CASE WHEN (n * syy - sy * sy) > 0
                    THEN FLOOR((n * sxy - sx * sy) * (n * sxy - sx * sy)
                               / ((n * sxx - sx * sx) * (n * syy - sy * sy))
                               * 1e6 + 0.5) / 1e6
               END AS r2
        FROM sums
    """,
    "text_c4_line_filter": """
        WITH pg AS (
            SELECT doc_id,
                   list_value(
                       trim(text),
                       'tiny line.',
                       CASE WHEN doc_id % 19 = 0 THEN 'four words no punct'
                            ELSE 'this line has exactly five words.' END,
                       'no terminal punctuation so this line drops',
                       'unique line for doc ' || CAST(doc_id AS VARCHAR)
                         || ' with terminal punctuation.',
                       CASE WHEN doc_id % 17 = 0
                            THEN 'this page contains lorem ipsum text now.'
                            ELSE 'an ordinary closing sentence appears right here.' END,
                       CASE WHEN doc_id % 23 = 0
                            THEN 'code token { appears in this line.'
                            WHEN doc_id % 19 = 0 THEN 'nope.'
                            ELSE 'final line is good too.' END) AS lines
            FROM documents
        ),
        k AS (
            SELECT doc_id, lines,
                   list_filter(lines, line ->
                       regexp_matches(line, '[.!?"]$')
                       AND len(regexp_split_to_array(trim(line), ' +')) >= 5)
                     AS kept,
                   (doc_id % 17 = 0) AS has_lorem,
                   (doc_id % 23 = 0) AS has_brace
            FROM pg
        )
        SELECT doc_id,
               CAST(len(lines) AS BIGINT) AS n_lines,
               CAST(len(kept) AS BIGINT) AS n_kept_lines,
               NOT (has_lorem OR has_brace OR len(kept) < 3) AS page_kept,
               CASE WHEN has_lorem THEN 'lorem_ipsum'
                    WHEN has_brace THEN 'brace'
                    WHEN len(kept) < 3 THEN 'too_few_lines'
                    ELSE '' END AS drop_reason,
               CASE WHEN NOT (has_lorem OR has_brace OR len(kept) < 3)
                    THEN array_to_string(kept, chr(10))
                    ELSE '' END AS cleaned_text
        FROM k
    """,
    "text_bigram_kneser_ney": """
        WITH w AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS wd
            FROM documents
        ),
        pairs AS (
            SELECT doc_id, wd[CAST(i.i AS INT)] AS w1,
                   wd[CAST(i.i + 1 AS INT)] AS w2
            FROM w CROSS JOIN LATERAL (
                SELECT unnest(range(1, len(wd)))) i(i)
        ),
        bi AS (SELECT w1, w2, COUNT(*) AS bcnt
               FROM pairs WHERE doc_id % 2 = 0 GROUP BY w1, w2),
        lt AS (SELECT w1, SUM(bcnt) AS n_w1, COUNT(*) AS n1p_l
               FROM bi GROUP BY w1),
        rt AS (SELECT w2, COUNT(*) AS n1p_r FROM bi GROUP BY w2),
        ty AS (SELECT COUNT(*) AS n_types FROM bi),
        scored AS (
            SELECT p.doc_id,
                   (l.n_w1 IS NULL OR r.n1p_r IS NULL) AS oov,
                   (b.bcnt IS NULL
                    AND NOT (l.n_w1 IS NULL OR r.n1p_r IS NULL)) AS unseen,
                   CASE WHEN NOT (l.n_w1 IS NULL OR r.n1p_r IS NULL) THEN
                       -- the SAME fully-parenthesized double dag as the
                       -- engine (op order is bit-significant)
                       CAST(ROUND(ln(
                           (GREATEST(CAST(COALESCE(b.bcnt, 0) AS DOUBLE)
                                     - CAST(0.75 AS DOUBLE),
                                     CAST(0 AS DOUBLE))
                            / CAST(l.n_w1 AS DOUBLE))
                           + ((CAST(0.75 AS DOUBLE)
                               * CAST(l.n1p_l AS DOUBLE)
                               / CAST(l.n_w1 AS DOUBLE))
                              * (CAST(r.n1p_r AS DOUBLE)
                                 / CAST(ty.n_types AS DOUBLE)))
                       ), 6) AS DECIMAL(20,6)) END AS s
            FROM pairs p
            LEFT JOIN bi b ON b.w1 = p.w1 AND b.w2 = p.w2
            LEFT JOIN lt l ON l.w1 = p.w1
            LEFT JOIN rt r ON r.w2 = p.w2
            CROSS JOIN ty
        ),
        per AS (
            SELECT doc_id, COUNT(*) AS n_transitions,
                   SUM(CASE WHEN oov THEN 1 ELSE 0 END) AS n_oov,
                   SUM(CASE WHEN unseen THEN 1 ELSE 0 END) AS n_unseen,
                   FLOOR(CAST(SUM(s) AS DOUBLE) / COUNT(s) * 1e6 + 0.5)
                       / 1e6 AS avg_logscore
            FROM scored GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(p.n_transitions, 0) AS BIGINT) AS n_transitions,
               CAST(COALESCE(p.n_oov, 0) AS BIGINT) AS n_oov,
               CAST(COALESCE(p.n_unseen, 0) AS BIGINT) AS n_unseen,
               p.avg_logscore,
               FLOOR(exp(-p.avg_logscore) * 1e4 + 0.5) / 1e4 AS ppl
        FROM documents d LEFT JOIN per p USING (doc_id)
    """,
    "text_bigram_witten_bell": """
        WITH w AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS wd
            FROM documents
        ),
        pairs AS (
            SELECT doc_id, wd[CAST(i.i AS INT)] AS w1,
                   wd[CAST(i.i + 1 AS INT)] AS w2
            FROM w CROSS JOIN LATERAL (
                SELECT unnest(range(1, len(wd)))) i(i)
        ),
        bi AS (SELECT w1, w2, COUNT(*) AS bcnt
               FROM pairs WHERE doc_id % 2 = 0 GROUP BY w1, w2),
        lt AS (SELECT w1, SUM(bcnt) AS n_w1, COUNT(*) AS n1p_l
               FROM bi GROUP BY w1),
        uni AS (SELECT token AS w2, COUNT(*) AS c2 FROM (
                    SELECT unnest(wd) AS token FROM w WHERE doc_id % 2 = 0
                ) GROUP BY token),
        tot AS (SELECT SUM(c2) AS t FROM uni),
        scored AS (
            SELECT p.doc_id,
                   (l.n_w1 IS NULL OR u.c2 IS NULL) AS oov,
                   (b.bcnt IS NULL
                    AND NOT (l.n_w1 IS NULL OR u.c2 IS NULL)) AS unseen,
                   CASE WHEN NOT (l.n_w1 IS NULL OR u.c2 IS NULL) THEN
                       -- the SAME fully-parenthesized double dag as the
                       -- engine (op order is bit-significant)
                       CAST(ROUND(ln(
                           ((CAST(COALESCE(b.bcnt, 0) AS DOUBLE)
                             + (CAST(l.n1p_l AS DOUBLE)
                                * (CAST(u.c2 AS DOUBLE)
                                   / CAST(tot.t AS DOUBLE))))
                            / (CAST(l.n_w1 AS DOUBLE)
                               + CAST(l.n1p_l AS DOUBLE)))
                       ), 6) AS DECIMAL(20,6)) END AS s
            FROM pairs p
            LEFT JOIN bi b ON b.w1 = p.w1 AND b.w2 = p.w2
            LEFT JOIN lt l ON l.w1 = p.w1
            LEFT JOIN uni u ON u.w2 = p.w2
            CROSS JOIN tot
        ),
        per AS (
            SELECT doc_id, COUNT(*) AS n_transitions,
                   SUM(CASE WHEN oov THEN 1 ELSE 0 END) AS n_oov,
                   SUM(CASE WHEN unseen THEN 1 ELSE 0 END) AS n_unseen,
                   FLOOR(CAST(SUM(s) AS DOUBLE) / COUNT(s) * 1e6 + 0.5)
                       / 1e6 AS avg_logscore
            FROM scored GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(p.n_transitions, 0) AS BIGINT) AS n_transitions,
               CAST(COALESCE(p.n_oov, 0) AS BIGINT) AS n_oov,
               CAST(COALESCE(p.n_unseen, 0) AS BIGINT) AS n_unseen,
               p.avg_logscore,
               FLOOR(exp(-p.avg_logscore) * 1e4 + 0.5) / 1e4 AS ppl
        FROM documents d LEFT JOIN per p USING (doc_id)
    """,
    # trigram JM: λ·ML mixture over trigram/pair/unigram/uniform, the
    # even-doc train split; a NULL context contributes zero, the 1/V
    # backstop keeps every score finite
    "text_trigram_interpolated": """
        WITH w AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS wd
            FROM documents
        ),
        tr AS (
            SELECT doc_id, wd[CAST(i.i AS INT)] AS w1,
                   wd[CAST(i.i + 1 AS INT)] AS w2,
                   wd[CAST(i.i + 2 AS INT)] AS w3
            FROM w CROSS JOIN LATERAL (
                SELECT unnest(range(1, len(wd) - 1))) i(i)
        ),
        pr AS (
            SELECT doc_id, wd[CAST(i.i AS INT)] AS w2,
                   wd[CAST(i.i + 1 AS INT)] AS w3
            FROM w CROSS JOIN LATERAL (
                SELECT unnest(range(1, len(wd)))) i(i)
        ),
        tri AS (SELECT w1, w2, w3, COUNT(*) AS tcnt
                FROM tr WHERE doc_id % 2 = 0 GROUP BY w1, w2, w3),
        c12 AS (SELECT w1, w2, SUM(tcnt) AS n12 FROM tri GROUP BY w1, w2),
        bi AS (SELECT w2, w3, COUNT(*) AS bcnt
               FROM pr WHERE doc_id % 2 = 0 GROUP BY w2, w3),
        cx2 AS (SELECT w2, SUM(bcnt) AS n2 FROM bi GROUP BY w2),
        uni AS (
            SELECT tok AS w3, COUNT(*) AS c3
            FROM (SELECT unnest(wd) AS tok FROM w WHERE doc_id % 2 = 0)
            GROUP BY tok
        ),
        tot AS (SELECT SUM(c3) AS total, COUNT(*) AS vocab FROM uni),
        scored AS (
            SELECT p.doc_id, (t.tcnt IS NULL) AS unseen,
                   CAST(ROUND(ln(
                       CASE WHEN c12.n12 IS NOT NULL THEN
                           0.5 * CAST(COALESCE(t.tcnt, 0) AS DOUBLE)
                               / CAST(c12.n12 AS DOUBLE) ELSE 0 END
                       + CASE WHEN cx2.n2 IS NOT NULL THEN
                           0.3 * CAST(COALESCE(b.bcnt, 0) AS DOUBLE)
                               / CAST(cx2.n2 AS DOUBLE) ELSE 0 END
                       + 0.15 * CAST(COALESCE(u.c3, 0) AS DOUBLE)
                           / CAST(tot.total AS DOUBLE)
                       + 0.05 / CAST(tot.vocab AS DOUBLE)
                   ), 6) AS DECIMAL(20,6)) AS s
            FROM tr p
            LEFT JOIN tri t ON t.w1 = p.w1 AND t.w2 = p.w2 AND t.w3 = p.w3
            LEFT JOIN c12 ON c12.w1 = p.w1 AND c12.w2 = p.w2
            LEFT JOIN bi b ON b.w2 = p.w2 AND b.w3 = p.w3
            LEFT JOIN cx2 ON cx2.w2 = p.w2
            LEFT JOIN uni u ON u.w3 = p.w3
            CROSS JOIN tot
        ),
        per AS (
            SELECT doc_id, COUNT(*) AS n_transitions,
                   SUM(CASE WHEN unseen THEN 1 ELSE 0 END) AS n_unseen,
                   FLOOR(CAST(SUM(s) AS DOUBLE) / COUNT(*) * 1e6 + 0.5)
                       / 1e6 AS avg_logscore
            FROM scored GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(p.n_transitions, 0) AS BIGINT) AS n_transitions,
               CAST(COALESCE(p.n_unseen, 0) AS BIGINT) AS n_unseen,
               p.avg_logscore,
               FLOOR(exp(-p.avg_logscore) * 1e4 + 0.5) / 1e4 AS ppl
        FROM documents d LEFT JOIN per p USING (doc_id)
    """,
    "text_trigram_witten_bell": """
        WITH w AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS wd
            FROM documents
        ),
        tr AS (
            SELECT doc_id, wd[CAST(i.i AS INT)] AS w1,
                   wd[CAST(i.i + 1 AS INT)] AS w2,
                   wd[CAST(i.i + 2 AS INT)] AS w3
            FROM w CROSS JOIN LATERAL (
                SELECT unnest(range(1, len(wd) - 1))) i(i)
        ),
        pr AS (
            SELECT doc_id, wd[CAST(i.i AS INT)] AS w2,
                   wd[CAST(i.i + 1 AS INT)] AS w3
            FROM w CROSS JOIN LATERAL (
                SELECT unnest(range(1, len(wd)))) i(i)
        ),
        tri AS (SELECT w1, w2, w3, COUNT(*) AS tcnt
                FROM tr WHERE doc_id % 2 = 0 GROUP BY w1, w2, w3),
        c12 AS (SELECT w1, w2, SUM(tcnt) AS n_12, COUNT(*) AS t_12
                FROM tri GROUP BY w1, w2),
        bi AS (SELECT w2, w3, COUNT(*) AS bcnt
               FROM pr WHERE doc_id % 2 = 0 GROUP BY w2, w3),
        cx2 AS (SELECT w2, SUM(bcnt) AS n_2, COUNT(*) AS t_2
                FROM bi GROUP BY w2),
        uni AS (
            SELECT tok AS w3, COUNT(*) AS c3
            FROM (SELECT unnest(wd) AS tok FROM w WHERE doc_id % 2 = 0)
            GROUP BY tok
        ),
        tot AS (SELECT SUM(c3) AS total FROM uni),
        scored AS (
            SELECT p.doc_id,
                   (c12.n_12 IS NULL OR u.c3 IS NULL) AS oov,
                   (t.tcnt IS NULL
                    AND NOT (c12.n_12 IS NULL OR u.c3 IS NULL)) AS unseen,
                   CASE WHEN NOT (c12.n_12 IS NULL OR u.c3 IS NULL) THEN
                       CAST(ROUND(ln(
                           ((CAST(COALESCE(t.tcnt, 0) AS DOUBLE)
                             + (CAST(c12.t_12 AS DOUBLE)
                                * ((CAST(COALESCE(b.bcnt, 0) AS DOUBLE)
                                    + (CAST(cx2.t_2 AS DOUBLE)
                                       * (CAST(u.c3 AS DOUBLE)
                                          / CAST(tot.total AS DOUBLE))))
                                   / (CAST(cx2.n_2 AS DOUBLE)
                                      + CAST(cx2.t_2 AS DOUBLE)))))
                            / (CAST(c12.n_12 AS DOUBLE)
                               + CAST(c12.t_12 AS DOUBLE)))
                       ), 6) AS DECIMAL(20,6)) END AS s
            FROM tr p
            LEFT JOIN tri t ON t.w1 = p.w1 AND t.w2 = p.w2 AND t.w3 = p.w3
            LEFT JOIN c12 ON c12.w1 = p.w1 AND c12.w2 = p.w2
            LEFT JOIN bi b ON b.w2 = p.w2 AND b.w3 = p.w3
            LEFT JOIN cx2 ON cx2.w2 = p.w2
            LEFT JOIN uni u ON u.w3 = p.w3
            CROSS JOIN tot
        ),
        per AS (
            SELECT doc_id, COUNT(*) AS n_transitions,
                   SUM(CASE WHEN oov THEN 1 ELSE 0 END) AS n_oov,
                   SUM(CASE WHEN unseen THEN 1 ELSE 0 END) AS n_unseen,
                   FLOOR(CAST(SUM(s) AS DOUBLE) / COUNT(s) * 1e6 + 0.5)
                       / 1e6 AS avg_logscore
            FROM scored GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(p.n_transitions, 0) AS BIGINT) AS n_transitions,
               CAST(COALESCE(p.n_oov, 0) AS BIGINT) AS n_oov,
               CAST(COALESCE(p.n_unseen, 0) AS BIGINT) AS n_unseen,
               p.avg_logscore,
               FLOOR(exp(-p.avg_logscore) * 1e4 + 0.5) / 1e4 AS ppl
        FROM documents d LEFT JOIN per p USING (doc_id)
    """,
    "text_trigram_kneser_ney": """
        WITH w AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS wd
            FROM documents
        ),
        tr AS (
            SELECT doc_id, wd[CAST(i.i AS INT)] AS w1,
                   wd[CAST(i.i + 1 AS INT)] AS w2,
                   wd[CAST(i.i + 2 AS INT)] AS w3
            FROM w CROSS JOIN LATERAL (
                SELECT unnest(range(1, len(wd) - 1))) i(i)
        ),
        tri AS (SELECT w1, w2, w3, COUNT(*) AS tcnt
                FROM tr WHERE doc_id % 2 = 0 GROUP BY w1, w2, w3),
        c2 AS (SELECT w1, w2, SUM(tcnt) AS n_ctx,
                      COUNT(*) AS n1p_ctx
               FROM tri GROUP BY w1, w2),
        co AS (SELECT w2, w3, COUNT(*) AS ccnt FROM tri GROUP BY w2, w3),
        m AS (SELECT w2, SUM(ccnt) AS n_midctx, COUNT(*) AS n1p_mid
              FROM co GROUP BY w2),
        lo AS (SELECT w3, COUNT(*) AS n1p_low FROM co GROUP BY w3),
        ty AS (SELECT COUNT(*) AS n_types2 FROM co),
        scored AS (
            SELECT p.doc_id,
                   (c2.n_ctx IS NULL OR lo.n1p_low IS NULL) AS oov,
                   (t.tcnt IS NULL
                    AND NOT (c2.n_ctx IS NULL OR lo.n1p_low IS NULL))
                       AS unseen,
                   CASE WHEN NOT (c2.n_ctx IS NULL
                                  OR lo.n1p_low IS NULL) THEN
                       CAST(ROUND(ln(
                           ((GREATEST(CAST(COALESCE(t.tcnt, 0) AS DOUBLE)
                                      - CAST(0.75 AS DOUBLE),
                                      CAST(0 AS DOUBLE))
                             / CAST(c2.n_ctx AS DOUBLE))
                            + (((CAST(0.75 AS DOUBLE)
                                 * CAST(c2.n1p_ctx AS DOUBLE))
                                / CAST(c2.n_ctx AS DOUBLE))
                               * ((GREATEST(
                                       CAST(COALESCE(co.ccnt, 0) AS DOUBLE)
                                       - CAST(0.75 AS DOUBLE),
                                       CAST(0 AS DOUBLE))
                                   / CAST(m.n_midctx AS DOUBLE))
                                  + (((CAST(0.75 AS DOUBLE)
                                       * CAST(m.n1p_mid AS DOUBLE))
                                      / CAST(m.n_midctx AS DOUBLE))
                                     * (CAST(lo.n1p_low AS DOUBLE)
                                        / CAST(ty.n_types2 AS DOUBLE))))))
                       ), 6) AS DECIMAL(20,6)) END AS s
            FROM tr p
            LEFT JOIN tri t ON t.w1 = p.w1 AND t.w2 = p.w2 AND t.w3 = p.w3
            LEFT JOIN c2 ON c2.w1 = p.w1 AND c2.w2 = p.w2
            LEFT JOIN co ON co.w2 = p.w2 AND co.w3 = p.w3
            LEFT JOIN m ON m.w2 = p.w2
            LEFT JOIN lo ON lo.w3 = p.w3
            CROSS JOIN ty
        ),
        per AS (
            SELECT doc_id, COUNT(*) AS n_transitions,
                   SUM(CASE WHEN oov THEN 1 ELSE 0 END) AS n_oov,
                   SUM(CASE WHEN unseen THEN 1 ELSE 0 END) AS n_unseen,
                   FLOOR(CAST(SUM(s) AS DOUBLE) / COUNT(s) * 1e6 + 0.5)
                       / 1e6 AS avg_logscore
            FROM scored GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(p.n_transitions, 0) AS BIGINT) AS n_transitions,
               CAST(COALESCE(p.n_oov, 0) AS BIGINT) AS n_oov,
               CAST(COALESCE(p.n_unseen, 0) AS BIGINT) AS n_unseen,
               p.avg_logscore,
               FLOOR(exp(-p.avg_logscore) * 1e4 + 0.5) / 1e4 AS ppl
        FROM documents d LEFT JOIN per p USING (doc_id)
    """,
    "text_bigram_modified_kneser_ney": """
        WITH w AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS wd
            FROM documents
        ),
        pairs AS (
            SELECT doc_id, wd[CAST(i.i AS INT)] AS w1,
                   wd[CAST(i.i + 1 AS INT)] AS w2
            FROM w CROSS JOIN LATERAL (
                SELECT unnest(range(1, len(wd)))) i(i)
        ),
        bi AS (SELECT w1, w2, COUNT(*) AS bcnt
               FROM pairs WHERE doc_id % 2 = 0 GROUP BY w1, w2),
        lt AS (SELECT w1, SUM(bcnt) AS n_w1,
                      SUM(CASE WHEN bcnt = 1 THEN 1 ELSE 0 END) AS nd1,
                      SUM(CASE WHEN bcnt = 2 THEN 1 ELSE 0 END) AS nd2,
                      SUM(CASE WHEN bcnt >= 3 THEN 1 ELSE 0 END) AS nd3p
               FROM bi GROUP BY w1),
        rt AS (SELECT w2, COUNT(*) AS n1p_r FROM bi GROUP BY w2),
        ty AS (SELECT COUNT(*) AS n_types FROM bi),
        cc AS (SELECT SUM(CASE WHEN bcnt = 1 THEN 1 ELSE 0 END) AS n1,
                      SUM(CASE WHEN bcnt = 2 THEN 1 ELSE 0 END) AS n2,
                      SUM(CASE WHEN bcnt = 3 THEN 1 ELSE 0 END) AS n3,
                      SUM(CASE WHEN bcnt = 4 THEN 1 ELSE 0 END) AS n4
               FROM bi),
        yc AS (SELECT n1, n2, n3, n4,
                      (CAST(n1 AS DOUBLE)
                       / (CAST(n1 AS DOUBLE)
                          + (CAST(2 AS DOUBLE) * CAST(n2 AS DOUBLE)))) AS y
               FROM cc),
        -- the SAME fully-parenthesized discount dags as the engine,
        -- incl. the SRILM-style per-class fallback to Y when a
        -- class's count-of-count is zero
        dc0 AS (SELECT
                   (CASE WHEN n1 > 0 THEN
                    (CAST(1 AS DOUBLE) - ((CAST(2 AS DOUBLE) * y)
                     * (CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE))))
                    ELSE y END) AS d1,
                   (CASE WHEN n2 > 0 THEN
                    (CAST(2 AS DOUBLE) - ((CAST(3 AS DOUBLE) * y)
                     * (CAST(n3 AS DOUBLE) / CAST(n2 AS DOUBLE))))
                    ELSE y END) AS d2,
                   (CASE WHEN n3 > 0 THEN
                    (CAST(3 AS DOUBLE) - ((CAST(4 AS DOUBLE) * y)
                     * (CAST(n4 AS DOUBLE) / CAST(n3 AS DOUBLE))))
                    ELSE y END) AS d3,
                   n1, n2,
                   (SELECT SUM(CASE WHEN bcnt >= 3 THEN 1 ELSE 0 END)
                    FROM bi) AS n3p
               FROM yc),
        -- regime flag + graceful D=0.75 fallback, mirroring the
        -- engine's r15 degradation (see lm_bigram_modified_kneser_ney)
        dc AS (SELECT
                   (CASE WHEN ok THEN d1
                    ELSE CAST(0.75 AS DOUBLE) END) AS d1,
                   (CASE WHEN ok THEN d2
                    ELSE CAST(0.75 AS DOUBLE) END) AS d2,
                   (CASE WHEN ok THEN d3
                    ELSE CAST(0.75 AS DOUBLE) END) AS d3,
                   ok
               FROM (SELECT d1, d2, d3,
                            COALESCE(((n1 + (2 * n2)) > 0)
                             AND ((n1 = 0) OR (d1 > CAST(0 AS DOUBLE)))
                             AND ((n2 = 0) OR (d2 > CAST(0 AS DOUBLE)))
                             AND ((n3p = 0)
                                  OR (d3 > CAST(0 AS DOUBLE))), false
                        ) AS ok
                     FROM dc0)),
        scored AS (
            SELECT p.doc_id, dc.ok,
                   (l.n_w1 IS NULL OR r.n1p_r IS NULL) AS oov,
                   (b.bcnt IS NULL
                    AND NOT (l.n_w1 IS NULL OR r.n1p_r IS NULL)) AS unseen,
                   CASE WHEN NOT (l.n_w1 IS NULL OR r.n1p_r IS NULL) THEN
                       CAST(ROUND(ln(
                           ((GREATEST(CAST(COALESCE(b.bcnt, 0) AS DOUBLE)
                                      - (CASE
                                         WHEN COALESCE(b.bcnt, 0) >= 3
                                             THEN dc.d3
                                         WHEN COALESCE(b.bcnt, 0) = 2
                                             THEN dc.d2
                                         WHEN COALESCE(b.bcnt, 0) = 1
                                             THEN dc.d1
                                         ELSE CAST(0 AS DOUBLE) END),
                                      CAST(0 AS DOUBLE))
                             / CAST(l.n_w1 AS DOUBLE))
                            + (((((dc.d1 * CAST(l.nd1 AS DOUBLE))
                                  + (dc.d2 * CAST(l.nd2 AS DOUBLE)))
                                 + (dc.d3 * CAST(l.nd3p AS DOUBLE)))
                                / CAST(l.n_w1 AS DOUBLE))
                               * (CAST(r.n1p_r AS DOUBLE)
                                  / CAST(ty.n_types AS DOUBLE))))
                       ), 6) AS DECIMAL(20,6)) END AS s
            FROM pairs p
            LEFT JOIN bi b ON b.w1 = p.w1 AND b.w2 = p.w2
            LEFT JOIN lt l ON l.w1 = p.w1
            LEFT JOIN rt r ON r.w2 = p.w2
            CROSS JOIN ty
            CROSS JOIN dc
        ),
        per AS (
            SELECT doc_id, COUNT(*) AS n_transitions,
                   SUM(CASE WHEN oov THEN 1 ELSE 0 END) AS n_oov,
                   SUM(CASE WHEN unseen THEN 1 ELSE 0 END) AS n_unseen,
                   FLOOR(CAST(SUM(s) AS DOUBLE) / COUNT(s) * 1e6 + 0.5)
                       / 1e6 AS avg_logscore,
                   MIN(ok) AS mkn_regime_ok
            FROM scored GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(p.n_transitions, 0) AS BIGINT) AS n_transitions,
               CAST(COALESCE(p.n_oov, 0) AS BIGINT) AS n_oov,
               CAST(COALESCE(p.n_unseen, 0) AS BIGINT) AS n_unseen,
               p.avg_logscore,
               FLOOR(exp(-p.avg_logscore) * 1e4 + 0.5) / 1e4 AS ppl,
               -- r15: computed regime flag with graceful D=0.75
               -- fallback, mirroring the engine (was hardcoded true
               -- against an in-plan assert in r14)
               COALESCE(p.mkn_regime_ok, true) AS mkn_regime_ok
        FROM documents d LEFT JOIN per p USING (doc_id)
    """,
    "text_readability": """
        WITH w AS (
            SELECT doc_id, text,
                   list_filter(string_split(lower(text), ' '),
                               x -> x <> '') AS wd
            FROM documents
        ),
        base AS (
            SELECT doc_id,
                   CAST(len(wd) AS BIGINT) AS n_words,
                   CAST(GREATEST(1, len(regexp_extract_all(text, '[.!?]+')))
                        AS BIGINT) AS n_sentences,
                   CAST(COALESCE(list_sum(list_transform(wd,
                        x -> GREATEST(1,
                             len(regexp_extract_all(x, '[aeiouy]+'))))), 0)
                        AS BIGINT) AS n_syllables
            FROM w
        )
        SELECT doc_id, n_words, n_sentences, n_syllables,
               CASE WHEN n_words > 0 THEN
                 FLOOR(((CAST(206.835 AS DOUBLE)
                   - (CAST(1.015 AS DOUBLE)
                      * (CAST(n_words AS DOUBLE)
                         / CAST(n_sentences AS DOUBLE))))
                   - (CAST(84.6 AS DOUBLE)
                      * (CAST(n_syllables AS DOUBLE)
                         / CAST(n_words AS DOUBLE))))
                  * 1e6 + 0.5) / 1e6 END AS flesch_reading_ease,
               CASE WHEN n_words > 0 THEN
                 FLOOR((((CAST(0.39 AS DOUBLE)
                   * (CAST(n_words AS DOUBLE)
                      / CAST(n_sentences AS DOUBLE)))
                   + (CAST(11.8 AS DOUBLE)
                      * (CAST(n_syllables AS DOUBLE)
                         / CAST(n_words AS DOUBLE))))
                   - CAST(15.59 AS DOUBLE))
                  * 1e6 + 0.5) / 1e6 END AS fk_grade
        FROM base
    """,
    "text_bigram_interpolated": """
        WITH w AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS wd
            FROM documents
        ),
        pairs AS (
            SELECT doc_id, wd[CAST(i.i AS INT)] AS w1,
                   wd[CAST(i.i + 1 AS INT)] AS w2
            FROM w CROSS JOIN LATERAL (
                SELECT unnest(range(1, len(wd)))) i(i)
        ),
        toks AS (SELECT doc_id, unnest(wd) AS token FROM w),
        uni AS (SELECT token, COUNT(*) AS ucnt FROM toks GROUP BY token),
        tot AS (SELECT SUM(ucnt) AS t FROM uni),
        bi AS (SELECT w1, w2, COUNT(*) AS bcnt FROM pairs GROUP BY w1, w2),
        scored AS (
            SELECT p.doc_id,
                   -- (1 − 0.7) computed in DOUBLE, matching the
                   -- engine's Python-side 1.0 − lam (≠ the literal 0.3)
                   CAST(ROUND(ln(
                       CAST(0.7 AS DOUBLE) * COALESCE(b.bcnt, 0) / u1.ucnt
                       + (CAST(1 AS DOUBLE) - CAST(0.7 AS DOUBLE))
                         * u2.ucnt / tot.t), 6)
                        AS DECIMAL(20,6)) AS s
            FROM pairs p
            LEFT JOIN bi b ON b.w1 = p.w1 AND b.w2 = p.w2
            JOIN uni u1 ON u1.token = p.w1
            JOIN uni u2 ON u2.token = p.w2
            CROSS JOIN tot
        ),
        per AS (
            SELECT doc_id, COUNT(*) AS n_transitions,
                   FLOOR(CAST(SUM(s) AS DOUBLE) / COUNT(*) * 1e6 + 0.5)
                       / 1e6 AS avg_logscore
            FROM scored GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(p.n_transitions, 0) AS BIGINT) AS n_transitions,
               p.avg_logscore,
               FLOOR(exp(-p.avg_logscore) * 1e4 + 0.5) / 1e4 AS ppl
        FROM documents d LEFT JOIN per p USING (doc_id)
    """,
    "text_trigram_backoff": """
        WITH w AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS wd
            FROM documents
        ),
        tris AS (
            SELECT doc_id, wd[CAST(i.i AS INT)] AS w1,
                   wd[CAST(i.i + 1 AS INT)] AS w2,
                   wd[CAST(i.i + 2 AS INT)] AS w3
            FROM w CROSS JOIN LATERAL (
                SELECT unnest(range(1, len(wd) - 1))) i(i)
        ),
        pairs AS (
            SELECT doc_id, wd[CAST(i.i AS INT)] AS w1,
                   wd[CAST(i.i + 1 AS INT)] AS w2
            FROM w CROSS JOIN LATERAL (
                SELECT unnest(range(1, len(wd)))) i(i)
        ),
        toks AS (SELECT doc_id, unnest(wd) AS token FROM w),
        uni AS (SELECT token, COUNT(*) AS ucnt FROM toks GROUP BY token),
        tot AS (SELECT SUM(ucnt) AS t FROM uni),
        bi AS (SELECT w1, w2, COUNT(*) AS bcnt FROM pairs GROUP BY w1, w2),
        tri AS (SELECT w1, w2, w3, COUNT(*) AS tcnt
                FROM tris GROUP BY w1, w2, w3),
        scored AS (
            SELECT t.doc_id,
                   CAST(ROUND(CASE
                       WHEN tr.tcnt IS NOT NULL
                       THEN ln(tr.tcnt * 1.0 / b12.bcnt)
                       WHEN b23.bcnt IS NOT NULL
                       THEN ln(CAST(0.4 AS DOUBLE) * b23.bcnt / u2.ucnt)
                       ELSE ln(CAST(0.4 AS DOUBLE) * CAST(0.4 AS DOUBLE)
                               * u3.ucnt / tot.t) END, 6)
                        AS DECIMAL(20,6)) AS s
            FROM tris t
            LEFT JOIN tri tr
              ON tr.w1 = t.w1 AND tr.w2 = t.w2 AND tr.w3 = t.w3
            LEFT JOIN bi b12 ON b12.w1 = t.w1 AND b12.w2 = t.w2
            LEFT JOIN bi b23 ON b23.w1 = t.w2 AND b23.w2 = t.w3
            JOIN uni u2 ON u2.token = t.w2
            JOIN uni u3 ON u3.token = t.w3
            CROSS JOIN tot
        ),
        per AS (
            SELECT doc_id, COUNT(*) AS n_transitions,
                   FLOOR(CAST(SUM(s) AS DOUBLE) / COUNT(*) * 1e6 + 0.5)
                       / 1e6 AS avg_logscore
            FROM scored GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(p.n_transitions, 0) AS BIGINT) AS n_transitions,
               p.avg_logscore,
               FLOOR(exp(-p.avg_logscore) * 1e4 + 0.5) / 1e4 AS ppl
        FROM documents d LEFT JOIN per p USING (doc_id)
    """,
    "text_bigram_backoff": """
        WITH w AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS wd
            FROM documents
        ),
        pairs AS (
            SELECT doc_id, wd[CAST(i.i AS INT)] AS w1,
                   wd[CAST(i.i + 1 AS INT)] AS w2
            FROM w CROSS JOIN LATERAL (
                SELECT unnest(range(1, len(wd)))) i(i)
        ),
        toks AS (SELECT doc_id, unnest(wd) AS token FROM w),
        uni AS (SELECT token, COUNT(*) AS ucnt FROM toks GROUP BY token),
        tot AS (SELECT SUM(ucnt) AS t FROM uni),
        bi AS (SELECT w1, w2, COUNT(*) AS bcnt FROM pairs GROUP BY w1, w2),
        scored AS (
            SELECT p.doc_id,
                   CAST(ROUND(CASE WHEN b.bcnt IS NOT NULL
                              THEN ln(b.bcnt * 1.0 / u1.ucnt)
                              ELSE ln(0.4 * u2.ucnt / tot.t) END, 6)
                        AS DECIMAL(20,6)) AS s
            FROM pairs p
            LEFT JOIN bi b ON b.w1 = p.w1 AND b.w2 = p.w2
            JOIN uni u1 ON u1.token = p.w1
            JOIN uni u2 ON u2.token = p.w2
            CROSS JOIN tot
        ),
        per AS (
            SELECT doc_id, COUNT(*) AS n_transitions,
                   FLOOR(CAST(SUM(s) AS DOUBLE) / COUNT(*) * 1e6 + 0.5)
                       / 1e6 AS avg_logscore
            FROM scored GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(p.n_transitions, 0) AS BIGINT) AS n_transitions,
               p.avg_logscore,
               FLOOR(exp(-p.avg_logscore) * 1e4 + 0.5) / 1e4 AS ppl
        FROM documents d LEFT JOIN per p USING (doc_id)
    """,
    "text_bm25_topk": """
        WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                      FROM documents),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks
               GROUP BY doc_id, token),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
        df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
        tot AS (SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
                       (SELECT COUNT(*) FROM toks) AS n_toks),
        q(query_id, token) AS (VALUES
            (1, 'spark'), (1, 'table'), (1, 'merge'), (1, 'scan'),
            (2, 'query'), (2, 'filter'), (2, 'join'), (2, 'window'),
            (3, 'the'), (3, 'customer'), (3, 'zzz')),
        contrib AS (
            SELECT q.query_id, tf.doc_id,
                   CAST(ROUND(
                       ROUND(ln(1 + (tot.n_docs - df.df + 0.5)
                                    / (df.df + 0.5)), 6)
                       * tf.tf * 2.2
                       / (tf.tf + 1.2 * (1 - 0.75
                          + 0.75 * dl.dl / (tot.n_toks * 1.0 / tot.n_docs))),
                       6) AS DECIMAL(20,6)) AS c
            FROM tf
            JOIN q USING (token)
            JOIN df USING (token)
            JOIN dl USING (doc_id)
            CROSS JOIN tot),
        scored AS (SELECT query_id, doc_id, SUM(c) AS s
                   FROM contrib GROUP BY query_id, doc_id)
        SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
               CAST(s AS DOUBLE) AS score, rank
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY s DESC, doc_id ASC) AS rank
              FROM scored)
        WHERE rank <= 5
    """,
    "text_stats": """
        WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents)
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(len(tk) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(tk)) AS BIGINT) AS n_distinct_tokens,
               ROUND(CAST(list_sum(list_transform(tk, x -> length(x))) AS DOUBLE) / len(tk), 4) AS avg_token_len,
               ROUND(len(list_distinct(tk)) * 1.0 / len(tk), 4) AS token_diversity
        FROM t
    """,
    "text_langid_trained": """
        SELECT doc_id,
               CASE doc_id % 4 WHEN 0 THEN 'en' WHEN 1 THEN 'es'
                    WHEN 2 THEN 'de' ELSE 'fr' END AS detected_lang
        FROM documents
    """,
    "text_lang_id": """
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        sc AS (SELECT doc_id,
                      len(list_filter(tk, x -> x IN ('the', 'a'))) AS score_en,
                      len(list_filter(tk, x -> x IN ('el', 'la'))) AS score_es,
                      len(list_filter(tk, x -> x IN ('der', 'und'))) AS score_de,
                      len(list_filter(tk, x -> x IN ('le', 'et'))) AS score_fr
               FROM t)
        SELECT doc_id,
               CAST(score_en AS BIGINT) AS score_en,
               CAST(score_es AS BIGINT) AS score_es,
               CAST(score_de AS BIGINT) AS score_de,
               CAST(score_fr AS BIGINT) AS score_fr,
               CASE WHEN greatest(score_en, score_es, score_de, score_fr) <= 0 THEN 'und'
                    WHEN score_en = greatest(score_en, score_es, score_de, score_fr) THEN 'en'
                    WHEN score_es = greatest(score_en, score_es, score_de, score_fr) THEN 'es'
                    WHEN score_de = greatest(score_en, score_es, score_de, score_fr) THEN 'de'
                    WHEN score_fr = greatest(score_en, score_es, score_de, score_fr) THEN 'fr'
                    ELSE 'und' END AS detected_lang
        FROM sc
    """,
    "text_quality_score": """
        WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents)
        SELECT doc_id,
               ROUND(len(list_distinct(tk)) * 1.0 / len(tk), 4) AS token_diversity,
               ROUND(len(list_filter(tk, x -> x IN ('the', 'a', 'and', 'of'))) * 1.0 / len(tk), 4) AS stopword_ratio,
               (length(text) >= 100 AND length(text) <= 1000) AS len_ok,
               ((length(text) >= 100 AND length(text) <= 1000)
                AND ROUND(len(list_distinct(tk)) * 1.0 / len(tk), 4) >= 0.15
                AND ROUND(len(list_filter(tk, x -> x IN ('the', 'a', 'and', 'of'))) * 1.0 / len(tk), 4) <= 0.5) AS keep
        FROM t
    """,
    "text_token_count": """
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS BIGINT) AS n_re_tokens,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens
        FROM documents
    """,
    "text_fingerprint": f"""
        WITH {_SHINGLES}
        SELECT doc_id,
               array_to_string(list_sort(list_transform(ts, s -> md5(s)))[1:4], '') AS fingerprint
        FROM sh
    """,
    "text_repetition": """
        SELECT doc_id,
               CAST(len(sh) AS BIGINT) AS n_ngrams,
               CAST(len(list_distinct(sh)) AS BIGINT) AS n_distinct_ngrams,
               ROUND((len(sh) - len(list_distinct(sh))) * 1.0
                     / GREATEST(len(sh), 1), 6) AS dup_ratio
        FROM (SELECT doc_id,
                     [array_to_string(tk[i:i+2], ' ')
                      for i in range(1, len(tk) - 1)] AS sh
              FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents))
    """,
    "text_main_content_pipeline": """
        WITH p AS (
            SELECT doc_id,
                   (2 + doc_id % 4)
                   + (1 + doc_id % 3) * (18 + 2 * (doc_id % 5)) AS n
            FROM documents
        ),
        q AS (
            SELECT doc_id, n,
                   3 * n - 1 + 3 * (n // 13)
                   + GREATEST(0, n % 13 - 10) AS len
            FROM p
        )
        SELECT doc_id,
               CAST(2 + doc_id % 3 AS INT) AS n_content_blocks,
               CAST(n AS BIGINT) AS n_words_main,
               ROUND(13.0 / n, 4) AS token_diversity,
               0.0 AS stopword_ratio,
               len BETWEEN 100 AND 1000 AS len_ok,
               len BETWEEN 100 AND 1000 AS keep
        FROM q
    """,
    "text_main_content": """
        SELECT doc_id,
               rtrim(repeat('w ', (2 + doc_id % 4)
                     + (1 + doc_id % 3) * (18 + 2 * (doc_id % 5))))
                   AS main_text,
               CAST(5 + doc_id % 3 AS INT) AS n_blocks,
               CAST(2 + doc_id % 3 AS INT) AS n_content_blocks,
               CAST((2 + doc_id % 4)
                    + (1 + doc_id % 3) * (18 + 2 * (doc_id % 5)) AS BIGINT)
                   AS n_words_main,
               CAST(8 AS BIGINT) AS n_words_boiler
        FROM documents
    """,
    "text_boilerplate": """
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        g AS (SELECT doc_id,
                     unnest(list_distinct([array_to_string(tk[i:i+4], ' ')
                                           for i in range(1, len(tk) - 3)])) AS ngram
              FROM toks WHERE len(tk) >= 5),
        dfreq AS (SELECT ngram, COUNT(*) AS df FROM g GROUP BY ngram)
        SELECT g.doc_id,
               COUNT(*) AS n_distinct_ngrams,
               CAST(SUM(CASE WHEN d.df >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_common_ngrams,
               ROUND(SUM(CASE WHEN d.df >= 3 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS boilerplate_ratio
        FROM g JOIN dfreq d USING (ngram)
        GROUP BY g.doc_id
    """,
    "text_pii_scrub": r"""
        SELECT doc_id,
               regexp_replace(regexp_replace(
                   text || ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@example.com tel 55512345678',
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                   '<EMAIL>', 'g'),
                 '[0-9]{7,}', '<NUM>', 'g') AS scrubbed
        FROM documents
    """,
    "text_tfidf_top_terms": """
        WITH tf AS (SELECT doc_id, token, COUNT(*) AS tf
                    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                          FROM documents)
                    GROUP BY doc_id, token),
        df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.token, tf.tf, df.df,
                   ROUND(tf.tf * ln(n.n_docs * 1.0 / df.df), 6) AS tfidf
            FROM tf JOIN df USING (token) CROSS JOIN n)
        SELECT doc_id, token, tf, df, tfidf, rank
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                  ORDER BY tfidf DESC, token ASC) AS rank
              FROM scored)
        WHERE rank <= 3
    """,
    "text_commonness": """
        WITH toks AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
                      FROM documents),
        dfreq AS (SELECT token, COUNT(*) AS df FROM toks GROUP BY token),
        nd AS (SELECT COUNT(*) AS n_docs FROM documents)
        SELECT t.doc_id,
               COUNT(*) AS n_distinct_tokens,
               ROUND(SUM(d.df) * 1.0 / (COUNT(*) * nd.n_docs), 6) AS commonness
        FROM toks t JOIN dfreq d USING (token) CROSS JOIN nd
        GROUP BY t.doc_id, nd.n_docs
    """,
    "text_html_extract": """
        WITH h AS (
            SELECT doc_id,
                   '<html><head><style>p{color:red}</style></head><body><h1>Doc '
                   || CAST(doc_id AS VARCHAR) || '</h1>' || chr(10)
                   || '<p class="body">' || text
                   || '</p> &amp; <script type="text/javascript">var x = "<p>";</script></body></html>'
                   AS html
            FROM documents
        ),
        s AS (
            SELECT doc_id, html,
                   trim(regexp_replace(
                       replace(replace(replace(replace(replace(replace(
                           regexp_replace(
                               regexp_replace(
                                   regexp_replace(html,
                                       '(?is)<script\\b[^>]*>.*?</script\\s*>', ' ', 'g'),
                                   '(?is)<style\\b[^>]*>.*?</style\\s*>', ' ', 'g'),
                               '(?s)<[^>]*>', ' ', 'g'),
                           '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                           '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
                       '\\s+', ' ', 'g')) AS clean
            FROM h
        )
        SELECT doc_id, clean,
               CAST(length(html) - length(clean) AS BIGINT) AS n_removed
        FROM s
    """,
    "text_url_extract": """
        WITH h AS (
            SELECT doc_id,
                   text || ' see https://src' || CAST(doc_id % 7 AS VARCHAR)
                        || '.example.com/doc/' || CAST(doc_id AS VARCHAR)
                        || ' and http://cdn.example.org/a/' || CAST(doc_id % 13 AS VARCHAR)
                   AS text
            FROM documents
        ),
        u AS (SELECT doc_id, unnest(regexp_extract_all(text, 'https?://[^\s]+')) AS url
              FROM h)
        SELECT doc_id, url, regexp_extract(url, '^https?://([^/]+)', 1) AS domain
        FROM u
    """,
    "text_lm_perplexity": """
    WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                  FROM documents),
    uni AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM uni),
    per AS (SELECT t.doc_id, count(*) AS n_tokens, sum(ln(u.cnt)) AS sum_ln
            FROM toks t JOIN uni u USING (token) GROUP BY t.doc_id)
    SELECT doc_id, n_tokens,
           ROUND(sum_ln / n_tokens - ln(total), 6) AS avg_logprob,
           ROUND(exp(-(sum_ln / n_tokens - ln(total))), 4) AS ppl
    FROM per, tot
""",
    "corpus_ccnet_buckets": """
    WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                  FROM documents),
    uni AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM uni),
    per AS (SELECT t.doc_id, count(*) AS n_tokens, sum(ln(u.cnt)) AS sum_ln
            FROM toks t JOIN uni u USING (token) GROUP BY t.doc_id),
    scored AS (
        SELECT d.doc_id, d.lang, p.n_tokens,
               ROUND(p.sum_ln / p.n_tokens - ln(tot.total), 6) AS avg_logprob,
               ROUND(exp(-(p.sum_ln / p.n_tokens - ln(tot.total))), 4) AS ppl
        FROM documents d JOIN per p USING (doc_id), tot
    ),
    ranked AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY avg_logprob DESC, doc_id ASC) AS rn,
               COUNT(*) OVER (PARTITION BY lang) AS cnt
        FROM scored
    )
    SELECT doc_id, lang, n_tokens, avg_logprob, ppl,
           CASE WHEN rn <= (cnt + 2) // 3 THEN 'head'
                WHEN rn <= (cnt * 2 + 2) // 3 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM ranked
""",
    "text_normalize_unicode": """
    WITH planted AS (
        SELECT doc_id,
               text || ' cafe' || chr(769)
                    || CASE WHEN doc_id % 4 = 0 THEN chr(7) || 'ding' ELSE '' END
                    || CASE WHEN doc_id % 6 = 0 THEN ' ' || chr(65533) ELSE '' END
               AS text
        FROM documents
    ),
    stripped AS (
        SELECT doc_id, text,
               regexp_replace(text,
                   '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]', '', 'g') AS s
        FROM planted
    )
    SELECT doc_id,
           nfc_normalize(s) AS normalized,
           nfc_normalize(s) <> text AS changed,
           CAST(length(text) - length(s) AS INT) AS n_controls,
           CAST(length(text) - length(replace(text, chr(65533), ''))
                AS INT) AS n_mojibake
    FROM stripped
""",
    "corpus_vocab_topk": """
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token
        ORDER BY n DESC, token ASC
        LIMIT 100
    """,
    "corpus_vocab_coverage": """
        WITH counts AS (
            SELECT token, COUNT(*) AS n
            FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
            GROUP BY token
        ),
        ranked AS (
            SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, token ASC) AS rnk
            FROM counts
        ),
        total AS (SELECT SUM(n) AS t FROM counts)
        SELECT k.k AS k,
               CAST((SELECT SUM(n) FROM ranked WHERE rnk <= k.k) AS BIGINT) AS covered,
               ROUND((SELECT SUM(n) FROM ranked WHERE rnk <= k.k) * 1.0
                     / (SELECT t FROM total), 6) AS coverage
        FROM (VALUES (10), (30), (100)) k(k)
    """,
}


def _kn5_level(cnt: str, nctx: str, n1p: str, inner: str) -> str:
    # the operator's kn_level template verbatim (ln applied outside),
    # with DuckDB-qualified column refs substituted in
    return (
        f"((greatest(cast(coalesce({cnt}, 0) as double)"
        f" - cast(0.75 as double), cast(0 as double))"
        f" / cast({nctx} as double))"
        f" + (((cast(0.75 as double) * cast({n1p} as double))"
        f" / cast({nctx} as double)) * {inner}))"
    )


_KN5_PC = "(cast(lo.n1p_low as double) / cast(ty.n_types2 as double))"
_KN5_PROB = _kn5_level(
    "t.tcnt", "cx.n_ctx", "cx.n1p_ctx",
    _kn5_level(
        "c4t.ccnt4", "m4.n4ctx", "m4.n1p4",
        _kn5_level(
            "c3t.ccnt3", "m3.n3ctx", "m3.n1p3",
            _kn5_level("c2t.ccnt2", "m2.n2ctx", "m2.n1p2", _KN5_PC),
        ),
    ),
)

ORACLES["text_5gram_kneser_ney"] = f"""
    WITH w AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS wd
        FROM documents
    ),
    f5 AS (
        SELECT doc_id, wd[CAST(i.i AS INT)] AS w1,
               wd[CAST(i.i + 1 AS INT)] AS w2,
               wd[CAST(i.i + 2 AS INT)] AS w3,
               wd[CAST(i.i + 3 AS INT)] AS w4,
               wd[CAST(i.i + 4 AS INT)] AS w5
        FROM w CROSS JOIN LATERAL (
            SELECT unnest(range(1, len(wd) - 3))) i(i)
    ),
    t5 AS (SELECT w1, w2, w3, w4, w5, COUNT(*) AS tcnt
           FROM f5 WHERE doc_id % 2 = 0 GROUP BY w1, w2, w3, w4, w5),
    cx0 AS (SELECT w1, w2, w3, w4, SUM(tcnt) AS n_ctx,
                   COUNT(*) AS n1p_ctx
            FROM t5 GROUP BY w1, w2, w3, w4),
    c4 AS (SELECT w2, w3, w4, w5, COUNT(*) AS ccnt4
           FROM t5 GROUP BY w2, w3, w4, w5),
    m4x AS (SELECT w2, w3, w4, SUM(ccnt4) AS n4ctx, COUNT(*) AS n1p4
            FROM c4 GROUP BY w2, w3, w4),
    c3 AS (SELECT w3, w4, w5, COUNT(*) AS ccnt3
           FROM c4 GROUP BY w3, w4, w5),
    m3x AS (SELECT w3, w4, SUM(ccnt3) AS n3ctx, COUNT(*) AS n1p3
            FROM c3 GROUP BY w3, w4),
    c2 AS (SELECT w4, w5, COUNT(*) AS ccnt2 FROM c3 GROUP BY w4, w5),
    m2x AS (SELECT w4, SUM(ccnt2) AS n2ctx, COUNT(*) AS n1p2
            FROM c2 GROUP BY w4),
    lo0 AS (SELECT w5, COUNT(*) AS n1p_low FROM c2 GROUP BY w5),
    ty0 AS (SELECT COUNT(*) AS n_types2 FROM c2),
    scored AS (
        SELECT p.doc_id,
               (cx.n_ctx IS NULL OR lo.n1p_low IS NULL) AS oov,
               (t.tcnt IS NULL
                AND NOT (cx.n_ctx IS NULL OR lo.n1p_low IS NULL))
                   AS unseen,
               CASE WHEN NOT (cx.n_ctx IS NULL OR lo.n1p_low IS NULL) THEN
                   CAST(ROUND(ln({_KN5_PROB}), 6) AS DECIMAL(20,6))
               END AS s
        FROM f5 p
        LEFT JOIN t5 t ON t.w1 = p.w1 AND t.w2 = p.w2 AND t.w3 = p.w3
                      AND t.w4 = p.w4 AND t.w5 = p.w5
        LEFT JOIN cx0 cx ON cx.w1 = p.w1 AND cx.w2 = p.w2
                        AND cx.w3 = p.w3 AND cx.w4 = p.w4
        LEFT JOIN c4 c4t ON c4t.w2 = p.w2 AND c4t.w3 = p.w3
                        AND c4t.w4 = p.w4 AND c4t.w5 = p.w5
        LEFT JOIN m4x m4 ON m4.w2 = p.w2 AND m4.w3 = p.w3 AND m4.w4 = p.w4
        LEFT JOIN c3 c3t ON c3t.w3 = p.w3 AND c3t.w4 = p.w4
                        AND c3t.w5 = p.w5
        LEFT JOIN m3x m3 ON m3.w3 = p.w3 AND m3.w4 = p.w4
        LEFT JOIN c2 c2t ON c2t.w4 = p.w4 AND c2t.w5 = p.w5
        LEFT JOIN m2x m2 ON m2.w4 = p.w4
        LEFT JOIN lo0 lo ON lo.w5 = p.w5
        CROSS JOIN ty0 ty
    ),
    per AS (
        SELECT doc_id, COUNT(*) AS n_transitions,
               SUM(CASE WHEN oov THEN 1 ELSE 0 END) AS n_oov,
               SUM(CASE WHEN unseen THEN 1 ELSE 0 END) AS n_unseen,
               FLOOR(CAST(SUM(s) AS DOUBLE) / COUNT(s) * 1e6 + 0.5)
                   / 1e6 AS avg_logscore
        FROM scored GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(p.n_transitions, 0) AS BIGINT) AS n_transitions,
           CAST(COALESCE(p.n_oov, 0) AS BIGINT) AS n_oov,
           CAST(COALESCE(p.n_unseen, 0) AS BIGINT) AS n_unseen,
           p.avg_logscore,
           FLOOR(exp(-p.avg_logscore) * 1e4 + 0.5) / 1e4 AS ppl
    FROM documents d LEFT JOIN per p USING (doc_id)
"""
