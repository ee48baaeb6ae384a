"""Text analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure DataFrame expressions (whole-stage codegen; no Python UDFs) with
md5-portable hashing so the DuckDB oracles reproduce results exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: language marker tokens for the n-gram/stopword heuristic language ID.
#: Deliberately tiny — the operator contract is deterministic scoring +
#: argmax with fixed precedence, not linguistic accuracy.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a"],
    "es": ["el", "la"],
    "de": ["der", "und"],
    "fr": ["le", "et"],
}

#: BPE-ish pre-tokenizer: word / number / single non-space symbol — the
#: standard GPT-2-style pre-split shape, portable between Java and RE2
#: regex engines.
TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

STOPWORDS = ["the", "a", "and", "of"]


def _tokens(text_col: str) -> F.Column:
    return F.split(F.col(text_col), " ")


def text_stats(documents: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document surface statistics (length/token counts/diversity)."""
    df = documents.withColumn("__tk", _tokens(text_col))
    n_tokens = F.size("__tk").cast("long")
    n_distinct = F.size(F.array_distinct("__tk")).cast("long")
    sum_len = F.expr("aggregate(transform(__tk, x -> length(x)), 0, (a, x) -> a + x)")
    return df.select(
        F.col(id_col),
        F.length(text_col).cast("long").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        F.round(sum_len * 1.0 / n_tokens, 4).alias("avg_token_len"),
        F.round(n_distinct * 1.0 / n_tokens, 4).alias("token_diversity"),
    )


def readability_scores(documents: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """r14 — Flesch Reading Ease + Flesch-Kincaid grade level (Flesch
    1948; Kincaid et al. 1975), the readability pair edu-quality
    pipelines score with (the FineWeb-Edu class of filters ranks
    pages by exactly this kind of signal before the model-based pass):

        FRE      = 206.835 − 1.015·(W/S) − 84.6·(Syl/W)
        FK grade = 0.39·(W/S) + 11.8·(Syl/W) − 15.59

    Deterministic engine-portable restatement: W = non-empty
    whitespace tokens; S = max(1, count of ``[.!?]+`` runs) (a
    document is at least one sentence); syllables(word) = max(1,
    count of ``[aeiouy]+`` runs in the lowercased word) — the
    standard vowel-group heuristic, stated as the contract (no
    silent-e special case: both engines must count the SAME integer,
    and the filter's use is ordinal).  All three inputs are exact
    integers; each score is one double dag under the
    floor(x·1e6+0.5)/1e6 discipline, mirrored in the oracle.

    Plan: pure map pass — regexp_count + a lambda aggregate over the
    token array, whole-stage codegen, no UDF, no shuffle; at 100 TB
    this costs exactly a projection."""
    words = F.filter(F.split(F.lower(F.col(text_col)), " "),
                     lambda x: x != "")
    df = documents.withColumn("__w", words).select(
        F.col(id_col),
        F.size("__w").cast("long").alias("n_words"),
        F.greatest(
            F.lit(1), F.regexp_count(F.col(text_col), F.lit("[.!?]+"))
        ).cast("long").alias("n_sentences"),
        F.expr(
            "aggregate(transform(__w,"
            " x -> greatest(1, regexp_count(x, '[aeiouy]+'))),"
            " cast(0 as bigint), (a, x) -> a + x)"
        ).alias("n_syllables"),
    )
    wps = "(cast(n_words as double) / cast(n_sentences as double))"
    spw = "(cast(n_syllables as double) / cast(n_words as double))"
    fre = (
        f"((cast(206.835 as double) - (cast(1.015 as double) * {wps}))"
        f" - (cast(84.6 as double) * {spw}))"
    )
    fk = (
        f"(((cast(0.39 as double) * {wps})"
        f" + (cast(11.8 as double) * {spw})) - cast(15.59 as double))"
    )
    six = "floor({} * 1e6 + 0.5) / 1e6"
    return df.select(
        id_col,
        "n_words",
        "n_sentences",
        "n_syllables",
        F.when(F.col("n_words") > 0,
               F.expr(six.format(fre))).alias("flesch_reading_ease"),
        F.when(F.col("n_words") > 0,
               F.expr(six.format(fk))).alias("fk_grade"),
    )


#: entity decode table, applied AFTER tag removal; ``&amp;`` must be last
#: so double-escaped input decodes one level per pass (the standard order).
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")]


def strip_markup(documents: DataFrame, id_col: str = "doc_id",
                 text_col: str = "html", out_col: str = "clean") -> DataFrame:
    """HTML/markup → text extraction, the first stage of every web-scrape
    training pipeline (upstream of the C4-style boilerplate removal in
    ``remove_common_spans``): drop ``<script>``/``<style>`` blocks WITH
    their contents, strip remaining tags, decode the common entities,
    collapse whitespace.  Pure ``regexp_replace`` chain — JVM-side,
    whole-stage codegen, no UDF, no shuffle; at 100 TB this is a map pass
    over the scrape, exactly as cheap as a projection.

    Deliberately regex-level (not an HTML5 tree parser): malformed markup
    degrades to extra whitespace, never to a crash — the right trade for
    dirty web data.  Emits ``n_removed`` (chars dropped) so a
    markup-density quality signal falls out for free."""
    c = F.col(text_col)
    # (?is): case-insensitive + dotall so blocks spanning lines die too.
    # Two patterns, no backreference — keeps the regexes inside RE2's
    # subset so the DuckDB oracle runs the IDENTICAL expressions.
    c2 = F.regexp_replace(c, r"(?is)<script\b[^>]*>.*?</script\s*>", " ")
    c2 = F.regexp_replace(c2, r"(?is)<style\b[^>]*>.*?</style\s*>", " ")
    c2 = F.regexp_replace(c2, r"(?s)<[^>]*>", " ")
    for ent, ch in _ENTITIES:
        c2 = F.regexp_replace(c2, ent, ch)
    c2 = F.trim(F.regexp_replace(c2, r"\s+", " "))
    return documents.select(
        F.col(id_col),
        c2.alias(out_col),
        (F.length(c) - F.length(c2)).cast("long").alias("n_removed"),
    )


def language_id(documents: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker-token language ID: score = number of marker-token occurrences
    per language; argmax with fixed precedence (en>es>de>fr), 'und' when all
    scores are zero."""
    df = documents.withColumn("__tk", _tokens(text_col))
    scores = {
        lang: F.size(F.expr(f"filter(__tk, x -> x IN ({', '.join(repr(m) for m in markers)}))"))
        for lang, markers in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    mx = F.greatest(*[scores[lang] for lang in langs])
    detected = F.lit("und")
    # first language (in declaration order) holding the max score wins
    chain = F.when(mx <= 0, "und")
    for lang in langs:
        chain = chain.when(scores[lang] == mx, lang)
    detected = chain.otherwise("und")
    return df.select(
        F.col(id_col),
        *[scores[lang].cast("long").alias(f"score_{lang}") for lang in langs],
        detected.alias("detected_lang"),
    )


def _quality_cols(text_col: str = "text") -> dict[str, F.Column]:
    """The quality-gate signal columns — the ONE definition, shared by
    :func:`quality_score` and the single-pass funnel restructure in
    llm_curation_queries (r19-opt).  ``filter(split(...))`` spells the
    tokenization inline because CollapseProject inlines the ``__tk``
    alias into every use anyway; whole-stage codegen's common
    subexpression elimination dedupes the split either way."""
    tk = _tokens(text_col)
    n_tokens = F.size(tk).cast("long")
    n_distinct = F.size(F.array_distinct(tk)).cast("long")
    stop = F.size(
        F.expr(
            f"filter(split({text_col}, ' '), "
            f"x -> x IN ({', '.join(repr(s) for s in STOPWORDS)}))"
        )
    ).cast("long")
    diversity = F.round(n_distinct * 1.0 / n_tokens, 4)
    stop_ratio = F.round(stop * 1.0 / n_tokens, 4)
    len_ok = (F.length(text_col) >= 100) & (F.length(text_col) <= 1000)
    keep = len_ok & (diversity >= F.lit(0.15)) & (stop_ratio <= F.lit(0.5))
    return {
        "token_diversity": diversity,
        "stopword_ratio": stop_ratio,
        "len_ok": len_ok,
        "keep": keep,
        "n_tokens": n_tokens,
    }


def quality_score(documents: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Composite quality gate: length bounds, token diversity, stopword
    ratio — the standard cheap pre-filter before expensive dedup/training."""
    qc = _quality_cols(text_col)
    return documents.select(
        F.col(id_col),
        qc["token_diversity"].alias("token_diversity"),
        qc["stopword_ratio"].alias("stopword_ratio"),
        qc["len_ok"].alias("len_ok"),
        qc["keep"].alias("keep"),
    )


def token_count_regex(documents: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """BPE-ish pre-tokenization count via regexp (portable pattern)."""
    return documents.select(
        F.col(id_col),
        F.size(F.expr(f"regexp_extract_all({text_col}, '{TOKEN_RE}', 0)")).cast("long").alias("n_re_tokens"),
        F.size(_tokens(text_col)).cast("long").alias("n_ws_tokens"),
    )


def repetition_score(documents: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3) -> DataFrame:
    """Gopher-style repetition signal: the fraction of a document's word
    ``k``-grams that are duplicates of an earlier one.  Boilerplate, scraped
    nav-bars, and degenerate generations score high; clean prose scores
    near 0.  Linear per-document array math, no shuffle."""
    df = documents.withColumn("__tk", _tokens(text_col)).withColumn(
        "__sh",
        F.expr(
            f"transform(sequence(1, greatest(size(__tk) - {k - 1}, 0)),"
            f" i -> concat_ws(' ', slice(__tk, i, {k})))"
        ),
    )
    n_sh = F.size("__sh").cast("long")
    n_distinct = F.size(F.array_distinct("__sh")).cast("long")
    return df.select(
        F.col(id_col),
        n_sh.alias("n_ngrams"),
        n_distinct.alias("n_distinct_ngrams"),
        F.round((n_sh - n_distinct) * 1.0 / F.greatest(n_sh, F.lit(1)), 6).alias("dup_ratio"),
    )


def vocab_topk(documents: DataFrame, k: int = 100, text_col: str = "text") -> DataFrame:
    """Corpus vocabulary: the ``k`` most frequent whitespace tokens with a
    deterministic tie-break (count desc, then token asc) so the cut line is
    reproducible.  One explode + one map-side-combinable groupBy; the final
    top-k is a driver-free global sort-limit (Spark's TakeOrderedAndProject)."""
    counts = (
        documents.select(F.explode(_tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return counts.orderBy(F.col("n").desc(), F.col("token").asc()).limit(k)


def vocab_coverage(documents: DataFrame, ks: list[int] | None = None,
                   text_col: str = "text") -> DataFrame:
    """Tokenizer-design report: for each candidate vocabulary size ``k``,
    what fraction of all token OCCURRENCES the top-``k`` vocabulary covers
    (count-desc, token-asc cut — same deterministic line as
    ``vocab_topk``).  The curve that picks a vocab size before training a
    tokenizer on the corpus.

    One explode + one map-side-combinable token groupBy; the top-max(k)
    cut is a driver-free global sort-limit (TakeOrderedAndProject — never
    a one-partition window over the full vocab), the rank window then runs
    over ≤max(k) rows, and the occurrence total folds off the count table
    — no second corpus scan."""
    from pyspark.sql import Window

    ks = ks or [10, 30, 100]
    counts = (
        documents.select(F.explode(_tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = counts.orderBy(F.col("n").desc(), F.col("token").asc()).limit(max(ks))
    ranked = top.withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.col("n").desc(), F.col("token").asc()))
    )
    # denominator = ALL occurrences (the full counts table) — summing the
    # top-max(ks) cut instead would inflate coverage on any corpus with
    # more than max(ks) distinct tokens
    total = counts.agg(F.sum("n").alias("__total"))
    rows = [
        ranked.filter(F.col("rnk") <= k)
        .agg(F.sum("n").alias("covered"))
        .select(F.lit(k).alias("k"), "covered")
        for k in sorted(ks)
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.join(F.broadcast(total)).select(
        "k",
        F.col("covered").cast("long").alias("covered"),
        F.round(F.col("covered") / F.col("__total"), 6).alias("coverage"),
    )


def extract_urls(documents: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """URL extraction — one row per ``https?://`` match with its domain
    (the link-analysis primitive behind link-density quality signals,
    domain-level dedup, and source attribution in web-scrape pipelines).
    Whitespace-delimited match, RE2-subset regex → the DuckDB oracle runs
    the identical pattern.  Map + explode, no shuffle."""
    # Spark SQL string literals process backslash escapes, so the regex
    # needs a DOUBLED backslash at the SQL level to deliver \s to the
    # engine ('[^\s]' would silently become '[^s]' — match-until-letter-s)
    urls = F.expr(f"regexp_extract_all({text_col}, 'https?://[^\\\\s]+', 0)")
    return (
        documents.select(F.col(id_col), F.explode(urls).alias("url"))
        .withColumn("domain", F.regexp_extract("url", "^https?://([^/]+)", 1))
    )


def tfidf_top_terms(
    documents: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-``k`` terms by TF-IDF (ln(N/df) idf, raw tf),
    deterministic tie-break (score desc, token asc) — the classic keyword
    extraction / relevance-weighting pass.

    Plan: one explode → per-(doc,token) counts (map-side combinable) →
    token document frequencies (second small agg) joined back → per-doc
    window top-k.  The df table is vocabulary-sized — broadcastable at any
    corpus scale."""
    from pyspark.sql import Window

    from .dedup import spread_for_compute

    # r19-opt (guide §2.5): spread the sub-4GB corpus scan before the
    # CPU-bound explode+partial-agg map stage (see lm_5gram_kneser_ney)
    toks = spread_for_compute(documents.select(id_col, text_col)).select(
        F.col(id_col), F.explode(_tokens(text_col)).alias("token")
    )
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    # N as an IN-PLAN count-star branch, not a driver-side
    # documents.count(): the count(*) scan reads NO columns (empty
    # ReadSchema — parquet row-group metadata only), so the corpus text is
    # decoded and tokenized exactly once per run even at 100 TB, and the
    # whole query stays one lazy plan (no extra blocking job).
    n_df = documents.groupBy().agg(F.count(F.lit(1)).alias("__n_docs"))
    scored = (
        tf.join(F.broadcast(df_), "token")
        .crossJoin(F.broadcast(n_df))
        .withColumn(
            "tfidf", F.round(F.col("tf") * F.log(F.col("__n_docs") / F.col("df")), 6)
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("token").asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(id_col, "token", "tf", "df", "tfidf", F.col("__rn").cast("long").alias("rank"))
    )


def fingerprint(documents: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 4) -> DataFrame:
    """Winnowing-style fingerprint: the n lexicographically-smallest md5
    digests of the document's 3-gram shingles, concatenated.  Two documents
    sharing a fingerprint prefix are near-dup candidates — a cheap
    sortable/groupable sketch."""
    df = documents.withColumn("__tk", _tokens(text_col)).withColumn(
        "__sh",
        F.expr(
            "array_distinct(transform(sequence(1, greatest(size(__tk) - 2, 0)),"
            " i -> concat_ws(' ', slice(__tk, i, 3))))"
        ),
    )
    fp = F.expr(f"array_join(slice(array_sort(transform(__sh, s -> md5(s))), 1, {n}), '')")
    return df.select(F.col(id_col), fp.alias("fingerprint"))


def commonness_score(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document token-commonness: the mean corpus document-frequency
    ratio over the document's DISTINCT tokens — a perplexity proxy built
    from exact integer counts (no ``log``, so the oracle is bit-exact).
    Low score = tokens few other documents use (gibberish, code dumps,
    boilerplate IDs); high = everyday vocabulary.

    Plan: explode distinct tokens → vocabulary-sized df table (map-side
    combinable, broadcastable at any corpus scale) → join back → one
    grouped AVG.  Same shape as TF-IDF minus the window.  N docs is an
    in-plan count-star branch (empty-ReadSchema scan: parquet row-group
    metadata only) broadcast as one row — NOT a driver-side ``count()``,
    which would decode and tokenize the corpus a second time."""
    pairs = documents.select(
        F.col(id_col), F.explode(F.array_distinct(_tokens(text_col))).alias("token")
    )
    df_ = pairs.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_df = documents.groupBy().agg(F.count(F.lit(1)).alias("__n_docs"))
    per_doc = (
        pairs.join(F.broadcast(df_), "token")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_distinct_tokens"),
            F.sum("df").alias("__sum_df"),
        )
    )
    return per_doc.crossJoin(F.broadcast(n_df)).select(
        F.col(id_col),
        F.col("n_distinct_tokens"),
        # = AVG(df/n_docs), but as ONE division over exact integer
        # sums — no float-summation-order sensitivity in the oracle
        F.round(
            F.col("__sum_df") / (F.col("n_distinct_tokens") * F.col("__n_docs")), 6
        ).alias("commonness"),
    )


def lm_unigram_logprob(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """CCNet-style language-model perplexity filter (Wenzek et al. 2020,
    public paper), with the corpus's own unigram LM standing in for the
    external KenLM 5-gram: score every document by its mean token
    log-probability ``avg_logprob = (Σ_t ln cnt_t)/n − ln(total)`` and the
    corresponding perplexity ``exp(−avg_logprob)``.  High perplexity =
    improbable token stream (gibberish, code dumps, OCR noise) — the
    standard cut is dropping the worst-perplexity tail per language.

    Unlike ``commonness_score`` (document-frequency ratio over DISTINCT
    tokens) this is occurrence-weighted and log-space — the actual LM
    quantity, directly comparable to a KenLM-scored pipeline.

    Plan: one explode → vocabulary-sized unigram count table (map-side
    combinable, broadcast back) → per-doc grouped sum of ``ln cnt``.  The
    corpus-total token count folds FROM the unigram table (vocabulary-sized
    input, one row out) — no second corpus scan, and ``ln(total)`` is
    applied once per doc, not per token."""
    # r19-opt (guide §2.5): spread the sub-4GB corpus scan before the
    # CPU-bound explode+partial-agg map stages (see lm_5gram_kneser_ney)
    from .dedup import spread_for_compute

    toks = spread_for_compute(documents.select(id_col, text_col)).select(
        F.col(id_col), F.explode(_tokens(text_col)).alias("token")
    )
    uni = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    tot = uni.groupBy().agg(F.sum("cnt").alias("__total"))
    per = (
        toks.join(F.broadcast(uni), "token")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.log("cnt")).alias("__sum_ln"),
        )
    )
    avg = F.col("__sum_ln") / F.col("n_tokens") - F.log("__total")
    return per.crossJoin(F.broadcast(tot)).select(
        F.col(id_col),
        F.col("n_tokens"),
        F.round(avg, 6).alias("avg_logprob"),
        F.round(F.exp(-avg), 4).alias("ppl"),
    )


def ccnet_perplexity_buckets(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """CCNet head/middle/tail perplexity bucketing (Wenzek et al. 2020
    §4.4) — the piece that completes the repo's CCNet pipeline next to
    ``paragraph_dedup`` and the LM perplexity score: within each
    language, documents are split into terciles by LM score; ``head``
    (lowest perplexity = most fluent) is what CCNet keeps for
    pretraining, ``tail`` is the drop candidate.

    Buckets are DISCRETE order-statistic cuts by rank (ceil(n/3),
    ceil(2n/3) in exact integer arithmetic; ties on the round-6
    avg_logprob break by doc id) — the same engine-portable idiom as
    ``adaptive_length_threshold``; an interpolating percentile would
    not replay across engines.  Ranking on the round-6 score (not the
    raw double) keeps the two engines' orderings identical even when
    their ``exp``/``ln`` libraries disagree past the 6th decimal.

    Plan: the LM score is ``lm_unigram_logprob``'s (one explode,
    vocabulary table broadcast back); bucketing adds one shuffle by
    language + a per-language rank window.  At 100 TB a handful of
    language partitions each sort their full corpus slice — shard the
    stratum finer (lang × source) exactly as adaptive_length_threshold
    documents, or pre-aggregate cut VALUES from a stratified sample."""
    from pyspark.sql import Window

    per = lm_unigram_logprob(documents, id_col, text_col)
    scored = documents.select(F.col(id_col), F.col(lang_col)).join(per, id_col)
    w = Window.partitionBy(lang_col).orderBy(
        F.col("avg_logprob").desc(), F.col(id_col).asc()
    )
    ranked = scored.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__cnt", F.count(F.lit(1)).over(Window.partitionBy(lang_col))
    )
    c1 = F.floor((F.col("__cnt") + 2) / 3)        # ceil(n/3)
    c2 = F.floor((F.col("__cnt") * 2 + 2) / 3)    # ceil(2n/3)
    bucket = (
        F.when(F.col("__rn") <= c1, F.lit("head"))
        .when(F.col("__rn") <= c2, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return ranked.select(
        F.col(id_col), F.col(lang_col), "n_tokens", "avg_logprob", "ppl",
        bucket.alias("bucket"),
    )


def boilerplate_ngrams(
    documents: DataFrame,
    k: int = 5,
    min_docs: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document boilerplate signal (C4-style): the fraction of a
    document's DISTINCT word ``k``-grams that also appear in at least
    ``min_docs`` documents corpus-wide.  Nav bars, license headers, and
    template scaffolding score high; original prose scores near 0 — the
    standard companion to per-doc ``repetition_score`` (which only sees
    repeats WITHIN one document).

    Plan: explode distinct k-grams → corpus document-frequency per k-gram
    (map-side combinable groupBy) → join back on the k-gram key → one
    grouped sum per doc.  Unlike the token-vocabulary joins (tfidf/
    commonness) the k-gram table grows with the corpus, so the join-back is
    a plain shuffle join on the k-gram key, NOT a broadcast — both sides
    shuffle once on the same key and nothing is ever all-pairs.  Documents
    with fewer than ``k`` tokens have no k-grams and are absent from the
    output (mirrored by the oracle)."""
    grams = documents.withColumn("__tk", _tokens(text_col)).select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"CASE WHEN size(__tk) >= {k} THEN "
                f"array_distinct(transform(sequence(1, size(__tk) - {k - 1}),"
                f" i -> concat_ws(' ', slice(__tk, i, {k}))))"
                f" ELSE array() END"
            )
        ).alias("ngram"),
    )
    df_ = grams.groupBy("ngram").agg(F.count(F.lit(1)).alias("df"))
    return (
        grams.join(df_, "ngram")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_distinct_ngrams"),
            F.sum((F.col("df") >= min_docs).cast("long")).alias("n_common_ngrams"),
        )
        .select(
            F.col(id_col),
            F.col("n_distinct_ngrams"),
            F.col("n_common_ngrams"),
            # ONE division over exact integer counts — oracle-bit-exact
            F.round(F.col("n_common_ngrams") / F.col("n_distinct_ngrams"), 6).alias(
                "boilerplate_ratio"
            ),
        )
    )


def gopher_rules(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Gopher-style rule-based quality flags (Rae et al. 2021 §A1.1, public
    paper): word-count bounds, mean-word-length bounds, symbol-to-word
    ratio, and a stopword-presence check, plus the conjunction.

    Every flag is computed in EXACT INTEGER arithmetic (e.g. the
    mean-word-length band 3..10 is tested as ``3·n_words ≤ Σlen ≤
    10·n_words``) so the pass/fail line is engine-portable — no float
    threshold can flip between Spark and the oracle.  The reported ratio
    columns are informational roundings of the same integers.  Map-only,
    no shuffle; fuses into the scan at any scale."""
    df = documents.withColumn("__tk", _tokens(text_col))
    n_words = F.size("__tk").cast("long")
    sum_len = F.expr(
        "aggregate(transform(__tk, x -> length(x)), cast(0 as bigint), (a, x) -> a + x)"
    )
    # stripping [A-Za-z0-9 ] leaves exactly the symbol characters
    n_sym = F.length(F.regexp_replace(F.col(text_col), "[A-Za-z0-9 ]", "")).cast("long")
    stop_lits = ", ".join(repr(s) for s in STOPWORDS)
    n_stop_distinct = F.size(
        F.expr(f"array_intersect(array_distinct(__tk), array({stop_lits}))")
    ).cast("long")
    words_ok = (n_words >= 50) & (n_words <= 100000)
    mean_len_ok = (sum_len >= 3 * n_words) & (sum_len <= 10 * n_words)
    symbol_ok = n_sym * 10 < n_words
    stop_ok = n_stop_distinct >= 2
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in passthrough],
        n_words.alias("n_words"),
        F.round(sum_len / n_words, 6).alias("mean_word_len"),
        F.round(n_sym / n_words, 6).alias("symbol_word_ratio"),
        n_stop_distinct.alias("n_stop_distinct"),
        words_ok.alias("words_ok"),
        mean_len_ok.alias("mean_len_ok"),
        symbol_ok.alias("symbol_ok"),
        stop_ok.alias("stop_ok"),
        (words_ok & mean_len_ok & symbol_ok & stop_ok).alias("passes"),
    )


def _threshold_from_counts(
    d: DataFrame,
    pct_num: int = 1,
    pct_den: int = 10,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ ``(stratum, threshold_tokens)`` from a precomputed
    ``(id, stratum, n_tokens)`` frame — the order-statistic core of
    :func:`adaptive_length_threshold`, factored out (r19-opt) so the
    single-pass funnel can derive thresholds from its one metadata pass
    instead of re-tokenizing the corpus.  Contract: ``n_tokens`` must be
    the same ``size(split(text, ' '))`` count the public operator
    computes; one row per stratum is guaranteed (``ceil(cnt·p) ≤ cnt``)."""
    from pyspark.sql import Window

    w = Window.partitionBy(stratum_col).orderBy(F.col("n_tokens").asc(), F.col(id_col).asc())
    ranked = d.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__cnt", F.count(F.lit(1)).over(Window.partitionBy(stratum_col))
    )
    # ceil(cnt·num/den) in exact integer arithmetic
    idx = F.floor((F.col("__cnt") * pct_num + (pct_den - 1)) / pct_den)
    return (
        ranked.filter(F.col("__rn") == F.greatest(idx, F.lit(1)))
        .select(F.col(stratum_col), F.col("n_tokens").alias("threshold_tokens"))
    )


def adaptive_length_threshold(
    documents: DataFrame,
    pct_num: int = 1,
    pct_den: int = 10,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-stratum adaptive quality cutoff: the token-count value at the
    ``pct_num/pct_den`` order statistic (default P10), plus how many
    documents fall below it — fixed global thresholds misfire when corpora
    mix languages/domains with different natural lengths.

    The order statistic is DISCRETE (the value at integer index
    ``ceil(n·p)``, computed with integer arithmetic) — deliberately not an
    interpolating percentile, whose float interpolation is not
    engine-portable.  One window per stratum (rank by token count) + one
    grouped agg; at 100 TB shard the stratum finer (lang×source) if one
    stratum exceeds a single executor's window capacity."""
    n = F.size(_tokens(text_col)).cast("long")
    d = documents.select(F.col(id_col), F.col(stratum_col), n.alias("n_tokens"))
    thresholds = _threshold_from_counts(d, pct_num, pct_den, stratum_col, id_col)
    return (
        d.join(thresholds, stratum_col)
        .groupBy(stratum_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.first("threshold_tokens").alias("threshold_tokens"),
            F.sum((F.col("n_tokens") < F.col("threshold_tokens")).cast("long")).alias("n_below"),
        )
    )


def normalize_unicode(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Unicode repair pass — the standard first normalization step of a
    crawl-curation pipeline (C4/CCNet both NFC-normalize before anything
    hashes text): strip C0 control characters (keeping \\t \\n \\r), then
    NFC-compose combining sequences so visually-identical strings hash
    identically downstream (exact dedup, MinHash shingles, URL digests all
    key on bytes).  Also surfaces the U+FFFD replacement-char count — the
    standing mojibake signal of a mis-decoded source.

    Spark has no NFC builtin, so this is an Arrow-batched ``mapInPandas``
    (stdlib ``unicodedata``, vectorized per batch — the documented slow
    path, used only because the JVM surface genuinely lacks the op).  At
    100 TB the pass is map-only: no shuffle, fuses with the scan, and the
    output feeds every digest-keyed operator.

    Emits (id, normalized, changed, n_controls, n_mojibake); ``changed``
    compares against the ORIGINAL text, so callers can cheaply count how
    much of the corpus needed repair."""
    import re as _re

    import pandas as pd
    from pyspark.sql import types as T

    ctrl = _re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")
    schema = T.StructType(
        [
            # id passes through untouched, so its output type is whatever
            # the input column already is (ADVICE r7: hardcoding LongType
            # broke string/int32 doc-id corpora at the Arrow boundary)
            T.StructField(id_col, documents.schema[id_col].dataType),
            T.StructField("normalized", T.StringType()),
            T.StructField("changed", T.BooleanType()),
            T.StructField("n_controls", T.IntegerType()),
            T.StructField("n_mojibake", T.IntegerType()),
        ]
    )

    def _norm(batches):
        import unicodedata

        for pdf in batches:
            ids, out, chg, nc, nm = [], [], [], [], []
            for doc_id, s in zip(pdf[id_col], pdf[text_col]):
                ids.append(doc_id)
                if s is None or (isinstance(s, float) and pd.isna(s)):
                    out.append(None), chg.append(None), nc.append(None), nm.append(None)
                    continue
                stripped = ctrl.sub("", s)
                n = unicodedata.normalize("NFC", stripped)
                out.append(n)
                chg.append(n != s)
                nc.append(len(s) - len(stripped))
                nm.append(s.count("�"))
            yield pd.DataFrame(
                {id_col: ids, "normalized": out, "changed": chg,
                 "n_controls": nc, "n_mojibake": nm}
            )

    return documents.select(id_col, text_col).mapInPandas(_norm, schema)


def bm25_topk(
    documents: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 top-``k`` retrieval (Robertson/Spärck Jones; the
    Lucene/Elasticsearch default ranking) — the lexical-retrieval
    workhorse of decontamination sweeps and RAG-ish corpus queries,
    next to the embedding ANN family.

    Formula (Lucene variant): per query term t and doc d,
    idf(t)·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) with
    idf = ln(1 + (N−df+0.5)/(df+0.5)); repeated query terms are
    deduplicated (qtf=1).

    Cross-engine determinism: the idf log AND each per-term
    contribution are rounded to 6 places, and the per-(query, doc)
    score is summed as DECIMAL(20,6) — exact and ORDER-INDEPENDENT, so
    Spark's partial-agg order vs DuckDB's scan order cannot flip a
    ranking (float sums are neither).  Ties break on doc id.

    Plan: one corpus tokenize → (doc, token) tf + per-doc length
    (map-side combinable), 1-row N/avgdl scalar attach, query terms
    broadcast-joined — the corpus shuffles once on (doc, token) and
    never on queries.  The df table is computed ONLY for query terms
    (tf semi-filtered by the broadcast qterms BEFORE the df
    aggregation), so the broadcast back is query-term-sized — never
    the full vocabulary, which at 100 TB is 10⁸-10⁹ distinct tokens
    and would OOM the broadcast build (r12 verdict finding)."""
    from pyspark.sql import Window

    spark = documents.sparkSession
    from .dedup import spread_for_compute

    # r19-opt (guide §2.5): spread the sub-4GB corpus scan before the
    # CPU-bound explode+partial-agg map stage (see lm_5gram_kneser_ney)
    toks = spread_for_compute(documents.select(id_col, text_col)).select(
        F.col(id_col), F.explode(_tokens(text_col)).alias("token")
    )
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    totals = documents.groupBy().agg(
        F.count(F.lit(1)).alias("__n_docs")
    ).crossJoin(
        toks.groupBy().agg(F.count(F.lit(1)).alias("__n_toks"))
    )
    qterms = spark.createDataFrame(
        sorted({(qid, t) for qid, text in queries
                for t in text.split(" ") if t}),
        "query_id long, token string",
    )
    # document frequency ONLY for query terms: the broadcast qtok
    # filter runs map-side over tf, so the df aggregation shuffles a
    # query-term-sized table — the full-vocabulary df never
    # materializes, and the broadcast back is O(|query terms|)
    qtok = qterms.select("token").distinct()
    df_ = (
        tf.join(F.broadcast(qtok), "token")
        .groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    )
    idf = F.round(
        F.log(
            1 + (F.col("__n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ), 6,
    )
    avgdl = F.col("__n_toks") / F.col("__n_docs")
    contrib = F.round(
        F.col("__idf") * F.col("tf") * (k1 + 1)
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / avgdl)),
        6,
    ).cast("decimal(20,6)")
    scored = (
        tf.join(F.broadcast(qterms), "token")
        .join(F.broadcast(df_), "token")
        .join(dl, id_col)
        .crossJoin(F.broadcast(totals))
        .withColumn("__idf", idf)
        .groupBy("query_id", id_col)
        .agg(F.sum(contrib).alias("__s"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__s").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", id_col,
            F.col("__s").cast("double").alias("score"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def lm_bigram_stupid_backoff(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.4,
) -> DataFrame:
    """Bigram LM scoring with STUPID BACKOFF (Brants et al. 2007, "Large
    Language Models in Machine Translation" — the score web-scale
    distributed LMs actually use, because unlike Katz/Kneser-Ney it
    needs no discounting statistics): each transition w₁→w₂ scores
    cnt(w₁w₂)/cnt(w₁) when the bigram was seen, else α·cnt(w₂)/total
    (α = 0.4, the paper's constant).  One step up the n-gram ladder
    from ``lm_unigram_logprob`` — repeated-context gibberish that fools
    a unigram model (frequent words in impossible orders) scores badly
    here.

    Per document: n_transitions, mean transition log-score, perplexity.
    Docs with fewer than 2 tokens emit n_transitions = 0 with NULL
    scores (nothing to score — stated rather than faked).

    Determinism: each log is rounded to 6 places and the per-doc sum
    runs as DECIMAL(20,6) — exact and order-independent, so Spark's
    partial-agg order and DuckDB's scan order produce identical means
    (the float-sum ranking trap the BM25 operator documents).

    Plan: one corpus tokenize; bigram counts shuffle on the pair key
    (the bigram table is vocabulary²-bounded — too big to broadcast at
    real scale, so the transition scoring JOINS on the pair key);
    unigram table broadcast; total folds from the unigram table."""
    words = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    # greatest(.., 0) guards 0/1-token docs (slice() throws on a
    # negative length); they fall through to the documented
    # left-join/coalesce path with n_transitions = 0
    pairs_arr = F.expr(
        "zip_with(slice(__w, 1, greatest(size(__w) - 1, 0)),"
        " slice(__w, 2, greatest(size(__w) - 1, 0)),"
        " (a, b) -> struct(a as w1, b as w2))"
    )
    # r19-opt (guide §2.5): spread the sub-4GB corpus scan before the
    # CPU-bound explode+partial-agg map stages (see lm_5gram_kneser_ney);
    # both gram streams derive from the ONE spread frame so its exchange
    # is shared
    from .dedup import spread_for_compute

    d = spread_for_compute(documents.select(id_col, text_col))
    pairs = (
        d.withColumn("__w", words)
        .select(F.col(id_col), F.explode(pairs_arr).alias("p"))
        .select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    toks = d.select(
        F.col(id_col), F.explode(words).alias("token")
    )
    # No-op isNotNull filter (split tokens are never null) aligning the
    # three uni copies' inferred join-key isnotnull sets so they share
    # one shuffle stage (r18-opt, the lm_5gram_kneser_ney shape).
    uni = toks.filter(F.col("token").isNotNull()).groupBy("token").agg(
        F.count(F.lit(1)).alias("ucnt")
    )
    tot = uni.groupBy().agg(F.sum("ucnt").alias("__total"))
    bi = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("bcnt"))
    u1 = uni.select(F.col("token").alias("w1"), F.col("ucnt").alias("c1"))
    u2 = uni.select(F.col("token").alias("w2"), F.col("ucnt").alias("c2"))
    scored = (
        pairs.join(bi, ["w1", "w2"], "left")
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "__s",
            F.round(
                F.when(
                    F.col("bcnt").isNotNull(),
                    F.log(F.col("bcnt") / F.col("c1")),
                ).otherwise(
                    F.log(F.lit(alpha) * F.col("c2") / F.col("__total"))
                ),
                6,
            ).cast("decimal(20,6)"),
        )
    )
    per = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.sum("__s").alias("__sum"),
    )
    # the MEAN rounds via explicit floor arithmetic rather than round():
    # engines disagree on the half-way rule (caught at sf0.1 — one doc's
    # quotient landed exactly on a 6th-decimal boundary), while
    # floor(x·1e6 + 0.5)/1e6 is the same three IEEE ops everywhere
    avg = (
        F.floor(
            F.col("__sum").cast("double") / F.col("n_transitions") * 1e6
            + 0.5
        ) / 1e6
    )
    ppl = F.floor(F.exp(-avg) * 1e4 + 0.5) / 1e4
    return (
        documents.select(id_col).join(per, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_transitions", F.lit(0)).cast("long")
            .alias("n_transitions"),
            avg.alias("avg_logscore"),
            ppl.alias("ppl"),
        )
    )


def c4_line_filter(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 5,
    min_kept_lines: int = 3,
) -> DataFrame:
    """r13 — C4's line-level cleaning rules (Raffel et al. 2020 §2.2,
    public paper): a line is RETAINED only if it ends in a terminal
    punctuation mark (. ! ? ") and contains at least ``min_words``
    words; a page is DROPPED outright if it contains the phrase
    "lorem ipsum", a curly brace '{', or fewer than ``min_kept_lines``
    retained lines (the paper counts sentences; retained lines are the
    engine-portable proxy, documented here).  Emits per page the line
    counts, the keep/drop verdict with its FIRST matching reason in the
    paper's order (lorem_ipsum → brace → too_few_lines), and the
    REWRITTEN page (retained lines re-joined) — empty when dropped.

    All line logic is JVM array ops over ``split(text, '\\n')`` —
    map-only, no UDF, no shuffle; fuses into the scan at 100 TB."""
    kept = (
        f"filter(split({text_col}, '\\n'), line -> "
        f"line rlike '[.!?\"]$' AND "
        f"size(split(trim(line), ' +')) >= {min_words})"
    )
    df = documents.withColumn("__kept", F.expr(kept))
    has_lorem = F.expr(f"instr(lower({text_col}), 'lorem ipsum') > 0")
    has_brace = F.expr(f"instr({text_col}, '{{') > 0")
    too_few = F.size("__kept") < min_kept_lines
    reason = (
        F.when(has_lorem, F.lit("lorem_ipsum"))
        .when(has_brace, F.lit("brace"))
        .when(too_few, F.lit("too_few_lines"))
        .otherwise(F.lit(""))
    )
    page_kept = ~(has_lorem | has_brace | too_few)
    return df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), "\n")).cast("long").alias("n_lines"),
        F.size("__kept").cast("long").alias("n_kept_lines"),
        page_kept.alias("page_kept"),
        reason.alias("drop_reason"),
        F.when(page_kept, F.array_join("__kept", "\n"))
        .otherwise(F.lit("")).alias("cleaned_text"),
    )


def zipf_fit(
    documents: DataFrame,
    top_n: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """r13 — Zipf's-law fit over the corpus vocabulary: OLS of
    ln(frequency) on ln(rank) for the ``top_n`` most frequent tokens
    (rank ties broken token-ASC), emitting slope (the Zipf exponent,
    ≈ −1 for natural text — the standard corpus-health diagnostic),
    intercept, and R².

    Engine-portability: ln values are rounded via the three-IEEE-op
    floor(x·1e6 + 0.5)/1e6 idiom BEFORE summation, per-term products
    are rounded the same way, and all sums run as DECIMAL(20,6) — so
    the OLS closed form consumes identical exact inputs in Spark and
    the DuckDB oracle, and the final one-division arithmetic is
    bit-deterministic.  Scale shape: one (token) shuffle for the
    frequency table, then TakeOrdered top-n (never a full vocabulary
    sort) — the window rank runs on the bounded ``top_n``-row set."""
    from pyspark.sql import Window

    from .dedup import spread_for_compute

    # r19-opt (guide §2.5): spread the sub-4GB corpus scan before the
    # CPU-bound explode+partial-agg map stage (see lm_5gram_kneser_ney)
    toks = spread_for_compute(documents.select(text_col)).select(
        F.explode(_tokens(text_col)).alias("token")
    )
    freqs = toks.groupBy("token").agg(F.count("*").alias("freq"))
    top = freqs.orderBy(F.col("freq").desc(), F.col("token").asc()).limit(top_n)
    w = Window.orderBy(F.col("freq").desc(), F.col("token").asc())
    r6 = "floor({x} * 1e6 + 0.5) / 1e6"
    xy = top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        F.expr(r6.format(x="ln(rank)")).alias("x"),
        F.expr(r6.format(x="ln(freq)")).alias("y"),
    )
    sums = xy.select(
        F.count("*").cast("double").alias("n"),
        F.sum(F.col("x").cast("decimal(20,6)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(20,6)")).cast("double").alias("sy"),
        F.sum(F.expr(r6.format(x="x * y")).cast("decimal(20,6)"))
        .cast("double").alias("sxy"),
        F.sum(F.expr(r6.format(x="x * x")).cast("decimal(20,6)"))
        .cast("double").alias("sxx"),
        F.sum(F.expr(r6.format(x="y * y")).cast("decimal(20,6)"))
        .cast("double").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = F.floor(num / dx * 1e6 + 0.5) / 1e6
    return sums.select(
        F.col("n").cast("long").alias("n_points"),
        slope.alias("slope"),
        (F.floor((F.col("sy") - slope * F.col("sx")) / F.col("n") * 1e6 + 0.5)
         / 1e6).alias("intercept"),
        F.when(dy > 0, F.floor(num * num / (dx * dy) * 1e6 + 0.5) / 1e6)
        .alias("r2"),
    )


def lm_trigram_stupid_backoff(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.4,
) -> DataFrame:
    """r13 — TRIGRAM stupid backoff (Brants et al. 2007 §4): the full
    backoff ladder the paper defines, one rung above
    ``lm_bigram_stupid_backoff``.  Each transition (w₁,w₂)→w₃ scores
    cnt(w₁w₂w₃)/cnt(w₁w₂) when the trigram was seen, else
    α·cnt(w₂w₃)/cnt(w₂), else α²·cnt(w₃)/total (α = 0.4, the paper's
    constant, applied once per backoff step).  Per document:
    n_transitions (= n_tokens − 2), mean transition log-score,
    perplexity; docs with < 3 tokens emit n_transitions = 0 with NULL
    scores.

    Determinism: round-6 logs, DECIMAL(20,6) sums, floor-mean — the
    bigram operator's exact discipline.

    Plan: trigram and bigram count tables SHUFFLE on their n-gram keys
    (vocab³/vocab² — never broadcast; the same call the bigram operator
    documents), so scoring is three key-joins: left-join trigram counts
    on (w1,w2,w3), join bigram counts on (w1,w2) [denominator — always
    present for a seen trigram] and left-join on (w2,w3) [backoff
    numerator]; the unigram table and total are broadcast."""
    words = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    tri_arr = F.expr(
        "zip_with(slice(__w, 1, greatest(size(__w) - 2, 0)),"
        " zip_with(slice(__w, 2, greatest(size(__w) - 2, 0)),"
        "          slice(__w, 3, greatest(size(__w) - 2, 0)),"
        "          (b, c) -> struct(b as w2, c as w3)),"
        " (a, bc) -> struct(a as w1, bc.w2 as w2, bc.w3 as w3))"
    )
    pair_arr = F.expr(
        "zip_with(slice(__w, 1, greatest(size(__w) - 1, 0)),"
        " slice(__w, 2, greatest(size(__w) - 1, 0)),"
        " (a, b) -> struct(a as w1, b as w2))"
    )
    # r19-opt (guide §2.5): spread the sub-4GB corpus scan before the
    # CPU-bound explode+partial-agg map stages (see lm_5gram_kneser_ney)
    from .dedup import spread_for_compute

    docs_w = spread_for_compute(
        documents.select(id_col, text_col)
    ).withColumn("__w", words)
    tris = (
        docs_w.select(F.col(id_col), F.explode(tri_arr).alias("t"))
        .select(id_col, "t.w1", "t.w2", "t.w3")
    )
    pairs = (
        docs_w.select(F.explode(pair_arr).alias("p"))
        .select("p.w1", "p.w2")
    )
    toks = docs_w.select(F.explode("__w").alias("token"))
    # No-op isNotNull filters (split tokens are never null) aligning
    # each fan-out branch's inferred join-key isnotnull set so the
    # uni (3 copies) and bi (2 copies) subtrees share one shuffle stage
    # each (r18-opt, the lm_5gram_kneser_ney shape).
    uni = toks.filter(F.col("token").isNotNull()).groupBy("token").agg(
        F.count(F.lit(1)).alias("ucnt")
    )
    tot = uni.groupBy().agg(F.sum("ucnt").alias("__total"))
    bi = pairs.filter(
        F.col("w1").isNotNull() & F.col("w2").isNotNull()
    ).groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("bcnt"))
    tri = tris.groupBy("w1", "w2", "w3").agg(F.count(F.lit(1)).alias("tcnt"))
    b12 = bi.select(F.col("w1"), F.col("w2"), F.col("bcnt").alias("c12"))
    b23 = bi.select(F.col("w1").alias("w2"), F.col("w2").alias("w3"),
                    F.col("bcnt").alias("c23"))
    u2 = uni.select(F.col("token").alias("w2"), F.col("ucnt").alias("cu2"))
    u3 = uni.select(F.col("token").alias("w3"), F.col("ucnt").alias("cu3"))
    scored = (
        tris.join(tri, ["w1", "w2", "w3"], "left")
        .join(b12, ["w1", "w2"], "left")
        .join(b23, ["w2", "w3"], "left")
        .join(F.broadcast(u2), "w2")
        .join(F.broadcast(u3), "w3")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "__s",
            F.round(
                F.when(
                    F.col("tcnt").isNotNull(),
                    F.log(F.col("tcnt") / F.col("c12")),
                )
                .when(
                    F.col("c23").isNotNull(),
                    F.log(F.lit(alpha) * F.col("c23") / F.col("cu2")),
                )
                .otherwise(
                    F.log(F.lit(alpha * alpha) * F.col("cu3")
                          / F.col("__total"))
                ),
                6,
            ).cast("decimal(20,6)"),
        )
    )
    per = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.sum("__s").alias("__sum"),
    )
    avg = (
        F.floor(
            F.col("__sum").cast("double") / F.col("n_transitions") * 1e6
            + 0.5
        ) / 1e6
    )
    ppl = F.floor(F.exp(-avg) * 1e4 + 0.5) / 1e4
    return (
        documents.select(id_col).join(per, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_transitions", F.lit(0)).cast("long")
            .alias("n_transitions"),
            avg.alias("avg_logscore"),
            ppl.alias("ppl"),
        )
    )


def fineweb_rules(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """r13 — the FineWeb custom quality filters (Penedo et al. 2024
    §3.1, the three line-level heuristics the paper adds BEYOND its
    Gopher/C4 base — this completes the public filter trio next to
    ``gopher_rules`` and ``c4_line_filter``):

    * punctuation rule: fraction of lines ending in terminal
      punctuation must be ≥ 0.12;
    * short-line rule: fraction of lines shorter than 30 chars must be
      ≤ 0.67;
    * duplicated-line rule: fraction of CHARACTERS sitting in repeat
      occurrences of a duplicated line (occurrences after each line's
      first) must be ≤ 0.10.

    Every threshold is tested in EXACT INTEGER cross-multiplication
    (the gopher_rules idiom — no float boundary can flip between
    engines); the reported ratios are informational roundings.  Plan:
    one split + explode, one (doc, line) count shuffle, one per-doc
    regroup — O(total lines), no UDF."""
    lines = documents.select(
        F.col(id_col), F.posexplode(F.split(F.col(text_col), "\n"))
        .alias("__i", "__line"),
    )
    per_line = lines.select(
        id_col,
        F.col("__line"),
        F.length("__line").cast("long").alias("__len"),
        F.col("__line").rlike("[.!?\"]$").cast("int").alias("__punct"),
        (F.length("__line") < 30).cast("int").alias("__short"),
    )
    dup = (
        per_line.groupBy(id_col, "__line")
        .agg(F.count(F.lit(1)).alias("c"), F.first("__len").alias("l"))
        .groupBy(id_col)
        .agg(F.sum((F.col("c") - 1) * F.col("l")).alias("dup_line_chars"))
    )
    per_doc = per_line.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("__punct").cast("long").alias("punct_lines"),
        F.sum("__short").cast("long").alias("short_lines"),
        F.sum("__len").cast("long").alias("total_line_chars"),
    )
    punct_ok = F.col("punct_lines") * 100 >= F.col("n_lines") * 12
    short_ok = F.col("short_lines") * 100 <= F.col("n_lines") * 67
    dup_ok = F.col("dup_line_chars") * 10 <= F.col("total_line_chars")
    return (
        per_doc.join(dup, id_col)
        .select(
            F.col(id_col),
            "n_lines", "punct_lines", "short_lines",
            "total_line_chars",
            F.col("dup_line_chars").cast("long").alias("dup_line_chars"),
            punct_ok.alias("punct_ok"),
            short_ok.alias("short_ok"),
            dup_ok.alias("dup_ok"),
            (punct_ok & short_ok & dup_ok).alias("passes"),
        )
    )


def lm_bigram_interpolated(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.7,
) -> DataFrame:
    """r13 — Jelinek-Mercer INTERPOLATED bigram smoothing (Jelinek &
    Mercer 1980; Chen & Goodman 1999 §2.4's baseline): every transition
    scores ln(λ·cnt(w₁w₂)/cnt(w₁) + (1−λ)·cnt(w₂)/total) — unlike
    stupid backoff, a PROPER probability (the mixture sums to 1 over
    w₂), and the unseen-bigram case is the same formula with a zero
    first term, not a separate branch.  λ = 0.7.  The third smoothing
    family next to stupid backoff (bigram + trigram) — the comparison
    that shows why web-scale LMs dropped interpolation: this needs the
    same count tables but held-out λ tuning, where backoff needs
    nothing.

    Same plan and determinism discipline as ``lm_bigram_stupid_backoff``:
    bigram counts shuffle on the pair key, unigrams + total broadcast,
    round-6 logs → DECIMAL(20,6) sums → floor-mean."""
    words = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    pairs_arr = F.expr(
        "zip_with(slice(__w, 1, greatest(size(__w) - 1, 0)),"
        " slice(__w, 2, greatest(size(__w) - 1, 0)),"
        " (a, b) -> struct(a as w1, b as w2))"
    )
    # r19-opt (guide §2.5): spread the sub-4GB corpus scan before the
    # CPU-bound explode+partial-agg map stages (see lm_5gram_kneser_ney);
    # both gram streams derive from the ONE spread frame so its exchange
    # is shared
    from .dedup import spread_for_compute

    d = spread_for_compute(documents.select(id_col, text_col))
    pairs = (
        d.withColumn("__w", words)
        .select(F.col(id_col), F.explode(pairs_arr).alias("p"))
        .select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    toks = d.select(
        F.col(id_col),
        F.explode(words).alias("token"),
    )
    # No-op isNotNull filter (split tokens are never null) aligning the
    # three uni copies' inferred join-key isnotnull sets so they share
    # one shuffle stage (r18-opt, the lm_5gram_kneser_ney shape).
    uni = toks.filter(F.col("token").isNotNull()).groupBy("token").agg(
        F.count(F.lit(1)).alias("ucnt")
    )
    tot = uni.groupBy().agg(F.sum("ucnt").alias("__total"))
    bi = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("bcnt"))
    u1 = uni.select(F.col("token").alias("w1"), F.col("ucnt").alias("c1"))
    u2 = uni.select(F.col("token").alias("w2"), F.col("ucnt").alias("c2"))
    mix = (
        F.lit(lam) * F.coalesce(F.col("bcnt"), F.lit(0)) / F.col("c1")
        + F.lit(1.0 - lam) * F.col("c2") / F.col("__total")
    )
    scored = (
        pairs.join(bi, ["w1", "w2"], "left")
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(tot))
        .withColumn("__s", F.round(F.log(mix), 6).cast("decimal(20,6)"))
    )
    per = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.sum("__s").alias("__sum"),
    )
    avg = (
        F.floor(
            F.col("__sum").cast("double") / F.col("n_transitions") * 1e6
            + 0.5
        ) / 1e6
    )
    ppl = F.floor(F.exp(-avg) * 1e4 + 0.5) / 1e4
    return (
        documents.select(id_col).join(per, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_transitions", F.lit(0)).cast("long")
            .alias("n_transitions"),
            avg.alias("avg_logscore"),
            ppl.alias("ppl"),
        )
    )


def lm_bigram_witten_bell(
    documents: DataFrame,
    train_docs: "DataFrame | None" = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """r14 — Witten-Bell smoothed bigram (Witten & Bell 1991, method C;
    Chen & Goodman 1999 §2.5) — the last classic member of the
    smoothing family next to Jelinek-Mercer, stupid backoff, and
    (modified) Kneser-Ney: interpolation whose mixture weight is the
    context's own TYPE/TOKEN ratio — contexts that keep producing new
    continuations trust the lower order more:

        P(w₂|w₁) = (c(w₁w₂) + N₁₊(w₁·)·P_uni(w₂))
                   / (N(w₁·) + N₁₊(w₁·))

    with N₁₊(w₁·) the distinct continuations of w₁, N(w₁·) its token
    count, and P_uni the train unigram MLE c(w₂)/total.  No tunable
    parameter and no count-of-counts regime — WB is total on any
    corpus (the contrast with modified KN's estimability guard).

    Train/score split, OOV accounting (a transition whose w₁ is an
    unseen context or whose w₂ is an unseen unigram is OOV — counted
    per doc, excluded from the mean), n_unseen, and the round-6-ln →
    DECIMAL(20,6) sum → floor-mean discipline are all inherited from
    the KN siblings; the per-transition dag is one fully-parenthesized
    IEEE-double expression mirrored verbatim in the oracle.

    Plan: the sibling shape exactly — one pair-key shuffle for the
    train bigram table; the context table (token count + distinct
    continuations), the unigram table, and the total are vocab-bounded
    (or 1-row) broadcasts."""
    if train_docs is None:
        train_docs = documents
    words = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    pairs_arr = F.expr(
        "zip_with(slice(__w, 1, greatest(size(__w) - 1, 0)),"
        " slice(__w, 2, greatest(size(__w) - 1, 0)),"
        " (a, b) -> struct(a as w1, b as w2))"
    )

    def to_pairs(df: DataFrame) -> DataFrame:
        # r19-opt (guide §2.5): spread the sub-4GB corpus scan before the
        # CPU-bound explode+partial-agg map stage (see lm_5gram_kneser_ney)
        from .dedup import spread_for_compute

        return (
            spread_for_compute(df.select(id_col, text_col))
            .withColumn("__w", words)
            .select(F.col(id_col), F.explode(pairs_arr).alias("p"))
            .select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        )

    # No-op isNotNull filters (split tokens are never null) aligning
    # each fan-out branch's inferred join-key isnotnull set so the
    # bi and uni subtrees share one shuffle stage per table (r18-opt,
    # the lm_5gram_kneser_ney shape).
    bi = to_pairs(train_docs).filter(
        F.col("w1").isNotNull() & F.col("w2").isNotNull()
    ).groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("bcnt")
    )
    left_tab = bi.groupBy("w1").agg(
        F.sum("bcnt").alias("n_w1"),
        F.count(F.lit(1)).alias("n1p_l"),
    )
    uni = (
        train_docs.withColumn("__w", words)
        .select(F.explode("__w").alias("w2"))
        .filter(F.col("w2").isNotNull())
        .groupBy("w2").agg(F.count(F.lit(1)).alias("c2"))
    )
    tot = uni.groupBy().agg(F.sum("c2").alias("__total"))
    prob = (
        "((cast(coalesce(bcnt, 0) as double)"
        " + (cast(n1p_l as double)"
        " * (cast(c2 as double) / cast(__total as double))))"
        " / (cast(n_w1 as double) + cast(n1p_l as double)))"
    )
    scored = (
        to_pairs(documents)
        .join(bi, ["w1", "w2"], "left")
        .join(F.broadcast(left_tab), "w1", "left")
        .join(F.broadcast(uni), "w2", "left")
        .crossJoin(F.broadcast(tot))
        .withColumn("__oov", F.col("n_w1").isNull() | F.col("c2").isNull())
        .withColumn(
            "__s",
            F.when(
                ~F.col("__oov"),
                F.round(F.log(F.expr(prob)), 6).cast("decimal(20,6)"),
            ),
        )
    )
    per = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.sum(F.col("__oov").cast("long")).alias("n_oov"),
        F.sum(
            (F.col("bcnt").isNull() & ~F.col("__oov")).cast("long")
        ).alias("n_unseen"),
        F.sum("__s").alias("__sum"),
        F.count("__s").alias("__n_scored"),
    )
    avg = (
        F.floor(
            F.col("__sum").cast("double") / F.col("__n_scored") * 1e6 + 0.5
        ) / 1e6
    )
    ppl = F.floor(F.exp(-avg) * 1e4 + 0.5) / 1e4
    return (
        documents.select(id_col).join(per, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_transitions", F.lit(0)).cast("long")
            .alias("n_transitions"),
            F.coalesce("n_oov", F.lit(0)).cast("long").alias("n_oov"),
            F.coalesce("n_unseen", F.lit(0)).cast("long").alias("n_unseen"),
            avg.alias("avg_logscore"),
            ppl.alias("ppl"),
        )
    )


def lm_bigram_modified_kneser_ney(
    documents: DataFrame,
    train_docs: "DataFrame | None" = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """r14 — MODIFIED Kneser-Ney bigram smoothing (Chen & Goodman 1999
    §3, eq. 26) — the variant their study found uniformly best and the
    one every toolkit (SRILM/KenLM) ships as "the" Kneser-Ney: instead
    of one fixed discount D, THREE count-class discounts D₁, D₂, D₃₊
    estimated from the train table's count-of-counts n₁..n₄ by the
    leave-one-out closed form:

        Y   = n₁ / (n₁ + 2·n₂)
        D₁  = 1 − 2·Y·n₂/n₁     (applied to bigrams seen once)
        D₂  = 2 − 3·Y·n₃/n₂     (seen twice)
        D₃₊ = 3 − 4·Y·n₄/n₃     (seen three or more times)

        P(w₂|w₁) = max(c(w₁w₂) − D(c), 0)/N(w₁·) + λ(w₁)·P_cont(w₂)
        λ(w₁) = (D₁·N₁(w₁·) + D₂·N₂(w₁·) + D₃₊·N₃₊(w₁·)) / N(w₁·)

    where Nₖ(w₁·) counts the distinct w₂ with c(w₁w₂) = k (3+ for the
    last), so the per-context freed mass is exactly what the class
    discounts removed and the mixture still sums to 1 over w₂.
    P_cont, the train/score split, OOV accounting (``n_oov`` excluded
    from the mean, ``n_unseen`` = scored-but-unseen transitions) and
    the round-6-ln → DECIMAL(20,6) sum → floor-mean discipline are all
    inherited from ``lm_bigram_kneser_ney``.

    Unestimable classes fall back, SRILM-style: Dₖ's closed form needs
    nₖ > 0 (its denominator); when a class has NO types at exactly
    that count the class discount falls back to Y itself — the Ney et
    al. (1994) single-discount estimate the toolkits substitute when
    the modified form is unestimable.  (A fallback Dₖ is only ever
    APPLIED if some bigram sits in that class — e.g. n₃ = 0 with
    counts ≥ 4 present — otherwise its per-context multiplier
    Nₖ(w₁·) is zero everywhere and the value is inert; it exists so
    the IEEE dag stays NaN-free, since NaN·0 = NaN would poison λ.)

    The regime the modified dag cannot survive — Y undefined
    (n₁ + 2·n₂ = 0, a fully saturated corpus) or a non-positive
    applied discount (C&G's closed form can go negative on
    adversarial count distributions; a zero-or-negative applied
    discount could drive some context's λ(w₁) ≤ 0 and an unseen
    transition into ln(≤0)) — DEGRADES gracefully (r15): all three
    class discounts fall back to the fixed D = 0.75 single-discount
    estimate and ``mkn_regime_ok`` reports ``false``, mirrored
    verbatim in the oracle.  (r14 raised in-plan here; ADVICE r14
    asked for degradation so scale sweeps over saturated fixtures
    never hard-fail.)

    Determinism: D₁/D₂/D₃₊ and every per-transition probability are
    single fully-parenthesized IEEE-double dags over exact integer
    counts, mirrored verbatim in the DuckDB oracle.

    Plan: identical shape to the single-discount KN — the train bigram
    table shuffles once on the pair key; the per-context table (now
    carrying N₁/N₂/N₃₊ alongside the total) and the continuation table
    are vocab-bounded broadcasts; the count-of-counts row is a 1-row
    broadcast."""
    if train_docs is None:
        train_docs = documents
    words = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    pairs_arr = F.expr(
        "zip_with(slice(__w, 1, greatest(size(__w) - 1, 0)),"
        " slice(__w, 2, greatest(size(__w) - 1, 0)),"
        " (a, b) -> struct(a as w1, b as w2))"
    )

    def to_pairs(df: DataFrame) -> DataFrame:
        # r19-opt (guide §2.5): spread the sub-4GB corpus scan before the
        # CPU-bound explode+partial-agg map stage (see lm_5gram_kneser_ney)
        from .dedup import spread_for_compute

        return (
            spread_for_compute(df.select(id_col, text_col))
            .withColumn("__w", words)
            .select(F.col(id_col), F.explode(pairs_arr).alias("p"))
            .select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        )

    from ..functions import count_rows_keeping

    # No-op filter (split tokens are never null) aligning each branch's
    # inferred isnotnull set so the five bi copies share one shuffle
    # stage (r18-opt, the lm_5gram_kneser_ney shape).
    bi = to_pairs(train_docs).filter(
        F.col("w1").isNotNull() & F.col("w2").isNotNull()
    ).groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("bcnt")
    )
    left_tab = bi.groupBy("w1").agg(
        F.sum("bcnt").alias("n_w1"),
        F.sum((F.col("bcnt") == 1).cast("long")).alias("nd1"),
        F.sum((F.col("bcnt") == 2).cast("long")).alias("nd2"),
        F.sum((F.col("bcnt") >= 3).cast("long")).alias("nd3p"),
    )
    right_tab = bi.groupBy("w2").agg(count_rows_keeping("bcnt").alias("n1p_r"))
    types = bi.groupBy().agg(count_rows_keeping("bcnt").alias("n_types"))
    cc = bi.groupBy().agg(
        F.sum((F.col("bcnt") == 1).cast("long")).alias("n1"),
        F.sum((F.col("bcnt") == 2).cast("long")).alias("n2"),
        F.sum((F.col("bcnt") == 3).cast("long")).alias("n3"),
        F.sum((F.col("bcnt") == 4).cast("long")).alias("n4"),
        F.sum((F.col("bcnt") >= 3).cast("long")).alias("n3p"),
    )
    # Discount dags mirrored verbatim in the oracle (op order is
    # bit-significant in IEEE double).  CASE = the SRILM-style
    # fallback: closed form when the class's count-of-count is
    # positive, else Y itself.
    y_expr = (
        "(cast(n1 as double)"
        " / (cast(n1 as double) + (cast(2 as double) * cast(n2 as double))))"
    )
    disc = cc.withColumn("__y", F.expr(y_expr)).select(
        F.expr(
            "(case when n1 > 0 then"
            " (cast(1 as double) - ((cast(2 as double) * __y)"
            " * (cast(n2 as double) / cast(n1 as double))))"
            " else __y end)"
        ).alias("__d1"),
        F.expr(
            "(case when n2 > 0 then"
            " (cast(2 as double) - ((cast(3 as double) * __y)"
            " * (cast(n3 as double) / cast(n2 as double))))"
            " else __y end)"
        ).alias("__d2"),
        F.expr(
            "(case when n3 > 0 then"
            " (cast(3 as double) - ((cast(4 as double) * __y)"
            " * (cast(n4 as double) / cast(n3 as double))))"
            " else __y end)"
        ).alias("__d3"),
        F.col("n1"),
        F.col("n2"),
        F.col("n3p"),
    )
    # Regime flag (r15, was an in-plan assert in r14): the modified
    # form is estimable only when Y is defined (n₁ + 2·n₂ > 0) AND
    # every discount with a nonempty count class came out POSITIVE
    # (C&G's closed form can go negative on adversarial count
    # distributions).  Outside that regime the estimator DEGRADES
    # instead of raising (ADVICE r14): all three class discounts fall
    # back to the Ney et al. (1994) fixed absolute discount D = 0.75
    # (the single-discount-KN baseline, lm_bigram_kneser_ney's
    # default) and ``mkn_regime_ok`` reports false — a saturated
    # corpus (every bigram count ≥ 5, the sf1 fixture) now scores
    # under plain absolute discounting rather than hard-failing the
    # sweep.  The CASE never lets the fallback regime's NULL/NaN Y
    # reach a multiplication, so λ stays finite.
    ok_sql = (
        "coalesce(((n1 + (2 * n2)) > 0)"
        " and ((n1 = 0) or (__d1 > cast(0 as double)))"
        " and ((n2 = 0) or (__d2 > cast(0 as double)))"
        " and ((n3p = 0) or (__d3 > cast(0 as double))), false)"
    )
    disc = disc.select(
        F.expr(
            f"(case when {ok_sql} then __d1"
            " else cast(0.75 as double) end)"
        ).alias("__d1"),
        F.expr(
            f"(case when {ok_sql} then __d2"
            " else cast(0.75 as double) end)"
        ).alias("__d2"),
        F.expr(
            f"(case when {ok_sql} then __d3"
            " else cast(0.75 as double) end)"
        ).alias("__d3"),
        F.expr(ok_sql).alias("mkn_regime_ok"),
    )
    dd = (
        "(case when coalesce(bcnt, 0) >= 3 then __d3"
        " when coalesce(bcnt, 0) = 2 then __d2"
        " when coalesce(bcnt, 0) = 1 then __d1"
        " else cast(0 as double) end)"
    )
    lam = (
        "((((__d1 * cast(nd1 as double)) + (__d2 * cast(nd2 as double)))"
        " + (__d3 * cast(nd3p as double))) / cast(n_w1 as double))"
    )
    prob = (
        f"((greatest(cast(coalesce(bcnt, 0) as double) - {dd},"
        f" cast(0 as double)) / cast(n_w1 as double))"
        f" + ({lam} * (cast(n1p_r as double) / cast(n_types as double))))"
    )
    scored = (
        to_pairs(documents)
        .join(bi, ["w1", "w2"], "left")
        .join(F.broadcast(left_tab), "w1", "left")
        .join(F.broadcast(right_tab), "w2", "left")
        .crossJoin(F.broadcast(types))
        .crossJoin(F.broadcast(disc))
        .withColumn(
            "__oov", F.col("n_w1").isNull() | F.col("n1p_r").isNull()
        )
        .withColumn(
            "__s",
            F.when(
                ~F.col("__oov"),
                F.round(F.log(F.expr(prob)), 6).cast("decimal(20,6)"),
            ),
        )
    )
    per = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.sum(F.col("__oov").cast("long")).alias("n_oov"),
        F.sum(
            (F.col("bcnt").isNull() & ~F.col("__oov")).cast("long")
        ).alias("n_unseen"),
        F.sum("__s").alias("__sum"),
        F.count("__s").alias("__n_scored"),
        # carries the in-plan regime assert through aggregation so
        # column pruning cannot drop it
        F.min("mkn_regime_ok").alias("mkn_regime_ok"),
    )
    avg = (
        F.floor(
            F.col("__sum").cast("double") / F.col("__n_scored") * 1e6 + 0.5
        ) / 1e6
    )
    ppl = F.floor(F.exp(-avg) * 1e4 + 0.5) / 1e4
    return (
        documents.select(id_col).join(per, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_transitions", F.lit(0)).cast("long")
            .alias("n_transitions"),
            F.coalesce("n_oov", F.lit(0)).cast("long").alias("n_oov"),
            F.coalesce("n_unseen", F.lit(0)).cast("long").alias("n_unseen"),
            avg.alias("avg_logscore"),
            ppl.alias("ppl"),
            F.coalesce("mkn_regime_ok", F.lit(True)).alias("mkn_regime_ok"),
        )
    )


def lm_bigram_kneser_ney(
    documents: DataFrame,
    train_docs: "DataFrame | None" = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """r14 — INTERPOLATED KNESER-NEY bigram smoothing (Kneser & Ney
    1995; Chen & Goodman 1999 §2.7) — the published standard the
    smoothing ladder tops out at: unigram MLE → stupid backoff →
    Jelinek-Mercer → KN.  Two ideas beyond JM: (1) ABSOLUTE
    DISCOUNTING — subtract a fixed D from every seen bigram count and
    hand exactly the freed mass λ(w₁) = D·N₁₊(w₁·)/N(w₁·) to the lower
    order; (2) the lower order is the CONTINUATION probability
    P_cont(w₂) = N₁₊(·w₂)/N_types (how many distinct contexts w₂
    follows), not raw frequency — the "San Francisco" argument:
    "Francisco" is frequent but follows only "San", so it should NOT
    be a likely novel continuation.

        P(w₂|w₁) = max(c(w₁w₂) − D, 0)/N(w₁·) + λ(w₁)·P_cont(w₂)

    with D = 0.75 (Chen & Goodman's fixed-discount baseline), N(w₁·) =
    Σ_w c(w₁w) (the left-context total from the bigram table itself,
    so the seen mass plus the discount mass sums to exactly 1),
    N₁₊(w₁·) / N₁₊(·w₂) the distinct right/left continuation counts,
    N_types the total distinct bigram count.

    ``train_docs`` (default: the scored corpus itself) provides the
    count tables — pass a held-out split to make unseen bigrams real:
    an unseen (w₁,w₂) scores λ(w₁)·P_cont(w₂) — finite, where raw MLE
    is ln 0.  Transitions whose w₁ never appears as a train left
    context or whose w₂ never appears as a train right context are OOV
    under a bigram-table-only model: counted per doc (``n_oov``) and
    excluded from the mean — stated, not faked.  ``n_unseen`` counts
    the scored-but-unseen transitions (the mass the λ·P_cont term
    carries).

    Determinism: every per-transition probability is a fixed dag of
    IEEE-double ops over exact integers, written as the SAME fully
    parenthesized expression in Spark and the DuckDB oracle — bit-
    identical inputs to round-6 ln → DECIMAL(20,6) sums → floor-mean
    (the lm_bigram_stupid_backoff discipline).

    Plan: train bigram counts shuffle once on the pair key (vocab²-
    bounded); the three KN statistics (left-context totals, right-
    continuation counts, N_types scalar) derive from that table;
    scoring joins corpus transitions to the bigram table on the pair
    key and broadcasts the two vocab-bounded side tables — the same
    shape as the JM/backoff siblings, one extra broadcast each way."""
    if train_docs is None:
        train_docs = documents
    words = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    pairs_arr = F.expr(
        "zip_with(slice(__w, 1, greatest(size(__w) - 1, 0)),"
        " slice(__w, 2, greatest(size(__w) - 1, 0)),"
        " (a, b) -> struct(a as w1, b as w2))"
    )

    def to_pairs(df: DataFrame) -> DataFrame:
        # r19-opt (guide §2.5): spread the sub-4GB corpus scan before the
        # CPU-bound explode+partial-agg map stage (see lm_5gram_kneser_ney)
        from .dedup import spread_for_compute

        return (
            spread_for_compute(df.select(id_col, text_col))
            .withColumn("__w", words)
            .select(F.col(id_col), F.explode(pairs_arr).alias("p"))
            .select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        )

    from ..functions import count_rows_keeping

    # No-op filter (split tokens are never null) aligning each branch's
    # inferred isnotnull set so the four bi copies share one shuffle
    # stage (r18-opt, the lm_5gram_kneser_ney shape).
    bi = to_pairs(train_docs).filter(
        F.col("w1").isNotNull() & F.col("w2").isNotNull()
    ).groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("bcnt")
    )
    left_tab = bi.groupBy("w1").agg(
        F.sum("bcnt").alias("n_w1"),
        F.count(F.lit(1)).alias("n1p_l"),
    )
    right_tab = bi.groupBy("w2").agg(count_rows_keeping("bcnt").alias("n1p_r"))
    types = bi.groupBy().agg(count_rows_keeping("bcnt").alias("n_types"))

    d = repr(float(discount))
    # ONE fully-parenthesized op dag, mirrored verbatim in the oracle SQL
    # (multiplication/division order is bit-significant in IEEE double)
    prob = (
        f"(greatest(cast(coalesce(bcnt, 0) as double) - cast({d} as double),"
        f" cast(0 as double)) / cast(n_w1 as double))"
        f" + ((cast({d} as double) * cast(n1p_l as double)"
        f" / cast(n_w1 as double))"
        f" * (cast(n1p_r as double) / cast(n_types as double)))"
    )
    scored = (
        to_pairs(documents)
        .join(bi, ["w1", "w2"], "left")
        .join(F.broadcast(left_tab), "w1", "left")
        .join(F.broadcast(right_tab), "w2", "left")
        .crossJoin(F.broadcast(types))
        .withColumn(
            "__oov", F.col("n_w1").isNull() | F.col("n1p_r").isNull()
        )
        .withColumn(
            "__s",
            F.when(
                ~F.col("__oov"),
                F.round(F.log(F.expr(prob)), 6).cast("decimal(20,6)"),
            ),
        )
    )
    per = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.sum(F.col("__oov").cast("long")).alias("n_oov"),
        F.sum(
            (F.col("bcnt").isNull() & ~F.col("__oov")).cast("long")
        ).alias("n_unseen"),
        F.sum("__s").alias("__sum"),
        F.count("__s").alias("__n_scored"),
    )
    avg = (
        F.floor(
            F.col("__sum").cast("double") / F.col("__n_scored") * 1e6 + 0.5
        ) / 1e6
    )
    ppl = F.floor(F.exp(-avg) * 1e4 + 0.5) / 1e4
    return (
        documents.select(id_col).join(per, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_transitions", F.lit(0)).cast("long")
            .alias("n_transitions"),
            F.coalesce("n_oov", F.lit(0)).cast("long").alias("n_oov"),
            F.coalesce("n_unseen", F.lit(0)).cast("long").alias("n_unseen"),
            avg.alias("avg_logscore"),
            ppl.alias("ppl"),
        )
    )


def lm_trigram_kneser_ney(
    documents: DataFrame,
    train_docs: "DataFrame | None" = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """r15 — INTERPOLATED TRIGRAM KNESER-NEY (Kneser & Ney 1995; Chen &
    Goodman 1999 §2.7 generalized to order 3) — completes the trigram
    ladder whose last rung was stupid backoff
    (``lm_trigram_stupid_backoff``): the full three-level interpolated
    recursion with fixed discount D at both upper levels and
    CONTINUATION counts below the top, exactly the published recursion:

        P(w₃|w₁w₂) = max(c(w₁w₂w₃) − D, 0)/c(w₁w₂·)
                      + λ(w₁w₂)·P_KN(w₃|w₂)
        λ(w₁w₂)    = D·N₁₊(w₁w₂·)/c(w₁w₂·)

        P_KN(w₃|w₂) = max(c'(w₂w₃) − D, 0)/N₁₊(·w₂·)
                      + λ'(w₂)·P_cont(w₃)
        λ'(w₂)      = D·N₁₊(w₂·)/N₁₊(·w₂·)

    where the MIDDLE level runs on continuation counts, not raw
    bigram counts — c'(w₂w₃) = N₁₊(·w₂w₃) (distinct w₁ preceding the
    bigram), N₁₊(·w₂·) = Σ_w c'(w₂w) (total trigram TYPES with middle
    w₂), N₁₊(w₂·) = distinct w₃ in the continuation table — and the
    base P_cont(w₃) = N₁₊(·w₃)/N_types₂ counts distinct (w₂,w₃)
    continuation types.  Each level hands down exactly the mass its
    discounts freed, so Σ_w₃ P(w₃|w₁w₂) = 1 — a PROPER distribution,
    unlike stupid backoff's unnormalized scores.

    ``train_docs`` (held-out split) makes unseen trigrams real: an
    unseen (w₁,w₂,w₃) whose context is known scores
    λ(w₁w₂)·P_KN(w₃|w₂) — finite where trigram MLE is ln 0.  A
    transition is OOV (excluded from the mean, counted in ``n_oov``)
    when its CONTEXT (w₁,w₂) never occurs in train or its w₃ never
    occurs as a continuation — the trigram-table-only analogue of the
    bigram operator's OOV rule; ``n_unseen`` counts scored
    transitions whose exact trigram is novel.

    Determinism: the per-transition probability is ONE fully
    parenthesized IEEE-double dag over exact integer counts, mirrored
    verbatim in the DuckDB oracle; round-6 ln → DECIMAL(20,6) sum →
    floor-mean, the family discipline.

    Plan (one rung above lm_bigram_kneser_ney's): the train trigram
    table shuffles once on the triple key (vocab³-bounded); the
    context table c(w₁w₂·)/N₁₊(w₁w₂·) and the continuation pair table
    c'(w₂w₃) derive from it by one reshuffle each and stay SHUFFLE
    joins (pair-cardinality — never broadcast, the same call the
    stupid-backoff sibling documents); the two w-keyed tables
    (N₁₊(·w₂·)+N₁₊(w₂·), N₁₊(·w₃)) are vocab-bounded broadcasts and
    N_types₂ is a 1-row broadcast."""
    if train_docs is None:
        train_docs = documents
    words = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    tri_arr = F.expr(
        "zip_with(slice(__w, 1, greatest(size(__w) - 2, 0)),"
        " zip_with(slice(__w, 2, greatest(size(__w) - 2, 0)),"
        "          slice(__w, 3, greatest(size(__w) - 2, 0)),"
        "          (b, c) -> struct(b as w2, c as w3)),"
        " (a, bc) -> struct(a as w1, bc.w2 as w2, bc.w3 as w3))"
    )

    def to_triples(df: DataFrame) -> DataFrame:
        # r19-opt (guide §2.5): spread the sub-4GB corpus scan before the
        # CPU-bound explode+partial-agg map stage (see lm_5gram_kneser_ney)
        from .dedup import spread_for_compute

        return (
            spread_for_compute(df.select(id_col, text_col))
            .withColumn("__w", words)
            .select(F.col(id_col), F.explode(tri_arr).alias("t"))
            .select(id_col, "t.w1", "t.w2", "t.w3")
        )

    from ..functions import count_rows_keeping

    # No-op filter (split tokens are never null) that aligns every
    # fan-out branch's inferred join-key isnotnull set, so the shared
    # tri/cont subtrees canonicalize identically and AQE reuses one
    # shuffle stage per table (r18-opt, the lm_5gram_kneser_ney shape).
    tri = to_triples(train_docs).filter(
        F.col("w1").isNotNull() & F.col("w2").isNotNull()
        & F.col("w3").isNotNull()
    ).groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).alias("tcnt")
    )
    # top-level context stats: totals + distinct continuations
    ctx2 = tri.groupBy("w1", "w2").agg(
        F.sum("tcnt").alias("n_ctx"),
        F.count(F.lit(1)).alias("n1p_ctx"),
    )
    # middle level: continuation counts c'(w2,w3) = distinct w1
    cont = tri.groupBy("w2", "w3").agg(
        count_rows_keeping("tcnt").alias("ccnt")
    )
    mid = cont.groupBy("w2").agg(
        F.sum("ccnt").alias("n_midctx"),
        F.count(F.lit(1)).alias("n1p_mid"),
    )
    low = cont.groupBy("w3").agg(count_rows_keeping("ccnt").alias("n1p_low"))
    types2 = cont.groupBy().agg(count_rows_keeping("ccnt").alias("n_types2"))

    d = repr(float(discount))
    pm = (
        f"((greatest(cast(coalesce(ccnt, 0) as double)"
        f" - cast({d} as double), cast(0 as double))"
        f" / cast(n_midctx as double))"
        f" + (((cast({d} as double) * cast(n1p_mid as double))"
        f" / cast(n_midctx as double))"
        f" * (cast(n1p_low as double) / cast(n_types2 as double))))"
    )
    prob = (
        f"((greatest(cast(coalesce(tcnt, 0) as double)"
        f" - cast({d} as double), cast(0 as double))"
        f" / cast(n_ctx as double))"
        f" + (((cast({d} as double) * cast(n1p_ctx as double))"
        f" / cast(n_ctx as double)) * {pm}))"
    )
    scored = (
        to_triples(documents)
        .join(tri, ["w1", "w2", "w3"], "left")
        .join(ctx2, ["w1", "w2"], "left")
        .join(cont, ["w2", "w3"], "left")
        .join(F.broadcast(mid), "w2", "left")
        .join(F.broadcast(low), "w3", "left")
        .crossJoin(F.broadcast(types2))
        .withColumn(
            "__oov", F.col("n_ctx").isNull() | F.col("n1p_low").isNull()
        )
        .withColumn(
            "__s",
            F.when(
                ~F.col("__oov"),
                F.round(F.log(F.expr(prob)), 6).cast("decimal(20,6)"),
            ),
        )
    )
    per = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.sum(F.col("__oov").cast("long")).alias("n_oov"),
        F.sum(
            (F.col("tcnt").isNull() & ~F.col("__oov")).cast("long")
        ).alias("n_unseen"),
        F.sum("__s").alias("__sum"),
        F.count("__s").alias("__n_scored"),
    )
    avg = (
        F.floor(
            F.col("__sum").cast("double") / F.col("__n_scored") * 1e6 + 0.5
        ) / 1e6
    )
    ppl = F.floor(F.exp(-avg) * 1e4 + 0.5) / 1e4
    return (
        documents.select(id_col).join(per, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_transitions", F.lit(0)).cast("long")
            .alias("n_transitions"),
            F.coalesce("n_oov", F.lit(0)).cast("long").alias("n_oov"),
            F.coalesce("n_unseen", F.lit(0)).cast("long").alias("n_unseen"),
            avg.alias("avg_logscore"),
            ppl.alias("ppl"),
        )
    )


def lm_5gram_kneser_ney(
    documents: DataFrame,
    train_docs: "DataFrame | None" = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """r16 (verdict item 5) — INTERPOLATED 5-GRAM KNESER-NEY, the KenLM
    production order (Heafield 2011 trains order-5 KN for the
    CCNet-style perplexity filter; Chen & Goodman 1999 §2.7 recursion
    two orders above ``lm_trigram_kneser_ney``): five levels with fixed
    discount D at every level above the base and CONTINUATION counts
    below the top —

        P(w₅|w₁..w₄) = max(c(w₁..w₅)−D,0)/c(w₁..w₄·)
                        + λ(w₁..w₄)·P₄(w₅|w₂w₃w₄)

    where λ(u) = D·N₁₊(u·)/c(u·), each lower level runs on the
    continuation counts derived from the level above's TYPE table
    (c'ₙ(u) = N₁₊(·u), the KenLM "adjusted counts" construction —
    every table derives from the single 5-gram count table), and the
    base P_cont(w₅) = N₁₊(·w₅)/N_types₂ over (w₄,w₅) continuation
    types.  Σ_w₅ P = 1 per context — a proper distribution at every
    level.

    At order 5 the sparsity regime is REAL: with the even-doc_ids
    train split, most eval 5-grams are unseen (``n_unseen``), so the
    score mass flows through the λ-chain — exactly the regime the
    order-5 filter runs in at crawl scale.  OOV rule one ladder up
    from the trigram sibling: a transition is OOV when its full
    4-word context never occurs in train or its w₅ never occurs as a
    continuation; a seen top context implies every lower context is
    defined (its suffixes appear in the derived tables).

    Determinism: ONE fully-parenthesized IEEE-double dag over exact
    integer counts, mirrored verbatim in the DuckDB oracle; round-6
    ln → DECIMAL(20,6) sum → floor-mean, the family discipline.

    Plan (two rungs above the trigram): the train 5-gram table
    shuffles once on the 5-key (corpus-bounded, sub-5-gram-token
    cardinality); the 4-context table and the order-4/order-3
    continuation tables stay SHUFFLE joins (tuple cardinality); the
    (w₄)-keyed and (w₅)-keyed tables are vocab-bounded broadcasts and
    N_types₂ is a 1-row broadcast — scoring is five key-joins over the
    eval 5-grams, nothing all-pairs, no window.  The derived tables all
    re-aggregate from the declarative t5 expression (the family keeps
    plans pure — no persist, so the driver gate never holds executor
    memory between queries), but each shared ladder table materializes
    its shuffle ONCE: every fan-out copy of t5/c4/c3/c2 is kept
    canonically identical (``count_rows_keeping`` pins the parent count
    column against pruning; the explicit all-five ``isNotNull`` filter
    on the train gram stream absorbs the per-branch join-key isnotnull
    sets that InferFiltersFromConstraints would otherwise push into
    each copy), so AQE exchange reuse collapses the r18-before shape of
    23 shuffle stages / 24 parquet scans into 11 stages / 3 scans —
    the corpus is scanned and exploded once for training, once for
    scoring (r18-opt, guide §2.4)."""
    if train_docs is None:
        train_docs = documents
    words = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    n5 = "greatest(size(__w) - 4, 0)"
    five_arr = F.expr(
        f"zip_with(slice(__w, 1, {n5}),"
        f" zip_with(slice(__w, 2, {n5}),"
        f"  zip_with(slice(__w, 3, {n5}),"
        f"   zip_with(slice(__w, 4, {n5}), slice(__w, 5, {n5}),"
        f"            (d, e) -> struct(d as w4, e as w5)),"
        f"   (c, de) -> struct(c as w3, de.w4 as w4, de.w5 as w5)),"
        f"  (b, x) -> struct(b as w2, x.w3 as w3, x.w4 as w4, x.w5 as w5)),"
        f" (a, y) -> struct(a as w1, y.w2 as w2, y.w3 as w3,"
        f"                  y.w4 as w4, y.w5 as w5))"
    )

    def to_fives(df: DataFrame) -> DataFrame:
        # r19-opt (guide §2.5 input skew): a small corpus parquet scans as
        # 1-2 splits and AQE's byte-based coalescing keeps it that narrow,
        # so the explode+hash+partial-agg map stage — the ladder's heavy
        # pass — ran serial (sf1: 4.7 effective cores on local[32]).
        # spread_for_compute repartitions only sub-4GB inputs; at the
        # 100 TB target the scan's own splits are trusted (no corpus
        # shuffle is added).
        from .dedup import spread_for_compute

        return (
            spread_for_compute(df.select(id_col, text_col))
            .withColumn("__w", words)
            .select(F.col(id_col), F.explode(five_arr).alias("t"))
            .select(id_col, "t.w1", "t.w2", "t.w3", "t.w4", "t.w5")
        )

    from ..functions import count_rows_keeping

    # The isNotNull filter keeps nothing out (split tokens are never
    # null): it exists so every fan-out branch's inferred join-key
    # isnotnull set is absorbed by the same superset and the t5 subtree
    # canonicalizes identically in all ten copies (AQE exchange reuse).
    t5 = to_fives(train_docs).filter(
        F.col("w1").isNotNull() & F.col("w2").isNotNull()
        & F.col("w3").isNotNull() & F.col("w4").isNotNull()
        & F.col("w5").isNotNull()
    ).groupBy("w1", "w2", "w3", "w4", "w5").agg(
        F.count(F.lit(1)).alias("tcnt")
    )
    ctx = t5.groupBy("w1", "w2", "w3", "w4").agg(
        F.sum("tcnt").alias("n_ctx"),
        F.count(F.lit(1)).alias("n1p_ctx"),
    )
    c4 = t5.groupBy("w2", "w3", "w4", "w5").agg(
        count_rows_keeping("tcnt").alias("ccnt4")
    )
    m4 = c4.groupBy("w2", "w3", "w4").agg(
        F.sum("ccnt4").alias("n4ctx"), F.count(F.lit(1)).alias("n1p4")
    )
    c3 = c4.groupBy("w3", "w4", "w5").agg(
        count_rows_keeping("ccnt4").alias("ccnt3")
    )
    m3 = c3.groupBy("w3", "w4").agg(
        F.sum("ccnt3").alias("n3ctx"), F.count(F.lit(1)).alias("n1p3")
    )
    c2 = c3.groupBy("w4", "w5").agg(
        count_rows_keeping("ccnt3").alias("ccnt2")
    )
    m2 = c2.groupBy("w4").agg(
        F.sum("ccnt2").alias("n2ctx"), F.count(F.lit(1)).alias("n1p2")
    )
    low = c2.groupBy("w5").agg(count_rows_keeping("ccnt2").alias("n1p_low"))
    types2 = c2.groupBy().agg(count_rows_keeping("ccnt2").alias("n_types2"))

    d = repr(float(discount))

    def kn_level(cnt: str, nctx: str, n1p: str, inner: str) -> str:
        return (
            f"((greatest(cast(coalesce({cnt}, 0) as double)"
            f" - cast({d} as double), cast(0 as double))"
            f" / cast({nctx} as double))"
            f" + (((cast({d} as double) * cast({n1p} as double))"
            f" / cast({nctx} as double)) * {inner}))"
        )

    pc = "(cast(n1p_low as double) / cast(n_types2 as double))"
    p2 = kn_level("ccnt2", "n2ctx", "n1p2", pc)
    p3 = kn_level("ccnt3", "n3ctx", "n1p3", p2)
    p4 = kn_level("ccnt4", "n4ctx", "n1p4", p3)
    prob = kn_level("tcnt", "n_ctx", "n1p_ctx", p4)
    scored = (
        to_fives(documents)
        .join(t5, ["w1", "w2", "w3", "w4", "w5"], "left")
        .join(ctx, ["w1", "w2", "w3", "w4"], "left")
        .join(c4, ["w2", "w3", "w4", "w5"], "left")
        .join(m4, ["w2", "w3", "w4"], "left")
        .join(c3, ["w3", "w4", "w5"], "left")
        .join(m3, ["w3", "w4"], "left")
        .join(c2, ["w4", "w5"], "left")
        .join(F.broadcast(m2), "w4", "left")
        .join(F.broadcast(low), "w5", "left")
        .crossJoin(F.broadcast(types2))
        .withColumn(
            "__oov", F.col("n_ctx").isNull() | F.col("n1p_low").isNull()
        )
        .withColumn(
            "__s",
            F.when(
                ~F.col("__oov"),
                F.round(F.log(F.expr(prob)), 6).cast("decimal(20,6)"),
            ),
        )
    )
    per = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.sum(F.col("__oov").cast("long")).alias("n_oov"),
        F.sum(
            (F.col("tcnt").isNull() & ~F.col("__oov")).cast("long")
        ).alias("n_unseen"),
        F.sum("__s").alias("__sum"),
        F.count("__s").alias("__n_scored"),
    )
    avg = (
        F.floor(
            F.col("__sum").cast("double") / F.col("__n_scored") * 1e6 + 0.5
        ) / 1e6
    )
    ppl = F.floor(F.exp(-avg) * 1e4 + 0.5) / 1e4
    return (
        documents.select(id_col).join(per, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_transitions", F.lit(0)).cast("long")
            .alias("n_transitions"),
            F.coalesce("n_oov", F.lit(0)).cast("long").alias("n_oov"),
            F.coalesce("n_unseen", F.lit(0)).cast("long").alias("n_unseen"),
            avg.alias("avg_logscore"),
            ppl.alias("ppl"),
        )
    )


def lm_trigram_witten_bell(
    documents: DataFrame,
    train_docs: "DataFrame | None" = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """r15 — Witten-Bell smoothed TRIGRAM (Witten & Bell 1991 method C;
    Chen & Goodman 1999 §2.5, order 3): completes the trigram ladder
    next to stupid backoff and interpolated KN with the parameter-free
    member — the mixture weight at each level is the context's own
    TYPE count, so contexts that keep producing new continuations
    trust the lower order more:

        P(w₃|w₁w₂) = (c(w₁w₂w₃) + T(w₁w₂)·P_wb(w₃|w₂))
                      / (N(w₁w₂·) + T(w₁w₂))
        P_wb(w₃|w₂) = (c(w₂w₃) + T(w₂)·P_uni(w₃))
                      / (N(w₂·) + T(w₂))

    with T(·) the distinct-continuation counts, N(·) the raw token
    totals at each level (WB interpolates RAW counts all the way down
    — the structural contrast with KN's continuation counts), and
    P_uni the train unigram MLE.  No tunable parameter, no
    count-of-counts regime: total on any corpus, saturated or not.

    OOV rule inherited from the bigram sibling, one order up: a
    transition is OOV when its (w₁,w₂) context never opens a train
    trigram or its w₃ is an unseen unigram (a seen trigram context
    implies its w₂ opens a train bigram, so the middle level is always
    defined for scored rows).  ``n_unseen`` counts scored transitions
    whose exact trigram is novel.  Round-6-ln → DECIMAL(20,6) sum →
    floor-mean, the family discipline; the per-transition dag is ONE
    fully-parenthesized IEEE-double expression mirrored verbatim in
    the oracle.

    Plan: train trigram table shuffles once on the triple key; the
    trigram-context and bigram tables stay SHUFFLE joins
    (pair-cardinality); the w₂-context, unigram, and total tables are
    vocab-bounded (or 1-row) broadcasts — the lm_trigram_kneser_ney
    shape with raw-count inputs."""
    if train_docs is None:
        train_docs = documents
    words = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    tri_arr = F.expr(
        "zip_with(slice(__w, 1, greatest(size(__w) - 2, 0)),"
        " zip_with(slice(__w, 2, greatest(size(__w) - 2, 0)),"
        "          slice(__w, 3, greatest(size(__w) - 2, 0)),"
        "          (b, c) -> struct(b as w2, c as w3)),"
        " (a, bc) -> struct(a as w1, bc.w2 as w2, bc.w3 as w3))"
    )
    pair_arr = F.expr(
        "zip_with(slice(__w, 1, greatest(size(__w) - 1, 0)),"
        " slice(__w, 2, greatest(size(__w) - 1, 0)),"
        " (a, b) -> struct(a as w2, b as w3))"
    )

    def to_triples(df: DataFrame) -> DataFrame:
        # r19-opt (guide §2.5): spread the sub-4GB corpus scan before the
        # CPU-bound explode+partial-agg map stage (see lm_5gram_kneser_ney)
        from .dedup import spread_for_compute

        return (
            spread_for_compute(df.select(id_col, text_col))
            .withColumn("__w", words)
            .select(F.col(id_col), F.explode(tri_arr).alias("t"))
            .select(id_col, "t.w1", "t.w2", "t.w3")
        )

    train_w = train_docs.withColumn("__w", words)
    # The isNotNull filters keep nothing out (split tokens are never
    # null): they align each fan-out branch's inferred join-key
    # isnotnull set so the tri/bi/uni subtrees canonicalize identically
    # across their two copies each and AQE reuses one shuffle stage per
    # table (r18-opt, the lm_5gram_kneser_ney shape).
    tri = to_triples(train_docs).filter(
        F.col("w1").isNotNull() & F.col("w2").isNotNull()
        & F.col("w3").isNotNull()
    ).groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).alias("tcnt")
    )
    ctx12 = tri.groupBy("w1", "w2").agg(
        F.sum("tcnt").alias("n_12"),
        F.count(F.lit(1)).alias("t_12"),
    )
    bi = (
        train_w.select(F.explode(pair_arr).alias("p"))
        .select("p.w2", "p.w3")
        .filter(F.col("w2").isNotNull() & F.col("w3").isNotNull())
        .groupBy("w2", "w3").agg(F.count(F.lit(1)).alias("bcnt"))
    )
    ctx2 = bi.groupBy("w2").agg(
        F.sum("bcnt").alias("n_2"),
        F.count(F.lit(1)).alias("t_2"),
    )
    uni = (
        train_w.select(F.explode("__w").alias("w3"))
        .filter(F.col("w3").isNotNull())
        .groupBy("w3").agg(F.count(F.lit(1)).alias("c3"))
    )
    tot = uni.groupBy().agg(F.sum("c3").alias("__total"))

    pb = (
        "((cast(coalesce(bcnt, 0) as double)"
        " + (cast(t_2 as double)"
        " * (cast(c3 as double) / cast(__total as double))))"
        " / (cast(n_2 as double) + cast(t_2 as double)))"
    )
    prob = (
        f"((cast(coalesce(tcnt, 0) as double)"
        f" + (cast(t_12 as double) * {pb}))"
        f" / (cast(n_12 as double) + cast(t_12 as double)))"
    )
    scored = (
        to_triples(documents)
        .join(tri, ["w1", "w2", "w3"], "left")
        .join(ctx12, ["w1", "w2"], "left")
        .join(bi, ["w2", "w3"], "left")
        .join(F.broadcast(ctx2), "w2", "left")
        .join(F.broadcast(uni), "w3", "left")
        .crossJoin(F.broadcast(tot))
        .withColumn("__oov", F.col("n_12").isNull() | F.col("c3").isNull())
        .withColumn(
            "__s",
            F.when(
                ~F.col("__oov"),
                F.round(F.log(F.expr(prob)), 6).cast("decimal(20,6)"),
            ),
        )
    )
    per = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.sum(F.col("__oov").cast("long")).alias("n_oov"),
        F.sum(
            (F.col("tcnt").isNull() & ~F.col("__oov")).cast("long")
        ).alias("n_unseen"),
        F.sum("__s").alias("__sum"),
        F.count("__s").alias("__n_scored"),
    )
    avg = (
        F.floor(
            F.col("__sum").cast("double") / F.col("__n_scored") * 1e6 + 0.5
        ) / 1e6
    )
    ppl = F.floor(F.exp(-avg) * 1e4 + 0.5) / 1e4
    return (
        documents.select(id_col).join(per, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_transitions", F.lit(0)).cast("long")
            .alias("n_transitions"),
            F.coalesce("n_oov", F.lit(0)).cast("long").alias("n_oov"),
            F.coalesce("n_unseen", F.lit(0)).cast("long").alias("n_unseen"),
            avg.alias("avg_logscore"),
            ppl.alias("ppl"),
        )
    )


def lm_trigram_interpolated(
    documents: DataFrame,
    train_docs: "DataFrame | None" = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    lambdas: tuple = (0.5, 0.3, 0.15, 0.05),
) -> DataFrame:
    """r15 — Jelinek-Mercer INTERPOLATED trigram smoothing (Jelinek &
    Mercer 1980; Chen & Goodman 1999 §2.4), completing the trigram
    ladder's fourth family next to stupid backoff, Kneser-Ney and
    Witten-Bell: every transition scores

        ln( λ₃·c(w₁w₂w₃)/c(w₁w₂) + λ₂·c(w₂w₃)/c(w₂)
          + λ₁·c(w₃)/total + λ₀/V )

    — a PROPER mixture distribution (each component sums to 1 over w₃;
    the λs sum to 1), with the uniform 1/V backstop Chen & Goodman use
    so even an OOV word scores finite mass.  A term whose context was
    never seen contributes exactly zero (its component is the empty
    distribution), not a special branch.  λ = (0.5, 0.3, 0.15, 0.05) —
    fixed, not held-out-tuned: the operator's contract is the mixture
    algebra, the weights are a documented config like alpha in backoff.

    ``train_docs`` splits train from eval (the family's even/odd
    discipline — odd docs then carry genuinely unseen trigrams AND
    genuinely OOV words exercising every mixture component).  Context
    counts follow the family convention: c(w₁w₂) is the trigram-prefix
    total (sum of trigram counts), c(w₂) the pair-prefix total.

    Determinism: round-6 logs, DECIMAL(20,6) sums, floor-mean — the
    ladder's exact discipline.  Plan: trigram/pair count tables shuffle
    on their n-gram keys (never broadcast); unigrams, the vocab size
    and the total broadcast — same shape as the other three rungs."""
    l3, l2, l1, l0 = lambdas
    train = train_docs if train_docs is not None else documents
    words = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    tri_arr = F.expr(
        "zip_with(slice(__w, 1, greatest(size(__w) - 2, 0)),"
        " zip_with(slice(__w, 2, greatest(size(__w) - 2, 0)),"
        "          slice(__w, 3, greatest(size(__w) - 2, 0)),"
        "          (b, c) -> struct(b as w2, c as w3)),"
        " (a, bc) -> struct(a as w1, bc.w2 as w2, bc.w3 as w3))"
    )
    pair_arr = F.expr(
        "zip_with(slice(__w, 1, greatest(size(__w) - 1, 0)),"
        " slice(__w, 2, greatest(size(__w) - 1, 0)),"
        " (a, b) -> struct(a as w2, b as w3))"
    )
    # r19-opt (guide §2.5): spread the sub-4GB corpus scans before the
    # CPU-bound explode+partial-agg map stages (see lm_5gram_kneser_ney)
    from .dedup import spread_for_compute

    eval_w = spread_for_compute(
        documents.select(id_col, text_col)
    ).withColumn("__w", words)
    train_w = spread_for_compute(
        train.select(id_col, text_col)
    ).withColumn("__w", words)
    tr = (
        eval_w.select(F.col(id_col), F.explode(tri_arr).alias("t"))
        .select(id_col, "t.w1", "t.w2", "t.w3")
    )
    # The isNotNull filters keep nothing out (split tokens are never
    # null): they align each fan-out branch's inferred join-key
    # isnotnull set so the ttr/tbi/uni subtrees canonicalize
    # identically across their two copies each and AQE reuses one
    # shuffle stage per table (r18-opt, the lm_5gram_kneser_ney shape).
    ttr = (
        train_w.select(F.explode(tri_arr).alias("t"))
        .select("t.w1", "t.w2", "t.w3")
        .filter(
            F.col("w1").isNotNull() & F.col("w2").isNotNull()
            & F.col("w3").isNotNull()
        )
        .groupBy("w1", "w2", "w3").agg(F.count(F.lit(1)).alias("tcnt"))
    )
    c12 = ttr.groupBy("w1", "w2").agg(F.sum("tcnt").alias("n12"))
    tbi = (
        train_w.select(F.explode(pair_arr).alias("p"))
        .select("p.w2", "p.w3")
        .filter(F.col("w2").isNotNull() & F.col("w3").isNotNull())
        .groupBy("w2", "w3").agg(F.count(F.lit(1)).alias("bcnt"))
    )
    c2 = tbi.groupBy("w2").agg(F.sum("bcnt").alias("n2"))
    uni = (
        train_w.select(F.explode("__w").alias("w3"))
        .filter(F.col("w3").isNotNull())
        .groupBy("w3").agg(F.count(F.lit(1)).alias("c3"))
    )
    tot = uni.groupBy().agg(
        F.sum("c3").alias("__total"),
        F.count(F.lit(1)).alias("__vocab"),
    )
    mix = (
        F.when(
            F.col("n12").isNotNull(),
            F.lit(l3) * F.coalesce(F.col("tcnt"), F.lit(0)) / F.col("n12"),
        ).otherwise(F.lit(0.0))
        + F.when(
            F.col("n2").isNotNull(),
            F.lit(l2) * F.coalesce(F.col("bcnt"), F.lit(0)) / F.col("n2"),
        ).otherwise(F.lit(0.0))
        + F.lit(l1) * F.coalesce(F.col("c3"), F.lit(0)) / F.col("__total")
        + F.lit(l0) / F.col("__vocab")
    )
    scored = (
        tr.join(ttr, ["w1", "w2", "w3"], "left")
        .join(c12, ["w1", "w2"], "left")
        .join(tbi, ["w2", "w3"], "left")
        .join(F.broadcast(c2), "w2", "left")
        .join(F.broadcast(uni), "w3", "left")
        .crossJoin(F.broadcast(tot))
        .withColumn("__unseen", F.col("tcnt").isNull())
        .withColumn("__s", F.round(F.log(mix), 6).cast("decimal(20,6)"))
    )
    per = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.sum(F.col("__unseen").cast("long")).alias("n_unseen"),
        F.sum("__s").alias("__sum"),
    )
    avg = (
        F.floor(
            F.col("__sum").cast("double") / F.col("n_transitions") * 1e6
            + 0.5
        ) / 1e6
    )
    ppl = F.floor(F.exp(-avg) * 1e4 + 0.5) / 1e4
    return (
        documents.select(id_col).join(per, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_transitions", F.lit(0)).cast("long")
            .alias("n_transitions"),
            F.coalesce("n_unseen", F.lit(0)).cast("long").alias("n_unseen"),
            avg.alias("avg_logscore"),
            ppl.alias("ppl"),
        )
    )


def watermark_zscore(
    documents: DataFrame,
    gamma_pct: int = 25,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """r15 — statistical watermark detection (Kirchenbauer et al. 2023,
    "A Watermark for Large Language Models", public paper): a
    watermarking LLM seeds a per-position "green list" (fraction
    γ = gamma_pct/100 of the vocabulary) from the PREVIOUS token's
    hash and biases sampling toward it; a detector needs no model —
    only the hash — and computes the one-proportion z-score of the
    observed green fraction: z = (g − γT) / sqrt(T·γ·(1−γ)).  The
    crawl-pipeline use is the reverse: flagging LLM-GENERATED text
    leaking into training corpora (synthetic-contamination triage,
    the modern sibling of benchmark decontamination).

    Deterministic, engine-portable re-expression: token w at position
    i is "green" iff the first 4 md5 hex digits of
    ``prev_token || '|' || w`` (mod 100) < γ·100 — the same
    hash-seeded partition the scheme's detector uses, reproducible in
    any engine.  T = scored positions (all but the first token);
    green count, γ·T in exact micro-unit integers, and ONE mirrored
    double z dag under the floor-6 discipline.  Natural text scores
    |z| ≈ small; a planted generator that respects the green rule
    scores high — the separation the pytest pins.

    Scale: map-only — tokenize, one zip_with over adjacent token
    pairs, two aggregates per doc inside the row; no shuffle, no
    state.  At 100 TB this rides the scan like every text score."""
    tk = F.split(F.col(text_col), " ")
    pairs = F.expr(
        "zip_with(slice(__tk, 1, size(__tk) - 1),"
        " slice(__tk, 2, size(__tk) - 1), (p, w) -> concat(p, '|', w))"
    )
    greens = F.expr(
        f"size(filter(__pairs, s ->"
        f" conv(substring(md5(s), 1, 4), 16, 10) % 100 < {gamma_pct}))"
    )
    out = (
        documents.select(F.col(id_col), tk.alias("__tk"))
        .filter(F.size("__tk") >= 2)
        .withColumn("__pairs", pairs)
        .select(
            F.col(id_col),
            F.size("__pairs").cast("long").alias("n_scored"),
            greens.cast("long").alias("n_green"),
        )
    )
    g = gamma_pct / 100.0
    z = (
        f"(n_green - {gamma_pct} * n_scored / 100.0)"
        f" / sqrt(n_scored * {g} * (1.0 - {g}))"
    )
    return out.select(
        id_col,
        "n_scored",
        "n_green",
        F.expr(f"floor(({z}) * 1e6 + 0.5) / 1e6").alias("z_score"),
        (F.col("n_green") * 100 > F.lit(gamma_pct) * F.col("n_scored"))
        .alias("above_expected"),
    )


# --------------------------------------------------------------------------
# Main-content extraction (boilerpipe-class, r17)
# --------------------------------------------------------------------------

#: Block-level tag boundary — the segmentation step of Kohlschütter et
#: al., "Boilerplate Detection using Shallow Text Features" (WSDM 2010):
#: inline tags (<a>, <b>, <span>…) stay inside a block, block tags split.
_BLOCK_TAG = (
    r"(?i)</?(?:p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tr|td|th"
    r"|section|article|header|footer|nav|aside|blockquote|pre|form"
    r"|figure|figcaption|main|hr|br)\b[^>]*>"
)


def main_content(documents: DataFrame, id_col: str = "doc_id",
                 text_col: str = "html") -> DataFrame:
    """Main-content extraction — the boilerpipe step real crawl curation
    runs BEFORE quality scoring (``strip_markup`` keeps nav/footer
    chrome; this separates article text from it).

    Method: the published NumWordsRulesClassifier decision rules from
    Kohlschütter et al. (WSDM 2010) — segment on block-level tags, then
    per block compute word count and LINK DENSITY (words inside <a>
    tags / words), and classify with the paper's thresholds over the
    (prev, curr, next) block context:

        curr_ld > 1/3                         → boilerplate
        prev_ld > 5/9:  content iff curr_nw > 40 or next_nw > 17
        else:           content iff curr_nw > 16
                                  or next_nw > 15
                                  or prev_nw > 4

    Everything is JVM expressions: split/regexp for segmentation,
    lag/lead windows partitioned BY DOCUMENT for context, conditional
    aggregation back to one row per doc.  At 100 TB this is a map +
    per-doc window + per-doc groupBy — no cross-doc shuffle beyond the
    doc_id hash partitioning, and block lists are bounded by document
    size."""
    from pyspark.sql import Window

    raw = F.col("__raw")
    strip = F.trim(F.regexp_replace(
        F.regexp_replace(raw, r"(?s)<[^>]*>", " "), r"\s+", " "))
    link_txt = F.concat_ws(" ", F.expr(
        r"regexp_extract_all(__raw, '(?is)<a\\b[^>]*>(.*?)</a\\s*>', 1)"))
    link_clean = F.trim(F.regexp_replace(
        F.regexp_replace(link_txt, r"(?s)<[^>]*>", " "), r"\s+", " "))

    blocks = (
        documents
        .select(F.col(id_col), F.posexplode(
            F.split(F.col(text_col), _BLOCK_TAG)).alias("__bidx", "__raw"))
        .withColumn("__clean", strip)
        .withColumn("__lclean", link_clean)
        .where(F.col("__clean") != "")
        .withColumn("__nw", F.size(F.split(F.col("__clean"), r"\s+")))
        .withColumn("__lnw", F.when(F.col("__lclean") == "", 0)
                    .otherwise(F.size(F.split(F.col("__lclean"), r"\s+"))))
        .withColumn("__ld", F.col("__lnw") / F.col("__nw"))
    )
    w = Window.partitionBy(id_col).orderBy("__bidx")
    blocks = (
        blocks
        .withColumn("__prev_nw", F.lag("__nw", 1, 0).over(w))
        .withColumn("__next_nw", F.lead("__nw", 1, 0).over(w))
        .withColumn("__prev_ld", F.lag("__ld", 1, 0.0).over(w))
    )
    is_content = (
        F.when(F.col("__ld") > 1.0 / 3.0, F.lit(False))
        .when(F.col("__prev_ld") > 5.0 / 9.0,
              (F.col("__nw") > 40) | (F.col("__next_nw") > 17))
        .otherwise((F.col("__nw") > 16) | (F.col("__next_nw") > 15)
                   | (F.col("__prev_nw") > 4))
    )
    blocks = blocks.withColumn("__keep", is_content)
    kept = F.when(F.col("__keep"),
                  F.struct(F.col("__bidx"), F.col("__clean")))
    agg = blocks.groupBy(id_col).agg(
        F.concat_ws(" ", F.transform(
            F.array_sort(F.collect_list(kept)), lambda s: s["__clean"]
        )).alias("main_text"),
        F.count("*").cast("int").alias("n_blocks"),
        F.sum(F.col("__keep").cast("int")).cast("int")
            .alias("n_content_blocks"),
        F.sum(F.when(F.col("__keep"), F.col("__nw")).otherwise(0))
            .cast("long").alias("n_words_main"),
        F.sum(F.when(~F.col("__keep"), F.col("__nw")).otherwise(0))
            .cast("long").alias("n_words_boiler"),
    )
    # a document with zero non-empty blocks (empty/NULL/pure-markup
    # html) must still come out — as an empty row, not silently dropped
    # from the corpus
    return documents.select(F.col(id_col)).join(agg, id_col, "left").select(
        F.col(id_col),
        F.coalesce("main_text", F.lit("")).alias("main_text"),
        F.coalesce("n_blocks", F.lit(0)).alias("n_blocks"),
        F.coalesce("n_content_blocks", F.lit(0)).alias("n_content_blocks"),
        F.coalesce("n_words_main", F.lit(0).cast("long"))
            .alias("n_words_main"),
        F.coalesce("n_words_boiler", F.lit(0).cast("long"))
            .alias("n_words_boiler"),
    )
