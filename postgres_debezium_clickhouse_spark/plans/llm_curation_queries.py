"""Curation family: splits, sampling, mixes, packing, chunking, boilerplate removal, shard export, training order, and the composed prep/curation/funnel pipelines.

Split out of plans/llm_queries.py (r7 verdict item 8); the
aggregator there merges every family's QUERIES/ORACLES so the driver
contract (__spark_entry__._MODULES) is unchanged.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.classifier import classifier_score
from ..operators.curation import (
    domain_mix_weights,
    domain_temperature_weights,
    hash_split,
    pack_best_fit,
    pack_chunks,
    pack_greedy,
    pii_scrub,
    remove_common_spans,
    sliding_window_chunks,
    stratified_sample,
    token_budget_sample,
    token_length_histogram,
)
from ..operators.dedup import exact_dedup
from ..operators.text import quality_score
from ..sources.files import load_table
from .llm_common import CDC_CHUNK_CTES as _CDC_CHUNK_CTES
from .llm_common import CLS_DIM as _CLS_DIM
from .llm_common import CLS_WEIGHTS as _CLS_WEIGHTS


def q_corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hash_split(load_table(spark, sf_dir, "documents"))


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stratified_sample(load_table(spark, sf_dir, "documents"), n_per_stratum=20)


def q_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_budget_sample(
        load_table(spark, sf_dir, "documents"), budget_tokens=1000
    )


def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return domain_temperature_weights(load_table(spark, sf_dir, "documents"), temperature=2.0)


def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform-target domain mixture weights over the documents corpus."""
    return domain_mix_weights(load_table(spark, sf_dir, "documents"))


def q_corpus_unimax_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — UniMax epoch-capped language sampling
    (operators/curation.unimax_mix_weights; Chung et al. ICLR 2023):
    the third mixing rule next to temperature and uniform-target —
    fill a 1.6× character budget without repeating any language more
    than 2 epochs.  The paper's sequential allocation is re-expressed
    as its prefix-monotone closed form over the per-language aggregate
    (exact integer arithmetic, windows over |languages| rows only);
    the oracle replays the identical integer math."""
    from ..operators.curation import unimax_mix_weights

    return unimax_mix_weights(
        load_table(spark, sf_dir, "documents"),
        epoch_cap=2, budget_num=8, budget_den=5,
    )


def q_quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r7: quality-WEIGHTED sampling — the step between hard filtering and
    uniform sampling in a data recipe: each document is kept with
    probability proportional to its classifier quality margin, but
    DETERMINISTICALLY (md5-uniform draw per doc_id, exact-integer accept
    test), so the sample is reproducible and the oracle can state every
    keep decision.  accept weight w = clamp(margin_milli + 2000, 0, 4000)
    (p = w/4000); draw u16 = first 4 md5 hex digits of the id (0..65535);
    keep ⟺ u16·4000 < w·65536 — pure integer comparison, engine-portable.
    Map-only at any scale (classifier margin + two hashes per row)."""
    from ..operators.classifier import classifier_score

    docs = load_table(spark, sf_dir, "documents")
    scored = classifier_score(docs, _CLS_WEIGHTS)
    w = F.greatest(F.lit(0), F.least(F.lit(4000), F.col("margin_milli") + 2000)).cast("long")
    u16 = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast("long")
    return scored.select(
        "doc_id",
        "margin_milli",
        w.alias("accept_weight"),
        ((u16 * 4000) < (w * 65536)).alias("kept"),
    )


def q_corpus_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r6: deterministic global training order (the export shuffle) —
    dense md5-order positions computed with parallel per-byte-shard
    windows + a broadcast prefix sum instead of a one-partition global
    window.  The oracle is the direct global ROW_NUMBER, so the sharded
    decomposition must agree with it exactly, position by position."""
    from ..operators.curation import training_order

    return training_order(load_table(spark, sf_dir, "documents"))


def q_corpus_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-export manifest (r6): deterministic md5-prefix shard
    assignment + per-shard doc/token counts and id ranges — the sanity
    report a 100 TB export publishes next to its files.  The assignment
    (int(md5(id)[:8], 16) % 16) is the same engine-portable idiom as
    hash_split, so DuckDB recomputes the whole manifest by value."""
    from ..operators.curation import shard_manifest

    return shard_manifest(load_table(spark, sf_dir, "documents"), n_shards=16)


def q_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_chunks(load_table(spark, sf_dir, "documents"), budget=256)


def q_pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_greedy(load_table(spark, sf_dir, "documents"), budget=256)


def q_pack_best_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r14 — Best-Fit-Decreasing packing (operators/curation
    .pack_best_fit): largest-first placement into the fullest bin that
    still fits, the classic 11/9·OPT heuristic next to pack_greedy's
    next-fit.  The DuckDB oracle replays the state machine as a
    recursive CTE carrying the full bin-fill LIST, so every placement
    decision (including fill ties → lowest bin id) is value-checked."""
    return pack_best_fit(load_table(spark, sf_dir, "documents"), budget=256)


def q_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-quality report over the greedy packer's output: bins used,
    capacity, and padding-waste fraction per shard — the number that tells
    you whether a packing strategy (or budget) is worth its cost.  Exact
    integer arithmetic end-to-end; two tiny aggs on top of pack_greedy
    (per-shard bin counts roll up to the per-language report, since bin
    ids are shard-local)."""
    packed = pack_greedy(load_table(spark, sf_dir, "documents"), budget=256)
    per_shard = packed.groupBy("lang", "shard").agg(
        (F.max("bin_id") + 1).alias("bins"),
        F.sum("n_tokens").alias("toks"),
    )
    return per_shard.groupBy("lang").agg(
        F.sum("bins").alias("n_bins"),
        F.sum("toks").alias("total_tokens"),
        (F.sum("bins") * 256).alias("capacity_tokens"),
        F.round(
            (F.sum("bins") * 256 - F.sum("toks")) / (F.sum("bins") * 256),
            6,
        ).alias("waste_pct"),
    )


def q_chunk_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 64/32 token windows per doc with portable md5
    fingerprints — the long-document chunker."""
    return sliding_window_chunks(load_table(spark, sf_dir, "documents"))


def q_chunk_content_defined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r6: content-defined chunking — rolling-hash boundaries (FastCDC at
    token granularity), so chunk fingerprints survive insertions across
    crawl snapshots where fixed windows shift.  The oracle recomputes the
    boundary rule and every chunk fingerprint in SQL."""
    from ..operators.curation import chunk_content_defined

    return chunk_content_defined(load_table(spark, sf_dir, "documents"))


def q_token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length distribution (64-token bins) — packing diagnostics."""
    return token_length_histogram(load_table(spark, sf_dir, "documents"))


def q_remove_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus REWRITE, not just a score: drop every 10-token span that
    appears in ≥3 distinct documents and re-emit the cleaned text — the
    C4 boilerplate-removal transformation."""
    return remove_common_spans(load_table(spark, sf_dir, "documents"), k=10, min_docs=3)


def q_llm_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data prep pipeline — quality gate → exact
    dedup → per-language corpus stats — one declarative plan (each stage's
    operators are individually oracle-checked above; this checks the
    composition)."""
    docs = load_table(spark, sf_dir, "documents")
    kept = quality_score(docs).filter(F.col("keep")).select("doc_id")
    surviving = docs.join(kept, "doc_id", "left_semi")
    deduped_ids = exact_dedup(surviving).select("doc_id")
    corpus = docs.join(deduped_ids, "doc_id", "left_semi")
    return (
        corpus.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("total_chars"),
            F.avg(F.size(F.split("text", " "))).alias("avg_tokens"),
        )
        .select("lang", "n_docs", "total_chars", F.round("avg_tokens", 4).alias("avg_tokens"))
    )


def q_llm_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation chain composed: quality gate → exact-dedup
    keep-list → PII scrub → deterministic split assignment → token count,
    one declarative plan producing the per-document training record."""
    docs = load_table(spark, sf_dir, "documents")
    kept_q = quality_score(docs).filter(F.col("keep")).select("doc_id")
    surviving = docs.join(kept_q, "doc_id", "left_semi")
    dedup_ids = exact_dedup(surviving).select("doc_id")
    corpus = surviving.join(dedup_ids, "doc_id", "left_semi")
    scrubbed = pii_scrub(corpus)
    split = hash_split(corpus)
    ntok = corpus.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    return (
        scrubbed.join(split, "doc_id")
        .join(ntok, "doc_id")
        .select("doc_id", "split", "n_tokens", "scrubbed")
    )


def q_llm_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation funnel report: per-stage survivor counts as the corpus
    flows raw → quality gate → adaptive per-lang length cutoff → exact
    dedup — the one-page answer to "where did my tokens go?".

    r19-opt (guide §8 decide-with-small-rows): the lazy composition of
    quality_score + adaptive_length_threshold + exact_dedup re-planned
    the whole upstream chain under every stage count — the executed plan
    scanned `documents` 30× and re-tokenized it ~5×.  Every decision the
    funnel makes depends only on (doc_id, lang, keep, n_tokens,
    text_hash), so ONE corpus pass computes that per-doc metadata frame
    (same signal definitions: text._quality_cols / _threshold_from_counts
    / dedup.normalize_text) and an eager localCheckpoint materializes it
    — index-sized, 5 narrow columns per doc, the r18 LSH-band-key class.
    Every stage count is a tiny aggregate over the checkpointed frame;
    the corpus text is read exactly once."""
    from ..operators.dedup import normalize_text
    from ..operators.text import _quality_cols, _threshold_from_counts

    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    meta = docs.select(
        "doc_id",
        "lang",
        _quality_cols("text")["keep"].alias("keep"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.sha2(normalize_text("text"), 256).alias("text_hash"),
    ).localCheckpoint(eager=True)
    gated = meta.filter(F.col("keep"))
    thr = _threshold_from_counts(gated.select("doc_id", "lang", "n_tokens"))
    gated2 = (
        gated.join(F.broadcast(thr), "lang")
        .filter(F.col("n_tokens") >= F.col("threshold_tokens"))
    )
    # exact_dedup ≡ one row per distinct normalized-text hash among the
    # stage-2 survivors — the hash is already on the metadata frame
    deduped = gated2.groupBy("text_hash").agg(F.min("doc_id").alias("doc_id"))

    def stage(i: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(i).alias("stage_id"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_docs"),
        )

    union = (
        stage(0, "raw", meta)
        .unionByName(stage(1, "quality_gate", gated))
        .unionByName(stage(2, "adaptive_length", gated2))
        .unionByName(stage(3, "exact_dedup", deduped))
    )
    # pct from the stage-0 row of the SAME frame — fully lazy, no separate
    # eager count() job at plan-build time
    raw_n = F.max(F.when(F.col("stage_id") == 0, F.col("n_docs"))).over(
        Window.partitionBy()
    )
    return union.select(
        "stage_id", "stage", "n_docs",
        F.round(F.col("n_docs") / raw_n, 6).alias("pct_of_raw"),
    )


def q_corpus_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r12 — DSIR importance weights (Xie et al. 2023): hashed
    unigram+bigram buckets (64, md5-prefix idiom), Laplace-smoothed
    target/raw bucket distributions, per-doc log importance weight as
    a round-6 DECIMAL sum.  Target = the fixture's planted near-dup
    docs (text ending ' dup') — their distribution puts real mass on
    the dup-feature buckets, so raw docs sharing those buckets
    up-weight: the estimator's discrimination is exercised on planted
    structure, not noise.  The oracle rebuilds buckets, smoothing,
    round-6 log-ratios and the decimal sums hash-for-hash."""
    from ..operators.curation import dsir_importance

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    target = docs.filter(F.col("text").endswith(" dup"))
    return dsir_importance(docs, target)


def q_corpus_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 — Fill-In-the-Middle training transform (Bavarian et al.
    2022; operators/curation.py ``fim_transform``): per doc the
    deterministic cut points, the PSM/SPM/none mode draw, and the
    sentinel-serialized training text.  The oracle replays the md5
    cut/mode arithmetic and the three-way substring re-ordering
    character-for-character."""
    from ..operators.curation import fim_transform

    return fim_transform(load_table(spark, sf_dir, "documents"))


def q_corpus_robots_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r16 — robots.txt crawl policy (RFC 9309, public:
    operators/curation.parse_robots + robots_decisions): per-domain
    robots files parsed into a rule dimension table (user-agent groups,
    Allow/Disallow with wildcard/anchor patterns compiled to regexes,
    Crawl-delay), then every URL decided by the RFC evaluation —
    longest-match wins, ALLOW wins ties, unmatched = allowed, the
    crawler's own group over ``*`` when present.  The fixture plants
    every branch: an Allow overriding a shorter Disallow, a
    ``/tmp*.log$`` wildcard+anchor rule, an equal-length allow/disallow
    tie, a ``*``-group-only rule that must NOT apply when the exact
    group exists, domains missing the exact group (fallback to ``*``),
    an irrelevant ``evil-bot`` group, comments and an empty Disallow.
    The DuckDB oracle restates every decision closed-form from doc_id —
    it never re-runs the matcher."""
    from ..operators.curation import parse_robots, robots_decisions

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    dom = F.concat(F.lit("dom"), d % 10)
    path = F.concat(
        F.element_at(
            F.array(
                F.lit("/private/ok/page"), F.lit("/private/page"),
                F.lit("/tmp"), F.lit("/blocked/page"),
                F.lit("/public/page"), F.lit("/dup"),
            ),
            (d % 6 + 1).cast("int"),
        ),
        d,
        F.when(d % 6 == 2, ".log").otherwise(""),
    )
    urls = docs.select(dom.alias("domain"), path.alias("path"))
    k = F.col("k")
    pdc_group = F.concat(
        F.lit("User-agent: pdc-bot\nAllow: /private/ok\n"
              "Disallow: /private\nDisallow: /tmp*.log$\n"
              "Allow: /dup\nDisallow: /dup\nDisallow:\nCrawl-delay: "),
        k % 5, F.lit("\n\n"),
    )
    robots_txt = F.concat(
        F.lit("# fixture robots\nUser-agent: evil-bot\nDisallow: /\n\n"),
        F.when(k % 3 != 0, pdc_group).otherwise(F.lit("")),
        F.lit("User-agent: *\nDisallow: /blocked\n"),
    )
    robots = (
        spark.range(10).select(F.col("id").alias("k"))
        .select(
            F.concat(F.lit("dom"), k).alias("domain"),
            robots_txt.alias("robots_txt"),
        )
    )
    rules = parse_robots(robots)
    return robots_decisions(urls, rules, agent="pdc-bot")


def q_corpus_sitemap_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r16 — sitemap discovery (sitemaps.org + RFC 9309 §Sitemap:
    operators/curation.robots_sitemaps + parse_sitemaps): the crawl
    FRONTIER side of the robots policy — ``Sitemap:`` lines lifted from
    robots.txt (global field, case-insensitive, repeatable) unioned
    with the parsed sitemap XML itself, BOTH document kinds (urlset
    leaves with optional per-url lastmod; sitemapindex pointers).
    Everything JVM-side: regexp_extract_all isolates entries (DOTALL,
    so optional lastmod can never misalign), xpath_string extracts
    fields.  Per-doc closed-form fixture; the oracle restates every
    row — including which entries carry lastmod — without xpath."""
    from ..operators.curation import parse_sitemaps, robots_sitemaps

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    dom = F.concat(F.lit("dom"), d)
    robots_txt = F.concat(
        F.lit("User-agent: *\nDisallow: /x\nSitemap: https://"),
        dom, F.lit("/sm.xml\n"),
        F.when(
            d % 2 == 0,
            F.concat(F.lit("sitemap: https://"), dom, F.lit("/sm2.xml\n")),
        ).otherwise(F.lit("")),
    )
    urlset = F.concat(
        F.lit("<urlset>"),
        F.expr(
            "array_join(transform(sequence(0, cast(doc_id % 4 as int)),"
            " j -> concat('<url><loc>https://dom', doc_id, '/u', j,"
            " '</loc>', if(j % 2 = 0,"
            " concat('<lastmod>2026-01-0', j + 1, '</lastmod>'), ''),"
            " '</url>')), '')"
        ),
        F.lit("</urlset>"),
    )
    index = F.concat(
        F.lit("<sitemapindex><sitemap><loc>https://"), dom,
        F.lit("/child1.xml</loc></sitemap><sitemap><loc>https://"), dom,
        F.lit("/child2.xml</loc><lastmod>2026-02-0"),
        (d % 9 + 1),
        F.lit("</lastmod></sitemap></sitemapindex>"),
    )
    site = docs.select(
        dom.alias("domain"),
        robots_txt.alias("robots_txt"),
        F.when(d % 3 == 0, index).otherwise(urlset).alias("sitemap_xml"),
    )
    from_robots = robots_sitemaps(site).select(
        "domain", F.lit("robots").alias("kind"),
        F.col("sitemap_url").alias("loc"),
        F.lit(None).cast("string").alias("lastmod"),
    )
    return from_robots.unionByName(parse_sitemaps(site))


def q_corpus_feed_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r18 — RSS/Atom feed parsing (operators/curation.parse_feeds):
    the third crawl-frontier leg next to robots policy and sitemap
    discovery — feeds announce fresh pages between sitemap crawls.
    Both formats on the oracle path: RSS items (link as element TEXT,
    pubDate, optional guid) and Atom entries (link as href ATTRIBUTE,
    published with the updated-element fallback, optional id); optional
    fields planted on modular schedules so misalignment anywhere fails
    the hash.  Same JVM idiom as parse_sitemaps: DOTALL
    regexp_extract_all fragment isolation + xpath_string fields, no
    Python."""
    from ..operators.curation import parse_feeds

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    dom = F.concat(F.lit("dom"), d)
    rss = F.concat(
        F.lit('<rss version="2.0"><channel><title>c</title>'),
        F.expr(
            "array_join(transform(sequence(0, cast(doc_id % 4 as int)),"
            " j -> concat('<item><title>post ', doc_id, '-', j,"
            " '</title><link>https://dom', doc_id, '/p', j, '</link>',"
            " if(j % 2 = 0, concat('<pubDate>Mon, 0', j + 1,"
            " ' Jan 2026 00:00:00 GMT</pubDate>'), ''),"
            " if(j % 3 = 0, concat('<guid>g-', doc_id, '-', j,"
            " '</guid>'), ''), '</item>')), '')"
        ),
        F.lit("</channel></rss>"),
    )
    atom = F.concat(
        F.lit('<feed xmlns="http://www.w3.org/2005/Atom">'
              "<title>f</title>"),
        F.expr(
            "array_join(transform(sequence(0, cast(doc_id % 4 as int)),"
            " j -> concat('<entry><title>post ', doc_id, '-', j,"
            " '</title><link href=\"https://dom', doc_id, '/p', j,"
            " '\"/>',"
            " if(j % 2 = 0, concat('<published>2026-01-0', j + 1,"
            " 'T00:00:00Z</published>'),"
            " concat('<updated>2026-02-0', j + 1,"
            " 'T00:00:00Z</updated>')),"
            " if(j % 3 = 0, concat('<id>tag:', doc_id, ',', j,"
            " '</id>'), ''), '</entry>')), '')"
        ),
        F.lit("</feed>"),
    )
    feeds = docs.select(
        dom.alias("domain"),
        F.when(d % 3 == 0, atom).otherwise(rss).alias("feed_xml"),
    )
    return parse_feeds(feeds)


def q_corpus_html_index_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r18 — page-level indexing signals (operators/curation.
    html_index_signals): the in-document complement to robots.txt —
    noindex/nofollow robots-meta token flags (``none`` = both) and the
    ``rel=canonical`` URL for syndication dedup.  Fixture cycles
    attribute ORDER, quote styles (double/single/unquoted), and
    presence schedules so every regex branch is on the oracle path;
    all JVM (lookahead regexes), no Python, no shuffle."""
    from ..operators.curation import html_index_signals

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    robots = (
        F.when(d % 4 == 0,
               F.lit('<meta name="robots" content="noindex">'))
        .when(d % 4 == 1,
              F.lit("<meta content='nofollow' name='robots'>"))
        .when(d % 4 == 2, F.lit("<meta name=robots content=none>"))
        .otherwise(F.lit('<meta name="viewport" content="width=1">'))
    )
    canon = F.when(
        d % 3 != 0,
        F.when(
            d % 2 == 0,
            F.concat(F.lit('<link rel="canonical" href="https://dom'),
                     d, F.lit('/c">')),
        ).otherwise(
            F.concat(F.lit("<link href='https://dom"), d,
                     F.lit("/c' rel='canonical'>")),
        ),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<html><head><title>t</title>"), robots, canon,
        F.lit("</head><body>doc "), d, F.lit("</body></html>"),
    )
    return html_index_signals(docs.select("doc_id", html.alias("html")))


QUERIES = {
    "corpus_robots_policy": q_corpus_robots_policy,
    "corpus_sitemap_discovery": q_corpus_sitemap_discovery,
    "corpus_feed_discovery": q_corpus_feed_discovery,
    "corpus_html_index_signals": q_corpus_html_index_signals,
    "corpus_fim_transform": q_corpus_fim_transform,
    "corpus_dsir_weights": q_corpus_dsir_weights,
    "corpus_split": q_corpus_split,
    "corpus_stratified_sample": q_stratified_sample,
    "corpus_token_budget_sample": q_token_budget_sample,
    "corpus_temperature_mix": q_temperature_mix,
    "corpus_domain_mix": q_domain_mix,
    "corpus_unimax_mix": q_corpus_unimax_mix,
    "corpus_weighted_sample": q_quality_weighted_sample,
    "corpus_training_order": q_corpus_training_order,
    "corpus_shard_manifest": q_corpus_shard_manifest,
    "pack_chunks": q_pack_chunks,
    "pack_greedy": q_pack_greedy,
    "pack_best_fit": q_pack_best_fit,
    "pack_efficiency": q_pack_efficiency,
    "chunk_sliding_windows": q_chunk_sliding_windows,
    "chunk_content_defined": q_chunk_content_defined,
    "token_length_histogram": q_token_length_histogram,
    "corpus_remove_boilerplate": q_remove_boilerplate,
    "llm_prep_pipeline": q_llm_prep_pipeline,
    "llm_curation_pipeline": q_llm_curation_pipeline,
    "llm_quality_funnel": q_llm_quality_funnel,
}

ORACLES = {
    # FIM replayed exactly: h1/h2 = the two 60-bit md5 halves of the id
    # string, cuts = h mod (len+1) sorted, gate = h1 mod 5 (>= 4 keeps
    # the doc untouched), mode = (h1+h2) parity, sentinel re-ordering
    "corpus_fim_transform": """
        WITH h AS (
            SELECT doc_id, COALESCE(text, '') AS text,
                   CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                                            1, 15)) AS BIGINT) AS h1,
                   CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                                            16, 15)) AS BIGINT) AS h2
            FROM documents
        ),
        c AS (
            SELECT doc_id, text, h1, h2,
                   LEAST(h1 % (length(text) + 1),
                         h2 % (length(text) + 1)) AS lo,
                   GREATEST(h1 % (length(text) + 1),
                            h2 % (length(text) + 1)) AS hi
            FROM h
        ),
        m AS (
            SELECT doc_id, text, lo, hi,
                   CASE WHEN h1 % 5 >= 4 THEN 'none'
                        WHEN (h1 + h2) % 2 = 0 THEN 'psm'
                        ELSE 'spm' END AS fim_mode,
                   substr(text, 1, CAST(lo AS INT)) AS pre,
                   substr(text, CAST(lo AS INT) + 1,
                          CAST(hi - lo AS INT)) AS mid,
                   substr(text, CAST(hi AS INT) + 1,
                          CAST(length(text) - hi AS INT)) AS suf
            FROM c
        )
        SELECT doc_id, fim_mode,
               CAST(lo AS BIGINT) AS cut_lo,
               CAST(hi AS BIGINT) AS cut_hi,
               CASE fim_mode
                   WHEN 'none' THEN text
                   WHEN 'psm' THEN '<|fim_prefix|>' || pre
                        || '<|fim_suffix|>' || suf
                        || '<|fim_middle|>' || mid
                   ELSE '<|fim_suffix|>' || suf
                        || '<|fim_prefix|>' || pre
                        || '<|fim_middle|>' || mid
               END AS fim_text
        FROM m
    """,
    "corpus_dsir_weights": """
        WITH w AS (
            SELECT doc_id, text,
                   list_filter(string_split(text, ' '), x -> x <> '') AS wd
            FROM documents
        ),
        feats AS (
            SELECT doc_id,
                   ('0x' || substr(md5(f), 1, 15))::BIGINT % 64 AS b
            FROM (
                SELECT doc_id, unnest(wd) AS f FROM w
                UNION ALL
                SELECT doc_id,
                       wd[CAST(i.i AS INT)] || ' ' || wd[CAST(i.i + 1 AS INT)] AS f
                FROM w CROSS JOIN LATERAL (
                    SELECT unnest(range(1, len(wd)))) i(i)
            )
        ),
        tgt_ids AS (SELECT doc_id FROM documents WHERE text LIKE '% dup'),
        rc AS (SELECT b, COUNT(*) AS c FROM feats GROUP BY b),
        tc AS (SELECT b, COUNT(*) AS c FROM feats
               WHERE doc_id IN (SELECT doc_id FROM tgt_ids) GROUP BY b),
        rt AS (SELECT COUNT(*) AS t FROM feats),
        tt AS (SELECT COUNT(*) AS t FROM feats
               WHERE doc_id IN (SELECT doc_id FROM tgt_ids)),
        tbl AS (
            SELECT g.b,
                   CAST(ROUND(
                       ln((COALESCE(tc.c, 0) + 1) * 1.0 / (tt.t + 64))
                       - ln((COALESCE(rc.c, 0) + 1) * 1.0 / (rt.t + 64)),
                       6) AS DECIMAL(20,6)) AS lr
            FROM (SELECT unnest(range(0, 64)) AS b) g
            LEFT JOIN rc ON rc.b = g.b
            LEFT JOIN tc ON tc.b = g.b
            CROSS JOIN rt CROSS JOIN tt
        ),
        per AS (
            SELECT f.doc_id, COUNT(*) AS n_feats, SUM(t.lr) AS lw
            FROM feats f JOIN tbl t ON t.b = f.b
            GROUP BY f.doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(p.n_feats, 0) AS BIGINT) AS n_feats,
               CAST(COALESCE(p.lw, 0) AS DOUBLE) AS log_weight
        FROM documents d LEFT JOIN per p USING (doc_id)
    """,
    "corpus_split": """
        SELECT doc_id,
               CASE WHEN h < 'cd' THEN 'train'
                    WHEN h < 'e6' THEN 'val'
                    ELSE 'test' END AS split
        FROM (SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS h
              FROM documents)
    """,
    "corpus_stratified_sample": """
        SELECT doc_id, lang
        FROM (SELECT doc_id, lang,
                     ROW_NUMBER() OVER (PARTITION BY lang
                         ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
              FROM documents)
        WHERE rn <= 20
    """,
    "corpus_token_budget_sample": """
        WITH d AS (SELECT doc_id, source,
                          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                   FROM documents),
        tot AS (SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
                FROM d GROUP BY source)
        SELECT d.doc_id, d.source, d.n_tokens
        FROM d JOIN tot USING (source)
        WHERE (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
               / 4294967296.0)
              < least(1.0, 1000.0 / tot.total_tokens)
    """,
    "corpus_temperature_mix": """
    WITH per AS (SELECT source, count(*) AS n_docs,
                        CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
                 FROM documents GROUP BY source)
    SELECT source, n_docs, total_tokens,
           ROUND(total_tokens / sum(total_tokens) OVER (), 6) AS token_share,
           ROUND(sqrt(total_tokens) / sum(sqrt(total_tokens)) OVER (), 6) AS temp_share,
           ROUND((sqrt(total_tokens) / sum(sqrt(total_tokens)) OVER ())
                 / (total_tokens / sum(total_tokens) OVER ()), 6) AS boost
    FROM per
""",
    # UniMax closed form replayed in the same exact integer arithmetic:
    # ascending (size, lang) order, capped prefix via the monotone
    # c_i test, leftover split evenly with remainder to the first rem
    "corpus_unimax_mix": """
        WITH per AS (
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS size_chars
            FROM documents GROUP BY lang
        ),
        o AS (
            SELECT per.*,
                   CAST(ROW_NUMBER() OVER (ORDER BY size_chars, lang)
                        AS BIGINT) AS rn,
                   CAST(COALESCE(SUM(size_chars) OVER (
                        ORDER BY size_chars, lang
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        AS BIGINT) AS pfx,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n_langs,
                   CAST(SUM(size_chars) OVER () * 8 // 5 AS BIGINT) AS budget
            FROM per
        ),
        c AS (
            SELECT o.*,
                   (2 * size_chars * (n_langs - rn + 1) + 2 * pfx)
                       <= budget AS capped
            FROM o
        ),
        m AS (
            SELECT c.*,
                   CAST(SUM(CASE WHEN capped THEN 1 ELSE 0 END) OVER ()
                        AS BIGINT) AS m,
                   CAST(COALESCE(SUM(CASE WHEN capped THEN size_chars END)
                        OVER (), 0) AS BIGINT) AS pm
            FROM c
        ),
        a AS (
            SELECT m.*,
                   CASE WHEN capped THEN 2 * size_chars
                        ELSE (budget - 2 * pm) // (n_langs - m)
                           + CASE WHEN (rn - m) <=
                                  (budget - 2 * pm) % (n_langs - m)
                                  THEN 1 ELSE 0 END
                   END AS alloc_chars
            FROM m
        )
        SELECT lang, n_docs, size_chars, capped,
               CAST(alloc_chars AS BIGINT) AS alloc_chars,
               CAST(CAST(alloc_chars AS HUGEINT) * 1000000 // size_chars
                    AS BIGINT) AS epochs_micro
        FROM a
    """,
    "corpus_domain_mix": """
        WITH per AS (SELECT source, COUNT(*) AS n_docs,
                            CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
                     FROM documents GROUP BY source)
        SELECT source, n_docs, total_tokens,
               ROUND(total_tokens / SUM(total_tokens) OVER (), 6) AS token_share,
               ROUND(SUM(total_tokens) OVER ()
                     / (COUNT(*) OVER () * total_tokens), 6) AS mix_weight
        FROM per
    """,
    "corpus_weighted_sample": f"""
    WITH w AS (SELECT {_CLS_WEIGHTS} AS wv),
    toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    scored AS (
        SELECT doc_id,
               CAST(list_sum(list_transform(tk,
                   t -> wv[('0x' || substr(md5(t), 1, 8))::BIGINT % {_CLS_DIM} + 1]))
                   AS BIGINT) AS m
        FROM toks, w),
    acc AS (
        SELECT doc_id, m,
               LEAST(GREATEST(m + 2000, 0), 4000) AS aw,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT AS u16
        FROM scored)
    SELECT doc_id, m AS margin_milli, CAST(aw AS BIGINT) AS accept_weight,
           u16 * 4000 < aw * 65536 AS kept
    FROM acc
""",
    "corpus_training_order": """
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
               ) - 1 AS BIGINT) AS train_order
        FROM documents
    """,
    "corpus_shard_manifest": """
        WITH a AS (
            SELECT doc_id,
                   CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                             AS BIGINT) % 16 AS INT) AS shard,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents
        )
        SELECT shard, COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
        FROM a GROUP BY shard
    """,
    "pack_chunks": """
        SELECT doc_id, lang, shard,
               CAST(c - n AS BIGINT) AS start_token,
               CAST(FLOOR((c - n) / 256) AS BIGINT) AS bin_first,
               CAST(FLOOR((c - 1) / 256) AS BIGINT) AS bin_last
        FROM (SELECT doc_id, lang, shard,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
                     SUM(len(string_split(text, ' ')))
                         OVER (PARTITION BY lang, shard ORDER BY doc_id) AS c
              FROM (SELECT *,
                           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 16 AS shard
                    FROM documents))
    """,
    "pack_greedy": """
        WITH RECURSIVE rows AS (
            SELECT doc_id, lang, shard,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
                   ROW_NUMBER() OVER (PARTITION BY lang, shard ORDER BY doc_id) AS rn
            FROM (SELECT *,
                         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 16 AS shard
                  FROM documents)),
        state AS (
            SELECT doc_id, lang, shard, n, rn, CAST(0 AS BIGINT) AS bin_id, n AS fill
            FROM rows WHERE rn = 1
            UNION ALL
            SELECT r.doc_id, r.lang, r.shard, r.n, r.rn,
                   CASE WHEN s.fill + r.n > 256 THEN s.bin_id + 1 ELSE s.bin_id END,
                   CASE WHEN s.fill + r.n > 256 THEN r.n ELSE s.fill + r.n END
            FROM state s JOIN rows r
              ON r.lang = s.lang AND r.shard = s.shard AND r.rn = s.rn + 1)
        SELECT doc_id, lang, shard, n AS n_tokens, bin_id FROM state
    """,
    "pack_best_fit": """
        WITH RECURSIVE rows AS (
            SELECT doc_id, lang, shard,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
                   ROW_NUMBER() OVER (PARTITION BY lang, shard
                       ORDER BY CAST(len(string_split(text, ' ')) AS BIGINT)
                                DESC, doc_id ASC) AS rn
            FROM (SELECT *,
                         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 16 AS shard
                  FROM documents)),
        state AS (
            SELECT lang, shard, CAST(0 AS BIGINT) AS rn,
                   CAST([] AS BIGINT[]) AS fills,
                   CAST(NULL AS BIGINT) AS doc_id,
                   CAST(NULL AS BIGINT) AS n,
                   CAST(NULL AS BIGINT) AS bin_id
            FROM (SELECT DISTINCT lang, shard FROM rows)
            UNION ALL
            SELECT r.lang, r.shard, r.rn,
                   CASE WHEN best.b IS NULL
                        THEN list_append(s.fills, r.n)
                        ELSE list_slice(s.fills, 1, best.idx - 1)
                             || [best.b + r.n]
                             || list_slice(s.fills, best.idx + 1,
                                           len(s.fills)) END,
                   r.doc_id, r.n,
                   CASE WHEN best.b IS NULL
                        THEN CAST(len(s.fills) AS BIGINT)
                        ELSE CAST(best.idx - 1 AS BIGINT) END
            FROM state s
            JOIN rows r ON r.lang = s.lang AND r.shard = s.shard
                       AND r.rn = s.rn + 1
            CROSS JOIN LATERAL (
                SELECT list_max(list_filter(s.fills,
                                            f -> f + r.n <= 256)) AS b,
                       list_position(s.fills,
                           list_max(list_filter(s.fills,
                                                f -> f + r.n <= 256))) AS idx
            ) best
        )
        SELECT doc_id, lang, shard, n AS n_tokens, bin_id
        FROM state WHERE rn > 0
    """,
    "pack_efficiency": """
        WITH RECURSIVE rows AS (
            SELECT doc_id, lang, shard,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
                   ROW_NUMBER() OVER (PARTITION BY lang, shard ORDER BY doc_id) AS rn
            FROM (SELECT *,
                         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 16 AS shard
                  FROM documents)),
        state AS (
            SELECT doc_id, lang, shard, n, rn, CAST(0 AS BIGINT) AS bin_id, n AS fill
            FROM rows WHERE rn = 1
            UNION ALL
            SELECT r.doc_id, r.lang, r.shard, r.n, r.rn,
                   CASE WHEN s.fill + r.n > 256 THEN s.bin_id + 1 ELSE s.bin_id END,
                   CASE WHEN s.fill + r.n > 256 THEN r.n ELSE s.fill + r.n END
            FROM state s JOIN rows r
              ON r.lang = s.lang AND r.shard = s.shard AND r.rn = s.rn + 1),
        per_shard AS (
            SELECT lang, shard, MAX(bin_id) + 1 AS bins, SUM(n) AS toks
            FROM state GROUP BY lang, shard)
        SELECT lang,
               CAST(SUM(bins) AS BIGINT) AS n_bins,
               CAST(SUM(toks) AS BIGINT) AS total_tokens,
               CAST(SUM(bins) * 256 AS BIGINT) AS capacity_tokens,
               ROUND((SUM(bins) * 256 - SUM(toks)) * 1.0
                     / (SUM(bins) * 256), 6) AS waste_pct
        FROM per_shard GROUP BY lang
    """,
    "chunk_sliding_windows": """
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        s AS (SELECT doc_id, tk,
                     unnest(range(0, greatest(len(tk) - 1, 0) + 1, 32)) AS start
              FROM t)
        SELECT doc_id,
               CAST(FLOOR(start / 32) AS INTEGER) AS chunk_id,
               CAST(start AS BIGINT) AS start_token,
               CAST(len(list_slice(tk, start + 1, start + 64)) AS BIGINT) AS n_tokens,
               md5(array_to_string(list_slice(tk, start + 1, start + 64), ' ')) AS chunk_md5
        FROM s
    """,
    "chunk_content_defined": """
        {CDC_CHUNK_CTES}
        SELECT doc_id, CAST(ci AS INT) AS chunk_index,
               CAST(MIN(i) AS BIGINT) AS start_token,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               md5(string_agg(tok, ' ' ORDER BY i)) AS chunk_md5
        FROM c GROUP BY doc_id, ci
    """,
    "token_length_histogram": """
        WITH t AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents)
        SELECT CAST(FLOOR(n / 64) * 64 AS BIGINT) AS bin_start,
               COUNT(*) AS n_docs,
               CAST(SUM(n) AS BIGINT) AS total_tokens,
               MIN(n) AS min_tokens,
               MAX(n) AS max_tokens
        FROM t GROUP BY 1
    """,
    "corpus_remove_boilerplate": """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    segs AS (
        SELECT doc_id, unnest(lst, recursive := true)
        FROM (SELECT doc_id,
                     [{'span_idx': i - 1,
                       'span': array_to_string(tk[(i - 1) * 10 + 1 : i * 10], ' ')}
                      for i in range(1, ((len(tk) + 9) // 10) + 1)] AS lst
              FROM toks)),
    sdf AS (SELECT span, count(DISTINCT doc_id) AS span_docs FROM segs GROUP BY span),
    j AS (SELECT s.doc_id, s.span_idx, s.span, d.span_docs < 3 AS keep
          FROM segs s JOIN sdf d USING (span))
    SELECT doc_id,
           count(*) AS n_spans,
           count(*) FILTER (WHERE NOT keep) AS n_dropped,
           coalesce(string_agg(span, ' ' ORDER BY span_idx) FILTER (WHERE keep), '')
               AS clean_text
    FROM j GROUP BY doc_id
""",
    "llm_prep_pipeline": """
        WITH t AS (SELECT doc_id, text, lang, string_split(text, ' ') AS tk FROM documents),
        q AS (SELECT doc_id FROM t
              WHERE (length(text) >= 100 AND length(text) <= 1000)
                AND ROUND(len(list_distinct(tk)) * 1.0 / len(tk), 4) >= 0.15
                AND ROUND(len(list_filter(tk, x -> x IN ('the', 'a', 'and', 'of'))) * 1.0 / len(tk), 4) <= 0.5),
        surviving AS (SELECT d.* FROM documents d WHERE EXISTS (SELECT 1 FROM q WHERE q.doc_id = d.doc_id)),
        dedup AS (SELECT MIN(doc_id) AS doc_id FROM surviving GROUP BY sha256(lower(trim(text)))),
        corpus AS (SELECT d.* FROM documents d WHERE EXISTS (SELECT 1 FROM dedup x WHERE x.doc_id = d.doc_id))
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(length(text)) AS BIGINT) AS total_chars,
               ROUND(AVG(len(string_split(text, ' '))), 4) AS avg_tokens
        FROM corpus GROUP BY lang
    """,
    "llm_curation_pipeline": r"""
        WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents),
        q AS (SELECT doc_id FROM t
              WHERE (length(text) >= 100 AND length(text) <= 1000)
                AND ROUND(len(list_distinct(tk)) * 1.0 / len(tk), 4) >= 0.15
                AND ROUND(len(list_filter(tk, x -> x IN ('the', 'a', 'and', 'of'))) * 1.0 / len(tk), 4) <= 0.5),
        surviving AS (SELECT d.* FROM documents d
                      WHERE EXISTS (SELECT 1 FROM q WHERE q.doc_id = d.doc_id)),
        dedup AS (SELECT MIN(doc_id) AS doc_id FROM surviving
                  GROUP BY sha256(lower(trim(text))))
        SELECT s.doc_id,
               CASE WHEN substr(md5(CAST(s.doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
                    WHEN substr(md5(CAST(s.doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
                    ELSE 'test' END AS split,
               CAST(len(string_split(s.text, ' ')) AS BIGINT) AS n_tokens,
               regexp_replace(regexp_replace(s.text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '[0-9]{7,}', '<NUM>', 'g') AS scrubbed
        FROM surviving s
        WHERE EXISTS (SELECT 1 FROM dedup x WHERE x.doc_id = s.doc_id)
    """,
    "llm_quality_funnel": """
        WITH t AS (SELECT doc_id, lang, text, string_split(text, ' ') AS tk FROM documents),
        g AS (SELECT doc_id, lang, text, CAST(len(tk) AS BIGINT) AS n_tokens FROM t
              WHERE length(text) >= 100 AND length(text) <= 1000
                AND ROUND(len(list_distinct(tk)) * 1.0 / len(tk), 4) >= 0.15
                AND ROUND(len(list_filter(tk, x -> x IN ('the', 'a', 'and', 'of'))) * 1.0 / len(tk), 4) <= 0.5),
        ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_tokens ASC, doc_id ASC) AS rn,
                          COUNT(*) OVER (PARTITION BY lang) AS cnt
                   FROM g),
        thr AS (SELECT lang, n_tokens AS th FROM ranked
                WHERE rn = GREATEST(CAST(FLOOR((cnt * 1 + 9) / 10) AS BIGINT), 1)),
        g2 AS (SELECT g.* FROM g JOIN thr USING (lang) WHERE g.n_tokens >= thr.th),
        dd AS (SELECT MIN(doc_id) AS doc_id FROM g2 GROUP BY sha256(lower(trim(text)))),
        raw AS (SELECT COUNT(*) AS n FROM documents)
        SELECT stage_id, stage, n_docs,
               ROUND(n_docs * 1.0 / (SELECT n FROM raw), 6) AS pct_of_raw
        FROM (
            SELECT 0 AS stage_id, 'raw' AS stage, (SELECT COUNT(*) FROM documents) AS n_docs
            UNION ALL SELECT 1, 'quality_gate', (SELECT COUNT(*) FROM g)
            UNION ALL SELECT 2, 'adaptive_length', (SELECT COUNT(*) FROM g2)
            UNION ALL SELECT 3, 'exact_dedup', (SELECT COUNT(*) FROM dd)
        )
    """,
}

# splice the shared content-defined-chunk CTE chain (one definition
# in llm_common so the two chunk oracles can never desynchronize)
ORACLES["chunk_content_defined"] = ORACLES["chunk_content_defined"].replace("{CDC_CHUNK_CTES}", _CDC_CHUNK_CTES)

ORACLES["corpus_robots_policy"] = """
    WITH p AS (
        SELECT doc_id,
               CAST(doc_id % 6 AS INT) AS cls,
               (doc_id % 10) % 3 = 0 AS star_dom,
               CAST(doc_id % 10 AS INT) AS k
        FROM documents
    )
    SELECT 'dom' || k AS domain,
           CASE cls WHEN 0 THEN '/private/ok/page' || doc_id
                    WHEN 1 THEN '/private/page' || doc_id
                    WHEN 2 THEN '/tmp' || doc_id || '.log'
                    WHEN 3 THEN '/blocked/page' || doc_id
                    WHEN 4 THEN '/public/page' || doc_id
                    ELSE '/dup' || doc_id END AS path,
           CASE WHEN star_dom THEN cls <> 3
                ELSE cls NOT IN (1, 2) END AS allowed,
           CASE WHEN star_dom AND cls = 3 THEN '/blocked'
                WHEN NOT star_dom AND cls = 0 THEN '/private/ok'
                WHEN NOT star_dom AND cls = 1 THEN '/private'
                WHEN NOT star_dom AND cls = 2 THEN '/tmp*.log$'
                WHEN NOT star_dom AND cls = 5 THEN '/dup'
           END AS matched_rule,
           CASE WHEN NOT star_dom
                THEN CAST(k % 5 AS DOUBLE) END AS crawl_delay
    FROM p
"""

ORACLES["corpus_html_index_signals"] = """
    SELECT doc_id,
           doc_id % 4 IN (0, 2) AS noindex,
           doc_id % 4 IN (1, 2) AS nofollow,
           CASE WHEN doc_id % 3 != 0
                THEN 'https://dom' || doc_id || '/c' END AS canonical_url
    FROM documents
"""

ORACLES["corpus_feed_discovery"] = """
    WITH d AS (SELECT doc_id, 'dom' || doc_id AS domain FROM documents),
    items AS (
        SELECT d.doc_id, d.domain, j.j
        FROM d CROSS JOIN LATERAL (
            SELECT unnest(range(0, CAST(doc_id % 4 AS INT) + 1))) j(j)
    )
    SELECT domain,
           CASE WHEN doc_id % 3 = 0 THEN 'atom' ELSE 'rss' END AS kind,
           'post ' || doc_id || '-' || j AS title,
           'https://' || domain || '/p' || j AS link,
           CASE WHEN doc_id % 3 = 0 THEN
                    CASE WHEN j % 2 = 0
                         THEN '2026-01-0' || (j + 1) || 'T00:00:00Z'
                         ELSE '2026-02-0' || (j + 1) || 'T00:00:00Z' END
                WHEN j % 2 = 0
                     THEN 'Mon, 0' || (j + 1) || ' Jan 2026 00:00:00 GMT'
           END AS published,
           CASE WHEN j % 3 = 0 THEN
                    CASE WHEN doc_id % 3 = 0
                         THEN 'tag:' || doc_id || ',' || j
                         ELSE 'g-' || doc_id || '-' || j END
           END AS guid
    FROM items
"""

ORACLES["corpus_sitemap_discovery"] = """
    WITH d AS (SELECT doc_id, 'dom' || doc_id AS domain FROM documents)
    SELECT domain, 'robots' AS kind,
           'https://' || domain || '/sm.xml' AS loc,
           CAST(NULL AS VARCHAR) AS lastmod
    FROM d
    UNION ALL
    SELECT domain, 'robots', 'https://' || domain || '/sm2.xml', NULL
    FROM d WHERE doc_id % 2 = 0
    UNION ALL
    SELECT domain, 'urlset',
           'https://' || domain || '/u' || j.j,
           CASE WHEN j.j % 2 = 0 THEN '2026-01-0' || (j.j + 1) END
    FROM d CROSS JOIN LATERAL (
        SELECT unnest(range(0, CAST(doc_id % 4 AS INT) + 1))) j(j)
    WHERE doc_id % 3 <> 0
    UNION ALL
    SELECT domain, 'index', 'https://' || domain || '/child1.xml', NULL
    FROM d WHERE doc_id % 3 = 0
    UNION ALL
    SELECT domain, 'index', 'https://' || domain || '/child2.xml',
           '2026-02-0' || (doc_id % 9 + 1)
    FROM d WHERE doc_id % 3 = 0
"""
