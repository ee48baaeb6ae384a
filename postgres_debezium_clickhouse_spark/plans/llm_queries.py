"""LLM training-data pipeline queries: dedup suite, similarity search,
text analysis, multimodal plumbing — wired to DuckDB oracles.

These operators go beyond the reference (which has no document corpus) but
are first-class engine components for the 100 TB target.  All hashes are
md5-based so the oracles reproduce results exactly (see operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    connected_components,
    connected_components_star,
    exact_dedup,
    incremental_dedup,
    minhash_lsh_near_dups,
    ngram_jaccard_blocked,
    simhash,
)
from ..operators.curation import (
    contamination_check,
    domain_mix_weights,
    hash_split,
    pack_chunks,
    pack_greedy,
    pii_scrub,
    sliding_window_chunks,
    stratified_sample,
    token_budget_sample,
    token_length_histogram,
)
from ..operators.audio import decode_waveforms, synth_waveforms
from ..operators.video import decode_video_frames, synth_videos
from ..operators.imaging import decode_images, synth_images
from ..operators.multimodal import (
    attach_fake_media,
    extract_features,
    media_byte_stats,
    resize_media,
    sample_frames,
)
from ..operators.similarity import (
    cosine_topk,
    embedding_near_dups,
    ivf_ann_topk,
    ivf_ann_topk_table,
    lsh_ann_buckets,
    lsh_ann_topk,
    semantic_dedup,
)
from ..operators.text import (
    adaptive_length_threshold,
    boilerplate_ngrams,
    commonness_score,
    fingerprint,
    gopher_rules,
    language_id,
    quality_score,
    repetition_score,
    text_stats,
    tfidf_top_terms,
    token_count_regex,
    vocab_topk,
)
from ..sources.files import load_table

# ---------------------------------------------------------------------------
# Spark queries
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(load_table(spark, sf_dir, "documents"))


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_near_dups(load_table(spark, sf_dir, "documents"), threshold=0.8, persist=True)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash(load_table(spark, sf_dir, "documents"))


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: MinHash-LSH pairs → connected components → one
    canonical doc per transitive dup group, emitted as a full-corpus
    (doc_id, canonical_id) keep/drop assignment (singletons map to
    themselves).  The step pairwise dedup cannot express: if A~B and B~C
    but A≁C, dropping per-pair either loses C's cluster membership or keeps
    a dup — the component label is the correct grouping."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_near_dups(docs, threshold=0.8, persist=True)
    comp = connected_components(pairs.select("doc_a", "doc_b"))
    return (
        docs.select("doc_id")
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select("doc_id", F.coalesce("component", "doc_id").alias("canonical_id"))
    )


def q_dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same contract and oracle as ``dedup_clusters``, computed by the
    O(log²n)-round star-contraction algorithm instead of diameter-round
    min-label propagation — the documented scale swap-in for long-chain
    dup graphs, driver-checked against the identical recursive-CTE
    closure."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_near_dups(docs, threshold=0.8, persist=True)
    comp = connected_components_star(pairs.select("doc_a", "doc_b"))
    return (
        docs.select("doc_id")
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select("doc_id", F.coalesce("component", "doc_id").alias("canonical_id"))
    )


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_blocked(
        docs, block_expr=F.concat_ws("|", "lang", "source"), threshold=0.2
    )


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


def q_corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hash_split(load_table(spark, sf_dir, "documents"))


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark contamination: every doc_id %50==0 plays the held-out
    benchmark; the rest are the training corpus."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    train = docs.filter(F.col("doc_id") % 50 != 0)
    return contamination_check(train, bench)


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stratified_sample(load_table(spark, sf_dir, "documents"), n_per_stratum=20)


def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_score(load_table(spark, sf_dir, "documents"))


def q_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vocab_topk(load_table(spark, sf_dir, "documents"), k=100)


def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tfidf_top_terms(load_table(spark, sf_dir, "documents"), k=3)


def q_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_chunks(load_table(spark, sf_dir, "documents"), budget=256)


def q_pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_greedy(load_table(spark, sf_dir, "documents"), budget=256)


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id")
    corpus = emb.filter(F.col("vec_id") >= 5)
    return cosine_topk(corpus, queries, k=5)


def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_near_dups(load_table(spark, sf_dir, "embeddings"), threshold=0.4)


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH ANN — fully oracle-checked: the md5-portable hyperplanes
    (operators/similarity.random_hyperplanes) are reconstructed inside the
    DuckDB oracle, so bucketing, candidate retrieval, and scores all
    hash-match; recall vs exact top-k is additionally asserted in
    tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id")
    corpus = emb.filter(F.col("vec_id") >= 5)
    return lsh_ann_topk(corpus, queries, k=5, n_planes=4)


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN — fully oracle-checked (unlike sign-LSH, whose numpy
    hyperplanes aren't SQL-portable): centroids are the 16 lowest-id corpus
    vectors, so DuckDB reproduces the index, probes, and scores exactly."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id")
    corpus = emb.filter(F.col("vec_id") >= 5)
    return ivf_ann_topk(corpus, queries, k=5, n_centroids=16, n_probe=4)


def q_ann_ivf_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid-TABLE IVF (r5): identical semantics/parameters to
    ``similarity_ann_ivf_topk`` but the index is a DataFrame folded into a
    one-row broadcast array — the large-k scale path (plan literals stop
    at 256 cells; this holds to 10^4-10^5).  Shares the literal variant's
    oracle: results must match bit-for-bit."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id")
    corpus = emb.filter(F.col("vec_id") >= 5)
    return ivf_ann_topk_table(corpus, queries, k=5, n_centroids=16, n_probe=4)


def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization report (r5): per-dimension corpus min/max
    grid, floor-based codes (engine-unambiguous — round-half ties are
    not), per-vector code stats + max reconstruction error.  The oracle
    recomputes the grid and every code in SQL."""
    from ..operators.similarity import quantize_embeddings

    return quantize_embeddings(load_table(spark, sf_dir, "embeddings"))


def q_ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN index-build side (bucket occupancy) — oracle-checked via the
    same md5-portable hyperplanes."""
    return lsh_ann_buckets(load_table(spark, sf_dir, "embeddings"), n_planes=8)


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_stats(load_table(spark, sf_dir, "documents"))


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return language_id(load_table(spark, sf_dir, "documents"))


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_score(load_table(spark, sf_dir, "documents"))


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_count_regex(load_table(spark, sf_dir, "documents"))


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprint(load_table(spark, sf_dir, "documents"))


def q_multimodal_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_byte_stats(attach_fake_media(load_table(spark, sf_dir, "documents")))


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas feature extraction (the decode stub) —
    fully oracle-checked: the fake decode is a byte-mod-4 histogram over
    the utf-8 text bytes, which DuckDB reproduces character-wise (the
    fixture text is pure ASCII, so ascii(char) == byte).

    The feature vector is posexploded to scalar (pos, value) rows: the
    driver's canonicalizer sorts every output column and cannot sort an
    array column, so registered queries must emit scalar columns only
    (enforced by tests/test_registry.py)."""
    media = attach_fake_media(load_table(spark, sf_dir, "documents"))
    return extract_features(media).select(
        "doc_id",
        "n_bytes",
        F.posexplode("feature").alias("feature_pos", "feature_value"),
    ).withColumn("feature_pos", F.col("feature_pos").cast("long"))


def q_multimodal_thumbnails(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing (mapInPandas; stubbed resampler) — the projected
    (id, dims) output is deterministic, so the Arrow round trip itself is
    oracle-checked; byte-level size invariants live in
    tests/test_multimodal.py."""
    media = attach_fake_media(load_table(spark, sf_dir, "documents"))
    return resize_media(media, width=8, height=8).select("doc_id", "width", "height")


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (one blob → N rows via mapInPandas) — the expansion
    cardinality is deterministic and oracle-checked."""
    media = attach_fake_media(load_table(spark, sf_dir, "documents"))
    return sample_frames(media, n_frames=4).select("doc_id", "frame_index")


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode (r5): synthesize a real PNG per document (pixel
    values a closed-form function of doc_id; scanline filters cycling 0-4)
    or, every 4th doc, a JPEG header — then run the stdlib decoder
    (operators/imaging.py) and emit integer-exact channel sums.  The
    DuckDB oracle recomputes the sums from the pixel formula with range()
    cross joins, so chunk parsing, CRC checks, zlib inflate, and all five
    un-filter branches are value-checked end-to-end."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_images(synth_images(docs))


def q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode (r5): a real RIFF/WAVE (16-bit PCM) per document
    with closed-form samples, decoded by the stdlib ``wave`` path
    (operators/audio.py) into integer-exact sample stats; the DuckDB
    oracle recomputes them from the sample formula."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_waveforms(synth_waveforms(docs))


def q_multimodal_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container decode (r5): a real Y4M stream per document
    (closed-form plane bytes), walked by the stdlib decoder
    (operators/video.py) into one row per frame with integer-exact plane
    sums — frame sampling over actual decoded video, not a byte-slicing
    stand-in.  The DuckDB oracle recomputes every frame's stats from the
    byte formula."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_video_frames(synth_videos(docs))


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


def q_similarity_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r6: ANN quality evaluation for the IVF index — per-query recall@5
    of IVF retrieval (16 cells, n_probe=4) against the brute-force exact
    top-5, completing the eval symmetry with ``similarity_lsh_recall``.
    The metric that decides how many probes the 100 TB index needs."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id")
    corpus = emb.filter(F.col("vec_id") >= 5)
    exact = cosine_topk(corpus, queries, k=5).select("query_id", "neighbor_id")
    approx = ivf_ann_topk(corpus, queries, k=5, n_centroids=16, n_probe=4).select(
        "query_id", "neighbor_id"
    ).withColumn("__hit", F.lit(1))
    return (
        exact.join(approx, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(F.coalesce("__hit", F.lit(0))).cast("long").alias("n_hits"),
            F.round(F.sum(F.coalesce("__hit", F.lit(0))) / F.count(F.lit(1)), 6).alias("recall"),
        )
    )


def q_corpus_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-export manifest (r6): deterministic md5-prefix shard
    assignment + per-shard doc/token counts and id ranges — the sanity
    report a 100 TB export publishes next to its files.  The assignment
    (int(md5(id)[:8], 16) % 16) is the same engine-portable idiom as
    hash_split, so DuckDB recomputes the whole manifest by value."""
    from ..operators.curation import shard_manifest

    return shard_manifest(load_table(spark, sf_dir, "documents"), n_shards=16)


def q_multimodal_decode_deadletter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter decode (r6): the reference's poison-message policy
    (``kafka_skip_broken_messages = 1``, basic_example/clickhouse.sql:20)
    applied to media blobs.  The fixture deterministically corrupts doc
    subsets (doc_id % 10 = 2 → truncated mid-structure, ValueError class;
    doc_id % 10 = 7 → magic destroyed, NotImplementedError class); the
    permissive decoder routes each corrupt blob to one ``err`` row while
    every clean blob still decodes to oracle-exact stats — so BOTH the
    survival and the routing are value-checked, not just 'did not crash'."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_images(synth_images(docs, corrupt_every=10), strict=False)


def q_chunk_content_defined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r6: content-defined chunking — rolling-hash boundaries (FastCDC at
    token granularity), so chunk fingerprints survive insertions across
    crawl snapshots where fixed windows shift.  The oracle recomputes the
    boundary rule and every chunk fingerprint in SQL."""
    from ..operators.curation import chunk_content_defined

    return chunk_content_defined(load_table(spark, sf_dir, "documents"))


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


def q_corpus_domain_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r6: domain-blocklist gate — documents are dropped when ANY of their
    extracted URLs lands on a blocked domain (broadcast LEFT ANTI against
    the blocklist, the standard crawl-curation filter).  Fixture: the
    injected source domain is blocked for doc_id % 7 ∈ {2, 5}, so the
    keep-set is closed-form.  Scale: the blocklist is small by nature —
    always the broadcast side; one map+explode over the corpus."""
    from ..operators.text import extract_urls

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" via https://src"), (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.com/doc/"), F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    blocklist = spark.createDataFrame(
        [("src2.example.com",), ("src5.example.com",)], ["domain"]
    )
    hits = (
        extract_urls(docs)
        .join(F.broadcast(blocklist), "domain", "left_semi")
        .select("doc_id")
        .distinct()
    )
    return docs.join(F.broadcast(hits), "doc_id", "left_anti").select("doc_id")


def q_dedup_chunks_crossdoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r6: sub-document duplication report — content-defined chunk
    fingerprints shared by ≥2 documents, with occurrence and document
    counts (the crawl-data signal exact whole-doc dedup misses: pages
    sharing boilerplate paragraphs or syndicated spans).  One digest-keyed
    map-side-combinable groupBy over the shuffle-free chunker."""
    from ..operators.curation import chunk_content_defined

    chunks = chunk_content_defined(load_table(spark, sf_dir, "documents"))
    return (
        chunks.groupBy("chunk_md5")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc_id"),
            F.max("n_tokens").alias("n_tokens"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def q_ann_ivf_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r6: PERSISTED IVF index probe — build the cell-partitioned index on
    disk (centroid sidecar + vectors under ``cell=<k>/``), then search it
    with static partition pruning (only the probed cells' files are
    opened).  Same semantics/tie-breaks as the in-memory variants, so the
    shared similarity_ann_ivf_topk oracle must match bit-for-bit."""
    import tempfile as _tf
    import uuid as _uuid

    from ..operators.similarity import ivf_search_index, ivf_write_index

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id")
    corpus = emb.filter(F.col("vec_id") >= 5)
    path = f"{_tf.gettempdir()}/ivf_idx_{_uuid.uuid4().hex[:12]}"
    try:
        ivf_write_index(corpus, path, n_centroids=16)
        # materialize the (tiny, top-k) result before deleting the index
        # files it reads — otherwise every invocation leaks a full corpus
        # copy under tempdir (ADVICE r6)
        return ivf_search_index(spark, path, queries, k=5, n_probe=4).localCheckpoint(
            eager=True
        )
    finally:
        import shutil as _sh

        _sh.rmtree(path, ignore_errors=True)


def q_corpus_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r6: vocabulary-coverage curve — fraction of token occurrences
    covered by the top-k vocab at k ∈ {10, 30, 100}; the report that sizes
    a tokenizer's vocabulary before training it."""
    from ..operators.text import vocab_coverage

    return vocab_coverage(load_table(spark, sf_dir, "documents"))


def q_corpus_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r6: deterministic global training order (the export shuffle) —
    dense md5-order positions computed with parallel per-byte-shard
    windows + a broadcast prefix sum instead of a one-partition global
    window.  The oracle is the direct global ROW_NUMBER, so the sharded
    decomposition must agree with it exactly, position by position."""
    from ..operators.curation import training_order

    return training_order(load_table(spark, sf_dir, "documents"))


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r6: REAL image resize — nearest-neighbor over actually-decoded PNG
    pixels to a fixed 4×4 (the normalize-for-training shape), emitting
    integer-exact channel sums of the resized image.  The oracle maps
    every output pixel back to its source coordinate (x*src_w//4) and
    recomputes the sum from the pixel formula, so decode AND the resample
    index math are value-checked.  JPEG (header-only) rows: dims, NULL
    sums."""
    from ..operators.imaging import resize_images

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return resize_images(synth_images(docs), width=4, height=4)


def q_multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r6: audio feature extraction — windowed energy (integer-exact
    Σ sample² per 16-frame window, summed over channels) + peak amplitude
    over REAL decoded WAV fixtures; the silence-trim/clipping-gate shape.
    The oracle recomputes every window from the closed-form sample
    formula, so decode AND windowing are value-checked."""
    from ..operators.audio import audio_energy_windows

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return audio_energy_windows(synth_waveforms(docs), window_frames=16)


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


def q_dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprint-blocked dedup: docs sharing a winnowing fingerprint are
    near-dup candidates; keep the min doc_id per fingerprint group."""
    fp = fingerprint(load_table(spark, sf_dir, "documents"))
    return (
        fp.groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keeper"), F.count(F.lit(1)).alias("group_size"))
        .select("fingerprint", "keeper", "group_size")
    )



def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform-target domain mixture weights over the documents corpus."""
    return domain_mix_weights(load_table(spark, sf_dir, "documents"))


def q_token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length distribution (64-token bins) — packing diagnostics."""
    return token_length_histogram(load_table(spark, sf_dir, "documents"))


def q_chunk_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 64/32 token windows per doc with portable md5
    fingerprints — the long-document chunker."""
    return sliding_window_chunks(load_table(spark, sf_dir, "documents"))



def q_text_commonness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-commonness (mean corpus df ratio over distinct tokens) — the
    log-free perplexity proxy."""
    return commonness_score(load_table(spark, sf_dir, "documents"))


def q_quality_adaptive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language P10 token-count cutoff via discrete order statistics
    (engine-portable integer index, no interpolating percentile)."""
    return adaptive_length_threshold(load_table(spark, sf_dir, "documents"))


def q_similarity_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality evaluation: per-query recall@5 of sign-LSH retrieval
    against the brute-force exact top-5 — the metric that decides whether
    an ANN index is good enough to replace the exact scan at 100 TB.  Both
    sides reuse the oracle-checked operators; the exact side is the small
    query set, so the comparison joins k·|queries| rows."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id")
    corpus = emb.filter(F.col("vec_id") >= 5)
    exact = cosine_topk(corpus, queries, k=5).select("query_id", "neighbor_id")
    approx = lsh_ann_topk(corpus, queries, k=5, n_planes=4).select(
        "query_id", "neighbor_id"
    ).withColumn("__hit", F.lit(1))
    return (
        exact.join(approx, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(F.coalesce("__hit", F.lit(0))).cast("long").alias("n_hits"),
            F.round(F.sum(F.coalesce("__hit", F.lit(0))) / F.count(F.lit(1)), 6).alias("recall"),
        )
    )



def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta dedup: every 5th doc is the \'new batch\', the rest the
    existing corpus — survivors are batch docs whose content exists in
    neither the corpus nor earlier in the batch."""
    docs = load_table(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    return incremental_dedup(new, corpus)



def q_llm_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation funnel report: per-stage survivor counts as the corpus
    flows raw → quality gate → adaptive per-lang length cutoff → exact
    dedup — the one-page answer to "where did my tokens go?".  Composes
    quality_score, adaptive_length_threshold and exact_dedup; every stage
    count is a map-side-combinable aggregate."""
    from ..operators.text import adaptive_length_threshold, quality_score

    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    gated = docs.join(
        quality_score(docs).filter(F.col("keep")).select("doc_id"), "doc_id"
    )
    thr = adaptive_length_threshold(gated).select("lang", "threshold_tokens")
    gated2 = (
        gated.withColumn("n_tokens", F.size(F.split("text", " ")).cast("long"))
        .join(thr, "lang")
        .filter(F.col("n_tokens") >= F.col("threshold_tokens"))
    )
    deduped = exact_dedup(gated2)

    def stage(i: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(i).alias("stage_id"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_docs"),
        )

    union = (
        stage(0, "raw", docs)
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


def q_text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return boilerplate_ngrams(load_table(spark, sf_dir, "documents"))


def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gopher_rules(load_table(spark, sf_dir, "documents"))


def q_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_budget_sample(
        load_table(spark, sf_dir, "documents"), budget_tokens=1000
    )


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return semantic_dedup(load_table(spark, sf_dir, "embeddings"), threshold=0.4)


QUERIES = {
    "text_boilerplate": q_text_boilerplate,
    "quality_gopher_rules": q_gopher_rules,
    "corpus_token_budget_sample": q_token_budget_sample,
    "dedup_semantic": q_semantic_dedup,
    "corpus_domain_mix": q_domain_mix,
    "token_length_histogram": q_token_length_histogram,
    "chunk_sliding_windows": q_chunk_sliding_windows,
    "dedup_exact": q_dedup_exact,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_clusters": q_dedup_clusters,
    "dedup_clusters_star": q_dedup_clusters_star,
    "text_pii_scrub": q_pii_scrub,
    "corpus_split": q_corpus_split,
    "contamination_check": q_contamination,
    "pack_chunks": q_pack_chunks,
    "pack_greedy": q_pack_greedy,
    "corpus_stratified_sample": q_stratified_sample,
    "text_repetition": q_repetition,
    "corpus_vocab_topk": q_vocab,
    "text_tfidf_top_terms": q_tfidf,
    "dedup_simhash": q_dedup_simhash,
    "dedup_ngram_jaccard": q_ngram_jaccard,
    "dedup_fingerprint": q_dedup_fingerprint,
    "llm_prep_pipeline": q_llm_prep_pipeline,
    "llm_curation_pipeline": q_llm_curation_pipeline,
    "similarity_cosine_topk": q_cosine_topk,
    "dedup_embedding_cosine": q_embedding_near_dups,
    "similarity_ann_lsh_topk": q_ann_lsh_topk,
    "similarity_ann_ivf_topk": q_ann_ivf_topk,
    "similarity_ann_ivf_table": q_ann_ivf_table,
    "embedding_quantize": q_embedding_quantize,
    "similarity_ann_lsh_buckets": q_ann_lsh_buckets,
    "text_stats": q_text_stats,
    "text_lang_id": q_lang_id,
    "text_quality_score": q_quality_score,
    "text_token_count": q_token_count,
    "text_fingerprint": q_fingerprint,
    "multimodal_byte_stats": q_multimodal_bytes,
    "multimodal_features": q_multimodal_features,
    "multimodal_thumbnails": q_multimodal_thumbnails,
    "multimodal_frames": q_multimodal_frames,
    "multimodal_decode": q_multimodal_decode,
    "multimodal_decode_deadletter": q_multimodal_decode_deadletter,
    "corpus_shard_manifest": q_corpus_shard_manifest,
    "text_html_extract": q_text_html_extract,
    "similarity_ivf_recall": q_similarity_ivf_recall,
    "multimodal_audio_decode": q_multimodal_audio,
    "multimodal_audio_features": q_multimodal_audio_features,
    "multimodal_resize_real": q_multimodal_resize,
    "corpus_training_order": q_corpus_training_order,
    "corpus_vocab_coverage": q_corpus_vocab_coverage,
    "similarity_ann_ivf_index": q_ann_ivf_index,
    "chunk_content_defined": q_chunk_content_defined,
    "dedup_chunks_crossdoc": q_dedup_chunks_crossdoc,
    "text_url_extract": q_text_url_extract,
    "corpus_domain_blocklist": q_corpus_domain_blocklist,
    "multimodal_video_frames": q_multimodal_video,
    # round-3 late additions — __spark_entry__._BACK defers these to the
    # END of the registry (driver window protection); front them in round 4:
    "text_commonness": q_text_commonness,
    "quality_adaptive_filter": q_quality_adaptive_filter,
    "similarity_lsh_recall": q_similarity_lsh_recall,
    "dedup_incremental": q_dedup_incremental,
    "llm_quality_funnel": q_llm_quality_funnel,
    "pack_efficiency": q_pack_efficiency,
}

#: shared content-defined-chunk CTE chain (token split → boundary rule →
#: cumulative chunk index) — ONE definition for both chunk oracles, so a
#: w/modulus/prefix change can never desynchronize them.
_CDC_CHUNK_CTES = """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk
                   FROM documents WHERE length(text) > 0),
        pos AS (SELECT doc_id, tk, unnest(range(len(tk))) AS i FROM t),
        b AS (SELECT doc_id, i, tk[i + 1] AS tok,
                     CASE WHEN i >= 2 AND i <= len(tk) - 2 AND len(tk) >= 4
                          AND TRY_CAST(concat('0x', substr(md5(
                              array_to_string(tk[i - 1:i + 1], ' ')), 1, 4)) AS BIGINT)
                              % 8 = 0
                     THEN 1 ELSE 0 END AS is_b
              FROM pos),
        c AS (SELECT doc_id, i, tok,
                     COALESCE(SUM(is_b) OVER (PARTITION BY doc_id ORDER BY i
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ci
              FROM b)"""

# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_SHINGLES = """
    toks AS (SELECT doc_id, lang, source, text, string_split(text, ' ') AS tk FROM documents),
    sh AS (SELECT doc_id, lang, source,
                  list_distinct([array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk) - 1)]) AS ts
           FROM toks)
"""

#: shared LSH-pair CTE chain (follows _SHINGLES; no trailing comma): MinHash
#: signatures → band keys → candidate pairs → exact Jaccard.  The affine
#: permutation constants are IMPORTED from the operator (one definition),
#: so the oracle regenerates whenever the family changes.
from ..operators.dedup import MINHASH_PERMS as _MH_PERMS
from ..operators.dedup import MINHASH_PRIME as _MH_P
from ..operators.dedup import ROWS_PER_BAND as _MH_R


def _mh_band_sql(b: int) -> str:
    parts = [
        f"CAST(list_min(list_transform(hs, h -> ({a} * h + {bb}) % {_MH_P})) AS VARCHAR)"
        for a, bb in _MH_PERMS[b * _MH_R:(b + 1) * _MH_R]
    ]
    return " || '|' || ".join(parts)


_MINHASH_PAIR_CTES = f"""hsx AS (SELECT doc_id, ts,
            list_transform(ts, s -> CAST(concat('0x', substr(md5(s), 1, 8)) AS BIGINT) % {_MH_P}) AS hs
            FROM sh),
        sig AS (SELECT doc_id, ts,
            {_mh_band_sql(0)} AS band0,
            {_mh_band_sql(1)} AS band1,
            {_mh_band_sql(2)} AS band2,
            {_mh_band_sql(3)} AS band3
            FROM hsx),
        bands AS (
            SELECT doc_id, 0 AS b, band0 AS bkey FROM sig UNION ALL
            SELECT doc_id, 1, band1 FROM sig UNION ALL
            SELECT doc_id, 2, band2 FROM sig UNION ALL
            SELECT doc_id, 3, band3 FROM sig),
        cand AS (SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
                 FROM bands l JOIN bands r ON l.b = r.b AND l.bkey = r.bkey AND l.doc_id < r.doc_id),
        j AS (SELECT c.doc_a, c.doc_b,
                     ROUND(len(list_intersect(a.ts, b.ts)) * 1.0
                           / len(list_distinct(list_concat(a.ts, b.ts))), 6) AS jaccard
              FROM cand c JOIN sh a ON c.doc_a = a.doc_id JOIN sh b ON c.doc_b = b.doc_id)"""

ORACLES = {
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
    "dedup_semantic": """
        WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        cent AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS i, v AS ctr
                 FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16)),
        cd AS (SELECT e.vec_id, e.v, cent.i,
                      list_sum(list_transform(list_zip(e.v, cent.ctr), p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
               FROM e CROSS JOIN cent),
        asg AS (SELECT vec_id, v, i AS cell FROM
                (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, i) AS rn FROM cd)
                WHERE rn = 1),
        drops AS (SELECT DISTINCT b.vec_id
                  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
                  WHERE ROUND(list_dot_product(a.v, b.v)
                              / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.4)
        SELECT asg.vec_id, CAST(asg.cell AS BIGINT) AS cell,
               (dr.vec_id IS NULL) AS keep
        FROM asg LEFT JOIN drops dr ON asg.vec_id = dr.vec_id
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
    "dedup_incremental": """
        WITH h AS (SELECT doc_id, sha256(lower(trim(text))) AS text_hash,
                          (doc_id % 5 = 0) AS isnew
                   FROM documents),
        hits AS (SELECT DISTINCT text_hash FROM h
                 WHERE NOT isnew
                   AND text_hash IN (SELECT text_hash FROM h WHERE isnew))
        SELECT MIN(doc_id) AS doc_id, text_hash
        FROM h
        WHERE isnew AND text_hash NOT IN (SELECT text_hash FROM hits)
        GROUP BY text_hash
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
    "similarity_lsh_recall": """
        WITH planes AS (
            SELECT i, list_transform(range(64), j ->
                (('0x' || substr(md5(i || ',' || j), 1, 8))::BIGINT / 4294967296.0) * 2 - 1) AS pv
            FROM range(4) t(i)),
        e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings),
        b AS (SELECT e.vec_id,
                     CAST(SUM(CASE WHEN list_dot_product(e.v, p.pv) >= 0
                              THEN (1 << p.i) ELSE 0 END) AS BIGINT) AS bucket
              FROM e CROSS JOIN planes p GROUP BY e.vec_id),
        q AS (SELECT e.vec_id AS query_id, e.v AS qv, b.bucket
              FROM e JOIN b USING (vec_id) WHERE vec_id < 5),
        c AS (SELECT e.vec_id, e.v AS cv, b.bucket
              FROM e JOIN b USING (vec_id) WHERE vec_id >= 5),
        sa AS (SELECT q.query_id, c.vec_id AS neighbor_id,
                      ROUND(list_dot_product(qv, cv)
                            / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) AS cosine
               FROM q JOIN c USING (bucket)),
        ra AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, neighbor_id ASC) AS rnk FROM sa),
        approx AS (SELECT query_id, neighbor_id FROM ra WHERE rnk <= 5),
        qx AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
        cx AS (SELECT vec_id, v AS cv FROM e WHERE vec_id >= 5),
        sx AS (SELECT qx.query_id, cx.vec_id AS neighbor_id,
                      ROUND(list_dot_product(qv, cv)
                            / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) AS cosine
               FROM qx CROSS JOIN cx),
        rx AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, neighbor_id ASC) AS rnk FROM sx),
        exact AS (SELECT query_id, neighbor_id FROM rx WHERE rnk <= 5)
        SELECT x.query_id, COUNT(*) AS n_exact,
               CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
               ROUND(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS recall
        FROM exact x LEFT JOIN approx a
             ON x.query_id = a.query_id AND x.neighbor_id = a.neighbor_id
        GROUP BY x.query_id
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
    "token_length_histogram": """
        WITH t AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents)
        SELECT CAST(FLOOR(n / 64) * 64 AS BIGINT) AS bin_start,
               COUNT(*) AS n_docs,
               CAST(SUM(n) AS BIGINT) AS total_tokens,
               MIN(n) AS min_tokens,
               MAX(n) AS max_tokens
        FROM t GROUP BY 1
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
    "dedup_exact": """
        SELECT MIN(doc_id) AS doc_id, sha256(lower(trim(text))) AS text_hash
        FROM documents GROUP BY sha256(lower(trim(text)))
    """,
    "dedup_minhash_lsh": f"""
        WITH {_SHINGLES},
        {_MINHASH_PAIR_CTES}
        SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.8
    """,
    # recursive transitive closure over the near-dup pairs; component label
    # = min reachable doc_id; singletons fall through the LEFT JOIN
    "dedup_clusters": f"""
        WITH RECURSIVE {_SHINGLES},
        {_MINHASH_PAIR_CTES},
        pairs AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.8),
        edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
                  UNION SELECT doc_b, doc_a FROM pairs),
        reach(a, b) AS (
            SELECT a, b FROM edges
            UNION
            SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        lab AS (SELECT a AS doc_id, MIN(b) AS mn FROM reach GROUP BY a)
        SELECT d.doc_id,
               COALESCE(LEAST(l.doc_id, l.mn), d.doc_id) AS canonical_id
        FROM documents d LEFT JOIN lab l USING (doc_id)
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
    "corpus_split": """
        SELECT doc_id,
               CASE WHEN h < 'cd' THEN 'train'
                    WHEN h < 'e6' THEN 'val'
                    ELSE 'test' END AS split
        FROM (SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS h
              FROM documents)
    """,
    "contamination_check": f"""
        WITH {_SHINGLES},
        b AS (SELECT DISTINCT s
              FROM (SELECT unnest(ts) AS s FROM sh WHERE doc_id % 50 = 0)),
        t AS (SELECT doc_id, unnest(ts) AS s FROM sh WHERE doc_id % 50 <> 0),
        hits AS (SELECT t.doc_id, COUNT(*) AS n FROM t JOIN b USING (s)
                 GROUP BY t.doc_id)
        SELECT d.doc_id,
               CAST(COALESCE(h.n, 0) AS BIGINT) AS n_overlap,
               COALESCE(h.n, 0) > 0 AS contaminated
        FROM documents d LEFT JOIN hits h USING (doc_id)
        WHERE d.doc_id % 50 <> 0
    """,
    # the greedy per-shard recurrence, replayed row-by-row in a recursive
    # CTE (one recursion step per doc per shard — fine at oracle scale)
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
    "corpus_stratified_sample": """
        SELECT doc_id, lang
        FROM (SELECT doc_id, lang,
                     ROW_NUMBER() OVER (PARTITION BY lang
                         ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
              FROM documents)
        WHERE rn <= 20
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
    "corpus_vocab_topk": """
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token
        ORDER BY n DESC, token ASC
        LIMIT 100
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
    "dedup_simhash": """
        WITH toks AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok FROM documents),
        h AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS hv FROM toks),
        bits AS (SELECT doc_id, i, SUM(CASE WHEN ((hv >> i) & 1) = 1 THEN 1 ELSE -1 END) AS s
                 FROM h CROSS JOIN range(0, 60) t(i) GROUP BY doc_id, i)
        SELECT doc_id,
               CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS simhash
        FROM bits GROUP BY doc_id
    """,
    "dedup_ngram_jaccard": f"""
        WITH {_SHINGLES},
        p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     ROUND(len(list_intersect(a.ts, b.ts)) * 1.0
                           / len(list_distinct(list_concat(a.ts, b.ts))), 6) AS jaccard
              FROM sh a JOIN sh b
                ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b, jaccard FROM p WHERE jaccard >= 0.2
    """,
    # the mapInPandas byte-histogram decode, reproduced character-wise
    # (fixture text is ASCII ⇒ ascii(char) == utf-8 byte; h*1.0/n is the
    # same IEEE division Python performs).  Posexploded to scalar rows —
    # the driver's canonicalizer cannot sort array columns.
    "multimodal_features": """
        WITH t AS (SELECT doc_id, text, length(text) AS n FROM documents)
        SELECT doc_id,
               CAST(n AS BIGINT) AS n_bytes,
               p.i AS feature_pos,
               len(list_filter(range(1, n + 1),
                               x -> (ascii(substr(text, x, 1)) % 4) = p.i)) * 1.0
                   / GREATEST(n, 1) AS feature_value
        FROM t CROSS JOIN range(4) p(i)
    """,
    # the md5-portable hyperplanes reconstructed in SQL; component (i,j) =
    # (hex32(md5("i,j"))/2^32)*2-1, identical IEEE-double steps to Python
    "similarity_ann_lsh_buckets": """
        WITH planes AS (
            SELECT i, list_transform(range(64), j ->
                (('0x' || substr(md5(i || ',' || j), 1, 8))::BIGINT / 4294967296.0) * 2 - 1) AS pv
            FROM range(8) t(i)),
        e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings),
        b AS (SELECT e.vec_id,
                     CAST(SUM(CASE WHEN list_dot_product(e.v, p.pv) >= 0
                              THEN (1 << p.i) ELSE 0 END) AS BIGINT) AS bucket
              FROM e CROSS JOIN planes p GROUP BY e.vec_id)
        SELECT bucket, COUNT(*) AS n_vectors, MIN(vec_id) AS min_vec_id
        FROM b GROUP BY bucket
    """,
    "similarity_ann_lsh_topk": """
        WITH planes AS (
            SELECT i, list_transform(range(64), j ->
                (('0x' || substr(md5(i || ',' || j), 1, 8))::BIGINT / 4294967296.0) * 2 - 1) AS pv
            FROM range(4) t(i)),
        e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings),
        b AS (SELECT e.vec_id,
                     CAST(SUM(CASE WHEN list_dot_product(e.v, p.pv) >= 0
                              THEN (1 << p.i) ELSE 0 END) AS BIGINT) AS bucket
              FROM e CROSS JOIN planes p GROUP BY e.vec_id),
        q AS (SELECT e.vec_id AS query_id, e.v AS qv, b.bucket
              FROM e JOIN b USING (vec_id) WHERE vec_id < 5),
        c AS (SELECT e.vec_id, e.v AS cv, b.bucket
              FROM e JOIN b USING (vec_id) WHERE vec_id >= 5),
        s AS (SELECT q.query_id, c.vec_id AS neighbor_id,
                     ROUND(list_dot_product(qv, cv)
                           / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) AS cosine
              FROM q JOIN c USING (bucket)),
        r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY cosine DESC, neighbor_id ASC) AS rnk FROM s)
        SELECT query_id, neighbor_id, cosine FROM r WHERE rnk <= 5
    """,
    "similarity_cosine_topk": """
        WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
        c AS (SELECT vec_id, v AS cv FROM e WHERE vec_id >= 5),
        s AS (SELECT q.query_id, c.vec_id AS neighbor_id,
                     ROUND(list_dot_product(qv, cv)
                           / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) AS cosine
              FROM q CROSS JOIN c),
        r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rnk
              FROM s)
        SELECT query_id, neighbor_id, cosine, CAST(rnk AS BIGINT) AS rank FROM r WHERE rnk <= 5
    """,
    "dedup_embedding_cosine": """
        WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
                     ROUND(list_dot_product(a.v, b.v)
                           / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
              FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
        SELECT vec_a, vec_b, label, cosine FROM p WHERE cosine >= 0.4
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
    "dedup_fingerprint": f"""
        WITH {_SHINGLES},
        fp AS (SELECT doc_id,
                      array_to_string(list_sort(list_transform(ts, s -> md5(s)))[1:4], '') AS fingerprint
               FROM sh)
        SELECT fingerprint, MIN(doc_id) AS keeper, COUNT(*) AS group_size
        FROM fp GROUP BY fingerprint
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
    "similarity_ann_ivf_topk": """
        WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
        c AS (SELECT vec_id, v AS cv FROM e WHERE vec_id >= 5),
        cent AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS i, cv AS ctr
                 FROM (SELECT vec_id, cv FROM c ORDER BY vec_id LIMIT 16)),
        cd AS (SELECT c.vec_id, c.cv, cent.i,
                      list_sum(list_transform(list_zip(c.cv, cent.ctr), p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
               FROM c CROSS JOIN cent),
        cassign AS (SELECT vec_id, cv, i AS cell FROM
                    (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, i) AS rn FROM cd)
                    WHERE rn = 1),
        qd AS (SELECT q.query_id, q.qv, cent.i,
                      list_sum(list_transform(list_zip(q.qv, cent.ctr), p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
               FROM q CROSS JOIN cent),
        qprobe AS (SELECT query_id, qv, i AS cell FROM
                   (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d2, i) AS rn FROM qd)
                   WHERE rn <= 4),
        s AS (SELECT qp.query_id, ca.vec_id AS neighbor_id,
                     ROUND(list_dot_product(qp.qv, ca.cv)
                           / (sqrt(list_dot_product(qp.qv, qp.qv)) * sqrt(list_dot_product(ca.cv, ca.cv))), 6) AS cosine
              FROM qprobe qp JOIN cassign ca ON qp.cell = ca.cell)
        SELECT query_id, neighbor_id, cosine FROM
        (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rn FROM s)
        WHERE rn <= 5
    """,
    "multimodal_thumbnails": """
        SELECT doc_id, CAST(8 AS INT) AS width, CAST(8 AS INT) AS height
        FROM documents
    """,
    "multimodal_frames": """
        SELECT doc_id, CAST(t.i AS INT) AS frame_index
        FROM documents CROSS JOIN range(0, 4) t(i)
        WHERE length(text) > 0
    """,
    "multimodal_byte_stats": """
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               'image' AS media_type,
               'memory://doc/' || CAST(doc_id AS VARCHAR) AS uri
        FROM documents
    """,
    # first-principles oracle for the REAL PNG decoder: the fixture pixel
    # value is (d*7 + (y*w + x)*3 + c) % 256, so the per-channel sums the
    # decoder must produce (after CRC walk + inflate + un-filtering all 5
    # filter types) are recomputable with integer arithmetic alone.
    # JPEG-header docs (d % 4 = 0) carry dims only — stats NULL.
    "multimodal_decode": """
        WITH params AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 4 = 0 THEN 'jpeg' ELSE 'png' END AS format,
                   CAST(3 + doc_id % 5 AS INT) AS width,
                   CAST(2 + doc_id % 7 AS INT) AS height
            FROM documents
        ),
        px AS (
            SELECT p.doc_id, c.c AS c,
                   (p.doc_id * 7 + (y.y * p.width + x.x) * 3 + c.c) % 256 AS v
            FROM params p
            CROSS JOIN range(8) y(y)
            CROSS JOIN range(8) x(x)
            CROSS JOIN range(3) c(c)
            WHERE p.format = 'png' AND y.y < p.height AND x.x < p.width
        ),
        stats AS (
            SELECT doc_id,
                   CAST(SUM(CASE WHEN c = 0 THEN v END) AS BIGINT) AS sum_r,
                   CAST(SUM(CASE WHEN c = 1 THEN v END) AS BIGINT) AS sum_g,
                   CAST(SUM(CASE WHEN c = 2 THEN v END) AS BIGINT) AS sum_b,
                   CAST(MIN(v) AS INT) AS min_px,
                   CAST(MAX(v) AS INT) AS max_px
            FROM px GROUP BY doc_id
        )
        SELECT p.doc_id, p.format, p.width, p.height,
               CAST(3 AS INT) AS channels,
               CAST(p.width * p.height AS BIGINT) AS n_pixels,
               s.sum_r, s.sum_g, s.sum_b, s.min_px, s.max_px
        FROM params p LEFT JOIN stats s USING (doc_id)
    """,
    # markup extraction: the IDENTICAL RE2-subset regex chain (script/style
    # elision → tag strip → entity decode → whitespace collapse) over the
    # same deterministic HTML shell — per-doc string equality.
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
    # IVF recall: approx side = the similarity_ann_ivf_topk oracle's
    # assignment/probe/score pipeline; exact side = brute-force top-5;
    # recall agg identical to similarity_lsh_recall.
    "similarity_ivf_recall": """
        WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
        c AS (SELECT vec_id, v AS cv FROM e WHERE vec_id >= 5),
        cent AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS i, cv AS ctr
                 FROM (SELECT vec_id, cv FROM c ORDER BY vec_id LIMIT 16)),
        cd AS (SELECT c.vec_id, c.cv, cent.i,
                      list_sum(list_transform(list_zip(c.cv, cent.ctr), p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
               FROM c CROSS JOIN cent),
        cassign AS (SELECT vec_id, cv, i AS cell FROM
                    (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, i) AS rn FROM cd)
                    WHERE rn = 1),
        qd AS (SELECT q.query_id, q.qv, cent.i,
                      list_sum(list_transform(list_zip(q.qv, cent.ctr), p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
               FROM q CROSS JOIN cent),
        qprobe AS (SELECT query_id, qv, i AS cell FROM
                   (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d2, i) AS rn FROM qd)
                   WHERE rn <= 4),
        sa AS (SELECT qp.query_id, ca.vec_id AS neighbor_id,
                      ROUND(list_dot_product(qp.qv, ca.cv)
                            / (sqrt(list_dot_product(qp.qv, qp.qv)) * sqrt(list_dot_product(ca.cv, ca.cv))), 6) AS cosine
               FROM qprobe qp JOIN cassign ca ON qp.cell = ca.cell),
        ra AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, neighbor_id ASC) AS rnk FROM sa),
        approx AS (SELECT query_id, neighbor_id FROM ra WHERE rnk <= 5),
        sx AS (SELECT q.query_id, c.vec_id AS neighbor_id,
                      ROUND(list_dot_product(q.qv, c.cv)
                            / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.cv, c.cv))), 6) AS cosine
               FROM q CROSS JOIN c),
        rx AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, neighbor_id ASC) AS rnk FROM sx),
        exact AS (SELECT query_id, neighbor_id FROM rx WHERE rnk <= 5)
        SELECT x.query_id, COUNT(*) AS n_exact,
               CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
               ROUND(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS recall
        FROM exact x LEFT JOIN approx a
             ON x.query_id = a.query_id AND x.neighbor_id = a.neighbor_id
        GROUP BY x.query_id
    """,
    # shard-export manifest: the md5-prefix assignment is engine-portable
    # (same idiom as corpus_split), so doc/token counts and id ranges per
    # shard are recomputed exactly.
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
    # dead-letter decode oracle: corruption classes are closed-form in
    # doc_id (d%10=2 truncated → ValueError text per format; d%10=7 magic
    # destroyed → the no-codec message), so the oracle checks the routing
    # itself by value — clean docs must still produce exact pixel stats,
    # corrupt docs must produce exactly the right err string and NULLs.
    "multimodal_decode_deadletter": """
        WITH params AS (
            SELECT doc_id,
                   doc_id % 10 IN (2, 7) AS corrupt,
                   CASE
                       WHEN doc_id % 10 = 2 AND doc_id % 4 = 0
                           THEN 'truncated JPEG SOF segment'
                       WHEN doc_id % 10 = 2
                           THEN 'truncated PNG chunk'
                       WHEN doc_id % 10 = 7
                           THEN 'no stdlib codec for this format; wire in Pillow/pyav'
                   END AS err,
                   CASE WHEN doc_id % 4 = 0 THEN 'jpeg' ELSE 'png' END AS format,
                   CAST(3 + doc_id % 5 AS INT) AS width,
                   CAST(2 + doc_id % 7 AS INT) AS height
            FROM documents
        ),
        px AS (
            SELECT p.doc_id, c.c AS c,
                   (p.doc_id * 7 + (y.y * p.width + x.x) * 3 + c.c) % 256 AS v
            FROM params p
            CROSS JOIN range(8) y(y)
            CROSS JOIN range(8) x(x)
            CROSS JOIN range(3) c(c)
            WHERE p.format = 'png' AND NOT p.corrupt
              AND y.y < p.height AND x.x < p.width
        ),
        stats AS (
            SELECT doc_id,
                   CAST(SUM(CASE WHEN c = 0 THEN v END) AS BIGINT) AS sum_r,
                   CAST(SUM(CASE WHEN c = 1 THEN v END) AS BIGINT) AS sum_g,
                   CAST(SUM(CASE WHEN c = 2 THEN v END) AS BIGINT) AS sum_b,
                   CAST(MIN(v) AS INT) AS min_px,
                   CAST(MAX(v) AS INT) AS max_px
            FROM px GROUP BY doc_id
        )
        SELECT p.doc_id,
               CASE WHEN p.corrupt THEN NULL ELSE p.format END AS format,
               CASE WHEN p.corrupt THEN NULL ELSE p.width END AS width,
               CASE WHEN p.corrupt THEN NULL ELSE p.height END AS height,
               CASE WHEN p.corrupt THEN NULL ELSE CAST(3 AS INT) END AS channels,
               CASE WHEN p.corrupt THEN NULL
                    ELSE CAST(p.width * p.height AS BIGINT) END AS n_pixels,
               s.sum_r, s.sum_g, s.sum_b, s.min_px, s.max_px,
               p.err
        FROM params p LEFT JOIN stats s USING (doc_id)
    """,
    # first-principles oracle for the REAL WAV decoder: interleaved sample
    # j is ((d*31 + j*7) % 2003) - 1001, so the stats the stdlib wave path
    # must produce are pure integer arithmetic.  Max samples = 69*2 = 138.
    "multimodal_audio_decode": """
        WITH params AS (
            SELECT doc_id,
                   CAST(CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS INT) AS channels,
                   CAST(8000 + (doc_id % 4) * 4000 AS INT) AS sample_rate,
                   CAST(20 + doc_id % 50 AS BIGINT) AS n_frames
            FROM documents
        ),
        s AS (
            SELECT p.doc_id, ((p.doc_id * 31 + j.j * 7) % 2003) - 1001 AS v
            FROM params p CROSS JOIN range(140) j(j)
            WHERE j.j < p.n_frames * p.channels
        ),
        stats AS (
            SELECT doc_id, CAST(SUM(v) AS BIGINT) AS s_sum,
                   CAST(MIN(v) AS INT) AS s_min, CAST(MAX(v) AS INT) AS s_max
            FROM s GROUP BY doc_id
        )
        SELECT p.doc_id, 'wav' AS format, p.channels, p.sample_rate,
               p.n_frames, t.s_sum, t.s_min, t.s_max
        FROM params p JOIN stats t USING (doc_id)
    """,
    # content-defined chunking: boundary after 0-based token i (w-1 ≤ i ≤
    # n-2, n ≥ w+1) iff int(md5(window of w tokens ending at i)[:4], 16)
    # ≡ 0 mod 8; chunk index of token p = boundaries strictly before p.
    "chunk_content_defined": """
        {CDC_CHUNK_CTES}
        SELECT doc_id, CAST(ci AS INT) AS chunk_index,
               CAST(MIN(i) AS BIGINT) AS start_token,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               md5(string_agg(tok, ' ' ORDER BY i)) AS chunk_md5
        FROM c GROUP BY doc_id, ci
    """,
    # URL extraction: identical regexes over the same injected-URL text.
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
    # blocklist gate: keep docs whose injected source domain is not blocked.
    "corpus_domain_blocklist": """
        SELECT doc_id FROM documents WHERE doc_id % 7 NOT IN (2, 5)
    """,
    # cross-doc chunk dedup: the chunker CTE + a digest GROUP BY.
    "dedup_chunks_crossdoc": """
        {CDC_CHUNK_CTES},
        ch AS (SELECT doc_id, md5(string_agg(tok, ' ' ORDER BY i)) AS chunk_md5,
                      COUNT(*) AS n_tokens
               FROM c GROUP BY doc_id, ci)
        SELECT chunk_md5, COUNT(*) AS n_occurrences,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
               MIN(doc_id) AS first_doc_id,
               CAST(MAX(n_tokens) AS BIGINT) AS n_tokens
        FROM ch GROUP BY chunk_md5 HAVING COUNT(DISTINCT doc_id) >= 2
    """,
    # vocab coverage: rank tokens by (count desc, token asc), sum counts
    # at each k cut over the grand total.
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
    # training order: the oracle is the naive global row_number; the
    # engine's sharded prefix-sum decomposition must reproduce it exactly.
    "corpus_training_order": """
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
               ) - 1 AS BIGINT) AS train_order
        FROM documents
    """,
    # real resize oracle: output pixel (x,y,c) of doc d sources
    # (sx, sy) = (x*w//4, y*h//4), value (d*7 + (sy*w + sx)*3 + c) % 256.
    "multimodal_resize_real": """
        WITH params AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 4 = 0 THEN 'jpeg' ELSE 'png' END AS format,
                   CAST(3 + doc_id % 5 AS INT) AS w,
                   CAST(2 + doc_id % 7 AS INT) AS h
            FROM documents
        ),
        px AS (
            SELECT p.doc_id, c.c AS c,
                   (p.doc_id * 7
                    + ((y.y * p.h // 4) * p.w + (x.x * p.w // 4)) * 3 + c.c) % 256 AS v
            FROM params p
            CROSS JOIN range(4) y(y)
            CROSS JOIN range(4) x(x)
            CROSS JOIN range(3) c(c)
            WHERE p.format = 'png'
        ),
        stats AS (
            SELECT doc_id,
                   CAST(SUM(CASE WHEN c = 0 THEN v END) AS BIGINT) AS sum_r,
                   CAST(SUM(CASE WHEN c = 1 THEN v END) AS BIGINT) AS sum_g,
                   CAST(SUM(CASE WHEN c = 2 THEN v END) AS BIGINT) AS sum_b
            FROM px GROUP BY doc_id
        )
        SELECT p.doc_id, p.format, p.w AS src_w, p.h AS src_h,
               CAST(4 AS INT) AS width, CAST(4 AS INT) AS height,
               s.sum_r, s.sum_g, s.sum_b
        FROM params p LEFT JOIN stats s USING (doc_id)
    """,
    # windowed audio energy: window w of doc d covers interleaved sample
    # indices [w*16*ch, (w+1)*16*ch); Σv² and max|v| are pure integer
    # arithmetic over the closed-form samples.
    "multimodal_audio_features": """
        WITH params AS (
            SELECT doc_id,
                   CAST(CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS INT) AS ch,
                   CAST(20 + doc_id % 50 AS BIGINT) AS nf
            FROM documents
        ),
        s AS (
            SELECT p.doc_id, p.ch, j.j AS j,
                   ((p.doc_id * 31 + j.j * 7) % 2003) - 1001 AS v
            FROM params p CROSS JOIN range(140) j(j)
            WHERE j.j < p.nf * p.ch
        ),
        w AS (SELECT doc_id, ch, CAST(j // (16 * ch) AS INT) AS window_index, v FROM s)
        SELECT doc_id, window_index,
               CAST(COUNT(*) // ANY_VALUE(ch) AS BIGINT) AS n_frames,
               CAST(SUM(v * v) AS BIGINT) AS sq_sum,
               CAST(MAX(ABS(v)) AS INT) AS s_peak
        FROM w GROUP BY doc_id, window_index
    """,
    # first-principles oracle for the REAL Y4M decoder: global byte j of
    # doc d is (d*11 + j*5) % 256, planar C444 layout (frame f, plane p,
    # pixel k → j = (f*3 + p)*w*h + k).  Max plane = 4*6 = 24 bytes.
    "multimodal_video_frames": """
        WITH params AS (
            SELECT doc_id,
                   CAST(2 + doc_id % 3 AS INT) AS width,
                   CAST(2 + doc_id % 5 AS INT) AS height,
                   CAST(1 + doc_id % 4 AS BIGINT) AS n_frames
            FROM documents
        ),
        b AS (
            SELECT p.doc_id, f.f AS fi, pl.p AS plane,
                   (p.doc_id * 11
                    + ((f.f * 3 + pl.p) * p.width * p.height + k.k) * 5) % 256 AS v
            FROM params p
            CROSS JOIN range(4) f(f)
            CROSS JOIN range(3) pl(p)
            CROSS JOIN range(24) k(k)
            WHERE f.f < p.n_frames AND k.k < p.width * p.height
        ),
        fs AS (
            SELECT doc_id, fi,
                   CAST(SUM(CASE WHEN plane = 0 THEN v END) AS BIGINT) AS sum_y,
                   CAST(SUM(CASE WHEN plane = 1 THEN v END) AS BIGINT) AS sum_u,
                   CAST(SUM(CASE WHEN plane = 2 THEN v END) AS BIGINT) AS sum_v,
                   CAST(MIN(v) AS INT) AS min_b,
                   CAST(MAX(v) AS INT) AS max_b
            FROM b GROUP BY doc_id, fi
        )
        SELECT p.doc_id, CAST(s.fi AS INT) AS frame_index, p.width, p.height,
               p.n_frames, s.sum_y, s.sum_u, s.sum_v, s.min_b, s.max_b
        FROM params p JOIN fs s USING (doc_id)
    """,
}

# The star-contraction clusters query has the SAME contract as
# dedup_clusters (component = min reachable doc_id), so the recursive-CTE
# closure oracle is shared verbatim — only the Spark-side algorithm differs.
ORACLES["dedup_clusters_star"] = ORACLES["dedup_clusters"]

# The centroid-table IVF has the SAME index/probe/score contract as the
# plan-literal variant (init = 16 lowest-id vectors, lowest-cell tie-break),
# so the oracle is shared verbatim — bit-for-bit equality is the point.
ORACLES["similarity_ann_ivf_table"] = ORACLES["similarity_ann_ivf_topk"]
# The persisted-index probe (r6) has the SAME index/probe/score contract —
# build-on-disk + partition-pruned search must be bit-identical too.
ORACLES["similarity_ann_ivf_index"] = ORACLES["similarity_ann_ivf_topk"]

# Splice the shared content-defined-chunk CTE chain into both chunk
# oracles (one definition — see _CDC_CHUNK_CTES).
for _k in ("chunk_content_defined", "dedup_chunks_crossdoc"):
    ORACLES[_k] = ORACLES[_k].replace("{CDC_CHUNK_CTES}", _CDC_CHUNK_CTES)

# int8 scalar quantization: the grid (per-dim corpus min/max) and every
# floor-based code recomputed in SQL; float steps identically associated
# ((x-mn)*256/(mx-mn); mn+(code+0.5)*(mx-mn)/256) so doubles agree bitwise
ORACLES["embedding_quantize"] = """
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    x AS (SELECT e.vec_id, i.i AS pos, e.v[i.i + 1] AS x
          FROM e CROSS JOIN range(64) i(i) WHERE i.i < len(e.v)),
    g AS (SELECT pos, MIN(x) AS mn, MAX(x) AS mx FROM x GROUP BY pos),
    c AS (SELECT x.vec_id, x.x, g.mn, g.mx,
                 CASE WHEN g.mx > g.mn
                      THEN LEAST(255, CAST(FLOOR((x.x - g.mn) * 256.0 / (g.mx - g.mn)) AS INT))
                      ELSE 0 END AS code
          FROM x JOIN g USING (pos))
    SELECT vec_id,
           CAST(COUNT(*) AS BIGINT) AS n_dims,
           CAST(SUM(code) AS BIGINT) AS sum_codes,
           CAST(MIN(code) AS INT) AS min_code,
           CAST(MAX(code) AS INT) AS max_code,
           ROUND(MAX(ABS(x - (mn + (CAST(code AS DOUBLE) + 0.5) * (mx - mn) / 256.0))), 6)
               AS max_abs_err
    FROM c GROUP BY vec_id
"""


# ---------------------------------------------------------------------------
# Round-4 additions: boilerplate-span rewrite, learned quality classifier
# scoring, temperature mixture, cluster keep-list
# ---------------------------------------------------------------------------

from ..operators.classifier import classifier_score, pseudo_weights  # noqa: E402
from ..operators.curation import (  # noqa: E402
    domain_temperature_weights,
    remove_common_spans,
)
from ..operators.dedup import cluster_representatives  # noqa: E402

#: classifier demo dimensions — small enough that the oracle's literal
#: weight list stays readable; the operator takes any length
_CLS_DIM = 64
_CLS_WEIGHTS = pseudo_weights(_CLS_DIM)


def q_remove_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus REWRITE, not just a score: drop every 10-token span that
    appears in ≥3 distinct documents and re-emit the cleaned text — the
    C4 boilerplate-removal transformation."""
    return remove_common_spans(load_table(spark, sf_dir, "documents"), k=10, min_docs=3)


def q_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick linear classifier scoring pass with the deterministic
    demo weight vector (the trained path is exercised in
    tests/test_classifier.py — training is iterative ML, not SQL)."""
    return classifier_score(load_table(spark, sf_dir, "documents"), _CLS_WEIGHTS)


def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return domain_temperature_weights(load_table(spark, sf_dir, "documents"), temperature=2.0)


def q_dedup_cluster_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters → keep-list: the best member (longest, then lowest
    id) of every transitive dup cluster is the representative; everything
    else is the drop set.  The end-to-end answer a curation pipeline
    actually needs from the dedup stage."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_near_dups(docs, threshold=0.8, persist=True)
    comp = connected_components(pairs.select("doc_a", "doc_b"))
    assignment = (
        docs.select("doc_id")
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select("doc_id", F.coalesce("component", "doc_id").alias("canonical_id"))
    )
    return cluster_representatives(assignment, docs)


def q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity scoring with the corpus's own unigram LM —
    occurrence-weighted log-space quality signal."""
    from ..operators.text import lm_unigram_logprob

    return lm_unigram_logprob(load_table(spark, sf_dir, "documents"))


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


QUERIES["text_lm_perplexity"] = q_lm_perplexity
QUERIES["llm_filter_report"] = q_llm_filter_report

ORACLES["llm_filter_report"] = f"""
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
"""

ORACLES["text_lm_perplexity"] = """
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
"""

QUERIES["corpus_remove_boilerplate"] = q_remove_boilerplate
QUERIES["quality_classifier_score"] = q_classifier_score
QUERIES["corpus_temperature_mix"] = q_temperature_mix
QUERIES["dedup_cluster_keep"] = q_dedup_cluster_keep

ORACLES["corpus_remove_boilerplate"] = """
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
"""

ORACLES["quality_classifier_score"] = f"""
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
"""

ORACLES["corpus_temperature_mix"] = """
    WITH per AS (SELECT source, count(*) AS n_docs,
                        CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
                 FROM documents GROUP BY source)
    SELECT source, n_docs, total_tokens,
           ROUND(total_tokens / sum(total_tokens) OVER (), 6) AS token_share,
           ROUND(sqrt(total_tokens) / sum(sqrt(total_tokens)) OVER (), 6) AS temp_share,
           ROUND((sqrt(total_tokens) / sum(sqrt(total_tokens)) OVER ())
                 / (total_tokens / sum(total_tokens) OVER ()), 6) AS boost
    FROM per
"""

# same transitive-closure assignment as dedup_clusters, extended with the
# per-cluster representative window (longest member wins, id tie-break)
ORACLES["dedup_cluster_keep"] = f"""
    WITH RECURSIVE {_SHINGLES},
    {_MINHASH_PAIR_CTES},
    pairs AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.8),
    edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
    lab AS (SELECT a AS doc_id, MIN(b) AS mn FROM reach GROUP BY a),
    asg AS (SELECT d.doc_id,
                   COALESCE(LEAST(l.doc_id, l.mn), d.doc_id) AS canonical_id,
                   d.n_chars
            FROM documents d LEFT JOIN lab l USING (doc_id))
    SELECT doc_id, canonical_id,
           count(*) OVER (PARTITION BY canonical_id) AS n_members,
           (row_number() OVER (PARTITION BY canonical_id
                               ORDER BY n_chars DESC, doc_id ASC)) = 1 AS is_rep
    FROM asg
"""


# ---------------------------------------------------------------------------
# r7: oracle-INDEPENDENT quality guards for the mirrored scoring families
# (the p=2^61-1 MinHash lesson, VERDICT r6 #3).  The text_lm_perplexity /
# text_commonness / quality_classifier_score oracles MIRROR the engine's
# constants, so a family-level degeneracy that changes both sides
# identically is invisible to them.  These queries instead plant a corpus
# with a KNOWN statistical contrast (fluent common-vocab docs vs gibberish
# unique-token docs, derived deterministically from the documents fixture's
# doc_ids) and emit whether the scoring family SEPARATES the classes — the
# oracle states the expected contrast as closed-form constants it derives
# from doc_id arithmetic alone, never from the scoring formula.  If the
# family silently degenerates (all scores collapse, counts stop counting,
# weights stop training), `separated` flips false and the driver gate
# fails even though both mirrored formulas would still agree.
# ---------------------------------------------------------------------------

#: 8-word "fluent" vocabulary for the planted corpora — every fluent token
#: recurs across a third of the corpus, while each gibberish token appears
#: exactly once corpus-wide.
_PLANT_VOCAB = "array('the','quick','brown','fox','jumps','over','a','dog')"
_PLANT_LEN = 24  # tokens per planted document


def _planted_quality_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, text, label): label=1 fluent (cyclic draws from the shared
    8-word vocab, phase-shifted by doc_id), label=0 gibberish (doc_id %
    3 == 0; tokens ``g<doc_id>x<i>`` unique corpus-wide)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    fluent = F.expr(
        f"concat_ws(' ', transform(sequence(0, {_PLANT_LEN - 1}),"
        f" i -> element_at({_PLANT_VOCAB}, cast((i + doc_id) % 8 as int) + 1)))"
    )
    gibberish = F.expr(
        f"concat_ws(' ', transform(sequence(0, {_PLANT_LEN - 1}),"
        " i -> concat('g', doc_id, 'x', i)))"
    )
    is_gib = F.col("doc_id") % 3 == 0
    return docs.select(
        "doc_id",
        F.when(is_gib, gibberish).otherwise(fluent).alias("text"),
        F.when(is_gib, F.lit(0)).otherwise(F.lit(1)).alias("label"),
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


QUERIES["text_perplexity_separation"] = q_perplexity_separation
QUERIES["text_commonness_separation"] = q_commonness_separation
QUERIES["quality_classifier_auc"] = q_classifier_auc

# The oracles state the planted contrast from doc_id arithmetic ALONE —
# no scoring formula on the oracle side, so an engine/oracle-mirrored
# degeneracy cannot satisfy them by construction.
ORACLES["text_perplexity_separation"] = """
    SELECT true AS separated,
           COUNT(*) FILTER (WHERE doc_id % 3 <> 0) AS n_fluent,
           COUNT(*) FILTER (WHERE doc_id % 3 = 0) AS n_gibberish
    FROM documents
"""
ORACLES["text_commonness_separation"] = """
    SELECT true AS separated,
           COUNT(*) FILTER (WHERE doc_id % 3 <> 0) AS n_fluent,
           COUNT(*) FILTER (WHERE doc_id % 3 = 0) AS n_gibberish
    FROM documents
"""
ORACLES["quality_classifier_auc"] = """
    SELECT true AS auc_ge_090,
           COUNT(*) FILTER (WHERE doc_id % 3 <> 0) AS n_pos_test,
           COUNT(*) FILTER (WHERE doc_id % 3 = 0) AS n_neg_test
    FROM documents WHERE doc_id % 2 = 1
"""


# ---------------------------------------------------------------------------
# r7: end-to-end multimodal curation pipeline (VERDICT r6 #7) — the
# multimodal analogue of llm_curation_pipeline: decode with dead-letter
# routing → decoded-feature quality gates → export-shard assignment, one
# composed plan whose oracle value-checks the per-doc ROUTE (which stage
# consumed each document) and the survivors' shard assignment.
# ---------------------------------------------------------------------------


def q_llm_multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed media curation: synth corpus (doc_id %10∈{2,7} corrupt) →
    permissive decode (corrupt → 'deadletter') → size gate (< 20 px →
    'too_small') → brightness gate on DECODED pixel sums, integer-exact
    (PNG mean pixel < 120 ⟺ sum_rgb < 360·n_pixels → 'too_dark'; JPEG
    rows are header-only by the decoder's honest contract and pass by
    policy) → md5 export shard for survivors.  Every stage is a map-only
    expression over the dead-letter decode — the whole pipeline is one
    mapInPandas + one projection, no shuffle until a downstream consumer
    groups by shard."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    decoded = decode_images(synth_images(docs, corrupt_every=10), strict=False)
    sum_rgb = F.col("sum_r") + F.col("sum_g") + F.col("sum_b")
    stage = (
        F.when(F.col("err").isNotNull(), F.lit("deadletter"))
        .when(F.col("n_pixels") < 20, F.lit("too_small"))
        .when(
            (F.col("format") == "png") & (sum_rgb < 360 * F.col("n_pixels")),
            F.lit("too_dark"),
        )
        .otherwise(F.lit("survived"))
    )
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
    return decoded.select(
        "doc_id",
        stage.alias("stage"),
        "n_pixels",
        F.when(stage == "survived", (h.cast("long") % 8).cast("int")).alias("shard"),
    )


QUERIES["llm_multimodal_pipeline"] = q_llm_multimodal_pipeline

# Route oracle from first principles: corruption classes, header dims, and
# pixel values are all closed forms of doc_id (same formulas as the
# multimodal_decode_deadletter oracle), so each document's stage and the
# survivors' md5 shard are pure SQL — no decoder on the oracle side.
ORACLES["llm_multimodal_pipeline"] = """
    WITH params AS (
        SELECT doc_id,
               doc_id % 10 IN (2, 7) AS corrupt,
               CASE WHEN doc_id % 4 = 0 THEN 'jpeg' ELSE 'png' END AS format,
               CAST(3 + doc_id % 5 AS INT) AS width,
               CAST(2 + doc_id % 7 AS INT) AS height
        FROM documents
    ),
    px AS (
        SELECT p.doc_id,
               (p.doc_id * 7 + (y.y * p.width + x.x) * 3 + c.c) % 256 AS v
        FROM params p
        CROSS JOIN range(8) y(y) CROSS JOIN range(8) x(x) CROSS JOIN range(3) c(c)
        WHERE p.format = 'png' AND NOT p.corrupt
          AND y.y < p.height AND x.x < p.width
    ),
    sums AS (SELECT doc_id, SUM(v) AS sum_rgb FROM px GROUP BY doc_id),
    staged AS (
        SELECT p.doc_id,
               CASE WHEN p.corrupt THEN 'deadletter'
                    WHEN p.width * p.height < 20 THEN 'too_small'
                    WHEN p.format = 'png'
                         AND s.sum_rgb < 360 * p.width * p.height THEN 'too_dark'
                    ELSE 'survived' END AS stage,
               CASE WHEN p.corrupt THEN NULL
                    ELSE CAST(p.width * p.height AS BIGINT) END AS n_pixels
        FROM params p LEFT JOIN sums s USING (doc_id)
    )
    SELECT doc_id, stage, n_pixels,
           CASE WHEN stage = 'survived'
                THEN CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                          AS BIGINT) % 8 AS INT)
           END AS shard
    FROM staged
"""


def q_sketch_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r7: distinct-count SKETCH accuracy — per-language
    ``approx_count_distinct`` (HyperLogLog++, Spark's mergeable sketch: the
    100 TB path where exact COUNT(DISTINCT) would shuffle every digest)
    validated against the exact distinct count computed in the same plan.
    The sketch value itself is engine-specific, so the emitted columns are
    the EXACT count (oracle-checkable) plus the accuracy verdict — HLL++
    at default rsd=0.05 must land within 10% of truth on every language
    slice.  A broken sketch (register collapse, merge bug) flips the
    verdict; the oracle states it as a constant, oracle-independent of the
    sketch's internals — same pattern as the planted scoring guards."""
    docs = load_table(spark, sf_dir, "documents")
    digest = F.sha2(F.lower(F.trim(F.col("text"))), 256)
    per = docs.groupBy("lang").agg(
        F.countDistinct(digest).alias("n_exact"),
        F.approx_count_distinct(digest).alias("__n_approx"),
    )
    ok = (
        F.abs(F.col("__n_approx") - F.col("n_exact"))
        <= F.col("n_exact") * F.lit(0.10)
    )
    return per.select("lang", "n_exact", ok.alias("sketch_within_10pct"))


QUERIES["corpus_sketch_distinct"] = q_sketch_distinct
ORACLES["corpus_sketch_distinct"] = """
    SELECT lang,
           COUNT(DISTINCT sha256(lower(trim(text)))) AS n_exact,
           true AS sketch_within_10pct
    FROM documents GROUP BY lang
"""


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


QUERIES["text_normalize_unicode"] = q_text_normalize_unicode
ORACLES["text_normalize_unicode"] = """
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
"""


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


QUERIES["text_langid_separation"] = q_langid_separation
QUERIES["text_quality_separation"] = q_quality_separation

ORACLES["text_langid_separation"] = """
    SELECT CASE doc_id % 4 WHEN 0 THEN 'en' WHEN 1 THEN 'es'
                           WHEN 2 THEN 'de' ELSE 'fr' END AS planted_lang,
           COUNT(*) AS n_docs, true AS all_correct
    FROM documents GROUP BY 1
"""
ORACLES["text_quality_separation"] = """
    SELECT CASE WHEN doc_id % 3 = 0 THEN 'degenerate' ELSE 'good' END AS cls,
           COUNT(*) AS n_docs, true AS all_verdicts_correct
    FROM documents GROUP BY 1
"""


def q_corpus_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r7: BPE tokenizer training (operators/tokenizer.py bpe_top_merges)
    over a planted corpus whose merge sequence is closed-form: every doc's
    text is "abc abc ab de", so the weighted pair counts are (a,b)=3N,
    (b,c)=2N, (d,e)=N and the learned merge table must be exactly
    [(a+b, 3N), (ab+c, 2N), (d+e, N)] — including the second round's
    dependence on the FIRST round's merged symbol (ab+c only exists after
    a+b is applied), so a broken merge application cannot pass.  The
    oracle states the table with counts scaled by COUNT(documents)."""
    from ..operators.tokenizer import bpe_top_merges

    docs = load_table(spark, sf_dir, "documents").select(
        F.lit("abc abc ab de").alias("text")
    )
    return bpe_top_merges(docs, k=3)


QUERIES["corpus_bpe_merges"] = q_corpus_bpe_merges
ORACLES["corpus_bpe_merges"] = """
    WITH n AS (SELECT COUNT(*) AS c FROM documents)
    SELECT * FROM (
        SELECT 1 AS merge_rank, 'a' AS left_sym, 'b' AS right_sym,
               'ab' AS merged, CAST(3 * c AS BIGINT) AS pair_count FROM n
        UNION ALL
        SELECT 2, 'ab', 'c', 'abc', CAST(2 * c AS BIGINT) FROM n
        UNION ALL
        SELECT 3, 'd', 'e', 'de', CAST(c AS BIGINT) FROM n
    )
"""


def q_corpus_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r7: the tokenizer loop closed — learn merges on the planted train
    corpus (same closed-form table as corpus_bpe_merges), then ENCODE a
    different planted eval text with them.  "abcd ab ae" under merges
    [a+b, ab+c, d+e] folds to [abc·d, ab, a·e] = 5 subwords over 8 base
    symbols per doc, so every per-doc stat is a constant the oracle
    states; a broken rank order or application pass shifts the counts."""
    from ..operators.tokenizer import bpe_encode, bpe_top_merges

    train = load_table(spark, sf_dir, "documents").select(
        F.lit("abc abc ab de").alias("text")
    )
    table = sorted(bpe_top_merges(train, k=3).collect(), key=lambda r: r.merge_rank)
    merges = [(r.left_sym, r.right_sym) for r in table]
    eval_docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.lit("abcd ab ae").alias("text")
    )
    return bpe_encode(eval_docs, merges)


QUERIES["corpus_bpe_encode"] = q_corpus_bpe_encode
ORACLES["corpus_bpe_encode"] = """
    SELECT doc_id, CAST(3 AS BIGINT) AS n_words,
           CAST(5 AS BIGINT) AS n_subwords,
           CAST(8 AS BIGINT) AS n_base_symbols,
           CAST(1.6 AS DOUBLE) AS compression
    FROM documents
"""


def q_similarity_truncated_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r7: dimension-truncation evaluation (the Matryoshka-representation
    question: how much of the embedding can be cut before retrieval
    degrades) — exact top-5 under the FIRST-16-dims prefix vs the full
    64-dim top-5, overlap@5 per query.  The metric that sizes a cheap
    first-stage index (prefix dims → 4× less compute/memory) against its
    recall cost.  Both sides reuse the brute-force cosine machinery; the
    oracle recomputes both rankings in SQL with the same tie-breaks."""
    from ..operators.similarity import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id")
    corpus = emb.filter(F.col("vec_id") >= 5)
    full = cosine_topk(corpus, queries, k=5).select("query_id", "neighbor_id")
    tq = queries.withColumn("embedding", F.slice("embedding", 1, 16))
    tc = corpus.withColumn("embedding", F.slice("embedding", 1, 16))
    trunc = cosine_topk(tc, tq, k=5).select("query_id", "neighbor_id")
    hits = (
        full.join(trunc, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        full.select("query_id").distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            F.round(F.coalesce("n_overlap", F.lit(0)) / 5.0, 2).alias("recall_at_5"),
        )
    )


QUERIES["similarity_truncated_recall"] = q_similarity_truncated_recall
ORACLES["similarity_truncated_recall"] = """
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
    c AS (SELECT vec_id, v AS cv FROM e WHERE vec_id >= 5),
    full_r AS (
        SELECT query_id, vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
                   ROUND(list_dot_product(qv, cv)
                         / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) DESC,
                   vec_id ASC) AS rnk
        FROM q CROSS JOIN c
    ),
    tq AS (SELECT query_id, qv[1:16] AS qv FROM q),
    tc AS (SELECT vec_id, cv[1:16] AS cv FROM c),
    trunc_r AS (
        SELECT query_id, vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
                   ROUND(list_dot_product(qv, cv)
                         / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) DESC,
                   vec_id ASC) AS rnk
        FROM tq CROSS JOIN tc
    ),
    hits AS (
        SELECT f.query_id, COUNT(*) AS n_overlap
        FROM (SELECT * FROM full_r WHERE rnk <= 5) f
        JOIN (SELECT * FROM trunc_r WHERE rnk <= 5) t
          ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
        GROUP BY f.query_id
    )
    SELECT q2.query_id,
           COALESCE(h.n_overlap, 0) AS n_overlap,
           ROUND(COALESCE(h.n_overlap, 0) / 5.0, 2) AS recall_at_5
    FROM (SELECT DISTINCT query_id FROM q) q2
    LEFT JOIN hits h USING (query_id)
"""


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


QUERIES["corpus_weighted_sample"] = q_quality_weighted_sample
ORACLES["corpus_weighted_sample"] = f"""
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
"""


def q_corpus_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r7: per-language duplication report — doc counts, distinct
    normalized-content counts, and the dup rate (the per-slice summary a
    curation run publishes before/after dedup; skewed slices tell you
    which source needs crawling fixes).  One map-side-combinable
    two-level aggregation, no joins."""
    docs = load_table(spark, sf_dir, "documents")
    digest = F.sha2(F.lower(F.trim(F.col("text"))), 256)
    per = docs.groupBy("lang", digest.alias("__d")).agg(F.count(F.lit(1)).alias("n"))
    return (
        per.groupBy("lang")
        .agg(
            F.sum("n").alias("n_docs"),
            F.count(F.lit(1)).alias("n_unique"),
            F.sum(F.when(F.col("n") > 1, F.col("n"))).alias("__dup_mass"),
        )
        .select(
            "lang",
            "n_docs",
            "n_unique",
            F.round(
                (F.col("n_docs") - F.col("n_unique")) / F.col("n_docs"), 6
            ).alias("dup_rate"),
            F.coalesce("__dup_mass", F.lit(0)).alias("docs_in_dup_groups"),
        )
    )


QUERIES["corpus_dedup_report"] = q_corpus_dedup_report
ORACLES["corpus_dedup_report"] = """
    WITH per AS (
        SELECT lang, sha256(lower(trim(text))) AS d, COUNT(*) AS n
        FROM documents GROUP BY lang, d
    )
    SELECT lang,
           CAST(SUM(n) AS BIGINT) AS n_docs,
           COUNT(*) AS n_unique,
           ROUND((SUM(n) - COUNT(*)) * 1.0 / SUM(n), 6) AS dup_rate,
           CAST(COALESCE(SUM(CASE WHEN n > 1 THEN n END), 0) AS BIGINT)
               AS docs_in_dup_groups
    FROM per GROUP BY lang
"""


def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r7: quantile SKETCH accuracy — per-event-type
    ``approx_percentile`` (the mergeable KLL-style path for 100 TB, where
    exact percentiles would sort every group) validated in-plan against
    the exact p40/p60 band: the approximate median must land inside it.
    Like corpus_sketch_distinct, the sketch value itself is
    engine-specific, so the emitted columns are the group count plus the
    accuracy verdict the oracle states as a constant."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    per = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr("percentile(value, array(0.4, 0.6))").alias("__band"),
        F.expr("approx_percentile(value, 0.5, 10000)").alias("__ap50"),
    )
    ok = (F.col("__ap50") >= F.col("__band")[0]) & (
        F.col("__ap50") <= F.col("__band")[1]
    )
    return per.select("event_type", "n_events", ok.alias("median_in_p40_p60"))


QUERIES["events_quantile_sketch"] = q_quantile_sketch
ORACLES["events_quantile_sketch"] = """
    SELECT event_type, COUNT(*) AS n_events, true AS median_in_p40_p60
    FROM events GROUP BY event_type
"""


def q_domain_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r7: domain-level quality aggregation (RefinedWeb-style domain
    filtering signal): each document's extracted source domain joined to
    its quality-gate verdict, aggregated per domain — doc counts, keep
    counts, keep rate, and a suggest-block flag for domains whose keep
    rate falls under 50%.  The step that turns per-doc quality into
    crawl-level policy.  One map+explode for the URLs, a broadcast-safe
    per-doc join (both sides keyed by doc_id), one grouped agg."""
    from ..operators.text import extract_urls, quality_score

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" via https://src"), (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.com/doc/"), F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    domains = extract_urls(docs).select("doc_id", "domain").distinct()
    verdicts = quality_score(docs).select("doc_id", "keep")
    return (
        domains.join(verdicts, "doc_id")
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("keep").cast("long")).alias("n_keep"),
        )
        .select(
            "domain",
            "n_docs",
            "n_keep",
            F.round(F.col("n_keep") / F.col("n_docs"), 6).alias("keep_rate"),
            (F.col("n_keep") * 2 < F.col("n_docs")).alias("suggest_block"),
        )
    )


QUERIES["corpus_domain_quality"] = q_domain_quality_report
# quality_score on text || injected URL: length 100-1000, diversity >= .15,
# stopword ratio <= .5 — replicated with the same DuckDB expressions the
# text_quality_score oracle uses, grouped by the injected domain
ORACLES["corpus_domain_quality"] = """
    WITH planted AS (
        SELECT doc_id,
               text || ' via https://src' || CAST(doc_id % 7 AS VARCHAR)
                    || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS text,
               'src' || CAST(doc_id % 7 AS VARCHAR) || '.example.com' AS domain
        FROM documents
    ),
    q AS (
        SELECT doc_id, domain,
               (length(text) BETWEEN 100 AND 1000)
               AND (len(list_distinct(string_split(text, ' '))) * 1.0
                    / len(string_split(text, ' ')) >= 0.15)
               AND (len(list_filter(string_split(text, ' '),
                        t -> t IN ('the', 'a', 'and', 'of'))) * 1.0
                    / len(string_split(text, ' ')) <= 0.5) AS keep
        FROM planted
    )
    SELECT domain,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
           ROUND(SUM(CASE WHEN keep THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
               AS keep_rate,
           SUM(CASE WHEN keep THEN 1 ELSE 0 END) * 2 < COUNT(*) AS suggest_block
    FROM q GROUP BY domain
"""


def q_domain_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r7: domain PageRank over the corpus link graph (operators/graph.py
    — the Common-Crawl-style crawl-prioritization rank).  Each doc gets a
    source domain (src<id%7>.example.com) and an outlink target
    (dst<id%5>.example.org) injected; edges = distinct (source → target)
    pairs recovered through the REAL URL extractor; 3 power iterations at
    damping 0.85.  The oracle derives the identical closed-form edge set
    from doc_id arithmetic and unrolls the same three iterations in SQL —
    every rank value must agree to 6 decimals."""
    from ..operators.graph import pagerank
    from ..operators.text import extract_urls

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" from https://src"), (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.com/p/"), F.col("doc_id").cast("string"),
            F.lit(" links https://dst"), (F.col("doc_id") % 5).cast("string"),
            F.lit(".example.org/q/"), F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    urls = extract_urls(docs)
    per_doc = urls.groupBy("doc_id").agg(
        F.min(F.when(F.col("domain").endswith(".example.com"), F.col("domain"))).alias("src"),
        F.min(F.when(F.col("domain").endswith(".example.org"), F.col("domain"))).alias("dst"),
    )
    edges = (
        per_doc.filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .select("src", "dst")
        .distinct()
    )
    ranks = pagerank(edges, iterations=3, damping=0.85)
    return ranks.select("node", F.round("rank", 6).alias("rank"))


QUERIES["corpus_domain_pagerank"] = q_domain_pagerank
ORACLES["corpus_domain_pagerank"] = """
    WITH e AS (
        SELECT DISTINCT
               'src' || CAST(doc_id % 7 AS VARCHAR) || '.example.com' AS s,
               'dst' || CAST(doc_id % 5 AS VARCHAR) || '.example.org' AS d
        FROM documents
    ),
    nodes AS (SELECT s AS node FROM e UNION SELECT d FROM e),
    p AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    od AS (SELECT s, COUNT(*) AS outdeg FROM e GROUP BY s),
    r0 AS (SELECT node, 1.0 / n AS rank FROM nodes, p),
    r1 AS (
        SELECT no.node, 0.15 / p.n + 0.85 * COALESCE(c.m, 0) AS rank
        FROM nodes no CROSS JOIN p
        LEFT JOIN (SELECT e.d AS node, SUM(r0.rank / od.outdeg) AS m
                   FROM e JOIN od USING (s) JOIN r0 ON r0.node = e.s
                   GROUP BY e.d) c ON c.node = no.node
    ),
    r2 AS (
        SELECT no.node, 0.15 / p.n + 0.85 * COALESCE(c.m, 0) AS rank
        FROM nodes no CROSS JOIN p
        LEFT JOIN (SELECT e.d AS node, SUM(r1.rank / od.outdeg) AS m
                   FROM e JOIN od USING (s) JOIN r1 ON r1.node = e.s
                   GROUP BY e.d) c ON c.node = no.node
    ),
    r3 AS (
        SELECT no.node, 0.15 / p.n + 0.85 * COALESCE(c.m, 0) AS rank
        FROM nodes no CROSS JOIN p
        LEFT JOIN (SELECT e.d AS node, SUM(r2.rank / od.outdeg) AS m
                   FROM e JOIN od USING (s) JOIN r2 ON r2.node = e.s
                   GROUP BY e.d) c ON c.node = no.node
    )
    SELECT node, ROUND(rank, 6) AS rank FROM r3
"""
