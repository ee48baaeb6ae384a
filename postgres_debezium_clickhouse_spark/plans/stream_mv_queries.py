"""Registered-materialized-view streaming queries — the D5 family:
``Pipeline.register_mv`` (the CREATE MATERIALIZED VIEW analogue,
reference basic_example/clickhouse.sql:41-55) driven end-to-end through
multi-micro-batch replays, each hash-checked against a batch oracle.

Split out of plans/ops_queries.py (r7 verdict item 8); the aggregator
there merges this module's QUERIES/ORACLES so the driver contract
(__spark_entry__._MODULES) is unchanged.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.files import load_table
from .llm_common import MINHASH_PAIR_CTES as _MH_CTES
from .llm_common import SHINGLES as _SH_CTES

from ..operators.classifier import pseudo_weights as _pw


def _mv_replay(spark: SparkSession, tag: str, source_df: DataFrame,
               transform, files_per_trigger: int = 2) -> DataFrame:
    """The shared lifecycle of every registered-MV oracle query: persist
    the fixture, replay it as a multi-micro-batch stream
    (``maxFilesPerTrigger`` forces >1 trigger so batch boundaries are
    actually exercised), register the MV, await with a LOUD timeout (a
    partial result must never reach the oracle compare), and always drop
    the registration — a stale entry would make a same-process retry
    re-register over a live name."""
    from ..streaming.pipeline import Pipeline

    run = uuid.uuid4().hex[:12]
    root = tempfile.gettempdir()
    src = f"{root}/{tag}_src_{run}"
    out = f"{root}/{tag}_out_{run}"
    ckpt = f"{root}/{tag}_ckpt_{run}"
    source_df.repartition(4).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(source_df.schema)
        .option("maxFilesPerTrigger", str(files_per_trigger))
        .parquet(src)
    )
    pipe = Pipeline(spark)
    name = f"{tag}_mv_{run}"
    try:
        mv = pipe.register_mv(name, stream, transform, out, ckpt, available_now=True)
        try:
            if not mv.query.awaitTermination(300):
                mv.query.stop()  # don't leave a zombie stream behind the error
                raise TimeoutError(
                    "stream did not finish in 300s — refusing to "
                    "return a partial result"
                )
        finally:
            pipe.drop_mv(name)
        # materialize the (small) MV result before deleting the run's
        # scratch dirs it reads from — each invocation used to leak a
        # src+out+ckpt trio under tempdir (ADVICE r6, same pattern as
        # q_ann_ivf_index)
        return spark.read.parquet(out).localCheckpoint(eager=True)
    finally:
        import shutil as _sh

        for d in (src, out, ckpt):
            _sh.rmtree(d, ignore_errors=True)


def stream_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 end-to-end: a REGISTERED materialized view (Pipeline.register_mv,
    the CREATE MATERIALIZED VIEW analogue) applying the quality gate to a
    multi-micro-batch documents replay in append mode — the stateless-MV
    counterpart of stream_hourly_counts.  The MV target must equal the
    batch filter (full value oracle).

    Scale: the transform is per-row (no state, no shuffle); append mode
    writes each batch's survivors once — the cheapest possible MV shape.
    """
    from ..operators.text import quality_score
    from ..sources.files import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return _mv_replay(
        spark, "qmv", docs,
        lambda df: quality_score(df)
        .filter(F.col("keep"))
        .select("doc_id", "token_diversity", "stopword_ratio"),
    )


def stream_filter_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r5: the r4 LLM-curation gate running as a REGISTERED streaming MV —
    Gopher rules + learned-classifier sign composed per document over a
    multi-micro-batch replay, hash-matching the batch composition.

    No stream-stream join: both signals are row expressions, chained
    map-only via operator ``passthrough`` (one scan, no state, no shuffle
    — the cheapest streaming-MV shape, same as the 100 TB scoring pass).
    The corpus-level signals of the full batch report (cross-doc
    boilerplate, LM perplexity) are deliberately absent: they aggregate
    over the corpus and belong to batch/compaction passes, not a
    stateless per-row MV."""
    from ..operators.classifier import classifier_score, pseudo_weights
    from ..operators.text import gopher_rules
    from ..sources.files import load_table

    weights = pseudo_weights(64)

    def _gate(df: DataFrame) -> DataFrame:
        g = gopher_rules(df, passthrough=("text",)).select(
            "doc_id", "text", F.col("passes").alias("gopher_ok")
        )
        return classifier_score(g, weights, passthrough=("gopher_ok",)).select(
            "doc_id",
            "gopher_ok",
            F.col("pred_keep").alias("clf_ok"),
            (F.col("gopher_ok") & F.col("pred_keep")).alias("keep"),
        )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return _mv_replay(spark, "fmv", docs, _gate)


def stream_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r5: schema-drift detection on the LIVE path — each micro-batch runs
    ``schema_drift_report`` inside ``foreachBatch`` and appends its
    per-batch drift rows; reading the sink re-aggregates to exactly the
    batch-mode totals (sum of counts, min of first-seen offsets — both
    associative, so batch boundaries cannot change the answer).  This is
    how drift becomes an alert in production: a per-trigger report stream
    instead of a post-hoc scan.

    Scale: per batch the report is a map pass + schema-width groupBy (see
    schema_drift_report); the sink grows by O(drifted-fields) rows per
    trigger, not per event."""
    from ..operators.transforms import schema_drift_report

    run = uuid.uuid4().hex[:12]
    root = tempfile.gettempdir()
    src = f"{root}/drift_src_{run}"
    out = f"{root}/drift_out_{run}"
    ckpt = f"{root}/drift_ckpt_{run}"

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    after = F.struct(
        F.col("o_orderkey"),
        F.col("o_orderstatus"),
        F.col("o_totalprice"),
        F.when(F.col("o_orderkey") % 5 == 0, F.lit("gold")).alias("loyalty_tier"),
    )
    wire = orders.select(
        F.col("o_orderkey").alias("offset"),
        F.to_json(F.struct(F.struct(after.alias("after")).alias("payload"))).alias("value"),
    )
    wire.repartition(4).write.mode("overwrite").parquet(src)

    expected = ["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]
    stream = (
        spark.readStream.schema(wire.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )

    def _report_batch(batch_df: DataFrame, epoch: int) -> None:
        # foreachBatch is at-least-once: a retried epoch must OVERWRITE its
        # own prior output, not append a duplicate — epoch-keyed subdirs
        # make the write idempotent (r5 advice item).
        schema_drift_report(batch_df, expected).write.mode("overwrite").parquet(
            f"{out}/epoch={epoch}"
        )

    q = (
        stream.writeStream.foreachBatch(_report_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("drift stream did not finish in 300s")
    import shutil as _sh

    try:
        per_batch = spark.read.parquet(out)
        return per_batch.groupBy("field", "kind").agg(
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.min("first_offset").cast("long").alias("first_offset"),
        ).localCheckpoint(eager=True)
    finally:
        for d in (src, out, ckpt):
            _sh.rmtree(d, ignore_errors=True)


def stream_ann_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r6: streaming ANN ingest — the one LLM-pipeline surface that had no
    streaming evidence.  New embeddings arrive as a stream and get IVF
    cell assignments incrementally against a FIXED centroid table (the
    deployed-index pattern: the coarse quantizer is rebuilt by batch
    compaction jobs, while ingest only ever does the cheap map-side
    assign).  Registered through the same MV lifecycle as
    ``stream_filter_report``; the DuckDB oracle recomputes every
    assignment from the closed-form init (16 lowest-id vectors), so the
    stream hash-matches the batch assignment exactly.

    Scale: ``assign_ivf_cells`` is one broadcast exchange (the k-row
    centroid table folded to a 1-row array) + a map — no shuffle of the
    stream, no state store; identical per-trigger cost profile to the
    batch scoring pass.  The stream-static broadcast is re-resolved per
    micro-batch from a ``localCheckpoint``-frozen index, so the index
    subplan never re-scans the corpus."""
    from ..operators.similarity import as_double_vec, assign_ivf_cells, ivf_centroids_df
    from ..sources.files import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # The fixed index: same init contract as ivf_ann_topk_table (16
    # lowest-id vectors), frozen so micro-batches share one materialization.
    cents = ivf_centroids_df(emb, n_centroids=16, id_col="vec_id").localCheckpoint()
    return _mv_replay(
        spark, "ann", emb,
        lambda df: assign_ivf_cells(as_double_vec(df), cents).select("vec_id", "cell"),
    )


def stream_pq_dedup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r11 — streaming SEMANTIC dedup gate on PQ codes (the deployed-
    index pattern the IVF assign stream established, applied to
    dedup-by-quantization: real pipelines drop an incoming embedding
    whose product-quantizer codes collide with an already-stored vector
    — code-identical ⇒ same Voronoi cell in every subspace ⇒ near-dup at
    the quantizer's resolution).  Codebooks + the corpus's distinct code
    set are FROZEN (batch-built, localCheckpoint); each micro-batch
    PQ-encodes its new vectors map-side against the broadcast codebooks
    and left-anti joins the static code set — no state store, no stream
    shuffle.  Fixture: new vectors derive from corpus vec_id ≡1 (mod 3)
    — odd ids arrive as EXACT copies (code-identical by construction →
    must be dropped), even ids arrive dimension-REVERSED (admitted iff
    their codes genuinely differ — the oracle recomputes both sides'
    codes, so the decision itself is value-checked, not assumed)."""
    from ..operators.similarity import pq_codebooks, pq_encode

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = emb.filter(F.col("vec_id") >= 5)
    books = pq_codebooks(corpus, m=8, ks=16, dim=64).localCheckpoint()
    code_key = F.concat_ws(
        "-", F.transform(F.col("codes"), lambda c: c.cast("string"))
    )
    corpus_keys = (
        pq_encode(corpus, books, m=8, dim=64)
        .select(code_key.alias("ck")).distinct().localCheckpoint()
    )
    k = F.col("vec_id")
    new_vecs = corpus.filter(k % 3 == 1).select(
        (k + 100000).alias("vec_id"),
        F.when(k % 2 == 1, F.col("embedding"))
        .otherwise(F.reverse("embedding")).alias("embedding"),
    )

    def gate(df: DataFrame) -> DataFrame:
        enc = pq_encode(df, books, m=8, dim=64)
        return (
            enc.withColumn("ck", code_key)
            .join(corpus_keys, "ck", "left_anti")
            .select("vec_id")
        )

    return _mv_replay(spark, "pqgate", new_vecs, gate)


def stream_drift_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r6: schema-drift alert → ACTION.  ``stream_schema_drift`` detects;
    this query reacts: each micro-batch is split by ``split_on_drift``
    (policy='quarantine') — events whose ``after`` image carries unknown
    fields land on a dead-letter path (preserved verbatim for replay once
    the registry adds the column), conforming events flow to the main
    sink.  Returns the per-route summary; the oracle recomputes it from
    the closed-form fixture (loyalty_tier appears iff o_orderkey % 5 = 0),
    so the ROUTING itself is value-checked, including offset ranges.

    Scale: the split is a map-pass filter pair over one shared parse —
    no shuffle, no state; both writes are epoch-keyed for at-least-once
    idempotence (same pattern as stream_schema_drift)."""
    from ..operators.transforms import split_on_drift

    run = uuid.uuid4().hex[:12]
    root = tempfile.gettempdir()
    src = f"{root}/quar_src_{run}"
    out = f"{root}/quar_out_{run}"
    ckpt = f"{root}/quar_ckpt_{run}"

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    after = F.struct(
        F.col("o_orderkey"),
        F.col("o_orderstatus"),
        F.col("o_totalprice"),
        F.when(F.col("o_orderkey") % 5 == 0, F.lit("gold")).alias("loyalty_tier"),
    )
    wire = orders.select(
        F.col("o_orderkey").alias("offset"),
        F.to_json(F.struct(F.struct(after.alias("after")).alias("payload"))).alias("value"),
    )
    wire.repartition(4).write.mode("overwrite").parquet(src)

    expected = ["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]
    stream = (
        spark.readStream.schema(wire.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )

    def _route_batch(batch_df: DataFrame, epoch: int) -> None:
        ok, bad = split_on_drift(batch_df, expected, policy="quarantine")
        ok.write.mode("overwrite").parquet(f"{out}/conforming/epoch={epoch}")
        bad.write.mode("overwrite").parquet(f"{out}/quarantine/epoch={epoch}")

    q = (
        stream.writeStream.foreachBatch(_route_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("quarantine stream did not finish in 300s")

    def _summary(route: str) -> DataFrame:
        return (
            spark.read.parquet(f"{out}/{route}")
            .agg(
                F.count("*").alias("n_rows"),
                F.min("offset").cast("long").alias("min_offset"),
                F.max("offset").cast("long").alias("max_offset"),
            )
            .select(F.lit(route).alias("route"), "n_rows", "min_offset", "max_offset")
        )

    import shutil as _sh

    try:
        return _summary("conforming").unionByName(
            _summary("quarantine")
        ).localCheckpoint(eager=True)
    finally:
        for d in (src, out, ckpt):
            _sh.rmtree(d, ignore_errors=True)


def stream_dedup_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r6: ingest-time dedup against the EXISTING corpus — the streaming
    half of ``incremental_dedup``: new documents arrive as a stream and
    pass only if their content digest is absent from the static corpus
    digest set (stream-static LEFT ANTI join; the corpus side is a
    digest-only projection, never the full text).  Within-batch
    duplicates deliberately pass — deduping inside the stream is
    ``stream_stateful_dedup``'s job; composing the two gives the full
    ingest gate.

    Scale: the static side is one digest column (32B/doc); Spark
    broadcasts it per micro-batch under the configured threshold, else
    shuffles the (small) batch against it — either way the corpus text is
    scanned once at stream start, not per trigger."""
    from ..operators.dedup import normalize_text
    from ..sources.files import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus_digests = (
        docs.filter(F.col("doc_id") % 5 != 0)
        .select(F.sha2(normalize_text(), 256).alias("__digest"))
        .distinct()
    )
    return _mv_replay(
        spark, "sdd", docs.filter(F.col("doc_id") % 5 == 0),
        lambda df: df.withColumn("__digest", F.sha2(normalize_text(), 256))
        .join(corpus_digests, "__digest", "left_anti")
        .select("doc_id"),
    )


def stream_neardup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r7: ingest-time NEAR-dup gate — the MinHash-LSH completion of the
    ingest gate family (``stream_dedup_new_docs`` catches exact content,
    ``stream_stateful_dedup`` catches within-stream keys; this catches
    near-identical rewrites): new documents stream in, probe the STATIC
    corpus's precomputed LSH band-key index (stream-static join, no
    state), candidates are verified by exact Jaccard against only the
    matched corpus docs' shingles, and docs with any corpus neighbor at
    j ≥ 0.8 are dropped.

    Scale: the corpus is shingled/banded ONCE at stream start (at 100 TB
    this is the persisted signature store an ingest service maintains);
    per trigger the new batch computes its own band keys and joins —
    candidate verification touches only matched corpus rows.  Per-doc
    decisions are batch-independent, so micro-batching cannot change the
    result and the batch-derived oracle is exact."""
    from ..operators.dedup import (
        lsh_band_keys,
        minhash_signature,
        with_shingles,
    )
    from ..sources.files import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    corpus_sh = with_shingles(corpus).select("doc_id", "shingles").localCheckpoint(
        eager=True
    )
    corpus_bands = (
        lsh_band_keys(minhash_signature(corpus_sh))
        .select(F.col("doc_id").alias("corpus_id"), "b", "bkey")
        .localCheckpoint(eager=True)
    )
    corpus_sh_j = corpus_sh.select(
        F.col("doc_id").alias("corpus_id"), F.col("shingles").alias("c_sh")
    )

    import shutil as _sh_

    run = uuid.uuid4().hex[:12]
    root = tempfile.gettempdir()
    src = f"{root}/ndg_src_{run}"
    out = f"{root}/ndg_out_{run}"
    ckpt = f"{root}/ndg_ckpt_{run}"
    try:
        new_docs = docs.filter(F.col("doc_id") % 5 == 0)
        new_docs.repartition(4).write.mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema(new_docs.schema)
            .option("maxFilesPerTrigger", "2")
            .parquet(src)
        )

        # per-batch gate (foreachBatch — the anti join's right side derives
        # from the batch, which a continuous stream transform cannot do);
        # epoch-keyed overwrite keeps the sink idempotent on retries
        def gate(batch: DataFrame, epoch: int) -> None:
            sh = with_shingles(batch).select("doc_id", "shingles")
            nb = lsh_band_keys(minhash_signature(sh))
            cand = (
                nb.join(corpus_bands, ["b", "bkey"])
                .select("doc_id", "corpus_id")
                .distinct()
            )
            inter = F.size(F.array_intersect("shingles", "c_sh"))
            union = F.size(F.array_distinct(F.concat("shingles", "c_sh")))
            matched = (
                cand.join(sh, "doc_id")
                .join(corpus_sh_j, "corpus_id")
                .withColumn("j", F.round(inter / union, 6))
                .filter(F.col("j") >= 0.8)
                .select("doc_id")
                .distinct()
            )
            batch.join(matched, "doc_id", "left_anti").select("doc_id").write.mode(
                "overwrite"
            ).parquet(f"{out}/epoch={epoch}")

        q = (
            stream.writeStream.foreachBatch(gate)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("near-dup gate replay did not finish in 300s")
        return spark.read.parquet(out).select("doc_id").localCheckpoint(eager=True)
    finally:
        for d in (src, out, ckpt):
            _sh_.rmtree(d, ignore_errors=True)


def stream_image_dedup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r9: ingest-time IMAGE near-dup gate — the dHash completion of the
    ingest-gate family (exact digests, within-stream keys, text
    MinHash-LSH, now perceptual images): new image blobs stream in, are
    REALLY decoded and dHashed per batch, probe the static corpus's
    precomputed band index (stream-static join, no state), candidates
    are verified by exact 64-bit Hamming against only the matched corpus
    hashes, and images within 8 bits of any corpus image are dropped.

    Fixture (scale-independent spark.range build, the dHash planted
    family): corpus = the 60 quadratic-formula PNGs; the stream carries
    one-pixel-perturbed copies of every d≡1 (mod 3) corpus image
    (near-dups → dropped) interleaved with 20 genuinely new images at
    ids 200+ (admitted).  Per-image decisions are batch-independent, so
    the closed-form oracle is exact.

    Scale: the corpus index is hash-sized metadata (2 longs + 4 band
    keys per image) built once; per trigger only the batch's blobs are
    decoded (embarrassingly parallel mapInPandas) and only matched
    candidates are Hamming-verified."""
    from ..operators.imaging import (
        dhash_band_keys,
        dhash_hamming,
        dhash_images,
        synth_dhash_images,
    )

    base = spark.range(0, 60).select(F.col("id").alias("doc_id"))
    corpus_hashes = dhash_images(synth_dhash_images(base)).localCheckpoint(eager=True)
    corpus_bands = dhash_band_keys(corpus_hashes).select(
        F.col("doc_id").alias("corpus_id"),
        F.col("dhash_hi").alias("c_hi"),
        F.col("dhash_lo").alias("c_lo"),
        "band",
        "val",
    ).localCheckpoint(eager=True)

    import shutil as _sh_

    run = uuid.uuid4().hex[:12]
    root = tempfile.gettempdir()
    src = f"{root}/idg_src_{run}"
    out = f"{root}/idg_out_{run}"
    ckpt = f"{root}/idg_ckpt_{run}"
    try:
        dup_src = base.filter(F.col("doc_id") % 3 == 1)
        new_media = (
            synth_dhash_images(dup_src, perturb=128)
            .withColumn("doc_id", F.col("doc_id") + 1000)
            .unionByName(
                synth_dhash_images(
                    spark.range(200, 220).select(F.col("id").alias("doc_id"))
                )
            )
        )
        new_media.repartition(4).write.mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema(new_media.schema)
            .option("maxFilesPerTrigger", "2")
            .parquet(src)
        )

        def gate(batch: DataFrame, epoch: int) -> None:
            hashes = dhash_images(batch)
            nb = dhash_band_keys(hashes)
            dropped = (
                nb.join(corpus_bands, ["band", "val"])
                .filter(
                    dhash_hamming(
                        F.col("dhash_hi"), F.col("dhash_lo"),
                        F.col("c_hi"), F.col("c_lo"),
                    ) <= 8
                )
                .select("doc_id")
                .distinct()
            )
            batch.join(dropped, "doc_id", "left_anti").select("doc_id").write.mode(
                "overwrite"
            ).parquet(f"{out}/epoch={epoch}")

        q = (
            stream.writeStream.foreachBatch(gate)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("image gate replay did not finish in 300s")
        return spark.read.parquet(out).select("doc_id").localCheckpoint(eager=True)
    finally:
        for d in (src, out, ckpt):
            _sh_.rmtree(d, ignore_errors=True)


def stream_dsir_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r12 — streaming DSIR quality gate (the deployed-estimator
    pattern of stream_pq_dedup_gate applied to importance weighting):
    the DSIR bucket table is FROZEN from the static corpus (target =
    the planted near-dup docs, batch-built, localCheckpoint), rides as
    a 1-row broadcast MAP, and each micro-batch document's log weight
    FOLDS over its own feature array in-row (``dsir_score_expr``) —
    keep iff log_weight > 0 (more target-like than raw).  No state
    store, no explode, ZERO stream shuffles (a groupBy would be an
    unwatermarked streaming aggregation — illegal in append mode, and
    needless: decimal addition is exact and commutative, so the in-row
    fold equals the batch estimator's sum).  Fixture: incoming docs
    derive from
    the corpus — odd ids arrive with ' dup' appended (the target
    marker), even ids unchanged; the oracle recomputes the frozen
    table AND every incoming score, so the keep/drop DECISION is
    value-checked (deterministic DECIMAL sums — both engines compute
    the identical boolean)."""
    from ..operators.curation import dsir_bucket_table, dsir_score_expr

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    target = docs.filter(F.col("text").endswith(" dup"))
    table = dsir_bucket_table(docs, target).localCheckpoint()
    k = F.col("doc_id")
    incoming = docs.select(
        (k + 100000).alias("doc_id"),
        F.when(k % 2 == 1, F.concat(F.col("text"), F.lit(" dup")))
        .otherwise(F.col("text")).alias("text"),
    )

    def gate(df: DataFrame) -> DataFrame:
        scored = dsir_score_expr(df, table)
        return scored.filter(F.col("log_weight") > 0).select(
            "doc_id", "n_feats",
            # floor half-rule: round() half-way behavior differs between
            # engines (the text_bigram_backoff find)
            (F.floor(F.col("log_weight") * 1e4 + 0.5) / 1e4)
            .alias("log_weight"),
        )

    return _mv_replay(spark, "dsirgate", incoming, gate)


def stream_exif_pii_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r18 — streaming PII quarantine over a MEDIA walk: the EXIF
    extractor (operators/exif.py) run inside a registered MV on a
    multi-micro-batch blob replay, quarantining every image whose
    GPS-IFD is present (location PII a curation pipeline must strip
    before training) — the composition of streaming ingest × per-blob
    walk × gate that a real crawl pipeline runs continuously.
    Append-mode MV: per-row mapInPandas walk, no state, no shuffle —
    the cheapest streaming shape at any scale.  Oracle states the
    quarantined set closed-form from the fixture schedules."""
    from ..operators.exif import exif_metadata, synth_exif_docs

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return _mv_replay(
        spark, "exifgate", docs,
        lambda df: exif_metadata(synth_exif_docs(df))
        .filter(F.col("gps_present"))
        .select("doc_id", "container", "make", "orientation"),
    )


QUERIES = {
    "stream_exif_pii_gate": stream_exif_pii_gate,
    "stream_pq_dedup_gate": stream_pq_dedup_gate,
    "stream_dsir_gate": stream_dsir_gate,
    "stream_image_dedup_gate": stream_image_dedup_gate,
    "stream_quality_filter": stream_quality_filter,
    "stream_filter_report": stream_filter_report,
    "stream_schema_drift": stream_schema_drift,
    "stream_ann_assign": stream_ann_assign,
    "stream_drift_quarantine": stream_drift_quarantine,
    "stream_dedup_new_docs": stream_dedup_new_docs,
    "stream_neardup_gate": stream_neardup_gate,
}

ORACLES: dict[str, str] = {
    "stream_exif_pii_gate": """
        SELECT doc_id,
               (['jpeg', 'tiff', 'webp', 'png'])[1 + doc_id % 4]
                   AS container,
               'maker ' || (doc_id % 3) AS make,
               CAST(1 + doc_id % 8 AS INT) AS orientation
        FROM documents
        WHERE doc_id % 3 = 0
          AND NOT (doc_id % 7 = 0
                   AND (['jpeg', 'tiff', 'webp', 'png'])[1 + doc_id % 4]
                       != 'tiff')
    """,
    "stream_dsir_gate": """
        WITH w AS (
            SELECT doc_id,
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
        inc AS (
            SELECT doc_id + 100000 AS doc_id,
                   CASE WHEN doc_id % 2 = 1 THEN text || ' dup'
                        ELSE text END AS text
            FROM documents
        ),
        iw AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS wd
            FROM inc
        ),
        ifeats AS (
            SELECT doc_id,
                   ('0x' || substr(md5(f), 1, 15))::BIGINT % 64 AS b
            FROM (
                SELECT doc_id, unnest(wd) AS f FROM iw
                UNION ALL
                SELECT doc_id,
                       wd[CAST(i.i AS INT)] || ' ' || wd[CAST(i.i + 1 AS INT)] AS f
                FROM iw CROSS JOIN LATERAL (
                    SELECT unnest(range(1, len(wd)))) i(i)
            )
        ),
        per AS (
            SELECT f.doc_id, COUNT(*) AS n_feats, SUM(t.lr) AS lw
            FROM ifeats f JOIN tbl t ON t.b = f.b
            GROUP BY f.doc_id
        )
        SELECT doc_id,
               CAST(n_feats AS BIGINT) AS n_feats,
               FLOOR(CAST(lw AS DOUBLE) * 1e4 + 0.5) / 1e4 AS log_weight
        FROM per WHERE lw > 0
    """,
    "stream_pq_dedup_gate": """
        WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        c AS (SELECT vec_id, v AS cv FROM e WHERE vec_id >= 5),
        base AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, cv
                 FROM (SELECT vec_id, cv FROM c ORDER BY vec_id LIMIT 16)),
        books AS (SELECT j.j, base.cell, base.cv[j.j * 8 + 1 : j.j * 8 + 8] AS ctr
                  FROM base CROSS JOIN range(8) j(j)),
        cd AS (SELECT c.vec_id, b.j, b.cell,
                      list_sum(list_transform(
                          list_zip(c.cv[b.j * 8 + 1 : b.j * 8 + 8], b.ctr),
                          p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
               FROM c CROSS JOIN books b),
        codes AS (SELECT vec_id, j, cell AS code FROM
                  (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, j
                       ORDER BY d2, cell) AS rn FROM cd) WHERE rn = 1),
        ck AS (SELECT vec_id, string_agg(CAST(code AS VARCHAR), '-' ORDER BY j) AS ck
               FROM codes GROUP BY vec_id),
        nv AS (SELECT vec_id + 100000 AS new_id,
                      CASE WHEN vec_id % 2 = 1 THEN cv
                           ELSE list_reverse(cv) END AS v
               FROM c WHERE vec_id % 3 = 1),
        nd AS (SELECT nv.new_id, b.j, b.cell,
                      list_sum(list_transform(
                          list_zip(nv.v[b.j * 8 + 1 : b.j * 8 + 8], b.ctr),
                          p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
               FROM nv CROSS JOIN books b),
        ncodes AS (SELECT new_id, j, cell AS code FROM
                   (SELECT *, ROW_NUMBER() OVER (PARTITION BY new_id, j
                        ORDER BY d2, cell) AS rn FROM nd) WHERE rn = 1),
        nck AS (SELECT new_id, string_agg(CAST(code AS VARCHAR), '-' ORDER BY j) AS ck
                FROM ncodes GROUP BY new_id)
        SELECT new_id AS vec_id FROM nck
        WHERE ck NOT IN (SELECT DISTINCT ck FROM ck)
    """,
    # closed form (see the fixture): every perturbed corpus copy is a
    # near-dup (planted Hamming ≤ 1, banded ≥ 1 shared band → dropped);
    # every genuinely-new image is ≥ 15 bits from the whole corpus
    # (measured over the deterministic formula) → admitted
    "stream_image_dedup_gate": """
        SELECT CAST(200 + i AS BIGINT) AS doc_id FROM range(20) t(i)
    """,
    "stream_quality_filter": """
        WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents)
        SELECT doc_id,
               ROUND(len(list_distinct(tk)) * 1.0 / len(tk), 4) AS token_diversity,
               ROUND(len(list_filter(tk, x -> x IN ('the', 'a', 'and', 'of'))) * 1.0 / len(tk), 4) AS stopword_ratio
        FROM t
        WHERE (length(text) >= 100 AND length(text) <= 1000)
          AND ROUND(len(list_distinct(tk)) * 1.0 / len(tk), 4) >= 0.15
          AND ROUND(len(list_filter(tk, x -> x IN ('the', 'a', 'and', 'of'))) * 1.0 / len(tk), 4) <= 0.5
    """,
    "stream_filter_report": f"""
        WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents),
        s AS (SELECT doc_id, tk,
                     CAST(len(tk) AS BIGINT) AS n_words,
                     CAST(list_sum(list_transform(tk, x -> length(x))) AS BIGINT) AS sum_len,
                     CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS BIGINT) AS n_sym,
                     CAST(len(list_intersect(list_distinct(tk), ['the', 'a', 'and', 'of'])) AS BIGINT) AS n_stop
              FROM t),
        m AS (SELECT doc_id, n_words, sum_len, n_sym, n_stop,
                     CAST(list_sum(list_transform(tk,
                         t -> wv[('0x' || substr(md5(t), 1, 8))::BIGINT % 64 + 1]))
                         AS BIGINT) AS margin
              FROM s, (SELECT {_pw(64)} AS wv) w)
        SELECT doc_id,
               ((n_words >= 50 AND n_words <= 100000)
                AND (sum_len >= 3 * n_words AND sum_len <= 10 * n_words)
                AND (n_sym * 10 < n_words)
                AND (n_stop >= 2)) AS gopher_ok,
               margin > 0 AS clf_ok,
               (((n_words >= 50 AND n_words <= 100000)
                 AND (sum_len >= 3 * n_words AND sum_len <= 10 * n_words)
                 AND (n_sym * 10 < n_words)
                 AND (n_stop >= 2)) AND margin > 0) AS keep
        FROM m
    """,
    "stream_schema_drift": """
        SELECT 'loyalty_tier' AS field, 'unknown' AS kind,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(MIN(o_orderkey) AS BIGINT) AS first_offset
        FROM orders WHERE o_orderkey % 5 = 0 HAVING COUNT(*) > 0
        UNION ALL
        SELECT 'o_orderpriority', 'missing',
               CAST(COUNT(*) AS BIGINT), CAST(MIN(o_orderkey) AS BIGINT)
        FROM orders HAVING COUNT(*) > 0
    """,
    "stream_ann_assign": """
        WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                   FROM embeddings),
        cent AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS i, v AS ctr
                 FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16)),
        d AS (SELECT e.vec_id, cent.i,
                     list_sum(list_transform(list_zip(e.v, cent.ctr),
                                             p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
              FROM e CROSS JOIN cent)
        SELECT vec_id, CAST(i AS INT) AS cell FROM
        (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, i) AS rn FROM d)
        WHERE rn = 1
    """,
    "stream_drift_quarantine": """
        SELECT 'conforming' AS route, COUNT(*) AS n_rows,
               CAST(MIN(o_orderkey) AS BIGINT) AS min_offset,
               CAST(MAX(o_orderkey) AS BIGINT) AS max_offset
        FROM orders WHERE o_orderkey % 5 <> 0
        UNION ALL
        SELECT 'quarantine' AS route, COUNT(*) AS n_rows,
               CAST(MIN(o_orderkey) AS BIGINT) AS min_offset,
               CAST(MAX(o_orderkey) AS BIGINT) AS max_offset
        FROM orders WHERE o_orderkey % 5 = 0
    """,
    "stream_dedup_new_docs": """
        SELECT d.doc_id FROM documents d
        WHERE d.doc_id % 5 = 0
          AND NOT EXISTS (
              SELECT 1 FROM documents c
              WHERE c.doc_id % 5 <> 0
                AND lower(trim(c.text)) = lower(trim(d.text)))
    """,
    "stream_neardup_gate": f"""
    WITH {_SH_CTES},
    {_MH_CTES},
    matched AS (
        SELECT CASE WHEN doc_a % 5 = 0 THEN doc_a ELSE doc_b END AS new_id
        FROM j
        WHERE jaccard >= 0.8
          AND ((doc_a % 5 = 0) <> (doc_b % 5 = 0))
    )
    SELECT doc_id FROM documents
    WHERE doc_id % 5 = 0
      AND doc_id NOT IN (SELECT new_id FROM matched)
""",
}
