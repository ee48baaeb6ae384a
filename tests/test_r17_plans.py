"""Executed-plan pins for the r17 operators — the 100 TB shape frozen
as tests: media walks stay single-stage shuffle-free mapInPandas,
main_content's only exchanges are doc_id hash partitionings, and the
trained-langid scorer is map-only (no Exchange at all)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _exchanges(plan: str) -> list[str]:
    return [ln.strip() for ln in plan.splitlines() if "Exchange" in ln]


def test_media_walks_are_shuffle_free(spark):
    """Every r17 walk (mp4/webp/mkv/vp8l/pdf-text) over a pre-built
    binary column must plan as scan → mapInPandas with ZERO exchanges —
    per-blob work never shuffles."""
    from postgres_debezium_clickhouse_spark.operators.mkv import (
        mkv_metadata, synth_mkv_docs)
    from postgres_debezium_clickhouse_spark.operators.mp4 import (
        mp4_metadata, synth_mp4_docs)
    from postgres_debezium_clickhouse_spark.operators.pdfmeta import (
        pdf_page_text, synth_pdf_text_docs)
    from postgres_debezium_clickhouse_spark.operators.vp8l import (
        synth_vp8l_docs, vp8l_pixel_stats)
    from postgres_debezium_clickhouse_spark.operators.webp import (
        synth_webp_docs, webp_metadata)

    ids = spark.range(0, 64, 1, 4).withColumnRenamed("id", "doc_id")
    for walk, synth in (
        (mp4_metadata, synth_mp4_docs),
        (webp_metadata, synth_webp_docs),
        (mkv_metadata, synth_mkv_docs),
        (vp8l_pixel_stats, synth_vp8l_docs),
        (pdf_page_text, synth_pdf_text_docs),
    ):
        df = walk(synth(ids))
        plan = _plan(df)
        # r18-opt: the only exchange allowed is the round-robin SEED
        # spread below the synth node (8-byte ids, the hollow-split
        # parallelism fix) — generated blobs themselves never shuffle.
        lines = plan.splitlines()
        mip = [i for i, ln in enumerate(lines) if "MapInPandas" in ln]
        for i, ln in enumerate(lines):
            if "Exchange" in ln:
                assert i > max(mip), (walk.__name__, ln)
                assert "RoundRobinPartitioning" in ln, (walk.__name__, ln)
        # r19-opt: synth + walk now COMPOSE into one Python eval
        # (operators/_pipe.pipe_map) — the generated blobs never
        # round-trip through the JVM between the two stages.
        assert plan.count("MapInPandas") == 1, walk.__name__
        # the chain must actually run
        assert df.count() >= 64


def test_main_content_exchanges_are_doc_partitionings_only(spark):
    """main_content = map + per-doc window + per-doc groupBy + the
    empty-doc left join: every Exchange must be hashpartitioning on
    doc_id — nothing global, nothing single-partition."""
    from postgres_debezium_clickhouse_spark.operators.text import main_content

    docs = spark.range(0, 32, 1, 4).withColumnRenamed("id", "doc_id") \
        .withColumn("html", F.concat(
            F.lit("<p>"), F.lit("w " * 20), F.lit("</p><nav><a>x</a></nav>")))
    plan = _plan(main_content(docs))
    exchanges = _exchanges(plan)
    assert exchanges, "expected doc_id hash partitionings"
    for e in exchanges:
        # doc_id hash shuffles, or the empty-doc left join's broadcast
        # (a size-based runtime choice — SMJ on doc_id at scale)
        assert ("hashpartitioning(doc_id" in e
                or "BroadcastExchange" in e), e
        assert "SinglePartition" not in e, e


def test_langid_score_is_map_only(spark):
    """The 100 TB scoring pass: literal weight arrays + one aggregate
    per language — zero exchanges, fuses into the scan."""
    from postgres_debezium_clickhouse_spark.operators.classifier import (
        langid_score)

    docs = spark.range(0, 16, 1, 4).withColumnRenamed("id", "doc_id") \
        .withColumn("text", F.lit("hola mundo"))
    models = {lang: ([(i * 37 + j) % 100 for j in range(32)], 5)
              for i, lang in enumerate(["en", "es"])}
    plan = _plan(langid_score(docs, models))
    assert not _exchanges(plan), _exchanges(plan)


def test_snapshot_chunk_scan_is_pushdown_range(spark, tmp_path):
    """A multi-snapshot chunk read must push its PK-range predicate
    into the parquet scan (PushedFilters), not filter post-scan."""
    from postgres_debezium_clickhouse_spark.streaming.snapshot import (
        _chunk_pred, plan_snapshot_chunks)

    p = str(tmp_path / "t")
    spark.range(0, 1000).withColumnRenamed("id", "k").withColumn(
        "v", F.col("k") * 2).write.parquet(p)
    t = spark.read.parquet(p)
    bounds = plan_snapshot_chunks(t, "k", 4)
    lo, hi = bounds[1]                              # an interior chunk
    assert isinstance(lo, int) and isinstance(hi, int)
    plan = _plan(t.filter(_chunk_pred("k", lo, hi)))
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "GreaterThanOrEqual" in m.group(1) \
        and "LessThan" in m.group(1), plan
    # coverage unaffected: every key lands in exactly one chunk
    assert sum(t.filter(_chunk_pred("k", lo_, hi_)).count()
               for lo_, hi_ in bounds) == 1000
