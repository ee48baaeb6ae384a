"""Executed-plan pins for the r18 fixes — chunk-range pushdown must
hold for the non-integral Debezium ordering types too (decimal(p,s)
and date order columns), and the bounds must stay JSON-round-trippable
for the resume contract."""

from __future__ import annotations

import json
import re

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _pushed(plan: str) -> str:
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    return m.group(1) if m else ""


def test_snapshot_chunk_pushdown_decimal_order_col(spark, tmp_path):
    """r18 (ADVICE low): a decimal(p,s) order column — a common
    Debezium PK type — must produce typed literals that reach
    PushedFilters, not double-cast full scans."""
    from postgres_debezium_clickhouse_spark.streaming.snapshot import (
        _chunk_pred, plan_snapshot_chunks)

    for dtype, expr in (
        ("decimal(10,0)", F.col("id").cast("decimal(10,0)")),
        ("decimal(12,2)", (F.col("id") / F.lit(4)).cast("decimal(12,2)")),
    ):
        p = str(tmp_path / dtype.replace("(", "_").replace(",", "_"))
        spark.range(0, 1000).select(
            expr.alias("k"), (F.col("id") * 2).alias("v")
        ).write.parquet(p)
        t = spark.read.parquet(p)
        bounds = plan_snapshot_chunks(t, "k", 4)
        # bounds must survive the JSON progress file round-trip
        assert json.loads(json.dumps(bounds)) == [list(b) for b in bounds]
        lo, hi = bounds[1]
        pushed = _pushed(_plan(t.filter(_chunk_pred("k", lo, hi, dtype))))
        assert "GreaterThanOrEqual" in pushed and "LessThan" in pushed, (
            dtype, pushed)
        assert sum(t.filter(_chunk_pred("k", lo_, hi_, dtype)).count()
                   for lo_, hi_ in bounds) == 1000


def test_snapshot_chunk_pushdown_date_order_col(spark, tmp_path):
    from postgres_debezium_clickhouse_spark.streaming.snapshot import (
        _chunk_pred, plan_snapshot_chunks)

    p = str(tmp_path / "dt")
    spark.range(0, 1000).select(
        F.date_add(F.lit("2020-01-01").cast("date"),
                   F.col("id").cast("int")).alias("k"),
        F.col("id").alias("v"),
    ).write.parquet(p)
    t = spark.read.parquet(p)
    bounds = plan_snapshot_chunks(t, "k", 4)
    assert json.loads(json.dumps(bounds)) == [list(b) for b in bounds]
    assert all(isinstance(v, str) for lo, hi in bounds[1:-1] for v in (lo, hi))
    lo, hi = bounds[1]
    pushed = _pushed(_plan(t.filter(_chunk_pred("k", lo, hi, "date"))))
    assert "GreaterThanOrEqual" in pushed and "LessThan" in pushed, pushed
    assert sum(t.filter(_chunk_pred("k", lo_, hi_, "date")).count()
               for lo_, hi_ in bounds) == 1000


def _assert_blob_shuffle_free(plan: str, name: str) -> None:
    """The media-walk discipline, r18-opt form: per-BLOB work never
    shuffles.  The only Exchange allowed is the round-robin SEED spread
    below the synth mapInPandas (it moves 8-byte ids so the CPU-bound
    synth+walk parallelize — the hollow-split fix); any Exchange above a
    MapInPandas node would move generated blobs and fails the pin."""
    lines = plan.splitlines()
    mip = [i for i, ln in enumerate(lines) if "MapInPandas" in ln]
    assert mip, name
    for i, ln in enumerate(lines):
        if "Exchange" in ln:
            assert i > max(mip), (name, ln)
            assert "RoundRobinPartitioning" in ln, (name, ln)


def test_r18_walks_are_shuffle_free(spark):
    """Every r18 walk (ogg/heif/fmp4/exif/subtitles) over a pre-built
    column must plan as a fused mapInPandas chain whose only exchange is
    the seed spread below it — per-blob work never shuffles (the r17
    media-walk discipline + the r18-opt parallel seed fix)."""
    from postgres_debezium_clickhouse_spark.operators.exif import (
        exif_metadata, synth_exif_docs)
    from postgres_debezium_clickhouse_spark.operators.heif import (
        heif_metadata, synth_heif_docs)
    from postgres_debezium_clickhouse_spark.operators.mp4 import (
        fmp4_metadata, synth_fmp4_docs)
    from postgres_debezium_clickhouse_spark.operators.ogg import (
        ogg_metadata, synth_ogg_docs)
    from postgres_debezium_clickhouse_spark.operators.subtitles import (
        subtitle_stats, synth_subtitle_docs)
    from postgres_debezium_clickhouse_spark.operators.compressed import (
        gzip_metadata, synth_gzip_docs, synth_zstd_docs, zstd_metadata)

    ids = spark.range(0, 64, 1, 4).withColumnRenamed("id", "doc_id")
    for walk, synth in (
        (ogg_metadata, synth_ogg_docs),
        (heif_metadata, synth_heif_docs),
        (fmp4_metadata, synth_fmp4_docs),
        (exif_metadata, synth_exif_docs),
        (subtitle_stats, synth_subtitle_docs),
        (gzip_metadata, synth_gzip_docs),
        (zstd_metadata, synth_zstd_docs),
    ):
        df = walk(synth(ids))
        plan = _plan(df)
        _assert_blob_shuffle_free(plan, walk.__name__)
        # r19-opt: synth + walk compose into ONE Python eval (pipe_map)
        assert plan.count("MapInPandas") == 1, walk.__name__
        assert df.count() >= 64


def test_feed_parse_is_jvm_side(spark):
    """parse_feeds must contain no Python evaluation (BatchEvalPython /
    MapInPandas) — regexp + xpath are JVM expressions."""
    from pyspark.sql import functions as F

    from postgres_debezium_clickhouse_spark.operators.curation import (
        parse_feeds)

    df = spark.range(0, 8).select(
        F.concat(F.lit("d"), F.col("id")).alias("domain"),
        F.lit("<rss><channel><item><title>t</title>"
              "<link>u</link></item></channel></rss>").alias("feed_xml"))
    plan = _plan(parse_feeds(df))
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    assert "Exchange" not in plan
