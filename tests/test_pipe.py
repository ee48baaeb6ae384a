"""operators/_pipe.pipe_map — mapInPandas stage fusion (r19-opt)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pipe_map_fuses_unmodified_chain(spark):
    """synth → walk over the raw pipe output plans ONE MapInPandas and
    produces exactly the rows the two-stage chain would."""
    from postgres_debezium_clickhouse_spark.operators.pdfmeta import (
        pdf_metadata, synth_pdf_docs)

    ids = spark.range(0, 48, 1, 4).withColumnRenamed("id", "doc_id")
    media = synth_pdf_docs(ids)
    df = pdf_metadata(media)
    assert _plan(df).count("MapInPandas") == 1
    # reference: force the unfused path through a no-op select
    ref = pdf_metadata(media.select("doc_id", "media"))
    assert _plan(ref).count("MapInPandas") == 2
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, ref.collect()))


def test_pipe_map_falls_back_after_dataframe_ops(spark):
    """Any intervening DataFrame operation (filter/select) drops the
    provenance, so the intermediate blobs materialize exactly as before
    — fusion must never skip a JVM-side transformation."""
    from postgres_debezium_clickhouse_spark.operators.pdfmeta import (
        pdf_metadata, synth_pdf_docs)

    ids = spark.range(0, 48, 1, 4).withColumnRenamed("id", "doc_id")
    media = synth_pdf_docs(ids).filter(F.col("doc_id") % 2 == 0)
    df = pdf_metadata(media)
    assert _plan(df).count("MapInPandas") == 2
    assert df.count() == 24


def test_pipe_map_fuses_across_modules(spark):
    """Fusion composes across operator modules: an imaging synth feeding
    the multimodal feature extractor collapses to one Python eval."""
    from postgres_debezium_clickhouse_spark.operators.imaging import (
        synth_images)
    from postgres_debezium_clickhouse_spark.operators.multimodal import (
        extract_features)

    ids = spark.range(0, 16, 1, 2).withColumnRenamed("id", "doc_id")
    df = extract_features(synth_images(ids))
    assert _plan(df).count("MapInPandas") == 1
    assert df.count() >= 16
