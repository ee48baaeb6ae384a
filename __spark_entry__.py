"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine: ``postgres_debezium_clickhouse_spark`` — a PySpark-native
re-expression of the reference CDC-analytics pipeline
(sadin911/postgres_debezium_clickhouse) plus the LLM training-data
operator suite.  Queries are registered by the plans/ submodules.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from postgres_debezium_clickhouse_spark.plans import (
    analytics,
    cdc_queries,
    llm_queries,
    ops_queries,
    sql_surface,
    staging_queries,
)

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the typed latest-wins current state of the orders CDC log
    (products_usable_vw equivalent — parse → filter → window dedup →
    casts)."""
    return cdc_queries.cdc_current_state(spark, SF0001)


# Driver-window insurance (standing order): the driver's CORRECTNESS gate
# evaluates only the FIRST ~50 entries of queries() in registration order,
# so the least-driver-validated queries must register first.  Rotation
# policy (r5 item 4 → r7 item 1 → r8 item 1): _FRONT = never-checked r9
# additions first, then the LAST pre-r6-evidence cohort (18 names whose
# driver evidence is still r5 — r8's window cut one before them — plus
# the 10 r5-evidence names the judge re-ran in r7); once this round's
# gate covers those 33, every registry name has r6+ driver evidence and
# the list becomes steady-state cycling (oldest-evidence first).  When
# adding a query, insert its name at the TOP of _FRONT.
_MODULES = (llm_queries, ops_queries, staging_queries, sql_surface, cdc_queries, analytics)

_FRONT = (
    # round-16 additions (never driver-checked), newest first, inserted
    # here as they land.
    "multimodal_office_meta",        # r16: ZIP/OPC/EPUB walk
    "corpus_sitemap_discovery",      # r16: sitemap/frontier parse
    "corpus_robots_policy",          # r16: RFC 9309 crawl policy
    "multimodal_pdf_meta",           # r16: classic-xref PDF walk
    "multimodal_audio_flac_meta",    # r16: FLAC STREAMINFO/tags walk
    "multimodal_audio_mp3_meta",     # r16: MP3 frame walk + ID3v2
    "text_5gram_kneser_ney",         # r16: KenLM-order interpolated KN
    "object_store_avro_registry_ingest",  # r16: Confluent wire format
    "stream_txn_multi_state",        # r16: cross-table txn visibility
    "multimodal_decode_jpeg",        # fixture now 50% PROGRESSIVE (r16)
    # r15 additions the r15 driver window cut off before reaching
    "cdc_header_to_value",
    "cdc_partition_route",
    "cdc_timezone_convert",
    # steady-state cycling (oldest driver evidence first — recomputed
    # r16 from CORRECTNESS_r01..r15): the r15 window consumed exactly
    # the 50-name r15-additions head, so the oldest-evidence cohort is
    # still the 40-name r9 tail below, then the r10 head.  With 13
    # never-driver-checked names above (10 r16 additions + the 3
    # window-cut r15 names), the ~50 window reaches ~37 of the r9 tail
    # — never-checked ranks above oldest-checked by the standing
    # least-driver-validated-first policy; the r9 remainder leads r17.
    # (synthetic_transactions stays in _BACK by standing policy.)
    "dedup_image_dhash",  # r9
    "dedup_minhash_lsh",  # r9
    "dedup_semantic",  # r9
    "events_hourly_gapfill",  # r9
    "events_uniq_upto",  # r9
    "events_window_funnel",  # r9
    "llm_curation_pipeline",  # r9
    "multimodal_decode",  # r9
    "multimodal_features",  # r9
    "multimodal_video_frames",  # r9
    "pack_chunks",  # r9
    "pack_greedy",  # r9
    "products_usable_vw",  # r9
    "quality_classifier_score",  # r9
    "quality_gopher_rules",  # r9
    "silver_projection_scan",  # r9
    "silver_ttl_rollup",  # r9
    "silver_version_diff",  # r9
    "similarity_ann_ivf_table",  # r9
    "similarity_ann_ivf_topk",  # r9
    "similarity_ann_lsh_buckets",  # r9
    "similarity_ann_lsh_topk",  # r9
    "similarity_cosine_topk",  # r9
    "star_join_revenue",  # r9
    "stream_agg_argmax_state",  # r9
    "stream_agg_kmv_state",  # r9
    "stream_agg_state",  # r9
    "stream_collapsing_state",  # r9
    "stream_filter_report",  # r9
    "stream_image_dedup_gate",  # r9
    "stream_schema_drift",  # r9
    "stream_schema_evolution",  # r9
    "stream_vcollapsing_state",  # r9
    "text_boilerplate",  # r9
    "text_lm_perplexity",  # r9
    "text_pii_scrub",  # r9
    "text_repetition",  # r9
    "text_tfidf_top_terms",  # r9
    "token_length_histogram",  # r9
    "trn_passport_current",  # r9
    # r10-evidence head — pads the window to >=50
    "buyer_segment_setops",  # r10
    "cdc_bronze_stats",  # r10
    "cdc_change_feed",  # r10
    "cdc_deadletter_stats",  # r10
    "cdc_first_image",  # r10
    "cdc_json_extract_path",  # r10
    "cdc_masked_customers",  # r10
    "cdc_multiplex_route",  # r10
    "cdc_rewrite_mode",  # r10
    "check_violation_counts",  # r10
)

# Oracle-inexpressible by the reference's own randomness contract
# (init_postgresql_data.sql random transactions): can only ever be a
# `no_oracle` row, so keep it OUT of the driver's ~50-query window.
_BACK = (
    "synthetic_transactions",
)


def _merge(attr: str) -> dict:
    merged: dict = {}
    for mod in _MODULES:
        merged.update(getattr(mod, attr))
    out = {n: merged[n] for n in _FRONT if n in merged}
    out.update((n, v) for n, v in merged.items() if n not in out and n not in _BACK)
    out.update((n, merged[n]) for n in _BACK if n in merged)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _merge("QUERIES")


def oracle_sql() -> dict[str, str]:
    return _merge("ORACLES")
