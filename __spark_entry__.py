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
# policy (r5 verdict item 4, r6 verdict item 4): _FRONT = never-checked
# r7 additions first, then last-evidence cohorts oldest-first (computed
# from CORRECTNESS_r0*.json: r2 = repeat_buyer_keys + the events_* family
# that missed r6's cut, then r3 incl. the streaming quartet, then r4),
# with r5-evidence names filling the remaining slots.  When adding a
# query, insert its name at the TOP of _FRONT to keep the window honest.
_MODULES = (llm_queries, ops_queries, staging_queries, sql_surface, cdc_queries, analytics)

_FRONT = (
    # round-7 additions (never driver-checked):
    "silver_mutation",
    "stream_neardup_gate",
    "corpus_domain_pagerank",
    "corpus_domain_quality",
    "events_quantile_sketch",
    "corpus_dedup_report",
    "corpus_weighted_sample",
    "similarity_truncated_recall",
    "silver_time_travel",
    "stream_sliding_counts",
    "stream_sessionization",
    "corpus_bpe_merges",
    "corpus_bpe_encode",
    "text_langid_separation",
    "text_quality_separation",
    "text_normalize_unicode",
    "corpus_sketch_distinct",
    "cdc_hotkey_state",
    "llm_multimodal_pipeline",
    "stream_late_events",
    "text_perplexity_separation",
    "quality_classifier_auc",
    "text_commonness_separation",
    # last driver evidence = r02 (missed the r6 window cut):
    "repeat_buyer_keys",
    "events_json_extract",
    "events_hourly_counts",
    "events_sessionization",
    "events_sliding_counts",
    "events_user_funnel",
    "events_purchase_attribution",
    "events_attribution_tolerance",
    "events_errors_after_signup",
    "events_micro_ts_roundtrip",
    "events_value_percentiles",
    "events_value_anomalies",
    # last driver evidence = r03 (synthetic_transactions stays in _BACK):
    "stream_bronze_archive",
    "stream_silver_state",
    "cdc_replay_from_bronze",
    "stream_stateful_dedup",
    "stream_hourly_counts",
    "stream_stream_join",
    "object_store_typed_ingest",
    "sql_correlated_subquery",
    "sql_in_subquery",
    "sql_scalar_subquery_select",
    "zorder_customer_locality",
    "orders_trailing_30d_avg",
    "ddl_view_roundtrip",
    "multimodal_thumbnails",
    "multimodal_frames",
    "trn_passport_ts_version",
    # last driver evidence = r04:
    "text_stats",
    "text_lang_id",
    "text_quality_score",
    "text_token_count",
    "text_fingerprint",
    "multimodal_byte_stats",
    "text_commonness",
    "quality_adaptive_filter",
    "similarity_lsh_recall",
    "dedup_incremental",
    "stream_quality_filter",
    "llm_quality_funnel",
    "pack_efficiency",
    # r5-evidence filler for the remaining window slots:
    "cdc_current_state",
    "products_usable_vw",
    "dedup_minhash_lsh",
    "similarity_ann_ivf_table",
    "trn_passport_current",
    "llm_curation_pipeline",
    "dedup_clusters_star",
    "text_lm_perplexity",
    # llm_queries / ops_queries / staging_queries follow via _MODULES order.
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
