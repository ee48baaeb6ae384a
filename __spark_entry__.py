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
    # round-11 additions (never driver-checked), newest first:
    "stream_agg_sortedarray_state",
    "events_weighted_quantiles",
    "corpus_unigram_encode",
    "corpus_unigram_vocab",
    "stream_pq_dedup_gate",
    "events_window_funnel_strict",
    "similarity_ann_ivfpq_topk",
    "similarity_pq_adc_topk",
    "events_value_histogram",
    "ch_running_diff_neighbor",
    "dedup_substring_spans",
    "object_store_tsv_ingest",
    "ch_array_join",
    "stream_agg_bitmap_state",
    "stream_agg_summap_state",
    "cdc_incremental_snapshot",
    "object_store_proto_ingest",
    # steady-state cycling (oldest driver evidence first — recomputed
    # r11 from CORRECTNESS_r01..r10: the 15-name r6 cohort that missed
    # the r10 window, then the r7-evidence cohort.  The ~50-query driver
    # window covers the additions + everything through most of r7.
    # (synthetic_transactions, r3 evidence, stays in _BACK by standing
    # policy: rows-only by contract, so a window slot on it loses a
    # full-value check.)
    "revenue_rollup",  # r6
    "salted_customer_revenue",  # r6
    "segment_distinct_stats",  # r6
    "segment_stats",  # r6
    "silver_cross_table_revenue",  # r6
    "similarity_ann_ivf_index",  # r6
    "similarity_ivf_recall",  # r6
    "stream_ann_assign",  # r6
    "stream_dedup_new_docs",  # r6
    "stream_drift_quarantine",  # r6
    "supplier_balance_ranks",  # r6
    "text_html_extract",  # r6
    "text_url_extract",  # r6
    "top_customers",  # r6
    "top_parts_by_price",  # r6
    "cdc_hotkey_state",  # r7
    "cdc_replay_from_bronze",  # r7
    "corpus_bpe_encode",  # r7
    "corpus_bpe_merges",  # r7
    "corpus_dedup_report",  # r7
    "corpus_domain_pagerank",  # r7
    "similarity_truncated_recall",  # r7
    "text_normalize_unicode",  # r7
    "quality_classifier_auc",  # r7
    "text_perplexity_separation",  # r7
    "text_commonness_separation",  # r7
    "text_langid_separation",  # r7
    "text_quality_separation",  # r7
    "multimodal_thumbnails",  # r7
    "multimodal_frames",  # r7
    "llm_multimodal_pipeline",  # r7
    "corpus_weighted_sample",  # r7
    "corpus_domain_quality",  # r7
    "corpus_sketch_distinct",  # r7
    "events_quantile_sketch",  # r7
    "stream_bronze_archive",  # r7
    "stream_silver_state",  # r7
    "stream_stateful_dedup",  # r7
    "stream_hourly_counts",  # r7
    "silver_time_travel",  # r7
    "silver_mutation",  # r7
    "stream_sliding_counts",  # r7
    "stream_sessionization",  # r7
    "stream_stream_join",  # r7
    "object_store_typed_ingest",  # r7
    "stream_neardup_gate",  # r7
    "sql_correlated_subquery",  # r7
    "sql_in_subquery",  # r7
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
