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


_MODULES = (cdc_queries, analytics, sql_surface, llm_queries, ops_queries, staging_queries)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out
