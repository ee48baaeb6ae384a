"""spark-cdc-analytics: a PySpark-native analytics engine with the query
and data-processing capabilities of ``sadin911/postgres_debezium_clickhouse``.

The reference (read-only at /root/reference) is a declaratively-specified CDC
analytics pipeline: Postgres → Debezium → Kafka → ClickHouse Kafka-engine
tables → materialized views → ReplacingMergeTree + ``FINAL`` views.  This
package re-expresses every layer Spark-first:

- ``schemas``    — Debezium envelope StructTypes + the star-schema registry
                   (reference: basic_example/value.json, key.json).
- ``functions``  — scalar/JSON/time/text/vector helpers (SURVEY.md §2.3
                   F1-F17) as thin wrappers over ``pyspark.sql.functions``.
- ``sources``    — batch/streaming sources: parquet star schema, synthetic
                   Debezium-envelope CDC generator, Kafka / JSON-file /
                   JDBC wrappers (reference: §2.1 S1-S10).
- ``operators``  — envelope parse/unwrap/mask, ReplacingMergeTree-equivalent
                   latest-wins upsert, dedup suite (exact / MinHash-LSH /
                   SimHash / n-gram Jaccard / embedding cosine), similarity
                   search, text analysis, multimodal column plumbing.
- ``streaming``  — bronze append + silver upsert as Structured Streaming
                   queries, materialized-view registry (reference: §2.8 D5),
                   pipeline lifecycle API (§2.1 S10).
- ``plans``      — the analytical query surface fed to ``__spark_entry__``.

Design rules (SURVEY.md §7.1): DataFrame/SQL API only, no RDDs, no custom
Catalyst rules; every silver table is always-final (eager per-batch merge),
so downstream queries are plain Spark SQL that Catalyst/Tungsten optimize.
"""

__version__ = "0.1.0"
