"""PySpark-native analytics engine with the capabilities of the reference
CDC pipeline (sadin911/postgres_debezium_clickhouse) plus an LLM
training-data operator suite.

Modules:
- ``session``    — SparkSession factory with 100 TB-oriented defaults
- ``schemas``    — Debezium envelope StructTypes + table registry
- ``functions``  — scalar/JSON/time helpers (SURVEY §2.3 F1-F17)
- ``sources``    — synthetic CDC envelopes, parquet tables, typed JSON,
                   Kafka option builders (S1-S9)
- ``operators``  — latest-wins upsert + change-feed diff (W1/W2/S8/T3/T4),
                   SMT transforms (P6/P8-P10), as-of/range joins, skew-safe
                   aggregation, Z-order/bucketed layout, dedup suite (incl.
                   connected-components clustering), similarity search
                   (cosine / sign-LSH / IVF), corpus curation (PII scrub,
                   splits, sampling, contamination, packing), text analysis
                   (lang-ID, quality, repetition, TF-IDF, vocab), multimodal
                   plumbing
- ``streaming``  — MV registry, bronze/silver streaming shell (D5/S7/S8/
                   S10/T1/T2/T7/T8), stateful operators + RocksDB confs
- ``plans``      — the registered query surface feeding __spark_entry__
"""

__version__ = "0.3.0"
