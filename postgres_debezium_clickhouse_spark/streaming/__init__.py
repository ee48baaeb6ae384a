"""Structured-Streaming shell: materialized-view registry, bronze append,
silver upsert, lifecycle API, observability."""
