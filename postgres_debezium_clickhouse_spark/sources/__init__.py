"""Sources & sinks: synthetic Debezium CDC envelopes, parquet table loader,
typed JSON (object-store) sources, Kafka option builders."""
