"""Option-builder tests for the live-cluster sources (Kafka S1-S3, JDBC S9)
— no broker/DB in the container, so the contract under test is the option
dicts themselves."""

from __future__ import annotations

import pytest

from postgres_debezium_clickhouse_spark.sources.jdbc import jdbc_options
from postgres_debezium_clickhouse_spark.sources.kafka import kafka_reader_options


def test_kafka_options_basic():
    opts = kafka_reader_options("b1:9092", ["t.a", "t.b"], group_id="g1")
    assert opts["subscribe"] == "t.a,t.b"
    assert opts["kafka.group.id"] == "g1"
    assert opts["startingOffsets"] == "earliest"
    assert opts["maxOffsetsPerTrigger"] == "1024"  # Debezium max.batch.size parity
    assert opts["failOnDataLoss"] == "false"


def test_kafka_options_single_topic_no_backpressure():
    opts = kafka_reader_options("b:9092", "one", max_offsets_per_trigger=None)
    assert opts["subscribe"] == "one"
    assert "maxOffsetsPerTrigger" not in opts
    assert "kafka.group.id" not in opts


def test_jdbc_options_partitioned():
    opts = jdbc_options(
        "jdbc:postgresql://h/db", "public.products", "u", "p",
        partition_column="id", num_partitions=16, lower_bound=1, upper_bound=100000,
    )
    assert opts["partitionColumn"] == "id"
    assert opts["numPartitions"] == "16"
    assert (opts["lowerBound"], opts["upperBound"]) == ("1", "100000")


def test_jdbc_partition_requires_bounds():
    with pytest.raises(ValueError):
        jdbc_options("jdbc:postgresql://h/db", "t", "u", "p", partition_column="id")
