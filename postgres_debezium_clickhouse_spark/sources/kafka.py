"""Kafka source/sink option builders (S1-S3, T1, T7).

The live-cluster path: one ClickHouse Kafka-engine table
(basic_example/clickhouse.sql:10-20) ≙ one ``readStream.format("kafka")``
per topic group.  These builders produce the exact option dicts; the
container has no Kafka broker, so tests cover the builders and the parse
chain (sources/cdc.py) via static frames — the streaming shell is identical
either way (streaming/pipeline.py drives any source DataFrame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_reader_options(
    brokers: str,
    topics: str | list[str],
    group_id: str | None = None,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = 1024,
    fail_on_data_loss: bool = False,
    min_partitions: int | None = None,
) -> dict[str, str]:
    """Option dict for ``spark.readStream.format("kafka")``.

    - ``subscribe`` mirrors ``kafka_topic_list`` (clickhouse.sql:17);
    - ``kafka.group.id`` mirrors ``kafka_group_name`` (clickhouse.sql:18);
    - ``maxOffsetsPerTrigger`` mirrors Debezium ``max.batch.size=1024``
      backpressure (abcsvb-connector-secure.json:44, T7);
    - ``minPartitions`` mirrors ``tasks.max``
      (debezium-pg-connector.json:5): how many Spark tasks consume the
      topic even when it has fewer Kafka partitions (the source splits
      offset ranges);
    - offset tracking itself lives in the checkpoint (T1), not the consumer
      group — the group id is observability parity only.
    """
    opts = {
        "kafka.bootstrap.servers": brokers,
        "subscribe": ",".join(topics) if isinstance(topics, list) else topics,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
    }
    if group_id:
        opts["kafka.group.id"] = group_id
    if max_offsets_per_trigger:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    if min_partitions:
        opts["minPartitions"] = str(min_partitions)
    return opts


def read_kafka_stream(
    spark: SparkSession, include_headers: bool = False, **kwargs
) -> DataFrame:
    """S1 — raw-string Kafka scan with virtual columns (S3): Spark's source
    natively exposes key/value/topic/partition/offset/timestamp — the
    ``_key/_partition/_offset`` equivalents (init.sql:33).

    ``include_headers=True`` adds the record HEADER plane (r15): the
    source's ``headers`` column (array of key/binary-value pairs,
    ``includeHeaders=true``) decoded to the ``map<string,string>`` shape
    the synthetic wire log (sources/cdc.py) and the HeaderToValue SMT
    analogue (operators/transforms.header_to_value) operate on."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_reader_options(**kwargs).items():
        reader = reader.option(k, v)
    if include_headers:
        reader = reader.option("includeHeaders", "true")
    cols = [
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.col("timestamp").alias("kafka_timestamp"),
    ]
    if include_headers:
        cols.append(
            F.map_from_entries(
                F.expr(
                    "transform(headers,"
                    " h -> struct(h.key as key, cast(h.value as string) as value))"
                )
            ).alias("headers")
        )
    return reader.load().select(*cols)
