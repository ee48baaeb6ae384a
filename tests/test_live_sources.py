"""Env-gated live-source smoke tests (VERDICT r2 #5).

The sandbox has no Kafka broker or Postgres, so by default every test here
SKIPS — exactly mirroring the reference's own manual-only verification of
its connector configs (SURVEY §5.1).  Point the env vars at real services
to close the last structurally-verified seam (S1-S4, S9 end-to-end against
debezium-pg-connector.json:1-21):

    SPARK_KAFKA_BOOTSTRAP=broker:9092 SPARK_KAFKA_TOPIC=pg.public.orders \
    SPARK_JDBC_URL=jdbc:postgresql://host/db SPARK_JDBC_TABLE=orders \
    SPARK_JDBC_USER=u SPARK_JDBC_PASSWORD=p \
        python -m pytest tests/test_live_sources.py -v
"""

from __future__ import annotations

import os

import pytest

KAFKA = os.environ.get("SPARK_KAFKA_BOOTSTRAP")
JDBC = os.environ.get("SPARK_JDBC_URL")

needs_kafka = pytest.mark.skipif(
    not KAFKA, reason="set SPARK_KAFKA_BOOTSTRAP to run live Kafka smoke"
)
needs_jdbc = pytest.mark.skipif(
    not JDBC, reason="set SPARK_JDBC_URL to run live JDBC smoke"
)


def _listening(port: int, host: str = "127.0.0.1") -> bool:
    import socket

    s = socket.socket()
    s.settimeout(0.3)
    try:
        return s.connect_ex((host, port)) == 0
    finally:
        s.close()


def _spark_has_jar(substring: str) -> bool:
    import glob

    import pyspark

    jars = glob.glob(os.path.join(os.path.dirname(pyspark.__file__), "jars", "*.jar"))
    return any(substring in os.path.basename(j) for j in jars)


def test_live_skip_condition_is_intentional():
    """The 3 smoke tests above must never skip SILENTLY past a reachable
    service: if something is listening on the conventional broker/DB ports
    while the env vars are unset, that's a misconfigured gate, not a
    sandbox — fail with instructions instead of skipping.  Conversely,
    when the env DOES claim a service, the Spark-side driver jar must be
    present, or the smoke test would die in ClassNotFound noise instead
    of a clear message.  (In this container neither the spark-sql-kafka
    connector nor a postgresql JDBC driver jar ships with the Spark
    build, so the env-gated skips are the documented-intentional state
    even though a postgres server binary exists.)"""
    if not KAFKA and _listening(9092):
        pytest.fail(
            "a broker is listening on 127.0.0.1:9092 but SPARK_KAFKA_BOOTSTRAP "
            "is unset — set it so the live Kafka smoke tests RUN instead of skipping"
        )
    if not JDBC and _listening(5432):
        pytest.fail(
            "a database is listening on 127.0.0.1:5432 but SPARK_JDBC_URL "
            "is unset — set it so the live JDBC smoke test RUNS instead of skipping"
        )
    if KAFKA and not _spark_has_jar("spark-sql-kafka"):
        pytest.fail(
            "SPARK_KAFKA_BOOTSTRAP is set but the spark-sql-kafka connector jar "
            "is not on the Spark classpath — add it (e.g. spark.jars.packages "
            "org.apache.spark:spark-sql-kafka-0-10_2.13) or unset the env var"
        )
    if JDBC and JDBC.startswith("jdbc:postgresql") and not _spark_has_jar("postgresql"):
        pytest.fail(
            "SPARK_JDBC_URL points at Postgres but no postgresql JDBC driver jar "
            "is on the Spark classpath — add it or unset the env var"
        )


@needs_kafka
def test_kafka_stream_smoke(spark, tmp_path):
    """S1-S3 live: read one availableNow pass from a real topic; the raw
    string projection and virtual columns (key/partition/offset) must
    materialize."""
    from postgres_debezium_clickhouse_spark.sources.kafka import read_kafka_stream

    topic = os.environ.get("SPARK_KAFKA_TOPIC", "pg.public.orders")
    df = read_kafka_stream(spark, brokers=KAFKA, topics=topic)
    assert {"key", "value", "topic", "partition", "offset"} <= set(df.columns)
    out = str(tmp_path / "kafka_smoke")
    q = (
        df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() >= 0  # topic may be empty; schema must hold
    assert got.filter("offset IS NULL").count() == 0


@needs_kafka
def test_kafka_cdc_envelope_parses_live(spark):
    """S4 live: envelope-parse real Debezium messages from the topic; every
    non-poison message must yield a payload with op in (c,u,d,r)."""
    from postgres_debezium_clickhouse_spark.schemas import TABLE_REGISTRY, envelope_schema
    from postgres_debezium_clickhouse_spark.sources.cdc import parse_envelope

    topic = os.environ.get("SPARK_KAFKA_TOPIC", "pg.public.orders")
    table = os.environ.get("SPARK_KAFKA_TABLE", "orders")
    raw = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", KAFKA)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .load()
        .selectExpr("CAST(value AS STRING) AS value", "partition", "offset")
    )
    parsed = parse_envelope(raw, envelope_schema(TABLE_REGISTRY[table]["row"]))
    bad_ops = parsed.filter(
        "j.payload IS NOT NULL AND j.payload.op NOT IN ('c','u','d','r')"
    )
    assert bad_ops.count() == 0


@needs_jdbc
def test_jdbc_snapshot_smoke(spark):
    """S9 live: one consistent snapshot read over JDBC (single partition —
    smoke-sized); must produce a non-empty typed schema."""
    from postgres_debezium_clickhouse_spark.sources.jdbc import read_jdbc_snapshot

    df = read_jdbc_snapshot(
        spark,
        url=JDBC,
        table=os.environ.get("SPARK_JDBC_TABLE", "orders"),
        user=os.environ.get("SPARK_JDBC_USER", "postgres"),
        password=os.environ.get("SPARK_JDBC_PASSWORD", ""),
    )
    assert df.schema.fields  # typed columns discovered from the database
    assert df.count() >= 0


def test_kafka_source_blocked_at_jvm_boundary(spark):
    """Executable evidence for docs/LIVE_SOURCES.md: without the
    spark-sql-kafka connector jar, our reader plumbing must run all the
    way to Spark's data-source resolution and fail THERE (missing
    artifact), not earlier (our bug).  If this test ever starts failing
    because the source resolves, the container gained the jar — delete
    the infra-blocked note and unskip the live round-trip."""
    if _spark_has_jar("spark-sql-kafka"):
        pytest.skip("connector jar present — live smoke tests apply instead")
    from postgres_debezium_clickhouse_spark.sources.kafka import read_kafka_stream

    with pytest.raises(Exception, match="[Kk]afka"):
        # option building + reader construction succeed; .load() resolves
        # the source inside the JVM and raises the missing-data-source error
        read_kafka_stream(spark, brokers="127.0.0.1:9092", topics="t")
