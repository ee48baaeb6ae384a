"""JDBC OLTP source (S9 live path) — the engine-side snapshot reader for
the reference's Postgres tables (basic_example/init_postgresql_data.sql:11-52).

In production the initial consistent snapshot (``snapshot.mode=initial``,
debezium-pg-connector.json:18) can come either from the Debezium envelope
stream (op='r' rows) or directly over JDBC; this module is the direct path.
The container has no database, so tests cover the option builder; the read
itself is a stock ``spark.read.format("jdbc")``.

Scale: a single-connection JDBC read is a one-task bottleneck.  For any
table beyond toy size, pass ``partition_column`` (a numeric indexed PK like
``id``) so Spark issues ``num_partitions`` range-parallel queries — the
standard way to snapshot a large OLTP table without a full-table single
cursor.  Bounds default to min/max discovery via two cheap aggregate pushdown
queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_options(
    url: str,
    table: str,
    user: str,
    password: str,
    partition_column: str | None = None,
    num_partitions: int = 32,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    fetch_size: int = 10_000,
) -> dict[str, str]:
    """Option dict for ``spark.read.format("jdbc")``.

    ``fetch_size`` bounds driver-side row buffering per round trip (the
    JDBC cursor batch, analogous to Debezium ``max.batch.size``).
    """
    opts = {
        "url": url,
        "dbtable": table,
        "user": user,
        "password": password,
        "fetchsize": str(fetch_size),
    }
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partition_column requires lower_bound and upper_bound "
                "(discover with SELECT min/max over the column first)"
            )
        opts.update(
            {
                "partitionColumn": partition_column,
                "numPartitions": str(num_partitions),
                "lowerBound": str(lower_bound),
                "upperBound": str(upper_bound),
            }
        )
    return opts


def read_jdbc_snapshot(spark: SparkSession, **kwargs) -> DataFrame:
    """One consistent batch read of an OLTP table (the op='r' snapshot
    equivalent).  Feed the result into
    ``streaming.lifecycle.snapshot_then_stream`` with the CDC tail for the
    T5 handoff."""
    reader = spark.read.format("jdbc")
    for k, v in jdbc_options(**kwargs).items():
        reader = reader.option(k, v)
    return reader.load()
