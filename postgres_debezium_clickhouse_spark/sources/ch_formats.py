"""ClickHouse text input/output formats, JVM-side (r11).

Reference surface: the reference's tables are fed through ClickHouse
formats — the Kafka engine uses JSONEachRow (sources/files.py), but the
CLI/file workflows in the same ecosystem default to ``TabSeparated``
(a.k.a. TSV — clickhouse-client's default output) and ``CSVWithNames``.
A user switching from the reference expects to point the engine at those
dumps.

``TabSeparated`` is NOT csv-with-a-tab-separator: there is no quoting.
Values are backslash-ESCAPED instead (the public format spec:
clickhouse.com/docs/interfaces/formats): ``\\`` backslash, ``\\t`` tab,
``\\n`` newline, ``\\r`` carriage return, and the bare ``\\N`` field for
NULL.  Spark's csv reader cannot express that, so the codec here is a
chain of built-in string expressions — fully JVM-side, splittable text
scan, whole-stage codegen; no Python in the hot path.

Unescape correctness: all escape sequences start with a backslash, so
swapping literal ``\\\\`` pairs to a sentinel first makes every
remaining backslash an escape intro — the replace chain is then
order-safe (the classic two-phase unescape; a field that was an escaped
backslash followed by 'N' can no longer be confused with the NULL
marker, which is matched against the RAW field).

``*WithNames`` variants carry a header line per file; the reader drops
header lines by exact content match (the same strategy Spark's own csv
header option uses per partition) — a data row that exactly equals the
header would be dropped too, which cannot happen when any column is
numeric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: sentinel for the two-phase unescape — a char that cannot appear in
#: TSV data (CH escapes control chars; NUL terminates nothing here, it
#: is just a byte Spark strings carry fine)
_SENT = "\x00"


def tsv_escape(col: F.Column) -> F.Column:
    """String column → CH TabSeparated field (NULL → ``\\N``)."""
    esc = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    esc = F.replace(esc, F.lit("\t"), F.lit("\\t"))
    esc = F.replace(esc, F.lit("\n"), F.lit("\\n"))
    esc = F.replace(esc, F.lit("\r"), F.lit("\\r"))
    return F.when(col.isNull(), F.lit("\\N")).otherwise(esc)


def tsv_unescape(col: F.Column) -> F.Column:
    """CH TabSeparated field → string column (``\\N`` → NULL, matched on
    the raw field BEFORE unescaping, per the format spec)."""
    s = F.replace(col, F.lit("\\\\"), F.lit(_SENT))
    s = F.replace(s, F.lit("\\t"), F.lit("\t"))
    s = F.replace(s, F.lit("\\n"), F.lit("\n"))
    s = F.replace(s, F.lit("\\r"), F.lit("\r"))
    s = F.replace(s, F.lit(_SENT), F.lit("\\"))
    return F.when(col == "\\N", F.lit(None).cast("string")).otherwise(s)


def _header_line(schema: T.StructType) -> str:
    return "\t".join(f.name for f in schema.fields)


def _typed_select(split_col: str, schema: T.StructType) -> list[F.Column]:
    out = []
    for i, f in enumerate(schema.fields):
        raw = F.element_at(F.col(split_col), i + 1)
        out.append(tsv_unescape(raw).cast(f.dataType).alias(f.name))
    return out


def read_ch_tsv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    with_names: bool = False,
) -> DataFrame:
    """Typed DataFrame from ClickHouse TabSeparated dumps under ``path``.
    One splittable JVM text scan; split on real tabs (data tabs are
    escaped by the format), per-field unescape + cast to ``schema``."""
    lines = spark.read.text(path)
    if with_names:
        lines = lines.filter(F.col("value") != _header_line(schema))
    return lines.select(
        F.split("value", "\t").alias("__f")
    ).select(*_typed_select("__f", schema))


def read_ch_tsv_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    with_names: bool = False,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin: new TSV dumps under ``path`` become typed
    micro-batches (same S6 discovery shape as the JSON/Avro/proto
    sources)."""
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    lines = reader.text(path)
    if with_names:
        lines = lines.filter(F.col("value") != _header_line(schema))
    return lines.select(
        F.split("value", "\t").alias("__f")
    ).select(*_typed_select("__f", schema))


def write_ch_tsv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write ``df`` as ClickHouse ``TabSeparated`` (headerless — CH's
    default CLI format; the WithNames reader also accepts these files
    since no data line matches a header).  Escaping is the exact inverse
    of the reader; executor-parallel text write, one file per
    partition."""
    line = F.concat_ws(
        "\t", *[tsv_escape(F.col(c).cast("string")) for c in df.columns]
    )
    df.select(line.alias("value")).write.mode(mode).text(path)


def read_ch_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    with_names: bool = True,
) -> DataFrame:
    """ClickHouse ``CSVWithNames``/``CSV``: RFC-style double-quote
    quoting, which Spark's native csv reader speaks directly — thin
    typed wrapper for surface parity.  ``multiLine`` is required for
    quoted embedded newlines; it makes each FILE one split (inherent to
    quoted-newline CSV — prefer TabSeparated for splittable scans, where
    newlines are escaped instead)."""
    return (
        spark.read.schema(schema)
        .option("header", "true" if with_names else "false")
        .option("nullValue", "\\N")
        .option("multiLine", "true")
        .csv(path)
    )
