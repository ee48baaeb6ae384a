"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` via DuckDB
at the given SF, compares row count, column names, and (order-insensitive)
values.  Stricter than the driver: exact equality on every cell (floats
compared bit-exact after a tiny round-trip guard) — if this passes, any
reasonable value-hash passes.

With ``--digest`` (r18), each side reduces ENGINE-SIDE to one
(row_count, order-insensitive 56-bit-sum digest) row and the driver
collects nothing but those two scalars — the mode giant-output sf10
receipts need (the r17 sf10 multi-table receipt OOMed the driver's
collect at ~48 M rows; the engine pipeline was fine).  The canonical
per-cell rendering is pinned identical across Spark and DuckDB
(verified constructs: %.9e doubles with NaN/Infinity sentinels,
micros-formatted timestamps, trailing-zero-stripped decimals, hex
blobs, big-endian first-14-hex-chars-of-md5 row hashes).

Usage: python check_correctness.py [sf_dir] [query ...] [--digest]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

import __spark_entry__ as entrymod
from postgres_debezium_clickhouse_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

_SEP = "\x1f"
_NULL = "\\N"
_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"
# strip trailing fraction zeros so decimal SCALE differences between the
# two engines' inferred types don't change the canonical text
_STRIP_RE = r"(\.\d*?)0+$"
_DOT_RE = r"\.$"

# Doubles: Java's %e rounds the SHORTEST-REPR digits while C's printf
# rounds the exact binary value — they disagree at repr ties (seen live:
# 3.015805597e+07 vs ...596e+07 for bit-identical doubles) — and Java
# 17's Double.toString is not minimal either ('4.9E-324', 17-digit
# tails).  The canonical is therefore the unique MINIMAL shortest
# round-trip repr, normalized to sign·digits·e·exp: DuckDB's VARCHAR
# cast emits it natively (normalized in SQL below); the Spark side
# renders floats through one Arrow mapInPandas pass with Python's repr
# (also minimal-shortest), property-tested identical over random bits.
_NUM_RE = "^(-?)([0-9]+)\\.?([0-9]*)(?:[eE]([-+]?[0-9]+))?$"


def _canon_float_sql(v: str, engine: str) -> str:
    """SQL normalizing a shortest-repr numeric string ``v`` to the
    engine-independent canonical ``sign || digits || 'e' || exp10``
    (no dot, no leading/trailing zeros; plain '0'/'-0' for zeros)."""
    str_t = "STRING" if engine == "spark" else "VARCHAR"

    def g(i: int) -> str:
        return f"regexp_extract({v}, '{_NUM_RE}', {i})"

    digits = f"({g(2)} || {g(3)})"
    lead = f"regexp_replace({digits}, '^0+', '')"
    mant = f"regexp_replace({lead}, '0+$', '')"
    exp = f"coalesce(cast(nullif({g(4)}, '') as int), 0)"
    decexp = (f"({exp} + length({g(2)}) - 1"
              f" - (length({digits}) - length({lead})))")
    return (
        f"CASE WHEN {v} IN ('NaN', 'Infinity', '-Infinity') THEN {v}"
        f" WHEN {mant} = '' THEN {g(1)} || '0'"
        f" ELSE {g(1)} || {mant} || 'e' || CAST({decexp} AS {str_t}) END"
    )


def _spark_cell(name: str, dtype: str):
    from pyspark.sql import functions as F

    c = F.col(name)
    if dtype in ("double", "float"):
        # pre-canonicalized to a string by _canon_floats_arrow
        raise ValueError("float columns must be canonicalized first")
    if dtype in ("timestamp", "timestamp_ntz"):
        return F.date_format(c, _TS_FMT_SPARK)
    if dtype == "binary":
        return F.hex(c)
    if dtype.startswith("decimal"):
        s = F.regexp_replace(c.cast("string"), _STRIP_RE, "$1")
        return F.regexp_replace(s, _DOT_RE, "")
    if dtype in ("string", "date", "boolean",
                 "tinyint", "smallint", "int", "bigint"):
        return c.cast("string")
    raise ValueError(f"digest mode cannot render spark type {dtype!r}")


def _duck_cell(name: str, spark_dtype: str) -> str:
    """Rendering driven by the SPARK type — the oracle column is coerced
    to it first, so engine type drift (DuckDB computing DECIMAL where
    Spark computed double, int32 vs int64, …) cannot change the
    canonical text.  Exact-mode passing guarantees the coercion is
    value-preserving (it compares cells numerically across types)."""
    q = '"' + name.replace('"', '""') + '"'
    if spark_dtype in ("double", "float"):
        # float32 widens to double EXACTLY on both sides — shortest-
        # float32 reprs are not unique across implementations (Ryu vs
        # Dragon4 tie-breaks), shortest-double of the exact value is
        d = f"{q}::DOUBLE"
        v = (
            f"(CASE WHEN isnan({d}) THEN 'NaN'"
            f" WHEN {d} = 'inf'::DOUBLE THEN 'Infinity'"
            f" WHEN {d} = '-inf'::DOUBLE THEN '-Infinity'"
            f" ELSE {d}::VARCHAR END)"
        )
        return _canon_float_sql(v, "duck")
    if spark_dtype in ("timestamp", "timestamp_ntz"):
        return f"strftime({q}::TIMESTAMP, '{_TS_FMT_DUCK}')"
    if spark_dtype == "binary":
        return f"hex({q}::BLOB)"
    if spark_dtype.startswith("decimal"):
        p_s = spark_dtype[len("decimal("):-1]
        return (f"regexp_replace(regexp_replace(({q}::DECIMAL({p_s}))"
                f"::VARCHAR, '{_STRIP_RE}', '\\1'), '{_DOT_RE}', '')")
    if spark_dtype == "date":
        return f"({q}::DATE)::VARCHAR"
    if spark_dtype == "boolean":
        return f"({q}::BOOLEAN)::VARCHAR"
    if spark_dtype in ("tinyint", "smallint", "int", "bigint"):
        return f"({q}::BIGINT)::VARCHAR"
    if spark_dtype == "string":
        return f"{q}::VARCHAR"
    raise ValueError(f"digest mode cannot render type {spark_dtype!r}")


import re as _re

_PY_NUM_RE = _re.compile(r"^(-?)(\d+)\.?(\d*)(?:[eE]([-+]?\d+))?$")


def _py_canon_float(s: str) -> str:
    """Normalize a minimal shortest-repr numeric string (Python/numpy
    str()) to the canonical sign·digits·e·exp form."""
    m = _PY_NUM_RE.match(s)
    sign, ip, fp, ex = m.group(1), m.group(2), m.group(3), m.group(4)
    digits = ip + fp
    stripped = digits.lstrip("0")
    lz = len(digits) - len(stripped)
    mant = stripped.rstrip("0")
    if not mant:
        return sign + "0"
    decexp = (int(ex) if ex else 0) + len(ip) - 1 - lz
    return f"{sign}{mant}e{decexp}"


def _canon_floats_arrow(sdf):
    """Replace every float/double column with its canonical STRING via
    one Arrow mapInPandas pass (NaN/±Inf resolved JVM-side first so
    pandas' null-vs-NaN conflation cannot corrupt the rendering)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    float_cols = [f.name for f in sdf.schema.fields
                  if f.dataType.simpleString() in ("double", "float")]
    if not float_cols:
        return sdf
    pre = []
    for f in sdf.schema.fields:
        if f.name in float_cols:
            c = F.col(f.name)
            special = (F.when(F.isnan(c), F.lit("NaN"))
                       .when(c == float("inf"), F.lit("Infinity"))
                       .when(c == float("-inf"), F.lit("-Infinity")))
            pre.append(special.alias(f.name + "\x01s"))
            pre.append(F.when(special.isNotNull(), None)
                       .otherwise(c).alias(f.name))
        else:
            pre.append(F.col(f.name))
    pre_df = sdf.select(pre)
    out_schema = T.StructType([
        T.StructField(f.name, T.StringType(), True)
        if f.name in float_cols else f
        for f in sdf.schema.fields
    ])

    def _canon(batches):
        for pdf in batches:
            out = {}
            for f in out_schema.fields:
                if f.name in float_cols:
                    sp = pdf[f.name + "\x01s"]
                    vv = pdf[f.name]
                    out[f.name] = [
                        s if isinstance(s, str)
                        # float() widens float32 EXACTLY — canonical is
                        # the shortest repr of the exact value, which is
                        # what DuckDB's FLOAT::VARCHAR renders too
                        else (None if pd.isna(v)
                              else _py_canon_float(str(float(v))))
                        for s, v in zip(sp, vv)
                    ]
                else:
                    out[f.name] = pdf[f.name]
            yield pd.DataFrame(out)

    return pre_df.mapInPandas(_canon, schema=out_schema)


def spark_digest(sdf) -> tuple[int, int]:
    """(row_count, digest) computed fully engine-side — one collected row."""
    from pyspark.sql import functions as F

    sdf = _canon_floats_arrow(sdf)
    fields = sorted(sdf.schema.fields, key=lambda f: f.name)
    cells = [F.coalesce(_spark_cell(f.name, f.dataType.simpleString()),
                        F.lit(_NULL)) for f in fields]
    row = F.concat_ws(_SEP, *cells)
    h = F.conv(F.substring(F.md5(row), 1, 14), 16, 10).cast("decimal(38,0)")
    out = sdf.select(h.alias("h")).agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum("h"), F.lit(0)).alias("d"),
    ).collect()[0]
    return int(out["n"]), int(out["d"])


def duck_digest(con, sql: str, spark_schema) -> tuple[int, int]:
    # column-set parity is part of the gate even in digest mode — an
    # oracle with extra/missing columns must FAIL, not silently render
    # only the Spark columns (r18 self-review)
    ocols = sorted(r[0] for r in con.execute(f"DESCRIBE ({sql})").fetchall())
    scols = sorted(f.name for f in spark_schema.fields)
    if ocols != scols:
        raise ValueError(
            f"columns differ: spark={scols} oracle={ocols}")
    fields = sorted(spark_schema.fields, key=lambda f: f.name)
    cells = [
        f"coalesce({_duck_cell(f.name, f.dataType.simpleString())},"
        f" '{_NULL}')"
        for f in fields
    ]
    row = "concat_ws(chr(31), " + ", ".join(cells) + ")"
    n, d = con.execute(
        f"SELECT count(*), coalesce(sum("
        f"from_hex(substring(md5({row}), 1, 14))::BIT::UBIGINT), 0) "
        f"FROM ({sql}) __t"
    ).fetchone()
    return int(n), int(d)


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--digest"]
    digest_mode = "--digest" in sys.argv[1:]
    sf_dir = args[0] if args and not args[0].startswith("-") else "/root/testdata/sf0.01"
    only = set(args[1:]) if args else set()
    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        if digest_mode:
            try:
                sdf = fn(spark, sf_dir)
                sn_, sd = spark_digest(sdf)
            except Exception as e:
                print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
                n_fail += 1
                continue
            dt = round(time.monotonic() - t0, 1)
            if name not in oracles:
                print(f"ROWS-ONLY {name}: {sn_} rows [digest] [{dt}s]")
                n_rows_only += 1
                continue
            try:
                on_, od = duck_digest(con, oracles[name], sdf.schema)
            except Exception as e:
                print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
                n_fail += 1
                continue
            dt = round(time.monotonic() - t0, 1)
            if (sn_, sd) == (on_, od):
                print(f"PASS {name} ({sn_} rows, digest {sd % 10**12}) [{dt}s]")
                n_pass += 1
            else:
                print(f"FAIL {name}: digest mismatch: "
                      f"spark=({sn_}, {sd}) oracle=({on_}, {od})")
                n_fail += 1
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = round(time.monotonic() - t0, 1)
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows, cols={scols} [{dt}s]")
            n_rows_only += 1
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns differ: spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"row count differs: spark={len(srows)} oracle={len(orows)}")
        if not problems:
            sn = normalize(srows, scols)
            on = normalize(orows, ocols)
            if sn != on:
                diffs = [(a, b) for a, b in zip(sn, on) if a != b][:3]
                problems.append(f"values differ; first diffs: {diffs}")
        if problems:
            print(f"FAIL {name}: " + " | ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows) [{dt}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
