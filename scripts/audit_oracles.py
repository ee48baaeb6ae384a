"""Audit every registered DuckDB oracle for engine-portability hazards.

The driver compares Spark and DuckDB results with an order-insensitive
value-hash, so *type-level* differences that are value-identical still
fail.  The classic trap: DuckDB ``SUM(BIGINT)`` returns HUGEINT (int128)
while Spark returns BIGINT — identical values, different serialized hash.
(This caused the only red row in CORRECTNESS_r02: ``events_props_keys``.)

Rather than grep for ``SUM(`` textually (false-positives on intermediate
CTE sums, ``list_sum``, ``//`` inside string literals …), this audit is
type-precise: it EXECUTES each oracle against the sf0.001 fixtures and
inspects the real output column types.  Flags:

* HUGEINT / UHUGEINT anywhere in the output — Spark has no int128; always
  a hash mismatch.  Fix: ``CAST(... AS BIGINT)``.
* UTINYINT/USMALLINT/UINTEGER/UBIGINT — Spark has no unsigned ints.

Usage: ``python scripts/audit_oracles.py`` — exits non-zero if any oracle
is flagged.  Run after adding or editing any oracle.
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, ".")

from postgres_debezium_clickhouse_spark.plans import (  # noqa: E402
    analytics,
    cdc_queries,
    llm_queries,
    ops_queries,
    sql_surface,
    staging_queries,
)

MODULES = (cdc_queries, analytics, sql_surface, llm_queries,
           ops_queries, staging_queries)
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
# Any fixture scale works — DESCRIBE only needs the schemas.  Overridable
# for checkouts whose fixtures live elsewhere.
SF_DIR = os.environ.get(
    "SPARK_GRAFT_AUDIT_SF_DIR",
    os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"),
)

BAD_TYPES = {"HUGEINT", "UHUGEINT", "UTINYINT", "USMALLINT",
             "UINTEGER", "UBIGINT"}


def audit() -> list[str]:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    flags: list[str] = []
    for mod in MODULES:
        modname = mod.__name__.split(".")[-1]
        for name, sql in mod.ORACLES.items():
            try:
                # DESCRIBE resolves real DuckDB types without materializing.
                rows = con.execute(f"DESCRIBE ({sql})").fetchall()
            except Exception as e:  # noqa: BLE001
                flags.append(f"{modname}:{name}: oracle fails to plan: "
                             f"{type(e).__name__}: {e}")
                continue
            for col, dtype, *_ in rows:
                base = str(dtype).upper().split("(")[0]
                if base in BAD_TYPES:
                    flags.append(
                        f"{modname}:{name}: output column '{col}' is {dtype} "
                        f"— Spark cannot match; CAST it (BIGINT/DOUBLE)"
                    )
    return flags


if __name__ == "__main__":
    problems = audit()
    for p in problems:
        print("FLAG", p)
    print(f"{len(problems)} flag(s) across "
          f"{sum(len(m.ORACLES) for m in MODULES)} oracles")
    sys.exit(1 if problems else 0)
