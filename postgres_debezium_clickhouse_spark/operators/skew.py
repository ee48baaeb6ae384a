"""Skew mitigation: salted two-phase aggregation.

AQE's skew-join splitting (on in session.py) covers joins; for GROUPED
AGGREGATION over a pathologically hot key (one customer with 10% of a
100 TB fact table), pre-splitting the key with a salt bounds the largest
reduce task: phase 1 aggregates (key, salt) — the hot key's rows spread
over ``n_salts`` tasks — phase 2 combines the per-salt partials per key.
Exact for any decomposable aggregate (sum/count/min/max).

The salt must be uniform but need not be deterministic across runs —
``pmod(monotonically_increasing_id(), n)`` spreads rows without a data
scan (id encodes partition+offset) and without the rand() nondeterminism
re-execution hazard (a retried task re-draws rand; mid varies too but only
between partials, which combine to the same totals either way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    sum_cols: dict[str, F.Column],
    n_salts: int = 16,
    count_alias: str | None = None,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``sum_cols`` maps output name → input expression; every aggregate is a
    SUM (express counts via ``count_alias``).  Result is bit-identical to
    ``df.groupBy(keys).agg(sum(...))`` — the salt only changes the shuffle
    topology.
    """
    salted = df.withColumn("__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)))
    phase1_aggs = [F.sum(expr).alias(f"__p_{name}") for name, expr in sum_cols.items()]
    if count_alias:
        phase1_aggs.append(F.count(F.lit(1)).alias("__p_cnt"))
    partial = salted.groupBy(*keys, "__salt").agg(*phase1_aggs)
    phase2_aggs = [F.sum(f"__p_{name}").alias(name) for name in sum_cols]
    if count_alias:
        phase2_aggs.append(F.sum("__p_cnt").alias(count_alias))
    return partial.groupBy(*keys).agg(*phase2_aggs)
