"""Range (interval) join — match right rows whose timestamp falls inside a
window anchored at each left row: ``left_ts + lower <= right_ts <=
left_ts + upper``.

Spark plans a raw inequality join as BroadcastNestedLoopJoin (fine only
when one side broadcasts) or refuses outright for large-large.  The
scale-correct form used here is TIME-BUCKET EXPANSION: bucket both sides
by ``ceil(window / bucket)``-aligned time bins, explode each LEFT row into
the bins its window touches, equi-join on (key, bin), then apply the exact
bounds.  Cost: one hash shuffle on (key, bin); fan-out is
``window/bucket + 1`` bins per row — constant, never O(n²).

Not in the reference (SURVEY §2.4: no range joins); part of the engine's
extended surface (alerts-near-deploys, error-after-signup, sensor
windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
    bucket_s: int | None = None,
) -> DataFrame:
    """Inner interval join: every (left, right) pair on matching keys with
    ``right_ts`` in ``[left_ts + lower_s, left_ts + upper_s]`` (seconds,
    inclusive).  ``bucket_s`` defaults to the window span (one bin of slack
    either side ⇒ ≤ 3 bins per left row).

    Output: all left columns + all right non-key columns (caller renames
    collisions beforehand)."""
    if upper_s < lower_s:
        raise ValueError(f"upper_s ({upper_s}) < lower_s ({lower_s})")
    span = max(upper_s - lower_s, 1)
    bucket = bucket_s or span

    lsec = F.unix_timestamp(F.col(left_ts).cast("timestamp"))
    rsec = F.unix_timestamp(F.col(right_ts).cast("timestamp"))

    # left explodes into every bin its window [lsec+lower, lsec+upper] touches
    lo_bin = F.floor((lsec + lower_s) / bucket)
    hi_bin = F.floor((lsec + upper_s) / bucket)
    l = left.withColumn("__bin", F.explode(F.sequence(lo_bin, hi_bin))).withColumn("__lsec", lsec)
    r = right.withColumn("__bin", F.floor(rsec / bucket)).withColumn("__rsec", rsec)

    cond = [l[c] == r[c] for c in on] + [l["__bin"] == r["__bin"]]
    joined = l.join(r, cond, "inner").where(
        (r["__rsec"] >= l["__lsec"] + lower_s) & (r["__rsec"] <= l["__lsec"] + upper_s)
    )
    rcols = [c for c in right.columns if c not in on]
    return joined.select(
        *[l[c] for c in left.columns],
        *[r[c] for c in rcols],
    )
