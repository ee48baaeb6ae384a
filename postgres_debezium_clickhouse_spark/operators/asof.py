"""As-of (temporal) join — a first-class operator Spark's DataFrame API
lacks (pandas-on-Spark has merge_asof; plain SQL users fall back to
per-row correlated subqueries or range cross-joins, both of which die at
scale).

Algorithm (the scale-correct form): tag both inputs, UNION them, and run a
single ``last(right_payload, ignorenulls=True)`` window per key ordered by
(ts, side, tiebreak).  For every left row the window yields the most recent
right row at-or-before its timestamp.  Cost: ONE hash shuffle on the key +
one sort within partitions — identical shape to a keyed window aggregate;
no range explosion, no per-row lookups, AQE-balanced.

Not present in the reference (SURVEY §2.4 notes no as-of/range joins), but
part of the engine's extended surface — attribution, sensor alignment, and
slowly-changing-dimension lookups all reduce to this operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    tiebreak: str | None = None,
    right_prefix: str = "right_",
    tolerance_seconds: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` matching on the ``on`` keys (backward as-of,
    inclusive — DuckDB/pandas ``merge_asof`` default).  Left rows with no
    prior right row keep NULL right columns (left-outer semantics).

    ``direction='forward'`` (r15 — pandas ``merge_asof`` direction,
    ClickHouse ``ASOF JOIN ... l.ts <= r.ts``): the EARLIEST right row
    with ``right_ts >= left_ts`` instead — the time-to-next-event shape
    (click → next purchase).  Same plan, mirrored window: first/last
    and the side ordering swap, nothing else.

    ``tiebreak`` orders equal-timestamp right rows (backward: last one
    wins; forward: first one wins — both "closest in scan order"); give
    a unique column (event id, offset) whenever right timestamps can
    collide.  ``tolerance_seconds`` (pandas ``merge_asof(tolerance=…)``):
    a match farther than the tolerance (older for backward, newer for
    forward) is discarded — the attached row becomes NULL, exactly as
    if no match existed.  Applied AFTER the window match, so it adds
    zero shuffle.  Output: every left column + each right non-key
    column as ``{right_prefix}{name}``.
    """
    if direction not in {"backward", "forward"}:
        raise ValueError("direction must be 'backward' or 'forward'")
    fwd = direction == "forward"
    rcols = [c for c in right.columns if c not in on]
    payload = F.struct(*[F.col(c) for c in rcols])

    # tiebreak must be numeric (an id/offset); both sides carry it as long
    tb = (F.col(tiebreak).cast("long") if tiebreak else F.lit(0).cast("long")).alias("__tb")
    # inclusive match at equal ts: right sorts BEFORE left for backward
    # (so preceding-window last() sees it), AFTER left for forward (so
    # following-window first() sees it)
    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        tb,
        F.lit(1 if fwd else 0).alias("__side"),
        payload.alias("__rp"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in left.columns],
    )
    l = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast("long").alias("__tb"),
        F.lit(0 if fwd else 1).alias("__side"),
        F.lit(None).cast(r.schema["__rp"].dataType).alias("__rp"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )

    base = Window.partitionBy(*on).orderBy(
        F.col("__ts").asc(), F.col("__side").asc(),
        F.col("__tb").asc_nulls_first(),
    )
    if fwd:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        match = F.first("__rp", ignorenulls=True).over(w)
    else:
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        match = F.last("__rp", ignorenulls=True).over(w)
    joined = (
        r.unionByName(l)
        .withColumn("__match", match)
        .filter(F.col("__side") == (0 if fwd else 1))
    )
    if tolerance_seconds is not None:
        if right_ts not in rcols:
            raise ValueError("tolerance_seconds requires right_ts in the right payload")
        # timestamp→double is epoch seconds; TIMESTAMP_NTZ can't cast to
        # double directly, so hop via TIMESTAMP (same session-tz reading on
        # both sides — the difference is unaffected); numeric ts subtract
        # directly
        is_ts = "timestamp" in joined.schema["__ts"].dataType.simpleString()

        def _secs(c: F.Column) -> F.Column:
            return c.cast("timestamp").cast("double") if is_ts else c.cast("double")

        age = _secs(F.col("__ts")) - _secs(F.col("__match")[right_ts])
        if fwd:
            age = -age
        joined = joined.withColumn(
            "__match", F.when(age <= tolerance_seconds, F.col("__match"))
        )
    out_cols = [F.col(f"__l_{c}").alias(c) for c in left.columns]
    out_cols += [F.col("__match")[c].alias(f"{right_prefix}{c}") for c in rcols]
    return joined.select(*out_cols)
