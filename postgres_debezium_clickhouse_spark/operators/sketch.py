"""Heavy-hitter (frequent-items) sketch — the ClickHouse ``topK()``
analogue (reference engine surface; ClickHouse implements Filtered
Space-Saving).  Algorithm: Space-Saving (Metwally et al. 2005, "Efficient
Computation of Frequent and Top-k Elements in Data Streams", public
paper).

Scale design (100 TB): the naive exact top-k is a full groupBy over every
distinct item — at corpus scale that shuffles the entire token universe.
The sketch path instead:

1. **Per-partition Space-Saving** (Arrow-batched ``mapInPandas``, bounded
   memory): each batch is counted VECTORIZED (``value_counts``), then the
   batch counts merge into a ``capacity``-bounded counter table with the
   standard min-counter eviction.  No shuffle; memory is O(capacity) per
   partition regardless of the item universe.  Guarantee: any item whose
   true partition count exceeds N_p/capacity survives in that partition's
   counter table, so any GLOBAL heavy hitter (count > N/capacity summed
   over partitions) is emitted by at least one partition.
2. **Exact candidate recount**: the union of per-partition candidates is
   small (≤ capacity × partitions — sketch metadata, not data); a
   semi-join (AQE picks broadcast vs shuffle from its measured size) +
   one groupBy recounts ONLY the candidates exactly.  The shuffle
   carries candidate items only.

Result: exact counts for the true top-k (provided ``capacity`` covers the
heavy-hitter threshold — the same sizing rule ClickHouse documents for
``topK``), at a fraction of the exact path's shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def space_saving_topk(
    items: DataFrame,
    col: str = "token",
    k: int = 10,
    capacity: int = 4096,
) -> DataFrame:
    """Top-``k`` most frequent values of ``items[col]`` → (rank, item, n).

    ``n`` is the EXACT global count (phase-2 recount), ties broken by item
    ascending — fully oracle-checkable against the exact SQL top-k
    whenever ``capacity`` covers the heavy-hitter threshold (see module
    docstring).  ``capacity`` bounds phase-1 memory per partition."""
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("item", items.schema[col].dataType),
            T.StructField("cnt_upper", T.LongType()),
        ]
    )

    def _partition_sketch(batches):
        # Batch-amortized Space-Saving: each Arrow batch is counted
        # EXACTLY (vectorized value_counts) and merged in full, then the
        # table is trimmed back to ``capacity`` in one pass — evicted mass
        # is remembered as ``floor`` and every later NEW item enters at
        # floor + cnt (the per-item min-counter inheritance, amortized:
        # any evicted item had count ≤ floor, so a re-entering item is
        # always credited conservatively and the overestimate guarantee
        # holds).  Cost per batch: O(batch distinct + capacity·log c)
        # instead of the textbook O(misses × capacity) min-scans.
        import heapq

        counters: dict = {}
        floor = 0

        for pdf in batches:
            vc = pdf[col].dropna().value_counts()  # vectorized batch count
            for val, cnt in vc.items():
                if val in counters:
                    counters[val] += int(cnt)
                else:
                    counters[val] = floor + int(cnt)
            excess = len(counters) - capacity
            if excess > 0:
                evict = heapq.nsmallest(
                    excess, counters.items(), key=lambda kv: (kv[1], str(kv[0]))
                )
                for val, cnt in evict:
                    del counters[val]
                    if cnt > floor:
                        floor = cnt
        yield pd.DataFrame(
            {"item": list(counters), "cnt_upper": list(counters.values())}
        )

    src = items.select(F.col(col))
    candidates = (
        src.mapInPandas(_partition_sketch, out_schema)
        .select("item")
        .distinct()
    )
    # no broadcast FORCE (review r8): the candidate union is tiny for sane
    # capacity×partitions, but at extreme fan-out a forced broadcast would
    # bypass autoBroadcastJoinThreshold and OOM the driver — let AQE pick
    # broadcast vs shuffle from the measured size
    exact = (
        src.join(
            candidates.withColumnRenamed("item", col), col, "left_semi"
        )
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n").desc(), F.col(col).asc())
    return (
        exact.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("rank", F.col(col).alias("item"), "n")
    )
