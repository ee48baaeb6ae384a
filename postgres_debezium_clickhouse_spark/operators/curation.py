"""Corpus-curation operators for training-data pipelines: PII scrubbing,
deterministic split assignment, benchmark-contamination detection.

Like the rest of the LLM-data suite these go beyond the reference (no
document corpus there) but are first-class for the 100 TB target.  All
pure DataFrame expressions (whole-stage codegen, no Python UDFs), and all
hashing/regex is engine-portable so the DuckDB oracles reproduce results
exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: ASCII-class-only patterns — identical semantics under Java regex (Spark)
#: and RE2 (DuckDB): no lookaround, no backrefs, no unicode classes.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
LONG_DIGITS_RE = r"[0-9]{7,}"


def pii_scrub(documents: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Redact common PII shapes in-flight: emails → ``<EMAIL>`` first (they
    embed digits), then long digit runs (phone/card/id numbers) → ``<NUM>``.

    The narrow, linear scrub every corpus pass applies before anything else;
    at 100 TB it is a map-only stage (no shuffle) fused into the scan."""
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col(text_col), EMAIL_RE, "<EMAIL>"),
        LONG_DIGITS_RE,
        "<NUM>",
    )
    return documents.select(F.col(id_col), scrubbed.alias("scrubbed"))


def hash_split(
    documents: DataFrame,
    id_col: str = "doc_id",
    boundaries: tuple[str, str] = ("cd", "e6"),
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Deterministic train/val/test assignment by content-independent hash:
    bucket = first 2 hex chars of md5(id), compared lexicographically.
    Defaults: < 'cd' → train (205/256 ≈ 80%), < 'e6' → val (≈ 10%), else
    test.

    Hash-of-id (not random()) is the correct split at scale: stable across
    runs, machines, and engine versions; joins/reshards never move a doc
    across splits; and downstream dedup can run per-split without leakage.
    Map-only, no shuffle."""
    lo, hi = boundaries
    h = F.substring(F.md5(F.col(id_col).cast("string")), 1, 2)
    split = (
        F.when(h < F.lit(lo), "train").when(h < F.lit(hi), "val").otherwise("test")
    )
    return documents.select(
        F.col(id_col), *[F.col(c) for c in passthrough], split.alias("split")
    )


def shard_of(id_col: str, n_shards: int):
    """Deterministic, engine-portable corpus shard: the first 16 bits of
    md5(id) mod ``n_shards``.  md5 (not ``hash()``) so DuckDB oracles and
    any other engine reproduce the assignment bit-for-bit; content- and
    layout-independent, so reshards/joins never move a doc across shards."""
    h16 = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10)
    return h16.cast("long") % n_shards


def chunk_content_defined(documents: DataFrame, w: int = 3, modulus: int = 8,
                          id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Content-defined chunking (the FastCDC idea at token granularity):
    a chunk boundary falls AFTER token ``i`` whenever the md5 of the
    ``w``-token window ending at ``i`` hashes to 0 mod ``modulus`` —
    boundaries depend only on local content, so inserting or deleting a
    sentence re-chunks ONE neighborhood instead of shifting every
    subsequent chunk the way fixed sliding windows do.  That makes the
    emitted chunk fingerprints stable keys for sub-document dedup across
    crawl snapshots.

    Emits (doc_id, chunk_index, start_token, n_tokens, chunk_md5); mean
    chunk length ≈ ``modulus`` tokens.

    Scale: pure array expressions — tokenize, one ``filter`` over
    positions for boundaries, one ``posexplode`` over the chunk spans;
    no shuffle, no UDF, whole-stage codegen end to end (same narrow shape
    as ``sliding_window_chunks``)."""
    tk = F.split(F.col(text_col), " ")
    # boundary positions: i in [w-1, n-2] where md5(window ending at i) ≡ 0
    # (never the last token — a trailing boundary would emit an empty
    # chunk).  The size guard matters: Spark's sequence(a, b) DESCENDS
    # when a > b, so a doc shorter than w+1 tokens must yield no
    # boundaries, not a reversed out-of-range position list.
    bpos = (
        f"if(size(__tk) >= {w + 1}, "
        f"filter(sequence({w - 1}, size(__tk) - 2), i -> "
        f"conv(substring(md5(array_join(slice(__tk, i - {w - 2}, {w}), ' ')), 1, 4), 16, 10) "
        f"% {modulus} = 0), array())"
    )
    # chunk j spans (B[j-1]+1 .. B[j]), with B[-1] = -1 and B[last] = n-1
    spans = (
        "zip_with(transform(concat(array(-1), __b), x -> x + 1), "
        "concat(__b, array(size(__tk) - 1)), (s, e) -> struct(s, e))"
    )
    return (
        documents.filter(F.length(text_col) > 0)
        .select(F.col(id_col), tk.alias("__tk"))
        .withColumn("__b", F.expr(bpos))
        .select(F.col(id_col), "__tk", F.posexplode(F.expr(spans)).alias("chunk_index", "__s"))
        .select(
            F.col(id_col),
            F.col("chunk_index"),
            F.col("__s.s").cast("long").alias("start_token"),
            (F.col("__s.e") - F.col("__s.s") + 1).cast("long").alias("n_tokens"),
            F.md5(
                F.array_join(F.expr("slice(__tk, __s.s + 1, __s.e - __s.s + 1)"), " ")
            ).alias("chunk_md5"),
        )
    )


def training_order(documents: DataFrame, id_col: str = "doc_id",
                   n_shards: int = 256) -> DataFrame:
    """Deterministic global training order — the export 'shuffle': every
    doc gets a dense 0-based position in md5(id) order (uniform w.r.t.
    content, reproducible across runs/engines — the property
    ``df.orderBy(rand())`` lacks).

    Scale shape: a naive global ``row_number`` collapses to ONE partition.
    Instead: the leading md5 BYTE is a range shard (prefix-contiguous, so
    shard-asc + hash-asc IS global hash order); rank within each shard's
    parallel window, then add the shard's offset via a prefix sum over the
    256-row shard-count table, broadcast back.  Two narrow shuffles (shard
    window + the broadcast join); the only serial step is the 256-row
    cumulative sum.  Same decomposition at any corpus size — the md5
    prefix is uniform, so shards stay balanced."""
    from pyspark.sql import Window

    if n_shards != 256:
        raise ValueError("n_shards must be 256 (one md5 leading byte per shard)")
    h = F.md5(F.col(id_col).cast("string"))
    ranked = documents.select(F.col(id_col), h.alias("__h")).withColumn(
        "__shard", F.conv(F.substring("__h", 1, 2), 16, 10).cast("int")
    ).withColumn(
        "__rn",
        F.row_number().over(
            Window.partitionBy("__shard").orderBy(F.col("__h").asc(), F.col(id_col).asc())
        ),
    )
    counts = ranked.groupBy("__shard").agg(F.count("*").alias("__n"))
    offsets = counts.withColumn(
        "__off",
        F.coalesce(
            F.sum("__n").over(
                Window.orderBy("__shard").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("__shard", "__off")
    return (
        ranked.join(F.broadcast(offsets), "__shard")
        .select(
            F.col(id_col),
            (F.col("__off") + F.col("__rn") - 1).cast("long").alias("train_order"),
        )
    )


def pack_chunks(
    documents: DataFrame,
    budget: int,
    partition_col: str = "lang",
    order_col: str = "doc_id",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 16,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid end-to-end in
    deterministic ``order_col`` order within each (``partition_col``,
    ``shard``) group, and the token stream is cut into fixed
    ``budget``-token context windows.  Per document: its start offset in
    the group's stream and the first/last window it lands in (a doc may
    straddle windows — the standard pretraining concat+chunk, not first-fit
    bin packing).  Bin ids are group-local; ``(partition_col, shard,
    bin)`` identifies a context window globally.

    Scale: ONE window cum-sum per (partition, shard) group.  The default
    composite key — ``partition_col`` × md5-shard (``n_shards`` ways) — is
    deliberate: ``lang`` alone has ~5 values, so at corpus scale one
    language would be one window partition = one straggler task.  The
    md5 shard keeps every group bounded at ~1/n_shards of a language
    regardless of skew; raise ``n_shards`` with corpus size (it only
    changes which docs share a context window, not packing quality)."""
    n = F.size(F.split(F.col(text_col), " ")).cast("long")
    sharded = documents.withColumn("shard", shard_of(id_col, n_shards))
    w = Window.partitionBy(partition_col, "shard").orderBy(order_col)
    cum = F.sum(n).over(w)
    start = (cum - n).alias("start_token")
    return sharded.select(
        F.col(id_col),
        F.col(partition_col),
        F.col("shard"),
        start,
        F.floor((cum - n) / budget).alias("bin_first"),
        F.floor((cum - 1) / budget).alias("bin_last"),
    )


def stratified_sample(
    documents: DataFrame,
    n_per_stratum: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified sample: EXACTLY ``n_per_stratum`` docs per
    stratum (fewer if the stratum is smaller), chosen by md5-of-id order —
    uniform w.r.t. content, reproducible across runs/engines (unlike
    ``df.sample``, whose RNG is partition-layout-dependent).

    One window per stratum key; at 100 TB use a finer stratum (lang×shard)
    if a single stratum's rows exceed one executor's window capacity."""
    from pyspark.sql import Window

    h = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        documents.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .select(F.col(id_col), F.col(stratum_col))
    )


def pack_greedy(
    documents: DataFrame,
    budget: int,
    partition_col: str = "lang",
    order_col: str = "doc_id",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 16,
) -> DataFrame:
    """Greedy next-fit packing: whole documents are placed into
    ``budget``-token bins in deterministic ``order_col`` order per
    (``partition_col``, ``shard``) group; a doc that does not fit the
    current bin opens a new one (a doc larger than the budget occupies a
    bin alone).  No document straddles bins — the complement of
    ``pack_chunks``.  Bin ids are group-local; ``(partition_col, shard,
    bin_id)`` is the global bin key.

    The per-group state (current bin fill) is a sequential recurrence no
    window function expresses, so this is the legitimate pandas boundary:
    ``applyInPandas`` per group, Arrow-batched, one deterministic linear
    pass.  The composite default key (``partition_col`` × md5-shard,
    see ``shard_of``) bounds every pandas group to ~1/n_shards of a
    language — ``lang`` alone would hand applyInPandas one multi-TB group
    per language at corpus scale."""
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(partition_col, T.StringType()),
            T.StructField("shard", T.LongType()),
            T.StructField("n_tokens", T.LongType()),
            T.StructField("bin_id", T.LongType()),
        ]
    )

    n_tokens = F.size(F.split(F.col(text_col), " ")).cast("long")
    cols = [
        F.col(id_col),
        F.col(partition_col),
        shard_of(id_col, n_shards).alias("shard"),
        n_tokens.alias("n_tokens"),
    ]
    if order_col not in (id_col, partition_col):
        cols.append(F.col(order_col))
    slim = documents.select(*cols)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        bins, fill, cur = [], 0, 0
        for n in pdf["n_tokens"]:
            if fill and fill + n > budget:
                cur += 1
                fill = 0
            fill += n
            bins.append(cur)
        pdf["bin_id"] = bins
        return pdf[[id_col, partition_col, "shard", "n_tokens", "bin_id"]]

    return slim.groupBy(partition_col, "shard").applyInPandas(pack, schema=out_schema)


def pack_best_fit(
    documents: DataFrame,
    budget: int,
    partition_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 16,
) -> DataFrame:
    """r14 — Best-Fit-Decreasing packing (Johnson 1973's classic
    11/9·OPT-bounded heuristic; the quality reference next to
    ``pack_greedy``'s next-fit): docs sorted LARGEST-FIRST
    (n_tokens desc, then ``id_col`` asc), each placed into the
    FULLEST bin that still fits — ties on fill broken by lowest
    bin_id — else a new bin opens.  A doc larger than the budget
    occupies a bin alone (its bin never fits anything else).  Same
    group key, schema, and scale argument as ``pack_greedy``: the
    sequential bin-state recurrence is the legitimate Arrow boundary,
    bounded per (``partition_col`` × md5-shard) group; the quadratic
    inner scan is over the group's OPEN BINS (≤ docs-in-group, itself
    shard-bounded).

    The DuckDB oracle replays the SAME state machine as a recursive
    CTE carrying the full bin-fill list — every placement decision is
    value-checked, not just bin counts."""
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(partition_col, T.StringType()),
            T.StructField("shard", T.LongType()),
            T.StructField("n_tokens", T.LongType()),
            T.StructField("bin_id", T.LongType()),
        ]
    )

    n_tokens = F.size(F.split(F.col(text_col), " ")).cast("long")
    slim = documents.select(
        F.col(id_col),
        F.col(partition_col),
        shard_of(id_col, n_shards).alias("shard"),
        n_tokens.alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", id_col], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        fills: list[int] = []
        out: list[int] = []
        for n in pdf["n_tokens"]:
            best_idx, best_fill = -1, -1
            for j, f in enumerate(fills):
                if f + n <= budget and f > best_fill:
                    best_fill, best_idx = f, j
            if best_idx < 0:
                fills.append(int(n))
                out.append(len(fills) - 1)
            else:
                fills[best_idx] += int(n)
                out.append(best_idx)
        pdf["bin_id"] = out
        return pdf[[id_col, partition_col, "shard", "n_tokens", "bin_id"]]

    return slim.groupBy(partition_col, "shard").applyInPandas(pack, schema=out_schema)


def token_budget_sample(
    documents: DataFrame,
    budget_tokens: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sample each ``group_col`` group down to ~``budget_tokens`` tokens by
    deterministic hash fraction: keep a doc iff ``u(id) < min(1,
    budget/group_total_tokens)`` where ``u(id)`` = first 32 md5 bits of the
    id as a uniform [0,1) — the mixture-execution step after
    ``domain_mix_weights`` decides the shares.

    This is deliberately NOT an exact-cutoff sample (no per-group cum-sum
    window): the budget is hit in expectation, which is the scalable shape —
    per-group totals are a tiny map-side-combinable aggregate broadcast
    back, and the keep decision is map-only, reshard-stable, and identical
    no matter how the corpus is partitioned.  An exact cutoff needs a
    global per-group ordered cum-sum = one window partition per group = a
    straggler at 100 TB (use ``stratified_sample``'s ranked variant on a
    finer stratum when exactness matters).  Every float step (one division,
    one multiply-free compare) is IEEE-identical in the oracle."""
    n = F.size(F.split(F.col(text_col), " ")).cast("long")
    d = documents.select(F.col(id_col), F.col(group_col), n.alias("n_tokens"))
    totals = d.groupBy(group_col).agg(F.sum("n_tokens").alias("total_tokens"))
    u = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
        "double"
    ) / F.lit(4294967296.0)
    frac = F.least(F.lit(1.0), F.lit(float(budget_tokens)) / F.col("total_tokens"))
    return (
        d.join(F.broadcast(totals), group_col)
        .filter(u < frac)
        .select(F.col(id_col), F.col(group_col), F.col("n_tokens"))
    )


def decontam_normalize(col) -> "F.Column":
    """Benchmark-side text normalization for long-n-gram decontamination
    (the industry-standard prep: case-fold, strip punctuation, collapse
    whitespace) so cosmetic edits can't hide a verbatim benchmark span.
    Applied to BOTH sides — normalization must be symmetric or the
    n-grams never align."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(c), "[^a-z0-9 ]+", " "), " +", " "
        )
    )


def contamination_check(
    train_docs: DataFrame,
    benchmark_docs: DataFrame,
    id_col: str = "doc_id",
    k: int = 3,
    normalize: bool = False,
    text_col: str = "text",
) -> DataFrame:
    """Benchmark-contamination detection: for every training document, the
    number of word ``k``-gram shingles it shares with ANY benchmark
    document, and a contaminated flag.

    ``k`` GOVERNS THE FALSE-POSITIVE RATE (r9, verdict item 5): short
    shingles (k=3) flag any doc that reuses three common consecutive
    words — at corpus scale that flags nearly everything and would gut a
    real corpus; production benchmark decontamination uses LONG n-grams
    (k≈8-13: a verbatim 13-word span is vanishingly unlikely by chance).
    The k=3 default is kept for the legacy oracle query; use k=13 +
    ``normalize=True`` (``decontam_normalize`` on both sides) for the
    real thing — the planted-contrast fixture in
    ``contamination_check_13g`` demonstrates exactly this divergence.

    Plan shape: the benchmark shingle set is DISTINCT'd and broadcast (a
    benchmark suite is tiny next to a 100 TB corpus), so the check is a
    map-side hash-join over the exploded training shingles followed by one
    count aggregation on the doc key — no shuffle of corpus text, no
    all-pairs comparison."""
    from .dedup import spread_for_compute, with_shingles

    if normalize:
        train_docs = train_docs.withColumn(text_col, decontam_normalize(text_col))
        benchmark_docs = benchmark_docs.withColumn(
            text_col, decontam_normalize(text_col)
        )
    bench_shingles = (
        with_shingles(benchmark_docs, k=k)
        .select(F.explode("shingles").alias("s"))
        .distinct()
    )
    train_shingles = with_shingles(spread_for_compute(train_docs), k=k).select(
        F.col(id_col), F.explode("shingles").alias("s")
    )
    hits = (
        train_shingles.join(F.broadcast(bench_shingles), "s")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        train_docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def domain_mix_weights(
    documents: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-domain sampling weights that would rebalance the corpus to a
    UNIFORM token share per domain — the mixture-weighting step every
    pretraining corpus goes through (oversample scarce domains, downsample
    dominant ones); any target distribution is this output times the
    target shares.

    Scale: one map-side-combinable aggregation (|domains| rows cross the
    shuffle), then a scalar-total broadcast window over those |domains|
    rows — nothing here grows with corpus size.  Weight arithmetic uses a
    single integer→double division so the oracle is bit-identical.
    """
    n_tokens = F.size(F.split(F.col(text_col), " ")).cast("long")
    per = documents.groupBy(domain_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tokens).alias("total_tokens"),
    )
    w = Window.partitionBy()
    grand = F.sum("total_tokens").over(w)
    k = F.count(F.lit(1)).over(w)
    return per.select(
        F.col(domain_col),
        F.col("n_docs"),
        F.col("total_tokens"),
        F.round(F.col("total_tokens") / grand, 6).alias("token_share"),
        # uniform-target weight = (grand/k)/total, as ONE division
        F.round(grand / (k * F.col("total_tokens")), 6).alias("mix_weight"),
    )


def token_length_histogram(
    documents: DataFrame,
    bin_tokens: int = 64,
    text_col: str = "text",
) -> DataFrame:
    """Sequence-length distribution in fixed ``bin_tokens`` bins — the
    packing/truncation diagnostic (how much of the corpus fits a context
    window; what padding waste a given seq-len costs).

    Scale: a two-column map-side-combinable groupBy; ~(max_len/bin) rows
    total.  Bins use ``floor(n/bin)`` on exact integers — portable."""
    n = F.size(F.split(F.col(text_col), " ")).cast("long")
    return (
        documents.select((F.floor(n / bin_tokens) * bin_tokens).alias("bin_start"), n.alias("n"))
        .groupBy("bin_start")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").alias("total_tokens"),
            F.min("n").alias("min_tokens"),
            F.max("n").alias("max_tokens"),
        )
    )


def domain_temperature_weights(
    documents: DataFrame,
    temperature: float = 2.0,
    domain_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled domain mixture (the multilingual-sampling rule of
    Conneau & Lample 2019 / mT5, public papers): domain share ∝
    ``tokens^(1/T)``, renormalized.  ``T=1`` reproduces natural shares,
    ``T→∞`` approaches uniform — the standard middle ground between
    ``domain_mix_weights``' uniform target and no rebalancing at all.
    ``boost`` is the per-domain up/down-sampling factor (temp share over
    natural share) a sampler applies downstream.

    Scale: identical shape to ``domain_mix_weights`` — one
    map-side-combinable agg to |domains| rows, then scalar-total windows
    over those rows only.  The default ``T=2`` uses ``sqrt`` (IEEE
    exact-rounded, engine-portable); other temperatures go through ``pow``
    and are rounded to 6 places like every float column here."""
    n_tokens = F.size(F.split(F.col(text_col), " ")).cast("long")
    per = documents.groupBy(domain_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tokens).alias("total_tokens"),
    )
    x = F.col("total_tokens").cast("double")
    tempered = F.sqrt(x) if temperature == 2.0 else F.pow(x, 1.0 / temperature)
    w = Window.partitionBy()
    per = per.withColumn("__tw", tempered)
    grand = F.sum("total_tokens").over(w)
    grand_tw = F.sum("__tw").over(w)
    return per.select(
        F.col(domain_col),
        F.col("n_docs"),
        F.col("total_tokens"),
        F.round(F.col("total_tokens") / grand, 6).alias("token_share"),
        F.round(F.col("__tw") / grand_tw, 6).alias("temp_share"),
        F.round((F.col("__tw") / grand_tw) / (F.col("total_tokens") / grand), 6).alias("boost"),
    )


def unimax_mix_weights(
    documents: DataFrame,
    epoch_cap: int = 2,
    budget_num: int = 8,
    budget_den: int = 5,
    lang_col: str = "lang",
    size_col: str = "n_chars",
) -> DataFrame:
    """UniMax language sampling (Chung et al., ICLR 2023, public paper):
    allocate a character budget ``B = total*budget_num//budget_den``
    across languages so that no language repeats more than
    ``epoch_cap`` epochs — ascending by size, each language takes
    ``min(cap*size, fair share of the remaining budget)``.

    The paper's sequential loop has a prefix-monotone closed form
    (c_i = cap*size_i*(n-i+1) + cap*prefix_{i-1} is nondecreasing in
    the ascending order, so "capped" is exactly a prefix): capped
    languages take ``cap*size``; the rest split the leftover evenly,
    with the integer remainder going one char each to the first
    ``rem`` uncapped languages — EXACT integer arithmetic end to end,
    replayable by any engine.  When the budget exceeds ``cap×total``
    every language caps and the leftover is deliberately unallocated
    (the paper's budget is then infeasible; the ``capped`` column says
    so).

    Scale: one map-side-combinable agg to |languages| rows; the
    ordered windows below run over those rows only (language
    cardinality, not corpus cardinality)."""
    per = documents.groupBy(lang_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col(size_col)).cast("long").alias("size_chars"),
    )
    cap = F.lit(int(epoch_cap)).cast("long")
    wo = Window.orderBy("size_chars", lang_col)
    wall = Window.partitionBy()
    per = (
        per.withColumn("rn", F.row_number().over(wo).cast("long"))
        .withColumn(
            "pfx",
            F.coalesce(
                F.sum("size_chars").over(
                    wo.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("long"),
        )
        .withColumn("n_langs", F.count(F.lit(1)).over(wall).cast("long"))
        .withColumn(
            "budget",
            (
                F.sum("size_chars").over(wall)
                * F.lit(int(budget_num))
            ).cast("long")
            / F.lit(int(budget_den)),
        )
        .withColumn("budget", F.floor("budget").cast("long"))
    )
    capped = (
        cap * F.col("size_chars") * (F.col("n_langs") - F.col("rn") + 1)
        + cap * F.col("pfx")
    ) <= F.col("budget")
    per = per.withColumn("capped", capped)
    per = (
        per.withColumn(
            "m", F.sum(F.col("capped").cast("long")).over(wall)
        )
        .withColumn(
            "pm",
            F.coalesce(
                F.sum(F.when(F.col("capped"), F.col("size_chars"))).over(wall),
                F.lit(0),
            ).cast("long"),
        )
    )
    leftover = F.col("budget") - cap * F.col("pm")
    k = F.col("n_langs") - F.col("m")
    base = F.expr("leftover div k")
    rem = F.expr("leftover % k")
    per = per.withColumn("leftover", leftover).withColumn("k", k)
    alloc = F.when(F.col("capped"), cap * F.col("size_chars")).otherwise(
        base + F.when((F.col("rn") - F.col("m")) <= rem, 1).otherwise(0)
    )
    per = per.withColumn("alloc_chars", alloc.cast("long"))
    return per.select(
        lang_col,
        "n_docs",
        "size_chars",
        "capped",
        "alloc_chars",
        # The naive alloc_chars * 1000000 wraps int64 once a language's
        # allocation exceeds ~9.2e12 chars (~9 TB) — inside the 100 TB
        # design envelope (r15 ADVICE; the r16 review killed the
        # fraction-reduced int64 form too: its remainder*1e6 term wraps
        # just the same for big uncapped languages).  DECIMAL(38,0)
        # carries the product exactly (≤ ~1e25 ≪ 1e38); the quotient is
        # ≤ cap·1e6, so the final long cast is always safe.
        F.expr(
            "cast(cast(alloc_chars as decimal(38,0)) * 1000000"
            " div size_chars as long)"
        ).alias("epochs_micro"),
    )


def remove_common_spans(
    documents: DataFrame,
    k: int = 10,
    min_docs: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4-style boilerplate-span REMOVAL (Raffel et al. 2020 §2.2, public
    paper — the "three-sentence span" rule re-cast on token spans): cut each
    document into consecutive non-overlapping ``k``-token spans, find spans
    occurring in ≥ ``min_docs`` distinct documents corpus-wide (nav bars,
    license headers, templating), and REWRITE each document with those
    spans dropped.  This is the corpus transformation
    ``boilerplate_ngrams`` only scores: output is the cleaned text plus
    span-count accounting, one row per input document (possibly empty
    ``clean_text``).

    Scale: spans shuffle on their md5 digest (never the span text) for the
    distinct-doc frequency count (two-phase: per-(span, doc) dedup then
    per-span count), join back on the same digest key, then one
    groupBy(doc) to reassemble in span order — every shuffle is keyed and
    map-side combinable, nothing all-pairs.  The frequent-span table is
    the only state and is boilerplate-sized, not corpus-sized."""
    n_segs = f"(size(__tk) + {k - 1}) div {k}"
    spans = (
        documents.withColumn("__tk", F.split(F.col(text_col), " "))
        .select(
            F.col(id_col),
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, {n_segs}),"
                    f" i -> concat_ws(' ', slice(__tk, (i - 1) * {k} + 1, {k})))"
                )
            ).alias("span_idx", "span"),
        )
        .withColumn("span_key", F.md5("span"))
    )
    # per-(span, doc) dedup is required — a span repeated WITHIN one doc
    # must count once — so the frequency count is necessarily two-phase:
    # partial distinct on (span_key, doc) then count per span_key
    span_df = spans.groupBy("span_key").agg(
        F.countDistinct(id_col).alias("span_docs")
    )
    flagged = spans.join(span_df, "span_key").withColumn(
        "keep", F.col("span_docs") < min_docs
    )
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum((~F.col("keep")).cast("long")).alias("n_dropped"),
        F.concat_ws(
            " ",
            F.expr(
                "transform(array_sort(collect_list("
                "CASE WHEN keep THEN struct(span_idx, span) END)), s -> s.span)"
            ),
        ).alias("clean_text"),
    )


def sliding_window_chunks(
    documents: DataFrame,
    window_tokens: int = 64,
    stride: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping fixed-size token windows per document (window 64,
    stride 32 by default) — the standard chunker for long-document
    pretraining / retrieval indexing, where hard cuts at chunk boundaries
    lose cross-boundary context.  Emits one row per (doc, window) with the
    window's token count and an md5 content fingerprint (portable to the
    oracle; downstream dedup/indexing operates on the fingerprint).

    Scale: pure narrow ops — split, ``sequence`` of start offsets,
    ``posexplode``, ``slice`` — all whole-stage codegen, no shuffle at all;
    output is ~len/stride rows per doc, produced streaming per partition.
    """
    tk = F.split(F.col(text_col), " ")
    starts = F.sequence(F.lit(0), F.greatest(F.size(tk) - 1, F.lit(0)), F.lit(stride))
    chunk = F.slice(F.col("tk"), F.col("start") + 1, window_tokens)
    return (
        documents.select(F.col(id_col), tk.alias("tk"), F.posexplode(starts).alias("chunk_id", "start"))
        .select(
            F.col(id_col),
            F.col("chunk_id"),
            F.col("start").cast("long").alias("start_token"),
            F.size(chunk).cast("long").alias("n_tokens"),
            F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
        )
    )


def assign_shards(
    documents: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic shard assignment for training-data export:
    ``shard = int(md5(id)[:8], 16) % n_shards`` — content-independent,
    reshard-stable, engine-portable (the same md5-prefix idiom as
    hash_split / token_budget_sample).  Map-only."""
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
    return documents.select(
        F.col(id_col),
        (h.cast("long") % n_shards).cast("int").alias("shard"),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
    )


def shard_manifest(
    documents: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-shard export manifest (doc/token counts + id range) — the
    sanity report a 100 TB export job publishes next to its files.  One
    map-side-combinable groupBy on the shard id."""
    return (
        assign_shards(documents, n_shards, id_col, text_col)
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min(id_col).alias("min_doc_id"),
            F.max(id_col).alias("max_doc_id"),
        )
    )


def write_training_shards(
    documents: DataFrame,
    path: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_records_per_file: int = 100_000,
) -> DataFrame:
    """Export the corpus as hash-sharded parquet
    (``path/shard=<k>/part-*.parquet``) and return the manifest.

    Scale notes: ``repartition(shard)`` gives one shuffle keyed on the
    (uniform, md5-derived) shard id — no skew by construction;
    ``partitionBy('shard')`` maps partitions 1:1 onto directories;
    ``maxRecordsPerFile`` bounds individual file size for downstream
    loaders.  The manifest is computed from the SAME assignment expression,
    so counts match files exactly."""
    out = documents.join(
        assign_shards(documents, n_shards, id_col, text_col).select(id_col, "shard"),
        id_col,
    )
    (
        out.repartition("shard")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", str(max_records_per_file))
        .partitionBy("shard")
        .parquet(path)
    )
    return shard_manifest(documents, n_shards, id_col, text_col)


def paragraph_dedup(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """CCNet-style corpus-wide PARAGRAPH deduplication (Wenzek et al.
    2019, "CCNet: Extracting High Quality Monolingual Datasets from Web
    Crawl Data" — the paragraph-hash dedup every CommonCrawl pipeline
    runs before document-level near-dup): documents split on ``sep``,
    each paragraph normalized (lower+trim) and hashed, and every
    occurrence EXCEPT THE FIRST (smallest (doc_id, position) — the
    deterministic restatement of "first seen") is removed; surviving
    paragraphs re-join in original order.

    Returns (id, n_paras, n_kept, text_clean) for every document (a doc
    whose every paragraph is a repeat re-emits as '').

    Scale: one corpus-sized shuffle on the paragraph hash (the keep-first
    window partitions by hash — group sizes are duplicate multiplicities,
    bounded in practice and skew-safe under AQE) + one per-doc regroup;
    the per-doc collected list is the doc's own paragraphs, the same
    order as the document row itself.  Same digest-keyed shape as
    ``exact_dedup``, one level finer."""
    paras = documents.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("idx", "para"),
    ).withColumn("__h", F.sha2(F.lower(F.trim("para")), 256))
    w = Window.partitionBy("__h").orderBy(F.col(id_col).asc(), F.col("idx").asc())
    kept = (
        paras.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "para"))),
                lambda s: s["para"],
            ),
            sep,
        ).alias("text_clean"),
    )
    return (
        documents.join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.size(F.split(F.col(text_col), sep)).cast("long").alias("n_paras"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        )
    )


def dsir_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> DataFrame:
    """(id, b): one row per FEATURE OCCURRENCE — unigrams + adjacent
    bigrams hashed into ``n_buckets`` buckets with the md5-prefix idiom
    every oracle reproduces (DSIR's hashed-n-gram featurization)."""
    from .sketch import kmv_hash_expr

    w = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    # greatest(.., 0) guards empty/1-token docs: slice() throws on a
    # negative length, and such docs must contribute zero features
    bi = F.expr(
        "zip_with(slice(__w, 1, greatest(size(__w) - 1, 0)),"
        " slice(__w, 2, greatest(size(__w) - 1, 0)),"
        " (a, b) -> concat(a, ' ', b))"
    )
    return (
        df.withColumn("__w", w)
        .select(
            F.col(id_col),
            F.explode(F.concat(F.col("__w"), bi)).alias("f"),
        )
        .select(
            F.col(id_col),
            (kmv_hash_expr("f") % n_buckets).alias("b"),
        )
    )


def dsir_bucket_table(
    documents: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> DataFrame:
    """The frozen estimator: (b, lr) with lr = round-6
    ln p̂_target[b] − ln p̂_raw[b] under Laplace (+1) smoothing, DENSE
    over all ``n_buckets`` buckets (absent buckets keep the 1/(t+B)
    smoothing floor on either side) — the artifact a deployed DSIR
    gate broadcasts against incoming batches."""
    raw_f = dsir_features(documents, id_col, text_col, n_buckets)
    tgt_f = dsir_features(target, id_col, text_col, n_buckets)
    spark = documents.sparkSession
    buckets = spark.range(n_buckets).select(F.col("id").alias("b"))
    raw_cnt = raw_f.groupBy("b").agg(F.count(F.lit(1)).alias("rc"))
    tgt_cnt = tgt_f.groupBy("b").agg(F.count(F.lit(1)).alias("tc"))
    rt = raw_f.groupBy().agg(F.count(F.lit(1)).alias("rt"))
    tt = tgt_f.groupBy().agg(F.count(F.lit(1)).alias("tt"))
    return (
        buckets.join(F.broadcast(raw_cnt), "b", "left")
        .join(F.broadcast(tgt_cnt), "b", "left")
        .crossJoin(F.broadcast(rt))
        .crossJoin(F.broadcast(tt))
        .select(
            "b",
            F.round(
                F.log(
                    (F.coalesce("tc", F.lit(0)) + 1).cast("double")
                    / (F.col("tt") + n_buckets)
                )
                - F.log(
                    (F.coalesce("rc", F.lit(0)) + 1).cast("double")
                    / (F.col("rt") + n_buckets)
                ),
                6,
            ).cast("decimal(20,6)").alias("lr"),
        )
    )


def dsir_score(
    docs: DataFrame,
    table: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> DataFrame:
    """Score documents against a frozen DSIR bucket table: per doc,
    n_feats and the DECIMAL-exact log importance weight (docs with no
    features score 0).  One map + broadcast join + groupBy — the
    micro-batch-shaped application a streaming gate runs per trigger."""
    f = dsir_features(docs, id_col, text_col, n_buckets)
    per = (
        f.join(F.broadcast(table), "b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("lr").alias("__lw"),
        )
    )
    return (
        docs.select(id_col).join(per, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            F.coalesce(F.col("__lw").cast("double"), F.lit(0.0))
            .alias("log_weight"),
        )
    )


def dsir_importance(
    documents: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling" — the hashed-n-gram
    importance estimator behind modern pretraining-data selection):
    features are unigrams + adjacent bigrams hashed into ``n_buckets``
    buckets; bucket distributions p̂_target and p̂_raw are estimated
    with Laplace (+1) smoothing; each document's log importance weight
    is Σ over its FEATURE OCCURRENCES of ln p̂_t[b] − ln p̂_r[b].
    High weight = looks like the target distribution.  The resampling
    step composes with the registered weighted-sampling machinery
    (``corpus_weighted_sample``); this operator is the estimator
    (= ``dsir_bucket_table`` + ``dsir_score`` — split out so the
    streaming gate can freeze the table and score per micro-batch).

    Determinism: bucket hash is the md5-prefix idiom every oracle
    reproduces; per-bucket log-ratios round to 6 and per-doc sums run
    as DECIMAL(20,6) (exact, order-independent).

    Scale: the bucket tables are ``n_buckets`` rows (broadcast
    everywhere); the corpus is tokenized once per side; the per-doc
    score is one map + groupBy — no corpus-sized joins."""
    table = dsir_bucket_table(documents, target, id_col, text_col, n_buckets)
    return dsir_score(documents, table, id_col, text_col, n_buckets)


def dsir_score_expr(
    docs: DataFrame,
    table: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> DataFrame:
    """Streaming-shaped DSIR scoring: the frozen bucket table rides as a
    1-row broadcast MAP and each document's log weight folds over its
    own feature array IN-ROW — no explode, no groupBy, so it is legal
    inside a streaming micro-batch transform (append mode, no
    watermark) and costs zero shuffles.  Decimal addition is exact and
    commutative, so the fold's array order and the batch oracle's row
    order give identical sums."""
    mp = table.agg(
        F.map_from_entries(F.collect_list(F.struct("b", "lr"))).alias("__m")
    )
    w = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    # greatest(.., 0): slice() throws on negative length for 0/1-token
    # docs — such docs must score 0 (empty feature array), not crash
    # the micro-batch
    bi = (
        "zip_with(slice(__w, 1, greatest(size(__w) - 1, 0)),"
        " slice(__w, 2, greatest(size(__w) - 1, 0)),"
        " (a, b) -> concat(a, ' ', b))"
    )
    hash_b = (
        f"cast(conv(substring(md5(x), 1, 15), 16, 10) as bigint) % {n_buckets}"
    )
    # the addition must cast back to the accumulator's exact type —
    # decimal + decimal widens to (21,6) and aggregate() requires the
    # merge to preserve the accumulator type
    score = (
        f"aggregate(concat(__w, {bi}), cast(0 as decimal(20,6)), "
        f"(acc, x) -> cast(acc + element_at(__m, {hash_b}) as decimal(20,6)))"
    )
    return (
        docs.withColumn("__w", w)
        .crossJoin(F.broadcast(mp))
        .select(
            F.col(id_col),
            F.expr(f"size(__w) + size({bi})").cast("long").alias("n_feats"),
            F.expr(score).cast("double").alias("log_weight"),
        )
    )


def url_canonicalize(
    df: DataFrame,
    url_col: str = "url",
    out: str = "canonical_url",
    tracking_params: "tuple[str, ...]" = ("utm_[^=]*", "fbclid", "gclid"),
) -> DataFrame:
    """r14 — URL canonicalization, the key of the URL-dedup stage web
    pipelines run BEFORE content dedup (RefinedWeb §3.2 / CCNet keep
    one fetch per page; re-crawls and tracking-decorated share links
    are the cheapest duplicates to kill because no text needs
    comparing).  Documented rule set, applied entirely JVM-side
    (``parse_url`` + regexp — map-only, no UDF):

    1. scheme lowercased; of the authority only the HOST (and port)
       is lowercased — userinfo is case-sensitive per RFC 3986 §3.2.1
       and passes through untouched (ADVICE r14);
    2. leading ``www.`` stripped from the host;
    3. the scheme's default port stripped (``:80`` http, ``:443``
       https — a NON-default port is identity-bearing and stays);
    4. the fragment dropped (client-side only);
    5. tracking params removed — only the UNAMBIGUOUS trackers
       (``utm_*``, ``fbclid``, ``gclid``); ``ref`` is NOT stripped
       (identity-bearing on many real sites, e.g. ``?ref=branch`` on
       code hosts — ADVICE r14); other params kept in their original
       order (param REORDERING is not safe in general — servers may
       care); the param list is overridable via ``tracking_params``;
    6. one trailing slash stripped from a non-root path.

    A NULL or unparseable URL (no scheme/host) canonicalizes to NULL —
    stated, not guessed; the dedup query keys such rows to themselves.
    """
    u = F.col(url_col)
    proto = F.lower(F.parse_url(u, F.lit("PROTOCOL")))
    # AUTHORITY carries [userinfo@]host[:port]; userinfo passes
    # through case-preserved, only host[:port] is lowercased /
    # www-stripped / default-port-stripped
    auth_raw = F.parse_url(u, F.lit("AUTHORITY"))
    userinfo = F.regexp_extract(auth_raw, r"^(.*@)", 1)
    hostport = F.regexp_replace(
        F.lower(F.regexp_replace(auth_raw, r"^.*@", "")), r"^www\.", "")
    hostport = (
        F.when(proto == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(proto == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    auth = F.when(
        auth_raw.isNotNull(), F.concat(userinfo, hostport)
    )
    path = F.parse_url(u, F.lit("PATH"))
    path = F.when(
        (F.length(path) > 1), F.regexp_replace(path, "/$", "")
    ).otherwise(path)
    query = F.parse_url(u, F.lit("QUERY"))
    strip_re = "^(" + "|".join(tracking_params) + ")="
    kept = F.filter(
        F.split(F.coalesce(query, F.lit("")), "&"),
        lambda p: (p != "") & ~p.rlike(strip_re),
    )
    qpart = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    canonical = F.when(
        proto.isNotNull() & auth.isNotNull(),
        F.concat(proto, F.lit("://"), auth, F.coalesce(path, F.lit("")), qpart),
    )
    return df.withColumn(out, canonical)


def fim_transform(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    fim_keep: int = 4,
    fim_mod: int = 5,
) -> DataFrame:
    """r15 — Fill-In-the-Middle training transform (Bavarian et al.
    2022, "Efficient Training of Language Models to Fill in the
    Middle"): split each document at two cut points into
    prefix/middle/suffix and re-serialize with sentinel tokens so an
    autoregressive LM learns infilling — PSM order
    (``<|fim_prefix|>P<|fim_suffix|>S<|fim_middle|>M``) and the
    paper's SPM variant (suffix first), mixed ~50/50; a
    ``(fim_mod - fim_keep)/fim_mod`` fraction passes through untouched
    (the paper's fim_rate, default 80% transformed here).

    Determinism contract (what makes a closed-form oracle possible
    where the paper uses RNG draws): cut points and mode derive from
    the doc id's md5 via the repo's portable idiom — h1/h2 are the two
    60-bit md5 halves, cuts are h1 mod (n+1) / h2 mod (n+1) sorted,
    mode is (h1+h2) parity, the pass-through gate is h1 mod fim_mod.
    Same document, same split, every run, any partitioning.

    Map-only (md5 + substring + concat, whole-stage codegen) — fuses
    into the corpus scan; the 100 TB cost is the rewrite bandwidth
    itself."""
    md5 = F.md5(F.col(id_col).cast("string"))
    h1 = F.conv(F.substring(md5, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(md5, 16, 15), 16, 10).cast("long")
    txt = F.coalesce(F.col(text_col), F.lit(""))
    n = F.length(txt)
    a = h1 % (n + F.lit(1))
    b = h2 % (n + F.lit(1))
    lo = F.least(a, b).cast("int")
    hi = F.greatest(a, b).cast("int")
    # build via raw SQL expressions so the cut columns stay in codegen
    out = (
        documents.withColumn("__lo", lo)
        .withColumn("__hi", hi)
        .withColumn("__mode_h", ((h1 + h2) % 2).cast("int"))
        .withColumn("__gate", (h1 % fim_mod).cast("int"))
    )
    prefix = F.expr(f"substring({text_col}, 1, __lo)")
    middle = F.expr(f"substring({text_col}, __lo + 1, __hi - __lo)")
    suffix = F.expr(f"substring({text_col}, __hi + 1, "
                    f"length({text_col}) - __hi)")
    psm = F.concat(
        F.lit("<|fim_prefix|>"), prefix,
        F.lit("<|fim_suffix|>"), suffix,
        F.lit("<|fim_middle|>"), middle,
    )
    spm = F.concat(
        F.lit("<|fim_suffix|>"), suffix,
        F.lit("<|fim_prefix|>"), prefix,
        F.lit("<|fim_middle|>"), middle,
    )
    mode = F.when(F.col("__gate") >= fim_keep, F.lit("none")).otherwise(
        F.when(F.col("__mode_h") == 0, F.lit("psm")).otherwise(F.lit("spm"))
    )
    fim_text = (
        F.when(mode == "none", txt)
        .when(mode == "psm", psm)
        .otherwise(spm)
    )
    return out.select(
        F.col(id_col),
        mode.alias("fim_mode"),
        F.col("__lo").cast("long").alias("cut_lo"),
        F.col("__hi").cast("long").alias("cut_hi"),
        fim_text.alias("fim_text"),
    )


def parse_robots(
    robots: DataFrame,
    domain_col: str = "domain",
    text_col: str = "robots_txt",
) -> DataFrame:
    """robots.txt → one rule row per (domain, agent, type, pattern)
    (RFC 9309, public): groups are runs of ``User-agent:`` lines
    followed by their ``Allow:``/``Disallow:`` rules; ``Crawl-delay``
    is carried per group (the de-facto extension every crawler reads).
    Each rule also gets the RFC's wildcard pattern compiled to an
    anchored regex (``*`` → ``.*``, trailing ``$`` → end anchor,
    everything else literal) and its SPECIFICITY (OCTET length of the
    pattern — the RFC's longest-match tiebreak key, utf-8 bytes, not
    characters).  Every group additionally emits one ``group`` MARKER
    row (NULL pattern/regex) so a rule-less group — e.g. Crawl-delay
    only, or an explicit allow-everything group — still exists for
    group SELECTION downstream (r16 review: without it, a crawler with
    its own empty group wrongly fell through to ``*``).

    Parsing is per-file sequential state (groups), so it runs in ONE
    ``mapInPandas`` pass — robots files are KB-sized; the output rule
    table is (domains × rules)-sized, a dimension table."""
    import re as _re

    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField(domain_col, T.StringType()),
        T.StructField("agent", T.StringType()),
        T.StructField("rule_type", T.StringType()),   # allow/disallow
        T.StructField("pattern", T.StringType()),
        T.StructField("regex", T.StringType()),
        T.StructField("specificity", T.IntegerType()),
        T.StructField("crawl_delay", T.DoubleType()),
    ])

    def _compile(pattern: str) -> str:
        anchored = pattern.endswith("$")
        body = pattern[:-1] if anchored else pattern
        rx = "".join(".*" if ch == "*" else _re.escape(ch) for ch in body)
        return "^" + rx + ("$" if anchored else "")

    def _parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = {f.name: [] for f in schema.fields}
            for dom, txt in zip(pdf[domain_col], pdf[text_col]):
                agents: list[str] = []
                in_rules = False
                delay: dict[str, float] = {}
                group_rules: list[tuple] = []
                seen_agents: list[str] = []
                for raw in (txt or "").splitlines():
                    line = raw.split("#", 1)[0].strip()
                    if not line or ":" not in line:
                        continue
                    field, _, val = line.partition(":")
                    field, val = field.strip().lower(), val.strip()
                    if field == "user-agent":
                        if in_rules:          # new group starts
                            agents, in_rules = [], False
                        agents.append(val.lower())
                        if val.lower() not in seen_agents:
                            seen_agents.append(val.lower())
                    elif field in ("allow", "disallow"):
                        in_rules = True
                        if not agents:
                            continue          # rules before any UA: ignored
                        if val == "":         # empty Disallow = allow all
                            continue
                        for a in agents:
                            group_rules.append((a, field, val))
                    elif field == "crawl-delay":
                        in_rules = True
                        try:
                            for a in agents:
                                delay[a] = float(val)
                        except ValueError:
                            pass
                for a in seen_agents:         # group markers (see above)
                    rows[domain_col].append(dom)
                    rows["agent"].append(a)
                    rows["rule_type"].append("group")
                    rows["pattern"].append(None)
                    rows["regex"].append(None)
                    rows["specificity"].append(0)
                    rows["crawl_delay"].append(delay.get(a))
                for a, ftype, val in group_rules:
                    rows[domain_col].append(dom)
                    rows["agent"].append(a)
                    rows["rule_type"].append(ftype)
                    rows["pattern"].append(val)
                    rows["regex"].append(_compile(val))
                    rows["specificity"].append(len(val.encode("utf-8")))
                    rows["crawl_delay"].append(delay.get(a))
            yield pd.DataFrame(rows)

    return robots.mapInPandas(_parse, schema=schema)


def robots_decisions(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "pdc-bot",
    domain_col: str = "domain",
    path_col: str = "path",
) -> DataFrame:
    """Per-URL crawl decision against a parsed rule table (RFC 9309
    evaluation): among the matching group's rules whose pattern matches
    the path, the MOST SPECIFIC (longest pattern) wins; on a tie, ALLOW
    wins; no matching rule (or no rules for the domain) = allowed.
    Group selection: the crawler's own product token if that group
    exists for the domain, else ``*``.

    Scale: one broadcast-or-shuffle equi-join on ``domain`` (the rule
    table is a dimension — domains × a handful of rules), JVM
    ``rlike`` with the precompiled per-rule regex (no Python in the
    match), then ONE max_by per URL for the longest-match tiebreak.
    Nothing all-pairs: a URL only ever meets its own domain's rules."""
    my = rules.filter(F.col("agent").isin(agent.lower(), "*"))
    # group selection: exact-token group if present for the domain
    has_exact = (
        my.filter(F.col("agent") == agent.lower())
        .select(domain_col).distinct()
        .withColumn("__exact", F.lit(True))
    )
    chosen = (
        my.join(has_exact, domain_col, "left")
        .filter(
            (F.col("agent") == agent.lower())
            | F.col("__exact").isNull()
        )
        .drop("__exact")
    )
    matched = (
        urls.join(chosen, domain_col, "left")
        .withColumn(
            "__hit",
            F.col("regex").isNotNull()
            & F.expr(f"{path_col} rlike regex"),
        )
    )
    per = (
        matched.groupBy(domain_col, path_col)
        .agg(
            F.max_by(
                F.struct(
                    (F.col("rule_type") == "allow").alias("is_allow"),
                    F.col("pattern").alias("pattern"),
                ),
                F.when(
                    F.col("__hit"),
                    F.struct(
                        F.col("specificity").alias("s"),
                        (F.col("rule_type") == "allow").cast("int")
                        .alias("a"),
                    ),
                ),
            ).alias("__win"),
            F.max(F.when(F.col("__hit"), F.lit(1))).alias("__any"),
            F.max("crawl_delay").alias("crawl_delay"),
        )
    )
    return per.select(
        domain_col,
        path_col,
        F.when(F.col("__any").isNull(), F.lit(True))
        .otherwise(F.col("__win.is_allow")).alias("allowed"),
        F.when(F.col("__any").isNotNull(), F.col("__win.pattern"))
        .alias("matched_rule"),
        F.col("crawl_delay"),
    )


def robots_sitemaps(
    robots: DataFrame,
    domain_col: str = "domain",
    text_col: str = "robots_txt",
) -> DataFrame:
    """``Sitemap:`` lines from robots.txt (RFC 9309 §2.3 / sitemaps.org:
    the field is GLOBAL, outside any user-agent group, repeatable).
    Pure JVM regexp — one extract_all + explode, no Python.  The match
    is LINE-anchored with same-line whitespace only and stops at ``#``
    (r16 review: the first cut matched 'sitemap:' inside comment lines
    and its loose whitespace could slurp a value off the next line)."""
    return robots.select(
        F.col(domain_col),
        F.explode(
            F.expr(
                f"regexp_extract_all({text_col},"
                " '(?im)^[ \\\\t]*sitemap:[ \\\\t]*([^ \\\\t\\\\r\\\\n#]+)',"
                " 1)"
            )
        ).alias("sitemap_url"),
    )


def parse_sitemaps(
    sitemaps: DataFrame,
    domain_col: str = "domain",
    xml_col: str = "sitemap_xml",
) -> DataFrame:
    """sitemaps.org XML → one row per entry: handles BOTH document
    kinds — ``<urlset>`` (leaf page lists) and ``<sitemapindex>``
    (pointers to child sitemaps) — with the optional ``<lastmod>``
    NULL when absent.  Entirely JVM expressions: entries are isolated
    with one DOTALL ``regexp_extract_all`` (so a missing lastmod can
    never misalign across entries, the failure mode of zipping two
    whole-document xpath arrays), then each fragment is re-wrapped and
    field-extracted with the built-in ``xpath_string`` — no Python,
    whole-stage codegen around the xpath calls."""
    kind = F.when(
        F.col(xml_col).contains("<sitemapindex"), F.lit("index")
    ).otherwise(F.lit("urlset"))
    frags = F.expr(
        f"regexp_extract_all({xml_col},"
        " '(?s)<(?:url|sitemap)>(.*?)</(?:url|sitemap)>', 1)"
    )
    exploded = sitemaps.select(
        F.col(domain_col), kind.alias("kind"), F.explode(frags).alias("__f")
    ).withColumn("__x", F.concat(F.lit("<e>"), F.col("__f"), F.lit("</e>")))
    return exploded.select(
        domain_col,
        "kind",
        F.expr("xpath_string(__x, '//loc/text()')").alias("loc"),
        F.nullif(
            F.expr("xpath_string(__x, '//lastmod/text()')"), F.lit("")
        ).alias("lastmod"),
    )


def parse_feeds(
    feeds: DataFrame,
    domain_col: str = "domain",
    xml_col: str = "feed_xml",
) -> DataFrame:
    """RSS 2.0 / Atom feed XML → one row per item/entry (r18): the
    third leg of the crawl-frontier story next to robots_decisions and
    parse_sitemaps — feeds are how fresh pages announce themselves
    between sitemap crawls.

    Handles BOTH public formats: RSS ``<item>`` (title / ``<link>``
    text / pubDate / guid) and Atom ``<entry>`` (title / ``<link
    href=..>`` attribute / published-falling-back-to-updated / id).
    Same execution idiom as parse_sitemaps: one DOTALL
    ``regexp_extract_all`` isolates item fragments (optional fields
    can never misalign across items), each fragment re-wrapped and
    field-extracted with the built-in ``xpath_string`` — entirely JVM
    expressions, no Python, no shuffle beyond the explode."""
    kind = F.when(
        F.col(xml_col).rlike("<feed[\\s>]"), F.lit("atom")
    ).otherwise(F.lit("rss"))
    frags = F.expr(
        f"regexp_extract_all({xml_col},"
        " '(?s)<(?:item|entry)(?:\\\\s[^>]*)?>(.*?)</(?:item|entry)>', 1)"
    )
    exploded = feeds.select(
        F.col(domain_col), kind.alias("kind"), F.explode(frags).alias("__f")
    ).withColumn("__x", F.concat(F.lit("<e>"), F.col("__f"), F.lit("</e>")))
    nz = lambda e: F.nullif(F.expr(e), F.lit(""))  # noqa: E731
    return exploded.select(
        domain_col,
        "kind",
        nz("xpath_string(__x, '//title/text()')").alias("title"),
        F.coalesce(
            nz("xpath_string(__x, '//link/@href')"),
            nz("xpath_string(__x, '//link/text()')"),
        ).alias("link"),
        F.coalesce(
            nz("xpath_string(__x, '//pubDate/text()')"),
            nz("xpath_string(__x, '//published/text()')"),
            nz("xpath_string(__x, '//updated/text()')"),
        ).alias("published"),
        F.coalesce(
            nz("xpath_string(__x, '//guid/text()')"),
            nz("xpath_string(__x, '//id/text()')"),
        ).alias("guid"),
    )


def html_index_signals(
    docs: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
) -> DataFrame:
    """Page-level indexing signals (r18) — the in-document complement
    to robots.txt: a crawl that honors only the server policy still
    trains on pages their authors marked ``noindex``, and URL-level
    dedup without ``rel=canonical`` keeps every syndicated copy.

    Extracts, entirely JVM-side (case-insensitive regexes with
    LOOKAHEAD for attribute order, both quote styles):

    - ``<meta name=robots content=...>`` → ``noindex`` / ``nofollow``
      token flags (comma- OR space-separated token semantics,
      ``none`` = both, per the public robots-meta convention)
    - ``<link rel=canonical href=...>`` → ``canonical_url``
      (NULL when absent; ``rel`` treated as the token LIST it is)

    Robustness (r18 self-review): HTML comments are stripped first so
    commented-out markup is never a live signal; each attribute value
    is captured in ONE scan (quoted branches per quote char + a bare
    branch that stops before a self-closing ``/>``), so the FIRST
    matching tag wins and ``data-content``-style attributes cannot
    hijack the value (names must follow whitespace or a quote, not a
    hyphen).  No Python, no shuffle."""
    d = F.regexp_replace(F.col(html_col), r"(?s)<!--.*?-->", " ")

    # one WHOLE attribute (name, optionally = quoted-or-bare value):
    # scanning through tags attribute-by-attribute means a target name
    # can only ever match at a true attribute POSITION — a 'content='
    # or 'name=robots' embedded inside another attribute's quoted
    # value is consumed as part of that attribute (r18 self-review,
    # second pass)
    _ATTR = (r"(?:\s+[-:.\w]+"
             r"(?:\s*=\s*(?:\"[^\"]*\"|'[^']*'|[^\s>]+))?)")

    def _attr(tag_pat: str, attr: str):
        # first matching tag wins; value = "..." | '...' | bare token
        # (bare stops before whitespace, '>' or a self-closing '/>')
        raw = F.nullif(F.regexp_extract(
            d, tag_pat + _ATTR + r"*?\s+" + attr
            + r"\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s\"'>]+?(?=[\s>]|/>))",
            1), F.lit(""))
        return F.regexp_replace(raw, "^[\"']|[\"']$", "")

    meta_pat = (r"(?is)<meta(?=" + _ATTR + r"*\s+name\s*=\s*"
                r"(?:\"robots\"|'robots'|robots(?=[\s/>])))")
    robots_content = F.lower(F.coalesce(_attr(meta_pat, "content"),
                                        F.lit("")))
    tokens = F.split(F.trim(robots_content), r"[,\s]+")
    has = lambda t: (F.array_contains(tokens, t)  # noqa: E731
                     | F.array_contains(tokens, "none"))
    link_pat = (r"(?is)<link(?=" + _ATTR + r"*\s+rel\s*=\s*"
                r"(?:\"[^\">]*\bcanonical\b[^\">]*\""
                r"|'[^'>]*\bcanonical\b[^'>]*'"
                r"|[^\s>\"']*\bcanonical\b[^\s>\"']*(?=[\s/>])))")
    canonical = F.nullif(_attr(link_pat, "href"), F.lit(""))
    return docs.select(
        id_col,
        has("noindex").alias("noindex"),
        has("nofollow").alias("nofollow"),
        canonical.alias("canonical_url"),
    )
