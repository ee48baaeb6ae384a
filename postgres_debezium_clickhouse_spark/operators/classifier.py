"""Hashing-trick linear quality classifier — the fastText-style scoring
stage of a training-data pipeline (Joulin et al. 2016, public paper;
the CCNet/LLaMA-style "quality classifier" filter step).

Two halves, split on what must scale:

- **Scoring** (``classifier_score``) runs over the full corpus, so it is a
  pure map-only DataFrame expression: token → md5 bucket → weight lookup in
  a literal array → one in-row integer sum.  No shuffle, no UDF, fuses into
  the scan at 100 TB.  Weights are integer milli-units so the margin is an
  exact integer sum — engine-portable (DuckDB oracle reproduces it
  bit-for-bit) and immune to float-summation-order drift.
- **Training** (``train_quality_classifier``) runs on a SAMPLE (weak labels
  are cheap to make with ``gopher_rules``; a classifier trained on 1 M docs
  scores 100 TB fine), so it may use driver-side ML: ``pyspark.ml``
  LogisticRegression over the same hashed-bucket count features, exported
  back as the milli-int weight vector ``classifier_score`` consumes.

The reference has no ML surface (its quality gates are CHECK constraints,
init_postgresql_data.sql:30-43); this extends the same gate idea to
learned corpus filtering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Knuth multiplicative-hash constant — used only to SYNTHESIZE a
#: deterministic demo weight vector (``pseudo_weights``); real deployments
#: train weights with ``train_quality_classifier``.
HASH_PRIME = 2654435761


def _bucket_expr(token: str, dim: int) -> str:
    """SQL fragment: md5-hash bucket of ``token`` in [0, dim) — first 8 hex
    chars of md5 as an integer, mod ``dim``.  md5 (not ``hash()``) so DuckDB
    and any other engine reproduce the bucketing exactly."""
    return f"cast(conv(substring(md5({token}), 1, 8), 16, 10) as bigint) % {dim}"


def pseudo_weights(dim: int) -> list[int]:
    """Deterministic, engine-reproducible demo weight vector in milli-units:
    ``w[b] = ((b+1)·HASH_PRIME) mod 1997 − 998`` (≈ uniform on ±0.998).
    Exists so the scoring plumbing is oracle-checkable without shipping a
    trained model in the repo."""
    return [((b + 1) * HASH_PRIME) % 1997 - 998 for b in range(dim)]


def classifier_score(
    documents: DataFrame,
    weights_milli: list[int],
    bias_milli: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Score every document with a hashing-trick linear classifier: each
    token hashes to a bucket (md5 mod ``len(weights_milli)``), the margin is
    ``bias + Σ_tokens w[bucket(token)]`` in exact integer milli-units, and
    ``pred_keep`` is the sign test.

    Map-only: the weight vector rides along as a literal array column and
    the per-document sum is one ``aggregate`` over the token array — no
    explode, no shuffle, no UDF.  At 100 TB this fuses into the corpus scan
    like any other row expression."""
    dim = len(weights_milli)
    w_arr = F.array(*[F.lit(int(w)) for w in weights_milli])
    margin = F.expr(
        f"aggregate(transform(__tk, t -> element_at(__w, cast({_bucket_expr('t', dim)} + 1 as int))),"
        f" cast({int(bias_milli)} as bigint), (a, x) -> a + x)"
    )
    return (
        documents.withColumn("__tk", F.split(F.col(text_col), " "))
        .withColumn("__w", w_arr)
        .select(
            F.col(id_col),
            *[F.col(c) for c in passthrough],
            F.size("__tk").cast("long").alias("n_tokens"),
            margin.alias("margin_milli"),
            F.round(margin / 1000.0, 6).alias("margin"),
            (margin > 0).alias("pred_keep"),
        )
    )


def hashed_count_features(
    documents: DataFrame, dim: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document bucket-count feature vector (``array<double>`` length
    ``dim``) over the same md5 bucketing ``classifier_score`` uses — the
    training-side feature extractor.  O(dim·n_tokens) per row, so use it on
    the training SAMPLE, not the full corpus (scoring never materializes
    these vectors)."""
    feats = F.expr(
        f"transform(sequence(0, {dim - 1}),"
        f" b -> cast(size(filter(__tk, t -> {_bucket_expr('t', dim)} = b)) as double))"
    )
    return (
        documents.withColumn("__tk", F.split(F.col(text_col), " "))
        .select(F.col(id_col), feats.alias("features"))
    )


def train_quality_classifier(
    documents: DataFrame,
    labels: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
    max_iter: int = 50,
    reg_param: float = 0.01,
) -> tuple[list[int], int]:
    """Train the fastText-style quality classifier on (document, 0/1 label)
    pairs — e.g. weak labels from ``gopher_rules().passes`` — and export
    ``(weights_milli, bias_milli)`` in exactly the form
    ``classifier_score`` consumes.

    pyspark.ml LogisticRegression over hashed bucket counts; deterministic
    for fixed input (L-BFGS, no sampling).  Train on a stratified sample at
    corpus scale — the exported integer weight vector is what ships to the
    100 TB scoring pass."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    train = (
        hashed_count_features(documents, dim, id_col, text_col)
        .join(labels.select(F.col(id_col), F.col(label_col).cast("double").alias("label")), id_col)
        .select(array_to_vector("features").alias("features"), "label")
    )
    model = LogisticRegression(maxIter=max_iter, regParam=reg_param).fit(train)
    weights_milli = [int(round(c * 1000)) for c in model.coefficients.toArray()]
    return weights_milli, int(round(model.intercept * 1000))


def train_langid_classifier(
    documents: DataFrame,
    langs: list[str],
    dim: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    max_iter: int = 80,
    reg_param: float = 0.01,
) -> dict[str, tuple[list[int], int]]:
    """Train a REAL multinomial language-ID classifier (the fastText
    langid shape, Joulin et al. 2016) on (text, lang) pairs over the
    same hashed-bucket features the map-only scorer consumes — replacing
    the stopword-marker heuristic with a trained model while keeping the
    planted-contrast oracle-independence guard (the DuckDB oracle states
    the PLANTED labels; a model that misclassifies one document fails
    the value hash).

    Returns ``{lang: (weights_milli, bias_milli)}`` — one exported
    integer weight vector per language, consumed by ``langid_score``.
    Train on a sample; the exported vectors ship to the 100 TB scoring
    pass."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    lang_lit = F.array(*[F.lit(lang) for lang in langs])
    train = (
        hashed_count_features(documents, dim, id_col, text_col)
        .join(documents.select(
            F.col(id_col),
            (F.array_position(lang_lit, F.col(lang_col)) - 1)
            .cast("double").alias("label")), id_col)
        .select(array_to_vector("features").alias("features"), "label")
    )
    model = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, family="multinomial"
    ).fit(train)
    mat = model.coefficientMatrix.toArray()
    intercepts = model.interceptVector.toArray()
    return {
        lang: ([int(round(c * 1000)) for c in mat[i]],
               int(round(intercepts[i] * 1000)))
        for i, lang in enumerate(langs)
    }


def langid_score(
    documents: DataFrame,
    models: dict[str, tuple[list[int], int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document against the per-language trained weight
    vectors and pick the argmax — MAP-ONLY, like ``classifier_score``:
    each language's margin is one integer ``aggregate`` over the token
    array with the weights riding along as a literal array column; no
    explode, no shuffle, no UDF.  Ties break by declaration order
    (deterministic).  At 100 TB this fuses into the corpus scan."""
    langs = list(models)
    df = documents.withColumn("__tk", F.split(F.col(text_col), " "))
    margins = {}
    for lang, (weights, bias) in models.items():
        dim = len(weights)
        df = df.withColumn(
            f"__w_{lang}", F.array(*[F.lit(int(w)) for w in weights]))
        margins[lang] = F.expr(
            f"aggregate(transform(__tk, t -> element_at(__w_{lang},"
            f" cast({_bucket_expr('t', dim)} + 1 as int))),"
            f" cast({int(bias)} as bigint), (a, x) -> a + x)"
        )
    cols = [margins[lang] for lang in langs]
    mx = cols[0] if len(cols) == 1 else F.greatest(*cols)
    chain = F.when(F.lit(False), "und")
    for lang in langs:
        chain = chain.when(margins[lang] == mx, lang)
    return df.select(
        F.col(id_col),
        *[margins[lang].alias(f"margin_{lang}") for lang in langs],
        chain.otherwise("und").alias("detected_lang"),
    )
