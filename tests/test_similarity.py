"""Similarity-search tests (brute-force cosine + sign-LSH ANN)."""

from __future__ import annotations

from postgres_debezium_clickhouse_spark.operators.similarity import (
    cosine_topk,
    embedding_near_dups,
    lsh_ann_buckets,
    lsh_ann_topk,
)

VECS = [
    (1, [1.0, 0.0, 0.0, 0.0], "a"),
    (2, [0.9, 0.1, 0.0, 0.0], "a"),   # close to 1
    (3, [0.0, 1.0, 0.0, 0.0], "a"),   # orthogonal to 1
    (4, [0.0, 0.0, 1.0, 0.0], "b"),
    (5, [1.0, 0.0, 0.0, 0.0], "b"),   # identical direction to 1
]


def _corpus(spark):
    return spark.createDataFrame(VECS, ["vec_id", "embedding", "label"])


def _queries(spark):
    return spark.createDataFrame([(100, [1.0, 0.0, 0.0, 0.0])], ["query_id", "embedding"])


def test_cosine_topk_exact(spark):
    out = cosine_topk(_corpus(spark), _queries(spark), k=3).collect()
    assert [r.neighbor_id for r in out] == [1, 5, 2]  # ties broken by id asc
    assert out[0].cosine == 1.0 and out[1].cosine == 1.0
    assert out[2].cosine < 1.0
    assert [r.rank for r in out] == [1, 2, 3]


def test_cosine_topk_k_bound(spark):
    assert len(cosine_topk(_corpus(spark), _queries(spark), k=2).collect()) == 2


def test_lsh_ann_scores_match_bruteforce_on_shared_pairs(spark):
    """ANN returns a SUBSET of candidates but identical cosine values."""
    exact = {r.neighbor_id: r.cosine for r in cosine_topk(_corpus(spark), _queries(spark), k=5).collect()}
    ann = lsh_ann_topk(_corpus(spark), _queries(spark), k=5, dim=4).collect()
    assert len(ann) > 0
    for r in ann:
        assert exact[r.neighbor_id] == r.cosine


def test_lsh_buckets_partition_corpus(spark):
    buckets = lsh_ann_buckets(_corpus(spark), dim=4).collect()
    assert sum(r.n_vectors for r in buckets) == len(VECS)  # every vector bucketed once
    # identical vectors land in the same bucket
    b = lsh_ann_buckets(_corpus(spark).filter("vec_id in (1, 5)"), dim=4).collect()
    assert len(b) == 1 and b[0].n_vectors == 2


def test_ivf_cells_partition_and_recall(spark):
    from postgres_debezium_clickhouse_spark.operators.similarity import (
        as_double_vec,
        ivf_ann_topk,
        ivf_centroids,
        with_ivf_cell,
    )

    corpus = _corpus(spark)
    cents = ivf_centroids(corpus, n_centroids=2)
    assert len(cents) == 2 and len(cents[0]) == 4  # deterministic: vec_id 1, 2
    cells = with_ivf_cell(as_double_vec(corpus), cents)
    assert cells.filter(cells.cell.isNull()).count() == 0  # total assignment
    # full probe (n_probe = n_centroids) must recover the exact top-1
    ann = ivf_ann_topk(corpus, _queries(spark), k=1, n_centroids=2, n_probe=2).collect()
    assert ann[0].neighbor_id == 1 and ann[0].cosine == 1.0
    # scores match brute force on shared pairs
    exact = {r.neighbor_id: r.cosine for r in cosine_topk(_corpus(spark), _queries(spark), k=5).collect()}
    part = ivf_ann_topk(corpus, _queries(spark), k=5, n_centroids=2, n_probe=1).collect()
    assert 0 < len(part) <= 5
    for r in part:
        assert exact[r.neighbor_id] == r.cosine


def test_ivf_kmeans_refinement_reduces_distortion(spark, sf_dir):
    """One Lloyd iteration must not increase total within-cell squared
    distance (k-means monotonicity), and refined centroids stay usable."""
    from postgres_debezium_clickhouse_spark.operators.similarity import (
        as_double_vec,
        ivf_centroids,
        with_ivf_cell,
    )
    from postgres_debezium_clickhouse_spark.sources.files import load_table
    from pyspark.sql import functions as F

    corpus = load_table(spark, sf_dir, "embeddings")

    def distortion(cents):
        assigned = with_ivf_cell(as_double_vec(corpus), cents)
        exprs = []
        for i, c in enumerate(cents):
            lit = "array(" + ",".join(f"cast({x!r} as double)" for x in c) + ")"
            exprs.append(
                f"WHEN cell = {i} THEN aggregate(zip_with(v, {lit}, (x, y) -> (x - y) * (x - y)),"
                " cast(0 as double), (a, b) -> a + b)"
            )
        d2 = F.expr("CASE " + " ".join(exprs) + " END")
        return assigned.select(F.sum(d2).alias("s")).first().s

    base = ivf_centroids(corpus, n_centroids=8)
    refined = ivf_centroids(corpus, n_centroids=8, refine_iters=1)
    assert distortion(refined) <= distortion(base) + 1e-9
    # deterministic: same call → same centroids
    assert refined == ivf_centroids(corpus, n_centroids=8, refine_iters=1)


def test_embedding_near_dups_blocked_by_label(spark):
    out = embedding_near_dups(_corpus(spark), threshold=0.9, id_col="vec_id").collect()
    pairs = {(r.vec_a, r.vec_b) for r in out}
    assert (1, 2) in pairs       # same label, cosine ~0.994
    assert (1, 5) not in pairs   # identical vectors but different label block


def test_lsh_recall_bounds_and_exact_self(spark, sf_dir):
    """Recall@k is in [0,1] per query; every hit the LSH returns that is
    also in the exact top-k counts once; n_exact == k."""
    import __spark_entry__ as m

    rows = m.queries()["similarity_lsh_recall"](spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.n_exact == 5 and 0 <= r.n_hits <= 5
        assert r.recall == round(r.n_hits / r.n_exact, 6)


def test_semantic_dedup_drops_higher_id_near_dup(spark):
    """Colinear vectors (cosine 1.0) in one cell: the higher id is dropped;
    an orthogonal vector survives; output covers the full corpus."""
    from postgres_debezium_clickhouse_spark.operators.similarity import semantic_dedup

    vecs = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [2.0, 0.0]), (2, [0.0, 1.0])],
        ["vec_id", "embedding"],
    )
    out = {r.vec_id: r for r in semantic_dedup(vecs, threshold=0.99, n_centroids=1).collect()}
    assert set(out) == {0, 1, 2}
    assert out[0].keep is True
    assert out[1].keep is False  # colinear with vec 0, higher id
    assert out[2].keep is True
