"""BPE merge learning (operators/tokenizer.py): reference semantics on
hand-computable corpora — merged symbols must feed later rounds, the merge
application must be greedy left-to-right single-pass, ties must break
deterministically, and the loop must stop early when no pair remains."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_debezium_clickhouse_spark.operators.tokenizer import (
    _apply_merge,
    bpe_top_merges,
)


def test_bpe_merged_symbol_feeds_next_round(spark):
    docs = spark.createDataFrame([("hello hello hell",)] * 5, ["text"])
    got = [(r.left_sym, r.right_sym, r.merged, r.pair_count)
           for r in bpe_top_merges(docs, k=3).collect()]
    # round 1: (h,e)=15 ties (e,l)=15 -> 'e' < 'h' wins; then el+l, h+ell
    assert got == [("e", "l", "el", 15), ("el", "l", "ell", 15),
                   ("h", "ell", "hell", 15)]


def test_bpe_stops_early_when_no_pairs_remain(spark):
    docs = spark.createDataFrame([("ab ab",)], ["text"])
    rows = bpe_top_merges(docs, k=5).collect()
    assert [(r.merged, r.pair_count) for r in rows] == [("ab", 2)]


def test_apply_merge_is_greedy_left_to_right(spark):
    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["a", "a", "a", "a"],), (["b", "a", "a"],), ([],)],
        "syms array<string>",
    )
    out = [r.m for r in df.select(_apply_merge(F.col("syms"), "a", "a").alias("m")).collect()]
    # aaa -> [aa, a] (no overlapping re-merge), aaaa -> [aa, aa]
    assert out == [["aa", "a"], ["aa", "aa"], ["b", "aa"], []]


def test_bpe_on_real_corpus_is_sane(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text")
    rows = bpe_top_merges(docs, k=3).collect()
    assert len(rows) == 3
    assert [r.merge_rank for r in rows] == [1, 2, 3]
    for r in rows:
        assert r.merged == r.left_sym + r.right_sym
        assert r.pair_count > 0
    # determinism: same corpus, same table
    again = bpe_top_merges(docs, k=3).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in rows]


def test_bpe_encode_roundtrip_with_learned_table(spark):
    """Train → encode end-to-end on hand-computable text; unknown symbols
    pass through unmerged, empty text encodes to zeros."""
    train = spark.createDataFrame([("abc abc ab de",)] * 3, ["text"])
    table = bpe_top_merges(train, k=3).collect()
    merges = [(r.left_sym, r.right_sym) for r in sorted(table, key=lambda r: r.merge_rank)]
    from postgres_debezium_clickhouse_spark.operators.tokenizer import bpe_encode

    docs = spark.createDataFrame(
        [(1, "abcd ab ae"), (2, "zzz"), (3, "")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in bpe_encode(docs, merges).collect()}
    assert (out[1].n_words, out[1].n_subwords, out[1].n_base_symbols) == (3, 5, 8)
    assert out[1].compression == 1.6
    assert (out[2].n_subwords, out[2].n_base_symbols) == (3, 3)  # no rule applies
    assert (out[3].n_words, out[3].n_subwords) == (0, 0)


def test_bpe_subwords_always_reconstruct_the_word(spark):
    """Property (hypothesis): for ANY corpus of random small-alphabet
    words and the merge table learned from it, every word's subword
    sequence concatenates back to exactly the original word — merging can
    regroup symbols but never lose or invent characters."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F

    from postgres_debezium_clickhouse_spark.operators.tokenizer import _apply_merge

    word = st.text(alphabet="abcd", min_size=1, max_size=8)

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(words=st.lists(word, min_size=1, max_size=12))
    def prop(words):
        docs = spark.createDataFrame([(" ".join(words),)], ["text"])
        table = bpe_top_merges(docs, k=3).collect()
        df = spark.createDataFrame([(w,) for w in set(words)], ["w"])
        syms = F.split("w", "")
        for r in sorted(table, key=lambda r: r.merge_rank):
            syms = _apply_merge(syms, r.left_sym, r.right_sym)
        out = df.select("w", F.concat_ws("", syms).alias("rejoined")).collect()
        for row in out:
            assert row.rejoined == row.w, (row.w, row.rejoined)

    prop()
