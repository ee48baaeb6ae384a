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
