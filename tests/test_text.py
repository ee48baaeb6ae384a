"""Text-analysis operator tests (lang-ID, quality, tokens, fingerprint)."""

from __future__ import annotations

from postgres_debezium_clickhouse_spark.operators.text import (
    fingerprint,
    language_id,
    quality_score,
    text_stats,
    token_count_regex,
)


def test_text_stats_values(spark):
    df = spark.createDataFrame([(1, "aa bb aa")], ["doc_id", "text"])
    r = text_stats(df).first()
    assert r.n_chars == 8
    assert r.n_tokens == 3
    assert r.n_distinct_tokens == 2
    assert r.avg_token_len == round(6 / 3, 4)
    assert r.token_diversity == round(2 / 3, 4)


def test_language_id(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "el gato y la casa"), (3, "xyz qqq")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.detected_lang for r in language_id(df).collect()}
    assert out == {1: "en", 2: "es", 3: "und"}


def test_quality_score_gates(spark):
    long_ok = "word" + " unique" * 30 + " the of and a extra tail padding here now" * 2
    df = spark.createDataFrame(
        [(1, "too short"), (2, long_ok)], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in quality_score(df).collect()}
    assert out[1].len_ok is False and out[1].keep is False
    assert out[2].len_ok is True


def test_token_count_regex_vs_ws(spark):
    df = spark.createDataFrame([(1, "hello, world 42!")], ["doc_id", "text"])
    r = token_count_regex(df).first()
    # re tokens: hello , world 42 !  → 5; ws tokens: 3
    assert r.n_re_tokens == 5
    assert r.n_ws_tokens == 3


def test_fingerprint_deterministic_and_discriminative(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "totally different words here now")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.fingerprint for r in fingerprint(df).collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]
    assert len(out[1]) == 4 * 32  # 4 md5 hex digests


def test_repetition_score_flags_boilerplate(spark):
    from postgres_debezium_clickhouse_spark.operators.text import repetition_score

    docs = spark.createDataFrame(
        [
            (1, "buy now buy now buy now buy now"),
            (2, "each word here appears exactly once only"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in repetition_score(docs).collect()}
    assert out[1].dup_ratio > 0.5
    assert out[2].dup_ratio == 0.0


def test_vocab_topk_deterministic_cut(spark):
    from postgres_debezium_clickhouse_spark.operators.text import vocab_topk

    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "b c d")], ["doc_id", "text"]
    )
    rows = vocab_topk(docs, k=3).collect()
    assert [(r.token, r.n) for r in rows] == [("a", 3), ("b", 3), ("c", 2)]


def test_tfidf_rare_term_outranks_common(spark):
    from postgres_debezium_clickhouse_spark.operators.text import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "common common rare"),
            (2, "common other words"),
            (3, "common more words"),
        ],
        ["doc_id", "text"],
    )
    top = {r.doc_id: r.token for r in tfidf_top_terms(docs, k=1).collect()}
    # 'common' appears in every doc (idf=0); the doc-unique term wins
    assert top[1] == "rare"


def test_commonness_score_ranks_everyday_vocab(spark):
    from postgres_debezium_clickhouse_spark.operators.text import commonness_score

    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the dog sat"), (3, "zqx jkl vvv")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in commonness_score(docs).collect()}
    # doc 3's tokens appear in 1/3 docs each; docs 1/2 share 'the'/'sat' (2/3)
    assert got[3].commonness < got[1].commonness
    assert got[1].n_distinct_tokens == 3
    # exact integer ratio: doc1 = (1+2+2)/(3*3)
    assert got[1].commonness == round(5 / 9, 6)
    assert got[3].commonness == round(3 / 9, 6)


def test_adaptive_length_threshold_discrete_p10(spark):
    from postgres_debezium_clickhouse_spark.operators.text import adaptive_length_threshold

    # lang 'en': 20 docs with 1..20 tokens → P10 index = ceil(20/10) = 2 → threshold 2
    rows = [(i, " ".join(["w"] * i), "en") for i in range(1, 21)]
    # lang 'de': 3 docs → index ceil(3/10)=1 → threshold = min length
    rows += [(100, "a b c", "de"), (101, "a b", "de"), (102, "a b c d", "de")]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    got = {r.lang: r for r in adaptive_length_threshold(docs).collect()}
    assert got["en"].threshold_tokens == 2 and got["en"].n_below == 1
    assert got["de"].threshold_tokens == 2 and got["de"].n_below == 0
    assert got["en"].n_docs == 20 and got["de"].n_docs == 3


def test_boilerplate_ngrams_cross_doc(spark):
    """A 5-gram shared by >= min_docs docs counts as common; a doc of
    unique text scores 0; docs shorter than k have no rows."""
    from postgres_debezium_clickhouse_spark.operators.text import boilerplate_ngrams

    footer = "copyright notice legal footer text"
    docs = spark.createDataFrame(
        [
            (1, footer + " alpha beta gamma delta epsilon"),
            (2, footer + " zeta eta theta iota kappa"),
            (3, footer + " lam mu nu xi omicron"),
            (4, "completely original prose nobody else wrote today"),
            (5, "too short"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in boilerplate_ngrams(docs, k=5, min_docs=3).collect()}
    assert 5 not in out  # < k tokens → no k-grams
    assert out[4].n_common_ngrams == 0 and out[4].boilerplate_ratio == 0.0
    for d in (1, 2, 3):  # each contains the shared footer 5-gram
        assert out[d].n_common_ngrams >= 1
        assert out[d].boilerplate_ratio > 0.0


def test_gopher_rules_flags(spark):
    from postgres_debezium_clickhouse_spark.operators.text import gopher_rules

    good = ("the quick brown fox jumps over a lazy dog and runs far " * 5).strip()
    symbols = "the " + "@#$% " * 60 + "a and of word list here now"
    short = "the a tiny doc"
    docs = spark.createDataFrame(
        [(1, good), (2, symbols), (3, short)], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in gopher_rules(docs).collect()}
    assert out[1].words_ok and out[1].mean_len_ok and out[1].symbol_ok and out[1].stop_ok
    assert out[1].passes
    assert not out[2].symbol_ok and not out[2].passes
    assert not out[3].words_ok and not out[3].passes
    # integer-arithmetic flags agree with the reported float ratios
    assert out[2].symbol_word_ratio >= 0.1
    assert 3.0 <= out[1].mean_word_len <= 10.0


def test_lm_perplexity_ranks_rare_token_docs_worse(spark):
    """Occurrence-weighted unigram LM: a document of corpus-rare tokens gets
    lower avg_logprob / higher perplexity than one of corpus-common tokens;
    ppl = exp(-avg_logprob) within rounding."""
    import math

    from postgres_debezium_clickhouse_spark.operators.text import lm_unigram_logprob

    rows = [(i, "common common common common") for i in range(1, 10)]
    rows.append((100, "zzyzx qwfp common common"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in lm_unigram_logprob(docs).collect()}
    assert out[100].avg_logprob < out[1].avg_logprob
    assert out[100].ppl > out[1].ppl
    assert out[100].n_tokens == 4
    assert abs(out[100].ppl - math.exp(-out[100].avg_logprob)) < 0.01
    # all-common docs share identical scores (same token multiset)
    assert out[1].avg_logprob == out[9].avg_logprob


def test_strip_markup_blocks_entities_and_malformed(spark):
    from postgres_debezium_clickhouse_spark.operators.text import strip_markup

    rows = [
        (1, '<p>Hello <b>world</b></p>'),
        (2, '<script>var s = "<p>sneaky</p>";</script>after'),
        (3, '<STYLE media="x">h1 {}</STYLE>kept'),
        (4, 'a &amp;&amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39; x&nbsp;y'),
        (5, 'broken <tag attr="unclosed  still fine'),   # malformed: degrade, no crash
        (6, '  lots \t of \n whitespace  '),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "html"])
    out = {r.doc_id: r for r in strip_markup(docs).collect()}
    assert out[1].clean == "Hello world"
    assert out[2].clean == "after"          # script CONTENTS die too
    assert out[3].clean == "kept"           # case-insensitive style block
    assert out[4].clean == 'a && b <tag> "q" \'s\' x y'
    assert out[5].clean == "broken <tag attr=\"unclosed still fine"  # no closing > → not a tag
    assert out[6].clean == "lots of whitespace"
    assert out[1].n_removed == len(rows[0][1]) - len("Hello world")


def test_vocab_coverage_curve(spark):
    from postgres_debezium_clickhouse_spark.operators.text import vocab_coverage

    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b d")],
        ["doc_id", "text"],
    )
    out = {r.k: r for r in vocab_coverage(docs, ks=[1, 2, 4]).collect()}
    # counts: a=4 b=3 c=1 d=1 (total 9); ties broken token-asc
    assert out[1].covered == 4 and abs(out[1].coverage - 4 / 9) < 1e-6
    assert out[2].covered == 7
    assert out[4].covered == 9 and out[4].coverage == 1.0


def test_strip_markup_matches_python_reference_on_adversarial_inputs(spark):
    """The Spark regexp_replace chain vs an independent Python `re`
    implementation of the SAME documented spec, over adversarial
    markup-ish strings (nested brackets, unterminated tags/blocks, entity
    pileups, mixed case) — catches any Java-regex/spec divergence."""
    import random
    import re

    from postgres_debezium_clickhouse_spark.operators.text import strip_markup

    def reference(s: str) -> str:
        s = re.sub(r"(?is)<script\b[^>]*>.*?</script\s*>", " ", s)
        s = re.sub(r"(?is)<style\b[^>]*>.*?</style\s*>", " ", s)
        s = re.sub(r"(?s)<[^>]*>", " ", s)
        for ent, ch in [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                        ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")]:
            s = s.replace(ent, ch)
        return re.sub(r"\s+", " ", s).strip()

    rng = random.Random(7)
    atoms = ["<p>", "</p>", "<ScRiPt>", "</script >", "<style x=1>", "</STYLE>",
             "<b", ">", "<", "text", "&amp;", "&lt;", "&nbsp;", "a&b", "\n", "\t",
             "  ", '<a href="x">', "<!-- c -->", "<>", "</>", "x<y>z"]
    rows = [(i, "".join(rng.choice(atoms) for _ in range(rng.randrange(0, 25))))
            for i in range(60)]
    docs = spark.createDataFrame(rows, ["doc_id", "html"])
    out = {r.doc_id: r.clean for r in strip_markup(docs).collect()}
    for i, html in rows:
        assert out[i] == reference(html), f"divergence on {html!r}"


def test_vocab_coverage_denominator_includes_tail_tokens(spark):
    # review finding (r6): the total must count ALL occurrences, including
    # tokens outside the top-max(ks) cut — coverage at k=max(ks) is < 1.0
    # whenever a tail exists
    from postgres_debezium_clickhouse_spark.operators.text import vocab_coverage

    docs = spark.createDataFrame(
        [(1, "a a a b b c d e f g")], ["doc_id", "text"]
    )  # 7 distinct tokens, 10 occurrences
    out = {r.k: r for r in vocab_coverage(docs, ks=[1, 2]).collect()}
    assert out[1].covered == 3 and abs(out[1].coverage - 0.3) < 1e-6
    assert out[2].covered == 5 and abs(out[2].coverage - 0.5) < 1e-6


def test_extract_urls_domains_and_no_match(spark):
    from postgres_debezium_clickhouse_spark.operators.text import extract_urls

    docs = spark.createDataFrame(
        [
            (1, "visit https://a.example.com/x?q=1 or http://b.org plain"),
            (2, "no links here"),
            (3, "bare https://just-domain.io"),
            (4, "https://tab.example.com\tafter and https://nl.example.com\nnext"),
        ],
        ["doc_id", "text"],
    )
    rows = extract_urls(docs).collect()
    got = {(r.doc_id, r.url, r.domain) for r in rows}
    assert got == {
        (1, "https://a.example.com/x?q=1", "a.example.com"),
        (1, "http://b.org", "b.org"),
        (3, "https://just-domain.io", "just-domain.io"),
        # r6 review regression: ALL whitespace terminates a URL, not just space
        (4, "https://tab.example.com", "tab.example.com"),
        (4, "https://nl.example.com", "nl.example.com"),
    }


def test_normalize_unicode_semantics(spark):
    """NFC composes combining sequences, C0 controls are stripped (tab/
    newline/CR preserved), U+FFFD is counted not removed, NULL text
    passes through as NULL rows."""
    from postgres_debezium_clickhouse_spark.operators.text import normalize_unicode

    rows = [
        (1, "cafe\u0301 ok"),     # DECOMPOSED input -> must compose
        (2, "a\x07b\tc\nd"),           # BEL stripped; tab/newline kept
        (3, "bad � decode �"),
        (4, None),
        (5, "caf\u00e9"),         # already NFC (composed) -> unchanged
    ]
    out = {r[0]: r for r in normalize_unicode(
        spark.createDataFrame(rows, "doc_id long, text string")
    ).collect()}
    assert out[1].normalized == "caf\u00e9 ok" and out[1].changed is True
    assert out[2].normalized == "ab\tc\nd" and out[2].n_controls == 1
    assert out[3].n_mojibake == 2 and out[3].changed is False
    assert out[4].normalized is None and out[4].changed is None
    assert out[5].changed is False and out[5].n_controls == 0


def test_normalize_unicode_idempotent_property(spark):
    """Property (hypothesis): normalize is IDEMPOTENT — feeding its own
    output back yields changed=False, zero controls, identical text — and
    the output never contains stripped control characters."""
    import re

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from postgres_debezium_clickhouse_spark.operators.text import normalize_unicode

    ctrl = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")
    text = st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_categories=("Cs",)
        ),
        max_size=40,
    )

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(texts=st.lists(text, min_size=1, max_size=8))
    def prop(texts):
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        out1 = normalize_unicode(docs).collect()
        for r in out1:
            assert not ctrl.search(r.normalized or "")
        again = spark.createDataFrame(
            [(r.doc_id, r.normalized) for r in out1], "doc_id long, text string"
        )
        for r in normalize_unicode(again).collect():
            assert r.changed is False and r.n_controls == 0

    prop()


def test_normalize_unicode_preserves_id_dtype(spark):
    """ADVICE r7: the mapInPandas output schema must take the id column's
    ACTUAL type from the input — string or int32 doc ids previously hit an
    Arrow schema mismatch against the hardcoded LongType."""
    from pyspark.sql import types as T

    from postgres_debezium_clickhouse_spark.operators.text import normalize_unicode

    docs_str = spark.createDataFrame(
        [("d-1", "café"), ("d-2", "ok")], "doc_id string, text string")
    out = normalize_unicode(docs_str)
    assert isinstance(out.schema["doc_id"].dataType, T.StringType)
    got = {r.doc_id: r for r in out.collect()}
    assert got["d-1"].normalized == "café" and got["d-1"].changed
    docs_int = spark.createDataFrame([(7, "x")], "doc_id int, text string")
    out_int = normalize_unicode(docs_int)
    assert isinstance(out_int.schema["doc_id"].dataType, T.IntegerType)
    assert out_int.collect()[0].doc_id == 7


def test_bm25_matches_reference_formula_and_ranking(spark):
    """r12 — BM25 against an independent pure-Python reference of the
    Lucene-variant formula (idf = ln(1+(N-df+0.5)/(df+0.5)), k1=1.2,
    b=0.75, round-6 contributions): every returned score and the full
    ranking must match; a corpus-absent query term contributes nothing;
    repeated query terms dedupe (qtf=1)."""
    import math

    from postgres_debezium_clickhouse_spark.operators.text import bm25_topk

    corpus = {
        1: "a a b x", 2: "a c", 3: "b b b c y", 4: "c c c c", 5: "a b c",
    }
    docs = spark.createDataFrame(
        sorted(corpus.items()), "doc_id long, text string")
    queries = [(10, "a b"), (11, "c zzz"), (12, "a a")]  # 12: qtf dedupe

    # independent reference
    toks = {d: t.split(" ") for d, t in corpus.items()}
    N = len(corpus)
    ntoks = sum(len(v) for v in toks.values())
    avgdl = ntoks / N
    df = {}
    for v in toks.values():
        for t in set(v):
            df[t] = df.get(t, 0) + 1

    def score(qid_terms, d):
        s = 0.0
        for t in sorted(set(qid_terms)):
            if t not in df or t not in toks[d]:
                continue
            tf = toks[d].count(t)
            idf = round(math.log(1 + (N - df[t] + 0.5) / (df[t] + 0.5)), 6)
            dl = len(toks[d])
            s += round(idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)), 6)
        return round(s, 6)

    expected = {}
    for qid, q in queries:
        ranked = sorted(
            ((score(q.split(" "), d), d) for d in corpus
             if score(q.split(" "), d) > 0),
            key=lambda t: (-t[0], t[1]))
        expected[qid] = [(d, s) for s, d in ranked[:5]]

    out = {}
    for r in bm25_topk(docs, queries, k=5).collect():
        out.setdefault(r.query_id, []).append((r.rank, r.doc_id, round(r.score, 6)))
    assert set(out) == set(expected)
    for qid in out:
        got = [(d, s) for _, d, s in sorted(out[qid])]
        assert got == expected[qid], (qid, got, expected[qid])


def test_lm_bigram_empty_docs_emit_null_not_crash(spark):
    """r13 ADVICE fix: empty/whitespace/1-token docs used to crash the
    bigram slice with a negative length; the docstring contract is
    n_transitions = 0 with NULL scores."""
    from postgres_debezium_clickhouse_spark.operators.text import (
        lm_bigram_stupid_backoff,
    )

    docs = spark.createDataFrame(
        [(1, "a b a b a"), (2, ""), (3, "   "), (4, "solo")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in lm_bigram_stupid_backoff(docs).collect()}
    assert set(out) == {1, 2, 3, 4}
    for d in (2, 3, 4):
        assert out[d]["n_transitions"] == 0
        assert out[d]["avg_logscore"] is None
        assert out[d]["ppl"] is None
    assert out[1]["n_transitions"] == 4
    assert out[1]["avg_logscore"] is not None


def test_bm25_broadcasts_are_query_term_sized(spark, monkeypatch):
    """r12 verdict item 1: the df (document-frequency) table must be
    filtered to QUERY terms before any broadcast — broadcasting the
    full vocabulary-sized df table OOMs at real corpus scale.  Records
    every F.broadcast() call inside bm25_topk and asserts each
    broadcast frame is bounded by the query-term count (or is the
    1-row totals scalar), never the corpus vocabulary."""
    import pyspark.sql.functions as SF
    from postgres_debezium_clickhouse_spark.operators import text as text_mod

    docs = spark.createDataFrame(
        [(i, f"tok{i % 50} common filler{i} noise{i * 7 % 97}")
         for i in range(200)],
        "doc_id long, text string",
    )
    queries = [(1, "common tok3"), (2, "filler5 absent")]
    n_qterms = len({t for _, q in queries for t in q.split()})

    recorded = []
    real_broadcast = SF.broadcast

    def rec(df):
        recorded.append(df)
        return real_broadcast(df)

    monkeypatch.setattr(text_mod.F, "broadcast", rec)
    out = text_mod.bm25_topk(docs, queries, k=3)
    assert recorded, "bm25_topk no longer broadcasts anything?"
    vocab = docs.select(
        SF.explode(SF.split("text", " ")).alias("t")).distinct().count()
    assert vocab > 4 * n_qterms          # fixture really has a big vocab
    for bdf in recorded:
        assert bdf.count() <= max(n_qterms, 4), (
            f"broadcast side with columns {bdf.columns} has "
            f"{bdf.count()} rows — vocabulary-sized broadcast is back"
        )
    # the fix must not change results: q1 matches ≥3 docs (k=3 rows);
    # q2's only corpus term is doc 5's 'filler5' (1 row)
    rows = {(r.query_id, r.rank): r.doc_id for r in out.collect()}
    assert len([k for k in rows if k[0] == 1]) == 3
    assert rows[(2, 1)] == 5 and len([k for k in rows if k[0] == 2]) == 1


def test_ccnet_buckets_tercile_structure(spark):
    """r13 — CCNet head/middle/tail: per-language tercile sizes follow
    the ceil(n/3)/ceil(2n/3) rank cuts; head holds the most-fluent
    (lowest-perplexity) docs; a planted gibberish doc lands in tail."""
    from postgres_debezium_clickhouse_spark.operators.text import (
        ccnet_perplexity_buckets,
    )

    common = "the cat sat on the mat and the dog ran"
    rows = [(i, common, "en") for i in range(1, 8)]
    rows.append((100, "zzyzx qwfp vvkj xxqq zzyzx qwfp vvkj xxqq zz qq", "en"))
    rows += [(200 + i, "el gato come pescado fresco hoy", "es")
             for i in range(2)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {r.doc_id: r for r in ccnet_perplexity_buckets(docs).collect()}
    en = [r for r in out.values() if r.lang == "en"]
    # 8 en docs → head ceil(8/3)=3, middle ceil(16/3)-3=3, tail 2
    from collections import Counter
    c = Counter(r.bucket for r in en)
    assert (c["head"], c["middle"], c["tail"]) == (3, 3, 2)
    assert out[100].bucket == "tail"            # gibberish
    # 2 es docs → head ceil(2/3)=1, middle ceil(4/3)-1=1
    es = Counter(r.bucket for r in out.values() if r.lang == "es")
    assert (es["head"], es["middle"], es["tail"]) == (1, 1, 0)
    # head ppl <= tail ppl within a language
    assert max(r.ppl for r in en if r.bucket == "head") <= min(
        r.ppl for r in en if r.bucket == "tail")


def test_kneser_ney_scores_unseen_bigrams_finitely(spark):
    """The contrast KN exists for: a bigram absent from train scores
    λ(w1)·P_cont(w2) — finite — where raw MLE is ln 0.  Also pins the
    continuation intuition: after the shared context, a w2 seen across
    MANY train contexts outscores an equally-frequent w2 welded to one
    context ("San Francisco")."""
    from postgres_debezium_clickhouse_spark.operators.text import (
        lm_bigram_kneser_ney,
    )

    train = spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),
            (2, "a dog sat near a tree"),
            (4, "the dog ran to the tree"),
        ],
        ["doc_id", "text"],
    )
    score = spark.createDataFrame(
        [
            (1, "the cat ran"),          # "cat ran" unseen; both words in-vocab
            (3, "zzz unknown words"),    # fully OOV
            (0, "the cat sat on the mat"),  # all seen
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in
            lm_bigram_kneser_ney(score, train_docs=train).collect()}
    # doc 1: 2 transitions — ("the","cat") seen, ("cat","ran") unseen but
    # scored finitely via the continuation mass
    assert rows[1]["n_transitions"] == 2
    assert rows[1]["n_unseen"] == 1 and rows[1]["n_oov"] == 0
    assert rows[1]["ppl"] is not None and rows[1]["ppl"] > 0
    # raw MLE contrast: c("cat ran") = 0 ⇒ MLE prob 0 ⇒ ln 0 = −inf;
    # KN keeps the whole doc finite
    assert rows[1]["avg_logscore"] is not None
    # doc 3: no transition has train-side stats → all OOV, stated not faked
    assert rows[3]["n_oov"] == rows[3]["n_transitions"] == 2
    assert rows[3]["avg_logscore"] is None and rows[3]["ppl"] is None
    # doc 0: fully seen text scores better (lower ppl) than the doc
    # carrying an unseen transition
    assert rows[0]["n_unseen"] == 0
    assert rows[0]["ppl"] < rows[1]["ppl"]


def test_modified_kneser_ney_closed_form_discounts(spark):
    """Chen & Goodman's modified KN on a corpus whose count-of-counts
    are planted by hand: one-bigram docs give c(a,b)=4, c(b,c)=3,
    c(c,d)=2, c(d,e)=c(e,a)=1 ⇒ n1=2, n2=1, n3=1, n4=1 ⇒ Y=0.5,
    D1=0.5, D2=0.5, D3+=1.0 — every per-transition probability is
    hand-checkable: P(b|a) = (4−1)/4 + (1·1/4)·(1/5) = 0.8 and the
    unseen P(c|a) = 0 + 0.25·0.2 = 0.05 (ln 0.05 → ppl 20 exactly
    under the round-6/floor discipline)."""
    from postgres_debezium_clickhouse_spark.operators.text import (
        lm_bigram_kneser_ney,
        lm_bigram_modified_kneser_ney,
    )

    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["a b"] * 4 + ["b c"] * 3 + ["c d"] * 2 + ["d e", "e a"]
        )],
        ["doc_id", "text"],
    )
    score = spark.createDataFrame(
        [(0, "a b"), (1, "a c")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in
            lm_bigram_modified_kneser_ney(score, train_docs=train).collect()}
    # seen count-4 bigram: D3+ = 1.0 applies → P = 0.8 exactly
    assert rows[0]["avg_logscore"] == -0.223144          # round6(ln 0.8)
    assert rows[0]["ppl"] == 1.25
    # unseen bigram: pure continuation mass λ(a)·P_cont(c) = 0.05
    assert rows[1]["n_unseen"] == 1
    assert rows[1]["avg_logscore"] == -2.995732          # round6(ln 0.05)
    assert rows[1]["ppl"] == 20.0
    assert rows[0]["mkn_regime_ok"] and rows[1]["mkn_regime_ok"]
    # the CLASS discounts genuinely differ from single-D KN (D = 0.75):
    # same seen transition scores (4−0.75)/4 + (0.75/4)·0.2 = 0.85 there
    kn = {r["doc_id"]: r for r in
          lm_bigram_kneser_ney(score, train_docs=train).collect()}
    assert kn[0]["avg_logscore"] != rows[0]["avg_logscore"]


def test_modified_kneser_ney_fallback_class_discount(spark):
    """The SRILM-style unestimable-class fallback: n3 = 0 while counts
    ≥ 4 exist (the engine fixture's own regime at sf0.01) — D3+ falls
    back to Y and the dag stays finite; a negative-discount count
    distribution cannot arise here so the in-plan guard passes."""
    from postgres_debezium_clickhouse_spark.operators.text import (
        lm_bigram_modified_kneser_ney,
    )

    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["a b"] * 4 + ["b c"] * 2 + ["d e", "e a"]
        )],
        ["doc_id", "text"],
    )
    # n1=2, n2=1, n3=0, n4=1 ⇒ Y=0.5, D3+ → Y = 0.5 (fallback)
    # P(b|a) = (4−0.5)/4 + ((0.5·1)/4)·(1/4) = 0.875 + 0.03125
    score = spark.createDataFrame([(0, "a b")], ["doc_id", "text"])
    row = lm_bigram_modified_kneser_ney(score, train_docs=train).collect()[0]
    import math
    expected = round(math.log(0.90625), 6)
    assert float(row["avg_logscore"]) == expected
    assert row["mkn_regime_ok"]


def test_readability_scores_hand_computed(spark):
    """Flesch/FK on a hand-counted fixture: 'the cat sat. it ran!' has
    W=5, S=2, Syl=5 ⇒ FRE = 206.835 − 1.015·2.5 − 84.6 = 119.6975,
    FK = 0.39·2.5 + 11.8 − 15.59 = −2.815; vowel-less tokens count 1
    syllable; empty docs carry NULL scores; no-punctuation docs are one
    sentence."""
    from postgres_debezium_clickhouse_spark.operators.text import (
        readability_scores,
    )

    docs = spark.createDataFrame(
        [
            (0, "the cat sat. it ran!"),
            (1, ""),
            (2, "zz grr"),                  # no vowels, no punctuation
            (3, "Aa EE ii"),                # case folding
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in readability_scores(docs).collect()}
    r0 = rows[0]
    assert (r0["n_words"], r0["n_sentences"], r0["n_syllables"]) == (5, 2, 5)
    assert r0["flesch_reading_ease"] == 119.6975
    assert r0["fk_grade"] == -2.815
    assert rows[1]["n_words"] == 0
    assert rows[1]["flesch_reading_ease"] is None
    assert rows[1]["fk_grade"] is None
    assert (rows[2]["n_sentences"], rows[2]["n_syllables"]) == (1, 2)
    assert rows[3]["n_syllables"] == 3


def test_witten_bell_type_token_mixture(spark):
    """Witten-Bell on the planted count corpus (train unigrams a/b/c/d/e
    = 5/7/5/3/2, total 22): P(b|a) = (4 + 1·(7/22))/(4+1) and the
    unseen P(c|a) = (1·(5/22))/5 — parameter-free, finite on unseen,
    and numerically distinct from both KN variants."""
    import math

    from postgres_debezium_clickhouse_spark.operators.text import (
        lm_bigram_kneser_ney,
        lm_bigram_witten_bell,
    )

    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["a b"] * 4 + ["b c"] * 3 + ["c d"] * 2 + ["d e", "e a"]
        )],
        ["doc_id", "text"],
    )
    score = spark.createDataFrame(
        [(0, "a b"), (1, "a c"), (2, "zz qq")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in
            lm_bigram_witten_bell(score, train_docs=train).collect()}
    assert float(rows[0]["avg_logscore"]) == round(
        math.log((4 + 1 * (7 / 22)) / (4 + 1)), 6)
    assert rows[1]["n_unseen"] == 1
    assert float(rows[1]["avg_logscore"]) == round(
        math.log((0 + 1 * (5 / 22)) / (4 + 1)), 6)
    # fully OOV doc: stated, not faked
    assert rows[2]["n_oov"] == rows[2]["n_transitions"] == 1
    assert rows[2]["avg_logscore"] is None
    # a different member of the family, not a relabeling
    kn = {r["doc_id"]: r for r in
          lm_bigram_kneser_ney(score, train_docs=train).collect()}
    assert kn[0]["avg_logscore"] != rows[0]["avg_logscore"]


def test_modified_kneser_ney_degrades_on_saturated_corpus(spark):
    """The regime the MODIFIED estimator cannot run in (and the sf1
    synthetic fixture actually hits): EVERY bigram type at count ≥ 5 ⇒
    n1 = n2 = n3 = 0 and Y = 0/0 — no low-count evidence to estimate
    class discounts from.  r15 (ADVICE r14): instead of raising, the
    dag DEGRADES to the fixed single discount D = 0.75 for all three
    classes and reports ``mkn_regime_ok = false`` — here c(a,b)=6,
    λ(a) = 0.75·1/6 = 0.125, P_cont(b) = 1/2, so
    P(b|a) = (6−0.75)/6 + 0.125·0.5 = 0.9375 exactly, NaN-free."""
    import math

    from postgres_debezium_clickhouse_spark.operators.text import (
        lm_bigram_modified_kneser_ney,
    )

    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(["a b"] * 6 + ["b c"] * 5)],
        ["doc_id", "text"],
    )
    score = spark.createDataFrame([(0, "a b")], ["doc_id", "text"])
    row = lm_bigram_modified_kneser_ney(score, train_docs=train).collect()[0]
    assert row["mkn_regime_ok"] is False
    assert float(row["avg_logscore"]) == round(math.log(0.9375), 6)
    assert row["ppl"] is not None and row["ppl"] > 0


def test_trigram_kneser_ney_hand_computed(spark):
    """r15 interpolated trigram KN on a planted corpus: train trigrams
    (a,b,c)×3, (d,b,c)×1, (a,b,e)×1 give c(ab·)=4, N₁₊(ab·)=2,
    continuation c'(b,c)=2, c'(b,e)=1, N₁₊(·b·)=3, N₁₊(b·)=2,
    P_cont(c)=1/2 over N_types₂=2 — so P(c|a,b) = (3−.75)/4 +
    (.75·2/4)·((2−.75)/3 + (.75·2/3)·(1/2)) = 0.8125 exactly; the
    unseen (d,b)→e transition scores λ(d,b)·P_KN(e|b) = 0.25; the
    whole thing SUMS TO 1 per context (proper distribution, the
    contrast with stupid backoff)."""
    import math

    from postgres_debezium_clickhouse_spark.operators.text import (
        lm_trigram_kneser_ney,
    )

    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["a b c"] * 3 + ["d b c", "a b e"]
        )],
        ["doc_id", "text"],
    )
    score = spark.createDataFrame(
        [(0, "a b c"), (1, "d b e"), (2, "x y z"), (3, "a b")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in
            lm_trigram_kneser_ney(score, train_docs=train).collect()}
    assert float(rows[0]["avg_logscore"]) == round(math.log(0.8125), 6)
    assert rows[0]["n_unseen"] == 0
    # unseen trigram with a KNOWN context: the handed-down mass exactly
    assert rows[1]["n_unseen"] == 1
    assert float(rows[1]["avg_logscore"]) == round(math.log(0.25), 6)
    # fully OOV context: stated, not faked
    assert rows[2]["n_oov"] == rows[2]["n_transitions"] == 1
    assert rows[2]["avg_logscore"] is None
    # < 3 tokens: no transitions
    assert rows[3]["n_transitions"] == 0 and rows[3]["ppl"] is None


def test_trigram_kneser_ney_sums_to_one(spark):
    """Propriety check: Σ_w₃ P(w₃|a,b) over the full train vocab ∪ one
    unseen symbol partitions the unit mass (machine-precision)."""
    from postgres_debezium_clickhouse_spark.operators.text import (
        lm_trigram_kneser_ney,
    )

    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["a b c"] * 3 + ["d b c", "a b e"]
        )],
        ["doc_id", "text"],
    )
    # continuation vocab is {c, e}; every P(w3|a,b) for w3 in it must
    # sum to 1 (unseen symbols outside the continuation vocab carry no
    # mass under a trigram-table-only model, and score as OOV)
    score = spark.createDataFrame(
        [(0, "a b c"), (1, "a b e")], ["doc_id", "text"]
    )
    import math
    rows = {r["doc_id"]: float(r["avg_logscore"]) for r in
            lm_trigram_kneser_ney(score, train_docs=train).collect()}
    total = sum(math.exp(v) for v in rows.values())
    assert abs(total - 1.0) < 1e-5  # round-6 logs: 1e-5 tolerance


def test_trigram_witten_bell_hand_computed(spark):
    """r15 trigram WB on the planted corpus (train (a,b,c)×3, (d,b,c),
    (a,b,e)): unigram total 15, c(b·)=5, T(b)=2 ⇒ P_wb(c|b) =
    (4 + 2·(4/15))/7; c(ab·)=4, T(ab)=2 ⇒ P(c|a,b) =
    (3 + 2·P_wb(c|b))/6 — and the unseen (d,b)→e transition stays
    finite via the type-count mixture; parameter-free (distinct from
    both KN's discounted value and stupid backoff's score)."""
    import math

    from postgres_debezium_clickhouse_spark.operators.text import (
        lm_trigram_kneser_ney,
        lm_trigram_witten_bell,
    )

    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["a b c"] * 3 + ["d b c", "a b e"]
        )],
        ["doc_id", "text"],
    )
    score = spark.createDataFrame(
        [(0, "a b c"), (1, "d b e"), (2, "x y z")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in
            lm_trigram_witten_bell(score, train_docs=train).collect()}
    pb_c = (4 + 2 * (4 / 15)) / (5 + 2)
    assert float(rows[0]["avg_logscore"]) == round(
        math.log((3 + 2 * pb_c) / (4 + 2)), 6)
    pb_e = (1 + 2 * (1 / 15)) / (5 + 2)
    assert rows[1]["n_unseen"] == 1
    assert float(rows[1]["avg_logscore"]) == round(
        math.log((0 + 1 * pb_e) / (1 + 1)), 6)
    assert rows[2]["n_oov"] == rows[2]["n_transitions"] == 1
    # a different member of the family, not a relabeling
    kn = {r["doc_id"]: r for r in
          lm_trigram_kneser_ney(score, train_docs=train).collect()}
    assert kn[0]["avg_logscore"] != rows[0]["avg_logscore"]


def test_trigram_interpolated_hand_computed(spark):
    """r15 trigram Jelinek-Mercer: every mixture component verified by
    hand on a 6-token train corpus — the seen trigram uses all four
    components, the unseen trigram with OOV word survives on the
    uniform backstop alone."""
    import math

    from postgres_debezium_clickhouse_spark.operators.text import (
        lm_trigram_interpolated,
    )

    train = spark.createDataFrame([(0, "a b c a b d")],
                                  "doc_id long, text string")
    ev = spark.createDataFrame([(1, "a b c x")], "doc_id long, text string")
    row = lm_trigram_interpolated(ev, train_docs=train).collect()[0]
    # train: tri abc=1,bca=1,cab=1,abd=1; c12 ab=2,bc=1; pairs ab=2,
    # bc=1,ca=1,bd=1; c2 a=2,b=2,c=1; uni a=2,b=2,c=1,d=1 tot=6 V=4
    s1 = round(math.log(0.5 * 1 / 2 + 0.3 * 1 / 2 + 0.15 * 1 / 6
                        + 0.05 / 4), 6)      # (a,b,c): all four live
    s2 = round(math.log(0.0 + 0.0 + 0.0 + 0.05 / 4), 6)  # (b,c,x): OOV
    want = math.floor((s1 + s2) / 2 * 1e6 + 0.5) / 1e6
    assert row.n_transitions == 2
    assert row.n_unseen == 1
    assert float(row.avg_logscore) == want
    assert float(row.ppl) == math.floor(math.exp(-want) * 1e4 + 0.5) / 1e4


def test_watermark_zscore_separation(spark):
    """r15 watermark detection: a text GENERATED to respect the
    hash-seeded green rule (greedily pick the first candidate token
    that hashes green given the previous token) z-scores far above a
    natural text; counts are exact."""
    import hashlib

    from postgres_debezium_clickhouse_spark.operators.text import (
        watermark_zscore,
    )

    def green(prev, w):
        h = int(hashlib.md5(f"{prev}|{w}".encode()).hexdigest()[:4], 16)
        return h % 100 < 25

    vocab = [f"w{i}" for i in range(50)]
    toks = ["w0"]
    for _ in range(60):
        nxt = next(w for w in vocab if green(toks[-1], w))
        toks.append(nxt)
    watermarked = " ".join(toks)
    natural = "the quick brown fox jumps over the lazy dog " * 7
    docs = spark.createDataFrame(
        [(1, watermarked), (2, natural.strip())], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in watermark_zscore(docs).collect()}
    assert out[1].n_green == out[1].n_scored == 60  # every pick green
    assert out[1].z_score > 10 and out[1].above_expected
    assert abs(out[2].z_score) < 3
    # exact count replay for the natural doc
    nat = natural.strip().split(" ")
    expect = sum(green(a, b) for a, b in zip(nat, nat[1:]))
    assert out[2].n_green == expect


def test_5gram_kneser_ney_proper_distribution_and_unseen(spark):
    """r16 (verdict item 5): the order-5 interpolated KN recursion is a
    PROPER distribution — Σ_w₅ P(w₅|w₁..w₄) over the full train vocab
    equals 1 exactly (each level hands down the mass its discount
    freed) — and an unseen 5-gram with a seen context scores finitely
    through the four-λ chain."""
    import math

    from postgres_debezium_clickhouse_spark.operators.text import (
        lm_5gram_kneser_ney,
    )

    train = spark.createDataFrame(
        [(0, "a b c d e a b c d f a b c e d b c d e f"),
         (2, "c d e f a b d e f a c d e a b")],
        "doc_id long, text string",
    )
    # score one doc whose 5-grams include the seen context (a b c d ·)
    # followed by EVERY train-vocab word — per-transition logprob back
    # out to probabilities that must sum to 1
    vocab = ["a", "b", "c", "d", "e", "f"]
    rows = [(100 + i, f"a b c d {w}") for i, w in enumerate(vocab)]
    score = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           lm_5gram_kneser_ney(score, train_docs=train).collect()}
    assert all(r.n_transitions == 1 and r.n_oov == 0 for r in out.values())
    total = sum(math.exp(r.avg_logscore) for r in out.values())
    assert abs(total - 1.0) < 1e-4  # round-6 logs: tiny quantization
    # 'a b c d f' / 'a b c d e' are seen 5-grams; the rest are unseen
    # but finite (flow through the interpolation chain)
    unseen = [r for r in out.values() if r.n_unseen == 1]
    assert len(unseen) == 4
    assert all(r.avg_logscore < 0 for r in unseen)
    # OOV: unknown continuation word w5
    oov = lm_5gram_kneser_ney(
        spark.createDataFrame([(200, "a b c d zz")], "doc_id long, text string"),
        train_docs=train,
    ).collect()[0]
    assert oov.n_oov == 1 and oov.avg_logscore is None


def test_main_content_rules_and_planted_contrast(spark):
    # Kohlschütter NumWordsRulesClassifier over a hand-built page: the
    # planted-contrast guard — no chrome token may survive into
    # main_text, and no article token may be dropped.
    from postgres_debezium_clickhouse_spark.operators.text import main_content

    art1 = " ".join(f"a{i}" for i in range(20))      # >16 words → content
    art2 = " ".join(f"b{i}" for i in range(18))
    html = (
        "<nav><a>home</a> <a>about</a> <a>contact</a></nav>"
        f"<h1>headline words here</h1><p>{art1}</p><p>{art2}</p>"
        "<div><a>rel1 rel2</a> promo</div>"
        "<footer><a>imprint</a> <a>terms</a></footer>"
    )
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    row = main_content(df).collect()[0]
    toks = set(row["main_text"].split())
    assert {"headline", "words", "here"} <= toks          # h1 kept
    assert {"a0", "a19", "b0", "b17"} <= toks             # articles kept
    assert not toks & {"home", "about", "contact", "rel1",
                       "rel2", "promo", "imprint", "terms"}
    assert row["n_blocks"] == 6
    assert row["n_content_blocks"] == 3
    assert row["n_words_main"] == 3 + 20 + 18
    assert row["n_words_boiler"] == 3 + 3 + 2
    # link-density rule: a 30-word paragraph that is ALL link text is
    # chrome even though it is long (ld=1 > 1/3)
    linky = "<a>" + " ".join(f"l{i}" for i in range(30)) + "</a>"
    html2 = f"<p>{art1}</p><div>{linky}</div><p>{art2}</p>"
    df2 = spark.createDataFrame([(2, html2)], "doc_id long, html string")
    row2 = main_content(df2).collect()[0]
    assert "l0" not in row2["main_text"]
    # art2 follows a fully-linked block (prev_ld=1 > 5/9) and has no
    # successor: the published tree drops it (curr<=40, next<=17) —
    # the paper's semantics, pinned as-is
    assert row2["n_content_blocks"] == 1
    assert "a0" in row2["main_text"] and "b0" not in row2["main_text"]
    # short block surrounded by short chrome (prev<=4, next<=15) drops;
    # empty blocks between adjacent tags are never counted
    html3 = "<div>tiny one</div><div>mid block here</div><div>end bit</div>"
    df3 = spark.createDataFrame([(3, html3)], "doc_id long, html string")
    row3 = main_content(df3).collect()[0]
    assert row3["n_blocks"] == 3 and row3["n_content_blocks"] == 0


def test_main_content_empty_docs_not_dropped(spark):
    # r17 review fix: zero-non-empty-block docs come out as EMPTY rows,
    # never silently vanish from the corpus
    from postgres_debezium_clickhouse_spark.operators.text import main_content

    df = spark.createDataFrame(
        [(1, "<div></div><nav></nav>"), (2, ""),
         (3, "<p>" + " ".join(f"t{i}" for i in range(20)) + "</p>")],
        "doc_id long, html string")
    rows = {r.doc_id: r for r in main_content(df).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1].main_text == "" and rows[1].n_blocks == 0
    assert rows[2].n_words_main == 0 and rows[2].n_words_boiler == 0
    assert rows[3].n_content_blocks == 1
