"""Shared fixtures and oracle CTE chains for the llm_* query families.

ONE definition each for the cross-family constructs so a change can never
desynchronize the modules that share them:

* ``SHINGLES`` / ``MINHASH_PAIR_CTES`` — the 3-token-shingle and banded
  MinHash-pair SQL chains (dedup + text fingerprint + contamination); the
  affine permutation constants are IMPORTED from operators/dedup.py, so
  the oracle regenerates whenever the family changes.
* ``CDC_CHUNK_CTES`` — the content-defined-chunk boundary chain (the two
  chunk oracles splice it via a ``{CDC_CHUNK_CTES}`` placeholder).
* ``CLS_DIM`` / ``CLS_WEIGHTS`` — the deterministic demo weight vector
  for the hashing-trick classifier (quality + curation families).
* ``planted_quality_corpus`` — the fluent-vs-gibberish planted corpus the
  oracle-independent scoring guards run on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.classifier import pseudo_weights
from ..operators.dedup import MINHASH_PERMS as _MH_PERMS
from ..operators.dedup import MINHASH_PRIME as _MH_P
from ..operators.dedup import ROWS_PER_BAND as _MH_R
from ..sources.files import load_table

SHINGLES = """
    toks AS (SELECT doc_id, lang, source, text, string_split(text, ' ') AS tk FROM documents),
    sh AS (SELECT doc_id, lang, source,
                  list_distinct([array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk) - 1)]) AS ts
           FROM toks)
"""


def _mh_band_sql(b: int) -> str:
    parts = [
        f"CAST(list_min(list_transform(hs, h -> ({a} * h + {bb}) % {_MH_P})) AS VARCHAR)"
        for a, bb in _MH_PERMS[b * _MH_R:(b + 1) * _MH_R]
    ]
    return " || '|' || ".join(parts)


#: shared LSH-pair CTE chain (follows SHINGLES; no trailing comma): MinHash
#: signatures → band keys → candidate pairs → exact Jaccard.
MINHASH_PAIR_CTES = f"""hsx AS (SELECT doc_id, ts,
            list_transform(ts, s -> CAST(concat('0x', substr(md5(s), 1, 8)) AS BIGINT) % {_MH_P}) AS hs
            FROM sh),
        sig AS (SELECT doc_id, ts,
            {_mh_band_sql(0)} AS band0,
            {_mh_band_sql(1)} AS band1,
            {_mh_band_sql(2)} AS band2,
            {_mh_band_sql(3)} AS band3
            FROM hsx),
        bands AS (
            SELECT doc_id, 0 AS b, band0 AS bkey FROM sig UNION ALL
            SELECT doc_id, 1, band1 FROM sig UNION ALL
            SELECT doc_id, 2, band2 FROM sig UNION ALL
            SELECT doc_id, 3, band3 FROM sig),
        cand AS (SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
                 FROM bands l JOIN bands r ON l.b = r.b AND l.bkey = r.bkey AND l.doc_id < r.doc_id),
        j AS (SELECT c.doc_a, c.doc_b,
                     ROUND(len(list_intersect(a.ts, b.ts)) * 1.0
                           / len(list_distinct(list_concat(a.ts, b.ts))), 6) AS jaccard
              FROM cand c JOIN sh a ON c.doc_a = a.doc_id JOIN sh b ON c.doc_b = b.doc_id)"""

#: shared content-defined-chunk CTE chain (token split → boundary rule →
#: cumulative chunk index) — ONE definition for both chunk oracles, so a
#: w/modulus/prefix change can never desynchronize them.
CDC_CHUNK_CTES = """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk
                   FROM documents WHERE length(text) > 0),
        pos AS (SELECT doc_id, tk, unnest(range(len(tk))) AS i FROM t),
        b AS (SELECT doc_id, i, tk[i + 1] AS tok,
                     CASE WHEN i >= 2 AND i <= len(tk) - 2 AND len(tk) >= 4
                          AND TRY_CAST(concat('0x', substr(md5(
                              array_to_string(tk[i - 1:i + 1], ' ')), 1, 4)) AS BIGINT)
                              % 8 = 0
                     THEN 1 ELSE 0 END AS is_b
              FROM pos),
        c AS (SELECT doc_id, i, tok,
                     COALESCE(SUM(is_b) OVER (PARTITION BY doc_id ORDER BY i
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ci
              FROM b)"""

#: classifier demo dimensions — small enough that the oracle's literal
#: weight list stays readable; the operator takes any length
CLS_DIM = 64
CLS_WEIGHTS = pseudo_weights(CLS_DIM)

#: 8-word "fluent" vocabulary for the planted corpora — every fluent token
#: recurs across a third of the corpus, while each gibberish token appears
#: exactly once corpus-wide.
PLANT_VOCAB = "array('the','quick','brown','fox','jumps','over','a','dog')"
PLANT_LEN = 24  # tokens per planted document


def planted_quality_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, text, label): label=1 fluent (cyclic draws from the shared
    8-word vocab, phase-shifted by doc_id), label=0 gibberish (doc_id %
    3 == 0; tokens ``g<doc_id>x<i>`` unique corpus-wide)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    fluent = F.expr(
        f"concat_ws(' ', transform(sequence(0, {PLANT_LEN - 1}),"
        f" i -> element_at({PLANT_VOCAB}, cast((i + doc_id) % 8 as int) + 1)))"
    )
    gibberish = F.expr(
        f"concat_ws(' ', transform(sequence(0, {PLANT_LEN - 1}),"
        " i -> concat('g', doc_id, 'x', i)))"
    )
    is_gib = F.col("doc_id") % 3 == 0
    return docs.select(
        "doc_id",
        F.when(is_gib, gibberish).otherwise(fluent).alias("text"),
        F.when(is_gib, F.lit(0)).otherwise(F.lit(1)).alias("label"),
    )
