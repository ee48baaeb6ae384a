"""LLM training-data pipeline queries — AGGREGATOR (r7 verdict item 8).

The 85-query suite lives in per-family modules; this module merges their
``QUERIES``/``ORACLES`` dicts so the driver contract
(``__spark_entry__._MODULES``) and every existing import keep working:

* :mod:`.llm_dedup_queries` — exact/MinHash/SimHash/semantic dedup,
  clustering, incremental dedup, contamination, dup reports
* :mod:`.llm_similarity_queries` — cosine/LSH/IVF ANN + recall evals
* :mod:`.llm_text_queries` — stats, lang-ID, quality score, fingerprints,
  TF-IDF, markup/URL extraction, LM perplexity, Unicode repair, vocab
* :mod:`.llm_quality_queries` — Gopher rules, learned classifier + AUC,
  the oracle-independent planted-contrast guards, composed filter report
* :mod:`.llm_multimodal_queries` — media stats/decode/resize/frames with
  dead-letter routing and the composed media pipeline
* :mod:`.llm_curation_queries` — splits, sampling, mixes, packing,
  chunking, shard export, training order, composed pipelines
* :mod:`.llm_corpus_queries` — domain blocklist/quality/PageRank, BPE
  tokenizer, sketch accuracy guards

These operators go beyond the reference (which has no document corpus) but
are first-class engine components for the 100 TB target.  All hashes are
md5-based so the oracles reproduce results exactly (see operators/dedup.py).
"""

from __future__ import annotations

from . import (
    llm_corpus_queries,
    llm_curation_queries,
    llm_dedup_queries,
    llm_multimodal_queries,
    llm_quality_queries,
    llm_similarity_queries,
    llm_text_queries,
)

# Backwards-compatible re-exports: oracle CTE chains (ops_queries), the
# planted corpus (tests), and every q_* query function.
from .llm_common import CDC_CHUNK_CTES as _CDC_CHUNK_CTES  # noqa: F401
from .llm_common import MINHASH_PAIR_CTES as _MINHASH_PAIR_CTES  # noqa: F401
from .llm_common import SHINGLES as _SHINGLES  # noqa: F401
from .llm_common import CLS_DIM as _CLS_DIM  # noqa: F401
from .llm_common import CLS_WEIGHTS as _CLS_WEIGHTS  # noqa: F401
from .llm_common import planted_quality_corpus as _planted_quality_corpus  # noqa: F401

_FAMILIES = (
    llm_dedup_queries,
    llm_similarity_queries,
    llm_text_queries,
    llm_quality_queries,
    llm_multimodal_queries,
    llm_curation_queries,
    llm_corpus_queries,
)

QUERIES: dict = {}
ORACLES: dict = {}
for _m in _FAMILIES:
    for _k in _m.QUERIES:
        assert _k not in QUERIES, f"duplicate query name across families: {_k}"
    QUERIES.update(_m.QUERIES)
    ORACLES.update(_m.ORACLES)

# q_* function re-exports (tests and notebooks import these by name)
for _m in _FAMILIES:
    for _n in dir(_m):
        if _n.startswith("q_"):
            globals()[_n] = getattr(_m, _n)
del _m, _n, _k
