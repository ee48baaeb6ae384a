"""Engine operators: latest-wins upsert, SMT-style transforms, dedup suite
(exact/MinHash-LSH/SimHash/n-gram/connected-components/incremental),
similarity search (brute-force/sign-LSH/IVF + persisted index), text
analysis (stats/lang-ID/quality/perplexity/commonness/markup/URLs/Unicode
repair), tokenizer training (BPE merges + encode), link-graph ranking
(PageRank), curation (packing/sampling/splits/mixes/chunking/shards),
learned quality classifier, skew-safe aggregation, as-of/range joins, and
multimodal column plumbing with real stdlib PNG/WAV/Y4M decoders."""
