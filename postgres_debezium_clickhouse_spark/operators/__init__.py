"""Engine operators: latest-wins upsert, SMT-style transforms, dedup suite
(exact/MinHash-LSH/SimHash/n-gram/connected-components/incremental),
similarity search (brute-force/sign-LSH/IVF + persisted index + k-means‖
seeding), sketches (Space-Saving topK heavy hitters, KMV distinct with
set algebra), text analysis (stats/lang-ID/quality/perplexity/commonness/
markup/URLs/Unicode repair), tokenizer training (BPE merges + expression
and Arrow encode paths), link-graph ranking (PageRank with drop or
dangling-redistribution modes + convergence report), curation
(packing/sampling/splits/mixes/chunking/shards), learned quality
classifier, skew-safe aggregation, as-of/range joins, and multimodal
column plumbing with real stdlib PNG/WAV/Y4M decoders."""
