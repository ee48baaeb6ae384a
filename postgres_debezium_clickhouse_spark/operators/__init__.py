"""Engine operators: latest-wins upsert, SMT-style transforms, dedup suite,
similarity search, text analysis, multimodal column plumbing."""
