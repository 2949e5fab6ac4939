"""Spark operators: validation, delta sync, star schema, optimization,
dedup, similarity, text analysis, multimodal plumbing."""
