"""Incremental/streaming layer: manifest-driven file ingestion and
watermark-based delta sync, batch-first with Structured Streaming variants."""
