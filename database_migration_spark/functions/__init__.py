"""Deterministic scalar helpers shared across operators (portable hashing,
text normalization, shingling) — built on pyspark.sql.functions only."""
