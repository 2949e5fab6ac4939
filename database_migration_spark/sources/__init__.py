"""Source adapters: one per dialect, each yielding a normalized Catalog,
a type map, and per-column transfer expressions (SURVEY.md §2.1)."""
