"""database_migration_spark — a PySpark-native analytics/migration engine.

Re-expresses the capabilities of the exasol/database-migration reference
(metadata-driven ETL: catalog scanning, type mapping, DDL synthesis, parallel
bulk movement, validation by metric diffing, incremental merge sync, manifest
file ingestion, data-driven type inference, star-schema restructuring) as an
idiomatic Spark DataFrame library, plus the large-scale training-data pipeline
operators (dedup, similarity search, multimodal columns, text analysis) that a
100 TB corpus needs.

Design stance (see SURVEY.md §7): pure-Python *planners* that produce
inspectable plans (preserving the reference's review-then-execute UX and
dry-run flags everywhere), and Spark *executors* that run them. All heavy
lifting stays in Catalyst/Tungsten — built-in `pyspark.sql.functions`, no
row-at-a-time Python in any data path.
"""

from database_migration_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
