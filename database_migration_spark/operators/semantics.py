"""Exasol value-semantics transforms — the observable edge-case behaviors
the reference reproduces for cross-system comparability (SURVEY §1.2 "null/
edge semantics"; the CHECK_MIGRATION metrics count on them).

- empty string IS NULL: Exasol stores '' as NULL, so ClickHouse sends
  ``nullIf(col, '')`` (clickhouse_to_exasol.sql:171 via the README notes
  at README.md:148-153). ``empty_string_to_null`` applies the same rule
  target-side for any source that got plain strings across.
- no float inf/nan: Exasol has no non-finite doubles; ClickHouse guards
  with ``if(isFinite(col), col, NULL)``. ``nonfinite_to_null`` is the
  Spark-side equivalent.
- temporal clamps: out-of-range values clamped to 0001-01-01 ..
  9999-12-31 (postgresql_to_exasol.sql:207-219) — here as a DataFrame
  transform for already-loaded data (load-time handling lives in typemap).
- CHAR blank-pad-insensitive comparison (sqlserver_to_exasol.sql:48-49):
  rtrim-normalizing transform for validation joins.

Each is a column-wise ``when()`` rewrite — codegen'd, zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

TS_MIN = "0001-01-01 00:00:00"
TS_MAX = "9999-12-31 23:59:59.999999"


def empty_string_to_null(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    cols = columns or [
        f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)
    ]
    for c in cols:
        df = df.withColumn(c, F.nullif(F.col(c), F.lit("")))
    return df


def nonfinite_to_null(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    cols = columns or [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.FloatType, T.DoubleType))
    ]
    for c in cols:
        col = F.col(c)
        df = df.withColumn(
            c, F.when(F.isnan(col) | (F.abs(col) == float("inf")), None).otherwise(col)
        )
    return df


def clamp_temporals(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    cols = columns or [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType))
    ]
    lo = F.lit(TS_MIN).cast("timestamp")
    hi = F.lit(TS_MAX).cast("timestamp")
    for c in cols:
        col = F.col(c)
        df = df.withColumn(
            c, F.when(col < lo, lo).when(col > hi, hi).otherwise(col)
        )
    return df


def rtrim_chars(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """CHAR blank-padding normalization for comparison joins."""
    cols = columns or [
        f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)
    ]
    for c in cols:
        df = df.withColumn(c, F.rtrim(F.col(c)))
    return df


def apply_exasol_semantics(df: DataFrame) -> DataFrame:
    """The full bundle, as a source adapter would apply before validation."""
    return clamp_temporals(nonfinite_to_null(empty_string_to_null(df)))
