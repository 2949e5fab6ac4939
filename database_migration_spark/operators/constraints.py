"""Constraint migration + data-driven key discovery.

Reference: /root/reference/post_load_optimization/set_primary_keys.sql:10-379
migrates PK metadata from a source catalog onto loaded tables (constraints
created DISABLED — order-independent load, mysql_to_exasol.sql:38-40).

Spark/parquet has no enforced constraints, so:
- :func:`constraint_statements` renders the metadata as the reviewable
  ALTER stream (parity surface);
- :func:`verify_primary_key` checks a declared PK actually holds in the
  data (count == countDistinct(keys) and no NULLs) — the enforcement the
  engine won't do;
- :func:`suggest_primary_keys` discovers single-column PK candidates from
  one metric scan (uniqueness + non-null) — the data-driven spin the
  post-load optimizers apply elsewhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from database_migration_spark.catalog import Catalog
from database_migration_spark.plans.statement_stream import MigrationPlan, Statement


def constraint_statements(catalog: Catalog, target_schema: str) -> MigrationPlan:
    plan = MigrationPlan()
    sec = plan.add_section("PRIMARY KEYS (DISABLED)")
    fks = plan.add_section("FOREIGN KEYS (DISABLED)")
    for t in sorted(catalog.tables, key=lambda x: x.table):
        if t.primary_key:
            cols = ", ".join(f'"{c}"' for c in t.primary_key.columns)
            sec.statements.append(
                Statement(
                    f'ALTER TABLE "{target_schema}"."{t.table}" '
                    f"ADD PRIMARY KEY ({cols}) DISABLE;"
                )
            )
        for fk in t.foreign_keys:
            cols = ", ".join(f'"{c}"' for c in fk.columns)
            rcols = ", ".join(f'"{c}"' for c in fk.ref_columns)
            fks.statements.append(
                Statement(
                    f'ALTER TABLE "{target_schema}"."{t.table}" ADD FOREIGN KEY '
                    f'({cols}) REFERENCES "{target_schema}"."{fk.ref_table}" ({rcols}) DISABLE;'
                )
            )
    return plan


def verify_primary_key(df: DataFrame, keys: list[str]) -> dict:
    """Does the declared PK hold? One aggregate: total rows, distinct key
    tuples, rows with any NULL key part."""
    key_struct = F.struct(*[F.col(k) for k in keys])
    any_null = None
    for k in keys:
        c = F.col(k).isNull()
        any_null = c if any_null is None else (any_null | c)
    row = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(key_struct).alias("n_distinct"),
        F.sum(any_null.cast("long")).alias("n_null_keys"),
    ).collect()[0]
    return {
        "n_rows": row.n_rows,
        "n_distinct": row.n_distinct,
        "n_null_keys": row.n_null_keys or 0,
        "holds": row.n_rows == row.n_distinct and (row.n_null_keys or 0) == 0,
    }


def suggest_primary_keys(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Single-column PK candidates from one scan: unique + non-null.

    Returns (column_name, n_rows, n_distinct, n_nulls, is_candidate) — the
    distinct counts run in one narrow Expand aggregate like the validator's.
    """
    from database_migration_spark.functions.parallel import fan_out

    cols = columns or df.columns
    df = fan_out(df)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.count_distinct(F.col(c)).alias(f"d__{c}"))
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"n__{c}"))
    row = df.agg(*aggs).collect()[0]
    out = []
    for c in cols:
        d, n = row[f"d__{c}"], row[f"n__{c}"] or 0
        out.append((c, row.n_rows, d, n, bool(d == row.n_rows and n == 0)))
    return df.sparkSession.createDataFrame(
        out,
        "column_name STRING, n_rows BIGINT, n_distinct BIGINT, n_nulls BIGINT, is_candidate BOOLEAN",
    )
