"""Flat table → star schema conversion.

Reference: /root/reference/post_load_optimization/Flat_To_Star_Schema/
Convert_To_Star_Schema.sql — dimension tables from SELECT DISTINCT over the
dimension column groups (:386), surrogate keys, NULL-safe joins when building
the fact (:372,405-418,429 — ``a=b OR (a IS NULL AND b IS NULL)``), and
anti-join dedup inserts for incremental refresh (:386,443).

Spark shape: ``distinct()`` + ``dense_rank`` surrogate keys, ``eqNullSafe``
(<=>) joins, ``left_anti`` dedup inserts. Dimensions are small by
construction → broadcast them into the fact build; the fact never shuffles.

Surrogate keys via dense_rank over the dimension's natural ordering make key
assignment deterministic (reruns give identical keys) — at scale prefer
monotonically stable keys from a dimension registry table; the deterministic
rank keeps validation reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_dimension(
    flat: DataFrame, dim_cols: list[str], key_col: str
) -> DataFrame:
    """DISTINCT dim columns + deterministic surrogate key (1-based dense
    rank over the natural order, NULLS FIRST both engines via asc_nulls_first)."""
    w = Window.orderBy(*[F.col(c).asc_nulls_first() for c in dim_cols])
    return (
        flat.select(*dim_cols)
        .distinct()
        .withColumn(key_col, F.dense_rank().over(w).cast("long"))
        .select(key_col, *dim_cols)
    )


def build_fact(
    flat: DataFrame,
    dims: dict[str, tuple[DataFrame, list[str]]],
    measure_cols: list[str],
    fact_id_cols: list[str],
) -> DataFrame:
    """Fact = flat ⋈ each dimension on NULL-safe equality of its columns,
    keeping surrogate keys + measures.

    dims: {key_col: (dim_df, dim_cols)}. Dimensions broadcast (small).
    """
    fact = flat
    for key_col, (dim, dim_cols) in dims.items():
        cond = None
        for c in dim_cols:
            clause = fact[c].eqNullSafe(dim[c])
            cond = clause if cond is None else (cond & clause)
        fact = fact.join(F.broadcast(dim.select(key_col, *dim_cols)), cond, "left").drop(
            *[dim[c] for c in dim_cols]
        )
    return fact.select(*fact_id_cols, *[k for k in dims], *measure_cols)


def incremental_dim_insert(
    dim: DataFrame, new_flat: DataFrame, dim_cols: list[str], key_col: str
) -> DataFrame:
    """Anti-join dedup insert (Convert_To_Star_Schema.sql:386,443): only
    combinations not already present get appended, keys continuing after the
    current max."""
    existing_max = dim.agg(F.max(key_col)).collect()[0][0] or 0
    fresh = (
        new_flat.select(*dim_cols)
        .distinct()
        .join(dim.select(*dim_cols), dim_cols, "left_anti")
    )
    w = Window.orderBy(*[F.col(c).asc_nulls_first() for c in dim_cols])
    fresh = fresh.withColumn(
        key_col, (F.dense_rank().over(w) + F.lit(existing_max)).cast("long")
    ).select(key_col, *dim_cols)
    return dim.unionByName(fresh)
