"""Flat table → star schema conversion.

Reference: /root/reference/post_load_optimization/Flat_To_Star_Schema/
Convert_To_Star_Schema.sql — dimension tables from SELECT DISTINCT over the
dimension column groups (:386), surrogate keys, NULL-safe joins when building
the fact (:372,405-418,429 — ``a=b OR (a IS NULL AND b IS NULL)``), and
anti-join dedup inserts for incremental refresh (:386,443).

Spark shape: ``distinct()`` dimensions, ``eqNullSafe`` (<=>) joins,
``left_anti`` dedup inserts. Dimensions are small by construction →
broadcast them into the fact build; the fact never shuffles.

Surrogate keys come in two modes:

- ``hash`` (default, the scale path): 60-bit md5 of the dimension tuple —
  embarrassingly parallel, no shuffle, stable across reruns AND across
  incremental loads (a combination's key never changes), and portable (an
  external engine recomputes it from the same tuple). Collision odds are
  ~n²/2^61 — negligible below ~10^8 distinct combinations, far beyond any
  real dimension.
- ``parity`` (reference semantics): 1-based dense_rank over the natural
  order. The rank needs a GLOBAL window — every distinct row through one
  task (the ``WindowExec: No Partition Defined`` warning) — fine for
  enum-sized dims, a scale-killer for high-cardinality ones. Kept for
  golden-file parity with the reference's sequential keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from database_migration_spark.functions.hashing import md5_long

# Unit Separator: cannot appear in the (text-ish) dimension values, so the
# concatenation is prefix-collision-free; NULL gets an explicit marker
# because concat_ws would silently drop it ('' vs NULL must differ)
_SEP = "\x1f"
_NULL_MARK = "\x00N"


def hash_key(dim_cols: list[str]) -> Column:
    """The hash-mode surrogate key expression. DuckDB equivalent:
    ``('0x'||substr(md5(concat_ws(chr(31), coalesce(c::VARCHAR, chr(0)||'N'),
    ...)),1,15))::BIGINT``."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL_MARK)) for c in dim_cols
    ]
    return md5_long(F.concat_ws(_SEP, *parts))


def hash_key_sql(dim_cols: list[str]) -> str:
    """The identical key as DuckDB SQL text (oracle side)."""
    parts = ", ".join(
        f"coalesce(CAST({c} AS VARCHAR), chr(0)||'N')" for c in dim_cols
    )
    return f"CAST(('0x'||substr(md5(concat_ws(chr(31), {parts})),1,15)) AS BIGINT)"


def build_dimension(
    flat: DataFrame, dim_cols: list[str], key_col: str, key_mode: str = "hash"
) -> DataFrame:
    """DISTINCT dim columns + deterministic surrogate key (see module doc
    for the hash/parity trade-off)."""
    distinct = flat.select(*dim_cols).distinct()
    if key_mode == "parity":
        w = Window.orderBy(*[F.col(c).asc_nulls_first() for c in dim_cols])
        key = F.dense_rank().over(w).cast("long")
    else:
        key = hash_key(dim_cols)
    return distinct.withColumn(key_col, key).select(key_col, *dim_cols)


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
    dim: DataFrame,
    new_flat: DataFrame,
    dim_cols: list[str],
    key_col: str,
    key_mode: str = "hash",
) -> DataFrame:
    """Anti-join dedup insert (Convert_To_Star_Schema.sql:386,443): only
    combinations not already present get appended.

    Hash mode needs no key bookkeeping at all — a fresh combination's key
    is its content hash, so there is no driver-side max() collect and no
    window; parity mode continues ranks after the current max like the
    reference's sequence."""
    fresh = (
        new_flat.select(*dim_cols)
        .distinct()
        .join(dim.select(*dim_cols), dim_cols, "left_anti")
    )
    if key_mode == "parity":
        existing_max = dim.agg(F.max(key_col)).collect()[0][0] or 0
        w = Window.orderBy(*[F.col(c).asc_nulls_first() for c in dim_cols])
        fresh = fresh.withColumn(
            key_col, (F.dense_rank().over(w) + F.lit(existing_max)).cast("long")
        )
    else:
        fresh = fresh.withColumn(key_col, hash_key(dim_cols))
    return dim.unionByName(fresh.select(key_col, *dim_cols))
