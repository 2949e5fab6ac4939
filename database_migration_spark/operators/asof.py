"""As-of (point-in-time) join — a custom operator Spark lacks natively.

``as_of_join(left, right, key, ts)``: for every left row, attach the most
recent right row with ``right.ts <= left.ts`` within the same key — the
standard point-in-time enrichment (price as of trade time, user tier as of
event time).

Scalable implementation (SURVEY §7 custom-operator ladder, option (a) —
composition of built-in ops): tag and UNION both sides, then one window
pass per key ordered by (ts, side) carrying the last non-null right value
forward (``last(col, ignorenulls=True)`` over unbounded-preceding rows).

Cost: ONE shuffle on the key + a sort within partitions — linear, no
range-join row explosion, no per-key pandas. This is the shape that
survives 100 TB: compare the naive range join (left ⋈ right on key AND
r.ts <= l.ts, then max-per-left-row), which materializes every historical
match. Skewed keys ride on AQE; ties on (key, ts) are resolved by
preferring the right row (side orders right rows first at equal ts, so a
same-instant right value is visible to the left row — DuckDB ASOF JOIN's
``<=`` semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Left rows + latest right ``value_cols`` as of ``ts`` (NULL when no
    right row precedes). Right rows sharing (key, ts) must be unique —
    pre-aggregate the right side if not.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (key, ts)
    ]
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_side"),  # right rows (0) sort first at equal ts
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in left.schema.fields) + ">"
        ).alias("_l"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "_side",
        "_l",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_r_{c}") for c in value_cols],
    )
    out = filled.where(F.col("_side") == 1).select(
        *[F.col("_l")[c].alias(c) for c in left.columns],
        *[F.col(f"_r_{c}").alias(c) for c in value_cols],
    )
    return out
