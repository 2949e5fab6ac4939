"""Parallelism repair for CPU-heavy operators.

A parquet file with a single row group scans as ONE task no matter how many
cores exist — common with small/medium dimension files and exactly our local
fixtures. Operators whose per-row cost is high (regex passes, shingling,
dot products, wide metric aggregates) repartition first: the shuffle moves
only the (small) input once, and the expensive compute then uses every core.

At production scale this is a no-op: inputs already have >= parallelism
partitions, and the guard below skips the shuffle entirely. It is never a
substitute for proper partitioning of large tables — it exists for the
small-input/expensive-compute shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, n: int | None = None) -> DataFrame:
    """Repartition up to the cluster's default parallelism — only when the
    input has fewer partitions (single-row-group files, tiny dims)."""
    sc = df.sparkSession.sparkContext
    target = n or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
