"""Write-time bucketing for shuffle-free co-located joins.

The 100 TB play for repeated big-big joins (fact ⋈ fact on the same key —
e.g. lineitem ⋈ orders on orderkey every day): bucket BOTH tables on the
join key at write time (`bucketBy(n, key).sortBy(key)`); every later join
on that key reads co-located buckets and skips the shuffle entirely —
.explain shows SortMergeJoin with zero Exchange under it.

The reference's analogue is Exasol DISTRIBUTE BY (the generators carry the
distribution key through — SURVEY §1.1 partition/distribution columns);
bucketing is the Spark-native way to persist that physical property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and bucket-sorted) table in the session
    catalog. n_buckets should match downstream parallelism; at 100 TB pick
    buckets so each is a few hundred MB."""
    w = df.write.bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.mode("overwrite").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys. With equal bucket
    counts Catalyst plans SortMergeJoin with no Exchange on either side."""
    l, r = spark.table(left_table), spark.table(right_table)
    return l.join(r, l[left_key] == r[right_key])


def zorder_expr(xcol, ycol, x_range, y_range, bits: int = 8):
    """Morton/Z-order key for two numeric columns: each value is scaled to
    a ``bits``-bit integer over its [min, max] range (driver-supplied —
    collect it once from table stats, don't rescan), then the bit strings
    interleave. Rows close in BOTH dimensions land close in z — the
    property multi-dimensional data skipping needs.

    Exact integer arithmetic: the scaling is a floor of (v-min)·(2^bits-1)
    over the range, the interleave is shifts and masks — deterministic on
    any engine."""
    from pyspark.sql import functions as F

    def scaled(col, lo, hi):
        span = max(hi - lo, 1)
        return F.least(
            F.lit((1 << bits) - 1),
            F.floor(
                (col.cast("double") - F.lit(float(lo)))
                * F.lit(float((1 << bits) - 1))
                / F.lit(float(span))
            ).cast("long"),
        )

    x = scaled(xcol, *x_range)
    y = scaled(ycol, *y_range)
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    xcol: str,
    ycol: str,
    files: int = 32,
    bits: int = 8,
) -> None:
    """Write ``df`` Z-ordered on (xcol, ycol): range-partition on the
    Morton key into ``files`` output files, sorted by z within each — the
    Delta OPTIMIZE ZORDER analogue over plain parquet.

    Why it matters at 100 TB: a single-column sort clusters min/max stats
    for that column only; the Morton order clusters BOTH columns at once,
    so a 2-D range predicate (x BETWEEN … AND y BETWEEN …) touches a few
    files/row-groups and parquet min/max pushdown skips the rest. The x/y
    ranges come from one tiny agg over the input (driver scalars, the
    binpack planner split)."""
    from pyspark.sql import functions as F

    lo_hi = df.agg(
        F.min(xcol), F.max(xcol), F.min(ycol), F.max(ycol)
    ).collect()[0]
    z = zorder_expr(
        F.col(xcol), F.col(ycol), (lo_hi[0], lo_hi[1]), (lo_hi[2], lo_hi[3]), bits
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
