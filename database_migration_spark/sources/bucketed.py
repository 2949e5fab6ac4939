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


def zorder_expr(xname: str, yname: str, x_range, y_range, bits: int = 8):
    """Morton/Z-order key for two numeric columns: each value is quantized
    to micro-units (floor(v*1e6) — exact for integer inputs, fixed-point
    for doubles), scaled to a ``bits``-bit code over its [min, max] range
    with INTEGER arithmetic (`div`, never a double floor — CLAUDE.md's
    floor-division rule), then the bit strings interleave. Rows close in
    BOTH dimensions land close in z — the property multi-dimensional data
    skipping needs.

    Ranges are driver-supplied (collect once from table stats, don't
    rescan) and may be stale: out-of-range values clamp to the edge codes
    on BOTH sides (an unclamped negative code would sign-extend through
    shiftright and scatter the row's z). Magnitude bound: quantization runs
    in DECIMAL(26,12) fixed-point (never a DOUBLE product, whose rounding
    above 2^53 ≈ |v|·1e6 at ~9e9 would shift boundary rows one cell), so
    the e6 floor is exact for |v| ≤ ~9e12 — 14 integer digits — for both
    integer and fractional columns; the scaled product (q-qlo)·(2^bits-1)
    fits BIGINT there too. For columns already in large integer units
    (epoch-µs ~1.7e18) pre-scale to a coarser unit first (epoch-seconds or
    days), which costs nothing: the z-code has only 2^bits distinct cells
    per dimension anyway."""
    from decimal import ROUND_FLOOR, Decimal

    from pyspark.sql import functions as F

    def qexact(v) -> int:
        # driver-side mirror of the DECIMAL quantization (Python floats
        # carry the exact binary value into Decimal — no 2^53 product)
        d = Decimal(v) if isinstance(v, int) else Decimal(float(v))
        return int((d * 1_000_000).to_integral_value(rounding=ROUND_FLOOR))

    def scaled(name, lo, hi):
        qlo = qexact(lo)
        qhi = qexact(hi)
        span = max(qhi - qlo, 1)
        k = (1 << bits) - 1
        q = (
            f"CAST(floor(CAST(`{name}` AS DECIMAL(26,12)) * 1000000) "
            "AS BIGINT)"
        )
        code = F.expr(f"(({q} - {qlo}L) * {k}L) div {span}L")
        return F.greatest(F.lit(0), F.least(F.lit(k), code)).cast("long")

    x = scaled(xname, *x_range)
    y = scaled(yname, *y_range)
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
    binpack planner split). An empty or all-NULL input degrades to a plain
    write (there is no order to impose)."""
    from pyspark.sql import functions as F

    lo_hi = df.agg(
        F.min(xcol), F.max(xcol), F.min(ycol), F.max(ycol)
    ).collect()[0]
    if any(v is None for v in lo_hi):
        df.write.mode("overwrite").parquet(path)
        return
    z = zorder_expr(
        xcol, ycol, (lo_hi[0], lo_hi[1]), (lo_hi[2], lo_hi[3]), bits
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
