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


def zorder_expr_n(names: list, ranges: list, bits: int = 8):
    """Morton/Z-order key over N numeric columns — the general form of
    :func:`zorder_expr` (which delegates here): each column quantizes to
    a ``bits``-bit code over its range via the same DECIMAL fixed-point
    arithmetic, and the codes' bits interleave round-robin (bit i of
    column j lands at position i*n + j). The interleaved key fits a signed
    BIGINT while bits*n <= 63 — enforced, since a silent overflow would
    scatter the layout. More columns at fixed bits = coarser per-column
    cells (2^bits each, but file-count budget shared n ways); 3-4 columns
    at 8-10 bits is the practical multi-dimensional skipping regime, the
    same guidance as Delta's OPTIMIZE ZORDER."""
    from decimal import ROUND_FLOOR, Decimal

    from pyspark.sql import functions as F

    n = len(names)
    if n != len(ranges) or n == 0:
        raise ValueError("names and ranges must be same-length, non-empty")
    if bits * n > 63:
        raise ValueError(
            f"bits*columns = {bits * n} exceeds the 63-bit BIGINT budget; "
            f"lower bits (≤ {63 // n} for {n} columns)"
        )

    def qexact(v) -> int:
        d = Decimal(v) if isinstance(v, int) else Decimal(float(v))
        return int((d * 1_000_000).to_integral_value(rounding=ROUND_FLOOR))

    def scaled(name, lo, hi):
        qlo = qexact(lo)
        qhi = qexact(hi)
        span = max(qhi - qlo, 1)
        k = (1 << bits) - 1
        # try_cast: beyond DECIMAL(26,12) the quantization must yield NULL
        # (handled by the sign clamp below) — a plain CAST under ANSI mode
        # (the session default) would CRASH the whole layout write on the
        # first out-of-range value
        q = (
            f"CAST(floor(try_cast(`{name}` AS DECIMAL(26,12)) * 1000000) "
            "AS BIGINT)"
        )
        # the scale multiply runs in DECIMAL(38,0): (q - qlo) can be
        # ~1.8e19 for a stale range, and * k would overflow BIGINT (ANSI
        # crash) long before the 9e12 quantization bound — decimal width
        # 38 holds the full 9e18 * 255 product exactly
        code = F.expr(
            f"((CAST({q} AS DECIMAL(38,0)) - {qlo}) * {k}) div {span}"
        )
        clamped = F.greatest(F.lit(0), F.least(F.lit(k), code))
        # beyond DECIMAL(26,12) (|v| > ~9e12) the cast is NULL and
        # least/greatest SKIP nulls — without the sign test a hugely
        # NEGATIVE value would land in the TOP cell instead of cell 0,
        # violating the documented both-sides clamp (NULL data itself
        # keeps the top cell, as before: deterministic, layout-only)
        return (
            F.when(
                F.expr(f"{q} IS NULL AND `{name}` IS NOT NULL AND `{name}` < 0"),
                F.lit(0),
            )
            .otherwise(clamped)
            .cast("long")
        )

    codes = [scaled(name, *rng) for name, rng in zip(names, ranges)]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, code in enumerate(codes):
            z = z + F.shiftleft(
                F.shiftright(code, i).bitwiseAND(F.lit(1)), i * n + j
            )
    return z


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
    runs in DECIMAL(38,0) — wide enough for the full quantized range, so
    no value (however stale the supplied range) can overflow it — and
    out-of-range values clamp to the edge codes on both sides, including
    beyond the DECIMAL(26,12) quantization bound (NULL-by-overflow is
    clamped by sign). For columns already in large integer units
    (epoch-µs ~1.7e18) pre-scale to a coarser unit first (epoch-seconds or
    days), which costs nothing: the z-code has only 2^bits distinct cells
    per dimension anyway."""
    return zorder_expr_n([xname, yname], [x_range, y_range], bits)


def write_zordered_n(
    df: DataFrame,
    path: str,
    cols: list,
    files: int = 32,
    bits: int = 8,
) -> None:
    """Write ``df`` Z-ordered on N columns: range-partition on the Morton
    key into ``files`` output files, sorted by z within each — the Delta
    OPTIMIZE ZORDER analogue over plain parquet.

    Why it matters at 100 TB: a single-column sort clusters min/max stats
    for that column only; the Morton order clusters ALL listed columns at
    once, so an n-D range predicate touches a few files/row-groups and
    parquet min/max pushdown skips the rest. The ranges come from one tiny
    agg over the input (driver scalars, the binpack planner split). An
    empty or all-NULL input degrades to a plain write (there is no order
    to impose)."""
    from pyspark.sql import functions as F

    lo_hi = df.agg(
        *[f for c in cols for f in (F.min(c), F.max(c))]
    ).collect()[0]
    if any(v is None for v in lo_hi):
        df.write.mode("overwrite").parquet(path)
        return
    ranges = [(lo_hi[2 * i], lo_hi[2 * i + 1]) for i in range(len(cols))]
    z = zorder_expr_n(list(cols), ranges, bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_zordered(
    df: DataFrame,
    path: str,
    xcol: str,
    ycol: str,
    files: int = 32,
    bits: int = 8,
) -> None:
    """Two-column convenience wrapper of :func:`write_zordered_n`."""
    write_zordered_n(df, path, [xcol, ycol], files, bits)
