"""Bucketed co-located join: the persisted-partitioning scale play.

Asserts the physical property that matters: joining two same-bucketed
tables produces a SortMergeJoin with ZERO shuffle exchanges.
"""

import contextlib
import io

import pytest


@pytest.fixture()
def bucket_env(spark, tmp_path, sf_smoke):
    from database_migration_spark.sources.bucketed import write_bucketed

    # warehouse.dir is static; tables land in ./spark-warehouse and are
    # dropped in teardown
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    write_bucketed(li, "li_bucketed", "l_orderkey", 8)
    write_bucketed(o, "o_bucketed", "o_orderkey", 8)
    yield
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_bucketed_join_no_shuffle(spark, bucket_env, sf_smoke):
    from database_migration_spark.sources.bucketed import bucketed_join

    # force the sort-merge path (tiny fixtures would broadcast otherwise;
    # at scale neither side broadcasts — that's the case bucketing serves)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "li_bucketed", "o_bucketed", "l_orderkey", "o_orderkey")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle either side
        # correctness: matches the plain join
        li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
        o = spark.read.parquet(f"{sf_smoke}/orders.parquet")
        assert j.count() == li.join(o, li.l_orderkey == o.o_orderkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_zorder_layout_skips_files_in_both_dimensions(spark, tmp_path):
    """A Z-ordered layout must localize BOTH dimensions: a range predicate
    on x alone AND one on y alone each touch a strict subset of files,
    where a single-column sort localizes only its own column (a y-range
    on x-sorted data touches every file). Content must be unchanged."""
    from pyspark.sql import functions as F

    from database_migration_spark.sources.bucketed import write_zordered

    n = 1 << 7
    grid = spark.range(n * n).select(
        F.col("id"),
        (F.col("id") % n).alias("x"),
        (F.col("id") / n).cast("long").alias("y"),
    )
    zpath = str(tmp_path / "zed")
    xpath = str(tmp_path / "xsorted")
    write_zordered(grid, zpath, "x", "y", files=16, bits=7)
    (
        grid.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.parquet(xpath)
    )

    def files_touched(path, pred):
        return (
            spark.read.parquet(path)
            .where(pred)
            .select(F.input_file_name())
            .distinct()
            .count()
        )

    xq = (F.col("x") >= 10) & (F.col("x") < 26)   # 1/8 of the x range
    yq = (F.col("y") >= 10) & (F.col("y") < 26)
    # the x-sorted layout localizes x but smears y over EVERY written file
    # (compare against the actual file count — repartitionByRange may
    # write fewer than the requested partitions when ranges sample empty)
    n_files = files_touched(xpath, F.lit(True))
    assert files_touched(xpath, xq) <= 4
    assert files_touched(xpath, yq) == n_files
    # z localizes both: strict subsets for either predicate
    assert files_touched(zpath, xq) <= 8
    assert files_touched(zpath, yq) <= 8
    # and the layout is a pure reordering
    z = spark.read.parquet(zpath)
    assert z.count() == n * n
    assert grid.exceptAll(z.select("id", "x", "y")).count() == 0


def test_zorder_quantization_exact_above_double_bound(spark):
    """The e6 quantization runs in DECIMAL fixed-point, so z-codes stay
    exact where a DOUBLE product provably mis-bins: odd BIGINTs >= ~1e12
    (v*1e6 exceeds 2^53 and rounds before the floor). Spark codes must
    equal an integer-exact Python reference for adversarial values."""
    from decimal import ROUND_FLOOR, Decimal

    from pyspark.sql import functions as F

    from database_migration_spark.sources.bucketed import zorder_expr

    bits = 16
    k = (1 << bits) - 1
    lo, hi = 1_000_000_000_001, 1_000_000_131_073  # odd, ~1e12, 2^17 span

    def qe(v):
        d = Decimal(v) if isinstance(v, int) else Decimal(float(v))
        return int((d * 1_000_000).to_integral_value(rounding=ROUND_FLOOR))

    def zref(x, y):
        qlo, qhi = qe(lo), qe(hi)
        span = max(qhi - qlo, 1)
        cx = max(0, min(k, ((qe(x) - qlo) * k) // span))
        cy = max(0, min(k, ((qe(y) - qlo) * k) // span))
        z = 0
        for i in range(bits):
            z += ((cx >> i) & 1) << (2 * i)
            z += ((cy >> i) & 1) << (2 * i + 1)
        return z

    vals = [(lo + 65536 * i + 1, hi - 65536 * i - 1) for i in range(3)]
    df = spark.createDataFrame(vals, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn(
            "z", zorder_expr("x", "y", (lo, hi), (lo, hi), bits)
        ).collect()
    }
    for (x, y), z in got.items():
        assert z == zref(x, y), (x, y, z, zref(x, y))


def test_zorder_n_three_dims_localizes_each(spark, tmp_path):
    """The N-column Morton layout localizes EVERY listed dimension: a range
    predicate on each of 3 columns alone touches a strict subset of files;
    content is a pure reordering; the 2-column zorder_expr is bit-for-bit
    the n=2 case; the 63-bit budget is enforced."""
    from pyspark.sql import functions as F

    from database_migration_spark.sources.bucketed import (
        write_zordered_n,
        zorder_expr,
        zorder_expr_n,
    )

    n = 1 << 5
    cube = spark.range(n * n * n).select(
        F.col("id"),
        (F.col("id") % n).alias("x"),
        ((F.col("id") / n).cast("long") % n).alias("y"),
        (F.col("id") / (n * n)).cast("long").alias("z"),
    )
    path = str(tmp_path / "z3")
    write_zordered_n(cube, path, ["x", "y", "z"], files=16, bits=5)

    def files_touched(pred):
        return (
            spark.read.parquet(path)
            .where(pred)
            .select(F.input_file_name())
            .distinct()
            .count()
        )

    total = files_touched(F.lit(True))
    for c in ("x", "y", "z"):
        assert files_touched((F.col(c) >= 4) & (F.col(c) < 8)) < total
    got = spark.read.parquet(path)
    assert got.count() == n * n * n
    assert cube.exceptAll(got.select("id", "x", "y", "z")).count() == 0

    # n=2 delegation is exact
    two = cube.select(
        zorder_expr("x", "y", (0, n - 1), (0, n - 1), 5).alias("a"),
        zorder_expr_n(["x", "y"], [(0, n - 1), (0, n - 1)], 5).alias("b"),
    )
    assert two.where(F.col("a") != F.col("b")).count() == 0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="63-bit"):
        zorder_expr_n(["x", "y", "z"], [(0, 1)] * 3, bits=22)


def test_zorder_negative_overflow_clamps_low(spark):
    """A value beyond DECIMAL(26,12) casts to NULL; least/greatest skip
    NULLs, so without the sign test a hugely NEGATIVE value landed in the
    TOP cell. It must clamp to cell 0; hugely positive to the top."""
    from database_migration_spark.sources.bucketed import zorder_expr_n

    df = spark.createDataFrame(
        [(-1e15,), (1e15,), (0.0,), (None,)], "v double"
    )
    z = zorder_expr_n(["v"], [(-100.0, 100.0)], bits=4)
    got = dict(
        zip(
            [r.v for r in df.collect()],
            [r.z for r in df.select(z.alias("z")).collect()],
        )
    )
    assert got[-1e15] == 0          # negative overflow -> bottom cell
    assert got[1e15] == 15          # positive overflow -> top cell
    assert got[0.0] == 7            # mid-range sanity


def test_zorder_stale_range_wide_value_no_overflow(spark):
    """(q - qlo) * k must not overflow BIGINT under ANSI mode: a value
    tens of billions past the stale range (epoch-millis scale) used to
    crash the whole layout write; it must clamp to the top cell."""
    from database_migration_spark.sources.bucketed import zorder_expr_n

    df = spark.createDataFrame(
        [(5.0e10,), (50.0,), (-5.0e10,)], "v double"
    )
    z = zorder_expr_n(["v"], [(0.0, 100.0)], bits=8)
    got = [r.z for r in df.select(z.alias("z")).collect()]
    assert got[0] == 255 and got[2] == 0  # clamp both sides, no crash
    assert 0 <= got[1] <= 255
