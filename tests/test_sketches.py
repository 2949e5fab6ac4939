"""heavy_hitters (operators/sketches.py): the Misra-Gries two-pass route
must produce EXACTLY the naive groupBy answer — under any partitioning,
at the tightest summary size the guarantee permits, weighted or not."""

import pytest
from pyspark.sql import functions as F

from database_migration_spark.operators.sketches import heavy_hitters


def _naive(df, keys, ppm, weight=None):
    w = F.sum(F.col(weight)).cast("long") if weight else F.count(F.lit(1)).cast("long")
    tot_col = F.col(weight).cast("decimal(38,0)") if weight else F.lit(1).cast("decimal(38,0)")
    total = int(df.agg(F.sum(tot_col)).collect()[0][0] or 0)
    agg = df.groupBy(*keys).agg(w.alias("cnt"))
    keep = (F.col("cnt").cast("decimal(38,0)") * 1_000_000) >= (
        F.lit(total).cast("decimal(38,0)") * ppm
    )
    return {
        tuple(r[k] for k in keys) + (r["cnt"],)
        for r in agg.where(keep).collect()
    }


def _got(df, keys, ppm, **kw):
    return {
        tuple(r[k] for k in keys) + (r["cnt"],)
        for r in heavy_hitters(df, keys, ppm, **kw).collect()
    }


@pytest.fixture(scope="module")
def skewed(spark):
    # Zipf-ish: key i appears ~N/i times, plus a NULL-keyed block —
    # 1 000 distinct keys, ~7 500 rows
    rows = [(i, 1) for i in range(1, 1001) for _ in range(1000 // i)]
    rows += [(None, 1)] * 120
    return spark.createDataFrame(rows, "k int, one int").repartition(16)


def test_matches_naive_groupby(skewed):
    ppm = 10_000
    assert _got(skewed, ["k"], ppm) == _naive(skewed, ["k"], ppm)


def test_tightest_summary_size_keeps_guarantee(skewed):
    # summary_size = ceil(1e6/ppm) exactly — the boundary the proof covers
    ppm = 10_000
    assert _got(skewed, ["k"], ppm, summary_size=100) == _naive(
        skewed, ["k"], ppm
    )


def test_partitioning_invariance(skewed):
    ppm = 20_000
    want = _naive(skewed, ["k"], ppm)
    for n in (1, 7, 32):
        assert _got(skewed.repartition(n), ["k"], ppm) == want


def test_null_keys_counted(skewed):
    # the NULL block is ~1.6% of rows — above a 10000 ppm threshold
    out = heavy_hitters(skewed, ["k"], 10_000).collect()
    assert any(r["k"] is None for r in out)


def test_weighted_equals_exploded(spark):
    # pre-aggregated (key, weight) rows == the exploded unweighted stream
    pre = spark.createDataFrame(
        [("a", 500), ("b", 30), ("a", 250), ("c", 220)], "k string, w long"
    ).repartition(4)
    exploded = spark.createDataFrame(
        [("a",)] * 750 + [("b",)] * 30 + [("c",)] * 220, "k string"
    ).repartition(4)
    ppm = 100_000
    got_w = _got(pre, ["k"], ppm, weight_col="w")
    assert got_w == _naive(exploded, ["k"], ppm)
    # share_ppm column is the exact floor
    shares = {
        r["k"]: r["share_ppm"]
        for r in heavy_hitters(pre, "k", ppm, weight_col="w").collect()
    }
    assert shares == {"a": 750_000, "c": 220_000}


def test_multi_column_keys(spark):
    df = spark.createDataFrame(
        [("x", 1)] * 40 + [("x", 2)] * 5 + [("y", 1)] * 55,
        "a string, b int",
    ).repartition(8)
    ppm = 300_000
    assert _got(df, ["a", "b"], ppm) == _naive(df, ["a", "b"], ppm)


def test_bad_params_raise(skewed):
    with pytest.raises(ValueError, match="threshold_ppm"):
        heavy_hitters(skewed, "k", 0)
    with pytest.raises(ValueError, match="no-false-negative"):
        heavy_hitters(skewed, "k", 10_000, summary_size=50)


def test_empty_input(spark):
    df = spark.createDataFrame([], "k string")
    assert heavy_hitters(df, "k", 10_000).count() == 0


def test_null_key_survives_multi_batch_fragmentation(spark):
    # pandas labels a NULL group as a fresh NaN per Arrow batch, and
    # NaN != NaN as a dict key — without canonicalization a NULL heavy
    # hitter fragments into per-batch slivers the decrement zeroes
    # (review finding). Force many small batches in ONE partition with
    # enough distinct keys to trigger decrements, NULLs spread thin.
    rows = []
    for i in range(2000):
        rows.append((i % 400,))       # 400 distinct keys, 5 each
        if i % 4 == 0:
            rows.append((None,))      # NULL = 500 of 2500 rows = 20%
    df = spark.createDataFrame(rows, "k int").coalesce(1)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "50")
    try:
        # summary_size 10 < 400 distinct keys -> constant decrements
        got = _got(df, ["k"], 150_000, summary_size=10)
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old
        )
    assert got == _naive(df, ["k"], 150_000)
    assert any(k is None for (k, _cnt) in got)


def test_fractional_weights_truncate_consistently(spark):
    # non-integral weights follow ONE convention on every leg (per-row
    # long truncation) — a decimal-total/long-recount mix flipped keys
    # sitting exactly at threshold (review finding)
    df = spark.createDataFrame(
        [("a", 2.7)] * 10 + [("b", 0.9)] * 50 + [("c", 10.0)] * 2,
        "k string, w double",
    ).repartition(4)
    got = _got(df, ["k"], 200_000, weight_col="w")
    # per-row truncation: a=2*10=20, b=0*50=0, c=10*2=20; total=40
    assert got == {("a", 20), ("c", 20)}


def test_fractional_filler_mass_cannot_evict_threshold_key(spark):
    # advisor finding: the summary pass truncated BATCH sums of raw float
    # weights while the total/recount legs truncate per row. Sub-1.0
    # weights that floor to 0 per row then summed to real batch mass,
    # inflating the partition total and the Misra-Gries decrement budget
    # n_p/(k+1) — repeated decrements drained a genuinely-heavy key out
    # of the summary (false negative). Per-row measure: hh=10, every
    # filler=0, so hh is 100% of mass and MUST survive the tightest
    # summary. Under batch-sum truncation each filler credited int(3.6)=3
    # and ~50 small batches of decrements evicted hh.
    rows = [("hh", 1.0)] * 10
    for i in range(100):
        rows += [(f"f{i}", 0.9)] * 4
    df = spark.createDataFrame(rows, "k string, w double").coalesce(1)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "8")
    try:
        got = _got(df, ["k"], 500_000, weight_col="w", summary_size=2)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert got == {("hh", 10)}


def test_nan_key_canonicalizes_to_null(spark):
    # advisor finding: the pandas summary merges NaN and NULL into one
    # sentinel emitted as NULL, but eqNullSafe matches only true NULLs —
    # a NaN heavy key semi-joined to nothing and vanished. One identity
    # now holds on every leg: NaN IS NULL, masses merge.
    df = spark.createDataFrame(
        [(float("nan"),)] * 50 + [(1.0,)] * 30 + [(None,)] * 20, "k double"
    ).repartition(4)
    got = _got(df, ["k"], 300_000)
    assert got == {(None, 70), (1.0, 30)}
