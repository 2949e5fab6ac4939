"""distribution_drift: identical inputs read zero, planted shifts localize."""

import pytest
from pyspark.sql import functions as F

from database_migration_spark.operators.drift import distribution_drift, drift_summary


def _summary(report):
    return {r["column_name"]: r.asDict() for r in drift_summary(report).collect()}


def test_identical_relations_have_zero_drift(spark):
    df = spark.createDataFrame(
        [(i, float(i) / 7, None if i % 5 == 0 else i * 100) for i in range(200)],
        "a BIGINT, b DOUBLE, c BIGINT",
    )
    s = _summary(distribution_drift(df, df, ["a", "b", "c"], n_bins=8))
    assert all(v["tv_ppm"] == 0 for v in s.values())
    assert all(v["null_share_diff_ppm"] == 0 for v in s.values())


def test_planted_shift_and_null_out_are_localized(spark):
    left = spark.createDataFrame([(float(i % 100),) for i in range(1000)], "v DOUBLE")
    # right: same shape but the top half collapsed to 0 (a lossy cast bug)
    right = spark.createDataFrame(
        [(float(i % 100) if i % 100 < 50 else 0.0,) for i in range(1000)], "v DOUBLE"
    )
    s = _summary(distribution_drift(left, right, ["v"], n_bins=10))["v"]
    # half the mass moved: TV distance = 0.5 (truncating div ±rounding)
    assert abs(s["tv_ppm"] - 500_000) < 2_000

    # a migration that nulls a column out must read as (near-total) drift
    nulled = left.select(F.lit(None).cast("double").alias("v"))
    s2 = _summary(distribution_drift(left, nulled, ["v"], n_bins=10))["v"]
    assert s2["tv_ppm"] > 990_000
    assert s2["null_share_diff_ppm"] == 1_000_000


def test_bins_are_exact_and_bounded(spark):
    left = spark.createDataFrame([(i,) for i in range(100)], "v BIGINT")
    right = spark.createDataFrame([(i,) for i in range(50, 150)], "v BIGINT")
    rep = distribution_drift(left, right, ["v"], n_bins=4).collect()
    bins = {r["bin"] for r in rep}
    assert bins <= {0, 1, 2, 3}  # never n_bins or beyond, even at the max value
    # bin bounds are e6-quantized and exact
    lo = min(int(r["bin_lo_e6"]) for r in rep if r["bin_lo_e6"] is not None)
    assert lo == 0  # min value 0 -> e6 bound 0
    counts = {(r["bin"]): (r["l_cnt"], r["r_cnt"]) for r in rep}
    assert sum(c[0] for c in counts.values()) == 100
    assert sum(c[1] for c in counts.values()) == 100


def test_constant_column_and_empty_side(spark):
    left = spark.createDataFrame([(7,)] * 10, "v BIGINT")
    right = spark.createDataFrame([(7,)] * 3, "v BIGINT")
    s = _summary(distribution_drift(left, right, ["v"]))["v"]
    assert s["tv_ppm"] == 0 and s["n_bins_hit"] == 1

    empty = spark.createDataFrame([], "v BIGINT")
    rep = distribution_drift(left, empty, ["v"]).collect()
    assert all(r["r_ppm"] is None for r in rep)  # empty side: shares undefined

    with pytest.raises(ValueError):
        distribution_drift(left, right, [])
    with pytest.raises(ValueError):
        distribution_drift(left, right, ["v"], n_bins=0)


def test_ks_catches_location_shift_tv_underreads(spark):
    """A +1-bin location shift moves every value one bin over: TV reads
    the per-bin mismatch, KS reads the CDF gap — and on a shifted uniform
    the two agree; on a smooth shift of a PEAKED distribution KS >= the
    per-bin TV signal. Exactness check: a pure shift of a uniform by one
    of ten bins has CDF gap = one bin's mass."""
    left = spark.createDataFrame([(float(i % 100),) for i in range(1000)], "v DOUBLE")
    shifted = spark.createDataFrame(
        [(float((i % 100) + 10),) for i in range(1000)], "v DOUBLE"
    )
    s = _summary(distribution_drift(left, shifted, ["v"], n_bins=11))["v"]
    assert s["ks_ppm"] > 0
    assert s["ks_ppm"] >= s["tv_ppm"] // 2  # CDF gap at least one bin's worth

    # identical inputs: both zero
    z = _summary(distribution_drift(left, left, ["v"], n_bins=11))["v"]
    assert z["ks_ppm"] == 0 and z["tv_ppm"] == 0

    # all-null column: no value bins -> ks 0 by definition, null bin carries it
    nul = left.select(F.lit(None).cast("double").alias("v"))
    n = _summary(distribution_drift(left, nul, ["v"]))["v"]
    assert n["ks_ppm"] > 900_000 or n["null_share_diff_ppm"] == 1_000_000


def test_drift_properties_random_inputs(spark):
    """Properties over random integer relations: TV/KS live in [0, 1e6];
    TV is symmetric; drift(x, x) is identically zero; moving ALL of one
    side's mass outside the other's bins reads ~1e6."""
    from hypothesis import given, settings, strategies as st

    vals = st.lists(
        st.one_of(st.integers(min_value=-50, max_value=50), st.none()),
        min_size=1, max_size=30,
    )

    @settings(max_examples=15, deadline=None)
    @given(l=vals, r=vals)
    def run(l, r):
        ldf = spark.createDataFrame([(v,) for v in l], "v BIGINT")
        rdf = spark.createDataFrame([(v,) for v in r], "v BIGINT")
        s_lr = _summary(distribution_drift(ldf, rdf, ["v"], n_bins=5))["v"]
        s_rl = _summary(distribution_drift(rdf, ldf, ["v"], n_bins=5))["v"]
        assert 0 <= s_lr["tv_ppm"] <= 1_000_000
        assert 0 <= s_lr["ks_ppm"] <= 1_000_000
        assert s_lr["tv_ppm"] == s_rl["tv_ppm"]  # TV is symmetric
        s_self = _summary(distribution_drift(ldf, ldf, ["v"], n_bins=5))["v"]
        assert s_self["tv_ppm"] == 0 and s_self["ks_ppm"] == 0

    run()


def test_categorical_columns_hash_bin_instead_of_null_collapse(spark):
    """The trap this mode closes: a string column try_cast to DECIMAL is
    all-NULL and reads ZERO drift whatever happened to the values. Hash
    bins make a categorical share shift visible."""
    left = spark.createDataFrame(
        [("A",)] * 50 + [("B",)] * 50, "status STRING"
    )
    flipped = spark.createDataFrame(
        [("A",)] * 90 + [("B",)] * 10, "status STRING"
    )
    same = _summary(distribution_drift(left, left, ["status"], n_bins=8))["status"]
    assert same["tv_ppm"] == 0
    shift = _summary(distribution_drift(left, flipped, ["status"], n_bins=8))["status"]
    assert shift["tv_ppm"] == 400_000  # 40% of the mass moved A->B exactly

    # NULLs still land in the NULL bin, not a hash bucket
    nulled = spark.createDataFrame([("A",), (None,)], "status STRING")
    rep = distribution_drift(nulled, nulled, ["status"], n_bins=8).collect()
    assert {r["bin"] for r in rep} >= {-1}

    # cross-side type mismatch raises instead of comparing binnings
    import pytest as _pytest

    num = spark.createDataFrame([(1,)], "status BIGINT")
    with _pytest.raises(ValueError):
        distribution_drift(left, num, ["status"])


def test_wide_numerics_bin_instead_of_null_collapse(spark):
    """Review finding: epoch-microsecond BIGINTs (~1.7e15) exceeded the
    fine DECIMAL(26,12) quantization and every value try_cast to the NULL
    bin — a timezone slide on a tsu column read ZERO drift. The coarse
    unit-resolution fallback must make it visible."""
    base = 1_700_000_000_000_000  # epoch-µs scale
    left = spark.createDataFrame(
        [(base + i * 60_000_000,) for i in range(200)], "tsu BIGINT"
    )
    slid = spark.createDataFrame(  # the 2h timezone slide
        [(base + i * 60_000_000 + 7_200_000_000,) for i in range(200)],
        "tsu BIGINT",
    )
    same = _summary(distribution_drift(left, left, ["tsu"], n_bins=10))["tsu"]
    assert same["tv_ppm"] == 0
    rep = distribution_drift(left, left, ["tsu"], n_bins=10).collect()
    assert all(r["bin"] >= 0 for r in rep)  # values BIN, not NULL-collapse
    shift = _summary(distribution_drift(left, slid, ["tsu"], n_bins=10))["tsu"]
    assert shift["tv_ppm"] > 200_000 and shift["ks_ppm"] > 200_000


def test_reference_histogram_scoring(spark):
    """drift_against_reference: the reference scores itself at zero; a
    shifted batch scores high; out-of-span values clamp to edge bins
    (visible drift, not silent loss); NULLs hit the NULL bin."""
    from database_migration_spark.operators.drift import (
        drift_against_reference,
        reference_histogram,
    )

    ref_data = spark.createDataFrame(
        [(float(i % 100),) for i in range(1000)], "v DOUBLE"
    )
    ref = reference_histogram(ref_data, ["v"], n_bins=10)
    self_score = {
        r["column_name"]: r["tv_ppm"]
        for r in drift_against_reference(ref_data, ref, ["v"], 10).collect()
    }
    assert self_score["v"] == 0

    shifted = spark.createDataFrame(
        [(float(i % 100) + 500,) for i in range(1000)], "v DOUBLE"
    )
    s = {r["column_name"]: r.asDict()
         for r in drift_against_reference(shifted, ref, ["v"], 10).collect()}
    # everything clamps into the top edge bin: ~90% of mass moved
    assert s["v"]["tv_ppm"] > 800_000
    assert s["v"]["n_rows"] == 1000

    nulled = ref_data.select(F.lit(None).cast("double").alias("v"))
    n = {r["column_name"]: r["tv_ppm"]
         for r in drift_against_reference(nulled, ref, ["v"], 10).collect()}
    assert n["v"] == 1_000_000  # all mass in a bin the reference never had


def test_reference_geometry_validated(spark):
    """Round-7 ADVICE fix: a batch whose column TYPE changed
    (numeric -> string) or whose n_bins differs from the frozen reference
    must raise, not score misleading tv_ppm against the wrong binning."""
    import pytest as _pytest

    from database_migration_spark.operators.drift import (
        drift_against_reference,
        reference_histogram,
    )

    ref_data = spark.createDataFrame(
        [(float(i % 50),) for i in range(500)], "v DOUBLE"
    )
    ref = reference_histogram(ref_data, ["v"], n_bins=8)
    # the stored geometry rows carry kind + bin count
    row = ref.limit(1).collect()[0]
    assert row["_kind"] == "numeric" and row["_n_bins"] == 8

    # numeric -> categorical batch: loud error
    str_batch = ref_data.select(F.col("v").cast("string").alias("v"))
    with _pytest.raises(ValueError, match="categorical"):
        drift_against_reference(str_batch, ref, ["v"], 8)
    # n_bins mismatch: loud error
    with _pytest.raises(ValueError, match="n_bins"):
        drift_against_reference(ref_data, ref, ["v"], 16)
    # unknown column: loud error
    with _pytest.raises(ValueError, match="not in the reference"):
        drift_against_reference(ref_data.withColumnRenamed("v", "x"),
                                ref, ["x"], 8)
    # matching geometry still scores (and scores itself at zero)
    got = {r["column_name"]: r["tv_ppm"]
           for r in drift_against_reference(ref_data, ref, ["v"], 8).collect()}
    assert got["v"] == 0
    # a legacy reference without the geometry columns skips the check
    legacy = ref.drop("_kind", "_n_bins")
    got = {r["column_name"]: r["tv_ppm"]
           for r in drift_against_reference(ref_data, legacy, ["v"], 8).collect()}
    assert got["v"] == 0
