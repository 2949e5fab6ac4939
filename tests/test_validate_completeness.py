"""Key-completeness validation: planted gaps/dups must be localized."""

import pytest


def test_bucket_completeness_planted_gap_and_dup(spark):
    from database_migration_spark.operators.validate import bucket_completeness

    # keys 0..1999 minus {5, 17, 1003}, plus key 42 doubled
    keys = [k for k in range(2000) if k not in (5, 17, 1003)] + [42]
    df = spark.createDataFrame([(k,) for k in keys], "k BIGINT")
    rows = {r["bucket_start"]: r.asDict() for r in bucket_completeness(df, "k", 1000).collect()}

    assert set(rows) == {0, 1000}
    assert rows[0]["missing"] == 2 and rows[0]["duplicated"] == 1
    assert rows[1000]["missing"] == 1 and rows[1000]["duplicated"] == 0
    assert rows[0]["n_rows"] == 999 and rows[0]["n_keys"] == 998


def test_bucket_completeness_clips_span_edges(spark):
    from database_migration_spark.operators.validate import bucket_completeness

    # observed span 950..1049: neither edge bucket may report the
    # out-of-span head/tail as missing
    df = spark.createDataFrame([(k,) for k in range(950, 1050)], "k BIGINT")
    rows = {r["bucket_start"]: r.asDict() for r in bucket_completeness(df, "k", 1000).collect()}
    assert rows[0]["missing"] == 0 and rows[1000]["missing"] == 0


def test_bucket_completeness_negative_keys_floor_bucket(spark):
    from database_migration_spark.operators.validate import bucket_completeness

    df = spark.createDataFrame([(-1,), (-1000,), (0,)], "k BIGINT")
    rows = {r["bucket_start"]: r.asDict() for r in bucket_completeness(df, "k", 1000).collect()}
    # floor semantics: -1 belongs to bucket [-1000, -1], not [0, 999]
    assert set(rows) == {-1000, 0}
    assert rows[-1000]["n_keys"] == 2

    with pytest.raises(ValueError):
        bucket_completeness(df, "k", 0)


def test_missing_keys_drilldown_lists_exact_ids(spark):
    from database_migration_spark.operators.validate import missing_keys

    df = spark.createDataFrame(
        [(k,) for k in range(100, 120) if k not in (103, 111)], "k BIGINT"
    )
    got = sorted(r["missing_key"] for r in missing_keys(df, "k", 100, 119).collect())
    assert got == [103, 111]

    with pytest.raises(ValueError):
        missing_keys(df, "k", 10, 5)


def test_bucket_completeness_emits_entirely_missing_buckets(spark):
    """Review finding: a whole dropped extract chunk (one bucket with ZERO
    rows) must emit n_rows=0, missing=bucket_size — not vanish as an
    absent row a missing>0 consumer never sees."""
    from database_migration_spark.operators.validate import bucket_completeness

    keys = list(range(0, 1000)) + list(range(2000, 3000))  # bucket 1 gone
    df = spark.createDataFrame([(k,) for k in keys], "k BIGINT")
    rows = {r["bucket_start"]: r.asDict()
            for r in bucket_completeness(df, "k", 1000).collect()}
    assert set(rows) == {0, 1000, 2000}
    assert rows[1000]["n_rows"] == 0 and rows[1000]["missing"] == 1000
    assert rows[0]["missing"] == 0 and rows[2000]["missing"] == 0


def test_bucket_completeness_sparse_domain_raises(spark):
    from database_migration_spark.operators.validate import bucket_completeness

    df = spark.createDataFrame([(0,), (10**15,)], "k BIGINT")
    with pytest.raises(ValueError, match="too sparse"):
        bucket_completeness(df, "k", 1000)
    # sized to the domain it reports fine
    assert bucket_completeness(df, "k", 10**15, max_report_buckets=10).count() == 2
