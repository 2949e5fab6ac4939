"""Validation engine tests: a faithful copy yields zero DEVIATION rows; a
corrupted copy is caught (the reference's CHECK_MIGRATION self-validation,
mysql_to_exasol.sql:249-318)."""

from pyspark.sql import functions as F

from database_migration_spark.operators.validate import (
    compare_metrics,
    compute_metrics,
    mode_metric,
)


def test_identity_migration_zero_deviations(spark, sf_smoke):
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
    ours = compute_metrics(li, "lineitem")
    theirs = compute_metrics(li.select(*li.columns), "lineitem")
    cmp = compare_metrics(ours, theirs)
    assert cmp.filter(F.col("status") == "DEVIATION").count() == 0
    assert cmp.count() > 0


def test_corruption_detected(spark, sf_smoke):
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
    corrupted = li.withColumn("l_quantity", F.col("l_quantity") * 2)
    cmp = compare_metrics(
        compute_metrics(li, "lineitem"), compute_metrics(corrupted, "lineitem")
    )
    dev = cmp.filter(F.col("status") == "DEVIATION").collect()
    assert len(dev) > 0
    assert any(r.column_name == "l_quantity" for r in dev)


def test_row_count_metric(spark, sf_smoke):
    nat = spark.read.parquet(f"{sf_smoke}/nation.parquet")
    m = compute_metrics(nat, "nation")
    row_cnt = m.filter(F.col("metric") == "ROW_CNT").collect()[0]
    assert row_cnt.value == "25"


def test_null_count_and_lengths(spark, sf_smoke):
    nat = spark.read.parquet(f"{sf_smoke}/nation.parquet")
    m = {(r.metric, r.column_name): r.value for r in compute_metrics(nat, "nation").collect()}
    assert m[("NULL_CNT", "n_name")] == "0"
    assert int(m[("MAX_LEN", "n_name")]) >= int(m[("MIN_LEN", "n_name")])
    assert m[("DISTINCT_CNT", "n_nationkey")] == "25"


def test_mode_metric(spark, sf_smoke):
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
    row = mode_metric(li, "l_returnflag").collect()[0]
    assert row.occurrences > 0
    assert row.mode_values  # non-empty


def test_suggest_foreign_key_classification(spark):
    """FK candidacy: zero orphans into a unique parent — NULL child values
    are ignored (SQL FK semantics), orphans or duplicate parents reject."""
    from database_migration_spark.operators.constraints import suggest_foreign_key

    child = spark.createDataFrame(
        [(1,), (2,), (2,), (None,)], "ref BIGINT"
    )
    parent_ok = spark.createDataFrame([(1,), (2,), (3,)], "id BIGINT")
    parent_dup = spark.createDataFrame([(1,), (2,), (2,), (3,)], "id BIGINT")
    parent_missing = spark.createDataFrame([(1,), (3,)], "id BIGINT")

    ok = suggest_foreign_key(child, "ref", parent_ok, "id").collect()[0]
    assert ok.is_candidate and ok.n_orphans == 0
    assert ok.n_child_nonnull == 3 and ok.n_child_rows == 4  # NULL ignored

    dup = suggest_foreign_key(child, "ref", parent_dup, "id").collect()[0]
    assert not dup.is_candidate and dup.n_orphans == 0  # parent not unique

    miss = suggest_foreign_key(child, "ref", parent_missing, "id").collect()[0]
    assert not miss.is_candidate and miss.n_orphans == 2  # both ref=2 rows
