"""Type-inference optimizer tests (convert_varchar / convert_datatypes)."""

import pytest
from pyspark.sql import functions as F

from database_migration_spark.operators.optimize_types import (
    TypeProposal,
    classify_varchar,
    double_scale_detect,
    estimate_varchar_length,
    harmonize_fk_groups,
    probe_date_formats,
    propose_double_conversion,
    propose_varchar_conversion,
    timestamp_has_time,
)


@pytest.fixture(scope="module")
def str_df(spark):
    rows = [
        ("1",), ("42",), ("-7",),
    ]
    return spark.createDataFrame(rows, "v STRING")


def test_all_int_column_proposed_decimal(spark, str_df):
    stats = classify_varchar(str_df, "v")
    p = propose_varchar_conversion("v", stats)
    assert p and p.proposed_type == "DECIMAL(2,0)"


def test_leading_zero_ids_stay_text(spark):
    df = spark.createDataFrame([("007",), ("042",), ("123",)], "v STRING")
    p = propose_varchar_conversion("v", classify_varchar(df, "v"), declared_len=2_000_000)
    # id-like: must NOT become numeric; shrink instead
    assert p is None or p.proposed_type.startswith("VARCHAR")


def test_mixed_numeric_proposes_decimal_with_scale(spark):
    df = spark.createDataFrame([("1.25",), ("3",), ("-0.5",)], "v STRING")
    p = propose_varchar_conversion("v", classify_varchar(df, "v"))
    assert p and p.proposed_type == "DECIMAL(3,2)"


def test_date_probe_and_ambiguity(spark):
    ok = spark.createDataFrame([("2024-01-02",), ("2023-12-31",)], "v STRING")
    pr = probe_date_formats(ok, "v")
    assert "yyyy-MM-dd" in pr["winners"] and not pr["ambiguous"]
    p = propose_varchar_conversion("v", classify_varchar(ok, "v"), probe=pr)
    assert p and p.proposed_type == "DATE"

    # day <= 12 everywhere: both dd/MM and MM/dd match -> ambiguous, no convert
    amb = spark.createDataFrame([("01/02/2024",), ("03/04/2024",)], "v STRING")
    pra = probe_date_formats(amb, "v")
    assert pra["ambiguous"]
    assert propose_varchar_conversion("v", classify_varchar(amb, "v"), probe=pra) is None


def test_bool_detection(spark):
    df = spark.createDataFrame([("true",), ("FALSE",), ("t",)], "v STRING")
    p = propose_varchar_conversion("v", classify_varchar(df, "v"))
    assert p and p.proposed_type == "BOOLEAN"


def test_varchar_shrink(spark):
    df = spark.createDataFrame([("abc",), ("defghij",)], "v STRING")
    p = propose_varchar_conversion("v", classify_varchar(df, "v"), declared_len=2_000_000)
    assert p and p.proposed_type == "VARCHAR(10)"
    assert estimate_varchar_length(95) == 120


def test_double_scale_detection(spark):
    df = spark.createDataFrame([(1.25,), (2.5,), (3.0,)], "v DOUBLE")
    det = double_scale_detect(df, "v")
    assert det["lossless_scale"] == 2
    p = propose_double_conversion("v", det)
    assert p and p.proposed_type == "DECIMAL(3,2)"


def test_double_with_full_precision_not_converted(spark):
    import math

    df = spark.createDataFrame([(math.pi,), (math.e,)], "v DOUBLE")
    det = double_scale_detect(df, "v")
    assert det["lossless_scale"] is None
    assert propose_double_conversion("v", det) is None


def test_timestamp_has_time(spark, sf_smoke):
    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    midnightified = orders.withColumn(
        "o_orderdate", F.date_trunc("day", F.col("o_orderdate"))
    )
    assert not timestamp_has_time(midnightified, "o_orderdate")


def test_fk_harmonization_union_find():
    a, b, c, d = ("t1", "x"), ("t2", "x"), ("t3", "y"), ("t4", "z")
    props = {
        a: TypeProposal("x", "varchar", "DECIMAL(5,0)", "", ""),
        b: TypeProposal("x", "varchar", "DECIMAL(7,0)", "", ""),  # disagrees
        c: TypeProposal("y", "varchar", "DATE", "", ""),
        d: TypeProposal("z", "varchar", "BOOLEAN", "", ""),
    }
    out = harmonize_fk_groups(props, [(a, b)])
    assert out[a] is None and out[b] is None  # group dropped on disagreement
    assert out[c] is not None and out[d] is not None  # untouched singletons

    props[b] = TypeProposal("x", "varchar", "DECIMAL(5,0)", "", "")
    out2 = harmonize_fk_groups(props, [(a, b)])
    assert out2[a] is not None and out2[b] is not None  # agreement kept


def test_interval_classification_and_proposals(spark):
    """IS_DSINTERVAL / IS_YMINTERVAL branches (convert_varchar.sql:445-456):
    uniform interval-shaped text proposes the matching INTERVAL type."""
    from database_migration_spark.operators.optimize_types import (
        classify_varchar,
        propose_varchar_conversion,
    )

    ds = spark.createDataFrame(
        [("0 00:00:01",), ("5 12:30:45.250000",), ("-2 23:59:59",)], "v STRING"
    )
    stats = classify_varchar(ds, "v")
    assert stats["n_dsint"] == 3
    p = propose_varchar_conversion("v", stats)
    assert p.proposed_type == "INTERVAL DAY TO SECOND"

    ym = spark.createDataFrame([("3-11",), ("0-1",), ("-2-6",)], "v STRING")
    stats = classify_varchar(ym, "v")
    assert stats["n_ymint"] == 3
    p = propose_varchar_conversion("v", stats)
    assert p.proposed_type == "INTERVAL YEAR TO MONTH"

    # mixed shapes never propose an interval
    mixed = spark.createDataFrame([("3-11",), ("hello",)], "v STRING")
    assert propose_varchar_conversion("v", classify_varchar(mixed, "v")) is None


def test_interval_ranges_reject_uncastable_values(spark):
    """Range-checked interval shapes: values Spark's interval CAST rejects
    must not classify as intervals (a lossless proposal must never fail at
    apply time)."""
    from database_migration_spark.operators.optimize_types import classify_varchar

    bad = spark.createDataFrame(
        [("0 99:00:00",), ("1 10:75:00",), ("3-25",)], "v STRING"
    )
    stats = classify_varchar(bad, "v")
    assert stats["n_dsint"] == 0 and stats["n_ymint"] == 0


def test_veto_out_of_scope_fk_partner():
    """Round-7 guard: a conversion whose FK partner table was not scanned
    is vetoed (one-sided ALTER breaks the pair); a partner column that is
    merely tight-typed (absent from proposals) on a SCANNED table does
    not veto."""
    from database_migration_spark.operators.optimize_types import (
        TypeProposal,
        veto_out_of_scope_fk,
    )

    p = TypeProposal("fid", "varchar", "DECIMAL(9,0)",
                     'CAST("fid" AS DECIMAL(9,0))', "all values integer")
    proposals = {("child", "fid"): p, ("child", "note"): None}
    edges = [(("child", "fid"), ("parent", "pid"))]

    # parent not scanned: veto
    out, vetoed = veto_out_of_scope_fk(proposals, edges, {"child"})
    assert out[("child", "fid")] is None
    assert vetoed == {("child", "fid")}
    # parent scanned (its pid simply wasn't a candidate type): no veto —
    # the harmonizer owns that disagreement
    out, vetoed = veto_out_of_scope_fk(proposals, edges, {"child", "parent"})
    assert out[("child", "fid")] is p and not vetoed
    # inputs are not mutated
    assert proposals[("child", "fid")] is p
