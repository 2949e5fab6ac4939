"""Exasol value-semantics transform tests."""

import math

from database_migration_spark.operators.semantics import (
    apply_exasol_semantics,
    clamp_temporals,
    empty_string_to_null,
    nonfinite_to_null,
    rtrim_chars,
)


def test_empty_string_to_null(spark):
    df = spark.createDataFrame([("", "x"), ("a", "")], "a STRING, b STRING")
    out = empty_string_to_null(df).collect()
    assert out[0].a is None and out[0].b == "x"
    assert out[1].a == "a" and out[1].b is None


def test_nonfinite_to_null(spark):
    df = spark.createDataFrame(
        [(1.5,), (float("nan"),), (float("inf",),), (float("-inf"),)], "v DOUBLE"
    )
    vals = [r.v for r in nonfinite_to_null(df).collect()]
    assert vals[0] == 1.5 and vals[1:] == [None, None, None]


def test_clamp_temporals(spark):
    df = spark.createDataFrame(
        [("1995-05-05 12:00:00",)], "s STRING"
    ).selectExpr("CAST(s AS TIMESTAMP) AS ts")
    out = clamp_temporals(df).collect()[0]
    assert str(out.ts).startswith("1995-05-05")


def test_rtrim_and_bundle(spark):
    df = spark.createDataFrame(
        [("ab   ", "", float("nan"))], "a STRING, b STRING, v DOUBLE"
    )
    out = apply_exasol_semantics(rtrim_chars(df)).collect()[0]
    assert out.a == "ab" and out.b is None and (out.v is None or math.isnan(out.v) is False)
