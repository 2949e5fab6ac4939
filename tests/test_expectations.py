"""Planted-violation tests for the declarative expectations suite: each
rule kind must FAIL exactly on its planted defect with the right measured
count, and the whole suite must compile to ONE scan."""

from pyspark.sql import functions as F

from database_migration_spark.operators.expectations import (
    Expectation as E,
    run_expectations,
)


def _df(spark):
    rows = [
        (1, 10, "A", "ok"),
        (2, 10, "A", "ok"),      # dup id with row 3
        (2, 999, "B", "ok"),     # out of range + bad value
        (3, None, "A", "ok"),    # NULL in range-checked col
        (4, 10, "A", "??"),      # regex miss
    ]
    return spark.createDataFrame(
        rows, "id LONG, qty LONG, flag STRING, note STRING"
    )


RULES = [
    E("r1_unique", "unique", "id", {"columns": ["id"]}),
    E("r2_range", "in_range", "qty", {"lo": 0, "hi": 100}),
    E("r3_vals", "accepted_values", "flag", {"values": ["A"]}),
    E("r4_notnull", "not_null", "qty"),
    E("r5_rows", "row_count_between", "", {"lo": 1, "hi": 4}),
    E("r6_regex", "matches_regex", "note",
      {"pattern": "^ok$", "min_ppm": 900_000}),
]


def test_each_kind_fails_on_its_planted_defect(spark):
    got = {r.rule_id: (r.measured, r.status)
           for r in run_expectations(_df(spark), RULES).collect()}
    assert got == {
        "r1_unique": (1, "FAIL"),     # one duplicate id
        "r2_range": (2, "FAIL"),      # 999 and NULL
        "r3_vals": (1, "FAIL"),       # the B row
        "r4_notnull": (1, "FAIL"),
        "r5_rows": (5, "FAIL"),       # 5 rows > hi=4
        "r6_regex": (800_000, "FAIL"),  # 4/5 = exactly 800000 ppm
    }


def test_clean_data_passes_and_tolerances_apply(spark):
    clean = spark.createDataFrame(
        [(i, 10, "A", "ok") for i in range(4)],
        "id LONG, qty LONG, flag STRING, note STRING",
    )
    got = {r.rule_id: r.status
           for r in run_expectations(clean, RULES).collect()}
    assert set(got.values()) == {"PASS"}

    # max_violations tolerance turns a 1-violation FAIL into PASS
    tol = [E("r", "accepted_values", "flag",
             {"values": ["A"], "max_violations": 1})]
    bad = clean.union(spark.createDataFrame(
        [(9, 10, "B", "ok")], clean.schema))
    assert run_expectations(bad, tol).collect()[0].status == "PASS"


def test_pruned_two_sided_plan(spark, sf_smoke):
    """The suite compiles to at most two aggregates (plain + distinct),
    EACH scanning only its own rules' columns — no scan reads the full
    11-column lineitem row for a 6-rule suite."""
    import contextlib
    import io

    from database_migration_spark.queries import QUERIES

    df = QUERIES["expectations_lineitem"](spark, sf_smoke)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    import re

    n_scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert n_scans <= 2
    # pruning: columns no rule touches never leave the parquet footer
    for untouched in ("l_extendedprice", "l_discount", "l_tax", "l_partkey"):
        assert untouched not in plan
    # the distinct side reads ONLY the uniqueness key
    schemas = [seg[:200] for seg in plan.split("ReadSchema:")[1:]]
    assert any(
        "l_orderkey" in sch and "l_quantity" not in sch for sch in schemas
    )


def test_unique_only_rules_and_empty_table_semantics(spark):
    """A unique-only rule file (the canonical dbt PK test) must run; regex
    rules on an EMPTY table pass vacuously; duplicate/invalid rule_ids are
    clean errors."""
    import pytest

    df = _df(spark)
    only_unique = [E("pk", "unique", "id", {"columns": ["id"]})]
    rows = run_expectations(df, only_unique).collect()
    assert [(r.rule_id, r.measured, r.status)
            for r in rows] == [("pk", 1, "FAIL")]

    empty = df.limit(0)
    got = {r.rule_id: (r.measured, r.status)
           for r in run_expectations(empty, RULES).collect()}
    assert got["r6_regex"] == (1_000_000, "PASS")  # vacuous share
    assert got["r1_unique"] == (0, "PASS")
    assert got["r5_rows"] == (0, "FAIL")  # lo=1 still binds

    with pytest.raises(ValueError, match="duplicate rule_id"):
        run_expectations(df, [RULES[0], RULES[0]])
    with pytest.raises(ValueError, match="rule_id must be"):
        run_expectations(df, [E("bad`id", "not_null", "qty")])
    with pytest.raises(ValueError, match="non-empty"):
        run_expectations(df, [])
