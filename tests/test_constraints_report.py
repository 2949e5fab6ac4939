"""Planted-violation tests for the constraint validation suite
(operators/constraints.pk_check / fk_check / constraint_report): the
counts must attribute every planted defect class correctly — duplicate
composite keys, NULL key parts, FK orphans, NULL FK values ignored per
SQL semantics — and a clean table must report zeros."""

from database_migration_spark.operators.constraints import (
    constraint_report,
    fk_check,
    pk_check,
)


def test_pk_check_counts_dups_and_nulls(spark):
    rows = [
        (1, 10), (2, 20),
        (2, 20),            # exact duplicate key tuple
        (3, None),          # NULL key part
        (None, 40),         # NULL key part
        (3, 30),
    ]
    df = spark.createDataFrame(rows, "a long, b long")
    r = pk_check(df, "t", "T_PK", ["a", "b"]).collect()[0]
    # 6 rows; distinct fully-non-null tuples: (1,10),(2,20),(3,30) = 3;
    # n_bad = 1 dup excess + 2 null rows = 3
    assert (r.table_name, r.constraint_name, r.kind) == ("t", "T_PK", "PK")
    assert (r.n_rows, r.n_distinct, r.n_bad) == (6, 3, 3)


def test_fk_check_counts_orphans_ignores_nulls(spark):
    child = spark.createDataFrame(
        [(1,), (1,), (2,), (99,), (None,)], "fk long"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    r = fk_check(child, parent, "c", "C_FK_P", "fk", "pk").collect()[0]
    # NULL FK ignored: 4 non-null rows, 3 distinct values, 1 orphan row
    assert (r.kind, r.n_rows, r.n_distinct, r.n_bad) == ("FK", 4, 3, 1)


def test_constraint_report_assembles_catalog(spark):
    t1 = spark.createDataFrame([(1, 5), (2, 5), (2, 7)], "id long, ref long")
    t2 = spark.createDataFrame([(5,), (6,)], "id long")
    pk_rows = [
        {"table_name": "t1", "constraint_name": "T1_PK", "column_name": "id",
         "column_position": 1},
        {"table_name": "t2", "constraint_name": "T2_PK", "column_name": "id",
         "column_position": 1},
        # declared for a table not loaded: skipped, not an error
        {"table_name": "zz", "constraint_name": "ZZ_PK", "column_name": "x",
         "column_position": 1},
    ]
    fk_rows = [
        {"table_name": "t1", "fk_name": "T1_FK_T2", "fk_column": "ref",
         "ref_table": "t2", "ref_column": "id", "col_position": 1},
    ]
    rep = {
        (r.table_name, r.constraint_name): (r.kind, r.n_rows, r.n_distinct, r.n_bad)
        for r in constraint_report(
            {"t1": t1, "t2": t2}, pk_rows, fk_rows
        ).collect()
    }
    assert rep == {
        ("t1", "T1_PK"): ("PK", 3, 2, 1),          # duplicate id=2
        ("t2", "T2_PK"): ("PK", 2, 2, 0),          # clean
        ("t1", "T1_FK_T2"): ("FK", 3, 2, 1),       # ref=7 is an orphan
    }


def test_constraint_report_rejects_empty_catalog_match(spark):
    import pytest

    t1 = spark.createDataFrame([(1,)], "id long")
    pk_rows = [
        {"table_name": "OTHER", "constraint_name": "X_PK", "column_name": "id",
         "column_position": 1},
    ]
    with pytest.raises(ValueError, match="no catalog PK/FK row"):
        constraint_report({"t1": t1}, pk_rows, [])
