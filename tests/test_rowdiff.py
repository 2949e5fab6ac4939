"""Row-level table diff (operators/rowdiff.py)."""

from pyspark.sql import functions as F

from database_migration_spark.operators.rowdiff import (
    changed_cells,
    diff_report,
    row_diff,
)


def _versions(spark):
    left = spark.createDataFrame(
        [
            (1, "A", 10.0, None),
            (2, "B", 20.0, "x"),
            (3, "C", 30.0, "y"),
            (4, "D", None, "z"),
            (5, "E", 50.0, "w"),
        ],
        "k long, s string, v double, t string",
    )
    right = spark.createDataFrame(
        [
            (1, "A", 10.0, None),      # unchanged (incl. NULL value)
            (2, "B2", 20.0, "x"),      # changed: s
            (3, "C", 30.5, None),      # changed: v and t (→ NULL)
            (5, "E", 50.0, "w"),       # unchanged; 4 removed
            (6, "F", 60.0, "q"),       # added
        ],
        "k long, s string, v double, t string",
    )
    return left, right


def test_row_diff_fates(spark):
    left, right = _versions(spark)
    fates = {r.k: r.diff_kind for r in row_diff(left, right, ["k"]).collect()}
    assert fates == {2: "changed", 3: "changed", 4: "removed", 6: "added"}
    # include_unchanged classifies every key
    all_f = {
        r.k: r.diff_kind
        for r in row_diff(left, right, ["k"], include_unchanged=True).collect()
    }
    assert all_f[1] == "unchanged" and all_f[5] == "unchanged"
    assert len(all_f) == 6


def test_changed_cells_attribution(spark):
    left, right = _versions(spark)
    d = row_diff(left, right, ["k"])
    cells = {
        (r.k, r.column_name): (r.left_value, r.right_value)
        for r in changed_cells(left, right, ["k"], d).collect()
    }
    assert cells == {
        (2, "s"): ("B", "B2"),
        (3, "v"): ("30.0", "30.5"),
        (3, "t"): ("y", None),
    }


def test_diff_report_counts(spark):
    left, right = _versions(spark)
    rows = {
        (r.diff_kind, r.column_name): r.n_rows
        for r in diff_report(left, right, ["k"]).collect()
    }
    assert rows == {
        ("added", None): 1,
        ("removed", None): 1,
        ("changed", None): 2,
        ("changed", "s"): 1,
        ("changed", "v"): 1,
        ("changed", "t"): 1,
    }


def test_canonical_rendering_unambiguous(spark):
    """Concatenation ambiguity ('ab'+'c' vs 'a'+'bc') and NULL-vs-sentinel
    must NOT hash equal — the length-prefixed rendering disambiguates."""
    left = spark.createDataFrame(
        [(1, "ab", "c"), (2, None, "x")], "k long, a string, b string"
    )
    right = spark.createDataFrame(
        [(1, "a", "bc"), (2, "N", "x")], "k long, a string, b string"
    )
    fates = {r.k: r.diff_kind for r in row_diff(left, right, ["k"]).collect()}
    assert fates == {1: "changed", 2: "changed"}


def test_compare_cols_subset_and_missing_column(spark):
    left, right = _versions(spark)
    # scoping the compare to s only: row 3's v/t changes are invisible
    fates = {
        r.k: r.diff_kind
        for r in row_diff(left, right, ["k"], compare_cols=["s"]).collect()
    }
    assert fates == {2: "changed", 4: "removed", 6: "added"}
    try:
        row_diff(left, right.drop("t"), ["k"])
        assert False, "expected ValueError"
    except ValueError as e:
        assert "t" in str(e)


def test_phase2_touches_only_changed_rows(spark):
    """The wide phase-2 join must be driven by the changed-key semi-join:
    added/removed keys never reach the cell comparison."""
    left, right = _versions(spark)
    d = row_diff(left, right, ["k"])
    ks = {r.k for r in changed_cells(left, right, ["k"], d).collect()}
    assert ks == {2, 3}


def test_null_keyed_changed_row_reaches_cells(spark):
    """Phase 1 matches NULL keys null-safely; phase 2's semi-joins must
    too, or a NULL-keyed changed row is counted in the fates but vanishes
    from the per-column cells."""
    left = spark.createDataFrame([(None, "a"), (1, "b")], "k long, s string")
    right = spark.createDataFrame([(None, "A"), (1, "b")], "k long, s string")
    d = row_diff(left, right, ["k"])
    fates = {r.k: r.diff_kind for r in d.collect()}
    assert fates == {None: "changed"}
    cells = changed_cells(left, right, ["k"], d).collect()
    assert len(cells) == 1
    assert (cells[0].k, cells[0].column_name) == (None, "s")
    assert (cells[0].left_value, cells[0].right_value) == ("a", "A")
    rep = {(r.diff_kind, r.column_name): r.n_rows
           for r in diff_report(left, right, ["k"]).collect()}
    assert rep[("changed", None)] == 1 and rep[("changed", "s")] == 1


def test_rowdiff_random_tables_match_python_reference(spark):
    """Property: for ANY pair of keyed tables (NULL values included), the
    hash-compare diff equals a literal Python dict comparison."""
    from hypothesis import given, settings, strategies as st

    vals = st.one_of(st.none(), st.sampled_from(["x", "y", ""]))
    side = st.dictionaries(
        st.integers(min_value=0, max_value=6),
        st.tuples(vals, vals),
        min_size=0,
        max_size=6,
    )

    @settings(max_examples=20, deadline=None)
    @given(l=side, r=side)
    def run(l, r):
        mk = lambda d: spark.createDataFrame(  # noqa: E731
            [(k, a, b) for k, (a, b) in d.items()] or [],
            "k long, a string, b string",
        )
        got = {
            row.k: row.diff_kind
            for row in row_diff(mk(l), mk(r), ["k"]).collect()
        }
        want = {}
        for k in set(l) | set(r):
            if k not in l:
                want[k] = "added"
            elif k not in r:
                want[k] = "removed"
            elif l[k] != r[k]:
                want[k] = "changed"
        assert got == want

    run()
