"""Privacy audit/enforcement (operators/privacy.py): the k/l statistics
against hand-computed classes, NULL as a quasi-identifier VALUE (audited
and suppressed as a class, never silently dropped by the re-attach
join), and the suppression floor."""

import pytest

from database_migration_spark.operators.privacy import (
    equivalence_classes,
    k_anonymity_report,
    suppress_below_k,
)


def _frame(spark):
    # classes by (region, band):
    #   ("e", 1): 6 rows, sens values {a, b}        -> safe at k=5, l=2
    #   ("e", 2): 3 rows, sens values {a}           -> below k, l=1
    #   ("w", 1): 2 rows, sens values {a, NULL}     -> below k, l=2
    #   (NULL,3): 5 rows, sens values {a,b,c,d,e}   -> safe, NULL-keyed
    rows = (
        [("e", 1, "a")] * 3 + [("e", 1, "b")] * 3
        + [("e", 2, "a")] * 3
        + [("w", 1, "a"), ("w", 1, None)]
        + [(None, 3, s) for s in "abcde"]
    )
    return spark.createDataFrame(
        rows, "region STRING, band LONG, sens STRING"
    )


def test_report_statistics_hand_computed(spark):
    rep = k_anonymity_report(
        _frame(spark), ["region", "band"], "sens",
        k_threshold=5, l_threshold=2,
    ).collect()[0]
    assert rep.n_rows == 16 and rep.n_classes == 4
    assert rep.k_min == 2
    assert rep.classes_below_k == 2 and rep.rows_below_k == 5
    assert rep.rows_below_k_ppm == 5 * 1_000_000 // 16
    # l-diversity: NULL sensitive counts as one more answer ((w,1) has
    # l=2); the homogeneous class ("e",2) drives l_min and rows_below_l
    assert rep.l_min == 1 and rep.rows_below_l == 3


def test_null_qi_class_is_a_class(spark):
    cls = {
        (r.region, r.band): r.class_size
        for r in equivalence_classes(
            _frame(spark), ["region", "band"]
        ).collect()
    }
    assert cls[(None, 3)] == 5  # NULL keys group, not vanish


def test_suppression_floor_and_null_safety(spark):
    out = suppress_below_k(_frame(spark), ["region", "band"], 5)
    got = [(r.region, r.band, r.class_size) for r in out.collect()]
    # exactly the two >=5 classes survive — INCLUDING the NULL-keyed one
    # (a plain equi-join would have dropped it regardless of size)
    assert len(got) == 11
    assert all(size >= 5 for _, _, size in got)
    assert sum(1 for rg, b, _ in got if rg is None and b == 3) == 5
    assert sum(1 for rg, b, _ in got if rg == "e" and b == 1) == 6
    # k=1 keeps everything; columns = input + class_size
    all_kept = suppress_below_k(_frame(spark), ["region", "band"], 1)
    assert all_kept.count() == 16
    assert all_kept.columns == ["region", "band", "sens", "class_size"]


def test_validation_raises(spark):
    df = _frame(spark)
    with pytest.raises(ValueError, match="at least one"):
        k_anonymity_report(df, [])
    with pytest.raises(ValueError, match="nope"):
        k_anonymity_report(df, ["region", "nope"])
    with pytest.raises(ValueError, match="sensitive"):
        k_anonymity_report(df, ["region"], "missing_col")
    with pytest.raises(ValueError, match=">= 1"):
        suppress_below_k(df, ["region"], 0)


def test_report_without_sensitive_column(spark):
    rep = k_anonymity_report(
        _frame(spark), ["region", "band"], k_threshold=3
    )
    assert "l_min" not in rep.columns
    row = rep.collect()[0]
    assert row.k_min == 2 and row.rows_below_k == 2


def test_l_diversity_enforcement(spark):
    """The audit's rows_below_l acted on: a large homogeneous class
    passes every k and still leaks — with sensitive_col, suppression
    drops it too."""
    df = _frame(spark)
    # k=2 alone keeps ("e",2): 3 rows, homogeneous (l=1)
    k_only = suppress_below_k(df, ["region", "band"], 2)
    assert k_only.where("region = 'e' AND band = 2").count() == 3
    # adding l=2 suppresses exactly that class; (w,1) keeps (l=2 via
    # the NULL answer), the others keep
    both = suppress_below_k(
        df, ["region", "band"], 2, sensitive_col="sens", l_threshold=2
    )
    got = [(r.region, r.band) for r in both.collect()]
    assert ("e", 2) not in got
    assert sum(1 for rg, b in got if rg == "w" and b == 1) == 2
    assert len(got) == 13  # 16 - the 3-row homogeneous class
    with pytest.raises(ValueError, match="l_threshold"):
        suppress_below_k(df, ["region"], 2, "sens", 0)


def test_empty_table_audit_is_zero_not_null(spark):
    # SQL sums aggregate to NULL over zero rows; the gate's
    # `rows_below_k > 0` must see 0, and the ppm must not divide by
    # zero (review finding). k_min/l_min honestly stay NULL.
    empty = _frame(spark).where("1 = 0")
    row = k_anonymity_report(empty, ["region", "band"], "sens").collect()[0]
    assert row.n_rows == 0 and row.n_classes == 0
    assert row.rows_below_k == 0 and row.rows_below_k_ppm == 0
    assert row.rows_below_l == 0
    assert row.k_min is None and row.l_min is None


def test_generalization_advisor_hand_computed_curve(spark):
    """The suppression cost curve, verified against a hand computation:
    one QI region column plus an integer value coarsened at widths 10
    and 100. Negative values must band with FLOOR semantics (a
    truncating div merges [-10,-1) into band 0)."""
    from database_migration_spark.operators.privacy import (
        generalization_advisor,
    )

    # region A: values 0..9 spread across 10-wide bands (each singleton
    # at width 10, one class of 10 at width 100); region B: five rows
    # at -5 (band -1 at width 10, band -1 at width 100)
    rows = [("A", v) for v in range(0, 100, 10)] + [("B", -5)] * 5
    df = spark.createDataFrame(rows, "region STRING, x LONG")
    curve = {
        r.width: r
        for r in generalization_advisor(
            df, ["region"], "x", widths=[10, 100], k_threshold=5
        ).collect()
    }
    w10 = curve[10]
    # width 10: A has 10 singleton classes (below k), B one class of 5
    assert (w10.n_rows, w10.n_classes, w10.k_min) == (15, 11, 1)
    assert (w10.classes_below_k, w10.rows_below_k) == (10, 10)
    assert w10.rows_below_k_ppm == 10 * 1_000_000 // 15
    assert w10.meets_k == 0
    w100 = curve[100]
    # width 100: A collapses to one class of 10, B stays a class of 5
    assert (w100.n_rows, w100.n_classes, w100.k_min) == (15, 2, 5)
    assert (w100.classes_below_k, w100.rows_below_k) == (0, 0)
    assert w100.rows_below_k_ppm == 0 and w100.meets_k == 1

    # floor semantics on the negative band: -5 div 10 is band -1, not 0
    # (it must NOT merge with region-A's 0..9 even if regions matched)
    neg = spark.createDataFrame(
        [("A", -5), ("A", 5)], "region STRING, x LONG"
    )
    got = generalization_advisor(
        neg, ["region"], "x", widths=[10], k_threshold=2
    ).collect()[0]
    assert got.n_classes == 2  # bands -1 and 0, never merged

    # NULL x is a class value, not a dropped row
    withnull = spark.createDataFrame(
        [("A", None)] * 5 + [("A", 1)], "region STRING, x LONG"
    )
    got = generalization_advisor(
        withnull, ["region"], "x", widths=[10], k_threshold=5
    ).collect()[0]
    assert (got.n_rows, got.n_classes) == (6, 2)
    assert (got.classes_below_k, got.rows_below_k) == (1, 1)


def test_generalization_advisor_validation(spark):
    import pytest

    from database_migration_spark.operators.privacy import (
        generalization_advisor,
    )

    df = spark.createDataFrame(
        [("A", 1, 1.5)], "region STRING, x LONG, f DOUBLE"
    )
    with pytest.raises(ValueError, match="distinct integers"):
        generalization_advisor(df, ["region"], "x", widths=[])
    with pytest.raises(ValueError, match="distinct integers"):
        generalization_advisor(df, ["region"], "x", widths=[10, 10])
    with pytest.raises(ValueError, match="integer unit"):
        generalization_advisor(df, ["region"], "f", widths=[10])
    with pytest.raises(ValueError, match="must not also appear"):
        generalization_advisor(df, ["x"], "x", widths=[10])
    with pytest.raises(ValueError, match="k_threshold"):
        generalization_advisor(df, ["region"], "x", widths=[10],
                               k_threshold=0)
