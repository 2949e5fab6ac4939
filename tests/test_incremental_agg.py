"""Incremental aggregate maintenance: merge-equals-rebuild invariants."""

from database_migration_spark.operators import incremental_agg as IA


def _rows(df):
    return {
        tuple(r[k] for k in ("g",)): r.asDict() for r in df.collect()
    }


def _mk(spark, data):
    return spark.createDataFrame(data, "g STRING, v DOUBLE")


def test_merge_equals_rebuild_and_is_associative(spark):
    full = [("a", 1.0), ("a", 2.5), ("b", -3.0), ("b", 7.0), ("c", 0.5)]
    df = _mk(spark, full)
    rebuild = _rows(IA.build_state(df, ["g"], ["v"]))

    # split three ways, merge in two different groupings
    p1, p2, p3 = _mk(spark, full[:2]), _mk(spark, full[2:4]), _mk(spark, full[4:])
    s1, s2, s3 = (IA.build_state(p, ["g"], ["v"]) for p in (p1, p2, p3))
    left_assoc = _rows(
        IA.merge_states([IA.merge_states([s1, s2], ["g"], ["v"]), s3], ["g"], ["v"])
    )
    right_assoc = _rows(
        IA.merge_states([s1, IA.merge_states([s2, s3], ["g"], ["v"])], ["g"], ["v"])
    )
    assert left_assoc == right_assoc == rebuild


def test_incremental_refresh_matches_full_recompute(spark):
    hist = _mk(spark, [("a", 1.0), ("b", 2.0), ("b", 4.0)])
    delta = _mk(spark, [("a", 9.0), ("c", 5.0)])
    state = IA.build_state(hist, ["g"], ["v"])
    refreshed = _rows(IA.incremental_refresh(state, delta, ["g"], ["v"]))
    rebuilt = _rows(IA.build_state(hist.unionByName(delta), ["g"], ["v"]))
    assert refreshed == rebuilt
    assert refreshed[("c",)]["n_rows"] == 1


def test_signed_retraction_subtracts_and_drops_empty_groups(spark):
    base = spark.createDataFrame(
        [("a", 1.0, 1), ("a", 2.0, 1), ("b", 5.0, 1)], "g STRING, v DOUBLE, sgn INT"
    )
    state = IA.build_state(base, ["g"], ["v"], signed=True, sign_col="sgn")
    # signed states carry no min/max (not retractable)
    assert "min_v" not in state.columns and "max_v" not in state.columns

    retract = spark.createDataFrame(
        [("a", 2.0, -1), ("b", 5.0, -1)], "g STRING, v DOUBLE, sgn INT"
    )
    merged = IA.incremental_refresh(
        state, retract, ["g"], ["v"], signed=True, sign_col="sgn"
    )
    rows = {r["g"]: r.asDict() for r in merged.collect()}
    # b fully retracted → group dropped, like a rebuild without those rows
    assert set(rows) == {"a"}
    assert rows["a"]["n_rows"] == 1
    assert float(rows["a"]["sum_v"]) == 1.0


def test_merge_states_requires_input_and_keeps_exact_sums(spark):
    import pytest

    with pytest.raises(ValueError):
        IA.merge_states([], ["g"], ["v"])

    # 0.1 is inexact in binary; DECIMAL accumulation must stay exact
    df = _mk(spark, [("a", 0.1)] * 10)
    full = IA.build_state(df, ["g"], ["v"]).collect()[0]
    assert str(full["sum_v"]) == "1.000000"


def test_distinct_sketches_merge_to_single_pass_estimates(spark):
    """HLL registers are element-wise maxima, so merging split states must
    estimate exactly what a single-pass build estimates — and at tiny
    cardinality the estimate is the exact distinct count."""
    from pyspark.sql import functions as F

    rows = [("a", float(i % 3), f"u{i % 5}") for i in range(50)] + [
        ("b", 1.0, f"u{i % 17}") for i in range(40)
    ]
    schema = "g STRING, v DOUBLE, user STRING"
    df = spark.createDataFrame(rows, schema)
    single = IA.read_summary(
        IA.build_state(df, ["g"], ["v"], distinct_cols=["user"]),
        ["v"], ["user"],
    )
    got = {r["g"]: r.asDict() for r in single.collect()}
    assert got[("a")]["approx_nd_user"] == 5
    assert got[("b")]["approx_nd_user"] == 17
    assert "hll_user" not in single.columns
    # avg derives exactly from the decimal partials
    assert str(got[("b")]["avg_v"]) == "1.000000"

    h1 = IA.build_state(
        spark.createDataFrame(rows[:30], schema), ["g"], ["v"], distinct_cols=["user"]
    )
    h2 = IA.build_state(
        spark.createDataFrame(rows[30:], schema), ["g"], ["v"], distinct_cols=["user"]
    )
    merged = IA.read_summary(
        IA.merge_states([h1, h2], ["g"], ["v"], ["user"]), ["v"], ["user"]
    )
    mgot = {r["g"]: r.asDict() for r in merged.collect()}
    assert {k: v["approx_nd_user"] for k, v in mgot.items()} == {
        k: v["approx_nd_user"] for k, v in got.items()
    }


def test_distinct_sketches_reject_signed_retraction(spark):
    import pytest

    df = spark.createDataFrame([("a", 1.0, 1)], "g STRING, v DOUBLE, sgn INT")
    with pytest.raises(ValueError):
        IA.build_state(df, ["g"], ["v"], signed=True, sign_col="sgn",
                       distinct_cols=["g"])


def test_backfill_groups_equals_rebuild(spark):
    """Correcting group 'b' from a fixed base must equal a full rebuild —
    including the group-vanishes case and NULL-key three-valued logic."""
    from pyspark.sql import functions as F

    schema = "g STRING, v DOUBLE"
    bad_base = _mk(spark, [("a", 1.0), ("b", 99.0), ("b", 99.0), (None, 7.0)])
    state = IA.build_state(bad_base, ["g"], ["v"])

    # corrected base: b's rows were wrong; one survives with a new value
    good_base = _mk(spark, [("a", 1.0), ("b", 3.5), (None, 7.0)])
    fixed = IA.backfill_groups(state, good_base, ["g"], ["v"], F.col("g") == "b")
    rebuilt = IA.build_state(good_base, ["g"], ["v"])
    assert _rows(fixed) == _rows(rebuilt)
    # NULL-key group: predicate NULL -> kept, not dropped
    assert (None,) in _rows(fixed)

    # full invalidation of a group that no longer exists in the base
    gone = IA.backfill_groups(state, _mk(spark, [("a", 1.0), (None, 7.0)]),
                              ["g"], ["v"], F.col("g") == "b")
    assert (("b",) not in _rows(gone)) and (("a",) in _rows(gone))


def test_random_splits_merge_to_rebuild(spark):
    """Property: ANY partition of the rows into delta batches, merged in
    ANY grouping, equals the single-pass rebuild — the algebraic-partials
    claim under hypothesis rather than one hand-picked split."""
    from hypothesis import given, settings, strategies as st

    rows = st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]),
                  st.integers(min_value=-5, max_value=9)),
        min_size=1, max_size=24,
    )

    @settings(max_examples=15, deadline=None)
    @given(data=rows, cut=st.integers(min_value=0, max_value=23))
    def run(data, cut):
        cut = min(cut, len(data))
        mk = lambda rs: spark.createDataFrame(
            [(g, float(x)) for g, x in rs] or [("_", 0.0)], "g STRING, v DOUBLE"
        ).where("g <> '_'" if not rs else "1=1")
        full = _rows(IA.build_state(mk(data), ["g"], ["v"]))
        parts = [p for p in (data[:cut], data[cut:]) if p]
        states = [IA.build_state(mk(p), ["g"], ["v"]) for p in parts]
        merged = _rows(IA.merge_states(states, ["g"], ["v"]))
        assert merged == full

    run()


def test_backfill_signed_state_and_shape_guard(spark):
    """Review finding: backfilling a SIGNED state from the signed CDC base
    must honor the sign column (a +1/-1 pair cancels, not double-counts),
    and mixing shapes (signed state, unsigned rebuild) raises instead of
    unioning NULL-padded half-schemas."""
    import pytest
    from pyspark.sql import functions as F

    schema = "g STRING, v DOUBLE, sgn INT"
    base = spark.createDataFrame(
        [("a", 1.0, 1), ("b", 5.0, 1), ("b", 5.0, -1), ("b", 2.0, 1)], schema
    )
    state = IA.build_state(base, ["g"], ["v"], signed=True, sign_col="sgn")
    fixed = IA.backfill_groups(
        state, base, ["g"], ["v"], F.col("g") == "b",
        signed=True, sign_col="sgn",
    )
    rows = {r["g"]: r.asDict() for r in fixed.collect()}
    assert rows["b"]["n_rows"] == 1 and str(rows["b"]["sum_v"]) == "2.000000"

    with pytest.raises(ValueError, match="different shapes"):
        IA.backfill_groups(state, base.drop("sgn"), ["g"], ["v"],
                           F.col("g") == "b")


def test_merge_states_rejects_mixed_minmax_shapes(spark):
    """Round-7 ADVICE fix: merging a plain state (min/max present) with a
    signed state (min/max absent) must raise, not NULL-pollute the merged
    min/max columns via allowMissingColumns padding."""
    import pytest

    from database_migration_spark.operators import incremental_agg as IA

    schema = "g STRING, v DOUBLE"
    plain = IA.build_state(
        spark.createDataFrame([("a", 1.0), ("a", 3.0)], schema), ["g"], ["v"]
    )
    signed_src = spark.createDataFrame([("a", 2.0, 1)], schema + ", sgn INT")
    no_minmax = IA.build_state(signed_src, ["g"], ["v"],
                               signed=True, sign_col="sgn")
    assert "min_v" in plain.columns and "min_v" not in no_minmax.columns
    with pytest.raises(ValueError, match="min_/max_"):
        IA.merge_states([plain, no_minmax], ["g"], ["v"])
    # uniform shapes still merge fine, both ways
    merged = IA.merge_states([plain, plain], ["g"], ["v"]).collect()[0]
    assert merged["n_rows"] == 4 and merged["min_v"] is not None
    merged = IA.merge_states([no_minmax, no_minmax], ["g"], ["v"]).collect()[0]
    assert merged["n_rows"] == 2
