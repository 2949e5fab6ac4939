"""Type-2 SCD merge: every row fate from one join, history untouched."""

from pyspark.sql import functions as F

from database_migration_spark.operators.scd2 import (
    as_of,
    scd2_bootstrap,
    scd2_merge,
)

DIM_SCHEMA = (
    "id BIGINT, seg STRING, valid_from BIGINT, valid_to BIGINT, "
    "is_current BOOLEAN"
)


def _dim(spark):
    return spark.createDataFrame(
        [
            (1, "A", 0, 50, False),   # closed history
            (1, "B", 50, None, True),  # open, will change
            (2, "C", 0, None, True),   # open, unchanged in batch
            (3, "D", 0, None, True),   # open, absent from batch
        ],
        DIM_SCHEMA,
    )


def _rows(df):
    return sorted(
        ((r.id, r.seg, r.valid_from, r.valid_to, r.is_current)
         for r in df.collect()),
        key=str,
    )


def test_scd2_merge_all_row_fates(spark):
    upd = spark.createDataFrame(
        [(1, "B2"), (2, "C"), (4, "E")], "id BIGINT, seg STRING"
    )
    out = scd2_merge(_dim(spark), upd, ["id"], ["seg"], 100)
    assert _rows(out) == sorted([
        (1, "A", 0, 50, False),      # history untouched
        (1, "B", 50, 100, False),    # changed: old version closed
        (1, "B2", 100, None, True),  # changed: new open version
        (2, "C", 0, None, True),     # unchanged: kept as-is
        (3, "D", 0, None, True),     # absent, close_missing=False: kept
        (4, "E", 100, None, True),   # new entity
    ], key=str)
    # as-of reads: before the batch, key 1 is still 'B'
    assert {(r.id, r.seg) for r in as_of(out, 75).collect()} == {
        (1, "B"), (2, "C"), (3, "D"),
    }
    assert {(r.id, r.seg) for r in as_of(out, 100).collect()} == {
        (1, "B2"), (2, "C"), (3, "D"), (4, "E"),
    }


def test_scd2_full_snapshot_closes_missing(spark):
    upd = spark.createDataFrame(
        [(1, "B"), (2, "C")], "id BIGINT, seg STRING"
    )
    out = scd2_merge(_dim(spark), upd, ["id"], ["seg"], 100,
                     close_missing=True)
    got = {t for t in _rows(out) if t[0] == 3}
    assert got == {(3, "D", 0, 100, False)}  # soft-deleted with history


def test_scd2_null_safe_attribute_compare(spark):
    dim = scd2_bootstrap(
        spark.createDataFrame([(1, None), (2, None)], "id BIGINT, seg STRING"),
        ["id"], ["seg"], 0,
    )
    upd = spark.createDataFrame([(1, None), (2, "X")], "id BIGINT, seg STRING")
    out = scd2_merge(dim, upd, ["id"], ["seg"], 7)
    rows = _rows(out)
    # NULL == NULL is unchanged; NULL -> 'X' is a real change
    assert (1, None, 0, None, True) in rows
    assert (2, None, 0, 7, False) in rows and (2, "X", 7, None, True) in rows


def test_scd2_join_computed_once_and_history_skips_it(spark):
    """Plan shape: the open-vs-batch join is persisted (multi-consumer
    rule — three fate projections consume it), so the optimized plan shows
    ONE Join and the union branches read the InMemoryRelation; closed
    history unions back around the join entirely."""
    upd = spark.createDataFrame([(1, "Z")], "id BIGINT, seg STRING")
    out = scd2_merge(_dim(spark), upd, ["id"], ["seg"], 100)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # all three fate branches read the persisted join (its cached plan
    # prints under each InMemoryRelation occurrence — the join never
    # executes per branch)
    assert plan.count("InMemoryRelation") == 3
    # the history branch unions back AROUND the join: the plan text
    # before the first cache read holds only the NOT is_current filter
    history_branch = plan.split("InMemoryRelation")[0]
    assert "Join" not in history_branch
    assert "NOT is_current" in history_branch
    # and the join input is the FILTERED open slice, not the whole dim
    cached = plan.split("InMemoryRelation")[1]
    assert "is_current#" in cached


def test_scd2_null_key_rows_survive(spark):
    """The join is eqNullSafe so NULL keys are legal — presence detection
    must not route through key nullness (a NULL-keyed row once vanished
    from every fate branch: silent data loss)."""
    from database_migration_spark.operators.scd2 import (
        scd2_bootstrap,
        scd2_merge,
    )

    cur = spark.createDataFrame(
        [(None, "A"), (1, "B")], "k long, seg string"
    )
    dim = scd2_bootstrap(cur, ["k"], ["seg"], 0)
    upd = spark.createDataFrame([(None, "A2")], "k long, seg string")
    out = {
        (r.k, r.seg, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_merge(dim, upd, ["k"], ["seg"], 1).collect()
    }
    # the NULL-keyed entity changed: closed old + new open version;
    # key 1 untouched
    assert out == {
        (None, "A", 0, 1, False),
        (None, "A2", 1, None, True),
        (1, "B", 0, None, True),
    }


def test_scd2_duplicate_key_batch_fails_loud(spark):
    """A batch with two rows per key would write duplicate open versions
    (silent corruption) — the uniqueness guard must raise instead."""
    import pytest

    from database_migration_spark.operators.scd2 import (
        scd2_bootstrap,
        scd2_merge,
    )

    cur = spark.createDataFrame([(1, "A")], "k long, seg string")
    dim = scd2_bootstrap(cur, ["k"], ["seg"], 0)
    upd = spark.createDataFrame(
        [(1, "B"), (1, "C")], "k long, seg string"
    )
    with pytest.raises(ValueError, match="multiple rows per key"):
        scd2_merge(dim, upd, ["k"], ["seg"], 1)


def test_scd2_random_sequences_match_python_reference(spark):
    """Property: ANY sequence of unique-keyed update batches merged via
    scd2_merge yields exactly the dimension a pure-Python SCD2 simulator
    produces — every version interval, every fate, every close."""
    from hypothesis import given, settings, strategies as st

    from database_migration_spark.operators.scd2 import (
        scd2_bootstrap,
        scd2_merge,
    )

    keys = st.integers(min_value=0, max_value=4)
    segs = st.sampled_from(["A", "B", "C"])
    batch = st.dictionaries(keys, segs, min_size=0, max_size=5)

    @settings(max_examples=25, deadline=None)
    @given(first=st.dictionaries(keys, segs, min_size=1, max_size=5),
           rest=st.lists(batch, min_size=1, max_size=3),
           close_missing=st.booleans())
    def run(first, rest, close_missing):
        # python reference: dict key -> list of [seg, from, to, current]
        hist: dict = {}
        for k, s in first.items():
            hist[k] = [[s, 0, None, True]]
        dim = scd2_bootstrap(
            spark.createDataFrame(list(first.items()), "k long, seg string"),
            ["k"], ["seg"], 0,
        )
        for ts, b in enumerate(rest, start=1):
            for k, s in b.items():
                if k not in hist:
                    hist[k] = [[s, ts, None, True]]
                    continue
                cur = next((v for v in hist[k] if v[3]), None)
                if cur is None:
                    # key re-appears after a close_missing soft delete:
                    # a fresh open version (resurrection with history)
                    hist[k].append([s, ts, None, True])
                elif cur[0] != s:
                    cur[2], cur[3] = ts, False
                    hist[k].append([s, ts, None, True])
            if close_missing:
                for k, versions in hist.items():
                    cur = next((v for v in versions if v[3]), None)
                    if cur is not None and k not in b:
                        cur[2], cur[3] = ts, False
            bdf = spark.createDataFrame(
                list(b.items()) or [], "k long, seg string"
            )
            dim = scd2_merge(dim, bdf, ["k"], ["seg"], ts,
                             close_missing=close_missing)
        got = {
            (r.k, r.seg, r.valid_from, r.valid_to, r.is_current)
            for r in dim.collect()
        }
        want = {
            (k, s, f, t, c)
            for k, versions in hist.items()
            for s, f, t, c in versions
        }
        assert got == want

    run()
