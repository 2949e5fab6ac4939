"""r12 W17: opt-in build-scalar memos on the five guard/bounds probes.

Every flag defaults OFF (live probe) because the operators normally run
against mutable stores, and driver-local literal relations canonicalize
WITHOUT their data (two different literal rows render the same
``LogicalRDD`` canonical string) — so the tests here use file-backed
inputs for the memo-on arms, exactly the contract the docstrings state.
"""

import pytest
from pyspark.sql import functions as F

from database_migration_spark.functions import parallel as P


@pytest.fixture()
def pq(spark, tmp_path):
    """Write a tiny file-backed relation (memo keys are plan-text-based,
    so memo-on arms need data reachable through the plan)."""

    def make(name, rows, schema):
        path = str(tmp_path / name)
        spark.createDataFrame(rows, schema).write.parquet(path)
        return spark.read.parquet(path)

    return make


def test_memo_collect_caches_and_keys_on_plan(spark, pq):
    df = pq("mc", [(1, "a"), (2, "b")], "id long, s string")
    probe = df.where(F.col("id") > 1).limit(5)
    n0 = len(P._COLLECT_MEMO)
    r1 = P.memo_collect(probe)
    assert len(P._COLLECT_MEMO) == n0 + 1
    # cached: the second call hits the same entry but returns a COPY (an
    # in-place caller mutation must never corrupt the cache)
    r2 = P.memo_collect(df.where(F.col("id") > 1).limit(5))
    assert len(P._COLLECT_MEMO) == n0 + 1
    assert r2 == r1 and r2 is not r1 and [x["s"] for x in r1] == ["b"]
    r2.pop()
    assert P.memo_collect(probe) == r1
    # a different plan over the same input must NOT collide
    r3 = P.memo_collect(df.where(F.col("id") > 99).limit(5))
    assert r3 == []


def test_watermark_memo_matches_live(spark, pq):
    from database_migration_spark.operators.delta_sync import watermark

    t = pq("wm", [(1, 10), (2, 30), (3, 20)], "k long, d long")
    assert watermark(t, "d") == watermark(t, "d", memo=True) == 30


def test_cdc_guards_still_raise_under_memo(spark, pq):
    from database_migration_spark.operators.cdc import net_changes

    bad_op = pq("cdc_bad", [(1, 1, "Z", "x")], "k long, seq long, op string, v string")
    with pytest.raises(ValueError, match="unknown CDC op"):
        net_changes(bad_op, ["k"], memo_guards=True)
    dup = pq(
        "cdc_dup",
        [(1, 1, "I", "x"), (1, 1, "U", "y")],
        "k long, seq long, op string, v string",
    )
    with pytest.raises(ValueError, match="multiple events"):
        net_changes(dup, ["k"], memo_guards=True)
    # clean stream: memo arm == live arm
    ok = pq(
        "cdc_ok",
        [(1, 1, "I", "x"), (1, 2, "U", "y")],
        "k long, seq long, op string, v string",
    )
    live = {tuple(r) for r in net_changes(ok, ["k"]).collect()}
    memo = {tuple(r) for r in net_changes(ok, ["k"], memo_guards=True).collect()}
    assert live == memo == {(1, 2, "U", "y")}


def test_scd2_dup_guard_still_raises_under_memo(spark, pq):
    from database_migration_spark.operators.scd2 import scd2_bootstrap, scd2_merge

    cur = pq("scd_cur", [(1, "A")], "k long, seg string")
    dim = scd2_bootstrap(cur, ["k"], ["seg"], 0)
    dup = pq("scd_dup", [(1, "B"), (1, "C")], "k long, seg string")
    with pytest.raises(ValueError, match="multiple rows per key"):
        scd2_merge(dim, dup, ["k"], ["seg"], 1, memo_guards=True)


def test_bucket_completeness_memo_span_identical(spark, pq):
    from database_migration_spark.operators.validate import bucket_completeness

    df = pq("bc", [(i,) for i in (1, 2, 3, 1001, 3005)], "k long")
    live = sorted(tuple(r) for r in bucket_completeness(df, "k", 1000).collect())
    memo = sorted(
        tuple(r)
        for r in bucket_completeness(df, "k", 1000, memo_span=True).collect()
    )
    assert live == memo and len(live) == 4  # buckets 0,1,2,3 (one empty)


def test_column_bounds_memo_identical_and_null_raise(spark, pq):
    from database_migration_spark.operators.layout import column_bounds

    df = pq("zb", [(1, 5), (9, 2)], "a long, b long")
    assert column_bounds(df, ["a", "b"], memo=True) == column_bounds(df, ["a", "b"])
    nulls = pq("zn", [(1, None), (2, None)], "a long, b long")
    with pytest.raises(ValueError, match="entirely NULL"):
        column_bounds(nulls, ["a", "b"], memo=True)


def test_memo_count_distinguishes_same_schema_paths(spark, pq):
    """Regression (r12 session 6): canonicalized toString elides file
    locations — two same-schema relations over different paths rendered
    the identical plan text and CROSS-CONTAMINATED the memo (memo_count
    sizes result-affecting LSH bits). The key now folds in inputFiles."""
    a = pq("cnt_a", [(i,) for i in range(3)], "k long")
    b = pq("cnt_b", [(i,) for i in range(7)], "k long")
    assert P.memo_count(a) == 3
    assert P.memo_count(b) == 7  # pre-fix: returned 3 (a's cached count)
    assert P.memo_count(a) == 3


def test_cdc_null_op_raises(spark, pq):
    """Review fix (r12 session 6): ~isin() is NULL (not true) for a NULL
    op, which slipped past the guard and then acted as a DELETE
    downstream. The guard now has an explicit isNull disjunct."""
    from database_migration_spark.operators.cdc import net_changes

    s = pq("cdc_nullop", [(1, 1, None, "x")],
           "k long, seq long, op string, v string")
    with pytest.raises(ValueError, match="unknown CDC op"):
        net_changes(s, ["k"])
    with pytest.raises(ValueError, match="unknown CDC op"):
        net_changes(s, ["k"], memo_guards=True)


def test_memo_refuses_driver_local_relations(spark):
    """Review fix (r12 session 6): _plan_key raises on FULLY driver-local
    plans (no file-backed source anywhere — literal data is invisible to
    the key), so two such relations can never share a memoized value —
    the memo functions fall back to the live job. The mixed file+literal
    case is covered by test_memo_refuses_mixed_file_literal_plans."""
    a = spark.createDataFrame([(i,) for i in range(3)], "k long")
    b = spark.createDataFrame([(i,) for i in range(8)], "k long")
    with pytest.raises(ValueError, match="file-backed"):
        P._plan_key(a)
    assert P.memo_count(a) == 3  # live fallback, not an error
    assert P.memo_count(b) == 8  # and never a's cached value


def test_memo_refuses_mixed_file_literal_plans(spark, pq):
    """Regression (r12 advisor finding): a plan mixing a file scan with a
    driver-local literal relation passed the inputFiles check while the
    literal rows stayed invisible to the key — two joins differing only
    in literal data shared a key, and memo_count returned the first
    plan's cached count for the second. _plan_key now refuses any plan
    whose canonical text contains a driver-local leaf (LocalRelation /
    LogicalRDD / ExternalRDD); memo functions fall back to the live job."""
    base = pq("mix_base", [(i,) for i in range(5)], "k long")
    lit_a = spark.createDataFrame([(1,)], "k long")
    lit_b = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    mixed_a = base.join(lit_a, "k")
    mixed_b = base.join(lit_b, "k")
    with pytest.raises(ValueError, match="file-backed"):
        P._plan_key(mixed_a)
    # live fallback computes each plan's own count — never a shared entry
    assert P.memo_count(mixed_a) == 1
    assert P.memo_count(mixed_b) == 3
    # first-row and collect memos share _plan_key; pin the refusal there
    # too via live-fallback correctness on the mixed shape
    assert P.memo_first_row(mixed_b.groupBy().count())["count"] == 3
    assert len(P.memo_collect(mixed_b.select("k"))) == 3
