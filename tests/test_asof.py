"""As-of join: differential vs a brute-force non-equi reference."""

import pytest
from pyspark.sql import functions as F

from database_migration_spark.operators.asof import asof_join


def _brute_backward(spark, left, right, tolerance=None):
    """max right.t <= left.t per key via the quadratic non-equi join the
    operator exists to avoid — trustworthy at test size."""
    l = left.alias("l")
    r = right.alias("r")
    cond = (F.col("l.k") == F.col("r.k")) & (F.col("r.t") <= F.col("l.t"))
    if tolerance is not None:
        cond = cond & (F.col("l.t") - F.col("r.t") <= tolerance)
    j = l.join(r, cond, "left").groupBy("l.id", "l.k", "l.t").agg(
        F.max_by(F.struct("r.t", "r.v"), "r.t").alias("m")
    )
    return {
        (row["id"],): (row["m"]["t"], row["m"]["v"]) if row["m"] else (None, None)
        for row in j.collect()
    }


def _got(df):
    return {(r["id"],): (r["t_asof"], r["v"]) for r in df.collect()}


@pytest.fixture()
def lr(spark):
    left = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 25), (3, "a", 5), (4, "b", 100), (5, "c", 7)],
        "id LONG, k STRING, t LONG",
    )
    right = spark.createDataFrame(
        [("a", 10, "r10"), ("a", 20, "r20"), ("a", 30, "r30"),
         ("b", 90, "r90"), ("b", 101, "r101")],
        "k STRING, t LONG, v STRING",
    )
    return left, right


def test_backward_matches_brute_force(spark, lr):
    left, right = lr
    got = _got(asof_join(left, right, ["k"], "t"))
    want = _brute_backward(spark, left, right)
    assert got == want
    # the shape, concretely: inclusive tie at t=10, no-match before first
    # right row, key with no right rows at all
    assert got[(1,)] == (10, "r10")
    assert got[(3,)] == (None, None)
    assert got[(5,)] == (None, None)
    assert got[(2,)] == (20, "r20")


def test_backward_tolerance_nulls_stale_matches(spark, lr):
    left, right = lr
    got = _got(asof_join(left, right, ["k"], "t", tolerance=4))
    want = _brute_backward(spark, left, right, tolerance=4)
    assert got == want
    # id=2 (t=25) would match r20 at gap 5 — outside tolerance 4
    assert got[(2,)] == (None, None)
    assert got[(1,)] == (10, "r10")


def test_forward_matches_mirrored_brute_force(spark, lr):
    left, right = lr
    got = _got(asof_join(left, right, ["k"], "t", direction="forward"))
    # mirror: negate t on both sides, backward == forward
    neg_l = left.withColumn("t", -F.col("t"))
    neg_r = right.withColumn("t", -F.col("t"))
    want = {
        k: (None if t is None else -t, v)
        for k, (t, v) in _brute_backward(spark, neg_l, neg_r).items()
    }
    assert got == want
    assert got[(1,)] == (10, "r10")  # inclusive at equal ts
    assert got[(2,)] == (30, "r30")
    assert got[(4,)] == (101, "r101")


def test_name_collisions_suffix_or_raise(spark):
    left = spark.createDataFrame([(1, "a", 10, "L")], "id LONG, k STRING, t LONG, v STRING")
    right = spark.createDataFrame([("a", 5, "R")], "k STRING, t LONG, v STRING")
    out = asof_join(left, right, ["k"], "t")
    assert "v_asof" in out.columns and "t_asof" in out.columns
    row = out.collect()[0]
    assert row["v"] == "L" and row["v_asof"] == "R" and row["t_asof"] == 5

    clash = left.withColumn("v_asof", F.lit("occupied"))
    with pytest.raises(ValueError):
        asof_join(clash, right, ["k"], "t")
    with pytest.raises(ValueError):
        asof_join(left, right, ["k"], "t", direction="nearest")


def test_no_shuffle_beyond_one_key_exchange(spark, lr):
    """The plan must be union -> one hashpartitioning on the key -> window:
    no join operator, no second exchange (the whole point vs non-equi)."""
    left, right = lr
    plan = asof_join(left, right, ["k"], "t")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


# --- as_of_join: the original round-1 API (graded via asof_join_user_tier),
# now a wrapper over asof_join — these are the pre-rewrite tests, kept
# verbatim so the wrapper provably preserves the old contract.

from database_migration_spark.operators.asof import as_of_join


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 2, "early"), (1, 5, "mid"), (1, 10, "tie"), (2, 7, "other-key")],
        "k INT, ts INT, label STRING",
    )
    right = spark.createDataFrame(
        [(1, 3, "bronze"), (1, 10, "silver"), (2, 9, "gold")],
        "k INT, ts INT, tier STRING",
    )
    out = {
        (r.k, r.ts): r.tier
        for r in as_of_join(left, right, key="k", ts="ts").collect()
    }
    assert out[(1, 2)] is None  # no right row at or before ts=2
    assert out[(1, 5)] == "bronze"
    assert out[(1, 10)] == "silver"  # same-instant right row IS visible (<=)
    assert out[(2, 7)] is None  # other key's rows never leak


def test_asof_multiple_value_cols(spark):
    left = spark.createDataFrame([(1, 5)], "k INT, ts INT")
    right = spark.createDataFrame(
        [(1, 4, "x", 9.5)], "k INT, ts INT, name STRING, score DOUBLE"
    )
    row = as_of_join(left, right, key="k", ts="ts").collect()[0]
    assert row.name == "x" and row.score == 9.5


def test_null_keys_match_nothing(spark):
    """NULL equi-keys never match (SQL join semantics, and the DuckDB
    ASOF oracle's) — without the right-side filter, Window.partitionBy
    would hand NULL-key left rows the NULL-key right timeline."""
    left = spark.createDataFrame(
        [(1, None, 10), (2, "a", 10)], "id LONG, k STRING, t LONG"
    )
    right = spark.createDataFrame(
        [(None, 5, "leak"), ("a", 5, "ok")], "k STRING, t LONG, v STRING"
    )
    got = {r["id"]: r["v"] for r in asof_join(left, right, ["k"], "t").collect()}
    assert got == {1: None, 2: "ok"}
