"""salted_join: result-identical to the plain join, skew actually spread."""

import pytest
from pyspark.sql import functions as F

from database_migration_spark.operators.skew import salted_join


@pytest.fixture()
def lr(spark):
    # one hot key (k=0: 500 rows), a NULL key, and keys missing from right
    left = spark.createDataFrame(
        [(i, 0 if i < 500 else i % 7, f"p{i}") for i in range(600)]
        + [(1000, None, "pnull")],
        "lid LONG, k INT, payload STRING",
    )
    right = spark.createDataFrame(
        [(k, f"dim{k}") for k in (0, 1, 2, 3)] + [(None, "dimnull")],
        "k INT, dim STRING",
    )
    return left, right


def _key(df):
    return {(r["lid"], r["dim"]) for r in df.collect()}


@pytest.mark.parametrize("how", ["inner", "left"])
@pytest.mark.parametrize("salts", [1, 4])
def test_salted_equals_plain_join(spark, lr, how, salts):
    left, right = lr
    got = _key(salted_join(left, right, ["k"], salts=salts, how=how))
    want = _key(left.join(right, ["k"], how))
    assert got == want
    if how == "left":
        assert (1000, None) in got  # NULL key survives as unmatched


def test_hot_key_spreads_over_salts(spark, lr):
    left, right = lr
    salts = 8
    spread = (
        left.where("k = 0")
        .select(
            F.pmod(
                F.xxhash64(*[F.col(c) for c in left.columns], F.lit(42)),
                F.lit(salts),
            ).alias("s")
        )
        .agg(F.count_distinct("s").alias("n"))
        .collect()[0]["n"]
    )
    assert spread == salts  # 500 distinct rows cover all 8 salt buckets

    plan = (
        salted_join(left, right, ["k"], salts=salts)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "_salt" in plan and "hashpartitioning" in plan


def test_salted_join_rejects_bad_args(spark, lr):
    left, right = lr
    with pytest.raises(ValueError):
        salted_join(left, right, ["k"], how="full")
    with pytest.raises(ValueError):
        salted_join(left, right, ["k"], salts=0)
    with pytest.raises(ValueError):
        salted_join(left.withColumn("_salt", F.lit(1)), right, ["k"])


# --- ported from the original functions/skew.py tests (that module is now
# consolidated into operators/skew.py): the 90%-hot-key equivalence at a
# larger row count, kept so the consolidation provably preserves behavior.

def test_salted_join_matches_plain_join_90pct_hot(spark):
    large = spark.range(0, 20000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame(
        [(i, f"dim_{i}") for i in range(50)] + [(1, "hot")],
        "k LONG, name STRING",
    ).where("name <> 'dim_1'")
    plain = large.join(small, ["k"], "inner")
    salted = salted_join(large, small, ["k"], salts=8)
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_left_join_unmatched_keys(spark):
    large = spark.range(0, 1000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v")
    )
    small = spark.createDataFrame([(0, "zero")], "k LONG, name STRING")
    out = salted_join(large, small, ["k"], salts=4, how="left")
    assert out.count() == 1000
    assert out.where(F.col("name").isNull()).count() == large.where("k <> 0").count()
