"""Salted join equivalence on a skewed key distribution."""

from pyspark.sql import functions as F

from database_migration_spark.functions.skew import salted_join


def test_salted_join_matches_plain_join(spark):
    # 90% of rows share one hot key
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


def test_salted_left_join(spark):
    large = spark.range(0, 1000).select((F.col("id") % 3).alias("k"), F.col("id").alias("v"))
    small = spark.createDataFrame([(0, "zero")], "k LONG, name STRING")
    out = salted_join(large, small, ["k"], salts=4, how="left")
    assert out.count() == 1000
    assert out.where(F.col("name").isNull()).count() == large.where("k <> 0").count()
