"""Deterministic sampling: reproducible across partitionings, quota-exact."""

from pyspark.sql import functions as F

from database_migration_spark.operators.sampling import hash_sample, stratified_sample


def test_stratified_sample_quota_and_determinism(spark):
    rows = [(i, "k%d" % (i % 3)) for i in range(300)]
    df = spark.createDataFrame(rows, "id LONG, k STRING")
    out1 = stratified_sample(df, ["k"], "id", 7)
    assert out1.groupBy("k").count().agg(F.max("count")).collect()[0][0] == 7
    # same sample regardless of physical partitioning
    out2 = stratified_sample(df.repartition(13), ["k"], "id", 7)
    assert sorted(r.id for r in out1.collect()) == sorted(r.id for r in out2.collect())
    # ranks are 1..7 per stratum
    ranks = out1.groupBy("k").agg(F.collect_set("sample_rank").alias("s")).collect()
    assert all(sorted(r.s) == list(range(1, 8)) for r in ranks)


def test_hash_sample_is_a_stable_subset(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "id LONG")
    a = {r.id for r in hash_sample(df, "id", 100).collect()}
    b = {r.id for r in hash_sample(df.repartition(7), "id", 100).collect()}
    assert a == b
    assert 50 < len(a) < 200  # ~10% of 1000
    # nested property: a 50-permille sample is a subset of the 100-permille one
    c = {r.id for r in hash_sample(df, "id", 50).collect()}
    assert c <= a
