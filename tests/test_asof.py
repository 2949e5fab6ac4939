"""As-of join edge cases (same-instant tie, no preceding row, key isolation)."""

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
