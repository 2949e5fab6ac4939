"""fuzzy_join: cross-relation lev<=1 matching vs a brute-force reference."""

import pytest
from pyspark.sql import functions as F

from database_migration_spark.operators.pairing import fuzzy_join


def _brute(spark, lvals, rvals):
    import itertools

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a):
            cur = [i + 1]
            for j, cb in enumerate(b):
                cur.append(min(prev[j + 1] + 1, cur[j] + 1, prev[j] + (ca != cb)))
            prev = cur
        return prev[-1]

    return {
        (x, y, lev(x, y))
        for x, y in itertools.product(set(lvals), set(rvals))
        if lev(x, y) <= 1
    }


def test_cross_relation_matches_brute_force(spark):
    lvals = ["alpha", "beta", "gamma", "delta", "alpha"]  # dup collapses
    rvals = ["alpa", "beta", "gamm", "zeta", "epsilon", None]
    left = spark.createDataFrame([(v,) for v in lvals], "name STRING")
    right = spark.createDataFrame([(v,) for v in rvals], "name STRING")
    got = {
        (r["left_value"], r["right_value"], r["dist"])
        for r in fuzzy_join(left, right, "name").collect()
    }
    assert got == _brute(spark, lvals, [v for v in rvals if v is not None])
    # the mapping shape: exact match kept at dist 0, one-edit at 1
    assert ("beta", "beta", 0) in got
    assert ("alpha", "alpa", 1) in got
    assert ("gamma", "gamm", 1) in got
    assert all(x != "delta" for x, _, _ in got)  # unmatched left absent


def test_different_column_names_and_guards(spark):
    left = spark.createDataFrame([("abc",)], "src STRING")
    right = spark.createDataFrame([("abd",)], "tgt STRING")
    got = fuzzy_join(left, right, "src", "tgt").collect()
    assert [(r["left_value"], r["right_value"], r["dist"]) for r in got] == [
        ("abc", "abd", 1)
    ]
    with pytest.raises(ValueError):
        fuzzy_join(left, right, "src", "tgt", max_dist=2)


def test_max_block_drops_degenerate_blocks(spark):
    # serial ids: every "vNN" shares deletion variants with its digit
    # neighbors — capping the hot blocks bounds the candidate volume
    left = spark.createDataFrame([(f"v{i}",) for i in range(100)], "name STRING")
    right = spark.createDataFrame([("v1",), ("unique-string",)], "name STRING")
    capped = fuzzy_join(left, right, "name", max_block=3).collect()
    exhaustive = fuzzy_join(left, right, "name").collect()
    assert len(capped) <= len(exhaustive)

