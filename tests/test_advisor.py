"""join_plan_advisor: measured recommendations, deterministic bytes."""

import pytest
from pyspark.sql import functions as F

from database_migration_spark.operators.advisor import join_plan_advisor


def test_thresholds_route_broadcast_shuffle_salt(spark):
    fact = spark.createDataFrame(
        [(0 if i % 2 == 0 else i, i % 7, float(i)) for i in range(1000)],
        "hot_key LONG, even_key LONG, v DOUBLE",
    )
    small = spark.createDataFrame([(i, f"d{i}") for i in range(10)],
                                  "k LONG, name STRING")
    big = spark.createDataFrame([(i, "x" * 100) for i in range(500)],
                                "k LONG, pad STRING")
    out = {
        (r["kind"], r["name"]): r.asDict()
        for r in join_plan_advisor(
            fact, ["hot_key", "even_key"],
            [("small", small), ("big", big)],
            broadcast_threshold_bytes=1000,
            skew_threshold_ppm=200_000,
        ).collect()
    }
    assert out[("dim", "small")]["recommendation"] == "broadcast"
    assert out[("dim", "big")]["recommendation"] == "shuffle"
    # hot_key: one value owns 50% of the fact -> salt
    assert out[("fact_key", "hot_key")]["recommendation"] == "salt"
    assert out[("fact_key", "hot_key")]["top1_share_ppm"] == 500_000
    # even_key: 7 values at ~1/7 each < 20% threshold... 1/7 = 142857 ppm
    assert out[("fact_key", "even_key")]["recommendation"] == "shuffle"
    # dim bytes are exact and deterministic: 10 rows x (8 + len("dN"))
    assert out[("dim", "small")]["est_bytes"] == 10 * 8 + sum(
        len(f"d{i}") for i in range(10)
    )

    with pytest.raises(ValueError):
        join_plan_advisor(fact, [], [])


def test_null_heavy_key_and_null_strings(spark):
    fact = spark.createDataFrame(
        [(None, "a")] * 8 + [(1, None), (2, None)], "k LONG, s STRING"
    )
    out = {
        (r["kind"], r["name"]): r.asDict()
        for r in join_plan_advisor(fact, ["k"], [("self", fact)]).collect()
    }
    # NULLs co-locate in one shuffle slot but are NOT the top VALUE —
    # top1 is over non-null values (1 and 2 at 50% each of the 2 non-null)
    assert out[("fact_key", "k")]["top1_share_ppm"] == 500_000
    assert out[("fact_key", "k")]["n_rows"] == 3  # 2 values + null slot
    # NULL strings cost 0 bytes; NULL longs cost 0
    assert out[("dim", "self")]["est_bytes"] == 8 * 1 + 2 * 8
