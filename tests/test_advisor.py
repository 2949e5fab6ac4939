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


def test_join_cardinality_matches_actual_join(spark):
    """The guard's closed form IS the join's cardinality: predicted
    out_rows (per key and total) must equal the count Spark gets by
    actually running the inner equi-join, including the NULL-key drop."""
    from decimal import Decimal

    from database_migration_spark.operators.advisor import join_cardinality

    a = spark.createDataFrame(
        [(1, "x")] * 4 + [(2, "x")] * 3 + [(3, "x")] + [(None, "x")] * 2,
        "k LONG, pay_a STRING",
    )
    b = spark.createDataFrame(
        [(1, "y")] * 5 + [(2, "y")] * 2 + [(4, "y")] + [(None, "y")],
        "k LONG, pay_b STRING",
    )
    got = {r.key: r for r in join_cardinality(a, b, ["k"], top=10).collect()}
    actual = a.join(b, "k", "inner").count()  # NULLs never match
    assert got["*TOTAL*"].out_rows == Decimal(actual) == Decimal(26)
    assert got["*TOTAL*"].rows_a == 10 and got["*TOTAL*"].rows_b == 9
    # per-key: 1 -> 4*5=20, 2 -> 3*2=6; one-side-only keys (3, 4) absent
    assert got["1"].out_rows == Decimal(20)
    assert got["1"].rows_a == 4 and got["1"].rows_b == 5
    assert got["2"].out_rows == Decimal(6)
    assert "3" not in got and "4" not in got
    # the NULL accounting: rows an inner join silently drops
    assert got["*NULL*"].rows_a == 2 and got["*NULL*"].rows_b == 1
    assert got["*NULL*"].out_rows == Decimal(0)


def test_join_cardinality_top_bound_and_empty_overlap(spark):
    from decimal import Decimal

    from database_migration_spark.operators.advisor import join_cardinality

    a = spark.createDataFrame([(i % 20, 1) for i in range(100)], "k LONG, v LONG")
    b = spark.createDataFrame([(i % 20, 1) for i in range(40)], "k LONG, v LONG")
    out = join_cardinality(a, b, ["k"], top=5).collect()
    keys = [r.key for r in out]
    assert len([k for k in keys if not k.startswith("*")]) == 5
    assert keys[-2:] == ["*NULL*", "*TOTAL*"]
    # disjoint key sets: total prediction is 0, summary rows still exact
    c = spark.createDataFrame([(1000 + i, 1) for i in range(10)], "k LONG, v LONG")
    got = {r.key: r for r in join_cardinality(a, c, ["k"]).collect()}
    assert got["*TOTAL*"].out_rows == Decimal(0)
    assert got["*TOTAL*"].rows_a == 100 and got["*TOTAL*"].rows_b == 10
    import pytest as _pt

    with _pt.raises(ValueError, match="at least one"):
        join_cardinality(a, b, [])
    with _pt.raises(ValueError, match="side b"):
        join_cardinality(a, b.drop("k"), ["k"])
