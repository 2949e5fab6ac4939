"""Column profiler (operators/profile.py)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from database_migration_spark.operators.profile import (
    profile_oracle_sql,
    profile_table,
)


def test_profile_matches_duckdb_oracle(spark, sf_smoke):
    """Differential: the whole tall report (rows/null/distinct/hist/topk)
    must equal the DuckDB computation row for row."""
    df = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    mn, mx = df.agg(F.min("o_custkey"), F.max("o_custkey")).collect()[0]
    got = {
        (r.column_name, r.stat, r.key): r.n
        for r in profile_table(
            df, "orders", hist_cols=["o_custkey"],
            topk_cols=["o_orderstatus", "o_orderpriority"],
        ).collect()
    }
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"'{sf_smoke}/orders.parquet'"
    )
    sql = profile_oracle_sql(
        "orders",
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderdate", "o_orderpriority"],
        {"o_custkey": (mn, mx)},
        ["o_orderstatus", "o_orderpriority"],
    )
    want = {(c, s, k): int(n) for _, c, s, k, n in con.sql(sql).fetchall()}
    assert got == want
    # sanity: buckets partition the non-null rows
    n_rows = got[(None, "rows", None)]
    n_null = got[("o_custkey", "null", None)]
    hist_total = sum(
        v for (c, s, _), v in got.items() if c == "o_custkey" and s == "hist"
    )
    assert hist_total == n_rows - n_null


def test_profile_hist_exact_above_double_precision(spark):
    """Bucket arithmetic must be BIGINT-exact: values where the DOUBLE
    path ((v-min)*bins/span with float division) mis-buckets."""
    vmin, vmax = 0, (1 << 60) - 1
    span = vmax - vmin + 1
    vals = [(1 << 59) + 1, (1 << 59) - 1, 3 ** 37, vmax, vmin]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {
        r.key: r.n
        for r in profile_table(
            df, "t", hist_cols=["v"], topk_cols=[], bins=10
        ).collect()
        if r.stat == "hist"
    }
    want = {}
    for v in vals:
        b = str(((v - vmin) * 10) // span)  # Python ints: exact
        want[b] = want.get(b, 0) + 1
    assert {k: v for k, v in got.items() if v} == want


def test_profile_rejects_fractional_hist(spark):
    df = spark.createDataFrame([(1.5,)], "v double")
    with pytest.raises(ValueError, match="integral"):
        profile_table(df, "t", hist_cols=["v"])


def test_profile_topk_ties_and_nulls(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), ("b",), ("b",), ("c",), (None,)], "s string"
    )
    rows = [
        (r.key, r.n)
        for r in profile_table(df, "t", hist_cols=[], topk_cols=["s"], k=2)
        .where(F.col("stat") == "topk")
        .orderBy("key")
        .collect()
    ]
    # ties break by value asc; NULL never appears as a topk key
    assert rows == [("a", 2), ("b", 2)]


def test_profile_single_scan_plan(spark, sf_smoke):
    """The wide pass moves the input ONCE. Since the r12 opt round the
    exact-distinct branch lives in its own narrow aggregate (the
    validate.compute_metrics_wide split: keeps the plain null/hist
    counters out of the Expand stream) and both legs consume the same
    fanned-out exchange — statically that prints as two identical
    scan+repartition subtrees, and AQE's stage reuse dedupes them at
    runtime (asserted via ReusedExchange in the final plan). approx
    mode has no Expand and stays a literal single scan."""
    df = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    rep = profile_table(df, "orders", hist_cols=["o_custkey"], topk_cols=[])
    plan = rep._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        rep._jdf.queryExecution(), "simple"
    )
    # two legs (stats + exact-distinct), not a per-column scan explosion
    assert plan.count("FileScan parquet") == 2
    assert "partial_count" in plan
    rep.collect()
    final = rep._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        rep._jdf.queryExecution(), "simple"
    )
    assert "isFinalPlan=true" in final
    assert final.count("ReusedExchange") >= 1  # the input moved once

    approx = profile_table(
        df, "orders", hist_cols=["o_custkey"], topk_cols=[], distinct_mode="approx"
    )
    aplan = approx._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        approx._jdf.queryExecution(), "simple"
    )
    assert aplan.count("FileScan parquet") == 1
    assert "Expand" not in aplan


def test_fd_candidates_semantics(spark):
    """FD criterion with NULL-as-value semantics: a NULL dependent beside
    a non-NULL one under the same determinant VIOLATES the FD (Spark's
    bare multi-arg count_distinct would drop the NULL row and call it
    held)."""
    from database_migration_spark.operators.profile import fd_candidates

    df = spark.createDataFrame(
        [
            (1, "x", 10),
            (1, "x", 11),   # a -> b holds so far
            (2, "y", 20),
            (2, None, 20),  # NULL beside 'y': a -> b violated
        ],
        "a long, b string, c long",
    )
    rows = {
        (r.determinant, r.dependent): (r.n_determinant, r.n_pairs, r.holds)
        for r in fd_candidates(df, [("a", "b"), ("a", "c"), ("c", "a")]).collect()
    }
    assert rows[("a", "b")] == (2, 3, False)   # NULL counts as a value
    assert rows[("a", "c")] == (2, 3, False)   # 1 -> {10, 11}
    assert rows[("c", "a")] == (3, 3, True)    # each c has one a
    try:
        fd_candidates(df, [("a", "nope")])
        assert False, "expected ValueError"
    except ValueError as e:
        assert "nope" in str(e)


def test_fd_candidates_single_scan(spark, sf_smoke):
    from database_migration_spark.operators.profile import fd_candidates

    df = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    rep = fd_candidates(df, [("o_custkey", "o_orderstatus"),
                             ("o_orderkey", "o_custkey")])
    plan = rep._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        rep._jdf.queryExecution(), "simple"
    )
    assert plan.count("FileScan parquet") == 1
    rows = {(r.determinant, r.dependent): r.holds for r in rep.collect()}
    assert rows[("o_orderkey", "o_custkey")] is True  # PK determines all


def test_equi_depth_bounds_ties_and_skew(spark):
    """Exact discrete quantiles under heavy ties: boundary b = smallest v
    with cum >= ceil(n*b/B). A 90%-skewed column puts the hot value on
    most boundaries; the last boundary is always max(v)."""
    from database_migration_spark.operators.profile import equi_depth_bounds

    rows = [(7,)] * 18 + [(1,), (9,)]  # n=20, v=7 dominates
    df = spark.createDataFrame(rows, "v long")
    got = {r.bucket: (r.boundary, r.cum_rows)
           for r in equi_depth_bounds(df, "v", buckets=4).collect()}
    # cum: 1->1, 7->19, 9->20; targets ceil(20b/4) = 5,10,15,20
    assert got == {1: (7, 19), 2: (7, 19), 3: (7, 19), 4: (9, 20)}

    # uniform sanity: octiles of 1..16 are the even numbers
    df2 = spark.createDataFrame([(i,) for i in range(1, 17)], "v long")
    got2 = {r.bucket: r.boundary
            for r in equi_depth_bounds(df2, "v", buckets=8).collect()}
    assert got2 == {b: 2 * b for b in range(1, 9)}


def test_profile_approx_distinct_no_expand(spark, sf_smoke):
    """distinct_mode='approx': HLL distincts, no Expand in the plan — the
    recurring-monitoring shape; values within HLL tolerance of exact."""
    df = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    rep = profile_table(df, "orders", hist_cols=[], topk_cols=[],
                        distinct_mode="approx")
    plan = rep._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        rep._jdf.queryExecution(), "simple"
    )
    assert "Expand" not in plan
    exact = {
        r.column_name: r.n
        for r in profile_table(df, "orders", hist_cols=[],
                               topk_cols=[]).collect()
        if r.stat == "distinct"
    }
    approx = {
        r.column_name: r.n for r in rep.collect() if r.stat == "distinct"
    }
    for c, n in exact.items():
        assert abs(approx[c] - n) <= max(5, int(n * 0.1)), (c, n, approx[c])


def test_distribution_key_advisor_null_constant_and_unique(spark):
    from database_migration_spark.operators.profile import distribution_key_advisor

    df = spark.createDataFrame(
        [(i, "x" if i < 8 else None, 1) for i in range(10)],
        "uid BIGINT, mostly STRING, const INT",
    )
    rows = {r["column_name"]: r.asDict() for r in
            distribution_key_advisor(df, ["uid", "mostly", "const"], n_buckets=4).collect()}

    # unique key: every value once, top-1 share 1/10
    assert rows["uid"]["n_distinct"] == 10 and rows["uid"]["top1_cnt"] == 1
    assert rows["uid"]["top1_share_ppm"] == 100000

    # NULLs counted separately, shares over non-null rows only
    assert rows["mostly"]["n_null"] == 2
    assert rows["mostly"]["n_distinct"] == 1
    assert rows["mostly"]["top1_share_ppm"] == 1000000

    # constant column: everything in one hash bucket
    assert rows["const"]["max_bucket_cnt"] == 10
    assert rows["const"]["max_bucket_share_ppm"] == 1000000


def test_distribution_key_advisor_all_null_column(spark):
    from database_migration_spark.operators.profile import distribution_key_advisor

    df = spark.createDataFrame([(None,), (None,)], "c STRING")
    r = distribution_key_advisor(df, ["c"]).collect()[0]
    assert r["n_null"] == 2 and r["n_distinct"] == 0
    assert r["top1_share_ppm"] is None and r["max_bucket_share_ppm"] is None
    assert r["max_bucket_cnt"] == 0


def test_distribution_key_advisor_rejects_bad_args(spark):
    import pytest
    from database_migration_spark.operators.profile import distribution_key_advisor

    df = spark.createDataFrame([(1,)], "c INT")
    with pytest.raises(ValueError):
        distribution_key_advisor(df, [])
    with pytest.raises(ValueError):
        distribution_key_advisor(df, ["c"], n_buckets=0)
