"""Bucketed co-located join: the persisted-partitioning scale play.

Asserts the physical property that matters: joining two same-bucketed
tables produces a SortMergeJoin with ZERO shuffle exchanges.
"""

import contextlib
import io

import pytest


@pytest.fixture()
def bucket_env(spark, tmp_path, sf_smoke):
    from database_migration_spark.sources.bucketed import write_bucketed

    # warehouse.dir is static; tables land in ./spark-warehouse and are
    # dropped in teardown
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    write_bucketed(li, "li_bucketed", "l_orderkey", 8)
    write_bucketed(o, "o_bucketed", "o_orderkey", 8)
    yield
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_bucketed_join_no_shuffle(spark, bucket_env, sf_smoke):
    from database_migration_spark.sources.bucketed import bucketed_join

    # force the sort-merge path (tiny fixtures would broadcast otherwise;
    # at scale neither side broadcasts — that's the case bucketing serves)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "li_bucketed", "o_bucketed", "l_orderkey", "o_orderkey")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle either side
        # correctness: matches the plain join
        li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
        o = spark.read.parquet(f"{sf_smoke}/orders.parquet")
        assert j.count() == li.join(o, li.l_orderkey == o.o_orderkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
