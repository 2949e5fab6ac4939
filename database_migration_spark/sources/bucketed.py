"""Write-time bucketing for shuffle-free co-located joins.

The 100 TB play for repeated big-big joins (fact ⋈ fact on the same key —
e.g. lineitem ⋈ orders on orderkey every day): bucket BOTH tables on the
join key at write time (`bucketBy(n, key).sortBy(key)`); every later join
on that key reads co-located buckets and skips the shuffle entirely —
.explain shows SortMergeJoin with zero Exchange under it.

The reference's analogue is Exasol DISTRIBUTE BY (the generators carry the
distribution key through — SURVEY §1.1 partition/distribution columns);
bucketing is the Spark-native way to persist that physical property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and bucket-sorted) table in the session
    catalog. n_buckets should match downstream parallelism; at 100 TB pick
    buckets so each is a few hundred MB."""
    w = df.write.bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.mode("overwrite").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys. With equal bucket
    counts Catalyst plans SortMergeJoin with no Exchange on either side."""
    l, r = spark.table(left_table), spark.table(right_table)
    return l.join(r, l[left_key] == r[right_key])
