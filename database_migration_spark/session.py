"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what we would set fleet-wide on a real cluster:
AQE on (runtime re-planning, skew-join splitting, partition coalescing),
shuffle partitions sized to the core count rather than the 200 default,
Arrow enabled for the few pandas-UDF paths, and a pinned UTC session
timezone so results are comparable against external oracles regardless of
host timezone.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "database_migration_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-appropriate defaults.

    On a real cluster ``master`` comes from the environment; locally we run
    ``local[N]``. ``spark.sql.shuffle.partitions`` defaults to the core count
    — at 100 TB you would raise this to ~2-3x total cores and let AQE coalesce.
    """
    cpus = DEFAULT_CPUS
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if str(cpus).isdigit() else 32
    shuffle = shuffle_partitions

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Write timestamps as INT64 micros, never legacy INT96: INT96
        # carries no min/max column statistics (kills predicate pushdown
        # and row-group skipping at scale) and round-trips through Arrow
        # as timestamp[ns], confusing external readers.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # PySpark 4's DataFrame-debugging decorator walks the Python stack
        # and makes 2 extra py4j round-trips on EVERY API call purely to
        # decorate error messages with the user call site. Expression-heavy
        # builders (32-permutation minhash, banded keys) make hundreds of
        # API calls per plan — measured r12: ~0.3 s of pure call-site
        # capture per incremental_dedup build, plus the hidden JVM origin
        # set per call. Error behavior is unchanged except for that one
        # decoration line. Scale-neutral: this is driver overhead whatever
        # the cluster size.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # Broadcast threshold: dimension tables (region/nation/customer at
        # migration scale) should broadcast; 64 MB is safe with 128 GiB heap.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
