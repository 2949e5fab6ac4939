"""Shared parquet publish step for self-referential rewrites.

A DataFrame whose lineage READS ``path`` cannot be written back to
``path`` directly: the first commit deletes input files the remaining
tasks still need (Spark's self-overwrite race). Every incremental
operator that maintains a plain-parquet store therefore stages to a
sibling path, re-reads the staged copy (breaking the lineage), overwrites
the target, and removes the staging copy — one protocol, one
implementation (round-6 review: five hand-rolled copies had accumulated;
a fix to the dance must propagate to all of them).

At scale a transactional table format (Delta/Iceberg MERGE INTO) replaces
this entirely; the overwrite of ``path`` itself is not atomic either —
that is inherent to plain parquet directories and documented at every
call site that needs stronger guarantees.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame


def publish_parquet(df: DataFrame, path: str, staging: str) -> None:
    """Stage ``df`` to ``staging``, swap into ``path``, drop the staging
    copy. ``staging`` must not be inside ``path``."""
    spark = df.sparkSession
    df.write.mode("overwrite").parquet(staging)
    spark.read.parquet(staging).write.mode("overwrite").parquet(path)
    shutil.rmtree(staging, ignore_errors=True)
