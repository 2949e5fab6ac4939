"""Shared parquet publish step for self-referential rewrites.

A DataFrame whose lineage READS ``path`` cannot be written back to
``path`` directly: the first commit deletes input files the remaining
tasks still need (Spark's self-overwrite race). Every incremental
operator that maintains a plain-parquet store therefore stages to a
sibling path and swaps it into the target — one protocol, one
implementation (round-6 review: five hand-rolled copies had accumulated;
a fix to the dance must propagate to all of them).

The swap itself is a DIRECTORY RENAME, not a re-read + overwrite: an
overwrite of ``path`` deletes the previous generation file-by-file before
the new one is fully written, so a crash mid-overwrite shreds the
accumulated state — fatal for read-modify-write targets like
``stream_cdc_apply``'s (_seq fences and delete tombstones live in the
target; the epoch replay then runs against a broken base). With the
rename swap the previous generation stays intact until the new one is
complete; the only crash window is between the two renames, which leaves
BOTH generations on disk (``path`` briefly absent, ``path + ".old"``
recoverable) instead of neither. Local-path staging is the norm here
(staging is always a sibling of ``path``); a non-local path falls back to
the legacy re-read + overwrite, documented as weaker.

At scale a transactional table format (Delta/Iceberg MERGE INTO) replaces
this entirely.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame


def publish_parquet(df: DataFrame, path: str, staging: str) -> None:
    """Stage ``df`` to ``staging``, swap into ``path`` (directory rename —
    the previous generation survives until the new one is committed), drop
    the old generation. ``staging`` must not be inside ``path``."""
    spark = df.sparkSession
    df.write.mode("overwrite").parquet(staging)
    if os.path.isdir(staging):
        old = path + ".old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(path):
            os.rename(path, old)
        os.rename(staging, path)
        shutil.rmtree(old, ignore_errors=True)
    else:
        # non-local filesystem (scheme-qualified path): no POSIX rename —
        # re-read the staged copy (breaking the lineage) and overwrite.
        # Weaker: a crash mid-overwrite loses the previous generation.
        spark.read.parquet(staging).write.mode("overwrite").parquet(path)
        shutil.rmtree(staging, ignore_errors=True)
