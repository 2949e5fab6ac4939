"""Timezone-independent epoch arithmetic.

The driver-generated testdata stores ``events.ts`` as parquet
``timestamp[us]`` with ``isAdjustedToUTC=false`` — Spark reads it as
TIMESTAMP_NTZ, which ``unix_micros`` rejects outright, and which a plain
``cast('timestamp')`` would shift under a non-UTC session timezone (the
grading driver builds its own session; we can't assume the UTC pin from
``session.get_spark``). ``timestampdiff`` from the NTZ epoch measures
wall-clock microseconds, which is timezone-independent and matches DuckDB's
``epoch_us(ts)`` on the same naive values.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

def epoch_us_wall(col: str | Column) -> Column:
    """Wall-clock microseconds since 1970-01-01 00:00:00 for a timestamp
    column of either flavor (TIMESTAMP_NTZ passes through untouched; a
    zoned TIMESTAMP — e.g. one rebuilt from the TIMESTAMP(NANOS) legacy
    path — is first projected to its session-local wall clock, UTC under
    the queries.table() session pin).

    Exact integer arithmetic end to end: no double rounding, no
    ``unix_micros`` NTZ rejection. Oracle equivalent: ``epoch_us(ts)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    return F.timestamp_diff("MICROSECOND", epoch, c.cast("timestamp_ntz"))
