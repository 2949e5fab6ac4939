"""Incremental sync: watermark + strategy + MERGE.

Reference: /root/reference/delta_import/delta_import_on_primary_keys.sql —
strategy decision at :374-435, watermark at :256-275 (max(delta_col),
loaded with ``>=`` so the boundary row re-reads: at-least-once, deduplicated
by the PK MERGE), the MERGE itself at :399-401, staging-table pattern at
:381-390.

Spark shape: without a transactional table format in this environment, MERGE
is the classic join rewrite —

    merged = staging ∪ (target ⟕anti staging on keys)

i.e. staged rows win on key collision (UPDATE), unmatched target rows are
kept, unmatched staged rows are inserts. This materializes a new target
version (full rewrite); with Delta Lake available the same planner calls
``MERGE INTO`` and touches only matched files. The strategy enum and the
at-least-once watermark semantics are identical either way.

Scale: the anti-join shuffles both sides on the PK. For a 100 TB target with
a small daily delta, broadcast the staging side (it's the small one) —
Catalyst does this automatically under the broadcast threshold; we hint it
explicitly when staging row counts are known-small.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum

from pyspark.sql import DataFrame, functions as F


class SyncStrategy(Enum):
    # delta_import_on_primary_keys.sql:374-435
    TRUNCATE_FULL_LOAD = "no primary key: truncate target, full reload"
    FULL_LOAD_MERGE = "pk but no usable watermark: full load into staging, merge"
    DELTA_LOAD_MERGE = "pk + watermark: filtered load (>= watermark), merge"


@dataclass
class SyncPlan:
    strategy: SyncStrategy
    keys: tuple[str, ...]
    delta_col: str | None
    watermark: object | None
    statements: tuple[str, ...]  # human-reviewable preview (dry-run UX)


def watermark(target: DataFrame, delta_col: str):
    """max(delta_col) on the target — one agg, map-side combined
    (delta_import:256-275)."""
    return target.agg(F.max(delta_col).alias("wm")).collect()[0]["wm"]


def format_watermark_literal(value, value_type: str, dialect: str) -> str:
    """Render the watermark as a SOURCE-dialect literal for the remote WHERE
    clause (delta_import_on_primary_keys.sql:280-310 get_max_stmt_for_src):
    timestamp/date literal syntax differs per system, so the generated
    filter must speak each source's dialect — FF9 precision for
    Oracle/Exasol timestamps, CONVERT(...,121) truncated to milliseconds
    for SQL Server, STR_TO_DATE %f for MySQL, FF6 for Redshift/DB2,
    second precision for Postgres and Oracle DATE.
    """
    import datetime

    if isinstance(value, datetime.datetime):
        v = value.strftime("%Y-%m-%d %H:%M:%S.%f")
    elif isinstance(value, datetime.date):
        v = value.strftime("%Y-%m-%d 00:00:00.000000")
    else:
        v = str(value)
    t = value_type.upper()
    d = dialect.upper()
    if not (t.startswith("TIMESTAMP") or t == "DATE"):
        return f"'{v}'"
    if d == "MYSQL":
        return f"STR_TO_DATE('{v}', '%Y-%m-%d %H:%i:%s.%f')"
    if d == "SQLSERVER":
        # datetime is millisecond-precision: drop the last 3 digits (:287)
        return f"CONVERT(datetime,'{v[:-3]}', 121)"
    if d == "REDSHIFT":
        return f"to_timestamp('{v}', 'YYYY-MM-DD HH24:MI:SS.FF6')"
    if d == "DB2":
        return f"to_date('{v}','YYYY-MM-DD HH24.MI.SS.FF6')"
    if d in ("POSTGRES", "POSTGRESQL"):
        return f"to_date('{v}', 'YYYY-MM-DD HH24:MI:SS')"
    if d == "ORACLE" and t == "DATE":
        return f"to_date('{v}', 'YYYY-MM-DD HH24:MI:SS')"
    # ORACLE TIMESTAMP* and the EXASOL default
    return f"to_timestamp('{v}', 'YYYY-MM-DD HH24:MI:SS.FF9')"


def decide_strategy(
    keys: tuple[str, ...] | None, delta_col: str | None, wm
) -> SyncStrategy:
    if not keys:
        return SyncStrategy.TRUNCATE_FULL_LOAD
    if delta_col is None or wm is None:
        return SyncStrategy.FULL_LOAD_MERGE
    return SyncStrategy.DELTA_LOAD_MERGE


def merge_upsert(
    target: DataFrame,
    staging: DataFrame,
    keys: list[str],
    broadcast_staging: bool = False,
) -> DataFrame:
    """MERGE: staged rows replace key-matched target rows; the rest unions.

    Column sets may differ (cross_check_column_list, delta_import:180-192):
    only columns present in BOTH sides are kept — schema intersection, in
    target column order.
    """
    common = [c for c in target.columns if c in set(staging.columns)]
    t = target.select(common)
    s = staging.select(common)
    anti_side = F.broadcast(s) if broadcast_staging else s
    survivors = t.join(anti_side.select(keys), keys, "left_anti")
    return s.unionByName(survivors)


def plan_sync(
    source: DataFrame,
    target: DataFrame,
    keys: tuple[str, ...] | None,
    delta_col: str | None,
    source_dialect: str | None = None,
    delta_col_type: str = "TIMESTAMP",
) -> SyncPlan:
    """Decide the strategy and produce the reviewable plan (dry-run mode —
    delta_import:439-463 returns exactly such a preview table).

    With ``source_dialect`` set, the staging filter renders the watermark in
    that source system's literal syntax (remote-SQL parity mode) — the
    filter the reference pushes into the source's WHERE clause; otherwise a
    neutral quoted literal.
    """
    wm = watermark(target, delta_col) if delta_col and keys else None
    strat = decide_strategy(keys, delta_col, wm)
    stmts: list[str]
    if strat is SyncStrategy.TRUNCATE_FULL_LOAD:
        stmts = ["TRUNCATE target", "INSERT INTO target SELECT * FROM source"]
    elif strat is SyncStrategy.FULL_LOAD_MERGE:
        stmts = [
            "CREATE staging LIKE target",
            "INSERT INTO staging SELECT * FROM source",
            f"MERGE INTO target USING staging ON {list(keys or ())}",
            "DROP staging",
        ]
    else:
        lit = (
            format_watermark_literal(wm, delta_col_type, source_dialect)
            if source_dialect
            else f"'{wm}'"
        )
        stmts = [
            "CREATE staging LIKE target",
            f"INSERT INTO staging SELECT * FROM source WHERE {delta_col} >= {lit}",
            f"MERGE INTO target USING staging ON {list(keys or ())}",
            "DROP staging",
        ]
    return SyncPlan(strat, tuple(keys or ()), delta_col, wm, tuple(stmts))


def execute_sync(
    source: DataFrame,
    target: DataFrame,
    keys: tuple[str, ...] | None,
    delta_col: str | None,
) -> DataFrame:
    """Run the decided strategy, returning the new target content."""
    plan = plan_sync(source, target, keys, delta_col)
    if plan.strategy is SyncStrategy.TRUNCATE_FULL_LOAD:
        return source.select(target.columns)
    if plan.strategy is SyncStrategy.FULL_LOAD_MERGE:
        return merge_upsert(target, source, list(plan.keys))
    staging = source.where(F.col(plan.delta_col) >= F.lit(plan.watermark))
    return merge_upsert(target, staging, list(plan.keys))
