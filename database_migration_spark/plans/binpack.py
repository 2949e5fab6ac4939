"""JDBC import partition planner: balanced bin packing + hash split.

Reference: /root/reference/oracle_to_exasol.sql —
- partition counts collected per source partition (:156-193, ordered
  largest-first; the comment at :186 says "do not remove the order by"),
- greedy bin packing: each partition assigned to the least-loaded of N bins
  (:210-252), one UNION-ALL import statement per bin (:554-565);
- hash-split fallback when the table has no partitions: one predicate
  ``MOD(ORA_HASH(ROWID), N) = i`` per parallel statement (:567-573).

Spark shape: the planner emits a ``predicates=[...]`` list for
``spark.read.jdbc(url, table, predicates=...)`` — one JDBC connection per
predicate, exactly the reference's N parallel IMPORTs. AQE then rebalances
residual skew after the scan. Pure Python, unit-testable.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class PartitionInfo:
    name: str  # source partition identifier
    row_count: int


@dataclass
class ImportPlan:
    """One JDBC predicate per parallel reader."""

    predicates: list[str]
    bins: list[list[str]]  # partition names per bin (empty for hash split)
    strategy: str  # "partition_binpack" | "hash_split" | "range_split"
    fetchsize: int = 100_000  # reference default (README.md:70-77)


def binpack_partitions(
    parts: list[PartitionInfo], n_bins: int
) -> list[list[PartitionInfo]]:
    """Greedy: sort partitions largest-first, assign each to the least-loaded
    bin (oracle_to_exasol.sql:210-252). Returns non-empty bins."""
    parts = sorted(parts, key=lambda p: (-p.row_count, p.name))
    bins: list[list[PartitionInfo]] = [[] for _ in range(max(1, n_bins))]
    loads = [0] * len(bins)
    for p in parts:
        i = loads.index(min(loads))
        bins[i].append(p)
        loads[i] += p.row_count
    return [b for b in bins if b]


def plan_partitioned_import(
    parts: list[PartitionInfo],
    n_parallel: int,
    partition_predicate: str = "PARTITION_NAME = '{p}'",
) -> ImportPlan:
    """Bin-pack named partitions into N predicate groups.

    Empty partitions are dropped first (the reference filters ``CNT > 0`` —
    oracle_to_exasol.sql:191-192).
    """
    parts = [p for p in parts if p.row_count > 0]
    bins = binpack_partitions(parts, n_parallel)
    predicates = [
        " OR ".join(partition_predicate.format(p=p.name) for p in b) for b in bins
    ]
    return ImportPlan(
        predicates=predicates,
        bins=[[p.name for p in b] for b in bins],
        strategy="partition_binpack",
    )


def plan_hash_split(
    n_parallel: int, hash_expr: str = "MOD(ORA_HASH(ROWID), {n})"
) -> ImportPlan:
    """Hash-split fallback (oracle_to_exasol.sql:567-573): uniform pseudo-
    random split, no catalog knowledge needed."""
    h = hash_expr.format(n=n_parallel)
    return ImportPlan(
        predicates=[f"{h} = {i}" for i in range(n_parallel)],
        bins=[],
        strategy="hash_split",
    )


def plan_range_split(
    column: str, lower, upper, n_parallel: int
) -> ImportPlan:
    """Numeric/temporal range split — the generic-JDBC equivalent of
    partitionColumn/lowerBound/upperBound/numPartitions, materialized as
    explicit predicates so boundary handling is visible and testable."""
    if n_parallel < 1:
        n_parallel = 1
    width = (upper - lower) / n_parallel
    preds = []
    for i in range(n_parallel):
        lo = lower + i * width
        hi = lower + (i + 1) * width
        if i == 0:
            preds.append(f"{column} < {hi!r}")
        elif i == n_parallel - 1:
            preds.append(f"{column} >= {lo!r}")
        else:
            preds.append(f"{column} >= {lo!r} AND {column} < {hi!r}")
    # NULLs would be silently dropped by range predicates; route them to bin 0
    preds[0] = f"({preds[0]}) OR {column} IS NULL"
    return ImportPlan(predicates=preds, bins=[], strategy="range_split")


def read_jdbc_partitioned(
    spark,
    url: str,
    table: str,
    plan: ImportPlan,
    properties: dict[str, str] | None = None,
):
    """Execute an ImportPlan: one JDBC reader per predicate, reference
    fetchsize tuning applied (README.md:70-77 FETCHSIZE=100000)."""
    props = dict(properties or {})
    props.setdefault("fetchsize", str(plan.fetchsize))
    return spark.read.jdbc(
        url=url, table=table, predicates=plan.predicates, properties=props
    )
