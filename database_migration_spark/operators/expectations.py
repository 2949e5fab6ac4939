"""Declarative data-quality expectations compiled to a single scan.

The dbt-test / Great-Expectations workflow over Spark: a rule list
(not-null, value range, accepted values, uniqueness, row count, regex
share) compiles into ONE aggregate row — every rule is a conditional
aggregate over the same pass, exactly the single-scan wide-row design the
MIG_CHK validator uses (operators/validate.py; the reference computes all
its per-column metrics in one SELECT the same way,
mysql_to_exasol.sql:269-289) — then unpivots to a per-rule report:

    (rule_id, rule, column_name, measured, threshold, status)

Scale shape: one scan + one 1-row aggregate regardless of rule count;
uniqueness rules add a count-distinct (isolated Expand, the mig_check
pattern). PASS/FAIL is computed engine-side so a CI gate needs only
``WHERE status = 'FAIL'``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F


@dataclass
class Expectation:
    """One declarative rule. ``kind`` ∈ {not_null, in_range,
    accepted_values, unique, row_count_between, matches_regex}."""

    rule_id: str
    kind: str
    column: str = ""
    params: dict = field(default_factory=dict)

    def describe(self) -> str:
        p = self.params
        return {
            "not_null": lambda: f"{self.column} has no NULLs",
            "in_range": lambda: f"{self.column} in [{p['lo']}, {p['hi']}]",
            "accepted_values": lambda: f"{self.column} in {sorted(p['values'])}",
            "unique": lambda: f"({', '.join(p['columns'])}) unique",
            "row_count_between": lambda: f"rowcount in [{p['lo']}, {p['hi']}]",
            "matches_regex": lambda: (
                f"{self.column} matches {p['pattern']} in >={p['min_ppm']} ppm"
            ),
        }[self.kind]()


def _violations(e: Expectation) -> Column:
    """Measured value for one rule — violation count (or ppm/row count),
    every form a plain conditional aggregate except unique's distinct."""
    c = F.col(e.column) if e.column else None
    p = e.params
    if e.kind == "not_null":
        return F.sum(F.when(c.isNull(), 1).otherwise(0)).cast("long")
    if e.kind == "in_range":
        bad = c.isNull() | (c < F.lit(p["lo"])) | (c > F.lit(p["hi"]))
        return F.sum(F.when(bad, 1).otherwise(0)).cast("long")
    if e.kind == "accepted_values":
        bad = c.isNull() | ~c.isin(list(p["values"]))
        return F.sum(F.when(bad, 1).otherwise(0)).cast("long")
    if e.kind == "unique":
        # duplicates = rows − distinct keys (NULL-safe via coalesced concat)
        key = F.concat_ws("\x00", *[
            F.coalesce(F.col(k).cast("string"), F.lit("\x01"))
            for k in p["columns"]
        ])
        return (F.count(F.lit(1)) - F.count_distinct(key)).cast("long")
    if e.kind == "row_count_between":
        return F.count(F.lit(1)).cast("long")
    # matches_regex is assembled in run_expectations (its exact-ppm floor
    # division needs the two integer aggregates as separate columns)
    raise ValueError(f"unknown expectation kind {e.kind!r}")


def _status(e: Expectation, measured: Column) -> Column:
    p = e.params
    if e.kind == "row_count_between":
        ok = (measured >= F.lit(p["lo"])) & (measured <= F.lit(p["hi"]))
    elif e.kind == "matches_regex":
        ok = measured >= F.lit(p["min_ppm"])
    else:
        ok = measured <= F.lit(int(p.get("max_violations", 0)))
    return F.when(ok, F.lit("PASS")).otherwise(F.lit("FAIL"))


def _threshold(e: Expectation) -> int:
    p = e.params
    if e.kind == "row_count_between":
        return int(p["hi"])
    if e.kind == "matches_regex":
        return int(p["min_ppm"])
    return int(p.get("max_violations", 0))


def run_expectations(df: DataFrame, rules: list[Expectation]) -> DataFrame:
    """Evaluate every rule over one pass of the data; returns the per-rule
    report sorted by rule_id. ``matches_regex`` measures in exact integer
    ppm (floor), matching the repo's cross-engine arithmetic rules.

    Plan shape: uniqueness rules need a count-distinct whose Expand Spark
    will NOT merge into the plain aggregate (a mixed agg re-reads the
    source) — so, like ``validate.compute_metrics_wide``, plain and
    distinct run as separate 1-row aggregates cross-joined back together.
    When the two rule sets read the same columns Catalyst shares one
    fanned exchange (ReusedExchange); when they are column-disjoint (the
    usual case — PK columns vs measure columns) it plans two scans EACH
    PRUNED to its own columns, which moves strictly less data than one
    union-of-columns exchange would."""
    import re as _re

    from database_migration_spark.functions.parallel import fan_out

    if not rules:
        raise ValueError("rules must be non-empty")
    ids = [e.rule_id for e in rules]
    if len(set(ids)) != len(ids):
        dupes = sorted({i for i in ids if ids.count(i) > 1})
        raise ValueError(f"duplicate rule_id(s): {dupes}")
    bad_ids = [i for i in ids if not _re.fullmatch(r"[A-Za-z0-9_]+", i)]
    if bad_ids:
        # rule_ids become column aliases/expr fragments — restrict them
        # before Catalyst turns a stray backtick into an opaque parse error
        raise ValueError(f"rule_id must be [A-Za-z0-9_]+: {bad_ids}")

    plain, distinct = [], []
    for e in rules:
        if e.kind == "matches_regex":
            # exact ppm: integer sums, floor division AFTER the aggregate
            ok = F.sum(F.when(F.col(e.column).rlike(e.params["pattern"]), 1)
                       .otherwise(0)).cast("long")
            plain.append((ok * F.lit(1_000_000)).alias(f"_ok_{e.rule_id}"))
            plain.append(F.count(F.lit(1)).cast("long").alias(f"_n_{e.rule_id}"))
        elif e.kind == "unique":
            distinct.append(_violations(e).alias(f"_m_{e.rule_id}"))
        else:
            plain.append(_violations(e).alias(f"_m_{e.rule_id}"))
    if distinct and plain:
        fanned = fan_out(df)
        wide = fanned.agg(*plain).crossJoin(fanned.agg(*distinct))
    elif distinct:
        # a unique-only rule file (the canonical dbt PK test) has no plain
        # aggregates; agg() rejects an empty list
        wide = df.agg(*distinct)
    else:
        wide = df.agg(*plain)

    rows = []
    for e in rules:
        if e.kind == "matches_regex":
            # empty table: the share is vacuously full (all zero rows
            # match), mirroring not_null's 0-violations pass — and `0 div
            # 0` would otherwise be NULL and always FAIL
            measured = F.when(
                F.col(f"_n_{e.rule_id}") == 0, F.lit(1_000_000)
            ).otherwise(
                F.expr(f"`_ok_{e.rule_id}` div `_n_{e.rule_id}`")
            ).cast("long")
        else:
            measured = F.col(f"_m_{e.rule_id}").cast("long")
        rows.append(
            F.struct(
                F.lit(e.rule_id).alias("rule_id"),
                F.lit(e.describe()).alias("rule"),
                F.lit(e.column or "*").alias("column_name"),
                measured.alias("measured"),
                F.lit(_threshold(e)).cast("long").alias("threshold"),
                _status(e, measured).alias("status"),
            )
        )
    return (
        wide.select(F.explode(F.array(*rows)).alias("r"))
        .select("r.*")
        .orderBy("rule_id")
    )
