"""Post-load type optimization: infer tighter types from the data itself.

References:
- /root/reference/post_load_optimization/convert_varchar.sql — single-pass
  short-circuit classification of VARCHAR values (:385-461, cheapest/most
  common branches first, comment :441-443), multi-format date probe with
  day/month-swap ambiguity detection (:119-172), sampling (:57-63, 1-5%
  "usually statistically sufficient", min 1000 rows), optimal-length
  heuristic (:90-96), FK key-group harmonization via union-find (:625-768).
- /root/reference/post_load_optimization/convert_datatypes.sql — VARCHAR /
  DECIMAL shrink from max-length scans (:294-298, :347-351), lossless
  double→decimal scale detection via round-trip counts for s∈0..9
  (:109-134), timestamp→date when no time-of-day (:449-453), report-only
  mode (apply_conversion=false, :49-62).

Spark shape: each scan is ONE ``df.agg`` over `when`-chain classification
expressions — lazily evaluated in branch order, exactly the reference's
short-circuit trick, whole-stage codegen'd. Decisions are pure Python over
the 1-row stats (unit-testable without Spark). Apply is dry-run by default.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# classification regexes (convert_varchar.sql:445-456 IS_NUMBER/IS_DATE/...)
RE_INT = r"^[-+]?\d+$"
RE_DEC = r"^[-+]?(\d+\.\d*|\.\d+)$"
RE_DBL = r"^[-+]?(\d+\.?\d*|\.\d+)[eE][-+]?\d+$"
RE_BOOL = r"^(?i)(true|false|t|f|0|1|y|n|yes|no)$"
RE_DATEISH = r"^\d{1,4}[-/.]\d{1,2}[-/.]\d{1,4}([ T].*)?$"
RE_LEADING_ZERO = r"^0\d"  # id-like: keep as text (convert_varchar.sql:433)
RE_PLUS = r"^\+"
# interval shapes (convert_varchar.sql:445-456 IS_DSINTERVAL/IS_YMINTERVAL):
# day-to-second 'D HH:MM:SS[.ffffff]' and year-to-month 'Y-M', with
# components range-checked (hour ≤ 23, min/sec ≤ 59, month ≤ 11) so a
# proposal's CAST cannot fail at apply time on values the classifier
# accepted — mirroring what the source engines' TO_*INTERVAL accept
RE_DSINT = r"^[-+]?\d+ ([01]?\d|2[0-3]):[0-5]\d:[0-5]\d(\.\d+)?$"
RE_YMINT = r"^[-+]?\d+-(1[01]|\d)$"

DATE_FORMATS = [  # candidate formats for the probe (convert_varchar.sql:119-145)
    ("yyyy-MM-dd", "%Y-%m-%d"),
    ("dd.MM.yyyy", "%d.%m.%Y"),
    ("MM/dd/yyyy", "%m/%d/%Y"),
    ("dd/MM/yyyy", "%d/%m/%Y"),
    ("yyyyMMdd", "%Y%m%d"),
]
# pairs whose simultaneous full match means day/month ambiguity (:160-172)
AMBIGUOUS_PAIRS = [("MM/dd/yyyy", "dd/MM/yyyy")]


def classify_expr(col: Column) -> Column:
    """Short-circuit single-pass class label per value (:385-461)."""
    return (
        F.when(col.isNull(), "NULL")
        .when(col.rlike(RE_INT), "INT")
        .when(col.rlike(RE_DEC), "DEC")
        .when(col.rlike(RE_DBL), "DBL")
        .when(col.rlike(RE_DATEISH), "DATEISH")
        .when(col.rlike(RE_DSINT), "DSINT")
        .when(col.rlike(RE_YMINT), "YMINT")
        .when(col.rlike(RE_BOOL), "BOOL")
        .otherwise("OTH")
    )


def classify_varchar_agg(df: DataFrame, column: str) -> DataFrame:
    """The single-scan classification aggregate as a 1-row DataFrame."""
    from database_migration_spark.functions.parallel import fan_out

    df = fan_out(df)
    c = F.col(column)
    cls = classify_expr(c)
    digits = F.length(F.regexp_replace(c, r"[^0-9]", ""))
    int_digits = F.length(F.regexp_replace(F.regexp_extract(c, r"^[-+]?(\d*)", 1), r"^0+", ""))
    frac_digits = F.length(F.regexp_extract(c, r"\.(\d+)", 1))
    is_num = cls.isin("INT", "DEC", "DBL")
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum((cls == k).cast("long")).alias(f"n_{k.lower()}")
            for k in ["NULL", "INT", "DEC", "DBL", "DATEISH", "DSINT", "YMINT", "BOOL", "OTH"]
        ],
        F.max(F.when(is_num, int_digits)).alias("max_int_digits"),
        F.max(F.when(is_num, frac_digits)).alias("max_frac_digits"),
        F.max(F.when(is_num, digits)).alias("max_digits"),
        F.max(F.length(c)).alias("max_len"),
        F.sum(c.rlike(RE_LEADING_ZERO).cast("long")).alias("n_leading_zero"),
        F.sum(c.rlike(RE_PLUS).cast("long")).alias("n_plus_sign"),
    )


def classify_varchar_oracle_sql(relation: str, column: str) -> str:
    """The identical classification aggregate as DuckDB SQL (RE2 regexes;
    the patterns above are chosen to mean the same in Java regex and RE2)."""
    c = f'"{column}"'
    def m(p: str) -> str:
        return f"regexp_matches({c}, '{p}')"
    cls = (
        f"CASE WHEN {c} IS NULL THEN 'NULL' "
        f"WHEN {m(RE_INT)} THEN 'INT' "
        f"WHEN {m(RE_DEC)} THEN 'DEC' "
        f"WHEN {m(RE_DBL)} THEN 'DBL' "
        f"WHEN {m(RE_DATEISH)} THEN 'DATEISH' "
        f"WHEN {m(RE_DSINT)} THEN 'DSINT' "
        f"WHEN {m(RE_YMINT)} THEN 'YMINT' "
        f"WHEN {m(RE_BOOL)} THEN 'BOOL' "
        f"ELSE 'OTH' END"
    )
    digits = f"length(regexp_replace({c}, '[^0-9]', '', 'g'))"
    int_digits = (
        f"length(regexp_replace(regexp_extract({c}, '^[-+]?(\\d*)', 1), '^0+', ''))"
    )
    frac_digits = f"length(regexp_extract({c}, '\\.(\\d+)', 1))"
    is_num = f"{cls} IN ('INT','DEC','DBL')"
    # CAST sums to BIGINT: DuckDB sums integers into HUGEINT, Spark into
    # BIGINT — align the declared types, not just the values
    parts = [f"count(*) AS n"]
    for k in ["NULL", "INT", "DEC", "DBL", "DATEISH", "DSINT", "YMINT", "BOOL", "OTH"]:
        parts.append(
            f"CAST(sum(CASE WHEN {cls} = '{k}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{k.lower()}"
        )
    parts += [
        f"max(CASE WHEN {is_num} THEN {int_digits} END) AS max_int_digits",
        f"max(CASE WHEN {is_num} THEN {frac_digits} END) AS max_frac_digits",
        f"max(CASE WHEN {is_num} THEN {digits} END) AS max_digits",
        f"max(length({c})) AS max_len",
        f"CAST(sum(CASE WHEN {m(RE_LEADING_ZERO)} THEN 1 ELSE 0 END) AS BIGINT) AS n_leading_zero",
        f"CAST(sum(CASE WHEN {m(RE_PLUS)} THEN 1 ELSE 0 END) AS BIGINT) AS n_plus_sign",
    ]
    return f"SELECT {', '.join(parts)} FROM {relation}"


def classify_varchar(
    df: DataFrame, column: str, sample_rows: int | None = None
) -> dict:
    """One aggregate pass → class counts + shape stats, as a plain dict.

    ``sample_rows``: LIMIT-style sampling (the reference samples 1-5%, min
    1000 rows, :57-63; omits the LIMIT on full scans — in Spark limit(n) is
    cheap either way).
    """
    if sample_rows:
        df = df.limit(sample_rows)
    return classify_varchar_agg(df, column).collect()[0].asDict()


def probe_date_formats(
    df: DataFrame, column: str, formats: list[tuple[str, str]] | None = None
) -> dict:
    """Per-candidate-format full-match counts in one agg (:119-172).

    A format "wins" if it parses every non-null value; ambiguity when a
    format AND its day/month swap both win.
    """
    formats = formats or DATE_FORMATS
    c = F.col(column)
    aggs = [F.sum(c.isNotNull().cast("long")).alias("n_values")]
    for spark_fmt, _ in formats:
        aggs.append(
            F.sum(F.try_to_timestamp(c, F.lit(spark_fmt)).isNotNull().cast("long")).alias(
                f"ok_{spark_fmt}"
            )
        )
    row = df.agg(*aggs).collect()[0].asDict()
    n = row["n_values"]
    winners = [f for f, _ in formats if n > 0 and row[f"ok_{f}"] == n]
    ambiguous = any(
        a in winners and b in winners for a, b in AMBIGUOUS_PAIRS
    )
    return {"n_values": n, "winners": winners, "ambiguous": ambiguous, **row}


@dataclass
class TypeProposal:
    column: str
    current_type: str
    proposed_type: str
    cast_expr: str  # SQL text for the ALTER/rewrite plan
    reason: str
    lossless: bool = True


def estimate_varchar_length(max_len: int, slack: float = 0.2, step: int = 10) -> int:
    """Shrink target: observed max + slack, rounded up to a step boundary
    (our deterministic variant of convert_varchar.sql:90-96's estimator —
    generous enough that reruns rarely flap, tight enough to matter)."""
    import math

    return max(step, int(math.ceil(max_len * (1 + slack) / step)) * step)


def propose_varchar_conversion(
    column: str, stats: dict, probe: dict | None = None, declared_len: int | None = None
) -> TypeProposal | None:
    """Decide the tighter type from classification stats (pure function)."""
    n = stats["n"]
    nn = n - stats["n_null"]
    if nn == 0:
        return None  # all NULL: nothing to infer (the reference skips too)
    q = f'"{column}"'
    # id-like guard: leading zeros / + signs mean "numeric-looking text"
    id_like = (stats["n_leading_zero"] or 0) > 0 or (stats["n_plus_sign"] or 0) > 0
    if stats["n_int"] == nn and not id_like:
        p = min(max(stats["max_int_digits"] or 1, 1), 36)
        return TypeProposal(column, "varchar", f"DECIMAL({p},0)",
                            f"CAST({q} AS DECIMAL({p},0))", "all values integer")
    if stats["n_int"] + stats["n_dec"] == nn and not id_like:
        s = min(stats["max_frac_digits"] or 0, 36)
        p = min((stats["max_int_digits"] or 0) + s, 36)
        p = max(p, 1)
        return TypeProposal(column, "varchar", f"DECIMAL({p},{s})",
                            f"CAST({q} AS DECIMAL({p},{s}))", "all values numeric")
    if stats["n_int"] + stats["n_dec"] + stats["n_dbl"] == nn and not id_like:
        return TypeProposal(column, "varchar", "DOUBLE",
                            f"CAST({q} AS DOUBLE)", "numeric incl. scientific",
                            lossless=False)
    if stats["n_bool"] == nn:
        return TypeProposal(column, "varchar", "BOOLEAN",
                            f"CAST({q} AS BOOLEAN)", "all values boolean-like")
    # interval proposals (the reference's IS_DSINTERVAL/IS_YMINTERVAL
    # branches; Spark's DayTimeIntervalType/YearMonthIntervalType)
    if stats.get("n_dsint", 0) == nn:
        return TypeProposal(column, "varchar", "INTERVAL DAY TO SECOND",
                            f"CAST({q} AS INTERVAL DAY TO SECOND)",
                            "all values day-time intervals")
    if stats.get("n_ymint", 0) == nn:
        return TypeProposal(column, "varchar", "INTERVAL YEAR TO MONTH",
                            f"CAST({q} AS INTERVAL YEAR TO MONTH)",
                            "all values year-month intervals")
    if stats["n_dateish"] == nn and probe and probe["winners"] and not probe["ambiguous"]:
        fmt = probe["winners"][0]
        return TypeProposal(column, "varchar", "DATE",
                            f"TO_DATE({q}, '{fmt}')", f"all values match {fmt}")
    # fall back to a shrink if we know the declared width
    if declared_len is not None:
        target = estimate_varchar_length(stats["max_len"] or 1)
        if target < declared_len:
            return TypeProposal(column, f"varchar({declared_len})", f"VARCHAR({target})",
                                f"CAST({q} AS VARCHAR({target}))",
                                f"max observed length {stats['max_len']}")
    return None


def double_scale_agg(df: DataFrame, column: str, max_scale: int = 9) -> DataFrame:
    """The round-trip violation counts as a 1-row DataFrame (one scan)."""
    c = F.col(column)
    aggs = [F.count(c).alias("n_values")]
    for s in range(max_scale + 1):
        rt = c.cast(f"decimal(36,{s})").cast("double")
        aggs.append(
            F.sum((c.isNotNull() & (rt != c)).cast("long")).alias(f"viol_{s}")
        )
    return df.agg(*aggs)


def double_scale_oracle_sql(relation: str, column: str, max_scale: int = 9) -> str:
    c = f'"{column}"'
    parts = [f"count({c}) AS n_values"]
    for s in range(max_scale + 1):
        rt = f"CAST(CAST({c} AS DECIMAL(36,{s})) AS DOUBLE)"
        parts.append(
            f"CAST(sum(CASE WHEN {c} IS NOT NULL AND {rt} <> {c} THEN 1 ELSE 0 END) AS BIGINT) AS viol_{s}"
        )
    return f"SELECT {', '.join(parts)} FROM {relation}"


def double_scale_detect(df: DataFrame, column: str, max_scale: int = 9) -> dict:
    """Lossless double→decimal detection (convert_datatypes.sql:109-134):
    for each s in 0..max_scale count round-trip violations
    ``cast(cast(v as decimal(36,s)) as double) <> v``; also max integer
    digits. One aggregate pass."""
    c = F.col(column)
    extra = df.agg(
        F.max(
            F.length(F.regexp_replace(F.abs(c).cast("string"), r"\..*$", ""))
        ).alias("max_int_digits")
    ).collect()[0].asDict()
    row = double_scale_agg(df, column, max_scale).collect()[0].asDict()
    best = next(
        (s for s in range(max_scale + 1) if row[f"viol_{s}"] == 0), None
    )
    return {"lossless_scale": best, **extra, **row}


def propose_double_conversion(column: str, det: dict) -> TypeProposal | None:
    s = det["lossless_scale"]
    if s is None or det["n_values"] == 0:
        return None
    p = min((det["max_int_digits"] or 1) + s, 36)
    return TypeProposal(
        column, "double", f"DECIMAL({p},{s})",
        f'CAST("{column}" AS DECIMAL({p},{s}))',
        f"all values round-trip at scale {s}",
    )


def timestamp_has_time(df: DataFrame, column: str) -> bool:
    """timestamp→date candidate check: any value with time-of-day?
    (convert_datatypes.sql:449-453 ``col <> TRUNC(col)``)."""
    c = F.col(column)
    row = df.agg(
        F.sum((c != F.date_trunc("day", c)).cast("long")).alias("with_time")
    ).collect()[0]
    return (row.with_time or 0) > 0


# --- apply-mode statement stream (convert_datatypes.sql:49-62,651-676) ----


def conversion_statements(
    proposals: dict[tuple[str, str], "TypeProposal | None"],
    fks: list = (),
    fold_case: bool = True,
    schema: "str | None" = None,
) -> "MigrationPlan":
    """Render accepted proposals as the reference's ordered apply stream
    (convert_datatypes.sql:651 "DROP FKs first, MODIFYs, RE-ADD FKs last";
    :243,603 ``ALTER TABLE s.t MODIFY (col TYPE);``). Dry-run object — the
    caller reviews ``to_sql()`` / executes statements one at a time, the
    safer path the reference itself recommends (:55-58).

    ``proposals``: {(table, column): TypeProposal|None} — None entries
    (columns inspected but kept, or vetoed by FK harmonization) are skipped.
    ``fks``: catalog KeyMeta FOREIGN KEYs; any FK touching a modified
    table+column is dropped first and re-added last in its original
    (DISABLEd — the only state our plans create) form.
    ``schema``: the schema the proposals belong to (the reference's
    conversion scripts operate one schema at a time). When given, MODIFY
    statements render schema-qualified — ``ALTER TABLE "S"."T" MODIFY`` —
    matching the DROP/RE-ADD CONSTRAINT statements in the same stream, so
    executing the stream verbatim never resolves against whatever the
    session's current schema happens to be. Omitting it is only safe when
    the executor pins the schema (e.g. ``OPEN SCHEMA``) first.
    """
    from database_migration_spark.catalog import fold_identifier
    from database_migration_spark.plans.statement_stream import (
        MigrationPlan,
        Statement,
    )

    accepted = {
        k: p for k, p in sorted(proposals.items()) if p is not None
    }
    plan = MigrationPlan()
    if not accepted:
        sec = plan.add_section("TYPE CONVERSIONS")
        sec.statements.append(
            Statement("no conversions proposed", kind="comment")
        )
        return plan

    modified = set(accepted)
    touched_fks = [
        fk
        for fk in fks
        if fk.kind == "FOREIGN KEY"
        and (
            any((fk.table, c) in modified for c in fk.columns)
            or any(
                (fk.ref_table, c) in modified for c in fk.ref_columns or ()
            )
        )
    ]

    def q(name: str) -> str:
        return '"' + fold_identifier(name, fold_case) + '"'

    if touched_fks:
        drop = plan.add_section("DROP FOREIGN KEYS")
        for fk in sorted(touched_fks, key=lambda k: (k.table, k.name)):
            drop.statements.append(Statement(render_fk_drop(fk, fold_case)))

    conv = plan.add_section("TYPE CONVERSIONS")
    for (tbl, col), p in accepted.items():
        # the reference's "conversion" report column: exact current type
        # on the left, exact target on the right (convert_datatypes.sql:33)
        conv.statements.append(
            Statement(
                f"{tbl}.{col}: {p.current_type} --> {p.proposed_type} "
                f"({p.reason})",
                kind="comment",
            )
        )
        qualified = f"{q(schema)}.{q(tbl)}" if schema else q(tbl)
        conv.statements.append(
            Statement(
                f"ALTER TABLE {qualified} MODIFY ({q(col)} {p.proposed_type});"
            )
        )

    if touched_fks:
        readd = plan.add_section("RE-ADD FOREIGN KEYS")
        for fk in sorted(touched_fks, key=lambda k: (k.table, k.name)):
            readd.statements.append(Statement(render_fk_readd(fk, fold_case)))
    return plan


def render_fk_drop(fk, fold_case: bool = True) -> str:
    """The FK DROP statement text — ONE implementation for the in-stream
    bracket (conversion_statements) and the hoisted cross-schema bracket
    (CLI optimize --apply): two copies of the template had already
    appeared and would drift (review finding; the publish-dance lesson)."""
    from database_migration_spark.catalog import fold_identifier

    def q(name: str) -> str:
        return '"' + fold_identifier(name, fold_case) + '"'

    return (
        f"ALTER TABLE {q(fk.schema)}.{q(fk.table)} "
        f"DROP CONSTRAINT {q(fk.name)};"
    )


def render_fk_readd(fk, fold_case: bool = True) -> str:
    """The FK RE-ADD statement text (DISABLE — the reference's
    constraints-disabled-for-load convention); see render_fk_drop."""
    from database_migration_spark.catalog import fold_identifier

    def q(name: str) -> str:
        return '"' + fold_identifier(name, fold_case) + '"'

    cols = ", ".join(q(c) for c in fk.columns)
    rcols = ", ".join(q(c) for c in fk.ref_columns or ())
    return (
        f"ALTER TABLE {q(fk.schema)}.{q(fk.table)} "
        f"ADD CONSTRAINT {q(fk.name)} FOREIGN KEY ({cols}) "
        f"REFERENCES {q(fk.ref_schema or fk.schema)}."
        f"{q(fk.ref_table or '')} ({rcols}) DISABLE;"
    )


def veto_out_of_scope_fk(
    proposals: dict,
    fk_edges: list,
    scanned_tables: set,
) -> tuple[dict, set]:
    """Veto conversions whose FK partner TABLE was not scanned: converting
    one side of a key pair alone breaks the pair's type agreement, and the
    reference's key-group harmonization operates schema-wide so it never
    sees a half-scanned pair. A partner COLUMN merely absent from
    proposals (its type was already tight) does NOT veto — its table was
    inspected, so the disagreement belongs to :func:`harmonize_fk_groups`.

    Keys may be ``(table, column)`` with ``scanned_tables`` holding bare
    table names, or ``(schema, table, column)`` with ``scanned_tables``
    holding ``(schema, table)`` pairs — the qualified form is what a
    multi-schema scan must use (same-named tables in different schemas
    are distinct objects).

    Returns (proposals with vetoed entries set to None, the vetoed keys).
    """
    def table_of(key):
        return key[0] if len(key) == 2 else key[:-1]

    out = dict(proposals)
    vetoed: set = set()
    for a, b in fk_edges:
        for inside, partner in ((a, b), (b, a)):
            if (
                inside in out
                and out.get(inside) is not None
                and table_of(partner) not in scanned_tables
            ):
                out[inside] = None
                vetoed.add(inside)
    return out, vetoed


# --- FK key-group harmonization (convert_varchar.sql:625-768) -------------

class UnionFind:
    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        self.parent.setdefault(x, x)
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


def harmonize_fk_groups(
    proposals: dict[tuple[str, str], TypeProposal | None],
    fk_edges: list[tuple[tuple[str, str], tuple[str, str]]],
) -> dict[tuple[str, str], TypeProposal | None]:
    """Columns linked by FK relations must convert identically or not at all
    (the reference's key-group harmonization): if any member of a group has
    no proposal or proposals disagree on type, the whole group is dropped.
    """
    uf = UnionFind()
    for (a, b) in fk_edges:
        uf.union(a, b)
    groups: dict = {}
    for key in proposals:
        groups.setdefault(uf.find(key), []).append(key)
    # singletons not in any edge stay as-is; grouped keys must agree
    out = dict(proposals)
    for root, members in groups.items():
        if len(members) == 1:
            continue
        types = {
            (proposals[m].proposed_type if proposals[m] else None) for m in members
        }
        if len(types) != 1 or None in types:
            for m in members:
                out[m] = None
    return out
