"""Row-level table diff: hash-compare two versions of a table on its key.

The metric engine (operators/validate.py — the reference's MIG_CHK diff,
database_compare/compare_db.sql) answers "do these tables agree in
aggregate?"; this operator answers the follow-up a migration engineer asks
the moment a metric deviates: WHICH rows differ, and in which columns.
It is the datacompy / data-diff capability re-expressed for Spark scale.

Scale shape (the part that matters at 100 TB):

- Phase 1 never shuffles wide rows. Each side is projected to
  ``keys + md5(canonical row rendering)`` — a ~40-byte tuple regardless of
  row width — and the two projections full-outer join on the keys. Row
  fates (added / removed / changed / unchanged) fall out of NULL-ness and
  hash inequality.
- Phase 2 re-attaches full rows ONLY for changed keys (an inner join of
  the changed-key relation — typically a tiny fraction — against each
  side), then unpivots the per-column comparison to a tall
  ``(key, column_name, left_value, right_value)`` relation. The wide
  shuffle is proportional to the number of CHANGED rows, not the table.

Hashing: full 32-hex md5 (128-bit) of a canonical rendering — each compare
column cast to string and length-prefixed (``"<len>:<value>"``, NULL →
``"N"``), so no concatenation of values is ambiguous regardless of what
bytes the data contains. The hash is engine-internal (both sides computed
by Spark), so no cross-engine hash portability is required — unlike the
fingerprint operators, which must match DuckDB bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

def _canonical_sql(col: str) -> str:
    s = f"string(`{col}`)"
    return (
        f"CASE WHEN {s} IS NULL THEN 'N' "
        f"ELSE concat(string(length({s})), ':', {s}) END"
    )


def row_hash(cols: list[str]) -> Column:
    """md5 over the canonical rendering of ``cols`` (order-sensitive).
    One SQL string (the r12 convention — the chained-Column form cost ~8
    py4j round-trips per column per side)."""
    return F.expr(
        f"md5(concat({', '.join(_canonical_sql(c) for c in cols)}))"
    )


def _key_eq(left: DataFrame, right: DataFrame, keys: list[str]) -> Column:
    cond = None
    for k in keys:
        c = left[k].eqNullSafe(right[k])
        cond = c if cond is None else cond & c
    return cond


def row_diff(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Classify every key: ``(keys..., diff_kind)``.

    ``diff_kind`` ∈ added (key only in right — right is "new"), removed
    (key only in left), changed (both sides, compare-column rendering
    differs), unchanged (emitted only with ``include_unchanged``; at scale
    you never materialize the unchanged set — it is the table).
    """
    if compare_cols is None:
        compare_cols = [c for c in left.columns if c not in keys]
    missing = [c for c in compare_cols + keys if c not in right.columns]
    if missing:
        raise ValueError(f"columns missing from right side: {missing}")

    lh = left.select(*keys, row_hash(compare_cols).alias("_lh"))
    rh_ = right.select(*keys, row_hash(compare_cols).alias("_rh"))
    j = lh.alias("l").join(rh_.alias("r"), _key_eq(lh, rh_, keys), "full_outer")
    kind = (
        F.when(F.col("l._lh").isNull(), F.lit("added"))
        .when(F.col("r._rh").isNull(), F.lit("removed"))
        .when(F.col("l._lh") != F.col("r._rh"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(
        *[F.coalesce(F.col(f"l.{k}"), F.col(f"r.{k}")).alias(k) for k in keys],
        kind.alias("diff_kind"),
    )
    if not include_unchanged:
        out = out.where(F.col("diff_kind") != "unchanged")
    return out


def changed_cells(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    diff: DataFrame,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Phase 2: per-column attribution for the CHANGED keys only —
    ``(keys..., column_name, left_value, right_value)``, values rendered
    as strings (NULL stays NULL). ``diff`` is :func:`row_diff` output (or
    any relation carrying the keys + diff_kind)."""
    if compare_cols is None:
        compare_cols = [c for c in left.columns if c not in keys]
    changed = diff.where(F.col("diff_kind") == "changed").select(*keys)
    # the semi-joins must be NULL-SAFE like phase 1's key match: a plain
    # name join never matches NULL keys, so a NULL-keyed changed row
    # would be counted in the fates but silently vanish from the cells
    l = left.join(changed, _key_eq(left, changed, keys), "left_semi").alias("l")
    r = right.join(changed, _key_eq(right, changed, keys), "left_semi").alias("r")
    j = l.join(r, _key_eq(l, r, keys))
    # one selectExpr bundle (r12 convention): each struct literal was ~6
    # py4j round-trips; the column-name literal escapes like a SQL string
    structs = ", ".join(
        "named_struct('column_name', '"
        + c.replace("\\", "\\\\").replace("'", "\\'")
        + f"', 'left_value', string(l.`{c}`),"
        f" 'right_value', string(r.`{c}`))"
        for c in compare_cols
    )
    cells = j.selectExpr(
        *[f"l.`{k}` AS `{k}`" for k in keys],
        f"array({structs}) AS _cells",
    )
    cell = F.explode(
        F.expr("filter(_cells, s -> NOT (s.left_value <=> s.right_value))")
    ).alias("cell")
    return cells.select(*keys, cell).select(
        *keys,
        F.col("cell.column_name").alias("column_name"),
        F.col("cell.left_value").alias("left_value"),
        F.col("cell.right_value").alias("right_value"),
    )


def diff_report(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
    diff: DataFrame | None = None,
) -> DataFrame:
    """One-stop report: ``(diff_kind, column_name, n_rows)`` — the three
    row-fate counts plus one ``changed:<col>`` count per attributed
    column. The summary a CLI or CI gate prints; both phases' shuffles
    stay narrow (phase-1 hashes, phase-2 changed rows only).

    ``diff`` accepts a precomputed (ideally persisted) :func:`row_diff`
    so a caller that also wants the cells doesn't pay phase 1 twice."""
    from pyspark import StorageLevel

    d = diff if diff is not None else row_diff(
        left, right, keys, compare_cols
    ).persist(StorageLevel.MEMORY_AND_DISK)
    fates = d.groupBy("diff_kind").agg(F.count("*").alias("n_rows")).select(
        "diff_kind", F.lit(None).cast("string").alias("column_name"), "n_rows"
    )
    cells = (
        changed_cells(left, right, keys, d, compare_cols)
        .groupBy("column_name")
        .agg(F.count("*").alias("n_rows"))
        .select(F.lit("changed").alias("diff_kind"), "column_name", "n_rows")
    )
    return fates.unionByName(cells)
