"""Privacy risk audit and enforcement for data release: k-anonymity /
l-diversity (Sweeney 2002; Machanavajjhala et al. 2007) over
quasi-identifier columns.

A migration or training-data export is a RELEASE: rows whose
quasi-identifier combination (the columns an adversary can link from
public data — region, segment, coarse account bands) is shared by fewer
than k other rows re-identify their subjects, and a class whose
sensitive column holds a single value leaks it even at large k
(homogeneity). The audit is one grouped aggregate; enforcement is
suppression — drop every row in a class below k — which is the only
k-anonymity mechanism with exact relational semantics (generalization
changes values; the callers of this module do that upstream with the
repo's exact bucketing idioms, e.g. ``acctbal div 1000``).

Everything is exact integer arithmetic (counts, ppm shares) so the
DuckDB oracle replays it verbatim; NULL is a quasi-identifier VALUE
(``GROUP BY`` semantics in both engines, and the suppression join is
null-safe) — an adversary can link "field left blank" like any other
value, so NULL classes are audited and suppressed like the rest.

Scale shape: the audit is ONE groupBy (map-side partials) whose result
is class-count-sized, then a driver-free single-row rollup. Suppression
re-attaches class sizes with a null-safe equi-join against the
class-count relation — broadcast when classes are dimension-sized (the
usual case: QI columns are deliberately coarse), shuffle otherwise;
never a window over the full relation (a partitionBy window would sort
the whole table to compute a count the partial-agg groupBy gets for
free).

Reference parity note: the reference migrates and validates data but
ships no release-risk audit; this is part of the training-pipeline
surface (LLM corpora and migrated snapshots both get released).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _require_cols(df: DataFrame, cols: list, what: str) -> None:
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(
            f"{what} columns {missing} not in the table "
            f"(columns: {df.columns})"
        )


def equivalence_classes(
    df: DataFrame, qi_cols: list, sensitive_col: "str | None" = None
) -> DataFrame:
    """The class relation: one row per distinct quasi-identifier
    combination with its member count (``class_size``) and, when a
    sensitive column is named, the count of DISTINCT sensitive values in
    the class (``l_distinct`` — the l-diversity statistic; NULL counts
    as a value there too: "sensitive field blank" is an answer)."""
    if not qi_cols:
        raise ValueError("k-anonymity needs at least one quasi-identifier")
    _require_cols(df, list(qi_cols), "quasi-identifier")
    aggs = [F.count(F.lit(1)).cast("long").alias("class_size")]
    if sensitive_col is not None:
        _require_cols(df, [sensitive_col], "sensitive")
        # count(DISTINCT x) skips NULL in both engines; add the NULL
        # slot explicitly so a blank sensitive field is one more answer
        aggs.append(
            (
                F.countDistinct(F.col(sensitive_col))
                + F.max(
                    F.when(F.col(sensitive_col).isNull(), 1).otherwise(0)
                )
            )
            .cast("long")
            .alias("l_distinct")
        )
    return df.groupBy(*[F.col(c) for c in qi_cols]).agg(*aggs)


def k_anonymity_report(
    df: DataFrame,
    qi_cols: list,
    sensitive_col: "str | None" = None,
    k_threshold: int = 5,
    l_threshold: int = 2,
) -> DataFrame:
    """ONE audit row for the release decision:

    - ``n_rows``, ``n_classes``: corpus and class populations.
    - ``k_min``: the dataset's k-anonymity (size of its smallest class —
      the worst-case re-identification pool).
    - ``classes_below_k`` / ``rows_below_k`` / ``rows_below_k_ppm``:
      how much suppression enforcing ``k_threshold`` would cost.
    - with ``sensitive_col``: ``l_min`` (the dataset's l-diversity) and
      ``rows_below_l`` (rows in homogeneity-attack range — classes with
      fewer than ``l_threshold`` distinct sensitive answers).

    Exact integers end to end (ppm by integer division), so the row is
    hash-comparable cross-engine."""
    if k_threshold < 1:
        raise ValueError("k_threshold must be >= 1 (k is a class size)")
    if l_threshold < 1:
        raise ValueError("l_threshold must be >= 1")
    classes = equivalence_classes(df, qi_cols, sensitive_col)
    # sums coalesce to 0 on an EMPTY table (SQL sums aggregate to NULL
    # and the CLI gate's `rows_below_k > 0` would TypeError on None —
    # review finding); k_min/l_min honestly stay NULL (no classes, no k)
    aggs = [
        F.coalesce(F.sum("class_size"), F.lit(0))
        .cast("long")
        .alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("class_size").cast("long").alias("k_min"),
        F.coalesce(
            F.sum(
                F.when(F.col("class_size") < k_threshold, 1).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("classes_below_k"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("class_size") < k_threshold,
                    F.col("class_size"),
                ).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("rows_below_k"),
    ]
    if sensitive_col is not None:
        aggs += [
            F.min("l_distinct").cast("long").alias("l_min"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("l_distinct") < l_threshold,
                        F.col("class_size"),
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("rows_below_l"),
        ]
    out = classes.agg(*aggs)
    return out.withColumn(
        "rows_below_k_ppm",
        # empty table: 0 rows at risk of 0 rows is 0 ppm, not a
        # divide-by-zero
        F.expr(
            "CASE WHEN n_rows = 0 THEN 0L "
            "ELSE rows_below_k * 1000000 div n_rows END"
        ).cast("long"),
    )


def generalization_advisor(
    df: DataFrame,
    qi_cols: list,
    band_col: str,
    widths: list,
    k_threshold: int = 5,
) -> DataFrame:
    """The ADVISE to :func:`suppress_below_k`'s ACT (the
    dist_key_advisor convention): suppression cost curves over candidate
    coarsenings of ONE numeric quasi-identifier — "which band width
    reaches k with minimal suppression". Generalization (wider bands)
    trades precision for anonymity; this measures the trade exactly
    instead of guessing it.

    ``band_col`` must be integer-typed (callers materialize exact units
    first — e.g. ``CAST(c_acctbal * 100 AS LONG)`` cents; the repo's
    div-grid rule). Each candidate width ``w`` coarsens it to
    ``floor(x / w)`` via the negative-safe exact form
    ``(x - pmod(x, w)) div w`` (pairing.py template — a bare ``div``
    truncates toward zero and shifts negative balances one band up);
    NULL stays NULL (a QI value, audited like any other).

    ONE stacked scan: every row explodes into its |widths| candidate
    bands (the dist_key_advisor shape — candidates × rows map-side, one
    groupBy to a class-count-sized relation, one rollup to |widths|
    rows). Output per width: ``n_rows``, ``n_classes``, ``k_min``,
    ``classes_below_k``, ``rows_below_k``, ``rows_below_k_ppm``,
    ``meets_k`` (1 when k_min >= k_threshold — suppression-free
    release at that coarsening). All exact integers, oracle-replayable.
    """
    if k_threshold < 1:
        raise ValueError("k_threshold must be >= 1 (k is a class size)")
    ws = [int(w) for w in widths]
    if not ws or any(w < 1 for w in ws) or len(set(ws)) != len(ws):
        raise ValueError(
            "widths must be a non-empty list of distinct integers >= 1 "
            f"(got {widths})"
        )
    _require_cols(df, list(qi_cols) + [band_col], "quasi-identifier")
    if band_col in qi_cols:
        raise ValueError(
            f"band_col {band_col!r} must not also appear in qi_cols — "
            "it is the column being coarsened"
        )
    dt = dict(df.dtypes)[band_col]
    if dt not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"band_col {band_col!r} is {dt} — materialize an exact "
            "integer unit first (e.g. CAST(balance * 100 AS LONG) "
            "cents); float banding shifts bucket edges between engines"
        )
    x = df.select(
        *qi_cols, F.col(band_col).cast("long").alias("_ga_x")
    )
    cands = F.array(
        *[
            F.struct(
                F.lit(w).cast("long").alias("width"),
                F.expr(
                    f"(_ga_x - pmod(_ga_x, {w})) div {w}"
                ).cast("long").alias("band"),
            )
            for w in ws
        ]
    )
    stacked = x.select(
        *qi_cols, F.explode(cands).alias("_g")
    ).select(*qi_cols, F.col("_g.width").alias("width"),
             F.col("_g.band").alias("band"))
    classes = stacked.groupBy(
        "width", *[F.col(c) for c in qi_cols], "band"
    ).agg(F.count(F.lit(1)).cast("long").alias("class_size"))
    below = F.when(F.col("class_size") < k_threshold, F.col("class_size"))
    return (
        classes.groupBy("width")
        .agg(
            F.sum("class_size").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.min("class_size").cast("long").alias("k_min"),
            F.coalesce(
                F.sum(
                    F.when(F.col("class_size") < k_threshold, 1).otherwise(0)
                ),
                F.lit(0),
            ).cast("long").alias("classes_below_k"),
            F.coalesce(F.sum(below.otherwise(0)), F.lit(0))
            .cast("long")
            .alias("rows_below_k"),
        )
        .withColumn(
            "rows_below_k_ppm",
            F.expr(
                "CASE WHEN n_rows = 0 THEN 0L "
                "ELSE rows_below_k * 1000000 div n_rows END"
            ).cast("long"),
        )
        .withColumn(
            "meets_k",
            F.when(
                F.col("k_min") >= F.lit(int(k_threshold)), F.lit(1)
            ).otherwise(F.lit(0)).cast("long"),
        )
    )


def suppress_below_k(
    df: DataFrame,
    qi_cols: list,
    k_threshold: int = 5,
    sensitive_col: "str | None" = None,
    l_threshold: int = 1,
    broadcast_classes: bool = True,
) -> DataFrame:
    """k-anonymity by suppression: keep exactly the rows whose
    quasi-identifier class has at least ``k_threshold`` members. The
    class-count relation joins back NULL-SAFELY (``<=>``): a class keyed
    on NULL must suppress or survive as a unit like any other — a plain
    equi-join would silently DROP every NULL-keyed row regardless of its
    class size, which fails open in the dangerous direction when the
    class is large (rows lost) and in the embarrassing one when it is
    small (suppression by accident, not policy). Output columns = input
    columns (the release relation), plus ``class_size`` so the caller
    can prove the floor held.

    With ``sensitive_col``, classes must ALSO carry at least
    ``l_threshold`` distinct sensitive answers (l-diversity enforcement
    — the audit's ``rows_below_l`` acted on: a large homogeneous class
    passes every k and still leaks its sensitive value to anyone who can
    place a subject in it).

    ``broadcast_classes`` (default on) HINTS the class relation to the
    broadcast side: it is post-aggregation, so Spark's size estimator
    misses it and would shuffle the full input to meet a dimension-sized
    count table (the pairing._dict_side lesson, 43 % of ER edge-gen at
    ×100). Quasi-identifiers are deliberately coarse, so classes are
    small by construction; opt out only for near-unique QI sets (where
    the audit would have told you k_min=1 anyway)."""
    if k_threshold < 1:
        raise ValueError("k_threshold must be >= 1 (k is a class size)")
    if l_threshold < 1:
        raise ValueError("l_threshold must be >= 1")
    classes = equivalence_classes(df, qi_cols, sensitive_col).where(
        F.col("class_size") >= k_threshold
    )
    if sensitive_col is not None:
        classes = classes.where(F.col("l_distinct") >= l_threshold)
    classes = classes.select(
        *[F.col(c).alias(f"_ka_{c}") for c in qi_cols], "class_size"
    )
    if broadcast_classes:
        classes = F.broadcast(classes)
    cond = None
    for c in qi_cols:
        leg = F.col(c).eqNullSafe(F.col(f"_ka_{c}"))
        cond = leg if cond is None else cond & leg
    return df.join(classes, cond, "inner").drop(
        *[f"_ka_{c}" for c in qi_cols]
    )
