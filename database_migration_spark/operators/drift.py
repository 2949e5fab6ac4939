"""Distribution drift between two relations: the validation the metric
engine can't see.

The metric comparison (operators/validate.py — the reference's MIG_CHK
row, mysql_to_exasol.sql:249-318) proves counts/sums/min/max survived a
migration; two relations can pass ALL of those while the value
distribution quietly shifted (a lossy type mapping collapsing decimals,
a timezone bug sliding timestamps, a delta-sync dropping one tenant's
mid-range rows). This operator compares the distributions themselves:

- each column e6-quantizes through the DECIMAL fixed-point idiom the
  z-order layout proved (floor(DECIMAL(26,12) · 1e6) — never a DOUBLE
  product; exact for |v| ≤ ~9e12, try_cast so wilder values become the
  NULL bin instead of an ANSI crash);
- both sides stack into ONE skinny (column, side, q) stream — a single
  scan per side for any number of columns (the dist_key_advisor shape);
- bins are exact integer arithmetic end-to-end: per-column span from
  both sides, ``width = ceil(span / n_bins)`` as ``(s + n - 1) div n``
  (the Spark/DuckDB-safe ceil — a negated-div trick diverges), bin =
  ``(q - lo) div width`` in DECIMAL(38,0) (a stale-range q-lo can
  exceed BIGINT);
- per-side bin shares in integer ppm, and the drift statistic is the
  TOTAL VARIATION distance ``Σ|l_ppm - r_ppm| div 2`` — a real
  statistical distance that stays exactly integer cross-engine, where
  PSI/KL's logarithms would hash-diverge on libm rounding.

NULLs are a first-class bin (-1): a migration that nulls a column out
is drift, not invisible. Scale shape: one scan per side, one groupBy on
(column, bin) — output is columns × bins rows, constant in row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

# two-regime quantization: the fine path keeps e6 fractional resolution
# (exact to |v| ~9e12 — the z-order bound); values past it (epoch-µs
# BIGINTs ~1.7e15, big surrogate keys) fall back to unit resolution
# (floor at 6dp then scale — exact to |v| ~1e30, where e6 cells are
# irrelevant anyway). Without the fallback every wide value try_casts to
# NULL and a drifted column reads ZERO — the same all-NULL false-negative
# the categorical hash-bin dispatch closes for strings.
_Q = (
    "coalesce("
    "CAST(floor(try_cast({c} AS DECIMAL(26,12)) * 1000000) AS DECIMAL(38,0)), "
    "CAST(CAST(floor(try_cast({c} AS DECIMAL(36,6))) AS DECIMAL(32,0)) "
    "* 1000000 AS DECIMAL(38,0)))"
)

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def _q_expr(df: DataFrame, c: str, n_bins: int) -> str:
    """Numeric columns quantize to e6 fixed-point and bin by value range;
    everything else (strings, booleans, dates rendered as strings) hashes
    straight into its bin — ``pmod(md5_long, n_bins)`` — so a categorical
    share shift moves hash-bucket shares instead of silently try_casting
    to an all-NULL column that reads zero drift (the trap this dispatch
    exists to close). Hash bins are already final: the span/width pass
    sees them as values 0..n_bins-1 with width 1."""
    if isinstance(df.schema[c].dataType, _NUMERIC):
        return _Q.format(c=c)
    # the portable 60-bit md5 integer (functions/hashing.md5_long) as SQL
    # text; DuckDB side: ('0x' || substr(md5(x), 1, 15))::BIGINT % n
    h = f"CAST(conv(substring(md5(CAST({c} AS STRING)), 1, 15), 16, 10) AS BIGINT)"
    return (
        f"CASE WHEN {c} IS NULL THEN CAST(NULL AS DECIMAL(38,0)) "
        f"ELSE CAST(pmod({h}, {n_bins}) AS DECIMAL(38,0)) END"
    )


def _col_kind(df: DataFrame, c: str) -> str:
    """The binning family :func:`_q_expr` dispatches ``c`` into — stored in
    reference histograms so a later batch with a changed column type fails
    loudly instead of comparing hash bins against value bins."""
    return "numeric" if isinstance(df.schema[c].dataType, _NUMERIC) else "categorical"


def _stacked(
    df: DataFrame, cols: list[str], side: str, n_bins: int
) -> DataFrame:
    args = ", ".join(f"'{c}', {_q_expr(df, c, n_bins)}" for c in cols)
    return df.select(
        F.expr(f"stack({len(cols)}, {args}) AS (column_name, q)"),
    ).select("column_name", "q", F.lit(side).alias("side"))


def distribution_drift(
    left: DataFrame, right: DataFrame, cols: list[str], n_bins: int = 16
) -> DataFrame:
    """Per-(column, bin) comparison report.

    Columns out: ``column_name, bin`` (−1 = NULL/unquantizable),
    ``bin_lo_e6`` (inclusive lower bound in e6 fixed-point, as a string —
    NULL for the NULL bin; for CATEGORICAL columns this is the bin's hash
    identity, not a value bound), ``l_cnt, r_cnt, l_ppm, r_ppm`` (side
    shares over that side's TOTAL rows incl. the NULL bin; NULL when the
    side is empty) and ``abs_diff_ppm``. Bins neither side hit are absent
    (their diff is 0). Numeric columns bin by value range; string/other
    columns hash into ``n_bins`` md5 buckets (see :func:`_q_expr`) — a
    type mismatch between the sides raises rather than comparing
    different binnings. Feed :func:`drift_summary` for the per-column
    verdict (KS is order-based and thus only meaningful for numeric
    columns; for hash bins read TV).
    """
    if not cols:
        raise ValueError("need at least one column")
    if n_bins <= 0:
        raise ValueError("n_bins must be positive")
    for c in cols:
        if not isinstance(
            left.schema[c].dataType, type(right.schema[c].dataType)
        ):
            raise ValueError(
                f"column {c!r} has different types on the two sides "
                f"({left.schema[c].dataType.simpleString()} vs "
                f"{right.schema[c].dataType.simpleString()}) — a numeric/"
                "categorical binning mismatch would compare different bins"
            )
    both = _stacked(left, cols, "l", n_bins).unionByName(
        _stacked(right, cols, "r", n_bins)
    )
    # collapse to per-(column, value, side) counts FIRST — one scan per
    # side total, and the span/binning branches below then read this
    # distinct-value-sized relation instead of re-scanning the inputs
    # (the dist_key_advisor per_value shape; CLAUDE.md multi-branch rule)
    per_value = both.groupBy("column_name", "q", "side").agg(
        F.count(F.lit(1)).alias("cnt")
    ).persist()
    per_bin_key = per_value.join(
        F.broadcast(
            per_value.where(F.col("q").isNotNull())
            .groupBy("column_name")
            .agg(F.min("q").alias("_lo"), F.max("q").alias("_hi"))
        ),
        "column_name",
        "left",
    ).select(
        "column_name",
        "side",
        "cnt",
        F.when(
            F.col("q").isNull(), F.lit(-1).cast("long")
        ).otherwise(
            F.expr(
                f"CAST((q - _lo) div ((_hi - _lo + {n_bins}) div {n_bins}) "
                "AS BIGINT)"
            )
        ).alias("bin"),
        F.col("_lo"),
        F.expr(f"(_hi - _lo + {n_bins}) div {n_bins}").alias("_w"),
    )
    per_bin = (
        per_bin_key.groupBy("column_name", "bin")
        .agg(
            F.sum(F.when(F.col("side") == "l", F.col("cnt")).otherwise(0)).alias("l_cnt"),
            F.sum(F.when(F.col("side") == "r", F.col("cnt")).otherwise(0)).alias("r_cnt"),
            F.min("_lo").alias("_lo"),
            F.min("_w").alias("_w"),
        )
        .persist()
    )
    totals = per_bin.groupBy("column_name").agg(
        F.sum("l_cnt").alias("_lt"), F.sum("r_cnt").alias("_rt")
    )
    ppm = (
        "CAST(CASE WHEN {tot} > 0 THEN "
        "CAST({cnt} AS DECIMAL(38,0)) * 1000000 div {tot} END AS BIGINT)"
    )
    return (
        per_bin.join(F.broadcast(totals), "column_name")
        .select(
            "column_name",
            "bin",
            F.when(
                F.col("bin") >= 0,
                (F.col("_lo") + F.col("bin") * F.col("_w")).cast("string"),
            ).alias("bin_lo_e6"),
            "l_cnt",
            "r_cnt",
            F.expr(ppm.format(cnt="l_cnt", tot="_lt")).alias("l_ppm"),
            F.expr(ppm.format(cnt="r_cnt", tot="_rt")).alias("r_ppm"),
            F.abs(
                F.coalesce(F.expr(ppm.format(cnt="l_cnt", tot="_lt")), F.lit(0))
                - F.coalesce(F.expr(ppm.format(cnt="r_cnt", tot="_rt")), F.lit(0))
            ).alias("abs_diff_ppm"),
        )
    )


def reference_histogram(
    df: DataFrame, cols: list[str], n_bins: int = 16
) -> DataFrame:
    """Freeze a relation's per-column histogram as the monitoring
    reference: ``column_name, bin, ref_ppm, _lo, _w, _kind, _n_bins`` —
    the bin GEOMETRY (span lower bound + width, or hash identity for
    categoricals, plus each column's numeric/categorical KIND and the bin
    count) travels with the shares, so later batches bin against the SAME
    cells instead of their own span (a batch's own min/max would make
    every score incomparable), and :func:`drift_against_reference` can
    REFUSE a batch whose column type or n_bins no longer matches the
    frozen geometry instead of silently comparing hash bins against value
    bins. One stacked scan (the :func:`distribution_drift` machinery with
    a single side)."""
    if not cols:
        raise ValueError("need at least one column")
    if n_bins <= 0:
        raise ValueError("n_bins must be positive")
    kinds = {c: _col_kind(df, c) for c in cols}
    pv = _stacked(df, cols, "l", n_bins).groupBy("column_name", "q").agg(
        F.count(F.lit(1)).alias("cnt")
    ).persist()
    spans = (
        pv.where(F.col("q").isNotNull())
        .groupBy("column_name")
        .agg(F.min("q").alias("_lo"), F.max("q").alias("_hi"))
        .select(
            "column_name", "_lo",
            F.expr(f"(_hi - _lo + {n_bins}) div {n_bins}").alias("_w"),
        )
    )
    binned = (
        pv.join(F.broadcast(spans), "column_name", "left")
        .select(
            "column_name",
            F.when(F.col("q").isNull(), F.lit(-1).cast("long"))
            .otherwise(F.expr("CAST((q - _lo) div _w AS BIGINT)"))
            .alias("bin"),
            "cnt", "_lo", "_w",
        )
        .groupBy("column_name", "bin")
        .agg(F.sum("cnt").alias("cnt"), F.min("_lo").alias("_lo"),
             F.min("_w").alias("_w"))
    )
    totals = binned.groupBy("column_name").agg(F.sum("cnt").alias("_t"))
    kind_expr = F.create_map(
        *[F.lit(x) for kv in kinds.items() for x in kv]
    )
    return binned.join(F.broadcast(totals), "column_name").select(
        "column_name",
        "bin",
        F.expr(
            "CAST(CAST(cnt AS DECIMAL(38,0)) * 1000000 div _t AS BIGINT)"
        ).alias("ref_ppm"),
        "_lo",
        "_w",
        kind_expr[F.col("column_name")].alias("_kind"),
        F.lit(int(n_bins)).cast("long").alias("_n_bins"),
    )


def drift_against_reference(
    batch: DataFrame, reference: DataFrame, cols: list[str], n_bins: int = 16
) -> DataFrame:
    """Score a batch against a :func:`reference_histogram`: per column,
    the TV distance (ppm) between the batch's shares and the frozen
    reference shares, over the REFERENCE's bin geometry. Batch values
    outside the reference span clamp to the edge bins (new extreme values
    read as extreme-bin mass — visible drift, not silent loss); batch
    NULLs land in the reference's NULL bin. Returns ``column_name,
    n_rows, tv_ppm`` — the relation a monitoring sink thresholds.

    The reference's stored geometry is VALIDATED before any scoring: a
    batch column whose numeric/categorical kind differs from the frozen
    reference's, or an ``n_bins`` that differs from the stored one,
    raises — hash bins compared against value-bin geometry would read as
    plausible-but-meaningless tv_ppm (references written before the
    ``_kind``/``_n_bins`` columns existed skip the check they can't
    make)."""
    ref_cols = set(reference.columns)
    if {"_kind", "_n_bins"} <= ref_cols:
        # |cols|-bounded collect: one row per column, driver-side by design
        stored = {
            r["column_name"]: r
            for r in reference.groupBy("column_name")
            .agg(F.min("_kind").alias("_kind"), F.min("_n_bins").alias("_n_bins"))
            .collect()
        }
        for c in cols:
            s = stored.get(c)
            if s is None:
                raise ValueError(
                    f"column {c!r} is not in the reference histogram "
                    f"(has {sorted(stored)})"
                )
            if s["_n_bins"] is not None and int(s["_n_bins"]) != int(n_bins):
                raise ValueError(
                    f"n_bins={n_bins} does not match the reference's "
                    f"frozen {int(s['_n_bins'])} for column {c!r} — the "
                    "geometry is baked into the stored widths"
                )
            if s["_kind"] is not None and _col_kind(batch, c) != s["_kind"]:
                raise ValueError(
                    f"column {c!r} is {_col_kind(batch, c)} in the batch "
                    f"but the reference froze it as {s['_kind']} — a "
                    "numeric/categorical change mis-bins silently; "
                    "re-freeze the reference"
                )
    geo = (
        reference.where(F.col("bin") >= 0)
        .groupBy("column_name")
        .agg(F.min("_lo").alias("_lo"), F.min("_w").alias("_w"))
    )
    pv = _stacked(batch, cols, "b", n_bins).groupBy("column_name", "q").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    raw_bin = F.expr("CAST((q - _lo) div _w AS BIGINT)")
    binned = (
        pv.join(F.broadcast(geo), "column_name", "left")
        .select(
            "column_name",
            F.when(F.col("q").isNull(), F.lit(-1).cast("long"))
            .otherwise(
                F.greatest(
                    F.lit(0).cast("long"),
                    F.least(F.lit(int(n_bins) - 1).cast("long"), raw_bin),
                )
            )
            .alias("bin"),
            "cnt",
        )
        .groupBy("column_name", "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    totals = binned.groupBy("column_name").agg(F.sum("cnt").alias("_t"))
    batch_ppm = binned.join(F.broadcast(totals), "column_name").select(
        "column_name",
        "bin",
        F.expr(
            "CAST(CAST(cnt AS DECIMAL(38,0)) * 1000000 div _t AS BIGINT)"
        ).alias("b_ppm"),
        F.col("_t"),
    )
    joined = batch_ppm.join(
        reference.select("column_name", "bin", "ref_ppm"),
        ["column_name", "bin"],
        "full",
    ).select(
        "column_name",
        F.coalesce(F.col("_t"), F.lit(0)).alias("_t"),
        F.abs(
            F.coalesce(F.col("b_ppm"), F.lit(0))
            - F.coalesce(F.col("ref_ppm"), F.lit(0))
        ).alias("d"),
    )
    return joined.groupBy("column_name").agg(
        F.max("_t").cast("long").alias("n_rows"),
        F.expr("CAST(sum(d) AS BIGINT) div 2").alias("tv_ppm"),
    )


def drift_summary(report: DataFrame) -> DataFrame:
    """Per-column verdict over a :func:`distribution_drift` report:
    ``tv_ppm`` (total-variation distance ×1e6 — 0 identical, 1e6
    disjoint), ``ks_ppm`` (Kolmogorov–Smirnov at bin granularity: the
    max |running CDF gap| over value-ordered bins — sensitive to a
    location SHIFT that TV under-reads when mass moves between adjacent
    bins), the null-bin share shift, and the worst bin. Integer-exact
    throughout (the running sums are ppm integers; no libm); a CI gate
    thresholds these the way the expectations suite thresholds its
    rules. The window runs over the bins×columns report — constant-size,
    never the data."""
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("column_name")
        .orderBy("bin")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = report.where(F.col("bin") >= 0).select(
        "column_name",
        "bin",
        F.abs(
            F.sum(F.coalesce(F.col("l_ppm"), F.lit(0))).over(w)
            - F.sum(F.coalesce(F.col("r_ppm"), F.lit(0))).over(w)
        ).alias("_gap"),
    ).groupBy("column_name").agg(F.max("_gap").alias("ks_ppm"))
    return (
        report.groupBy("column_name")
        .agg(
            F.expr("CAST(sum(abs_diff_ppm) AS BIGINT) div 2").alias("tv_ppm"),
            F.coalesce(
                F.sum(F.when(F.col("bin") == -1, F.col("abs_diff_ppm"))).cast("long"),
                F.lit(0),
            ).alias("null_share_diff_ppm"),
            F.max(F.struct(F.col("abs_diff_ppm"), F.col("bin"))).getField("bin").alias(
                "worst_bin"
            ),
            F.count(F.lit(1)).alias("n_bins_hit"),
        )
        .join(cum, "column_name", "left")
        .withColumn("ks_ppm", F.coalesce(F.col("ks_ppm"), F.lit(0)))
    )
