"""Time-series resampling: regular grids from irregular observations.

Monitoring, feature engineering, and rate analysis all want "one row per
key per step" — but event data arrives irregularly, and SQL GROUP BY
silently omits the empty steps (a service that logged nothing for an hour
vanishes instead of reading zero). This operator makes the grid explicit:

1. bucket observations into ``step``-wide bins (exact long floor
   division — the F.floor(col/N) double trap, CLAUDE.md) and aggregate
   per (keys…, bin);
2. explode each key's full bin range ``sequence(min_bin … max_bin)`` —
   output-sized work, no join against a giant calendar table;
3. left-join the aggregates back on (keys…, bin) — equi-join, one
   shuffle; then fill the holes: ``zero_fill`` columns get 0,
   ``ffill`` columns carry the last observed value forward with ONE
   last-non-null window pass per key (the as-of machinery from
   operators/asof.py, degenerated to a self-timeline).

Scale shape: everything shuffles on the key once; grid size is
Σ_key(span/step), which is the OUTPUT size — the operator cannot do less
work than its result. A key observed once explodes to one row. The
pathological input is one key spanning eons at a tiny step (a 30-year
key at 1 s steps = 10⁹ grid rows); ``max_bins_per_key`` guards it by
dropping keys whose span exceeds the cap, loudly countable from the
output (their absence), rather than OOMing an executor on one
``sequence()`` array.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import Window as W


def resample(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    step: int,
    aggs: dict[str, Column],
    zero_fill: list[str] | None = None,
    ffill: list[str] | None = None,
    max_bins_per_key: int | None = None,
) -> DataFrame:
    """Regularize ``df`` to one row per (keys…, step-bin).

    ``ts_col`` must be integral (epoch micros per the repo's NTZ
    convention — ``functions/time.epoch_us_wall``). ``aggs`` maps output
    column name → aggregate expression over one bin's rows.
    ``zero_fill``/``ffill`` name agg outputs to fill on empty bins
    (others stay NULL). Returns ``keys…, bin_start, bin_end`` + agg
    columns, every bin between each key's first and last observation
    present exactly once.
    """
    if step <= 0:
        raise ValueError("step must be positive")
    reserved = {"bin", "bin_start", "bin_end"}
    bad = reserved & set(aggs)
    if bad:
        raise ValueError(f"agg names {sorted(bad)} are reserved")
    bad_keys = reserved & set(keys)
    if bad_keys:
        raise ValueError(
            f"key names {sorted(bad_keys)} are reserved (the internal bin "
            "column would shadow them) — rename the key columns"
        )
    unknown = (set(zero_fill or []) | set(ffill or [])) - set(aggs)
    if unknown:
        raise ValueError(f"fill columns not in aggs: {sorted(unknown)}")

    from pyspark import StorageLevel

    t = F.col(ts_col).cast("long")
    # binned feeds two branches (span bounds + the grid left-join) —
    # persist, or the scan + per-bin aggregation executes twice
    # (CLAUDE.md multi-branch rule)
    binned = (
        df.where(t.isNotNull())
        .withColumn("bin", F.expr(
            f"(CAST({ts_col} AS BIGINT) - pmod(CAST({ts_col} AS BIGINT), {step}))"
            f" div {step}"
        ))
        .groupBy(*keys, "bin")
        .agg(*[expr.alias(name) for name, expr in aggs.items()])
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    spans = binned.groupBy(*keys).agg(
        F.min("bin").alias("_lo"), F.max("bin").alias("_hi")
    )
    if max_bins_per_key is not None:
        spans = spans.where(
            (F.col("_hi") - F.col("_lo")) < F.lit(int(max_bins_per_key))
        )
    grid = spans.select(
        *keys, F.explode(F.expr("sequence(_lo, _hi)")).alias("bin")
    )
    filled = grid.join(binned, [*keys, "bin"], "left")
    for c in zero_fill or []:
        filled = filled.withColumn(
            c, F.coalesce(F.col(c), F.lit(0).cast(binned.schema[c].dataType))
        )
    if ffill:
        w = (
            W.partitionBy(*keys)
            .orderBy("bin")
            .rowsBetween(W.unboundedPreceding, 0)
        )
        for c in ffill:
            filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))
    agg_names = list(aggs)
    return filled.select(
        *keys,
        (F.col("bin") * step).alias("bin_start"),
        (F.col("bin") * step + step - 1).alias("bin_end"),
        *agg_names,
    )


def flag_anomalies(
    series: DataFrame,
    keys: list[str],
    order_col: str,
    value_col: str,
    trailing: int = 8,
    factor_permille: int = 3000,
) -> DataFrame:
    """Spike detection over a REGULAR series (a :func:`resample` output —
    gap bins must exist, or silence before a spike hides the baseline):
    flag rows where ``value > factor × trailing mean`` of the previous
    ``trailing`` bins, division-free —

        value · 1000 · baseline_n  >  factor_permille · baseline_sum

    stays in exact integer arithmetic (the cross-engine rule; a float
    mean would hash-diverge), and rows without a FULL trailing window
    never flag (a series' first bins have no baseline to betray).

    One window pass per key, partition-local after the resample's own
    shuffle. Columns out: the input's, plus ``baseline_sum, baseline_n,
    is_anomaly``.
    """
    if trailing <= 0:
        raise ValueError("trailing must be positive")
    if factor_permille <= 0:
        raise ValueError("factor_permille must be positive")
    w = (
        W.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(-trailing, -1)
    )
    v = F.col(value_col).cast("long")
    out = series.select(
        "*",
        F.coalesce(F.sum(v).over(w), F.lit(0)).cast("long").alias("baseline_sum"),
        F.count(v).over(w).cast("long").alias("baseline_n"),
    )
    return out.withColumn(
        "is_anomaly",
        (F.col("baseline_n") == trailing)
        & (
            v * F.lit(1000) * F.col("baseline_n")
            > F.lit(int(factor_permille)) * F.col("baseline_sum")
        ),
    )
