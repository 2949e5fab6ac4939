"""Incremental aggregate maintenance: mergeable partial-aggregate states.

The reference's delta workflow (delta_import/delta_import_on_primary_keys.sql
:374-435) keeps base TABLES current with watermark + MERGE; the follow-on
every warehouse needs is keeping derived SUMMARY tables current without
re-scanning history. This module implements the classic incremental
materialized-view pattern: an aggregate is stored as a per-group state of
*mergeable* partials (count / exact-decimal sum / min / max), a delta batch
is folded into its own state, and the two states merge by re-aggregation.
avg and friends derive from the partials at read time.

Scale shape (the part that matters at 100 TB):

- A refresh touches the DELTA (one scan, map-side combined into per-group
  partials) and the STATE (group-count-sized, not history-sized). History
  is never re-read; the merge shuffle is bounded by |groups|, and with the
  state written bucketed on the group keys even that shuffle disappears.
- All partials are algebraic: sums are exact DECIMAL (never float — the
  cross-engine correctness rule), count is BIGINT, min/max are value
  selections. Merging is a plain re-aggregation of the unioned states, so
  states from any number of deltas (or from per-partition computation)
  merge associatively — the same property that makes the rolling-HLL
  sketches in operators/behavior.py scan events once, ever.
- Insert-only deltas are the fast path. With ``signed=True`` a delta may
  carry a ±1 sign column (the retraction stream a CDC feed produces):
  count and sum subtract exactly; min/max are NOT retractable from a
  partial state, so signed states omit them (the standard MV-maintenance
  trade — a deleted minimum forces a per-group rescan, which is exactly
  what refresh-from-base does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# exact accumulation type for double measures (matches queries.DEC scale)
_SUM_TYPE = "decimal(38,6)"


def _stat_cols(measures: list[str], signed: bool, sign_col: str | None):
    sign = F.col(sign_col).cast("long") if signed and sign_col else F.lit(1)
    aggs = [F.sum(sign).alias("n_rows")]
    for m in measures:
        v = F.col(m).cast(_SUM_TYPE)
        aggs.append(F.sum(v * sign.cast(_SUM_TYPE)).cast(_SUM_TYPE).alias(f"sum_{m}"))
        if not signed:
            aggs.append(F.min(F.col(m)).alias(f"min_{m}"))
            aggs.append(F.max(F.col(m)).alias(f"max_{m}"))
    return aggs


def build_state(
    df: DataFrame,
    keys: list[str],
    measures: list[str],
    signed: bool = False,
    sign_col: str | None = None,
) -> DataFrame:
    """One scan → per-group mergeable partials.

    Columns out: ``keys…, n_rows, sum_<m>, [min_<m>, max_<m>]…`` with sums
    accumulated in DECIMAL(38,6) (exact for the double measures the
    testdata carries). ``signed`` folds a ±1 ``sign_col`` into count/sum
    and drops min/max (not retractable).
    """
    return df.groupBy(*keys).agg(*_stat_cols(measures, signed, sign_col))


def merge_states(states: list[DataFrame], keys: list[str], measures: list[str]) -> DataFrame:
    """Merge partial states by union + re-aggregation.

    Associative and commutative: any grouping of deltas merges to the same
    state. Groups whose merged count reaches 0 (signed full retraction)
    are dropped, matching what a from-scratch rebuild would produce.
    """
    if not states:
        raise ValueError("merge_states needs at least one state")
    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s, allowMissingColumns=True)
    have_minmax = all(f"min_{measures[0]}" in s.columns for s in states) if measures else False
    aggs = [F.sum("n_rows").alias("n_rows")]
    for m in measures:
        aggs.append(F.sum(f"sum_{m}").cast(_SUM_TYPE).alias(f"sum_{m}"))
        if have_minmax:
            aggs.append(F.min(f"min_{m}").alias(f"min_{m}"))
            aggs.append(F.max(f"max_{m}").alias(f"max_{m}"))
    return unioned.groupBy(*keys).agg(*aggs).where(F.col("n_rows") != 0)


def incremental_refresh(
    state: DataFrame,
    delta: DataFrame,
    keys: list[str],
    measures: list[str],
    signed: bool = False,
    sign_col: str | None = None,
) -> DataFrame:
    """Fold a delta batch into an existing state: delta-sized work only."""
    delta_state = build_state(delta, keys, measures, signed=signed, sign_col=sign_col)
    return merge_states([state, delta_state], keys, measures)
