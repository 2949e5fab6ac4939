"""Bounded-state frequency sketches: exact heavy hitters without a
full-key shuffle.

The naive frequent-key query — ``groupBy(key).count().filter(cnt >= t)``
— shuffles one partial row per (distinct key × partition). Over a
high-cardinality key (tokens, URLs, user ids) at 100 TB that shuffle IS
the job, even though the answer is a handful of rows. The classic fix is
a two-pass sketch (Misra & Gries 1982, "Finding repeated elements";
rediscovered as FREQUENT / space-saving):

1. **Summary pass** (map-only, zero shuffle): each partition maintains at
   most ``k`` weighted counters; when a new key overflows the budget the
   minimum counter value is subtracted from all and zeroed counters drop.
   The decrement analysis is the paper's: every subtraction of ``m``
   removes ``m·(k+1)+`` total mass, and at most ``n_p`` mass exists, so
   any key with partition mass ``> n_p/(k+1)`` survives partition ``p``'s
   summary. A key with GLOBAL share >= t has, by weighted averaging, at
   least one partition where its local share >= t, and with
   ``k >= ceil(1/t)`` it survives there — the union of partition
   summaries is a **superset of every true heavy hitter** (no false
   negatives; false positives are fine, the next pass kills them).
2. **Recount pass**: the candidate keys (<= k per partition, broadcast)
   semi-join the input and only THEIR counts aggregate — the shuffle
   carries candidate partials only, so its volume is |candidates| ×
   partitions, not |vocabulary| × partitions.

The output is EXACT (identical to the naive groupBy — pinned by the
DuckDB oracle of ``heavy_hitter_tokens`` and the partitioning-invariance
pytest): the sketch only routes the computation, it never appears in the
answer. That is what makes the operator oracle-checkable even though its
intermediate state is approximate.

The summary runs in Arrow-batched ``mapInPandas`` with per-batch
``groupby`` pre-aggregation, so Python touches one row per DISTINCT key
per batch, not one per input row (the multimodal/mapInPandas convention:
bounded per-batch state, vectorized inner ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_reduce(counters: dict, k: int) -> None:
    """Shrink ``counters`` to at most ``k`` entries by the weighted
    Misra-Gries decrement: subtract enough of the smallest counter mass
    from ALL entries that the budget holds; zeroed entries drop. Each
    subtraction of m hits every live counter (>= k+1 of them), which is
    what bounds any single key's total decrement by n_p/(k+1)."""
    import numpy as np

    while len(counters) > k:
        vals = np.fromiter(counters.values(), dtype="int64")
        # subtracting the (len-k)-th smallest zeroes at least len-k entries
        m = int(np.partition(vals, len(vals) - k - 1)[len(vals) - k - 1])
        for key in list(counters):
            nv = counters[key] - m
            if nv > 0:
                counters[key] = nv
            else:
                del counters[key]


def mg_candidate_keys(
    df: DataFrame,
    key_cols: list[str],
    summary_size: int,
    weight_col: str | None = None,
) -> DataFrame:
    """Per-partition Misra-Gries summaries of ``df``'s key distribution:
    the union of every partition's surviving keys, at most
    ``summary_size`` rows per partition. Superset-of-heavy-hitters is the
    only contract (see module docstring); counts are NOT emitted — they
    are sketch lower bounds, and the recount pass recomputes them
    exactly."""
    cols = list(key_cols) + ([weight_col] if weight_col else [])
    src = df.select(*cols)
    schema = src.select(*key_cols).schema

    # NULL keys must accumulate into ONE counter: pandas labels a NULL
    # group as a fresh NaN object per batch and NaN != NaN as a dict key,
    # so without canonicalization a NULL heavy hitter fragments into
    # per-batch slivers the decrement silently zeroes — a false negative,
    # the one failure mode this design forbids (review finding).
    _NULL = object()

    def _canon(x):
        import pandas as pd

        return _NULL if (x is None or pd.isna(x)) else x

    def _uncanon(x):
        return None if x is _NULL else x

    def summarize(batches):
        import pandas as pd

        counters: dict = {}
        for batch in batches:
            if weight_col is not None:
                # per-ROW truncation before the batch sum — the same
                # measure as the total/recount legs' cast("long"). A batch
                # sum of raw floats truncated afterwards over-credits keys
                # (sum(floor) <= floor(sum)); over-credit of OTHER keys
                # inflates the partition mass and with it the Misra-Gries
                # decrement budget n_p/(k+1), so a key exactly at
                # threshold under the per-row measure could be evicted —
                # a false negative (advisor finding). NaN→0 matches
                # Spark's cast(NaN as long); negatives raise on the total
                # leg (which runs first), clipping here is unreachable.
                batch = batch.assign(
                    **{
                        weight_col: batch[weight_col]
                        .fillna(0)
                        .clip(lower=0)
                        .astype("int64")
                    }
                )
                vc = batch.groupby(key_cols, dropna=False, sort=False)[
                    weight_col
                ].sum()
            else:
                vc = batch.groupby(key_cols, dropna=False, sort=False).size()
            for key, w in vc.items():
                # pandas versions disagree on whether a single-column
                # groupby yields scalar or 1-tuple keys — normalize
                if isinstance(key, tuple) and len(key_cols) == 1:
                    key = key[0]
                if len(key_cols) == 1:
                    key = _canon(key)
                else:
                    key = tuple(_canon(x) for x in key)
                if w > 0:
                    counters[key] = counters.get(key, 0) + int(w)
            if len(counters) > summary_size:
                _mg_reduce(counters, summary_size)
        if counters:
            keys = list(counters)
            if len(key_cols) == 1:
                yield pd.DataFrame({key_cols[0]: [_uncanon(k) for k in keys]})
            else:
                yield pd.DataFrame(
                    [tuple(_uncanon(x) for x in k) for k in keys],
                    columns=key_cols,
                )

    return src.mapInPandas(summarize, schema)


def _nan_keys_to_null(df: DataFrame, keys: list[str]) -> DataFrame:
    """NaN → NULL for float/double key columns, so one key identity holds
    across the pandas summary (which cannot tell them apart) and the
    Spark recount (eqNullSafe matches NULL but never NaN). No-op — and no
    ReusedExchange-breaking projection — when no key is floating."""
    from pyspark.sql.types import DoubleType, FloatType

    types = {f.name: f.dataType for f in df.schema.fields}
    floaty = {
        k for k in keys if isinstance(types.get(k), (DoubleType, FloatType))
    }
    if not floaty:
        return df
    return df.select(
        *[
            F.when(F.isnan(F.col(c)), F.lit(None))
            .otherwise(F.col(c))
            .alias(c)
            if c in floaty
            else F.col(c)
            for c in df.columns
        ]
    )


def heavy_hitters(
    df: DataFrame,
    key_cols: list[str] | str,
    threshold_ppm: int,
    weight_col: str | None = None,
    summary_size: int | None = None,
    persist: bool = True,
) -> DataFrame:
    """All key combinations whose exact (weighted) share of ``df`` is at
    least ``threshold_ppm`` parts-per-million, with their exact counts —
    computed by the two-pass Misra-Gries route (module docstring) instead
    of a full-key shuffle. Output: key cols + ``cnt`` (exact long) +
    ``share_ppm`` (floor of cnt·1e6/total, exact integer arithmetic).

    ``summary_size`` defaults to 2·ceil(1e6/threshold_ppm); values below
    ceil(1e6/threshold_ppm) would break the no-false-negative guarantee
    and RAISE (the stored-layout contradiction rule — a silently lossy
    sketch is the one failure mode this design forbids).

    Exactness bounds: the threshold comparison runs in DECIMAL(38,0)
    (exact at any total mass); the ``share_ppm`` convenience column
    divides in signed 64-bit, which holds while cnt < 2^63/1e6 ~ 9.2e12
    occurrences per key ("the" at 5% of a 2e13-token corpus is ~1e12 —
    an order of magnitude inside the bound). Weights must be
    nonnegative: the Misra-Gries superset guarantee (and "share" itself)
    is meaningless under cancellation.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if not 1 <= int(threshold_ppm) <= 1_000_000:
        raise ValueError("threshold_ppm must be in [1, 1000000]")
    # NaN float/double keys canonicalize to NULL on the SPARK legs too:
    # the pandas summary already merges NaN and NULL into one sentinel
    # (emitted as NULL candidates), but eqNullSafe matches only true
    # NULLs, so a NaN heavy key would semi-join to nothing and vanish — a
    # silent false negative, and the two engines would disagree on key
    # identity (advisor finding). One identity everywhere: NaN IS NULL.
    df = _nan_keys_to_null(df, keys)
    if persist:
        # the input feeds three plan branches (total, summary, recount) —
        # the multi-consumer persist rule. Pass persist=False when the
        # input is a cheap re-scannable source and materializing the
        # stream would cost more than three map-only scans.
        from pyspark import StorageLevel

        df = df.persist(StorageLevel.MEMORY_AND_DISK)
    k_min = -(-1_000_000 // int(threshold_ppm))  # ceil
    if summary_size is None:
        summary_size = 2 * k_min
    elif summary_size < k_min:
        raise ValueError(
            f"summary_size={summary_size} breaks the Misra-Gries "
            f"no-false-negative guarantee for threshold_ppm="
            f"{threshold_ppm}: need >= ceil(1e6/threshold_ppm) = {k_min}"
        )
    # one weight convention on all three legs (total, summary, recount):
    # per-row long truncation, non-negative enforced in-scan (the
    # sampling._nonneg_weight contract). The total sums the long form in
    # DECIMAL(38,0) so it cannot overflow; the pandas summary truncates
    # per ROW too (see summarize) — batch-granularity truncation
    # over-credited other keys, inflating the decrement budget and
    # threatening the superset guarantee at the tightest summary_size
    # (advisor finding). Mixing decimal rounding into the total while the
    # recount truncated was a review finding: a key exactly at threshold
    # could flip on which rounding won.
    if weight_col:
        from database_migration_spark.operators.sampling import (
            _nonneg_weight,
        )

        wl = _nonneg_weight(weight_col, "heavy_hitters")
    else:
        wl = F.lit(1).cast("long")
    # the total rides the plan as a 1-row cross-joined relation instead of
    # a build-time collect (r12: the collect was a whole blocking job on
    # the driver before the query even started; same DECIMAL(38,0)
    # arithmetic, same value — the input is immutable within the job). The
    # negative-weight raise_error now fires in whichever leg of the ONE
    # job scans first — the job still fails, so the summary's clip stays
    # an unreachable belt.
    total_rel = df.agg(
        F.coalesce(
            F.sum(wl.cast("decimal(38,0)")), F.lit(0).cast("decimal(38,0)")
        ).alias("_t")
    )
    # no .distinct() on the candidates (r12): left_semi deduplicates by
    # construction, and the distinct added a shuffle exchange inside the
    # broadcast build side for a <= summary_size x partitions relation
    cands = mg_candidate_keys(df, keys, summary_size, weight_col)
    cond = None
    for c in keys:
        eq = df[c].eqNullSafe(cands[c])
        cond = eq if cond is None else (cond & eq)
    matched = df.join(F.broadcast(cands), cond, "left_semi")
    cnt = (F.sum(wl) if weight_col else F.count(F.lit(1))).cast("long")
    agg = matched.groupBy(*keys).agg(cnt.alias("cnt")).crossJoin(
        F.broadcast(total_rel)
    )
    keep = (F.col("cnt").cast("decimal(38,0)") * F.lit(1_000_000)) >= F.col(
        "_t"
    ) * F.lit(int(threshold_ppm))
    return agg.where(keep).select(
        *keys,
        "cnt",
        # divisor stays DECIMAL(38,0): a bigint cast of a >2^63 weighted
        # total would raise under ANSI / NULL out under non-ANSI (and
        # greatest() skips NULLs, silently dividing by 1 — review
        # finding); div on decimal operands is exact integral division
        F.expr(
            "(cnt * 1000000L) div greatest(_t, cast(1 as decimal(38,0)))"
        ).alias("share_ppm"),
    )
