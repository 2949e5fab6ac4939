"""Behavioral analytics over event streams: funnel completion and
retention cohorts — the product-analytics queries an events table exists
for, rounding out the family sessionize_events / event_cooccurrence_pairs
/ rolling_event_rate started.

Both operators follow the same scale discipline as the rest of the events
family: epoch-µs integer arithmetic end to end (exact on both engines),
one groupBy keyed by user as the only data-sized shuffle, and per-user
state bounded by that user's own activity (the boundedness argument
sessionization already makes — no window ever spans users).

- :func:`funnel` — per-step completion counts under greedy
  earliest-completion semantics: a user completes step i at the earliest
  event of type step_i at-or-after their step i-1 completion. Computed in
  ONE aggregation pass: per user, a sorted timestamp array per step
  (``collect_list`` under an aggregate filter), then the sequential
  thresholds as array-function lookups (``F.get(F.filter(...), 0)``) —
  no self-joins, no per-step passes over the data, no UDF. Greedy
  earliest completion is exact for unwindowed funnels (taking the
  earliest feasible timestamp at every step dominates any other choice).
  Windowed funnels ("complete within 1 h of step 1") are NOT offered
  here: under a window the greedy choice of the first step is no longer
  optimal, and the exact form needs a per-user ordered scan — that is
  the stateful-streaming family (streaming/stateful.py), not an
  aggregate.
- :func:`retention_cohorts` — classic triangle retention: users
  cohorted by the week of their first event, counted once per
  (cohort_week, week_offset) they were active in. Two keyed aggregates
  and one user-keyed join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WEEK_US = 7 * 86_400 * 1_000_000


def funnel(
    df: DataFrame,
    steps: list[str],
    ts_col: str = "ts_us",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Users reaching each funnel step, greedy earliest-completion.

    Returns (step_idx, step, users) with step_idx 1-based; ``users`` at
    step i counts users whose sequential completion reached step i (a
    superset of every later step — the classic funnel monotone).

    Mechanics: one groupBy(user) collects a sorted timestamp array per
    step type; t₁ = first element of array₁, tᵢ = first element of
    arrayᵢ at-or-after tᵢ₋₁ (``F.filter`` + ``F.get`` — NULL thresholds
    propagate, so reached-step flags form a prefix). The per-user arrays
    are bounded by that user's own event count — the same per-key
    boundedness sessionization relies on. The reached-prefix explodes
    through a guarded ``sequence`` (Spark's ``sequence(1, 0)`` counts
    DOWN, so the empty case must be explicit) into the per-step counts.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    ev = df.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).cast("long").alias("t"),
        F.col(type_col).alias("ty"),
    )
    aggs = [
        F.array_sort(
            F.collect_list(F.when(F.col("ty") == s, F.col("t")))
        ).alias(f"a_{i}")
        for i, s in enumerate(steps)
    ]
    per_user = ev.groupBy("u").agg(*aggs)
    cur = per_user.withColumn("t_0", F.get(F.col("a_0"), 0))
    for i in range(1, len(steps)):
        cur = cur.withColumn(
            f"t_{i}",
            F.get(
                F.filter(F.col(f"a_{i}"), lambda x: x >= F.col(f"t_{i - 1}")),
                0,
            ),
        )
    reached = sum(
        (
            F.when(F.col(f"t_{i}").isNotNull(), F.lit(1)).otherwise(F.lit(0))
            for i in range(len(steps))
        ),
        F.lit(0),
    )
    lvls = cur.select(
        F.explode(
            F.when(reached >= 1, F.sequence(F.lit(1), reached)).otherwise(
                F.array().cast("array<int>")
            )
        ).alias("step_idx")
    )
    counts = lvls.groupBy("step_idx").agg(
        F.count(F.lit(1)).cast("long").alias("users")
    )
    name = F.element_at(
        F.array(*[F.lit(s) for s in steps]), F.col("step_idx")
    )
    return counts.select(
        F.col("step_idx").cast("long").alias("step_idx"),
        name.alias("step"),
        "users",
    )


def funnel_oracle_sql(
    steps: list[str],
    events_cte: str,
) -> str:
    """DuckDB mirror of :func:`funnel`. ``events_cte`` must define a
    relation ``e(u, t, ty)``; list indexing is 1-based and out-of-range
    yields NULL (matching ``F.get``'s 0-based NULL contract)."""
    arrays = ", ".join(
        f"list_sort(list(t) FILTER (WHERE ty = '{s}')) AS a_{i}"
        for i, s in enumerate(steps)
    )
    thresholds = ["a_0[1] AS t_0"]
    for i in range(1, len(steps)):
        thresholds.append(
            f"list_filter(a_{i}, x -> x >= t_{i - 1})[1] AS t_{i}"
        )
    reached = " + ".join(
        f"CASE WHEN t_{i} IS NOT NULL THEN 1 ELSE 0 END"
        for i in range(len(steps))
    )
    names = ", ".join(f"({i + 1}, '{s}')" for i, s in enumerate(steps))
    # sequential SELECTs: each threshold references the previous one
    cols0 = ["u", thresholds[0]] + [f"a_{i}" for i in range(1, len(steps))]
    chain = "SELECT " + ", ".join(cols0) + " FROM per_user"
    for i in range(1, len(steps)):
        keep = ", ".join(f"a_{j}" for j in range(i + 1, len(steps)))
        chain = (
            f"SELECT u, "
            + ", ".join(f"t_{j}" for j in range(i))
            + f", {thresholds[i]}"
            + (f", {keep}" if keep else "")
            + f" FROM ({chain})"
        )
    return f"""
WITH {events_cte},
per_user AS (SELECT u, {arrays} FROM e GROUP BY u),
thresh AS ({chain}),
lvls AS (
  SELECT u, unnest(range(1, ({reached}) + 1)) AS step_idx FROM thresh
),
names(step_idx, step) AS (VALUES {names})
SELECT CAST(l.step_idx AS BIGINT) AS step_idx, n.step,
       CAST(count(*) AS BIGINT) AS users
FROM lvls l JOIN names n USING (step_idx)
GROUP BY l.step_idx, n.step
"""


def retention_cohorts(
    df: DataFrame,
    ts_col: str = "ts_us",
    user_col: str = "user_id",
    period_us: int = WEEK_US,
) -> DataFrame:
    """(cohort_period, period_offset, users): users whose FIRST event
    falls in cohort_period (epoch µs ``div`` period) counted once per
    later period they produced any event in (offset 0 = the cohort
    period itself, always the cohort's full size).

    Shape: min-per-user aggregate (cohort), distinct (user, period)
    activity relation, user-keyed join, final small groupBy — every
    shuffle keyed by user or by the tiny (cohort, offset) grid.
    """
    ev = df.select(
        F.col(user_col).alias("u"),
        F.expr(f"CAST({ts_col} AS BIGINT) div {period_us}").alias("p"),
    )
    firsts = ev.groupBy("u").agg(F.min("p").alias("cohort_p"))
    activity = ev.distinct()
    return (
        activity.join(firsts, "u")
        .groupBy(
            F.col("cohort_p").cast("long").alias("cohort_period"),
            (F.col("p") - F.col("cohort_p")).cast("long").alias("period_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("users"))
    )


def daily_user_sketches(
    events: DataFrame,
    user_col: str = "user_id",
    lg_k: int = 14,
) -> DataFrame:
    """(day_us, sketch): one mergeable HLL sketch of distinct users per day
    (Datasketches HllSketch via ``hll_sketch_agg`` — Spark 3.5+).

    THE incremental-distinct pattern for 100 TB event stores: each day's
    partition is scanned once, ever, and reduced to a ~2^lg_k-byte sketch;
    every rolling window after that unions sketches instead of rescanning
    events. lg_k=14 gives ~0.8 % standard error — the monitoring-grade
    counterpart to the exact count_distinct the cutover gate uses."""
    from database_migration_spark.functions.time import epoch_us_wall

    return events.groupBy(
        epoch_us_wall(F.date_trunc("day", F.col("ts"))).alias("day_us")
    ).agg(
        F.hll_sketch_agg(F.col(user_col).cast("string"), F.lit(lg_k)).alias(
            "sketch"
        ),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


def rolling_distinct_users(
    sketches: DataFrame,
    window_days: int = 7,
    persist: bool = True,
) -> DataFrame:
    """(day_us, rolling_users): per day, the estimated distinct users over
    the trailing ``window_days`` — computed by UNIONING the persisted daily
    sketches (``hll_union_agg``), never by touching the event rows again.

    Shape: the day grid self-joins to its trailing window (each day picks
    up ≤ window_days sketch rows — a days×window relation of kilobyte
    sketches, broadcast-scale regardless of corpus size), then one
    group-union per day. The estimate is approximate by design; parity
    with exact distinct is asserted within HLL error bounds in
    test_behavior.py, not via the value-hash oracle."""
    from pyspark import StorageLevel

    # two plan consumers (the day grid and the sketch side of the join) —
    # without a persist barrier an unpersisted input recomputes its whole
    # upstream (the events scan + HLL aggregation) once per branch, which
    # is exactly the rescan this operator exists to avoid. persist=False
    # opts out for callers managing the cache themselves (streaming epochs).
    if persist:
        sketches = sketches.persist(StorageLevel.MEMORY_AND_DISK)
    day_us = 86_400_000_000
    a = sketches.select(F.col("day_us").alias("d"), "sketch")
    days = sketches.select("day_us")
    joined = days.join(
        a,
        (F.col("d") <= F.col("day_us"))
        & (F.col("d") > F.col("day_us") - F.lit(window_days * day_us)),
    )
    return (
        joined.groupBy("day_us")
        .agg(F.hll_union_agg("sketch").alias("u"))
        .select(
            "day_us",
            F.hll_sketch_estimate("u").cast("long").alias("rolling_users"),
        )
    )


def transition_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """First-order user-path transition matrix (the Markov view of a
    product: which step follows which): for every consecutive pair of
    events within one user's timeline, count ``from_type → to_type`` and
    its share of all transitions LEAVING ``from_type`` (integer ppm).

    Scale shape: one shuffle on the user key for the lag window (the
    sessionize plan), then the pair relation is |types|² rows — the
    per-from totals join is a broadcast over that tiny relation, and all
    shares are exact integer ppm (the cross-engine rule). Returns
    ``from_type, to_type, n_transitions, share_ppm``.
    """
    from pyspark.sql import Window as W

    order_cols = order_cols or ["tsu", "event_id"]
    w = W.partitionBy(user_col).orderBy(*order_cols)
    seq = events.select(
        F.lag(type_col).over(w).alias("from_type"),
        F.col(type_col).alias("to_type"),
    ).where(F.col("from_type").isNotNull())
    from pyspark import StorageLevel

    # pairs feeds the totals aggregate AND the final join — persist, or
    # the events scan + window shuffle recompute for each branch
    pairs = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    totals = pairs.groupBy("from_type").agg(
        F.sum("n_transitions").alias("_t")
    )
    return (
        pairs.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n_transitions",
            F.expr(
                "CAST(CAST(n_transitions AS DECIMAL(38,0)) * 1000000 "
                "div _t AS BIGINT)"
            ).alias("share_ppm"),
        )
    )
