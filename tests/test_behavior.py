"""Differential tests for operators/behavior.py: funnel and retention
must reproduce plain-Python replays of their definitions exactly,
including the edges the array mechanics must get right — a user skipping
a middle step, out-of-order step events (purchase before click), ties on
the threshold timestamp (>= keeps them), users with zero funnel events,
and retention users active in non-contiguous periods."""

import random
from collections import Counter

from database_migration_spark.operators.behavior import (
    funnel,
    retention_cohorts,
)

EVENTS = [
    # u1 completes all three in order
    (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
    # u2: purchase BEFORE click — reaches view+click only
    (2, 10, "view"), (2, 15, "purchase"), (2, 20, "click"),
    # u3: tie — click at the same instant as view counts (>=)
    (3, 40, "view"), (3, 40, "click"),
    # u4: only noise events
    (4, 5, "error"), (4, 6, "signup"),
    # u5: skips view entirely — reaches nothing
    (5, 50, "click"), (5, 60, "purchase"),
    # u6: several candidates per step; greedy takes the earliest viable
    (6, 100, "view"), (6, 90, "click"), (6, 110, "click"),
    (6, 105, "purchase"), (6, 120, "purchase"),
]
STEPS = ["view", "click", "purchase"]


def _ref_funnel(rows, steps):
    per_user = {}
    for u, t, ty in rows:
        per_user.setdefault(u, []).append((t, ty))
    counts = Counter()
    for evs in per_user.values():
        prev = None
        reached = 0
        for s in steps:
            cand = sorted(
                t for t, ty in evs if ty == s and (prev is None or t >= prev)
            )
            if not cand:
                break
            prev = cand[0]
            reached += 1
        for i in range(1, reached + 1):
            counts[i] += 1
    return {(i, steps[i - 1]): n for i, n in counts.items()}


def test_funnel_matches_python_reference(spark):
    df = spark.createDataFrame(EVENTS, "user_id long, ts_us long, event_type string")
    got = {
        (r.step_idx, r.step): r.users for r in funnel(df, STEPS).collect()
    }
    assert got == _ref_funnel(EVENTS, STEPS)
    # spot-check the curated edges: u1, u2, u3, u6 reach view+click
    # (u6's viable click is at 110, after its view at 100); u1 and u6
    # reach purchase
    assert got[(1, "view")] == 4
    assert got[(2, "click")] == 4
    assert got[(3, "purchase")] == 2


def test_funnel_randomized_differential(spark):
    rng = random.Random(11)
    rows = [
        (rng.randrange(8), rng.randrange(100), rng.choice(STEPS + ["error"]))
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_us long, event_type string")
    got = {(r.step_idx, r.step): r.users for r in funnel(df, STEPS).collect()}
    assert got == _ref_funnel(rows, STEPS)


def test_funnel_single_step(spark):
    df = spark.createDataFrame(EVENTS, "user_id long, ts_us long, event_type string")
    got = {(r.step_idx, r.step): r.users for r in funnel(df, ["purchase"]).collect()}
    assert got == {(1, "purchase"): 4}  # u1, u2, u5, u6


def _ref_retention(rows, period):
    firsts = {}
    activity = set()
    for u, t in rows:
        p = t // period
        activity.add((u, p))
        firsts[u] = min(firsts.get(u, p), p)
    counts = Counter()
    for u, p in activity:
        counts[(firsts[u], p - firsts[u])] += 1
    return dict(counts)


def test_retention_matches_python_reference(spark):
    rows = [
        (1, 5), (1, 25), (1, 45),      # periods 0,2,4 (gap weeks)
        (2, 15), (2, 16), (2, 22),     # cohort 1, active 1 and 2
        (3, 99),                       # late cohort, single period
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_us long")
    got = {
        (r.cohort_period, r.period_offset): r.users
        for r in retention_cohorts(df, period_us=10).collect()
    }
    assert got == _ref_retention(rows, 10)
    assert got[(0, 2)] == 1 and (0, 1) not in got  # gaps stay gaps


def test_rolling_distinct_users_within_hll_error(spark, sf_smoke):
    """The sketch-union rolling estimate must sit within HLL error bounds
    of the exact trailing-window distinct count for EVERY day, and the
    sketches must be reusable (union happens on stored sketches, not on
    event rows)."""
    from pyspark.sql import functions as F

    from database_migration_spark.functions.time import epoch_us_wall
    from database_migration_spark.operators.behavior import (
        daily_user_sketches,
        rolling_distinct_users,
    )
    from database_migration_spark.sources.parquet_source import (
        read_parquet_portable,
    )

    ev = read_parquet_portable(spark, f"{sf_smoke}/events.parquet")
    sk = daily_user_sketches(ev).persist()
    got = {
        r.day_us: r.rolling_users
        for r in rolling_distinct_users(sk, window_days=7).collect()
    }

    day_us = 86_400_000_000
    days_events = ev.select(
        epoch_us_wall(F.date_trunc("day", F.col("ts"))).alias("d"), "user_id"
    ).persist()
    exact = {}
    for d in got:
        exact[d] = (
            days_events.where(
                (F.col("d") <= d) & (F.col("d") > d - 7 * day_us)
            )
            .select("user_id")
            .distinct()
            .count()
        )
    assert got.keys() == exact.keys() and got
    for d, est in got.items():
        # lg_k=14 → ~0.8% standard error; allow 5 sigma plus small-count slack
        tol = max(5, int(exact[d] * 0.04))
        assert abs(est - exact[d]) <= tol, (d, est, exact[d])
    sk.unpersist()
    days_events.unpersist()
    spark.catalog.clearCache()


def test_transition_matrix_counts_and_shares(spark):
    from pyspark.sql import functions as F

    from database_migration_spark.operators.behavior import transition_matrix

    ev = spark.createDataFrame(
        [  # user 1: a->b->a ; user 2: a->b ; singleton user 3 contributes none
            (1, 1, "a"), (1, 2, "b"), (1, 3, "a"),
            (2, 1, "a"), (2, 2, "b"),
            (3, 1, "z"),
        ],
        "user_id LONG, event_id LONG, event_type STRING",
    ).withColumn("tsu", F.col("event_id") * 1000)
    got = {
        (r["from_type"], r["to_type"]): (r["n_transitions"], r["share_ppm"])
        for r in transition_matrix(ev).collect()
    }
    assert got == {
        ("a", "b"): (2, 1_000_000),  # every transition leaving a goes to b
        ("b", "a"): (1, 1_000_000),
    }
