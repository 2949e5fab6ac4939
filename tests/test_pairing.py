"""Differential tests for operators/pairing.py: the banded/blocked
candidate-join operators must reproduce their naive O(n²) definitions
exactly (brute force computed in plain Python on small inputs), including
the edge cases the banding math has to get right — pairs exactly at Δ,
cell-boundary straddles, timestamp ties, repeated characters in the
deletion neighborhood, and the known lev-2 false-positive shapes."""

import itertools

from pyspark.sql import functions as F

from database_migration_spark.operators.pairing import (
    banded_interval_self_join,
    edit_distance_pairs,
)


def _brute_pairs(rows, delta):
    out = set()
    for (k1, t1, i1), (k2, t2, i2) in itertools.permutations(rows, 2):
        if k1 != k2:
            continue
        if 0 <= t2 - t1 <= delta and (t1 < t2 or (t1 == t2 and i1 < i2)):
            out.add((k1, i1, i2, t1, t2, t2 - t1))
    return out


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_banded_join_matches_brute_force(spark):
    delta = 100
    rows = [
        # same cell, in-window
        (1, 10, 1), (1, 50, 2),
        # adjacent-cell straddle: 95 -> 105 (cells 0 and 1), gap 10
        (1, 95, 3), (1, 105, 4),
        # exactly at delta: 105 -> 205 qualifies (gap == 100, two cells)
        (1, 205, 5),
        # beyond delta from 105 (gap 101) but within from 205
        (1, 206, 6),
        # tie on timestamp: ordered by id, single pair
        (2, 300, 7), (2, 300, 8),
        # different keys never pair
        (3, 10, 9),
        # same cell but key 3, gap 0 from itself excluded (no self-pair)
        (3, 10, 10),
    ]
    df = spark.createDataFrame(rows, "k long, t long, id long")
    got = {
        tuple(r)
        for r in banded_interval_self_join(df, "k", "t", "id", delta).collect()
    }
    assert got == _brute_pairs(rows, delta)


def test_banded_join_randomized_differential(spark):
    import random

    rng = random.Random(7)
    # include pre-epoch negatives: the cell assignment must FLOOR (a
    # truncating div would put -1..-36 in cell 0 with 0..36 and break
    # the adjacent-cell guarantee at the epoch boundary)
    rows = [
        (rng.randrange(3), rng.randrange(-500, 1000), i) for i in range(120)
    ]
    delta = 37  # deliberately not dividing the time span
    df = spark.createDataFrame(rows, "k long, t long, id long")
    got = {
        tuple(r)
        for r in banded_interval_self_join(df, "k", "t", "id", delta).collect()
    }
    assert got == _brute_pairs(rows, delta)


def test_banded_join_max_cell_drops_hot_cell(spark):
    delta = 100
    hot = [(1, 10 + i, i) for i in range(20)]  # one cell, 190 pairs
    cold = [(2, 10, 100), (2, 20, 101)]
    df = spark.createDataFrame(hot + cold, "k long, t long, id long")
    capped = banded_interval_self_join(
        df, "k", "t", "id", delta, max_cell=5
    ).collect()
    # the hot cell's earlier-side rows are dropped; the cold pair survives
    assert {(r.k, r.id_a, r.id_b) for r in capped} == {(2, 100, 101)}


def test_edit_distance_pairs_matches_brute_force(spark):
    names = [
        "cold rod", "old rod",      # deletion pair
        "cold rodx",                # insertion at the end
        "bold rod",                 # substitution vs cold rod
        "ab", "ba",                 # shares both deletion keys, lev 2: must NOT pair
        "aab", "ab ",               # repeated chars + trailing space
        "zzz",                      # isolated
        "cold rod",                 # duplicate input row: deduped, no self-pair
    ]
    df = spark.createDataFrame([(n,) for n in names], "s string")
    got = {tuple(r) for r in edit_distance_pairs(df, "s").collect()}
    dictionary = sorted(set(names))
    want = {
        (a, b, _lev(a, b))
        for a, b in itertools.combinations(dictionary, 2)
        if _lev(a, b) <= 1
    }
    assert got == want
    assert ("ab", "ba", 2) not in got  # the classic false positive, verified away


def test_edit_distance_pairs_max_block(spark):
    # serial ids: every pair differs in the last char, so the block keyed
    # by "id" (last char deleted) holds all ten strings; capping at 5
    # drops that block and with it every pair
    names = [f"id{i}" for i in range(10)]
    df = spark.createDataFrame([(n,) for n in names], "s string")
    assert edit_distance_pairs(df, "s", max_block=5).count() == 0
    full = edit_distance_pairs(df, "s").count()
    assert full == 45  # all pairs are substitutions at the last position


def test_edit_distance_pairs_rejects_wider_radius(spark):
    import pytest

    df = spark.createDataFrame([("a",)], "s string")
    with pytest.raises(ValueError):
        edit_distance_pairs(df, "s", max_dist=2)


def test_pairing_plans_have_no_nested_loop_join(spark):
    """Both operators exist to avoid the non-equi-join physical shapes;
    assert the plan is equi-join only."""
    import contextlib
    import io

    def _explain(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    ev = spark.range(100).select(
        (F.col("id") % 5).alias("k"),
        (F.col("id") * 13 % 997).alias("t"),
        F.col("id").alias("i"),
    )
    plan1 = _explain(banded_interval_self_join(ev, "k", "t", "i", 50))
    names = spark.createDataFrame([("abc",), ("abd",), ("xyz",)], "s string")
    plan2 = _explain(edit_distance_pairs(names, "s"))
    for plan in (plan1, plan2):
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


# round 9: the FastSS position filter — candidates must remain EXACT for
# lev<=1 (the filter kills distance-2 false positives only)


def test_edit_distance_pairs_position_filter_exactness(spark):
    """The repeated-char trap that rules out position-deduped variants:
    'ba'/'bb' share deletion variant 'b' ONLY at position 2 ('bb' also
    yields it at position 1) — a min-position dedup would miss the pair.
    And the filter must still kill the classic distance-2 class
    ('ab'/'ba' share 'a'/'b' at DIFFERENT positions)."""
    from database_migration_spark.operators.pairing import (
        edit_distance_pairs,
    )

    df = spark.createDataFrame(
        [("ba",), ("bb",), ("ab",), ("a",), ("b",), ("aab",)], "s STRING"
    )
    got = {
        (r.name_a, r.name_b)
        for r in edit_distance_pairs(df, "s").collect()
    }
    want = {
        ("ba", "bb"),   # substitution inside a repeated-char run
        ("ab", "bb"),   # substitution at position 1
        ("ab", "b"),    # deletion
        ("a", "ab"),    # insertion
        ("a", "b"),     # single-char substitution (empty variant, pos 1)
        ("a", "ba"),    # insertion at front
        ("b", "bb"),    # insertion
        ("b", "ba"),    # insertion
        ("aab", "ab"),  # insertion inside the run
    }
    assert got == want
    # the distance-2 class is gone at the CANDIDATE level, not just the
    # verify: ('ab','ba') shares variants only at different positions
    assert ("ab", "ba") not in got and ("aab", "ba") not in got


def test_fuzzy_join_position_filter_keeps_exact_and_lev1(spark):
    """Cross-relation form: exact matches (dist 0, pos-0 keys) and the
    repeated-char substitution both survive the position filter."""
    from database_migration_spark.operators.pairing import fuzzy_join

    left = spark.createDataFrame([("bb",), ("same",)], "v STRING")
    right = spark.createDataFrame([("ba",), ("same",), ("xx",)], "w STRING")
    got = {
        (r.left_value, r.right_value, r.dist)
        for r in fuzzy_join(left, right, "v", "w").collect()
    }
    assert got == {("bb", "ba", 1), ("same", "same", 0)}


def test_max_block_counts_distinct_strings_not_positioned_rows(spark):
    # repeated-char strings emit the SAME variant at several positions
    # (deliberately not deduped — the position guarantee needs them); the
    # bucket cap must count distinct STRINGS, not positioned rows, or a
    # calibrated max_block silently drops blocks and misses true lev-1
    # pairs (round-9 review). 'aaaa'/'aaab': the 'aaa' bucket holds 2
    # strings but 5 positioned rows.
    from database_migration_spark.operators.pairing import (
        edit_distance_pairs,
    )

    df = spark.createDataFrame([("aaaa",), ("aaab",)], "s string")
    got = {
        (r.name_a, r.name_b, r.dist)
        for r in edit_distance_pairs(df, "s", max_block=3).collect()
    }
    assert got == {("aaaa", "aaab", 1)}
