"""Hierarchy flattening (operators/hierarchy.py)."""

import pytest

from database_migration_spark.operators.hierarchy import flatten_hierarchy


def test_forest_roots_depths(spark):
    """Two trees + an isolated root: every node reaches its root with the
    exact hop count; roots are depth 0 of themselves."""
    #   1          2        9
    #   └ 10       └ 20
    #     └ 100      └ 21
    #       └ 1000
    rows = [
        (1, None), (10, 1), (100, 10), (1000, 100),
        (2, None), (20, 2), (21, 20),
        (9, None),
    ]
    df = spark.createDataFrame(rows, "id long, parent_id long")
    got = {r.id: (r.root_id, r.depth) for r in flatten_hierarchy(df).collect()}
    assert got == {
        1: (1, 0), 10: (1, 1), 100: (1, 2), 1000: (1, 3),
        2: (2, 0), 20: (2, 1), 21: (2, 2),
        9: (9, 0),
    }


def test_deep_chain_converges_in_log_rounds(spark):
    """A depth-40 chain must resolve within pointer-doubling's ~log2(40)
    rounds — max_rounds=8 covers depth 2^8, far past 40; per-LEVEL
    iteration would need 40 rounds and fail this bound."""
    rows = [(0, None)] + [(i, i - 1) for i in range(1, 41)]
    df = spark.createDataFrame(rows, "id long, parent_id long")
    got = {r.id: (r.root_id, r.depth)
           for r in flatten_hierarchy(df, max_rounds=8).collect()}
    assert got[40] == (0, 40) and got[1] == (0, 1) and got[0] == (0, 0)


def test_cycle_raises(spark):
    rows = [(1, 3), (2, 1), (3, 2), (7, None), (8, 7)]
    df = spark.createDataFrame(rows, "id long, parent_id long")
    with pytest.raises(ValueError, match="CYCLE"):
        flatten_hierarchy(df, max_rounds=6)


def test_dangling_parent_terminates_with_null_root(spark):
    """Broken referential integrity (parent id absent) must terminate the
    walk with root_id NULL and the depth walked — not loop to the cycle
    bound, and not silently drop the subtree (CTE behavior)."""
    rows = [(1, None), (2, 1), (5, 99), (6, 5)]  # 99 does not exist
    df = spark.createDataFrame(rows, "id long, parent_id long")
    got = {r.id: (r.root_id, r.depth)
           for r in flatten_hierarchy(df, max_rounds=6).collect()}
    assert got[1] == (1, 0) and got[2] == (1, 1)
    assert got[5] == (None, 1)      # walked one hop, hit the void
    assert got[6][0] is None        # breakage propagates down the chain
