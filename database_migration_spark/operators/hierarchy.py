"""Hierarchical traversal: flatten a parent-child relation to
(id, root_id, depth) — the CONNECT BY / recursive-CTE workload.

Reference: Exasol supports CONNECT BY (the reference's dialect;
integer-series generation via connect-by-level is already covered by the
``integer_series`` query — this operator is the general TRAVERSAL form:
org charts, category trees, BOM structures).

Spark shape — pointer doubling, NOT per-level iteration: every round
joins each node's current ancestor pointer to that ancestor's own
pointer, doubling the jump length (1, 2, 4, ...), so a depth-D hierarchy
converges in ceil(log2 D) rounds of keyed equi-joins instead of D
chained joins. Each round is one shuffle join keyed on the ancestor id +
a localCheckpoint (the connected_components lesson: an iterative plan
nested max_iter deep sends Catalyst analysis exponential). At 100 TB the
relation is (id, anc, depth) longs — three columns regardless of the
node payload, which joins back by id at the end.

Cycles: a cycle never reaches a root, so its nodes' depths keep growing.
Convergence is "no row changed this round"; rows still unconverged at
``max_rounds`` (default 40 ≈ depth 2^40) raise — a real hierarchy is
never that deep, a cycle always looks that deep.

Dangling parents (a parent id absent from the relation — broken
referential integrity): the walk terminates immediately with
``root_id = NULL`` and the depth walked so far, surfacing the breakage
row-by-row instead of either looping or silently dropping the subtree
(a recursive CTE silently EXCLUDES such nodes; filter
``root_id IS NULL`` to reconcile, or to find the broken chains).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def flatten_hierarchy(
    df: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent_id",
    max_rounds: int = 40,
) -> DataFrame:
    """(id, root_id, depth): the root each node reaches by following
    parent pointers, and how many hops away it is. A root is a node with
    NULL parent (depth 0, its own root)."""
    from pyspark import StorageLevel

    nodes = df.select(
        F.col(id_col).alias("id"), F.col(parent_col).alias("parent")
    )
    # state: anc = current known ancestor (root ⇒ anc = id), depth = hops
    # to anc, done = anc is a root
    state = nodes.select(
        "id",
        F.coalesce(F.col("parent"), F.col("id")).alias("anc"),
        F.when(F.col("parent").isNull(), F.lit(0)).otherwise(F.lit(1))
        .cast("long")
        .alias("depth"),
        F.col("parent").isNull().alias("done"),
    ).localCheckpoint(eager=True)
    roots = nodes.where(F.col("parent").isNull()).select(
        F.col("id").alias("rid")
    ).persist(StorageLevel.MEMORY_AND_DISK)

    for _ in range(max_rounds):
        if state.where(~F.col("done")).isEmpty():
            break
        ptr = state.select(
            F.col("id").alias("p_id"),
            F.col("anc").alias("p_anc"),
            F.col("depth").alias("p_depth"),
            F.col("done").alias("p_done"),
        )
        # jump: follow the ancestor's own pointer (doubles the distance);
        # done rows pass through untouched. A pointer into the void
        # (p_id NULL on a live row: the parent id does not exist) is
        # TERMINAL — root unresolvable, depth as walked; without this the
        # row would never converge and a broken edge would masquerade as
        # a cycle after max_rounds of wasted joins.
        dangling = ~F.col("done") & F.col("p_id").isNull()
        state = (
            state.join(ptr, state["anc"] == ptr["p_id"], "left")
            .select(
                "id",
                F.when(dangling, F.lit(None).cast(state.schema["anc"].dataType))
                .when(F.col("done"), F.col("anc"))
                .otherwise(F.col("p_anc"))
                .alias("anc"),
                F.when(F.col("done") | dangling, F.col("depth"))
                .otherwise(F.col("depth") + F.col("p_depth"))
                .alias("depth"),
                (F.col("done") | dangling | F.coalesce(F.col("p_done"), F.lit(False)))
                .alias("done"),
            )
            .localCheckpoint(eager=True)
        )
    else:
        n = state.where(~F.col("done")).count()
        if n:
            raise ValueError(
                f"hierarchy did not converge after {max_rounds} pointer-"
                f"doubling rounds ({n} nodes unresolved) — depth beyond "
                f"2^{max_rounds} means a CYCLE in the parent relation"
            )
    return state.select("id", F.col("anc").alias("root_id"), "depth")
