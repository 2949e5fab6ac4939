"""Skew-defeating join: salt the hot side, replicate the other.

A shuffle join hash-partitions both sides on the join key, so one hot key
(the bot user, the NULL-surrogate customer, the default tenant) lands its
entire row volume in ONE task — the straggler that holds a 1000-executor
stage hostage while 999 cores idle. AQE's skew-join split
(``spark.sql.adaptive.skewJoin``) is the first line of defense and
handles moderate skew transparently; it splits oversized PARTITIONS, but
cannot split a single key's hash bucket finer than the key itself when
one key alone exceeds every threshold.

``salted_join`` is the classic explicit fix: the skewed side's rows get a
deterministic salt in ``[0, salts)``, the other side is replicated once
per salt value, and the join runs on ``(keys…, salt)`` — the hot key's
volume spreads over ``salts`` tasks at the cost of ``salts ×`` the
replicated side's shuffle bytes. Use when the replicated side is the
smaller one (dimension-sized but above the broadcast threshold) and the
skew is concentrated enough that AQE's partition-level split can't help.

The salt is ``pmod(xxhash64(every left column, seed), salts)`` — content-
deterministic (reruns and retries salt identically; no
``rand()``/``monotonically_increasing_id`` nondeterminism inside a
shuffle, which breaks task retry), and independent of the join key, so a
hot key's distinct rows spread evenly. Fully identical duplicate rows
share a salt by construction; volume-through-duplication of ONE exact row
is not spreadable by any content-deterministic scheme.

Reference seam: the reference parallelizes its import by splitting on the
source's distribution key (exa_to_exa README.md:294-298); this is the
same volume-splitting idea applied inside a single join stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    salts: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """``left.join(right, keys, how)`` with the left side salted and the
    right side replicated ``salts``×. Result-identical to the plain join
    (differential-tested); only the physical distribution changes.

    ``how`` ∈ {inner, left}: the replicated side's unmatched rows would
    come out once per salt under right/full semantics, so those raise.
    NULL join keys match nothing, as in any SQL join.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports inner/left only (a replicated right side "
            f"cannot express right/full semantics), got {how!r}"
        )
    if salts < 1:
        raise ValueError("salts must be >= 1")
    if "_salt" in left.columns or "_salt" in right.columns:
        raise ValueError("inputs may not already carry a _salt column")
    l = left.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns], F.lit(seed)),
               F.lit(salts)).cast("int"),
    )
    r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    return l.join(r, [*keys, "_salt"], how).drop("_salt")
