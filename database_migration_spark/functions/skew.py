"""Skew mitigation for joins.

AQE's skew-join splitting (on in our session factory) handles moderate skew
at runtime; explicit salting remains the tool when one key dominates so hard
that even split partitions blow past executor memory, or when AQE is off
(streaming joins, some serverless runtimes).

``salted_join``: the large side gets a deterministic pseudo-random salt in
[0, salts); the small side is exploded ``salts`` times so every
(key, salt) bucket finds its match. The shuffle key becomes (key, salt) —
a single hot key now spreads across ``salts`` reducers. Cost: the small
side is duplicated ``salts``× (it must actually be small).

groupBy skew needs no salting in Spark: partial aggregation already
combines map-side, so a hot group arrives at its reducer pre-reduced — one
row per upstream partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``on`` with the shuffle spread over ``salts`` buckets.

    Deterministic: the large side's salt derives from xxhash64 of the whole
    row (any assignment is correct for join semantics; hashing the row keeps
    reruns stable for tests). Result equals ``large.join(small, on, how)``.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (small side must be unique-ish per key)")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(salts))
    big = large.withColumn("_salt", salt)
    exploded = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    return big.join(exploded, [*on, "_salt"], how).drop("_salt")
