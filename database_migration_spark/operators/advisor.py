"""Join-plan advisor: measure, then recommend — broadcast, shuffle, salt.

The reference sizes its import parallelism from the source's own metadata
(partition bin-packing oracle_to_exasol.sql:210-252, `ora_hash` splits)
because guessing wrong wastes the cluster. The same discipline applies to
the star-join every migrated schema immediately runs: which dimensions fit
a broadcast, and which fact keys are skewed enough to stall a shuffle
join. Spark answers these at runtime (auto-broadcast by ESTIMATED size,
AQE skew split by partition), but the estimates come from file statistics
that a fresh load may not have, AQE cannot split one mega-key's bucket,
and a capacity plan wants the numbers BEFORE the job.

This advisor measures both from the data, exactly:

- per dimension: ``n_rows`` and ``est_bytes`` — an exact, engine-portable
  byte measure (octet_length for strings; fixed declared widths for
  numerics/temporals — the serialized-width convention, identical in the
  DuckDB oracle) — and ``broadcast`` vs ``shuffle`` against the caller's
  threshold (default: Spark's 10 MB autoBroadcastJoinThreshold).
- per fact join key: the measured top-1-value share in integer ppm
  (:func:`~database_migration_spark.operators.profile.distribution_key_advisor`
  machinery — one stacked scan over 8-byte hashes), and ``salt`` vs
  ``shuffle`` against the skew threshold (default 20%: one key owning a
  fifth of the fact is one task owning a fifth of the stage).

Scale shape: one single-pass aggregate per dimension (map-side combined
to ONE row), one stacked hash scan over the fact's join keys. Output is
|dims| + |keys| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

# declared widths for fixed-size types (bytes): the portable convention —
# the point is a deterministic cross-engine measure, not allocator truth
_WIDTHS = (
    (T.ByteType, 1), (T.ShortType, 2), (T.IntegerType, 4), (T.LongType, 8),
    (T.FloatType, 4), (T.DoubleType, 8), (T.DecimalType, 16),
    (T.DateType, 4), (T.TimestampType, 8), (T.TimestampNTZType, 8),
    (T.BooleanType, 1),
)


def _row_bytes(df: DataFrame) -> F.Column:
    terms = []
    for f in df.schema.fields:
        if isinstance(f.dataType, T.StringType):
            terms.append(
                F.coalesce(F.octet_length(F.col(f.name)), F.lit(0)).cast("long")
            )
        else:
            w = next(
                (w for t, w in _WIDTHS if isinstance(f.dataType, t)), 8
            )
            # fixed width counts only when present (NULL costs a bit, not
            # the slot — close enough for a portable convention)
            terms.append(
                F.when(F.col(f.name).isNotNull(), F.lit(w))
                .otherwise(F.lit(0)).cast("long")
            )
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    return total


def join_plan_advisor(
    fact: DataFrame,
    fact_keys: list[str],
    dims: list[tuple[str, DataFrame]],
    broadcast_threshold_bytes: int = 10 * 1024 * 1024,
    skew_threshold_ppm: int = 200_000,
) -> DataFrame:
    """One recommendation row per dimension and per fact join key.

    Columns: ``kind`` ('dim' | 'fact_key'), ``name``, ``n_rows`` (for a
    dim: its row count; for a fact key: its DISTINCT value count incl. a
    NULL slot — the shuffle's bucket population), ``est_bytes`` (NULL for
    fact keys), ``top1_share_ppm`` (NULL for dims), ``recommendation``
    ('broadcast' | 'shuffle' | 'salt').
    """
    if not dims and not fact_keys:
        raise ValueError("need at least one dim or fact key")
    from database_migration_spark.operators.profile import (
        distribution_key_advisor,
    )

    spark = fact.sparkSession
    parts = []
    for name, d in dims:
        parts.append(
            d.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.coalesce(F.sum(_row_bytes(d)), F.lit(0)).alias("est_bytes"),
            ).select(
                F.lit("dim").alias("kind"),
                F.lit(name).alias("name"),
                "n_rows",
                "est_bytes",
                F.lit(None).cast("long").alias("top1_share_ppm"),
                F.when(
                    F.col("est_bytes") <= broadcast_threshold_bytes,
                    F.lit("broadcast"),
                ).otherwise(F.lit("shuffle")).alias("recommendation"),
            )
        )
    if fact_keys:
        skew = distribution_key_advisor(fact, fact_keys).select(
            F.lit("fact_key").alias("kind"),
            F.col("column_name").alias("name"),
            (F.col("n_distinct") + F.when(F.col("n_null") > 0, 1).otherwise(0))
            .alias("n_rows"),
            F.lit(None).cast("long").alias("est_bytes"),
            "top1_share_ppm",
            F.when(
                F.coalesce(F.col("top1_share_ppm"), F.lit(0))
                > skew_threshold_ppm,
                F.lit("salt"),
            ).otherwise(F.lit("shuffle")).alias("recommendation"),
        )
        parts.append(skew)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def join_cardinality(
    a: DataFrame, b: DataFrame, keys: list, top: int = 10
) -> DataFrame:
    """Exact equi-join OUTPUT cardinality without running the join — the
    runaway-join guard. An accidental many-to-many (joining two facts on
    a non-key, the classic enrichment mistake) is invisible until the
    shuffle writes 10^13 rows; but the output size has a closed form,
    |A ⋈ B| = Σ_k cnt_A(k)·cnt_B(k), computable from two per-key count
    aggregates whose RESULT is distinct-key-sized — the guard costs two
    map-side-combined scans and a tiny count-join, never the join itself.

    Returns one row per top-``top`` contributing key (descending
    ``out_rows``, ascending key repr as the deterministic tie-break),
    plus two summary rows: ``*NULL*`` — rows with a NULL in any join key
    on either side, which an inner equi-join silently DROPS
    (``out_rows`` 0; nonzero ``rows_a``/``rows_b`` here is its own
    finding), and ``*TOTAL*`` — full input sizes with the exact total
    output cardinality. ``out_rows`` is DECIMAL(38,0): the whole point
    is predicting counts that overflow BIGINT-sized intuition.

    Columns: ``key`` (join-key values joined with '|'), ``rows_a``,
    ``rows_b``, ``out_rows``.

    Scale shape: per-key groupBy on each side (partial aggregation —
    the shuffle moves one row per distinct key), a count-join + one-row
    rollups over the count relations (persisted: each feeds the top-k,
    the total and the NULL row — the multi-branch persist rule). The
    driver never sees row data."""
    if not keys:
        raise ValueError("join_cardinality needs at least one join key")
    for side, df in (("a", a), ("b", b)):
        missing = [c for c in keys if c not in df.columns]
        if missing:
            raise ValueError(
                f"join keys {missing} not in side {side} "
                f"(columns: {df.columns})"
            )
    from pyspark import StorageLevel

    def counts(df: DataFrame, tag: str) -> DataFrame:
        return df.groupBy(*[F.col(k) for k in keys]).agg(
            F.count(F.lit(1)).cast("long").alias(f"cnt_{tag}")
        )

    any_null = None
    for k in keys:
        leg = F.col(k).isNull()
        any_null = leg if any_null is None else any_null | leg

    ca = counts(a, "a").persist(StorageLevel.MEMORY_AND_DISK)
    cb = counts(b, "b").persist(StorageLevel.MEMORY_AND_DISK)
    key_repr = F.concat_ws(
        "|", *[F.col(k).cast("string") for k in keys]
    )
    dec = "decimal(38,0)"
    matched = (
        ca.where(~any_null)
        .join(cb.where(~any_null), keys, "inner")
        .select(
            key_repr.alias("key"),
            F.col("cnt_a").alias("rows_a"),
            F.col("cnt_b").alias("rows_b"),
            (F.col("cnt_a").cast(dec) * F.col("cnt_b").cast(dec))
            .cast(dec)
            .alias("out_rows"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    topk = matched.orderBy(
        F.col("out_rows").desc(), F.col("key").asc()
    ).limit(int(top))

    def side_summary(c: DataFrame, tag: str) -> DataFrame:
        return c.agg(
            F.sum(f"cnt_{tag}").cast("long").alias(f"tot_{tag}"),
            F.sum(F.when(any_null, F.col(f"cnt_{tag}")).otherwise(0))
            .cast("long")
            .alias(f"null_{tag}"),
        )

    summary = (
        side_summary(ca, "a")
        .crossJoin(side_summary(cb, "b"))
        .crossJoin(
            matched.agg(
                F.coalesce(F.sum("out_rows"), F.lit(0).cast(dec))
                .cast(dec)
                .alias("tot_out")
            )
        )
    )
    null_row = summary.select(
        F.lit("*NULL*").alias("key"),
        F.col("null_a").alias("rows_a"),
        F.col("null_b").alias("rows_b"),
        F.lit(0).cast(dec).alias("out_rows"),
    )
    total_row = summary.select(
        F.lit("*TOTAL*").alias("key"),
        F.col("tot_a").alias("rows_a"),
        F.col("tot_b").alias("rows_b"),
        F.col("tot_out").alias("out_rows"),
    )
    return topk.unionByName(null_row).unionByName(total_row)
