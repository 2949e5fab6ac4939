"""End-to-end corpus cleaning: the pipeline a training-data team runs,
with a per-stage attrition report.

The stages compose operators that each exist (and are each oracle-proven)
standalone — quality filtering (text.quality_features), exact dedup
(dedup.exact_dedup), benchmark decontamination
(dedup.benchmark_contamination), salted split (sampling.hash_split). What
this module adds is the SHAPE a production pipeline needs:

- **One annotation pass, not N filtered copies.** Every document gets a
  ``drop_reason`` — the FIRST stage that rejects it — derived column-wise:
  the corpus is never materialized once per stage, and the attrition
  report (the number every pipeline review asks for: "where did my data
  go?") is ONE groupBy over the annotated relation.
- **Stage semantics follow production order**: dedup runs among
  quality-passing documents (a spam page and its duplicate both leave via
  'quality', not one via 'quality' and one via 'exact_duplicate');
  decontamination runs among dedup survivors; the split is assigned only
  to kept documents.
- **Bounded auxiliary relations.** The dedup winners table is
  (fingerprint, keep_id) — no text; the benchmark shingle set is
  broadcast (benchmarks are tiny next to the corpus); the split is a pure
  salted-hash filter with no shuffle.

Scale shape: two corpus scans end-to-end (the quality/fingerprint
annotation pass and the contamination shingle pass), one hash-keyed
dedup aggregate, one broadcast probe — each linear and individually
measured at 10×/100× (SCALE.md); nothing here adds a join the standalone
operators don't have.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

STAGES = ("null_text", "quality", "exact_duplicate", "contaminated")


def annotate_corpus(
    docs: DataFrame,
    benchmark: DataFrame,
    min_tokens: int = 25,
    min_alpha_ppm: int = 200_000,
    max_contamination_ppm: int = 800_000,
    shingle_k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    val_permille: int = 10,
    test_permille: int = 10,
    persist: bool = True,
) -> DataFrame:
    """The corpus with ``drop_reason`` (NULL = kept) and, for kept
    documents, a deterministic ``split`` — see module docstring for the
    stage semantics. ``persist=False`` for foreachBatch callers (the
    per-epoch-plan cache rule)."""
    from pyspark import StorageLevel

    from database_migration_spark.operators.dedup import (
        benchmark_contamination,
        exact_dedup,
    )
    from database_migration_spark.operators.sampling import hash_split
    from database_migration_spark.operators.text import quality_features

    from database_migration_spark.functions.text_exprs import normalize_text

    q = quality_features(docs, text_col=text_col)
    quality_ok = (
        F.col(text_col).isNotNull()
        & (F.coalesce(F.col("q_n_tokens"), F.lit(0)) >= min_tokens)
        & (F.coalesce(F.col("q_alpha_ppm"), F.lit(-1)) >= min_alpha_ppm)
    )
    ann = q.withColumn("_quality_ok", quality_ok)
    # ONE normalization pass shared by the dedup fingerprint and the
    # contamination shingles (r12): both downstream operators consume the
    # persisted ``_nt`` column instead of each re-running the regex over
    # the corpus (contamination's internal fan_out + normalize drop out;
    # its narrow post-survivor (id, _t) persist remains — that is the
    # warm-re-execution barrier downstream of the semi-join). ``_nt`` is
    # computed only for quality passers — only they reach dedup /
    # contamination, and on a high-attrition corpus normalizing (and
    # caching) the failures would be pure waste (review finding). Persist
    # is the materialization barrier the shingle transform requires; on
    # the persist=False (foreachBatch) path the operators keep their
    # internal normalization — inlining ``_nt`` there would re-evaluate
    # the regex per shingle (the round-9b projection-collapse trap).
    if persist:
        ann = ann.withColumn(
            "_nt",
            F.when(F.col("_quality_ok"), normalize_text(F.col(text_col))),
        )
        ann = ann.persist(StorageLevel.MEMORY_AND_DISK)

    passers = ann.where(F.col("_quality_ok"))
    winners = exact_dedup(
        passers,
        text_col="_nt" if persist else text_col,
        id_col=id_col,
        pre_normalized=persist,
    ).select("keep_id")
    survivors = passers.join(
        winners, passers[id_col] == winners["keep_id"], "left_semi"
    )
    conta = benchmark_contamination(
        survivors,
        benchmark,
        text_col=text_col,
        id_col=id_col,
        k=shingle_k,
        corpus_norm_col="_nt" if persist else None,
    ).select(
        F.col(id_col).alias("_cid"),
        (F.col("contamination_ppm") >= max_contamination_ppm).alias("_hot"),
    )

    # ONE narrow flags relation (winner ⟕ contamination — contamination
    # only covers dedup survivors, a subset of winners), so the WIDE
    # annotated corpus shuffles through exactly one join: at 100 TB the
    # flags are corpus-cardinality but a few bytes per row, while every
    # extra join of `ann` re-shuffles the text
    flags = (
        winners.select(F.col("keep_id").alias("_fid"))
        .join(conta, F.col("_fid") == F.col("_cid"), "left")
        .select("_fid", F.coalesce(F.col("_hot"), F.lit(False)).alias("_hot"))
    )
    joined = ann.join(flags, ann[id_col] == flags["_fid"], "left")
    reason = (
        F.when(F.col(text_col).isNull(), F.lit("null_text"))
        .when(~F.col("_quality_ok"), F.lit("quality"))
        .when(F.col("_fid").isNull(), F.lit("exact_duplicate"))
        .when(F.col("_hot"), F.lit("contaminated"))
    )
    out = joined.select(
        *docs.columns, reason.alias("drop_reason")
    )
    out = hash_split(
        out, id_col, val_permille=val_permille, test_permille=test_permille
    ).withColumn(
        "split",
        F.when(F.col("drop_reason").isNull(), F.col("split")),
    )
    return out


def attrition_report(annotated: DataFrame) -> DataFrame:
    """(stage, n_docs): one row per drop reason plus kept_train /
    kept_val / kept_test — ONE aggregation over the annotated corpus."""
    stage = F.coalesce(
        F.col("drop_reason"), F.concat(F.lit("kept_"), F.col("split"))
    )
    return (
        annotated.groupBy(stage.alias("stage"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


def corpus_clean(annotated: DataFrame) -> DataFrame:
    """The kept corpus (original columns + split)."""
    return annotated.where(F.col("drop_reason").isNull()).drop("drop_reason")
