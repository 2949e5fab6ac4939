"""Text analysis operators for large-corpus pipelines: language ID, quality
scoring, token stats, document fingerprinting.

These extend the reference's surface (BASELINE.json north star): the
reference has no text analytics, but a 100 TB training-data pipeline needs
them as first-class scans. Every operator is a narrow projection over the
documents table — built-in functions only, one pass, no shuffle, fully
partition-parallel; Catalyst prunes the scan to exactly the columns used.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from database_migration_spark.functions.text_exprs import (
    char_class_count,
    normalize_text,
    occurrences,
    token_count,
)

# language marker words (surrounded by spaces so they match whole tokens).
# A real system would use fastText/cld3; the heuristic keeps the operator
# dependency-free and deterministic for oracle comparison, and its plumbing
# (argmax over per-language scores) is identical to what a model-based
# scorer needs.
LANG_MARKERS: dict[str, list[str]] = {
    "de": [" der ", " und ", " die ", " nicht "],
    "en": [" the ", " and ", " of ", " to "],
    "es": [" el ", " los ", " de la ", " que "],
    "fr": [" le ", " la ", " et ", " les "],
    "zh": ["的", "是", "了"],
}


def lang_scores(col: Column) -> dict[str, Column]:
    """Marker-occurrence score per language over ' '||text||' '."""
    padded = F.concat(F.lit(" "), normalize_text(col), F.lit(" "))
    return {
        lang: sum((occurrences(padded, m) for m in markers), F.lit(0)).cast("long")
        for lang, markers in sorted(LANG_MARKERS.items())
    }


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Predict language = argmax marker score, ties broken alphabetically
    (deterministic). Adds ``<out>`` and ``<out>_score``."""
    from database_migration_spark.functions.parallel import fan_out

    df = fan_out(df)
    scores = lang_scores(F.col(text_col))
    langs = sorted(scores)
    # two-phase: materialize each score ONCE as a named column, then argmax
    # over the columns. Building the when()-chain directly on the score
    # expressions would inline every expensive occurrence computation
    # O(langs) times into one projection (measured 13x slower).
    scored = df.select("*", *[scores[l].alias(f"_s_{l}") for l in langs])
    best_score = F.greatest(*[F.col(f"_s_{l}") for l in langs])
    best_lang = F.lit("unknown")
    # reversed CASE: first (alphabetical) lang equal to the max wins
    for lang in reversed(langs):
        best_lang = F.when(F.col(f"_s_{lang}") == best_score, F.lit(lang)).otherwise(
            best_lang
        )
    best_lang = F.when(best_score <= 0, F.lit("unknown")).otherwise(best_lang)
    return scored.withColumn(out_col, best_lang).withColumn(
        f"{out_col}_score", best_score
    ).drop(*[f"_s_{l}" for l in langs])


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: char/token counts, alpha/punct ratios,
    mean token length, stopword ratio — the length/punct/stopword heuristics
    used to filter web corpora.

    Ratios are expressed as exact integer parts-per-million (``*_ppm``,
    floor((a*1_000_000)/b)) rather than floats/decimals: decimal division
    rounds at a scale boundary and engines disagree on tie-rounding for
    power-of-two denominators, while integer floor-division is bit-identical
    everywhere — so an external oracle reproduces these exactly.
    """
    from database_migration_spark.functions.parallel import fan_out

    df = fan_out(df)
    t = F.col(text_col)
    n_chars = F.length(t).cast("long")
    n_tokens = token_count(t).cast("long")
    alpha = char_class_count(t, "[a-zA-Z]").cast("long")
    punct = char_class_count(t, r"[.,;:!?]").cast("long")
    spaces = char_class_count(t, " ").cast("long")
    padded = F.concat(F.lit(" "), normalize_text(t), F.lit(" "))
    stop = sum((occurrences(padded, m) for m in LANG_MARKERS["en"]), F.lit(0)).cast("long")

    def ppm(a: Column, b: Column) -> Column:
        return F.when(b > 0, F.floor(a * F.lit(1_000_000) / b)).otherwise(F.lit(None)).cast("long")

    return df.select(
        "*",
        n_chars.alias("q_n_chars"),
        n_tokens.alias("q_n_tokens"),
        ppm(alpha, n_chars).alias("q_alpha_ppm"),
        ppm(punct, n_chars).alias("q_punct_ppm"),
        ppm(n_chars - spaces, F.greatest(n_tokens, F.lit(1))).alias("q_mean_token_len_ppm"),
        ppm(stop, F.greatest(n_tokens, F.lit(1))).alias("q_stopword_ppm"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """Normalization-invariant document fingerprint: md5 of the normalized
    text. Two documents differing only in case/whitespace collide — the
    standard first-pass exact-dedup key."""
    return df.withColumn(out_col, F.md5(normalize_text(F.col(text_col))))
