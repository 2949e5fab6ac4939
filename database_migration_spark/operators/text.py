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


def lang_scores_spark_sql(expr: str) -> dict[str, str]:
    """:func:`lang_scores` rendered as Spark-SQL strings (same padded
    normalize, same length-difference occurrence counts, same long
    truncation — the r12 SQL-text convention; each dict value is one
    ``selectExpr`` term instead of ~25 chained Column calls)."""
    from database_migration_spark.functions.text_exprs import (
        normalize_text_spark_sql,
        occurrences_spark_sql,
    )

    padded = f"concat(' ', {normalize_text_spark_sql(expr)}, ' ')"
    return {
        lang: "bigint(0 + "
        + " + ".join(occurrences_spark_sql(padded, m) for m in markers)
        + ")"
        for lang, markers in sorted(LANG_MARKERS.items())
    }


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Predict language = argmax marker score, ties broken alphabetically
    (deterministic). Adds ``<out>`` and ``<out>_score``."""
    from database_migration_spark.functions.parallel import fan_out

    orig_cols = df.columns
    df = fan_out(df)
    scores = lang_scores_spark_sql(f"`{text_col}`")
    langs = sorted(scores)
    # two-phase: materialize each score ONCE as a named column, then argmax
    # over the columns. Building the when()-chain directly on the score
    # expressions would inline every expensive occurrence computation
    # O(langs) times into one projection (measured 13x slower).
    scored = df.selectExpr(
        "*", *[f"{scores[l]} AS `_s_{l}`" for l in langs]
    ).selectExpr(
        "*",
        f"greatest({', '.join(f'`_s_{l}`' for l in langs)})"
        f" AS `{out_col}_score`",
    )
    # alphabetical-first CASE: the first lang equal to the max wins;
    # score <= 0 is 'unknown'
    case = (
        f"CASE WHEN `{out_col}_score` <= 0 THEN 'unknown' "
        + " ".join(
            f"WHEN `_s_{l}` = `{out_col}_score` THEN '{l}'" for l in langs
        )
        + " ELSE 'unknown' END"
    )
    return scored.selectExpr("*", f"{case} AS `{out_col}`").select(
        *orig_cols, out_col, f"{out_col}_score"
    )


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
    from database_migration_spark.functions.text_exprs import (
        char_class_count_spark_sql,
        normalize_text_spark_sql,
        occurrences_spark_sql,
        token_count_spark_sql,
    )

    df = fan_out(df)
    # one selectExpr bundle (the r12 SQL-text convention — the chained
    # Column form cost ~170 py4j round-trips per call); identical algebra,
    # codegen CSE dedups the repeated count subtrees exactly as it did
    # for the shared Column objects
    q = f"`{text_col}`"
    n_chars = f"bigint(length({q}))"
    n_tokens = f"bigint({token_count_spark_sql(q)})"
    alpha = f"bigint({char_class_count_spark_sql(q, '[a-zA-Z]')})"
    punct = f"bigint({char_class_count_spark_sql(q, '[.,;:!?]')})"
    spaces = f"bigint({char_class_count_spark_sql(q, ' ')})"
    padded = f"concat(' ', {normalize_text_spark_sql(q)}, ' ')"
    stop = (
        "bigint(0 + "
        + " + ".join(occurrences_spark_sql(padded, m) for m in LANG_MARKERS["en"])
        + ")"
    )

    def ppm(a: str, b: str) -> str:
        return f"bigint(CASE WHEN {b} > 0 THEN floor({a} * 1000000 / {b}) END)"

    return df.selectExpr(
        "*",
        f"{n_chars} AS q_n_chars",
        f"{n_tokens} AS q_n_tokens",
        f"{ppm(alpha, n_chars)} AS q_alpha_ppm",
        f"{ppm(punct, n_chars)} AS q_punct_ppm",
        f"{ppm(f'({n_chars} - {spaces})', f'greatest({n_tokens}, 1)')}"
        " AS q_mean_token_len_ppm",
        f"{ppm(stop, f'greatest({n_tokens}, 1)')} AS q_stopword_ppm",
    )


def _gram_array(toks: Column, n: int) -> Column:
    """Word n-grams of a materialized token-array column (space-joined).
    Empty array when the doc has fewer than n tokens — sequence() would
    otherwise generate a DESCENDING range and fabricate grams."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + F.lit(j)) for j in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def repetition_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, "Scaling Language
    Models", appendix A1 — public paper): per document the repeated-word
    fraction, the fraction of characters covered by the most common word
    2-gram, and the fraction of characters covered by duplicated word
    3-grams (each occurrence counted, overlaps not collapsed — documented
    simplification of the paper's span-union). High values mark the
    boilerplate/keyword-stuffed documents a training pipeline drops.

    Output: (doc_id, n_words, n_distinct_words, rep_word_ppm,
    top_2gram_char_ppm, dup_3gram_char_ppm) — exact integer ppm so an
    external SQL oracle matches bit-for-bit.

    Scale shape: explode → groupBy keyed by (doc, gram) — partial
    aggregation map-side, key space grows with the corpus so no skew;
    the top-gram pick is max(struct(cnt, gram)) (deterministic tie-break
    on the gram text), never a global window. The token array is
    materialized behind a persist boundary so the normalize regex runs
    once per doc, not once per gram (the HOF-lambda re-evaluation trap).
    """
    from pyspark import StorageLevel

    from database_migration_spark.functions.parallel import fan_out

    raw = fan_out(df.select(F.col(id_col).alias("id"), F.col(text_col)))
    base = (
        raw.select("id", normalize_text(F.col(text_col)).alias("t"))
        .select(
            "id",
            F.length("t").cast("long").alias("n_chars"),
            F.split(F.col("t"), " ").alias("toks"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    def ppm(a: Column, b: Column) -> Column:
        return (
            F.when(b > 0, F.floor(a * F.lit(1_000_000) / b))
            .otherwise(F.lit(0))
            .cast("long")
        )

    wcounts = (
        base.select("id", F.explode("toks").alias("w"))
        .groupBy("id", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wstats = wcounts.groupBy("id").agg(
        F.sum("cnt").cast("long").alias("n_words"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_words"),
    )

    g2 = (
        base.select("id", F.explode(_gram_array(F.col("toks"), 2)).alias("g"))
        .groupBy("id", "g")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top2 = g2.groupBy("id").agg(
        F.max(F.struct(F.col("cnt"), F.col("g"))).alias("m")
    ).select(
        "id",
        (F.length(F.col("m.g")) * F.col("m.cnt")).alias("top2_chars"),
    )

    g3 = (
        base.select("id", F.explode(_gram_array(F.col("toks"), 3)).alias("g"))
        .groupBy("id", "g")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    dup3 = (
        g3.where(F.col("cnt") >= 2)
        .groupBy("id")
        .agg(F.sum(F.length(F.col("g")) * F.col("cnt")).alias("dup3_chars"))
    )

    return (
        base.select("id", "n_chars")
        .join(wstats, "id", "left")
        .join(top2, "id", "left")
        .join(dup3, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_words",
            "n_distinct_words",
            ppm(F.col("n_words") - F.col("n_distinct_words"), F.col("n_words")).alias(
                "rep_word_ppm"
            ),
            ppm(F.coalesce(F.col("top2_chars"), F.lit(0)), F.col("n_chars")).alias(
                "top_2gram_char_ppm"
            ),
            ppm(F.coalesce(F.col("dup3_chars"), F.lit(0)), F.col("n_chars")).alias(
                "dup_3gram_char_ppm"
            ),
        )
    )


# PII patterns: lookaround-free and word-boundary-free so Java regex
# (Spark) and RE2 (DuckDB/production scanners) agree exactly. A production
# pipeline swaps in stricter patterns; the operator shape (count + replace
# in one projection pass) is what matters at scale.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    "ipv4": (r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
}


def pii_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Count and redact PII-shaped spans (emails, phone numbers, IPv4):
    adds ``n_<kind>`` counts and ``text_redacted`` with every span replaced
    by its placeholder. One projection pass, no shuffle — pure scan-side
    work that scales linearly. Replacement order is the sorted pattern-name
    order (deterministic; email's host part is consumed before the ipv4
    pattern could see it, so counts are order-stable)."""
    from database_migration_spark.functions.parallel import fan_out

    df = fan_out(df)
    t = F.col(text_col)
    counts = [
        F.regexp_count(t, F.lit(pat)).cast("long").alias(f"n_{kind}")
        for kind, (pat, _) in sorted(PII_PATTERNS.items())
    ]
    red = t
    for kind, (pat, repl) in sorted(PII_PATTERNS.items()):
        red = F.regexp_replace(red, pat, repl)
    return df.select("*", *counts, red.alias("text_redacted"))


def pii_features_sql(text_expr: str) -> tuple[list[str], str]:
    """DuckDB forms: ([count exprs ...], redacted expr) mirroring
    :func:`pii_features` (same patterns, same order)."""
    counts = [
        f"CAST(len(regexp_extract_all({text_expr}, '{pat}')) AS BIGINT) AS n_{kind}"
        for kind, (pat, _) in sorted(PII_PATTERNS.items())
    ]
    red = text_expr
    for kind, (pat, repl) in sorted(PII_PATTERNS.items()):
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    return counts, red


URL_PATTERN = r"https?://[A-Za-z0-9.\-]+[A-Za-z0-9./_\-]*"


def url_domains(df: DataFrame, url_col: str) -> DataFrame:
    """Domain + top-level-domain of a URL column (empty string when the
    value is not URL-shaped) — the boilerplate/source-mix analysis columns
    of a web-corpus pipeline."""
    domain = F.regexp_extract(F.col(url_col), r"https?://([^/]+)", 1)
    tld = F.regexp_extract(domain, r"\.([A-Za-z0-9\-]+)$", 1)
    return df.withColumn("domain", domain).withColumn("tld", tld)


def term_frequencies(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    persist: bool = True,
) -> DataFrame:
    """(id, term, tf): THE tokenization contract — one fanned-out
    explode(split(normalize_text)) pass and a (doc, term) count. Shared by
    tf-idf (:func:`term_doc_stats`) and BM25 retrieval
    (operators/retrieval.py) so the engine has exactly one Spark-side
    tokenizer to keep in sync with ``text_exprs.normalize_text_sql`` on
    the oracle side. Persisted by default (every caller aggregates it at
    least twice); ``persist=False`` opts out for per-epoch callers."""
    from pyspark import StorageLevel

    tf = (
        token_stream(df, text_col, id_col)
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    return tf.persist(StorageLevel.MEMORY_AND_DISK) if persist else tf


def token_stream(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, term), one row per token OCCURRENCE — the shared
    pre-aggregation stage of :func:`term_frequencies` (same
    normalize/split pipeline, same ``text_exprs.normalize_text_sql`` +
    ``string_split`` oracle counterpart; the one-tokenizer rule). Callers
    that never need per-document counts (corpus-level heavy hitters)
    consume this map-only relation directly — no shuffle at all. NULL
    text emits zero rows (explode of a NULL array)."""
    from database_migration_spark.functions.parallel import fan_out

    raw = fan_out(df.select(F.col(id_col).alias("id"), F.col(text_col)))
    return raw.select(
        "id",
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("term"),
    )


def doc_token_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, dl): per-document token count — the COUNT form of THE shared
    tokenizer. ``dl`` is ``size()`` of the exact split array
    :func:`token_stream` explodes (same normalize/split pipeline), so it
    equals ``sum(tf)`` over :func:`term_frequencies` bit-for-bit — split
    of any non-NULL string yields >= 1 element (empty text tokenizes to
    one empty term on both engines) and each element counts once. NULL
    text yields no row, matching explode-of-NULL. Zero shuffle, no
    explode: callers that only need lengths (BM25 doc_lens / corpus
    stats) skip the full-vocabulary (id, term) aggregate entirely."""
    return df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.size(F.split(normalize_text(F.col(text_col)), " "))
        .cast("long")
        .alias("dl"),
    )


def term_doc_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, term, tf, df_docs, n_docs): term frequency per document joined
    with corpus document frequency — the base relation for tf-idf scoring,
    keyword extraction, and vocabulary pruning.

    Scale shape: one explode + two aggregations, both keyed by term or
    (doc, term) — map-side combined, key space grows with the data. The
    document-frequency side aggregates to ~vocabulary size and joins back
    on the term key; Catalyst/AQE broadcast it when small. n_docs is a
    1-row aggregate cross-joined (broadcast) onto every row. The tf
    relation (persisted inside :func:`term_frequencies` — two consumers
    here: dfreq and the output join) is the smaller post-aggregation
    relation, so caching it beats the former raw-token cache.
    """
    tf = term_frequencies(df, text_col, id_col)
    dfreq = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df_docs"))
    )
    n_docs = df.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    return tf.join(dfreq, "term").crossJoin(F.broadcast(n_docs)).select(
        "id", "term", "tf", "df_docs", "n_docs"
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 3,
) -> DataFrame:
    """Top distinguishing terms per document by an integer tf-idf surrogate:
    ``score = tf * 1_000_000 // df_docs`` (rarer term ⇒ bigger score).
    Integer floor-division instead of the float tf·ln(N/df) so every
    engine ranks identically (libm ulp differences would flip ties in a
    float score). Like tf-idf it grows with tf and shrinks with df; the
    exact trade-off curve differs, which is fine for a ranking surrogate
    and documented here. Ties break on the term text; output
    (doc_id, term, score_e6, term_rank), one per-doc window partition."""
    from pyspark.sql.window import Window

    stats = term_doc_stats(df, text_col, id_col)
    # long `div` keeps the floor exact for tf beyond 2^53/1e6 — a double
    # division would round the quotient before the floor
    score = F.expr("(tf * 1000000L) div df_docs")
    scored = stats.select("id", "term", score.cast("long").alias("score_e6"))
    w = Window.partitionBy("id").orderBy(F.col("score_e6").desc(), F.col("term").asc())
    return (
        scored.withColumn("term_rank", F.row_number().over(w).cast("long"))
        .where(F.col("term_rank") <= top_n)
        .select(F.col("id").alias(id_col), "term", "score_e6", "term_rank")
    )


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """Normalization-invariant document fingerprint: md5 of the normalized
    text. Two documents differing only in case/whitespace collide — the
    standard first-pass exact-dedup key."""
    return df.withColumn(out_col, F.md5(normalize_text(F.col(text_col))))


# Winnowing tie-break encoding: comb = hash * POS_SPACE + (POS_SPACE-1-pos).
# POS_SPACE covers every representable document by the engine's own
# semantics: the VARCHAR cap is 2,000,000 chars (reference
# sqlserver_to_exasol.sql:51-54, enforced loudly in typemap), so gram
# positions stay < 2^21; with a 39-bit gram hash the product tops out at
# 2^60 — exact in signed 64-bit on every engine (the md5_long rule).
WINNOW_POS_SPACE = 1 << 21
WINNOW_HASH_SPACE = 1 << 39


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003
    — the MOSS algorithm): hash every k-char gram of the normalized text,
    slide a window of ``window`` consecutive gram hashes, and select each
    window's minimum hash (rightmost occurrence on ties, the paper's
    rule). Output one row per distinct selected (hash, position):
    ``(id_col, fp_hash, fp_pos)``.

    Why this beats whole-doc :func:`fingerprint` for near-dup work: the
    selection is LOCAL, so it carries the paper's guarantee — any
    substring match of length >= window + k - 1 between two documents
    yields at least one shared fingerprint, while no match shorter than
    k is ever detected — with expected density 2/(window+1) of the gram
    count. The selected (hash, pos) set is the standard index for
    plagiarism / quote / overlap detection at corpus scale.

    Exact cross-engine arithmetic: the rightmost-min tie-break is encoded
    into one integer, ``comb = hash·2^21 + (2^21-1-pos)`` (min(comb) =
    min hash, rightmost position), with a 39-bit md5-derived gram hash so
    comb < 2^60 stays exact in signed 64-bit on both engines. Position
    space 2^21 covers the engine's 2M-char VARCHAR cap; a longer input
    raises loudly rather than mis-selecting.

    Scale shape: the ENTIRE selection is row-local — per-doc arrays of
    encoded gram hashes, window minima via ``slice``/``array_min``, and
    the per-doc dedup via ``array_distinct`` — so the operator is one
    map-only pass behind the fan_out barrier with ZERO shuffle. The first
    implementation sorted every gram row through a doc-keyed window
    (min-over-ROWS-frame): correct, but the corpus-wide sort measured
    **165× at the ×100 probe** (193 s, GC-thrashing) where the gram-hash
    work itself is the dup_span_coverage ~5 s regime — the
    remove_dup_spans round-7 lesson (keep per-doc work on per-doc arrays)
    re-applied. Expensive expressions are BOUND AS LAMBDA VARIABLES
    (``transform(array(e), x -> ...)`` evaluates ``e`` once per row, and
    a lambda variable is an O(1) reference), which is what stops
    CollapseProject from re-running the normalize per gram or the
    gram-hash array per window — the projection-collapse trap, hit twice
    while building this operator, both measured (48× and 165×).
    Documents with fewer than ``window`` grams emit nothing (below the
    guarantee threshold).
    """
    from database_migration_spark.functions.hashing import md5_long
    from database_migration_spark.functions.parallel import fan_out

    if k < 1 or window < 1:
        raise ValueError("need k >= 1 and window >= 1")

    def comb_of(t, i):
        # encoded gram hash at 1-based start i: hash·PS + (PS-1-(i-1));
        # the position-space bound is guarded ONCE PER ROW below, not here
        h = F.pmod(md5_long(t.substr(i, F.lit(k))), F.lit(WINNOW_HASH_SPACE))
        return h * F.lit(WINNOW_POS_SPACE) + (F.lit(WINNOW_POS_SPACE) - i)

    # norm bound once per row; gram-hash array bound once per row; each
    # window min is least() of `window` direct element lookups — a
    # slice()-per-window variant COPIES a fresh array per window
    # (~n allocations per doc) and measured ~5x slower at ×100
    ct_arr = F.get(
        F.transform(
            F.array(normalize_text(F.col(text_col))),
            lambda t: F.when(
                F.length(t) - F.lit(k - 1) <= WINNOW_POS_SPACE,
                F.transform(
                    F.sequence(F.lit(1), F.length(t) - F.lit(k - 1)),
                    lambda i: comb_of(t, i),
                ),
            ).otherwise(
                F.raise_error(
                    F.lit(
                        "winnow_fingerprints: document exceeds the "
                        "2^21-gram position space (inputs are capped at "
                        "2M chars upstream)"
                    )
                )
            ),
        ),
        0,
    )
    sel_arr = F.get(
        F.transform(
            F.array(ct_arr),
            lambda ct: F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size(ct) - F.lit(window)),
                    lambda j: (
                        F.least(*[F.get(ct, j + off) for off in range(window)])
                        if window > 1
                        else F.get(ct, j)
                    ),
                )
            ),
        ),
        0,
    )
    rows = (
        fan_out(df)
        .where(F.col(text_col).isNotNull())
        .where(F.length(normalize_text(F.col(text_col))) >= k + window - 1)
        .select(F.col(id_col).alias("id"), F.explode(sel_arr).alias("_wmin"))
    )
    return rows.select(
        F.col("id").alias(id_col),
        F.expr(f"_wmin div {WINNOW_POS_SPACE}").alias("fp_hash"),
        (
            F.lit(WINNOW_POS_SPACE - 1)
            - F.pmod(F.col("_wmin"), F.lit(WINNOW_POS_SPACE))
        )
        .cast("int")
        .alias("fp_pos"),
    )


def winnow_overlap_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
    min_shared: int = 5,
    max_bucket: "int | None" = None,
) -> DataFrame:
    """The MOSS match stage over :func:`winnow_fingerprints`: document
    pairs sharing at least ``min_shared`` distinct selected fingerprint
    hashes — the plagiarism/quote/overlap detector the winnowing paper
    builds (Schleimer et al. SIGMOD'03 §5, "ignoring matches of very
    common fingerprints" = ``max_bucket``: a fingerprint selected in more
    than that many documents is boilerplate/stop-gram signal and is
    dropped before the join, exactly the dedup family's hot-bucket cap).

    Output ``(doc_a, doc_b, shared)`` with ``doc_a < doc_b``; ``shared``
    counts distinct co-selected hashes, each witnessing a local gram
    match (k chars), with the winnowing guarantee inherited: a shared
    passage of length >= window + k - 1 contributes at least one shared
    hash per document.

    Scale shape — the full fingerprint relation is corpus-sized (~2/(w+1)
    of the gram count) and winnowing's selection is BIASED: globally
    small gram hashes get selected in nearly every document containing
    the gram (measured ×100: single fingerprints in 80 k docs), so the
    big relation must never be sorted or self-joined as-is. The plan
    therefore touches it with map-side-combinable work only: one
    ``groupBy(hash).countDistinct(id)`` (output is vocabulary-sized) to
    find the RARE hashes, a broadcast semi-filter down to them, and only
    then the distinct + self-join + pair aggregate — all on the tiny
    rare-hash slice (×100: ~86 k candidate pair rows). A first cut
    capped via the window-count path: sorting the full relation by hash
    measured >10 min at ×100 where this shape is winnow-cost + seconds."""
    from pyspark import StorageLevel

    fp = winnow_fingerprints(df, text_col, id_col, k, window).select(
        F.col(id_col).alias("id"), "fp_hash"
    )
    # two consumers (bucket sizes + the rare-hash filter join)
    fp = fp.persist(StorageLevel.MEMORY_AND_DISK)
    if max_bucket is not None:
        kept = (
            fp.groupBy("fp_hash")
            .agg(F.countDistinct("id").alias("_d"))
            .where(F.col("_d") <= max_bucket)
            .select("fp_hash")
        )
        fp = fp.join(kept, "fp_hash")
    # distinct AFTER the rare-hash filter: a hash selected at several
    # positions of one doc is one piece of shared evidence, but deduping
    # the corpus-sized relation first would shuffle all of it
    f2 = fp.distinct().persist(StorageLevel.MEMORY_AND_DISK)
    a = f2.select(F.col("id").alias("_ida"), "fp_hash")
    b = f2.select(F.col("id").alias("_idb"), "fp_hash")
    return (
        a.join(b, "fp_hash")
        .where(F.col("_ida") < F.col("_idb"))
        .groupBy("_ida", "_idb")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
        .where(F.col("shared") >= min_shared)
        .select(
            F.col("_ida").alias("doc_a"),
            F.col("_idb").alias("doc_b"),
            "shared",
        )
    )


def chunk_tokens(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Token-window chunking with overlap — the context-window layout step a
    RAG / pretraining pipeline runs before embedding or packing: each
    document becomes enough ``window``-token chunks (stepping ``stride``
    tokens, so consecutive chunks share ``window - stride`` tokens) to cover
    every token; the final chunk starts at the last stride multiple inside
    the document and may be shorter than ``window``.

    Output (doc_id, chunk_idx, start_tok, n_toks, chunk_h): token offsets
    for provenance and a 60-bit md5 of the chunk text — the chunk-level
    exact-dedup / embedding-cache key.

    Scale shape: pure per-row array arithmetic behind a fan_out barrier —
    no shuffle, no join; chunk rows multiply map-side (×ceil(n/stride)),
    which is how the 100 TB layout pass should run. Chunk count uses exact
    integer ceil-division, never float.
    """
    from database_migration_spark.functions.hashing import md5_long
    from database_migration_spark.functions.parallel import fan_out

    if not 0 < stride <= window:
        raise ValueError("need 0 < stride <= window")
    # NULL text yields no chunks (split(NULL) is a NULL array whose size is
    # -1 — without the filter one bogus n_toks=-1 row appears, where a SQL
    # oracle's range(NULL) correctly emits nothing)
    df = fan_out(df).where(F.col(text_col).isNotNull())
    toks = F.split(F.col(text_col), " ")
    base = df.select(F.col(id_col).alias("id"), toks.alias("_toks"))
    # chunks = 1 + ceil(max(n - window, 0) / stride), exact via long `div`
    n_chunks = F.expr(
        f"1L + (greatest(size(_toks) - {window}, 0) + {stride - 1}) div {stride}"
    )
    ch = base.select(
        "id",
        "_toks",
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * stride
    piece = F.slice(F.col("_toks"), start + 1, window)
    return ch.select(
        F.col("id").alias(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        start.cast("long").alias("start_tok"),
        F.size(piece).cast("long").alias("n_toks"),
        md5_long(F.concat_ws(" ", piece)).alias("chunk_h"),
    )


def bigram_lm_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    persist: bool = True,
) -> DataFrame:
    """Corpus count-based-LM substrate: per token, total occurrences (tf),
    document frequency (df_docs), and the Kneser-Ney continuation
    cardinalities — distinct right neighbours (n_right) and distinct left
    neighbours (n_left). These are the sufficient statistics a count-based
    language model (KenLM-style perplexity filtering of training corpora)
    aggregates from a corpus before smoothing.

    Scale shape: bigrams are built MAP-SIDE from each document's token
    array (zip with the self-shifted array) — no positional self-join; the
    only shuffles are token-keyed groupBys (vocabulary-sized cardinality,
    heavily combinable map-side). The exploded (id, w, nxt) relation feeds
    two groupBys (token-keyed and successor-keyed), so it is persisted —
    multi-consumer plan-branch rule — unless ``persist=False``
    (per-epoch/streaming callers).
    """
    pairs = _bigram_pairs(df, text_col, id_col, persist)
    wstats = pairs.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("tf"),
        F.countDistinct("id").cast("long").alias("df_docs"),
        F.countDistinct("nxt").cast("long").alias("n_right"),
    )
    # n_left = distinct predecessors of each token
    lstats = (
        pairs.where(F.col("nxt").isNotNull())
        .groupBy(F.col("nxt").alias("token"))
        .agg(F.countDistinct("w").cast("long").alias("n_left"))
    )
    return (
        wstats.withColumnRenamed("w", "token")
        .join(lstats, "token", "left")
        .select(
            "token",
            "tf",
            "df_docs",
            F.coalesce(F.col("n_left"), F.lit(0)).cast("long").alias("n_left"),
            "n_right",
        )
    )


def _bigram_pairs(
    df: DataFrame, text_col: str, id_col: str, persist: bool
) -> DataFrame:
    """(id, w, nxt) bigram relation built MAP-SIDE from each document's
    token array (zip with the self-shifted array — no positional
    self-join). ``nxt`` is NULL for the document-final token, so every
    token occurrence is exactly one row and countDistinct over ``nxt``
    skips the final-token null naturally. Persisted (multi-consumer rule)
    unless the caller manages lifecycles (per-epoch/streaming)."""
    from database_migration_spark.functions.parallel import fan_out

    df = fan_out(df)
    toks = F.split(F.col(text_col), " ")
    shifted = F.concat(F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
                       F.array(F.lit(None).cast("string")))
    pairs = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.arrays_zip(toks.alias("w"), shifted.alias("nxt"))).alias("p"),
    ).select("id", F.col("p.w").alias("w"), F.col("p.nxt").alias("nxt"))
    if persist:
        from pyspark import StorageLevel

        pairs = pairs.persist(StorageLevel.MEMORY_AND_DISK)
    return pairs


def bigram_typicality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    persist: bool = True,
) -> DataFrame:
    """Per-document corpus-typicality score — the integer surrogate of a
    bigram-LM perplexity filter: for each bigram (w → nxt) the corpus-wide
    conditional frequency floor(count(w,nxt)·1e6 / count(w,·)) in ppm; the
    document scores the floor-mean over its bigrams. Low score = the
    document's transitions are rare in this corpus (boilerplate from
    another distribution, garbled text); high = formulaic. All integer
    arithmetic (long `div`), so an external engine reproduces it exactly —
    a float logprob sum would diverge in the last ulp and flip rankings.

    Output (doc_id, n_bigrams, typicality_ppm); typicality_ppm is NULL for
    documents with no bigram (≤1 token).

    Scale shape: one bigram relation (map-side built, persisted — three
    consumers: the two count aggregates and the per-doc scoring join); the
    count tables are vocabulary²-bounded and broadcast-eligible; the final
    groupBy keys on the doc id.
    """
    pairs = _bigram_pairs(df, text_col, id_col, persist)
    big = pairs.where(F.col("nxt").isNotNull())
    c2 = big.groupBy("w", "nxt").agg(F.count(F.lit(1)).alias("c2"))
    c1 = big.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    scored = (
        big.join(c2, ["w", "nxt"])
        .join(c1, "w")
        .select("id", F.expr("(c2 * 1000000L) div c1").alias("ppm"))
    )
    agg = scored.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("ppm").alias("s"),
    )
    ids = df.select(F.col(id_col).alias("id"))
    return (
        ids.join(agg, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
            F.expr("s div n_bigrams").cast("long").alias("typicality_ppm"),
        )
    )


def _bpe_symbols(term_col) -> "Column":
    """Word → BPE symbol array: characters + the '</w>' end-of-word marker
    (merges never cross word boundaries). Shared by the trainer and the
    apply step so train→apply round-trips exactly."""
    return F.concat(
        F.expr(f"filter(split({term_col}, ''), x -> x <> '')"),
        F.array(F.lit("</w>")),
    )


def _bpe_merge_fold(left: str, right: str) -> "Column":
    """Greedy left-to-right application of ONE merge rule over the `sym`
    array as a fold: append the symbol, or when the accumulator ends with
    ``left`` and the symbol is ``right``, replace that tail element with
    the joined token. (A merged token cannot cascade within the pass —
    it differs from both of its parts.) Shared by trainer and apply."""
    joined = left + right
    return F.aggregate(
        F.col("sym"),
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(joined))),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def word_frequencies(
    df: DataFrame, text_col: str = "text", persist: bool = True
) -> DataFrame:
    """(term, freq) — corpus-wide word counts through THE tokenizer
    (:func:`term_frequencies`), aggregated over documents. The input
    relation for BPE training: everything after this is vocabulary-sized,
    independent of corpus row count."""
    from pyspark import StorageLevel

    wf = (
        term_frequencies(df, text_col, persist=False)
        .groupBy("term")
        .agg(F.sum("tf").cast("long").alias("freq"))
    )
    return wf.persist(StorageLevel.MEMORY_AND_DISK) if persist else wf


def bpe_train(
    df: DataFrame,
    n_merges: int = 20,
    text_col: str = "text",
    min_pair_freq: int = 2,
) -> list[tuple[str, str, int]]:
    """Distributed BPE vocabulary induction (Sennrich et al. 2016): learn
    ``n_merges`` merge rules over the corpus, returned as
    [(left, right, pair_freq), ...] in merge order.

    This is the industrial trainer shape: the corpus is scanned ONCE for
    word frequencies (:func:`word_frequencies` — the only stage whose cost
    grows with corpus size); every merge iteration then runs on the
    vocabulary-sized (word, freq, symbols) relation — adjacent-pair counts
    weighted by word frequency, argmax, and a greedy left-to-right fold
    applying the winning pair. At 100 TB the word-count scan dominates and
    the 10²-10⁵ merge iterations cost |vocab| each, not |corpus|.

    Determinism: exact integer pair counts; argmax ties break
    lexicographically on (left, right) — byte-identical merge tables on
    every run and engine. The per-iteration driver collect is ONE row (the
    winning pair), the same planner split as binpack's month counts. The
    greedy fold (merged symbols cannot cascade within one pass because the
    merged token differs from its parts) matches the reference Python BPE
    exactly — differential-tested in test_bpe.py.

    Stops early when no pair reaches ``min_pair_freq``.
    """
    # persist=False: the relation is consumed exactly once (the eager
    # localCheckpoint below materializes it) — caching it would serialize
    # every corpus-derived partition for nothing
    words = word_frequencies(df, text_col, persist=False)
    sym = words.select("freq", _bpe_symbols("term").alias("sym")).localCheckpoint()

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = sym.where(F.size("sym") >= 2).select(
            "freq",
            F.explode(
                F.zip_with(
                    F.slice(F.col("sym"), 1, F.size("sym") - 1),
                    F.expr("slice(sym, 2, size(sym) - 1)"),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("freq").cast("long").alias("c"))
            .orderBy(F.col("c").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["c"] < min_pair_freq:
            break
        left, right, c = top[0]["l"], top[0]["r"], int(top[0]["c"])
        merges.append((left, right, c))
        # localCheckpoint: truncate the lineage each iteration (the fold
        # expression would otherwise nest n_merges deep) — the relation is
        # vocabulary-sized, same protocol as connected_components rounds
        sym = sym.select(
            "freq", _bpe_merge_fold(left, right).alias("sym")
        ).localCheckpoint()
    return merges


def bpe_merge_table(
    df: DataFrame,
    n_merges: int = 20,
    text_col: str = "text",
    min_pair_freq: int = 2,
) -> DataFrame:
    """:func:`bpe_train` as a relation: (merge_ord, left, right, pair_freq)
    in merge order — the artifact a tokenizer build step writes out."""
    spark = df.sparkSession
    rows = [
        (i + 1, left, right, c)
        for i, (left, right, c) in enumerate(
            bpe_train(df, n_merges, text_col, min_pair_freq)
        )
    ]
    return spark.createDataFrame(
        rows, "merge_ord LONG, left STRING, right STRING, pair_freq LONG"
    )


def bpe_segment_terms(
    terms: DataFrame,
    merges: list[tuple],
    checkpoint_every: int = 8,
) -> DataFrame:
    """Apply a learned BPE merge table to a relation of distinct terms:
    (term) → (term, subwords array<string>). Merges apply in training
    order with the same greedy left-to-right fold the trainer used, so
    train→apply round-trips exactly.

    Scale shape: the input is the DISTINCT-term relation (vocabulary-sized)
    — segmenting the corpus itself goes through :func:`bpe_tokenize`,
    which broadcast-joins this table back to the token stream rather than
    folding every corpus row |merges| times. Lineage is truncated every
    ``checkpoint_every`` merges (the fold expressions nest otherwise).
    """
    sym = terms.select("term", _bpe_symbols("term").alias("sym"))
    for i, m in enumerate(merges):
        left, right = m[0], m[1]
        sym = sym.select("term", _bpe_merge_fold(left, right).alias("sym"))
        if (i + 1) % checkpoint_every == 0:
            sym = sym.localCheckpoint()
    return sym.select("term", F.col("sym").alias("subwords"))


def bpe_tokenize(
    df: DataFrame,
    merges: list[tuple],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Segment the corpus with a learned BPE merge table: (id, subword, n)
    — per-document subword counts, the unit a token-budget pipeline and a
    vocabulary-coverage report both consume.

    The corpus is tokenized ONCE (the shared tokenizer contract); the
    |merges|-fold segmentation runs only on the distinct-term relation
    (:func:`bpe_segment_terms`, vocabulary-sized) and comes back via a
    broadcast-eligible join on the term key — corpus rows are never folded
    per merge. Exact integer counts throughout.
    """
    # tf has two plan consumers (the distinct-term side and the final
    # join) — the multi-branch persist rule applies; term_frequencies'
    # default persist covers it
    tf = term_frequencies(df, text_col, id_col)
    seg = bpe_segment_terms(tf.select("term").distinct(), merges)
    return (
        tf.join(seg, "term")
        .select("id", F.explode("subwords").alias("subword"), "tf")
        .groupBy("id", "subword")
        .agg(F.sum("tf").cast("long").alias("n"))
        .select(F.col("id").alias(id_col), "subword", "n")
    )


def classifier_weights(dim: int, seed: int = 7, span: int = 8) -> list[int]:
    """Deterministic pseudo-random integer weight vector in [-span, span)
    for :func:`hashed_classifier_score` — the hyperplane_planes LCG so an
    external SQL oracle can embed the identical weights as literals
    (in production the weights come from a trained model; the generator
    exists for tests/demos and for pinning cross-engine parity)."""
    out = []
    state = seed
    for _ in range(dim):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        out.append(int((state >> 33) % (2 * span)) - span)
    return out


# largest weight vector the row-local classifier inlines into its SQL
# text; bigger models (real hashing-trick bucket counts, 2^18+) route
# through the broadcast weight table instead — see the docstring
_INLINE_DIM_MAX = 4096


def hashed_classifier_score(
    df: DataFrame,
    weights: list[int],
    text_col: str = "text",
    id_col: str = "doc_id",
    bias: int = 0,
    threshold: int = 0,
) -> DataFrame:
    """Linear text classifier APPLY over hashed bag-of-words features —
    the fastText-style quality/toxicity/language filter a training
    pipeline runs over every document: ``score = Σ_t tf_t ·
    w[md5(t) mod dim] + bias``, ``keep = score ≥ threshold``. The hashing
    trick (Weinberger et al. 2009) makes the feature space a fixed
    ``dim``-slot array, so applying the model is one broadcast join —
    no vocabulary relation, no OOV handling.

    Integer-exact across engines: integer weights, tf counts, 60-bit md5
    slot hashing (``functions.hashing.md5_long`` ↔ the documented DuckDB
    form) — never a float dot product. Tokenization is THE shared
    tokenizer (:func:`term_frequencies` / ``normalize_text_sql``).
    Documents with NULL/empty text get ``score = bias`` (the shared
    tokenizer drops them from the tf relation; the left join brings them
    back — the split(NULL) divergence rule).

    Scale shape (r12): the score is LINEAR in token occurrences, so the
    whole model applies row-locally — ``aggregate()`` over THE tokenizer's
    split array with the ``dim``-slot weight vector as an inline literal
    array: one fanned-out map pass, zero shuffles, zero joins (the
    vocabulary relation, the per-(doc, term) tf aggregate, the broadcast
    weight join and the per-doc score shuffle of the pre-r12 shape are all
    gone). Tokenization text is ``normalize_text_spark_sql`` + split — the
    exact SQL-text twin of :func:`token_stream`'s Column pipeline, so the
    one-tokenizer rule holds. NULL text: ``split(NULL)`` is a NULL array,
    ``aggregate(NULL, ..)`` is NULL, coalesce restores ``bias`` — the same
    value the old left join produced. Output (id, score, keep).

    Above ``_INLINE_DIM_MAX`` slots the weight vector no longer belongs
    in the expression text (a 2^18-bucket production model would render a
    multi-MB SQL literal into every task's serialized plan — review
    finding); the pre-r12 broadcast-weight-table route takes over, same
    integer algebra, same output (the two paths are pinned equal by the
    differential pytest at both sides of the threshold).
    """
    from database_migration_spark.functions.hashing import (
        md5_long,
        md5_long_spark_sql,
    )
    from database_migration_spark.functions.parallel import fan_out
    from database_migration_spark.functions.text_exprs import (
        normalize_text_spark_sql,
    )

    dim = len(weights)
    if dim > _INLINE_DIM_MAX:
        spark = df.sparkSession
        wdf = spark.createDataFrame(
            [(i, int(w)) for i, w in enumerate(weights)], "slot LONG, w LONG"
        )
        tf = term_frequencies(df, text_col, id_col, persist=False)
        scored = (
            tf.withColumn("slot", F.pmod(md5_long(F.col("term")), F.lit(dim)))
            .join(F.broadcast(wdf), "slot")
            .groupBy("id")
            .agg(F.sum(F.col("tf") * F.col("w")).cast("long").alias("_s"))
        )
        return (
            df.select(F.col(id_col).alias("id"))
            .join(scored, "id", "left")
            .select(
                "id",
                (F.coalesce(F.col("_s"), F.lit(0)) + F.lit(bias))
                .cast("long")
                .alias("score"),
            )
            .withColumn("keep", F.col("score") >= F.lit(threshold))
        )
    w_arr = "array(" + ", ".join(f"{int(w)}L" for w in weights) + ")"
    toks = f"split({normalize_text_spark_sql(text_col)}, ' ')"
    # per-occurrence w[md5(t) mod dim] summed in the row: tf_t * w appears
    # as w added tf_t times — identical integer algebra to the old
    # tf-relation form (pinned by the differential pytest)
    score_sql = (
        f"bigint(coalesce(aggregate({toks}, 0L, (acc, t) -> acc + "
        f"element_at({w_arr}, "
        f"int(pmod({md5_long_spark_sql('t')}, {dim})) + 1)), 0L) "
        f"+ {int(bias)}L)"
    )
    return fan_out(df.select(F.col(id_col).alias("id"), F.col(text_col))).selectExpr(
        "id", f"{score_sql} AS score"
    ).withColumn("keep", F.col("score") >= F.lit(threshold))


def extract_markup_text(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    min_line_chars: int = 1,
    max_anchor_ppm: int = 1_000_000,
) -> DataFrame:
    """Markup → main text, the web-corpus ingestion step: drop
    script/style/comment blocks, split on block/break tags, then keep a
    line only when its visible text has at least ``min_line_chars``
    chars AND its link density (chars inside ``<a>…</a>`` as ppm of the
    line's visible chars, exact integer arithmetic) is at most
    ``max_anchor_ppm`` — nav bars, menus and link footers are ~100%
    anchor text, prose ~0% (the boilerplate heuristic of
    trafilatura/jusText reduced to its regex-expressible core; the
    default keeps every non-blank line).

    Output: ``id_col``, ``text`` (kept lines joined by newline),
    ``n_lines`` (kept), ``n_chars``. NULL markup rows are dropped
    explicitly (the round-5 chunk_tokens rule: ``split(NULL)`` is a
    NULL array whose ``size`` is -1 in Spark while a SQL oracle emits
    NULL — the engines diverge on exactly the rows nobody planted in
    the fixtures).

    Scale shape: one row-local expression per document, evaluated ONCE —
    per-line (text, density) structs so the filter and the projection
    share one computation, and an ``inline()`` generator materializes
    the (text, n_lines) pair so the two output columns cannot inline
    two copies of the regex chain into the projection (HOF lambdas are
    outside codegen subexpression elimination — the round-9b
    projection-collapse family; first shape measured ~2x). Zero
    shuffle, no UDF; the line filter happens INSIDE the array (the
    remove_dup_spans lesson: per-doc work belongs on per-doc arrays,
    never on an exploded doc-keyed window).

    Everything is driven by the shared pattern constants in
    functions/text_exprs.py; the DuckDB oracle replays the identical
    stages (markup_extract_documents)."""
    from database_migration_spark.functions.text_exprs import (
        _markup_pre_break_sql_spark,
        line_anchor_ppm_sql_spark,
        markup_line_txt_sql_spark,
    )

    if not 0 <= int(max_anchor_ppm) <= 1_000_000:
        raise ValueError("max_anchor_ppm must be in [0, 1000000]")
    if int(min_line_chars) < 1:
        raise ValueError("min_line_chars must be >= 1")
    pre = _markup_pre_break_sql_spark(f"`{html_col}`")
    txt = markup_line_txt_sql_spark("l")
    ppm = line_anchor_ppm_sql_spark("l")
    scored = (
        f"transform(split({pre}, '\\n'), "
        f"l -> named_struct('t', {txt}, 'p', {ppm}))"
    )
    kept = (
        f"filter({scored}, s -> length(s.t) >= {int(min_line_chars)} "
        f"AND s.p <= {int(max_anchor_ppm)})"
    )
    gen = (
        f"inline(transform(array({kept}), x -> named_struct("
        f"'text', array_join(transform(x, s -> s.t), '\\n'), "
        f"'n_lines', CAST(size(x) AS BIGINT))))"
    )
    return (
        df.where(F.col(html_col).isNotNull())
        .select(F.col(id_col), F.expr(gen))
        .withColumn("n_chars", F.length("text").cast("long"))
    )
