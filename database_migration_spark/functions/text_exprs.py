"""Portable text expressions: normalization, token counts, occurrence counts,
shingles. Each helper has a Spark Column form and a DuckDB SQL form so the
correctness oracle computes the *same algorithm* — both engines use
non-overlapping left-to-right replace and the same regex class syntax.

Everything is built-in-function only (JVM-side, codegen'd); the per-row cost
is O(len(text)) and fully partition-parallel — the shape that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_text(col: Column) -> Column:
    """lower + collapse whitespace runs to single spaces + trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def normalize_text_sql(expr: str) -> str:
    return rf"trim(regexp_replace(lower({expr}), '\s+', ' ', 'g'))"


def normalize_text_spark_sql(expr: str) -> str:
    """Spark-SQL-dialect text of :func:`normalize_text` (same algorithm,
    rendered for ``F.expr``/``selectExpr``) — for hot builders that bundle
    expressions as single SQL strings to avoid per-Column py4j round-trips
    (the r12 driver-build lesson; DuckDB oracles use
    :func:`normalize_text_sql`). ``'\\\\s+'`` survives Spark's string-literal
    unescaping as the ``\\s+`` regex."""
    return rf"trim(regexp_replace(lower({expr}), '\\s+', ' '))"


def token_count(col: Column) -> Column:
    """Whitespace token count; empty/blank text counts 0."""
    t = F.trim(col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def token_count_sql(expr: str) -> str:
    return (
        rf"CASE WHEN length(trim({expr})) = 0 THEN 0 "
        rf"ELSE len(string_split_regex(trim({expr}), '\s+')) END"
    )


def token_count_spark_sql(expr: str) -> str:
    """:func:`token_count` as Spark-SQL text (the r12 SQL-text
    convention; DuckDB oracles use :func:`token_count_sql`)."""
    return (
        rf"CASE WHEN length(trim({expr})) = 0 THEN 0 "
        rf"ELSE size(split(trim({expr}), '\\s+')) END"
    )


def char_class_count_spark_sql(expr: str, char_class: str) -> str:
    """:func:`char_class_count` as Spark-SQL text (same length-difference
    algorithm; caller passes a regex class literal that is valid inside a
    Spark single-quoted string)."""
    return (
        f"(length({expr}) - length(regexp_replace({expr},"
        f" '{char_class}', '')))"
    )


def occurrences(col: Column, needle: str) -> Column:
    """Non-overlapping occurrence count via length difference (portable)."""
    n = len(needle)
    return (F.length(col) - F.length(F.replace(col, F.lit(needle)))) / F.lit(n)


def occurrences_sql(expr: str, needle: str) -> str:
    esc = needle.replace("'", "''")
    return f"(length({expr}) - length(replace({expr}, '{esc}', ''))) / {len(needle)}"


def occurrences_spark_sql(expr: str, needle: str) -> str:
    """Spark-SQL-dialect text of :func:`occurrences` (same length-difference
    algorithm; Spark string literals escape backslashes, not doubled
    quotes) — for hot builders bundling whole score expressions into one
    ``F.expr`` (the r12 driver-build convention)."""
    esc = needle.replace("\\", "\\\\").replace("'", "\\'")
    return (
        f"(length({expr}) - length(replace({expr}, '{esc}', ''))) / {len(needle)}"
    )


def char_class_count(col: Column, char_class: str) -> Column:
    """Count of characters matching a regex class, e.g. '[^a-zA-Z]'."""
    return F.length(col) - F.length(F.regexp_replace(col, char_class, ""))


def char_class_count_sql(expr: str, char_class: str) -> str:
    return f"length({expr}) - length(regexp_replace({expr}, '{char_class}', '', 'g'))"


def char_shingles_pre_normalized(col: Column, k: int = 5) -> Column:
    """k-char shingles of an ALREADY-normalized string column.

    The input must be a materialized column, not an expression: anything
    placed inside the transform lambda is re-evaluated per element, so a
    regex normalization here would run len(text) times per row (O(len²) —
    measured 15s vs 3s on the sf0.1 corpus). Callers materialize
    normalize_text() through a projection barrier first.
    """
    n = F.greatest(F.length(col) - F.lit(k - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: col.substr(i, F.lit(k)),
    )


def char_shingles_pre_normalized_spark_sql(expr: str, k: int = 5) -> str:
    """:func:`char_shingles_pre_normalized` as Spark-SQL text (same
    sequence+transform+substring algebra; the r12 SQL-text convention).
    Same caveat: ``expr`` must reference a MATERIALIZED column — an
    expression here re-evaluates per array element."""
    return (
        f"transform(sequence(1, greatest(length({expr}) - {k - 1}, 1)), "
        f"i -> substring({expr}, i, {k}))"
    )


def char_shingles(col: Column, k: int = 5) -> Column:
    """All k-char shingles of the normalized text as an array (JVM-side).

    sequence+transform instead of a UDF: array of start offsets, substring
    each. Produces len-k+1 shingles; shorter texts produce the whole text.
    NOTE: normalization happens inline — fine for one-off use; hot paths
    should materialize normalize_text first and call
    char_shingles_pre_normalized (see its docstring).
    """
    return char_shingles_pre_normalized(normalize_text(col), k)


def char_shingles_sql(expr: str, k: int = 5) -> str:
    norm = normalize_text_sql(expr)
    return (
        f"list_transform(range(1, greatest(length({norm}) - {k - 1}, 1) + 1), "
        f"i -> substr({norm}, i::INT, {k}))"
    )


def word_ngrams(col: Column, n: int = 3) -> Column:
    """Word n-grams of normalized text (array<string>)."""
    toks = F.split(normalize_text(col), " ")
    cnt = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(0), cnt - 1),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )


# --- markup extraction (round 10) -------------------------------------------
#
# Web-corpus preparation's first step: HTML/markup → text. Regex-only so
# the whole pipeline is exactly portable (Java regex on the Spark side,
# RE2 in DuckDB — both support (?is) inline flags and lazy quantifiers;
# RE2 has NO backreferences, so script/style are separate patterns). ONE
# set of pattern constants feeds both engine forms; the stage ORDER is
# load-bearing: blocks drop first (their bodies may contain '<'), break
# tags become newlines, remaining tags strip, entities decode LAST (so
# '&lt;b&gt;' in text never becomes a strippable tag — and '&amp;lt;'
# correctly decodes to the literal '&lt;').

MARKUP_BLOCK_PATTERNS = [
    r"(?is)<script\b[^>]*>.*?</script\s*>",
    r"(?is)<style\b[^>]*>.*?</style\s*>",
    r"(?s)<!--.*?-->",
]
MARKUP_BREAK_PATTERN = (
    r"(?i)</?(br|p|div|li|h[1-6]|tr|table|ul|ol|blockquote|section|"
    r"article)\b[^>]*>"
)
MARKUP_TAG_PATTERN = r"(?s)<[^>]*>"
# &amp; LAST — see the ordering note above
MARKUP_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]
MARKUP_ANCHOR_PATTERN = r"(?is)<a\b[^>]*>(.*?)</a\s*>"


def _markup_entity_decode_sql(expr: str) -> str:
    for k, v in MARKUP_ENTITIES:
        v_sql = v.replace("'", "''")
        expr = f"replace({expr}, '{k}', '{v_sql}')"
    return expr


def _spark_sql_str(pattern: str) -> str:
    """A regex pattern as a Spark SQL string literal: Spark's parser
    treats backslash as an escape inside '…' (unlike DuckDB/standard
    SQL), so every backslash doubles."""
    return pattern.replace("\\", "\\\\")


def line_anchor_ppm_sql(expr: str) -> str:
    """The DuckDB form of :func:`line_anchor_ppm` (same patterns, same
    integer arithmetic; ``//`` is DuckDB's exact integer division)."""
    a_len = (
        f"list_sum(list_transform(regexp_extract_all({expr}, "
        f"'{MARKUP_ANCHOR_PATTERN}', 1), "
        f"a -> length(regexp_replace(a, '{MARKUP_TAG_PATTERN}', '', 'g'))))"
    )
    total = f"length(regexp_replace({expr}, '{MARKUP_TAG_PATTERN}', '', 'g'))"
    return (
        f"CAST(coalesce({a_len}, 0) * 1000000 // greatest({total}, 1) "
        "AS BIGINT)"
    )


def _markup_pre_break_sql_spark(expr: str) -> str:
    """Blocks dropped + break tags → newline, as a Spark SQL expression
    string (the pre-line-split stage; markup inside lines survives for
    the anchor-density signal)."""
    x = expr
    for p in MARKUP_BLOCK_PATTERNS:
        x = f"regexp_replace({x}, '{_spark_sql_str(p)}', ' ')"
    return (
        f"regexp_replace({x}, '{_spark_sql_str(MARKUP_BREAK_PATTERN)}', "
        "'\\n')"
    )


def _markup_pre_break_sql_duck(expr: str) -> str:
    x = expr
    for p in MARKUP_BLOCK_PATTERNS:
        x = f"regexp_replace({x}, '{p}', ' ', 'g')"
    return f"regexp_replace({x}, '{MARKUP_BREAK_PATTERN}', chr(10), 'g')"


def markup_line_txt_sql_spark(expr: str) -> str:
    """One line's visible text (tags stripped, entities decoded,
    horizontal whitespace collapsed, trimmed) — Spark SQL string form,
    usable inside a HOF lambda."""
    x = f"regexp_replace({expr}, '{_spark_sql_str(MARKUP_TAG_PATTERN)}', ' ')"
    x = _markup_entity_decode_sql(x)
    return f"trim(regexp_replace({x}, '[ \\\\t\\\\r]+', ' '))"


def markup_line_txt_sql_duck(expr: str) -> str:
    x = f"regexp_replace({expr}, '{MARKUP_TAG_PATTERN}', ' ', 'g')"
    x = _markup_entity_decode_sql(x)
    return f"trim(regexp_replace({x}, '[ \\t\\r]+', ' ', 'g'))"


def line_anchor_ppm_sql_spark(expr: str) -> str:
    """The Spark SQL string form of :func:`line_anchor_ppm`, usable
    inside a HOF lambda (the DuckDB form is
    :func:`line_anchor_ppm_sql`)."""
    a_pat = _spark_sql_str(MARKUP_ANCHOR_PATTERN)
    t_pat = _spark_sql_str(MARKUP_TAG_PATTERN)
    a_len = (
        f"aggregate(regexp_extract_all({expr}, '{a_pat}', 1), 0L, "
        f"(acc, a) -> acc + length(regexp_replace(a, '{t_pat}', '')))"
    )
    total = f"length(regexp_replace({expr}, '{t_pat}', ''))"
    return f"(({a_len}) * 1000000 div greatest({total}, 1))"
