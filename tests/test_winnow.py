"""Winnowing fingerprints (text.winnow_fingerprints) vs a pure-Python
reference implementation of Schleimer/Wilkerson/Aiken SIGMOD'03, plus the
paper's guarantee property and the degenerate-input edges."""

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from database_migration_spark.operators.text import (
    WINNOW_HASH_SPACE,
    WINNOW_POS_SPACE,
    winnow_fingerprints,
)


def _norm(s: str) -> str:
    return re.sub(r"\s+", " ", s.lower()).strip()


def _h(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16) % WINNOW_HASH_SPACE


def _reference(text: str, k: int, w: int) -> set[tuple[int, int]]:
    """Plain winnowing: per window of w consecutive k-gram hashes select
    the minimum, rightmost occurrence on ties; return distinct
    (hash, pos)."""
    t = _norm(text)
    if len(t) < k:
        return set()
    hs = [_h(t[i : i + k]) for i in range(len(t) - k + 1)]
    out = set()
    for j in range(len(hs) - w + 1):
        win = hs[j : j + w]
        m = min(win)
        # rightmost index of the min within the window
        pos = j + max(i for i, v in enumerate(win) if v == m)
        out.add((m, pos))
    return out


DOCS = [
    (1, "The quick brown fox jumps over the lazy dog"),
    (2, "the quick  brown fox JUMPS over a sleepy dog"),  # shares substrings
    (3, "Lorem ipsum dolor sit amet, consectetur adipiscing elit"),
    (4, "aaaaaaaaaaaaaaaaaaaa"),  # degenerate: all grams identical (ties)
    (5, "abababababababababab"),  # period-2 ties
    (6, "short"),  # len < k -> nothing
    (7, ""),  # empty -> nothing
    (8, None),  # NULL -> nothing
    (9, "exactly8"),  # len == k: one gram, < window grams -> nothing
    (10, "x" * 7 + "unique tail with enough length to fingerprint"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in DOCS], "doc_id int, text string"
    )


def test_matches_python_reference(docs_df):
    k, w = 8, 4
    got = {
        (r.doc_id, r.fp_hash, r.fp_pos)
        for r in winnow_fingerprints(docs_df, k=k, window=w).collect()
    }
    want = {
        (i, h, p)
        for i, t in DOCS
        if t is not None
        for (h, p) in _reference(t, k, w)
    }
    assert got == want


def test_matches_reference_other_geometry(docs_df):
    k, w = 5, 3
    got = {
        (r.doc_id, r.fp_hash, r.fp_pos)
        for r in winnow_fingerprints(docs_df, k=k, window=w).collect()
    }
    want = {
        (i, h, p)
        for i, t in DOCS
        if t is not None
        for (h, p) in _reference(t, k, w)
    }
    assert got == want


def test_guarantee_shared_substring_shares_fingerprint(spark):
    # any shared substring of length >= w + k - 1 must yield a shared
    # fp_hash (the winnowing guarantee) — embed one common phrase into
    # otherwise-disjoint documents
    k, w = 8, 4
    common = "winnowing guarantee phrase"  # 26 chars >= 11
    df = spark.createDataFrame(
        [
            (1, f"left padding words then {common} and more after"),
            (2, f"completely different prefix {common} unrelated suffix"),
        ],
        "doc_id int, text string",
    )
    fps = winnow_fingerprints(df, k=k, window=w).collect()
    h1 = {r.fp_hash for r in fps if r.doc_id == 1}
    h2 = {r.fp_hash for r in fps if r.doc_id == 2}
    assert h1 & h2


def test_degenerate_inputs_emit_nothing(docs_df):
    out = winnow_fingerprints(docs_df, k=8, window=4)
    gone = out.where(F.col("doc_id").isin(6, 7, 8, 9)).count()
    assert gone == 0


def test_density_and_position_bounds(docs_df):
    # every selected position is a valid gram index; fingerprint count per
    # doc never exceeds gram count and is >= 1 for docs with >= w full
    # windows
    k, w = 8, 4
    rows = winnow_fingerprints(docs_df, k=k, window=w).collect()
    texts = {i: _norm(t) for i, t in DOCS if t}
    for r in rows:
        n_grams = len(texts[r.doc_id]) - k + 1
        assert 0 <= r.fp_pos < n_grams
        assert 0 <= r.fp_hash < WINNOW_HASH_SPACE
        assert r.fp_pos < WINNOW_POS_SPACE


def test_overlap_pairs_detect_planted_passage(spark):
    from database_migration_spark.operators.text import winnow_overlap_pairs

    passage = "the quick brown fox jumps over the lazy dog again and again"
    docs = [
        (1, f"unrelated prefix one {passage} suffix alpha"),
        (2, f"another document entirely {passage} with its own tail"),
        (3, "no shared content here at all, completely different words"),
        (4, "yet another unrelated document with distinct vocabulary"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {
        (r.doc_a, r.doc_b)
        for r in winnow_overlap_pairs(df, min_shared=5).collect()
    }
    assert got == {(1, 2)}


def test_overlap_pairs_cap_drops_boilerplate(spark):
    from database_migration_spark.operators.text import winnow_overlap_pairs

    boiler = "standard legal disclaimer text appended to every document"
    docs = [(i, f"unique content {i} aaa {boiler}") for i in range(1, 7)]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    # uncapped: every pair shares the boilerplate fingerprints
    loose = winnow_overlap_pairs(df, min_shared=3).count()
    assert loose == 15  # all C(6,2) pairs
    # cap below the boilerplate's document count: no pair survives
    tight = winnow_overlap_pairs(df, min_shared=3, max_bucket=5).count()
    assert tight == 0


def test_randomized_differential_across_geometries(spark):
    # seeded random corpus (repeated chars, tight alphabet -> dense hash
    # ties) against the pure-Python reference at three geometries — the
    # tie-break and full-window edge cases far beyond the curated DOCS
    import random

    rng = random.Random(20260816)
    alpha = "ab cd"  # tiny alphabet incl. space: heavy ties + collapsing runs
    docs = [
        (i, "".join(rng.choice(alpha) for _ in range(rng.randint(0, 40))))
        for i in range(120)
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    for k, w in [(3, 2), (4, 5), (8, 4)]:
        got = {
            (r.doc_id, r.fp_hash, r.fp_pos)
            for r in winnow_fingerprints(df, k=k, window=w).collect()
        }
        want = {
            (i, h, p)
            for i, t in docs
            for (h, p) in _reference(t, k, w)
        }
        assert got == want, f"geometry k={k} w={w}"
