"""hashed_classifier_score: the fastText-style linear apply (round 8)."""

import hashlib
import re
from collections import Counter


def _py_score(text, weights, bias=0):
    if text is None:
        return bias
    norm = re.sub(r"\s+", " ", text.lower()).strip()
    score = bias
    for term, tf in Counter(norm.split(" ")).items():
        slot = int(hashlib.md5(term.encode()).hexdigest()[:15], 16) % len(
            weights
        )
        score += tf * weights[slot]
    return score


def test_classifier_matches_python_reference(spark, sf_smoke):
    from database_migration_spark.operators.text import (
        classifier_weights,
        hashed_classifier_score,
    )

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").limit(40)
    w = classifier_weights(16, seed=3)
    got = {
        r.id: (r.score, r.keep)
        for r in hashed_classifier_score(docs, w, bias=2, threshold=5)
        .collect()
    }
    for r in docs.select("doc_id", "text").collect():
        want = _py_score(r.text, w, bias=2)
        assert got[r.doc_id] == (want, want >= 5), r.doc_id


def test_classifier_broadcast_path_matches_inline(spark, sf_smoke, monkeypatch):
    """Above _INLINE_DIM_MAX the classifier routes through the broadcast
    weight table (the pre-r12 shape) — both paths must score every doc
    identically (same Python reference)."""
    from database_migration_spark.operators import text as TX

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").limit(25)
    w = TX.classifier_weights(16, seed=3)
    inline = {
        r.id: (r.score, r.keep)
        for r in TX.hashed_classifier_score(docs, w, bias=2, threshold=5)
        .collect()
    }
    monkeypatch.setattr(TX, "_INLINE_DIM_MAX", 4)  # force the join path
    joined = {
        r.id: (r.score, r.keep)
        for r in TX.hashed_classifier_score(docs, w, bias=2, threshold=5)
        .collect()
    }
    assert inline == joined
    for r in docs.select("doc_id", "text").collect():
        want = _py_score(r.text, w, bias=2)
        assert joined[r.doc_id] == (want, want >= 5), r.doc_id


def test_classifier_null_and_empty_text_get_bias(spark):
    from database_migration_spark.operators.text import (
        hashed_classifier_score,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, "   "), (3, "real words here")],
        "doc_id LONG, text STRING",
    )
    w = [1] * 8
    got = {r.id: r.score for r in
           hashed_classifier_score(docs, w, bias=7).collect()}
    # NULL text: the tokenizer drops the doc; the left join restores it at
    # bias. Whitespace-only text normalizes to '' -> ONE empty token ->
    # bias + w[slot('')] (the tokenizer's documented behavior, same both
    # engines).
    assert got[1] == 7
    assert got[2] == 7 + w[
        int(__import__("hashlib").md5(b"").hexdigest()[:15], 16) % 8
    ]
    assert got[3] == 7 + 3  # three distinct terms, each tf=1, w=1
