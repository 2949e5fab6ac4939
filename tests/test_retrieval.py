"""Retrieval operator tests: the exact-integer BM25 ladder against a
plain-Python reference implementation of the SAME surrogate (differential
— the two must agree bit-for-bit, floors included), parity between the
inline scorer and the bucket-partitioned index path, partition pruning in
the index probe, and the tokenization edge cases (NULL text, miss-only
queries, tie ordering)."""

import contextlib
import io
from collections import Counter

from pyspark.sql import functions as F

from database_migration_spark.operators.retrieval import (
    bm25_topk,
    bm25_topk_from_index,
    build_postings,
    write_postings_index,
    K1_E3,
    B_E3,
)

DOCS = [
    (1, "spark shuffle join hash join"),
    (2, "window   agg over spark"),  # whitespace run collapses
    (3, "hash hash hash table probe"),
    (4, None),  # never indexed
    (5, "join order optimizer stats"),
    (6, "the the the the filter"),
]
QUERIES = [("qa", "hash join"), ("qb", "spark window"), ("qc", "zzz missing")]


def _ref_bm25(docs, queries, k):
    """Plain-Python replay of the integer ladder (// is Python floor div;
    all operands non-negative, so it matches Spark's long `div`)."""
    toks = {
        i: Counter(" ".join(t.lower().split()).split(" "))
        for i, t in docs
        if t is not None
    }
    dl = {i: sum(c.values()) for i, c in toks.items()}
    n, total = len(dl), sum(dl.values())
    dfreq = Counter(t for c in toks.values() for t in c)
    out = {}
    for qid, qtext in queries:
        scores = {}
        for term in set(" ".join(qtext.lower().split()).split(" ")):
            if term not in dfreq:
                continue
            idf_e3 = (1000 * (2 * n - 2 * dfreq[term] + 1)) // (2 * dfreq[term] + 1)
            for i, c in toks.items():
                tf = c.get(term)
                if not tf:
                    continue
                dl_ratio_e3 = (1000 * dl[i] * n) // total
                lennorm_e3 = (1000 - B_E3) + (B_E3 * dl_ratio_e3) // 1000
                denom_e3 = tf * 1000 + (K1_E3 * lennorm_e3) // 1000
                tfsat_e6 = (1000000 * tf * (K1_E3 + 1000)) // denom_e3
                scores[i] = scores.get(i, 0) + (idf_e3 * tfsat_e6) // 1000
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out.update(
            {(qid, i): (s, r + 1) for r, (i, s) in enumerate(ranked)}
        )
    return out


def test_bm25_matches_python_reference(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    q = spark.createDataFrame(QUERIES, "query_id string, query_text string")
    got = {
        (r.query_id, r.doc_id): (r.score_e6, r.rank)
        for r in bm25_topk(docs, q, k=3).collect()
    }
    assert got == _ref_bm25(DOCS, QUERIES, 3)
    # the miss-only query retrieves nothing; the NULL doc never appears
    assert not any(qid == "qc" for qid, _ in got)
    assert not any(i == 4 for _, i in got)
    spark.catalog.clearCache()


def test_bm25_ranking_shape(spark):
    """More matched query terms beat one; higher tf beats lower at equal
    length — the monotonicities the surrogate must preserve."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    q = spark.createDataFrame(QUERIES, "query_id string, query_text string")
    rows = {
        (r.query_id, r.rank): r.doc_id for r in bm25_topk(docs, q, k=6).collect()
    }
    # qa="hash join": doc 1 matches both terms (tf 1+2), beats the
    # single-term docs 3 and 5
    assert rows[("qa", 1)] == 1
    spark.catalog.clearCache()


def test_bm25_index_parity_and_pruning(spark, tmp_path):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    q = spark.createDataFrame(QUERIES, "query_id string, query_text string")
    path = str(tmp_path / "bm25_index")
    write_postings_index(docs, path, buckets=8)

    plain = {tuple(r) for r in bm25_topk(docs, q, k=3).collect()}
    idx_df = bm25_topk_from_index(spark, path, q, k=3, buckets=8)
    indexed = {tuple(r) for r in idx_df.collect()}
    assert indexed == plain and indexed

    # the postings scan prunes on the bucket partition column
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        idx_df.explain(True)
    segs = buf.getvalue().split("PartitionFilters")[1:]
    assert any("bucket" in s[:250] for s in segs), segs
    spark.catalog.clearCache()


def test_build_postings_contract(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    post = build_postings(docs, persist=False)
    rows = {(r.id, r.term): (r.tf, r.dl) for r in post.collect()}
    # doc 2's whitespace run collapses: 4 tokens, dl carried on each row
    assert rows[(2, "spark")] == (1, 4)
    assert rows[(1, "join")] == (2, 5)
    assert not any(i == 4 for i, _ in rows)


def test_bm25_many_term_path_parity(spark, monkeypatch):
    """The >_INLINE_TERMS_MAX streaming path (explode + broadcast
    semi-join) must agree bit-for-bit with the inline in-array path the
    small corpora exercise — forced by shrinking the cutover to 0."""
    import database_migration_spark.operators.retrieval as retrieval

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    q = spark.createDataFrame(QUERIES, "query_id string, query_text string")
    inline = {tuple(r) for r in bm25_topk(docs, q, k=6, persist=False).collect()}
    monkeypatch.setattr(retrieval, "_INLINE_TERMS_MAX", 0)
    streamed = {tuple(r) for r in bm25_topk(docs, q, k=6, persist=False).collect()}
    assert streamed == inline and inline == {
        (qid, i) + v for (qid, i), v in _ref_bm25(DOCS, QUERIES, 6).items()
    }
    spark.catalog.clearCache()


def test_doc_token_counts_matches_term_frequencies(spark):
    """doc_token_counts (size of the split array, zero explode) ==
    sum(tf) over THE shared tokenizer, including the empty-string doc
    (one empty token) and the NULL doc (no row)."""
    from database_migration_spark.operators.text import (
        doc_token_counts,
        term_frequencies,
    )

    docs = spark.createDataFrame(
        DOCS + [(7, ""), (8, "   ")], "doc_id long, text string"
    )
    fast = {(r.id, r.dl) for r in doc_token_counts(docs).collect()}
    slow = {
        (r.id, r.dl)
        for r in term_frequencies(docs, persist=False)
        .groupBy("id")
        .agg(F.sum("tf").cast("long").alias("dl"))
        .collect()
    }
    assert fast == slow and (4, 1) not in fast and (7, 1) in fast
    spark.catalog.clearCache()
