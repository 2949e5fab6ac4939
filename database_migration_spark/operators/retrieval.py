"""Full-text retrieval over the corpus: inverted-index construction and
BM25 top-k scoring — the query-side complement of the dedup family.

A training-data pipeline needs retrieval in three places the reference's
validation queries don't cover: query-based decontamination (find the
corpus documents a benchmark question retrieves, not just n-gram
containment), RAG corpus curation (which documents answer the queries we
care about), and search-quality probes over a freshly built corpus. The
shape is classic IR re-expressed Spark-first:

- :func:`build_postings` — one tokenize pass → ``(id, term, tf, dl)``:
  the exploded inverted-index relation, partitioned by term for scoring
  joins. Document length rides on every posting (standard index
  denormalization) so scoring never joins back to the corpus.
- :func:`bm25_topk` — score a small query relation against the corpus:
  query terms broadcast into the postings join, per-(query, doc) partial
  sums map-side, one window for the top-k cut. Cost is
  O(Σ_qterm df(term)) — the postings touched — never a corpus scan.
- :func:`write_postings_index` / :func:`bm25_topk_from_index` — the
  100 TB path: the postings relation laid out as term-bucket-partitioned
  parquet (same protocol as the dedup fingerprint index,
  dedup.py:write_fingerprint_index); a query probe prunes to the buckets
  of its own terms at file-listing time, reading O(matching buckets) of
  the index.

Scoring is BM25-shaped with EXACT integer arithmetic (the engine-parity
rule every cross-checked operator here follows — see
text.tfidf_top_terms): the float idf ``ln((N-df+.5)/(df+.5))`` is
replaced by the integer rational ``idf_e3 = 1000*(2N-2df+1) div
(2df+1)`` (the same ratio, un-logged, floor-scaled), and the tf
saturation / length normalization run in permille integers with ``div``
floors at fixed points. Rankings stay idf- and tf-monotone with the
standard k1/b saturation shape; the exact trade-off curve differs from
log-BM25, which is fine for a ranking surrogate and documented here.
BIGINT headroom: safe to ~2e9 documents and ~4e9 tf (idf_e3·tfsat_e6
and the intermediate products stay under 2^63); beyond that, move the
two flagged products to DECIMAL(38,0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_migration_spark.functions.text_exprs import (
    normalize_text,
    normalize_text_spark_sql,
)

K1_E3 = 1200  # k1 = 1.2 — the standard tf-saturation knee
B_E3 = 750  # b = 0.75 — the standard length-normalization strength

# bm25_topk single-scan cutover: below this many distinct query terms the
# per-document in-array occurrence counts (|terms| filter scans per row,
# zero explode/shuffle) beat the explode + broadcast-semi-join shape
_INLINE_TERMS_MAX = 64


def _index_relations(
    df: DataFrame,
    text_col: str,
    id_col: str,
    persist: bool,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(postings, doc_lens, tf): the index build's internal relations.

    Tokenization is :func:`text.term_frequencies` — the engine's single
    Spark-side tokenizer (shared with tf-idf), so the oracle contract
    (``normalize_text_sql``) has exactly one counterpart to match. NULL
    text tokenizes to no terms on both engines (explode of a NULL array
    and ``unnest(string_split(NULL))`` both emit zero rows), so NULL-text
    documents simply don't index.

    ``tf`` is returned so terminal callers (write_postings_index) can
    unpersist it after their action — it is persisted inside
    term_frequencies (two consumers: the length aggregate and the
    postings join). ``doc_lens`` (one row per doc) is what corpus stats
    aggregate — never re-derive them from the postings relation, which
    is a full vocab×docs shuffle for a 2-scalar answer. The postings
    relation itself is persisted too (two consumers downstream: term
    stats + the scoring join); ``persist=False`` opts out of both for
    per-epoch streaming callers.
    """
    from pyspark import StorageLevel

    from database_migration_spark.operators.text import term_frequencies

    tf = term_frequencies(df, text_col, id_col, persist)
    doc_lens = tf.groupBy("id").agg(F.sum("tf").cast("long").alias("dl"))
    post = tf.join(doc_lens, "id")
    if persist:
        post = post.persist(StorageLevel.MEMORY_AND_DISK)
    return post, doc_lens, tf


def build_postings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    persist: bool = True,
) -> DataFrame:
    """(id, term, tf, dl): the inverted-index relation — document length
    denormalized onto every posting so scoring never joins back to the
    corpus. See :func:`_index_relations` for the relation lifecycle."""
    post, _, _ = _index_relations(df, text_col, id_col, persist)
    return post


def corpus_stats(doc_lens: DataFrame) -> DataFrame:
    """1-row (n_docs, total_len) from the one-row-per-doc length relation
    — indexed documents only (NULL/empty docs never entered the index)."""
    return doc_lens.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_len"),
    )


def tokenize_queries(
    queries: DataFrame, text_col: str = "query_text", id_col: str = "query_id"
) -> DataFrame:
    """Distinct (query_id, term) — same normalization as the index side
    (a retrieval system that tokenizes queries differently from documents
    never matches anything)."""
    return (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("term"),
        )
        .distinct()
    )


def _score_hits(hits: DataFrame, k1_e3: int, b_e3: int) -> DataFrame:
    """The exact-integer BM25 ladder over a (query_id, id, tf, dl,
    idf_e3, n_docs, total_len) hit relation. Every division is a long
    ``div`` at a fixed point so both engines floor identically."""
    return (
        hits.withColumn(
            "dl_ratio_e3", F.expr("(1000L * dl * n_docs) div total_len")
        )
        .withColumn(
            "lennorm_e3",
            F.lit(1000 - b_e3) + F.expr(f"({b_e3}L * dl_ratio_e3) div 1000"),
        )
        .withColumn(
            "denom_e3",
            F.col("tf") * F.lit(1000) + F.expr(f"({k1_e3}L * lennorm_e3) div 1000"),
        )
        .withColumn(
            "tfsat_e6", F.expr(f"(1000000L * tf * {k1_e3 + 1000}L) div denom_e3")
        )
        .withColumn("contrib_e6", F.expr("(idf_e3 * tfsat_e6) div 1000"))
    )


def _topk(scored: DataFrame, k: int) -> DataFrame:
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("score_e6").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def bm25_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1_e3: int = K1_E3,
    b_e3: int = B_E3,
    persist: bool = True,
) -> DataFrame:
    """Top-``k`` documents per query by the exact-integer BM25 surrogate.

    Returns (query_id, doc_id, score_e6, rank), rank 1 = best, ties
    broken by doc_id. Query terms absent from the corpus contribute
    nothing (df = 0 has no idf); a query with no indexed term returns no
    rows.

    Scale shape: the query relation is tiny by construction (it's what a
    user asks, not data) — its term set broadcasts into the postings
    join, so the only data touched is the postings of the queried terms;
    the per-(query, doc) sum combines map-side; the final window
    partitions by query. No corpus scan, no shuffle wider than the hit
    set.
    """
    from pyspark import StorageLevel

    from database_migration_spark.operators.text import (
        doc_token_counts,
        token_stream,
    )

    # Ad-hoc query path (guide §3: pre-filter the big side when
    # selective). The query term set is BOUNDED by contract (it's what a
    # user asks, not data) — collecting it to the driver is the same
    # bounded-collect class as catalogs. With few terms the whole index
    # side collapses to ONE corpus scan: per document, dl and the per-term
    # occurrence counts are computed INSIDE the token array (the
    # lambda-variable barrier materializes the split array once per row),
    # so no token ever becomes a row — no explode, no full-vocabulary
    # (id, term) aggregate, no corpus-wide shuffle (r12 opt round:
    # bm25_topk_documents exec 3.28 → see OPTIMIZATION_r12). Each count
    # equals the explode-path groupBy count bit-for-bit:
    # size(filter(arr, x = t)) is the number of occurrences of t.
    # Above _INLINE_TERMS_MAX terms the per-row cost of |terms| array
    # scans loses to one explode + broadcast semi-join, so the streaming
    # shape below takes over. The standing-index path
    # (write_postings_index / bm25_topk_indexed) still builds full
    # relations via _index_relations.
    qt = tokenize_queries(queries)
    # map-only collect (python-side dedupe): qt's distinct would shuffle —
    # hundreds of scheduled tasks for a handful of rows
    terms = sorted(
        {
            r[0]
            for r in queries.select(
                F.explode(
                    F.split(normalize_text(F.col("query_text")), " ")
                ).alias("term")
            ).collect()
        }
    )
    if not terms:
        # no tokenizable query text: empty result with the right types
        return (
            qt.select("query_id")
            .crossJoin(df.select(F.col(id_col).alias("doc_id")))
            .select(
                "query_id",
                "doc_id",
                F.lit(0).cast("long").alias("score_e6"),
                F.lit(0).cast("long").alias("rank"),
            )
            .where(F.lit(False))
        )
    if len(terms) <= _INLINE_TERMS_MAX:
        # ONE selectExpr (the r12 SQL-text convention — per-Column
        # construction of |terms| nested lambdas costs ~0.5 s of py4j)
        def _sql_lit(s: str) -> str:
            return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

        norm = normalize_text_spark_sql(f"`{text_col}`")
        cnts = ", ".join(
            f"bigint(size(filter(a, x -> x = {_sql_lit(t)})))" for t in terms
        )
        per_doc = (
            df.where(F.col(text_col).isNotNull())
            .selectExpr(
                f"`{id_col}` as id",
                f"transform(array(split({norm}, ' ')), a -> "
                f"named_struct('dl', bigint(size(a)), "
                f"'cnts', array({cnts})))[0] as _s",
            )
            .select("id", F.col("_s.dl").alias("dl"), F.col("_s.cnts").alias("cnts"))
        )
        if persist:
            # narrow (id, dl, |terms| longs); consumers: stats + postings
            per_doc = per_doc.persist(StorageLevel.MEMORY_AND_DISK)
        doc_lens = per_doc.select("id", "dl")
        stats = corpus_stats(doc_lens)
        # dl rides along — scoring needs no join back for lengths
        post = (
            per_doc.select(
                "id", "dl", F.posexplode("cnts").alias("_p", "tf")
            )
            .where(F.col("tf") > 0)
            .select(
                "id",
                F.element_at(
                    F.array(*[F.lit(t) for t in terms]), F.col("_p") + 1
                ).alias("term"),
                "tf",
                "dl",
            )
        )
    else:
        # many-term path: one explode + broadcast semi-join; doc_lens from
        # the tokenizer's COUNT form (text.doc_token_counts — size of the
        # exact split array, == sum(tf) bit-for-bit)
        doc_lens = doc_token_counts(df, text_col, id_col)
        if persist:
            doc_lens = doc_lens.persist(StorageLevel.MEMORY_AND_DISK)
        stats = corpus_stats(doc_lens)
        tf_q = (
            token_stream(df, text_col, id_col)
            .join(
                F.broadcast(qt.select("term").distinct()), "term", "left_semi"
            )
            .groupBy("id", "term")
            .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        )
        if persist:
            tf_q = tf_q.persist(StorageLevel.MEMORY_AND_DISK)
        post = tf_q.join(doc_lens, "id")
    # df_docs per queried term — identical to the full-vocab aggregate's
    # values on those terms (post has one row per matching (id, term))
    dfreq = post.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df_docs")
    )
    qt_idf = (
        qt.join(dfreq, "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf_e3",
            F.expr("(1000L * (2 * n_docs - 2 * df_docs + 1)) div (2 * df_docs + 1)"),
        )
        .select("query_id", "term", "idf_e3")
    )
    hits = post.join(F.broadcast(qt_idf), "term").crossJoin(F.broadcast(stats))
    scored = (
        _score_hits(hits, k1_e3, b_e3)
        .groupBy("query_id", F.col("id").alias("doc_id"))
        .agg(F.sum("contrib_e6").cast("long").alias("score_e6"))
    )
    return _topk(scored, k).select("query_id", "doc_id", "score_e6", "rank")


def bm25_oracle_sql(
    queries: list[tuple[str, str]],
    k: int = 10,
    k1_e3: int = K1_E3,
    b_e3: int = B_E3,
) -> str:
    """The DuckDB mirror of :func:`bm25_topk` over the ``documents`` view
    — same tokenization, same integer ladder, same floors (``//`` is
    floor division; every operand is non-negative so it matches ``div``).
    ``queries`` is the literal (query_id, query_text) list."""
    from database_migration_spark.functions.text_exprs import normalize_text_sql

    values = ", ".join(
        "('" + qid.replace("'", "''") + "', '" + qtext.replace("'", "''") + "')"
        for qid, qtext in queries
    )
    norm = normalize_text_sql("text")
    return f"""
WITH q(query_id, query_text) AS (VALUES {values}),
toks AS (
  SELECT doc_id AS id, unnest(string_split({norm}, ' ')) AS term
  FROM documents WHERE text IS NOT NULL
),
tf AS (SELECT id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY id, term),
doc_lens AS (SELECT id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY id),
post AS (SELECT tf.id, tf.term, tf.tf, doc_lens.dl FROM tf JOIN doc_lens USING (id)),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_len
  FROM doc_lens
),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df_docs FROM post GROUP BY term),
qt AS (
  SELECT DISTINCT query_id,
         unnest(string_split({normalize_text_sql("query_text")}, ' ')) AS term
  FROM q
),
qt_idf AS (
  SELECT query_id, term,
         (1000 * (2 * n_docs - 2 * df_docs + 1)) // (2 * df_docs + 1) AS idf_e3
  FROM qt JOIN dfreq USING (term) CROSS JOIN stats
),
hits AS (
  SELECT query_id, id, tf, dl, idf_e3, n_docs, total_len,
         (1000 * dl * n_docs) // total_len AS dl_ratio_e3
  FROM post JOIN qt_idf USING (term) CROSS JOIN stats
),
contrib AS (
  SELECT query_id, id, idf_e3,
         (1000000 * tf * {k1_e3 + 1000}) //
           (tf * 1000 + ({k1_e3} * ((1000 - {b_e3}) + ({b_e3} * dl_ratio_e3) // 1000)) // 1000)
           AS tfsat_e6
  FROM hits
),
scored AS (
  SELECT query_id, id AS doc_id,
         CAST(sum((idf_e3 * tfsat_e6) // 1000) AS BIGINT) AS score_e6
  FROM contrib GROUP BY query_id, id
)
SELECT query_id, doc_id, score_e6,
       CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY score_e6 DESC, doc_id ASC) AS BIGINT) AS rank
FROM scored
QUALIFY rank <= {k}
"""


def write_postings_index(
    df: DataFrame,
    path: str,
    buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Materialize the corpus as a term-bucket-partitioned BM25 index —
    the layout that makes query-time retrieval over a 100 TB corpus read
    O(matching buckets) instead of re-tokenizing everything:

    - ``<path>/postings``: (term, id, tf, dl, df_docs) partitioned by
      ``pmod(md5_long(term), buckets)`` — per-term df denormalized onto
      every posting (bands-index protocol: trade compact storage for
      probes that never join back).
    - ``<path>/stats``: the 1-row (n_docs, total_len) corpus aggregate.

    ``buckets`` defines the partition function and must match between
    writer and prober (same contract as dedup.write_fingerprint_index);
    size it so one bucket is a few hundred MB at corpus scale.
    """
    from database_migration_spark.functions.hashing import md5_long

    post, doc_lens, tf = _index_relations(df, text_col, id_col, persist=True)
    stats = corpus_stats(doc_lens)
    dfreq = post.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df_docs"))
    rows = post.join(dfreq, "term").withColumn(
        "bucket", F.pmod(md5_long(F.col("term")), F.lit(buckets)).cast("int")
    )
    rows.write.partitionBy("bucket").mode("overwrite").parquet(f"{path}/postings")
    stats.write.mode("overwrite").parquet(f"{path}/stats")
    post.unpersist()
    tf.unpersist()


def bm25_topk_from_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 10,
    buckets: int = 64,
    k1_e3: int = K1_E3,
    b_e3: int = B_E3,
) -> DataFrame:
    """:func:`bm25_topk` against a :func:`write_postings_index` layout.

    The probe computes the query terms' bucket ids and filters the
    postings read on the ``bucket`` partition column — partition pruning
    drops every non-matching bucket directory at file listing, so a
    3-term query against a 64-bucket 100 TB index opens ≤3 buckets. The
    scoring ladder and output contract are identical to the inline
    operator (parity-tested).
    """
    from database_migration_spark.functions.hashing import md5_long

    qt = tokenize_queries(queries)
    # query term set is driver-small by the same argument as bm25_topk;
    # the literal bucket list is what partition pruning needs at plan time
    q_buckets = [
        r.b
        for r in qt.select(
            F.pmod(md5_long(F.col("term")), F.lit(buckets)).cast("int").alias("b")
        )
        .distinct()
        .collect()
    ]
    post = spark.read.parquet(f"{path}/postings").where(
        F.col("bucket").isin(q_buckets)
    )
    stats = spark.read.parquet(f"{path}/stats")
    qt_idf = (
        qt.join(post.select("term", "df_docs").distinct(), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf_e3",
            F.expr("(1000L * (2 * n_docs - 2 * df_docs + 1)) div (2 * df_docs + 1)"),
        )
        .select("query_id", "term", "idf_e3")
    )
    hits = post.join(F.broadcast(qt_idf), "term").crossJoin(F.broadcast(stats))
    scored = (
        _score_hits(hits, k1_e3, b_e3)
        .groupBy("query_id", F.col("id").alias("doc_id"))
        .agg(F.sum("contrib_e6").cast("long").alias("score_e6"))
    )
    return _topk(scored, k).select("query_id", "doc_id", "score_e6", "rank")
