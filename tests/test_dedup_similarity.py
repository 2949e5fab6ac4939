"""Dedup + similarity operator tests (sf0.001 for speed)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark, sf_smoke):
    from database_migration_spark.sources.parquet_source import read_parquet_portable

    return read_parquet_portable(spark, f"{sf_smoke}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark, sf_smoke):
    from database_migration_spark.sources.parquet_source import read_parquet_portable

    return read_parquet_portable(spark, f"{sf_smoke}/embeddings.parquet")


def test_exact_dedup_finds_planted_duplicates(spark, docs):
    from database_migration_spark.operators.dedup import exact_dedup

    # plant exact duplicates: copy 5 docs with new ids
    dup = docs.limit(5).withColumn("doc_id", F.col("doc_id") + 100000)
    d = exact_dedup(docs.unionByName(dup))
    assert d.filter("dup_cnt = 2").count() == 5
    # winner is the smaller id (the original)
    assert d.filter("dup_cnt = 2").agg(F.max("keep_id")).collect()[0][0] < 100000


def test_minhash_recall_against_ground_truth(spark, docs):
    from database_migration_spark.operators.dedup import (
        minhash_dedup_pairs,
        ngram_jaccard_pairs,
    )

    truth = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, threshold_permille=800).collect()
    }
    found = {
        (r.id_a, r.id_b)
        for r in minhash_dedup_pairs(docs, threshold_permille=800).collect()
    }
    # verification step guarantees precision; banding 32/8 at j>=0.8 should
    # catch essentially everything (P[miss] = (1-j^4)^8 < 0.03 at j=0.8)
    assert found.issubset(truth)
    if truth:
        assert len(found) / len(truth) >= 0.9


def test_simhash_finds_planted_word_level_dups(spark, docs):
    """64-bit fingerprints at hamming ≤ 3 (the Manku-et-al web standard)
    target LONG near-identical documents: with ~2500 distinct tokens a
    one-token edit flips only the bits whose majority vote was within ±2 of
    a tie (≈0-3 of 64). The test builds long docs (10 concatenated groups),
    plants a one-token mutation of each, and every planted pair must come
    back through the 16-bit-chunk bucketing path. On short docs (the raw
    ~300-char rows) a single token is a large vocabulary fraction and
    legitimately exceeds the radius — that regime belongs to MinHash."""
    from database_migration_spark.operators.dedup import simhash_near_pairs

    long_docs = (
        docs.withColumn("g", F.col("doc_id") % 10)
        .groupBy("g")
        .agg(F.concat_ws(" ", F.collect_list("text")).alias("text"))
        .select(F.col("g").alias("doc_id"), "text")
    )
    mutated = long_docs.select(
        (F.col("doc_id") + 100).alias("doc_id"),
        F.regexp_replace(F.col("text"), r"^\S+", "zqxwv").alias("text"),
    )
    found = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_pairs(long_docs.unionByName(mutated)).collect()
    }
    for d in range(10):
        assert (d, d + 100) in found, f"one-token mutation of {d} missed"


def test_cosine_topk_matches_brute_force_python(spark, emb):
    import math

    from database_migration_spark.operators.similarity import cosine_topk

    rows = emb.collect()
    vecs = {r.vec_id: r.embedding for r in rows}

    def cos(a, b):
        d = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) ** 2 for x in a))
        nb = math.sqrt(sum(float(x) ** 2 for x in b))
        return d / (na * nb)

    qid = sorted(vecs)[0]
    expected = sorted(
        ((cos(vecs[qid], v), i) for i, v in vecs.items() if i != qid),
        key=lambda t: (-t[0], t[1]),
    )[:5]
    got = (
        cosine_topk(emb, emb.where(F.col("vec_id") == qid), k=5)
        .orderBy("rank")
        .collect()
    )
    assert [g.neighbor_id for g in got] == [i for _, i in expected]


def test_lsh_topk_recall(spark, emb):
    from database_migration_spark.operators.similarity import (
        cosine_topk,
        lsh_bucketed_topk,
    )

    q = emb.where(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id) for r in cosine_topk(emb, q, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in lsh_bucketed_topk(emb, q, k=5, bits=4, tables=8).collect()
    }
    # multi-table LSH: p_table=(1-θ/π)^4, recall=1-(1-p)^8 ≈ 0.6-0.8 for the
    # ~0.4-cosine nearest neighbors of these unclustered vectors
    assert len(exact & approx) / len(exact) >= 0.5


def test_ivf_topk_recall(spark, emb):
    from database_migration_spark.operators.similarity import cosine_topk, ivf_topk

    q = emb.where(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id) for r in cosine_topk(emb, q, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, q, k=5, n_centroids=8, n_probe=3).collect()
    }
    # probing 3/8 cells on unclustered vectors: recall well above the 3/8
    # random baseline because near neighbors concentrate in nearby cells
    assert len(exact & approx) / len(exact) >= 0.5


def test_bucketed_near_dup_recall_vs_exact(spark, emb):
    """The LSH-bucketed near-dup path against the exact all-pairs oracle on
    planted NOISY near-dups (not byte-identical — the probabilistic case)."""
    from database_migration_spark.operators.similarity import (
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_bucketed,
    )

    # perturb every 5th vector slightly: v' = v + 0.02 * reversed(v) keeps
    # cosine(v, v') ≈ 0.999 (θ ≈ 0.03 rad) — solidly inside LSH reach
    noisy = (
        emb.where(F.col("vec_id") % 5 == 0)
        .select(
            (F.col("vec_id") + 100_000).alias("vec_id"),
            F.zip_with(
                "embedding",
                F.reverse(F.col("embedding")),
                lambda x, y: (x.cast("double") + 0.02 * y.cast("double")).cast("float"),
            ).alias("embedding"),
        )
    )
    corpus = emb.select("vec_id", "embedding").unionByName(noisy)
    exact = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(corpus, threshold_e6=995_000).collect()
    }
    got = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs_bucketed(
            corpus, threshold_e6=995_000
        ).collect()
    }
    assert got.issubset(exact)  # verify step guarantees precision
    assert exact, "planted near-dups must exist or the test proves nothing"
    # p_table = (1-θ/π)^16 ≈ 0.85 at θ≈0.01π; miss = (1-p)^8 ≈ 3e-7
    assert len(got) / len(exact) >= 0.95


def test_bucketed_near_dup_exact_duplicates_certain(spark, emb):
    """Identical vectors ⇒ identical signatures ⇒ recall exactly 1.0 — the
    deterministic guarantee the embedding_near_dup query row relies on."""
    from database_migration_spark.operators.similarity import (
        embedding_near_dup_pairs_bucketed,
    )

    dup = emb.limit(20).select(
        (F.col("vec_id") + 100_000).alias("vec_id"), "embedding"
    )
    corpus = emb.select("vec_id", "embedding").unionByName(dup)
    got = embedding_near_dup_pairs_bucketed(corpus, threshold_e6=999_000)
    planted = {(r.vec_id - 100_000, r.vec_id) for r in dup.collect()}
    found = {(r.id_a, r.id_b) for r in got.collect()}
    assert planted <= found


def test_ivf_deterministic(spark, emb):
    from database_migration_spark.operators.similarity import ivf_topk

    q = emb.where(F.col("vec_id") < 3)
    a = sorted(map(tuple, ivf_topk(emb, q, k=3).collect()))
    b = sorted(map(tuple, ivf_topk(emb, q, k=3).collect()))
    assert a == b


def test_semantic_dedup_drops_exact_dups_keeps_representative(spark, emb):
    from database_migration_spark.operators.similarity import (
        semantic_dedup_survivors,
    )

    base = emb.select("vec_id", "embedding")
    # exact re-uploads: identical vector under a new id — identical cell
    # (signature is a function of the vector), cosine exactly 1
    dup = base.where(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    n_dups = dup.count()
    corpus = base.unionByName(dup)
    surv = semantic_dedup_survivors(corpus, threshold_e6=950_000, bits=8)
    rows = surv.collect()
    ids = {r.vec_id for r in rows}
    # every exact duplicate dropped, every original kept (min-id keep rule;
    # base corpus has no natural pair above 0.95 — max cosine ≈ 0.51)
    assert len(rows) == corpus.count() - n_dups
    assert all(i < 1_000_000 for i in ids)
    assert ids == {r.vec_id for r in base.collect()}


def test_semantic_dedup_survivor_pairs_below_threshold_within_cell(spark, emb):
    """No two survivors sharing a cell are >= the threshold (the operator's
    defining postcondition)."""
    from database_migration_spark.operators.similarity import (
        cosine,
        semantic_dedup_survivors,
    )

    base = emb.select("vec_id", "embedding")
    dup = base.where(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    corpus = base.unionByName(dup)
    surv = semantic_dedup_survivors(corpus, threshold_e6=950_000, bits=8)
    joined = surv.join(corpus, "vec_id")
    a = joined.select("cell", F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
    b = joined.select("cell", F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"))
    offenders = (
        a.join(b, "cell")
        .where(F.col("ia") < F.col("ib"))
        .where(F.floor(cosine(F.col("va"), F.col("vb")) * 1_000_000) >= 950_000)
        .count()
    )
    assert offenders == 0


def test_hyperplane_planes_match_signature(spark):
    """hyperplane_planes IS the plane family hyperplane_signature uses —
    recomputing a signature from the exposed planes matches (the property
    the SQL-oracle generator relies on)."""
    from database_migration_spark.operators.similarity import (
        hyperplane_planes,
        hyperplane_signature,
    )

    vec = [0.5, -1.25, 2.0, 0.125]
    planes = hyperplane_planes(dim=4, bits=6, seed=42)
    expected = 0
    for i, p in enumerate(planes):
        acc = 0.0
        for x, r in zip(vec, p):
            acc += x * r
        if acc > 0:
            expected |= 1 << i
    df = spark.createDataFrame([(vec,)], "v: array<double>")
    got = df.select(
        hyperplane_signature(F.col("v"), dim=4, bits=6, seed=42).alias("s")
    ).first()["s"]
    assert got == expected
    # the SQL-text fast path (one py4j call) is value-identical to the
    # Column form — and to float32 inputs, the graded queries' type
    got_sql = df.select(
        hyperplane_signature("`v`", dim=4, bits=6, seed=42).alias("s")
    ).first()["s"]
    assert got_sql == expected
    f32 = spark.createDataFrame([(vec,)], "v: array<float>")
    pair = f32.select(
        hyperplane_signature(F.col("v"), dim=4, bits=6, seed=42).alias("a"),
        hyperplane_signature("`v`", dim=4, bits=6, seed=42).alias("b"),
    ).first()
    assert pair["a"] == pair["b"]


def test_group_centroids_exact_floor_mean(spark):
    from database_migration_spark.operators.similarity import group_centroids

    df = spark.createDataFrame(
        [
            (1, [1.0, -0.5], 7),
            (2, [2.0, -0.25], 7),
            (3, [10.0, 3.0], 8),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    rows = {
        (r.label, r.dim): r for r in group_centroids(df).collect()
    }
    # label 7 dim 0: (1e6 + 2e6) // 2 = 1_500_000
    assert rows[(7, 0)].centroid_e6 == 1_500_000
    assert rows[(7, 0)].n_vecs == 2
    # label 7 dim 1: floor(-0.5e6) + floor(-0.25e6) = -750000; floor(-750000/2)
    # = -375000 (exact); the pmod/div floor must not truncate toward zero
    assert rows[(7, 1)].centroid_e6 == -375_000
    # odd negative sum: [-1.0, -2.0] avg -1.5e6 -> floor stays -1.5e6 exact;
    # craft a true floor case: single label with sum -3, n 2 -> -2 (floor),
    # not -1 (truncate)
    df2 = spark.createDataFrame(
        [(1, [-1.0e-6], 0), (2, [-2.0e-6], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    r2 = group_centroids(df2).collect()[0]
    assert r2.centroid_e6 == -2
    assert rows[(8, 0)].centroid_e6 == 10_000_000


def test_kmeans_refine_reduces_inertia_and_is_deterministic(spark, sf_smoke):
    import numpy as np

    from database_migration_spark.operators.similarity import (
        kmeans_refine,
        train_ivf_centroids,
    )

    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    vecs = np.array(
        [r[0] for r in emb.select("embedding").collect()], dtype=np.float64
    )
    # train on a deliberately tiny sample so the corpus-wide refinement has
    # something to fix
    cents0 = train_ivf_centroids(emb, n_centroids=8, sample_rows=32, seed=1)

    def inertia(c):
        d = ((vecs[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return d.min(axis=1).sum()

    cents1 = kmeans_refine(emb, cents0, iters=2)
    assert inertia(cents1) <= inertia(cents0) + 1e-9
    # order-independent integer M-step => bit-identical across runs
    cents1b = kmeans_refine(emb, cents0, iters=2)
    assert np.array_equal(cents1, cents1b)
    # and plumbed through ivf_topk
    from database_migration_spark.operators.similarity import ivf_topk

    out = ivf_topk(emb, emb.where("vec_id < 5"), k=3, n_centroids=8,
                   refine_iters=1)
    assert out.count() > 0


def test_ivf_index_partition_pruning_and_parity(spark, sf_smoke, tmp_path):
    from database_migration_spark.operators.similarity import (
        ivf_topk,
        ivf_topk_from_index,
        train_ivf_centroids,
        write_ivf_index,
    )

    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    cents = train_ivf_centroids(emb, n_centroids=8, seed=3)
    path = str(tmp_path / "ivf_index")
    write_ivf_index(emb, path, cents)
    queries = emb.where("vec_id < 5")
    out = ivf_topk_from_index(spark, path, queries, cents, k=3, n_probe=2)

    # the scan must prune partitions: PartitionFilters carries the cell
    # predicate (pruning at file listing, not a post-read filter)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(True)
    plan = buf.getvalue()
    segs = plan.split("PartitionFilters")[1:]
    # several scans appear (query side has no partitions); the INDEX scan's
    # PartitionFilters must carry the cell predicate
    assert any("cell" in s[:200] for s in segs), segs

    # same centroids, same ranking rules => identical result set to the
    # in-memory ivf_topk at the same n_probe
    mem = ivf_topk(emb, queries, k=3, n_centroids=8, n_probe=2, seed=3)
    got = {tuple(r) for r in out.collect()}
    want = {tuple(r) for r in mem.collect()}
    assert got == want and got


def test_centroid_outliers_matches_numpy(spark, emb):
    """Differential: the quantized-integer distance and per-label top-k must
    match a numpy brute force computing the identical floor-quantized
    arithmetic."""
    import math

    from database_migration_spark.operators.similarity import centroid_outliers

    got = {
        (r.label, r.vec_id): (r.rank, r.sq_dist_e12)
        for r in centroid_outliers(emb, k=3).collect()
    }

    rows = emb.select("vec_id", "label", "embedding").collect()
    by_label: dict = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(
            (r.vec_id, [math.floor(float(x) * 1_000_000) for x in r.embedding])
        )
    want = {}
    for label, vecs in by_label.items():
        dims = len(vecs[0][1])
        n = len(vecs)
        cent = []
        for d in range(dims):
            s = sum(q[d] for _, q in vecs)
            cent.append((s - ((s % n) + n) % n) // n)
        dists = sorted(
            (
                (-sum((q[d] - cent[d]) ** 2 for d in range(dims)), vid)
                for vid, q in vecs
            )
        )
        for rank, (neg, vid) in enumerate(dists[:3], start=1):
            want[(label, vid)] = (rank, -neg)
    assert got == want


def test_cube_grouping_sets_consistent(spark, sf_smoke):
    """The four CUBE grouping sets must be mutually consistent: the grand
    total equals the sum of the finest level, and each marginal equals the
    sum of its children."""
    from database_migration_spark.queries import QUERIES

    rows = QUERIES["corpus_mix_cube"](spark, sf_smoke).collect()
    by_gid: dict = {}
    for r in rows:
        by_gid.setdefault(r.gid, []).append(r)
    assert set(by_gid) == {0, 1, 2, 3}
    fine = by_gid[0]
    total = by_gid[3]
    assert len(total) == 1 and total[0].lang == "(all)" and total[0].source == "(all)"
    assert total[0].n_docs == sum(r.n_docs for r in fine)
    assert total[0].sum_chars == sum(r.sum_chars for r in fine)
    # gid=1: source marginalized away (per-lang); gid=2: lang marginalized
    for gid, key in ((1, "lang"), (2, "source")):
        for m in by_gid[gid]:
            kids = [r for r in fine if getattr(r, key) == getattr(m, key)]
            assert m.n_docs == sum(r.n_docs for r in kids)
            assert m.sum_chars == sum(r.sum_chars for r in kids)


def test_centroid_outliers_string_groups(spark):
    """The operator must work for non-numeric group columns (a long cast
    would NULL every string label and collapse the groups)."""
    from database_migration_spark.operators.similarity import centroid_outliers

    df = spark.createDataFrame(
        [("en", 1, [0.0, 0.0]), ("en", 2, [0.1, 0.1]), ("en", 3, [0.9, 0.9]),
         ("de", 4, [0.5, 0.5]), ("de", 5, [0.5, 0.6])],
        "lang STRING, vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    got = centroid_outliers(df, "embedding", "lang", "vec_id", k=1).collect()
    by_lang = {r.lang: r.vec_id for r in got}
    # en centroid ~ (1/3, 1/3): vec 3 is farthest; de: symmetric, tie on
    # distance broken by vec_id
    assert by_lang == {"en": 3, "de": 4}


def test_cosine_topk_partial_prune_is_lossless_and_in_plan(spark, emb):
    """The map-side bounded prune (partial=True, the default) must change
    the plan, not the answer: results identical to the all-rows-windowed
    reference shape, and the physical plan shows the prune (MapInPandas)
    BELOW the ranking window — i.e. the window's shuffle receives only
    per-partition survivors, never the full corpus×queries sim relation."""
    from database_migration_spark.operators.similarity import cosine_topk

    q = emb.where(F.col("vec_id") < 12)
    got = cosine_topk(emb, q, k=5, partial=True)
    ref = cosine_topk(emb, q, k=5, partial=False)
    a = sorted(((r.query_id, r.rank, r.neighbor_id, r.cos_sim_e6)
                for r in got.collect()))
    b = sorted(((r.query_id, r.rank, r.neighbor_id, r.cos_sim_e6)
                for r in ref.collect()))
    assert a == b and a
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    # tree prints parents first: the window must appear before (above)
    # the prune, with its exchange fed by the pruned relation
    assert plan.index("Window") < plan.index("MapInPandas")
    ref_plan = ref._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in ref_plan


def test_semantic_decontaminate_matches_exact_cross_scan(spark, emb):
    """Differential: the broadcast-LSH contamination filter must remove
    exactly the corpus items an exact corpus×benchmark cosine scan flags
    (identical vectors collide with certainty, so planted contamination
    is found deterministically)."""
    from database_migration_spark.operators.similarity import (
        cosine,
        semantic_contamination_pairs,
        semantic_decontaminate,
    )

    corpus = emb.select("vec_id", "label", "embedding")
    bench = corpus.where(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 5_000_000).alias("vec_id"), "embedding"
    )
    got = {r.vec_id for r in semantic_decontaminate(corpus, bench).collect()}

    c = corpus.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    b = bench.select(F.col("vec_id").alias("bid"), F.col("embedding").alias("bv"))
    contaminated = {
        r.cid
        for r in c.crossJoin(b)
        .where(
            F.floor(cosine(F.col("cv"), F.col("bv")) * 1_000_000).cast("long")
            >= 990_000
        )
        .collect()
    }
    all_ids = {r.vec_id for r in corpus.collect()}
    assert got == all_ids - contaminated
    assert contaminated  # the planted %20 slice must actually be flagged
    # pairs form agrees with the filter form
    pair_ids = {
        r.corpus_id
        for r in semantic_contamination_pairs(corpus, bench).collect()
    }
    assert pair_ids == contaminated


def test_semantic_decontaminate_broadcasts_benchmark(spark, emb):
    """The 100 TB shape: benchmark signatures AND vectors broadcast — the
    corpus side must never shuffle on the (t, b) bucket key."""
    from database_migration_spark.operators.similarity import (
        semantic_decontaminate,
    )

    corpus = emb.select("vec_id", "label", "embedding")
    bench = corpus.limit(10).select("vec_id", "embedding")
    df = semantic_decontaminate(corpus, bench)
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "simple"
    )
    assert plan.count("BroadcastHashJoin") >= 2
    assert "hashpartitioning(t" not in plan and ", t#" not in plan.split(
        "Exchange hashpartitioning", 1
    )[-1][:80]


# ---------------------------------------------------------------------------
# round 7: self-scaling LSH cell width + ANN sizing helper


def test_derive_lsh_bits_rule():
    """bits = ceil(log2(tables*n/cpi)) clamped to [4, 30] — the measured
    '+3.3 bits per x10' rule (SCALE.md) in code."""
    from database_migration_spark.operators.similarity import derive_lsh_bits

    # the x100 regimes land inside the measured-linear band
    assert derive_lsh_bits(228_000, tables=1) == 16
    assert derive_lsh_bits(210_000, tables=8) == 19
    # +~3.3 bits per decade
    assert derive_lsh_bits(5_700, tables=1) - derive_lsh_bits(570, tables=1) in (3, 4)
    # clamps
    assert derive_lsh_bits(1, tables=1) == 4
    assert derive_lsh_bits(0) == 4
    assert derive_lsh_bits(10**12, tables=64) == 30
    # budget knob: doubling the per-item budget removes exactly one bit
    assert (
        derive_lsh_bits(10_000, tables=8, candidates_per_item=8)
        == derive_lsh_bits(10_000, tables=8, candidates_per_item=4) - 1
    )


def test_derived_bits_match_graded_oracle():
    """The graded queries run the operators at DEFAULT (derived) bits; the
    semantic-dedup oracle pins its hyperplanes as static SQL literals built
    for 8 bits. This pin guarantees the derivation reproduces the oracle's
    geometry at the graded corpus sizes — if testdata row counts ever
    change, this fails BEFORE the driver's hash mismatch would."""
    from database_migration_spark.operators.similarity import derive_lsh_bits

    # semantic_dedup_embeddings corpus at sf0.01: 500 base + 50 perturbed
    # (%10) + 20 exact dups (%25) = 570 vectors, one table
    assert derive_lsh_bits(570, tables=1) == 8
    # embedding_near_dup corpus at sf0.01: 500 + 25 planted (%20) = 525,
    # 8 tables (exact all-pairs oracle - any width is correct; pinned so
    # geometry changes are deliberate)
    assert derive_lsh_bits(525, tables=8) == 11


def test_near_dup_default_bits_derivation_is_lossless(spark, emb):
    """Default (bits=None) finds the same >=0.99 pairs as the old fixed
    bits=16 on the planted-dup corpus (exact cosine verify; identical
    vectors collide at any width)."""
    from database_migration_spark.operators.similarity import (
        embedding_near_dup_pairs_bucketed,
    )

    base = emb.select("vec_id", "embedding")
    planted = base.where(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    corpus = base.unionByName(planted)
    derived = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs_bucketed(corpus).collect()
    }
    fixed = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs_bucketed(corpus, bits=16).collect()
    }
    assert derived == fixed
    assert derived  # non-vacuous: the planted pairs exist


def test_semantic_dedup_default_bits_matches_explicit(spark, emb):
    """bits=None derives the width from the corpus count; passing that same
    width explicitly must reproduce the identical survivor set + cells."""
    from database_migration_spark.operators.similarity import (
        derive_lsh_bits,
        semantic_dedup_survivors,
    )

    corpus = emb.select("vec_id", "embedding")
    n = corpus.count()
    got = {
        (r.vec_id, r.cell)
        for r in semantic_dedup_survivors(corpus, threshold_e6=950_000).collect()
    }
    want = {
        (r.vec_id, r.cell)
        for r in semantic_dedup_survivors(
            corpus, threshold_e6=950_000, bits=derive_lsh_bits(n, tables=1)
        ).collect()
    }
    assert got == want


def test_suggest_ann_params_reproduces_measured_recall_configs():
    """Cross-check against SCALE.md's measured ANN table: at the probe
    corpus's neighbor geometry (rank-5 cos ~= 0.55 -> theta ~= 57 deg) the
    recall>=0.9 configuration measured is bits=4 multi-table (t16 recall
    0.94/0.95/0.975 across 2k/20k/200k); the helper must land there with
    tables <= 16 and predicted recall >= 0.9 at every decade."""
    from database_migration_spark.operators.similarity import suggest_ann_params

    for n in (2_000, 20_000, 200_000):
        p = suggest_ann_params(n, dim=64, target_recall=0.9, neighbor_cos=0.55)
        assert p["bits"] == 4
        assert 1 <= p["tables"] <= 16
        assert p["expected_recall"] >= 0.9
        # isotropic geometry: candidate volume approaches the corpus — the
        # helper must say the exact scan is likely cheaper
        assert p["advisory"] is not None
    # real-retrieval regime (theta <= 30 deg): sub-linear LSH is feasible;
    # buckets prune to <= 1/32 of the corpus with a sane table count
    p = suggest_ann_params(1_000_000, dim=64, target_recall=0.9, neighbor_cos=0.87)
    assert p["method"] == "lsh"
    assert p["tables"] <= 16
    assert p["expected_recall"] >= 0.9
    assert p["candidates_per_query"] <= 1_000_000 / 32
    assert p["advisory"] is None
    # unreachable target within the table budget -> explicit brute fallback
    p = suggest_ann_params(10_000, dim=64, target_recall=0.999, neighbor_cos=-0.5)
    assert p["method"] == "brute" and p["expected_recall"] == 1.0


# ---------------------------------------------------------------------------
# round 7: product quantization (PQ/ADC)


def test_pq_adc_equals_decoded_l2(spark, emb):
    """The rigorous PQ correctness property: the ADC distance pq_topk
    ranks by must equal the exact L2 between the query and the DECODED
    (reconstructed) corpus vector — that is the algorithm's definition,
    and it is deterministic, so it pins the LUT + code machinery
    end-to-end without depending on recall."""
    import numpy as np

    from database_migration_spark.operators.similarity import (
        pq_decode,
        pq_encode,
        pq_topk,
        train_pq_codebooks,
    )

    corpus = emb.select("vec_id", "embedding").limit(64)
    books = train_pq_codebooks(corpus, m=8, k=16, sample_rows=64, iters=5)
    codes = {r.vec_id: list(r.codes) for r in pq_encode(corpus, books).collect()}
    qdf = corpus.where(F.col("vec_id") == sorted(codes)[0])
    qvec = np.array(qdf.collect()[0].embedding, dtype=np.float64)

    got = pq_topk(codes_df(spark, codes), qdf, books, k=10)
    for r in got.collect():
        rec = pq_decode(codes[r.neighbor_id], books)
        want = float(((qvec - rec) ** 2).sum())
        assert r.adc_dist_e6 == int(np.floor(want * 1_000_000)), r


def codes_df(spark, codes):
    return spark.createDataFrame(
        [(k, v) for k, v in codes.items()], "vec_id LONG, codes ARRAY<INT>"
    )


def test_pq_duplicate_vector_ranks_first(spark, emb):
    """A corpus vector IDENTICAL to the query shares its codes, so its
    ADC distance is the query's own quantization error — strictly the
    minimum possible; the planted duplicate must rank 1."""
    from database_migration_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        train_pq_codebooks,
    )

    base = emb.select("vec_id", "embedding")
    dup = base.where(F.col("vec_id") == 7).select(
        F.lit(9_000_007).alias("vec_id"), "embedding"
    )
    corpus = base.unionByName(dup)
    books = train_pq_codebooks(corpus, m=8, k=32, sample_rows=512, iters=5)
    codes = pq_encode(corpus, books)
    q = base.where(F.col("vec_id") == 7)
    top = pq_topk(codes, q, books, k=3).orderBy("rank").collect()
    assert top[0].neighbor_id == 9_000_007 and top[0].rank == 1


def test_pq_encode_rejects_indivisible_dim(spark, emb):
    import pytest as _pytest

    from database_migration_spark.operators.similarity import train_pq_codebooks

    with _pytest.raises(ValueError, match="not divisible"):
        train_pq_codebooks(emb, m=7)


def test_pq_batch_local_topk_is_lossless(spark, emb):
    """pq_topk emits only per-batch top-k before the global merge; the
    result must equal the same ranking computed over ALL pairs (the
    partial-prune losslessness argument, PQ edition) — exercised across
    a many-partition layout so batches are genuinely partial."""
    import numpy as np

    from database_migration_spark.operators.similarity import (
        pq_decode,
        pq_encode,
        pq_topk,
        train_pq_codebooks,
    )

    corpus = emb.select("vec_id", "embedding")
    books = train_pq_codebooks(corpus, m=8, k=16, sample_rows=256, iters=4)
    codes = pq_encode(corpus, books)
    q = corpus.where(F.col("vec_id").isin(1, 2, 3))
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.adc_dist_e6)
        for r in pq_topk(codes.repartition(13), q, books, k=4).collect()
    }
    # reference ranking from decoded exact distances, same tie-break
    all_codes = {r.vec_id: list(r.codes) for r in codes.collect()}
    qvecs = {r.vec_id: np.array(r.embedding, float) for r in q.collect()}
    for qid, qv in qvecs.items():
        dists = sorted(
            (
                int(np.floor(float(((qv - pq_decode(c, books)) ** 2).sum()) * 1e6)),
                nid,
            )
            for nid, c in all_codes.items()
            if nid != qid
        )
        for rank, (d, nid) in enumerate(dists[:4], start=1):
            assert got[(qid, rank)] == (nid, d), (qid, rank)


def test_pq_self_in_batch_does_not_evict_kth_neighbor(spark, emb):
    """Round-7 self-review regression: the batch containing the query
    vector ranks the query itself near the top (self-ADC = quantization
    error); the batch-local prune must keep k+1 so filtering self out
    cannot drop the true k-th non-self neighbor. Single partition makes
    the batch-local prune THE ranking — any eviction shows directly."""
    import numpy as np

    from database_migration_spark.operators.similarity import (
        pq_decode,
        pq_encode,
        pq_topk,
        train_pq_codebooks,
    )

    corpus = emb.select("vec_id", "embedding")
    books = train_pq_codebooks(corpus, m=8, k=16, sample_rows=256, iters=4)
    codes = pq_encode(corpus, books)
    qid = 5
    q = corpus.where(F.col("vec_id") == qid)
    got = [
        (r.rank, r.neighbor_id, r.adc_dist_e6)
        for r in pq_topk(codes.coalesce(1), q, books, k=5)
        .orderBy("rank").collect()
    ]
    all_codes = {r.vec_id: list(r.codes) for r in codes.collect()}
    qv = np.array(q.collect()[0].embedding, dtype=np.float64)
    want = sorted(
        (
            int(np.floor(float(((qv - pq_decode(c, books)) ** 2).sum()) * 1e6)),
            nid,
        )
        for nid, c in all_codes.items()
        if nid != qid
    )[:5]
    assert got == [(i + 1, nid, d) for i, (d, nid) in enumerate(want)]

# ---------------------------------------------------------------------------
# round 8: IVF-PQ (residual quantization over coarse cells, IVFADC)


def test_ivf_pq_adc_equals_decoded_l2(spark, emb):
    """The IVFADC correctness property: the ADC distance ivf_pq_topk ranks
    by must equal the exact L2 between the query and the DECODED vector
    (cell centroid + reconstructed residual). The operator computes it via
    the ``‖q‖²+‖c+b‖²−2q·c−2q·b`` expansion, so allow the last-ulp of
    float re-association at the e6 floor (±1)."""
    import numpy as np

    from database_migration_spark.operators.similarity import (
        ivf_pq_decode,
        ivf_pq_encode,
        ivf_pq_topk,
        train_ivf_pq,
    )

    corpus = emb.select("vec_id", "embedding")
    coarse, books = train_ivf_pq(corpus, n_centroids=8, m=8, k=16,
                                 pq_sample_rows=256, iters=5)
    codes = ivf_pq_encode(corpus, coarse, books)
    enc = {r.vec_id: (r.cell, list(r.codes)) for r in codes.collect()}
    qid = sorted(enc)[0]
    qdf = corpus.where(F.col("vec_id") == qid)
    qvec = np.array(qdf.collect()[0].embedding, dtype=np.float64)

    got = ivf_pq_topk(codes, qdf, coarse, books, k=10, n_probe=8)
    assert got.count() == 10
    for r in got.collect():
        cell, c = enc[r.neighbor_id]
        rec = ivf_pq_decode(cell, c, coarse, books)
        want = int(np.floor(float(((qvec - rec) ** 2).sum()) * 1_000_000))
        assert abs(r.adc_dist_e6 - want) <= 1, r


def test_ivf_pq_duplicate_vector_ranks_first(spark, emb):
    """A corpus vector identical to the query lands in the same cell with
    the same residual codes — minimum possible ADC distance; the planted
    duplicate must rank 1 (and survive the batch-local prune)."""
    from database_migration_spark.operators.similarity import (
        ivf_pq_encode,
        ivf_pq_topk,
        train_ivf_pq,
    )

    base = emb.select("vec_id", "embedding")
    dup = base.where(F.col("vec_id") == 7).select(
        F.lit(9_000_007).alias("vec_id"), "embedding"
    )
    corpus = base.unionByName(dup)
    coarse, books = train_ivf_pq(corpus, n_centroids=8, m=8, k=32, iters=5)
    codes = ivf_pq_encode(corpus, coarse, books)
    q = base.where(F.col("vec_id") == 7)
    top = ivf_pq_topk(codes, q, coarse, books, k=3, n_probe=2).orderBy(
        "rank"
    ).collect()
    assert top[0].neighbor_id == 9_000_007 and top[0].rank == 1


def test_ivf_pq_partitioning_invariance(spark, emb):
    """The batch-local prune breaks ties by (dist, id) — the ADVICE item:
    argpartition-on-distance-only made output depend on partitioning when
    many vectors share a code. One partition vs thirteen must agree row
    for row."""
    from database_migration_spark.operators.similarity import (
        ivf_pq_encode,
        ivf_pq_topk,
        train_ivf_pq,
    )

    corpus = emb.select("vec_id", "embedding")
    # tiny codebooks (k=4) force MANY identical codes -> real ADC ties
    coarse, books = train_ivf_pq(corpus, n_centroids=4, m=8, k=4, iters=4)
    codes = ivf_pq_encode(corpus, coarse, books)
    q = corpus.where(F.col("vec_id").isin(1, 2, 3))

    def rows(c):
        return sorted(
            map(
                tuple,
                ivf_pq_topk(c, q, coarse, books, k=5, n_probe=4).collect(),
            )
        )

    assert rows(codes.coalesce(1)) == rows(codes.repartition(13))


def test_ivf_pq_full_probe_full_rerank_equals_exact(spark, emb):
    """With every cell probed and the rerank shortlist covering the whole
    corpus, the exact-refine leg degrades to brute-force L2 top-k — the
    rerank machinery's correctness pin (quantization can no longer hide
    anything: the final ranking is computed from ORIGINAL vectors)."""
    import numpy as np

    from database_migration_spark.operators.similarity import (
        ivf_pq_encode,
        ivf_pq_topk,
        train_ivf_pq,
    )

    corpus = emb.select("vec_id", "embedding").limit(80)
    n = corpus.count()
    coarse, books = train_ivf_pq(corpus, n_centroids=4, m=8, k=8, iters=4)
    codes = ivf_pq_encode(corpus, coarse, books)
    q = corpus.where(F.col("vec_id").isin(2, 9))
    got = ivf_pq_topk(
        codes, q, coarse, books, k=4, n_probe=4, rerank=n, corpus=corpus
    ).collect()
    vecs = {r.vec_id: np.array(r.embedding, np.float64) for r in corpus.collect()}
    for qid in (2, 9):
        want = sorted(
            (float(((vecs[qid] - v) ** 2).sum()), nid)
            for nid, v in vecs.items()
            if nid != qid
        )[:4]
        mine = sorted(
            (r.rank, r.neighbor_id, r.dist_e6) for r in got if r.query_id == qid
        )
        assert [m[1] for m in mine] == [w[1] for w in want], qid
        for (rank, nid, de6), (d, _) in zip(mine, want):
            assert abs(de6 - int(np.floor(d * 1e6))) <= 1, (qid, rank)


def test_ivf_pq_rerank_requires_corpus(spark, emb):
    import pytest as _pytest

    from database_migration_spark.operators.similarity import (
        ivf_pq_encode,
        ivf_pq_topk,
        train_ivf_pq,
    )

    corpus = emb.select("vec_id", "embedding")
    coarse, books = train_ivf_pq(corpus, n_centroids=4, m=8, k=8, iters=3)
    codes = ivf_pq_encode(corpus, coarse, books)
    with _pytest.raises(ValueError, match="rerank requires"):
        ivf_pq_topk(codes, corpus.limit(1), coarse, books, rerank=10)


def test_pq_training_sample_is_partition_layout_independent(spark, emb):
    """The ADVICE item on train_pq_codebooks: a bare limit() lets Spark
    pick whichever partitions answer first, so codebooks were
    run-dependent. The id-ordered sample must produce bit-identical
    codebooks (and coarse centroids) across partition layouts."""
    import numpy as np

    from database_migration_spark.operators.similarity import (
        train_ivf_pq,
        train_pq_codebooks,
    )

    corpus = emb.select("vec_id", "embedding")
    a = train_pq_codebooks(corpus, m=8, k=16, sample_rows=128, iters=4)
    b = train_pq_codebooks(
        corpus.repartition(17), m=8, k=16, sample_rows=128, iters=4
    )
    assert np.array_equal(a, b)
    ca, ba = train_ivf_pq(corpus, n_centroids=4, m=8, k=8, iters=3)
    cb, bb = train_ivf_pq(
        corpus.repartition(29), n_centroids=4, m=8, k=8, iters=3
    )
    assert np.array_equal(ca, cb) and np.array_equal(ba, bb)


def test_suggest_ann_params_compressed_recommends_ivf_pq():
    """compressed=True = the PQ use case; the helper must return the
    measured recommendable geometry (m >= 16 and divides dim, rerank
    load-bearing advisory on isotropic geometry)."""
    from database_migration_spark.operators.similarity import suggest_ann_params

    p = suggest_ann_params(200_000, dim=64, neighbor_cos=0.55, compressed=True)
    assert p["method"] == "ivf_pq"
    assert p["m"] >= 16 and 64 % p["m"] == 0
    assert p["rerank"] == 50
    assert p["n_probe"] >= 1 and p["n_centroids"] >= 400
    assert p["advisory"] is not None and "rerank" in p["advisory"]
    # tight neighbor geometry: no collapse warning needed
    p2 = suggest_ann_params(200_000, dim=48, neighbor_cos=0.9, compressed=True)
    assert p2["method"] == "ivf_pq" and 48 % p2["m"] == 0


def test_ivf_pq_index_partition_pruning_and_parity(spark, emb, tmp_path):
    """write_ivf_pq_index / ivf_pq_topk_from_index: geometry resolves from
    the stored _ann_meta.json, results match the in-memory operator row
    for row (incl. the rerank leg), and BOTH partitioned scans (codes for
    ADC, vectors for rerank) carry the probed cells in PartitionFilters —
    pruning at file listing, not a post-read filter."""
    import contextlib
    import io

    from database_migration_spark.operators.similarity import (
        ivf_pq_encode,
        ivf_pq_topk,
        ivf_pq_topk_from_index,
        train_ivf_pq,
        write_ivf_pq_index,
    )

    corpus = emb.select("vec_id", "embedding")
    coarse, books = train_ivf_pq(corpus, n_centroids=8, m=8, k=16, iters=4)
    path = str(tmp_path / "ivfpq_index")
    write_ivf_pq_index(corpus, path, coarse, books)
    queries = corpus.where(F.col("vec_id") < 4)

    out = ivf_pq_topk_from_index(
        spark, path, queries, k=3, n_probe=3, rerank=10
    )
    mem = ivf_pq_topk(
        ivf_pq_encode(corpus, coarse, books), queries, coarse, books,
        k=3, n_probe=3, rerank=10, corpus=corpus,
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, mem.collect()))

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(True)
    plan = buf.getvalue()
    pruned = [s for s in plan.split("PartitionFilters")[1:] if "cell" in s.split("]")[0]]
    # the codes scan AND the rerank vector scan both prune on cell
    assert len(pruned) >= 2, plan

    # ADC-only path (no rerank) still prunes and matches
    out2 = ivf_pq_topk_from_index(spark, path, queries, k=3, n_probe=3)
    mem2 = ivf_pq_topk(
        ivf_pq_encode(corpus, coarse, books), queries, coarse, books,
        k=3, n_probe=3,
    )
    assert sorted(map(tuple, out2.collect())) == sorted(map(tuple, mem2.collect()))


def test_ivf_pq_index_drift_detects_distribution_shift(spark, emb, tmp_path):
    """Self-comparison reads ~zero; a corpus collapsed onto one region
    reads large — the append-grown index's rebuild trigger."""
    import pytest as _pytest

    from database_migration_spark.operators.similarity import (
        ivf_pq_index_drift,
        train_ivf_pq,
        write_ivf_pq_index,
    )

    corpus = emb.select("vec_id", "embedding")
    coarse, books = train_ivf_pq(corpus, n_centroids=8, m=8, k=16, iters=4)
    path = str(tmp_path / "drift_index")
    write_ivf_pq_index(corpus, path, coarse, books)

    same = ivf_pq_index_drift(spark, path, corpus)
    assert same["tv_ppm"] <= 1_000  # integer-div rounding only
    assert same["n_index"] == same["n_corpus"]

    # a "drifted" corpus: every vector collapsed to the zero vector ->
    # all mass lands in one (deterministic nearest) cell
    shifted = corpus.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(0 AS FLOAT))").alias(
            "embedding"
        ),
    )
    drifted = ivf_pq_index_drift(spark, path, shifted)
    assert drifted["tv_ppm"] > 500_000
    assert drifted["worst_cell_delta_ppm"] > 500_000

    with _pytest.raises(ValueError, match="empty"):
        ivf_pq_index_drift(spark, path, corpus.where("vec_id < -1"))


# round 9: ADVICE closures — tie-consistent cell assignment, m-divisor
# floor advisory


def test_assign_cells_agrees_with_encode_on_duplicate_centroids(spark):
    """Duplicate coarse centroids = exact distance ties: the vectors
    relation of an IVF-PQ index (_assign_cells, stable argsort) and the
    codes relation (ivf_pq_encode, argmin) must place every vector in the
    SAME cell, or the rerank leg's cell-pruned vector fetch silently drops
    shortlisted neighbors (round-8 ADVICE)."""
    import numpy as np

    from database_migration_spark.operators.similarity import (
        _assign_cells,
        ivf_pq_encode,
    )

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(50, 8)).astype(np.float32)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    # four centroids, the last two EXACT duplicates of the first two —
    # every vector nearest c0/c1 ties with c2/c3 respectively
    base = rng.normal(size=(2, 8))
    cent = np.vstack([base, base])
    books = rng.normal(size=(2, 4, 4))  # m=2 subspaces of d=4, k=4 codes
    enc = {
        r["vec_id"]: r["cell"]
        for r in ivf_pq_encode(corpus, cent, books).select(
            "vec_id", "cell"
        ).collect()
    }
    import pyspark.sql.functions as F

    assigned = {
        r["v"]: r["cell"]
        for r in _assign_cells(
            corpus.select(F.col("vec_id").alias("_id"), "embedding"),
            cent, "embedding", "v", n_probe=1,
        ).collect()
    }
    assert enc == assigned
    # and the ties genuinely exercised the first-index rule: every cell
    # must be 0 or 1 (never the duplicate 2/3)
    assert set(enc.values()) <= {0, 1}


def test_suggest_ann_params_compressed_m_floor_advisory():
    """The divisor fit must never silently return the measured collapse
    regime (round-8 ADVICE: `while dim % m: m -= 1` reached m=10 at
    dim=20, m=1 at prime dims): prefer the smallest divisor >= 16, and
    when none exists say so in the advisory."""
    from database_migration_spark.operators.similarity import (
        suggest_ann_params,
    )

    # dim=20: old code returned m=10 (collapse, no warning); divisor >= 16
    # exists (20 itself) and must be chosen
    p = suggest_ann_params(100_000, dim=20, neighbor_cos=0.55,
                           compressed=True)
    assert p["m"] == 20 and 20 % p["m"] == 0
    # dim=128 keeps the FINE geometry (4-dim subvectors, m=32) — the
    # floor fix must never downgrade dims that already cleared it
    # (round-9 review: geq16[0] unconditionally would return m=16 here)
    p = suggest_ann_params(100_000, dim=128, neighbor_cos=0.55,
                           compressed=True)
    assert p["m"] == 32
    # prime dim: no divisor >= 16 below dim... 13 has none at all -> the
    # advisory must flag the collapse regime and expected_recall must not
    # claim the measured 0.78
    p = suggest_ann_params(100_000, dim=13, neighbor_cos=0.55,
                           compressed=True)
    assert p["m"] == 13 or p["m"] < 16
    assert "divisor" in p["advisory"] and "0.137" in p["advisory"]
    assert p["expected_recall"] is None


def test_ivf_pq_recall_gate_on_suggested_geometry(spark, emb):
    """The ANN lifecycle's QUALITY regression gate (round-9 verdict item:
    suggest -> build -> search proved plumbing only): recall@5 vs brute
    force on the fixture corpus with the SUGGESTED geometry must clear a
    floor, so a future encode/probe/rerank regression fails a test
    instead of silently degrading answers. Deterministic: the trainers
    are seeded and sample id-ordered, so the measured 0.532 recall@5 is
    reproducible — the floor sits at 0.45 (margin for dtype-level churn),
    far above the deliberately broken geometry's 0.18. This corpus is
    isotropic (neighbor_cos ~0.55, the hard regime) and tiny; the
    measured ×100 geometry answers 0.79 (SCALE.md)."""
    from pyspark.sql import functions as F

    from database_migration_spark.operators import similarity as S

    norm = F.expr(
        "sqrt(aggregate(embedding, 0.0D, (a, v) -> "
        "a + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"
    )
    corpus = emb.select("vec_id", norm.alias("_n"), "embedding").select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x / _n AS FLOAT))").alias(
            "embedding"
        ),
    ).cache()
    n = corpus.count()
    p = S.suggest_ann_params(n, dim=64, neighbor_cos=0.55, compressed=True)
    q = corpus.where("vec_id < 50")
    truth = {
        (r.query_id, r.neighbor_id)
        for r in S.cosine_topk(corpus, q, k=5).collect()
    }
    # pq_k=64 codes per subspace (suggest sizes cells/probes/m/rerank;
    # 256 codes over a 500-vector fixture would near-memorize it and
    # soften the gate)
    coarse, books = S.train_ivf_pq(
        corpus, n_centroids=p["n_centroids"], m=p["m"], k=64
    )
    codes = S.ivf_pq_encode(corpus, coarse, books).persist()
    codes.count()
    got = {
        (r.query_id, r.neighbor_id)
        for r in S.ivf_pq_topk(
            codes, q, coarse, books, k=5, n_probe=p["n_probe"],
            rerank=p["rerank"], corpus=corpus,
        ).collect()
    }
    recall = len(truth & got) / len(truth)
    assert recall >= 0.45, (
        f"recall@5 {recall:.3f} under the suggested geometry {p} — the "
        "encode/probe/rerank path regressed (measured 0.532 on this "
        "fixture)"
    )
    # the gate must DISCRIMINATE: a deliberately broken geometry
    # (single-cell probe, no rerank) fails it decisively
    bad = {
        (r.query_id, r.neighbor_id)
        for r in S.ivf_pq_topk(
            codes, q, coarse, books, k=5, n_probe=1, rerank=0
        ).collect()
    }
    bad_recall = len(truth & bad) / len(truth)
    assert bad_recall < 0.45, (
        f"broken geometry answered {bad_recall:.3f} — the floor no "
        "longer discriminates; re-measure and move it"
    )
    codes.unpersist()
    corpus.unpersist()
