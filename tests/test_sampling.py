"""Deterministic sampling: reproducible across partitionings, quota-exact."""

from pyspark.sql import functions as F

from database_migration_spark.operators.sampling import hash_sample, stratified_sample


def test_stratified_sample_quota_and_determinism(spark):
    rows = [(i, "k%d" % (i % 3)) for i in range(300)]
    df = spark.createDataFrame(rows, "id LONG, k STRING")
    out1 = stratified_sample(df, ["k"], "id", 7)
    assert out1.groupBy("k").count().agg(F.max("count")).collect()[0][0] == 7
    # same sample regardless of physical partitioning
    out2 = stratified_sample(df.repartition(13), ["k"], "id", 7)
    assert sorted(r.id for r in out1.collect()) == sorted(r.id for r in out2.collect())
    # ranks are 1..7 per stratum
    ranks = out1.groupBy("k").agg(F.collect_set("sample_rank").alias("s")).collect()
    assert all(sorted(r.s) == list(range(1, 8)) for r in ranks)


def test_hash_sample_is_a_stable_subset(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "id LONG")
    a = {r.id for r in hash_sample(df, "id", 100).collect()}
    b = {r.id for r in hash_sample(df.repartition(7), "id", 100).collect()}
    assert a == b
    assert 50 < len(a) < 200  # ~10% of 1000
    # nested property: a 50-permille sample is a subset of the 100-permille one
    c = {r.id for r in hash_sample(df, "id", 50).collect()}
    assert c <= a


def test_sequence_pack_layout(spark):
    from database_migration_spark.operators.sampling import sequence_pack

    df = spark.createDataFrame(
        [(i, "s", 40) for i in range(10)], "id LONG, src STRING, n_tok LONG"
    )
    out = sequence_pack(df, "id", "n_tok", budget=100, partition_cols=["src"]).collect()
    # 10 docs x 40 tokens = 400 tokens -> packs 0..3, offsets cycle 0,40,80,20,...
    by_start = sorted(out, key=lambda r: (r.pack_id, r.offset_tokens))
    starts = [r.pack_id * 100 + r.offset_tokens for r in by_start]
    assert starts == [i * 40 for i in range(10)]
    assert max(r.pack_id for r in out) == 3
    # deterministic across partitioning
    out2 = sequence_pack(
        df.repartition(5), "id", "n_tok", budget=100, partition_cols=["src"]
    ).collect()
    assert {(r.id, r.pack_id, r.offset_tokens) for r in out} == {
        (r.id, r.pack_id, r.offset_tokens) for r in out2
    }


def test_sequence_pack_default_shard_bounded(spark):
    from database_migration_spark.operators.sampling import sequence_pack

    df = spark.createDataFrame([(i, 10) for i in range(100)], "id LONG, n_tok LONG")
    out = sequence_pack(df, "id", "n_tok", budget=50)
    assert "_shard" in out.columns  # windows are per hash shard, never global
    assert out.count() == 100


def test_domain_mix_sample_rates_and_determinism(spark):
    from database_migration_spark.operators.sampling import domain_mix_sample

    df = spark.createDataFrame(
        [(i, f"d{i % 3}") for i in range(3000)], "id LONG, dom STRING"
    )
    w = spark.createDataFrame(
        [("d0", 1_000_000), ("d1", 250_000)], "dom STRING, target_ppm LONG"
    )
    out = domain_mix_sample(df, w, "dom", "id")
    rows = out.collect()
    by_dom = {}
    for r in rows:
        by_dom.setdefault(r.dom, set()).add(r.id)
    # ppm=1e6 keeps every row; absent domain (d2) dropped entirely
    assert len(by_dom["d0"]) == 1000
    assert "d2" not in by_dom
    # quarter rate lands near 250/1000 (hash-uniform, not exact)
    assert 150 <= len(by_dom["d1"]) <= 350
    # identical membership under different partitioning (pure id-hash filter)
    out2 = domain_mix_sample(df.repartition(7), w, "dom", "id")
    assert {(r.id, r.dom) for r in out2.collect()} == {(r.id, r.dom) for r in rows}
    # the kept set is a strict per-domain subset ordered by nothing but the
    # hash bucket: lowering the rate can only shrink it (nested samples)
    w_half = spark.createDataFrame(
        [("d0", 1_000_000), ("d1", 125_000)], "dom STRING, target_ppm LONG"
    )
    smaller = {r.id for r in domain_mix_sample(df, w_half, "dom", "id").collect() if r.dom == "d1"}
    assert smaller <= by_dom["d1"]


def test_shard_layout_contiguous_offsets_and_determinism(spark):
    from database_migration_spark.operators.sampling import shard_layout

    df = spark.createDataFrame(
        [(i, 10 + i % 7) for i in range(500)], "id LONG, n_tok LONG"
    )
    out = shard_layout(df, "id", "n_tok", n_shards=4).collect()
    assert len(out) == 500
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    assert set(by_shard) == {0, 1, 2, 3}
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r.shard_pos)
        # positions are 1..n dense; offsets are the exact running token sum
        assert [r.shard_pos for r in shard_rows] == list(
            range(1, len(shard_rows) + 1)
        )
        acc = 0
        for r in shard_rows:
            assert r.offset_tokens == acc
            acc += r.n_tok
    # same layout under different input partitioning
    out2 = shard_layout(df.repartition(13), "id", "n_tok", n_shards=4).collect()
    assert {(r.id, r.shard, r.shard_pos, r.offset_tokens) for r in out2} == {
        (r.id, r.shard, r.shard_pos, r.offset_tokens) for r in out
    }
    # hash order is a shuffle: within-shard id sequence is not sorted
    ids0 = [r.id for r in sorted(by_shard[0], key=lambda r: r.shard_pos)]
    assert ids0 != sorted(ids0)


def test_hash_split_proportions_stability_and_salt_independence(spark):
    from database_migration_spark.operators.sampling import hash_sample, hash_split

    df = spark.createDataFrame([(i,) for i in range(10000)], "id LONG")
    out = hash_split(df, "id", val_permille=100, test_permille=100)
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert 800 <= counts["test"] <= 1200 and 800 <= counts["val"] <= 1200
    # stable under repartitioning
    out2 = hash_split(df.repartition(7), "id", val_permille=100, test_permille=100)
    assert {(r.id, r.split) for r in out2.collect()} == {
        (r.id, r.split) for r in out.collect()
    }
    # independence from the UNSALTED sampling hash: a 10% hash_sample must
    # not collapse into one split (the correlated-hash failure the salt
    # prevents)
    sampled = hash_sample(df, "id", keep_permille=100)
    splits = {
        r["split"]
        for r in hash_split(sampled, "id", val_permille=100, test_permille=100)
        .select("split").distinct().collect()
    }
    assert splits == {"train", "val", "test"}


def test_budget_sample_caps_per_group(spark):
    from collections import defaultdict

    from database_migration_spark.operators.sampling import budget_sample

    rows = [(i, "a" if i % 2 else "b", 40) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = budget_sample(df, "doc_id", "n_chars", budget=100,
                        partition_cols=["source"]).collect()
    by_src = defaultdict(list)
    for r in out:
        by_src[r.source].append(r)
    # budget 100 / 40-token docs: tokens_before < 100 keeps starts 0, 40,
    # 80 — three docs per group, overshoot exactly one doc (120 total)
    for src, picked in by_src.items():
        assert len(picked) == 3, (src, picked)
        assert sorted(r.tokens_before for r in picked) == [0, 40, 80]
    # deterministic: same call, same membership
    again = {r.doc_id for r in budget_sample(
        df, "doc_id", "n_chars", budget=100, partition_cols=["source"]
    ).collect()}
    assert again == {r.doc_id for r in out}


def test_budget_sample_includes_crossing_doc(spark):
    from database_migration_spark.operators.sampling import budget_sample

    df = spark.createDataFrame(
        [(1, 70), (2, 70), (3, 70)], "doc_id long, n_chars long"
    )
    out = budget_sample(df, "doc_id", "n_chars", budget=100).collect()
    # hash order of ids 1..3 is deterministic; whoever starts below 100
    # is kept even though it crosses — exactly two docs (0 and 70)
    assert sorted(r.tokens_before for r in out) == [0, 70]


# round 8: systematic PPS sampling


def _pps_fixture(spark):
    rows = [(i, "s" if i % 2 else "t", (i * 37) % 200 + 1) for i in range(400)]
    rows += [(1000, "s", 0), (1001, "t", 0)]  # zero-weight: never selected
    return spark.createDataFrame(rows, "doc_id LONG, src STRING, w LONG")


def test_pps_sample_size_and_zero_weights(spark):
    from database_migration_spark.operators.sampling import (
        pps_systematic_sample,
    )

    df = _pps_fixture(spark)
    out = pps_systematic_sample(df, "doc_id", "w", n=20,
                                partition_cols=["src"]).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.src, []).append(r)
    for src, rows in by_src.items():
        # systematic sampling's +-1 guarantee: ceil((W - offset)/step)
        assert 20 <= len(rows) <= 21, (src, len(rows))
    assert not [r for r in out if r.w == 0]


def test_pps_large_weight_certainty_and_determinism(spark):
    """The PPS property floats can't give you exactly: any doc whose
    weight >= step is selected with certainty (its interval must contain
    a grid point), and the whole sample is partition-layout-independent."""
    from database_migration_spark.operators.sampling import (
        pps_systematic_sample,
    )

    df = _pps_fixture(spark)
    big = spark.createDataFrame([(2000, "s", 100_000)],
                                "doc_id LONG, src STRING, w LONG")
    both = df.unionByName(big)
    out = pps_systematic_sample(both, "doc_id", "w", n=20,
                                partition_cols=["src"])
    assert out.where("doc_id = 2000").count() == 1
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(
        r.doc_id
        for r in pps_systematic_sample(
            both.repartition(13), "doc_id", "w", n=20, partition_cols=["src"]
        ).collect()
    )
    assert a == b


def test_pps_token_mass_tracks_corpus(spark):
    """The reason PPS exists: the SAMPLE's weight mass per group is ~n
    grid steps, so selected docs represent the corpus's token mass, not
    its doc count — heavy docs are proportionally more likely."""
    from database_migration_spark.operators.sampling import (
        pps_systematic_sample,
    )

    df = _pps_fixture(spark).where("src = 's'")
    n = 25
    out = pps_systematic_sample(df, "doc_id", "w", n=n)
    got = out.count()
    assert n <= got <= n + 1
    # per selected doc, expected weight ~ W/n on average: total selected
    # weight must be within a factor-2 band of W (each grid point lands
    # in exactly one doc's interval)
    W = df.agg({"w": "sum"}).collect()[0][0]
    sel_w = out.agg({"w": "sum"}).collect()[0][0]
    assert sel_w <= W


# round 8: per-group percentile calibration


def test_percentile_calibrate_bounds_and_monotonicity(spark):
    from database_migration_spark.operators.sampling import (
        percentile_calibrate,
    )

    rows = [(i, "a", (i * 17) % 100) for i in range(50)]
    rows += [(100 + i, "b", (i * 3) % 7) for i in range(20)]
    rows += [(999, "solo", 42)]  # single-row group -> 1_000_000
    df = spark.createDataFrame(rows, "id LONG, grp STRING, score LONG")
    out = percentile_calibrate(df, "score", "id", ["grp"]).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r.grp, []).append(r)
    for grp, rs in by_grp.items():
        ppms = sorted(r.pct_ppm for r in rs)
        assert ppms[0] == 0 or grp == "solo"
        assert ppms[-1] == 1_000_000
        # monotone: higher score never gets a lower ppm (ties by id)
        for x, y in zip(sorted(rs, key=lambda r: (r.score, r.id)),
                        sorted(rs, key=lambda r: r.pct_ppm)):
            assert x.id == y.id
    assert by_grp["solo"][0].pct_ppm == 1_000_000


def test_percentile_calibrate_makes_thresholds_cross_domain(spark):
    """The reason the op exists: one raw threshold keeps wildly different
    fractions of two domains with different score scales; one CALIBRATED
    threshold keeps the same fraction of each."""
    from database_migration_spark.operators.sampling import (
        percentile_calibrate,
    )

    rows = [(i, "code", 1000 + i) for i in range(100)]   # scores ~1000
    rows += [(200 + i, "prose", i) for i in range(100)]  # scores ~0-99
    df = spark.createDataFrame(rows, "id LONG, grp STRING, score LONG")
    raw_keep = df.where("score >= 500").groupBy("grp").count().collect()
    assert {r.grp: r["count"] for r in raw_keep} == {"code": 100}  # all/none
    cal = percentile_calibrate(df, "score", "id", ["grp"])
    kept = {
        r.grp: r["count"]
        for r in cal.where("pct_ppm >= 600000").groupBy("grp").count().collect()
    }
    assert kept["code"] == kept["prose"] == 40  # same 40% of each


def test_pps_rejects_nonpositive_n(spark):
    import pytest as _pytest

    from database_migration_spark.operators.sampling import (
        pps_systematic_sample,
    )

    df = spark.createDataFrame([(1, 5)], "id LONG, w LONG")
    with _pytest.raises(ValueError, match=">= 1"):
        pps_systematic_sample(df, "id", "w", n=0)


# round 9: quality-mass selection


def test_top_mass_sample_hand_computed(spark):
    """Scores 5>4>3>2>1 with weights 10 each, 60% of mass=50 -> threshold
    at cum*1e6 < 50*600000: keep cum_before in {0,10,20} = the top-3
    scores; the crossing row (cum_before=20, mass runs to 30 of 30
    needed) is INCLUDED."""
    from database_migration_spark.operators.sampling import top_mass_sample

    df = spark.createDataFrame(
        [(i, i, 10) for i in range(1, 6)], "id LONG, score LONG, w LONG"
    )
    got = {
        (r.id, r.cum_before)
        for r in top_mass_sample(df, "id", "score", "w", 600_000).collect()
    }
    assert got == {(5, 0), (4, 10), (3, 20)}


def test_top_mass_sample_crossing_row_included_and_exact_boundary(spark):
    """The keep rule is division-free and the crossing row included: with
    weights 7,5,3 (total 15) and mass 500000 (half = 7.5), cum_before
    0 and 7 both satisfy cum*1e6 < 15*500000 (7e6 < 7.5e6) -> the second
    row crosses and is kept; the third (cum 12) is not. At mass_ppm that
    lands EXACTLY on a row boundary (7/15 -> 466667 ppm: 7e6 < 7.000005e6)
    the boundary row is still the crossing row and kept; one ppm lower
    (466666: 7e6 < 6.99999e6 false) drops it — the rule is exact to the
    ppm."""
    from database_migration_spark.operators.sampling import top_mass_sample

    df = spark.createDataFrame(
        [(1, 30, 7), (2, 20, 5), (3, 10, 3)], "id LONG, score LONG, w LONG"
    )

    def kept(ppm):
        return {
            r.id for r in top_mass_sample(df, "id", "score", "w", ppm).collect()
        }

    assert kept(500_000) == {1, 2}
    assert kept(466_667) == {1, 2}
    assert kept(466_666) == {1}
    assert kept(1_000_000) == {1, 2, 3}
    assert kept(0) == set()


def test_top_mass_sample_groups_zero_mass_and_validation(spark):
    """Per-group independence; a zero-total group keeps nothing; ppm
    outside [0, 1e6] raises."""
    import pytest

    from database_migration_spark.operators.sampling import top_mass_sample

    df = spark.createDataFrame(
        [("a", 1, 5, 10), ("a", 2, 4, 10), ("b", 3, 9, 0), ("b", 4, 8, 0)],
        "g STRING, id LONG, score LONG, w LONG",
    )
    got = {
        r.id
        for r in top_mass_sample(
            df, "id", "score", "w", 500_000, group_cols=["g"]
        ).collect()
    }
    # group a: half of 20 = 10 -> keep the top score (cum 0) only... the
    # crossing rule: cum_before=0 < 10e6/1e6 ✓, cum_before=10: 10e6 <
    # 20*500000=10e6 false -> exactly one row. group b: total 0 -> none.
    assert got == {1}
    with pytest.raises(ValueError, match="mass_ppm"):
        top_mass_sample(df, "id", "score", "w", 2_000_000)


def test_weighted_samplers_reject_negative_weights(spark):
    """The documented non-negative-weight contract is ENFORCED per row
    inside the scan (raise_error — no extra validation pass): a negative
    weight fails the job loudly instead of silently corrupting the
    running sums (round-9 review)."""
    import pytest

    from database_migration_spark.operators.sampling import (
        pps_systematic_sample,
        top_mass_sample,
    )

    df = spark.createDataFrame(
        [(1, 5, 10), (2, 4, -3), (3, 3, 7)], "id LONG, score LONG, w LONG"
    )
    with pytest.raises(Exception, match="negative w"):
        top_mass_sample(df, "id", "score", "w", 500_000).collect()
    with pytest.raises(Exception, match="negative w"):
        pps_systematic_sample(df, "id", "w", 2).collect()


def test_cluster_safe_split_no_pair_spans_splits(spark):
    from database_migration_spark.operators.sampling import (
        cluster_safe_split,
        hash_split,
    )

    # 600 docs; ids 0..99 chained into 50 pairs (2i, 2i+1); rest singletons
    df = spark.createDataFrame([(i,) for i in range(600)], "doc_id LONG")
    labels = spark.createDataFrame(
        [(i, i - i % 2 if i < 100 else i) for i in range(600)],
        "id LONG, cluster_id LONG",
    )
    # generous holdouts so pairs WOULD straddle a per-doc split
    out = cluster_safe_split(
        df, "doc_id", labels, val_permille=200, test_permille=200
    )
    got = {r.doc_id: (r.split, r.cluster_id) for r in out.collect()}
    assert len(got) == 600
    for i in range(0, 100, 2):
        assert got[i] == got[i + 1], f"pair ({i},{i+1}) spans splits"
    # the per-doc split DOES leak on this corpus (the problem being fixed)
    plain = {
        r.doc_id: r.split
        for r in hash_split(
            df, "doc_id", val_permille=200, test_permille=200
        ).collect()
    }
    assert any(plain[i] != plain[i + 1] for i in range(0, 100, 2))
    # singleton refinement: same salt => singletons keep their per-doc
    # assignment; only clustered docs may move (together)
    assert all(got[i][0] == plain[i] for i in range(100, 600))
    # proportions remain roughly 60/20/20 (cluster hash is uniform too)
    from collections import Counter

    c = Counter(s for s, _ in got.values())  # expect ~360/120/120
    assert 300 < c["train"] < 420 and 70 < c["val"] < 180 and 70 < c["test"] < 180


def test_cluster_safe_split_partial_labels_and_determinism(spark):
    from database_migration_spark.operators.sampling import cluster_safe_split

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id LONG")
    # PARTIAL label relation: only the clustered docs appear (a pipeline
    # that publishes non-singleton clusters only)
    labels = spark.createDataFrame(
        [(i, 0) for i in range(10)], "id LONG, cluster_id LONG"
    )
    out1 = cluster_safe_split(df, "doc_id", labels, 100, 100)
    got1 = {r.doc_id: (r.split, r.cluster_id) for r in out1.collect()}
    assert len(got1) == 200
    # missing docs are singletons: cluster = own id
    assert all(got1[i][1] == i for i in range(10, 200))
    # the labeled cluster is one block
    assert len({got1[i] for i in range(10)}) == 1
    # deterministic under repartitioning
    out2 = cluster_safe_split(
        df.repartition(7), "doc_id", labels.repartition(3), 100, 100
    )
    assert got1 == {r.doc_id: (r.split, r.cluster_id) for r in out2.collect()}


def test_cluster_safe_split_never_guesses_the_id_column(spark):
    # review finding: picking labels.columns[0] positionally joins on the
    # cluster VALUE when the table arrives (cluster_id, id)-ordered —
    # duplicate rows and silent loss of the leakage guarantee. Resolution
    # is by NAME (id_col), else the single non-cluster column, else raise.
    import pytest

    from database_migration_spark.operators.sampling import (
        cluster_safe_split,
    )

    df = spark.createDataFrame([(i,) for i in range(20)], "doc_id LONG")
    # (cluster_id, id)-ORDERED two-column table still resolves correctly
    flipped = spark.createDataFrame(
        [(0, i) for i in range(10)], "cluster_id LONG, id LONG"
    )
    got = {
        r.doc_id: r.cluster_id
        for r in cluster_safe_split(df, "doc_id", flipped, 100, 100).collect()
    }
    assert all(got[i] == 0 for i in range(10))
    assert all(got[i] == i for i in range(10, 20))
    # three columns, none named doc_id: ambiguous — raise, never guess
    ambiguous = spark.createDataFrame(
        [(1, 2, 3)], "a LONG, b LONG, cluster_id LONG"
    )
    with pytest.raises(ValueError, match="cannot identify the id column"):
        cluster_safe_split(df, "doc_id", ambiguous, 100, 100)
    # missing cluster column names the fix
    with pytest.raises(ValueError, match="no 'cluster_id'"):
        cluster_safe_split(
            df, "doc_id", df.selectExpr("doc_id AS id"), 100, 100
        )


def test_cluster_safe_split_label_hygiene_guards(spark):
    """ADVICE r10: a pre-existing cluster_id/split column on df and a
    duplicated label id are both silent failure modes in an operator
    whose guarantee is exact membership — the first must RAISE, exact
    duplicate label rows dedup, and a CONFLICT (one id, two clusters)
    must RAISE."""
    import pytest

    from database_migration_spark.operators.sampling import (
        cluster_safe_split,
    )

    df = spark.createDataFrame([(i,) for i in range(20)], "doc_id LONG")
    labels = spark.createDataFrame(
        [(i, i % 5) for i in range(20)], "doc_id LONG, cluster_id LONG"
    )
    # df already carrying an output column raises, naming it
    with pytest.raises(ValueError, match="'cluster_id'"):
        cluster_safe_split(
            df.withColumn("cluster_id", df.doc_id), "doc_id", labels
        )
    with pytest.raises(ValueError, match="'split'"):
        cluster_safe_split(
            df.selectExpr("doc_id", "'x' AS split"), "doc_id", labels
        )
    # exact duplicate label ROWS are benign: deduped, no row fan-out
    doubled = labels.unionAll(labels)
    out = cluster_safe_split(df, "doc_id", doubled, 100, 100)
    assert out.count() == 20
    # one id under TWO clusters is a contradiction: raise, never fan out
    conflicted = labels.unionAll(
        spark.createDataFrame([(3, 999)], "doc_id LONG, cluster_id LONG")
    )
    with pytest.raises(ValueError, match="more than one cluster"):
        cluster_safe_split(df, "doc_id", conflicted, 100, 100)
    # the documented opt-out skips the eager pass (caller's contract)
    assert (
        cluster_safe_split(
            df, "doc_id", conflicted, 100, 100, verify_labels=False
        ).count()
        == 21
    )
