

def test_connected_components_chain_and_singleton(spark):
    from database_migration_spark.operators.dedup import connected_components

    # chain 1-2-3-4 (diameter 3, needs >1 round), pair {10,11}, singleton 20
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a LONG, id_b LONG"
    )
    nodes = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 10, 11, 20]], "doc_id LONG"
    )
    out = {
        r.id: r.cluster_id
        for r in connected_components(pairs, nodes, id_col="doc_id").collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}


def test_benchmark_contamination_planted(spark):
    from database_migration_spark.operators.dedup import benchmark_contamination

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id LONG, text STRING",
    )
    corpus = spark.createDataFrame(
        [
            # embeds the benchmark text wholesale -> near-total overlap
            (1, "intro text then the quick brown fox jumps over the lazy dog end"),
            # nothing in common (different alphabet entirely)
            (2, "zzz yyy xxx www vvv uuu qqq ppp"),
        ],
        "doc_id LONG, text STRING",
    )
    out = {r.doc_id: r for r in benchmark_contamination(corpus, bench, k=8).collect()}
    assert out[1].contamination_ppm > 500_000
    assert out[2].n_overlap == 0 and out[2].contamination_ppm == 0
    assert out[1].n_shingles > 0
