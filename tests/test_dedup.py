

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
