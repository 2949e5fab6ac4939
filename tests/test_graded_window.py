"""Gate: the grading driver compares only the first GRADED_WINDOW entries of
queries() — every SURVEY-§2/LLM-operator-proving query must sit inside it.

Round-3 regression this guards against: new registrations inserted ahead of
older queries pushed 13 proving queries past position 50; they silently went
ungraded (no CORRECTNESS row at all) for a full round.
"""

from database_migration_spark import queries as Q


def test_proving_queries_inside_graded_window():
    names = list(Q.queries())
    showcase = set(Q._SHOWCASE_ONLY)
    proving = [n for n in names if n not in showcase]
    # a 51st proving query must force an explicit demotion decision
    assert len(proving) <= Q.GRADED_WINDOW, (
        f"{len(proving)} proving queries > graded window of "
        f"{Q.GRADED_WINDOW}; demote a redundant showcase query in "
        "queries._SHOWCASE_ONLY"
    )
    window = set(names[: Q.GRADED_WINDOW])
    missing = [n for n in proving if n not in window]
    assert not missing, f"proving queries outside graded window: {missing}"


# rows-only by nature (iterative algorithms): allowed to lack an oracle,
# but each MUST carry a differential pytest instead — named here so adding
# one is an explicit decision, not an accident
ROWS_ONLY = {"bpe_merge_table_documents", "rolling_active_users",
             "pq_topk_embeddings", "ivf_pq_topk_embeddings",
             "image_near_dup_media"}


def test_showcase_list_names_real_queries():
    assert set(Q._SHOWCASE_ONLY) <= set(Q.QUERIES)
    # and they stay runnable: each demoted query still has an oracle,
    # except the explicitly rows-only iterative ops
    assert set(Q._SHOWCASE_ONLY) - ROWS_ONLY <= set(Q.ORACLE)
    # rows-only entries must never sit in the graded window (the window's
    # all-oracle-checked property is load-bearing for the driver artifact)
    window = list(Q.queries())[: Q.GRADED_WINDOW]
    assert not (ROWS_ONLY & set(window))


def test_queries_and_oracles_align():
    qs = Q.queries()
    os_ = Q.oracle_sql()
    assert set(os_) <= set(qs)
    # ordering is consistent between the two dicts
    q_names = [n for n in qs if n in os_]
    assert q_names == list(os_)
