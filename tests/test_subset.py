"""Coherent subsetting (operators/subset.py): the zero-dangling-FK
contract, union-of-requirements ancestors, NULL FK semantics, growth
monotonicity of the deterministic rule, and the cycle guard."""

import pytest

from database_migration_spark.operators.subset import (
    coherent_subset,
    edges_from_catalog,
    keep_rule,
)

EDGES = [
    ("child", ("fk",), "root", ("rid",)),
    ("child", ("dim_fk",), "dim", ("did",)),
    ("other", ("dim_fk",), "dim", ("did",)),
    ("dim", ("gid_fk",), "grand", ("gid",)),
]


def _tables(spark):
    root = spark.createDataFrame(
        [(i, f"r{i}") for i in range(200)], "rid LONG, pay STRING"
    )
    child = spark.createDataFrame(
        [(i, i % 200, i % 40 if i % 7 else None) for i in range(600)],
        "cid LONG, fk LONG, dim_fk LONG",
    )
    other = spark.createDataFrame(
        [(1000 + i, 20 + i % 20) for i in range(100)],
        "oid LONG, dim_fk LONG",
    )
    dim = spark.createDataFrame(
        [(i, i % 5) for i in range(40)], "did LONG, gid_fk LONG"
    )
    grand = spark.createDataFrame([(i,) for i in range(5)], "gid LONG")
    return {
        "root": root, "child": child, "other": other,
        "dim": dim, "grand": grand,
    }


def test_zero_dangling_fks_and_union_ancestors(spark):
    tables = _tables(spark)
    kept = coherent_subset(
        tables, EDGES, root="root", permille=300,
        root_key=["rid"], cascade={"child": "root"},
    )
    # 'other' is not root/cascade/ancestor-of-kept — not in the slice
    assert set(kept) == {"root", "child", "dim", "grand"}
    # every FK of every kept row resolves inside the slice (the
    # contract): anti-join each member edge, expect zero orphans
    for ch, ccols, p, pcols in EDGES:
        if ch not in kept or p not in kept:
            continue
        orphans = (
            kept[ch]
            .where(kept[ch][ccols[0]].isNotNull())
            .join(
                kept[p].select(*[c for c in pcols]).withColumnRenamed(
                    pcols[0], ccols[0]
                ),
                list(ccols),
                "left_anti",
            )
            .count()
        )
        assert orphans == 0, f"dangling {ch}->{p}"
    # cascade semantics: child rows kept are EXACTLY those whose fk is
    # a kept root id
    root_ids = {r.rid for r in kept["root"].collect()}
    child_rows = kept["child"].collect()
    assert all(r.fk in root_ids for r in child_rows)
    full_child = tables["child"].collect()
    assert len(child_rows) == sum(1 for r in full_child if r.fk in root_ids)
    # union ancestor: dim requirement includes CHILD's dim_fks only
    # (other is outside); NULL dim_fks required nothing
    need = {r.dim_fk for r in child_rows if r.dim_fk is not None}
    assert {r.did for r in kept["dim"].collect()} == need


def test_membership_monotone_in_permille_and_deterministic(spark):
    tables = _tables(spark)

    def ids(permille):
        kept = coherent_subset(
            tables, EDGES, root="root", permille=permille,
            root_key=["rid"], cascade={"child": "root"},
        )
        return {t: frozenset(tuple(r) for r in kept[t].collect())
                for t in kept}

    small, big, again = ids(100), ids(400), ids(100)
    assert small == again  # deterministic
    for t in small:  # growing the rate only ADDS members, never moves
        assert small[t] <= big[t]


def test_guards(spark):
    tables = _tables(spark)
    with pytest.raises(ValueError, match="no such FK edge"):
        coherent_subset(tables, EDGES, "root", 100, ["rid"],
                        cascade={"other": "root"})
    with pytest.raises(ValueError, match="chain back to the root"):
        coherent_subset(tables, EDGES, "root", 100, ["rid"],
                        cascade={"other": "dim"})
    with pytest.raises(ValueError, match="root_key"):
        coherent_subset(tables, EDGES, "root", 100)
    with pytest.raises(ValueError, match="permille"):
        coherent_subset(tables, EDGES, "root", 0, ["rid"])
    # cyclic FK component cannot close
    cyc = EDGES + [("grand", ("back_fk",), "dim", ("did",))]
    tables2 = dict(tables)
    tables2["grand"] = tables["grand"].selectExpr("gid", "gid AS back_fk")
    with pytest.raises(ValueError, match="cyclic"):
        coherent_subset(tables2, cyc, "root", 100, ["rid"],
                        cascade={"child": "root"})
    with pytest.raises(ValueError, match="not provided"):
        coherent_subset(
            {k: v for k, v in tables.items() if k != "grand"},
            EDGES, "root", 100, ["rid"], cascade={"child": "root"},
        )


def test_edges_from_catalog_and_testdata_shape(spark, sf_smoke):
    from database_migration_spark.sources.parquet_source import ParquetSource

    cat = ParquetSource(spark, sf_smoke).scan_catalog(include_keys=True)
    edges = edges_from_catalog(cat)
    assert ("lineitem", ("l_orderkey",), "orders", ("o_orderkey",)) in edges
    assert ("nation", ("n_regionkey",), "region", ("r_regionkey",)) in edges


def test_keep_rule_matches_hash_split_convention(spark):
    # same salted-md5 bucket arithmetic as sampling.hash_split: the
    # membership must be replayable by the documented SQL rule
    from database_migration_spark.functions.hashing import md5_long
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i,) for i in range(1000)], "rid LONG")
    got = {r.rid for r in df.where(keep_rule(["rid"], 250, "subset")).collect()}
    want = {
        r.rid
        for r in df.where(
            md5_long(F.concat(F.lit("subset_"), F.col("rid").cast("string")))
            % 1000 < 250
        ).collect()
    }
    assert got == want and 150 < len(got) < 350


def test_second_edge_into_fixed_set_raises(spark):
    # a second FK from the cascade child into its via-parent (or any
    # member edge into root/cascade beyond the via edge) cannot be
    # covered — the fixed-rule sets don't grow; silent best-effort would
    # dangle rows (review finding)
    tables = _tables(spark)
    tables["child"] = tables["child"].selectExpr(
        "cid", "fk", "dim_fk", "fk AS second_fk"
    )
    edges2 = EDGES + [("child", ("second_fk",), "root", ("rid",))]
    with pytest.raises(ValueError, match="cannot grow"):
        coherent_subset(tables, edges2, "root", 300, ["rid"],
                        cascade={"child": "root"})
