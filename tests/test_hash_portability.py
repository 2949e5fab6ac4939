"""Property test: the portable md5-int hash is bit-identical in Spark and
DuckDB for arbitrary strings — the foundation the whole dedup/minhash
oracle stack rests on."""

import duckdb
from hypothesis import given, settings, strategies as st

from database_migration_spark.functions.hashing import (
    MERSENNE_31,
    md5_long_sql,
    minhash_permuted_sql,
    permutation_params,
)


@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs",),  # no lone surrogates
                max_codepoint=0x10FFFF,
            ),
            max_size=80,
        ),
        min_size=1,
        max_size=30,
        unique=True,
    )
)
@settings(max_examples=10, deadline=None)
def test_md5_long_matches_duckdb(spark, strings):
    from database_migration_spark.functions.hashing import md5_long
    from pyspark.sql import functions as F

    sdf = spark.createDataFrame([(s,) for s in strings], "s STRING")
    spark_vals = {
        r.s: r.h for r in sdf.select("s", md5_long(F.col("s")).alias("h")).collect()
    }
    con = duckdb.connect()
    for s in strings:
        (duck,) = con.execute(
            f"SELECT {md5_long_sql('?')}", [s]
        ).fetchone()
        assert spark_vals[s] == duck, repr(s)


def test_minhash_permutation_matches_duckdb(spark):
    from pyspark.sql import functions as F
    from database_migration_spark.functions.hashing import md5_long, minhash_permuted

    params = permutation_params(4, seed=42)
    vals = ["alpha", "beta", "γδ", ""]
    sdf = spark.createDataFrame([(v,) for v in vals], "s STRING")
    cols = [
        minhash_permuted(md5_long(F.col("s")), a, b).alias(f"p{i}")
        for i, (a, b) in enumerate(params)
    ]
    spark_rows = {r.s: [r[f"p{i}"] for i in range(4)] for r in sdf.select("s", *cols).collect()}
    con = duckdb.connect()
    for v in vals:
        exprs = ", ".join(
            minhash_permuted_sql(md5_long_sql("?"), a, b) for a, b in params
        )
        duck = con.execute(f"SELECT {exprs}", [v, v, v, v]).fetchone()
        assert spark_rows[v] == list(duck)
        assert all(0 <= x < MERSENNE_31 for x in duck)
