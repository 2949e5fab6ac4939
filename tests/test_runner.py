"""End-to-end migration runner + constraints tests (SURVEY §7.2 minimum
slice: catalog → typemap → copy → validate with zero deviations)."""

from pyspark.sql import functions as F

from database_migration_spark.operators.constraints import (
    suggest_primary_keys,
    verify_primary_key,
)
from database_migration_spark.runner import JobLogger, MigrationPlanner, MigrationRunner
from database_migration_spark.sources.parquet_source import ParquetSource


def test_full_migration_roundtrip(spark, sf_smoke, tmp_path):
    src = ParquetSource(spark, sf_smoke)
    planner = MigrationPlanner(src)
    cat, plan = planner.plan("TGT", table_filter="nation,region,events")
    assert len(cat.tables) == 3
    sql = plan.to_sql()
    assert 'CREATE TABLE "TGT"."NATION"' in sql and "IMPORT INTO" in sql

    logger = JobLogger()
    runner = MigrationRunner(spark, logger)
    report = runner.execute(cat, src, str(tmp_path / "tgt"))
    assert report.ok, [
        (t.table, t.deviations) for t in report.tables
    ]
    assert {t.table for t in report.tables} == {"nation", "region", "events"}
    assert report.validation.filter(F.col("status") == "DEVIATION").count() == 0
    # logger captured start/copy/validate per table
    log = logger.to_df(spark)
    assert log.filter(F.col("step").startswith("validate")).count() == 3
    # if the source stores TIMESTAMP(NANOS), the copy must carry the exact
    # int64 sidecar; a µs-precision source needs (and gets) no sidecar
    from database_migration_spark.sources.parquet_source import (
        nanos_timestamp_columns,
    )

    ev = spark.read.parquet(str(tmp_path / "tgt" / "events"))
    src_ns = nanos_timestamp_columns(f"{sf_smoke}/events.parquet")
    for c in src_ns:
        assert f"{c}_ns" in ev.columns
    expected_sidecars = {f"{c}_ns" for c in src_ns}
    assert {c for c in ev.columns if c.endswith("_ns")} == expected_sidecars


def test_nanos_sidecar_roundtrip(spark, tmp_path):
    """The TIMESTAMP(NANOS) legacy path: µs-truncated rebuild + exact int64
    sidecar (the testdata is timestamp[us] since round 3, so this path gets
    no coverage from the fixtures — exercise it with a synthetic ns file)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from database_migration_spark.sources.parquet_source import (
        nanos_timestamp_columns,
        read_parquet_portable,
    )

    nanos = [
        1_700_000_000_123_456_789,  # sub-µs residue 789 must truncate away
        1_700_000_000_999_999_999,
        7_777,  # 1970-01-01 00:00:00.000007777
    ]
    tbl = pa.table(
        {
            "id": pa.array([1, 2, 3], type=pa.int64()),
            "ts": pa.array(nanos, type=pa.timestamp("ns")),
        }
    )
    path = str(tmp_path / "ns_events.parquet")
    pq.write_table(tbl, path)

    assert nanos_timestamp_columns(path) == ["ts"]
    df = read_parquet_portable(spark, path)
    assert "ts_ns" in df.columns
    rows = {r["id"]: r for r in df.collect()}
    for i, ns in enumerate(nanos, start=1):
        assert rows[i]["ts_ns"] == ns  # sidecar is the exact int64
    # rebuilt ts = integer div-1000 truncation (never double rounding)
    us = {
        r["id"]: r["us"]
        for r in df.select(
            "id", F.unix_micros(F.col("ts")).alias("us")
        ).collect()
    }
    for i, ns in enumerate(nanos, start=1):
        assert us[i] == ns // 1000


def test_verify_primary_key(spark, sf_smoke):
    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    assert verify_primary_key(orders, ["o_orderkey"])["holds"]
    v = verify_primary_key(orders, ["o_orderstatus"])
    assert not v["holds"] and v["n_distinct"] < v["n_rows"]


def test_suggest_primary_keys(spark, sf_smoke):
    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    sugg = {r.column_name: r.is_candidate for r in suggest_primary_keys(orders).collect()}
    assert sugg["o_orderkey"] is True
    assert sugg["o_orderstatus"] is False


def test_constraint_statement_stream(spark):
    from database_migration_spark.catalog import Catalog, ColumnMeta, KeyMeta, TableMeta
    from database_migration_spark.operators.constraints import constraint_statements

    cols = (ColumnMeta("s", "t", "id", 1, "bigint"),)
    pk = KeyMeta("s", "t", "pk", "PRIMARY KEY", ("id",))
    fk = KeyMeta("s", "t", "fk", "FOREIGN KEY", ("id",), "s", "other", ("oid",))
    cat = Catalog([TableMeta("s", "t", cols, primary_key=pk, foreign_keys=(fk,))])
    sql = constraint_statements(cat, "TGT").to_sql()
    assert 'ADD PRIMARY KEY ("id") DISABLE' in sql
    assert 'REFERENCES "TGT"."other" ("oid") DISABLE' in sql


def test_planner_carries_views_and_partitions(spark):
    """MigrationPlanner surfaces adapter-provided views and partition
    metadata in the statement stream end-to-end."""
    from database_migration_spark.runner import MigrationPlanner
    from database_migration_spark.sources.jdbc import JdbcSourceAdapter

    class FakeMysql(JdbcSourceAdapter):
        def _fetch_rows(self, sql):
            if "information_schema.columns" in sql and "key_column_usage" not in sql:
                return [
                    {"schema_name": "app", "table_name": "t", "column_name": "id",
                     "ordinal_position": 1, "data_type": "bigint",
                     "is_nullable": "NO"}
                ]
            if "key_column_usage" in sql and "referenced" not in sql.lower():
                return [
                    {"schema_name": "app", "table_name": "t",
                     "constraint_name": None, "column_name": "id",
                     "column_position": 1}
                ]
            if "information_schema.views" in sql:
                return [
                    {"schema_name": "app", "view_name": "v1",
                     "view_def": "SELECT id FROM t"}
                ]
            if "information_schema.partitions" in sql:
                return [
                    {"schema_name": "app", "table_name": "t",
                     "partition_method": "HASH", "partition_expression": "`id`"},
                    {"schema_name": "app", "table_name": "t2",
                     "partition_method": "RANGE",
                     "partition_expression": "to_days(d)"},
                ]
            return []

    planner = MigrationPlanner(FakeMysql(spark, "mysql"))
    cat, plan = planner.plan("TGT")
    sql = plan.to_sql()
    assert 'ADD CONSTRAINT "T_PK" PRIMARY KEY ("ID")' in sql  # synthesized name
    assert 'PARTITION BY "ID";' in sql
    assert "to_days(d)) not auto-mapped" in sql
    assert "-- app.v1" in sql and "-- SELECT id FROM t" in sql


def test_runner_schema_qualifies_colliding_table_paths(spark, tmp_path):
    """Two schemas carrying the same table name must land in DISTINCT
    target paths (schema-prefixed) with a warning — not silently overwrite
    one another."""
    from database_migration_spark.catalog import Catalog, ColumnMeta, TableMeta
    from database_migration_spark.runner import MigrationRunner

    def tmeta(schema, mark):
        return TableMeta(
            schema=schema, table="t",
            columns=(ColumnMeta(schema, "t", "id", 1, "bigint"),),
        )

    class FakeAdapter:
        def read_table(self, t):
            base = 100 if t.schema == "S1" else 200
            return spark.range(base, base + 5).select(
                __import__("pyspark.sql.functions", fromlist=["col"]).col("id")
            )

    cat = Catalog(tables=[tmeta("S1", 1), tmeta("S2", 2)])
    dest = str(tmp_path / "multi")
    report = MigrationRunner(spark).execute(
        cat, FakeAdapter(), dest, validate=False
    )
    a = spark.read.parquet(f"{dest}/S1_t")
    b = spark.read.parquet(f"{dest}/S2_t")
    assert {r.id for r in a.collect()} == set(range(100, 105))
    assert {r.id for r in b.collect()} == set(range(200, 205))
    assert any("several schemas" in w for t in report.tables for w in t.warnings)
