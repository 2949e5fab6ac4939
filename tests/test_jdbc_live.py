"""Live JDBC smoke tests against embedded Derby (ships on Spark's classpath
for the Hive metastore) — a real ``spark.read.jdbc`` roundtrip through
JdbcSourceAdapter with fetchsize and predicate pushdown asserted, no network.

Embedded Derby is same-JVM only, which is exactly what local-mode Spark is;
on a real cluster the same adapter takes any networked JDBC URL.
"""

import pytest
from pyspark.sql import functions as F

from database_migration_spark.catalog import ColumnMeta, TableMeta
from database_migration_spark.plans.binpack import plan_range_split
from database_migration_spark.sources.dialects import DialectSpec
from database_migration_spark.sources.jdbc import JdbcSourceAdapter

from tests.conftest import DERBY_DRIVER, make_derby_db

DERBY = DialectSpec(name="derby", catalog_sql="-- unused in this smoke")


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    db = str(tmp_path_factory.mktemp("derby") / "smokedb")
    values = ", ".join(f"({i}, 'S{i % 3}', {i * 1.5})" for i in range(100))
    return make_derby_db(spark, db, [
        "CREATE TABLE APP.ORDERS ("
        "ID BIGINT NOT NULL, STATUS VARCHAR(10), AMOUNT DOUBLE)",
        f"INSERT INTO APP.ORDERS VALUES {values}",
    ])


def _adapter(spark, derby_url) -> JdbcSourceAdapter:
    return JdbcSourceAdapter(
        spark, DERBY, url=derby_url, properties={"driver": DERBY_DRIVER}
    )


@pytest.fixture(scope="module")
def orders_meta() -> TableMeta:
    return TableMeta(
        schema="APP",
        table="ORDERS",
        columns=(
            ColumnMeta("APP", "ORDERS", "ID", 1, "bigint", nullable=False),
            ColumnMeta("APP", "ORDERS", "STATUS", 2, "varchar(10)"),
            ColumnMeta("APP", "ORDERS", "AMOUNT", 3, "double"),
        ),
    )


def test_read_table_roundtrip_with_fetchsize(spark, derby_url, orders_meta):
    ad = _adapter(spark, derby_url)
    assert ad.properties["fetchsize"] == "100000"  # reference tuning applied
    df = ad.read_table(orders_meta)
    assert df.count() == 100
    assert [c.upper() for c in df.columns] == ["ID", "STATUS", "AMOUNT"]
    total = df.agg(F.sum("ID")).collect()[0][0]
    assert total == sum(range(100))


def test_predicate_pushdown_reaches_remote_scan(spark, derby_url, orders_meta):
    ad = _adapter(spark, derby_url)
    df = ad.read_table(orders_meta).where(F.col("ID") < 10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "LessThan(ID,10)" in plan
    assert df.count() == 10


def test_partitioned_import_plan_splits_jdbc_read(spark, derby_url, orders_meta):
    """ImportPlan predicates become per-partition remote WHERE clauses —
    the reference's parallel-connection split, Spark-native."""
    ad = _adapter(spark, derby_url)
    plan = plan_range_split("ID", 0, 100, 4)
    df = ad.read_table(orders_meta, plan)
    assert df.rdd.getNumPartitions() == len(plan.predicates)
    assert df.count() == 100  # split covers bounds + NULL bucket exactly once


def test_live_catalog_scan_from_derby_metadata(spark, derby_url):
    """A real catalog query over Derby's SYS tables through the same
    scan path the dialect specs use (columns only; Derby is a test stand-in,
    not a migration source)."""
    derby_cat = DialectSpec(
        name="derby",
        catalog_sql="""
SELECT s.SCHEMANAME AS schema_name, t.TABLENAME AS table_name,
       c.COLUMNNAME AS column_name, c.COLUMNNUMBER AS ordinal_position,
       CAST(c.COLUMNDATATYPE AS VARCHAR(128)) AS data_type,
       CAST(NULL AS INT) AS numeric_precision, CAST(NULL AS INT) AS numeric_scale,
       CAST(NULL AS INT) AS character_maximum_length,
       'YES' AS is_nullable
FROM SYS.SYSCOLUMNS c
JOIN SYS.SYSTABLES t ON t.TABLEID = c.REFERENCEID
JOIN SYS.SYSSCHEMAS s ON s.SCHEMAID = t.SCHEMAID
WHERE t.TABLETYPE = 'T'
  AND s.SCHEMANAME LIKE '{schema_filter}' AND t.TABLENAME LIKE '{table_filter}'
""",
    )
    ad = JdbcSourceAdapter(
        spark, derby_cat, url=derby_url, properties={"driver": DERBY_DRIVER}
    )
    cat = ad.scan_catalog("APP", "%")
    assert [(t.schema, t.table) for t in cat.tables] == [("APP", "ORDERS")]
    cols = cat.tables[0].column_names
    assert cols == ("ID", "STATUS", "AMOUNT")
    assert cat.tables[0].columns[0].source_type.startswith("bigint")
