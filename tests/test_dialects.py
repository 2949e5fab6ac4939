"""Dialect adapter tests: catalog SQL structure, type normalization,
transfer projections — no live DBs, so the contract is structural."""

import pytest
from pyspark.sql import types as T

from database_migration_spark.sources.dialects import ALL_DIALECTS
from database_migration_spark.sources.jdbc import JdbcSourceAdapter


REQUIRED_CATALOG_COLS = [
    "schema_name", "table_name", "column_name", "ordinal_position", "data_type",
]


@pytest.mark.parametrize("name", sorted(ALL_DIALECTS))
def test_catalog_query_shape(spark, name):
    ad = JdbcSourceAdapter(spark, name)
    sql = ad.catalog_query("MY_SCHEMA", "MY_TABLE")
    low = sql.lower()
    for col in REQUIRED_CATALOG_COLS:
        assert col in low, f"{name} catalog sql missing {col}"
    # filters interpolated, quotes escaped
    assert "my_schema" in low or "{dataset}" in sql
    assert "my_table" in low
    if "{schema_filter}" in ad.spec.catalog_sql:
        assert "''" in ad.catalog_query("O'REILLY", "%")


@pytest.mark.parametrize("name", sorted(ALL_DIALECTS))
def test_every_dialect_type_alias_maps(spark, name):
    """No-silent-drop across dialects: every alias target resolves in the
    shared typemap without an exception."""
    ad = JdbcSourceAdapter(spark, name)
    for raw in ad.spec.type_aliases:
        mt = ad.type_map(raw)
        assert mt.spark_type is not None


def test_clickhouse_wrapper_unwrap(spark):
    ad = JdbcSourceAdapter(spark, "clickhouse")
    assert ad.normalize_type("Nullable(String)") == "varchar"
    assert ad.normalize_type("LowCardinality(Nullable(String))") == "varchar"
    assert ad.type_map("Nullable(Int64)").spark_type == T.DecimalType(19, 0)
    # '' -> NULL Exasol semantics pushed source-side
    assert ad.type_map("String").transfer_expr == "nullIf({c}, '')"
    assert "isFinite" in ad.type_map("Float64").transfer_expr


def test_teradata_letter_codes(spark):
    ad = JdbcSourceAdapter(spark, "teradata")
    assert ad.type_map("CV").spark_type == T.StringType()
    assert ad.type_map("I1").spark_type == T.DecimalType(3, 0)
    assert ad.type_map("D").spark_type is not None
    assert "base64m" in ad.type_map("BV").transfer_expr


def test_oracle_number_unconstrained_goes_double(spark):
    ad = JdbcSourceAdapter(spark, "oracle")
    assert ad.type_map("NUMBER").spark_type == T.DoubleType()
    assert ad.type_map("NUMBER(10,2)").spark_type == T.DecimalType(10, 2)
    assert ad.type_map("VARCHAR2(50)").spark_type == T.StringType()
    assert "RAWTOHEX" in ad.type_map("RAW").transfer_expr


def test_sqlserver_quoting_and_types(spark):
    ad = JdbcSourceAdapter(spark, "sqlserver")
    assert ad.quote("we]ird") == "[we]]ird]"
    assert ad.type_map("money").spark_type == T.DecimalType(19, 4)
    assert ".STAsText()" in ad.type_map("geometry").transfer_expr
    assert "{database}" in ad.catalog_query()  # per-DB expansion point


def test_mysql_transfer_projection(spark):
    from database_migration_spark.catalog import ColumnMeta, TableMeta

    ad = JdbcSourceAdapter(spark, "mysql")
    t = TableMeta(
        schema="s",
        table="t",
        columns=(
            ColumnMeta("s", "t", "id", 1, "bigint unsigned"),
            ColumnMeta("s", "t", "g", 2, "geometry"),
            ColumnMeta("s", "t", "b", 3, "blob"),
        ),
    )
    sql = ad.transfer_select(t)
    assert "CAST(`id` AS CHAR)" in sql
    assert "ST_AsText(`g`)" in sql
    assert "TO_BASE64(`b`)" in sql
    assert sql.endswith("FROM `s`.`t`")


def test_catalog_from_rows_normalization(spark):
    ad = JdbcSourceAdapter(spark, "postgresql")
    rows = [
        {
            "schema_name": "public", "table_name": "t", "column_name": "a",
            "ordinal_position": 2, "data_type": "int4",
            "numeric_precision": None, "numeric_scale": None,
            "character_maximum_length": None, "is_nullable": "YES",
        },
        {
            "schema_name": "public", "table_name": "t", "column_name": "b",
            "ordinal_position": 1, "data_type": "character varying",
            "numeric_precision": None, "numeric_scale": None,
            "character_maximum_length": 20, "is_nullable": "NO",
        },
    ]
    cat = ad.catalog_from_rows(rows)
    t = cat.tables[0]
    assert t.column_names == ("b", "a")  # ordinal order restored
    assert not t.columns[0].nullable
    assert ad.type_map(t.columns[1].source_type).spark_type == T.DecimalType(10, 0)


def test_fetchsize_default_applied(spark):
    ad = JdbcSourceAdapter(spark, "mysql")
    assert ad.properties["fetchsize"] == "100000"  # README.md:70-77


# --- SQL Server per-database expansion (sqlserver_to_exasol.sql:204-217) ----


class _FakeMultiDbAdapter(JdbcSourceAdapter):
    """Stubs the JDBC fetch: returns sys.databases for the DB-list query and
    per-DB catalog rows for expanded queries (no live server)."""

    DBS = ["erp", "crm", "hr"]

    def _fetch_rows(self, sql):
        if "sys.databases" in sql:
            return [{"name": n} for n in self.DBS]
        rows = []
        for db in self.DBS:
            if f"{db}.sys.tables" not in sql:
                continue
            if "key_ordinal" in sql:  # pk query
                rows.append(
                    {"schema_name": f"{db}.dbo", "table_name": "t",
                     "constraint_name": f"pk_{db}", "column_name": "id",
                     "column_position": 1}
                )
            elif "foreign_key_columns" in sql:
                continue  # no FKs in the fake
            else:
                rows.append(
                    {"schema_name": f"{db}.dbo", "table_name": "t",
                     "column_name": "id", "ordinal_position": 1,
                     "data_type": "bigint", "numeric_precision": 19,
                     "numeric_scale": 0, "character_maximum_length": None,
                     "is_nullable": "0"}
                )
        return rows


def test_sqlserver_per_db_union_expansion(spark):
    ad = JdbcSourceAdapter(spark, "sqlserver")
    expanded = ad.expand_per_database(ad.catalog_query("%", "%"), ["db1", "db2"])
    assert expanded.count("UNION ALL") == 1
    assert "db1.sys.columns" in expanded and "db2.sys.columns" in expanded
    assert "'db1' + '.' + s.name" in expanded  # db-qualified schema identity
    assert "{database}" not in expanded


def test_sqlserver_multi_db_scan_unions_catalogs(spark):
    ad = _FakeMultiDbAdapter(spark, "sqlserver")
    assert ad.list_databases() == ["crm", "erp", "hr"]
    cat = ad.scan_catalog()
    assert [(t.schema, t.table) for t in cat.tables] == [
        ("crm.dbo", "t"), ("erp.dbo", "t"), ("hr.dbo", "t")
    ]
    # keys resolved per database, same-named tables kept distinct
    assert {t.primary_key.name for t in cat.tables} == {"pk_crm", "pk_erp", "pk_hr"}
    # composite schema quotes as [db].[schema]; plain identifiers with a
    # dot are NOT split (only the synthetic schema qualifier is composite)
    assert ad.quote_schema("erp.dbo") == "[erp].[dbo]"
    assert ad.quote("amount.usd") == "[amount.usd]"
    sql = ad.transfer_select(cat.tables[0])
    assert sql.endswith("FROM [crm].[dbo].[t]")


# --- constraint catalog queries (DialectSpec.pk_sql / fk_sql) ---------------

KEYED_DIALECTS = [
    n for n in sorted(ALL_DIALECTS) if ALL_DIALECTS[n].pk_sql is not None
]

PK_COLS = ["schema_name", "table_name", "constraint_name", "column_name", "column_position"]
FK_COLS = [
    "schema_name", "table_name", "fk_name", "fk_column",
    "ref_schema", "ref_table", "ref_column", "col_position",
]


def test_major_dialects_have_key_queries():
    # the reference migrates keys for at least these scripts
    # (mysql :113, postgresql :131, oracle :336, sqlserver :228,
    #  teradata :120, db2 :106); we extend to every source whose catalog
    #  publishes SQL-queryable constraint views. Still keyless:
    #  clickhouse/vectorwise (no PK/FK catalogs), snowflake (SHOW commands
    #  only), and redshift FKs (PG-8.0 info_schema can't pair FK columns —
    #  PKs are covered).
    for need in [
        "mysql", "mariadb", "postgresql", "oracle", "sqlserver", "teradata",
        "db2", "exasol", "redshift", "vertica", "saphana", "netezza",
        "bigquery",
    ]:
        assert need in KEYED_DIALECTS


@pytest.mark.parametrize("name", KEYED_DIALECTS)
def test_pk_fk_query_shape(spark, name):
    ad = JdbcSourceAdapter(spark, name)
    pk = ad.pk_query("MY_SCHEMA", "MY_TABLE")
    low = pk.lower()
    for col in PK_COLS:
        assert col in low, f"{name} pk sql missing {col}"
    # BigQuery scopes by {dataset} instead of a schema LIKE filter
    assert "my_schema" in low or "{dataset}" in pk
    assert "my_table" in low
    if "{schema_filter}" in (ad.spec.pk_sql or ""):
        assert "''" in ad.pk_query("O'REILLY", "%")  # quote escaping
    fk = ad.fk_query("MY_SCHEMA", "MY_TABLE")
    if fk is not None:
        flow = fk.lower()
        for col in FK_COLS:
            assert col in flow, f"{name} fk sql missing {col}"


def test_no_key_query_dialect_returns_none(spark):
    ad = JdbcSourceAdapter(spark, "clickhouse")  # ClickHouse has no PK/FK DDL
    assert ad.pk_query() is None and ad.fk_query() is None


def test_scan_catalog_attaches_keys_roundtrip(spark):
    """attach_keys over the normalized row shapes the pk_sql/fk_sql queries
    return: multi-column PK reassembled by position, FK with ref columns."""
    from database_migration_spark.catalog import attach_keys

    ad = JdbcSourceAdapter(spark, "mysql")
    cat = ad.catalog_from_rows(
        [
            {"schema_name": "s", "table_name": "t", "column_name": c,
             "ordinal_position": i + 1, "data_type": "bigint",
             "is_nullable": "YES"}
            for i, c in enumerate(["a", "b", "c"])
        ]
        + [
            {"schema_name": "s", "table_name": "ref", "column_name": "id",
             "ordinal_position": 1, "data_type": "bigint", "is_nullable": "NO"}
        ]
    )
    pk_rows = [
        {"schema_name": "s", "table_name": "t", "constraint_name": "PRIMARY",
         "column_name": "b", "column_position": 2},
        {"schema_name": "s", "table_name": "t", "constraint_name": "PRIMARY",
         "column_name": "a", "column_position": 1},
    ]
    fk_rows = [
        {"schema_name": "s", "table_name": "t", "fk_name": "t_ref_fk",
         "fk_column": "c", "ref_schema": "s", "ref_table": "ref",
         "ref_column": "id", "col_position": 1},
    ]
    cat = attach_keys(cat, pk_rows, fk_rows)
    t = next(x for x in cat.tables if x.table == "t")
    assert t.primary_key.columns == ("a", "b")  # position order, not input
    assert t.primary_key.name == "PRIMARY"
    assert t.foreign_keys[0].ref_table == "ref"
    assert t.foreign_keys[0].ref_columns == ("id",)
    assert t.non_key_columns() == ("c",)
    ref = next(x for x in cat.tables if x.table == "ref")
    assert ref.primary_key is None and ref.foreign_keys == ()


# --- Oracle connection-type detection / capability probe --------------------


def test_oracle_connection_type_from_registry():
    from database_migration_spark.sources.oracle_probe import detect_connection_type

    assert detect_connection_type("jdbc:oracle:thin:@host:1521/svc") == "JDBC"
    assert detect_connection_type("JDBC:oracle:thin:@h") == "JDBC"
    assert detect_connection_type("host:1521/svc") == "ORA"  # OCI-style address


def test_oracle_connection_type_by_probing():
    from database_migration_spark.sources.oracle_probe import detect_connection_type

    tried = []

    def probe(transport):
        tried.append(transport)
        return transport == "JDBC"  # OCI import fails, thin works

    assert detect_connection_type(None, probe) == "JDBC"
    assert tried == ["ORA", "JDBC"]  # ORA attempted first (:58-80 order)

    with pytest.raises(ValueError, match="neither"):
        detect_connection_type(None, lambda t: False)


def test_oracle_identity_capability_probe():
    from database_migration_spark.sources.oracle_probe import (
        IDENTITY_PROBE_SQL,
        has_identity_column,
        identity_select_expr,
    )

    assert "IDENTITY_COLUMN" in IDENTITY_PROBE_SQL
    assert has_identity_column(lambda sql: [("IDENTITY_COLUMN",)]) is True
    assert has_identity_column(lambda sql: []) is False  # pre-12c
    assert identity_select_expr(True) == "c.identity_column"
    assert identity_select_expr(False) == "NULL AS identity_column"


COMMENT_COLS = ["schema_name", "table_name", "sub", "column_name", "comment_text"]
COMMENTED_DIALECTS = [
    n for n in sorted(ALL_DIALECTS) if ALL_DIALECTS[n].comment_sql is not None
]


def test_major_dialects_have_comment_and_view_queries():
    for need in ["mysql", "mariadb", "postgresql", "oracle", "sqlserver", "teradata", "db2"]:
        assert ALL_DIALECTS[need].comment_sql is not None, need
        assert ALL_DIALECTS[need].view_sql is not None, need


@pytest.mark.parametrize("name", COMMENTED_DIALECTS)
def test_comment_view_query_shape(spark, name):
    ad = JdbcSourceAdapter(spark, name)
    c = ad.comment_query("MY_SCHEMA", "MY_TABLE").lower()
    for col in COMMENT_COLS:
        assert col in c, f"{name} comment sql missing {col}"
    assert "my_schema" in c and "my_table" in c
    v = ad.view_query("MY_SCHEMA", "MY_TABLE").lower()
    for col in ["schema_name", "view_name", "view_def"]:
        assert col in v, f"{name} view sql missing {col}"


def test_teradata_udt_base_resolution_in_catalog(spark):
    """Distinct UDTs (ColumnType 'UT') resolve to base codes through
    DBC.UDTCast (teradata_to_exasol.sql:115-118)."""
    ad = JdbcSourceAdapter(spark, "teradata")
    sql = ad.catalog_query()
    assert "DBC.UDTCast" in sql and "ColumnType = 'UT'" in sql
    assert "COALESCE(TRIM(b.pdt_code), TRIM(c.ColumnType))" in sql


def test_postgres_timestamptz_transfers_as_utc(spark):
    ad = JdbcSourceAdapter(spark, "postgresql")
    assert ad.type_map("timestamp with time zone").transfer_expr == (
        "({c} AT TIME ZONE 'UTC')"
    )
