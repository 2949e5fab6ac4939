"""Dialect specs: one per source system the reference migrates from.

Each spec captures, declaratively, what the corresponding reference script
encodes (SURVEY.md §2.1 maps every script):

- ``catalog_sql``: the source-side catalog query template (pushed down via
  ``spark.read.jdbc(url, "(sql) q")``) returning the normalized column-
  metadata shape: schema/table/column/ordinal/type/precision/scale/nullable.
  Reference examples: mysql_to_exasol.sql:111-115 (information_schema),
  oracle_to_exasol.sql:293-404 (ALL_TAB_COLUMNS + constraint joins),
  teradata_to_exasol.sql:118-122 (DBC.ColumnsV + UDTCast resolution),
  clickhouse_to_exasol.sql:99-107 (system.columns + engine filter).
- ``system_schemas``: hard-coded exclusions (mysql_to_exasol.sql:106,
  teradata_to_exasol.sql:108, sqlserver is_ms_shipped at :227-228, ...).
- ``type_aliases``: dialect type name → shared typemap vocabulary.
- ``transfer_overrides``: per-type source-side SELECT rewrites the shared
  map doesn't know (mysql_to_exasol.sql:186-199, db2 HEX :165-176,
  clickhouse toString :165-174, postgres ::text :221-240, ...).
- ``pk_sql`` / ``fk_sql``: the source-side constraint catalog queries
  (mysql_to_exasol.sql:113-115, postgresql_to_exasol.sql:131-145,
  oracle_to_exasol.sql:336-392, sqlserver_to_exasol.sql:228-230,
  teradata_to_exasol.sql:120-122, db2_to_exasol.sql:106-108), normalized to
  the row shapes :func:`database_migration_spark.catalog.attach_keys`
  consumes:
  pk: schema_name, table_name, constraint_name, column_name, column_position
  fk: schema_name, table_name, fk_name, fk_column, ref_schema, ref_table,
  ref_column, col_position
- ``comment_sql`` / ``view_sql``: the COMMENT ON / commented-view-review
  catalog queries (mysql_to_exasol.sql:211-229,
  postgresql_to_exasol.sql:256, oracle all_tab_comments/all_views),
  normalized to:
  comment: schema_name, table_name, sub (0=table, >0=column ordinal),
  column_name (NULL for table comments), comment_text
  view: schema_name, view_name, view_def
- ``quote_char``: identifier quoting style.

The specs are *data*; :class:`JdbcSourceAdapter` in jdbc.py interprets them.
These queries were written fresh from each system's documented catalog
views; the reference scripts define WHAT must be selected, not the text.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class DialectSpec:
    name: str
    catalog_sql: str  # templated with {schema_filter} / {table_filter}
    system_schemas: frozenset[str] = frozenset()
    type_aliases: dict[str, str] = field(default_factory=dict)
    transfer_overrides: dict[str, str] = field(default_factory=dict)
    quote_char: str = '"'
    # reference-recommended JDBC tuning (README.md:70-77)
    fetchsize: int = 100_000
    # constraint catalog queries (None = dialect script doesn't migrate keys)
    pk_sql: str | None = None
    fk_sql: str | None = None
    # COMMENT ON / view-review catalog queries (None = not migrated)
    comment_sql: str | None = None
    view_sql: str | None = None
    # distribution / partitioning catalog queries:
    # dist: schema_name, table_name, column_name, column_position
    #   (teradata_to_exasol.sql:251 Primary Index → DISTRIBUTE BY)
    # partition: schema_name, table_name, partition_method,
    #   partition_expression (mysql_to_exasol.sql:228-243 best-effort
    #   single-column key; complex expressions become review notes)
    dist_sql: str | None = None
    partition_sql: str | None = None


_INFO_SCHEMA_SQL = """
SELECT table_schema AS schema_name, table_name, column_name,
       ordinal_position, data_type, numeric_precision, numeric_scale,
       character_maximum_length, is_nullable
FROM information_schema.columns
WHERE table_schema NOT IN ({excl})
  AND table_schema LIKE '{schema_filter}' AND table_name LIKE '{table_filter}'
"""


def _info_schema(excl: frozenset[str]) -> str:
    quoted = ", ".join(f"'{s}'" for s in sorted(excl))
    return _INFO_SCHEMA_SQL.replace("{excl}", quoted)


MYSQL = DialectSpec(
    name="mysql",
    catalog_sql=_info_schema(
        frozenset({"mysql", "information_schema", "performance_schema", "sys"})
    ),
    system_schemas=frozenset({"mysql", "information_schema", "performance_schema", "sys"}),
    type_aliases={"mediumint": "mediumint", "year": "year", "json": "json"},
    transfer_overrides={
        # mysql_to_exasol.sql:186-199
        "bigint unsigned": "CAST({c} AS CHAR)",
        "geometry": "ST_AsText({c})",
        "blob": "TO_BASE64({c})",
        "varbinary": "TO_BASE64({c})",
        "bit": "CAST({c} AS UNSIGNED)",
    },
    quote_char="`",
    # mysql_to_exasol.sql:113-115: key_column_usage; every MySQL PK is
    # literally named 'PRIMARY' — NOT unique across tables — so no name is
    # emitted and attach_keys synthesizes {TABLE}_PK like the reference
    # (mysql_to_exasol.sql:335)
    pk_sql="""
SELECT table_schema AS schema_name, table_name,
       CAST(NULL AS CHAR) AS constraint_name, column_name,
       ordinal_position AS column_position
FROM information_schema.key_column_usage
WHERE constraint_name = 'PRIMARY'
  AND table_schema LIKE '{schema_filter}' AND table_name LIKE '{table_filter}'
""",
    fk_sql="""
SELECT table_schema AS schema_name, table_name,
       constraint_name AS fk_name, column_name AS fk_column,
       referenced_table_schema AS ref_schema,
       referenced_table_name AS ref_table,
       referenced_column_name AS ref_column,
       ordinal_position AS col_position
FROM information_schema.key_column_usage
WHERE referenced_table_name IS NOT NULL
  AND table_schema LIKE '{schema_filter}' AND table_name LIKE '{table_filter}'
""",
    # mysql_to_exasol.sql:214: table comments from information_schema.tables,
    # column comments from .columns, empty strings dropped
    comment_sql="""
SELECT table_schema AS schema_name, table_name, 0 AS sub,
       CAST(NULL AS CHAR) AS column_name, table_comment AS comment_text
FROM information_schema.tables
WHERE table_type = 'BASE TABLE' AND table_comment <> ''
  AND table_schema LIKE '{schema_filter}' AND table_name LIKE '{table_filter}'
UNION ALL
SELECT table_schema, table_name, ordinal_position, column_name, column_comment
FROM information_schema.columns
WHERE column_comment <> ''
  AND table_schema LIKE '{schema_filter}' AND table_name LIKE '{table_filter}'
""",
    # mysql_to_exasol.sql:225-229: source views emitted as a commented
    # manual-review section
    view_sql="""
SELECT table_schema AS schema_name, table_name AS view_name,
       view_definition AS view_def
FROM information_schema.views
WHERE table_schema LIKE '{schema_filter}' AND table_name LIKE '{table_filter}'
""",
    # mysql_to_exasol.sql:236-243
    partition_sql="""
SELECT DISTINCT table_schema AS schema_name, table_name,
       partition_method, partition_expression
FROM information_schema.partitions
WHERE partition_name IS NOT NULL
  AND table_schema LIKE '{schema_filter}' AND table_name LIKE '{table_filter}'
""",
)

MARIADB = DialectSpec(
    name="mariadb",
    catalog_sql=MYSQL.catalog_sql,
    system_schemas=MYSQL.system_schemas,
    type_aliases=dict(MYSQL.type_aliases),
    transfer_overrides=dict(MYSQL.transfer_overrides),
    quote_char="`",
    pk_sql=MYSQL.pk_sql,
    fk_sql=MYSQL.fk_sql,
    comment_sql=MYSQL.comment_sql,
    view_sql=MYSQL.view_sql,
    partition_sql=MYSQL.partition_sql,
)

POSTGRESQL = DialectSpec(
    name="postgresql",
    # postgresql_to_exasol.sql:106-145: information_schema + extension
    # exclusion via pg_depend deptype 'e' (:97,128-129); domains resolved
    # recursively source-side — we surface domain_name for the adapter
    catalog_sql="""
SELECT c.table_schema AS schema_name, c.table_name, c.column_name,
       c.ordinal_position, COALESCE(c.domain_name, c.data_type) AS data_type,
       c.numeric_precision, c.numeric_scale,
       c.character_maximum_length, c.is_nullable
FROM information_schema.columns c
WHERE c.table_schema NOT IN ('pg_catalog', 'information_schema')
  AND c.table_schema LIKE '{schema_filter}' AND c.table_name LIKE '{table_filter}'
  AND NOT EXISTS (
    SELECT 1 FROM pg_depend d
    JOIN pg_class cl ON cl.oid = d.objid
    JOIN pg_namespace n ON n.oid = cl.relnamespace
    WHERE d.deptype = 'e' AND cl.relname = c.table_name
      AND n.nspname = c.table_schema)
""",
    system_schemas=frozenset({"pg_catalog", "information_schema"}),
    type_aliases={
        "character varying": "varchar", "character": "char", "int4": "int",
        "int8": "bigint", "int2": "smallint", "float4": "real",
        "float8": "double", "timestamp without time zone": "datetime",
        "timestamp with time zone": "timestamp", "bytea": "bytea",
        "user-defined": "varchar", "array": "array",
    },
    transfer_overrides={
        # postgresql_to_exasol.sql:207-240; :210-218 timestamptz normalized
        # to UTC source-side so the transfer is session-zone independent
        "bytea": "encode({c}, 'base64')",
        "array": "CAST({c} AS TEXT)",
        "user-defined": "CAST({c} AS TEXT)",
        "interval": "CAST({c} AS TEXT)",
        "timestamp with time zone": "({c} AT TIME ZONE 'UTC')",
    },
    # postgresql_to_exasol.sql:131-145: pg_constraint conkey/confkey arrays
    # exploded with unnest WITH ORDINALITY so multi-column keys keep order
    pk_sql="""
SELECT n.nspname AS schema_name, c.relname AS table_name,
       con.conname AS constraint_name, att.attname AS column_name,
       k.ord AS column_position
FROM pg_constraint con
JOIN pg_class c ON c.oid = con.conrelid
JOIN pg_namespace n ON n.oid = c.relnamespace
JOIN unnest(con.conkey) WITH ORDINALITY k(attnum, ord) ON true
JOIN pg_attribute att ON att.attrelid = con.conrelid AND att.attnum = k.attnum
WHERE con.contype = 'p' AND NOT c.relispartition
  AND n.nspname NOT IN ('pg_catalog', 'information_schema')
  AND n.nspname LIKE '{schema_filter}' AND c.relname LIKE '{table_filter}'
""",
    fk_sql="""
SELECT n.nspname AS schema_name, c.relname AS table_name,
       con.conname AS fk_name, ca.attname AS fk_column,
       fn.nspname AS ref_schema, fc.relname AS ref_table,
       fa.attname AS ref_column, k.ord AS col_position
FROM pg_constraint con
JOIN pg_class c ON c.oid = con.conrelid
JOIN pg_namespace n ON n.oid = c.relnamespace
JOIN pg_class fc ON fc.oid = con.confrelid
JOIN pg_namespace fn ON fn.oid = fc.relnamespace
JOIN unnest(con.conkey) WITH ORDINALITY k(attnum, ord) ON true
JOIN pg_attribute ca ON ca.attrelid = con.conrelid AND ca.attnum = k.attnum
JOIN unnest(con.confkey) WITH ORDINALITY fk(attnum, ord) ON fk.ord = k.ord
JOIN pg_attribute fa ON fa.attrelid = con.confrelid AND fa.attnum = fk.attnum
WHERE con.contype = 'f' AND NOT c.relispartition
  AND n.nspname LIKE '{schema_filter}' AND c.relname LIKE '{table_filter}'
  AND n.nspname NOT IN ('pg_catalog', 'information_schema')
""",
    # postgresql_to_exasol.sql:256: pg_description with objsubid 0 = table
    # comment, >0 = the column's attnum
    comment_sql="""
SELECT n.nspname AS schema_name, c.relname AS table_name,
       d.objsubid AS sub, a.attname AS column_name,
       d.description AS comment_text
FROM pg_description d
JOIN pg_class c ON c.oid = d.objoid
JOIN pg_namespace n ON n.oid = c.relnamespace
LEFT JOIN pg_attribute a ON a.attrelid = d.objoid AND a.attnum = d.objsubid
WHERE c.relkind IN ('r', 'p') AND NOT c.relispartition
  AND n.nspname NOT IN ('pg_catalog', 'information_schema')
  AND n.nspname LIKE '{schema_filter}' AND c.relname LIKE '{table_filter}'
""",
    view_sql="""
SELECT table_schema AS schema_name, table_name AS view_name,
       view_definition AS view_def
FROM information_schema.views
WHERE table_schema NOT IN ('pg_catalog', 'information_schema')
  AND table_schema LIKE '{schema_filter}' AND table_name LIKE '{table_filter}'
""",
)

REDSHIFT = DialectSpec(
    name="redshift",
    # redshift_to_exasol.sql:25-32
    catalog_sql=_info_schema(frozenset({"pg_catalog", "information_schema"})),
    system_schemas=frozenset({"pg_catalog", "information_schema"}),
    type_aliases=dict(POSTGRESQL.type_aliases),
    # Redshift keys are informational (not enforced) but still drive the
    # target's constraint metadata; standard information_schema shapes.
    pk_sql="""
SELECT tc.table_schema AS schema_name, tc.table_name,
       tc.constraint_name, kcu.column_name,
       kcu.ordinal_position AS column_position
FROM information_schema.table_constraints tc
JOIN information_schema.key_column_usage kcu
  ON kcu.constraint_name = tc.constraint_name
 AND kcu.table_schema = tc.table_schema AND kcu.table_name = tc.table_name
WHERE tc.constraint_type = 'PRIMARY KEY'
  AND tc.table_schema NOT IN ('pg_catalog', 'information_schema')
  AND tc.table_schema LIKE '{schema_filter}' AND tc.table_name LIKE '{table_filter}'
""",
    # No fk_sql: Redshift's information_schema is PostgreSQL-8.0-based —
    # key_column_usage has no position_in_unique_constraint (added in PG
    # 8.4) and Redshift SQL has no unnest() to explode pg_constraint
    # arrays, so multi-column FK column pairing is not expressible; FKs
    # there are informational only and stay unmigrated (like the reference,
    # whose redshift script fetches no keys at all).
)

ORACLE = DialectSpec(
    name="oracle",
    # oracle_to_exasol.sql:293-404: ALL_TAB_COLUMNS; DATA_PRECISION null on
    # unconstrained NUMBER (→ DOUBLE, :446-447); identity probe optional
    catalog_sql="""
SELECT c.owner AS schema_name, c.table_name, c.column_name,
       c.column_id AS ordinal_position, c.data_type,
       c.data_precision AS numeric_precision, c.data_scale AS numeric_scale,
       c.char_length AS character_maximum_length, c.nullable AS is_nullable
FROM all_tab_columns c
WHERE c.owner NOT IN ('SYS','SYSTEM','MDSYS','CTXSYS','XDB','OUTLN','DBSNMP')
  AND c.owner LIKE '{schema_filter}' AND c.table_name LIKE '{table_filter}'
""",
    system_schemas=frozenset({"SYS", "SYSTEM", "MDSYS", "CTXSYS", "XDB", "OUTLN", "DBSNMP"}),
    type_aliases={
        "varchar2": "varchar", "nvarchar2": "varchar", "number": "number",
        "binary_double": "double", "binary_float": "real", "long": "text",
        "long raw": "blob", "raw": "binary", "clob": "clob", "nclob": "clob",
    },
    transfer_overrides={
        # oracle_to_exasol.sql:531 rawtohex; intervals/xml to text
        "raw": "RAWTOHEX({c})",
        "long raw": "RAWTOHEX({c})",
        "xmltype": "XMLSERIALIZE(CONTENT {c} AS CLOB)",
        "sdo_geometry": "SDO_UTIL.TO_WKTGEOMETRY({c})",
    },
    # oracle_to_exasol.sql:336-365: all_cons_columns ⋈ all_constraints
    # (constraint_type 'P'); :362-392 the 3-way self-join through
    # r_constraint_name matching child/parent columns by position
    pk_sql="""
SELECT acc.owner AS schema_name, acc.table_name,
       acc.constraint_name, acc.column_name,
       acc.position AS column_position
FROM all_cons_columns acc
JOIN all_constraints ac
  ON acc.owner = ac.owner AND acc.table_name = ac.table_name
 AND acc.constraint_name = ac.constraint_name
WHERE ac.constraint_type = 'P'
  AND acc.owner NOT IN ('SYS','SYSTEM','MDSYS','CTXSYS','XDB','OUTLN','DBSNMP')
  AND acc.owner LIKE '{schema_filter}' AND acc.table_name LIKE '{table_filter}'
""",
    fk_sql="""
SELECT acc.owner AS schema_name, acc.table_name,
       acc.constraint_name AS fk_name, acc.column_name AS fk_column,
       acc_r.owner AS ref_schema, acc_r.table_name AS ref_table,
       acc_r.column_name AS ref_column, acc.position AS col_position
FROM all_cons_columns acc
JOIN all_constraints ac
  ON acc.owner = ac.owner AND acc.table_name = ac.table_name
 AND acc.constraint_name = ac.constraint_name
JOIN all_cons_columns acc_r
  ON ac.r_owner = acc_r.owner AND ac.r_constraint_name = acc_r.constraint_name
 AND acc.position = acc_r.position
WHERE ac.constraint_type = 'R'
  AND acc.owner NOT IN ('SYS','SYSTEM','MDSYS','CTXSYS','XDB','OUTLN','DBSNMP')
  AND acc.owner LIKE '{schema_filter}' AND acc.table_name LIKE '{table_filter}'
""",
    # all_tab_comments / all_col_comments (ordinal resolved via
    # all_tab_columns so the normalized `sub` contract holds)
    comment_sql="""
SELECT tc.owner AS schema_name, tc.table_name, 0 AS sub,
       CAST(NULL AS VARCHAR2(128)) AS column_name, tc.comments AS comment_text
FROM all_tab_comments tc
WHERE tc.comments IS NOT NULL AND tc.table_type = 'TABLE'
  AND tc.owner NOT IN ('SYS','SYSTEM','MDSYS','CTXSYS','XDB','OUTLN','DBSNMP')
  AND tc.owner LIKE '{schema_filter}' AND tc.table_name LIKE '{table_filter}'
UNION ALL
SELECT cc.owner, cc.table_name, col.column_id, cc.column_name, cc.comments
FROM all_col_comments cc
JOIN all_tab_columns col
  ON col.owner = cc.owner AND col.table_name = cc.table_name
 AND col.column_name = cc.column_name
WHERE cc.comments IS NOT NULL
  AND cc.owner NOT IN ('SYS','SYSTEM','MDSYS','CTXSYS','XDB','OUTLN','DBSNMP')
  AND cc.owner LIKE '{schema_filter}' AND cc.table_name LIKE '{table_filter}'
""",
    # oracle_to_exasol.sql:312 all_views
    view_sql="""
SELECT v.owner AS schema_name, v.view_name, v.text AS view_def
FROM all_views v
WHERE v.owner NOT IN ('SYS','SYSTEM','MDSYS','CTXSYS','XDB','OUTLN','DBSNMP')
  AND v.owner LIKE '{schema_filter}' AND v.view_name LIKE '{table_filter}'
""",
)

SQLSERVER = DialectSpec(
    name="sqlserver",
    # sqlserver_to_exasol.sql:212-242: per-database union; is_ms_shipped /
    # is_external exclusion (:227-228). {database} expands per DB
    # (JdbcSourceAdapter.expand_per_database); schema_name carries the
    # database qualifier (db.schema) because sys.* catalogs are per-DB and
    # same-named schemas in different DBs are distinct objects (the
    # reference's DB2SCHEMA mapping, :195-201).
    catalog_sql="""
SELECT '{database}' + '.' + s.name AS schema_name, t.name AS table_name, c.name AS column_name,
       c.column_id AS ordinal_position, ty.name AS data_type,
       c.precision AS numeric_precision, c.scale AS numeric_scale,
       c.max_length AS character_maximum_length,
       c.is_nullable AS is_nullable
FROM {database}.sys.columns c
JOIN {database}.sys.tables t ON t.object_id = c.object_id
JOIN {database}.sys.schemas s ON s.schema_id = t.schema_id
JOIN {database}.sys.types ty ON ty.user_type_id = c.user_type_id
WHERE t.is_ms_shipped = 0
  AND s.name LIKE '{schema_filter}' AND t.name LIKE '{table_filter}'
""",
    system_schemas=frozenset({"sys", "INFORMATION_SCHEMA"}),
    type_aliases={
        "nvarchar": "varchar", "nchar": "char", "ntext": "text",
        "datetime2": "datetime2", "datetimeoffset": "datetimeoffset",
        "uniqueidentifier": "uuid", "rowversion": "rowversion",
        "hierarchyid": "hierarchyid", "sql_variant": "sql_variant",
        "image": "blob", "money": "money", "smallmoney": "smallmoney",
    },
    transfer_overrides={
        # sqlserver_to_exasol.sql:337-357
        "geometry": "{c}.STAsText()",
        "geography": "{c}.STAsText()",
        "hierarchyid": "{c}.ToString()",
        "varbinary": "CONVERT(VARCHAR(MAX), {c}, 2)",
        "image": "CONVERT(VARCHAR(MAX), CONVERT(VARBINARY(MAX), {c}), 2)",
        "xml": "CAST({c} AS NVARCHAR(MAX))",
    },
    quote_char="[",
    # sqlserver_to_exasol.sql:228: PK via sys.key_constraints ⋈ sys.indexes
    # ⋈ sys.index_columns (type 'PK'); :230 FK via sys.foreign_keys ⋈
    # sys.foreign_key_columns with parent/referenced column resolution
    pk_sql="""
SELECT '{database}' + '.' + s.name AS schema_name, t.name AS table_name,
       kc.name AS constraint_name, c.name AS column_name,
       ic.key_ordinal AS column_position
FROM {database}.sys.key_constraints kc
JOIN {database}.sys.tables t ON t.object_id = kc.parent_object_id
JOIN {database}.sys.schemas s ON s.schema_id = t.schema_id
JOIN {database}.sys.indexes i
  ON i.object_id = kc.parent_object_id AND i.index_id = kc.unique_index_id
JOIN {database}.sys.index_columns ic
  ON ic.object_id = kc.parent_object_id AND ic.index_id = kc.unique_index_id
JOIN {database}.sys.columns c
  ON c.object_id = ic.object_id AND c.column_id = ic.column_id
WHERE kc.type = 'PK' AND t.is_ms_shipped = 0
  AND s.name LIKE '{schema_filter}' AND t.name LIKE '{table_filter}'
""",
    fk_sql="""
SELECT '{database}' + '.' + sp.name AS schema_name, tp.name AS table_name,
       fk.name AS fk_name, cp.name AS fk_column,
       '{database}' + '.' + sr.name AS ref_schema, tr.name AS ref_table, cr.name AS ref_column,
       fkc.constraint_column_id AS col_position
FROM {database}.sys.foreign_keys fk
JOIN {database}.sys.foreign_key_columns fkc
  ON fkc.constraint_object_id = fk.object_id
JOIN {database}.sys.tables tp ON fk.parent_object_id = tp.object_id
JOIN {database}.sys.schemas sp ON tp.schema_id = sp.schema_id
JOIN {database}.sys.columns cp
  ON cp.object_id = tp.object_id AND cp.column_id = fkc.parent_column_id
JOIN {database}.sys.tables tr ON fk.referenced_object_id = tr.object_id
JOIN {database}.sys.schemas sr ON tr.schema_id = sr.schema_id
JOIN {database}.sys.columns cr
  ON cr.object_id = tr.object_id AND cr.column_id = fkc.referenced_column_id
WHERE tp.is_ms_shipped = 0
  AND sp.name LIKE '{schema_filter}' AND tp.name LIKE '{table_filter}'
""",
    # MS_Description extended properties: class 1 / minor_id 0 = table,
    # minor_id = column_id for columns
    comment_sql="""
SELECT '{database}' + '.' + s.name AS schema_name, t.name AS table_name,
       0 AS sub, CAST(NULL AS NVARCHAR(128)) AS column_name,
       CAST(ep.value AS NVARCHAR(MAX)) AS comment_text
FROM {database}.sys.extended_properties ep
JOIN {database}.sys.tables t ON t.object_id = ep.major_id
JOIN {database}.sys.schemas s ON s.schema_id = t.schema_id
WHERE ep.class = 1 AND ep.minor_id = 0 AND ep.name = 'MS_Description'
  AND t.is_ms_shipped = 0
  AND s.name LIKE '{schema_filter}' AND t.name LIKE '{table_filter}'
UNION ALL
SELECT '{database}' + '.' + s.name, t.name, c.column_id, c.name,
       CAST(ep.value AS NVARCHAR(MAX))
FROM {database}.sys.extended_properties ep
JOIN {database}.sys.tables t ON t.object_id = ep.major_id
JOIN {database}.sys.schemas s ON s.schema_id = t.schema_id
JOIN {database}.sys.columns c
  ON c.object_id = ep.major_id AND c.column_id = ep.minor_id
WHERE ep.class = 1 AND ep.minor_id > 0 AND ep.name = 'MS_Description'
  AND t.is_ms_shipped = 0
  AND s.name LIKE '{schema_filter}' AND t.name LIKE '{table_filter}'
""",
    view_sql="""
SELECT '{database}' + '.' + s.name AS schema_name, v.name AS view_name,
       m.definition AS view_def
FROM {database}.sys.views v
JOIN {database}.sys.schemas s ON s.schema_id = v.schema_id
JOIN {database}.sys.sql_modules m ON m.object_id = v.object_id
WHERE v.is_ms_shipped = 0
  AND s.name LIKE '{schema_filter}' AND v.name LIKE '{table_filter}'
""",
)

TERADATA = DialectSpec(
    name="teradata",
    # teradata_to_exasol.sql:115-118: DBC.ColumnsV single-letter type codes;
    # distinct UDTs (ColumnType 'UT') resolve to their base type through
    # DBC.UDTInfoV ⋈ DBC.UDTCast (PDTCode carries the base code and
    # precision/scale/length), since a distinct UDT cannot be read raw
    catalog_sql="""
SELECT TRIM(c.DatabaseName) AS schema_name, TRIM(c.TableName) AS table_name,
       c.ColumnName AS column_name, c.ColumnId AS ordinal_position,
       COALESCE(TRIM(b.pdt_code), TRIM(c.ColumnType)) AS data_type,
       COALESCE(b.pdt_prec, c.DecimalTotalDigits) AS numeric_precision,
       COALESCE(b.pdt_scale, c.DecimalFractionalDigits) AS numeric_scale,
       COALESCE(b.pdt_len, c.ColumnLength) AS character_maximum_length,
       c.Nullable AS is_nullable
FROM DBC.ColumnsV c
LEFT JOIN (
  SELECT i.TypeName AS udtname, TRIM(ca.PDTCode) AS pdt_code,
         ca.PDTTotalDigits AS pdt_prec, ca.PDTImpliedPoint AS pdt_scale,
         ca.PDTMaxLength AS pdt_len
  FROM DBC.UDTInfoV i
  JOIN DBC.UDTCast ca ON ca.PrimaryUDTypeId = i.TypeId
  WHERE i.TypeKind = 'D' AND ca.IsSourcePrimary = 'Y'
) b ON b.udtname = c.ColumnUDTName AND c.ColumnType = 'UT'
WHERE c.DatabaseName NOT IN ('DBC','SYSLIB','SystemFe','TD_SYSFNLIB','dbcmngr')
  AND c.DatabaseName LIKE '{schema_filter}' AND c.TableName LIKE '{table_filter}'
""",
    system_schemas=frozenset({"DBC", "SYSLIB", "SystemFe", "TD_SYSFNLIB", "dbcmngr"}),
    type_aliases={
        # DBC.ColumnsV single/double letter codes
        "cv": "varchar", "cf": "char", "i": "int", "i1": "tinyint",
        "i2": "smallint", "i8": "bigint", "d": "decimal", "f": "double",
        "da": "date", "ts": "datetime", "sz": "timestamp", "at": "time",
        "bo": "blob", "bf": "binary", "bv": "varbinary", "co": "clob",
        "pd": "period", "pt": "period", "pz": "period", "pm": "period",
        "dy": "interval day", "ym": "interval year",
    },
    transfer_overrides={
        # teradata_to_exasol.sql:205,214-226: base64 binary; PERIOD split
        "bv": "FROM_BYTES({c}, 'base64m')",
        "bf": "FROM_BYTES({c}, 'base64m')",
        "pd": "CAST(BEGIN({c}) AS VARCHAR(64)), CAST(END({c}) AS VARCHAR(64))",
    },
    # teradata_to_exasol.sql:120: unique primary index (UniqueFlag Y, type K);
    # :122 DBC.All_RI_ChildrenV (no ordinal column — attach_keys keeps the
    # row order the view returns)
    pk_sql="""
SELECT TRIM(i.DatabaseName) AS schema_name, TRIM(i.TableName) AS table_name,
       TRIM(i.IndexName) AS constraint_name, i.ColumnName AS column_name,
       i.ColumnPosition AS column_position
FROM DBC.IndicesV i
WHERE i.UniqueFlag = 'Y' AND i.IndexType = 'K'
  AND i.DatabaseName NOT IN ('DBC','SYSLIB','SystemFe','TD_SYSFNLIB','dbcmngr')
  AND i.DatabaseName LIKE '{schema_filter}' AND i.TableName LIKE '{table_filter}'
""",
    fk_sql="""
SELECT TRIM(ChildDB) AS schema_name, TRIM(ChildTable) AS table_name,
       TRIM(IndexName) AS fk_name, TRIM(ChildKeyColumn) AS fk_column,
       TRIM(ParentDB) AS ref_schema, TRIM(ParentTable) AS ref_table,
       TRIM(ParentKeyColumn) AS ref_column, 0 AS col_position
FROM DBC.All_RI_ChildrenV
WHERE ChildDB NOT IN ('DBC','SYSLIB','SystemFe','TD_SYSFNLIB','dbcmngr')
  AND ChildDB LIKE '{schema_filter}' AND ChildTable LIKE '{table_filter}'
""",
    # DBC CommentString columns; TableKind T = tables, V = views
    comment_sql="""
SELECT TRIM(t.DatabaseName) AS schema_name, TRIM(t.TableName) AS table_name,
       0 AS sub, CAST(NULL AS VARCHAR(128)) AS column_name,
       t.CommentString AS comment_text
FROM DBC.TablesV t
WHERE t.TableKind = 'T' AND t.CommentString IS NOT NULL
  AND t.DatabaseName NOT IN ('DBC','SYSLIB','SystemFe','TD_SYSFNLIB','dbcmngr')
  AND t.DatabaseName LIKE '{schema_filter}' AND t.TableName LIKE '{table_filter}'
UNION ALL
SELECT TRIM(c.DatabaseName), TRIM(c.TableName), c.ColumnId,
       TRIM(c.ColumnName), c.CommentString
FROM DBC.ColumnsV c
WHERE c.CommentString IS NOT NULL
  AND c.DatabaseName NOT IN ('DBC','SYSLIB','SystemFe','TD_SYSFNLIB','dbcmngr')
  AND c.DatabaseName LIKE '{schema_filter}' AND c.TableName LIKE '{table_filter}'
""",
    view_sql="""
SELECT TRIM(t.DatabaseName) AS schema_name, TRIM(t.TableName) AS view_name,
       t.RequestText AS view_def
FROM DBC.TablesV t
WHERE t.TableKind = 'V'
  AND t.DatabaseName NOT IN ('DBC','SYSLIB','SystemFe','TD_SYSFNLIB','dbcmngr')
  AND t.DatabaseName LIKE '{schema_filter}' AND t.TableName LIKE '{table_filter}'
""",
    # teradata_to_exasol.sql:251: the Primary Index (types P/Q) maps to the
    # target's DISTRIBUTE BY — the same row-placement role on both systems
    dist_sql="""
SELECT TRIM(i.DatabaseName) AS schema_name, TRIM(i.TableName) AS table_name,
       TRIM(i.ColumnName) AS column_name, i.ColumnPosition AS column_position
FROM DBC.IndicesV i
WHERE i.IndexType IN ('P', 'Q')
  AND i.DatabaseName NOT IN ('DBC','SYSLIB','SystemFe','TD_SYSFNLIB','dbcmngr')
  AND i.DatabaseName LIKE '{schema_filter}' AND i.TableName LIKE '{table_filter}'
""",
)

CLICKHOUSE = DialectSpec(
    name="clickhouse",
    # clickhouse_to_exasol.sql:99-107: system.columns + table-engine filter
    catalog_sql="""
SELECT c.database AS schema_name, c.table AS table_name, c.name AS column_name,
       c.position AS ordinal_position, c.type AS data_type,
       NULL AS numeric_precision, NULL AS numeric_scale,
       NULL AS character_maximum_length, 1 AS is_nullable
FROM system.columns c
JOIN system.tables t ON t.database = c.database AND t.name = c.table
WHERE c.database NOT IN ('system', 'information_schema', 'INFORMATION_SCHEMA')
  AND t.engine IN ('MergeTree','ReplacingMergeTree','SummingMergeTree',
                   'AggregatingMergeTree','CollapsingMergeTree',
                   'VersionedCollapsingMergeTree','ReplicatedMergeTree',
                   'Distributed','Log','TinyLog','StripeLog','Memory')
  AND c.database LIKE '{schema_filter}' AND c.table LIKE '{table_filter}'
""",
    system_schemas=frozenset({"system", "information_schema", "INFORMATION_SCHEMA"}),
    type_aliases={
        "string": "varchar", "fixedstring": "char", "uint8": "smallint",
        "uint16": "int", "uint32": "bigint", "uint64": "decimal(20,0)",
        "int8": "tinyint", "int16": "smallint", "int32": "int",
        "int64": "bigint", "float32": "real", "float64": "double",
        "datetime": "timestamp", "datetime64": "datetime64",
        "uuid": "uuid", "ipv4": "inet", "ipv6": "inet",
    },
    transfer_overrides={
        # clickhouse_to_exasol.sql:165-174: '' -> NULL (Exasol semantics),
        # non-finite floats -> NULL, complex types via toString
        "string": "nullIf({c}, '')",
        "float32": "if(isFinite({c}), {c}, NULL)",
        "float64": "if(isFinite({c}), {c}, NULL)",
        "array": "toString({c})",
        "tuple": "toString({c})",
        "map": "toString({c})",
        "nested": "toString({c})",
    },
    quote_char="`",
)

DB2 = DialectSpec(
    name="db2",
    # db2_to_exasol.sql:100-112: SYSCAT.COLUMNS with UDT base resolution
    catalog_sql="""
SELECT c.TABSCHEMA AS schema_name, c.TABNAME AS table_name,
       c.COLNAME AS column_name, c.COLNO AS ordinal_position,
       COALESCE(d.SOURCENAME, c.TYPENAME) AS data_type,
       c.LENGTH AS numeric_precision, c.SCALE AS numeric_scale,
       c.LENGTH AS character_maximum_length, c.NULLS AS is_nullable
FROM SYSCAT.COLUMNS c
LEFT JOIN SYSCAT.DATATYPES d
  ON d.TYPESCHEMA = c.TYPESCHEMA AND d.TYPENAME = c.TYPENAME
     AND d.METATYPE = 'T'
WHERE c.TABSCHEMA NOT LIKE 'SYS%'
  AND c.TABSCHEMA LIKE '{schema_filter}' AND c.TABNAME LIKE '{table_filter}'
""",
    system_schemas=frozenset({"SYSIBM", "SYSCAT", "SYSSTAT", "SYSTOOLS"}),
    type_aliases={
        "character": "char", "decfloat": "decfloat", "graphic": "char",
        "vargraphic": "varchar", "dbclob": "clob", "xml": "xml",
    },
    transfer_overrides={
        # db2_to_exasol.sql:159-176: HEX for binary (16336-byte cap), XML text
        "blob": "HEX({c})",
        "varbinary": "HEX({c})",
        "binary": "HEX({c})",
        "xml": "XMLSERIALIZE({c} AS CLOB)",
    },
    # db2_to_exasol.sql:106-108: SYSCAT.KEYCOLUSE ⋈ SYSCAT.TABCONST type 'P';
    # FK through SYSCAT.REFERENCES matching child/parent key column sequence
    pk_sql="""
SELECT RTRIM(k.TABSCHEMA) AS schema_name, k.TABNAME AS table_name,
       k.CONSTNAME AS constraint_name, k.COLNAME AS column_name,
       k.COLSEQ AS column_position
FROM SYSCAT.KEYCOLUSE k
JOIN SYSCAT.TABCONST t
  ON t.CONSTNAME = k.CONSTNAME AND t.TABSCHEMA = k.TABSCHEMA
 AND t.TABNAME = k.TABNAME
WHERE t.TYPE = 'P' AND k.TABSCHEMA NOT LIKE 'SYS%'
  AND k.TABSCHEMA LIKE '{schema_filter}' AND k.TABNAME LIKE '{table_filter}'
""",
    fk_sql="""
SELECT RTRIM(r.TABSCHEMA) AS schema_name, r.TABNAME AS table_name,
       r.CONSTNAME AS fk_name, kf.COLNAME AS fk_column,
       RTRIM(r.REFTABSCHEMA) AS ref_schema, r.REFTABNAME AS ref_table,
       kp.COLNAME AS ref_column, kf.COLSEQ AS col_position
FROM SYSCAT.REFERENCES r
JOIN SYSCAT.KEYCOLUSE kf
  ON kf.CONSTNAME = r.CONSTNAME AND kf.TABSCHEMA = r.TABSCHEMA
 AND kf.TABNAME = r.TABNAME
JOIN SYSCAT.KEYCOLUSE kp
  ON kp.CONSTNAME = r.REFKEYNAME AND kp.TABSCHEMA = r.REFTABSCHEMA
 AND kp.TABNAME = r.REFTABNAME AND kp.COLSEQ = kf.COLSEQ
WHERE r.TABSCHEMA NOT LIKE 'SYS%'
  AND r.TABSCHEMA LIKE '{schema_filter}' AND r.TABNAME LIKE '{table_filter}'
""",
    # SYSCAT REMARKS columns; COLNO is 0-based → +1 for the 1-based contract
    comment_sql="""
SELECT RTRIM(t.TABSCHEMA) AS schema_name, t.TABNAME AS table_name,
       0 AS sub, CAST(NULL AS VARCHAR(128)) AS column_name,
       t.REMARKS AS comment_text
FROM SYSCAT.TABLES t
WHERE t.TYPE = 'T' AND t.REMARKS IS NOT NULL AND t.TABSCHEMA NOT LIKE 'SYS%'
  AND t.TABSCHEMA LIKE '{schema_filter}' AND t.TABNAME LIKE '{table_filter}'
UNION ALL
SELECT RTRIM(c.TABSCHEMA), c.TABNAME, c.COLNO + 1, c.COLNAME, c.REMARKS
FROM SYSCAT.COLUMNS c
WHERE c.REMARKS IS NOT NULL AND c.TABSCHEMA NOT LIKE 'SYS%'
  AND c.TABSCHEMA LIKE '{schema_filter}' AND c.TABNAME LIKE '{table_filter}'
""",
    view_sql="""
SELECT RTRIM(v.VIEWSCHEMA) AS schema_name, v.VIEWNAME AS view_name,
       v.TEXT AS view_def
FROM SYSCAT.VIEWS v
WHERE v.VIEWSCHEMA NOT LIKE 'SYS%'
  AND v.VIEWSCHEMA LIKE '{schema_filter}' AND v.VIEWNAME LIKE '{table_filter}'
""",
)

SAPHANA = DialectSpec(
    name="saphana",
    # saphana_to_exasol.sql:99-103: SYS.TABLE_COLUMNS
    catalog_sql="""
SELECT c.SCHEMA_NAME AS schema_name, c.TABLE_NAME AS table_name,
       c.COLUMN_NAME AS column_name, c.POSITION AS ordinal_position,
       c.DATA_TYPE_NAME AS data_type, c.LENGTH AS numeric_precision,
       c.SCALE AS numeric_scale, c.LENGTH AS character_maximum_length,
       c.IS_NULLABLE AS is_nullable
FROM SYS.TABLE_COLUMNS c
WHERE c.SCHEMA_NAME NOT LIKE 'SYS%' AND c.SCHEMA_NAME NOT LIKE '_SYS%'
  AND c.SCHEMA_NAME LIKE '{schema_filter}' AND c.TABLE_NAME LIKE '{table_filter}'
""",
    system_schemas=frozenset({"SYS", "_SYS_BI", "_SYS_REPO", "_SYS_STATISTICS"}),
    type_aliases={
        "nvarchar": "varchar", "shorttext": "varchar", "alphanum": "varchar",
        "seconddate": "datetime", "st_point": "point", "st_geometry": "st_geometry",
    },
    transfer_overrides={
        # saphana_to_exasol.sql:158-165: BINTOHEX, geometry WKT
        "varbinary": "BINTOHEX({c})",
        "blob": "BINTOHEX({c})",
        "st_geometry": "{c}.ST_AsWKT()",
        "st_point": "{c}.ST_AsWKT()",
    },
    # SYS.CONSTRAINTS flags PK rows; SYS.REFERENTIAL_CONSTRAINTS carries the
    # referenced side with POSITION ordinals
    pk_sql="""
SELECT c.SCHEMA_NAME AS schema_name, c.TABLE_NAME AS table_name,
       c.CONSTRAINT_NAME AS constraint_name, c.COLUMN_NAME AS column_name,
       c.POSITION AS column_position
FROM SYS.CONSTRAINTS c
WHERE c.IS_PRIMARY_KEY = 'TRUE'
  AND c.SCHEMA_NAME NOT LIKE 'SYS%' AND c.SCHEMA_NAME NOT LIKE '_SYS%'
  AND c.SCHEMA_NAME LIKE '{schema_filter}' AND c.TABLE_NAME LIKE '{table_filter}'
""",
    fk_sql="""
SELECT r.SCHEMA_NAME AS schema_name, r.TABLE_NAME AS table_name,
       r.CONSTRAINT_NAME AS fk_name, r.COLUMN_NAME AS fk_column,
       r.REFERENCED_SCHEMA_NAME AS ref_schema,
       r.REFERENCED_TABLE_NAME AS ref_table,
       r.REFERENCED_COLUMN_NAME AS ref_column,
       r.POSITION AS col_position
FROM SYS.REFERENTIAL_CONSTRAINTS r
WHERE r.SCHEMA_NAME NOT LIKE 'SYS%' AND r.SCHEMA_NAME NOT LIKE '_SYS%'
  AND r.SCHEMA_NAME LIKE '{schema_filter}' AND r.TABLE_NAME LIKE '{table_filter}'
""",
)

NETEZZA = DialectSpec(
    name="netezza",
    # netezza_to_exasol.sql:109-113: _V_RELATION_COLUMN
    catalog_sql="""
SELECT c.SCHEMA AS schema_name, c.NAME AS table_name, c.ATTNAME AS column_name,
       c.ATTNUM AS ordinal_position, c.FORMAT_TYPE AS data_type,
       NULL AS numeric_precision, NULL AS numeric_scale,
       NULL AS character_maximum_length, c.ATTNOTNULL AS is_nullable
FROM _V_RELATION_COLUMN c
WHERE c.TYPE = 'TABLE' AND c.SCHEMA NOT IN ('INFORMATION_SCHEMA', 'DEFINITION_SCHEMA')
  AND c.SCHEMA LIKE '{schema_filter}' AND c.NAME LIKE '{table_filter}'
""",
    system_schemas=frozenset({"INFORMATION_SCHEMA", "DEFINITION_SCHEMA"}),
    type_aliases={"byteint": "tinyint", "st_geometry": "st_geometry", "nchar": "char"},
    transfer_overrides={
        # netezza_to_exasol.sql:174-181: to_hex binary (32000-byte cap)
        "varbinary": "RAWTOHEX({c})",
        "st_geometry": "inza..ST_AsText({c})",
    },
    # _v_relation_keydata carries both kinds: contype 'p'/'f', CONSEQ
    # ordinal, PK* columns for the referenced side of FKs
    pk_sql="""
SELECT k.SCHEMA AS schema_name, k.RELATION AS table_name,
       k.CONSTRAINTNAME AS constraint_name, k.ATTNAME AS column_name,
       k.CONSEQ AS column_position
FROM _V_RELATION_KEYDATA k
WHERE k.CONTYPE = 'p'
  AND k.SCHEMA NOT IN ('INFORMATION_SCHEMA', 'DEFINITION_SCHEMA')
  AND k.SCHEMA LIKE '{schema_filter}' AND k.RELATION LIKE '{table_filter}'
""",
    fk_sql="""
SELECT k.SCHEMA AS schema_name, k.RELATION AS table_name,
       k.CONSTRAINTNAME AS fk_name, k.ATTNAME AS fk_column,
       k.PKSCHEMA AS ref_schema, k.PKRELATION AS ref_table,
       k.PKATTNAME AS ref_column, k.CONSEQ AS col_position
FROM _V_RELATION_KEYDATA k
WHERE k.CONTYPE = 'f'
  AND k.SCHEMA NOT IN ('INFORMATION_SCHEMA', 'DEFINITION_SCHEMA')
  AND k.SCHEMA LIKE '{schema_filter}' AND k.RELATION LIKE '{table_filter}'
""",
)

SNOWFLAKE = DialectSpec(
    name="snowflake",
    # snowflake_to_exasol.sql:76-108
    catalog_sql=_info_schema(frozenset({"INFORMATION_SCHEMA"})),
    system_schemas=frozenset({"INFORMATION_SCHEMA"}),
    type_aliases={
        "text": "varchar", "number": "decimal", "timestamp_ntz": "datetime",
        "timestamp_ltz": "timestamp", "timestamp_tz": "timestamp",
        "variant": "variant", "object": "object", "array": "array",
    },
    transfer_overrides={
        "variant": "TO_VARCHAR({c})",
        "object": "TO_VARCHAR({c})",
        "array": "TO_VARCHAR({c})",
        "binary": "TO_VARCHAR({c}, 'BASE64')",
        "geography": "ST_ASWKT({c})",
    },
)

BIGQUERY = DialectSpec(
    name="bigquery",
    # bigquery_to_exasol.sql:27-49: per-dataset INFORMATION_SCHEMA
    catalog_sql="""
SELECT table_schema AS schema_name, table_name, column_name,
       ordinal_position, data_type,
       NULL AS numeric_precision, NULL AS numeric_scale,
       NULL AS character_maximum_length, is_nullable
FROM `{dataset}`.INFORMATION_SCHEMA.COLUMNS
WHERE table_name LIKE '{table_filter}'
""",
    type_aliases={
        "int64": "bigint", "float64": "double", "bool": "boolean",
        "string": "varchar", "bytes": "varbinary", "numeric": "decimal(38,9)",
        "bignumeric": "decimal(76,38)", "struct": "nested", "geography": "geography",
    },
    transfer_overrides={
        # bigquery_to_exasol.sql:83: geography as WKT
        "geography": "ST_ASTEXT({c})",
        "bytes": "TO_BASE64({c})",
        "struct": "TO_JSON_STRING({c})",
        "array": "TO_JSON_STRING({c})",
    },
    quote_char="`",
    # BigQuery publishes (unenforced) PK/FK constraints per dataset via
    # INFORMATION_SCHEMA.{TABLE_CONSTRAINTS,KEY_COLUMN_USAGE,
    # CONSTRAINT_COLUMN_USAGE}; same {dataset} templating as the columns scan
    pk_sql="""
SELECT kcu.table_schema AS schema_name, kcu.table_name,
       kcu.constraint_name, kcu.column_name,
       kcu.ordinal_position AS column_position
FROM `{dataset}`.INFORMATION_SCHEMA.KEY_COLUMN_USAGE kcu
JOIN `{dataset}`.INFORMATION_SCHEMA.TABLE_CONSTRAINTS tc
  ON tc.constraint_name = kcu.constraint_name
 AND tc.table_name = kcu.table_name
WHERE tc.constraint_type = 'PRIMARY KEY'
  AND kcu.table_name LIKE '{table_filter}'
""",
    # referenced columns paired through position_in_unique_constraint
    # against the referenced constraint's own KCU rows — joining
    # CONSTRAINT_COLUMN_USAGE on name alone cross-products multi-column FKs
    fk_sql="""
SELECT kcu.table_schema AS schema_name, kcu.table_name,
       kcu.constraint_name AS fk_name, kcu.column_name AS fk_column,
       kr.table_schema AS ref_schema, kr.table_name AS ref_table,
       kr.column_name AS ref_column,
       kcu.ordinal_position AS col_position
FROM `{dataset}`.INFORMATION_SCHEMA.KEY_COLUMN_USAGE kcu
JOIN `{dataset}`.INFORMATION_SCHEMA.TABLE_CONSTRAINTS tc
  ON tc.constraint_name = kcu.constraint_name
 AND tc.table_name = kcu.table_name
JOIN `{dataset}`.INFORMATION_SCHEMA.CONSTRAINT_COLUMN_USAGE ccu
  ON ccu.constraint_name = kcu.constraint_name
JOIN `{dataset}`.INFORMATION_SCHEMA.TABLE_CONSTRAINTS tr
  ON tr.table_name = ccu.table_name AND tr.constraint_type = 'PRIMARY KEY'
JOIN `{dataset}`.INFORMATION_SCHEMA.KEY_COLUMN_USAGE kr
  ON kr.constraint_name = tr.constraint_name
 AND kr.ordinal_position = kcu.position_in_unique_constraint
WHERE tc.constraint_type = 'FOREIGN KEY'
  AND kcu.table_name LIKE '{table_filter}'
""",
)

VERTICA = DialectSpec(
    name="vertica",
    # vertica_to_exasol.sql:49-74: v_catalog.columns
    catalog_sql="""
SELECT c.table_schema AS schema_name, c.table_name, c.column_name,
       c.ordinal_position, c.data_type,
       c.numeric_precision, c.numeric_scale,
       c.character_maximum_length, c.is_nullable
FROM v_catalog.columns c
WHERE c.table_schema NOT IN ('v_catalog', 'v_monitor', 'v_internal')
  AND c.table_schema LIKE '{schema_filter}' AND c.table_name LIKE '{table_filter}'
""",
    system_schemas=frozenset({"v_catalog", "v_monitor", "v_internal"}),
    type_aliases={"long varchar": "text", "long varbinary": "blob"},
    # v_catalog exposes dedicated key views with ordinals
    pk_sql="""
SELECT p.table_schema AS schema_name, p.table_name,
       p.constraint_name, p.column_name,
       p.ordinal_position AS column_position
FROM v_catalog.primary_keys p
WHERE p.table_schema NOT IN ('v_catalog', 'v_monitor', 'v_internal')
  AND p.table_schema LIKE '{schema_filter}' AND p.table_name LIKE '{table_filter}'
""",
    fk_sql="""
SELECT f.table_schema AS schema_name, f.table_name,
       f.constraint_name AS fk_name, f.column_name AS fk_column,
       f.reference_table_schema AS ref_schema,
       f.reference_table_name AS ref_table,
       f.reference_column_name AS ref_column,
       f.ordinal_position AS col_position
FROM v_catalog.foreign_keys f
WHERE f.table_schema NOT IN ('v_catalog', 'v_monitor', 'v_internal')
  AND f.table_schema LIKE '{schema_filter}' AND f.table_name LIKE '{table_filter}'
""",
)

VECTORWISE = DialectSpec(
    name="vectorwise",
    # vectorwise_to_exasol.sql:28-30: iitables/iicolumns
    catalog_sql="""
SELECT c.table_owner AS schema_name, c.table_name, c.column_name,
       c.column_sequence AS ordinal_position, c.column_datatype AS data_type,
       c.column_length AS numeric_precision, c.column_scale AS numeric_scale,
       c.column_length AS character_maximum_length,
       c.column_nulls AS is_nullable
FROM iicolumns c JOIN iitables t
  ON t.table_name = c.table_name AND t.table_owner = c.table_owner
WHERE t.table_type = 'T' AND c.table_owner LIKE '{schema_filter}'
  AND c.table_name LIKE '{table_filter}'
""",
    type_aliases={"ingresdate": "datetime", "money": "money", "c": "char"},
)

EXASOL = DialectSpec(
    name="exasol",
    # exasol_to_exasol.sql:150-178: EXA_ALL_COLUMNS; native IMPORT FROM EXA
    # preferred over JDBC (:36-39 — "always parallelized")
    catalog_sql="""
SELECT c.COLUMN_SCHEMA AS schema_name, c.COLUMN_TABLE AS table_name,
       c.COLUMN_NAME AS column_name, c.COLUMN_ORDINAL_POSITION AS ordinal_position,
       c.COLUMN_TYPE AS data_type, c.COLUMN_NUM_PREC AS numeric_precision,
       c.COLUMN_NUM_SCALE AS numeric_scale,
       c.COLUMN_MAXSIZE AS character_maximum_length,
       c.COLUMN_IS_NULLABLE AS is_nullable
FROM EXA_ALL_COLUMNS c
WHERE c.COLUMN_SCHEMA NOT IN ('SYS', 'EXA_STATISTICS')
  AND c.COLUMN_SCHEMA LIKE '{schema_filter}' AND c.COLUMN_TABLE LIKE '{table_filter}'
""",
    system_schemas=frozenset({"SYS", "EXA_STATISTICS"}),
    type_aliases={"hashtype": "hashtype", "geometry": "geometry"},
    # EXA_ALL_CONSTRAINT_COLUMNS carries both kinds with ORDINAL_POSITION and
    # REFERENCED_* columns (exasol_to_exasol.sql catalog family)
    pk_sql="""
SELECT CONSTRAINT_SCHEMA AS schema_name, CONSTRAINT_TABLE AS table_name,
       CONSTRAINT_NAME AS constraint_name, COLUMN_NAME AS column_name,
       ORDINAL_POSITION AS column_position
FROM EXA_ALL_CONSTRAINT_COLUMNS
WHERE CONSTRAINT_TYPE = 'PRIMARY KEY'
  AND CONSTRAINT_SCHEMA NOT IN ('SYS', 'EXA_STATISTICS')
  AND CONSTRAINT_SCHEMA LIKE '{schema_filter}'
  AND CONSTRAINT_TABLE LIKE '{table_filter}'
""",
    fk_sql="""
SELECT CONSTRAINT_SCHEMA AS schema_name, CONSTRAINT_TABLE AS table_name,
       CONSTRAINT_NAME AS fk_name, COLUMN_NAME AS fk_column,
       REFERENCED_SCHEMA AS ref_schema, REFERENCED_TABLE AS ref_table,
       REFERENCED_COLUMN AS ref_column, ORDINAL_POSITION AS col_position
FROM EXA_ALL_CONSTRAINT_COLUMNS
WHERE CONSTRAINT_TYPE = 'FOREIGN KEY'
  AND CONSTRAINT_SCHEMA NOT IN ('SYS', 'EXA_STATISTICS')
  AND CONSTRAINT_SCHEMA LIKE '{schema_filter}'
  AND CONSTRAINT_TABLE LIKE '{table_filter}'
""",
    comment_sql="""
SELECT TABLE_SCHEMA AS schema_name, TABLE_NAME AS table_name, 0 AS sub,
       CAST(NULL AS VARCHAR(128)) AS column_name,
       TABLE_COMMENT AS comment_text
FROM EXA_ALL_TABLES
WHERE TABLE_COMMENT IS NOT NULL
  AND TABLE_SCHEMA NOT IN ('SYS', 'EXA_STATISTICS')
  AND TABLE_SCHEMA LIKE '{schema_filter}' AND TABLE_NAME LIKE '{table_filter}'
UNION ALL
SELECT COLUMN_SCHEMA, COLUMN_TABLE, COLUMN_ORDINAL_POSITION,
       COLUMN_NAME, COLUMN_COMMENT
FROM EXA_ALL_COLUMNS
WHERE COLUMN_COMMENT IS NOT NULL
  AND COLUMN_SCHEMA NOT IN ('SYS', 'EXA_STATISTICS')
  AND COLUMN_SCHEMA LIKE '{schema_filter}' AND COLUMN_TABLE LIKE '{table_filter}'
""",
    view_sql="""
SELECT VIEW_SCHEMA AS schema_name, VIEW_NAME AS view_name,
       VIEW_TEXT AS view_def
FROM EXA_ALL_VIEWS
WHERE VIEW_SCHEMA NOT IN ('SYS', 'EXA_STATISTICS')
  AND VIEW_SCHEMA LIKE '{schema_filter}' AND VIEW_NAME LIKE '{table_filter}'
""",
)

ALL_DIALECTS: dict[str, DialectSpec] = {
    d.name: d
    for d in [
        MYSQL, MARIADB, POSTGRESQL, REDSHIFT, ORACLE, SQLSERVER, TERADATA,
        CLICKHOUSE, DB2, SAPHANA, NETEZZA, SNOWFLAKE, BIGQUERY, VERTICA,
        VECTORWISE, EXASOL,
    ]
}
