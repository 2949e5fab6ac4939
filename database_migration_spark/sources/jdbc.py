"""JDBC source adapter: interprets a DialectSpec against a live connection.

Flow (the generator-family lifecycle, SURVEY §3.1):
1. ``scan_catalog`` pushes the dialect catalog query down via
   ``spark.read.jdbc(url, "(sql) q")`` — the query runs source-side, only
   metadata rows cross the wire;
2. ``type_map`` normalizes dialect names (Nullable()/LowCardinality()
   unwrapping, alias table, Teradata letter codes) into the shared typemap;
3. ``read_table`` builds the per-column transfer projection (dialect
   overrides first, shared transfer templates second) into the remote
   SELECT, partitioned by an ImportPlan (bin-packing / hash / range split)
   with the reference's fetchsize tuning.

No live databases exist in this environment, so tests cover catalog-SQL
structure, normalization, and projection building; the Spark read calls are
standard ``spark.read.jdbc`` invocations.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from database_migration_spark.catalog import (
    Catalog,
    ColumnMeta,
    TableMeta,
    attach_comments,
    attach_distribution,
    attach_keys,
)
from database_migration_spark.plans.binpack import ImportPlan
from database_migration_spark.sources.base import SourceAdapter
from database_migration_spark.sources.dialects import ALL_DIALECTS, DialectSpec
from database_migration_spark.typemap import MappedType, TypeMapPolicy, map_type

_WRAPPERS = re.compile(r"^(nullable|lowcardinality)\((.*)\)$")  # ClickHouse


class JdbcSourceAdapter(SourceAdapter):
    def __init__(
        self,
        spark: SparkSession,
        dialect: str | DialectSpec,
        url: str = "",
        properties: dict[str, str] | None = None,
        policy: TypeMapPolicy | None = None,
    ):
        super().__init__(policy)
        self.spark = spark
        self.spec = dialect if isinstance(dialect, DialectSpec) else ALL_DIALECTS[dialect]
        self.DIALECT = self.spec.name
        self.SYSTEM_SCHEMAS = self.spec.system_schemas
        self.url = url
        self.properties = dict(properties or {})
        self.properties.setdefault("fetchsize", str(self.spec.fetchsize))

    # --- quoting ----------------------------------------------------------
    def quote(self, identifier: str) -> str:
        q = self.spec.quote_char
        if q == "[":  # SQL Server brackets
            return "[" + identifier.replace("]", "]]") + "]"
        return q + identifier.replace(q, q + q) + q

    def quote_schema(self, schema: str) -> str:
        """Schema qualifier quoting. The multi-DB expansion synthesizes
        composite 'db.schema' schema names (sqlserver spec); each part
        quotes separately so the remote reference is [db].[schema]. Only
        the schema qualifier gets this treatment — table/column names keep
        plain quoting (a dot inside THOSE is a legal identifier char)."""
        if self.spec.quote_char == "[" and "." in schema:
            return ".".join(self.quote(p) for p in schema.split(".", 1))
        return self.quote(schema)

    # --- types ------------------------------------------------------------
    def normalize_type(self, raw: str) -> str:
        # base normalization first (lowercase + constraint-suffix strip)
        t = super().normalize_type(raw)
        # unwrap ClickHouse Nullable(...)/LowCardinality(...) recursively
        m = _WRAPPERS.match(t)
        while m:
            t = m.group(2).strip()
            m = _WRAPPERS.match(t)
        base = t.split("(")[0].strip()
        alias = self.spec.type_aliases.get(base)
        if alias:
            # keep the original precision suffix if the alias has none
            suffix = t[len(base):] if "(" not in alias else ""
            return alias + suffix
        return t

    def type_map(self, raw: str) -> MappedType:
        mt = map_type(self.normalize_type(raw), self.policy)
        base = self.normalize_type(raw).split("(")[0].strip()
        raw_base = raw.strip().lower().split("(")[0].strip()
        override = self.spec.transfer_overrides.get(
            raw_base
        ) or self.spec.transfer_overrides.get(base)
        if override:
            mt.transfer_expr = override
        return mt

    # --- catalog ----------------------------------------------------------
    def catalog_query(self, schema_filter: str = "%", table_filter: str = "%") -> str:
        return self._template(self.spec.catalog_sql, schema_filter, table_filter)

    def _template(self, sql: str, schema_filter: str, table_filter: str) -> str:
        return sql.format(
            schema_filter=schema_filter.replace("'", "''"),
            table_filter=table_filter.replace("'", "''"),
            database="{database}",
            dataset="{dataset}",
        ).strip()

    def pk_query(self, schema_filter: str = "%", table_filter: str = "%") -> str | None:
        if self.spec.pk_sql is None:
            return None
        return self._template(self.spec.pk_sql, schema_filter, table_filter)

    def fk_query(self, schema_filter: str = "%", table_filter: str = "%") -> str | None:
        if self.spec.fk_sql is None:
            return None
        return self._template(self.spec.fk_sql, schema_filter, table_filter)

    def comment_query(self, schema_filter: str = "%", table_filter: str = "%") -> str | None:
        if self.spec.comment_sql is None:
            return None
        return self._template(self.spec.comment_sql, schema_filter, table_filter)

    def view_query(self, schema_filter: str = "%", table_filter: str = "%") -> str | None:
        if self.spec.view_sql is None:
            return None
        return self._template(self.spec.view_sql, schema_filter, table_filter)

    def fetch_views(
        self,
        schema_filter: str = "%",
        table_filter: str = "%",
        databases: list[str] | None = None,
    ) -> list[dict]:
        """Normalized view rows (schema_name, view_name, view_def) for the
        commented manual-review section (mysql_to_exasol.sql:222-229)."""
        sql = self.view_query(schema_filter, table_filter)
        if sql is None:
            return []
        return self._fetch_rows(self._maybe_expand(sql, databases))

    def _fetch_rows(self, sql: str) -> list[dict]:
        df = self.spark.read.jdbc(
            url=self.url, table=f"({sql}) q", properties=self.properties
        )
        # sources report result labels in their own case (Derby/Oracle/DB2
        # uppercase); the normalized row contract is lowercase
        return [
            {k.lower(): v for k, v in r.asDict().items()} for r in df.collect()
        ]

    # --- per-database expansion (SQL Server) ------------------------------
    def list_databases(self, db_filter: str = "%") -> list[str]:
        """The source's database list (sqlserver_to_exasol.sql:204-208):
        SQL Server catalog views are PER DATABASE, so multi-DB migration
        first fetches matching database names, then unions the catalog
        query across them."""
        sql = (
            "SELECT name FROM sys.databases WHERE name LIKE "
            f"'{db_filter.replace(chr(39), chr(39) * 2)}'"
        )
        names = [r["name"] for r in self._fetch_rows(sql)]
        if not names:
            raise ValueError(f"No database found for DB_FILTER {db_filter!r}")
        return sorted(names)

    @staticmethod
    def expand_per_database(sql: str, databases: list[str]) -> str:
        """{database} template → UNION ALL across databases (the reference's
        per_db() helper, sqlserver_to_exasol.sql:210-217)."""
        return "\nUNION ALL\n".join(
            sql.replace("{database}", db).strip() for db in databases
        )

    def _maybe_expand(self, sql: str, databases: list[str] | None) -> str:
        if "{database}" not in sql:
            return sql
        if databases is None:
            databases = self.list_databases()
        return self.expand_per_database(sql, databases)

    def scan_catalog(
        self,
        schema_filter: str = "%",
        table_filter: str = "%",
        include_metadata: bool = True,
        databases: list[str] | None = None,
        db_filter: str = "%",
        include_keys: bool | None = None,
    ) -> Catalog:
        """Columns always; with ``include_metadata`` also keys, comments
        and distribution (extra catalog queries — set False for a plain
        column scan, e.g. under a login without catalog-view privileges).
        ``include_keys`` is the deprecated alias for the same switch."""
        if include_keys is not None:
            include_metadata = include_keys
        # comma lists (the LIKE-or-IN contract of Catalog.filter) cannot be
        # rendered into the remote single-LIKE template — scan wide and
        # apply the list locally; plain LIKE patterns still push down
        local_schema = local_table = None
        if "," in schema_filter:
            local_schema, schema_filter = schema_filter, "%"
        if "," in table_filter:
            local_table, table_filter = table_filter, "%"
        if databases is None and "{database}" in self.spec.catalog_sql:
            databases = self.list_databases(db_filter)
        sql = self._maybe_expand(
            self.catalog_query(schema_filter, table_filter), databases
        )
        cat = self.catalog_from_rows(self._fetch_rows(sql))
        if local_schema or local_table:
            cat = cat.filter(local_schema or "%", local_table or "%")
        if not include_metadata:
            return cat
        if self.spec.pk_sql is not None:
            pk_sql = self._maybe_expand(
                self.pk_query(schema_filter, table_filter), databases
            )
            pk_rows = self._fetch_rows(pk_sql)
            fk_sql = self.fk_query(schema_filter, table_filter)
            fk_rows = (
                self._fetch_rows(self._maybe_expand(fk_sql, databases))
                if fk_sql
                else []
            )
            cat = attach_keys(cat, pk_rows, fk_rows)
        c_sql = self.comment_query(schema_filter, table_filter)
        if c_sql is not None:
            cat = attach_comments(
                cat, self._fetch_rows(self._maybe_expand(c_sql, databases))
            )
        if self.spec.dist_sql is not None:
            d_sql = self._template(self.spec.dist_sql, schema_filter, table_filter)
            cat = attach_distribution(
                cat, self._fetch_rows(self._maybe_expand(d_sql, databases))
            )
        return cat

    def fetch_partitions(
        self,
        schema_filter: str = "%",
        table_filter: str = "%",
        databases: list[str] | None = None,
    ) -> list[dict]:
        """Raw partition rows (``DialectSpec.partition_sql`` shape) — run
        through catalog.attach_partitions to split auto-mappable keys from
        manual-review notes."""
        if self.spec.partition_sql is None:
            return []
        sql = self._template(self.spec.partition_sql, schema_filter, table_filter)
        return self._fetch_rows(self._maybe_expand(sql, databases))

    def catalog_from_rows(self, rows: list[dict]) -> Catalog:
        """Normalize raw catalog rows (testable without a live DB)."""
        tables: dict[tuple[str, str], list[ColumnMeta]] = {}
        for r in rows:
            key = (r["schema_name"], r["table_name"])
            null_raw = str(r.get("is_nullable", "1")).strip().upper()
            tables.setdefault(key, []).append(
                ColumnMeta(
                    schema=r["schema_name"],
                    table=r["table_name"],
                    name=r["column_name"],
                    ordinal=int(r["ordinal_position"]),
                    source_type=str(r["data_type"]).lower(),
                    precision=r.get("numeric_precision"),
                    scale=r.get("numeric_scale"),
                    char_length=r.get("character_maximum_length"),
                    nullable=null_raw in ("YES", "Y", "1", "TRUE", "T"),
                )
            )
        return Catalog(
            tables=[
                TableMeta(schema=s, table=t, columns=tuple(sorted(cols, key=lambda c: c.ordinal)))
                for (s, t), cols in sorted(tables.items())
            ]
        )

    # --- data -------------------------------------------------------------
    def transfer_select(self, table: TableMeta) -> str:
        """The remote SELECT with per-column transfer expressions
        (mysql_to_exasol.sql:348-350 — explicit column list, never ``*``)."""
        exprs = []
        for col in sorted(table.columns, key=lambda c: c.ordinal):
            mt = self.type_map(col.source_type)
            exprs.append(mt.transfer_expr.format(c=self.quote(col.name)))
        return (
            f"SELECT {', '.join(exprs)} FROM "
            f"{self.quote_schema(table.schema)}.{self.quote(table.table)}"
        )

    def read_table(
        self, table: TableMeta, plan: ImportPlan | None = None
    ) -> DataFrame:
        mode = self.transfer_mode()
        if mode != "jdbc":
            # native parallel connector (the reference's IMPORT FROM EXA
            # preference): availability was probed by transfer_mode(), so
            # the reader exists; it owns partitioning (DSv2 connectors
            # split reads themselves, the ImportPlan predicates are the
            # JDBC-specific split)
            return getattr(self, f"_read_{mode}")(table, plan)
        sql = self.transfer_select(table)
        if plan is None:
            return self.spark.read.jdbc(
                url=self.url, table=f"({sql}) src", properties=self.properties
            )
        props = dict(self.properties)
        props.setdefault("fetchsize", str(plan.fetchsize))
        return self.spark.read.jdbc(
            url=self.url,
            table=f"({sql}) src",
            predicates=plan.predicates,
            properties=props,
        )
