"""SourceAdapter protocol.

Each dialect adapter (SURVEY.md §2.1 lists 16 in the reference) provides:
- ``scan_catalog``: the source-side catalog query → normalized Catalog
- ``type_map``: raw source type → MappedType (delegates to typemap with
  dialect-specific pre-normalization)
- ``transfer_expr``: per-column source-side rewrite (the reference pushes
  dialect functions like to_base64/st_astext/toString into the remote
  SELECT — mysql_to_exasol.sql:186-199 etc.)
- ``quote`` / ``quote_literal``: centralized dialect quoting (the doubled-
  quote escaping is a large share of the reference's code; SURVEY §7.5)
- system-object exclusion lists (mysql_to_exasol.sql:106 and friends)
"""

from __future__ import annotations

from abc import ABC, abstractmethod

from database_migration_spark.catalog import Catalog, ColumnMeta
from database_migration_spark.typemap import MappedType, TypeMapPolicy, map_type


class SourceAdapter(ABC):
    """Base for dialect adapters. Subclasses set DIALECT and SYSTEM_SCHEMAS."""

    DIALECT: str = "generic"
    # hard-coded system schema exclusions, per reference scripts
    SYSTEM_SCHEMAS: frozenset[str] = frozenset()
    # Native-connector fast path (extension point). The reference always
    # prefers the source's native parallel interface over generic JDBC when
    # one exists — "Prefer EXA: IMPORT FROM EXA is always parallelized"
    # (exasol_to_exasol.sql:36-39, README.md:294-298). The Spark equivalent
    # is a DataSource V2 connector with partitioned reads (e.g. a vendor
    # spark-connector package). Adapters that have one installed override
    # TRANSFER_MODES to list it first and implement ``read`` to dispatch on
    # the first available mode; none ship in this environment, so the base
    # declares the contract and every built-in adapter stays on its default
    # path ("jdbc" for JDBC adapters, direct file reads for file adapters).
    TRANSFER_MODES: tuple[str, ...] = ("jdbc",)

    def __init__(self, policy: TypeMapPolicy | None = None):
        self.policy = policy or TypeMapPolicy()

    def transfer_mode(self) -> str:
        """The transfer path this adapter will use — first entry of
        TRANSFER_MODES whose runtime dependency is importable/registered.
        Base behavior: the declared default (no probing; subclasses with a
        native connector override with their availability check)."""
        return self.TRANSFER_MODES[0]

    # --- quoting ------------------------------------------------------
    def quote(self, identifier: str) -> str:
        """Quote an identifier in the source dialect (default ANSI)."""
        return '"' + identifier.replace('"', '""') + '"'

    def quote_literal(self, value: str) -> str:
        """Quote a string literal (doubling single quotes — the escaping the
        reference repeats in every script, centralized here)."""
        return "'" + value.replace("'", "''") + "'"

    # --- catalog ------------------------------------------------------
    @abstractmethod
    def scan_catalog(self, schema_filter: str = "%", table_filter: str = "%") -> Catalog:
        """Read source metadata → normalized Catalog (system objects excluded)."""

    def catalog_query(self, schema_filter: str, table_filter: str) -> str:
        """The dialect catalog SQL (pushed down via spark.read.jdbc for real
        databases). Default raises; JDBC adapters override."""
        raise NotImplementedError(f"{self.DIALECT} has no remote catalog query")

    # --- types --------------------------------------------------------
    def normalize_type(self, raw: str) -> str:
        """Dialect pre-normalization before the shared map (e.g. Oracle
        NUMBER with no precision → 'number', PG 'int4' → 'int')."""
        return raw.strip().lower()

    def type_map(self, raw: str) -> MappedType:
        return map_type(self.normalize_type(raw), self.policy)

    def transfer_expr(self, col: ColumnMeta) -> str:
        """Source-side SELECT expression for one column."""
        mt = self.type_map(col.source_type)
        return mt.transfer_expr.format(c=self.quote(col.name))
