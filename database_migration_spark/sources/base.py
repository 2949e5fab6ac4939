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

    #: modes with no runtime dependency to probe — always available
    _BUILTIN_MODES: frozenset[str] = frozenset({"jdbc", "file"})

    def transfer_mode(self) -> str:
        """The transfer path this adapter will use — the first entry of
        TRANSFER_MODES that is available NOW. Built-in modes ("jdbc",
        "file") are always available; any other mode is available iff the
        adapter defines both ``_probe_<mode>()`` (returns truthy when the
        connector's runtime dependency is importable/registered — the
        reference's "IMPORT FROM EXA if EXA connection works, else JDBC"
        preference, exasol_to_exasol.sql:36-39) and ``_read_<mode>(table,
        plan)`` (the actual reader ``read_table`` dispatches to). A probe
        that raises counts as unavailable — a broken native connector must
        degrade to the generic path, never fail the transfer."""
        for mode in self.TRANSFER_MODES:
            if self._mode_available(mode):
                return mode
        # nothing available: degrade to generic JDBC if declared (the
        # reference's own fallback); otherwise fail LOUDLY here rather
        # than let read_table AttributeError on a reader that never
        # existed — returning an unavailable mode would violate the
        # "availability was probed" contract read_table relies on.
        if "jdbc" in self.TRANSFER_MODES:
            return "jdbc"
        raise RuntimeError(
            f"{type(self).__name__}: no transfer mode available among "
            f"{self.TRANSFER_MODES} (every probe failed and no generic "
            "fallback is declared)"
        )

    def _mode_available(self, mode: str) -> bool:
        if mode == "jdbc":
            # implemented inline by JdbcSourceAdapter.read_table — the one
            # mode that needs no _read_<mode> method
            return True
        # every other mode — including the built-in "file" — must have a
        # reader for read_table to dispatch to; "available" without one
        # would be an AttributeError at transfer time
        if getattr(self, f"_read_{mode}", None) is None:
            return False
        if mode in self._BUILTIN_MODES:
            return True  # no runtime dependency to probe
        probe = getattr(self, f"_probe_{mode}", None)
        if probe is None:
            return False
        try:
            return bool(probe())
        except Exception:  # noqa: BLE001 — degrade, never fail the transfer
            return False

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
        NUMBER with no precision → 'number', PG 'int4' → 'int'). Some
        catalogs render the full column DDL as the type (Derby's
        SYSCOLUMNS.COLUMNDATATYPE is 'BIGINT NOT NULL') — the constraint
        suffix is nullability metadata, not part of the type, and leaving
        it would route a perfectly mappable type to the unknown-type
        fallback."""
        t = raw.strip().lower()
        if t.endswith(" not null"):
            t = t[: -len(" not null")].rstrip()
        return t

    def type_map(self, raw: str) -> MappedType:
        return map_type(self.normalize_type(raw), self.policy)

    def transfer_expr(self, col: ColumnMeta) -> str:
        """Source-side SELECT expression for one column."""
        mt = self.type_map(col.source_type)
        return mt.transfer_expr.format(c=self.quote(col.name))


def read_any(adapter, meta):
    """Read a table through whichever surface the adapter has: JDBC
    adapters expose read_table(TableMeta) (the typed per-column transfer
    SELECT), lake adapters expose read(name). The single dispatch point —
    CLI commands and operators alike route here."""
    if hasattr(adapter, "read_table"):
        return adapter.read_table(meta)
    return adapter.read(meta.table)
