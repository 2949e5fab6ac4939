"""Normalized source-catalog model.

The reference pulls schema/table/column/key metadata from each source DB's
catalog (e.g. /root/reference/mysql_to_exasol.sql:111-115,
/root/reference/oracle_to_exasol.sql:293-404) into a uniform row shape which
every downstream step (type mapping, DDL synthesis, import generation,
validation) consumes. This module is that uniform shape, as plain dataclasses
— pure Python, no Spark dependency, so planners stay unit-testable.

Identifier case folding: the reference optionally wraps every identifier in
``upper()`` consistently across schema/table/column/keys/comments
(/root/reference/mysql_to_exasol.sql:73-80,98). We reproduce that as the
``fold_case`` option on :func:`fold_identifier`.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace


def fold_identifier(name: str, fold_case: bool = True) -> str:
    """Uppercase-fold an identifier (reference: identifier_case_insensitive).

    mysql_to_exasol.sql:73-80 wraps identifiers in upper() when the option is
    set; folding must be applied uniformly or generated references dangle.
    """
    return name.upper() if fold_case else name


@dataclass(frozen=True)
class ColumnMeta:
    """One column of a source table, as read from the source catalog."""

    schema: str
    table: str
    name: str
    ordinal: int
    source_type: str  # raw type name as the source reports it, lowercased
    precision: int | None = None
    scale: int | None = None
    char_length: int | None = None
    nullable: bool = True
    default: str | None = None
    is_identity: bool = False
    is_generated: bool = False
    comment: str | None = None

    def folded(self, fold_case: bool = True) -> "ColumnMeta":
        return replace(
            self,
            schema=fold_identifier(self.schema, fold_case),
            table=fold_identifier(self.table, fold_case),
            name=fold_identifier(self.name, fold_case),
        )


@dataclass(frozen=True)
class KeyMeta:
    """A primary or foreign key (reference keeps both, created DISABLED)."""

    schema: str
    table: str
    name: str
    kind: str  # "PRIMARY KEY" | "FOREIGN KEY"
    columns: tuple[str, ...]
    ref_schema: str | None = None
    ref_table: str | None = None
    ref_columns: tuple[str, ...] = ()


@dataclass(frozen=True)
class TableMeta:
    schema: str
    table: str
    columns: tuple[ColumnMeta, ...]
    primary_key: KeyMeta | None = None
    foreign_keys: tuple[KeyMeta, ...] = ()
    partition_columns: tuple[str, ...] = ()
    distribution_columns: tuple[str, ...] = ()
    comment: str | None = None

    @property
    def column_names(self) -> tuple[str, ...]:
        return tuple(c.name for c in sorted(self.columns, key=lambda c: c.ordinal))

    def non_key_columns(self) -> tuple[str, ...]:
        """All columns MINUS pk columns (delta_import_on_primary_keys.sql:194-198)."""
        pk = set(self.primary_key.columns) if self.primary_key else set()
        return tuple(c for c in self.column_names if c not in pk)


@dataclass
class Catalog:
    """A scanned source catalog: the unit the generators iterate over."""

    tables: list[TableMeta] = field(default_factory=list)

    def filter(
        self, schema_filter: str = "%", table_filter: str = "%"
    ) -> "Catalog":
        """LIKE-or-IN filter semantics from the reference.

        '%' → match-all LIKE; a comma list → IN; otherwise exact/LIKE
        (oracle_to_exasol.sql:127-137, sqlserver_to_exasol.sql:163-174).
        """
        import fnmatch

        def match(value: str, filt: str) -> bool:
            filt = filt.strip()
            if "," in filt:
                wanted = {f.strip().upper() for f in filt.split(",")}
                return value.upper() in wanted
            # SQL LIKE % / _ → fnmatch * / ?
            pat = filt.replace("%", "*").replace("_", "?")
            return fnmatch.fnmatch(value.upper(), pat.upper())

        return Catalog(
            tables=[
                t
                for t in self.tables
                if match(t.schema, schema_filter) and match(t.table, table_filter)
            ]
        )
