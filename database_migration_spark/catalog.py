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

import re
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


def attach_keys(
    catalog: "Catalog",
    pk_rows: list[dict],
    fk_rows: list[dict] = (),
) -> "Catalog":
    """Attach normalized PK/FK catalog rows to a scanned catalog.

    Row shapes are the ``DialectSpec.pk_sql`` / ``fk_sql`` contracts
    (sources/dialects.py): pk rows carry schema_name/table_name/
    constraint_name/column_name/column_position; fk rows carry
    schema_name/table_name/fk_name/fk_column/ref_schema/ref_table/
    ref_column/col_position. Multi-column keys are reassembled in
    column_position order (the reference's group_concat ... ORDER BY
    column_position, mysql_to_exasol.sql:335); a missing/NULL position
    keeps input order (Teradata's All_RI_ChildrenV has no ordinal).

    PK names default to ``{TABLE}_PK`` when the source reports none —
    the reference synthesizes the same name (teradata_to_exasol.sql:383).
    """
    pk_by_table: dict[tuple[str, str], list[dict]] = {}
    for r in pk_rows:
        pk_by_table.setdefault((r["schema_name"], r["table_name"]), []).append(r)
    # grouped per table up front: attachment stays O(rows), not
    # O(tables × FK-groups) on wide catalogs
    fk_by_table: dict[tuple[str, str], dict[str, list[dict]]] = {}
    for r in fk_rows:
        tkey = (r["schema_name"], r["table_name"])
        fk_by_table.setdefault(tkey, {}).setdefault(str(r["fk_name"]), []).append(r)

    def pos(r: dict, key: str, idx: int) -> tuple[int, int]:
        v = r.get(key)
        return (int(v), idx) if v is not None else (idx, idx)

    tables = []
    for t in catalog.tables:
        tkey = (t.schema, t.table)
        pk = None
        rows = pk_by_table.get(tkey, [])
        rows = [r for _, r in sorted((pos(r, "column_position", i), r) for i, r in enumerate(rows))]
        if rows:
            name = rows[0].get("constraint_name") or f"{t.table}_PK"
            pk = KeyMeta(
                schema=t.schema, table=t.table, name=str(name),
                kind="PRIMARY KEY",
                columns=tuple(r["column_name"] for r in rows),
            )
        fks = []
        for fkn, rs in sorted(fk_by_table.get(tkey, {}).items()):
            rs = [r for _, r in sorted((pos(r, "col_position", i), r) for i, r in enumerate(rs))]
            fks.append(
                KeyMeta(
                    schema=t.schema, table=t.table, name=fkn, kind="FOREIGN KEY",
                    columns=tuple(r["fk_column"] for r in rs),
                    ref_schema=rs[0].get("ref_schema"),
                    ref_table=rs[0].get("ref_table"),
                    ref_columns=tuple(r["ref_column"] for r in rs),
                )
            )
        tables.append(replace(t, primary_key=pk, foreign_keys=tuple(fks)))
    return Catalog(tables=tables)


def attach_comments(catalog: "Catalog", comment_rows: list[dict]) -> "Catalog":
    """Attach normalized comment rows (``DialectSpec.comment_sql`` shape:
    schema_name/table_name/sub/column_name/comment_text, sub 0 = table
    comment) to a scanned catalog — feeds the COMMENT ON section
    (mysql_to_exasol.sql:214-218)."""
    tab_c: dict[tuple[str, str], str] = {}
    col_c: dict[tuple[str, str, str], str] = {}
    for r in comment_rows:
        text = r.get("comment_text")
        if not text:
            continue
        key = (r["schema_name"], r["table_name"])
        if not int(r.get("sub") or 0):
            tab_c[key] = str(text)
        elif r.get("column_name"):
            col_c[(*key, r["column_name"])] = str(text)
    tables = []
    for t in catalog.tables:
        cols = tuple(
            replace(c, comment=col_c.get((t.schema, t.table, c.name), c.comment))
            for c in t.columns
        )
        tables.append(
            replace(t, columns=cols, comment=tab_c.get((t.schema, t.table), t.comment))
        )
    return Catalog(tables=tables)


_SIMPLE_IDENT = re.compile(r"^`?[A-Za-z_][A-Za-z0-9_]*`?$")


def attach_distribution(catalog: "Catalog", dist_rows: list[dict]) -> "Catalog":
    """Attach normalized distribution rows (``DialectSpec.dist_sql`` shape)
    as TableMeta.distribution_columns, position-ordered — the Teradata
    Primary Index → DISTRIBUTE BY mapping (teradata_to_exasol.sql:251)."""
    by_table: dict[tuple[str, str], list[dict]] = {}
    for r in dist_rows:
        by_table.setdefault((r["schema_name"], r["table_name"]), []).append(r)
    tables = []
    for t in catalog.tables:
        rows = sorted(
            by_table.get((t.schema, t.table), []),
            key=lambda r: int(r.get("column_position") or 0),
        )
        tables.append(
            replace(t, distribution_columns=tuple(r["column_name"] for r in rows))
            if rows
            else t
        )
    return Catalog(tables=tables)


def attach_partitions(
    catalog: "Catalog", part_rows: list[dict]
) -> tuple["Catalog", list[str]]:
    """Best-effort partition mapping (mysql_to_exasol.sql:234-243): a
    single-identifier partition expression becomes partition_columns; any
    other expression produces a manual-review note string."""
    notes: list[str] = []
    by_table: dict[tuple[str, str], str] = {}
    for r in part_rows:
        expr = (r.get("partition_expression") or "").strip()
        key = (r["schema_name"], r["table_name"])
        if _SIMPLE_IDENT.match(expr):
            by_table[key] = expr.replace("`", "")
        else:
            method = r.get("partition_method") or "unknown"
            notes.append(
                f'"{r["schema_name"]}"."{r["table_name"]}" {method} '
                f"partitioning ({expr}) not auto-mapped - review and add "
                "PARTITION BY manually if appropriate."
            )
    tables = [
        replace(t, partition_columns=(by_table[(t.schema, t.table)],))
        if (t.schema, t.table) in by_table
        else t
        for t in catalog.tables
    ]
    return Catalog(tables=tables), notes


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


def catalog_to_json(cat: Catalog) -> str:
    """Serialize a scanned catalog to JSON — the snapshot a migration run
    saves so later schema-drift diffs can compare against the catalog AS
    MIGRATED without the old source being reachable (decommissioned,
    credentials rotated, or simply changed since)."""
    import dataclasses
    import json

    def enc(o):
        if dataclasses.is_dataclass(o):
            return {k: enc(v) for k, v in dataclasses.asdict(o).items()}
        if isinstance(o, tuple):
            return list(o)
        return o

    return json.dumps(
        {"tables": [enc(t) for t in cat.tables]}, indent=1, sort_keys=True
    )


def catalog_from_json(text: str) -> Catalog:
    """Inverse of :func:`catalog_to_json` (tuples restored, keys rebuilt)."""
    import json

    def key(d):
        if d is None:
            return None
        return KeyMeta(
            schema=d["schema"], table=d["table"], name=d["name"],
            kind=d["kind"], columns=tuple(d["columns"]),
            ref_schema=d.get("ref_schema"), ref_table=d.get("ref_table"),
            ref_columns=tuple(d.get("ref_columns") or ()),
        )

    tables = []
    for t in json.loads(text)["tables"]:
        cols = tuple(ColumnMeta(**c) for c in t["columns"])
        tables.append(
            TableMeta(
                schema=t["schema"],
                table=t["table"],
                columns=cols,
                primary_key=key(t.get("primary_key")),
                foreign_keys=tuple(key(k) for k in t.get("foreign_keys") or ()),
                partition_columns=tuple(t.get("partition_columns") or ()),
                distribution_columns=tuple(t.get("distribution_columns") or ()),
                comment=t.get("comment"),
            )
        )
    return Catalog(tables=tables)
