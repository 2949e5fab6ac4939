"""Schema/DDL synthesis: source catalog → target DDL + import statement
stream (the generator family's output, mysql_to_exasol.sql:321-368).

Sections, in the reference's order (mysql_to_exasol.sql:352-367):
warnings → CREATE SCHEMA → CREATE TABLE (PK inline, disabled) → FOREIGN KEYS
→ COMMENTS → IMPORT statements → CONSTRAINT STATE → commented views →
optional DATA VALIDATION.

Our engine emits two renderings from one plan:
- parity mode: Exasol-flavored SQL text (golden-file comparable);
- spark mode: the DDL as Spark ``CREATE TABLE`` SQL plus reader configs —
  what our executor actually runs.
"""

from __future__ import annotations

from pyspark.sql import types as T

from database_migration_spark.catalog import Catalog, TableMeta, fold_identifier
from database_migration_spark.plans.statement_stream import (
    MigrationPlan,
    Section,
    Statement,
)
from database_migration_spark.typemap import TypeMapPolicy, map_columns


def spark_type_ddl(dtype: T.DataType) -> str:
    return dtype.simpleString().upper()


def generate_migration_plan(
    catalog: Catalog,
    target_schema: str,
    policy: TypeMapPolicy | None = None,
    include_validation: bool = True,
    views: list[dict] | None = None,
    partition_notes: list[str] | None = None,
    constraint_state: str = "FORCE_DISABLE",
) -> MigrationPlan:
    """Catalog → ordered statement stream (dry-run object).

    Mirrors the per-table flow of mysql_to_exasol.sql:344-350: CREATE TABLE
    from mapped types, PK/FK sections (metadata-only in Spark — kept as
    comments, like the reference's DISABLEd constraints), IMPORT per table,
    and a final validation section.
    """
    policy = policy or TypeMapPolicy()
    plan = MigrationPlan()
    fold = policy.fold_case

    schema_sec = plan.add_section("CREATE SCHEMA")
    tgt = fold_identifier(target_schema, fold)
    schema_sec.statements.append(Statement(f'CREATE SCHEMA IF NOT EXISTS "{tgt}";'))

    tables_sec = plan.add_section("CREATE TABLES")
    keys_sec = plan.add_section("CONSTRAINTS (metadata only, not enforced)")
    # filled in the loop, appended AFTER the placement/comment sections —
    # the reference's stream order (mysql_to_exasol.sql:352-367: dist 35,
    # partition 37, comments 41-43 all precede the imports)
    imports_sec = Section("IMPORTS")

    for t in sorted(catalog.tables, key=lambda x: (x.schema, x.table)):
        mapped = map_columns(t.columns, policy)
        col_lines = []
        for col, mt in mapped:
            cname = fold_identifier(col.name, fold)
            nullness = "" if col.nullable else " NOT NULL"
            col_lines.append(f'  "{cname}" {spark_type_ddl(mt.spark_type)}{nullness}')
            for w in mt.warnings:
                tables_sec.statements.append(
                    Statement(f"{t.table}.{col.name}: {w}", kind="warning")
                )
        tname = fold_identifier(t.table, fold)
        ddl = (
            f'CREATE TABLE "{tgt}"."{tname}" (\n' + ",\n".join(col_lines) + "\n);"
        )
        tables_sec.statements.append(Statement(ddl))

        if t.primary_key:
            # named + DISABLED, like the reference synthesizes
            # (mysql_to_exasol.sql:335, teradata_to_exasol.sql:383-391)
            cols = ", ".join(f'"{fold_identifier(c, fold)}"' for c in t.primary_key.columns)
            pkname = fold_identifier(t.primary_key.name, fold)
            keys_sec.statements.append(
                Statement(
                    f'ALTER TABLE "{tgt}"."{tname}" ADD CONSTRAINT "{pkname}" '
                    f"PRIMARY KEY ({cols}) DISABLE;"
                )
            )
        in_scope = {x.table for x in catalog.tables}
        for fk in sorted(t.foreign_keys, key=lambda k: k.name):
            # keep FKs only when the referenced table is in scope
            # (mysql_to_exasol.sql:338 semi-join against selected tables)
            if fk.ref_table not in in_scope:
                keys_sec.statements.append(
                    Statement(
                        f"{t.table}: FK to out-of-scope table "
                        f"'{fk.ref_table}' skipped",
                        kind="warning",
                    )
                )
                continue
            cols = ", ".join(f'"{fold_identifier(c, fold)}"' for c in fk.columns)
            rcols = ", ".join(f'"{fold_identifier(c, fold)}"' for c in fk.ref_columns)
            rt = fold_identifier(fk.ref_table or "", fold)
            fkname = fold_identifier(fk.name, fold)
            keys_sec.statements.append(
                Statement(
                    f'ALTER TABLE "{tgt}"."{tname}" ADD CONSTRAINT "{fkname}" '
                    f"FOREIGN KEY ({cols}) "
                    f'REFERENCES "{tgt}"."{rt}" ({rcols}) DISABLE;'
                )
            )

        exprs = ", ".join(
            mt.transfer_expr.format(c=f'"{col.name}"') for col, mt in mapped
        )
        imports_sec.statements.append(
            Statement(
                f'IMPORT INTO "{tgt}"."{tname}" FROM SOURCE '
                f"STATEMENT 'SELECT {exprs} FROM \"{t.schema}\".\"{t.table}\"';"
            )
        )

    # DISTRIBUTE BY / PARTITION BY (teradata_to_exasol.sql:251-253 Primary
    # Index mapping; mysql_to_exasol.sql:236-243 best-effort partition key)
    # — only when the catalog carries placement metadata
    placed = [
        t
        for t in sorted(catalog.tables, key=lambda x: (x.schema, x.table))
        if t.distribution_columns or t.partition_columns
    ]
    if placed or partition_notes:
        dsec = plan.add_section("DISTRIBUTION / PARTITIONING")
        for t in placed:
            tname = fold_identifier(t.table, fold)
            if t.distribution_columns:
                cols = ", ".join(
                    f'"{fold_identifier(c, fold)}"' for c in t.distribution_columns
                )
                dsec.statements.append(
                    Statement(f'ALTER TABLE "{tgt}"."{tname}" DISTRIBUTE BY {cols};')
                )
            if t.partition_columns:
                cols = ", ".join(
                    f'"{fold_identifier(c, fold)}"' for c in t.partition_columns
                )
                dsec.statements.append(
                    Statement(f'ALTER TABLE "{tgt}"."{tname}" PARTITION BY {cols};')
                )
        for note in partition_notes or []:
            dsec.statements.append(Statement(note, kind="comment"))

    # COMMENT ON section (mysql_to_exasol.sql:214-218) — only when the
    # catalog carries any comment, so commentless plans stay byte-stable
    def q1(text: str) -> str:
        return "'" + text.replace("'", "''") + "'"

    commented = [
        t
        for t in sorted(catalog.tables, key=lambda x: (x.schema, x.table))
        if t.comment or any(c.comment for c in t.columns)
    ]
    if commented:
        com = plan.add_section("COMMENTS")
        for t in commented:
            tname = fold_identifier(t.table, fold)
            if t.comment:
                com.statements.append(
                    Statement(
                        f'COMMENT ON TABLE "{tgt}"."{tname}" IS {q1(t.comment)};'
                    )
                )
            for c in sorted(t.columns, key=lambda c: c.ordinal):
                if c.comment:
                    cname = fold_identifier(c.name, fold)
                    com.statements.append(
                        Statement(
                            f'COMMENT ON COLUMN "{tgt}"."{tname}"."{cname}" '
                            f"IS {q1(c.comment)};"
                        )
                    )

    plan.sections.append(imports_sec)

    # CONSTRAINT STATE (mysql_to_exasol.sql:201-204,364-366): keys were
    # created DISABLED for a fast order-independent load; this post-load
    # section sets their final state per policy
    state = constraint_state.upper()
    if state == "FORCE_ENABLE":
        sw, note = "enable", "  -- forced ENABLE (target re-validates the data)"
    elif state == "SET_AS_SOURCE":
        sw, note = "enable", "  -- matches source (keys active)"
    else:
        sw, note = "disable", "  -- forced DISABLE (optimizer/BI metadata only; faster)"
    keyed = [
        t
        for t in sorted(catalog.tables, key=lambda x: (x.schema, x.table))
        if t.primary_key or t.foreign_keys
    ]
    if keyed:
        st_sec = plan.add_section(
            "CONSTRAINT STATE - run AFTER the data load "
            "(keys created DISABLED for a fast, order-independent load)"
        )
        in_scope = {x.table for x in catalog.tables}
        for t in keyed:
            if t.primary_key:
                tname = fold_identifier(t.table, fold)
                pkname = fold_identifier(t.primary_key.name, fold)
                st_sec.statements.append(
                    Statement(
                        f'ALTER TABLE "{tgt}"."{tname}" MODIFY CONSTRAINT '
                        f'"{pkname}" {sw};{note}'
                    )
                )
        for t in keyed:
            tname = fold_identifier(t.table, fold)
            for fk in sorted(t.foreign_keys, key=lambda k: k.name):
                if fk.ref_table not in in_scope:
                    continue
                fkname = fold_identifier(fk.name, fold)
                st_sec.statements.append(
                    Statement(
                        f'ALTER TABLE "{tgt}"."{tname}" MODIFY CONSTRAINT '
                        f'"{fkname}" {sw};{note}'
                    )
                )

    # source views as a commented manual-review section
    # (mysql_to_exasol.sql:222-229: source SQL almost never ports verbatim)
    if views:
        vsec = plan.add_section(
            "VIEWS (source SQL - commented out, manual review required)"
        )
        for v in sorted(views, key=lambda d: (d["schema_name"], d["view_name"])):
            body = str(v.get("view_def") or "").replace("\n", "\n-- ")
            vsec.statements.append(
                Statement(
                    f"-- {v['schema_name']}.{v['view_name']}  "
                    f"(source view - review and adapt manually):\n-- {body}"
                )
            )

    if include_validation:
        val = plan.add_section("DATA VALIDATION")
        for t in sorted(catalog.tables, key=lambda x: (x.schema, x.table)):
            tname = fold_identifier(t.table, fold)
            val.statements.append(
                Statement(
                    f"-- validate: compute metric wide-row on source and "
                    f'"{tgt}"."{tname}", compare, expect zero DEVIATION rows',
                    kind="comment",
                )
            )
    return plan
