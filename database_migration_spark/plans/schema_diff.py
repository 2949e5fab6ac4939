"""Schema-drift diff: two catalog scans → reviewable ALTER statement stream.

A recurring sync (the reference's delta-import loop, delta_import.sql) faces
source schema evolution between runs: new tables, added columns, retyped
columns, drops. The reference's answer is regenerate-and-rerun the full DDL
generator; this module produces the surgical form — the ordered, dry-run
ALTER stream that brings the previously-migrated target up to the new source
catalog, with the same review-then-execute UX as every other generator here
(statement_stream.py). Destructive changes (dropped tables/columns) are
NEVER emitted as DDL — they surface as warnings for a human decision, the
reference's own stance (its generators create and load, never drop).

Ordering: warnings sort first (stream contract), then new tables, added
columns, type changes — each section internally sorted by (table, ordinal)
so the stream is deterministic and diffs cleanly between runs.
"""

from __future__ import annotations

from database_migration_spark.catalog import Catalog, fold_identifier
from database_migration_spark.plans.ddl import spark_type_ddl
from database_migration_spark.plans.statement_stream import (
    MigrationPlan,
    Statement,
)
from database_migration_spark.typemap import TypeMapPolicy, map_columns


def schema_diff_plan(
    old: Catalog,
    new: Catalog,
    target_schema: str,
    policy: TypeMapPolicy | None = None,
) -> MigrationPlan:
    """Diff ``old`` (the catalog as last migrated) against ``new`` (the
    source as it stands) and emit the ALTER stream for the target.

    Comparison is on the MAPPED Spark types (typemap is the contract the
    target was built with), so a source-side rename of an alias type that
    maps to the same Spark type is correctly a no-op.
    """
    policy = policy or TypeMapPolicy()
    fold = policy.fold_case
    tgt = fold_identifier(target_schema, fold)

    def mapped_types(cat: Catalog) -> dict:
        out = {}
        for t in cat.tables:
            for col, mt in map_columns(t.columns, policy):
                out[(t.schema, t.table, col.name)] = (
                    spark_type_ddl(mt.spark_type),
                    col.nullable,
                    col.ordinal,
                )
        return out

    # keyed by (schema, table): a multi-schema scan legitimately holds
    # same-named tables in different schemas, and collapsing them would
    # diff unrelated relations against each other
    old_tables = {(t.schema, t.table): t for t in old.tables}
    new_tables = {(t.schema, t.table): t for t in new.tables}

    # the emitted DDL flattens into ONE target schema — a table name that
    # exists in several source schemas would produce colliding statements
    # against the same "TGT"."T"; those render schema-prefixed (S1_T) with
    # a warning so the stream stays executable and unambiguous.
    # Prefixing keys off the OLD catalog (the state the target was built
    # from): a table that already existed unprefixed must keep its target
    # name even when a same-named table appears in another schema later —
    # only the newly-created table gets the prefix, so ALTERs always hit
    # the table that actually exists on the target.
    name_schemas: dict = {}
    for s, t in set(old_tables) | set(new_tables):
        name_schemas.setdefault(t, set()).add(s)
    old_name_schemas: dict = {}
    for s, t in old_tables:
        old_name_schemas.setdefault(t, set()).add(s)

    def target_name(schema: str, table: str) -> str:
        if len(old_name_schemas.get(table, ())) > 1:
            # collided when the target was built — every rendition prefixed
            return f"{schema}_{table}"
        if len(name_schemas[table]) > 1 and (schema, table) not in old_tables:
            # newly-colliding: the pre-existing table keeps its unprefixed
            # target; only the table being created now is prefixed
            return f"{schema}_{table}"
        return table
    old_cols = mapped_types(old)
    new_cols = mapped_types(new)

    plan = MigrationPlan()
    warn_sec = plan.add_section("SCHEMA DRIFT REVIEW")
    create_sec = plan.add_section("NEW TABLES")
    add_sec = plan.add_section("ADDED COLUMNS")
    modify_sec = plan.add_section("TYPE CHANGES")

    def q(name: str) -> str:
        return f'"{fold_identifier(name, fold)}"'

    # collision warnings are emitted only for names that actually produce
    # statements (a drift-free diff stays empty); collected during the loop
    used_collisions: set = set()

    for skey in sorted(new_tables):
        t = new_tables[skey]
        tname = target_name(t.schema, t.table)
        qual = f"{t.schema}.{t.table}"

        def _note_collision(table=t.table):
            if len(name_schemas[table]) > 1:
                used_collisions.add(table)
        if skey not in old_tables:
            cols = ",\n".join(
                f"  {q(col.name)} {spark_type_ddl(mt.spark_type)}"
                f"{'' if col.nullable else ' NOT NULL'}"
                for col, mt in map_columns(t.columns, policy)
            )
            _note_collision()
            create_sec.statements.append(
                Statement(f'CREATE TABLE "{tgt}".{q(tname)} (\n{cols}\n);')
            )
            continue
        for col in sorted(t.columns, key=lambda c: c.ordinal):
            key = (t.schema, t.table, col.name)
            ddl_type, nullable, _ = new_cols[key]
            if key not in old_cols:
                # the column is added NULLABLE even when the source declares
                # NOT NULL: on a populated target the constrained form is
                # guaranteed to fail (existing rows have no value), the same
                # reasoning as the tightening warning below
                _note_collision()
                add_sec.statements.append(
                    Statement(
                        f'ALTER TABLE "{tgt}".{q(tname)} '
                        f"ADD COLUMN {q(col.name)} {ddl_type};"
                    )
                )
                if not nullable:
                    warn_sec.statements.append(
                        Statement(
                            f"{qual}.{col.name}: source declares the added "
                            "column NOT NULL; emitted nullable — backfill, "
                            "then tighten manually",
                            kind="warning",
                        )
                    )
                continue
            old_type, old_nullable, _ = old_cols[key]
            if ddl_type != old_type:
                _note_collision()
                modify_sec.statements.append(
                    Statement(
                        f'ALTER TABLE "{tgt}".{q(tname)} '
                        f"MODIFY ({q(col.name)} {ddl_type});"
                    )
                )
                warn_sec.statements.append(
                    Statement(
                        f"{qual}.{col.name}: type changed "
                        f"{old_type} -> {ddl_type}; verify the change is "
                        "widening before executing the MODIFY",
                        kind="warning",
                    )
                )
            if old_nullable and not nullable:
                warn_sec.statements.append(
                    Statement(
                        f"{qual}.{col.name}: source tightened to NOT NULL; "
                        "existing target rows may violate it — not emitted",
                        kind="warning",
                    )
                )

    for skey in sorted(old_tables):
        qual = f"{skey[0]}.{skey[1]}"
        if skey not in new_tables:
            warn_sec.statements.append(
                Statement(
                    f"{qual}: dropped at the source; target kept "
                    "(no destructive DDL is ever emitted)",
                    kind="warning",
                )
            )
            continue
        new_names = {c.name for c in new_tables[skey].columns}
        for col in sorted(old_tables[skey].columns, key=lambda c: c.ordinal):
            if col.name not in new_names:
                warn_sec.statements.append(
                    Statement(
                        f"{qual}.{col.name}: dropped at the source; "
                        "target column kept",
                        kind="warning",
                    )
                )

    for name in sorted(used_collisions):
        if len(old_name_schemas.get(name, ())) > 1:
            detail = (
                "target statements render schema-prefixed to avoid "
                "colliding on one target name"
            )
        else:
            keep = sorted(old_name_schemas.get(name, ()))
            detail = (
                f"the pre-existing table keeps its unprefixed target "
                f"(built from {keep}); only newly-created tables render "
                "schema-prefixed"
            )
        warn_sec.statements.append(
            Statement(
                f"{name}: exists in schemas "
                f"{sorted(name_schemas[name])} — {detail}",
                kind="warning",
            )
        )
    return plan
