"""Statement-stream, DDL, and partition-planner tests (golden-ish)."""

from database_migration_spark.catalog import Catalog, ColumnMeta, KeyMeta, TableMeta
from database_migration_spark.plans.binpack import (
    PartitionInfo,
    binpack_partitions,
    plan_hash_split,
    plan_partitioned_import,
    plan_range_split,
)
from database_migration_spark.plans.ddl import generate_migration_plan
from database_migration_spark.typemap import TypeMapPolicy


def _catalog() -> Catalog:
    cols = (
        ColumnMeta("src", "t1", "id", 1, "bigint", nullable=False),
        ColumnMeta("src", "t1", "name", 2, "varchar(50)"),
        ColumnMeta("src", "t1", "blob_col", 3, "some_exotic_udt"),
    )
    pk = KeyMeta("src", "t1", "pk_t1", "PRIMARY KEY", ("id",))
    return Catalog(tables=[TableMeta("src", "t1", cols, primary_key=pk)])


def test_plan_sections_and_order():
    plan = generate_migration_plan(_catalog(), "tgt")
    sql = plan.to_sql()
    # warnings first (the unmapped exotic type), then schema, tables, imports
    assert sql.index("WARNINGS") < sql.index("CREATE SCHEMA")
    assert sql.index("CREATE SCHEMA") < sql.index('CREATE TABLE "TGT"."T1"')
    assert sql.index("CREATE TABLE") < sql.index("IMPORT INTO")
    assert "unmapped type" in sql
    assert 'PRIMARY KEY ("ID") DISABLE' in sql


def test_case_folding_off():
    plan = generate_migration_plan(_catalog(), "tgt", TypeMapPolicy(fold_case=False))
    sql = plan.to_sql()
    assert '"tgt"."t1"' in sql


def test_plan_renders_as_dataframe(spark):
    df = generate_migration_plan(_catalog(), "tgt").to_df(spark)
    rows = df.collect()
    assert [r.ord for r in rows] == list(range(1, len(rows) + 1))


def test_binpack_balances():
    parts = [PartitionInfo(f"p{i}", c) for i, c in enumerate([100, 90, 50, 40, 30, 10])]
    bins = binpack_partitions(parts, 3)
    loads = sorted(sum(p.row_count for p in b) for b in bins)
    # greedy largest-first: loads should be 100, 100(90+10), 120(50+40+30)
    assert loads == [100, 100, 120]


def test_binpack_drops_empty_and_fewer_parts_than_bins():
    plan = plan_partitioned_import(
        [PartitionInfo("a", 5), PartitionInfo("b", 0)], 4
    )
    assert plan.predicates == ["PARTITION_NAME = 'a'"]
    assert plan.strategy == "partition_binpack"


def test_hash_split():
    plan = plan_hash_split(4)
    assert len(plan.predicates) == 4
    assert plan.predicates[0] == "MOD(ORA_HASH(ROWID), 4) = 0"


def test_range_split_covers_nulls_and_bounds():
    plan = plan_range_split("k", 0, 100, 4)
    assert len(plan.predicates) == 4
    assert "IS NULL" in plan.predicates[0]
    assert plan.predicates[-1].startswith("k >= ")


def test_testdata_plan_has_key_sections(spark, sf_smoke):
    """The fixture key catalog flows through to named DISABLED constraints
    in the stream (teradata_to_exasol.sql:383-391 shape)."""
    from database_migration_spark.plans.ddl import generate_migration_plan
    from database_migration_spark.sources.parquet_source import ParquetSource

    cat = ParquetSource(spark, sf_smoke).scan_catalog(include_keys=True)
    sql = generate_migration_plan(cat, "TARGET").to_sql()
    assert (
        'ALTER TABLE "TARGET"."LINEITEM" ADD CONSTRAINT "LINEITEM_PK" '
        'PRIMARY KEY ("L_ORDERKEY", "L_LINENUMBER") DISABLE;' in sql
    )
    assert (
        'ADD CONSTRAINT "NATION_FK_REGION" FOREIGN KEY ("N_REGIONKEY") '
        'REFERENCES "TARGET"."REGION" ("R_REGIONKEY") DISABLE;' in sql
    )


def test_fk_out_of_scope_skipped():
    from database_migration_spark.catalog import Catalog, ColumnMeta, KeyMeta, TableMeta

    cols = (ColumnMeta("s", "t1", "id", 1, "bigint"),)
    fk_in = KeyMeta("s", "t1", "fk1", "FOREIGN KEY", ("id",), "s", "t2", ("id",))
    fk_out = KeyMeta("s", "t1", "fk2", "FOREIGN KEY", ("id",), "s", "absent", ("id",))
    cat = Catalog(
        tables=[
            TableMeta("s", "t1", cols, foreign_keys=(fk_in, fk_out)),
            TableMeta("s", "t2", cols),
        ]
    )
    sql = generate_migration_plan(cat, "TGT").to_sql()
    assert 'REFERENCES "TGT"."T2"' in sql
    assert 'REFERENCES "TGT"."ABSENT"' not in sql
    assert "out-of-scope table 'absent' skipped" in sql


def test_comments_and_views_sections():
    """COMMENT ON + commented-view sections (mysql_to_exasol.sql:211-229)."""
    from database_migration_spark.catalog import attach_comments

    cat = _catalog()
    cat = attach_comments(
        cat,
        [
            {"schema_name": "src", "table_name": "t1", "sub": 0,
             "column_name": None, "comment_text": "the fact's table"},
            {"schema_name": "src", "table_name": "t1", "sub": 1,
             "column_name": "id", "comment_text": "surrogate"},
            {"schema_name": "src", "table_name": "t1", "sub": 9,
             "column_name": "ghost", "comment_text": "no such column"},
        ],
    )
    t = cat.tables[0]
    assert t.comment == "the fact's table"
    assert t.columns[0].comment == "surrogate"
    views = [
        {"schema_name": "src", "view_name": "v_top",
         "view_def": "SELECT id\nFROM t1\nWHERE id > 0"},
    ]
    sql = generate_migration_plan(cat, "tgt", views=views).to_sql()
    # quote-doubling in comment literals
    assert "COMMENT ON TABLE \"TGT\".\"T1\" IS 'the fact''s table';" in sql
    assert "COMMENT ON COLUMN \"TGT\".\"T1\".\"ID\" IS 'surrogate';" in sql
    # every view line commented out
    assert "-- src.v_top" in sql
    assert "\n-- FROM t1" in sql
    assert "VIEWS (source SQL - commented out" in sql
    assert sql.index("COMMENT ON TABLE") < sql.index("VIEWS (source SQL")


def test_plan_without_comments_is_unchanged():
    sql = generate_migration_plan(_catalog(), "tgt").to_sql()
    assert "COMMENT ON" not in sql and "VIEWS (source SQL" not in sql


def test_distribution_partition_section():
    """Teradata PI -> DISTRIBUTE BY; MySQL partition key -> PARTITION BY;
    complex partitioning -> review note (teradata:251-253, mysql:236-243)."""
    from database_migration_spark.catalog import attach_distribution, attach_partitions

    cat = _catalog()
    cat = attach_distribution(
        cat,
        [
            {"schema_name": "src", "table_name": "t1", "column_name": "name",
             "column_position": 2},
            {"schema_name": "src", "table_name": "t1", "column_name": "id",
             "column_position": 1},
        ],
    )
    cat, notes = attach_partitions(
        cat,
        [
            {"schema_name": "src", "table_name": "t1",
             "partition_method": "HASH", "partition_expression": "`id`"},
            {"schema_name": "src", "table_name": "zzz",
             "partition_method": "RANGE",
             "partition_expression": "year(created_at)"},
        ],
    )
    assert cat.tables[0].distribution_columns == ("id", "name")  # PI order
    assert cat.tables[0].partition_columns == ("id",)
    assert len(notes) == 1 and "year(created_at)" in notes[0]
    sql = generate_migration_plan(cat, "tgt", partition_notes=notes).to_sql()
    assert 'ALTER TABLE "TGT"."T1" DISTRIBUTE BY "ID", "NAME";' in sql
    assert 'ALTER TABLE "TGT"."T1" PARTITION BY "ID";' in sql
    assert "not auto-mapped - review" in sql
    assert "DISTRIBUTION / PARTITIONING" in sql


def test_plan_without_placement_metadata_unchanged():
    sql = generate_migration_plan(_catalog(), "tgt").to_sql()
    assert "DISTRIBUTE BY" not in sql and "PARTITION BY" not in sql


def test_constraint_state_policies():
    """Final CONSTRAINT STATE section (mysql_to_exasol.sql:201-204,364-366):
    keys created DISABLED, post-load state set per policy."""
    base = _catalog()
    d = generate_migration_plan(base, "tgt").to_sql()
    assert 'MODIFY CONSTRAINT "PK_T1" disable;  -- forced DISABLE' in d
    assert d.index("IMPORT INTO") < d.index("MODIFY CONSTRAINT")
    e = generate_migration_plan(base, "tgt", constraint_state="FORCE_ENABLE").to_sql()
    assert 'MODIFY CONSTRAINT "PK_T1" enable;  -- forced ENABLE' in e
    s = generate_migration_plan(base, "tgt", constraint_state="SET_AS_SOURCE").to_sql()
    assert "matches source (keys active)" in s


def test_schema_diff_plan_golden():
    """Drift between two catalog scans → surgical ALTER stream: new table
    CREATEd, added column ADDed, retype MODIFYd (+ widening warning),
    drops and NOT-NULL tightenings surface as warnings only."""
    from database_migration_spark.catalog import Catalog, ColumnMeta, TableMeta
    from database_migration_spark.plans.schema_diff import schema_diff_plan

    def col(table, name, ordinal, st, nullable=True):
        return ColumnMeta(
            schema="S", table=table, name=name, ordinal=ordinal,
            source_type=st, nullable=nullable,
        )

    old = Catalog(tables=[
        TableMeta("S", "a", (col("a", "x", 1, "integer"),
                             col("a", "y", 2, "varchar"),
                             col("a", "w", 3, "date"))),
        TableMeta("S", "b", (col("b", "k", 1, "integer"),)),
    ])
    new = Catalog(tables=[
        TableMeta("S", "a", (col("a", "x", 1, "bigint"),          # retyped
                             col("a", "y", 2, "varchar", nullable=False),
                             col("a", "z", 4, "date"))),          # added, w dropped
        TableMeta("S", "c", (col("c", "id", 1, "bigint"),)),      # new table
    ])
    rows = [s for _, s in schema_diff_plan(old, new, "TGT").rows()]
    text = "\n".join(rows)

    assert 'CREATE TABLE "TGT"."C" (\n  "ID" DECIMAL(19,0)\n);' in text
    assert 'ALTER TABLE "TGT"."A" ADD COLUMN "Z" DATE;' in text
    assert 'ALTER TABLE "TGT"."A" MODIFY ("X" DECIMAL(19,0));' in text
    # warnings: retype review, NOT NULL tightening, dropped table + column
    warn = [r for r in rows if r.startswith("-- ") and "====" not in r]
    assert any("a.x: type changed DECIMAL(10,0) -> DECIMAL(19,0)" in w for w in warn)
    assert any("a.y: source tightened to NOT NULL" in w for w in warn)
    assert any("b: dropped at the source" in w for w in warn)
    assert any("a.w: dropped at the source" in w for w in warn)
    # nothing destructive anywhere in the stream
    assert "DROP" not in text
    # warnings lead the stream (statement_stream contract)
    first_sql = next(i for i, r in enumerate(rows) if r.startswith(("CREATE", "ALTER")))
    assert all(not r.startswith(("CREATE", "ALTER")) for r in rows[:first_sql])


def test_schema_diff_not_null_add_and_multi_schema():
    """An added NOT NULL column is emitted NULLABLE (the constrained form
    fails on any populated target) with a backfill warning; same-named
    tables in different schemas are diffed independently."""
    from database_migration_spark.catalog import Catalog, ColumnMeta, TableMeta
    from database_migration_spark.plans.schema_diff import schema_diff_plan

    def col(schema, table, name, ordinal, st, nullable=True):
        return ColumnMeta(schema=schema, table=table, name=name,
                          ordinal=ordinal, source_type=st, nullable=nullable)

    old = Catalog(tables=[
        TableMeta("S1", "t", (col("S1", "t", "x", 1, "integer"),)),
        TableMeta("S2", "t", (col("S2", "t", "x", 1, "varchar"),)),
    ])
    new = Catalog(tables=[
        TableMeta("S1", "t", (col("S1", "t", "x", 1, "integer"),
                              col("S1", "t", "y", 2, "integer", nullable=False))),
        TableMeta("S2", "t", (col("S2", "t", "x", 1, "varchar"),)),
    ])
    rows = [s for _, s in schema_diff_plan(old, new, "TGT").rows()]
    text = "\n".join(rows)
    # added NOT NULL column: nullable DDL + warning, never "NOT NULL"
    assert 'ADD COLUMN "Y" DECIMAL(10,0);' in text
    assert "NOT NULL" not in text.replace("source declares the added column NOT NULL", "")
    assert any("t.y: source declares the added column NOT NULL" in r for r in rows)
    # S2.t (identical on both sides, different schema) produced no diff rows
    assert text.count("ADD COLUMN") == 1
    assert "MODIFY" not in text and "CREATE TABLE" not in text
    # the colliding name renders schema-prefixed (one target schema cannot
    # hold two different "T"s) and the collision is announced
    assert 'ALTER TABLE "TGT"."S1_T" ADD COLUMN "Y"' in text
    assert any("t: exists in schemas" in r for r in rows)
    # warnings are schema-qualified so the reviewer can tell the tables apart
    assert any("S1.t.y: source declares the added column NOT NULL" in r for r in rows)


def test_schema_diff_properties():
    """Property: for ANY pair of catalogs — never destructive DDL, every
    genuinely-new column surfaces exactly once (ADD or inside its table's
    CREATE), and identical catalogs diff to an empty stream."""
    from hypothesis import given, settings, strategies as st

    from database_migration_spark.catalog import Catalog, ColumnMeta, TableMeta
    from database_migration_spark.plans.schema_diff import schema_diff_plan

    types = st.sampled_from(["integer", "bigint", "varchar", "date", "double"])
    names = st.sampled_from(["a", "b", "c", "d"])
    schemas = st.sampled_from(["S1", "S2"])

    def build(spec):
        tables = []
        for (schema, tname), cols in spec.items():
            if not cols:
                continue
            cms = tuple(
                ColumnMeta(schema=schema, table=tname, name=cn, ordinal=i + 1,
                           source_type=tp, nullable=nl)
                for i, (cn, (tp, nl)) in enumerate(sorted(cols.items()))
            )
            tables.append(TableMeta(schema=schema, table=tname, columns=cms))
        return Catalog(tables=tables)

    catalog_spec = st.dictionaries(
        st.tuples(schemas, names),
        st.dictionaries(names, st.tuples(types, st.booleans()), max_size=3),
        max_size=4,
    )

    @settings(max_examples=60, deadline=None)
    @given(old_spec=catalog_spec, new_spec=catalog_spec)
    def check(old_spec, new_spec):
        old, new = build(old_spec), build(new_spec)
        rows = [s for _, s in schema_diff_plan(old, new, "TGT").rows()]
        text = "\n".join(rows)
        assert "DROP" not in text
        # identical catalogs → no statements and no warnings (section
        # headers are the only rows a plan always renders)
        if old_spec == new_spec:
            assert all(r.startswith("-- ====") for r in rows)
        # every new column of an EXISTING table appears exactly once as ADD
        old_keys = {(t.schema, t.table) for t in old.tables}
        for t in new.tables:
            if (t.schema, t.table) not in old_keys:
                continue
            old_cols = {
                c.name
                for ot in old.tables
                if (ot.schema, ot.table) == (t.schema, t.table)
                for c in ot.columns
            }
            for c in t.columns:
                if c.name not in old_cols:
                    # anchored match: the statement names the TARGET table
                    # (possibly schema-prefixed) then this exact column — a
                    # bare substring test would double-count when a column
                    # name equals another table's name
                    pats = [
                        f'ALTER TABLE "TGT"."{tn}" '
                        f'ADD COLUMN "{c.name.upper()}" '
                        for tn in (
                            t.table.upper(),
                            f"{t.schema.upper()}_{t.table.upper()}",
                        )
                    ]
                    in_table = [
                        r for r in rows if any(r.startswith(p) for p in pats)
                    ]
                    assert len(in_table) == 1, (pats, rows)

    check()


def test_catalog_json_roundtrip_property():
    """Any catalog (keys, comments, placement included) must survive the
    JSON snapshot byte-exactly — dataclass equality after a roundtrip."""
    from hypothesis import given, settings, strategies as st

    from database_migration_spark.catalog import (
        Catalog,
        ColumnMeta,
        KeyMeta,
        TableMeta,
        catalog_from_json,
        catalog_to_json,
    )

    names = st.sampled_from(["a", "b", "c"])
    types = st.sampled_from(["integer", "varchar(10)", "date"])

    @st.composite
    def tables(draw):
        schema, tname = draw(names), draw(names)
        cols = tuple(
            ColumnMeta(schema, tname, f"c{i}", i + 1, draw(types),
                       nullable=draw(st.booleans()),
                       comment=draw(st.none() | st.text(max_size=5)))
            for i in range(draw(st.integers(1, 3)))
        )
        pk = None
        if draw(st.booleans()):
            pk = KeyMeta(schema, tname, "pk", "PRIMARY KEY", (cols[0].name,))
        fks = ()
        if draw(st.booleans()):
            fks = (KeyMeta(schema, tname, "fk", "FOREIGN KEY",
                           (cols[0].name,), "S", "other", ("id",)),)
        return TableMeta(schema, tname, cols, primary_key=pk,
                         foreign_keys=fks,
                         partition_columns=tuple(draw(st.lists(names, max_size=2))),
                         comment=draw(st.none() | st.text(max_size=8)))

    @settings(max_examples=40, deadline=None)
    @given(ts=st.lists(tables(), max_size=3))
    def check(ts):
        cat = Catalog(tables=ts)
        assert catalog_from_json(catalog_to_json(cat)).tables == cat.tables

    check()


def test_schema_diff_new_collision_keeps_existing_target():
    """A collision that first appears in the NEW catalog must NOT rename
    the pre-existing table's ALTER targets: the target was migrated
    pre-collision as TGT.T, so its ALTERs keep the unprefixed name and
    only the newly-created table renders schema-prefixed."""
    from database_migration_spark.catalog import Catalog, ColumnMeta, TableMeta
    from database_migration_spark.plans.schema_diff import schema_diff_plan

    def col(schema, table, name, ordinal, st, nullable=True):
        return ColumnMeta(schema=schema, table=table, name=name,
                          ordinal=ordinal, source_type=st, nullable=nullable)

    old = Catalog(tables=[
        TableMeta("S1", "t", (col("S1", "t", "x", 1, "integer"),)),
    ])
    new = Catalog(tables=[
        TableMeta("S1", "t", (col("S1", "t", "x", 1, "integer"),
                              col("S1", "t", "y", 2, "integer"))),
        TableMeta("S2", "t", (col("S2", "t", "x", 1, "varchar"),)),
    ])
    rows = [s for _, s in schema_diff_plan(old, new, "TGT").rows()]
    text = "\n".join(rows)
    # the pre-existing table's ALTER hits the table that actually exists
    assert 'ALTER TABLE "TGT"."T" ADD COLUMN "Y"' in text
    assert "S1_T" not in text
    # only the newly-created table is prefixed
    assert 'CREATE TABLE "TGT"."S2_T"' in text
    # and the collision is announced with the asymmetric policy
    assert any("pre-existing table keeps its unprefixed target" in r
               for r in rows)
