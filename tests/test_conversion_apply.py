"""Apply-mode parity for the post-load optimizers: proposals → the
reference's ordered ALTER statement stream (convert_datatypes.sql:49-62
apply path; :651 'DROP FKs first, MODIFYs, RE-ADD FKs last')."""

from database_migration_spark.catalog import KeyMeta
from database_migration_spark.operators.optimize_types import (
    TypeProposal,
    conversion_statements,
)

GOLDEN = """\
-- ============ DROP FOREIGN KEYS ============
ALTER TABLE "S"."LINEITEM" DROP CONSTRAINT "LINEITEM_FK_ORDERS";
-- ============ TYPE CONVERSIONS ============
-- lineitem.l_quantity: double --> DECIMAL(12,2) (all values round-trip at scale 2)
ALTER TABLE "S"."LINEITEM" MODIFY ("L_QUANTITY" DECIMAL(12,2));
-- orders.o_orderkey: varchar --> DECIMAL(18,0) (all values integer)
ALTER TABLE "S"."ORDERS" MODIFY ("O_ORDERKEY" DECIMAL(18,0));
-- ============ RE-ADD FOREIGN KEYS ============
ALTER TABLE "S"."LINEITEM" ADD CONSTRAINT "LINEITEM_FK_ORDERS" FOREIGN KEY ("L_ORDERKEY") REFERENCES "S"."ORDERS" ("O_ORDERKEY") DISABLE;"""


def _fk():
    return KeyMeta(
        schema="s",
        table="lineitem",
        name="lineitem_fk_orders",
        kind="FOREIGN KEY",
        columns=("l_orderkey",),
        ref_schema="s",
        ref_table="orders",
        ref_columns=("o_orderkey",),
    )


def test_conversion_statement_stream_golden():
    proposals = {
        ("orders", "o_orderkey"): TypeProposal(
            "o_orderkey", "varchar", "DECIMAL(18,0)",
            'CAST("o_orderkey" AS DECIMAL(18,0))', "all values integer",
        ),
        ("lineitem", "l_quantity"): TypeProposal(
            "l_quantity", "double", "DECIMAL(12,2)",
            'CAST("l_quantity" AS DECIMAL(12,2))',
            "all values round-trip at scale 2",
        ),
        # inspected-but-kept column: must not render anything
        ("orders", "o_comment"): None,
    }
    plan = conversion_statements(proposals, fks=[_fk()], schema="s")
    assert plan.to_sql() == GOLDEN


def test_modify_unqualified_without_schema():
    # legacy path: no schema given → unqualified MODIFY (caller must pin
    # the session schema before executing)
    proposals = {
        ("orders", "o_orderkey"): TypeProposal(
            "o_orderkey", "varchar", "DECIMAL(18,0)",
            'CAST("o_orderkey" AS DECIMAL(18,0))', "all values integer",
        ),
    }
    sql = conversion_statements(proposals).to_sql()
    assert 'ALTER TABLE "ORDERS" MODIFY ("O_ORDERKEY" DECIMAL(18,0));' in sql


def test_fk_drop_only_when_touched():
    # conversion on a column no FK touches: no DROP/RE-ADD sections
    proposals = {
        ("part", "p_retailprice"): TypeProposal(
            "p_retailprice", "double", "DECIMAL(12,2)",
            'CAST("p_retailprice" AS DECIMAL(12,2))',
            "all values round-trip at scale 2",
        ),
    }
    plan = conversion_statements(proposals, fks=[_fk()])
    sql = plan.to_sql()
    assert "DROP CONSTRAINT" not in sql
    assert "ADD CONSTRAINT" not in sql
    assert 'ALTER TABLE "PART" MODIFY ("P_RETAILPRICE" DECIMAL(12,2));' in sql


def test_fk_on_referenced_side_triggers_drop():
    # the FK's PARENT column converts → the FK still has to drop/re-add
    proposals = {
        ("orders", "o_orderkey"): TypeProposal(
            "o_orderkey", "varchar", "DECIMAL(18,0)",
            'CAST("o_orderkey" AS DECIMAL(18,0))', "all values integer",
        ),
    }
    plan = conversion_statements(proposals, fks=[_fk()])
    sql = plan.to_sql()
    assert sql.index("DROP CONSTRAINT") < sql.index("MODIFY")
    assert sql.index("MODIFY") < sql.index("ADD CONSTRAINT")


def test_empty_proposals_render_note():
    plan = conversion_statements({("orders", "o_comment"): None})
    assert "no conversions proposed" in plan.to_sql()


def test_fold_case_off_preserves_identifiers():
    proposals = {
        ("Orders", "OrderKey"): TypeProposal(
            "OrderKey", "varchar", "DECIMAL(18,0)",
            'CAST("OrderKey" AS DECIMAL(18,0))', "all values integer",
        ),
    }
    sql = conversion_statements(proposals, fold_case=False).to_sql()
    assert 'ALTER TABLE "Orders" MODIFY ("OrderKey" DECIMAL(18,0));' in sql
