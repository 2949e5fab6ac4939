"""Type-mapping property tests: every source type maps, catch-all catches,
cap/overflow modes behave per the reference spec (SURVEY.md §1.2)."""

from hypothesis import given, strategies as st
from pyspark.sql import types as T

from database_migration_spark.typemap import (
    MAX_DECIMAL_DIGITS,
    TypeMapPolicy,
    bits_to_decimal_digits,
    map_type,
    parse_type,
)


def test_integer_family_exact_digits():
    # mysql_to_exasol.sql:132-141
    assert map_type("tinyint").spark_type == T.DecimalType(3, 0)
    assert map_type("smallint").spark_type == T.DecimalType(5, 0)
    assert map_type("int").spark_type == T.DecimalType(10, 0)
    assert map_type("bigint").spark_type == T.DecimalType(19, 0)
    assert map_type("bigint unsigned").spark_type == T.DecimalType(20, 0)
    assert "CAST" in map_type("bigint unsigned").transfer_expr


def test_bit_log10_trick():
    # floor(M*0.30103)+1 — mysql_to_exasol.sql:141
    assert bits_to_decimal_digits(1) == 1
    assert bits_to_decimal_digits(8) == 3
    assert bits_to_decimal_digits(64) == 20
    assert map_type("bit(64)").spark_type == T.DecimalType(20, 0)


def test_decimal_overflow_modes():
    # mysql_to_exasol.sql:120-127
    cap = map_type("decimal(38,4)", TypeMapPolicy(decimal_overflow="CAP"))
    assert cap.spark_type == T.DecimalType(MAX_DECIMAL_DIGITS, 4)
    assert cap.warnings and not cap.lossless
    dbl = map_type("decimal(38,4)", TypeMapPolicy(decimal_overflow="DOUBLE"))
    assert dbl.spark_type == T.DoubleType()
    txt = map_type("decimal(38,4)", TypeMapPolicy(decimal_overflow="VARCHAR"))
    assert txt.spark_type == T.StringType()


def test_temporal_modes():
    # mysql_to_exasol.sql:169-178, postgresql_to_exasol.sql:207-219
    fail = map_type("datetime", TypeMapPolicy(temporal_out_of_range="FAIL"))
    assert fail.transfer_expr == "{c}"
    null = map_type("datetime", TypeMapPolicy(temporal_out_of_range="NULL"))
    assert "THEN NULL" in null.transfer_expr
    clamp = map_type("date", TypeMapPolicy(temporal_out_of_range="CLAMP"))
    assert "'0001-01-01'" in clamp.transfer_expr


def test_timestamp_kinds_and_precision():
    assert map_type("datetime(3)").spark_type == T.TimestampNTZType()
    assert map_type("timestamp").spark_type == T.TimestampType()
    p9 = map_type("datetime(9)")
    assert not p9.lossless and "precision 9" in p9.warnings[0]


def test_binary_modes():
    assert map_type("varbinary(100)").spark_type == T.BinaryType()
    assert map_type("blob", TypeMapPolicy(binary_encoding="HEX")).transfer_expr == "HEX({c})"
    b64 = map_type("blob", TypeMapPolicy(binary_encoding="BASE64"))
    assert b64.transfer_expr == "TO_BASE64({c})"


def test_bool_and_tinyint1():
    assert map_type("boolean").spark_type == T.BooleanType()
    assert map_type("tinyint(1)").spark_type == T.DecimalType(3, 0)
    assert (
        map_type("tinyint(1)", TypeMapPolicy(tinyint1_as_bool=True)).spark_type
        == T.BooleanType()
    )


def test_spatial_and_unknown():
    geo = map_type("geometry")
    assert geo.spark_type == T.StringType() and "ST_ASTEXT" in geo.transfer_expr
    unk = map_type("some_exotic_udt")
    assert unk.spark_type == T.StringType()
    assert any("unmapped" in w for w in unk.warnings)


@given(
    st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Nd"), whitelist_characters=" _()"),
        min_size=1,
        max_size=30,
    )
)
def test_every_input_maps_without_exception(raw):
    # no-silent-drop invariant: map_type never raises, always yields a type
    mt = map_type(raw)
    assert mt.spark_type is not None


def test_parse_type():
    assert parse_type("decimal(10,2) unsigned") == ("decimal", 10, 2, True)
    assert parse_type("VARCHAR(255)") == ("varchar", 255, None, False)
    assert parse_type("double precision") == ("double precision", None, None, False)
