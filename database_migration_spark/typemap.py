"""Source type → Spark type mapping with transfer expressions and warnings.

Canonical spec: /root/reference/mysql_to_exasol.sql:120-199 (type CASE,
default mapping, per-column transfer expression), with per-dialect variants
described in SURVEY.md §1.2. The reference maps everything to Exasol's scalar
types; we map to Spark types, which are a superset for this purpose:

- integers / decimals / bit(M) / money  → DecimalType(p,s)  (p<=38 >= Exasol 36)
- float / real / unconstrained NUMBER   → DoubleType
- bool / tinyint(1) opt-in              → BooleanType
- date                                  → DateType
- datetime(p) (wall clock)              → TimestampNTZType  (p>6 → warning)
- timestamp-with-zone (UTC instant)     → TimestampType
- char/varchar/text/enum/json/xml/uuid  → StringType  (>2M chars → mode)
- fixed binary / rowversion / variable binary → BinaryType (Spark has real
  binary; the reference escapes to hex/base64 text — we keep an option)
- spatial                               → StringType (WKT)
- intervals (opt-in)                    → YearMonthIntervalType / DayTimeIntervalType

Policy knobs reproduce the reference's observable failure modes:
- decimal_overflow: p>36 → CAP (fail loud) | DOUBLE | VARCHAR
  (mysql_to_exasol.sql:120-127)
- temporal_out_of_range: FAIL | NULL | CLAMP (mysql_to_exasol.sql:169-178,
  postgresql_to_exasol.sql:207-219 clamps to 0001-01-01 .. 9999-12-31)
- truncate_long_strings: >2,000,000 chars fail or LEFT-truncate
  (sqlserver_to_exasol.sql:51-54)
- binary_encoding: NATIVE (BinaryType) | HEX | BASE64 text for parity tests
  (mysql_to_exasol.sql:152-153,180)
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

from pyspark.sql import types as T

MAX_DECIMAL_DIGITS = 36  # Exasol cap the reference enforces (mysql:23-25)
MAX_STRING_CHARS = 2_000_000
SPARK_TS_PRECISION = 6  # Spark is microsecond; p in {7,8,9} loses sub-µs


@dataclass(frozen=True)
class TypeMapPolicy:
    decimal_overflow: str = "CAP"  # CAP | DOUBLE | VARCHAR
    temporal_out_of_range: str = "FAIL"  # FAIL | NULL | CLAMP
    truncate_long_strings: bool = False
    binary_encoding: str = "NATIVE"  # NATIVE | HEX | BASE64
    tinyint1_as_bool: bool = False  # mysql_to_exasol.sql:129,133
    intervals_native: bool = False  # else intervals migrate as text
    fold_case: bool = True


@dataclass
class MappedType:
    spark_type: T.DataType
    # SQL expression template applied source-side / at load; "{c}" = column
    transfer_expr: str = "{c}"
    warnings: list[str] = field(default_factory=list)
    lossless: bool = True


_TYPE_RE = re.compile(r"^\s*([a-z0-9_ ]+?)\s*(?:\((\d+)\s*(?:,\s*(\d+))?\))?\s*(unsigned)?\s*$")


def parse_type(raw: str) -> tuple[str, int | None, int | None, bool]:
    """Split 'decimal(10,2) unsigned' → ('decimal', 10, 2, True)."""
    m = _TYPE_RE.match(raw.strip().lower())
    if not m:
        return raw.strip().lower(), None, None, False
    base, p, s, uns = m.groups()
    return base.strip(), int(p) if p else None, int(s) if s else None, bool(uns)


def bits_to_decimal_digits(m_bits: int) -> int:
    """bit(M) → DECIMAL(ceil(M*log10 2), 0) — mysql_to_exasol.sql:141 uses the
    floor(M*0.30103)+1 trick; reproduce exactly."""
    return math.floor(m_bits * 0.30103) + 1


# (base type name) -> handler key. Unlisted types hit the catch-all VARCHAR
# with a loud warning row (mysql_to_exasol.sql:329-332 "-- NOTE: unmapped type").
_INT_DIGITS = {
    "tinyint": 3,
    "smallint": 5,
    "mediumint": 7,
    "int": 10,
    "integer": 10,
    "bigint": 19,
    "int2": 5,
    "int4": 10,
    "int8": 19,
    "serial": 10,
    "bigserial": 19,
    "byteint": 3,
}
_UNSIGNED_EXTRA = {
    "tinyint": 3,
    "smallint": 5,
    "mediumint": 8,
    "int": 10,
    "integer": 10,
    "bigint": 20,
}
_FLOAT_TYPES = {"float", "double", "double precision", "real", "float4", "float8", "binary_double", "binary_float", "number_unconstrained", "decfloat"}
_DATE_TYPES = {"date"}
_DATETIME_TYPES = {"datetime", "datetime2", "timestamp without time zone", "smalldatetime", "timestamp_ntz", "datetime64"}
_TS_TZ_TYPES = {"timestamp", "timestamptz", "timestamp with time zone", "timestamp with local time zone", "datetimeoffset", "timestamp_ltz", "timestamp_tz"}
_STRING_TYPES = {
    "char", "varchar", "character", "character varying", "nchar", "nvarchar",
    "text", "tinytext", "mediumtext", "longtext", "clob", "nclob", "ntext",
    "enum", "set", "json", "jsonb", "xml", "uuid", "uniqueidentifier",
    "string", "varchar2", "nvarchar2", "long", "name", "bpchar", "fixedstring",
    "year", "time", "time with time zone", "time without time zone", "timetz",
    "inet", "cidr", "macaddr", "variant", "object", "array", "map", "tuple",
    "nested", "dynamic", "hierarchyid", "sql_variant", "interval",
}
_FIXED_BINARY_TYPES = {"binary", "raw", "rowversion", "timestamp_rowversion", "hashtype"}
_VAR_BINARY_TYPES = {"varbinary", "blob", "tinyblob", "mediumblob", "longblob", "bytea", "image", "varbyte", "bit varying", "long raw"}
_SPATIAL_TYPES = {"geometry", "geography", "point", "linestring", "polygon", "multipoint", "multilinestring", "multipolygon", "geometrycollection", "st_geometry"}
_BOOL_TYPES = {"bool", "boolean"}


def map_type(
    source_type: str, policy: TypeMapPolicy | None = None
) -> MappedType:
    """Map one raw source type to a Spark type + transfer expression.

    Property the tests enforce (mirrors the reference's no-silent-drop
    invariant): *every* input maps — unknown types land on StringType with a
    warning, never an exception (mysql_to_exasol.sql:329-332).
    """
    policy = policy or TypeMapPolicy()
    base, p, s, unsigned = parse_type(source_type)

    # booleans (incl. opt-in tinyint(1) — mysql_to_exasol.sql:129,133)
    if base in _BOOL_TYPES or (policy.tinyint1_as_bool and base == "tinyint" and p == 1):
        return MappedType(T.BooleanType())

    # bit(M) → DECIMAL(ceil(M log10 2), 0) (mysql_to_exasol.sql:141)
    if base == "bit":
        digits = bits_to_decimal_digits(p or 1)
        return _decimal(digits, 0, policy)

    # integer family → DECIMAL(d, 0) exactly as the reference does
    # (mysql_to_exasol.sql:132-141: tinyint→DECIMAL(3,0) … bigint unsigned→DECIMAL(20,0))
    if base in _INT_DIGITS:
        digits = _UNSIGNED_EXTRA.get(base, _INT_DIGITS[base]) if unsigned else _INT_DIGITS[base]
        mt = _decimal(digits, 0, policy)
        if unsigned and base == "bigint":
            # unsigned bigint overflows a signed 64-bit transfer; the reference
            # CASTs to char source-side (mysql_to_exasol.sql:186-188)
            mt.transfer_expr = "CAST({c} AS CHAR)"
        return mt

    if base in ("decimal", "numeric", "number", "dec", "money", "smallmoney", "decimal32", "decimal64", "decimal128", "decimal256"):
        if base == "money":
            p, s = 19, 4  # sqlserver_to_exasol.sql:279-287
        if base == "smallmoney":
            p, s = 10, 4
        if p is None:  # unconstrained NUMBER → DOUBLE (oracle_to_exasol.sql:446-447)
            return MappedType(T.DoubleType(), lossless=False,
                              warnings=["unconstrained numeric mapped to DOUBLE"])
        return _decimal(p, s or 0, policy)

    if base in _FLOAT_TYPES:
        return MappedType(T.DoubleType())

    if base in _DATE_TYPES:
        return _temporal(T.DateType(), policy)

    if base in _DATETIME_TYPES:
        mt = _temporal(T.TimestampNTZType(), policy)
        if p is not None and p > SPARK_TS_PRECISION:
            mt.warnings.append(
                f"timestamp precision {p} exceeds Spark microseconds; sub-µs lost"
            )
            mt.lossless = False
        return mt

    if base in _TS_TZ_TYPES:
        # normalized to the UTC instant (sqlserver_to_exasol.sql:306,347)
        mt = _temporal(T.TimestampType(), policy)
        if p is not None and p > SPARK_TS_PRECISION:
            mt.warnings.append(
                f"timestamp precision {p} exceeds Spark microseconds; sub-µs lost"
            )
            mt.lossless = False
        return mt

    if base in _FIXED_BINARY_TYPES:
        return _binary(policy, fixed=True)

    if base in _VAR_BINARY_TYPES:
        return _binary(policy, fixed=False)

    if base in _SPATIAL_TYPES:
        # spatial as WKT text (mysql_to_exasol.sql:154,193 st_astext)
        return MappedType(T.StringType(), transfer_expr="ST_ASTEXT({c})")

    if policy.intervals_native and base.startswith("interval year"):
        return MappedType(T.YearMonthIntervalType())
    if policy.intervals_native and base.startswith("interval day"):
        return MappedType(T.DayTimeIntervalType())

    if base in _STRING_TYPES or base.startswith("interval"):
        n = p or (MAX_STRING_CHARS if base not in ("char", "nchar") else 1)
        mt = MappedType(T.StringType())
        if n > MAX_STRING_CHARS:
            if policy.truncate_long_strings:
                mt.transfer_expr = f"LEFT({{c}}, {MAX_STRING_CHARS})"
                mt.warnings.append(f"string length {n} truncated to {MAX_STRING_CHARS}")
                mt.lossless = False
            else:
                mt.warnings.append(
                    f"string length {n} exceeds {MAX_STRING_CHARS}; transfer will FAIL loudly"
                )
        return mt

    # catch-all: VARCHAR(2000000) + loud note (mysql_to_exasol.sql:329-332)
    return MappedType(
        T.StringType(),
        transfer_expr="CAST({c} AS CHAR)",
        warnings=[f"-- NOTE: unmapped type '{source_type}' migrated as text"],
        lossless=False,
    )


def _decimal(p: int, s: int, policy: TypeMapPolicy) -> MappedType:
    """DECIMAL with the reference's 36-digit cap modes (mysql:120-127)."""
    if p <= MAX_DECIMAL_DIGITS:
        return MappedType(T.DecimalType(p, s))
    if policy.decimal_overflow == "DOUBLE":
        return MappedType(T.DoubleType(), lossless=False,
                          warnings=[f"decimal({p},{s}) exceeds {MAX_DECIMAL_DIGITS} digits → DOUBLE"])
    if policy.decimal_overflow == "VARCHAR":
        return MappedType(T.StringType(), transfer_expr="CAST({c} AS CHAR)",
                          lossless=True,
                          warnings=[f"decimal({p},{s}) exceeds {MAX_DECIMAL_DIGITS} digits → text"])
    # CAP: keep DECIMAL(36, s') and fail loudly on overflow at load
    return MappedType(
        T.DecimalType(MAX_DECIMAL_DIGITS, min(s, MAX_DECIMAL_DIGITS)),
        warnings=[
            f"decimal({p},{s}) capped at {MAX_DECIMAL_DIGITS}; values over cap FAIL the load"
        ],
        lossless=False,
    )


def _temporal(dtype: T.DataType, policy: TypeMapPolicy) -> MappedType:
    """Zero-date / out-of-range handling (mysql_to_exasol.sql:169-178,
    postgresql_to_exasol.sql:207-219)."""
    mt = MappedType(dtype)
    if policy.temporal_out_of_range == "NULL":
        mt.transfer_expr = (
            "CASE WHEN {c} < '0001-01-01' OR {c} > '9999-12-31 23:59:59.999999' "
            "THEN NULL ELSE {c} END"
        )
    elif policy.temporal_out_of_range == "CLAMP":
        mt.transfer_expr = (
            "CASE WHEN {c} < '0001-01-01' THEN '0001-01-01' "
            "WHEN {c} > '9999-12-31 23:59:59.999999' THEN '9999-12-31 23:59:59.999999' "
            "ELSE {c} END"
        )
    # FAIL: plain transfer; violations abort the load (counted first by the
    # validator so the error is loud, not a driver stacktrace)
    return mt


def _binary(policy: TypeMapPolicy, fixed: bool) -> MappedType:
    if policy.binary_encoding == "HEX":
        return MappedType(T.StringType(), transfer_expr="HEX({c})")
    if policy.binary_encoding == "BASE64":
        return MappedType(T.StringType(), transfer_expr="TO_BASE64({c})")
    # NATIVE: Spark has a real binary type; the reference's text escape
    # (hex/base64 — mysql:152-153,180) is only needed for Exasol parity.
    return MappedType(T.BinaryType())


def map_columns(columns, policy: TypeMapPolicy | None = None):
    """Map a sequence of ColumnMeta → list of (ColumnMeta, MappedType)."""
    policy = policy or TypeMapPolicy()
    out = []
    for col in columns:
        raw = col.source_type
        if col.precision is not None and "(" not in raw:
            if col.scale is not None:
                raw = f"{raw}({col.precision},{col.scale})"
            else:
                raw = f"{raw}({col.precision})"
        out.append((col, map_type(raw, policy)))
    return out
