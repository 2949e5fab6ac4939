"""Guard against decstr-scale drift between Spark queries and their oracles.

decstr(col, s) renders a measure as CAST(CAST(x AS DECIMAL(38,s)) AS VARCHAR)
on the Spark side; every oracle hand-writes the matching DECIMAL(38,s). The
two scales live in different places per query, and drift produces a silent
value-hash mismatch discovered only at sim time. This test runs each query
whose oracle declares DECIMAL(38,s) aliases at the smoke SF and asserts the
Spark output strings carry exactly s fractional digits.
"""

import re

import pytest

from database_migration_spark import queries as Q

SF = "/root/testdata/sf0.001"

# `CAST(CAST(... AS DECIMAL(38,s)) AS VARCHAR) AS alias` — the decstr contract
_ORACLE_DEC = re.compile(
    r"AS DECIMAL\(38,(\d+)\)\) AS VARCHAR\)\s+AS\s+(\w+)", re.IGNORECASE
)


def _declared_scales() -> dict[str, dict[str, int]]:
    out: dict[str, dict[str, int]] = {}
    for name, sql in Q.oracle_sql().items():
        pairs = {alias: int(scale) for scale, alias in _ORACLE_DEC.findall(sql)}
        if pairs:
            out[name] = pairs
    return out


DECLARED = _declared_scales()


def test_some_queries_declare_decimal_strings():
    # the pattern is in active use — if this drops to zero the regex broke,
    # not the queries
    assert len(DECLARED) >= 8


@pytest.mark.parametrize("name", sorted(DECLARED))
def test_spark_scale_matches_oracle_scale(spark, name):
    df = Q.queries()[name](spark, SF)
    cols = df.columns
    # intermediate CTE aliases (mig_check wide rows) get unpivoted into
    # text metric rows — their scale parity is covered by the sim's value
    # hash; this test pins the DIRECT output columns
    direct = {a: s for a, s in DECLARED[name].items() if a in cols}
    if not direct:
        pytest.skip(f"{name}: decimal aliases are CTE-internal only")
    rows = df.limit(50).collect()
    assert rows, f"{name} returned nothing at smoke SF"
    for alias, scale in direct.items():
        idx = cols.index(alias)
        seen = [r[idx] for r in rows if r[idx] is not None]
        assert seen, f"{name}.{alias}: all-null at smoke SF, scale unverifiable"
        for v in seen:
            frac = v.split(".")[1] if "." in v else ""
            assert len(frac) == scale, (
                f"{name}.{alias}: oracle says DECIMAL(38,{scale}) but Spark "
                f"emits {v!r} ({len(frac)} fractional digits) — decstr scale drift"
            )
