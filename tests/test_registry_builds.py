"""Every registered query must at least BUILD its DataFrame.

The round-6 near-miss this guards: an operator rewrite deleted a function
an existing graded query imports, and nothing in the pytest suite noticed
— only the FULL driver_sim (2 min, run less often) would have. Building
the plan (no execution) catches ImportError, AnalysisException, missing
columns, and signature drift in seconds per query, inside the suite that
runs on every change.

Queries whose construction must execute Spark jobs (driver-side planner
splits: k-means seeding, BPE merge loops, catalog collects) still only do
their bounded driver work at sf0.001 — acceptable; none of them collect
row data.
"""

from pyspark.sql import DataFrame

from database_migration_spark import queries as Q
from tests.conftest import SF_SMOKE


def test_every_registered_query_builds(spark):
    failures = {}
    for name, fn in Q.queries().items():
        try:
            df = fn(spark, SF_SMOKE)
            assert isinstance(df, DataFrame)
            df.schema  # force analysis
        except Exception as e:  # noqa: BLE001 — collecting ALL failures
            failures[name] = f"{type(e).__name__}: {e}"
    assert not failures, (
        f"{len(failures)} queries no longer build: "
        + "; ".join(f"{k} -> {v[:200]}" for k, v in sorted(failures.items()))
    )
