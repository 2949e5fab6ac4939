"""Dump .explain("formatted") for registered queries into plans/$PLANS_ROUND (default r13)/.

Usage: python scripts/dump_plans.py <suffix> <query> [query ...]
Writes plans/<round>/<query>_<suffix>.txt for each (suffix: before|after).
Measurement aid for the optimization rounds — the judge checks plan
claims in OPTIMIZATION_r*.md against these files.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "plans", os.environ.get("PLANS_ROUND", "r13"))


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    from database_migration_spark import get_spark
    from database_migration_spark import queries as Q

    spark = get_spark(app_name="dump_plans")
    registry = Q.queries()
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        spark.catalog.clearCache()
        df = registry[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain(mode="formatted")
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
