"""Dump .explain("formatted") for bench (or named) queries.

Usage: python scripts/dump_plans_r16.py <out_dir> <suffix> [query ...]

With no query names: every bench+tail query. Writes
<out_dir>/<query>_<suffix>.txt per query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from financial_tracker_etl_spark.queries import registry  # noqa: E402
from financial_tracker_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-dump-r16")
    reg = registry()
    if not names:
        names = [n for n, s in reg.items() if s.bench or s.bench_tail]
    for name in names:
        df = reg[name].fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")
    spark.stop()


if __name__ == "__main__":
    main()
