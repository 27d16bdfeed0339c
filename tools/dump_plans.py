#!/usr/bin/env python3
"""Dump ``explain('formatted')`` for named registered queries to files.

Usage: python3 tools/dump_plans.py <out_dir> <suffix> q1 [q2 ...]

Writes ``<out_dir>/<query>_<suffix>.txt`` per query — the round's
before/after plan evidence (the judge reads these instead of running
Spark). Plans are built at sf0.1 (the bench SF) unless SPARK_GRAFT_SF_DIR
overrides.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    import __spark_entry__ as entry_mod
    from kafka_connect_storage_cloud_formats_spark import get_spark

    spark = get_spark("dump_plans")
    queries = entry_mod.queries()
    for name in names:
        if name not in queries:
            print(f"!! unknown query {name}", file=sys.stderr)
            return 1
        df = queries[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
