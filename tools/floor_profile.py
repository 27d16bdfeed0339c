#!/usr/bin/env python3
"""One-off floor profiler: for each registered query, separate the warm
per-trial cost into (a) Python plan-build time (the ``fn(spark, sf_dir)``
call — pure driver/py4j work, no job) and (b) action time (``.count()``).
Prints a sorted table + aggregate so floor work (verdict r8 ask #1) can be
attributed before any change is made.

Usage: python3 tools/floor_profile.py [sf_dir] [--names a,b,c]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.1"
ONLY = None
if "--names" in sys.argv:
    ONLY = set(sys.argv[sys.argv.index("--names") + 1].split(","))


def main() -> int:
    import __spark_entry__ as entry_mod
    from kafka_connect_storage_cloud_formats_spark import get_spark

    from kafka_connect_storage_cloud_formats_spark.queries import registry

    spark = get_spark("floor_profile")
    queries = entry_mod.queries()
    if ONLY:
        queries = {k: v for k, v in queries.items() if k in ONLY}

    # warmup pass (uncounted): pays Janino/codegen/artifact builds
    for name, fn in queries.items():
        fn(spark, SF_DIR).count()
        spark.catalog.clearCache()

    rows = []
    for name, fn in queries.items():
        best = (1e9, 0.0, 0.0)
        for _ in range(2):
            # This tool attributes the COLD plan-build floor; the
            # registry's prepared-plan cache (round 9) would otherwise
            # turn every timed fn() into a ~1 ms hit and the build column
            # into noise. Clearing it per trial measures what a fresh
            # session pays (bench.py measures the cached steady state).
            registry._PLAN_CACHE.clear()
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            spark.catalog.clearCache()
            if (t2 - t0) < best[0]:
                best = (t2 - t0, t1 - t0, t2 - t1)
        rows.append((name, *best))

    rows.sort(key=lambda r: -r[1])
    tot = sum(r[1] for r in rows)
    tot_build = sum(r[2] for r in rows)
    tot_exec = sum(r[3] for r in rows)
    print(f"{'query':38s} {'total':>7s} {'build':>7s} {'exec':>7s}")
    for name, t, b, e in rows:
        print(f"{name:38s} {t:7.3f} {b:7.3f} {e:7.3f}")
    print(f"{'TOTAL':38s} {tot:7.3f} {tot_build:7.3f} {tot_exec:7.3f}  (n={len(rows)})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
