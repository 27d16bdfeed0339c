#!/usr/bin/env python3
"""Physical-plan audit over every registered query.

For each ``__spark_entry__.queries()`` entry, inspects the executed plan and
reports: join strategies, shuffle (Exchange) count, scan pushdown
(PushedFilters / ReadSchema), and flags plans that would not survive scale:

- ``BroadcastNestedLoopJoin`` / ``CartesianProduct`` — O(n·m) row pairing.
  Allowed only for operators whose *contract* is a bounded cross product
  (brute-force kNN baseline: tiny broadcast query side × corpus; IVF
  centroid assignment: queries × n_labels).

Usage: python3 tools/plan_audit.py [sf_dir]  — exits 1 on violations.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

# Operators whose spec is an intentional bounded cross product (documented in
# their docstrings); everything else must be equi-join only.
ALLOWED_NESTED = {
    # knn_bruteforce no longer appears here: its mapInPandas formulation
    # (query matrix as a captured constant, per-batch exact top-k) has no
    # nested-loop join at all.
    "ivf_topk",  # Q × n_labels centroid assignment, centroids broadcast
    "ivf_topk_pruned",  # same assignment stage against the materialized index
    "ann_recall_at_10",  # 1-row recall-ratio cross + composed baselines
    "sq8_recall_at_10",  # same 1-row recall-ratio cross for the int8 tier
}

# Queries that fold a GLOBAL SCALAR into the plan via crossJoin(broadcast(
# 1-row aggregate)) — the canonical single-plan scalar-subquery shape (no
# driver-side collect). The BroadcastNestedLoopJoin it produces is O(1 × N):
# bounded by construction, safe at any scale.
ALLOWED_SCALAR_CROSS = {
    "q22_rich_inactive_customers",  # avg(c_acctbal) threshold
    "q11_important_parts",  # avg(part_value) threshold
    "doc_quality_deciles",  # 9 percentile_disc boundaries, 1 row
}


def audit(name: str, df) -> tuple[list[str], dict]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    stats = {
        "joins": sorted(set(re.findall(r"(\w*(?:HashJoin|MergeJoin|NestedLoopJoin|CartesianProduct))", plan))),
        "exchanges": len(re.findall(r"\bExchange (?:hash|range|SinglePartition)", plan)),
        "scans": len(re.findall(r"FileScan|BatchScan", plan)),
        "pushed": len(re.findall(r"PushedFilters: \[[^\]]", plan)),
    }
    problems = []
    if name not in ALLOWED_NESTED and name not in ALLOWED_SCALAR_CROSS:
        for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
            if bad in plan:
                problems.append(bad)
    return problems, stats


def main() -> int:
    import __spark_entry__ as entry_mod
    from kafka_connect_storage_cloud_formats_spark import get_spark

    spark = get_spark("plan_audit")
    failures = 0
    for name, fn in entry_mod.queries().items():
        try:
            df = fn(spark, SF_DIR)
            problems, stats = audit(name, df)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: {e}")
            failures += 1
            continue
        tag = "FAIL " if problems else "ok   "
        if problems:
            failures += 1
        print(
            f"{tag} {name}: joins={','.join(stats['joins']) or '-'} "
            f"exchanges={stats['exchanges']} scans={stats['scans']} "
            f"pushed_filter_scans={stats['pushed']}"
            + (f"  VIOLATIONS={problems}" if problems else "")
        )
    print("RESULT:", "FAIL" if failures else "PASS")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
