#!/usr/bin/env python3
"""One-session sweep over every registered query's optimized plan.

Emits a TSV (query, bench_sec, exchanges, smj, bhj, bnlj, cartesian,
arrow_eval, batch_eval, generate, window, sort) sorted by bench seconds —
the round's optimization checklist (guide §1: measure first, then read the
plan shape). Plans are built at sf0.1 unless SPARK_GRAFT_SF_DIR overrides.

Usage: python3 tools/plan_sweep.py [out.tsv]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

FEATURES = [
    ("exchanges", r"\bExchange\b"),
    ("smj", r"\bSortMergeJoin\b"),
    ("bhj", r"\bBroadcastHashJoin\b"),
    ("bnlj", r"\bBroadcastNestedLoopJoin\b"),
    ("cartesian", r"\bCartesianProduct\b"),
    ("arrow_eval", r"\bArrowEvalPython\b"),
    ("batch_eval", r"\bBatchEvalPython\b"),
    ("generate", r"\bGenerate\b"),
    ("window", r"\bWindow\b"),
    ("sort", r"\bSort\b"),
]


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/plan_sweep.tsv"
    import __spark_entry__ as entry_mod
    from kafka_connect_storage_cloud_formats_spark import get_spark

    bench = {}
    if os.path.exists("BENCH.json"):
        bench = json.load(open("BENCH.json")).get("queries", {})

    spark = get_spark("plan_sweep")
    queries = entry_mod.queries()
    rows = []
    for name, fn in queries.items():
        try:
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — sweep must survive one bad row
            print(f"!! {name}: {exc}", file=sys.stderr)
            continue
        counts = {k: len(re.findall(p, plan)) for k, p in FEATURES}
        rows.append((name, bench.get(name, float("nan")), counts))
    rows.sort(key=lambda r: -(r[1] if r[1] == r[1] else -1))
    with open(out_path, "w") as f:
        hdr = ["query", "bench_sec"] + [k for k, _ in FEATURES]
        f.write("\t".join(hdr) + "\n")
        for name, sec, counts in rows:
            f.write(
                "\t".join(
                    [name, f"{sec:.2f}"] + [str(counts[k]) for k, _ in FEATURES]
                )
                + "\n"
            )
    print(f"wrote {out_path} ({len(rows)} rows)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
