#!/usr/bin/env python3
"""Benchmark driver: runs the engine's headline queries and prints ONE JSON
line ``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

Env:
  SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] parallelism (default all cores)

Each query is executed to completion (a count over the result — forces the
full plan without driver-side collect of wide rows).  Wall-clock per query +
total are reported; the driver compares against BASELINE.md.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def infer_sf(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    try:
        return float(m.group(1).rstrip(".")) if m else 0.0
    except ValueError:
        return 0.0


def main() -> int:
    import __spark_entry__ as entry_mod
    from kafka_connect_storage_cloud_formats_spark import get_spark

    spark = get_spark("bench")
    queries = entry_mod.queries()

    # min of 3 executions per query: the first also pays one-time Janino/C2
    # compilation for the query's generated code, and the shared host shows
    # sporadic multi-second (sometimes multi-minute) stall windows unrelated
    # to the plan; min-of-N reports the steady-state cost a long-running
    # cluster sees. The trials run as three INTERLEAVED full passes —
    # back-to-back trials of one query land in the same stall window
    # (correlated noise: min-of-N can't help), while passes separated by the
    # rest of the suite sample different windows. Three passes (round-6
    # verdict ask #3) make the drop-worst trimmed series real: with two, the
    # "trimmed mean" was a plain mean and one host stall inflated it (r6:
    # 78.5 s trimmed vs 54.6 s min — pure stall artifact). Queries still
    # slow after all passes get ONE bounded extra trial in a final retry
    # pass.
    samples: dict[str, list[float]] = {}
    rows: dict[str, int] = {}

    def trial(name, fn, tag) -> None:
        t0 = time.perf_counter()
        rows[name] = fn(spark, SF_DIR).count()
        secs = time.perf_counter() - t0
        samples.setdefault(name, []).append(secs)
        # Stream each trial as it completes: if the run wedges or is killed
        # mid-pass (the documented host stall windows), stderr still shows
        # which query it died in and every timing up to that point.
        print(f"# [{tag}] {name}: {rows[name]} rows in {secs:.2f}s", file=sys.stderr)
        # Operators may cache intermediates; drop them so trials are
        # independent.
        spark.catalog.clearCache()

    for _pass in range(3):
        for name, fn in queries.items():
            trial(name, fn, f"pass{_pass + 1}")
        # Provisional snapshot after every COMPLETE pass: a run killed
        # mid-pass (driver timeout, host stall era) still leaves a
        # parseable BENCH.json from the finished passes instead of
        # nothing (the round-2 driver tail-truncation lesson, applied to
        # the on-disk artifact).
        _write_payload(samples, list(queries), passes_done=_pass + 1)
    for name, fn in queries.items():  # bounded retry pass for the slow tail
        if min(samples[name]) > 2.0:
            trial(name, fn, "retry")

    doc = _write_payload(samples, list(queries))
    for name in queries:
        print(
            f"# {name}: {rows[name]} rows min={doc['queries'][name]:.2f}s "
            f"trimmed={doc['queries_trimmed_mean'][name]:.2f}s "
            f"(n={len(samples[name])})",
            file=sys.stderr,
        )
    # Full per-query map goes to disk; stdout's LAST line is the parseable
    # contract. The driver keeps only a 2000-char tail of the output and
    # parses the final JSON line from it (measured: every BENCH_r*.json
    # records exactly len(tail)==2000, and r02's 3.9 KB per-query line came
    # back head-truncated with parsed=null) — so the FULL 134-query map
    # (>=3.7 KB with these names) can never ride the line. Compromise
    # (round-15 verdict ask #1, adapted to the measured buffer): emit a
    # CAPPED per-query min map — slowest queries first, as many as fit a
    # ~1.85 KB budget — plus cpus/sf, so PERF can compute per-query deltas
    # and 8-vs-32-core scaling over the rows that dominate wall-clock.
    # The complete map still lands in BENCH.json (unchanged).
    payload = {
        "metric": "total_query_wall_clock",
        "value": doc["value"],
        "unit": "sec",
        "total_trimmed_mean": doc["total_trimmed_mean"],
        "sf": doc["sf"],
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", ""),
        "n_queries": len(doc["queries"]),
        "queries": {},
        "queries_omitted": 0,
        "detail": "BENCH.json",
    }
    by_cost = sorted(doc["queries"], key=lambda n: (-doc["queries"][n], n))
    for i, name in enumerate(by_cost):
        payload["queries"][name] = doc["queries"][name]
        payload["queries_omitted"] = len(by_cost) - i - 1
        if len(json.dumps(payload, separators=(",", ":"))) > 1850:
            del payload["queries"][name]
            payload["queries_omitted"] = len(by_cost) - i
            break
    compact = json.dumps(payload, separators=(",", ":"))
    sys.stdout.flush()
    print(compact)
    sys.stdout.flush()
    return 0


def _write_payload(
    samples: dict, names: list, passes_done: int | None = None
) -> dict:
    """Compute the dual series and write BENCH.json. Two series per query
    so a judge can separate plan changes from host state without
    re-deriving it from tails (r4 verdict ask #7):
    - min-of-n: the steady-state floor (immune to stall windows, but a
      floor shift between rounds can be either plan or host).
    - trimmed mean: mean after dropping the single worst sample (real at
      the standard n=3 — one stall-window sample per query is absorbed);
      if min moves but trimmed doesn't (or vice versa), the difference is
      host noise, not the plan. The n<3 plain-mean fallback applies only
      to truncated runs, which are marked by ``passes_done``."""
    done = [n for n in names if samples.get(n)]
    timings = {n: round(min(samples[n]), 3) for n in done}

    def trimmed(xs: list) -> float:
        keep = sorted(xs)[:-1] if len(xs) >= 3 else xs
        return sum(keep) / len(keep)

    timings_trimmed = {n: round(trimmed(samples[n]), 3) for n in done}
    doc = {
        "metric": "total_query_wall_clock",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "queries_trimmed_mean": timings_trimmed,
        "total_trimmed_mean": round(sum(timings_trimmed.values()), 3),
        "sf": infer_sf(SF_DIR),
    }
    if passes_done is not None:
        doc["passes_done"] = passes_done  # provisional mid-run snapshot
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(json.dumps(doc) + "\n")
    os.replace(tmp, path)
    return doc


if __name__ == "__main__":
    raise SystemExit(main())
