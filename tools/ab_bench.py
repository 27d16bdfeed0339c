#!/usr/bin/env python3
"""Interleaved same-session A/B bench of two code trees.

The repo's per-round bench totals are recorded hours apart, and the host
shows multi-hour floor drift (documented in bench.py) — so a round-over-
round total alone cannot distinguish plan changes from host eras. This
tool removes the confound: passes alternate A,B,A,B,... over a fixed
query subset in ONE Spark session, purging the package's module
namespace and swapping sys.path between passes (both trees share the
package name). Per-query min-of-n from interleaved passes compares the
two code versions on identical host state; unchanged control queries
should sit at ~1.0x, bounding the noise band around the changed ones.

Usage:
  git worktree add /tmp/oldcode <old-commit>
  python3 tools/ab_bench.py /tmp/oldcode /root/repo q1 q2 ... [--passes 3]

CAVEAT — executor-side code is NOT swapped between passes: the session
pins the worker PYTHONPATH to tree B's root at JVM start, and module-
level pandas_udfs / mapInPandas helper globals are cloudpickled BY
REFERENCE, so workers resolve them from tree B in BOTH passes. The tool
compares DRIVER-side plan construction and plan SHAPE; a change living
inside an executor-side Python kernel body reads ~1.00x here and must be
A/B'd with separate processes per tree instead (round-9 review).

Round-5 result (r4 @47a708a vs r5 HEAD, 3 interleaved passes, sf0.1):
changed-set total 23.2 -> 15.4 s (0.66x) with all five unchanged
controls inside 0.93-1.05x — the round-5 speedups are plan work, not
host era. Detail in SCALE.md.
"""
from __future__ import annotations

import importlib
import json
import os
import sys
import time

argv = sys.argv[1:]
passes = 3
if "--passes" in argv:
    i = argv.index("--passes")
    if i + 1 >= len(argv) or not argv[i + 1].isdigit():
        raise SystemExit("usage: ab_bench.py TREE_A TREE_B [q ...] --passes N")
    passes = int(argv[i + 1])
    argv = argv[:i] + argv[i + 2 :]
keep_state = "--keep-state" in argv
if keep_state:
    argv.remove("--keep-state")
if len(argv) < 2:
    raise SystemExit("usage: ab_bench.py TREE_A TREE_B [q ...] [--passes N]")
# abspath both trees: __spark_entry__ rewrites sys.path[0] to an abspath,
# and --keep-state identifies trees by exact string match against it — a
# trailing slash / relative spelling silently degraded keep-state to the
# cold purge path (round-9 review)
tree_a, tree_b = os.path.abspath(argv[0]), os.path.abspath(argv[1])
subset = argv[2:]
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

sys.path.insert(0, tree_b)
from kafka_connect_storage_cloud_formats_spark.session import get_spark  # noqa: E402

spark = get_spark("ab_bench")


_PKG_PREFIXES = ("kafka_connect_storage_cloud_formats_spark", "__spark_entry__")
_STASH: dict[str, dict] = {}  # tree -> its module-dict snapshot


def _pkg_modules() -> list[str]:
    return [
        k
        for k in sys.modules
        if k.startswith(_PKG_PREFIXES[0]) or k == _PKG_PREFIXES[1]
    ]


def load_entry(tree: str, keep_state: bool = False):
    """Make ``tree``'s package the importable one. Default: purge the
    namespace (each pass starts module-cold — right for comparing pure
    plan changes). ``keep_state``: STASH the outgoing tree's module dict
    and restore ``tree``'s previous one, so per-tree module-level state
    (session caches, memos) survives across passes — right when the
    change under test IS cross-call state, which bench.py's single
    process would keep too; module identity stays per-tree, so lazy
    imports inside functions still resolve against their own tree."""
    current = sys.path[0]
    if keep_state and current == tree:
        # same tree both slots (the self-control configuration): keeping
        # state means KEEP it — the old else-branch purged here, so the
        # control ran module-cold while a real A/B ran state-warm, biasing
        # exactly the cross-call-state comparison --keep-state exists for
        return importlib.import_module("__spark_entry__")
    if keep_state and current in (tree_a, tree_b):
        _STASH[current] = {m: sys.modules.pop(m) for m in _pkg_modules()}
    else:
        for m in _pkg_modules():
            del sys.modules[m]
    sys.path[0] = tree
    if keep_state and tree in _STASH:
        sys.modules.update(_STASH.pop(tree))
    return importlib.import_module("__spark_entry__")


results: dict = {}
for p in range(passes):
    for tag, tree in (("A", tree_a), ("B", tree_b)):
        qs = load_entry(tree, keep_state=keep_state).queries()
        names = subset or list(qs)
        for name in names:
            if name not in qs:
                # present in only one tree's registry (renamed/new query):
                # report one-sided below rather than KeyError-ing the run
                print(f"# pass{p + 1} {tag}: no {name} in this tree", file=sys.stderr)
                continue
            t0 = time.perf_counter()
            try:
                qs[name](spark, SF).count()
            except Exception as exc:  # keep every timing collected so far
                print(f"# pass{p + 1} {tag} {name} FAILED: {exc}", file=sys.stderr)
                continue
            results.setdefault(name, {}).setdefault(tag, []).append(
                time.perf_counter() - t0
            )
            spark.catalog.clearCache()
        print(f"# pass{p + 1} {tag} done", file=sys.stderr)

print(f"{'query':34s} {'A min':>7s} {'B min':>7s}  B/A")
tot_a = tot_b = 0.0
out = {}
for name in results:
    # one-sided queries (missing from a tree, or every trial failed on one
    # side) are reported but excluded from the ratio/total (round-5 ADVICE:
    # the unconditional indexing lost the whole run on a mid-run failure)
    sa, sb = results[name].get("A"), results[name].get("B")
    a = min(sa) if sa else None
    b = min(sb) if sb else None
    # `is not None`, not truthiness: a legitimate 0.0 s minimum is a sample,
    # not a missing side (round-6 ADVICE)
    out[name] = {
        "A": round(a, 3) if a is not None else None,
        "B": round(b, 3) if b is not None else None,
    }
    if a is None or b is None:
        side = "A" if a is None else "B"
        print(f"{name:34s} {'--' if a is None else f'{a:.2f}':>7s} "
              f"{'--' if b is None else f'{b:.2f}':>7s}  (no {side} samples)")
        continue
    tot_a += a
    tot_b += b
    print(f"{name:34s} {a:7.2f} {b:7.2f}  {b / a:5.2f}x")
if tot_a > 0:
    print(f"{'TOTAL':34s} {tot_a:7.2f} {tot_b:7.2f}  {tot_b / tot_a:5.2f}x")
json.dump(out, open("/tmp/ab_bench.json", "w"), indent=1)
