#!/usr/bin/env python3
"""Registry-rotation helper: computes next round's driver-window ordering.

The driver's correctness gate checks a positional window of the FIRST 50
registry entries each round. Evidence hygiene therefore demands a rotation
every round: queries whose only driver rows are old, plus queries whose
implementation changed this round, must lead the registry so they earn
fresh rows (tests/test_registry.py enforces this mechanically, keyed on
``registry.ROTATED_FOR_ROUND``).

This tool reads every ``CORRECTNESS_r*.json``, reports each query's latest
evidence round, and prints the ``_STALE_AFTER_R{N}`` list to paste into
``queries/registry.py`` — append the round's ``_CHANGED_THIS_ROUND`` by
hand (only the author knows what changed) and bump ``ROTATED_FOR_ROUND``.

Usage: python3 tools/rotate_registry.py [--window 50]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW = 50
if "--window" in sys.argv:
    WINDOW = int(sys.argv[sys.argv.index("--window") + 1])


def main() -> int:
    from kafka_connect_storage_cloud_formats_spark.queries.registry import (
        QUERIES,
        ROTATED_FOR_ROUND,
    )

    evidence: dict[str, int] = {}
    latest_round = 0
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", f).group(1))
        latest_round = max(latest_round, rnd)
        for name in json.load(open(f)):
            evidence[name] = max(evidence.get(name, 0), rnd)

    names = list(QUERIES)
    never = [n for n in names if n not in evidence]
    by_round: dict[int, list[str]] = {}
    for n in names:
        if n in evidence:
            by_round.setdefault(evidence[n], []).append(n)

    print(f"# registered queries: {len(names)}; latest driver round: r{latest_round}; "
          f"ROTATED_FOR_ROUND={ROTATED_FOR_ROUND}")
    for rnd in sorted(by_round):
        print(f"#   evidenced r{rnd:02d}: {len(by_round[rnd])} queries")
    if never:
        print(f"#   NEVER evidenced: {never}")

    # stale = everything not evidenced by the latest round, oldest first
    stale = never + [
        n for rnd in sorted(by_round) if rnd < latest_round for n in by_round[rnd]
    ]
    print(f"\n# stale set for the next rotation ({len(stale)} of window {WINDOW}):")
    print(f"_STALE_AFTER_R{latest_round} = [")
    for n in stale:
        print(f'    "{n}",')
    print("]")
    room = WINDOW - len(stale)
    print(f"\n# window slots left for _CHANGED_THIS_ROUND: {room}")
    if room < 0:
        print(f"# WINDOW OVERFLOW ({-room} past capacity): with >2×{WINDOW} registered")
        print("# queries the ≤1-round-stale invariant is unsatisfiable (round-11")
        print("# protocol). Declare the overflow EXPLICITLY — move the slipped")
        print(f"# names into _SLIPPED_TO_R{latest_round + 2} (pick the simplest/most-stable")
        print("# shapes whose operator families stay in-window; never a query that")
        print("# changed this round), keep them OUT of the window, and lead the")
        print("# NEXT rotation with them. tests/test_registry.py enforces that the")
        print("# declared slip list exactly matches the actual overflow and that")
        print("# every slipped query has a row from the latest or previous round.")
    print(f"# remember: ROTATED_FOR_ROUND = {latest_round + 1}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
