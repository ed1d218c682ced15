"""Compute the next driver-correctness sample rotation.

The driver adjudicates the FIRST 50 ``queries()`` entries
(catalog._PINNED_FIRST). This tool diffs the registry against every
CORRECTNESS_r*.json on disk and prints, in priority order:

1. queries whose git-tracked operator file changed since the last
   CORRECTNESS file was written (fresh implementations need fresh
   driver signal), restricted to never/stale-sampled ones;
2. the never-driver-sampled remainder, registry order.

Paste the top 50 into _PINNED_FIRST (keeping any judge-directed
leads). Read-only; prints a ready-to-paste tuple body.

Usage: python tools/rotate_pins.py [n]
"""

from __future__ import annotations

import glob
import json
import sys

sys.path.insert(0, ".")

from etl_gov_spark.queries.catalog import all_queries  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sampled: set[str] = set()
    for f in sorted(glob.glob("CORRECTNESS_r*.json")):
        sampled.update(json.load(open(f)).keys())
    names = list(all_queries())
    never = [q for q in names if q not in sampled]
    print(
        f"# registry: {len(names)}  driver-sampled (all rounds): "
        f"{len(sampled & set(names))}  never-sampled: {len(never)}"
    )
    pick = never[:n]
    if len(pick) < n:
        # everything has been sampled at least once: refresh the
        # oldest-vintage entries (earliest CORRECTNESS file first)
        for f in sorted(glob.glob("CORRECTNESS_r*.json")):
            for q in json.load(open(f)):
                if q in names and q not in pick:
                    pick.append(q)
                if len(pick) == n:
                    break
            if len(pick) == n:
                break
    for q in pick[:n]:
        print(f'    "{q}",')


if __name__ == "__main__":
    main()
