"""Compute the next driver-correctness sample rotation.

The driver adjudicates the FIRST 50 ``queries()`` entries
(catalog._PINNED_FIRST). This tool diffs the registry against every
CORRECTNESS_r*.json on disk AND the git tree against the commit that
recorded the newest CORRECTNESS file, then prints, in priority order:

1. queries whose implementing operator module changed since the last
   CORRECTNESS file landed (``git diff --name-only`` against that
   commit, mapped to each query's defining module) — fresh
   implementations need fresh driver signal, even if sampled before;
2. the never-driver-sampled remainder, registry order;
3. oldest-vintage refill once everything has been sampled.

Paste the top 50 into _PINNED_FIRST (keeping any judge-directed
leads). Read-only; prints a ready-to-paste tuple body.

Usage: python tools/rotate_pins.py [n]
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

sys.path.insert(0, ".")

from etl_gov_spark.queries import catalog  # noqa: E402
from etl_gov_spark.queries.catalog import all_queries  # noqa: E402


def _query_modules() -> dict[str, str]:
    """query name -> repo-relative path of its defining module
    (relative to the git toplevel, so it matches
    ``git diff --name-only`` output in any checkout path)."""
    try:
        top = subprocess.run(
            ["git", "rev-parse", "--show-toplevel"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
    except (subprocess.CalledProcessError, OSError):
        top = os.getcwd()
    out: dict[str, str] = {}
    for fam in catalog._families():
        for name, (fn, _sql) in fam.items():
            mod = sys.modules.get(fn.__module__)
            path = getattr(mod, "__file__", None)
            if path:
                out[name] = os.path.relpath(os.path.abspath(path), top)
    return out


def _changed_files() -> set[str]:
    """Files changed (committed or working-tree) since the commit
    that added the newest CORRECTNESS_r*.json."""
    files = sorted(glob.glob("CORRECTNESS_r*.json"))
    if not files:
        return set()
    try:
        commit = subprocess.run(
            ["git", "log", "-1", "--format=%H", "--", files[-1]],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
        if not commit:
            return set()
        diff = subprocess.run(
            ["git", "diff", "--name-only", commit],
            capture_output=True, text=True, check=True,
        ).stdout.split()
    except (subprocess.CalledProcessError, OSError):
        return set()
    return set(diff)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sampled: set[str] = set()
    for f in sorted(glob.glob("CORRECTNESS_r*.json")):
        sampled.update(json.load(open(f)).keys())
    names = list(all_queries())
    never = [q for q in names if q not in sampled]
    changed_files = _changed_files()
    mods = _query_modules()
    changed = [q for q in names if mods.get(q) in changed_files]
    print(
        f"# registry: {len(names)}  driver-sampled (all rounds): "
        f"{len(sampled & set(names))}  never-sampled: {len(never)}  "
        f"changed-module queries: {len(changed)}"
    )
    pick: list[str] = []
    # 1. changed modules, never/stale-sampled members first
    for q in sorted(changed, key=lambda q: q in sampled):
        if len(pick) < n:
            pick.append(q)
    # 2. never-sampled remainder, registry order
    for q in never:
        if q not in pick and len(pick) < n:
            pick.append(q)
    if len(pick) < n:
        # 3. everything sampled: refresh the entries whose LATEST
        # driver signal is oldest. (Iterating files oldest-first and
        # taking first-seen names is wrong — a name re-adjudicated
        # last round but first sampled in r1 is FRESH, not stale.)
        latest: dict[str, int] = {}
        for f in sorted(glob.glob("CORRECTNESS_r*.json")):
            rnd = int(f.split("_r")[1].split(".")[0])
            for q in json.load(open(f)):
                latest[q] = rnd
        stale = sorted(
            (q for q in names if q not in pick),
            key=lambda q: (latest.get(q, 0), names.index(q)),
        )
        for q in stale:
            if len(pick) == n:
                break
            pick.append(q)
    for q in pick[:n]:
        tag = "changed" if q in changed else (
            "never" if q in never else "refresh"
        )
        print(f'    "{q}",  # {tag}')


if __name__ == "__main__":
    main()
