"""Physical-plan lint: single-partition windows over unbounded input.

The one plan shape that reliably kills a query at 100 TB is a bare
global ``Window.orderBy`` — it compiles to ``Exchange
SinglePartition`` feeding a ``Window`` (via its Sort), i.e. every
input row moves to ONE task. Rounds 7-9 eliminated each fact-grain
instance by hand (``ranged_global_rank`` / ``ranged_lag``); this
module mechanizes the audit so it cannot regress: the detector walks
a query's executed-plan text and counts Window operators whose input
exchange is SinglePartition. tests/test_sources_plans.py asserts the
count is zero for every registered query EXCEPT a hand-audited
whitelist of bounded-domain sites (windows over calendar days,
deciles, |domain|² grids, post-``limit(k)`` survivor sets — inputs
whose row count is a constant of the domain, not of the data).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_WINDOW = re.compile(r"\b(Window|WindowGroupLimit|RunningWindowFunction)\b")
_EXCHANGE = re.compile(r"\bExchange\b")
_SP = "SinglePartition"


def _indent(line: str) -> int:
    """Tree depth of a physical-plan line (its prefix width before
    the operator name)."""
    m = re.match(r"[\s:+\-*]*", line)
    return len(m.group(0)) if m else 0


def count_sp_windows(plan: str) -> int:
    """Number of Window operators in ``plan`` whose input exchange
    is ``Exchange SinglePartition``.

    Walks the indented tree text: for each Window line, the first
    Exchange line strictly deeper than it (before the tree pops back
    to its depth or shallower) is the window's input shuffle —
    SinglePartition there means the whole input sorts on one task.
    AQE-collapsed reuse nodes keep their Exchange line, so the scan
    sees them too.
    """
    lines = plan.splitlines()
    n = 0
    for i, line in enumerate(lines):
        if not _WINDOW.search(line) or "windowspecdefinition" not in line:
            # require a real Window operator line (it always prints
            # its window spec); avoids matching column names
            if not re.search(r"^\s*[:+\-*\s]*Window\s", line):
                continue
        depth = _indent(line)
        for below in lines[i + 1 :]:
            d = _indent(below)
            if below.strip() and d <= depth:
                break
            if _EXCHANGE.search(below):
                if _SP in below:
                    n += 1
                break
    return n


def sp_window_count(df: DataFrame) -> int:
    """``count_sp_windows`` over a DataFrame's executed plan."""
    return count_sp_windows(
        df._jdf.queryExecution().executedPlan().toString()
    )
