"""Fresh-JVM per-query probe with the driver's bench methodology:
one new session, warm each named query once at sf0.001, then
best-of-3 noop-sink timings at $SPARK_GRAFT_SF_DIR (default sf0.1).

    python tools/minibench.py name [name ...]

Prints one `name: seconds` line per query — the per-query equivalent
of bench.py for A/B work, so variants are compared cold-JVM-fair
instead of inside one long, noisy warm session.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_gov_spark.queries.catalog import all_queries  # noqa: E402
from etl_gov_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    spark = get_spark("etl-gov-spark-minibench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    for name in names:
        qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    total = 0.0
    for name in names:
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        total += best
        print(f"{name}: {best:.3f}", flush=True)
    print(f"TOTAL: {total:.3f}")


if __name__ == "__main__":
    main()
