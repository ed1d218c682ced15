"""sf1 proof-run of the 34-query pinned bench anchor (round-14).

Every "job-latency floor shrinks with scale" argument in PLANS.md is
measured at sf0.1; this runs the SAME bench.py anchor (Spark AND
DuckDB, same best-of-N protocol) at 10× that — a faithful sf1 built
by replicating sf0.1's fact tables with offset keys:

- orders/lineitem/customer/supplier/part/events/documents/
  embeddings replicate 10× with consistent key offsets (10 disjoint
  TPC-H-shaped copies — referential integrity holds);
- region/nation copy as-is (TPC-H dims don't scale with sf);
- NOTE the one semantic shift: replicated documents/embeddings mean
  duplicate-group sizes multiply 10× (every doc gains 9 exact
  clones), the WORST case for the dedup tier — a real sf1 crawl has
  more docs, not deeper duplication. Ratios for dedup queries are
  therefore a stress bound, not an estimate.

Results go to BASELINE.md (sf1 section, per-query ratios), NOT to a
re-pin: different SF, separate table. Needs a quiet box.

Usage: python tools/bench_sf1.py [replicas] [runs]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from etl_gov_spark.io.scratch import scratch_dir  # noqa: E402
from etl_gov_spark.session import get_spark  # noqa: E402

_OFF = 10_000_000
_BASE = "/root/testdata/sf0.1"

# fact table -> key columns that take the replica offset
_FACTS = {
    "customer": ("c_custkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "part": ("p_partkey",),
    "supplier": ("s_suppkey",),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}
_DIMS = ("region", "nation")


def build_sf1(spark, replicas: int) -> str:
    work = os.path.join(scratch_dir("sf1build"), "sf1")
    os.makedirs(work, exist_ok=True)
    rep = spark.range(replicas).select(F.col("id").alias("rep"))
    for t, keys in _FACTS.items():
        src = spark.read.parquet(os.path.join(_BASE, f"{t}.parquet"))
        big = src.crossJoin(rep)
        for c in keys:
            big = big.withColumn(c, F.col(c) + F.col("rep") * F.lit(_OFF))
        big.drop("rep").write.mode("overwrite").parquet(
            os.path.join(work, f"{t}.parquet")
        )
    for t in _DIMS:
        spark.read.parquet(os.path.join(_BASE, f"{t}.parquet")).write.mode(
            "overwrite"
        ).parquet(os.path.join(work, f"{t}.parquet"))
    return work


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    runs = sys.argv[2] if len(sys.argv) > 2 else "1"
    spark = get_spark("sf1-build")
    spark.sparkContext.setLogLevel("ERROR")
    work = build_sf1(spark, replicas)
    rows = {
        t: spark.read.parquet(os.path.join(work, f"{t}.parquet")).count()
        for t in ("lineitem", "documents", "embeddings")
    }
    print(json.dumps({"sf1_dir": work, "rows": rows}), flush=True)

    os.environ["SPARK_GRAFT_SF_DIR"] = work
    os.environ["SPARK_GRAFT_BENCH_RUNS"] = runs
    import bench

    bench.main()


if __name__ == "__main__":
    main()
