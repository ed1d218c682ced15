"""Round-14 IVF-SQ8 replication stress (the brief's ladder row).

Replicates sf0.1 embeddings N× with offset vec_ids and times
``ann_ivfsq_topk`` (coarse fit + SQ8 encode + range-clustered code
store + footer-probed asymmetric-distance serve + exact re-rank)
beside ``ann_ivfpq_topk`` at the same rung. Expected: both serves
are encode-O(N) + probe-bounded; SQ8's candidate fold is 64 terms
vs PQ's 8 lookups, so its serve stage pays ~constant-factor more
arithmetic on the SAME candidate count — wall should track PQ's
shape (linear-ish in N), never diverge superlinearly. Stress-only
input; prints one JSON line.

Usage: python tools/stress_ivfsq_r14.py [base_sf_dir] [replicas ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from etl_gov_spark.io.scratch import scratch_dir  # noqa: E402
from etl_gov_spark.session import get_spark  # noqa: E402

_OFF = 10_000_000


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicas = [int(x) for x in sys.argv[2:]] or [1, 10, 30]
    spark = get_spark("ivfsq-stress")
    spark.sparkContext.setLogLevel("ERROR")

    from etl_gov_spark.operators.vectors import ann_ivfpq_topk, ann_ivfsq_topk

    src = spark.read.parquet(os.path.join(base, "embeddings.parquet"))
    out: dict = {"base": base, "ladder": {}}
    for n in replicas:
        work = scratch_dir(f"ivfsq-{n}x")
        rep = spark.range(n).select(F.col("id").alias("rep"))
        big = src.crossJoin(rep).withColumn(
            "vec_id", F.col("vec_id") + F.col("rep") * F.lit(_OFF)
        )
        big.drop("rep").write.mode("overwrite").parquet(
            os.path.join(work, "embeddings.parquet")
        )
        n_rows = spark.read.parquet(
            os.path.join(work, "embeddings.parquet")
        ).count()
        t0 = time.perf_counter()
        n_sq = ann_ivfsq_topk(spark, work).count()
        wall_sq = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        n_pq = ann_ivfpq_topk(spark, work).count()
        wall_pq = round(time.perf_counter() - t0, 2)
        out["ladder"][f"{n}x"] = {
            "vectors": n_rows,
            "ivfsq_s": wall_sq,
            "ivfsq_rows": n_sq,
            "ivfpq_s": wall_pq,
            "ivfpq_rows": n_pq,
        }
        print(json.dumps({f"{n}x": out["ladder"][f"{n}x"]}), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
