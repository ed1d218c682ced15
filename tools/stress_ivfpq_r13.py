"""Round-13 IVF-PQ replication stress.

Replicates sf0.1 embeddings N× with offset vec_ids and times
``ann_ivfpq_topk`` (coarse fit + PQ encode + range-clustered code
store + footer-probed ADC serve + exact re-rank), alongside
``ann_ivf_topk`` (uncompressed serve) at the same rung for the
compression-vs-raw comparison. Expected: encode is O(N) map work;
the serve scan reads 8 codes/vector instead of 64 doubles (the
memory story), so the IVF-PQ wall should track IVF's shape while
the posting bytes stay ~64× narrower. Stress-only input; prints
one JSON line.

Usage: python tools/stress_ivfpq_r13.py [base_sf_dir] [replicas ...]
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
    replicas = [int(x) for x in sys.argv[2:]] or [1, 10, 100]
    spark = get_spark("ivfpq-stress")
    spark.sparkContext.setLogLevel("ERROR")

    from etl_gov_spark.operators.vectors import ann_ivf_topk, ann_ivfpq_topk

    src = spark.read.parquet(os.path.join(base, "embeddings.parquet"))
    out: dict = {"base": base, "ladder": {}}
    for n in replicas:
        work = scratch_dir(f"ivfpq-{n}x")
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
        n_pq = ann_ivfpq_topk(spark, work).count()
        wall_pq = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        n_ivf = ann_ivf_topk(spark, work).count()
        wall_ivf = round(time.perf_counter() - t0, 2)
        out["ladder"][f"{n}x"] = {
            "n_vecs": n_rows,
            "ivfpq_rows": n_pq,
            "ivfpq_wall_s": wall_pq,
            "ivf_rows": n_ivf,
            "ivf_wall_s": wall_ivf,
        }
        print(
            f"# {n}x: {n_rows} vecs, ivfpq {wall_pq}s / ivf {wall_ivf}s",
            file=sys.stderr,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
