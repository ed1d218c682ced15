"""ANN scale stress (round-7 evidence run, companion to
stress_dedup_sf1.py): replicate sf0.1's embeddings table 10x/30x
with offset vec_ids and time ann_bruteforce_topk vs ann_ivf_topk on
the inflated table. What this demonstrates: brute-force cost grows
linearly with N (every query probes the whole corpus) while the
IVF plan's data-dependent cost stays in the probed cells, so its
Lloyd-round fixed latency amortizes as N grows — the crossover the
100 TB design banks on. Stress-only input; correctness is gated at
sf0.01 by the driver.

Usage: python tools/stress_ann_sf1.py [base_sf_dir] [replicas]
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


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("ann-sf1-stress")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(os.path.join(base, "embeddings.parquet"))
    rep = spark.range(replicas).select(F.col("id").alias("rep"))
    big = (
        emb.crossJoin(rep)
        .withColumn("vec_id", F.col("vec_id") + F.col("rep") * F.lit(10_000_000))
        .drop("rep")
    )
    work = scratch_dir("sf1emb")
    big.write.mode("overwrite").parquet(os.path.join(work, "embeddings.parquet"))
    # the ANN queries read documents too? no — embeddings only; but
    # Catalog laziness means only embeddings.parquet must exist
    n = spark.read.parquet(os.path.join(work, "embeddings.parquet")).count()

    from etl_gov_spark.operators.similarity import ann_bruteforce_topk
    from etl_gov_spark.operators.vectors import ann_ivf_topk

    out: dict = {"base": base, "replicas": replicas, "n_vecs": n, "stages": {}}
    for name, fn in (
        ("ann_bruteforce_topk", ann_bruteforce_topk),
        ("ann_ivf_topk", ann_ivf_topk),
    ):
        t0 = time.perf_counter()
        fn(spark, work).write.format("noop").mode("overwrite").save()
        out["stages"][name] = {"wall_s": round(time.perf_counter() - t0, 2)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
