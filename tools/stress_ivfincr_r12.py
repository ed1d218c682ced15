"""Round-12 incremental-IVF replication stress.

Replicates sf0.1 embeddings N× with offset vec_ids and times
``ann_ivf_incremental`` (history quantizer fit + range-clustered
posting store write + batch append + footer-probed serve).
Expected: quantizer fit and assignment are O(N·k) map-only, the
posting write is one clustered shuffle, and the serve pass is
|queries| × nprobe·N/k — near-linear wall across the ladder with
the footer probe opening a bounded file subset. Stress-only input;
prints one JSON line.

Usage: python tools/stress_ivfincr_r12.py [base_sf_dir] [replicas ...]
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
    spark = get_spark("ivf-incr-stress")
    spark.sparkContext.setLogLevel("ERROR")

    from etl_gov_spark.operators.vectors import ann_ivf_incremental

    src = spark.read.parquet(os.path.join(base, "embeddings.parquet"))
    out: dict = {"base": base, "ladder": {}}
    for n in replicas:
        work = scratch_dir(f"ivfincr-{n}x")
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
        res = ann_ivf_incremental(spark, work)
        n_served = res.count()
        wall = round(time.perf_counter() - t0, 2)
        out["ladder"][f"{n}x"] = {
            "n_vecs": n_rows,
            "n_served_rows": n_served,
            "wall_s": wall,
        }
        print(f"# {n}x: {n_rows} vecs, {n_served} rows, {wall}s", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
