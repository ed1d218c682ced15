"""Round-11 incremental-SemDeDup replication stress.

Replicates sf0.1 embeddings N× with offset vec_ids and times
``dedup_semdedup_incremental`` (history quantizer fit + store write
+ batch probe + census). Expected: the quantizer/cell-pair terms
follow the prune census's ~N^1.5 envelope; the batch probe stays
metadata-bounded. Stress-only input; prints one JSON line.

Usage: python tools/stress_semincr_r11.py [base_sf_dir] [replicas ...]
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
    spark = get_spark("semkeep-incr-stress")
    spark.sparkContext.setLogLevel("ERROR")

    from etl_gov_spark.operators.vectors import dedup_semdedup_incremental

    src = spark.read.parquet(os.path.join(base, "embeddings.parquet"))
    out: dict = {"base": base, "ladder": {}}
    for n in replicas:
        work = scratch_dir(f"semincr-{n}x")
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
        res = dedup_semdedup_incremental(spark, work)
        n_cells = res.count()
        wall = round(time.perf_counter() - t0, 2)
        out["ladder"][f"{n}x"] = {
            "n_vecs": n_rows,
            "n_cells": n_cells,
            "wall_s": wall,
        }
        print(f"# {n}x: {n_rows} vecs, {n_cells} cells, {wall}s", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
