"""Round-11 SemDeDup keep-policy replication stress.

Replicates sf0.1 embeddings N× with offset vec_ids and times
``dedup_semdedup_keep``. Expected shape: the quantizer + cell-pair
terms follow the prune census's ~N^1.5 envelope; the added
connected-components loop runs over duplicate EDGES only and its
round count is bounded by component diameter (dense near-dup groups
→ a handful of rounds regardless of corpus size), so the keep-policy
overhead should stay a roughly constant number of small jobs on top
of the prune wall, not a new growth term.

Stress-only input: results are NOT oracle-checked here. Prints one
JSON line.

Usage: python tools/stress_semkeep_r11.py [base_sf_dir] [replicas ...]
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
    replicas = [int(x) for x in sys.argv[2:]] or [1, 3, 10]
    spark = get_spark("semkeep-stress")
    spark.sparkContext.setLogLevel("ERROR")

    from etl_gov_spark.operators.vectors import dedup_semdedup_keep

    src = spark.read.parquet(os.path.join(base, "embeddings.parquet"))
    out: dict = {"base": base, "ladder": {}}
    for n in replicas:
        work = scratch_dir(f"semkeep-{n}x")
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
        res = dedup_semdedup_keep(spark, work)
        n_groups = res.count()
        wall = round(time.perf_counter() - t0, 2)
        out["ladder"][f"{n}x"] = {
            "n_vecs": n_rows,
            "n_groups": n_groups,
            "wall_s": wall,
        }
        print(f"# {n}x: {n_rows} vecs, {n_groups} groups, {wall}s", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
