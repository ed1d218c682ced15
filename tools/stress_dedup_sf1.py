"""sf1 dedup-ladder stress harness (round-7 evidence run).

Builds a 10x documents table by replicating sf0.1's documents with
offset doc_ids (duplicate-group sizes multiply 10x — the worst case
for LSH bucket fan-out), then runs the ladder
``dedup_minhash_lsh -> dedup_clusters -> dedup_keep_policy`` against
it and prints wall time plus the hot-bucket Observation census
(hot_buckets / max_bucket), which is the written evidence that the
star-routing keeps pair expansion linear instead of quadratic in
bucket size. Stress-only input: results are NOT oracle-checked here
(the oracle gate runs on the driver-generated tables).

Usage: python tools/stress_dedup_sf1.py [base_sf_dir] [replicas]
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
    spark = get_spark("dedup-sf1-stress")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(base, "documents.parquet"))
    n_base = docs.count()
    rep = spark.range(replicas).select(F.col("id").alias("rep"))
    big = (
        docs.crossJoin(rep)
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * F.lit(10_000_000))
        .drop("rep")
    )
    work = scratch_dir("sf1docs")
    big.write.mode("overwrite").parquet(os.path.join(work, "documents.parquet"))
    n_big = spark.read.parquet(os.path.join(work, "documents.parquet")).count()

    from etl_gov_spark.operators import dedup as D
    from etl_gov_spark.operators.graphs import dedup_clusters, dedup_keep_policy

    out: dict = {"base": base, "replicas": replicas, "n_docs": n_big,
                 "n_docs_base": n_base, "stages": {}}
    for name, fn in (
        ("dedup_minhash_lsh", D.dedup_minhash_lsh),
        ("dedup_clusters", dedup_clusters),
        ("dedup_keep_policy", dedup_keep_policy),
    ):
        t0 = time.perf_counter()
        fn(spark, work).write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 2)
        stage = {"wall_s": wall}
        obs = D.HOT_BUCKET_OBS.get(name)
        if obs is not None:
            stage.update(obs.get)
        out["stages"][name] = stage
    print(json.dumps(out))


if __name__ == "__main__":
    main()
