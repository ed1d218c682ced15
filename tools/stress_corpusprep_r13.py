"""Round-13 corpus-prep funnel replication stress.

Replicates sf0.1 documents N× with offset doc_ids and times
``pipeline_corpus_prep`` (quality gate → exact dedup → hash split →
256-token packing through the Pipeline DSL, one lazy plan per
stage). Records per-stage survivor docs so the funnel shape is
visible at every rung. Expected: near-linear wall — every stage is
a map pass or a uniform-key aggregate; the dedup stage's md5 keys
and the packing window's (split, source) partitions are both
replica-uniform. Note the replicated corpus is exact-dup-heavy by
construction (every replica collides), so 02_dedup survivors stay
FLAT across rungs — the funnel doing its job at scale. Stress-only
input; prints one JSON line.

Usage: python tools/stress_corpusprep_r13.py [base_sf_dir] [replicas ...]
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
    spark = get_spark("corpusprep-stress")
    spark.sparkContext.setLogLevel("ERROR")

    from etl_gov_spark.pipeline.demo import pipeline_corpus_prep

    src = spark.read.parquet(os.path.join(base, "documents.parquet"))
    out: dict = {"base": base, "ladder": {}}
    for n in replicas:
        work = scratch_dir(f"corpusprep-{n}x")
        rep = spark.range(n).select(F.col("id").alias("rep"))
        big = src.crossJoin(rep).withColumn(
            "doc_id", F.col("doc_id") + F.col("rep") * F.lit(_OFF)
        )
        big.drop("rep").write.mode("overwrite").parquet(
            os.path.join(work, "documents.parquet")
        )
        n_rows = spark.read.parquet(
            os.path.join(work, "documents.parquet")
        ).count()
        t0 = time.perf_counter()
        ledger = pipeline_corpus_prep(spark, work).collect()
        wall = round(time.perf_counter() - t0, 2)
        stages: dict[str, int] = {}
        for r in ledger:
            stages[r.stage] = stages.get(r.stage, 0) + r.n_docs
        out["ladder"][f"{n}x"] = {
            "n_docs": n_rows,
            "wall_s": wall,
            "stage_docs": stages,
        }
        print(f"# {n}x: {n_rows} docs, {wall}s, stages={stages}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
