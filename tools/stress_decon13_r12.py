"""Round-12 13-gram decontamination replication stress.

Replicates sf0.1 documents N× with offset doc_ids and times
``corpus_decontaminate_13gram`` (distinct 13-gram hash per side +
train-side distinct + semi-join). Expected: near-linear — the gram
explode is |tokens| per doc, hashing fixes key width at 32 chars,
and the join key is uniform (md5), so no skew term appears at any
replica count. Stress-only input; prints one JSON line.

Usage: python tools/stress_decon13_r12.py [base_sf_dir] [replicas ...]
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
    spark = get_spark("decon13-stress")
    spark.sparkContext.setLogLevel("ERROR")

    from etl_gov_spark.operators.corpus import corpus_decontaminate_13gram

    src = spark.read.parquet(os.path.join(base, "documents.parquet"))
    out: dict = {"base": base, "ladder": {}}
    for n in replicas:
        work = scratch_dir(f"decon13-{n}x")
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
        res = corpus_decontaminate_13gram(spark, work)
        n_eval = res.count()
        wall = round(time.perf_counter() - t0, 2)
        out["ladder"][f"{n}x"] = {
            "n_docs": n_rows,
            "n_eval_docs": n_eval,
            "wall_s": wall,
        }
        print(f"# {n}x: {n_rows} docs, {n_eval} eval rows, {wall}s", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
