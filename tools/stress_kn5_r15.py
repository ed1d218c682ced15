"""Round-15 5-gram-KN replication stress.

Replicates sf0.1 documents N× with offset doc_ids and times
``corpus_kenlm_5gram``. The 4- and 5-gram TYPE tables are the new
cost center vs the trigram ladder (tools/stress_knpara_r14.py);
replication multiplies COUNTS, not TYPES, so every model table stays
the same size at every rung and the wall should scale with the
5-gram scoring pass only.

Stress-only input; prints one JSON line per rung.

Usage: python tools/stress_kn5_r15.py [base_sf_dir] [replicas ...]
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
    spark = get_spark("kn5-stress")
    spark.sparkContext.setLogLevel("ERROR")

    from etl_gov_spark.operators.corpus import corpus_kenlm_5gram

    src = spark.read.parquet(os.path.join(base, "documents.parquet"))
    out: dict = {"base": base, "ladder": {}}
    for n in replicas:
        work = scratch_dir(f"kn5-{n}x")
        rep = spark.range(n).select(F.col("id").alias("rep"))
        big = src.crossJoin(rep).withColumn(
            "doc_id", F.col("doc_id") + F.col("rep") * F.lit(_OFF)
        )
        big.drop("rep").write.mode("overwrite").parquet(
            os.path.join(work, "documents.parquet")
        )
        n_docs = spark.read.parquet(
            os.path.join(work, "documents.parquet")
        ).count()
        t0 = time.perf_counter()
        rows = corpus_kenlm_5gram(spark, work).count()
        wall = round(time.perf_counter() - t0, 2)
        out["ladder"][f"{n}x"] = {"docs": n_docs, "kn5_s": wall, "rows": rows}
        print(json.dumps({f"{n}x": out["ladder"][f"{n}x"]}), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
