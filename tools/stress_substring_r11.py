"""Round-11 substring-census replication stress.

Replicates sf0.1 documents N× with offset doc_ids AND a per-replica
token suffix (regexp-appended, so k-gram keys are distinct across
replicas): the corpus grows N× while each replica keeps the original
within-replica duplicate structure — per-gram df stays constant, so
the df-capped inverted index and the Σ df² pair expansion should
scale ~linearly with the corpus. (A plain copy-replication would
instead multiply every gram's df by N and measure the
MAX_SHINGLE_DF boilerplate cap, not the plan.)

Stress-only input: results are NOT oracle-checked here (the oracle
gate runs on the driver-generated tables). Prints one JSON line.

Usage: python tools/stress_substring_r11.py [base_sf_dir] [replicas ...]
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
    spark = get_spark("substring-stress")
    spark.sparkContext.setLogLevel("ERROR")

    from etl_gov_spark.operators.dedup import dedup_substring_census

    src = spark.read.parquet(os.path.join(base, "documents.parquet"))
    out: dict = {"base": base, "ladder": {}}
    for n in replicas:
        work = scratch_dir(f"substr-{n}x")
        rep = spark.range(n).select(F.col("id").alias("rep"))
        big = (
            src.crossJoin(rep)
            .withColumn("doc_id", F.col("doc_id") + F.col("rep") * F.lit(_OFF))
            .withColumn(
                "text",
                F.regexp_replace(
                    "text", r"(\S+)", F.concat(F.lit("$1x"), F.col("rep"))
                ),
            )
        )
        big.drop("rep").write.mode("overwrite").parquet(
            os.path.join(work, "documents.parquet")
        )
        n_docs = spark.read.parquet(os.path.join(work, "documents.parquet")).count()
        t0 = time.perf_counter()
        res = dedup_substring_census(spark, work)
        n_pairs = res.count()
        wall = round(time.perf_counter() - t0, 2)
        out["ladder"][f"{n}x"] = {
            "n_docs": n_docs,
            "n_pairs": n_pairs,
            "wall_s": wall,
        }
        print(f"# {n}x: {n_docs} docs, {n_pairs} pairs, {wall}s", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
