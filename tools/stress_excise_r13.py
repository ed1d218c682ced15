"""Round-13 substring-EXCISE replication stress.

Same replication recipe as tools/stress_substring_r11.py (offset
doc_ids + per-replica token suffix so gram keys are distinct across
replicas — the corpus grows N x while within-replica duplicate
structure is preserved). The excise transform has NO pair expansion
(gram -> min-occurrence groupBy + one join back + per-doc windows),
so wall time should scale ~linearly in the corpus and strictly
beat the pair census at every rung.

Stress-only input: results are NOT oracle-checked here (the oracle
gate runs on the driver-generated tables). Prints one JSON line.

Usage: python tools/stress_excise_r13.py [base_sf_dir] [replicas ...]
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
    replicas = [int(x) for x in sys.argv[2:]] or [1, 3, 10, 30]
    spark = get_spark("excise-stress")
    spark.sparkContext.setLogLevel("ERROR")

    from etl_gov_spark.operators.dedup import dedup_substring_excise

    src = spark.read.parquet(os.path.join(base, "documents.parquet"))
    out: dict = {"base": base, "ladder": {}}
    for n in replicas:
        work = scratch_dir(f"excise-{n}x")
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
        res = dedup_substring_excise(spark, work)
        agg = res.agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("excised_tokens").alias("tok"),
        ).collect()[0]
        wall = round(time.perf_counter() - t0, 2)
        out["ladder"][f"{n}x"] = {
            "n_docs": n_docs,
            "excised_docs": agg.docs,
            "excised_tokens": int(agg.tok or 0),
            "wall_s": wall,
        }
        print(
            f"# {n}x: {n_docs} docs, {agg.docs} rewritten, "
            f"{agg.tok} tokens excised, {wall}s",
            file=sys.stderr,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
