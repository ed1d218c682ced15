"""Round-11 dedup-cascade replication stress.

Replicates sf0.1 documents AND embeddings N× with offset ids (text
token-suffixed per replica so gram/shingle keys stay per-replica,
embeddings offset so cells replicate) and times
``dedup_cascade_census`` end-to-end. Expected: the exact and
near-dup stages scale like their own ladders (linear-ish); the
SemDeDup stage follows the ⌊√N⌋ N^1.5 envelope; the cascade adds
only survivor joins.

Stress-only input; prints one JSON line.

Usage: python tools/stress_cascade_r11.py [base_sf_dir] [replicas ...]
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
    spark = get_spark("cascade-stress")
    spark.sparkContext.setLogLevel("ERROR")

    from etl_gov_spark.operators.cascade import dedup_cascade_census

    docs = spark.read.parquet(os.path.join(base, "documents.parquet"))
    embs = spark.read.parquet(os.path.join(base, "embeddings.parquet"))
    out: dict = {"base": base, "ladder": {}}
    for n in replicas:
        work = scratch_dir(f"cascade-{n}x")
        rep = spark.range(n).select(F.col("id").alias("rep"))
        big_docs = (
            docs.crossJoin(rep)
            .withColumn("doc_id", F.col("doc_id") + F.col("rep") * F.lit(_OFF))
            .withColumn(
                "text",
                F.regexp_replace(
                    "text", r"(\S+)", F.concat(F.lit("$1x"), F.col("rep"))
                ),
            )
            .drop("rep")
        )
        big_embs = (
            embs.crossJoin(rep)
            .withColumn("vec_id", F.col("vec_id") + F.col("rep") * F.lit(_OFF))
            .drop("rep")
        )
        big_docs.write.mode("overwrite").parquet(
            os.path.join(work, "documents.parquet")
        )
        big_embs.write.mode("overwrite").parquet(
            os.path.join(work, "embeddings.parquet")
        )
        n_docs = spark.read.parquet(os.path.join(work, "documents.parquet")).count()
        t0 = time.perf_counter()
        rows = {
            r.stage_name: (r.docs_out, r.docs_purged)
            for r in dedup_cascade_census(spark, work).collect()
        }
        wall = round(time.perf_counter() - t0, 2)
        out["ladder"][f"{n}x"] = {
            "n_docs": n_docs,
            "stages": rows,
            "wall_s": wall,
        }
        print(f"# {n}x: {n_docs} docs, {rows}, {wall}s", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
