"""Round-14 KN-trigram-LM + paragraph-excise replication stress.

Replicates sf0.1 documents N× with offset doc_ids and times the two
round-14 fact-grain transforms:

- ``corpus_kenlm_perplexity`` — model tables are n-gram TYPE tables
  (replication multiplies counts, not types: tri/mid/cont stay the
  SAME size at every rung), so the wall should scale with the
  scoring pass (trigram grain), not with the model.
- ``dedup_paragraph_excise`` — replicated docs multiply every
  segment's df N×, the worst case for the gram→occurrence join
  (the same inflation the substring-excise ladder used); the plan
  must stay linear because the join is occurrence-grain, never
  pair-grain.

Stress-only input; prints one JSON line per rung.

Usage: python tools/stress_knpara_r14.py [base_sf_dir] [replicas ...]
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
    spark = get_spark("knpara-stress")
    spark.sparkContext.setLogLevel("ERROR")

    from etl_gov_spark.operators.corpus import (
        corpus_kenlm_perplexity,
        dedup_paragraph_excise,
    )

    src = spark.read.parquet(os.path.join(base, "documents.parquet"))
    out: dict = {"base": base, "ladder": {}}
    for n in replicas:
        work = scratch_dir(f"knpara-{n}x")
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
        kn_rows = corpus_kenlm_perplexity(spark, work).count()
        wall_kn = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        px_rows = dedup_paragraph_excise(spark, work).count()
        wall_px = round(time.perf_counter() - t0, 2)
        out["ladder"][f"{n}x"] = {
            "docs": n_docs,
            "kenlm_s": wall_kn,
            "kenlm_rows": kn_rows,
            "para_excise_s": wall_px,
            "para_excise_rows": px_rows,
        }
        print(json.dumps({f"{n}x": out["ladder"][f"{n}x"]}), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
