"""Round-14 late-additions replication stress: BM25 + DBSCAN.

- ``text_bm25_topk`` — FIXED query workload over an N×-growing
  corpus (the production shape: a bounded query set, not one that
  scales with the data): replica copies keep only doc_id % 50 != 0
  docs before the multiple-of-50 offset, so no replica lands on the
  query stride — the base queries stay the ONLY queries while every
  term's posting list grows N×. Wall should grow ~linearly in N
  (per-query cost = Σ df over 8 terms). The naive all-docs
  replication instead multiplies queries AND df — a quadratic
  harness artifact this tool deliberately avoids (first draft
  measured it: the 30× rung ran minutes-long on 2.8B candidate
  rows).
- ``emb_dbscan_clusters`` — embeddings replicated N× with offset
  vec_ids: every vector gains N−1 EXACT twins (cos=1 cross-replica
  edges), so this is the density worst case — degrees inflate by
  N−1, borderline points all become cores, and components merge
  across replicas. The star-routed bucket caps and the CC round
  structure are what is under test; wall should stay sublinear in
  N because pair expansion is bucket-capped.

Stress-only input; prints one JSON line per rung.

Usage: python tools/stress_late_r14.py [base_sf_dir] [replicas ...]
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
    spark = get_spark("late-r14-stress")
    spark.sparkContext.setLogLevel("ERROR")

    from etl_gov_spark.operators.graphs import emb_dbscan_clusters
    from etl_gov_spark.operators.text import text_bm25_topk

    docs = spark.read.parquet(os.path.join(base, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(base, "embeddings.parquet"))
    out: dict = {"base": base, "ladder": {}}
    for n in replicas:
        work = scratch_dir(f"late-{n}x")
        rep = spark.range(n).select(F.col("id").alias("rep"))
        extra = spark.range(1, n).select(F.col("id").alias("rep"))
        (
            docs.crossJoin(extra)
            .filter(F.col("doc_id") % 50 != 0)  # replicas add corpus, not queries
            .withColumn("doc_id", F.col("doc_id") + F.col("rep") * F.lit(_OFF))
            .drop("rep")
            .unionByName(docs)
            .write.mode("overwrite")
            .parquet(os.path.join(work, "documents.parquet"))
        )
        (
            emb.crossJoin(rep)
            .withColumn("vec_id", F.col("vec_id") + F.col("rep") * F.lit(_OFF))
            .drop("rep")
            .write.mode("overwrite")
            .parquet(os.path.join(work, "embeddings.parquet"))
        )
        t0 = time.perf_counter()
        bm_rows = text_bm25_topk(spark, work).count()
        wall_bm = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        db_rows = emb_dbscan_clusters(spark, work).count()
        wall_db = round(time.perf_counter() - t0, 2)
        from etl_gov_spark.operators import graphs

        out["ladder"][f"{n}x"] = {
            "docs": docs.count() * n,
            "vectors": emb.count() * n,
            "bm25_s": wall_bm,
            "bm25_rows": bm_rows,
            "dbscan_s": wall_db,
            "dbscan_rows": db_rows,
            "cc_rounds": graphs.LAST_CC_ROUNDS,
            "cc_converged": graphs.LAST_CC_CONVERGED,
        }
        print(json.dumps({f"{n}x": out["ladder"][f"{n}x"]}), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
