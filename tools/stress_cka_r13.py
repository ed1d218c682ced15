"""Round-13 CKA replication stress (VERDICT r12: "worth a ladder row
next round only for completeness").

`emb_cka_similarity`'s Gram build is the d^2-per-vector map-reduce
(d=64 -> 4096 products/vector) — linear in N by construction; this
ladder measures it. Embeddings replicated N x with offset vec_ids,
plus the new capacity audits (emb_intrinsic_dim /
ann_knn_graph_stats), whose capped-anchor broadcast shape should be
FLAT in N past the scan.

Stress-only input; prints one JSON line.

Usage: python tools/stress_cka_r13.py [base_sf_dir] [replicas ...]
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
    spark = get_spark("cka-stress")
    spark.sparkContext.setLogLevel("ERROR")

    from etl_gov_spark.operators.similarity import (
        ann_knn_graph_stats,
        emb_intrinsic_dim,
    )
    from etl_gov_spark.operators.vectors import emb_cka_similarity

    src = spark.read.parquet(os.path.join(base, "embeddings.parquet"))
    out: dict = {"base": base, "ladder": {}}
    for n in replicas:
        work = scratch_dir(f"cka-{n}x")
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
        rung: dict = {"n_vecs": n_rows}
        for name, fn in (
            ("cka", emb_cka_similarity),
            ("lid", emb_intrinsic_dim),
            ("knn_graph", ann_knn_graph_stats),
        ):
            t0 = time.perf_counter()
            fn(spark, work).collect()
            rung[f"{name}_s"] = round(time.perf_counter() - t0, 2)
        out["ladder"][f"{n}x"] = rung
        print(f"# {n}x: {rung}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
