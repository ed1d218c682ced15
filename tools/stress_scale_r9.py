"""Round-9 replication stress: ranged_lag, retrieval-eval anchors.

Replicates sf0.1 tables N× with offset ids (same offset-id scheme as
stress_scale_r8.py) and times the round-9 target plans against them:

- ``mtbf``      — events replicated with offset event ids: the
  rewritten ``q_mtbf_reliability`` (ranged_lag over the fact-grain
  error substream) must scale ~linearly where the old
  single-partition lag sort could not.
- ``recall``/``mrr``/``knn``/``hardneg`` — embeddings replicated
  with offset ids: the retrieval-eval family's anchor set is capped
  (operators/vectors.py _eval_anchors), so the broadcast side must
  stay CONSTANT as the corpus grows — the thing under test.

Stress-only input: results are NOT oracle-checked here (the oracle
gate runs on the driver-generated tables). Prints one JSON line.

Usage: python tools/stress_scale_r9.py [base_sf_dir] [replicas] [target ...]
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


def _replicate(spark, base, table, id_cols, replicas, work):
    src = spark.read.parquet(os.path.join(base, f"{table}.parquet"))
    rep = spark.range(replicas).select(F.col("id").alias("rep"))
    big = src.crossJoin(rep)
    for c in id_cols:
        big = big.withColumn(c, F.col(c) + F.col("rep") * F.lit(_OFF))
    big.drop("rep").write.mode("overwrite").parquet(
        os.path.join(work, f"{table}.parquet")
    )


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    only = set(sys.argv[3:])
    spark = get_spark("scale-stress-r9")
    spark.sparkContext.setLogLevel("ERROR")

    from etl_gov_spark.operators.similarity import emb_knn_classify
    from etl_gov_spark.operators.timeseries import q_mtbf_reliability
    from etl_gov_spark.operators.vectors import (
        emb_hard_negatives,
        emb_mrr_eval,
        emb_recall_at_k,
    )

    # target -> (query fn, table, id cols to offset)
    targets = {
        "mtbf": (q_mtbf_reliability, "events", ["event_id", "user_id"]),
        "recall": (emb_recall_at_k, "embeddings", ["vec_id"]),
        "mrr": (emb_mrr_eval, "embeddings", ["vec_id"]),
        "knn": (emb_knn_classify, "embeddings", ["vec_id"]),
        "hardneg": (emb_hard_negatives, "embeddings", ["vec_id"]),
    }
    out: dict = {"base": base, "replicas": replicas, "targets": {}}
    for name, (fn, table, id_cols) in targets.items():
        if only and name not in only:
            continue
        work = scratch_dir(f"r9stress-{name}")
        _replicate(spark, base, table, id_cols, replicas, work)
        n_rows = spark.read.parquet(
            os.path.join(work, f"{table}.parquet")
        ).count()
        t0 = time.perf_counter()
        fn(spark, work).write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 2)
        out["targets"][name] = {"table": table, "n_rows": n_rows, "wall_s": wall}
        print(f"# {name}: {n_rows} rows, {wall}s", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
