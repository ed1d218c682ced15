"""Round-8 replication stress: wedge joins, tf-idf pairs, exact ntile.

Replicates sf0.1 tables N× with offset ids (same offset-id scheme as
stress_dedup_sf1.py) and times the round-8 target plans against them:

- ``graph_triangle_count``   — documents replicated with offset
  doc_ids: near-dup groups multiply N×, the worst case for the wedge
  join's Σ deg² budget (the LSH edge builder's bucket caps are what
  is under test).
- ``graph_jaccard_link_prediction`` — lineitem replicated with BOTH
  l_orderkey and l_partkey offset: N disjoint copies of the
  co-purchase graph, i.e. "N× more data, same degree profile" (the
  faithful model — TPC-H part catalogs scale with the data).
- ``q_tfidf_cosine_pairs``   — documents replicated with offset
  doc_ids: every term's df multiplies N×, driving posting lists into
  the df∈[2,64] cap (the cap is what keeps pair generation linear).
- ``q_decile_lift`` / ``q_histogram_equidepth`` /
  ``q_revenue_quartiles`` — events / orders replicated with offset
  ids: the rewritten ranged_global_rank plans must scale ~linearly
  where the old single-partition ntile sort could not.

Stress-only input: results are NOT oracle-checked here (the oracle
gate runs on the driver-generated tables). Prints one JSON line.

Usage: python tools/stress_scale_r8.py [base_sf_dir] [replicas] [target ...]
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
    spark = get_spark("scale-stress-r8")
    spark.sparkContext.setLogLevel("ERROR")

    from etl_gov_spark.operators.analytics import (
        q_histogram_equidepth,
        q_revenue_quartiles,
    )
    from etl_gov_spark.operators.graphs import (
        graph_jaccard_link_prediction,
        graph_triangle_count,
    )
    from etl_gov_spark.operators.mlstats import q_decile_lift
    from etl_gov_spark.operators.text import q_tfidf_cosine_pairs

    from etl_gov_spark.operators.graphs import graph_two_hop_reach

    # target -> (query fn, table, id cols to offset)
    targets = {
        "two_hop": (
            graph_two_hop_reach,
            "lineitem",
            ["l_orderkey", "l_partkey"],
        ),
        "triangle": (graph_triangle_count, "documents", ["doc_id"]),
        "linkpred": (
            graph_jaccard_link_prediction,
            "lineitem",
            ["l_orderkey", "l_partkey"],
        ),
        "tfidf_pairs": (q_tfidf_cosine_pairs, "documents", ["doc_id"]),
        "decile_lift": (q_decile_lift, "events", ["event_id", "user_id"]),
        "equidepth": (
            q_histogram_equidepth,
            "orders",
            ["o_orderkey", "o_custkey"],
        ),
        "revenue_quartiles": (
            q_revenue_quartiles,
            "orders",
            ["o_orderkey", "o_custkey"],
        ),
    }
    out: dict = {"base": base, "replicas": replicas, "targets": {}}
    for name, (fn, table, id_cols) in targets.items():
        if only and name not in only:
            continue
        work = scratch_dir(f"r8stress-{name}")
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
