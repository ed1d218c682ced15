"""Round-9 CDC/COW replication stress: per-epoch wall + files rewritten.

The round-8 rewrite routed streaming CDC state through io/cow.py's
footer-pruned copy-on-write merge; its selectivity was plan/test
asserted but never TIMED under replication. This tool replicates
orders N× with offset ids, splits the feed into date-ordered chunks
exactly like stream_cdc_upsert (ranged_global_rank ntile), applies
them through apply_cdc_batch (the same merge path foreachBatch
runs), and reports per-epoch wall seconds and files rewritten vs
total. Also times the end-to-end Structured Streaming run and the
two pruned snapshot ops (merge_upsert_pruned, snapshot_delete_pruned)
on the replicated tables.

Stress-only input: results are NOT oracle-checked here. Prints one
JSON line.

Usage: python tools/stress_cdc_r9.py [base_sf_dir] [replicas]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from etl_gov_spark.io.scratch import scratch_dir  # noqa: E402
from etl_gov_spark.session import get_spark  # noqa: E402

_OFF = 10_000_000


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("cdc-stress-r9")
    spark.sparkContext.setLogLevel("ERROR")

    from etl_gov_spark.operators.merge import (
        merge_upsert_pruned,
        snapshot_delete_pruned,
    )
    from etl_gov_spark.operators.ranks import ranged_global_rank
    from etl_gov_spark.streaming.cdc_stream import N_CHUNKS, apply_cdc_batch
    from etl_gov_spark.streaming.cdc_stream import stream_cdc_upsert

    work = scratch_dir("r9cdc")
    rep = spark.range(replicas).select(F.col("id").alias("rep"))
    orders = spark.read.parquet(os.path.join(base, "orders.parquet"))
    big = orders.crossJoin(rep)
    for c in ("o_orderkey", "o_custkey"):
        big = big.withColumn(c, F.col(c) + F.col("rep") * F.lit(_OFF))
    big.drop("rep").write.mode("overwrite").parquet(
        os.path.join(work, "orders.parquet")
    )
    cust = spark.read.parquet(os.path.join(base, "customer.parquet"))
    bigc = cust.crossJoin(rep).withColumn(
        "c_custkey", F.col("c_custkey") + F.col("rep") * F.lit(_OFF)
    )
    bigc.drop("rep").write.mode("overwrite").parquet(
        os.path.join(work, "customer.parquet")
    )
    shutil.copy(
        os.path.join(base, "nation.parquet"), os.path.join(work, "nation.parquet")
    )
    out: dict = {"base": base, "replicas": replicas}

    # --- per-epoch COW merge ladder (the foreachBatch merge path,
    # run batch-side so the per-epoch stats are observable) ---
    feed = spark.read.parquet(os.path.join(work, "orders.parquet")).select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    n_feed = feed.count()
    chunked = ranged_global_rank(
        feed,
        [F.asc("o_orderdate"), F.asc("o_orderkey")],
        rank_col=None,
        ntiles={"chunk": N_CHUNKS},
    ).localCheckpoint()
    state = os.path.join(work, "state")
    epochs = []
    for i in range(1, N_CHUNKS + 1):
        batch = chunked.filter(F.col("chunk") == i).drop("chunk")
        t0 = time.perf_counter()
        stats = apply_cdc_batch(
            spark, state, batch, "o_custkey", ["o_orderdate", "o_orderkey"],
            num_files=32,
        )
        wall = round(time.perf_counter() - t0, 2)
        epochs.append({"epoch": i, "wall_s": wall, **stats})
        print(f"# epoch {i}: {wall}s {stats}", file=sys.stderr)
    out["feed_rows"] = n_feed
    out["epochs"] = epochs

    # --- narrow key-banded epochs: the regime footer pruning exists
    # for (a change feed clustered on the state key — e.g. one
    # upstream shard re-sends). State is re-clustered first (what a
    # production table maintenance job does after wide merges), then
    # three epochs each touch a disjoint 1/32 key band. ---
    from etl_gov_spark.io.sinks import write_range_clustered

    reclustered = os.path.join(work, "state2")
    write_range_clustered(
        spark.read.parquet(state), reclustered, ("o_custkey",), num_files=32
    )
    # band bounds from key QUANTILES (the replicated keyspace is
    # sparse — offset replicas leave huge gaps, so value-range bands
    # can be empty; quantile bands always hold ~1/32 of the keys)
    qs_bounds = feed.stat.approxQuantile(
        "o_custkey", [i / 32.0 for i in range(4)], 0.001
    )
    banded = []
    for i in range(3):
        band = feed.filter(
            (F.col("o_custkey") >= qs_bounds[i])
            & (F.col("o_custkey") < qs_bounds[i + 1])
        ).withColumn("o_totalprice", F.col("o_totalprice") + 1.0)
        t0 = time.perf_counter()
        stats = apply_cdc_batch(
            spark, reclustered, band, "o_custkey",
            ["o_orderdate", "o_orderkey"], num_files=32,
        )
        wall = round(time.perf_counter() - t0, 2)
        banded.append({"epoch": i + 1, "wall_s": wall, **stats})
        print(f"# banded epoch {i + 1}: {wall}s {stats}", file=sys.stderr)
    out["banded_epochs"] = banded

    # --- end-to-end Structured Streaming run on the replicated feed ---
    t0 = time.perf_counter()
    stream_cdc_upsert(spark, work).write.format("noop").mode("overwrite").save()
    out["stream_cdc_upsert_s"] = round(time.perf_counter() - t0, 2)
    print(f"# stream_cdc_upsert: {out['stream_cdc_upsert_s']}s", file=sys.stderr)

    # --- pruned snapshot ops on the replicated customer table ---
    for name, fn in (
        ("merge_upsert_pruned", merge_upsert_pruned),
        ("snapshot_delete_pruned", snapshot_delete_pruned),
    ):
        t0 = time.perf_counter()
        fn(spark, work).write.format("noop").mode("overwrite").save()
        out[f"{name}_s"] = round(time.perf_counter() - t0, 2)
        print(f"# {name}: {out[f'{name}_s']}s", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
