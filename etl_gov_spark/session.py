"""SparkSession factory with scale-oriented defaults.

Defaults are tuned for correctness at local[*] test scale while
remaining the settings you'd want on a 1000-executor cluster:
AQE (runtime re-planning + skew-join splitting), Arrow for any
pandas exchange, and an explicit shuffle partition count (never the
200 default; AQE coalesces down as needed).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "etl-gov-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or
    ``local[*]``) when no cluster master is configured — on a real
    cluster you pass the master via spark-submit and this leaves it
    untouched.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    elif "SPARK_MASTER" not in os.environ:
        builder = builder.master(f"local[{cpus}]")

    n_shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    )
    conf = {
        # AQE: runtime coalescing, skew-join splitting, plan re-opt.
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # AQE coalescing sizes partitions by the SHUFFLED bytes, which
        # it cannot relate to the bytes a downstream generator will
        # produce — a few MB of LSH bucket rows explode into millions
        # of candidate pairs, and the default 1 MiB floor let AQE run
        # that explode on 1-3 cores. parallelismFirst (default true)
        # is documented to prefer cluster parallelism over advisory
        # size; a 64 KiB floor lets it actually do so on compact-but-
        # amplifying stages. Scale-independent: at production shuffle
        # sizes every partition is far above either floor, so the
        # setting only acts where coalescing was destroying
        # parallelism. Measured at sf0.1: dedup_embedding 3.6→1.9 s,
        # text_winnow_overlap −18%, text_bm25_topk −17% (A/B in
        # OPTIMIZATION_r16.md).
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
        # Explicit shuffle width; AQE coalesces small stages down.
        "spark.sql.shuffle.partitions": str(n_shuffle),
        # Arrow for all pandas/Spark exchange (pandas UDFs, toPandas).
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # Timestamps: keep parquet INT96-free, session TZ = UTC so
        # results are engine-portable.
        "spark.sql.session.timeZone": "UTC",
        # Scan sizing: 128 MiB splits — the per-task unit that keeps
        # 100 TB scans at ~800k tasks, each memory-bounded.
        "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
        # Broadcast threshold: dims (region/nation/supplier/part at
        # gov scale) broadcast; AQE also converts at runtime.
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        # local[N] runs driver AND all executor threads in ONE JVM,
        # so this is the whole cluster's heap. 8g is MEASURED, not
        # a leftover: raising it to 32g made the 10× dedup stress
        # rung 1.5× SLOWER (197.7 s vs 134.6 s solo) — the bigger
        # heap keeps the multi-GB cached pair RDDs heap-resident
        # and pays old-gen GC where the small heap spills early and
        # cheaply. On a real cluster executor memory is sized
        # per-node and the storage fraction does this job.
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        "spark.ui.enabled": "false",
        "spark.sql.optimizer.excludedRules": EXCLUDED_OPTIMIZER_RULES,
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    tune_runtime(spark)
    return spark


# InferFiltersFromGenerate synthesizes `size(f(x)) > 0` filters under
# every explode. For our shingle/bigram pipelines f(x) re-runs the
# whole tokenize+shingle expression per row OUTSIDE codegen (the
# inferred filter is pushed below the projection that materialized
# it), doubling scan cost — measured 2.5s → 0.4s at sf0.1 on the
# shingle explode. Our exploded arrays are non-empty by construction
# (sequence(1, greatest(n, 1))), so the inferred filter never drops a
# row anyway.
EXCLUDED_OPTIMIZER_RULES = (
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
)


def tune_runtime(spark: SparkSession) -> None:
    """Apply runtime-settable engine confs to an EXISTING session —
    the path for host-owned sessions (test harnesses, notebook
    kernels) that didn't go through get_spark()."""
    spark.conf.set("spark.sql.optimizer.excludedRules", EXCLUDED_OPTIMIZER_RULES)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # see get_spark: keep AQE's parallelismFirst effective on
    # compact-but-amplifying stages (generator/explode shapes)
    spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k"
    )
    # Parquet `timestamp[us]` without timezone would otherwise arrive
    # as TIMESTAMP_NTZ (Spark ≥3.4 inference), which unix_micros()
    # and friends reject. Under the UTC session the instant semantics
    # are identical either way, so read it as plain TIMESTAMP.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
