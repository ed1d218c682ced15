"""Streaming CDC apply: foreachBatch + latest-wins upsert.

The production change-data-capture pattern the windowed-aggregation
streams (events_stream.py) don't cover: a change feed arrives in
micro-batches and each batch is MERGED into a keyed state table —
``writeStream.foreachBatch`` is Structured Streaming's official
escape hatch for exactly this (arbitrary batch-DF logic per trigger,
with the epoch id for idempotent commits).

Here the orders feed plays the change log (keyed by customer,
newest order wins). The feed is re-chunked into date-ordered files
and streamed one file per trigger, so the merge genuinely runs
multiple times against evolving state. Each merge is an
order-insensitive latest-wins (max-by-(order_cols) across state ∪
batch) behind a crash-recoverable swap commit (io/cow.py parks
superseded files before moving staged ones in, with rollback), so
out-of-order file pickup and foreachBatch's at-least-once replay
both converge to the same state.

Scale notes: the state side is a range-clustered parquet table and
every batch merges through io/cow.py's footer-pruned copy-on-write
rewrite — per trigger, only the state files whose key range a batch
key hits are read and replaced; the rest of a 100 TB state stays
byte-identical on disk (asserted by test). A batch wide enough to
touch everything degrades to one distributed full rewrite via the
same bound. Reference parity: the incremental load loop of
``dags/tutorial_dag.py`` re-expressed as a continuous query (cited
per the re-expression contract, not copied).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_CHUNKS = 4
_STATE_FILES = 8


def apply_cdc_batch(
    spark: SparkSession,
    state_path: str,
    batch_df: DataFrame,
    key: str,
    order_cols: list[str],
    num_files: int = _STATE_FILES,
) -> dict:
    """Apply one CDC micro-batch to the keyed state table.

    The batch compacts to its newest record per key (an ordinary
    max-by-struct aggregate), then merges into the range-clustered
    state via ``merge_upsert_cow`` — footer-stat pruning rewrites
    only the files a batch key could live in. First batch bootstraps
    the clustered layout. Returns the COW stats dict
    (``files_kept`` counts state files left byte-identical).

    Latest-wins across batches is ORDER-INSENSITIVE: the merge keeps
    the max-by-(order_cols) record across state and batch, so two
    chunk files applied out of order (FileStreamSource breaks
    ms-resolution mtime ties arbitrarily) converge to the same
    state, and replaying a batch under foreachBatch's at-least-once
    contract is a no-op merge.
    """
    from etl_gov_spark.io.cow import merge_upsert_cow
    from etl_gov_spark.io.sinks import write_range_clustered
    from etl_gov_spark.operators.merge import latest_record_per_key

    compact = latest_record_per_key(batch_df, [key], order_cols)
    if not os.path.isdir(state_path):
        write_range_clustered(compact, state_path, (key,), num_files=num_files)
        return {
            "files_total": 0,
            "files_rewritten": 0,
            "files_kept": 0,
            "degraded_full_rewrite": False,
        }
    return merge_upsert_cow(spark, state_path, compact, key, order_cols=order_cols)


def stream_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the orders change feed through a foreachBatch latest-wins
    upsert (one date-ordered file per micro-batch) and return the
    final compacted per-customer state. Over the finite feed the
    result equals the batch change-log compaction — which is what
    the oracle checks; the thing the streaming path adds is that the
    state was built INCREMENTALLY across ``N_CHUNKS`` footer-pruned
    copy-on-write merges (``apply_cdc_batch``)."""
    from etl_gov_spark.io.scratch import scratch_dir

    work = scratch_dir("cdc")
    src = os.path.join(work, "feed")
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    # date-ordered chunks => each trigger carries a later slice of
    # the change log (exact ntile over the date keeps chunks
    # equal-sized, computed without a single-partition sort)
    from etl_gov_spark.operators.ranks import ranged_global_rank

    chunked = ranged_global_rank(
        orders,
        [F.asc("o_orderdate"), F.asc("o_orderkey")],
        rank_col=None,
        ntiles={"chunk": N_CHUNKS},
    )
    for i in range(1, N_CHUNKS + 1):
        chunked.filter(F.col("chunk") == i).drop("chunk").coalesce(1).write.mode(
            "append"
        ).parquet(src)

    state = os.path.join(work, "state")

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        apply_cdc_batch(
            spark, state, batch_df, "o_custkey", ["o_orderdate", "o_orderkey"]
        )

    q = (
        spark.readStream.schema(orders.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    final = spark.read.parquet(state)
    return final.select(
        "o_custkey",
        F.col("o_orderdate").cast("date").cast("string").alias("o_orderdate"),
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice"), 4).alias("o_totalprice"),
    )


STREAM_CDC_UPSERT_SQL = """
SELECT o_custkey,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
       o_orderkey, o_orderstatus,
       round(o_totalprice, 4) AS o_totalprice
FROM (
  SELECT *, row_number() OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
) WHERE rn = 1
"""

QUERIES: dict[str, tuple] = {
    "stream_cdc_upsert": (stream_cdc_upsert, STREAM_CDC_UPSERT_SQL),
}
