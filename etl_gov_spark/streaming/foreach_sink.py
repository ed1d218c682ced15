"""foreachBatch sink: incremental merge from a stream into a table.

The standard Structured Streaming pattern for sinks that need MERGE
semantics (warehouses, parquet snapshots): each micro-batch runs an
ordinary batch upsert inside ``foreachBatch``, with the batch id
available for exactly-once bookkeeping. This is the streaming
continuation of ``operators.merge`` — the reference's
sensor-triggered warehouse load (``dags/tutorial_dag.py`` load
step) as a continuous query.

Scale: each micro-batch is first compacted to one row per key
(latest_record_per_key — map-side-combinable aggregate), so the
merge join is keyed and bounded by distinct keys, not batch rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from etl_gov_spark.operators.merge import latest_record_per_key, merge_upsert


def stream_upsert_to_parquet(
    stream_df: DataFrame,
    target_path: str,
    key_cols: list[str],
    order_cols: list[str],
) -> None:
    """Run the stream to completion (availableNow), merging each
    micro-batch into the parquet table at ``target_path``."""
    spark = stream_df.sparkSession

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        updates = latest_record_per_key(batch_df, key_cols, order_cols)
        if os.path.exists(target_path):
            current = spark.read.parquet(target_path)
            merged = merge_upsert(current, updates, key_cols[0])
        else:
            merged = updates
        # write-then-swap would be atomic on a real object store;
        # local overwrite is the test-scale stand-in
        merged.cache().count()
        merged.write.mode("overwrite").parquet(target_path)
        merged.unpersist()

    (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", target_path + "_chk")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
