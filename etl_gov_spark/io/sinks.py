"""Sink connectors.

Spark-first analogue of the reference's publish steps (object
storage writes in ``dags/tutorial_objectstorage.py``, warehouse
loads in ``dags/tutorial_dag.py``): declarative writers with the
layout controls that matter at 100 TB — partition columns for
pruning, bucketing for shuffle-free downstream joins, and explicit
file sizing (no thousands-of-tiny-files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
    max_records_per_file: int | None = None,
) -> None:
    """Partition-aware parquet writer.

    ``partition_by`` buys partition pruning for every downstream
    reader; ``maxRecordsPerFile`` caps file size so a skewed
    partition doesn't produce one multi-GB file.
    """
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: tuple[str, ...],
    num_buckets: int,
    sort_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Bucketed managed-table writer: joins/aggs on ``bucket_cols``
    downstream become shuffle-free (both sides pre-partitioned).
    This is the 100 TB answer for repeatedly-joined fact tables.
    """
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table, format="parquet")


def compact_parquet(
    spark,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a parquet dir into files of
    ~``target_file_bytes`` each. The thousands-of-tiny-files problem
    is the classic failure mode of streaming/partitioned ingest at
    scale — NameNode/list pressure and per-file task overhead.
    Returns the output file count. Sizing uses the source's actual
    on-disk bytes (no sampling, no collect).
    """
    import math
    import os

    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _dirs, files in os.walk(src_path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src_path)
    df.repartition(n_files).write.mode("overwrite").parquet(dst_path)
    return n_files


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_with_metrics(
    df: DataFrame,
    path: str,
    metrics: dict[str, "object"] | None = None,
    mode: str = "overwrite",
) -> dict[str, object]:
    """Write parquet and return observed metrics from the SAME pass
    (``pyspark.sql.Observation``): row count plus any caller-supplied
    aggregate expressions ride the write job — no second scan to
    audit what was just published. This is how a 100 TB publish step
    self-reports (rows written, null rates, value bounds) without
    doubling its IO.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation()
    exprs = [F.count(F.lit(1)).alias("rows_written")]
    for name, col in (metrics or {}).items():
        exprs.append(col.alias(name) if hasattr(col, "alias") else F.expr(col).alias(name))
    df.observe(obs, *exprs).write.mode(mode).parquet(path)
    return obs.get


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: tuple[str, ...],
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Range-clustered sorted write: repartitionByRange on the
    cluster key + sortWithinPartitions before the parquet write, so
    each output file covers a disjoint key range and its row-group
    min/max stats let downstream range predicates skip whole files —
    the poor-man's Z-order, and the single highest-leverage layout
    choice for time/key-range queries over 100 TB."""
    (
        df.repartitionByRange(num_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode(mode)
        .parquet(path)
    )


def write_dynamic_partition_overwrite(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...],
) -> None:
    """Idempotent partition re-publish: overwrite ONLY the partitions
    present in ``df``, leaving every other partition untouched
    (``partitionOverwriteMode=dynamic``). This is the daily-rerun
    contract at scale — re-running yesterday's load replaces
    yesterday's partition without rewriting (or deleting) the other
    years of data, and a failed rerun never leaves the table
    truncated the way static overwrite mode would. The mode rides
    the DataFrameWriter as a per-write option, so concurrent writers
    in the same session never observe it — no session-conf
    mutate-and-restore window."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(path)
    )
