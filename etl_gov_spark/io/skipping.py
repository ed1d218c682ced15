"""Multi-column data skipping: z-order layout + footer-stat pruning.

``write_range_clustered`` (io/sinks.py) gives perfect file pruning
on ONE key. A 100 TB table queried by two independent keys (events
by user AND by time, lineitem by order AND by part) needs a layout
where files stay narrow on BOTH — that is Z-ordering: bucket each
cluster key equi-depth, interleave the bucket bits into one z-value,
and range-partition + sort the write on it. Every file then covers a
small hyper-rectangle of the key space, and its parquet footer
min/max on EITHER column prunes it.

The read side is the Delta/Iceberg data-skipping mechanism without
the format: per-file column min/max from parquet footers (metadata-
only, KBs per file), intersected with the query's range predicates
BEFORE Spark ever lists the files. At cluster scale this is the
difference between the driver planning over millions of files and
over the few hundred that can match.

All driver-side state is O(files) + the quantile boundary arrays
(2^bits doubles per column) — nothing scales with rows.
"""

from __future__ import annotations

import functools
import operator
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

ZORDER_BITS = 4  # 16 equi-depth buckets per dimension


def _bucket(col: str, bounds: list[float]) -> Column:
    """Equi-depth bucket id: how many quantile boundaries the value
    has passed. len(bounds) == 2^bits - 1 ⇒ id ∈ [0, 2^bits).
    A chain of codegen-friendly comparisons — no sort, no shuffle."""
    return functools.reduce(
        operator.add,
        [F.when(F.col(col) >= F.lit(b), 1).otherwise(0) for b in bounds],
        F.lit(0),
    )


def _interleave(b0: Column, b1: Column, bits: int = ZORDER_BITS) -> Column:
    """Morton/z-value: interleave the bits of two bucket ids."""
    z = F.lit(0)
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(b0, i).bitwiseAND(1), 2 * i + 1)
            + F.shiftleft(F.shiftright(b1, i).bitwiseAND(1), 2 * i)
        )
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    cols: tuple[str, str],
    num_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-order clustered write on two keys.

    Equi-depth boundaries come from ``approxQuantile`` (GK sketch —
    one pass, bounded driver state), so skewed keys still split into
    balanced buckets. The z-value is computed per row JVM-side, the
    write is one ``repartitionByRange`` shuffle on it, and the
    z-value itself is dropped from the output schema."""
    c0, c1 = cols
    probs = [i / (1 << ZORDER_BITS) for i in range(1, 1 << ZORDER_BITS)]
    bounds0 = df.approxQuantile(c0, probs, 0.001)
    bounds1 = df.approxQuantile(c1, probs, 0.001)
    z = _interleave(_bucket(c0, bounds0), _bucket(c1, bounds1))
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z", c0, c1)
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def file_column_stats(
    table_path: str, cols: tuple[str, ...], files: list[str] | None = None
) -> list[dict]:
    """Per-file min/max of each column from parquet footers.

    Metadata-only (the footer is KBs regardless of file size). A
    file without stats for a column gets (None, None) and is never
    pruned — the safe default."""
    import pyarrow.parquet as pq

    if files is None:
        files = [
            os.path.join(table_path, n)
            for n in sorted(os.listdir(table_path))
            if n.endswith(".parquet")
        ]
    out: list[dict] = []
    for path in files:
        meta = pq.ParquetFile(path).metadata
        idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        stats: dict = {"file": path}
        for col in cols:
            lo, hi = None, None
            ok = True
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(idx[col]).statistics
                if st is None or not st.has_min_max:
                    ok = False
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            stats[col] = (lo, hi) if ok else (None, None)
        out.append(stats)
    return out


def prune_files(
    table_path: str,
    predicates: dict[str, tuple],
    files: list[str] | None = None,
) -> tuple[list[str], int]:
    """Files whose footer ranges can satisfy every [lo, hi] range
    predicate. Returns (selected, total). Driver cost is O(files) —
    the planning step a commit-log format runs off its manifest."""
    stats = file_column_stats(table_path, tuple(predicates), files)
    selected = []
    for st in stats:
        keep = True
        for col, (lo, hi) in predicates.items():
            fmin, fmax = st[col]
            if fmin is None:
                continue  # no stats ⇒ cannot prune
            if (hi is not None and fmin > hi) or (lo is not None and fmax < lo):
                keep = False
                break
        if keep:
            selected.append(st["file"])
    return selected, len(stats)


def read_pruned(
    spark: SparkSession,
    table_path: str,
    predicates: dict[str, tuple],
    files: list[str] | None = None,
) -> DataFrame:
    """Range-predicate read over only the files that can match.

    The residual filter is still applied (file ranges over-approx),
    and it also reaches the parquet scan as a pushed filter for
    row-group skipping inside the selected files — two pruning
    levels, same as a commit-log format."""
    selected, _total = prune_files(table_path, predicates, files)
    if not selected:
        schema = spark.read.parquet(table_path).schema
        return spark.createDataFrame([], schema)
    df = spark.read.parquet(*selected)
    for col, (lo, hi) in predicates.items():
        if lo is not None:
            df = df.filter(F.col(col) >= lo)
        if hi is not None:
            df = df.filter(F.col(col) <= hi)
    return df


def read_snapshot_pruned(
    spark: SparkSession,
    table_path: str,
    predicates: dict[str, tuple],
    version: int | None = None,
) -> DataFrame:
    """Data skipping driven off the snapshot manifest: prune a
    VERSION's live file set (io/snapshots.py) by footer stats, then
    read only the survivors — the Delta/Iceberg read path (manifest
    → stats prune → scan) composed from the two mechanisms this
    package already has. Time-travel and skipping compose: any
    retained version prunes the same way."""
    from etl_gov_spark.io.snapshots import live_files

    return read_pruned(spark, table_path, predicates, live_files(table_path, version))
