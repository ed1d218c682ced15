"""Scale-safe global ordering primitives (exact ntile / rank /
running totals without a single-partition sort).

A bare ``Window.orderBy(...)`` — the textbook way to write a global
``ntile`` / ``row_number`` / running total — compiles to
``Exchange SinglePartition`` + one-node sort: every row of the input
moves to ONE task. Fine on 60k rows, fatal on 100 TB (Spark itself
prints "Moving all data to a single partition" while it runs).

``ranged_global_rank`` computes the SAME answer with no single-
partition stage:

1. ``repartitionByRange(P, order_cols)`` parallel-sorts: partition i
   holds a contiguous slice of the total order (ties co-located
   because the tie-break columns are part of the range key).
2. A per-partition ``row_number()`` window (partitioned by
   ``spark_partition_id()``) ranks each slice locally — P parallel
   sorts of ~N/P rows each.
3. A P-row ledger (per-partition counts + prefix-column totals) is
   collected on the driver — P values, never data — and lifted back
   row-local as array literals indexed by partition id: global rank
   = slice offset + local rank; running total = prior-slice total +
   local running total.
4. ``ntile(n)`` is then pure row arithmetic on the global rank and
   the known total count (the exact SQL ntile formula: the first
   ``N mod n`` buckets get ``ceil(N/n)`` rows, the rest ``floor``).

The range-partitioned input is pinned with a lazy ``localCheckpoint``
so the ledger job and the main query read the same materialization
(and the expensive upstream is computed once). Callers should project
to the needed columns FIRST — the checkpoint stores what it's given.

Running totals are supported over *long* columns only: integer
prefix sums are associative, so slice-offset + local-sum is EXACTLY
the sequential result and hash-matches a sequential-window oracle.
(A double prefix sum re-associated across slices drifts in the last
ulps — callers sum cents/units as longs and rescale at the end.)

Reference parity: replaces the reference's single-node ORDER BY
semantics (any ``dags/`` pandas rank/qcut step) at cluster scale.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["ranged_global_rank", "exact_ntile_col", "ranged_lag"]


def exact_ntile_col(rank: Column, n: int, total: int) -> Column:
    """SQL ``ntile(n)`` bucket from a 1-based global rank and the
    total row count: first ``total % n`` buckets take ``q+1`` rows
    (``q = total // n``), the rest take ``q``. Pure row-local
    arithmetic — no window, no shuffle."""
    q, r = divmod(int(total), n)
    if q == 0:
        # fewer rows than buckets: bucket == rank
        return rank.cast("int")
    big = r * (q + 1)  # rows living in the q+1-sized buckets
    return (
        F.when(rank <= big, F.ceil(rank / F.lit(q + 1)))
        .otherwise(F.lit(r) + F.ceil((rank - F.lit(big)) / F.lit(q)))
        .cast("int")
    )


def ranged_global_rank(
    df: DataFrame,
    order_cols: Sequence[Column],
    *,
    rank_col: str | None = "rank",
    ntiles: dict[str, int] | None = None,
    running_longs: dict[str, str] | None = None,
    running_max_longs: dict[str, str] | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Global 1-based rank over ``order_cols`` (a TOTAL order — pass
    a unique tie-break column last) with no Exchange SinglePartition.

    Adds to ``df``:
    - ``rank_col``: the global row_number (omit with ``None``),
    - one ``int`` column per ``ntiles`` entry ``{out_col: n}``
      (exact SQL ntile over the same order),
    - one ``long`` column per ``running_longs`` entry
      ``{out_col: src_col}``: running sum of the LONG column
      ``src_col`` in rank order, inclusive of the current row,
    - one ``long`` column per ``running_max_longs`` entry
      ``{out_col: src_col}``: running MAX of the LONG column
      ``src_col`` in rank order, inclusive of the current row (the
      high-water-mark shape — e.g. a streaming event-time watermark
      replay) — same P-row ledger, prefix-max instead of prefix-sum.

    ``order_cols`` must be column *expressions* (``F.asc``/``F.desc``
    wrapped as needed); they are used both to range-partition and to
    sort within each range.
    """
    spark = df.sparkSession
    p = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    # The P-row ledger is lifted back into the plan as array LITERALS
    # indexed by partition id — O(P) driver memory and plan size, by
    # design independent of N. That contract inverts if a cluster
    # runs with an extreme shuffle parallelism (P ≈ 10⁵ makes the
    # literal a megabyte-scale expression per lifted column); cap the
    # ledger width and fail loudly rather than build a degenerate
    # plan — callers pass ``partitions=`` explicitly at that scale.
    if p > 32_768:
        raise ValueError(
            f"ranged_global_rank ledger width {p} exceeds the literal-"
            "lift budget (32768); pass partitions= explicitly"
        )
    ntiles = ntiles or {}
    running_longs = running_longs or {}
    running_max_longs = running_max_longs or {}
    sum_srcs = sorted(set(running_longs.values()))
    max_srcs = sorted(set(running_max_longs.values()))

    ranged = (
        df.repartitionByRange(p, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )

    # P-row ledger: per-slice row counts, long totals and long maxes.
    ledger = (
        ranged.groupBy("_pid")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            *[F.sum(c).alias(f"_s_{c}") for c in sum_srcs],
            *[F.max(c).alias(f"_m_{c}") for c in max_srcs],
        )
        .collect()
    )
    ledger.sort(key=lambda row: row["_pid"])
    total = sum(row["_n"] for row in ledger)
    if total == 0:
        out = ranged.drop("_pid")
        if rank_col:
            out = out.withColumn(rank_col, F.lit(None).cast("long"))
        for name in ntiles:
            out = out.withColumn(name, F.lit(None).cast("int"))
        for name in running_longs:
            out = out.withColumn(name, F.lit(None).cast("long"))
        for name in running_max_longs:
            out = out.withColumn(name, F.lit(None).cast("long"))
        return out

    # Exclusive prefix offsets, positioned by partition id. Range
    # partition ids are dense 0..p-1 but empty slices may be absent
    # from the ledger — index by pid, defaulting to the running total.
    max_pid = ledger[-1]["_pid"]
    _LONG_MIN = -(2**63)
    rank_off = [0] * (max_pid + 1)
    sum_off = {c: [0] * (max_pid + 1) for c in sum_srcs}
    max_off = {c: [_LONG_MIN] * (max_pid + 1) for c in max_srcs}
    run_n = 0
    run_s = {c: 0 for c in sum_srcs}
    run_m = {c: _LONG_MIN for c in max_srcs}
    it = iter(ledger)
    row = next(it, None)
    for pid in range(max_pid + 1):
        rank_off[pid] = run_n
        for c in sum_srcs:
            sum_off[c][pid] = run_s[c]
        for c in max_srcs:
            max_off[c][pid] = run_m[c]
        if row is not None and row["_pid"] == pid:
            run_n += row["_n"]
            for c in sum_srcs:
                run_s[c] += int(row[f"_s_{c}"] or 0)
            for c in max_srcs:
                v = row[f"_m_{c}"]
                if v is not None and int(v) > run_m[c]:
                    run_m[c] = int(v)
            row = next(it, None)

    w = Window.partitionBy("_pid").orderBy(*order_cols)
    idx = F.col("_pid") + 1  # element_at is 1-based
    grank = (
        F.element_at(F.lit(rank_off), idx) + F.row_number().over(w)
    ).cast("long")

    out = ranged
    keep_rank = rank_col or "_grank"
    out = out.withColumn(keep_rank, grank)
    for name, n in ntiles.items():
        out = out.withColumn(name, exact_ntile_col(F.col(keep_rank), n, total))
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    for name, src in running_longs.items():
        out = out.withColumn(
            name,
            (
                F.element_at(F.lit(sum_off[src]), idx)
                + F.sum(src).over(cum)
            ).cast("long"),
        )
    for name, src in running_max_longs.items():
        out = out.withColumn(
            name,
            F.greatest(
                F.element_at(F.lit(max_off[src]), idx),
                F.max(src).over(cum),
            ).cast("long"),
        )
    out = out.drop("_pid")
    if not rank_col:
        out = out.drop("_grank")
    return out


def ranged_lag(
    df: DataFrame,
    order_cols: Sequence[Column],
    lag_cols: dict[str, str],
    *,
    partitions: int | None = None,
) -> DataFrame:
    """Global ``lag(src, 1)`` over a TOTAL order with no
    ``Exchange SinglePartition`` — the ``ranged_global_rank``
    sibling for inter-event gaps / deltas at fact grain.

    Adds one column per ``lag_cols`` entry ``{out_col: src_col}``:
    the value of ``src_col`` on the order-predecessor row, NULL on
    the globally first row — exactly ``lag(src) OVER (ORDER BY
    order_cols)``.

    Mechanism: ``repartitionByRange(P, order_cols)`` parallel-sorts
    into P contiguous slices; inside each slice an ordinary
    partitioned ``lag`` window fills every row but the slice's
    first; a P-row boundary ledger (each slice's LAST values of the
    lagged columns, via ``max_by`` on the local row_number — P
    rows, never data) is collected on the driver and lifted back as
    array literals indexed by partition id, handing slice i-1's
    last row to slice i's first (skipping empty slices). Same
    contract as ``ranged_global_rank``: ``order_cols`` must be a
    total order (pass a unique tie-break last) given as column
    expressions, and callers should project first — the lazy
    ``localCheckpoint`` pins what it's given so the ledger job and
    the main query read one materialization.
    """
    spark = df.sparkSession
    p = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    if p > 32_768:  # same literal-lift budget as ranged_global_rank
        raise ValueError(
            f"ranged_lag ledger width {p} exceeds the literal-lift "
            "budget (32768); pass partitions= explicitly"
        )
    srcs = sorted(set(lag_cols.values()))
    dtypes = dict(df.dtypes)

    ranged = (
        df.repartitionByRange(p, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    numbered = ranged.withColumn("_rn", F.row_number().over(w))

    # P-row boundary ledger: each slice's last-row values.
    ledger = (
        numbered.groupBy("_pid")
        .agg(*[F.max_by(c, "_rn").alias(c) for c in srcs])
        .collect()
    )
    ledger.sort(key=lambda row: row["_pid"])
    if not ledger:
        out = numbered
        for name, src in lag_cols.items():
            out = out.withColumn(name, F.lit(None).cast(dtypes[src]))
        return out.drop("_pid", "_rn")

    # boundary[c][pid] = last value of the nearest NON-EMPTY slice
    # before pid (range partition ids are dense but slices can be
    # empty and absent from the ledger).
    max_pid = ledger[-1]["_pid"]
    boundary = {c: [None] * (max_pid + 1) for c in srcs}
    last: dict[str, object] = {c: None for c in srcs}
    it = iter(ledger)
    row = next(it, None)
    for pid in range(max_pid + 1):
        for c in srcs:
            boundary[c][pid] = last[c]
        if row is not None and row["_pid"] == pid:
            for c in srcs:
                last[c] = row[c]
            row = next(it, None)

    out = numbered
    idx = F.col("_pid") + 1  # element_at is 1-based
    for name, src in lag_cols.items():
        arr = F.array(
            *[F.lit(v).cast(dtypes[src]) for v in boundary[src]]
        )
        out = out.withColumn(
            name,
            F.when(F.col("_rn") == 1, F.element_at(arr, idx)).otherwise(
                F.lag(src).over(w)
            ),
        )
    return out.drop("_pid", "_rn")
