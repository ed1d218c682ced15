"""Incremental-load merge operators (warehouse upsert / SCD2).

Spark-first analogue of the reference's warehouse load step
(``dags/tutorial_dag.py`` load task, ``dags/sql/sample.sql``): a
gov ETL platform re-loads dimensions incrementally, which needs
MERGE/upsert semantics and slowly-changing-dimension history. Both
are expressed as plain DataFrame plans (full-outer join; windowed
gaps-and-islands), so they run at fact-table scale with ordinary
shuffle-on-key behavior — no driver loops, no row-at-a-time logic.

Scale notes
- ``merge_upsert`` is one full-outer join on the merge key: both
  sides shuffle on the key once (or zero times if the tables are
  bucketed on it — see io.sinks.write_bucketed_table).
- SCD2 is two windows over (key, order): lag to detect change,
  running-sum to number runs, then a grouped min/max + lead for
  validity ranges. All partitions are per-key → skew-bounded by
  the busiest key's history, never by table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_gov_spark.io.sources import Catalog

_R4 = lambda c, n: F.round(c, 4).alias(n)  # noqa: E731


def merge_upsert(
    current: DataFrame, updates: DataFrame, key: str
) -> DataFrame:
    """Delta-style MERGE: update matched keys, insert new ones.

    One full-outer join on ``key``; updates win where both exist.
    Schemas must match. Returns the merged table as a plan.
    """
    cur = current.select([F.col(c).alias(f"cur_{c}") for c in current.columns])
    upd = updates.select([F.col(c).alias(f"upd_{c}") for c in updates.columns])
    joined = cur.join(
        upd, cur[f"cur_{key}"] == upd[f"upd_{key}"], "full_outer"
    )
    return joined.select(
        *[
            F.coalesce(F.col(f"upd_{c}"), F.col(f"cur_{c}")).alias(c)
            for c in current.columns
        ]
    )


def merge_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert demo: a deterministic update batch over ``customer``.

    Updates = every 10th customer with acctbal +100 plus one brand
    new synthetic customer per nation (key = 900000 + nationkey).
    Output is the merged rows for every 7th key — row-level proof
    that matched keys took the update and new keys were inserted.
    """
    c = Catalog(spark, sf_dir)
    cust = c.customer.select(
        "c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    updates = cust.filter(F.col("c_custkey") % 10 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") + 100.0
    )
    inserts = c.nation.select(
        (F.lit(900000) + F.col("n_nationkey").cast("long")).alias("c_custkey"),
        F.col("n_nationkey").alias("c_nationkey"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit("NEW").alias("c_mktsegment"),
    )
    merged = merge_upsert(cust, updates.unionByName(inserts), "c_custkey")
    return merged.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        "c_nationkey",
        _R4(F.col("c_acctbal"), "c_acctbal"),
        "c_mktsegment",
    )


MERGE_UPSERT_CUSTOMERS_SQL = """
WITH updates AS (
  SELECT c_custkey, c_nationkey, c_acctbal + 100.0 AS c_acctbal, c_mktsegment
  FROM customer WHERE c_custkey % 10 = 0
  UNION ALL
  SELECT 900000 + n_nationkey, n_nationkey, 0.0, 'NEW' FROM nation
), merged AS (
  SELECT coalesce(u.c_custkey, c.c_custkey) AS c_custkey,
         coalesce(u.c_nationkey, c.c_nationkey) AS c_nationkey,
         coalesce(u.c_acctbal, c.c_acctbal) AS c_acctbal,
         coalesce(u.c_mktsegment, c.c_mktsegment) AS c_mktsegment
  FROM customer c FULL OUTER JOIN updates u ON c.c_custkey = u.c_custkey
)
SELECT c_custkey, c_nationkey, round(c_acctbal, 4) AS c_acctbal, c_mktsegment
FROM merged WHERE c_custkey % 7 = 0
"""


def scd2_order_status_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history of order status per customer.

    Gaps-and-islands over each customer's orders by date: collapse
    consecutive same-status runs into validity windows
    [valid_from, valid_to) with is_current on the last run. Orders
    are ordered by (date, key) so runs are deterministic.
    """
    orders = Catalog(spark, sf_dir).orders.select(
        "o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    runs = orders.withColumn(
        "changed",
        (
            F.lag("o_orderstatus").over(w).isNull()
            | (F.lag("o_orderstatus").over(w) != F.col("o_orderstatus"))
        ).cast("long"),
    ).withColumn("run_id", F.sum("changed").over(w))
    hist = runs.groupBy("o_custkey", "run_id", "o_orderstatus").agg(
        F.min("o_orderdate").alias("valid_from"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w2 = Window.partitionBy("o_custkey").orderBy("run_id")
    return hist.select(
        "o_custkey",
        "run_id",
        "o_orderstatus",
        F.col("valid_from").cast("date").cast("string").alias("valid_from"),
        F.coalesce(
            F.lead("valid_from").over(w2).cast("date").cast("string"),
            F.lit("9999-12-31"),
        ).alias("valid_to"),
        (F.lead("valid_from").over(w2).isNull()).cast("int").alias("is_current"),
        "n_orders",
    )


SCD2_ORDER_STATUS_HISTORY_SQL = """
WITH runs AS (
  SELECT o_custkey, o_orderstatus, o_orderdate,
         CAST(sum(CASE WHEN prev IS NULL OR prev <> o_orderstatus THEN 1 ELSE 0 END)
           OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_id
  FROM (SELECT *, lag(o_orderstatus) OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey) AS prev FROM orders)
), hist AS (
  SELECT o_custkey, run_id, o_orderstatus,
         min(o_orderdate) AS valid_from, count(*) AS n_orders
  FROM runs GROUP BY o_custkey, run_id, o_orderstatus
)
SELECT o_custkey, run_id, o_orderstatus,
       CAST(CAST(valid_from AS DATE) AS VARCHAR) AS valid_from,
       coalesce(CAST(CAST(lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY run_id) AS DATE) AS VARCHAR),
                '9999-12-31') AS valid_to,
       CASE WHEN lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY run_id) IS NULL
            THEN 1 ELSE 0 END AS is_current,
       n_orders
FROM hist
"""


def latest_record_per_key(
    df: DataFrame, key_cols: list[str], order_cols: list[str]
) -> DataFrame:
    """CDC compaction: keep the newest record per key.

    max-by-struct, not row_number: a window sort materializes and
    sorts every version of every key; max(struct(order, payload))
    is an ordinary aggregate — map-side combinable, one shuffle on
    the key, skew-tolerant (AQE splits hot keys).
    """
    payload = [c for c in df.columns if c not in key_cols and c not in order_cols]
    ordered = F.struct(*[F.col(c) for c in order_cols], *[F.col(c) for c in payload])
    agg = df.groupBy(*key_cols).agg(F.max(ordered).alias("_r"))
    return agg.select(
        *key_cols, *[F.col(f"_r.{c}").alias(c) for c in (*order_cols, *payload)]
    )


def cdc_latest_order_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest order per customer (change-log compaction shape):
    orders as the change stream keyed by customer, newest wins
    (date, then orderkey as the deterministic tiebreak)."""
    orders = Catalog(spark, sf_dir).orders.select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    latest = latest_record_per_key(
        orders, ["o_custkey"], ["o_orderdate", "o_orderkey"]
    )
    return latest.select(
        "o_custkey",
        F.col("o_orderdate").cast("date").cast("string").alias("o_orderdate"),
        "o_orderkey",
        "o_orderstatus",
        _R4(F.col("o_totalprice"), "o_totalprice"),
    )


CDC_LATEST_ORDER_STATE_SQL = """
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


def merge_upsert_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-pruned copy-on-write MERGE (io/cow.py) end to end.

    The base table is ``customer`` range-clustered on the merge key
    into 10 files; the update batch touches only the lowest fifth of
    the key space (every 10th key there, acctbal +100) plus one
    brand-new key per nation (900000 + nationkey, beyond every
    file's range). The COW merge reads parquet-footer key ranges,
    rewrites only the ~2 files the update band intersects plus one
    new file for the inserts, and leaves the other ~8 files on disk
    byte-identical (asserted in tests/test_io_merge.py). Output =
    merged rows for every 7th key, same proof shape as
    merge_upsert_customers.
    """
    from etl_gov_spark.io.scratch import scratch_dir
    from etl_gov_spark.io.cow import merge_upsert_cow
    from etl_gov_spark.io.sinks import write_range_clustered

    c = Catalog(spark, sf_dir)
    cust = c.customer.select(
        "c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    work = scratch_dir("cow")
    # r16 OPTIMIZATION (guide §2.6): the base-table clustered write
    # and the 1-scalar max are independent jobs over the same input —
    # overlap them instead of paying the two walls back to back.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_write = pool.submit(
            write_range_clustered, cust, work, ("c_custkey",), num_files=10
        )
        # bounded scalar (one long), not data: the update band's edge
        f_mx = pool.submit(lambda: cust.agg(F.max("c_custkey")).collect()[0][0])
        f_write.result()
        mx = f_mx.result()
    updates = cust.filter(
        (F.col("c_custkey") % 10 == 0) & (F.col("c_custkey") * 5 <= F.lit(mx))
    ).withColumn("c_acctbal", F.col("c_acctbal") + 100.0)
    inserts = c.nation.select(
        (F.lit(900000) + F.col("n_nationkey").cast("long")).alias("c_custkey"),
        F.col("n_nationkey").alias("c_nationkey"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit("NEW").alias("c_mktsegment"),
    )
    merge_upsert_cow(spark, work, updates.unionByName(inserts), "c_custkey")
    merged = spark.read.parquet(work)
    return merged.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        "c_nationkey",
        _R4(F.col("c_acctbal"), "c_acctbal"),
        "c_mktsegment",
    )


MERGE_UPSERT_PRUNED_SQL = """
WITH mx AS (SELECT max(c_custkey) AS m FROM customer),
updates AS (
  SELECT c_custkey, c_nationkey, c_acctbal + 100.0 AS c_acctbal, c_mktsegment
  FROM customer, mx WHERE c_custkey % 10 = 0 AND c_custkey * 5 <= m
  UNION ALL
  SELECT 900000 + n_nationkey, n_nationkey, 0.0, 'NEW' FROM nation
), merged AS (
  SELECT coalesce(u.c_custkey, c.c_custkey) AS c_custkey,
         coalesce(u.c_nationkey, c.c_nationkey) AS c_nationkey,
         coalesce(u.c_acctbal, c.c_acctbal) AS c_acctbal,
         coalesce(u.c_mktsegment, c.c_mktsegment) AS c_mktsegment
  FROM customer c FULL OUTER JOIN updates u ON c.c_custkey = u.c_custkey
)
SELECT c_custkey, c_nationkey, round(c_acctbal, 4) AS c_acctbal, c_mktsegment
FROM merged WHERE c_custkey % 7 = 0
"""


def snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Versioned MERGE + time-travel diff (io/snapshots.py) end to
    end — the audit every regulated pipeline runs: "what exactly did
    last night's merge change?".

    The base table is ``customer`` range-clustered on the merge key;
    v1 is the snapshot-log init, v2 is a snapshot MERGE of the same
    update batch as merge_upsert_pruned (lowest-fifth keys +100
    acctbal, one insert per nation). Both versions stay readable
    from the same directory — the diff below joins
    ``read_snapshot(v2)`` against ``read_snapshot(v1)`` and reports
    every changed or inserted key with its before/after balance.
    The oracle recomputes the same diff from the update definition,
    so a MERGE that leaked into untouched rows, or a v1 read that
    saw post-merge files, hash-mismatches immediately.
    """
    from etl_gov_spark.io.scratch import scratch_dir
    from etl_gov_spark.io.sinks import write_range_clustered
    from etl_gov_spark.io.snapshots import (
        merge_upsert_snapshot,
        read_snapshot,
        snapshot_init,
    )

    c = Catalog(spark, sf_dir)
    cust = c.customer.select("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment")
    work = scratch_dir("snap")
    write_range_clustered(cust, work, ("c_custkey",), num_files=10)
    snapshot_init(work)
    mx = cust.agg(F.max("c_custkey")).collect()[0][0]
    updates = cust.filter(
        (F.col("c_custkey") % 10 == 0) & (F.col("c_custkey") * 5 <= F.lit(mx))
    ).withColumn("c_acctbal", F.col("c_acctbal") + 100.0)
    inserts = c.nation.select(
        (F.lit(900000) + F.col("n_nationkey").cast("long")).alias("c_custkey"),
        F.col("n_nationkey").alias("c_nationkey"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit("NEW").alias("c_mktsegment"),
    )
    merge_upsert_snapshot(spark, work, updates.unionByName(inserts), "c_custkey")
    v1 = read_snapshot(spark, work, 1).select(
        "c_custkey", F.col("c_acctbal").alias("bal_v1")
    )
    v2 = read_snapshot(spark, work, 2).select(
        "c_custkey", F.col("c_acctbal").alias("bal_v2")
    )
    return (
        v2.join(v1, "c_custkey", "left")
        .filter(F.col("bal_v1").isNull() | (F.col("bal_v2") != F.col("bal_v1")))
        .select(
            "c_custkey",
            _R4(F.col("bal_v1"), "bal_v1"),
            _R4(F.col("bal_v2"), "bal_v2"),
            F.when(F.col("bal_v1").isNull(), "insert")
            .otherwise("update")
            .alias("change"),
        )
    )


SNAPSHOT_TIME_TRAVEL_SQL = """
WITH mx AS (SELECT max(c_custkey) AS m FROM customer)
SELECT c_custkey, round(c_acctbal, 4) AS bal_v1,
       round(c_acctbal + 100.0, 4) AS bal_v2, 'update' AS change
FROM customer, mx WHERE c_custkey % 10 = 0 AND c_custkey * 5 <= m
UNION ALL
SELECT CAST(900000 + n_nationkey AS BIGINT), CAST(NULL AS DOUBLE),
       0.0, 'insert' FROM nation
"""


QUERIES: dict[str, tuple] = {
    "merge_upsert_customers": (merge_upsert_customers, MERGE_UPSERT_CUSTOMERS_SQL),
    "merge_upsert_pruned": (merge_upsert_pruned, MERGE_UPSERT_PRUNED_SQL),
    "snapshot_time_travel": (snapshot_time_travel, SNAPSHOT_TIME_TRAVEL_SQL),
    "scd2_order_status_history": (
        scd2_order_status_history,
        SCD2_ORDER_STATUS_HISTORY_SQL,
    ),
    "cdc_latest_order_state": (cdc_latest_order_state, CDC_LATEST_ORDER_STATE_SQL),
}


def scd2_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact→SCD2 temporal join: lineitem revenue attributed to the
    customer's status REGIME in force at ship time — the
    point-in-time dimension lookup every warehouse needs.

    Spark-first: instead of an interval join against [valid_from,
    valid_to) (broadcast-nested-loop at scale), union the dim-change
    events with the facts per customer and carry the status forward
    with one IGNORE-NULLS window — the as-of pattern again, linear
    per customer shard. Facts shipped before the first regime (this
    synthetic feed has them) land in 'unknown'.
    """
    cat = Catalog(spark, sf_dir)
    changes = scd2_order_status_history(spark, sf_dir).select(
        "o_custkey",
        F.col("valid_from").cast("date").alias("day"),
        F.col("o_orderstatus").alias("_status"),
        F.lit(0).alias("_kind"),
        # same-day regime flips exist (two runs can share a start
        # date); run_id makes the dim ordering total so "the regime
        # at end of day" is well-defined in both engines
        F.col("run_id").alias("_seq"),
        F.lit(None).cast("double").alias("_rev"),
    )
    facts = (
        cat.lineitem.join(
            cat.orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "o_custkey",
            F.to_date("l_shipdate").alias("day"),
            F.lit(None).cast("string").alias("_status"),
            F.lit(1).alias("_kind"),
            F.lit(0).cast("long").alias("_seq"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev"),
        )
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day", "_kind", "_seq")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tagged = changes.unionAll(facts).withColumn(
        "regime", F.last("_status", ignorenulls=True).over(w)
    )
    return (
        tagged.filter(F.col("_kind") == 1)
        .groupBy(F.coalesce("regime", F.lit("unknown")).alias("status_at_ship"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            _R4(F.sum("_rev"), "revenue"),
        )
    )


SCD2_TEMPORAL_JOIN_SQL = """
WITH runs AS (
  SELECT o_custkey, o_orderstatus, o_orderdate,
         CAST(sum(CASE WHEN prev IS NULL OR prev <> o_orderstatus THEN 1 ELSE 0 END)
           OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_id
  FROM (SELECT *, lag(o_orderstatus) OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey) AS prev FROM orders)
), hist AS (
  SELECT o_custkey, run_id, o_orderstatus, min(o_orderdate) AS valid_from
  FROM runs GROUP BY o_custkey, run_id, o_orderstatus
), changes AS (
  SELECT o_custkey, CAST(valid_from AS DATE) AS day,
         o_orderstatus AS status, 0 AS kind, run_id AS seq,
         CAST(NULL AS DOUBLE) AS rev
  FROM hist
), facts AS (
  SELECT o.o_custkey, CAST(l.l_shipdate AS DATE) AS day,
         CAST(NULL AS VARCHAR) AS status, 1 AS kind, 0 AS seq,
         l.l_extendedprice * (1 - l.l_discount) AS rev
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), tagged AS (
  SELECT *,
         last_value(status IGNORE NULLS) OVER (
           PARTITION BY o_custkey ORDER BY day, kind, seq
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS regime
  FROM (SELECT * FROM changes UNION ALL SELECT * FROM facts)
)
SELECT coalesce(regime, 'unknown') AS status_at_ship,
       count(*) AS n_lines,
       round(sum(rev), 4) AS revenue
FROM tagged
WHERE kind = 1
GROUP BY 1
"""

QUERIES["scd2_temporal_join"] = (scd2_temporal_join, SCD2_TEMPORAL_JOIN_SQL)


def incremental_rollup_merge(
    stored: DataFrame, delta: DataFrame, keys: list[str], sums: list[str]
) -> DataFrame:
    """Incremental view maintenance for a sum/count rollup: the
    stored aggregate rows and the new partition's aggregate rows
    are unioned and re-reduced on the group keys — a commutative-
    monoid merge, so the history is NEVER re-scanned; only the
    delta partition is read. This is how a daily 100 TB pipeline
    keeps a rollup current: agg cost is O(delta) + O(state), not
    O(history)."""
    return stored.unionByName(delta).groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in sums]
    )


def q_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type revenue rollup maintained incrementally: state
    = aggregate of all days before the last, delta = the last day
    only, merged with incremental_rollup_merge. Equality with the
    full recompute is the oracle; the only-delta-is-scanned property
    is plan-asserted in tests/test_io_merge.py."""
    ev = Catalog(spark, sf_dir).events.select(
        "event_type", F.to_date("ts").alias("day"), "value"
    )
    # bounded scalar: the incremental cutover day
    cutoff = ev.agg(F.max("day")).collect()[0][0]
    state = (
        ev.filter(F.col("day") < F.lit(cutoff))
        .groupBy("event_type")
        .agg(F.sum("value").alias("revenue"), F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    delta = (
        ev.filter(F.col("day") == F.lit(cutoff))
        .groupBy("event_type")
        .agg(F.sum("value").alias("revenue"), F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    merged = incremental_rollup_merge(
        state, delta, ["event_type"], ["revenue", "n_events"]
    )
    return merged.select(
        "event_type", _R4(F.col("revenue"), "revenue"), "n_events"
    )


Q_INCREMENTAL_ROLLUP_SQL = """
SELECT event_type, round(sum(value), 4) AS revenue,
       count(*) AS n_events
FROM events GROUP BY event_type
"""

QUERIES["q_incremental_rollup"] = (q_incremental_rollup, Q_INCREMENTAL_ROLLUP_SQL)


def snapshot_delete_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-pruned snapshot DELETE end to end — the GDPR-erasure
    audit: range-cluster ``customer`` on the key, commit v1, delete
    every 13th key as a COW snapshot commit (only footer-range-hit
    files rewritten; the rest carried forward byte-identical), then
    report the surviving per-nation census from the post-delete
    version. The oracle recomputes the census straight from the
    base table, so a delete that dropped too much, too little, or
    leaked into untouched files hash-mismatches.

    See io/snapshots.py:delete_where_snapshot for the pruning
    mechanics (same footer-stats manifest as the snapshot MERGE).
    """
    from etl_gov_spark.io.scratch import scratch_dir
    from etl_gov_spark.io.sinks import write_range_clustered
    from etl_gov_spark.io.snapshots import (
        delete_where_snapshot,
        read_snapshot,
        snapshot_init,
    )

    c = Catalog(spark, sf_dir)
    cust = c.customer.select("c_custkey", "c_nationkey", "c_acctbal")
    work = scratch_dir("snapdel")
    write_range_clustered(cust, work, ("c_custkey",), num_files=10)
    snapshot_init(work)
    doomed = cust.filter(F.col("c_custkey") % 13 == 0).select("c_custkey")
    delete_where_snapshot(spark, work, doomed, "c_custkey")
    survivors = read_snapshot(spark, work)  # latest = post-delete
    return survivors.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
    )


SNAPSHOT_DELETE_PRUNED_SQL = """
SELECT c_nationkey, count(*) AS n_customers,
       round(sum(c_acctbal), 2) AS sum_bal
FROM customer
WHERE c_custkey % 13 <> 0
GROUP BY c_nationkey
"""

QUERIES["snapshot_delete_pruned"] = (
    snapshot_delete_pruned,
    SNAPSHOT_DELETE_PRUNED_SQL,
)


_MV_CUTOFF = "1995-06-01"  # shipdate cutover: state | delta


def q_incremental_join_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN materialized view —
    per-nation net revenue over orders⋈lineitem⋈customer — where
    only the DELTA lineitems (shipped on/after the cutoff) are
    joined on refresh: state is the pre-cutoff aggregate, the delta
    joins against the dimensions alone, and the two merge by key.
    Equality with the full recompute is the oracle — the property
    that makes delta-refresh trustworthy.

    This is the join-view step past ``q_incremental_rollup``'s
    aggregate-only maintenance: the delta side still needs its
    dimension joins, but the FACT history is never rescanned. At
    100 TB the state would live as a snapshot-log table and only
    the delta join runs per refresh.
    """
    c = Catalog(spark, sf_dir)
    li = c.lineitem.select(
        "l_orderkey",
        F.to_date("l_shipdate").alias("ship"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net"),
    )
    dims = c.orders.select("o_orderkey", "o_custkey").join(
        c.customer.select("c_custkey", "c_nationkey"),
        F.col("o_custkey") == F.col("c_custkey"),
    )

    def rollup(part):
        return (
            part.join(dims, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("c_nationkey")
            .agg(
                F.sum("net").alias("net_revenue"),
                F.count(F.lit(1)).cast("long").alias("n_lines"),
            )
        )

    state = rollup(li.filter(F.col("ship") < F.lit(_MV_CUTOFF)))
    delta = rollup(li.filter(F.col("ship") >= F.lit(_MV_CUTOFF)))
    merged = incremental_rollup_merge(
        state, delta, ["c_nationkey"], ["net_revenue", "n_lines"]
    )
    return merged.select(
        "c_nationkey", F.round("net_revenue", 2).alias("net_revenue"), "n_lines"
    )


Q_INCREMENTAL_JOIN_MV_SQL = """
SELECT c.c_nationkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS net_revenue,
       count(*) AS n_lines
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_nationkey
"""

QUERIES["q_incremental_join_mv"] = (
    q_incremental_join_mv,
    Q_INCREMENTAL_JOIN_MV_SQL,
)


def snapshot_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE end to end: init customer as v1, run the standard
    update MERGE (v2), then roll back to v1 as a new commit v3 and
    report the per-nation census from the head — which must equal
    the ORIGINAL table exactly (the oracle recomputes it from
    base), proving the rollback re-exposes v1's file set while the
    botched v2 stays in history for audit.

    See io/snapshots.py:rollback_snapshot — restore is a manifest
    commit, no data movement at any scale.
    """
    from etl_gov_spark.io.scratch import scratch_dir
    from etl_gov_spark.io.sinks import write_range_clustered
    from etl_gov_spark.io.snapshots import (
        merge_upsert_snapshot,
        read_snapshot,
        rollback_snapshot,
        snapshot_init,
    )

    c = Catalog(spark, sf_dir)
    cust = c.customer.select("c_custkey", "c_nationkey", "c_acctbal")
    work = scratch_dir("snapro")
    write_range_clustered(cust, work, ("c_custkey",), num_files=8)
    snapshot_init(work)
    updates = cust.filter(F.col("c_custkey") % 5 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") + 777.0
    )
    merge_upsert_snapshot(spark, work, updates, "c_custkey")  # v2 (botched)
    rollback_snapshot(work, 1)  # v3 = v1 again
    head = read_snapshot(spark, work)
    return head.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
    )


SNAPSHOT_ROLLBACK_SQL = """
SELECT c_nationkey, count(*) AS n_customers,
       round(sum(c_acctbal), 2) AS sum_bal
FROM customer GROUP BY c_nationkey
"""

QUERIES["snapshot_rollback"] = (snapshot_rollback, SNAPSHOT_ROLLBACK_SQL)
