"""Relational / analytical query pack (SURVEY.md §2.A).

Spark-first re-expression of the reference's warehouse analytics
surface (ETL-GOV runs SQL against a warehouse — ``dags/sql/
sample.sql``, ``tutorial_dag.py`` load/transform steps). Every query
is a declarative DataFrame plan: Catalyst pushes filters to the
parquet scan, prunes columns, and (with AQE) picks broadcast vs
shuffle join at runtime.

Scale notes per query live in each docstring; the shared stance:
- dimension joins (region/nation/supplier/part) are broadcast —
  they stay small at any gov-data scale
- fact-fact joins (orders⋈lineitem) shuffle on the join key; at
  100 TB you'd bucket both tables on orderkey (io.sinks.
  write_bucketed_table) and these plans become shuffle-free
- every float aggregate is rounded (4 dp) both here and in the
  DuckDB oracle so FP summation order can't flip the value hash

Each entry: ``QUERIES[name] = (fn(spark, sf_dir) -> DataFrame,
oracle_sql | None)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_gov_spark.io.sources import Catalog

_R4 = lambda c, n: F.round(c, 4).alias(n)  # noqa: E731


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: single fact scan → groupBy agg.

    Scale: pure map-side-combine aggregation on a 6-value key —
    the shuffle moves only (#partitions × 6) pre-aggregated rows no
    matter how large lineitem is. Filter + 7-column projection reach
    the parquet scan (PushedFilters / ReadSchema).
    """
    li = Catalog(spark, sf_dir).lineitem
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-06-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _R4(F.sum("l_quantity"), "sum_qty"),
            _R4(F.sum("l_extendedprice"), "sum_base_price"),
            _R4(F.sum(disc_price), "sum_disc_price"),
            _R4(F.sum(charge), "sum_charge"),
            _R4(F.avg("l_quantity"), "avg_qty"),
            _R4(F.avg("l_extendedprice"), "avg_price"),
            _R4(F.avg("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4)                                  AS sum_qty,
       round(sum(l_extendedprice), 4)                             AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4)          AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
       round(avg(l_quantity), 4)                                  AS avg_qty,
       round(avg(l_extendedprice), 4)                             AS avg_price,
       round(avg(l_discount), 4)                                  AS avg_disc,
       count(*)                                                   AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-06-01'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + deterministic top-10.

    Scale: customer filter shrinks the build side before the
    orders⋈customer join; orders⋈lineitem is the big shuffle (bucket
    both on orderkey at scale). Top-k is a local-then-global
    TakeOrdered — no full sort. Tie-break on l_orderkey (unique) so
    the LIMIT row set is deterministic.
    """
    c = Catalog(spark, sf_dir)
    cust = c.customer.filter(F.col("c_mktsegment") == "BUILDING")
    orders = c.orders.filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    li = c.lineitem.filter(F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_R4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), "revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       CAST(o_orderdate AS DATE) AS o_orderdate,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1996-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join, region-filtered.

    Scale: region/nation/supplier are broadcast (DIM_TABLES); only
    customer⋈orders⋈lineitem shuffle. The c_nationkey = s_nationkey
    predicate rides on the broadcast nation join, not a fact-fact
    shuffle.
    """
    c = Catalog(spark, sf_dir)
    region = F.broadcast(c.region.filter(F.col("r_name") == "ASIA"))
    nation = F.broadcast(c.nation)
    supplier = F.broadcast(c.supplier)
    orders = c.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return (
        c.customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(c.lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(_R4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), "revenue"))
    )


Q5_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: tight scan + single aggregate.

    Scale: every predicate and both referenced columns push to the
    parquet scan; the 'shuffle' is one row per partition. This is
    the query to check ``PushedFilters`` on.
    """
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(_R4(F.sum(F.col("l_extendedprice") * F.col("l_discount")), "revenue"))
    )


Q6_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue, top-20 customers."""
    c = Catalog(spark, sf_dir)
    li = c.lineitem.filter(F.col("l_returnflag") == "R")
    return (
        c.customer.join(c.orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(_R4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), "revenue"))
        .select("c_custkey", "c_name", "n_name", _R4(F.col("c_acctbal"), "c_acctbal"), "revenue")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       round(c_acctbal, 4) AS c_acctbal,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q_market_segment_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per market segment + share-of-total via a window.

    Scale: the window is over an already tiny aggregate (5 rows) —
    the heavy lifting is the partial-agg groupBy underneath it.
    """
    c = Catalog(spark, sf_dir)
    seg = (
        c.customer.join(c.orders, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(F.sum("o_totalprice").alias("_rev"))
    )
    w = Window.partitionBy()
    return seg.select(
        "c_mktsegment",
        _R4(F.col("_rev"), "revenue"),
        _R4(F.col("_rev") / F.sum("_rev").over(w), "revenue_share"),
    )


Q_MKT_SHARE_SQL = """
SELECT c_mktsegment,
       round(rev, 4) AS revenue,
       round(rev / sum(rev) OVER (), 4) AS revenue_share
FROM (
  SELECT c_mktsegment, sum(o_totalprice) AS rev
  FROM customer JOIN orders ON c_custkey = o_custkey
  GROUP BY c_mktsegment
)
"""


def q_top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by order revenue within each nation (window
    rank, tie-broken on custkey → deterministic rows).

    Scale: rank partitions by nation — bounded cardinality, so no
    single-partition global sort; skewed nations split by AQE.
    """
    c = Catalog(spark, sf_dir)
    rev = (
        c.orders.groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("_rev"))
        .join(c.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    w = Window.partitionBy("n_name").orderBy(F.desc("_rev"), F.asc("c_custkey"))
    return (
        rev.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("n_name", "c_custkey", "c_name", _R4(F.col("_rev"), "revenue"), "rank")
    )


Q_TOP_CUST_SQL = """
SELECT n_name, c_custkey, c_name, round(rev, 4) AS revenue, rank
FROM (
  SELECT n_name, c_custkey, c_name, rev,
         CAST(row_number() OVER (PARTITION BY n_name ORDER BY rev DESC, c_custkey ASC) AS INTEGER) AS rank
  FROM (
    SELECT c_custkey, c_name, c_nationkey, sum(o_totalprice) AS rev
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name, c_nationkey
  ) r JOIN nation ON c_nationkey = n_nationkey
)
WHERE rank <= 3
"""


def q_rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(nation, order year): nation totals, per-year detail,
    grand total in one pass (Catalyst expands grouping sets into a
    single shuffle)."""
    c = Catalog(spark, sf_dir)
    base = (
        c.orders.join(c.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", F.year("o_orderdate").cast("int").alias("order_year"), "o_totalprice")
    )
    return (
        base.rollup("n_name", "order_year")
        .agg(_R4(F.sum("o_totalprice"), "total_sales"), F.count(F.lit(1)).alias("n_orders"))
    )


Q_ROLLUP_SQL = """
SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS order_year,
       round(sum(o_totalprice), 4) AS total_sales,
       count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY ROLLUP (n_name, order_year)
"""


def q_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 4 grouping sets, one shuffle."""
    orders = Catalog(spark, sf_dir).orders
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), _R4(F.sum("o_totalprice"), "total_price"))
    )


Q_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       round(sum(o_totalprice), 4) AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order status → columns, per priority row.

    Scale: explicit pivot value list ('F','O','P') — without it
    Spark runs an extra distinct pass to discover values.
    """
    orders = Catalog(spark, sf_dir).orders
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum("o_totalprice"))
        .select(
            "o_orderpriority",
            _R4(F.coalesce(F.col("F"), F.lit(0.0)), "status_f"),
            _R4(F.coalesce(F.col("O"), F.lit(0.0)), "status_o"),
            _R4(F.coalesce(F.col("P"), F.lit(0.0)), "status_p"),
        )
    )


Q_PIVOT_SQL = """
SELECT o_orderpriority,
       round(coalesce(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 0), 4) AS status_f,
       round(coalesce(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 0), 4) AS status_o,
       round(coalesce(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 0), 4) AS status_p
FROM orders
GROUP BY o_orderpriority
"""


def q_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi + left-anti join: customers with / without orders
    per market segment (EXISTS / NOT EXISTS re-expression).

    Scale: semi/anti joins ship only the join key of the probe side
    and stop at first match — strictly cheaper than join+distinct.
    """
    c = Catalog(spark, sf_dir)
    okeys = c.orders.select("o_custkey")
    with_orders = (
        c.customer.join(okeys, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_with_orders"))
    )
    without_orders = (
        c.customer.join(okeys, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_without_orders"))
    )
    return (
        with_orders.join(without_orders, "c_mktsegment", "full_outer")
        .select(
            "c_mktsegment",
            F.coalesce("n_with_orders", F.lit(0)).alias("n_with_orders"),
            F.coalesce("n_without_orders", F.lit(0)).alias("n_without_orders"),
        )
    )


Q_SEMI_ANTI_SQL = """
SELECT c_mktsegment,
       count(*) FILTER (WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey))     AS n_with_orders,
       count(*) FILTER (WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS n_without_orders
FROM customer
GROUP BY c_mktsegment
"""


def q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts per return flag (two distinct aggs in
    one pass — Catalyst expands to grouping-id plan).

    Scale: for dashboards use approx_count_distinct (HLL, one pass,
    no expand) — exact version kept here because the oracle compares
    values; the HLL variant is asserted within 2% in tests.
    """
    li = Catalog(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


Q_DISTINCT_SQL = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps,
       count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (p50/p90/p99) per return flag.

    Scale: exact percentile needs per-group sort; for 100 TB use
    approx_percentile (t-digest-style sketch, mergeable, one pass) —
    tested against exact within tolerance in tests; the oracle
    compares the exact form (quantile_cont ≡ Spark percentile).
    """
    li = Catalog(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        _R4(F.percentile("l_extendedprice", F.lit(0.5)), "p50_price"),
        _R4(F.percentile("l_extendedprice", F.lit(0.9)), "p90_price"),
        _R4(F.percentile("l_extendedprice", F.lit(0.99)), "p99_price"),
    )


Q_PERCENTILES_SQL = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 4)  AS p50_price,
       round(quantile_cont(l_extendedprice, 0.9), 4)  AS p90_price,
       round(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price,
FROM lineitem
GROUP BY l_returnflag
"""


def q_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS rewrite: orders having any line item with
    quantity > 45, counted per priority (left-semi join plan)."""
    c = Catalog(spark, sf_dir)
    big_lines = c.lineitem.filter(F.col("l_quantity") > 45).select("l_orderkey")
    return (
        c.orders.join(big_lines, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), _R4(F.avg("o_totalprice"), "avg_price"))
    )


Q_EXISTS_SQL = """
SELECT o_orderpriority, count(*) AS n_orders, round(avg(o_totalprice), 4) AS avg_price
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
GROUP BY o_orderpriority
"""


QUERIES: dict[str, tuple] = {
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "q3_shipping_priority": (q3_shipping_priority, Q3_SQL),
    "q5_local_supplier": (q5_local_supplier, Q5_SQL),
    "q6_forecast_revenue": (q6_forecast_revenue, Q6_SQL),
    "q10_returned_items": (q10_returned_items, Q10_SQL),
    "q_market_segment_share": (q_market_segment_share, Q_MKT_SHARE_SQL),
    "q_top_customers_per_nation": (q_top_customers_per_nation, Q_TOP_CUST_SQL),
    "q_rollup_sales": (q_rollup_sales, Q_ROLLUP_SQL),
    "q_cube_status_priority": (q_cube_status_priority, Q_CUBE_SQL),
    "q_pivot_status": (q_pivot_status, Q_PIVOT_SQL),
    "q_semi_anti": (q_semi_anti, Q_SEMI_ANTI_SQL),
    "q_distinct_counts": (q_distinct_counts, Q_DISTINCT_SQL),
    "q_percentiles": (q_percentiles, Q_PERCENTILES_SQL),
    "q_correlated_exists": (q_correlated_exists, Q_EXISTS_SQL),
}
