"""Window-function pack (SURVEY.md §2.A, wave 4): grouping sets,
lead/lag deltas, range-frame rolling aggregates, distribution ranks,
and frame-bounded first/last values.

Capability parity target: the reference's warehouse-SQL reporting
surface — period-over-period deltas, rolling sums, and rank
distributions are the canonical gov-report shapes.

Scale stance: every window here partitions by a real key (nation,
customer, segment) so state is distributed — no global single-
partition windows; range frames use integer day ordinals (both
engines agree exactly); partial aggregation precedes every window
where the window consumes aggregated rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_gov_spark.io.sources import Catalog

_R4 = lambda c, n: F.round(c, 4).alias(n)  # noqa: E731


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS ((nation), (year), ()) over order revenue with
    grouping_id — the multi-level report a ROLLUP can't shape.

    Scale: Spark expands grouping sets map-side (one scan, one
    shuffle per distinct grouping-column tuple) — no re-scan per
    level.
    """
    c = Catalog(spark, sf_dir)
    j = (
        c.orders.join(c.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", F.year("o_orderdate").alias("o_year"), "o_totalprice")
    )
    j.createOrReplaceTempView("_gs_base")
    return spark.sql(
        """
        SELECT n_name, o_year,
               CAST(grouping_id(n_name, o_year) AS INTEGER) AS gid,
               round(sum(o_totalprice), 4) AS revenue,
               count(*) AS n_orders
        FROM _gs_base
        GROUP BY GROUPING SETS ((n_name), (o_year), ())
        """
    )


Q_GROUPING_SETS_SQL = """
SELECT n_name, o_year, CAST(grouping_id(n_name, o_year) AS INTEGER) AS gid,
       round(sum(o_totalprice), 4) AS revenue, count(*) AS n_orders
FROM (
  SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS o_year, o_totalprice
  FROM orders JOIN customer ON o_custkey = c_custkey
              JOIN nation   ON c_nationkey = n_nationkey
)
GROUP BY GROUPING SETS ((n_name), (o_year), ())
"""


def q_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth per nation via lag().

    Scale: aggregate first (nation × month — bounded key), window
    second; the window sees only the aggregated rows, so the sort is
    over |nations|×|months| rows regardless of fact size.
    """
    c = Catalog(spark, sf_dir)
    monthly = (
        c.orders.join(c.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(F.round(F.sum("o_totalprice"), 4).alias("revenue"))
    )
    w = Window.partitionBy("n_name").orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "n_name",
        F.col("month").cast("date").alias("month"),
        "revenue",
        _R4(prev, "prev_revenue"),
        # integer-path 4-dp + "+ 0.0": the ratio lands on exact 4-dp
        # half-ties AND Spark's BigDecimal round collapses -0.0 to
        # +0.0 while DuckDB keeps the sign — normalize both (sf0.1
        # gate finding, round 12)
        (
            F.round(
                F.when(
                    prev.isNotNull() & (prev != 0),
                    (F.col("revenue") - prev) / prev,
                )
                * 10000.0
            )
            / 10000.0
            + 0.0
        ).alias("growth"),
    )


Q_MONTHLY_GROWTH_SQL = """
WITH monthly AS (
  SELECT n_name, CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         round(sum(o_totalprice), 4) AS revenue
  FROM orders JOIN customer ON o_custkey = c_custkey
              JOIN nation   ON c_nationkey = n_nationkey
  GROUP BY 1, 2
)
SELECT n_name, month, revenue,
       round(lag(revenue) OVER w, 4) AS prev_revenue,
       round(CASE WHEN lag(revenue) OVER w IS NOT NULL AND lag(revenue) OVER w <> 0
                  THEN (revenue - lag(revenue) OVER w) / lag(revenue) OVER w END
             * 10000.0) / 10000.0 + 0.0 AS growth
FROM monthly
WINDOW w AS (PARTITION BY n_name ORDER BY month)
"""


def q_rolling_30d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-day range-frame rolling revenue per customer: RANGE BETWEEN
    29 PRECEDING AND CURRENT ROW over integer day ordinals.

    Day ordinals (datediff from epoch) make the range frame exact
    and identical in both engines — no interval-frame semantics to
    disagree on. Daily pre-aggregation bounds the window input.
    """
    c = Catalog(spark, sf_dir)
    daily = (
        c.orders.groupBy("o_custkey", F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.round(F.sum("o_totalprice"), 4).alias("day_revenue"))
        .withColumn("day_ord", F.datediff("day", F.lit("1970-01-01").cast("date")))
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day_ord")
        .rangeBetween(-29, Window.currentRow)
    )
    return daily.select(
        "o_custkey",
        "day",
        "day_revenue",
        _R4(F.sum("day_revenue").over(w), "rev_30d"),
        F.count(F.lit(1)).over(w).alias("n_days_30d"),
    )


Q_ROLLING_30D_SQL = """
WITH daily AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS day,
         round(sum(o_totalprice), 4) AS day_revenue,
         datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day_ord
  FROM orders GROUP BY 1, 2
)
SELECT o_custkey, day, day_revenue,
       round(sum(day_revenue) OVER w, 4) AS rev_30d,
       count(*) OVER w AS n_days_30d
FROM daily
WINDOW w AS (PARTITION BY o_custkey ORDER BY day_ord
             RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
"""


def q_acctbal_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist of customers by account balance
    within market segment, reported for the top-5 of each segment.

    Scale: the window partitions on segment (distributed); the
    per-segment sort is the unavoidable cost of an exact rank — at
    100 TB you'd pre-bucket by segment or accept the shuffle.
    """
    c = Catalog(spark, sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.customer.select(
            "c_mktsegment",
            "c_custkey",
            _R4(F.col("c_acctbal"), "acctbal"),
            _R4(F.percent_rank().over(w), "pct_rank"),
            _R4(F.cume_dist().over(w), "cume"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 5)
    )


Q_ACCTBAL_DIST_SQL = """
SELECT c_mktsegment, c_custkey, round(c_acctbal, 4) AS acctbal,
       round(percent_rank() OVER w, 4) AS pct_rank,
       round(cume_dist() OVER w, 4) AS cume,
       CAST(row_number() OVER w AS INTEGER) AS rn
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
QUALIFY rn <= 5
"""


def q_order_value_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value with explicit full-partition frames:
    each nation's earliest- and latest-order price, plus the span.

    The frame must be UNBOUNDED..UNBOUNDED for last_value (default
    frames end at CURRENT ROW — a classic cross-engine trap, pinned
    identically on both sides); ties broken by orderkey.
    """
    c = Catalog(spark, sf_dir)
    j = (
        c.orders.join(c.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    w = (
        Window.partitionBy("n_name")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        j.select(
            "n_name",
            F.first_value(F.col("o_totalprice")).over(w).alias("_first"),
            F.last_value(F.col("o_totalprice")).over(w).alias("_last"),
        )
        .groupBy("n_name")
        .agg(
            _R4(F.first("_first"), "first_order_price"),
            _R4(F.first("_last"), "last_order_price"),
            _R4(F.first(F.col("_last") - F.col("_first")), "span"),
        )
    )


Q_ORDER_VALUE_SPAN_SQL = """
SELECT n_name,
       round(any_value(f), 4) AS first_order_price,
       round(any_value(l), 4) AS last_order_price,
       round(any_value(l - f), 4) AS span
FROM (
  SELECT n_name,
         first_value(o_totalprice) OVER w AS f,
         last_value(o_totalprice)  OVER w AS l
  FROM orders JOIN customer ON o_custkey = c_custkey
              JOIN nation   ON c_nationkey = n_nationkey
  WINDOW w AS (PARTITION BY n_name ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
GROUP BY n_name
"""


QUERIES: dict[str, tuple] = {
    "q_grouping_sets": (q_grouping_sets, Q_GROUPING_SETS_SQL),
    "q_monthly_growth": (q_monthly_growth, Q_MONTHLY_GROWTH_SQL),
    "q_rolling_30d_revenue": (q_rolling_30d_revenue, Q_ROLLING_30D_SQL),
    "q_acctbal_distribution": (q_acctbal_distribution, Q_ACCTBAL_DIST_SQL),
    "q_order_value_span": (q_order_value_span, Q_ORDER_VALUE_SPAN_SQL),
}


def q_nth_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second- and third-largest order per customer via nth_value
    over a pinned full frame (top-5 spenders per segment kept).
    Completes the window-primitive surface: nth_value needs the
    UNBOUNDED-to-UNBOUNDED frame or it silently reads a growing
    prefix — the classic window-frame trap, pinned here."""
    orders = Catalog(spark, sf_dir).orders
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    per = (
        orders.select(
            "o_custkey",
            F.first("o_totalprice").over(w).alias("top1"),
            F.nth_value("o_totalprice", 2).over(w).alias("top2"),
            F.nth_value("o_totalprice", 3).over(w).alias("top3"),
        )
        .groupBy("o_custkey")
        .agg(
            F.first("top1").alias("top1"),
            F.first("top2").alias("top2"),
            F.first("top3").alias("top3"),
        )
    )
    # distributed top-k, rank re-derived on the 20 survivors
    wr = [F.desc("top1"), F.asc("o_custkey")]
    return (
        per.orderBy(*wr)
        .limit(20)
        .withColumn("rank", F.row_number().over(Window.orderBy(*wr)))
        .select(
            "o_custkey",
            _R4(F.col("top1"), "top1"),
            _R4(F.col("top2"), "top2"),
            _R4(F.col("top3"), "top3"),
            "rank",
        )
    )


Q_NTH_ORDER_VALUE_SQL = """
WITH per AS (
  SELECT o_custkey,
         max(top1) AS top1, max(top2) AS top2, max(top3) AS top3
  FROM (
    SELECT o_custkey,
           first_value(o_totalprice) OVER w AS top1,
           nth_value(o_totalprice, 2) OVER w AS top2,
           nth_value(o_totalprice, 3) OVER w AS top3
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
  )
  GROUP BY o_custkey
)
SELECT o_custkey, round(top1, 4) AS top1, round(top2, 4) AS top2,
       round(top3, 4) AS top3, rank
FROM (
  SELECT *, CAST(row_number() OVER (ORDER BY top1 DESC, o_custkey ASC) AS INTEGER) AS rank
  FROM per
)
WHERE rank <= 20
"""

QUERIES["q_nth_order_value"] = (q_nth_order_value, Q_NTH_ORDER_VALUE_SQL)


def q_mode_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode: each user's most frequent event type
    (ties broken alphabetically) via count + max-by-struct — the
    portable form of mode(), whose tie behavior is engine-defined.
    Two bounded aggregates, no window sort."""
    ev = Catalog(spark, sf_dir).events
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    best = counts.groupBy("user_id").agg(
        F.max("cnt").alias("top_cnt"), F.count(F.lit(1)).alias("n_types")
    )
    return (
        counts.join(best, "user_id")
        .filter(F.col("cnt") == F.col("top_cnt"))
        .groupBy("user_id")
        .agg(
            F.min("event_type").alias("mode_event_type"),
            F.first("top_cnt").alias("mode_count"),
            F.first("n_types").alias("n_types"),
        )
    )


Q_MODE_EVENT_TYPE_SQL = """
WITH counts AS (
  SELECT user_id, event_type, count(*) AS cnt FROM events GROUP BY 1, 2
), best AS (
  SELECT user_id, max(cnt) AS top_cnt, count(*) AS n_types FROM counts GROUP BY 1
)
SELECT c.user_id,
       min(c.event_type) AS mode_event_type,
       min(b.top_cnt) AS mode_count,
       min(b.n_types) AS n_types
FROM counts c JOIN best b ON c.user_id = b.user_id AND c.cnt = b.top_cnt
GROUP BY c.user_id
"""

QUERIES["q_mode_event_type"] = (q_mode_event_type, Q_MODE_EVENT_TYPE_SQL)
