"""Analytics wave 2 (SURVEY.md §2.A extensions): remaining TPC-H
query shapes, window/statistical operators, set ops, histograms,
and sampling.

Same scale stance as relational.py: declarative plans, broadcast
dims, partial aggregation, deterministic tie-breaks, 4-dp rounding
on float aggregates (both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_gov_spark.io.sources import Catalog
from etl_gov_spark.operators.ranks import ranged_global_rank

_R4 = lambda c, n: F.round(c, 4).alias(n)  # noqa: E731


def q12_priority_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional aggregation inside one groupBy
    (CASE-WHEN counts) — no second scan for the split metric."""
    c = Catalog(spark, sf_dir)
    j = c.lineitem.join(c.orders, F.col("l_orderkey") == F.col("o_orderkey"))
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy("l_linestatus").agg(
        F.count(F.when(urgent, 1)).alias("n_urgent"),
        F.count(F.when(~urgent, 1)).alias("n_normal"),
        _R4(F.avg("l_quantity"), "avg_qty"),
    )


Q12_SQL = """
SELECT l_linestatus,
       count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS n_urgent,
       count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS n_normal,
       round(avg(l_quantity), 4) AS avg_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_linestatus
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: ratio of a conditional sum to the total —
    broadcast part join, single aggregate."""
    c = Catalog(spark, sf_dir)
    j = c.lineitem.join(F.broadcast(c.part), F.col("l_partkey") == F.col("p_partkey"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").isin("ECONOMY", "SMALL"), rev).otherwise(F.lit(0.0))
    return j.agg(
        _R4(F.sum(promo) * 100.0 / F.sum(rev), "promo_pct"),
        _R4(F.sum(rev), "total_revenue"),
    )


Q14_SQL = """
SELECT round(sum(CASE WHEN p_type IN ('ECONOMY', 'SMALL')
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END) * 100.0
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING on a grouped sum, then join the
    survivors back to dimensions. The HAVING filter runs on the
    aggregated (small) side before the customer join."""
    c = Catalog(spark, sf_dir)
    big = (
        c.lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 150)
    )
    return (
        big.join(c.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c.customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").cast("date").alias("orderdate"),
            _R4(F.col("o_totalprice"), "totalprice"),
            _R4(F.col("_qty"), "total_qty"),
        )
    )


Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey AS orderkey,
       CAST(o_orderdate AS DATE) AS orderdate,
       round(o_totalprice, 4) AS totalprice,
       round(qty, 4) AS total_qty
FROM (
  SELECT l_orderkey, sum(l_quantity) AS qty FROM lineitem GROUP BY l_orderkey HAVING qty > 150
) big
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q19_or_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive brand/size/qty
    bands — exercises OR predicate pushdown through a join."""
    c = Catalog(spark, sf_dir)
    j = c.lineitem.join(F.broadcast(c.part), F.col("l_partkey") == F.col("p_partkey"))
    band1 = (F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 10) & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 20)
    band2 = (F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 20) & (F.col("l_quantity") >= 5) & (F.col("l_quantity") <= 30)
    band3 = (F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 30) & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 40)
    return j.filter(band1 | band2 | band3).agg(
        _R4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), "revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


Q19_SQL = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size <= 10 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size <= 20 AND l_quantity BETWEEN 5 AND 30)
   OR (p_brand = 'Brand#3' AND p_size <= 30 AND l_quantity BETWEEN 10 AND 40)
"""


def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery (global average) + anti
    join. The average is a 1-row broadcast; the anti join ships only
    keys."""
    c = Catalog(spark, sf_dir)
    avg_bal = c.customer.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("_avg")
    )
    rich = c.customer.join(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("_avg")
    )
    recent = c.orders.filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    ).select("o_custkey")
    idle = rich.join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        _R4(F.sum("c_acctbal"), "total_balance"),
    )


Q22_SQL = """
SELECT c_mktsegment, count(*) AS n_customers,
       round(sum(c_acctbal), 4) AS total_balance
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY c_mktsegment
"""


def q_cheapest_part_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmin per group via min(struct(price, key)) — the
    deterministic one-pass alternative to min_by (whose tie
    behavior is engine-defined). DuckDB twin: min((price, key))."""
    part = Catalog(spark, sf_dir).part
    s = F.min(F.struct(F.col("p_retailprice"), F.col("p_partkey"))).alias("_s")
    return (
        part.groupBy("p_brand")
        .agg(s)
        .select(
            "p_brand",
            F.col("_s.p_partkey").alias("cheapest_partkey"),
            _R4(F.col("_s.p_retailprice"), "min_price"),
        )
    )


Q_CHEAPEST_SQL = """
SELECT p_brand,
       (min({'p_retailprice': p_retailprice, 'p_partkey': p_partkey})).p_partkey AS cheapest_partkey,
       round((min({'p_retailprice': p_retailprice, 'p_partkey': p_partkey})).p_retailprice, 4) AS min_price
FROM part
GROUP BY p_brand
"""


def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row moving average over the daily revenue series (window
    frame ROWS 6 PRECEDING). The series is first reduced to one row
    per day, so the window runs over a tiny sorted set."""
    orders = Catalog(spark, sf_dir).orders
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum("o_totalprice").alias("_rev")
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        "day",
        _R4(F.col("_rev"), "revenue"),
        _R4(F.avg("_rev").over(w), "ma7"),
    )


Q_MOVING_AVG_SQL = """
SELECT day, round(rev, 4) AS revenue,
       round(avg(rev) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS ma7
FROM (SELECT CAST(o_orderdate AS DATE) AS day, sum(o_totalprice) AS rev FROM orders GROUP BY 1)
"""


def q_revenue_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total + ntile quartile of customers by revenue.

    Scale: no global sort — ``ranged_global_rank`` range-partitions
    on the (cents, custkey) total order and lifts per-slice ranks /
    running sums with a P-row offset ledger. Revenue is ordered and
    prefix-summed as integer CENTS so the running total is exact and
    associative (a double prefix sum re-associated across slices
    would drift in the last ulps vs the sequential oracle)."""
    orders = Catalog(spark, sf_dir).orders
    rev = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice") * 100).cast("long").alias("_cents")
    )
    ranked = ranged_global_rank(
        rev,
        [F.desc("_cents"), F.asc("o_custkey")],
        rank_col=None,
        ntiles={"quartile": 4},
        running_longs={"_cum_cents": "_cents"},
    )
    return ranked.select(
        F.col("o_custkey").alias("custkey"),
        _R4(F.col("_cents") / 100.0, "revenue"),
        _R4(F.col("_cum_cents") / 100.0, "running_total"),
        "quartile",
    )


Q_QUARTILES_SQL = """
SELECT o_custkey AS custkey, round(cents / 100.0, 4) AS revenue,
       round(CAST(sum(cents) OVER (ORDER BY cents DESC, o_custkey ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             / 100.0, 4) AS running_total,
       CAST(ntile(4) OVER (ORDER BY cents DESC, o_custkey ASC) AS INTEGER) AS quartile
FROM (SELECT o_custkey, CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey)
"""


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over customer key sets (active in
    1996 vs 1997). Set ops are hash aggregations on the key — at
    scale, the same shuffle profile as distinct."""
    orders = Catalog(spark, sf_dir).orders
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey").distinct()
    y97 = orders.filter(F.year("o_orderdate") == 1997).select("o_custkey").distinct()
    return (
        y96.union(y97).distinct().agg(F.count(F.lit(1)).alias("n_union"))
        .crossJoin(y96.intersect(y97).agg(F.count(F.lit(1)).alias("n_intersect")))
        .crossJoin(y96.exceptAll(y97).agg(F.count(F.lit(1)).alias("n_96_only")))
    )


Q_SET_OPS_SQL = """
SELECT (SELECT count(*) FROM (
          SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
          UNION SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997)) AS n_union,
       (SELECT count(*) FROM (
          SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
          INTERSECT SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997)) AS n_intersect,
       (SELECT count(*) FROM (
          SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
          EXCEPT SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997)) AS n_96_only
"""


def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals (portable bucketing:
    floor((x - lo) / step), clamped). Histogram = groupBy on a
    derived bounded key — fully map-side combinable."""
    orders = Catalog(spark, sf_dir).orders
    lo, step, n = 0.0, 50_000.0, 10
    bucket = F.least(
        F.floor((F.col("o_totalprice") - F.lit(lo)) / F.lit(step)).cast("int"),
        F.lit(n - 1),
    )
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _R4(F.min("o_totalprice"), "min_price"),
            _R4(F.max("o_totalprice"), "max_price"),
        )
    )


Q_HISTOGRAM_SQL = """
SELECT CAST(least(floor(o_totalprice / 50000.0), 9) AS INTEGER) AS bucket,
       count(*) AS n_orders,
       round(min(o_totalprice), 4) AS min_price,
       round(max(o_totalprice), 4) AS max_price
FROM orders
GROUP BY 1
"""


def q_stats_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates per segment: stddev, variance, corr,
    covariance (all sample forms — both engines' defaults)."""
    c = Catalog(spark, sf_dir)
    j = c.orders.join(c.customer, F.col("o_custkey") == F.col("c_custkey"))
    return j.groupBy("c_mktsegment").agg(
        _R4(F.stddev("o_totalprice"), "std_price"),
        _R4(F.var_samp("o_totalprice"), "var_price"),
        _R4(F.corr("o_totalprice", "c_acctbal"), "corr_price_bal"),
        _R4(F.covar_samp("o_totalprice", "c_acctbal"), "covar_price_bal"),
    )


Q_STATS_SQL = """
SELECT c_mktsegment,
       round(stddev_samp(o_totalprice), 4) AS std_price,
       round(var_samp(o_totalprice), 4) AS var_price,
       round(corr(o_totalprice, c_acctbal), 4) AS corr_price_bal,
       round(covar_samp(o_totalprice, c_acctbal), 4) AS covar_price_bal
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


_STRATA_FRACS = {"F": 0.1, "O": 0.1, "P": 0.5}


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling: fixed fraction per order status, drawn
    from md5(o_orderkey) instead of ``sampleBy`` so the draw is a
    pure row-local function — identical on any cluster layout, on
    re-runs, and on the DuckDB oracle (hash-matchable, not
    rows-only). Single pass, zero shuffle before the tiny
    per-stratum aggregate."""
    orders = Catalog(spark, sf_dir).orders
    h = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 12)
    u = (F.conv(h, 16, 10).cast("double") + F.lit(1.0)) / F.lit(float(1 << 48))
    frac = F.when(F.col("o_orderstatus") == "P", F.lit(0.5)).otherwise(F.lit(0.1))
    return (
        orders.filter(u <= frac)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            _R4(F.avg("o_totalprice"), "avg_price"),
        )
    )


Q_STRATIFIED_SQL = """
SELECT o_orderstatus,
       count(*) AS n_sampled,
       round(avg(o_totalprice), 4) AS avg_price
FROM orders
WHERE (CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 12) AS BIGINT) + 1)
      / 281474976710656.0
      <= CASE WHEN o_orderstatus = 'P' THEN 0.5 ELSE 0.1 END
GROUP BY o_orderstatus
"""


QUERIES: dict[str, tuple] = {
    "q12_priority_shipmode": (q12_priority_shipmode, Q12_SQL),
    "q14_promo_revenue": (q14_promo_revenue, Q14_SQL),
    "q18_large_orders": (q18_large_orders, Q18_SQL),
    "q19_or_pushdown": (q19_or_pushdown, Q19_SQL),
    "q22_idle_rich_customers": (q22_idle_rich_customers, Q22_SQL),
    "q_cheapest_part_per_brand": (q_cheapest_part_per_brand, Q_CHEAPEST_SQL),
    "q_moving_avg": (q_moving_avg, Q_MOVING_AVG_SQL),
    "q_revenue_quartiles": (q_revenue_quartiles, Q_QUARTILES_SQL),
    "q_set_ops": (q_set_ops, Q_SET_OPS_SQL),
    "q_price_histogram": (q_price_histogram, Q_HISTOGRAM_SQL),
    "q_stats_by_segment": (q_stats_by_segment, Q_STATS_SQL),
    "q_stratified_sample": (q_stratified_sample, Q_STRATIFIED_SQL),
}


def q_impute_clamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data repair: 3σ outlier clamping + median null-imputation
    per event type — the standardize/clean step of a gov ingest.

    Two-pass shape: one grouped aggregate for the per-type profile
    (mean/stddev/median), broadcast back onto the fact table (the
    profile is |event types| rows — never a window over the facts),
    clamp in codegen, re-aggregate. At 100 TB: two scans, one
    single-row-per-type shuffle, zero state.

    The profile (m/s/med) is quantized to 6 dp on BOTH engines
    before clamping: FP summation order differs between Spark and
    DuckDB, so an unrounded 3-sigma boundary can flip rows sitting
    exactly at the clamp edge (driver r1 hash mismatch).
    """
    ev = Catalog(spark, sf_dir).events.select("event_type", "value")
    prof = ev.groupBy("event_type").agg(
        F.round(F.avg("value"), 6).alias("m"),
        F.round(F.stddev_samp("value"), 6).alias("s"),
        F.round(F.percentile("value", 0.5), 6).alias("med"),
    )
    clamped = F.least(
        F.greatest(F.coalesce(F.col("value"), F.col("med")), F.col("m") - 3 * F.col("s")),
        F.col("m") + 3 * F.col("s"),
    )
    return (
        ev.join(F.broadcast(prof), "event_type")
        .select("event_type", "value", clamped.alias("v2"))
        .groupBy("event_type")
        .agg(
            F.sum((F.col("v2") != F.col("value")).cast("long")).alias("n_repaired"),
            _R4(F.avg("value"), "avg_before"),
            _R4(F.avg("v2"), "avg_after"),
        )
    )


Q_IMPUTE_CLAMP_SQL = """
WITH prof AS (
  SELECT event_type, round(avg(value), 6) AS m,
         round(stddev_samp(value), 6) AS s,
         round(quantile_cont(value, 0.5), 6) AS med
  FROM events GROUP BY event_type
), fixed AS (
  SELECT e.event_type, e.value,
         least(greatest(coalesce(e.value, p.med), p.m - 3 * p.s), p.m + 3 * p.s) AS v2
  FROM events e JOIN prof p USING (event_type)
)
SELECT event_type,
       CAST(sum(CASE WHEN v2 <> value THEN 1 ELSE 0 END) AS BIGINT) AS n_repaired,
       round(avg(value), 4) AS avg_before,
       round(avg(v2), 4) AS avg_after
FROM fixed GROUP BY event_type
"""

QUERIES["q_impute_clamp"] = (q_impute_clamp, Q_IMPUTE_CLAMP_SQL)

_BASKET_TOP = 20
# hard bound on per-basket pair expansion: one hot basket contributes
# at most C(100,2) pairs; gov orders hold <=7 items so the cap never
# binds on real data, it is the 100x-corpus safety rail. Mirrored in
# the SQL twins via a per-order rank filter on the same sort key.
MAX_BASKET = 100


def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association mining over order baskets: the top-20 co-ordered
    part pairs with support, confidence and lift.

    Pairs expand bucket-locally per order (collect_set + in-array
    pair expansion — order baskets are small and bounded, so the
    expansion is linear in Σ basket², never a self-join that
    re-scans lineitem). Baskets are capped at MAX_BASKET items
    (sorted by partkey, deterministic) so a single hot basket cannot
    go quadratic at corpus scale. Per-part supports broadcast back
    onto the pair aggregate; one shuffle on orderkey, one on the
    pair key.
    """
    from etl_gov_spark.operators.dedup import pair_structs

    li = Catalog(spark, sf_dir).lineitem.select("l_orderkey", "l_partkey").distinct()
    n_orders = li.agg(
        F.countDistinct("l_orderkey").cast("double").alias("n_orders")
    )
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    pairs = (
        baskets.filter(F.size("parts") > 1)
        .select(F.explode(pair_structs(F.col("parts"), MAX_BASKET)).alias("p"))
        .groupBy(F.col("p.a").alias("part_a"), F.col("p.b").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("pair_count"))
    )
    part_cnt = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt"))
    a_cnt = part_cnt.select(F.col("l_partkey").alias("part_a"), F.col("cnt").alias("cnt_a"))
    b_cnt = part_cnt.select(F.col("l_partkey").alias("part_b"), F.col("cnt").alias("cnt_b"))
    # distributed top-k (TakeOrderedAndProject), rank re-derived on
    # the k survivors — never one unpartitioned window over all pairs
    w = [F.desc("pair_count"), F.asc("part_a"), F.asc("part_b")]
    return (
        pairs.join(F.broadcast(a_cnt), "part_a")
        .join(F.broadcast(b_cnt), "part_b")
        .crossJoin(F.broadcast(n_orders))
        .orderBy(*w)
        .limit(_BASKET_TOP)
        .withColumn("rank", F.row_number().over(Window.orderBy(*w)))
        .select(
            "part_a",
            "part_b",
            "pair_count",
            _R4(F.col("pair_count") / F.col("cnt_a"), "confidence_a_to_b"),
            _R4(
                F.col("pair_count") * F.col("n_orders")
                / (F.col("cnt_a") * F.col("cnt_b")),
                "lift",
            ),
            "rank",
        )
    )


Q_MARKET_BASKET_SQL = f"""
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), li_capped AS (
  -- mirrors the Spark MAX_BASKET slice: first {MAX_BASKET} items of the
  -- partkey-sorted basket take part in the pair expansion
  SELECT l_orderkey, l_partkey FROM (
    SELECT l_orderkey, l_partkey,
           row_number() OVER (PARTITION BY l_orderkey ORDER BY l_partkey) AS rn
    FROM li
  ) WHERE rn <= {MAX_BASKET}
), pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS pair_count
  FROM li_capped a JOIN li_capped b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
), pc AS (
  SELECT l_partkey, count(*) AS cnt FROM li GROUP BY 1
), n AS (
  SELECT count(DISTINCT l_orderkey) AS n_orders FROM li
)
SELECT part_a, part_b, pair_count,
       round(pair_count / CAST(ca.cnt AS DOUBLE), 4) AS confidence_a_to_b,
       round(pair_count * (SELECT n_orders FROM n) / CAST(ca.cnt * cb.cnt AS DOUBLE), 4) AS lift,
       rank
FROM (
  SELECT *, CAST(row_number() OVER (ORDER BY pair_count DESC, part_a ASC, part_b ASC) AS INTEGER) AS rank
  FROM pairs
) p
JOIN pc ca ON p.part_a = ca.l_partkey
JOIN pc cb ON p.part_b = cb.l_partkey
WHERE rank <= {_BASKET_TOP}
"""

QUERIES["q_market_basket"] = (q_market_basket, Q_MARKET_BASKET_SQL)


def q_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram of order values: 8 ntile buckets with
    their value ranges — the complement of the fixed-width histogram
    (q_price_histogram): bucket populations are equal by
    construction, bucket BOUNDARIES carry the distribution shape.
    Bucket cuts are exact ntile via ``ranged_global_rank`` (range-
    partitioned parallel sort + offset ledger — no single-partition
    stage) feeding a bounded aggregate; tie-break on orderkey."""
    orders = Catalog(spark, sf_dir).orders
    binned = ranged_global_rank(
        orders.select("o_totalprice", "o_orderkey"),
        [F.asc("o_totalprice"), F.asc("o_orderkey")],
        rank_col=None,
        ntiles={"bucket": 8},
    )
    return (
        binned.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _R4(F.min("o_totalprice"), "lo"),
            _R4(F.max("o_totalprice"), "hi"),
            _R4(F.avg("o_totalprice"), "mean_in_bucket"),
        )
    )


Q_HISTOGRAM_EQUIDEPTH_SQL = """
SELECT bucket, count(*) AS n_orders,
       round(min(o_totalprice), 4) AS lo,
       round(max(o_totalprice), 4) AS hi,
       round(avg(o_totalprice), 4) AS mean_in_bucket
FROM (
  SELECT o_totalprice,
         CAST(ntile(8) OVER (ORDER BY o_totalprice ASC, o_orderkey ASC) AS INTEGER) AS bucket
  FROM orders
)
GROUP BY bucket
"""

QUERIES["q_histogram_equidepth"] = (q_histogram_equidepth, Q_HISTOGRAM_EQUIDEPTH_SQL)


def q_item_item_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering: for each part, the top-3
    co-ordered parts by lift (min co-occurrence 2) — the "customers
    also ordered" recommender primitive, built entirely from the
    basket pair expansion (both directions) + a per-item window.

    Scale: pair counts come from the bucket-local basket expansion
    (linear in Σ basket²); the per-item top-k windows over each
    item's co-occurrence list (bounded by catalog co-order fanout,
    not corpus size)."""
    from etl_gov_spark.operators.dedup import pair_structs

    li = Catalog(spark, sf_dir).lineitem.select("l_orderkey", "l_partkey").distinct()
    n_orders = li.agg(
        F.countDistinct("l_orderkey").cast("double").alias("n_orders")
    )
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    # Materialize the pair counts once: the basket pair-expansion
    # subtree (the expensive part, Σ basket² work) would otherwise be
    # re-executed for each direction of the symmetric union and again
    # under every scoring branch.
    pairs = (
        baskets.filter(F.size("parts") > 1)
        .select(F.explode(pair_structs(F.col("parts"), MAX_BASKET)).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter(F.col("pair_count") >= 2)
        .localCheckpoint()
    )
    sym = pairs.select("a", "b", "pair_count").unionAll(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"), "pair_count")
    )
    part_cnt = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt"))
    a_cnt = part_cnt.select(F.col("l_partkey").alias("a"), F.col("cnt").alias("cnt_a"))
    b_cnt = part_cnt.select(F.col("l_partkey").alias("b"), F.col("cnt").alias("cnt_b"))
    scored = (
        sym.join(F.broadcast(a_cnt), "a")
        .join(F.broadcast(b_cnt), "b")
        .crossJoin(F.broadcast(n_orders))
        .withColumn(
            "_lift",
            F.col("pair_count") * F.col("n_orders") / (F.col("cnt_a") * F.col("cnt_b")),
        )
    )
    w = Window.partitionBy("a").orderBy(
        F.desc("_lift"), F.desc("pair_count"), F.asc("b")
    )
    return (
        scored.withColumn("rec_rank", F.row_number().over(w))
        .filter(F.col("rec_rank") <= 3)
        .select(
            F.col("a").alias("part"),
            F.col("b").alias("recommended_part"),
            "pair_count",
            _R4(F.col("_lift"), "lift"),
            "rec_rank",
        )
    )


Q_ITEM_ITEM_CF_SQL = f"""
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), li_capped AS (
  SELECT l_orderkey, l_partkey FROM (
    SELECT l_orderkey, l_partkey,
           row_number() OVER (PARTITION BY l_orderkey ORDER BY l_partkey) AS rn
    FROM li
  ) WHERE rn <= {MAX_BASKET}
), pairs AS (
  SELECT a.l_partkey AS a, b.l_partkey AS b, count(*) AS pair_count
  FROM li_capped a JOIN li_capped b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= 2
), sym AS (
  SELECT a, b, pair_count FROM pairs
  UNION ALL
  SELECT b AS a, a AS b, pair_count FROM pairs
), pc AS (
  SELECT l_partkey, count(*) AS cnt FROM li GROUP BY 1
), n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM li)
SELECT part, recommended_part, pair_count, round(lift, 4) AS lift, rec_rank
FROM (
  SELECT s.a AS part, s.b AS recommended_part, s.pair_count,
         s.pair_count * (SELECT n_orders FROM n) / CAST(ca.cnt * cb.cnt AS DOUBLE) AS lift,
         CAST(row_number() OVER (PARTITION BY s.a
              ORDER BY s.pair_count * (SELECT n_orders FROM n) / CAST(ca.cnt * cb.cnt AS DOUBLE) DESC,
                       s.pair_count DESC, s.b ASC) AS INTEGER) AS rec_rank
  FROM sym s JOIN pc ca ON s.a = ca.l_partkey JOIN pc cb ON s.b = cb.l_partkey
)
WHERE rec_rank <= 3
"""

QUERIES["q_item_item_cf"] = (q_item_item_cf, Q_ITEM_ITEM_CF_SQL)


_MIGRATION_SPLIT = "1998-01-01"


def q_customer_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-tier migration matrix: each customer's revenue tercile
    in the early period vs the late period (split at 1998), plus
    churn-in/out rows for customers active in only one period — the
    entity-level complement of the event transition matrix.

    Two exact-tercile assignments (``ranged_global_rank`` — no
    single-partition sort) over per-period aggregates and one
    full-outer join on the customer key."""
    orders = Catalog(spark, sf_dir).orders
    split = F.lit(_MIGRATION_SPLIT).cast("timestamp")

    def tiers(df, alias):
        rev = df.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("rev"))
        tiered = ranged_global_rank(
            rev,
            [F.asc("rev"), F.asc("o_custkey")],
            rank_col=None,
            ntiles={f"{alias}_tier": 3},
        )
        return tiered.select(
            F.col("o_custkey").alias(f"{alias}_key"), f"{alias}_tier"
        )

    early = tiers(orders.filter(F.col("o_orderdate") < split), "early")
    late = tiers(orders.filter(F.col("o_orderdate") >= split), "late")
    joined = early.join(
        late, F.col("early_key") == F.col("late_key"), "full_outer"
    )
    return (
        joined.groupBy(
            F.coalesce(F.col("early_tier").cast("string"), F.lit("absent")).alias(
                "early_tier"
            ),
            F.coalesce(F.col("late_tier").cast("string"), F.lit("absent")).alias(
                "late_tier"
            ),
        )
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


Q_CUSTOMER_MIGRATION_SQL = f"""
WITH early AS (
  SELECT o_custkey AS k,
         CAST(ntile(3) OVER (ORDER BY rev ASC, o_custkey ASC) AS INTEGER) AS tier
  FROM (SELECT o_custkey, sum(o_totalprice) AS rev FROM orders
        WHERE o_orderdate < TIMESTAMP '{_MIGRATION_SPLIT}' GROUP BY 1)
), late AS (
  SELECT o_custkey AS k,
         CAST(ntile(3) OVER (ORDER BY rev ASC, o_custkey ASC) AS INTEGER) AS tier
  FROM (SELECT o_custkey, sum(o_totalprice) AS rev FROM orders
        WHERE o_orderdate >= TIMESTAMP '{_MIGRATION_SPLIT}' GROUP BY 1)
)
SELECT coalesce(CAST(e.tier AS VARCHAR), 'absent') AS early_tier,
       coalesce(CAST(l.tier AS VARCHAR), 'absent') AS late_tier,
       count(*) AS n_customers
FROM early e FULL OUTER JOIN late l ON e.k = l.k
GROUP BY 1, 2
"""

QUERIES["q_customer_migration"] = (q_customer_migration, Q_CUSTOMER_MIGRATION_SQL)


def q_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts ranked by revenue,
    A = the head covering 80% of cumulative revenue, B = next 15%,
    C = tail — the stock-policy segmentation every ops team runs.
    One revenue aggregate, one range-partitioned cumulative pass
    (``ranged_global_rank`` — cents-exact running revenue, no
    single-partition sort), one bounded class rollup."""
    cat = Catalog(spark, sf_dir)
    rev = cat.lineitem.groupBy("l_partkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100
        )
        .cast("long")
        .alias("cents")
    )
    ranked = ranged_global_rank(
        rev,
        [F.desc("cents"), F.asc("l_partkey")],
        rank_col=None,
        running_longs={"_cum_cents": "cents"},
    )
    tot = ranked.agg(F.sum("cents").cast("double").alias("_t"))
    classed = (
        ranked.crossJoin(F.broadcast(tot))
        .withColumn("_cum", F.col("_cum_cents") / F.col("_t"))
        .withColumn(
            "abc_class",
            F.when(F.col("_cum") <= 0.80, "A")
            .when(F.col("_cum") <= 0.95, "B")
            .otherwise("C"),
        )
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).alias("n_parts"),
        _R4(F.sum("cents") / 100.0, "class_revenue"),
        _R4(F.sum("cents") / F.max("_t"), "revenue_share"),
    )


Q_ABC_SQL = """
WITH rev AS (
  SELECT l_partkey,
         CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) AS cents
  FROM lineitem GROUP BY 1
), t AS (SELECT CAST(sum(cents) AS DOUBLE) AS t FROM rev),
classed AS (
  SELECT cents, t,
         CASE WHEN CAST(sum(cents) OVER (ORDER BY cents DESC, l_partkey ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / t <= 0.80 THEN 'A'
              WHEN CAST(sum(cents) OVER (ORDER BY cents DESC, l_partkey ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / t <= 0.95 THEN 'B'
              ELSE 'C' END AS abc_class
  FROM rev CROSS JOIN t
)
SELECT abc_class, count(*) AS n_parts,
       round(CAST(sum(cents) AS DOUBLE) / 100.0, 4) AS class_revenue,
       round(CAST(sum(cents) AS DOUBLE) / max(t), 4) AS revenue_share
FROM classed
GROUP BY abc_class
"""

QUERIES["q_abc_classification"] = (q_abc_classification, Q_ABC_SQL)


def q_executive_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-row executive dashboard: totals, averages, customer
    reach, latest-vs-prior-year growth — every figure from ONE scan
    of orders (conditional aggregation against the max-year scalar)
    plus a broadcast of that single max. The capstone shape: a
    correct summary never needs N queries."""
    orders = Catalog(spark, sf_dir).orders
    ymax = orders.agg(F.max(F.year("o_orderdate")).alias("_y"))
    o = orders.crossJoin(F.broadcast(ymax))
    cur = F.year("o_orderdate") == F.col("_y")
    prev = F.year("o_orderdate") == F.col("_y") - 1
    # money folds to integer CENTS before summing: a 4-dp round of a
    # drifting 11-digit double sum exceeds the float grid both
    # engines can agree on (sf0.1 gate finding, round 12); integer
    # cents sum exactly and identically everywhere
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    cur_c = F.sum(F.when(cur, cents).otherwise(F.lit(0)))
    prev_c = F.sum(F.when(prev, cents).otherwise(F.lit(0)))
    tot_c = F.sum(cents)
    n = F.count(F.lit(1))
    return o.agg(
        n.alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        (tot_c / 100.0).alias("total_revenue"),
        (F.round(tot_c / 100.0 / n * 10000.0) / 10000.0).alias(
            "avg_order_value"
        ),
        F.first("_y").alias("latest_year"),
        (cur_c / 100.0).alias("latest_year_revenue"),
        (
            F.round((cur_c - prev_c) / prev_c.cast("double") * 10000.0)
            / 10000.0
            + 0.0
        ).alias("yoy_growth"),
    )


Q_EXECUTIVE_SUMMARY_SQL = """
WITH y AS (SELECT max(year(o_orderdate)) AS ymax FROM orders),
c AS (
  SELECT o_custkey, o_orderdate, ymax,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders CROSS JOIN y
)
SELECT count(*) AS n_orders,
       count(DISTINCT o_custkey) AS n_customers,
       sum(cents) / 100.0 AS total_revenue,
       round(sum(cents) / 100.0 / count(*) * 10000.0) / 10000.0 AS avg_order_value,
       CAST(min(ymax) AS INTEGER) AS latest_year,
       sum(CASE WHEN year(o_orderdate) = ymax THEN cents ELSE 0 END) / 100.0 AS latest_year_revenue,
       round((sum(CASE WHEN year(o_orderdate) = ymax THEN cents ELSE 0 END)
              - sum(CASE WHEN year(o_orderdate) = ymax - 1 THEN cents ELSE 0 END))
             / CAST(sum(CASE WHEN year(o_orderdate) = ymax - 1 THEN cents ELSE 0 END) AS DOUBLE)
             * 10000.0) / 10000.0 + 0.0 AS yoy_growth
FROM c
"""

QUERIES["q_executive_summary"] = (q_executive_summary, Q_EXECUTIVE_SUMMARY_SQL)


def q_discount_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue forgone to discounts per year and discount band —
    the spend-policy readout (how much would flow back if the >5%
    band were capped). One conditional-aggregation scan of
    lineitem joined to order dates on the co-partitioned key."""
    cat = Catalog(spark, sf_dir)
    j = cat.lineitem.join(
        cat.orders.select("o_orderkey", F.year("o_orderdate").alias("yr")),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    band = (
        F.when(F.col("l_discount") == 0, "none")
        .when(F.col("l_discount") <= 0.05, "low")
        .otherwise("high")
    )
    forgone = F.col("l_extendedprice") * F.col("l_discount")
    return j.groupBy(F.col("yr").alias("order_year"), band.alias("discount_band")).agg(
        F.count(F.lit(1)).alias("n_lines"),
        _R4(F.sum(forgone), "revenue_forgone"),
        _R4(
            F.sum(forgone)
            / F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
            "forgone_vs_net",
        ),
    )


Q_DISCOUNT_IMPACT_SQL = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CASE WHEN l_discount = 0 THEN 'none'
            WHEN l_discount <= 0.05 THEN 'low'
            ELSE 'high' END AS discount_band,
       count(*) AS n_lines,
       round(sum(l_extendedprice * l_discount), 4) AS revenue_forgone,
       round(sum(l_extendedprice * l_discount)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS forgone_vs_net
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1, 2
"""

QUERIES["q_discount_impact"] = (q_discount_impact, Q_DISCOUNT_IMPACT_SQL)


def q_supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier delivery scorecard: volume, revenue, on-time share
    (shipped within 90 days of order), and price competitiveness
    (supplier's avg unit price vs the catalog-wide avg) — the
    vendor-review one-pager, top-20 by revenue. One join + two
    aggregates; the global benchmark broadcasts as a scalar."""
    cat = Catalog(spark, sf_dir)
    j = cat.lineitem.join(
        cat.orders.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    on_time = (
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")) <= 90
    ).cast("int")
    up = F.col("l_extendedprice") / F.col("l_quantity")
    per = j.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev"),
        F.avg(on_time).alias("_ontime"),
        F.avg(up).alias("_up"),
    )
    bench = j.agg(F.avg(up).alias("_gup"))
    # distributed top-k, rank re-derived on the 20 survivors
    w = [F.desc("_rev"), F.asc("l_suppkey")]
    return (
        per.crossJoin(F.broadcast(bench))
        .orderBy(*w)
        .limit(20)
        .withColumn("rank", F.row_number().over(Window.orderBy(*w)))
        .select(
            "l_suppkey",
            "n_lines",
            _R4(F.col("_rev"), "revenue"),
            _R4(F.col("_ontime"), "on_time_share"),
            _R4(F.col("_up") / F.col("_gup"), "price_index"),
            "rank",
        )
    )


Q_SUPPLIER_SCORECARD_SQL = """
WITH j AS (
  SELECT l_suppkey, l_extendedprice, l_discount, l_quantity,
         CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 90
              THEN 1 ELSE 0 END AS on_time
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), per AS (
  SELECT l_suppkey, count(*) AS n_lines,
         sum(l_extendedprice * (1 - l_discount)) AS rev,
         avg(on_time) AS ontime,
         avg(l_extendedprice / l_quantity) AS up
  FROM j GROUP BY 1
), g AS (SELECT avg(l_extendedprice / l_quantity) AS gup FROM j)
SELECT l_suppkey, n_lines,
       round(rev, 4) AS revenue,
       round(ontime, 4) AS on_time_share,
       round(up / gup, 4) AS price_index,
       rank
FROM (
  SELECT per.*, g.gup,
         CAST(row_number() OVER (ORDER BY rev DESC, l_suppkey ASC) AS INTEGER) AS rank
  FROM per CROSS JOIN g
)
WHERE rank <= 20
"""

QUERIES["q_supplier_scorecard"] = (q_supplier_scorecard, Q_SUPPLIER_SCORECARD_SQL)


def q_zorder_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout + footer-stat file skipping (io/skipping.py)
    end to end: ``orders`` is rewritten z-ordered on
    (o_custkey, o_totalprice), then a band predicate on BOTH keys is
    answered by ``read_pruned`` — per-file parquet footer min/max
    intersected with the ranges before Spark lists a single file.
    The aggregate hash-matches the oracle's plain WHERE over the raw
    table, proving the pruned read is transparent; pruning
    *effectiveness* (files actually skipped on either key) is
    asserted in tests/test_sources_plans.py.
    """
    from etl_gov_spark.io.scratch import scratch_dir
    from etl_gov_spark.io.skipping import read_pruned, zorder_write

    o = Catalog(spark, sf_dir).orders.select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    work = scratch_dir("zorder")
    zorder_write(o, work, ("o_custkey", "o_totalprice"), num_files=16)
    mx = o.agg(F.max("o_custkey")).collect()[0][0]  # one scalar
    pruned = read_pruned(
        spark,
        work,
        {
            "o_custkey": (mx // 4, mx // 2),
            "o_totalprice": (50000.0, 150000.0),
        },
    )
    return pruned.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _R4(F.sum("o_totalprice"), "revenue"),
    )


Q_ZORDER_PRUNED_SCAN_SQL = """
WITH mx AS (SELECT max(o_custkey) AS m FROM orders)
SELECT o_orderstatus, count(*) AS n_orders,
       round(sum(o_totalprice), 4) AS revenue
FROM orders, mx
WHERE o_custkey >= CAST(floor(m / 4.0) AS BIGINT)
  AND o_custkey <= CAST(floor(m / 2.0) AS BIGINT)
  AND o_totalprice >= 50000.0 AND o_totalprice <= 150000.0
GROUP BY o_orderstatus
"""

QUERIES["q_zorder_pruned_scan"] = (q_zorder_pruned_scan, Q_ZORDER_PRUNED_SCAN_SQL)


def q_skyline_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-frontier) query per nation: the orders not
    dominated on (lower price, earlier date) — the classic
    multi-criteria shortlist operator (SQL has no SKYLINE clause;
    engines express it as sort + running-extreme).

    Spark-first shape: one window per nation sorted by (price,
    date); a row is on the frontier iff its date beats the running
    minimum date of every cheaper-or-equal earlier row. Linear per
    partition after one shuffle-sort — never the naive O(n²)
    dominance self-join. Nation keys parallelize the frontier; the
    same plan at 100 TB shards by any high-cardinality group key.
    """
    c = Catalog(spark, sf_dir)
    j = (
        c.orders.join(
            c.customer.select(
                F.col("c_custkey").alias("o_custkey"), "c_nationkey"
            ),
            "o_custkey",
        )
        .select(
            "c_nationkey",
            "o_orderkey",
            # integer cents: frontier membership and the aggregate
            # both become exact integer math — no summation-order ulp
            F.round(F.col("o_totalprice") * 100).cast("long").alias("price"),
            F.to_date("o_orderdate").alias("odate"),
        )
    )
    w = (
        Window.partitionBy("c_nationkey")
        .orderBy(F.asc("price"), F.asc("odate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    front = j.withColumn("_mind", F.min("odate").over(w)).filter(
        F.col("_mind").isNull() | (F.col("odate") < F.col("_mind"))
    )
    return front.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("frontier_size"),
        F.round(F.sum("price") / (F.count(F.lit(1)) * 100.0), 4).alias(
            "avg_frontier_price"
        ),
        F.min("odate").cast("string").alias("earliest_frontier_date"),
    )


Q_SKYLINE_FRONTIER_SQL = """
WITH j AS (
  SELECT c.c_nationkey, o.o_orderkey,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS price,
         CAST(o.o_orderdate AS DATE) AS odate
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
), front AS (
  SELECT * FROM (
    SELECT c_nationkey, o_orderkey, price, odate,
           min(odate) OVER (PARTITION BY c_nationkey
                            ORDER BY price ASC, odate ASC, o_orderkey ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mind
    FROM j
  ) WHERE mind IS NULL OR odate < mind
)
SELECT c_nationkey, count(*) AS frontier_size,
       round(sum(price) / (count(*) * 100.0), 4) AS avg_frontier_price,
       CAST(min(odate) AS VARCHAR) AS earliest_frontier_date
FROM front GROUP BY c_nationkey
"""

QUERIES["q_skyline_frontier"] = (q_skyline_frontier, Q_SKYLINE_FRONTIER_SQL)


_BRIDGE_M0 = "1995-03"
_BRIDGE_M1 = "1995-04"


def q_price_volume_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume bridge (revenue waterfall) per return flag
    between two months: ΔRevenue = volume effect (Δqty · p₀) +
    price effect (q₁ · Δp) — the decomposition every finance
    review asks for, computed from two conditional aggregates in
    ONE scan (no self-join of the two periods).

    p is the qty-weighted average unit price of the period, so the
    bridge closes exactly: volume + price = ΔRev by construction,
    and the oracle proves the identity cross-engine.
    """
    li = Catalog(spark, sf_dir).lineitem.select(
        "l_returnflag",
        F.date_format("l_shipdate", "yyyy-MM").alias("m"),
        F.col("l_quantity").alias("q"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    ).filter(F.col("m").isin(_BRIDGE_M0, _BRIDGE_M1))
    per = li.groupBy("l_returnflag").agg(
        F.sum(F.when(F.col("m") == _BRIDGE_M0, F.col("q"))).alias("q0"),
        F.sum(F.when(F.col("m") == _BRIDGE_M0, F.col("rev"))).alias("r0"),
        F.sum(F.when(F.col("m") == _BRIDGE_M1, F.col("q"))).alias("q1"),
        F.sum(F.when(F.col("m") == _BRIDGE_M1, F.col("rev"))).alias("r1"),
    )
    p0 = F.col("r0") / F.col("q0")
    p1 = F.col("r1") / F.col("q1")
    vol = (F.col("q1") - F.col("q0")) * p0
    price = F.col("q1") * (p1 - p0)
    return per.select(
        "l_returnflag",
        F.round(F.col("r0"), 2).alias("rev_m0"),
        F.round(F.col("r1"), 2).alias("rev_m1"),
        F.round(vol, 2).alias("volume_effect"),
        F.round(price, 2).alias("price_effect"),
        # + 0.0 normalizes IEEE -0.0 (the bridge closes exactly, so
        # the residual is a signed zero in both engines)
        (F.round(F.col("r1") - F.col("r0") - vol - price, 2) + 0.0).alias(
            "residual"
        ),
    )


Q_PRICE_VOLUME_BRIDGE_SQL = f"""
WITH li AS (
  SELECT l_returnflag, strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS m,
         l_quantity AS q,
         l_extendedprice * (1 - l_discount) AS rev
  FROM lineitem
  WHERE strftime(CAST(l_shipdate AS DATE), '%Y-%m')
        IN ('{_BRIDGE_M0}', '{_BRIDGE_M1}')
), per AS (
  SELECT l_returnflag,
         sum(CASE WHEN m = '{_BRIDGE_M0}' THEN q END) AS q0,
         sum(CASE WHEN m = '{_BRIDGE_M0}' THEN rev END) AS r0,
         sum(CASE WHEN m = '{_BRIDGE_M1}' THEN q END) AS q1,
         sum(CASE WHEN m = '{_BRIDGE_M1}' THEN rev END) AS r1
  FROM li GROUP BY l_returnflag
)
SELECT l_returnflag,
       round(r0, 2) AS rev_m0,
       round(r1, 2) AS rev_m1,
       round((q1 - q0) * (r0 / q0), 2) AS volume_effect,
       round(q1 * (r1 / q1 - r0 / q0), 2) AS price_effect,
       round(r1 - r0 - (q1 - q0) * (r0 / q0)
                 - q1 * (r1 / q1 - r0 / q0), 2) + 0.0 AS residual
FROM per
"""

QUERIES["q_price_volume_bridge"] = (
    q_price_volume_bridge,
    Q_PRICE_VOLUME_BRIDGE_SQL,
)


def q_xyz_variability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XYZ demand-variability classification per brand: coefficient
    of variation of weekly shipped quantity → X (steady, CV<0.5),
    Y (variable, <1), Z (erratic) — the planning-side partner of
    ABC value classification (``q_abc_classification``); X items
    get automated reorder, Z items get safety stock and a human.

    Weekly rollup then per-brand CV are two bounded aggregates; the
    class census is the |brands|-row output.
    """
    c = Catalog(spark, sf_dir)
    li = c.lineitem.join(
        F.broadcast(c.part.select("p_partkey", "p_brand")),
        F.col("l_partkey") == F.col("p_partkey"),
    ).select(
        "p_brand",
        F.date_trunc("week", "l_shipdate").alias("wk"),
        "l_quantity",
    )
    weekly = li.groupBy("p_brand", "wk").agg(F.sum("l_quantity").alias("q"))
    stats = weekly.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_weeks"),
        F.avg("q").alias("mu"),
        F.stddev_pop("q").alias("sigma"),
    )
    cv = F.col("sigma") / F.col("mu")
    return stats.select(
        "p_brand",
        "n_weeks",
        _R4(cv, "cv"),
        F.when(cv < 0.5, "X").when(cv < 1.0, "Y").otherwise("Z").alias("xyz"),
    )


Q_XYZ_VARIABILITY_SQL = """
WITH weekly AS (
  SELECT p.p_brand, date_trunc('week', CAST(l.l_shipdate AS DATE)) AS wk,
         sum(l.l_quantity) AS q
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
), stats AS (
  SELECT p_brand, count(*) AS n_weeks, avg(q) AS mu, stddev_pop(q) AS sigma
  FROM weekly GROUP BY p_brand
)
SELECT p_brand, n_weeks, round(sigma / mu, 4) AS cv,
       CASE WHEN sigma / mu < 0.5 THEN 'X'
            WHEN sigma / mu < 1.0 THEN 'Y'
            ELSE 'Z' END AS xyz
FROM stats
"""

QUERIES["q_xyz_variability"] = (q_xyz_variability, Q_XYZ_VARIABILITY_SQL)


_AGING_BOUNDS = (30, 60, 90)


def q_order_aging_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order aging report: orders still open ('O') bucketed by
    age against the corpus max order date (0-30 / 31-60 / 61-90 /
    90+ days), with count and value per (priority, bucket) — the
    receivables-style aging table every operations review opens
    with.

    Snapshot date is a broadcast scalar; bucketing is row-local
    CASE; output is a bounded (priority × 4) grid from one
    aggregate.
    """
    o = Catalog(spark, sf_dir).orders.select(
        "o_orderpriority",
        "o_orderstatus",
        F.to_date("o_orderdate").alias("d"),
        "o_totalprice",
    )
    snap = o.agg(F.max("d").alias("snap"))
    open_orders = o.filter(F.col("o_orderstatus") == "O").crossJoin(
        F.broadcast(snap)
    )
    age = F.datediff("snap", "d")
    bucket = (
        F.when(age <= _AGING_BOUNDS[0], "00-30")
        .when(age <= _AGING_BOUNDS[1], "31-60")
        .when(age <= _AGING_BOUNDS[2], "61-90")
        .otherwise("90+")
    )
    return open_orders.groupBy(
        "o_orderpriority", bucket.alias("age_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("open_value"),
    )


Q_ORDER_AGING_SQL = f"""
WITH snap AS (
  SELECT max(CAST(o_orderdate AS DATE)) AS snap FROM orders
)
SELECT o_orderpriority,
       CASE WHEN datediff('day', CAST(o_orderdate AS DATE), snap) <= {_AGING_BOUNDS[0]} THEN '00-30'
            WHEN datediff('day', CAST(o_orderdate AS DATE), snap) <= {_AGING_BOUNDS[1]} THEN '31-60'
            WHEN datediff('day', CAST(o_orderdate AS DATE), snap) <= {_AGING_BOUNDS[2]} THEN '61-90'
            ELSE '90+' END AS age_bucket,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS open_value
FROM orders CROSS JOIN snap
WHERE o_orderstatus = 'O'
GROUP BY 1, 2
"""

QUERIES["q_order_aging_buckets"] = (q_order_aging_buckets, Q_ORDER_AGING_SQL)


def q_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ABC-XYZ planning matrix at brand grain: ABC from
    cumulative revenue share (80/95 cuts), XYZ from the CV of
    weekly demand, crossed into the 9-cell census with revenue
    share per cell — the table that decides which items get
    auto-replenishment (AX) and which get a human planner (CZ).

    Both classifications reduce to bounded per-brand aggregates
    (one revenue rollup + cumulative window, one weekly CV); the
    cross is a join on the |brands| key.
    """
    c = Catalog(spark, sf_dir)
    li = c.lineitem.join(
        F.broadcast(c.part.select("p_partkey", "p_brand")),
        F.col("l_partkey") == F.col("p_partkey"),
    ).select(
        "p_brand",
        F.date_trunc("week", "l_shipdate").alias("wk"),
        "l_quantity",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    rev = li.groupBy("p_brand").agg(F.sum("rev").alias("rev"))
    tot = rev.agg(F.sum("rev").alias("t"))
    wcum = Window.orderBy(F.desc("rev"), F.asc("p_brand")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    abc = rev.crossJoin(F.broadcast(tot)).select(
        "p_brand",
        "rev",
        (F.sum("rev").over(wcum) / F.col("t")).alias("cum_share"),
    ).select(
        "p_brand",
        "rev",
        F.when(F.col("cum_share") <= 0.8, "A")
        .when(F.col("cum_share") <= 0.95, "B")
        .otherwise("C")
        .alias("abc"),
    )
    weekly = li.groupBy("p_brand", "wk").agg(F.sum("l_quantity").alias("q"))
    xyz = weekly.groupBy("p_brand").agg(
        (F.stddev_pop("q") / F.avg("q")).alias("cv")
    ).select(
        "p_brand",
        F.when(F.col("cv") < 0.5, "X")
        .when(F.col("cv") < 1.0, "Y")
        .otherwise("Z")
        .alias("xyz"),
    )
    cells = abc.join(xyz, "p_brand")
    return cells.crossJoin(F.broadcast(tot)).groupBy("abc", "xyz").agg(
        F.count(F.lit(1)).alias("n_brands"),
        _R4(F.sum("rev") / F.max("t"), "revenue_share"),
    )


Q_ABC_XYZ_SQL = """
WITH li AS (
  SELECT p.p_brand, date_trunc('week', CAST(l.l_shipdate AS DATE)) AS wk,
         l.l_quantity, l.l_extendedprice * (1 - l.l_discount) AS rev
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
), rev AS (
  SELECT p_brand, sum(rev) AS rev FROM li GROUP BY p_brand
), abc AS (
  SELECT p_brand, rev,
         CASE WHEN sum(rev) OVER (ORDER BY rev DESC, p_brand ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 / (SELECT sum(rev) FROM rev) <= 0.8 THEN 'A'
              WHEN sum(rev) OVER (ORDER BY rev DESC, p_brand ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 / (SELECT sum(rev) FROM rev) <= 0.95 THEN 'B'
              ELSE 'C' END AS abc
  FROM rev
), weekly AS (
  SELECT p_brand, wk, sum(l_quantity) AS q FROM li GROUP BY 1, 2
), xyz AS (
  SELECT p_brand,
         CASE WHEN stddev_pop(q) / avg(q) < 0.5 THEN 'X'
              WHEN stddev_pop(q) / avg(q) < 1.0 THEN 'Y'
              ELSE 'Z' END AS xyz
  FROM weekly GROUP BY p_brand
)
SELECT a.abc, x.xyz, count(*) AS n_brands,
       round(sum(a.rev) / (SELECT sum(rev) FROM rev), 4) AS revenue_share
FROM abc a JOIN xyz x USING (p_brand)
GROUP BY a.abc, x.xyz
"""

QUERIES["q_abc_xyz_matrix"] = (q_abc_xyz_matrix, Q_ABC_XYZ_SQL)


_WHATIF_SCENARIOS = (
    ("baseline", 1.0, 0.0),
    ("price_minus_5pct", 0.95, 0.0),
    ("discount_plus_1pp", 1.0, 0.01),
)


def q_scenario_whatif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What-if scenario grid: net revenue per market segment under
    price −5% and discount +1pp counterfactuals next to baseline —
    deterministic scenario algebra pushed into ONE scan (each
    scenario is a conditional expression, not a re-read), the
    warehouse-side skeleton of pricing simulations.
    """
    c = Catalog(spark, sf_dir)
    li = (
        c.lineitem.join(
            c.orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(c.customer.select("c_custkey", "c_mktsegment")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("c_mktsegment", "l_extendedprice", "l_discount")
    )
    aggs = []
    for name, pmul, dadd in _WHATIF_SCENARIOS:
        rev = F.col("l_extendedprice") * pmul * (
            1 - F.least(F.col("l_discount") + dadd, F.lit(1.0))
        )
        aggs.append(F.round(F.sum(rev), 2).alias(name))
    return li.groupBy("c_mktsegment").agg(*aggs)


def _whatif_sql() -> str:
    cols = []
    for name, pmul, dadd in _WHATIF_SCENARIOS:
        cols.append(
            f"round(sum(l_extendedprice * {pmul!r}"
            f" * (1 - least(l_discount + {dadd!r}, 1.0))), 2) AS {name}"
        )
    return f"""
SELECT c.c_mktsegment, {", ".join(cols)}
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


QUERIES["q_scenario_whatif"] = (q_scenario_whatif, _whatif_sql())


def q_dead_sku_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-SKU census per brand: parts never ordered (anti-join
    against lineitem) with their share of the catalog and the
    retail value parked in them — the assortment-hygiene report
    that feeds delisting decisions.

    One distinct on the fact side's part keys, an anti-join that
    stays broadcast at dim scale, and a bounded per-brand rollup.
    """
    c = Catalog(spark, sf_dir)
    ordered = c.lineitem.select("l_partkey").distinct()
    parts = c.part.select("p_partkey", "p_brand", "p_retailprice")
    dead = parts.join(
        ordered, parts.p_partkey == ordered.l_partkey, "left_anti"
    )
    per = parts.groupBy("p_brand").agg(F.count(F.lit(1)).alias("n_parts"))
    dper = dead.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_dead"),
        F.round(F.sum("p_retailprice"), 2).alias("dead_value"),
    )
    return per.join(dper, "p_brand", "left").select(
        "p_brand",
        "n_parts",
        F.coalesce("n_dead", F.lit(0)).alias("n_dead"),
        F.coalesce("dead_value", F.lit(0.0)).alias("dead_value"),
        _R4(F.coalesce("n_dead", F.lit(0)) / F.col("n_parts"), "dead_share"),
    )


Q_DEAD_SKU_SQL = """
WITH ordered AS (
  SELECT DISTINCT l_partkey FROM lineitem
), dead AS (
  SELECT p.p_brand, count(*) AS n_dead,
         round(sum(p.p_retailprice), 2) AS dead_value
  FROM part p LEFT JOIN ordered o ON o.l_partkey = p.p_partkey
  WHERE o.l_partkey IS NULL
  GROUP BY p.p_brand
), per AS (
  SELECT p_brand, count(*) AS n_parts FROM part GROUP BY p_brand
)
SELECT p.p_brand, p.n_parts,
       CAST(coalesce(d.n_dead, 0) AS BIGINT) AS n_dead,
       coalesce(d.dead_value, 0.0) AS dead_value,
       round(coalesce(d.n_dead, 0) / CAST(p.n_parts AS DOUBLE), 4) AS dead_share
FROM per p LEFT JOIN dead d USING (p_brand)
"""

QUERIES["q_dead_sku_census"] = (q_dead_sku_census, Q_DEAD_SKU_SQL)


def q_peak_day_contribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal revenue concentration: each month's peak day and
    the share of the month it carried — spiky months (one deadline
    day = half the revenue) need different capacity planning than
    flat ones, and the spike share is the one-number tell.

    Daily rollup → per-month argmax via max(struct) — no window,
    two bounded aggregates.
    """
    daily = (
        Catalog(spark, sf_dir)
        .orders.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            F.to_date("o_orderdate").alias("day"),
        )
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    per = daily.groupBy("month").agg(
        F.sum("rev").alias("total"),
        F.max(F.struct(F.round("rev", 2).alias("r"), "day")).alias("peak"),
        F.count(F.lit(1)).alias("n_days"),
    )
    return per.select(
        "month",
        "n_days",
        F.round("total", 2).alias("month_revenue"),
        F.col("peak.day").alias("peak_day"),
        F.col("peak.r").alias("peak_revenue"),
        _R4(F.col("peak.r") / F.col("total"), "peak_share"),
    )


Q_PEAK_DAY_SQL = """
WITH daily AS (
  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
         CAST(o_orderdate AS DATE) AS day, sum(o_totalprice) AS rev
  FROM orders GROUP BY 1, 2
)
SELECT month, count(*) AS n_days,
       round(sum(rev), 2) AS month_revenue,
       (max(struct_pack(r := round(rev, 2), d := day))).d AS peak_day,
       (max(struct_pack(r := round(rev, 2), d := day))).r AS peak_revenue,
       round((max(struct_pack(r := round(rev, 2), d := day))).r / sum(rev), 4)
         AS peak_share
FROM daily GROUP BY month
"""

QUERIES["q_peak_day_contribution"] = (
    q_peak_day_contribution,
    Q_PEAK_DAY_SQL,
)


_SS_M0, _SS_M1 = "1995-03", "1995-04"


def q_shift_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shift-share decomposition of each nation's month-over-month
    revenue growth: national effect (what growing with the whole
    economy would give), industry-mix effect (the nation's segment
    portfolio vs the average), and competitive effect (the
    residual local performance) — the standard regional-economics
    decomposition a government statistics office publishes.

    Everything reduces to the (nation, segment) × 2-month grid:
    one conditional aggregate over the joined facts, then row
    algebra against two broadcast scalar growth rates.
    """
    c = Catalog(spark, sf_dir)
    li = (
        c.orders.filter(
            F.date_format("o_orderdate", "yyyy-MM").isin(_SS_M0, _SS_M1)
        )
        .join(c.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            "c_mktsegment",
            F.date_format("o_orderdate", "yyyy-MM").alias("m"),
            "o_totalprice",
        )
    )
    cell = li.groupBy("n_name", "c_mktsegment").agg(
        F.sum(F.when(F.col("m") == _SS_M0, F.col("o_totalprice"))).alias("r0"),
        F.sum(F.when(F.col("m") == _SS_M1, F.col("o_totalprice"))).alias("r1"),
    ).fillna(0.0, ["r0", "r1"])
    seg = cell.groupBy("c_mktsegment").agg(
        F.sum("r0").alias("s0"), F.sum("r1").alias("s1")
    )
    nat = seg.agg(F.sum("s0").alias("t0"), F.sum("s1").alias("t1"))
    g_all = (F.col("t1") - F.col("t0")) / F.col("t0")
    g_seg = (F.col("s1") - F.col("s0")) / F.col("s0")
    j = (
        cell.join(F.broadcast(seg), "c_mktsegment")
        .crossJoin(F.broadcast(nat))
        .select(
            "n_name",
            "r0",
            "r1",
            (F.col("r0") * g_all).alias("nat_eff"),
            (F.col("r0") * (g_seg - g_all)).alias("mix_eff"),
            (
                F.col("r1")
                - F.col("r0")
                - F.col("r0") * g_seg
            ).alias("comp_eff"),
        )
    )
    return j.groupBy("n_name").agg(
        F.round(F.sum("r1") - F.sum("r0"), 2).alias("growth"),
        F.round(F.sum("nat_eff"), 2).alias("national_effect"),
        F.round(F.sum("mix_eff"), 2).alias("mix_effect"),
        F.round(F.sum("comp_eff"), 2).alias("competitive_effect"),
    )


Q_SHIFT_SHARE_SQL = f"""
WITH li AS (
  SELECT n.n_name, c.c_mktsegment,
         strftime(CAST(o.o_orderdate AS DATE), '%Y-%m') AS m,
         o.o_totalprice
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE strftime(CAST(o.o_orderdate AS DATE), '%Y-%m') IN ('{_SS_M0}', '{_SS_M1}')
), cell AS (
  SELECT n_name, c_mktsegment,
         coalesce(sum(CASE WHEN m = '{_SS_M0}' THEN o_totalprice END), 0) AS r0,
         coalesce(sum(CASE WHEN m = '{_SS_M1}' THEN o_totalprice END), 0) AS r1
  FROM li GROUP BY 1, 2
), seg AS (
  SELECT c_mktsegment, sum(r0) AS s0, sum(r1) AS s1 FROM cell GROUP BY 1
), nat AS (
  SELECT sum(s0) AS t0, sum(s1) AS t1 FROM seg
)
SELECT cell.n_name,
       round(sum(r1) - sum(r0), 2) AS growth,
       round(sum(r0 * (t1 - t0) / t0), 2) AS national_effect,
       round(sum(r0 * ((s1 - s0) / s0 - (t1 - t0) / t0)), 2) AS mix_effect,
       round(sum(r1 - r0 - r0 * (s1 - s0) / s0), 2) AS competitive_effect
FROM cell JOIN seg USING (c_mktsegment) CROSS JOIN nat
GROUP BY cell.n_name
"""

QUERIES["q_shift_share"] = (q_shift_share, Q_SHIFT_SHARE_SQL)


def q_location_quotient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Location quotient per (nation, segment): the nation's
    revenue share in a segment relative to the global share —
    LQ > 1 marks regional specialization, the other staple of
    regional economic accounts. One aggregate to the grid, two
    marginal windows, row division.
    """
    c = Catalog(spark, sf_dir)
    cell = (
        c.orders.join(c.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "c_mktsegment")
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    wn = Window.partitionBy("n_name")
    tot = Window.partitionBy()
    ws = Window.partitionBy("c_mktsegment")
    lq = (F.col("rev") / F.sum("rev").over(wn)) / (
        F.sum("rev").over(ws) / F.sum("rev").over(tot)
    )
    out = cell.select(
        "n_name",
        "c_mktsegment",
        F.round("rev", 2).alias("revenue"),
        _R4(lq, "location_quotient"),
    )
    return out.filter(
        (F.col("location_quotient") >= 1.2)
        | (F.col("location_quotient") <= 0.8)
    )


Q_LOCATION_QUOTIENT_SQL = """
WITH cell AS (
  SELECT n.n_name, c.c_mktsegment, sum(o.o_totalprice) AS rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
), scored AS (
  SELECT n_name, c_mktsegment, round(rev, 2) AS revenue,
         round((rev / sum(rev) OVER (PARTITION BY n_name))
               / (sum(rev) OVER (PARTITION BY c_mktsegment)
                  / sum(rev) OVER ()), 4) AS location_quotient
  FROM cell
)
SELECT * FROM scored
WHERE location_quotient >= 1.2 OR location_quotient <= 0.8
"""

QUERIES["q_location_quotient"] = (q_location_quotient, Q_LOCATION_QUOTIENT_SQL)


_PI_M0, _PI_M1 = "1995-03", "1995-04"


def q_price_index_fisher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Official-statistics price indices per brand between two
    months: Laspeyres (base-quantity weights), Paasche (current-
    quantity weights), and Fisher (their geometric mean — the
    "ideal" index a CPI program publishes). Items are parts priced
    both months; unit price = revenue/quantity.

    One conditional aggregate to the (part, month) grid, an inner
    join to the both-months item set, three weighted sums per
    brand — no windows.
    """
    c = Catalog(spark, sf_dir)
    li = c.lineitem.filter(
        F.date_format("l_shipdate", "yyyy-MM").isin(_PI_M0, _PI_M1)
    ).select(
        "l_partkey",
        F.date_format("l_shipdate", "yyyy-MM").alias("m"),
        "l_quantity",
        F.col("l_extendedprice").alias("rev"),
    )
    cell = li.groupBy("l_partkey", "m").agg(
        F.sum("l_quantity").alias("q"), F.sum("rev").alias("r")
    )
    m0 = cell.filter(F.col("m") == _PI_M0).select(
        "l_partkey",
        (F.col("r") / F.col("q")).alias("p0"),
        F.col("q").alias("q0"),
    )
    m1 = cell.filter(F.col("m") == _PI_M1).select(
        "l_partkey",
        (F.col("r") / F.col("q")).alias("p1"),
        F.col("q").alias("q1"),
    )
    both = m0.join(m1, "l_partkey").join(
        F.broadcast(c.part.select("p_partkey", "p_brand")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    agg = both.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("p1") * F.col("q0")).alias("p1q0"),
        F.sum(F.col("p0") * F.col("q0")).alias("p0q0"),
        F.sum(F.col("p1") * F.col("q1")).alias("p1q1"),
        F.sum(F.col("p0") * F.col("q1")).alias("p0q1"),
    )
    lasp = F.col("p1q0") / F.col("p0q0")
    paas = F.col("p1q1") / F.col("p0q1")
    return agg.select(
        "p_brand",
        "n_items",
        _R4(lasp, "laspeyres"),
        _R4(paas, "paasche"),
        _R4(F.sqrt(lasp * paas), "fisher"),
    )


Q_PRICE_INDEX_SQL = f"""
WITH li AS (
  SELECT l_partkey, strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS m,
         l_quantity, l_extendedprice AS rev
  FROM lineitem
  WHERE strftime(CAST(l_shipdate AS DATE), '%Y-%m') IN ('{_PI_M0}', '{_PI_M1}')
), cell AS (
  SELECT l_partkey, m, sum(l_quantity) AS q, sum(rev) AS r
  FROM li GROUP BY 1, 2
), m0 AS (
  SELECT l_partkey, r / q AS p0, q AS q0 FROM cell WHERE m = '{_PI_M0}'
), m1 AS (
  SELECT l_partkey, r / q AS p1, q AS q1 FROM cell WHERE m = '{_PI_M1}'
)
SELECT p.p_brand, count(*) AS n_items,
       round(sum(p1 * q0) / sum(p0 * q0), 4) AS laspeyres,
       round(sum(p1 * q1) / sum(p0 * q1), 4) AS paasche,
       round(sqrt((sum(p1 * q0) / sum(p0 * q0))
                  * (sum(p1 * q1) / sum(p0 * q1))), 4) AS fisher
FROM m0 JOIN m1 USING (l_partkey)
JOIN part p ON p.p_partkey = m0.l_partkey
GROUP BY p.p_brand
"""

QUERIES["q_price_index_fisher"] = (q_price_index_fisher, Q_PRICE_INDEX_SQL)


_PCF_CHANGE_T = 0.01  # >1% move counts as a price change


def q_price_change_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-stickiness statistics: per month, the share of parts
    whose average unit price moved more than 1% from the prior
    month — the price-change-frequency series behind menu-cost /
    inflation micro-analyses in official statistics.

    One aggregate to the (part, month) price grid, a lag over the
    bounded grid, monthly shares out.
    """
    li = Catalog(spark, sf_dir).lineitem.select(
        "l_partkey",
        F.date_format("l_shipdate", "yyyy-MM").alias("m"),
        "l_quantity",
        F.col("l_extendedprice").alias("rev"),
    )
    grid = li.groupBy("l_partkey", "m").agg(
        (F.sum("rev") / F.sum("l_quantity")).alias("p")
    )
    w = Window.partitionBy("l_partkey").orderBy("m")
    lagged = grid.withColumn("p_prev", F.lag("p").over(w)).filter(
        F.col("p_prev").isNotNull()
    )
    chg = F.abs(F.col("p") / F.col("p_prev") - 1) > _PCF_CHANGE_T
    return lagged.groupBy("m").agg(
        F.count(F.lit(1)).alias("n_parts_priced"),
        F.sum(chg.cast("long")).alias("n_changed"),
        _R4(F.avg(chg.cast("double")), "change_frequency"),
        _R4(
            F.avg(F.when(chg, F.abs(F.col("p") / F.col("p_prev") - 1))),
            "avg_change_magnitude",
        ),
    )


Q_PRICE_CHANGE_FREQ_SQL = f"""
WITH grid AS (
  SELECT l_partkey, strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS m,
         sum(l_extendedprice) / sum(l_quantity) AS p
  FROM lineitem GROUP BY 1, 2
), lagged AS (
  SELECT m, p, lag(p) OVER (PARTITION BY l_partkey ORDER BY m) AS p_prev
  FROM grid
)
SELECT m, count(*) AS n_parts_priced,
       CAST(sum(CASE WHEN abs(p / p_prev - 1) > {_PCF_CHANGE_T}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
       round(avg(CASE WHEN abs(p / p_prev - 1) > {_PCF_CHANGE_T}
                      THEN 1.0 ELSE 0.0 END), 4) AS change_frequency,
       round(avg(CASE WHEN abs(p / p_prev - 1) > {_PCF_CHANGE_T}
                      THEN abs(p / p_prev - 1) END), 4) AS avg_change_magnitude
FROM lagged WHERE p_prev IS NOT NULL
GROUP BY m
"""

QUERIES["q_price_change_frequency"] = (
    q_price_change_frequency,
    Q_PRICE_CHANGE_FREQ_SQL,
)


_RAKE_ROUNDS = 3


def q_survey_raking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survey raking (iterative proportional fitting): reweight the
    (nation, segment) customer grid so both marginals match uniform
    targets, 3 IPF rounds — the weighting step every official
    survey program runs so its sample speaks for the population.

    The grid is bounded (25×5), so each round is two tiny
    aggregates + a broadcast join-back; fixed rounds keep the
    computation an exact chained-CTE replay in the oracle. Output:
    per-nation weighted totals + the worst marginal error left.
    """
    cust = Catalog(spark, sf_dir).customer.select(
        "c_nationkey", "c_mktsegment"
    )
    cell = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = cell.agg(
        F.sum("n").alias("t"),
        F.count_distinct("c_nationkey").alias("kn"),
        F.count_distinct("c_mktsegment").alias("ks"),
    )
    g = cell.crossJoin(F.broadcast(tot)).select(
        "c_nationkey",
        "c_mktsegment",
        "n",
        (F.col("t") / F.col("kn")).alias("row_target"),
        (F.col("t") / F.col("ks")).alias("col_target"),
        F.col("n").cast("double").alias("w"),
    )
    for _ in range(_RAKE_ROUNDS):
        row_sum = Window.partitionBy("c_nationkey")
        g = g.withColumn(
            "w", F.col("w") * F.col("row_target") / F.sum("w").over(row_sum)
        )
        col_sum = Window.partitionBy("c_mktsegment")
        g = g.withColumn(
            "w", F.col("w") * F.col("col_target") / F.sum("w").over(col_sum)
        )
    out = g.groupBy("c_nationkey").agg(
        F.round(F.sum("w"), 4).alias("weighted_total"),
        F.max("row_target").alias("_tgt"),
    )
    return out.select(
        "c_nationkey",
        "weighted_total",
        _R4(
            F.abs(F.col("weighted_total") / F.col("_tgt") - 1), "marginal_error"
        ),
    )


def _raking_sql() -> str:
    body = ["""
WITH cell AS (
  SELECT c_nationkey, c_mktsegment, count(*) AS n
  FROM customer GROUP BY 1, 2
), tot AS (
  SELECT sum(n) AS t, count(DISTINCT c_nationkey) AS kn,
         count(DISTINCT c_mktsegment) AS ks
  FROM cell
), g0 AS (
  SELECT c_nationkey, c_mktsegment,
         t / CAST(kn AS DOUBLE) AS row_target,
         t / CAST(ks AS DOUBLE) AS col_target,
         CAST(n AS DOUBLE) AS w
  FROM cell CROSS JOIN tot
)"""]
    prev = "g0"
    for i in range(1, _RAKE_ROUNDS + 1):
        body.append(f""", r{i} AS (
  SELECT c_nationkey, c_mktsegment, row_target, col_target,
         w * row_target / sum(w) OVER (PARTITION BY c_nationkey) AS w
  FROM {prev}
), c{i} AS (
  SELECT c_nationkey, c_mktsegment, row_target, col_target,
         w * col_target / sum(w) OVER (PARTITION BY c_mktsegment) AS w
  FROM r{i}
)""")
        prev = f"c{i}"
    body.append(f"""
SELECT c_nationkey,
       round(sum(w), 4) AS weighted_total,
       round(abs(round(sum(w), 4) / max(row_target) - 1), 4) AS marginal_error
FROM {prev} GROUP BY c_nationkey
""")
    return "".join(body)


QUERIES["q_survey_raking"] = (q_survey_raking, _raking_sql())


def q_composite_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HDI-style composite index per nation: min-max normalize
    three indicators (revenue per customer, orders per customer,
    mean account balance) to [0,1] and average them into one
    ranked index — the construction behind every development /
    performance league table a statistics office publishes.

    Indicators come from two grouped aggregates; min-max bounds
    broadcast back; the index is row algebra + one 25-row rank.
    """
    c = Catalog(spark, sf_dir)
    per = (
        c.orders.join(c.customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(
            (F.sum("o_totalprice") / F.count_distinct("c_custkey")).alias("rev_pc"),
            (F.count(F.lit(1)) / F.count_distinct("c_custkey")).alias("ord_pc"),
        )
    )
    bal = c.customer.groupBy("c_nationkey").agg(
        F.avg("c_acctbal").alias("bal")
    )
    j = per.join(bal, "c_nationkey")
    bounds = j.agg(
        *[
            f(c_).alias(f"{n}_{c_}")
            for c_ in ("rev_pc", "ord_pc", "bal")
            for n, f in (("mn", F.min), ("mx", F.max))
        ]
    )
    jj = j.crossJoin(F.broadcast(bounds))

    def norm(c_):
        return (F.col(c_) - F.col(f"mn_{c_}")) / (
            F.col(f"mx_{c_}") - F.col(f"mn_{c_}")
        )

    idx = F.round((norm("rev_pc") + norm("ord_pc") + norm("bal")) / 3.0, 6)
    w = Window.orderBy(F.desc(idx), F.asc("c_nationkey"))
    return jj.select(
        "c_nationkey",
        _R4(F.col("rev_pc"), "rev_per_customer"),
        _R4(F.col("ord_pc"), "orders_per_customer"),
        _R4(F.col("bal"), "avg_balance"),
        _R4(idx, "composite_index"),
        F.row_number().over(w).alias("rank"),
    )


Q_COMPOSITE_INDEX_SQL = """
WITH per AS (
  SELECT c.c_nationkey,
         sum(o.o_totalprice) / count(DISTINCT c.c_custkey) AS rev_pc,
         count(*) / CAST(count(DISTINCT c.c_custkey) AS DOUBLE) AS ord_pc
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_nationkey
), bal AS (
  SELECT c_nationkey, avg(c_acctbal) AS bal FROM customer GROUP BY 1
), j AS (
  SELECT p.c_nationkey, p.rev_pc, p.ord_pc, b.bal FROM per p JOIN bal b USING (c_nationkey)
), bounds AS (
  SELECT min(rev_pc) AS mn_rev, max(rev_pc) AS mx_rev,
         min(ord_pc) AS mn_ord, max(ord_pc) AS mx_ord,
         min(bal) AS mn_bal, max(bal) AS mx_bal
  FROM j
), scored AS (
  SELECT j.*,
         round(((rev_pc - mn_rev) / (mx_rev - mn_rev)
                + (ord_pc - mn_ord) / (mx_ord - mn_ord)
                + (bal - mn_bal) / (mx_bal - mn_bal)) / 3.0, 6) AS idx
  FROM j CROSS JOIN bounds
)
SELECT c_nationkey,
       round(rev_pc, 4) AS rev_per_customer,
       round(ord_pc, 4) AS orders_per_customer,
       round(bal, 4) AS avg_balance,
       round(idx, 4) AS composite_index,
       CAST(row_number() OVER (ORDER BY idx DESC, c_nationkey ASC) AS INTEGER)
         AS rank
FROM scored
"""

QUERIES["q_composite_index"] = (q_composite_index, Q_COMPOSITE_INDEX_SQL)


def q_pareto_elbow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Elbow (knee) of the revenue-concentration curve: the rank on
    the cumulative part-revenue curve farthest from the chord
    between its endpoints — the principled answer to "where do we
    cut top-K" that replaces the arbitrary 80% of ABC analysis.

    Scale: global rank + running revenue via ``ranged_global_rank``
    (parallel range sort + offset ledger — no single-partition
    stage); revenue prefix-sums as integer cents so the parallel
    running sum is exact (oracle mirrored); the argmax is a
    distributed top-1 (TakeOrderedAndProject), not a global window.
    """
    li = Catalog(spark, sf_dir).lineitem.groupBy("l_partkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100
        )
        .cast("long")
        .alias("cents")
    )
    ranked = ranged_global_rank(
        li,
        [F.desc("cents"), F.asc("l_partkey")],
        rank_col="rk",
        running_longs={"cum_cents": "cents"},
    )
    tot = ranked.agg(
        F.sum("cents").alias("tot_cents"), F.count(F.lit(1)).alias("n")
    )
    curve = ranked.crossJoin(F.broadcast(tot)).select(
        "rk",
        (F.col("cum_cents") / F.col("tot_cents")).alias("cum_share"),
        "n",
    )
    # normalized chord from (0,0) to (1,1): distance ∝ |share − rank/n|
    dist = F.round(F.col("cum_share") - F.col("rk") / F.col("n"), 8)
    return (
        curve.orderBy(F.desc(dist), F.asc("rk"))
        .limit(1)
        .select(
            F.col("rk").alias("elbow_rank"),
            F.col("n").alias("n_parts"),
            _R4(F.col("rk") / F.col("n"), "elbow_rank_share"),
            _R4(F.col("cum_share"), "revenue_share_at_elbow"),
        )
    )


Q_PARETO_ELBOW_SQL = """
WITH li AS (
  SELECT l_partkey,
         CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) AS cents
  FROM lineitem GROUP BY 1
), curve AS (
  SELECT row_number() OVER (ORDER BY cents DESC, l_partkey ASC) AS rk,
         CAST(sum(cents) OVER (ORDER BY cents DESC, l_partkey ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           / CAST(sum(cents) OVER () AS DOUBLE) AS cum_share,
         count(*) OVER () AS n
  FROM li
)
SELECT CAST(rk AS BIGINT) AS elbow_rank, CAST(n AS BIGINT) AS n_parts,
       round(rk / CAST(n AS DOUBLE), 4) AS elbow_rank_share,
       round(cum_share, 4) AS revenue_share_at_elbow
FROM curve
ORDER BY round(cum_share - rk / CAST(n AS DOUBLE), 8) DESC, rk ASC
LIMIT 1
"""

QUERIES["q_pareto_elbow"] = (q_pareto_elbow, Q_PARETO_ELBOW_SQL)


_STAB_TOP_K = 20


def q_topk_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leaderboard stability: Jaccard overlap of the top-20 parts
    by revenue between the first and second halves of the history,
    plus how many of the current top-10 are new — the
    meta-analytics check that says whether a 'top sellers' report
    means anything or reshuffles every period.

    Two ranked halves from one conditional aggregate, a semi-join
    for the overlap, scalar output.
    """
    li = Catalog(spark, sf_dir).lineitem
    mid = li.agg(
        F.date_add(
            F.min(F.to_date("l_shipdate")),
            (
                F.datediff(
                    F.max(F.to_date("l_shipdate")),
                    F.min(F.to_date("l_shipdate")),
                )
                / 2
            ).cast("int"),
        ).alias("mid")
    )
    j = li.crossJoin(F.broadcast(mid)).select(
        "l_partkey",
        (F.to_date("l_shipdate") < F.col("mid")).alias("h1"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )

    def topk(cond):
        per = j.filter(cond).groupBy("l_partkey").agg(
            F.sum("rev").alias("r")
        )
        # distributed top-k, rank re-derived on the k survivors
        w = [F.desc("r"), F.asc("l_partkey")]
        return (
            per.orderBy(*w)
            .limit(_STAB_TOP_K)
            .withColumn("rk", F.row_number().over(Window.orderBy(*w)))
        )

    t1 = topk(F.col("h1")).select("l_partkey")
    t2 = topk(~F.col("h1")).select("l_partkey", "rk")
    inter = t2.join(t1, "l_partkey", "left_semi").count()
    new_top10 = (
        t2.filter(F.col("rk") <= 10)
        .join(t1, "l_partkey", "left_anti")
        .count()
    )
    return (
        Catalog(spark, sf_dir)
        .region.limit(1)
        .select(
            F.lit(_STAB_TOP_K).alias("k"),
            F.lit(inter).alias("n_overlap"),
            F.round(
                F.lit(inter) / F.lit(float(2 * _STAB_TOP_K - inter)), 4
            ).alias("jaccard"),
            F.lit(new_top10).alias("new_in_top10"),
        )
    )


Q_TOPK_STABILITY_SQL = f"""
WITH mid AS (
  SELECT min(CAST(l_shipdate AS DATE))
         + CAST(datediff('day', min(CAST(l_shipdate AS DATE)),
                         max(CAST(l_shipdate AS DATE))) / 2 AS INTEGER) AS mid
  FROM lineitem
), j AS (
  SELECT l_partkey,
         CAST(l_shipdate AS DATE) < m.mid AS h1,
         l_extendedprice * (1 - l_discount) AS rev
  FROM lineitem CROSS JOIN mid m
), t1 AS (
  SELECT l_partkey FROM (
    SELECT l_partkey, row_number() OVER (ORDER BY sum(rev) DESC, l_partkey ASC)
             AS rk
    FROM j WHERE h1 GROUP BY l_partkey
  ) WHERE rk <= {_STAB_TOP_K}
), t2 AS (
  SELECT l_partkey, rk FROM (
    SELECT l_partkey, row_number() OVER (ORDER BY sum(rev) DESC, l_partkey ASC)
             AS rk
    FROM j WHERE NOT h1 GROUP BY l_partkey
  ) WHERE rk <= {_STAB_TOP_K}
), stats AS (
  SELECT (SELECT count(*) FROM t2 WHERE l_partkey IN (SELECT l_partkey FROM t1))
           AS n_overlap,
         (SELECT count(*) FROM t2 WHERE rk <= 10
          AND l_partkey NOT IN (SELECT l_partkey FROM t1)) AS new_top10
)
SELECT {_STAB_TOP_K} AS k,
       CAST(n_overlap AS INTEGER) AS n_overlap,
       round(n_overlap / CAST({2 * _STAB_TOP_K} - n_overlap AS DOUBLE), 4)
         AS jaccard,
       CAST(new_top10 AS INTEGER) AS new_in_top10
FROM stats
"""

QUERIES["q_topk_stability"] = (q_topk_stability, Q_TOPK_STABILITY_SQL)


_MOMENTUM_TOP = 10


def q_parts_momentum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rising stars: parts with the strongest revenue ACCELERATION
    (second difference over the last three observed months) — the
    screen that surfaces what's taking off before it reaches any
    top-K list; deceleration at the bottom flags fading lines.

    One (part, month) grid, two lags over it, one top-k window —
    everything past the rollup is grid-bounded.
    """
    li = Catalog(spark, sf_dir).lineitem.select(
        "l_partkey",
        F.date_format("l_shipdate", "yyyy-MM").alias("m"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    grid = li.groupBy("l_partkey", "m").agg(F.sum("rev").alias("r"))
    w = Window.partitionBy("l_partkey").orderBy("m")
    lagged = grid.select(
        "l_partkey",
        "m",
        "r",
        F.lag("r", 1).over(w).alias("r1"),
        F.lag("r", 2).over(w).alias("r2"),
        F.row_number().over(
            Window.partitionBy("l_partkey").orderBy(F.desc("m"))
        ).alias("rn"),
    ).filter((F.col("rn") == 1) & F.col("r2").isNotNull())
    accel = F.round(F.col("r") - 2 * F.col("r1") + F.col("r2"), 2)
    # distributed top-k (TakeOrderedAndProject), rank re-derived on
    # the k surviving rows — never a one-task sort of all parts
    pick = [F.desc(accel), F.asc("l_partkey")]
    return (
        lagged.orderBy(*pick)
        .limit(_MOMENTUM_TOP)
        .withColumn("rank", F.row_number().over(Window.orderBy(*pick)))
        .select(
            "rank",
            "l_partkey",
            F.col("m").alias("latest_month"),
            F.round("r", 2).alias("rev_t"),
            F.round("r1", 2).alias("rev_t1"),
            accel.alias("acceleration"),
        )
    )


Q_PARTS_MOMENTUM_SQL = f"""
WITH grid AS (
  SELECT l_partkey, strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS m,
         sum(l_extendedprice * (1 - l_discount)) AS r
  FROM lineitem GROUP BY 1, 2
), lagged AS (
  SELECT l_partkey, m, r,
         lag(r, 1) OVER (PARTITION BY l_partkey ORDER BY m) AS r1,
         lag(r, 2) OVER (PARTITION BY l_partkey ORDER BY m) AS r2,
         row_number() OVER (PARTITION BY l_partkey ORDER BY m DESC) AS rn
  FROM grid
), latest AS (
  SELECT * FROM lagged WHERE rn = 1 AND r2 IS NOT NULL
)
SELECT CAST(row_number() OVER (ORDER BY round(r - 2 * r1 + r2, 2) DESC,
                               l_partkey ASC) AS INTEGER) AS rank,
       l_partkey, m AS latest_month,
       round(r, 2) AS rev_t, round(r1, 2) AS rev_t1,
       round(r - 2 * r1 + r2, 2) AS acceleration
FROM latest
ORDER BY rank LIMIT {_MOMENTUM_TOP}
"""

QUERIES["q_parts_momentum"] = (q_parts_momentum, Q_PARTS_MOMENTUM_SQL)


_CROSTON_ALPHA = 0.2
_CROSTON_TOP = 20
_CROSTON_MIN_EVENTS = 5


def q_croston_intermittent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method for intermittent demand (Croston 1972 — THE
    forecasting method for sparse spare-part-like series, where
    simple EWMA over the calendar systematically under-forecasts):
    per part, demand is compressed to its EVENTS (weeks with any
    order); separate exponential smoothings of event sizes z and
    inter-event gaps q give the demand-rate forecast ẑ/q̂ per week.
    Top-20 forecast rates among parts with ≥5 events, with the
    smoothed components exposed. Complements ``q_xyz_variability``
    (which only LABELS intermittency) with the actual forecast.

    The EWMA recursions unroll to the closed weighted form
    ŝ = (1−α)^(k−1)·x₁ + α·Σᵢ₌₂..k (1−α)^(k−i)·xᵢ, so each is ONE
    windowed sum over a part's bounded event sequence — no
    recursion, no UDF; identical arithmetic in the oracle.
    """
    li = Catalog(spark, sf_dir).lineitem.select(
        "l_partkey", F.date_trunc("week", F.col("l_shipdate")).alias("wk"),
        F.col("l_quantity").alias("qty"),
    )
    ev = (
        li.groupBy("l_partkey", "wk")
        .agg(F.sum("qty").alias("z"))
    )
    wp = Window.partitionBy("l_partkey").orderBy("wk")
    seq = (
        ev.withColumn("i", F.row_number().over(wp))
        .withColumn(
            "gap",
            F.coalesce(
                F.datediff(
                    "wk", F.lag("wk", 1).over(wp)
                )
                / 7.0,
                F.lit(1.0),
            ),
        )
        .withColumn("k", F.count(F.lit(1)).over(Window.partitionBy("l_partkey")))
    )
    a = _CROSTON_ALPHA
    wgt = F.when(
        F.col("i") == 1, F.pow(F.lit(1 - a), F.col("k") - 1)
    ).otherwise(F.lit(a) * F.pow(F.lit(1 - a), F.col("k") - F.col("i")))
    sm = seq.groupBy("l_partkey").agg(
        F.max("k").alias("n_events"),
        F.round(F.sum(wgt * F.col("z")), 6).alias("z_hat"),
        F.round(F.sum(wgt * F.col("gap")), 6).alias("q_hat"),
    )
    scored = sm.filter(F.col("n_events") >= _CROSTON_MIN_EVENTS).select(
        "l_partkey", "n_events", "z_hat", "q_hat",
        F.round(F.col("z_hat") / F.col("q_hat"), 4).alias("rate_per_week"),
    )
    # distributed top-k (TakeOrderedAndProject), rank re-derived on
    # the k surviving rows — never a one-task sort of all parts
    wtop = [F.desc("rate_per_week"), F.asc("l_partkey")]
    return (
        scored.orderBy(*wtop)
        .limit(_CROSTON_TOP)
        .withColumn("rank", F.row_number().over(Window.orderBy(*wtop)))
        .select("rank", "l_partkey", "n_events",
                _R4(F.col("z_hat"), "z_hat"), _R4(F.col("q_hat"), "q_hat"),
                "rate_per_week")
    )


Q_CROSTON_SQL = f"""
WITH ev AS (
  SELECT l_partkey, date_trunc('week', CAST(l_shipdate AS DATE)) AS wk,
         sum(l_quantity) AS z
  FROM lineitem GROUP BY 1, 2
), seq AS (
  SELECT l_partkey, wk, z,
         row_number() OVER (PARTITION BY l_partkey ORDER BY wk) AS i,
         coalesce(datediff('day', lag(wk) OVER (PARTITION BY l_partkey
                  ORDER BY wk), wk) / 7.0, 1.0) AS gap,
         count(*) OVER (PARTITION BY l_partkey) AS k
  FROM ev
), sm AS (
  SELECT l_partkey, max(k) AS n_events,
         round(sum(CASE WHEN i = 1 THEN pow(0.8, k - 1)
                        ELSE 0.2 * pow(0.8, k - i) END * z), 6) AS z_hat,
         round(sum(CASE WHEN i = 1 THEN pow(0.8, k - 1)
                        ELSE 0.2 * pow(0.8, k - i) END * gap), 6) AS q_hat
  FROM seq GROUP BY l_partkey
), scored AS (
  SELECT l_partkey, CAST(n_events AS BIGINT) AS n_events, z_hat, q_hat,
         round(z_hat / q_hat, 4) AS rate_per_week
  FROM sm WHERE n_events >= {_CROSTON_MIN_EVENTS}
)
SELECT CAST(row_number() OVER (ORDER BY rate_per_week DESC, l_partkey ASC)
            AS INTEGER) AS rank,
       l_partkey, n_events,
       round(z_hat, 4) AS z_hat, round(q_hat, 4) AS q_hat,
       rate_per_week
FROM scored ORDER BY rank LIMIT {_CROSTON_TOP}
"""

QUERIES["q_croston_intermittent"] = (q_croston_intermittent, Q_CROSTON_SQL)


def q_risk_pooling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Risk-pooling benefit per brand (the √n inventory law): the
    standard deviation of a brand's POOLED weekly demand vs the sum
    of its parts' individual standard deviations — the pooling
    ratio is the safety-stock fraction a centralized warehouse
    needs relative to per-part stocking (1/√n under independence;
    higher when part demands correlate, and THAT gap is the
    decision signal). The textbook aggregation argument, computed
    from data instead of assumed.

    One lineitem scan → (brand, part, week) demand; per-part sigmas
    and the pooled sigma come from two grouped aggregates over that
    contraction; output is bounded by brand count.
    """
    li = (
        Catalog(spark, sf_dir)
        .lineitem.join(
            F.broadcast(
                Catalog(spark, sf_dir).part.select("p_partkey", "p_brand")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            "p_brand",
            "l_partkey",
            F.date_trunc("week", F.col("l_shipdate")).alias("wk"),
            F.col("l_quantity").alias("qty"),
        )
    )
    pw = li.groupBy("p_brand", "l_partkey", "wk").agg(
        F.sum("qty").alias("d")
    )
    # σ over the FULL week grid with zero weeks counted — computed
    # closed-form from event sums (var = Σd²/T − (Σd/T)²) against
    # the global week count T, so no calendar-grid fill join is
    # needed; σ over only demand-event weeks would overstate every
    # per-part baseline and break the pooling algebra
    t_weeks = float(pw.select("wk").distinct().count())  # one scalar
    var0 = lambda sd2, sd: sd2 / t_weeks - (sd / t_weeks) * (sd / t_weeks)  # noqa: E731,E501
    per_part = pw.groupBy("p_brand", "l_partkey").agg(
        F.sum("d").alias("sd_"), F.sum(F.col("d") * F.col("d")).alias("sd2_")
    )
    sum_sd = per_part.groupBy("p_brand").agg(
        F.sum(F.sqrt(var0(F.col("sd2_"), F.col("sd_")))).alias("sum_part_sd"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    pooled = (
        pw.groupBy("p_brand", "wk")
        .agg(F.sum("d").alias("d"))
        .groupBy("p_brand")
        .agg(
            F.sum("d").alias("sd_"),
            F.sum(F.col("d") * F.col("d")).alias("sd2_"),
        )
        .select(
            "p_brand",
            F.sqrt(var0(F.col("sd2_"), F.col("sd_"))).alias("pooled_sd"),
        )
    )
    return (
        sum_sd.join(pooled, "p_brand")
        .select(
            "p_brand",
            "n_parts",
            _R4(F.col("sum_part_sd"), "sum_part_sd"),
            _R4(F.col("pooled_sd"), "pooled_sd"),
            _R4(F.col("pooled_sd") / F.col("sum_part_sd"), "pooling_ratio"),
            _R4(1.0 / F.sqrt(F.col("n_parts").cast("double")), "iid_ratio"),
        )
        .orderBy("p_brand")
    )


Q_RISK_POOLING_SQL = """
WITH li AS (
  SELECT p_brand, l_partkey,
         date_trunc('week', CAST(l_shipdate AS DATE)) AS wk,
         l_quantity AS qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
), pw AS (
  SELECT p_brand, l_partkey, wk, sum(qty) AS d FROM li GROUP BY 1, 2, 3
), tw AS (
  SELECT CAST(count(DISTINCT wk) AS DOUBLE) AS t FROM pw
), per_part AS (
  SELECT p_brand, l_partkey, sum(d) AS sd_, sum(d * d) AS sd2_
  FROM pw GROUP BY 1, 2
), sums AS (
  SELECT p_brand,
         sum(sqrt(sd2_ / t - (sd_ / t) * (sd_ / t))) AS sum_part_sd,
         count(*) AS n_parts
  FROM per_part CROSS JOIN tw GROUP BY p_brand
), pooled AS (
  SELECT p_brand,
         sqrt(sd2_ / t - (sd_ / t) * (sd_ / t)) AS pooled_sd
  FROM (SELECT p_brand, sum(d) AS sd_, sum(d * d) AS sd2_
        FROM (SELECT p_brand, wk, sum(d) AS d FROM pw GROUP BY 1, 2)
        GROUP BY p_brand) CROSS JOIN tw
)
SELECT p_brand, CAST(n_parts AS BIGINT) AS n_parts,
       round(sum_part_sd, 4) AS sum_part_sd,
       round(pooled_sd, 4) AS pooled_sd,
       round(pooled_sd / sum_part_sd, 4) AS pooling_ratio,
       round(1.0 / sqrt(CAST(n_parts AS DOUBLE)), 4) AS iid_ratio
FROM sums JOIN pooled USING (p_brand)
ORDER BY p_brand
"""

QUERIES["q_risk_pooling"] = (q_risk_pooling, Q_RISK_POOLING_SQL)


_NEWSVENDOR_FRACTILE = 0.8  # cu/(cu+co): understock 4x worse than overstock


def q_newsvendor_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newsvendor stocking policy per brand: the critical-fractile
    order quantity q* = F⁻¹(cu/(cu+co)) of WEEKLY demand (0.8 here —
    understocking costs 4× overstocking), next to mean demand so the
    implied safety stock is visible. The one-line answer inventory
    theory gives for perishable/seasonal stocking, computed from the
    actual demand distribution instead of a normal assumption.

    (brand, week) demand contraction, then one exact-quantile
    aggregate per bounded brand key (``percentile`` ≡
    ``quantile_cont``; swap for approx_percentile at 100 TB).
    """
    c = Catalog(spark, sf_dir)
    li = c.lineitem.join(
        F.broadcast(c.part.select("p_partkey", "p_brand")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    weekly = li.groupBy(
        "p_brand", F.date_trunc("week", "l_shipdate").alias("wk")
    ).agg(F.sum("l_quantity").alias("d"))
    return weekly.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_weeks"),
        _R4(F.avg("d"), "mean_weekly_demand"),
        _R4(
            F.percentile("d", F.lit(_NEWSVENDOR_FRACTILE)), "q_star"
        ),
        _R4(
            F.percentile("d", F.lit(_NEWSVENDOR_FRACTILE)) - F.avg("d"),
            "safety_stock",
        ),
    )


Q_NEWSVENDOR_SQL = f"""
WITH weekly AS (
  SELECT p.p_brand, date_trunc('week', CAST(l.l_shipdate AS DATE)) AS wk,
         sum(l.l_quantity) AS d
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
)
SELECT p_brand, count(*) AS n_weeks,
       round(avg(d), 4) AS mean_weekly_demand,
       round(quantile_cont(d, {_NEWSVENDOR_FRACTILE}), 4) AS q_star,
       round(quantile_cont(d, {_NEWSVENDOR_FRACTILE}) - avg(d), 4)
         AS safety_stock
FROM weekly GROUP BY p_brand
"""

QUERIES["q_newsvendor_quantile"] = (q_newsvendor_quantile, Q_NEWSVENDOR_SQL)


_FILL_SLA_DAYS = 60


def q_fill_rate_service_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Service-level measurement per order priority: the share of
    orders FULLY shipped within the 60-day SLA (every line's ship
    date inside the window — the all-or-nothing fill-rate contract),
    next to the mean days-to-complete of the on-time set.

    One lineitem rollup to (order, last_ship), one join, one bounded
    priority aggregate — the operational twin of the survival curve
    (``q_survival_fulfillment``) reported the way ops contracts are
    written.
    """
    c = Catalog(spark, sf_dir)
    done = c.lineitem.groupBy("l_orderkey").agg(
        F.max(F.to_date("l_shipdate")).alias("last_ship")
    )
    j = c.orders.join(done, F.col("o_orderkey") == F.col("l_orderkey")).select(
        "o_orderpriority",
        F.greatest(
            F.datediff("last_ship", F.to_date("o_orderdate")), F.lit(0)
        ).alias("days"),
    )
    on_time = (F.col("days") <= _FILL_SLA_DAYS).cast("double")
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _R4(F.avg(on_time), "fill_rate"),
        _R4(
            F.avg(F.when(F.col("days") <= _FILL_SLA_DAYS, F.col("days"))),
            "mean_days_on_time",
        ),
        F.max("days").alias("worst_days"),
    )


Q_FILL_RATE_SQL = f"""
WITH done AS (
  SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS last_ship
  FROM lineitem GROUP BY 1
), j AS (
  SELECT o.o_orderpriority,
         greatest(datediff('day', CAST(o.o_orderdate AS DATE), d.last_ship), 0)
           AS days
  FROM orders o JOIN done d ON o.o_orderkey = d.l_orderkey
)
SELECT o_orderpriority, count(*) AS n_orders,
       round(avg(CASE WHEN days <= {_FILL_SLA_DAYS} THEN 1.0 ELSE 0.0 END), 4)
         AS fill_rate,
       round(avg(CASE WHEN days <= {_FILL_SLA_DAYS} THEN days END), 4)
         AS mean_days_on_time,
       CAST(max(days) AS BIGINT) AS worst_days
FROM j GROUP BY o_orderpriority
"""

QUERIES["q_fill_rate_service_level"] = (
    q_fill_rate_service_level,
    Q_FILL_RATE_SQL,
)


def q_order_line_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lines-per-order distribution: census, revenue share, and mean
    value per line-count — the order-shape profile that drives
    pick-pack batching and the join-fanout expectations every
    downstream query inherits (a catalog where 7-line orders carry
    half the revenue joins very differently than one of singletons).

    One lineitem rollup keyed by order, one bounded line-count
    aggregate; revenue in cents so shares are engine-exact.
    """
    li = Catalog(spark, sf_dir).lineitem
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100
        )
        .cast("long")
        .alias("cents"),
    )
    tot = per_order.agg(
        F.sum("cents").cast("double").alias("t"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    return (
        per_order.crossJoin(F.broadcast(tot))
        .groupBy("n_lines")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _R4(F.count(F.lit(1)) / F.max("n"), "order_share"),
            _R4(F.sum("cents") / F.max("t"), "revenue_share"),
            _R4(F.sum("cents") / 100.0 / F.count(F.lit(1)), "mean_order_value"),
        )
    )


Q_ORDER_LINE_PARETO_SQL = """
WITH per_order AS (
  SELECT l_orderkey, count(*) AS n_lines,
         CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)
           AS cents
  FROM lineitem GROUP BY 1
), tot AS (
  SELECT CAST(sum(cents) AS DOUBLE) AS t, CAST(count(*) AS DOUBLE) AS n
  FROM per_order
)
SELECT n_lines, count(*) AS n_orders,
       round(count(*) / max(n), 4) AS order_share,
       round(CAST(sum(cents) AS DOUBLE) / max(t), 4) AS revenue_share,
       round(CAST(sum(cents) AS DOUBLE) / 100.0 / count(*), 4)
         AS mean_order_value
FROM per_order CROSS JOIN tot
GROUP BY n_lines
"""

QUERIES["q_order_line_pareto"] = (q_order_line_pareto, Q_ORDER_LINE_PARETO_SQL)


def q_dupont_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuPont-style KPI tree per market segment: revenue per
    customer decomposed into orders/customer × lines/order ×
    value/line — the multiplicative factorization that tells you
    WHICH lever moved when a segment's revenue shifts (more buyers
    buying? bigger baskets? richer lines?). Cents-exact revenue so
    the product re-multiplies to the reported total in both engines.

    One lineitem→orders join rolled to order grain, one
    customer-dim broadcast, one bounded segment aggregate.
    """
    c = Catalog(spark, sf_dir)
    per_order = c.lineitem.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100
        )
        .cast("long")
        .alias("cents"),
    )
    j = (
        c.orders.join(per_order, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(c.customer.select("c_custkey", "c_mktsegment")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    return j.groupBy("c_mktsegment").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("n_lines").alias("n_lines"),
        _R4(
            F.count(F.lit(1)) / F.countDistinct("o_custkey"),
            "orders_per_customer",
        ),
        _R4(F.sum("n_lines") / F.count(F.lit(1)), "lines_per_order"),
        _R4(F.sum("cents") / 100.0 / F.sum("n_lines"), "value_per_line"),
        _R4(
            F.sum("cents") / 100.0 / F.countDistinct("o_custkey"),
            "revenue_per_customer",
        ),
    )


Q_DUPONT_SQL = """
WITH per_order AS (
  SELECT l_orderkey, count(*) AS n_lines,
         CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)
           AS cents
  FROM lineitem GROUP BY 1
), j AS (
  SELECT c.c_mktsegment, o.o_custkey, p.n_lines, p.cents
  FROM orders o
  JOIN per_order p ON o.o_orderkey = p.l_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
)
SELECT c_mktsegment,
       count(DISTINCT o_custkey) AS n_customers,
       count(*) AS n_orders,
       CAST(sum(n_lines) AS BIGINT) AS n_lines,
       round(count(*) / CAST(count(DISTINCT o_custkey) AS DOUBLE), 4)
         AS orders_per_customer,
       round(sum(n_lines) / CAST(count(*) AS DOUBLE), 4) AS lines_per_order,
       round(CAST(sum(cents) AS DOUBLE) / 100.0 / sum(n_lines), 4)
         AS value_per_line,
       round(CAST(sum(cents) AS DOUBLE) / 100.0
             / count(DISTINCT o_custkey), 4) AS revenue_per_customer
FROM j GROUP BY c_mktsegment
"""

QUERIES["q_dupont_decomposition"] = (
    q_dupont_decomposition,
    Q_DUPONT_SQL,
)


def q_customer_overlap_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-base continuity per market segment: Jaccard overlap
    of the pre-1996 and post-1996 active-customer sets — the
    segment-level retention number behind ``q_customer_migration``'s
    tier matrix (a high-churn segment with flat revenue is being
    silently refilled by acquisition).

    Two distinct customer sets per segment from one conditional
    aggregate (customer grain, map-side combinable), then bounded
    segment algebra.
    """
    c = Catalog(spark, sf_dir)
    split = F.lit("1996-01-01").cast("timestamp")
    j = c.orders.join(
        F.broadcast(c.customer.select("c_custkey", "c_mktsegment")),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    per_cust = j.groupBy("c_mktsegment", "o_custkey").agg(
        F.max((F.col("o_orderdate") < split).cast("long")).alias("early"),
        F.max((F.col("o_orderdate") >= split).cast("long")).alias("late"),
    )
    return per_cust.groupBy("c_mktsegment").agg(
        F.sum("early").alias("n_early"),
        F.sum("late").alias("n_late"),
        F.sum(F.col("early") * F.col("late")).alias("n_both"),
        _R4(
            F.sum(F.col("early") * F.col("late"))
            / F.count(F.lit(1)),
            "jaccard_overlap",
        ),
        _R4(
            F.sum(F.col("early") * F.col("late")) / F.sum("early"),
            "early_retained_share",
        ),
    )


Q_CUSTOMER_OVERLAP_SQL = """
WITH per_cust AS (
  SELECT c.c_mktsegment, o.o_custkey,
         max(CASE WHEN o.o_orderdate < TIMESTAMP '1996-01-01'
                  THEN 1 ELSE 0 END) AS early,
         max(CASE WHEN o.o_orderdate >= TIMESTAMP '1996-01-01'
                  THEN 1 ELSE 0 END) AS late
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
)
SELECT c_mktsegment,
       CAST(sum(early) AS BIGINT) AS n_early,
       CAST(sum(late) AS BIGINT) AS n_late,
       CAST(sum(early * late) AS BIGINT) AS n_both,
       round(sum(early * late) / CAST(count(*) AS DOUBLE), 4)
         AS jaccard_overlap,
       round(sum(early * late) / CAST(sum(early) AS DOUBLE), 4)
         AS early_retained_share
FROM per_cust GROUP BY c_mktsegment
"""

QUERIES["q_customer_overlap_segments"] = (
    q_customer_overlap_segments,
    Q_CUSTOMER_OVERLAP_SQL,
)


def q_seasonal_index_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical multiplicative monthly seasonal indices: each
    calendar month's mean daily revenue over the grand mean daily
    revenue — the 12-number deseasonalization table (divide a
    month's actuals by its index to compare across the year), the
    monthly companion of ``q_weekly_seasonality``'s dow profile.

    Cents-exact daily rollup, one bounded month aggregate against a
    broadcast grand mean.
    """
    orders = Catalog(spark, sf_dir).orders
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("day")
    ).agg(F.round(F.sum("o_totalprice") * 100).cast("long").alias("cents"))
    grand = daily.agg(F.avg(F.col("cents") / 100.0).alias("g"))
    return (
        daily.crossJoin(F.broadcast(grand))
        .groupBy(F.month("day").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            _R4(F.avg(F.col("cents") / 100.0), "mean_daily_revenue"),
            _R4(F.avg(F.col("cents") / 100.0) / F.max("g"), "seasonal_index"),
        )
    )


Q_SEASONAL_INDEX_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS cents
  FROM orders GROUP BY 1
), grand AS (SELECT avg(cents / 100.0) AS g FROM daily)
SELECT month(day) AS month, count(*) AS n_days,
       round(avg(cents / 100.0), 4) AS mean_daily_revenue,
       round(avg(cents / 100.0) / max(g), 4) AS seasonal_index
FROM daily CROSS JOIN grand
GROUP BY 1
"""

QUERIES["q_seasonal_index_monthly"] = (
    q_seasonal_index_monthly,
    Q_SEASONAL_INDEX_SQL,
)


def q_cold_start_ramp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assortment freshness: per introduction quarter, how many
    parts made their FIRST sale then, and what share of that
    quarter's revenue the debutants carried — the cold-start ramp
    that tells merchandising whether new listings actually sell or
    the catalog grows dead weight.

    One (part → first quarter) aggregate, one broadcast join back,
    one bounded quarter rollup; revenue in cents for exact shares.
    """
    li = Catalog(spark, sf_dir).lineitem.select(
        "l_partkey",
        F.concat(
            F.year("l_shipdate").cast("string"),
            F.lit("-Q"),
            F.quarter("l_shipdate").cast("string"),
        ).alias("q"),
        F.round(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100
        )
        .cast("long")
        .alias("cents"),
    )
    first_q = li.groupBy("l_partkey").agg(F.min("q").alias("intro_q"))
    j = li.join(F.broadcast(first_q), "l_partkey")
    per_q = j.groupBy("q").agg(
        F.sum("cents").alias("rev_cents"),
        F.sum(
            F.when(F.col("q") == F.col("intro_q"), F.col("cents")).otherwise(
                F.lit(0)
            )
        ).alias("new_cents"),
        F.countDistinct(
            F.when(F.col("q") == F.col("intro_q"), F.col("l_partkey"))
        ).alias("n_new_parts"),
    )
    return per_q.select(
        F.col("q").alias("quarter"),
        "n_new_parts",
        _R4(F.col("rev_cents") / 100.0, "revenue"),
        _R4(F.col("new_cents") / F.col("rev_cents"), "debut_revenue_share"),
    )


Q_COLD_START_SQL = """
WITH li AS (
  SELECT l_partkey,
         CAST(year(CAST(l_shipdate AS DATE)) AS VARCHAR) || '-Q'
           || CAST(quarter(CAST(l_shipdate AS DATE)) AS VARCHAR) AS q,
         CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
           AS cents
  FROM lineitem
), first_q AS (
  SELECT l_partkey, min(q) AS intro_q FROM li GROUP BY 1
)
SELECT li.q AS quarter,
       count(DISTINCT CASE WHEN li.q = f.intro_q THEN li.l_partkey END)
         AS n_new_parts,
       round(CAST(sum(li.cents) AS DOUBLE) / 100.0, 4) AS revenue,
       round(sum(CASE WHEN li.q = f.intro_q THEN li.cents ELSE 0 END)
             / CAST(sum(li.cents) AS DOUBLE), 4) AS debut_revenue_share
FROM li JOIN first_q f ON li.l_partkey = f.l_partkey
GROUP BY li.q
"""

QUERIES["q_cold_start_ramp"] = (q_cold_start_ramp, Q_COLD_START_SQL)


def q_weekend_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekend-vs-weekday ordering uplift per market segment: the
    mean daily revenue on weekend days over weekday days — the
    day-mix normalization (not raw totals: there are 2 weekend days
    to 5 weekdays, so totals always mislead) that staffing and promo
    calendars key off.

    One (segment, day) cents rollup, one bounded segment aggregate.
    """
    c = Catalog(spark, sf_dir)
    j = c.orders.join(
        F.broadcast(c.customer.select("c_custkey", "c_mktsegment")),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    daily = j.groupBy(
        "c_mktsegment", F.to_date("o_orderdate").alias("day")
    ).agg(F.round(F.sum("o_totalprice") * 100).cast("long").alias("cents"))
    is_we = F.dayofweek("day").isin(1, 7)  # Sun=1, Sat=7
    return daily.groupBy("c_mktsegment").agg(
        F.sum(is_we.cast("long")).alias("n_weekend_days"),
        F.sum((~is_we).cast("long")).alias("n_weekday_days"),
        _R4(
            F.avg(F.when(is_we, F.col("cents") / 100.0)), "mean_weekend_rev"
        ),
        _R4(
            F.avg(F.when(~is_we, F.col("cents") / 100.0)), "mean_weekday_rev"
        ),
        _R4(
            F.avg(F.when(is_we, F.col("cents") / 100.0))
            / F.avg(F.when(~is_we, F.col("cents") / 100.0)),
            "weekend_uplift",
        ),
    )


Q_WEEKEND_UPLIFT_SQL = """
WITH daily AS (
  SELECT c.c_mktsegment, CAST(o.o_orderdate AS DATE) AS day,
         CAST(round(sum(o.o_totalprice) * 100) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
)
SELECT c_mktsegment,
       CAST(sum(CASE WHEN dayofweek(day) IN (0, 6) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_weekend_days,
       CAST(sum(CASE WHEN dayofweek(day) IN (0, 6) THEN 0 ELSE 1 END)
            AS BIGINT) AS n_weekday_days,
       round(avg(CASE WHEN dayofweek(day) IN (0, 6)
                      THEN cents / 100.0 END), 4) AS mean_weekend_rev,
       round(avg(CASE WHEN dayofweek(day) IN (0, 6)
                      THEN NULL ELSE cents / 100.0 END), 4)
         AS mean_weekday_rev,
       round(avg(CASE WHEN dayofweek(day) IN (0, 6)
                      THEN cents / 100.0 END)
             / avg(CASE WHEN dayofweek(day) IN (0, 6)
                        THEN NULL ELSE cents / 100.0 END), 4)
         AS weekend_uplift
FROM daily GROUP BY c_mktsegment
"""

QUERIES["q_weekend_uplift"] = (q_weekend_uplift, Q_WEEKEND_UPLIFT_SQL)


def q_tax_discount_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Joint (tax band × discount band) pricing grid: line count,
    revenue, and effective take-home rate (1−discount)(1+tax) per
    cell — the margin-structure census that shows whether discounts
    cluster in low-tax cells (arbitrage smell) or spread uniformly.

    Row-local banding (2-point buckets), one bounded grid aggregate.
    """
    li = Catalog(spark, sf_dir).lineitem.select(
        (F.floor(F.col("l_tax") * 100 / 2) * 2).cast("int").alias("tax_pct"),
        (F.floor(F.col("l_discount") * 100 / 2) * 2)
        .cast("int")
        .alias("disc_pct"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        (
            (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
        ).alias("take_rate"),
    )
    return li.groupBy("tax_pct", "disc_pct").agg(
        F.count(F.lit(1)).alias("n_lines"),
        _R4(F.sum("rev"), "revenue"),
        _R4(F.avg("take_rate"), "mean_take_rate"),
    )


Q_TAX_DISCOUNT_GRID_SQL = """
SELECT CAST(floor(l_tax * 100 / 2) * 2 AS INTEGER) AS tax_pct,
       CAST(floor(l_discount * 100 / 2) * 2 AS INTEGER) AS disc_pct,
       count(*) AS n_lines,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       round(avg((1 - l_discount) * (1 + l_tax)), 4) AS mean_take_rate
FROM lineitem
GROUP BY 1, 2
"""

QUERIES["q_tax_discount_grid"] = (q_tax_discount_grid, Q_TAX_DISCOUNT_GRID_SQL)


def q_size_price_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does size drive price? Per-brand OLS of retail price on part
    size (slope, intercept, r²) — the catalog-pricing-structure scan
    that flags brands whose price ladder ignores the size attribute
    (r² ≈ 0: size is cosmetic there) vs size-priced lines.

    One regr_* aggregate over the bounded brand key — single pass.
    """
    p = Catalog(spark, sf_dir).part
    return p.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        _R4(F.regr_slope("p_retailprice", "p_size"), "price_per_size"),
        _R4(F.regr_intercept("p_retailprice", "p_size"), "base_price"),
        _R4(F.regr_r2("p_retailprice", "p_size"), "r2"),
    )


Q_SIZE_PRICE_SLOPE_SQL = """
SELECT p_brand, count(*) AS n_parts,
       round(regr_slope(p_retailprice, p_size), 4) AS price_per_size,
       round(regr_intercept(p_retailprice, p_size), 4) AS base_price,
       round(regr_r2(p_retailprice, p_size), 4) AS r2
FROM part GROUP BY p_brand
"""

QUERIES["q_size_price_slope"] = (q_size_price_slope, Q_SIZE_PRICE_SLOPE_SQL)


def q_supplier_balance_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier account-balance tier census per nation: negative /
    low / mid / high balance bands (fixed fences at 0 and the global
    P25/P75, broadcast) — the credit-exposure profile procurement
    reviews per sourcing region. Profile-then-filter: one quantile
    aggregate, one broadcast, one bounded (nation, tier) rollup —
    no window over suppliers.
    """
    c = Catalog(spark, sf_dir)
    s = c.supplier.join(
        F.broadcast(c.nation.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    fences = c.supplier.agg(
        F.percentile("s_acctbal", F.lit(0.25)).alias("p25"),
        F.percentile("s_acctbal", F.lit(0.75)).alias("p75"),
    )
    j = s.crossJoin(F.broadcast(fences))
    tier = (
        F.when(F.col("s_acctbal") < 0, "negative")
        .when(F.col("s_acctbal") < F.col("p25"), "low")
        .when(F.col("s_acctbal") < F.col("p75"), "mid")
        .otherwise("high")
    )
    return j.groupBy(F.col("n_name").alias("nation"), tier.alias("tier")).agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        _R4(F.avg("s_acctbal"), "mean_balance"),
    )


Q_SUPPLIER_TIERS_SQL = """
WITH fences AS (
  SELECT quantile_cont(s_acctbal, 0.25) AS p25,
         quantile_cont(s_acctbal, 0.75) AS p75
  FROM supplier
)
SELECT n.n_name AS nation,
       CASE WHEN s.s_acctbal < 0 THEN 'negative'
            WHEN s.s_acctbal < f.p25 THEN 'low'
            WHEN s.s_acctbal < f.p75 THEN 'mid'
            ELSE 'high' END AS tier,
       count(*) AS n_suppliers,
       round(avg(s.s_acctbal), 4) AS mean_balance
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
CROSS JOIN fences f
GROUP BY 1, 2
"""

QUERIES["q_supplier_balance_tiers"] = (
    q_supplier_balance_tiers,
    Q_SUPPLIER_TIERS_SQL,
)


def q_linenumber_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-in-order effect: per line number (1st, 2nd, … line
    of an order), the line count, mean quantity, and mean line
    revenue — do orders front-load their big items? The order-entry
    behavioral profile (and a free sanity check that linenumbers are
    dense from 1). One bounded linenumber aggregate, single pass.
    """
    li = Catalog(spark, sf_dir).lineitem
    return li.groupBy(F.col("l_linenumber").alias("linenumber")).agg(
        F.count(F.lit(1)).alias("n_lines"),
        _R4(F.avg("l_quantity"), "mean_qty"),
        _R4(
            F.avg(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
            "mean_line_revenue",
        ),
    )


Q_LINENUMBER_PROFILE_SQL = """
SELECT l_linenumber AS linenumber, count(*) AS n_lines,
       round(avg(l_quantity), 4) AS mean_qty,
       round(avg(l_extendedprice * (1 - l_discount)), 4)
         AS mean_line_revenue
FROM lineitem GROUP BY 1
"""

QUERIES["q_linenumber_profile"] = (
    q_linenumber_profile,
    Q_LINENUMBER_PROFILE_SQL,
)


def q_part_name_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 tokens in part names with the revenue each token's
    parts carry — catalog-attribute text analytics (which descriptor
    words sell) built the scale-safe way: token explode over the
    part DIM, revenue joined from the part-grain rollup, distributed
    top-k (TakeOrderedAndProject), rank re-derived on 15 rows.
    """
    c = Catalog(spark, sf_dir)
    rev = c.lineitem.groupBy("l_partkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100
        )
        .cast("long")
        .alias("cents")
    )
    toks = c.part.select(
        "p_partkey", F.explode(F.split(F.trim("p_name"), r"\s+")).alias("w")
    ).distinct()
    per_w = (
        toks.join(rev, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("w")
        .agg(
            F.countDistinct("p_partkey").alias("n_parts"),
            F.sum("cents").alias("cents"),
        )
    )
    order = [F.desc("cents"), F.asc("w")]
    return (
        per_w.orderBy(*order)
        .limit(15)
        .withColumn("rank", F.row_number().over(Window.orderBy(*order)))
        .select(
            "rank",
            F.col("w").alias("token"),
            "n_parts",
            _R4(F.col("cents") / 100.0, "revenue"),
        )
    )


Q_PART_NAME_TOKENS_SQL = r"""
WITH rev AS (
  SELECT l_partkey,
         CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)
           AS cents
  FROM lineitem GROUP BY 1
), toks AS (
  SELECT DISTINCT p_partkey, unnest(string_split_regex(trim(p_name), '\s+'))
           AS w
  FROM part
), per_w AS (
  SELECT w, count(DISTINCT t.p_partkey) AS n_parts, sum(r.cents) AS cents
  FROM toks t JOIN rev r ON t.p_partkey = r.l_partkey
  GROUP BY w
)
SELECT CAST(row_number() OVER (ORDER BY cents DESC, w ASC) AS INTEGER)
         AS rank,
       w AS token, n_parts,
       round(CAST(cents AS DOUBLE) / 100.0, 4) AS revenue
FROM per_w ORDER BY rank LIMIT 15
"""

QUERIES["q_part_name_tokens"] = (q_part_name_tokens, Q_PART_NAME_TOKENS_SQL)


def q_return_rate_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return exposure per brand: the share of lines flagged
    returned ('R') and the revenue they carried — the product-risk
    screen that ranks which catalog lines bleed margin through
    returns. One broadcast dim join + one bounded brand aggregate.
    """
    c = Catalog(spark, sf_dir)
    li = c.lineitem.join(
        F.broadcast(c.part.select("p_partkey", "p_brand")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    is_r = (F.col("l_returnflag") == "R").cast("long")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(is_r).alias("n_returned"),
        _R4(F.avg(is_r.cast("double")), "return_rate"),
        _R4(F.sum(F.when(is_r == 1, rev).otherwise(0.0)), "returned_revenue"),
        _R4(
            F.sum(F.when(is_r == 1, rev).otherwise(0.0)) / F.sum(rev),
            "revenue_at_risk_share",
        ),
    )


Q_RETURN_RATE_SQL = """
SELECT p.p_brand, count(*) AS n_lines,
       CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_returned,
       round(avg(CASE WHEN l.l_returnflag = 'R' THEN 1.0 ELSE 0.0 END), 4)
         AS return_rate,
       round(sum(CASE WHEN l.l_returnflag = 'R'
                      THEN l.l_extendedprice * (1 - l.l_discount)
                      ELSE 0.0 END), 4) AS returned_revenue,
       round(sum(CASE WHEN l.l_returnflag = 'R'
                      THEN l.l_extendedprice * (1 - l.l_discount)
                      ELSE 0.0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 4)
         AS revenue_at_risk_share
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
"""

QUERIES["q_return_rate_by_brand"] = (
    q_return_rate_by_brand,
    Q_RETURN_RATE_SQL,
)


def q_discount_uptake_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount penetration per market segment: the share of lines
    sold at ANY discount, the mean depth where discounted, and the
    revenue given up — who actually gets the promo budget. One
    orders→lineitem join rolled through a broadcast customer dim,
    one bounded segment aggregate.
    """
    c = Catalog(spark, sf_dir)
    j = (
        c.lineitem.join(
            c.orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(c.customer.select("c_custkey", "c_mktsegment")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    disc = (F.col("l_discount") > 0).cast("long")
    giveup = F.col("l_extendedprice") * F.col("l_discount")
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_lines"),
        _R4(F.avg(disc.cast("double")), "discounted_share"),
        _R4(
            F.avg(F.when(disc == 1, F.col("l_discount"))), "mean_depth"
        ),
        _R4(F.sum(giveup), "discount_given"),
    )


Q_DISCOUNT_UPTAKE_SQL = """
SELECT c.c_mktsegment, count(*) AS n_lines,
       round(avg(CASE WHEN l.l_discount > 0 THEN 1.0 ELSE 0.0 END), 4)
         AS discounted_share,
       round(avg(CASE WHEN l.l_discount > 0 THEN l.l_discount END), 4)
         AS mean_depth,
       round(sum(l.l_extendedprice * l.l_discount), 4) AS discount_given
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""

QUERIES["q_discount_uptake_by_segment"] = (
    q_discount_uptake_by_segment,
    Q_DISCOUNT_UPTAKE_SQL,
)


def q_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto-frontier query (Börzsönyi et al., ICDE 2001)
    over parts: minimize retail price, maximize size — every part no
    other part beats on both axes. The classic multi-objective
    operator warehouses fake with k separate top-Ns.

    Scale-safe 2-D skyline WITHOUT the naive O(n²) dominance
    self-join: prices go cents-exact, one groupBy collapses to the
    distinct-price grain, and dominance reduces to two prefix maxes
    over price order — the inclusive running max (any ≤-price part
    with strictly larger size dominates) and the exclusive one (any
    <-price part with ≥ size dominates) — computed with the
    ranged-ledger primitives (running_max_longs + ranged_lag), so
    there is no Exchange SinglePartition even when the distinct-
    price domain is millions of rows. One shuffle + two P-row
    ledgers + a broadcast-sized join back.
    """
    from etl_gov_spark.operators.ranks import ranged_global_rank, ranged_lag

    p = Catalog(spark, sf_dir).part.select(
        "p_partkey",
        "p_brand",
        "p_size",
        F.round(F.col("p_retailprice"), 2).alias("price"),
        F.round(F.col("p_retailprice") * 100).cast("long").alias("cents"),
    )
    g = p.groupBy("cents").agg(F.max("p_size").cast("long").alias("gmax"))
    incl = ranged_global_rank(
        g,
        [F.asc("cents")],
        rank_col=None,
        running_max_longs={"b": "gmax"},
    )
    both = ranged_lag(
        incl.select("cents", "b"), [F.asc("cents")], {"a": "b"}
    )
    _LONG_MIN = -(2**63)
    return (
        p.join(F.broadcast(both), "cents")
        .filter(
            (F.coalesce(F.col("a"), F.lit(_LONG_MIN)) < F.col("p_size"))
            & (F.col("b") <= F.col("p_size"))
        )
        .select("p_partkey", "p_brand", "price", F.col("p_size").alias("size"))
        .orderBy("price", "p_partkey")
    )


Q_SKYLINE_SQL = """
WITH p AS (
  SELECT p_partkey, p_brand, p_size,
         round(p_retailprice, 2) AS price,
         CAST(round(p_retailprice * 100) AS BIGINT) AS cents
  FROM part
), g AS (
  SELECT cents, CAST(max(p_size) AS BIGINT) AS gmax FROM p GROUP BY cents
), w AS (
  SELECT cents,
         max(gmax) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS b,
         max(gmax) OVER (ORDER BY cents
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS a
  FROM g
)
SELECT p.p_partkey, p.p_brand, p.price, p.p_size AS size
FROM p JOIN w USING (cents)
WHERE coalesce(a, -9223372036854775807 - 1) < p.p_size AND b <= p.p_size
ORDER BY p.price, p.p_partkey
"""

QUERIES["q_skyline_parts"] = (q_skyline_parts, Q_SKYLINE_SQL)
