"""Forensic / audit analytics (SURVEY.md §2.A extension) — the
statistical audits a government-data platform runs over money
columns: Benford first-digit conformance, Gini concentration, and
Pareto top-share. All single-agg or bounded-window plans.
Reference parity: extends the warehouse-SQL stage the reference runs
via ``dags/sql/sample.sql`` (SQLExecuteQueryOperator) with the audit
queries a gov spend-transparency platform ships.

Scale notes
- Benford is one conditional-agg scan (digit extraction is regexp
  codegen on a decimal-cast string — arithmetic log10/floor digit
  extraction is NOT portable across engines near powers of ten).
- Gini sorts only within nation (bounded partitions), never
  globally; the rank-weighted sum aggregates per nation.
- Pareto avoids the global sort entirely: the revenue threshold is
  an exact interpolated percentile (one aggregate), membership is a
  codegen predicate — the two-pass profile-then-filter shape that
  scales to any customer count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_gov_spark.io.sources import Catalog

_R4 = lambda c, n: F.round(c, 4).alias(n)  # noqa: E731

import math

_BENFORD = {d: math.log10(1 + 1 / d) for d in range(1, 10)}


def q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals vs the
    Benford expectation — the classic fabricated-figures screen.
    Digit extraction: first [1-9] of the decimal-cast string (both
    engines print decimals in fixed notation)."""
    orders = Catalog(spark, sf_dir).orders
    digit = F.regexp_extract(
        F.col("o_totalprice").cast("decimal(18,4)").cast("string"), "[1-9]", 0
    ).cast("int")
    per = (
        orders.select(digit.alias("digit"))
        .filter(F.col("digit").isNotNull())
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = per.agg(F.sum("n").alias("total"))
    benford = F.array(*[F.lit(_BENFORD[d]) for d in range(1, 10)])
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            _R4(F.col("n") / F.col("total"), "observed_frac"),
            _R4(F.element_at(benford, F.col("digit")), "benford_frac"),
            _R4(
                F.col("n") / F.col("total") - F.element_at(benford, F.col("digit")),
                "deviation",
            ),
        )
    )


_BENFORD_SQL_ARR = (
    "CAST([" + ", ".join(repr(_BENFORD[d]) for d in range(1, 10)) + "] AS DOUBLE[])"
)

Q_BENFORD_SQL = f"""
WITH per AS (
  SELECT digit, count(*) AS n
  FROM (
    SELECT CAST(regexp_extract(CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS VARCHAR), '[1-9]') AS INTEGER) AS digit
    FROM orders
  )
  WHERE digit IS NOT NULL
  GROUP BY 1
), tot AS (SELECT sum(n) AS total FROM per)
SELECT digit, n,
       round(n / CAST(total AS DOUBLE), 4) AS observed_frac,
       round(({_BENFORD_SQL_ARR})[digit], 4) AS benford_frac,
       round(n / CAST(total AS DOUBLE) - ({_BENFORD_SQL_ARR})[digit], 4) AS deviation
FROM per CROSS JOIN tot
"""


def q_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue within each nation —
    how concentrated is spend among a nation's customers.

    Rank-weighted formulation G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over
    revenues sorted ascending within nation (deterministic tie-break
    on custkey). The sort is per-nation (bounded), the rest is one
    aggregate."""
    cat = Catalog(spark, sf_dir)
    rev = (
        cat.orders.groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("rev"))
        .join(cat.customer.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cat.nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "o_custkey", "rev")
    )
    w = Window.partitionBy("n_name").orderBy(F.asc("rev"), F.asc("o_custkey"))
    ranked = rev.withColumn("i", F.row_number().over(w))
    return (
        ranked.groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("rev").alias("_s"),
            F.sum(F.col("i") * F.col("rev")).alias("_si"),
        )
        .select(
            "n_name",
            "n_customers",
            _R4(F.col("_s"), "total_revenue"),
            _R4(
                2.0 * F.col("_si") / (F.col("n_customers") * F.col("_s"))
                - (F.col("n_customers") + 1) / F.col("n_customers").cast("double"),
                "gini",
            ),
        )
    )


Q_GINI_SQL = """
WITH rev AS (
  SELECT n.n_name, o.o_custkey, sum(o.o_totalprice) AS rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
), ranked AS (
  SELECT n_name, rev,
         row_number() OVER (PARTITION BY n_name ORDER BY rev ASC, o_custkey ASC) AS i
  FROM rev
)
SELECT n_name,
       count(*) AS n_customers,
       round(sum(rev), 4) AS total_revenue,
       round(2.0 * sum(i * rev) / (count(*) * sum(rev))
             - (count(*) + 1) / CAST(count(*) AS DOUBLE), 4) AS gini
FROM ranked
GROUP BY n_name
"""


def q_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue share of the top-1% / top-10% customers (the
    "80/20" audit). No global sort: thresholds are interpolated
    percentiles from ONE aggregate, membership is a predicate —
    profile-then-filter, both passes full scans that shard freely."""
    orders = Catalog(spark, sf_dir).orders
    rev = orders.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("rev"))
    thr = rev.agg(
        F.expr("percentile(rev, 0.99)").alias("p99"),
        F.expr("percentile(rev, 0.90)").alias("p90"),
    )
    return (
        rev.crossJoin(F.broadcast(thr))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _R4(F.sum("rev"), "total_revenue"),
            _R4(
                F.sum(F.when(F.col("rev") >= F.col("p99"), F.col("rev")).otherwise(0.0))
                / F.sum("rev"),
                "share_top1pct",
            ),
            _R4(
                F.sum(F.when(F.col("rev") >= F.col("p90"), F.col("rev")).otherwise(0.0))
                / F.sum("rev"),
                "share_top10pct",
            ),
        )
    )


Q_PARETO_SQL = """
WITH rev AS (
  SELECT o_custkey, sum(o_totalprice) AS rev FROM orders GROUP BY 1
), thr AS (
  SELECT quantile_cont(rev, 0.99) AS p99, quantile_cont(rev, 0.90) AS p90 FROM rev
)
SELECT count(*) AS n_customers,
       round(sum(rev), 4) AS total_revenue,
       round(sum(CASE WHEN rev >= p99 THEN rev ELSE 0.0 END) / sum(rev), 4) AS share_top1pct,
       round(sum(CASE WHEN rev >= p90 THEN rev ELSE 0.0 END) / sum(rev), 4) AS share_top10pct
FROM rev CROSS JOIN thr
"""


QUERIES: dict[str, tuple] = {
    "q_benford_digits": (q_benford_digits, Q_BENFORD_SQL),
    "q_gini_concentration": (q_gini_concentration, Q_GINI_SQL),
    "q_pareto_share": (q_pareto_share, Q_PARETO_SQL),
}


def q_chi2_segment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence screen: is order priority distributed
    independently of customer market segment? Contingency counts in
    one groupBy; expected counts from broadcast marginals; the
    statistic is a single algebraic aggregate. Output is every cell
    with its contribution so the analyst sees WHERE the dependence
    lives, plus the total statistic and df carried on each row."""
    cat = Catalog(spark, sf_dir)
    j = cat.orders.join(
        cat.customer.select("c_custkey", "c_mktsegment"),
        F.col("o_custkey") == F.col("c_custkey"),
    ).select("c_mktsegment", "o_orderpriority")
    # Materialize the contingency table once: every marginal, the
    # statistic, and the df all derive from these ≤ segments×priorities
    # rows. Without the checkpoint the orders⋈customer fact join is
    # re-derived for each branch (6 scans at scale); with it the fact
    # join runs exactly once.
    cells = (
        j.groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("observed"))
        .coalesce(1)  # ≤ segments×priorities rows: single partition
        .localCheckpoint()
    )
    row_m = cells.groupBy("c_mktsegment").agg(F.sum("observed").alias("row_n"))
    col_m = cells.groupBy("o_orderpriority").agg(F.sum("observed").alias("col_n"))
    tot = cells.agg(F.sum("observed").alias("n"))
    scored = (
        cells.join(F.broadcast(row_m), "c_mktsegment")
        .join(F.broadcast(col_m), "o_orderpriority")
        .crossJoin(F.broadcast(tot))
        .withColumn("expected", F.col("row_n") * F.col("col_n") / F.col("n"))
        .withColumn(
            "contrib",
            (F.col("observed") - F.col("expected")) ** 2 / F.col("expected"),
        )
    )
    stat = scored.agg(F.round(F.sum("contrib"), 4).alias("chi2_total"))
    deg = cells.agg(
        (
            (F.countDistinct("c_mktsegment") - 1)
            * (F.countDistinct("o_orderpriority") - 1)
        ).alias("df")
    )
    return (
        scored.select(
            "c_mktsegment",
            "o_orderpriority",
            "observed",
            _R4(F.col("expected"), "expected"),
            _R4(F.col("contrib"), "chi2_contrib"),
        )
        .crossJoin(F.broadcast(stat))
        .crossJoin(F.broadcast(deg))
    )


Q_CHI2_SQL = """
WITH cells AS (
  SELECT c_mktsegment, o_orderpriority, count(*) AS observed
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
), rm AS (SELECT c_mktsegment, sum(observed) AS row_n FROM cells GROUP BY 1),
cm AS (SELECT o_orderpriority, sum(observed) AS col_n FROM cells GROUP BY 1),
t AS (SELECT sum(observed) AS n FROM cells),
scored AS (
  SELECT c.c_mktsegment, c.o_orderpriority, c.observed,
         rm.row_n * cm.col_n / CAST(t.n AS DOUBLE) AS expected,
         pow(c.observed - rm.row_n * cm.col_n / CAST(t.n AS DOUBLE), 2)
           / (rm.row_n * cm.col_n / CAST(t.n AS DOUBLE)) AS contrib
  FROM cells c JOIN rm USING (c_mktsegment) JOIN cm USING (o_orderpriority) CROSS JOIN t
), s AS (SELECT round(sum(contrib), 4) AS chi2_total FROM scored),
d AS (
  SELECT (count(DISTINCT c_mktsegment) - 1)
         * (count(DISTINCT o_orderpriority) - 1) AS df
  FROM cells
)
SELECT c_mktsegment, o_orderpriority, observed,
       round(expected, 4) AS expected,
       round(contrib, 4) AS chi2_contrib,
       chi2_total, df
FROM scored CROSS JOIN s CROSS JOIN d
"""

QUERIES["q_chi2_segment_priority"] = (q_chi2_segment_priority, Q_CHI2_SQL)


def q_weekly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality profile of order volume: per-dow mean
    daily count, its index vs the overall mean (1.0 = no effect) —
    the calendar-shape diagnostic behind staffing and anomaly
    baselines. Two bounded aggregates (daily, then dow)."""
    orders = Catalog(spark, sf_dir).orders
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    dow = daily.groupBy(F.weekday("day").alias("dow")).agg(
        F.avg("n").alias("_m"), F.count(F.lit(1)).alias("n_days")
    )
    overall = daily.agg(F.avg("n").alias("_g"))
    return (
        dow.crossJoin(F.broadcast(overall))
        .select(
            "dow",
            "n_days",
            _R4(F.col("_m"), "mean_daily_orders"),
            _R4(F.col("_m") / F.col("_g"), "seasonal_index"),
        )
    )


Q_WEEKLY_SEASONALITY_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n FROM orders GROUP BY 1
), dow AS (
  SELECT isodow(day) - 1 AS dow, avg(n) AS m, count(*) AS n_days FROM daily GROUP BY 1
), g AS (SELECT avg(n) AS g FROM daily)
SELECT CAST(dow AS INTEGER) AS dow, n_days,
       round(m, 4) AS mean_daily_orders,
       round(m / g, 4) AS seasonal_index
FROM dow CROSS JOIN g
"""

QUERIES["q_weekly_seasonality"] = (q_weekly_seasonality, Q_WEEKLY_SEASONALITY_SQL)


def dq_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment screen: identical (customer, amount, date)
    tuples appearing more than once — the first query every spend
    auditor runs. One hash groupBy on the composite key; the
    duplicate groups (tiny) carry their order-id lists for the case
    file."""
    orders = Catalog(spark, sf_dir).orders
    return (
        orders.groupBy(
            "o_custkey",
            F.col("o_totalprice").alias("amount"),
            F.to_date("o_orderdate").alias("order_day"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_payments"),
            F.array_join(
                F.array_sort(F.collect_list(F.col("o_orderkey").cast("string"))), ","
            ).alias("order_ids"),
        )
        .filter(F.col("n_payments") > 1)
        .select(
            "o_custkey",
            _R4(F.col("amount"), "amount"),
            "order_day",
            "n_payments",
            "order_ids",
        )
    )


DQ_DUPLICATE_PAYMENTS_SQL = """
SELECT o_custkey,
       round(o_totalprice, 4) AS amount,
       CAST(o_orderdate AS DATE) AS order_day,
       count(*) AS n_payments,
       array_to_string(list_sort(list(CAST(o_orderkey AS VARCHAR))), ',') AS order_ids
FROM orders
GROUP BY o_custkey, o_totalprice, CAST(o_orderdate AS DATE)
HAVING count(*) > 1
"""

QUERIES["dq_duplicate_payments"] = (dq_duplicate_payments, DQ_DUPLICATE_PAYMENTS_SQL)

_STRUCT_THRESHOLD = 300_000.0  # reporting threshold


def q_structuring_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structuring ("smurfing") screen: customers whose order
    amounts cluster just under a reporting threshold. Per customer:
    orders in the 90-100% band vs at-or-over, and the band share —
    flag when ≥3 near-threshold orders and more near than over.
    Single conditional-aggregation pass over orders."""
    orders = Catalog(spark, sf_dir).orders
    near = (F.col("o_totalprice") >= 0.9 * _STRUCT_THRESHOLD) & (
        F.col("o_totalprice") < _STRUCT_THRESHOLD
    )
    over = F.col("o_totalprice") >= _STRUCT_THRESHOLD
    per = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(near.cast("int")).alias("n_near_threshold"),
        F.sum(over.cast("int")).alias("n_at_or_over"),
    )
    return (
        per.filter(
            (F.col("n_near_threshold") >= 3)
            & (F.col("n_near_threshold") > F.col("n_at_or_over"))
        )
        .select(
            "o_custkey",
            "n_orders",
            "n_near_threshold",
            "n_at_or_over",
            _R4(F.col("n_near_threshold") / F.col("n_orders"), "near_share"),
        )
    )


Q_STRUCTURING_SQL = f"""
SELECT o_custkey, n_orders, n_near_threshold, n_at_or_over,
       round(n_near_threshold / CAST(n_orders AS DOUBLE), 4) AS near_share
FROM (
  SELECT o_custkey, count(*) AS n_orders,
         CAST(sum(CASE WHEN o_totalprice >= 0.9 * {_STRUCT_THRESHOLD}
                   AND o_totalprice < {_STRUCT_THRESHOLD} THEN 1 ELSE 0 END) AS BIGINT) AS n_near_threshold,
         CAST(sum(CASE WHEN o_totalprice >= {_STRUCT_THRESHOLD} THEN 1 ELSE 0 END) AS BIGINT) AS n_at_or_over
  FROM orders GROUP BY o_custkey
)
WHERE n_near_threshold >= 3 AND n_near_threshold > n_at_or_over
"""

QUERIES["q_structuring_screen"] = (q_structuring_screen, Q_STRUCTURING_SQL)


def q_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve in deciles: cumulative share of total revenue
    held by the bottom 10%, 20%, … of customers — the curve behind
    the Gini number, reportable as ten rows. Exact ntile deciles via
    ``ranged_global_rank`` (parallel range sort, no single-partition
    stage) + a bounded cumulative window over the 10 rows."""
    from etl_gov_spark.operators.ranks import ranged_global_rank

    orders = Catalog(spark, sf_dir).orders
    rev = orders.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("rev"))
    deciled = ranged_global_rank(
        rev,
        [F.asc("rev"), F.asc("o_custkey")],
        rank_col=None,
        ntiles={"decile": 10},
    )
    per = deciled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"), F.sum("rev").alias("_d_rev")
    )
    tot = per.agg(F.sum("_d_rev").alias("_t"))
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per.crossJoin(F.broadcast(tot))
        .withColumn("_cum", F.sum("_d_rev").over(wc))
        .select(
            "decile",
            "n_customers",
            _R4(F.col("_d_rev") / F.col("_t"), "decile_share"),
            _R4(F.col("_cum") / F.col("_t"), "cum_share"),
        )
    )


Q_LORENZ_SQL = """
WITH rev AS (
  SELECT o_custkey, sum(o_totalprice) AS rev FROM orders GROUP BY 1
), deciled AS (
  SELECT rev, CAST(ntile(10) OVER (ORDER BY rev ASC, o_custkey ASC) AS INTEGER) AS decile
  FROM rev
), per AS (
  SELECT decile, count(*) AS n_customers, sum(rev) AS d_rev FROM deciled GROUP BY 1
), t AS (SELECT sum(d_rev) AS t FROM per)
SELECT decile, n_customers,
       round(d_rev / t, 4) AS decile_share,
       round(sum(d_rev) OVER (ORDER BY decile
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / t, 4) AS cum_share
FROM per CROSS JOIN t
"""

QUERIES["q_lorenz_deciles"] = (q_lorenz_deciles, Q_LORENZ_SQL)


def q_hhi_supplier_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman index of supplier concentration per part
    brand — the antitrust screen (HHI = Σ share², ×10000; >2500 is
    'highly concentrated'). Supplier revenue shares within brand
    come from one join + two bounded aggregates."""
    cat = Catalog(spark, sf_dir)
    rev = (
        cat.lineitem.join(
            F.broadcast(cat.part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "l_suppkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
        )
    )
    brand_tot = rev.groupBy("p_brand").agg(
        F.sum("rev").alias("_t"), F.count(F.lit(1)).alias("n_suppliers")
    )
    return (
        rev.join(F.broadcast(brand_tot), "p_brand")
        .groupBy("p_brand")
        .agg(
            F.first("n_suppliers").alias("n_suppliers"),
            _R4(
                F.sum((F.col("rev") / F.col("_t")) ** 2) * 10000.0, "hhi"
            ),
        )
        .withColumn("highly_concentrated", (F.col("hhi") > 2500.0).cast("int"))
    )


Q_HHI_SQL = """
WITH rev AS (
  SELECT p_brand, l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
), t AS (
  SELECT p_brand, sum(rev) AS t, count(*) AS n_suppliers FROM rev GROUP BY 1
)
SELECT r.p_brand,
       min(t.n_suppliers) AS n_suppliers,
       round(sum(pow(r.rev / t.t, 2)) * 10000.0, 4) AS hhi,
       CASE WHEN round(sum(pow(r.rev / t.t, 2)) * 10000.0, 4) > 2500.0
            THEN 1 ELSE 0 END AS highly_concentrated
FROM rev r JOIN t USING (p_brand)
GROUP BY r.p_brand
"""

QUERIES["q_hhi_supplier_concentration"] = (
    q_hhi_supplier_concentration,
    Q_HHI_SQL,
)


def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint screen on the daily order-volume series:
    cumulative sum of mean-deviations peaks at the most likely level
    shift. Output: top-5 candidate change days by |CUSUM|, with the
    before/after means for the winning split. Sequential analysis
    as pure window algebra over the (bounded) daily series."""
    orders = Catalog(spark, sf_dir).orders
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    stats = daily.agg(
        F.avg("n").alias("mu"), F.count(F.lit(1)).alias("n_days")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cusum = (
        daily.crossJoin(F.broadcast(stats))
        .withColumn("cusum", F.sum(F.col("n") - F.col("mu")).over(w))
        .withColumn("rank_in", F.row_number().over(Window.orderBy("day")))
    )
    wr = Window.orderBy(F.desc(F.abs(F.col("cusum"))), F.asc("day"))
    return (
        cusum.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= 5)
        .select(
            "day",
            "n",
            _R4(F.col("cusum"), "cusum"),
            _R4(F.col("mu"), "series_mean"),
            "rank",
        )
    )


Q_CUSUM_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n FROM orders GROUP BY 1
), s AS (SELECT avg(n) AS mu FROM daily),
c AS (
  SELECT day, n, mu,
         sum(n - mu) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
  FROM daily CROSS JOIN s
)
SELECT day, n, round(cusum, 4) AS cusum, round(mu, 4) AS series_mean, rank
FROM (
  SELECT *, CAST(row_number() OVER (ORDER BY abs(cusum) DESC, day ASC) AS INTEGER) AS rank
  FROM c
)
WHERE rank <= 5
"""

QUERIES["q_cusum_changepoint"] = (q_cusum_changepoint, Q_CUSUM_SQL)


def q_round_number_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-number bias screen (Benford's companion): human-chosen
    figures over-represent round amounts. Shares of order totals
    that are whole dollars / multiples of 100 / of 1000, per order
    priority — one conditional-aggregation scan; a uniform digit
    process predicts ~1%, 0.01%, 0.001%."""
    orders = Catalog(spark, sf_dir).orders
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    whole = (cents % 100 == 0).cast("int")
    h100 = (cents % 10000 == 0).cast("int")
    h1000 = (cents % 100000 == 0).cast("int")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _R4(F.avg(whole), "frac_whole_dollar"),
        _R4(F.avg(h100), "frac_mult_100"),
        _R4(F.avg(h1000), "frac_mult_1000"),
    )


Q_ROUND_NUMBER_SQL = """
SELECT o_orderpriority, count(*) AS n_orders,
       round(avg(CASE WHEN CAST(round(o_totalprice * 100) AS BIGINT) % 100 = 0 THEN 1 ELSE 0 END), 4) AS frac_whole_dollar,
       round(avg(CASE WHEN CAST(round(o_totalprice * 100) AS BIGINT) % 10000 = 0 THEN 1 ELSE 0 END), 4) AS frac_mult_100,
       round(avg(CASE WHEN CAST(round(o_totalprice * 100) AS BIGINT) % 100000 = 0 THEN 1 ELSE 0 END), 4) AS frac_mult_1000
FROM orders
GROUP BY o_orderpriority
"""

QUERIES["q_round_number_bias"] = (q_round_number_bias, Q_ROUND_NUMBER_SQL)


def q_single_source_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-chain concentration audit: per brand, how many parts
    depend on exactly one supplier (single-sourced — the procurement
    risk register), with the average supplier fan-out. Two bounded
    aggregates over the distinct (part, supplier) edge set."""
    li = Catalog(spark, sf_dir).lineitem.select("l_partkey", "l_suppkey").distinct()
    fan = li.groupBy("l_partkey").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers")
    )
    parts = Catalog(spark, sf_dir).part.select("p_partkey", "p_brand")
    return (
        fan.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum((F.col("n_suppliers") == 1).cast("int")).alias("n_single_sourced"),
            _R4(F.avg("n_suppliers"), "avg_suppliers_per_part"),
            _R4(
                F.sum((F.col("n_suppliers") == 1).cast("int"))
                / F.count(F.lit(1)),
                "single_source_rate",
            ),
        )
    )


Q_SINGLE_SOURCE_SQL = """
WITH fan AS (
  SELECT l_partkey, count(DISTINCT l_suppkey) AS n_suppliers
  FROM lineitem GROUP BY 1
)
SELECT p_brand,
       count(*) AS n_parts,
       CAST(sum(CASE WHEN n_suppliers = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_single_sourced,
       round(avg(n_suppliers), 4) AS avg_suppliers_per_part,
       round(sum(CASE WHEN n_suppliers = 1 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 4) AS single_source_rate
FROM fan JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""

QUERIES["q_single_source_risk"] = (q_single_source_risk, Q_SINGLE_SOURCE_SQL)


def q_benford_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row Benford conformity verdict: mean absolute deviation
    of observed first-digit fractions from the Benford expectation,
    banded by the Nigrini thresholds (<0.006 close, <0.012
    acceptable, <0.015 marginal, else nonconforming)."""
    orders = Catalog(spark, sf_dir).orders
    digit = F.regexp_extract(
        F.col("o_totalprice").cast("decimal(18,4)").cast("string"), "[1-9]", 0
    ).cast("int")
    per = (
        orders.select(digit.alias("digit"))
        .filter(F.col("digit").isNotNull())
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = per.agg(F.sum("n").alias("total"))
    benford = F.array(*[F.lit(_BENFORD[d]) for d in range(1, 10)])
    dev = F.abs(F.col("n") / F.col("total") - F.element_at(benford, F.col("digit")))
    mad = (
        per.crossJoin(F.broadcast(tot))
        .agg((F.sum(dev) / 9.0).alias("_mad"), F.first("total").alias("n_amounts"))
    )
    verdict = (
        F.when(F.col("_mad") < 0.006, "close")
        .when(F.col("_mad") < 0.012, "acceptable")
        .when(F.col("_mad") < 0.015, "marginal")
        .otherwise("nonconforming")
    )
    return mad.select("n_amounts", _R4(F.col("_mad"), "mad"), verdict.alias("verdict"))


Q_BENFORD_VERDICT_SQL = f"""
WITH per AS (
  SELECT digit, count(*) AS n
  FROM (
    SELECT CAST(regexp_extract(CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS VARCHAR), '[1-9]') AS INTEGER) AS digit
    FROM orders
  )
  WHERE digit IS NOT NULL
  GROUP BY 1
), tot AS (SELECT sum(n) AS total FROM per),
m AS (
  SELECT CAST(min(total) AS BIGINT) AS n_amounts,
         sum(abs(n / CAST(total AS DOUBLE) - ({_BENFORD_SQL_ARR})[digit])) / 9.0 AS mad
  FROM per CROSS JOIN tot
)
SELECT n_amounts, round(mad, 4) AS mad,
       CASE WHEN mad < 0.006 THEN 'close'
            WHEN mad < 0.012 THEN 'acceptable'
            WHEN mad < 0.015 THEN 'marginal'
            ELSE 'nonconforming' END AS verdict
FROM m
"""

QUERIES["q_benford_verdict"] = (q_benford_verdict, Q_BENFORD_VERDICT_SQL)


def q_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Procurement price-dispersion audit: parts bought at widely
    varying unit prices (coefficient of variation of
    extendedprice/quantity) — the "same part, different price"
    screen. Top-20 most dispersed parts with ≥5 purchases; one
    grouped aggregate + a distributed top-k (orderBy+limit plans
    TakeOrderedAndProject — per-partition k then driver merge, never
    a one-task sort of all parts) with rank re-derived on 20 rows."""
    li = Catalog(spark, sf_dir).lineitem.select(
        "l_partkey", (F.col("l_extendedprice") / F.col("l_quantity")).alias("up")
    )
    per = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_buys"),
        F.avg("up").alias("_mean"),
        F.stddev_samp("up").alias("_sd"),
    ).filter(F.col("n_buys") >= 5)
    order = [F.desc(F.col("_sd") / F.col("_mean")), F.asc("l_partkey")]
    return (
        per.orderBy(*order)
        .limit(20)
        .withColumn("rank", F.row_number().over(Window.orderBy(*order)))
        .select(
            "l_partkey",
            "n_buys",
            _R4(F.col("_mean"), "mean_unit_price"),
            _R4(F.col("_sd") / F.col("_mean"), "cv"),
            "rank",
        )
    )


Q_PRICE_DISPERSION_SQL = """
WITH per AS (
  SELECT l_partkey, count(*) AS n_buys,
         avg(l_extendedprice / l_quantity) AS mean_up,
         stddev_samp(l_extendedprice / l_quantity) AS sd_up
  FROM lineitem GROUP BY 1
  HAVING count(*) >= 5
)
SELECT l_partkey, n_buys,
       round(mean_up, 4) AS mean_unit_price,
       round(sd_up / mean_up, 4) AS cv,
       rank
FROM (
  SELECT *, CAST(row_number() OVER (ORDER BY sd_up / mean_up DESC, l_partkey ASC) AS INTEGER) AS rank
  FROM per
)
WHERE rank <= 20
"""

QUERIES["q_price_dispersion"] = (q_price_dispersion, Q_PRICE_DISPERSION_SQL)


def q_near_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy duplicate-payment screen: same customer, amounts within
    ~1%, on DIFFERENT days — the split/reissued-invoice pattern the
    exact-duplicate screen misses. Banded equi-join: amounts bucket
    at 0.0101 log-width — strictly wider than the filter's
    −ln(0.99) ≈ 0.01005 max log-gap, so a qualifying pair differs
    by at most one bucket and the ±1 probe is complete — candidates
    join on (customer, bucket ± its neighbour), then the exact
    ratio filter — never a cross join."""
    orders = Catalog(spark, sf_dir).orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.to_date("o_orderdate").alias("day"),
    )
    bucket = F.floor(F.log("o_totalprice") / F.lit(0.0101)).cast("long")
    probe = orders.select(
        F.col("o_custkey").alias("ck"),
        F.col("o_orderkey").alias("key_a"),
        F.col("o_totalprice").alias("amt_a"),
        F.col("day").alias("day_a"),
        F.explode(F.array(bucket - 1, bucket, bucket + 1)).alias("b"),
    )
    build = orders.select(
        F.col("o_custkey").alias("ck"),
        F.col("o_orderkey").alias("key_b"),
        F.col("o_totalprice").alias("amt_b"),
        F.col("day").alias("day_b"),
        bucket.alias("b"),
    )
    return (
        probe.join(build, ["ck", "b"])
        .filter(
            (F.col("key_a") < F.col("key_b"))
            & (F.col("day_a") != F.col("day_b"))
            & (F.abs(F.col("amt_a") - F.col("amt_b")) / F.greatest("amt_a", "amt_b") <= 0.01)
        )
        .dropDuplicates(["key_a", "key_b"])
        .select(
            F.col("ck").alias("o_custkey"),
            "key_a",
            "key_b",
            _R4(F.col("amt_a"), "amount_a"),
            _R4(F.col("amt_b"), "amount_b"),
            F.datediff("day_b", "day_a").alias("days_apart"),
        )
    )


Q_NEAR_DUP_PAYMENTS_SQL = """
SELECT DISTINCT a.o_custkey, a.o_orderkey AS key_a, b.o_orderkey AS key_b,
       round(a.o_totalprice, 4) AS amount_a,
       round(b.o_totalprice, 4) AS amount_b,
       date_diff('day', CAST(a.o_orderdate AS DATE), CAST(b.o_orderdate AS DATE)) AS days_apart
FROM orders a JOIN orders b
  ON a.o_custkey = b.o_custkey
 AND a.o_orderkey < b.o_orderkey
 AND CAST(a.o_orderdate AS DATE) <> CAST(b.o_orderdate AS DATE)
 AND abs(a.o_totalprice - b.o_totalprice) / greatest(a.o_totalprice, b.o_totalprice) <= 0.01
"""

QUERIES["q_near_duplicate_payments"] = (
    q_near_duplicate_payments,
    Q_NEAR_DUP_PAYMENTS_SQL,
)


def q_payment_velocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Velocity screen: each customer's busiest 7-day window (max
    orders in any rolling week) vs their overall rate — burst
    spending is the precursor signal for both fraud and fiscal-
    year-end dumping. RANGE frame over day ordinals per customer;
    top-20 burstiest customers."""
    orders = Catalog(spark, sf_dir).orders.select(
        "o_custkey",
        F.datediff(F.to_date("o_orderdate"), F.lit("1990-01-01").cast("date")).alias(
            "d"
        ),
    )
    daily = orders.groupBy("o_custkey", "d").agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("d")
        .rangeBetween(-6, 0)
    )
    winded = daily.withColumn("w7", F.sum("n").over(w))
    per = winded.groupBy("o_custkey").agg(
        F.max("w7").alias("max_orders_7d"),
        F.sum("n").alias("total_orders"),
    )
    # distributed top-k, rank re-derived on the 20 survivors
    wr = [F.desc("max_orders_7d"), F.asc("o_custkey")]
    return (
        per.orderBy(*wr)
        .limit(20)
        .withColumn("rank", F.row_number().over(Window.orderBy(*wr)))
        .select(
            "o_custkey",
            "max_orders_7d",
            "total_orders",
            _R4(F.col("max_orders_7d") / F.col("total_orders"), "burst_share"),
            "rank",
        )
    )


Q_PAYMENT_VELOCITY_SQL = """
WITH daily AS (
  SELECT o_custkey,
         date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS d,
         count(*) AS n
  FROM orders GROUP BY 1, 2
), winded AS (
  SELECT o_custkey, n,
         sum(n) OVER (PARTITION BY o_custkey ORDER BY d
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS w7
  FROM daily
), per AS (
  SELECT o_custkey, CAST(max(w7) AS BIGINT) AS max_orders_7d, CAST(sum(n) AS BIGINT) AS total_orders
  FROM winded GROUP BY 1
)
SELECT o_custkey, max_orders_7d, total_orders,
       round(max_orders_7d / CAST(total_orders AS DOUBLE), 4) AS burst_share,
       rank
FROM (
  SELECT *, CAST(row_number() OVER (ORDER BY max_orders_7d DESC, o_custkey ASC) AS INTEGER) AS rank
  FROM per
)
WHERE rank <= 20
"""

QUERIES["q_payment_velocity"] = (q_payment_velocity, Q_PAYMENT_VELOCITY_SQL)


def q_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality index of customer revenue per nation —
    the decomposable cousin of q_gini_concentration (Theil sums
    across subgroups, Gini does not, which is why concentration
    monitoring at 100 TB wants both).

    Single algebraic pass per nation: T = (1/N)Σ(x/μ)ln(x/μ)
    rewritten as Σx·ln(x)/Σx − ln(Σx/N), so the aggregate needs
    only (count, Σx, Σx·lnx) — no window, no second scan, and the
    oracle mirrors the identical formula for FP parity.
    """
    c = Catalog(spark, sf_dir)
    rev = (
        c.orders.groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("x"))
        .join(
            c.customer.select(
                F.col("c_custkey").alias("o_custkey"), "c_nationkey"
            ),
            "o_custkey",
        )
        .join(
            F.broadcast(
                c.nation.select(F.col("n_nationkey").alias("c_nationkey"), "n_name")
            ),
            "c_nationkey",
        )
    )
    return rev.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(
            F.sum(F.col("x") * F.log("x")) / F.sum("x")
            - F.log(F.sum("x") / F.count(F.lit(1))),
            4,
        ).alias("theil_t"),
    )


Q_THEIL_INDEX_SQL = """
WITH rev AS (
  SELECT o_custkey, sum(o_totalprice) AS x FROM orders GROUP BY o_custkey
), j AS (
  SELECT n.n_name, r.x
  FROM rev r
  JOIN customer c ON c.c_custkey = r.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
)
SELECT n_name, count(*) AS n_customers,
       round(sum(x * ln(x)) / sum(x) - ln(sum(x) / count(*)), 4) AS theil_t
FROM j GROUP BY n_name
"""

QUERIES["q_theil_index"] = (q_theil_index, Q_THEIL_INDEX_SQL)


_ATKINSON_EPS = 0.5


def q_atkinson_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atkinson inequality index (ε=0.5) of order values per market
    segment: A = 1 − (mean √y)²/mean y — the welfare-grounded
    member of the inequality family next to Gini/Theil/Lorenz/HHI,
    whose ε makes the inequality-aversion assumption explicit.

    Pure algebraic aggregates (mean of √y and mean of y), so the
    whole index family is one map-side-combinable pass.
    """
    j = (
        Catalog(spark, sf_dir)
        .orders.join(
            Catalog(spark, sf_dir).customer,
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("c_mktsegment", F.col("o_totalprice").alias("y"))
    )
    agg = j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("y").alias("mu"),
        F.avg(F.sqrt("y")).alias("ms"),
    )
    return agg.select(
        "c_mktsegment",
        "n",
        _R4(F.col("mu"), "mean_value"),
        _R4(1 - F.col("ms") * F.col("ms") / F.col("mu"), "atkinson"),
    )


Q_ATKINSON_SQL = """
SELECT c.c_mktsegment, count(*) AS n,
       round(avg(o.o_totalprice), 4) AS mean_value,
       round(1 - avg(sqrt(o.o_totalprice)) * avg(sqrt(o.o_totalprice))
               / avg(o.o_totalprice), 4) AS atkinson
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""

QUERIES["q_atkinson_index"] = (q_atkinson_index, Q_ATKINSON_SQL)


_FAIRNESS_FLOOR = 0.8


def q_fairness_fulfillment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disparate-impact screen on order fulfillment: each market
    segment's fulfillment rate ('F' status share) against the
    best-served segment, flagged when the ratio breaches the
    four-fifths (80%) rule — the standard first-pass fairness
    audit applied to an operational outcome.

    One conditional aggregate to segment rates; the max rate is a
    broadcast scalar; the flag is row algebra.
    """
    o = (
        Catalog(spark, sf_dir)
        .orders.join(
            Catalog(spark, sf_dir).customer,
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_mktsegment",
            (F.col("o_orderstatus") == "F").cast("long").alias("f"),
        )
    )
    per = o.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.avg("f").alias("rate"),
    )
    best = per.agg(F.max("rate").alias("best"))
    return per.crossJoin(F.broadcast(best)).select(
        "c_mktsegment",
        "n_orders",
        _R4(F.col("rate"), "fulfillment_rate"),
        _R4(F.col("rate") / F.col("best"), "impact_ratio"),
        (F.col("rate") / F.col("best") < _FAIRNESS_FLOOR).alias(
            "breaches_80pct_rule"
        ),
    )


Q_FAIRNESS_SQL = f"""
WITH per AS (
  SELECT c.c_mktsegment, count(*) AS n_orders,
         avg(CASE WHEN o.o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END) AS rate
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment
), best AS (SELECT max(rate) AS best FROM per)
SELECT c_mktsegment, n_orders,
       round(rate, 4) AS fulfillment_rate,
       round(rate / best, 4) AS impact_ratio,
       rate / best < {_FAIRNESS_FLOOR} AS breaches_80pct_rule
FROM per CROSS JOIN best
"""

QUERIES["q_fairness_fulfillment"] = (q_fairness_fulfillment, Q_FAIRNESS_SQL)


def q_last_digit_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-digit uniformity screen on payment cents: unlike first
    digits (Benford), the LAST digit of organic amounts should be
    uniform — digit-preference spikes (0/5-heaviness) expose
    manual entry, rounding fraud, or synthetic data. χ² against
    uniform with per-digit shares.

    One digit-histogram aggregate (10 rows); cents come from the
    integer-exact round-then-mod path both engines share.
    """
    o = Catalog(spark, sf_dir).orders.select(
        (
            F.round(F.col("o_totalprice") * 100).cast("long") % 10
        ).alias("digit")
    )
    hist = o.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = hist.agg(F.sum("n").alias("t"))
    j = hist.crossJoin(F.broadcast(tot))
    exp = F.col("t") / 10.0
    return j.select(
        "digit",
        "n",
        _R4(F.col("n") / F.col("t"), "share"),
        _R4(F.pow(F.col("n") - exp, 2) / exp, "chi2_term"),
    )


Q_LAST_DIGIT_SQL = """
WITH hist AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) % 10 AS digit,
         count(*) AS n
  FROM orders GROUP BY 1
), tot AS (SELECT sum(n) AS t FROM hist)
SELECT digit, n,
       round(n / CAST(t AS DOUBLE), 4) AS share,
       round(pow(n - t / 10.0, 2) / (t / 10.0), 4) AS chi2_term
FROM hist CROSS JOIN tot
"""

QUERIES["q_last_digit_uniformity"] = (
    q_last_digit_uniformity,
    Q_LAST_DIGIT_SQL,
)


def q_indirect_standardization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Indirect standardization (SMR-style) of order activity per
    nation: expected orders = Σ over segments of (global orders-
    per-customer rate in that segment × the nation's customers in
    it); the standardized ratio observed/expected strips away
    segment-mix differences — the epidemiology/official-statistics
    method for comparing regions with different compositions.

    Two bounded grids (global segment rates, nation×segment
    counts) and one join; no window, no fact re-scan.
    """
    c = Catalog(spark, sf_dir)
    j = c.orders.join(
        c.customer, F.col("o_custkey") == F.col("c_custkey")
    ).select("c_nationkey", "c_mktsegment")
    obs = j.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("observed"))
    seg_rate = (
        j.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .join(
            c.customer.groupBy("c_mktsegment").agg(
                F.count(F.lit(1)).alias("n_cust")
            ),
            "c_mktsegment",
        )
        .select(
            "c_mktsegment",
            (F.col("n_orders") / F.col("n_cust")).alias("rate"),
        )
    )
    mix = c.customer.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n")
    )
    exp_ = (
        mix.join(F.broadcast(seg_rate), "c_mktsegment")
        .groupBy("c_nationkey")
        .agg(F.sum(F.col("n") * F.col("rate")).alias("expected"))
    )
    return obs.join(exp_, "c_nationkey").select(
        "c_nationkey",
        "observed",
        _R4(F.col("expected"), "expected"),
        _R4(F.col("observed") / F.col("expected"), "standardized_ratio"),
    )


Q_INDIRECT_STD_SQL = """
WITH j AS (
  SELECT c.c_nationkey, c.c_mktsegment
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), obs AS (
  SELECT c_nationkey, count(*) AS observed FROM j GROUP BY 1
), seg_rate AS (
  SELECT a.c_mktsegment, a.n_orders / CAST(b.n_cust AS DOUBLE) AS rate
  FROM (SELECT c_mktsegment, count(*) AS n_orders FROM j GROUP BY 1) a
  JOIN (SELECT c_mktsegment, count(*) AS n_cust FROM customer GROUP BY 1) b
    USING (c_mktsegment)
), expd AS (
  SELECT m.c_nationkey, sum(m.n * r.rate) AS expected
  FROM (SELECT c_nationkey, c_mktsegment, count(*) AS n
        FROM customer GROUP BY 1, 2) m
  JOIN seg_rate r USING (c_mktsegment)
  GROUP BY m.c_nationkey
)
SELECT o.c_nationkey, o.observed,
       round(e.expected, 4) AS expected,
       round(o.observed / e.expected, 4) AS standardized_ratio
FROM obs o JOIN expd e USING (c_nationkey)
"""

QUERIES["q_indirect_standardization"] = (
    q_indirect_standardization,
    Q_INDIRECT_STD_SQL,
)


def q_benford_second_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-digit Benford test on order totals: expected
    P(d₂=d) = Σ_{k=1..9} log₁₀(1 + 1/(10k+d)) — the follow-up
    screen auditors run when first digits pass (manipulators who
    know Benford fake the FIRST digit; the second still betrays
    them). Observed vs expected with χ² terms.
    """
    import math

    expected = {
        d: sum(math.log10(1 + 1 / (10 * k + d)) for k in range(1, 10))
        for d in range(10)
    }
    o = Catalog(spark, sf_dir).orders.select(
        # integer-exact digit string: cents*100 as BIGINT, then the
        # second character — no locale/float formatting involved
        F.substring(
            F.round(F.col("o_totalprice") * 10000).cast("long").cast("string"),
            2,
            1,
        ).cast("int").alias("d2")
    )
    hist = o.groupBy("d2").agg(F.count(F.lit(1)).alias("n"))
    tot = hist.agg(F.sum("n").alias("t"))
    exp_col = F.lit(None).cast("double")
    for d, p in expected.items():
        exp_col = F.when(F.col("d2") == d, F.lit(p)).otherwise(exp_col)
    j = hist.crossJoin(F.broadcast(tot)).withColumn("p_exp", exp_col)
    return j.select(
        "d2",
        "n",
        _R4(F.col("n") / F.col("t"), "observed_share"),
        _R4(F.col("p_exp"), "benford_share"),
        _R4(
            F.pow(F.col("n") - F.col("p_exp") * F.col("t"), 2)
            / (F.col("p_exp") * F.col("t")),
            "chi2_term",
        ),
    )


def _benford2_sql() -> str:
    import math

    cases = " ".join(
        f"WHEN d2 = {d} THEN {sum(math.log10(1 + 1 / (10 * k + d)) for k in range(1, 10))!r}"
        for d in range(10)
    )
    return f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 10000) AS BIGINT)
                          AS VARCHAR), 2, 1) AS INTEGER) AS d2
  FROM orders
), hist AS (
  SELECT d2, count(*) AS n FROM digits GROUP BY d2
), tot AS (SELECT sum(n) AS t FROM hist)
SELECT d2, n,
       round(n / CAST(t AS DOUBLE), 4) AS observed_share,
       round(CAST(CASE {cases} END AS DOUBLE), 4) AS benford_share,
       round(pow(n - (CASE {cases} END) * t, 2)
             / ((CASE {cases} END) * t), 4) AS chi2_term
FROM hist CROSS JOIN tot
"""


QUERIES["q_benford_second_digit"] = (q_benford_second_digit, _benford2_sql())


def q_gini_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-brand revenue concentration: the Gini coefficient of
    part revenues INSIDE each brand — the per-group companion of the
    global ``q_gini_concentration`` (a catalog can look balanced
    overall while every brand is a one-hit-wonder internally; this
    is the screen that shows it).

    Per-brand ranks come from a PARTITIONED window (brand-local sort
    — bounded per group, never a global sort); Gini via the exact
    rank formula Σ(2i−n−1)xᵢ / (n·Σx), cents-exact so both engines
    walk identical integers.
    """
    c = Catalog(spark, sf_dir)
    rev = (
        c.lineitem.join(
            F.broadcast(c.part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "l_partkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                * 100
            )
            .cast("long")
            .alias("cents")
        )
    )
    w = Window.partitionBy("p_brand").orderBy(F.asc("cents"), F.asc("l_partkey"))
    ranked = rev.withColumn("i", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("p_brand"))
    )
    return (
        ranked.groupBy("p_brand")
        .agg(
            F.max("n").alias("n_parts"),
            F.sum("cents").alias("_t"),
            F.sum(
                (2 * F.col("i") - F.col("n") - 1) * F.col("cents")
            ).alias("_num"),
        )
        .select(
            "p_brand",
            "n_parts",
            _R4(F.col("_t") / 100.0, "brand_revenue"),
            _R4(F.col("_num") / (F.col("n_parts") * F.col("_t")), "gini"),
        )
    )


Q_GINI_BY_BRAND_SQL = """
WITH rev AS (
  SELECT p.p_brand, l.l_partkey,
         CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)) * 100)
              AS BIGINT) AS cents
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
), ranked AS (
  SELECT p_brand, cents,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY cents ASC, l_partkey ASC) AS i,
         count(*) OVER (PARTITION BY p_brand) AS n
  FROM rev
)
SELECT p_brand, CAST(max(n) AS BIGINT) AS n_parts,
       round(CAST(sum(cents) AS DOUBLE) / 100.0, 4) AS brand_revenue,
       round(sum((2 * i - n - 1) * cents)
             / (CAST(max(n) AS DOUBLE) * sum(cents)), 4) AS gini
FROM ranked GROUP BY p_brand
"""

QUERIES["q_gini_by_brand"] = (q_gini_by_brand, Q_GINI_BY_BRAND_SQL)
