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
  SELECT CAST(regexp_extract(CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS VARCHAR), '[1-9]') AS INTEGER) AS digit,
         count(*) AS n
  FROM orders
  GROUP BY 1
), tot AS (SELECT sum(n) AS total FROM per)
SELECT digit, n,
       round(n / CAST(total AS DOUBLE), 4) AS observed_frac,
       round(({_BENFORD_SQL_ARR})[digit], 4) AS benford_frac,
       round(n / CAST(total AS DOUBLE) - ({_BENFORD_SQL_ARR})[digit], 4) AS deviation
FROM per CROSS JOIN tot
WHERE digit IS NOT NULL
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
