"""Deep relational pack (SURVEY.md §2.A, wave 3): the remaining
TPC-H query shapes, adapted to the catalog's reduced star schema
(no partsupp table — lineitem serves as the part×supplier supply
relation; no commit/receipt dates — lateness is shipdate vs
orderdate).

Capability parity target: the reference's warehouse-SQL surface
(``dags/sql/sample.sql``, SQLExecuteQueryOperator DAGs) — each shape
here is a canonical analytical pattern a gov warehouse runs daily:
correlated argmin, EXISTS semi-joins, multi-way nation joins,
share-of-total, scalar-subquery HAVING, distribution histograms,
argmax-row selection, and multi-condition anti-joins.

Scale stance (same as relational.py): declarative plans only;
region/nation/supplier/part are broadcast dims; the only large
shuffles are orders⋈lineitem on orderkey (bucket both at 100 TB and
they vanish); argmin/argmax is one-pass min/max-over-struct, never
a sort; every float aggregate rounds to 4 dp on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_gov_spark.io.sources import Catalog

_R4 = lambda c, n: F.round(c, 4).alias(n)  # noqa: E731

def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated min — per small part, the EUROPE
    supplier offering the lowest unit price.

    lineitem plays partsupp: unit price = extendedprice/quantity
    (exact IEEE division, min is order-independent → both engines
    agree bit-for-bit; tie-broken by suppkey via struct-min).
    Scale: the part×supplier price list is a bounded groupBy
    (|part|×|supp| keys), then a one-pass struct-min per part — no
    window sort, no self-join.
    """
    c = Catalog(spark, sf_dir)
    eu_supp = (
        c.supplier.join(
            F.broadcast(
                c.nation.join(
                    F.broadcast(c.region.filter(F.col("r_name") == "EUROPE")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )
    offers = (
        c.lineitem.join(F.broadcast(eu_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "s_suppkey", "s_name", "n_name")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"))
    )
    best = offers.groupBy("l_partkey").agg(
        F.min(F.struct("unit_price", "s_suppkey", "s_name", "n_name")).alias("_b")
    )
    small = c.part.filter(F.col("p_size") < 10).select("p_partkey", "p_brand", "p_size")
    return (
        best.join(F.broadcast(small), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.col("p_partkey"),
            "p_brand",
            "p_size",
            F.col("_b.s_name").alias("s_name"),
            F.col("_b.n_name").alias("n_name"),
            # integer-path 4-dp readout: round(x·10⁴)/10⁴ instead of
            # round(x, 4) — money quotients land on exact 4-dp
            # half-ties (…85775), where Spark's exact-decimal
            # HALF_UP and DuckDB's multiply-then-round disagree;
            # rounding at integer scale has no internal multiply, so
            # identical input doubles give identical results in both
            # engines (sf0.1 gate finding, round 12)
            (F.round(F.col("_b.unit_price") * 10000.0) / 10000.0).alias(
                "unit_price"
            ),
        )
    )


Q2_SQL = """
WITH eu_supp AS (
  SELECT s_suppkey, s_name, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), offers AS (
  SELECT l_partkey, s_suppkey, s_name, n_name,
         min(l_extendedprice / l_quantity) AS unit_price
  FROM lineitem JOIN eu_supp ON l_suppkey = s_suppkey
  GROUP BY 1, 2, 3, 4
), best AS (
  SELECT l_partkey,
         min(struct_pack(unit_price := unit_price, s_suppkey := s_suppkey,
                         s_name := s_name, n_name := n_name)) AS b
  FROM offers GROUP BY 1
)
SELECT p_partkey, p_brand, p_size, b.s_name AS s_name, b.n_name AS n_name,
       round(b.unit_price * 10000.0) / 10000.0 AS unit_price
FROM best JOIN part ON l_partkey = p_partkey
WHERE p_size < 10
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join — orders in 1997H1 with at
    least one line shipped >60 days after the order date, counted by
    priority.

    Scale: left-semi join keeps only order keys (no row blowup from
    multi-line orders); both sides pre-filtered before the shuffle.
    """
    c = Catalog(spark, sf_dir)
    o = c.orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    late = c.lineitem.select("l_orderkey", "l_shipdate")
    sem = o.join(
        late,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return sem.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume — revenue shipped
    between NATION_3 and NATION_8 (either direction), by supplier
    nation × customer nation × ship year.

    Scale: both nation maps broadcast; the cross-nation predicate is
    applied after two broadcast joins, so the only shuffles are the
    fact-fact joins on orderkey (bucketable).
    """
    c = Catalog(spark, sf_dir)
    n = c.nation.select("n_nationkey", "n_name")
    supp = c.supplier.join(
        F.broadcast(n.withColumnRenamed("n_name", "supp_nation")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    cust = c.customer.join(
        F.broadcast(n.withColumnRenamed("n_name", "cust_nation")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey", "cust_nation")
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_8")
    ) | ((F.col("supp_nation") == "NATION_8") & (F.col("cust_nation") == "NATION_3"))
    return (
        c.lineitem.join(c.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(_R4(F.sum(_rev()), "revenue"))
    )


Q7_SQL = """
SELECT supp_nation, cust_nation, l_year, round(sum(volume), 4) AS revenue
FROM (
  SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
  WHERE (sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_8')
     OR (sn.n_name = 'NATION_8' AND cn.n_name = 'NATION_3')
)
GROUP BY 1, 2, 3
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: market share — NATION_3 suppliers' fraction
    of ECONOMY-part revenue sold to EUROPE customers, per order
    year. Conditional-sum ratio inside one aggregation pass.
    """
    c = Catalog(spark, sf_dir)
    eu_cust = (
        c.customer.join(
            F.broadcast(
                c.nation.join(
                    F.broadcast(c.region.filter(F.col("r_name") == "EUROPE")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp = c.supplier.join(
        F.broadcast(c.nation.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    eco = c.part.filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    vol = _rev()
    return (
        c.lineitem.join(F.broadcast(eco), F.col("l_partkey") == F.col("p_partkey"))
        .join(c.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(eu_cust, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            _R4(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                "mkt_share",
            ),
            _R4(F.sum(vol), "total_volume"),
        )
    )


Q8_SQL = """
SELECT o_year,
       round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
             / sum(volume), 4) AS mkt_share,
       round(sum(volume), 4) AS total_volume
FROM (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         sn.n_name AS supp_nation
  FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE p_type = 'ECONOMY'
    AND o_custkey IN (SELECT c_custkey
                      FROM customer JOIN nation ON c_nationkey = n_nationkey
                                    JOIN region ON n_regionkey = r_regionkey
                      WHERE r_name = 'EUROPE')
)
GROUP BY o_year
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-line profit by supplier nation ×
    order year for parts named like '%red%'. Cost proxy (no
    partsupp): 60% of retail price × quantity.
    """
    c = Catalog(spark, sf_dir)
    red = c.part.filter(F.col("p_name").contains("red")).select(
        "p_partkey", "p_retailprice"
    )
    supp = c.supplier.join(
        F.broadcast(c.nation.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "n_name")
    profit = _rev() - F.col("p_retailprice") * F.lit(0.6) * F.col("l_quantity")
    return (
        c.lineitem.join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"))
        .join(c.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(_R4(F.sum(profit), "sum_profit"))
    )


Q9_SQL = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)
                 - p_retailprice * 0.6 * l_quantity), 4) AS sum_profit
FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
"""


def q11_important_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: scalar-subquery HAVING — parts whose ASIA
    supply value exceeds 0.1% of the total ASIA supply value.

    Scale: the total is a one-row aggregate broadcast into the
    per-part HAVING filter — never a driver-side collect.
    """
    c = Catalog(spark, sf_dir)
    asia_supp = (
        c.supplier.join(
            F.broadcast(
                c.nation.join(
                    F.broadcast(c.region.filter(F.col("r_name") == "ASIA")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    value = (
        c.lineitem.join(F.broadcast(asia_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice")).alias("_value"))
    )
    total = value.agg(F.sum("_value").alias("_total"))
    return (
        value.crossJoin(F.broadcast(total))
        .filter(F.col("_value") > F.col("_total") * 0.001)
        .select("l_partkey", _R4(F.col("_value"), "supply_value"))
    )


Q11_SQL = """
WITH asia_supp AS (
  SELECT s_suppkey FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
), value AS (
  SELECT l_partkey, sum(l_extendedprice) AS v
  FROM lineitem WHERE l_suppkey IN (SELECT s_suppkey FROM asia_supp)
  GROUP BY 1
)
SELECT l_partkey, round(v, 4) AS supply_value
FROM value
WHERE v > (SELECT sum(v) FROM value) * 0.001
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: two-level aggregation — distribution of
    customers by how many non-'4-NOT SPECIFIED' orders they placed
    (including zero, via left outer join).

    Scale: first groupBy shuffles on custkey (same key as the join →
    one shuffle under AQE); second groupBy is on the tiny count
    domain.
    """
    c = Catalog(spark, sf_dir)
    o = c.orders.filter(F.col("o_orderpriority") != "4-NOT SPECIFIED").select(
        "o_custkey", "o_orderkey"
    )
    per_cust = (
        c.customer.select("c_custkey")
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: argmax-row selection — the supplier(s) with
    maximum 1997H1 revenue, selected by joining against the scalar
    max (computed on 4-dp-rounded revenue so both engines agree).
    """
    c = Catalog(spark, sf_dir)
    rev = (
        c.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.round(F.sum(_rev()), 4).alias("total_revenue"))
    )
    top = rev.agg(F.max("total_revenue").alias("_max"))
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("_max"))
        .join(F.broadcast(c.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-07-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
"""


def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-count over a filtered join — how
    many distinct suppliers ship each (brand, type, size band),
    excluding Brand#1. lineitem is the part↔supplier relation.

    Scale: project to the 3 grouping columns + suppkey before the
    distinct (column pruning), then count-distinct per bounded key.
    """
    c = Catalog(spark, sf_dir)
    p = c.part.filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        c.lineitem.select("l_partkey", "l_suppkey")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
GROUP BY 1, 2, 3
"""


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar aggregate — weekly revenue
    from Brand#3 lineitems whose quantity is below half the
    part's average quantity.

    The avg-per-part is a groupBy joined back (no correlated
    re-scan); a 1e-9 margin on the comparison absorbs cross-engine
    FP summation differences in the average.
    """
    c = Catalog(spark, sf_dir)
    b3 = c.part.filter(F.col("p_brand") == "Brand#3").select("p_partkey")
    li = c.lineitem.join(F.broadcast(b3), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
    avg_q = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("_avg_qty"))
    return (
        li.join(avg_q, "l_partkey")
        .filter(F.col("l_quantity") < F.col("_avg_qty") * 0.5 - 1e-9)
        .agg(_R4(F.sum("l_extendedprice") / 7.0, "avg_weekly_revenue"))
    )


Q17_SQL = """
WITH li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#3')
), avg_q AS (
  SELECT l_partkey, avg(l_quantity) AS avg_qty FROM li GROUP BY 1
)
SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_weekly_revenue
FROM li JOIN avg_q USING (l_partkey)
WHERE l_quantity < avg_qty * 0.5 - 1e-9
"""


def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: agg→threshold→semi-join — suppliers who
    shipped more than 150 units of PROMO parts during 1997, with
    their nation.
    """
    c = Catalog(spark, sf_dir)
    promo = c.part.filter(F.col("p_type") == "PROMO").select("p_partkey")
    heavy = (
        c.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(promo), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 150)
    )
    return (
        c.supplier.join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(c.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )


Q20_SQL = """
SELECT s_suppkey, s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
  GROUP BY l_suppkey
  HAVING sum(l_quantity) > 150
)
"""


def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the supplier uniquely responsible for the
    latest shipment on each finalized multi-supplier order ("kept
    the order waiting"), counted per supplier.

    EXISTS/NOT-EXISTS pair re-expressed as one windowed pass over
    the per-(order,supplier) max-shipdate aggregate: own max equals
    the order max, exactly one supplier achieves it, and the order
    has ≥2 suppliers. Timestamps compare exactly → deterministic.
    """
    c = Catalog(spark, sf_dir)
    f_orders = c.orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    per_supp = (
        c.lineitem.join(f_orders, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("_last"))
    )
    w = Window.partitionBy("l_orderkey")
    flagged = (
        per_supp.withColumn("_omax", F.max("_last").over(w))
        .withColumn("_nsupp", F.count(F.lit(1)).over(w))
        .withColumn(
            "_nmax", F.sum(F.when(F.col("_last") == F.col("_omax"), 1).otherwise(0)).over(w)
        )
        .filter(
            (F.col("_last") == F.col("_omax"))
            & (F.col("_nsupp") >= 2)
            & (F.col("_nmax") == 1)
        )
    )
    return (
        flagged.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(Catalog(spark, sf_dir).supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
    )


Q21_SQL = """
WITH per_supp AS (
  SELECT l_orderkey, l_suppkey, max(l_shipdate) AS last_ship
  FROM lineitem
  WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
  GROUP BY 1, 2
), winded AS (
  SELECT l_suppkey, last_ship,
         max(last_ship) OVER (PARTITION BY l_orderkey) AS omax,
         count(*) OVER (PARTITION BY l_orderkey) AS nsupp,
         l_orderkey
  FROM per_supp
), flagged AS (
  SELECT l_suppkey
  FROM (
    SELECT l_suppkey, last_ship, omax, nsupp,
           sum(CASE WHEN last_ship = omax THEN 1 ELSE 0 END)
             OVER (PARTITION BY l_orderkey) AS nmax
    FROM winded
  )
  WHERE last_ship = omax AND nsupp >= 2 AND nmax = 1
)
SELECT s_name, count(*) AS numwait
FROM flagged JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
"""


QUERIES: dict[str, tuple] = {
    "q2_min_cost_supplier": (q2_min_cost_supplier, Q2_SQL),
    "q4_order_priority": (q4_order_priority, Q4_SQL),
    "q7_volume_shipping": (q7_volume_shipping, Q7_SQL),
    "q8_market_share": (q8_market_share, Q8_SQL),
    "q9_product_profit": (q9_product_profit, Q9_SQL),
    "q11_important_inventory": (q11_important_inventory, Q11_SQL),
    "q13_customer_distribution": (q13_customer_distribution, Q13_SQL),
    "q15_top_supplier": (q15_top_supplier, Q15_SQL),
    "q16_supplier_part_count": (q16_supplier_part_count, Q16_SQL),
    "q17_small_qty_revenue": (q17_small_qty_revenue, Q17_SQL),
    "q20_excess_suppliers": (q20_excess_suppliers, Q20_SQL),
    "q21_waiting_supplier": (q21_waiting_supplier, Q21_SQL),
}
