"""Reshape / audit operators: unpivot (wide→long) and
sequence-gap detection (SURVEY.md §2.A extension).
Reference parity: the reference's ETL publishes tidy long-form
tables from wide pandas frames (``dags/tutorial_objectstorage.py``
analyze step); gap detection is the data-completeness check its
sensor-gated loads (``dags/example_sensors.py``) assume upstream.

- unpivot: Spark ``stack()`` turns a wide metric row into tidy
  (group, metric, value) rows inside codegen — the inverse of
  ``q_pivot_status`` and the shape every metrics sink wants.
- sequence gaps: missing-run detection over an incremental ledger
  (here: the open-order key sequence). Spark-first formulation: a
  global ``lead()`` over all keys would serialize 100 TB through one
  sort, so gap *endpoints* are found with two equi-anti-joins
  (``k+1 ∉ keys`` → run start, ``k−1 ∉ keys`` → run end) — hash
  joins that shard on the key — and only the (small) endpoint set is
  ranked to pair starts with ends. Windows over gaps, never over
  data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_gov_spark.io.sources import Catalog

_R4 = lambda c, n: F.round(c, 4).alias(n)  # noqa: E731


def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority order metrics unpivoted to (priority, metric,
    value) long form via stack() — one agg pass, one codegen
    projection, no join."""
    orders = Catalog(spark, sf_dir).orders
    wide = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        F.sum("o_totalprice").alias("total_value"),
        F.avg("o_totalprice").alias("avg_value"),
        F.max("o_totalprice").alias("max_value"),
    )
    return wide.select(
        "o_orderpriority",
        F.expr(
            "stack(4, 'n_orders', n_orders, 'total_value', total_value,"
            " 'avg_value', avg_value, 'max_value', max_value)"
        ).alias("metric", "_v"),
    ).select("o_orderpriority", "metric", _R4(F.col("_v"), "value"))


Q_UNPIVOT_SQL = """
WITH wide AS (
  SELECT o_orderpriority,
         CAST(count(*) AS DOUBLE) AS n_orders,
         sum(o_totalprice) AS total_value,
         avg(o_totalprice) AS avg_value,
         max(o_totalprice) AS max_value
  FROM orders GROUP BY 1
)
SELECT o_orderpriority, 'n_orders' AS metric, round(n_orders, 4) AS value FROM wide
UNION ALL
SELECT o_orderpriority, 'total_value', round(total_value, 4) FROM wide
UNION ALL
SELECT o_orderpriority, 'avg_value', round(avg_value, 4) FROM wide
UNION ALL
SELECT o_orderpriority, 'max_value', round(max_value, 4) FROM wide
"""


def q_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-run audit of the open-order key ledger: every maximal
    run of absent keys between the observed min and max, as
    (gap_start, gap_end, gap_len).

    Run starts are keys k+1 where k is present and k+1 absent; run
    ends are k−1 where k present and k−1 absent — two anti-joins on
    the key, linear and shard-local. Starts and ends strictly
    interleave, so pairing the i-th start with the i-th end
    reconstructs the runs; that ranking windows over the gap set
    only."""
    keys = (
        Catalog(spark, sf_dir)
        .orders.filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
    )
    bounds = keys.agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
    starts = (
        keys.select((F.col("k") + 1).alias("gap_start"))
        .join(keys, F.col("gap_start") == F.col("k"), "left_anti")
        .crossJoin(F.broadcast(bounds))
        .filter(F.col("gap_start") < F.col("hi"))
        .select("gap_start")
    )
    ends = (
        keys.select((F.col("k") - 1).alias("gap_end"))
        .join(keys, F.col("gap_end") == F.col("k"), "left_anti")
        .crossJoin(F.broadcast(bounds))
        .filter(F.col("gap_end") > F.col("lo"))
        .select("gap_end")
    )
    # pair i-th gap start with i-th gap end: global sequence ranks
    # via ranged_global_rank (parallel range sort — no
    # single-partition window even if the gap census is large)
    from etl_gov_spark.operators.ranks import ranged_global_rank

    s = ranged_global_rank(starts, [F.asc("gap_start")], rank_col="rn")
    e = ranged_global_rank(ends, [F.asc("gap_end")], rank_col="rn")
    return s.join(e, "rn").select(
        "gap_start",
        "gap_end",
        (F.col("gap_end") - F.col("gap_start") + 1).alias("gap_len"),
    )


Q_SEQUENCE_GAPS_SQL = """
WITH keys AS (
  SELECT DISTINCT o_orderkey AS k FROM orders WHERE o_orderstatus = 'O'
), bounds AS (
  SELECT min(k) AS lo, max(k) AS hi FROM keys
), starts AS (
  SELECT k + 1 AS gap_start, CAST(row_number() OVER (ORDER BY k) AS INTEGER) AS rn
  FROM keys
  WHERE k + 1 NOT IN (SELECT k FROM keys) AND k + 1 < (SELECT hi FROM bounds)
), ends AS (
  SELECT k - 1 AS gap_end, CAST(row_number() OVER (ORDER BY k) AS INTEGER) AS rn
  FROM keys
  WHERE k - 1 NOT IN (SELECT k FROM keys) AND k - 1 > (SELECT lo FROM bounds)
)
SELECT gap_start, gap_end, gap_end - gap_start + 1 AS gap_len
FROM starts JOIN ends USING (rn)
"""


QUERIES: dict[str, tuple] = {
    "q_unpivot_metrics": (q_unpivot_metrics, Q_UNPIVOT_SQL),
    "q_sequence_gaps": (q_sequence_gaps, Q_SEQUENCE_GAPS_SQL),
}
