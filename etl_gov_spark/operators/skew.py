"""Skew-mitigation join strategies (hot-key salting).

The shuffle-join failure mode at 100 TB: a handful of hot keys
(every web crawl has them; every gov telemetry feed has a
few dominant event types) pin one reducer per key while the rest of
the cluster idles. Three escape hatches, in preference order:

1. broadcast the small side (no shuffle at all) — first choice
   when it fits in executor memory;
2. AQE skew-join splitting (``spark.sql.adaptive.skewJoin``) — on
   by default in our session factory, splits oversized partitions
   at runtime;
3. explicit salting (this module) — when the dim side is too big
   to broadcast AND the skew is in the join key itself: replicate
   the dim row n_salts times, scatter the fact rows across salts,
   join on (key, salt). Each hot key now occupies n_salts reducers.

``q_skew_salted_join`` proves salting is result-transparent: the
oracle is the plain unsalted join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_gov_spark.io.sources import Catalog

_R4 = lambda c, n: F.round(c, 4).alias(n)  # noqa: E731


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join with the fact side scattered over ``n_salts`` sub-keys.

    The fact row's salt is a deterministic hash of the whole row
    (xxhash64), so re-runs partition identically; the dim side is
    exploded n_salts× (dim must be the *smaller* side — its blowup
    is the price of un-pinning the hot keys). Output schema equals
    the plain join's (salt column dropped).
    """
    fact_s = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*fact.columns), F.lit(n_salts)).cast("int")
    )
    dim_s = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return fact_s.join(dim_s, [on, "_salt"], how).drop("_salt")


def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key join: events (5 event types = 5 hot keys) ⋈ a
    per-type weight dim, salted 8× so each type spreads over 8
    reducers. Result must equal the unsalted join (the oracle).

    (At real scale a 5-row dim would be broadcast; the query
    disables nothing — it demonstrates the transform is exact. The
    salting path matters when the dim is GBs, e.g. per-URL stats.)
    """
    ev = Catalog(spark, sf_dir).events.select("event_type", "value")
    weights = (
        ev.select("event_type")
        .distinct()
        .withColumn("type_weight", F.length("event_type").cast("double"))
    )
    joined = salted_join(ev, weights, on="event_type", n_salts=8)
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        _R4(F.sum(F.col("value") * F.col("type_weight")), "weighted_value"),
    )


Q_SKEW_SALTED_JOIN_SQL = """
WITH weights AS (
  SELECT DISTINCT event_type,
         CAST(length(event_type) AS DOUBLE) AS type_weight
  FROM events
)
SELECT e.event_type,
       count(*) AS n_events,
       round(sum(e.value * w.type_weight), 4) AS weighted_value
FROM events e JOIN weights w ON e.event_type = w.event_type
GROUP BY e.event_type
"""


QUERIES: dict[str, tuple] = {
    "q_skew_salted_join": (q_skew_salted_join, Q_SKEW_SALTED_JOIN_SQL),
}


def q_join_key_skew_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic for the lineitem fact's two hot join
    keys (orderkey, partkey): top-key share, p99/median frequency
    ratio, and the share of rows carried by the top 1% of keys — the
    numbers that decide BEFORE a run whether a join needs salting
    (``q_skew_salted_join``) or AQE's skew split suffices.

    One frequency aggregate per key + exact quantiles over the
    bounded key-frequency distribution; output is 2 rows.
    """
    li = Catalog(spark, sf_dir).lineitem

    def census(key: str) -> DataFrame:
        freq = li.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
        tot = freq.agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("n").alias("n_rows"),
            F.max("n").alias("max_n"),
            F.percentile("n", F.lit(0.5)).alias("p50"),
            F.percentile("n", F.lit(0.99)).alias("p99"),
        )
        top1 = (
            freq.crossJoin(F.broadcast(tot))
            .filter(F.col("n") >= F.col("p99"))
            .agg(
                F.sum("n").alias("top1_rows"),
                F.max("n_keys").alias("n_keys"),
                F.max("n_rows").alias("n_rows"),
                F.max("max_n").alias("max_n"),
                F.max("p50").alias("p50"),
                F.max("p99").alias("p99"),
            )
        )
        return top1.select(
            F.lit(key).alias("join_key"),
            "n_keys",
            "n_rows",
            F.col("max_n").alias("max_key_rows"),
            F.round(F.col("max_n") / F.col("n_rows"), 6).alias(
                "top_key_share"
            ),
            F.round(F.col("p99") / F.col("p50"), 4).alias("p99_over_p50"),
            F.round(F.col("top1_rows") / F.col("n_rows"), 4).alias(
                "top1pct_row_share"
            ),
        )

    return census("l_orderkey").unionAll(census("l_partkey"))


def _skew_census_sql() -> str:
    def one(key: str) -> str:
        return f"""
SELECT '{key}' AS join_key, max(n_keys) AS n_keys,
       CAST(max(n_rows) AS BIGINT) AS n_rows,
       CAST(max(max_n) AS BIGINT) AS max_key_rows,
       round(max(max_n) / CAST(max(n_rows) AS DOUBLE), 6) AS top_key_share,
       round(max(p99) / max(p50), 4) AS p99_over_p50,
       round(sum(CASE WHEN n >= p99 THEN n ELSE 0 END)
             / CAST(max(n_rows) AS DOUBLE), 4) AS top1pct_row_share
FROM (SELECT {key}, count(*) AS n FROM lineitem GROUP BY 1) f
CROSS JOIN (
  SELECT count(*) AS n_keys, sum(n) AS n_rows, max(n) AS max_n,
         quantile_cont(n, 0.5) AS p50, quantile_cont(n, 0.99) AS p99
  FROM (SELECT {key}, count(*) AS n FROM lineitem GROUP BY 1)
) t"""

    return one("l_orderkey") + "\nUNION ALL\n" + one("l_partkey")


QUERIES["q_join_key_skew_census"] = (
    q_join_key_skew_census,
    _skew_census_sql(),
)
