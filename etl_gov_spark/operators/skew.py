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
