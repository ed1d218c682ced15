"""Deterministic distributed sampling operators (SURVEY.md §2.A
extension; complements the seeded ``sampleBy`` op in mlstats.py).
Reference parity: the reference's tutorial ETL pulls fixed extracts
for inspection (``dags/tutorial_dag.py`` extract task); reproducible
sampling is that capability made safe for pipelines that re-run.

Sampling at 100 TB must be (a) single-pass, (b) shard-independent —
no global RNG state, no driver coordination — and (c) reproducible
across engines and reruns. Both ops here derive per-row randomness
from md5 of the row key, so every executor computes the same
"random" draw for the same row regardless of partitioning, and the
DuckDB oracle replays the identical draw:

- reservoir-per-stratum: rank rows by their md5 draw within each
  stratum, keep k — the distributed equivalent of a k-reservoir,
  exactly reproducible (classic bottom-k-by-hash sampling).
- weighted-without-replacement: the exponential-race trick
  (Efraimidis-Spirakis): key_i = -ln(u_i)/w_i, keep the k smallest
  keys per stratum. Items win proportionally to weight; one window
  pass, no sequential state.

Both are window-top-k over bounded strata: the per-stratum sort is
k-bounded in AQE and never global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_gov_spark.io.sources import Catalog

_R4 = lambda c, n: F.round(c, 4).alias(n)  # noqa: E731

K_RESERVOIR = 10
K_WEIGHTED = 5
_U_DENOM = float(1 << 48)  # 12 hex digits → exact 48-bit integer


def _draw() -> F.Column:
    """Portable uniform draw in (0, 1]: first 48 bits of
    md5(orderkey) — exact as a double (48 < 53 mantissa bits), +1 so
    ln() never sees zero. Identical value in DuckDB via the same
    substr + hex-parse."""
    h = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 12)
    return (F.conv(h, 16, 10).cast("double") + F.lit(1.0)) / F.lit(_U_DENOM)


_SQL_DRAW = (
    "(CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 12) AS BIGINT) + 1)"
    " / 281474976710656.0"
)


def q_reservoir_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=10 uniform sample per order priority via bottom-k-by-hash:
    every row's rank is a pure function of its key, so the sample is
    identical on any cluster layout and incrementally stable (a new
    row displaces at most one sampled row)."""
    orders = Catalog(spark, sf_dir).orders
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("_u").asc(), F.col("o_orderkey").asc()
    )
    return (
        orders.select("o_orderpriority", "o_orderkey", _draw().alias("_u"))
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= K_RESERVOIR)
        .select("o_orderpriority", "o_orderkey", "sample_rank")
    )


Q_RESERVOIR_SQL = f"""
SELECT o_orderpriority, o_orderkey, sample_rank
FROM (
  SELECT o_orderpriority, o_orderkey,
         CAST(row_number() OVER (PARTITION BY o_orderpriority
                                 ORDER BY {_SQL_DRAW} ASC, o_orderkey ASC) AS INTEGER) AS sample_rank
  FROM orders
)
WHERE sample_rank <= {K_RESERVOIR}
"""


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=5 weighted sample (without replacement) per order priority,
    weight = order value: Efraimidis-Spirakis exponential race,
    key = -ln(u)/w, smallest k win. Bigger orders win more often;
    the draw is replayable row-local algebra (no RNG service, no
    shuffle beyond the stratum window)."""
    orders = Catalog(spark, sf_dir).orders
    race = -F.log(F.col("_u")) / F.col("o_totalprice")
    w = Window.partitionBy("o_orderpriority").orderBy(
        race.asc(), F.col("o_orderkey").asc()
    )
    return (
        orders.select(
            "o_orderpriority", "o_orderkey", "o_totalprice", _draw().alias("_u")
        )
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= K_WEIGHTED)
        .select(
            "o_orderpriority",
            "o_orderkey",
            _R4(F.col("o_totalprice"), "weight"),
            "sample_rank",
        )
    )


Q_WEIGHTED_SQL = f"""
SELECT o_orderpriority, o_orderkey, round(o_totalprice, 4) AS weight, sample_rank
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         CAST(row_number() OVER (PARTITION BY o_orderpriority
                                 ORDER BY -ln({_SQL_DRAW}) / o_totalprice ASC,
                                          o_orderkey ASC) AS INTEGER) AS sample_rank
  FROM orders
)
WHERE sample_rank <= {K_WEIGHTED}
"""


QUERIES: dict[str, tuple] = {
    "q_reservoir_per_group": (q_reservoir_per_group, Q_RESERVOIR_SQL),
    "q_weighted_sample": (q_weighted_sample, Q_WEIGHTED_SQL),
}
