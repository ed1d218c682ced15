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


def q_balanced_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-rebalancing downsample: cut every event type down to
    the minority type's row count — the majority-class undersampling
    step that precedes training on imbalanced label sets. Selection
    is bottom-n-by-md5(event_id), so the kept set is a pure function
    of row keys: reproducible across engines, reruns, and layouts.

    The minority count is a 1-row broadcast scalar; the only heavy
    op is the per-type rank window, partitioned on the class key
    (bounded partitions ≈ |rows|/|types|, and at real scale the
    rank-filter prunes under AQE before the aggregate).
    """
    ev = Catalog(spark, sf_dir).events.select(
        "event_type", "event_id", "value"
    )
    n_min = ev.groupBy("event_type").count().agg(
        F.min("count").alias("n_min")
    )
    draw = F.md5(F.col("event_id").cast("string"))
    w = Window.partitionBy("event_type").orderBy(draw.asc(), F.col("event_id").asc())
    ranked = ev.withColumn("rk", F.row_number().over(w)).crossJoin(
        F.broadcast(n_min)
    )
    kept = ranked.filter(F.col("rk") <= F.col("n_min"))
    before = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_before"))
    after = kept.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        _R4(F.avg("value"), "sample_value_mean"),
    )
    return before.join(after, "event_type").select(
        "event_type", "n_before", "n_sampled", "sample_value_mean"
    )


Q_BALANCED_DOWNSAMPLE_SQL = """
WITH n_min AS (
  SELECT min(c) AS n_min FROM (
    SELECT count(*) AS c FROM events GROUP BY event_type
  )
), ranked AS (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY md5(CAST(event_id AS VARCHAR)) ASC,
                                     event_id ASC) AS rk
  FROM events
), kept AS (
  SELECT r.* FROM ranked r CROSS JOIN n_min WHERE r.rk <= n_min.n_min
), before AS (
  SELECT event_type, count(*) AS n_before FROM events GROUP BY event_type
)
SELECT b.event_type, b.n_before,
       count(*) AS n_sampled,
       round(avg(k.value), 4) AS sample_value_mean
FROM before b JOIN kept k USING (event_type)
GROUP BY b.event_type, b.n_before
"""

QUERIES["q_balanced_downsample"] = (
    q_balanced_downsample,
    Q_BALANCED_DOWNSAMPLE_SQL,
)


_SYSTEMATIC_K = 20


def q_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic (every k-th) sample of orders in totalprice order —
    the stratified-by-construction design survey statisticians reach
    for when the frame has a meaningful sort: taking every 20th row
    of the price-ordered file guarantees proportional coverage of
    every price band (a uniform hash draw can miss a thin tail).

    The global position comes from ``ranged_global_rank`` (parallel
    range sort + offset ledger — no single-partition window even
    over the full fact table); the k-th filter is row-local. Output
    is the per-priority census of the sample vs the frame — the
    design check that the sample hit every stratum proportionally.
    """
    from etl_gov_spark.operators.ranks import ranged_global_rank

    orders = Catalog(spark, sf_dir).orders.select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    ranked = ranged_global_rank(
        orders,
        [F.asc("o_totalprice"), F.asc("o_orderkey")],
        rank_col="pos",
    )
    sample = ranked.filter((F.col("pos") % _SYSTEMATIC_K) == 1)
    frame = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_frame"),
        F.avg("o_totalprice").alias("mu_frame"),
    )
    return (
        sample.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_sample"),
            F.avg("o_totalprice").alias("mu_sample"),
        )
        .join(F.broadcast(frame), "o_orderpriority")
        .select(
            "o_orderpriority",
            "n_sample",
            "n_frame",
            F.round(F.col("n_sample") / F.col("n_frame"), 4).alias(
                "sampling_rate"
            ),
            F.round(F.col("mu_sample") / F.col("mu_frame"), 4).alias(
                "mean_ratio"
            ),
        )
    )


Q_SYSTEMATIC_SAMPLE_SQL = f"""
WITH ranked AS (
  SELECT o_orderpriority, o_totalprice,
         row_number() OVER (ORDER BY o_totalprice ASC, o_orderkey ASC) AS pos
  FROM orders
), sample AS (
  SELECT o_orderpriority, count(*) AS n_sample,
         avg(o_totalprice) AS mu_sample
  FROM ranked WHERE pos % {_SYSTEMATIC_K} = 1 GROUP BY 1
), frame AS (
  SELECT o_orderpriority, count(*) AS n_frame,
         avg(o_totalprice) AS mu_frame
  FROM orders GROUP BY 1
)
SELECT o_orderpriority, n_sample, n_frame,
       round(n_sample / CAST(n_frame AS DOUBLE), 4) AS sampling_rate,
       round(mu_sample / mu_frame, 4) AS mean_ratio
FROM sample JOIN frame USING (o_orderpriority)
"""

QUERIES["q_systematic_sample"] = (q_systematic_sample, Q_SYSTEMATIC_SAMPLE_SQL)


HOEFF_RATE = 0.10  # deterministic sampling rate for the audit
HOEFF_DELTA = 0.05  # two-sided confidence 1 - delta
HOEFF_CLAMP = 200.0  # value clamp: Hoeffding needs a bounded range


def q_hoeffding_bound_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hoeffding concentration audit for hash-sampling: per event
    type, does the mean of a deterministic 10% md5 sample of
    (clamped) `value` sit within ε = R·√(ln(2/δ)/2n) of the full
    mean? This is the guarantee every "estimate it from a sample"
    pipeline (and q_reservoir_per_group's consumers) silently
    relies on — here it is measured, with the bound, the actual
    error, and the verdict published per type.

    The sample membership is the portable md5 draw on event_id, so
    the DuckDB oracle replays the EXACT sample (not a statistical
    twin) and the whole audit hashes exactly; both passes are one
    conditional aggregate over the same scan.
    """
    import math

    eps_c = math.sqrt(math.log(2.0 / HOEFF_DELTA) / 2.0)  # x R/sqrt(n)
    ev = Catalog(spark, sf_dir).events.select(
        "event_type",
        "event_id",
        F.least(F.greatest(F.col("value"), F.lit(0.0)), F.lit(HOEFF_CLAMP)).alias("x"),
    )
    u = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 12), 16, 10)
        .cast("double")
        + F.lit(1.0)
    ) / F.lit(_U_DENOM)
    tagged = ev.select("event_type", "x", (u <= HOEFF_RATE).cast("long").alias("s"))
    agg = tagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum("s").alias("n_sample"),
        F.avg("x").alias("full_mean"),
        (F.sum(F.col("s") * F.col("x")) / F.sum("s")).alias("samp_mean"),
    )
    eps = F.lit(HOEFF_CLAMP * eps_c) / F.sqrt(F.col("n_sample"))
    err6 = F.round(F.abs(F.col("samp_mean") - F.col("full_mean")), 6)
    return agg.select(
        "event_type",
        "n_total",
        "n_sample",
        _R4(F.col("full_mean"), "full_mean"),
        _R4(F.col("samp_mean"), "sample_mean"),
        _R4(eps, "hoeffding_eps"),
        (err6 <= F.round(eps, 6)).alias("in_bound"),
    ).orderBy("event_type")


def _hoeffding_sql() -> str:
    import math

    eps_c = HOEFF_CLAMP * math.sqrt(math.log(2.0 / HOEFF_DELTA) / 2.0)
    return f"""
WITH tagged AS (
  SELECT event_type,
         least(greatest(value, 0.0), {HOEFF_CLAMP!r}) AS x,
         CASE WHEN (CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 12)
                    AS BIGINT) + 1) / 281474976710656.0 <= {HOEFF_RATE!r}
              THEN 1 ELSE 0 END AS s
  FROM events
), agg AS (
  SELECT event_type, count(*) AS n_total, sum(s) AS n_sample,
         avg(x) AS full_mean,
         sum(s * x) / sum(s) AS samp_mean
  FROM tagged GROUP BY event_type
)
SELECT event_type, n_total, CAST(n_sample AS BIGINT) AS n_sample,
       round(full_mean, 4) AS full_mean,
       round(samp_mean, 4) AS sample_mean,
       round({eps_c!r} / sqrt(n_sample), 4) AS hoeffding_eps,
       round(abs(samp_mean - full_mean), 6)
         <= round({eps_c!r} / sqrt(n_sample), 6) AS in_bound
FROM agg ORDER BY event_type
"""


QUERIES["q_hoeffding_bound_audit"] = (q_hoeffding_bound_audit, _hoeffding_sql())
