"""Arrow-vectorized Python UDF patterns (§2 UDF coverage).

The two remaining sanctioned Python entry points, each shown with
an exact SQL oracle so the pattern itself is verified:

- scalar ``@pandas_udf``: vectorized column function (Arrow batch
  in, Arrow batch out — never row-at-a-time Python). Used when a
  formula needs a Python library but stays per-row.
- grouped ``applyInPandas``: per-group model fit (here OLS via
  numpy least squares) — the distributed-ML pattern: groups
  shuffle to executors, each fits locally, results union. The
  closed-form regr_* SQL twin proves the numeric path end-to-end.

UDFs remain the slow path: everything else in this engine is
JVM-side. These exist to cover the pattern (and its testing
discipline) for operators that genuinely need Python — model
scoring, tokenizers, domain libraries.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from etl_gov_spark.io.sources import Catalog

_R4 = lambda c, n: F.round(c, 4).alias(n)  # noqa: E731


def _sigmoid(total: pd.Series) -> pd.Series:
    """Vectorized logistic score of order value (scale 1e5)."""
    import numpy as np

    return 1.0 / (1.0 + np.exp(-(total - 150_000.0) / 50_000.0))


def udf_sigmoid_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF over orders: per-priority score profile.

    The udf object is created inside the plan builder, not at
    module level — @pandas_udf needs an active session to parse
    its return type, and executors re-import this module without
    one.
    """
    sigmoid_score = pandas_udf(_sigmoid, "double")
    orders = Catalog(spark, sf_dir).orders
    scored = orders.select(
        "o_orderpriority", sigmoid_score("o_totalprice").alias("score")
    )
    return scored.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        _R4(F.avg("score"), "avg_score"),
        _R4(F.max("score"), "max_score"),
    )


UDF_SIGMOID_SCORES_SQL = """
SELECT o_orderpriority, count(*) AS n,
       round(avg(1.0 / (1.0 + exp(-(o_totalprice - 150000.0) / 50000.0))), 4) AS avg_score,
       round(max(1.0 / (1.0 + exp(-(o_totalprice - 150000.0) / 50000.0))), 4) AS max_score
FROM orders GROUP BY o_orderpriority
"""

_FIT_SCHEMA = "n_name string, slope double, intercept double, n_days long"


def _fit_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-group OLS via the closed-form normal equations (numpy)."""
    x = pdf["x"].to_numpy(dtype="float64")
    y = pdf["day_rev"].to_numpy(dtype="float64")
    n = len(x)
    mx, my = x.mean(), y.mean()
    varx = ((x - mx) ** 2).sum()
    slope = ((x - mx) * (y - my)).sum() / varx if varx > 0 else float("nan")
    intercept = my - slope * mx
    r4 = lambda v: math.floor(v * 1e4 + 0.5) / 1e4 if v >= 0 else -math.floor(-v * 1e4 + 0.5) / 1e4  # noqa: E731
    return pd.DataFrame(
        {
            "n_name": [pdf["n_name"].iloc[0]],
            "slope": [r4(slope)],
            "intercept": [r4(intercept)],
            "n_days": [n],
        }
    )


def udaf_trend_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped applyInPandas: daily-revenue OLS per nation.

    Same statistic as q_trend_slope (regr_* aggregates) but fitted
    in Python per group — the template for per-entity model fits
    that have no SQL closed form. The regr_slope SQL twin makes
    this pattern exactly verifiable.
    """
    c = Catalog(spark, sf_dir)
    daily = (
        c.orders.join(c.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.to_date("o_orderdate").alias("day"))
        .agg(F.sum("o_totalprice").alias("day_rev"))
        .select(
            "n_name",
            F.datediff(F.col("day"), F.lit("1995-01-01")).cast("double").alias("x"),
            "day_rev",
        )
    )
    return daily.groupBy("n_name").applyInPandas(_fit_group, schema=_FIT_SCHEMA)


UDAF_TREND_PANDAS_SQL = """
WITH daily AS (
  SELECT n_name, CAST(o_orderdate AS DATE) AS day,
         sum(o_totalprice) AS day_rev
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  GROUP BY 1, 2
)
SELECT n_name,
       round(regr_slope(day_rev, datediff('day', DATE '1995-01-01', day)), 4) AS slope,
       round(regr_intercept(day_rev, datediff('day', DATE '1995-01-01', day)), 4) AS intercept,
       regr_count(day_rev, datediff('day', DATE '1995-01-01', day)) AS n_days
FROM daily GROUP BY n_name
"""


QUERIES: dict[str, tuple] = {
    "udf_sigmoid_scores": (udf_sigmoid_scores, UDF_SIGMOID_SCORES_SQL),
    "udaf_trend_pandas": (udaf_trend_pandas, UDAF_TREND_PANDAS_SQL),
}


def text_compression_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-ratio quality filter (rows-only: zlib has no
    DuckDB twin; monotonicity is asserted in tests): highly
    compressible text = repetitive boilerplate, incompressible =
    high-entropy noise; natural prose sits in the middle band.

    zlib runs inside an Arrow-batched scalar pandas_udf — the
    vectorized Python escape hatch for libraries Spark lacks; per
    batch, one Python call per row but zero per-row JVM↔Python
    round-trips."""
    import zlib

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def compression_ratio(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: round(len(zlib.compress(t.encode())) / max(len(t.encode()), 1), 6)
        )

    docs = Catalog(spark, sf_dir).documents
    scored = docs.select(
        "doc_id",
        F.octet_length(F.encode("text", "utf-8")).alias("n_bytes"),
        compression_ratio("text").alias("ratio"),
    )
    return scored.select(
        "doc_id",
        "n_bytes",
        F.round("ratio", 4).alias("compression_ratio"),
        F.when(F.col("ratio") < 0.3, "boilerplate")
        .when(F.col("ratio") > 0.9, "noise")
        .otherwise("prose")
        .alias("band"),
    )


QUERIES["text_compression_quality"] = (text_compression_quality, None)


_Z_SCHEMA = (
    "event_type string, n long, mean double, std double, "
    "min_z double, max_z double"
)


def _zscore_group(pdf):
    import pandas as pd

    v = pdf["value"]
    mu = float(v.mean())
    sd = float(v.std(ddof=0))
    z = (v - mu) / sd
    return pd.DataFrame(
        {
            "event_type": [pdf["event_type"].iloc[0]],
            "n": [len(v)],
            "mean": [round(mu, 4)],
            "std": [round(sd, 4)],
            "min_z": [round(float(z.min()), 4)],
            "max_z": [round(float(z.max()), 4)],
        }
    )


def udaf_zscore_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped applyInPandas z-score profile per event type — the
    Arrow-vectorized normalization template (each group's batch is
    standardized in numpy/pandas, the schema contract is explicit)
    with an exactly-verifiable SQL twin, like ``udaf_trend_pandas``.

    The group key is low-cardinality so each Arrow batch is large —
    the shape where applyInPandas amortizes; for per-user grouping
    the same code runs with a hash-partitioned high-cardinality
    key.
    """
    ev = Catalog(spark, sf_dir).events.select("event_type", "value")
    return ev.groupBy("event_type").applyInPandas(
        _zscore_group, schema=_Z_SCHEMA
    )


UDAF_ZSCORE_SQL = """
SELECT event_type, count(*) AS n,
       round(avg(value), 4) AS mean,
       round(stddev_pop(value), 4) AS std,
       round((min(value) - avg(value)) / stddev_pop(value), 4) AS min_z,
       round((max(value) - avg(value)) / stddev_pop(value), 4) AS max_z
FROM events GROUP BY event_type
"""

QUERIES["udaf_zscore_pandas"] = (udaf_zscore_pandas, UDAF_ZSCORE_SQL)


_HOLT_ALPHA = 0.5
_HOLT_BETA = 0.3
_HOLT_H = 7

_HOLT_SCHEMA = (
    "event_type string, n_days long, level double, trend double, "
    "forecast_7d double"
)


def _holt_group(pdf):
    pdf = pdf.sort_values("day")
    ys = pdf["y"].tolist()
    level, trend = float(ys[0]), 0.0
    for y in ys[1:]:
        prev = level
        level = _HOLT_ALPHA * y + (1 - _HOLT_ALPHA) * (level + trend)
        trend = _HOLT_BETA * (level - prev) + (1 - _HOLT_BETA) * trend
    return pd.DataFrame(
        {
            "event_type": [pdf["event_type"].iloc[0]],
            "n_days": [len(ys)],
            "level": [round(level, 4)],
            "trend": [round(trend, 4)],
            "forecast_7d": [round(level + _HOLT_H * trend, 4)],
        }
    )


def q_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear exponential smoothing per event type — a
    RECURSIVE computation (each day's level/trend feeds the next)
    that has no windowed closed form, run through grouped
    applyInPandas over the bounded daily series and verified
    against a DuckDB RECURSIVE CTE replaying the identical
    recurrence: the template for sequential state at scale (group
    count parallelizes; within-group state is Arrow-local).

    Forecast = level + 7·trend. Both engines execute the same
    double-precision operation sequence, so the oracle is
    hash-exact despite 30+ chained floating-point steps.
    """
    ev = Catalog(spark, sf_dir).events.select(
        "event_type", F.to_date("ts").alias("day")
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    return daily.groupBy("event_type").applyInPandas(
        _holt_group, schema=_HOLT_SCHEMA
    )


Q_HOLT_SQL = f"""
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(count(*) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2
), idx AS (
  SELECT event_type, day, y,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS i,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM daily
), holt(event_type, i, level, trend) AS (
  SELECT event_type, 1, y, CAST(0.0 AS DOUBLE) FROM idx WHERE i = 1
  UNION ALL
  SELECT h.event_type, h.i + 1,
         {_HOLT_ALPHA} * d.y + (1 - {_HOLT_ALPHA}) * (h.level + h.trend),
         {_HOLT_BETA} * (({_HOLT_ALPHA} * d.y
                          + (1 - {_HOLT_ALPHA}) * (h.level + h.trend))
                         - h.level)
           + (1 - {_HOLT_BETA}) * h.trend
  FROM holt h JOIN idx d ON d.event_type = h.event_type AND d.i = h.i + 1
)
SELECT h.event_type, CAST(x.n AS BIGINT) AS n_days,
       round(h.level, 4) AS level,
       round(h.trend, 4) AS trend,
       round(h.level + {_HOLT_H} * h.trend, 4) AS forecast_7d
FROM holt h
JOIN (SELECT event_type, max(n) AS n FROM idx GROUP BY event_type) x
  ON x.event_type = h.event_type
WHERE h.i = x.n
"""

QUERIES["q_holt_forecast"] = (q_holt_forecast, Q_HOLT_SQL)


_HW_ALPHA = 0.5
_HW_BETA = 0.3
_HW_GAMMA = 0.3
_HW_PERIOD = 7
_HW_H = 7

_HW_SCHEMA = (
    "event_type string, n_days long, level double, trend double, "
    "seasonal double, forecast_7d double"
)


def _holt_winters_group(pdf):
    pdf = pdf.sort_values("day")
    ys = pdf["y"].tolist()
    n = len(ys)
    if n <= _HW_PERIOD:
        return pd.DataFrame(
            {c.split()[0]: [] for c in _HW_SCHEMA.split(", ")}
        ).astype({"event_type": str})
    m = _HW_PERIOD
    level = sum(ys[:m]) / float(m)  # left-fold, mirrored by list_sum
    trend = 0.0
    seas = [ys[j] - level for j in range(m)]
    for i in range(m, n):  # observation i+1 (1-based), slot i % m
        s = i % m
        prev = level
        level = _HW_ALPHA * (ys[i] - seas[s]) + (1 - _HW_ALPHA) * (level + trend)
        trend = _HW_BETA * (level - prev) + (1 - _HW_BETA) * trend
        seas[s] = _HW_GAMMA * (ys[i] - level) + (1 - _HW_GAMMA) * seas[s]
    f_slot = (n + _HW_H - 1) % m  # slot of observation n + H
    return pd.DataFrame(
        {
            "event_type": [pdf["event_type"].iloc[0]],
            "n_days": [n],
            "level": [round(level, 4)],
            "trend": [round(trend, 4)],
            "seasonal": [round(seas[f_slot], 4)],
            "forecast_7d": [round(level + _HW_H * trend + seas[f_slot], 4)],
        }
    )


def q_holt_winters_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters TRIPLE (additive seasonal) exponential smoothing
    per event type — the seasonal upgrade of ``q_holt_forecast``: a
    3-recurrence state (level, trend, 7-slot seasonal vector) that
    has no windowed closed form, run through grouped applyInPandas
    over the bounded daily series. The sequential-state-at-scale
    pattern: group count parallelizes across executors; within-group
    state is Arrow-local and O(period).

    Seasonality is indexed by OBSERVATION position mod 7 (not
    calendar dow) so the recurrence is a pure function of the sorted
    series — the DuckDB oracle replays the identical recurrences in
    a RECURSIVE CTE carrying the seasonal vector as a list, and both
    engines execute the same double-precision operation sequence, so
    the result is hash-exact despite ~90 chained FP steps per group.
    Init: level = mean of the first 7 observations, trend = 0,
    seasonal slot j = y_j − level; groups shorter than 8 days are
    skipped in both engines. Forecast = level + 7·trend + s_slot(n+7).
    """
    ev = Catalog(spark, sf_dir).events.select(
        "event_type", F.to_date("ts").alias("day")
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    return daily.groupBy("event_type").applyInPandas(
        _holt_winters_group, schema=_HW_SCHEMA
    )


def _hw_newlevel(y: str, h: str = "h") -> str:
    """The level recurrence as SQL over state row ``h`` joined to
    observation ``d`` — written once, inlined wherever the new level
    is referenced (same repeated-subexpression trick as Q_HOLT_SQL;
    identical IEEE result on re-evaluation)."""
    return (
        f"{_HW_ALPHA} * ({y} - {h}.seas[({h}.i % {_HW_PERIOD}) + 1])"
        f" + (1 - {_HW_ALPHA}) * ({h}.level + {h}.trend)"
    )


Q_HOLT_WINTERS_SQL = f"""
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(count(*) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2
), idx AS (
  SELECT event_type, day, y,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS i,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM daily
), init AS (
  SELECT event_type,
         list_sum(ys[1:{_HW_PERIOD}]) / {float(_HW_PERIOD)} AS level0,
         list_transform(ys[1:{_HW_PERIOD}],
                        x -> x - list_sum(ys[1:{_HW_PERIOD}]) / {float(_HW_PERIOD)})
           AS seas0,
         n
  FROM (SELECT event_type, list(y ORDER BY i) AS ys, max(n) AS n
        FROM idx GROUP BY event_type)
  WHERE n > {_HW_PERIOD}
), hw(event_type, i, level, trend, seas) AS (
  SELECT event_type, {_HW_PERIOD}, level0, CAST(0.0 AS DOUBLE), seas0 FROM init
  UNION ALL
  SELECT h.event_type, h.i + 1,
         {_hw_newlevel("d.y")},
         {_HW_BETA} * (({_hw_newlevel("d.y")}) - h.level)
           + (1 - {_HW_BETA}) * h.trend,
         list_transform(generate_series(1, {_HW_PERIOD}),
           j -> CASE WHEN j = (h.i % {_HW_PERIOD}) + 1
                     THEN {_HW_GAMMA} * (d.y - ({_hw_newlevel("d.y")}))
                          + (1 - {_HW_GAMMA}) * h.seas[j]
                     ELSE h.seas[j] END)
  FROM hw h JOIN idx d ON d.event_type = h.event_type AND d.i = h.i + 1
)
SELECT h.event_type, CAST(x.n AS BIGINT) AS n_days,
       round(h.level, 4) AS level,
       round(h.trend, 4) AS trend,
       round(h.seas[((x.n + {_HW_H} - 1) % {_HW_PERIOD}) + 1], 4) AS seasonal,
       round(h.level + {_HW_H} * h.trend
             + h.seas[((x.n + {_HW_H} - 1) % {_HW_PERIOD}) + 1], 4) AS forecast_7d
FROM hw h
JOIN (SELECT event_type, max(n) AS n FROM idx GROUP BY event_type) x
  ON x.event_type = h.event_type
WHERE h.i = x.n
"""

QUERIES["q_holt_winters_seasonal"] = (q_holt_winters_seasonal, Q_HOLT_WINTERS_SQL)
