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
