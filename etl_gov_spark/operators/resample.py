"""Time-series resampling / regularization operators (SURVEY.md §2.B
extension).

Gov telemetry arrives irregular; models and dashboards want regular
grids. Reference parity: the reference schedules regular ingestion
windows around irregular feeds (``dags/example_workday_timetable.py``
custom timetable, ``dags/example_time_delta_sensor_async.py`` waits);
these operators are the data-side mirror — regularizing the observed
series instead of the schedule. Three canonical re-gridding ops, all
Spark-first:

- gap fill:      per-user daily grid, missing days zero-filled.
  Grid generation is ``sequence() + explode`` per user (data-parallel,
  no driver loop, no calendar table broadcast needed); the join back
  to observed days is an equi-join on (user_id, day).
- interpolation: linear interpolation of missing daily values via
  ``last/first IGNORE NULLS`` window frames — two sorted passes over
  the same (user_id, day) partitioning, zero extra shuffles.
- EWMA:          exponentially weighted moving average with a
  truncated 8-term kernel expressed as ``lag()`` columns — stays in
  whole-stage codegen (no UDF, no driver state), identical algebra
  on the DuckDB side, so an inherently "streaming" smoother becomes
  an oracle-able batch query.

Scale: grids are bounded by (active users × active days) — at 100 TB
the grid explode is linear in that product and shards on user_id; no
operator here ever sorts globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_gov_spark.io.sources import Catalog

_R4 = lambda c, n: F.round(c, 4).alias(n)  # noqa: E731


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    return ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("day_value"),
        F.avg("value").alias("avg_value"),
    )


def _grid(daily: DataFrame) -> DataFrame:
    """Per-user daily grid spanning that user's first..last active
    day: sequence+explode (each user's span expands locally in its
    shard — no cross-user shuffle beyond the span aggregation)."""
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    return span.select(
        "user_id",
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
    )


def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-filled per-user daily activity series. Filled rows are
    flagged so downstream quality gates can tell observation from
    imputation."""
    daily = _daily(spark, sf_dir)
    return (
        _grid(daily)
        .join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            _R4(F.coalesce("day_value", F.lit(0.0)), "day_value"),
            F.when(F.col("n_events").isNull(), 1).otherwise(0).alias("is_filled"),
        )
    )


Q_GAP_FILL_SQL = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         count(*) AS n_events, sum(value) AS day_value
  FROM events GROUP BY 1, 2
), grid AS (
  SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id)
)
SELECT g.user_id, g.day,
       coalesce(d.n_events, 0) AS n_events,
       round(coalesce(d.day_value, 0.0), 4) AS day_value,
       CASE WHEN d.n_events IS NULL THEN 1 ELSE 0 END AS is_filled
FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
"""


def q_interp_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of missing per-user daily activity
    levels (event counts).

    Missing grid days get ``prev + (next - prev) * elapsed/spanned``
    between the nearest observed neighbours; observed days pass
    through. Neighbour lookup is two IGNORE-NULLS window frames over
    one (user_id, day) sort — the distributed equivalent of
    pandas ``interpolate(method='time')``, with no Python in the
    plan. Interpolating the exact integer count keeps both engines'
    arithmetic bit-identical (IEEE ops on identical inputs), so the
    4-dp rounding never straddles an engine-specific tie-break.
    """
    daily = _daily(spark, sf_dir)
    grid = _grid(daily).join(
        daily.select(
            "user_id", "day", F.col("n_events").cast("double").alias("avg_value")
        ),
        ["user_id", "day"],
        "left",
    )
    ord_ = F.datediff("day", F.lit("1970-01-01").cast("date"))
    known_day = F.when(F.col("avg_value").isNotNull(), ord_)
    wp = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    g = (
        grid.withColumn("_ord", ord_)
        .withColumn("_pv", F.last("avg_value", ignorenulls=True).over(wp))
        .withColumn("_pd", F.last(known_day, ignorenulls=True).over(wp))
        .withColumn("_nv", F.first("avg_value", ignorenulls=True).over(wn))
        .withColumn("_nd", F.first(known_day, ignorenulls=True).over(wn))
    )
    interp = F.when(F.col("avg_value").isNotNull(), F.col("avg_value")).otherwise(
        F.when(
            F.col("_pv").isNotNull() & F.col("_nv").isNotNull(),
            F.col("_pv")
            + (F.col("_nv") - F.col("_pv"))
            * (F.col("_ord") - F.col("_pd"))
            / (F.col("_nd") - F.col("_pd")),
        ).otherwise(F.coalesce("_pv", "_nv"))
    )
    return g.select(
        "user_id",
        "day",
        F.when(F.col("avg_value").isNotNull(), 1).otherwise(0).alias("is_observed"),
        _R4(interp, "value_interp"),
    )


Q_INTERP_SQL = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, CAST(count(*) AS DOUBLE) AS avg_value
  FROM events GROUP BY 1, 2
), grid AS (
  SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id)
), g AS (
  SELECT grid.user_id, grid.day, d.avg_value,
         date_diff('day', DATE '1970-01-01', grid.day) AS o,
         last_value(d.avg_value IGNORE NULLS) OVER w_p AS pv,
         last_value(CASE WHEN d.avg_value IS NOT NULL
                         THEN date_diff('day', DATE '1970-01-01', grid.day) END IGNORE NULLS) OVER w_p AS pd,
         first_value(d.avg_value IGNORE NULLS) OVER w_n AS nv,
         first_value(CASE WHEN d.avg_value IS NOT NULL
                          THEN date_diff('day', DATE '1970-01-01', grid.day) END IGNORE NULLS) OVER w_n AS nd
  FROM grid LEFT JOIN daily d ON grid.user_id = d.user_id AND grid.day = d.day
  WINDOW w_p AS (PARTITION BY grid.user_id ORDER BY grid.day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         w_n AS (PARTITION BY grid.user_id ORDER BY grid.day
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, day,
       CASE WHEN avg_value IS NOT NULL THEN 1 ELSE 0 END AS is_observed,
       round(CASE WHEN avg_value IS NOT NULL THEN avg_value
                  WHEN pv IS NOT NULL AND nv IS NOT NULL
                       THEN pv + (nv - pv) * (o - pd) / (nd - pd)
                  ELSE coalesce(pv, nv) END, 4) AS value_interp
FROM g
"""

EWMA_ALPHA = 0.5
EWMA_K = 8


def q_ewma_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA smoothing of hourly totals per event type, truncated to
    an 8-term kernel: ewma_t = Σ w_k·v_{t-k} / Σ w_k over available
    lags (w_k = α·(1-α)^k shape, constant factor cancels in the
    normalization). Eight ``lag()`` columns over one sorted pass —
    the window sorts each (bounded-cardinality) event_type shard
    once; all arithmetic is codegen."""
    ev = Catalog(spark, sf_dir).events
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.sum("value").alias("v"))
    w = Window.partitionBy("event_type").orderBy("hour")
    weights = [(1.0 - EWMA_ALPHA) ** k for k in range(EWMA_K)]
    lags = [F.lag("v", k).over(w) for k in range(EWMA_K)]
    num = sum(
        (F.coalesce(lg, F.lit(0.0)) * F.lit(wt) for lg, wt in zip(lags, weights)),
        F.lit(0.0),
    )
    den = sum(
        (F.when(lg.isNull(), 0.0).otherwise(wt) for lg, wt in zip(lags, weights)),
        F.lit(0.0),
    )
    return hourly.select(
        "event_type", "hour", _R4(F.col("v"), "hourly_value"), _R4(num / den, "ewma")
    )


def _ewma_sql_terms() -> tuple[str, str]:
    num = " + ".join(
        f"coalesce(lag(v, {k}) OVER w, 0.0) * {(1.0 - EWMA_ALPHA) ** k!r}"
        for k in range(EWMA_K)
    )
    den = " + ".join(
        f"CASE WHEN lag(v, {k}) OVER w IS NULL THEN 0.0 ELSE {(1.0 - EWMA_ALPHA) ** k!r} END"
        for k in range(EWMA_K)
    )
    return num, den


_NUM, _DEN = _ewma_sql_terms()

Q_EWMA_SQL = f"""
SELECT event_type, hour,
       round(v, 4) AS hourly_value,
       round(({_NUM}) / ({_DEN}), 4) AS ewma
FROM (
  SELECT event_type, date_trunc('hour', ts) AS hour, sum(value) AS v
  FROM events GROUP BY 1, 2
)
WINDOW w AS (PARTITION BY event_type ORDER BY hour)
"""


QUERIES: dict[str, tuple] = {
    "q_gap_fill": (q_gap_fill, Q_GAP_FILL_SQL),
    "q_interp_linear": (q_interp_linear, Q_INTERP_SQL),
    "q_ewma_value": (q_ewma_value, Q_EWMA_SQL),
}


def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-row median of daily order revenue — the robust
    trend line (medians shrug off the spike days that drag moving
    averages). An aggregate percentile evaluated over a sliding
    ROWS frame on the (bounded) daily series."""
    orders = Catalog(spark, sf_dir).orders
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum("o_totalprice").alias("rev")
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        "day",
        _R4(F.col("rev"), "revenue"),
        _R4(F.expr("percentile(rev, 0.5)").over(w), "rolling_median_7d"),
    )


Q_ROLLING_MEDIAN_SQL = """
SELECT day, round(rev, 4) AS revenue,
       round(quantile_cont(rev, 0.5) OVER (ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS rolling_median_7d
FROM (
  SELECT CAST(o_orderdate AS DATE) AS day, sum(o_totalprice) AS rev
  FROM orders GROUP BY 1
)
"""

QUERIES["q_rolling_median"] = (q_rolling_median, Q_ROLLING_MEDIAN_SQL)


def q_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-k autocorrelation of daily order counts (k = 1, 7, 30):
    the seasonality/persistence diagnostic — a big lag-7 value means
    weekly cycling, lag-1 means day-to-day momentum. Three corr
    aggregates over lag columns from one sorted pass."""
    orders = Catalog(spark, sf_dir).orders
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "n",
        F.lag("n", 1).over(w).alias("l1"),
        F.lag("n", 7).over(w).alias("l7"),
        F.lag("n", 30).over(w).alias("l30"),
    )
    return lagged.agg(
        F.count("n").alias("n_days"),
        _R4(F.corr("n", "l1"), "acf_lag1"),
        _R4(F.corr("n", "l7"), "acf_lag7"),
        _R4(F.corr("n", "l30"), "acf_lag30"),
    )


Q_AUTOCORRELATION_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, CAST(count(*) AS DOUBLE) AS n
  FROM orders GROUP BY 1
), lagged AS (
  SELECT n,
         lag(n, 1) OVER (ORDER BY day) AS l1,
         lag(n, 7) OVER (ORDER BY day) AS l7,
         lag(n, 30) OVER (ORDER BY day) AS l30
  FROM daily
)
SELECT count(n) AS n_days,
       round(corr(n, l1), 4) AS acf_lag1,
       round(corr(n, l7), 4) AS acf_lag7,
       round(corr(n, l30), 4) AS acf_lag30
FROM lagged
"""

QUERIES["q_autocorrelation"] = (q_autocorrelation, Q_AUTOCORRELATION_SQL)


def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical decomposition (STL-lite) of daily order counts:
    trend = centered 7-day rolling mean, seasonal = day-of-week
    mean of the detrended series, residual = remainder. One row
    per component with its variance share — how much of the series
    the calendar explains. All windows run over the bounded daily
    series."""
    orders = Catalog(spark, sf_dir).orders
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    wt = Window.orderBy("day").rowsBetween(-3, 3)
    t = daily.withColumn("trend", F.avg("n").over(wt)).withColumn(
        "detrended", F.col("n") - F.col("trend")
    )
    ws = Window.partitionBy(F.weekday("day"))
    s = t.withColumn("seasonal", F.avg("detrended").over(ws)).withColumn(
        "residual", F.col("detrended") - F.col("seasonal")
    )
    return s.agg(
        F.count(F.lit(1)).alias("n_days"),
        _R4(F.var_samp("n"), "var_total"),
        _R4(F.var_samp("trend"), "var_trend"),
        _R4(F.var_samp("seasonal"), "var_seasonal"),
        _R4(F.var_samp("residual"), "var_residual"),
        _R4(1 - F.var_samp("residual") / F.var_samp("n"), "explained_share"),
    )


Q_SEASONAL_DECOMPOSE_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, CAST(count(*) AS DOUBLE) AS n
  FROM orders GROUP BY 1
), t AS (
  SELECT day, n,
         avg(n) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS trend
  FROM daily
), s AS (
  SELECT day, n, trend, n - trend AS detrended,
         avg(n - trend) OVER (PARTITION BY isodow(day)) AS seasonal
  FROM t
)
SELECT count(*) AS n_days,
       round(var_samp(n), 4) AS var_total,
       round(var_samp(trend), 4) AS var_trend,
       round(var_samp(seasonal), 4) AS var_seasonal,
       round(var_samp(n - trend - seasonal), 4) AS var_residual,
       round(1 - var_samp(n - trend - seasonal) / var_samp(n), 4) AS explained_share
FROM s
"""

QUERIES["q_seasonal_decompose"] = (q_seasonal_decompose, Q_SEASONAL_DECOMPOSE_SQL)


def q_weekly_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly OHLC resample of daily revenue: open (first trading
    day), high, low, close (last day), plus the day count — the
    candlestick contraction every financial downsampler ships,
    done as max-by-struct (open = min(day, value) struct, close =
    max) so there is NO window over the fact rows at all.

    Cents-exact daily rollup, one bounded week aggregate.
    """
    orders = Catalog(spark, sf_dir).orders
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.round(F.sum("o_totalprice") * 100).cast("long").alias("cents")
    )
    wk = daily.withColumn("week", F.date_trunc("week", "day").cast("date"))
    return wk.groupBy("week").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(
            F.min(F.struct("day", "cents"))["cents"] / 100.0, 4
        ).alias("open"),
        F.round(F.max("cents") / 100.0, 4).alias("high"),
        F.round(F.min("cents") / 100.0, 4).alias("low"),
        F.round(
            F.max(F.struct("day", "cents"))["cents"] / 100.0, 4
        ).alias("close"),
    )


Q_WEEKLY_OHLC_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS cents
  FROM orders GROUP BY 1
)
SELECT CAST(date_trunc('week', day) AS DATE) AS week,
       count(*) AS n_days,
       round(arg_min(cents, day) / 100.0, 4) AS open,
       round(max(cents) / 100.0, 4) AS high,
       round(min(cents) / 100.0, 4) AS low,
       round(arg_max(cents, day) / 100.0, 4) AS close
FROM daily GROUP BY 1
"""

QUERIES["q_weekly_ohlc"] = (q_weekly_ohlc, Q_WEEKLY_OHLC_SQL)
