"""Time-series / event operators (SURVEY.md §2.B + as-of/range joins).

Gov telemetry analytics over the ``events`` table: sessionization,
tumbling windows, funnels, retention cohorts, JSON prop extraction,
as-of joins, and banded range joins — the batch mirror of what the
reference schedules as sensor-driven DAGs (``example_sensors.py``,
``example_time_delta_sensor_async.py``) and what
``streaming/events_stream.py`` runs continuously.

Scale stance:
- all window functions partition by ``user_id`` (high-cardinality
  key → even shards; no global ordering anywhere)
- time comparisons use integer microseconds (``unix_micros`` /
  ``epoch_us``) — exact in both engines, no float-epoch drift
- the range join is re-expressed as an equi-join on (user, time
  bucket) + residual filter, so it shuffles instead of falling into
  a broadcast-nested-loop O(n·m) plan
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_gov_spark.io.sources import Catalog

_R4 = lambda c, n: F.round(c, 4).alias(n)  # noqa: E731

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min idle gap) via lag + running
    sum of session-start flags — two windows over the same (user_id,
    ts) partitioning, so Spark sorts each user shard once and reuses
    it. No per-session shuffle: session_id is derived in-partition.
    """
    ev = Catalog(spark, sf_dir).events.select(
        "user_id", "ts", "event_id", "value", F.unix_micros("ts").alias("_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "_new",
        F.when(
            F.col("_us") - F.lag("_us").over(w) > F.lit(SESSION_GAP_US), 1
        ).otherwise(F.when(F.lag("_us").over(w).isNull(), 1).otherwise(0)),
    ).withColumn(
        "session_seq",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("int"),
    )
    return flagged.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        _R4(F.sum("value"), "session_value"),
    )


Q_SESSIONIZE_SQL = """
SELECT user_id, session_seq,
       min(ts) AS session_start,
       max(ts) AS session_end,
       count(*) AS n_events,
       round(sum(value), 4) AS session_value
FROM (
  SELECT user_id, ts, value,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INTEGER) AS session_seq
  FROM (
    SELECT user_id, ts, event_id, value,
           CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     > 1800000000 THEN 1
                WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
                ELSE 0 END AS is_new
    FROM events
  )
)
GROUP BY user_id, session_seq
"""


def q_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type: the batch form of the
    streaming hourly rollup. Pure map-side-combine groupBy on a
    bounded key (hours × types)."""
    ev = Catalog(spark, sf_dir).events
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _R4(F.sum("value"), "total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


Q_TUMBLING_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n_events,
       round(sum(value), 4) AS total_value,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel signup → click → purchase per user, counted.

    ONE scan, one shuffle: stage minima are cascaded window minima
    over the same ``user_id`` partitioning (click_ts = min click at
    or after the user's first signup, purchase_ts = min purchase at
    or after that click), so Spark hashes each user's events once
    and evaluates all three stages in-partition — no per-stage
    self-join back to events, no recomputed subtrees under the
    final counts.
    """
    ev = Catalog(spark, sf_dir).events.select("user_id", "event_type", "ts")
    ev = ev.filter(F.col("event_type").isin("signup", "click", "purchase"))
    w = Window.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "signup_ts",
            F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w),
        )
        .withColumn(
            "click_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") >= F.col("signup_ts")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "purchase_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("click_ts")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.max("signup_ts").alias("signup_ts"),
        F.max("click_ts").alias("click_ts"),
        F.max("purchase_ts").alias("purchase_ts"),
    )
    return per_user.agg(
        F.count("signup_ts").alias("n_signup"),
        F.count("click_ts").alias("n_signup_click"),
        F.count("purchase_ts").alias("n_full_funnel"),
    )


Q_FUNNEL_SQL = """
WITH s1 AS (
  SELECT user_id, min(ts) AS signup_ts FROM events WHERE event_type = 'signup' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, min(e.ts) AS click_ts
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts >= s1.signup_ts
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, min(e.ts) AS purchase_ts
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= s2.click_ts
  GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM s1) AS n_signup,
       (SELECT count(*) FROM s2) AS n_signup_click,
       (SELECT count(*) FROM s3) AS n_full_funnel
"""


def q_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity day, counted
    by day offset (0..7). Two aggregations, one self-join on the
    high-cardinality user key."""
    ev = Catalog(spark, sf_dir).events.select(
        "user_id", F.to_date("ts").alias("day")
    )
    first_day = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    active = ev.distinct()
    return (
        active.join(first_day, "user_id")
        .withColumn("day_offset", F.datediff("day", "cohort_day"))
        .filter(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


Q_RETENTION_SQL = """
WITH fd AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY user_id
), active AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
)
SELECT cohort_day,
       CAST(date_diff('day', cohort_day, day) AS INTEGER) AS day_offset,
       count(DISTINCT user_id) AS n_users
FROM active JOIN fd USING (user_id)
WHERE date_diff('day', cohort_day, day) <= 7
GROUP BY 1, 2
"""


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction + aggregation over events.props —
    the semi-structured path every gov feed needs. get_json_object
    runs JVM-side (no Python); at scale prefer from_json with an
    explicit schema so the parse result is columnar."""
    ev = Catalog(spark, sf_dir).events
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            _R4(F.avg("k"), "avg_k"),
            F.max("k").alias("max_k"),
            F.min("k").alias("min_k"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


Q_JSON_SQL = """
SELECT event_type,
       round(avg(k), 4) AS avg_k,
       max(k) AS max_k,
       min(k) AS min_k,
       count(*) AS n_events
FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k FROM events)
GROUP BY event_type
"""


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every purchase, the latest click by the same
    user strictly-before it (lexicographic (ts, event_id) order).

    Spark-first: instead of an O(n·m) inequality join, union the two
    event streams and take ``last(click_id) IGNORE NULLS`` over a
    rows-frame ending 1 before current — one shuffle on user_id, one
    sort per shard, linear in events. This is the 100 TB-safe as-of
    pattern (same shape Flink/kdb use).
    """
    ev = Catalog(spark, sf_dir).events
    both = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.col("event_type") == "click", F.col("event_id")).alias("_click_id"),
        F.when(F.col("event_type") == "click", F.col("ts")).alias("_click_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        both.withColumn("last_click_id", F.last("_click_id", ignorenulls=True).over(w))
        .withColumn("last_click_ts", F.last("_click_ts", ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "last_click_id", "last_click_ts")
    )


Q_ASOF_SQL = """
SELECT event_id, user_id, ts, last_click_id, last_click_ts
FROM (
  SELECT user_id, ts, event_id, event_type,
         last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_id,
         last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts
  FROM events
  WHERE event_type IN ('click', 'purchase')
)
WHERE event_type = 'purchase'
"""

RANGE_WINDOW_US = 5 * 60 * 1_000_000  # 5 min
_BUCKET_US = RANGE_WINDOW_US  # bucket width == window → 2 candidate buckets


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range join: for each error event, how many events did
    the same user emit in the preceding 5 minutes?

    Spark-first: a raw ``a.ts BETWEEN e.ts - 5min AND e.ts`` join is
    a broadcast-nested-loop — quadratic per user. Re-express as an
    equi-join on (user_id, time_bucket): each probe error explodes
    into its 2 candidate buckets (bucket width = window width), join
    is hash-based, then a residual microsecond filter keeps the
    exact band. Linear shuffle, AQE-splittable.
    """
    ev = Catalog(spark, sf_dir).events.select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("_us")
    )
    probe = (
        ev.filter(F.col("event_type") == "error")
        .select(
            "user_id",
            F.col("event_id").alias("err_id"),
            F.col("_us").alias("err_us"),
            F.explode(
                F.array(
                    (F.col("_us") / _BUCKET_US).cast("long") - 1,
                    (F.col("_us") / _BUCKET_US).cast("long"),
                )
            ).alias("bucket"),
        )
    )
    build = ev.select(
        "user_id",
        F.col("_us").alias("ev_us"),
        (F.col("_us") / _BUCKET_US).cast("long").alias("bucket"),
    )
    hits = (
        probe.join(build, ["user_id", "bucket"])
        .filter(
            (F.col("ev_us") < F.col("err_us"))
            & (F.col("ev_us") >= F.col("err_us") - F.lit(RANGE_WINDOW_US))
        )
        .groupBy("err_id")
        .agg(F.count(F.lit(1)).alias("n_prior_5min"))
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), "user_id"
    )
    return errors.join(hits, "err_id", "left").select(
        "err_id", "user_id", F.coalesce("n_prior_5min", F.lit(0)).alias("n_prior_5min")
    )


Q_RANGE_SQL = """
SELECT e.event_id AS err_id, e.user_id,
       count(a.event_id) AS n_prior_5min
FROM events e
LEFT JOIN events a
  ON a.user_id = e.user_id
 AND epoch_us(a.ts) < epoch_us(e.ts)
 AND epoch_us(a.ts) >= epoch_us(e.ts) - 300000000
WHERE e.event_type = 'error'
GROUP BY e.event_id, e.user_id
"""


QUERIES: dict[str, tuple] = {
    "q_sessionize": (q_sessionize, Q_SESSIONIZE_SQL),
    "q_tumbling_hourly": (q_tumbling_hourly, Q_TUMBLING_SQL),
    "q_funnel": (q_funnel, Q_FUNNEL_SQL),
    "q_retention_cohort": (q_retention_cohort, Q_RETENTION_SQL),
    "q_json_extract": (q_json_extract, Q_JSON_SQL),
    "q_asof_join": (q_asof_join, Q_ASOF_SQL),
    "q_range_join": (q_range_join, Q_RANGE_SQL),
}


def q_first_last_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user first/last event via min/max over (ts, event_id)
    structs — deterministic argmin/argmax in one aggregation pass
    (no window sort), the scalable form of min_by/max_by."""
    ev = Catalog(spark, sf_dir).events
    first_s = F.min(F.struct("ts", "event_id", "event_type")).alias("_f")
    last_s = F.max(F.struct("ts", "event_id", "event_type")).alias("_l")
    return (
        ev.groupBy("user_id")
        .agg(first_s, last_s, F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("_f.event_type").alias("first_type"),
            F.col("_f.ts").alias("first_ts"),
            F.col("_l.event_type").alias("last_type"),
            F.col("_l.ts").alias("last_ts"),
            "n_events",
        )
    )


Q_FIRST_LAST_SQL = """
SELECT user_id,
       (min({'ts': ts, 'event_id': event_id, 'event_type': event_type})).event_type AS first_type,
       (min({'ts': ts, 'event_id': event_id, 'event_type': event_type})).ts AS first_ts,
       (max({'ts': ts, 'event_id': event_id, 'event_type': event_type})).event_type AS last_type,
       (max({'ts': ts, 'event_id': event_id, 'event_type': event_type})).ts AS last_ts,
       count(*) AS n_events
FROM events
GROUP BY user_id
"""


def q_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score outlier counts: events whose value deviates
    >2σ from that user's mean. Two-pass shape expressed as one
    window pass (avg/stddev over the user partition) — the standard
    distributed anomaly sweep; no driver-side stats."""
    ev = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id")
    z = (F.col("value") - F.avg("value").over(w)) / F.stddev("value").over(w)
    return (
        ev.withColumn("_z", z)
        .filter(F.abs("_z") > 2)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_outliers"),
            _R4(F.avg(F.abs(F.col("_z"))), "avg_abs_z"),
        )
    )


Q_VALUE_OUTLIERS_SQL = """
SELECT event_type, count(*) AS n_outliers,
       round(avg(abs(z)), 4) AS avg_abs_z
FROM (
  SELECT event_type,
         (value - avg(value) OVER (PARTITION BY user_id))
           / stddev_samp(value) OVER (PARTITION BY user_id) AS z
  FROM events
)
WHERE abs(z) > 2
GROUP BY event_type
"""


def q_topk_events_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events by value within each event type (window top-k
    with unique tie-break — the grouped-top-k primitive)."""
    ev = Catalog(spark, sf_dir).events
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("event_type", "event_id", "user_id", _R4(F.col("value"), "value"), "rank")
    )


Q_TOPK_EVENTS_SQL = """
SELECT event_type, event_id, user_id, round(value, 4) AS value, rank
FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS INTEGER) AS rank
  FROM events
)
WHERE rank <= 3
"""


QUERIES.update(
    {
        "q_first_last_event": (q_first_last_event, Q_FIRST_LAST_SQL),
        "q_value_outliers": (q_value_outliers, Q_VALUE_OUTLIERS_SQL),
        "q_topk_events_per_type": (q_topk_events_per_type, Q_TOPK_EVENTS_SQL),
    }
)


# fixed-date holidays for the workday calendar (month, day)
_HOLIDAYS = ((1, 1), (7, 4), (12, 25))


def q_workday_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business-calendar aggregation: revenue on workdays only
    (weekends + fixed-date holidays excluded) per year.

    The batch analogue of the reference's custom workday timetable
    (``dags/example_workday_timetable.py`` — its AfterWorkdayTimetable
    schedules runs only after weekdays): the calendar is a pure
    column predicate, evaluated in codegen at the scan, so the
    filter pushes into the parquet read.
    """
    orders = Catalog(spark, sf_dir).orders
    d = F.col("o_orderdate")
    is_weekday = F.weekday(d) < 5  # 0=Mon .. 6=Sun
    is_holiday = F.lit(False)
    for m, day in _HOLIDAYS:
        is_holiday = is_holiday | ((F.month(d) == m) & (F.dayofmonth(d) == day))
    return (
        orders.filter(is_weekday & ~is_holiday)
        .groupBy(F.year(d).alias("year"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _R4(F.sum("o_totalprice"), "workday_revenue"),
        )
    )


Q_WORKDAY_REVENUE_SQL = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS year,
       count(*) AS n_orders,
       round(sum(o_totalprice), 4) AS workday_revenue
FROM orders
WHERE isodow(o_orderdate) <= 5
  AND NOT ((month(o_orderdate) = 1 AND day(o_orderdate) = 1)
        OR (month(o_orderdate) = 7 AND day(o_orderdate) = 4)
        OR (month(o_orderdate) = 12 AND day(o_orderdate) = 25))
GROUP BY 1
"""

QUERIES["q_workday_revenue"] = (q_workday_revenue, Q_WORKDAY_REVENUE_SQL)


def q_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution: for each purchase preceded
    by a click (same user), seconds since the latest prior click —
    aggregated to count/avg/median/p90 per purchase hour-of-day.

    Reuses the as-of union+window shape (one user-sharded sort, no
    inequality join); exact percentiles per bounded group (24
    hours)."""
    ev = Catalog(spark, sf_dir).events
    both = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.col("event_type") == "click", F.unix_micros("ts")).alias("_click_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    latency = (
        both.withColumn("_last_click_us", F.last("_click_us", ignorenulls=True).over(w))
        .filter((F.col("event_type") == "purchase") & F.col("_last_click_us").isNotNull())
        .select(
            F.hour("ts").alias("purchase_hour"),
            ((F.unix_micros("ts") - F.col("_last_click_us")) / 1_000_000.0).alias("_secs"),
        )
    )
    return latency.groupBy("purchase_hour").agg(
        F.count(F.lit(1)).alias("n_conversions"),
        _R4(F.avg("_secs"), "avg_secs"),
        _R4(F.expr("percentile(_secs, 0.5)"), "median_secs"),
        _R4(F.expr("percentile(_secs, 0.9)"), "p90_secs"),
    )


Q_TIME_TO_CONVERT_SQL = """
WITH merged AS (
  SELECT user_id, ts, event_id, event_type,
         last_value(CASE WHEN event_type = 'click' THEN epoch_us(ts) END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_us
  FROM events
  WHERE event_type IN ('click', 'purchase')
), lat AS (
  SELECT CAST(hour(ts) AS INTEGER) AS purchase_hour,
         (epoch_us(ts) - last_click_us) / 1000000.0 AS secs
  FROM merged
  WHERE event_type = 'purchase' AND last_click_us IS NOT NULL
)
SELECT purchase_hour,
       count(*) AS n_conversions,
       round(avg(secs), 4) AS avg_secs,
       round(quantile_cont(secs, 0.5), 4) AS median_secs,
       round(quantile_cont(secs, 0.9), 4) AS p90_secs
FROM lat
GROUP BY purchase_hour
"""

QUERIES["q_time_to_convert"] = (q_time_to_convert, Q_TIME_TO_CONVERT_SQL)


_REPORT_TZ = "America/New_York"


def q_timezone_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-calendar rollup: events stored in UTC, reported by the
    agency's LOCAL business day and peak-hours band (the classic
    gov-reporting requirement — a UTC day boundary splits local
    evenings across the wrong day).

    ``convert_timezone`` is pure codegen; the rollup is one
    map-side-combined groupBy on (local day, band). The DuckDB twin
    nests timezone() twice so neither engine's session timezone can
    leak into the result.
    """
    ev = Catalog(spark, sf_dir).events
    local = F.convert_timezone(F.lit("UTC"), F.lit(_REPORT_TZ), F.col("ts"))
    band = (
        F.when(F.hour(local).between(9, 16), "business")
        .when(F.hour(local).between(17, 22), "evening")
        .otherwise("off_hours")
    )
    return (
        ev.select(F.to_date(local).alias("local_day"), band.alias("band"), "value")
        .groupBy("local_day", "band")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _R4(F.sum("value"), "total_value"),
        )
    )


Q_TIMEZONE_ROLLUP_SQL = f"""
SELECT CAST(local_ts AS DATE) AS local_day,
       CASE WHEN hour(local_ts) BETWEEN 9 AND 16 THEN 'business'
            WHEN hour(local_ts) BETWEEN 17 AND 22 THEN 'evening'
            ELSE 'off_hours' END AS band,
       count(*) AS n_events,
       round(sum(value), 4) AS total_value
FROM (
  SELECT timezone('{_REPORT_TZ}', timezone('UTC', ts)) AS local_ts, value
  FROM events
)
GROUP BY 1, 2
"""

QUERIES["q_timezone_rollup"] = (q_timezone_rollup, Q_TIMEZONE_ROLLUP_SQL)


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order journey model: the event-type transition matrix
    (prev_type → type) across all user timelines, with per-source-
    state transition probabilities. One lag() over the (user, ts)
    partitioning, one bounded-key aggregate — the Markov-chain
    extraction every funnel/attribution analysis starts from."""
    ev = Catalog(spark, sf_dir).events.select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    w_src = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n_transitions",
        _R4(
            F.col("n_transitions") / F.sum("n_transitions").over(w_src),
            "p_transition",
        ),
    )


Q_EVENT_TRANSITIONS_SQL = """
WITH pairs AS (
  SELECT prev_type, event_type AS next_type, count(*) AS n_transitions
  FROM (
    SELECT event_type,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
    FROM events
  )
  WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT prev_type, next_type, n_transitions,
       round(n_transitions / CAST(sum(n_transitions) OVER (PARTITION BY prev_type) AS DOUBLE), 4) AS p_transition
FROM pairs
"""

QUERIES["q_event_transitions"] = (q_event_transitions, Q_EVENT_TRANSITIONS_SQL)


def q_order_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backlog (open-order inventory) reconstruction over time: an
    order opens at o_orderdate and completes when its LAST line
    ships; daily backlog = cumulative opens − cumulative completes.

    Event-sourcing state rebuilt from two bounded daily aggregates +
    one cumulative window over the (small) daily series — the fact
    tables are never windowed. Reported monthly (last day of month)
    to keep the output compact."""
    cat = Catalog(spark, sf_dir)
    opens = cat.orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("n_open")
    )
    dones = (
        cat.lineitem.groupBy("l_orderkey")
        .agg(F.max(F.to_date("l_shipdate")).alias("done_day"))
        .groupBy(F.col("done_day").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_done"))
    )
    daily = (
        opens.join(dones, "day", "full_outer")
        .select(
            "day",
            F.coalesce("n_open", F.lit(0)).alias("n_open"),
            F.coalesce("n_done", F.lit(0)).alias("n_done"),
        )
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    run = daily.withColumn(
        "backlog", F.sum(F.col("n_open") - F.col("n_done")).over(w)
    )
    wm = Window.partitionBy(F.date_trunc("month", "day")).orderBy(F.desc("day"))
    return (
        run.withColumn("_rn", F.row_number().over(wm))
        .filter(F.col("_rn") == 1)
        .select(
            F.date_trunc("month", "day").cast("date").alias("month"),
            F.col("day").alias("month_end_day"),
            "backlog",
        )
    )


Q_ORDER_BACKLOG_SQL = """
WITH opens AS (
  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_open FROM orders GROUP BY 1
), dones AS (
  SELECT day, count(*) AS n_done FROM (
    SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS day FROM lineitem GROUP BY 1
  ) GROUP BY 1
), daily AS (
  SELECT coalesce(o.day, d.day) AS day,
         coalesce(n_open, 0) AS n_open, coalesce(n_done, 0) AS n_done
  FROM opens o FULL OUTER JOIN dones d ON o.day = d.day
), run AS (
  SELECT day,
         CAST(sum(n_open - n_done) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS backlog
  FROM daily
)
SELECT CAST(date_trunc('month', day) AS DATE) AS month,
       max(day) AS month_end_day,
       max_by(backlog, day) AS backlog
FROM run
GROUP BY 1
"""

QUERIES["q_order_backlog"] = (q_order_backlog, Q_ORDER_BACKLOG_SQL)


def q_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per day via the sweep line: every session
    contributes (+1 at start, −1 after end); the running sum over
    time-ordered deltas IS the number of simultaneously open
    sessions. The sweep runs over session endpoints (2 rows per
    session — orders of magnitude smaller than events); at 100 TB
    the global cumsum becomes the standard two-pass prefix sum
    (per-partition totals, then carry-in), same algebra."""
    sessions = q_sessionize(spark, sf_dir).select("session_start", "session_end")
    deltas = sessions.select(
        F.col("session_start").alias("at"), F.lit(1).alias("d")
    ).unionAll(
        sessions.select(F.col("session_end").alias("at"), F.lit(-1).alias("d"))
    )
    agg = deltas.groupBy("at").agg(F.sum("d").alias("d"))
    # the global cumsum IS the two-pass prefix sum: per-range-slice
    # totals lift via ranged_global_rank's offset ledger (exact —
    # d is integral), never one partition
    from etl_gov_spark.operators.ranks import ranged_global_rank

    live = ranged_global_rank(
        agg, [F.asc("at")], rank_col=None, running_longs={"live": "d"}
    )
    return (
        live.groupBy(F.to_date("at").alias("day"))
        .agg(F.max("live").alias("peak_concurrent"))
    )


Q_CONCURRENT_SESSIONS_SQL = f"""
WITH sessions AS (
  SELECT user_id, session_seq, min(ts) AS session_start, max(ts) AS session_end
  FROM (
    SELECT user_id, ts, event_id,
           sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
    FROM (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > {SESSION_GAP_US} THEN 1
                  WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
                  ELSE 0 END AS is_new
      FROM events
    )
  )
  GROUP BY user_id, session_seq
), deltas AS (
  SELECT at, sum(d) AS d FROM (
    SELECT session_start AS at, 1 AS d FROM sessions
    UNION ALL
    SELECT session_end AS at, -1 AS d FROM sessions
  ) GROUP BY at
), live AS (
  SELECT at, CAST(sum(d) OVER (ORDER BY at
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS live
  FROM deltas
)
SELECT CAST(at AS DATE) AS day, max(live) AS peak_concurrent
FROM live
GROUP BY 1
"""

QUERIES["q_concurrent_sessions"] = (q_concurrent_sessions, Q_CONCURRENT_SESSIONS_SQL)


_FUNNEL_WINDOW_DAYS = 7


def q_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded funnel: click within 7 days of first signup,
    purchase within 7 days of that click — the production funnel
    semantics (unbounded funnels overcount forever). Same
    single-scan cascaded-window shape as q_funnel with the
    time-bound predicate added to each stage condition."""
    ev = Catalog(spark, sf_dir).events.select("user_id", "event_type", "ts")
    ev = ev.filter(F.col("event_type").isin("signup", "click", "purchase"))
    bound = F.expr(f"INTERVAL {_FUNNEL_WINDOW_DAYS} DAYS")
    w = Window.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "signup_ts",
            F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w),
        )
        .withColumn(
            "click_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") >= F.col("signup_ts"))
                    & (F.col("ts") <= F.col("signup_ts") + bound),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "purchase_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("click_ts"))
                    & (F.col("ts") <= F.col("click_ts") + bound),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.max("signup_ts").alias("signup_ts"),
        F.max("click_ts").alias("click_ts"),
        F.max("purchase_ts").alias("purchase_ts"),
    )
    return per_user.agg(
        F.count("signup_ts").alias("n_signup"),
        F.count("click_ts").alias("n_click_7d"),
        F.count("purchase_ts").alias("n_purchase_7d"),
    )


Q_FUNNEL_WINDOWED_SQL = f"""
WITH s1 AS (
  SELECT user_id, min(ts) AS signup_ts FROM events WHERE event_type = 'signup' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, min(e.ts) AS click_ts
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts >= s1.signup_ts
    AND e.ts <= s1.signup_ts + INTERVAL {_FUNNEL_WINDOW_DAYS} DAY
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, min(e.ts) AS purchase_ts
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= s2.click_ts
    AND e.ts <= s2.click_ts + INTERVAL {_FUNNEL_WINDOW_DAYS} DAY
  GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM s1) AS n_signup,
       (SELECT count(*) FROM s2) AS n_click_7d,
       (SELECT count(*) FROM s3) AS n_purchase_7d
"""

QUERIES["q_funnel_windowed"] = (q_funnel_windowed, Q_FUNNEL_WINDOWED_SQL)


def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users split new vs returning (first-seen day
    comparison) — the growth-accounting daily. Two aggregates over
    the user key; the daily rollup is bounded (days × 2 rows)."""
    ev = Catalog(spark, sf_dir).events.select(
        "user_id", F.to_date("ts").alias("day")
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("first_day"))
    active = ev.distinct()
    return (
        active.join(first, "user_id")
        .groupBy("day")
        .agg(
            F.sum((F.col("day") == F.col("first_day")).cast("int")).alias("new_users"),
            F.sum((F.col("day") > F.col("first_day")).cast("int")).alias(
                "returning_users"
            ),
        )
    )


Q_NEW_VS_RETURNING_SQL = """
WITH first AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS first_day FROM events GROUP BY user_id
), active AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
)
SELECT day,
       CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
       CAST(sum(CASE WHEN day > first_day THEN 1 ELSE 0 END) AS BIGINT) AS returning_users
FROM active JOIN first USING (user_id)
GROUP BY day
"""

QUERIES["q_new_vs_returning"] = (q_new_vs_returning, Q_NEW_VS_RETURNING_SQL)


def q_repeat_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase interval distribution: per event type, the
    median and p90 hours between a user's consecutive events of
    that type — the repeat-behavior profile behind churn models.
    One lag window per (user, type) shard, exact percentiles over
    the bounded type key."""
    ev = Catalog(spark, sf_dir).events.select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = (
        ev.withColumn("_prev", F.lag(F.unix_micros("ts")).over(w))
        .filter(F.col("_prev").isNotNull())
        .select(
            "event_type",
            ((F.unix_micros("ts") - F.col("_prev")) / 3_600_000_000.0).alias("_h"),
        )
    )
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        _R4(F.expr("percentile(_h, 0.5)"), "median_hours"),
        _R4(F.expr("percentile(_h, 0.9)"), "p90_hours"),
        _R4(F.avg("_h"), "mean_hours"),
    )


Q_REPEAT_INTERVAL_SQL = """
WITH gaps AS (
  SELECT event_type,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
              ORDER BY ts, event_id)) / 3600000000.0 AS h
  FROM events
)
SELECT event_type, count(*) AS n_intervals,
       round(quantile_cont(h, 0.5), 4) AS median_hours,
       round(quantile_cont(h, 0.9), 4) AS p90_hours,
       round(avg(h), 4) AS mean_hours
FROM gaps WHERE h IS NOT NULL
GROUP BY event_type
"""

QUERIES["q_repeat_interval"] = (q_repeat_interval, Q_REPEAT_INTERVAL_SQL)


def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curve: cumulative value per signup-cohort week as
    cohorts age (weeks 0..4) — retention's money-weighted sibling.
    Two aggregates + one cumulative window over the (bounded)
    cohort × age grid."""
    ev = Catalog(spark, sf_dir).events.select(
        "user_id", F.to_date("ts").alias("day"), "value"
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("first_day"))
    aged = (
        ev.join(first, "user_id")
        .withColumn(
            "cohort_week", F.date_trunc("week", "first_day").cast("date")
        )
        .withColumn(
            "age_week", F.floor(F.datediff("day", "first_day") / 7).cast("int")
        )
        .filter(F.col("age_week") <= 4)
    )
    per = aged.groupBy("cohort_week", "age_week").agg(
        F.sum("value").alias("week_value"),
        F.countDistinct("user_id").alias("active_users"),
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("age_week")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return per.select(
        "cohort_week",
        "age_week",
        "active_users",
        _R4(F.col("week_value"), "week_value"),
        _R4(F.sum("week_value").over(w), "cumulative_ltv"),
    )


Q_COHORT_LTV_SQL = """
WITH first AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS first_day FROM events GROUP BY user_id
), aged AS (
  SELECT e.user_id, e.value,
         CAST(date_trunc('week', f.first_day) AS DATE) AS cohort_week,
         CAST(floor(date_diff('day', f.first_day, CAST(e.ts AS DATE)) / 7) AS INTEGER) AS age_week
  FROM events e JOIN first f USING (user_id)
), per AS (
  SELECT cohort_week, age_week, sum(value) AS week_value,
         count(DISTINCT user_id) AS active_users
  FROM aged WHERE age_week <= 4 GROUP BY 1, 2
)
SELECT cohort_week, age_week, active_users,
       round(week_value, 4) AS week_value,
       round(sum(week_value) OVER (PARTITION BY cohort_week ORDER BY age_week
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS cumulative_ltv
FROM per
"""

QUERIES["q_cohort_ltv"] = (q_cohort_ltv, Q_COHORT_LTV_SQL)


def q_event_disorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-orderness audit — the input that SIZES a streaming
    watermark: per event type, how many events arrive with an event
    time older than something already seen, and how late (avg / p95 /
    max seconds behind the running high-water mark). A watermark
    below the observed p95 lateness silently drops that tail; one
    far above it holds state for no reason.

    Arrival order is the generation sequence (event_id); the running
    high-water mark is computed PER USER (bounded partitions — a
    global arrival sort would single-thread the corpus at scale; the
    per-entity disorder profile is the scalable proxy and the one
    per-key stateful operators actually experience)."""
    ev = Catalog(spark, sf_dir).events.select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("_us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    late = ev.withColumn(
        "late_s", (F.max("_us").over(w) - F.col("_us")) / 1_000_000.0
    )
    return late.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("late_s") > 0).cast("long")).alias("n_late"),
        _R4(F.avg("late_s"), "avg_late_s"),
        _R4(F.percentile("late_s", F.lit(0.95)), "p95_late_s"),
        _R4(F.max("late_s"), "max_late_s"),
    )


Q_EVENT_DISORDER_SQL = """
WITH late AS (
  SELECT event_type,
         (max(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          - epoch_us(ts)) / 1000000.0 AS late_s
  FROM events
)
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CASE WHEN late_s > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       round(avg(late_s), 4) AS avg_late_s,
       round(quantile_cont(late_s, 0.95), 4) AS p95_late_s,
       round(max(late_s), 4) AS max_late_s
FROM late
GROUP BY event_type
"""

QUERIES["q_event_disorder"] = (q_event_disorder, Q_EVENT_DISORDER_SQL)


ASOF_NEAREST_TOL_US = 10 * 60 * 1_000_000  # 10 min


def q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-as-of join with tolerance (pandas merge_asof
    direction='nearest'): for every purchase, the closest click by
    the same user within ±10 min — backward wins ties. The variant
    sensor/trade pipelines actually need when the matching reading
    may land on either side of the anchor.

    Spark-first: same union + window-frame shape as q_asof_join —
    the backward candidate is ``last IGNORE NULLS`` over the
    preceding frame, the forward candidate ``first IGNORE NULLS``
    over the following frame, both over ONE (user, ts, event_id)
    sort; nearest-pick is a row-local comparison. One shuffle,
    linear — never an inequality join.
    """
    ev = Catalog(spark, sf_dir).events
    both = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.col("event_type") == "click", F.col("event_id")).alias("_cid"),
        F.when(F.col("event_type") == "click", F.unix_micros("ts")).alias("_cus"),
    )
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wb = base.rowsBetween(Window.unboundedPreceding, -1)
    wf = base.rowsBetween(1, Window.unboundedFollowing)
    cand = (
        both.withColumn("_us", F.unix_micros("ts"))
        .withColumn("back_id", F.last("_cid", ignorenulls=True).over(wb))
        .withColumn("back_us", F.last("_cus", ignorenulls=True).over(wb))
        .withColumn("fwd_id", F.first("_cid", ignorenulls=True).over(wf))
        .withColumn("fwd_us", F.first("_cus", ignorenulls=True).over(wf))
        .filter(F.col("event_type") == "purchase")
    )
    d_back = F.col("_us") - F.col("back_us")
    d_fwd = F.col("fwd_us") - F.col("_us")
    back_ok = F.col("back_us").isNotNull() & (d_back <= ASOF_NEAREST_TOL_US)
    fwd_ok = F.col("fwd_us").isNotNull() & (d_fwd <= ASOF_NEAREST_TOL_US)
    use_back = back_ok & (~fwd_ok | (d_back <= d_fwd))
    picked = cand.select(
        "event_id",
        "user_id",
        "ts",
        F.when(use_back, F.col("back_id"))
        .when(fwd_ok, F.col("fwd_id"))
        .alias("nearest_click_id"),
        F.when(use_back, F.lit("backward"))
        .when(fwd_ok, F.lit("forward"))
        .alias("direction"),
        _R4(
            F.when(use_back, d_back).when(fwd_ok, d_fwd) / 1_000_000.0,
            "delta_s",
        ),
    )
    return picked


Q_ASOF_NEAREST_SQL = f"""
WITH bp AS (
  SELECT user_id, ts, event_id, event_type, epoch_us(ts) AS us,
         last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS back_id,
         last_value(CASE WHEN event_type = 'click' THEN epoch_us(ts) END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS back_us,
         first_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS fwd_id,
         first_value(CASE WHEN event_type = 'click' THEN epoch_us(ts) END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS fwd_us
  FROM events
  WHERE event_type IN ('click', 'purchase')
)
SELECT event_id, user_id, ts,
       CASE WHEN use_back THEN back_id WHEN fwd_ok THEN fwd_id END AS nearest_click_id,
       CASE WHEN use_back THEN 'backward' WHEN fwd_ok THEN 'forward' END AS direction,
       round(CASE WHEN use_back THEN us - back_us WHEN fwd_ok THEN fwd_us - us END
             / 1000000.0, 4) AS delta_s
FROM (
  SELECT *,
         back_us IS NOT NULL AND us - back_us <= {ASOF_NEAREST_TOL_US} AS back_ok,
         fwd_us IS NOT NULL AND fwd_us - us <= {ASOF_NEAREST_TOL_US} AS fwd_ok,
         (back_us IS NOT NULL AND us - back_us <= {ASOF_NEAREST_TOL_US})
           AND (NOT (fwd_us IS NOT NULL AND fwd_us - us <= {ASOF_NEAREST_TOL_US})
                OR us - back_us <= fwd_us - us) AS use_back
  FROM bp
)
WHERE event_type = 'purchase'
"""

QUERIES["q_asof_nearest"] = (q_asof_nearest, Q_ASOF_NEAREST_SQL)


# (pattern_name, regex) over per-user journey strings built from
# event-type initials (s/e/c/v/p are distinct). Kept to RE2-safe
# syntax (classes, +, *, {m,}) so Java and RE2 regex agree exactly.
EVENT_PATTERNS = (
    ("signup_then_purchase", "s.*p"),
    ("view_to_purchase_direct", "vp"),
    ("error_retry_run", "e[ec]*e"),
    ("browse_loop", "(vc){2,}"),
)


def q_event_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence pattern matching without the
    clause (Spark has none): each user's event history collapses to
    a journey string of event-type initials — one per-user
    shuffle-sort, identical to the sessionize layout — and the
    pattern tier is plain regex over that string, counted with
    leftmost non-overlapping semantics in both engines.

    At scale the journey string is the right representation: the
    state machine runs per user in one pass, patterns are data (a
    broadcast literal — adding one costs nothing), and the string
    is bounded by the user's event count, the same bound any
    sequence operator carries. Output: per pattern, how many users
    match and total match occurrences.
    """
    ev = Catalog(spark, sf_dir).events.select(
        "user_id",
        F.struct("ts", "event_id", F.substring("event_type", 1, 1).alias("i")).alias(
            "s"
        ),
    )
    journeys = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list("s")), lambda s: s["i"]), ""
        ).alias("j")
    )
    pats = F.array(
        *[
            F.struct(F.lit(n).alias("pattern"), F.lit(rx).alias("rx"))
            for n, rx in EVENT_PATTERNS
        ]
    )
    per_user = journeys.select(
        "j", F.explode(pats).alias("p")
    ).select(
        F.col("p.pattern").alias("pattern"),
        F.size(F.regexp_extract_all("j", F.col("p.rx"), F.lit(0))).alias("m"),
    )
    return per_user.groupBy("pattern").agg(
        F.sum(F.when(F.col("m") > 0, 1).otherwise(0)).alias("n_users"),
        F.sum("m").alias("n_matches"),
    )


_PATTERN_VALUES = ", ".join(f"('{n}', '{rx}')" for n, rx in EVENT_PATTERNS)

Q_EVENT_PATTERN_MATCH_SQL = f"""
WITH journeys AS (
  SELECT user_id,
         string_agg(substring(event_type, 1, 1), '' ORDER BY ts, event_id) AS j
  FROM events GROUP BY user_id
), m AS (
  SELECT p.pattern, len(regexp_extract_all(j.j, p.rx)) AS m
  FROM journeys j CROSS JOIN (VALUES {_PATTERN_VALUES}) p(pattern, rx)
)
SELECT pattern,
       CAST(sum(CASE WHEN m > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_users,
       CAST(sum(m) AS BIGINT) AS n_matches
FROM m GROUP BY pattern
"""

QUERIES["q_event_pattern_match"] = (q_event_pattern_match, Q_EVENT_PATTERN_MATCH_SQL)


def q_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics through the VARIANT type (Spark 4):
    ``parse_json`` once into the binary VARIANT encoding, then typed
    path extraction with ``try_variant_get`` — the shredded-JSON
    path that replaces per-path string re-parsing
    (q_json_extract's get_json_object re-parses the JSON text for
    every path it pulls; VARIANT parses once and serves every
    extraction from the binary form — the difference between O(paths)
    and O(1) parses per row on a 100 TB props column).

    Output: per (event_type, k-decade band) counts + mean k, the
    standard shredded-property rollup.
    """
    ev = Catalog(spark, sf_dir).events.select(
        "event_type", F.parse_json("props").alias("vp")
    )
    shred = ev.select(
        "event_type", F.try_variant_get("vp", "$.k", "int").alias("k")
    ).filter(F.col("k").isNotNull())
    return shred.groupBy(
        "event_type",
        (F.floor(F.col("k") / 10) * 10).cast("int").alias("k_band"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.avg("k"), 4).alias("avg_k"),
    )


Q_VARIANT_SHRED_SQL = """
SELECT event_type,
       CAST(floor(CAST(json_extract_string(props, '$.k') AS INTEGER) / 10) * 10 AS INTEGER) AS k_band,
       count(*) AS n_events,
       round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k
FROM events
WHERE json_extract_string(props, '$.k') IS NOT NULL
GROUP BY 1, 2
"""

QUERIES["q_variant_shred"] = (q_variant_shred, Q_VARIANT_SHRED_SQL)


def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution — first-touch vs last-touch revenue
    allocation per channel: every purchase's value is credited to
    the first and to the latest preceding non-purchase event
    (channel) of the same user. The as-of machinery again
    (union + one running window per user, the timeseries.py house
    pattern — never a per-purchase inequality join, which is a BNLJ
    at scale), but run in BOTH directions in one pass: running
    last-non-purchase and running first-non-purchase.

    Output per channel: purchases credited, last-touch and
    first-touch revenue — the two columns whose disagreement is the
    whole attribution debate.
    """
    ev = Catalog(spark, sf_dir).events.select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    chan = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        F.last(chan, ignorenulls=True).over(w).alias("last_ch"),
        F.first(chan, ignorenulls=True).over(w).alias("first_ch"),
    )
    pur = tagged.filter(F.col("event_type") == "purchase")
    return (
        pur.groupBy(F.coalesce("last_ch", F.lit("none")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_last_touch"),
            F.round(F.sum("value"), 4).alias("rev_last_touch"),
        )
        .join(
            pur.groupBy(F.coalesce("first_ch", F.lit("none")).alias("channel")).agg(
                F.round(F.sum("value"), 4).alias("rev_first_touch")
            ),
            "channel",
            "full",
        )
        .select(
            "channel",
            F.coalesce("n_last_touch", F.lit(0)).alias("n_last_touch"),
            F.coalesce("rev_last_touch", F.lit(0.0)).alias("rev_last_touch"),
            F.coalesce("rev_first_touch", F.lit(0.0)).alias("rev_first_touch"),
        )
    )


Q_ATTRIBUTION_LAST_TOUCH_SQL = """
WITH tagged AS (
  SELECT user_id, ts, event_type, value,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_ch,
         first_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_ch
  FROM events
), pur AS (SELECT * FROM tagged WHERE event_type = 'purchase'),
lt AS (
  SELECT coalesce(last_ch, 'none') AS channel,
         count(*) AS n_last_touch, round(sum(value), 4) AS rev_last_touch
  FROM pur GROUP BY 1
), ft AS (
  SELECT coalesce(first_ch, 'none') AS channel,
         round(sum(value), 4) AS rev_first_touch
  FROM pur GROUP BY 1
)
SELECT coalesce(lt.channel, ft.channel) AS channel,
       coalesce(n_last_touch, 0) AS n_last_touch,
       coalesce(rev_last_touch, 0.0) AS rev_last_touch,
       coalesce(rev_first_touch, 0.0) AS rev_first_touch
FROM lt FULL OUTER JOIN ft ON lt.channel = ft.channel
"""

QUERIES["q_attribution_last_touch"] = (
    q_attribution_last_touch,
    Q_ATTRIBUTION_LAST_TOUCH_SQL,
)


DECAY_HALF_LIFE_DAYS = 30.0


def q_engagement_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed engagement score per user —
    the recency-weighted ranking feature every personalization /
    risk pipeline computes: score = Σ value · 2^(−age_days/half-life)
    with age measured from the corpus max timestamp (one scalar,
    broadcast). Top-20 users, rank on the 4-dp-rounded score with
    user_id tie-break so the cutoff is engine-stable.

    One scan + one bounded-key aggregate; the decay is pure codegen
    arithmetic (no window — age is per-row against a scalar)."""
    ev = Catalog(spark, sf_dir).events.select("user_id", "ts", "value")
    mx = ev.agg(F.max("ts").alias("mx"))
    age_days = (
        F.col("mx").cast("double") - F.col("ts").cast("double")
    ) / 86400.0
    scored = (
        ev.crossJoin(F.broadcast(mx))
        .select(
            "user_id",
            (F.col("value") * F.pow(2.0, -age_days / DECAY_HALF_LIFE_DAYS)).alias(
                "w"
            ),
        )
        .groupBy("user_id")
        .agg(F.round(F.sum("w"), 4).alias("decayed_score"))
    )
    # distributed top-k, rank re-derived on the 20 survivors
    w = [F.desc("decayed_score"), F.asc("user_id")]
    return (
        scored.orderBy(*w)
        .limit(20)
        .withColumn("rank", F.row_number().over(Window.orderBy(*w)).cast("int"))
        .select("user_id", "decayed_score", "rank")
    )


Q_ENGAGEMENT_DECAY_SQL = f"""
WITH mx AS (SELECT max(ts) AS m FROM events),
scored AS (
  SELECT user_id,
         round(sum(value * pow(2.0,
               -(epoch(m) - epoch(ts)) / 86400.0 / {DECAY_HALF_LIFE_DAYS!r})), 4)
           AS decayed_score
  FROM events, mx GROUP BY user_id
)
SELECT user_id, decayed_score, rank
FROM (
  SELECT *, CAST(row_number() OVER (ORDER BY decayed_score DESC, user_id ASC) AS INTEGER) AS rank
  FROM scored
)
WHERE rank <= 20
"""

QUERIES["q_engagement_decay"] = (q_engagement_decay, Q_ENGAGEMENT_DECAY_SQL)


TOP_P = 0.9


def q_user_nucleus_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-p (nucleus) behavioral profile: per user, the size of
    the smallest event-type set covering ≥90% of their events —
    1 = monomaniac, 5 = uniform. The distribution of nucleus sizes
    is a one-line behavioral-diversity profile of the whole user
    base (the top-p idea applied to activity profiling).

    Per-user shares sort over ≤5 rows (bounded by the type
    vocabulary, not by events); nucleus size = rows whose EXCLUSIVE
    prefix share is still < p, computed with one ordered window per
    user over those ≤5 rows."""
    ev = Catalog(spark, sf_dir).events.select("user_id", "event_type")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    tot = Window.partitionBy("user_id")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("n"), F.asc("event_type"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sized = counts.select(
        "user_id",
        (
            F.coalesce(F.sum("n").over(w), F.lit(0))
            / F.sum("n").over(tot)
        ).alias("prefix_share"),
    )
    nucleus = sized.filter(F.col("prefix_share") < TOP_P).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("nucleus_size")
    )
    return nucleus.groupBy("nucleus_size").agg(
        F.count(F.lit(1)).alias("n_users")
    )


Q_USER_NUCLEUS_SQL = f"""
WITH counts AS (
  SELECT user_id, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
), sized AS (
  SELECT user_id,
         coalesce(sum(n) OVER (PARTITION BY user_id
                               ORDER BY n DESC, event_type ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           / CAST(sum(n) OVER (PARTITION BY user_id) AS DOUBLE) AS prefix_share
  FROM counts
), nucleus AS (
  SELECT user_id, count(*) AS nucleus_size
  FROM sized WHERE prefix_share < {TOP_P!r} GROUP BY user_id
)
SELECT nucleus_size, count(*) AS n_users FROM nucleus GROUP BY nucleus_size
"""

QUERIES["q_user_nucleus_types"] = (q_user_nucleus_types, Q_USER_NUCLEUS_SQL)


def q_login_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: longest consecutive-active-day streak per
    user, histogrammed. The classic `date − row_number` trick: dedup
    to (user, day), number days per user, group by the constant
    `day − rn` island key — streak length falls out as a count.

    Scale: the only window partitions by ``user_id`` over at most
    |distinct days| rows per user (the per-day dedup happens first,
    map-side combinable), and the final histogram is a bounded-key
    aggregate. No joins, two shuffles total at any scale.
    """
    ev = Catalog(spark, sf_dir).events.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    islands = ev.withColumn(
        "grp", F.date_sub("day", F.row_number().over(w))
    )
    streaks = islands.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("len")
    )
    best = streaks.groupBy("user_id").agg(F.max("len").alias("max_streak"))
    return best.groupBy("max_streak").agg(F.count(F.lit(1)).alias("n_users"))


Q_LOGIN_STREAKS_SQL = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), islands AS (
  SELECT user_id,
         day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
                    AS INTEGER) AS grp
  FROM days
), streaks AS (
  SELECT user_id, grp, count(*) AS len FROM islands GROUP BY 1, 2
), best AS (
  SELECT user_id, max(len) AS max_streak FROM streaks GROUP BY user_id
)
SELECT max_streak, count(*) AS n_users FROM best GROUP BY max_streak
"""

QUERIES["q_login_streaks"] = (q_login_streaks, Q_LOGIN_STREAKS_SQL)


def q_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-burst screen per event type: flag hours whose event
    count exceeds μ + 3σ of that type's hourly series, report the
    burst census (n_hours, n_bursts, peak rate, peak-to-mean).

    Counts are integers, so μ and σ are bit-identical across
    engines — the threshold comparison can't drift. Two grouped
    aggregates over (type, hour) then (type): the fact table is
    scanned once; the hourly matrix is bounded (|types|·|hours|).
    """
    ev = Catalog(spark, sf_dir).events.select(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    )
    hourly = ev.groupBy("event_type", "hour").agg(
        F.count(F.lit(1)).alias("c")
    )
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.avg("c").alias("mu"),
        F.stddev_pop("c").alias("sigma"),
        F.max("c").alias("peak"),
    )
    flagged = hourly.join(F.broadcast(stats), "event_type").filter(
        F.col("c") > F.col("mu") + 3 * F.col("sigma")
    )
    bursts = flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_bursts")
    )
    return stats.join(bursts, "event_type", "left").select(
        "event_type",
        "n_hours",
        F.coalesce("n_bursts", F.lit(0)).alias("n_bursts"),
        "peak",
        _R4(F.col("mu"), "mean_rate"),
        _R4(F.col("peak") / F.col("mu"), "peak_to_mean"),
    )


Q_BURST_DETECTION_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS c
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT event_type, count(*) AS n_hours, avg(c) AS mu,
         stddev_pop(c) AS sigma, max(c) AS peak
  FROM hourly GROUP BY event_type
), bursts AS (
  SELECT h.event_type, count(*) AS n_bursts
  FROM hourly h JOIN stats s USING (event_type)
  WHERE h.c > s.mu + 3 * s.sigma
  GROUP BY h.event_type
)
SELECT s.event_type, s.n_hours,
       coalesce(b.n_bursts, 0) AS n_bursts,
       CAST(s.peak AS BIGINT) AS peak,
       round(s.mu, 4) AS mean_rate,
       round(s.peak / s.mu, 4) AS peak_to_mean
FROM stats s LEFT JOIN bursts b USING (event_type)
"""

QUERIES["q_burst_detection"] = (q_burst_detection, Q_BURST_DETECTION_SQL)


_ACTIVE_WINDOW_US = 5 * 60 * 1_000_000  # each event covers 5 minutes


def q_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-union coverage: treat each event as a 5-minute
    activity interval and merge overlapping intervals per user —
    total covered time and span count, histogrammed by span count.
    The overlap-aware sibling of gap-sessionization (a long busy
    stretch of back-to-back events is ONE span no matter how many
    events it holds).

    Classic running-max island trick: a new span starts where the
    start exceeds the running max of all previous ends. Integer
    microseconds end to end — exact in both engines. One window per
    user over that user's events, then bounded aggregates.
    """
    ev = Catalog(spark, sf_dir).events.select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + _ACTIVE_WINDOW_US).alias("e"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("s", "event_id")
    prev_max = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = ev.withColumn(
        "new_span",
        F.when(prev_max.isNull() | (F.col("s") > prev_max), 1).otherwise(0),
    ).withColumn("span", F.sum("new_span").over(w))
    spans = flagged.groupBy("user_id", "span").agg(
        F.min("s").alias("s0"), F.max("e").alias("e1")
    )
    per_user = spans.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("e1") - F.col("s0")).alias("cov_us"),
    )
    return per_user.groupBy("n_spans").agg(
        F.count(F.lit(1)).alias("n_users"),
        _R4(F.avg(F.col("cov_us") / 60_000_000.0), "avg_covered_min"),
    )


Q_INTERVAL_UNION_SQL = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + {_ACTIVE_WINDOW_US} AS e,
         event_id
  FROM events
), flagged AS (
  SELECT user_id, s, e, event_id,
         CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   IS NULL
              OR s > max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_span
  FROM ev
), numbered AS (
  SELECT user_id, s, e,
         sum(new_span) OVER (PARTITION BY user_id ORDER BY s, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span
  FROM flagged
), spans AS (
  SELECT user_id, span, min(s) AS s0, max(e) AS e1
  FROM numbered GROUP BY 1, 2
), per_user AS (
  SELECT user_id, count(*) AS n_spans, sum(e1 - s0) AS cov_us
  FROM spans GROUP BY user_id
)
SELECT n_spans, count(*) AS n_users,
       round(avg(cov_us / 60000000.0), 4) AS avg_covered_min
FROM per_user GROUP BY n_spans
"""

QUERIES["q_interval_union"] = (q_interval_union, Q_INTERVAL_UNION_SQL)


_MARKOV_SPLIT = "2024-01-16"  # train | evaluate


def q_markov_next_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov next-event prediction, trained and scored
    warehouse-side: learn argmax P(next | current) from transitions
    before the split date, then report per-state accuracy on the
    transitions after it — the "is user behavior predictable"
    readout, and the degenerate-baseline check run before shipping
    any sequence model.

    One lag window per user builds all transitions; the model is a
    |types|² count matrix (bounded — argmax via one tiny window);
    scoring is a broadcast join of test transitions against the
    |types|-row model. Deterministic tie-break (count desc, type
    asc) keeps the learned table engine-stable.
    """
    ev = Catalog(spark, sf_dir).events.select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = ev.select(
        F.lag("event_type").over(w).alias("prev"),
        F.col("event_type").alias("next"),
        (F.to_date("ts") < F.lit(_MARKOV_SPLIT)).alias("is_train"),
    ).filter(F.col("prev").isNotNull())
    counts = (
        trans.filter("is_train")
        .groupBy("prev", "next")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pick = Window.partitionBy("prev").orderBy(F.desc("c"), F.asc("next"))
    model = (
        counts.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select("prev", F.col("next").alias("predicted"), F.col("c").alias("n_train_top"))
    )
    test = trans.filter(~F.col("is_train"))
    return (
        test.join(F.broadcast(model), "prev")
        .groupBy("prev", "predicted")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            _R4(
                F.avg((F.col("next") == F.col("predicted")).cast("double")),
                "accuracy",
            ),
        )
    )


Q_MARKOV_NEXT_SQL = f"""
WITH trans AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
         event_type AS next,
         CAST(ts AS DATE) < DATE '{_MARKOV_SPLIT}' AS is_train
  FROM events
), t2 AS (
  SELECT * FROM trans WHERE prev IS NOT NULL
), counts AS (
  SELECT prev, next, count(*) AS c FROM t2 WHERE is_train GROUP BY 1, 2
), model AS (
  SELECT prev, next AS predicted FROM (
    SELECT prev, next, row_number() OVER (PARTITION BY prev
                                          ORDER BY c DESC, next ASC) AS rn
    FROM counts
  ) WHERE rn = 1
)
SELECT t.prev, m.predicted, count(*) AS n_test,
       round(avg(CASE WHEN t.next = m.predicted THEN 1.0 ELSE 0.0 END), 4)
         AS accuracy
FROM t2 t JOIN model m ON t.prev = m.prev
WHERE NOT t.is_train
GROUP BY t.prev, m.predicted
"""

QUERIES["q_markov_next_event"] = (q_markov_next_event, Q_MARKOV_NEXT_SQL)


_PATH_LEN = 3
_PATH_TOP = 10


def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top session-opening paths: sessionize (same 30-min gap rule
    as ``q_sessionize``), take each session's first 3 event types in
    order, count path frequencies, keep the top 10 — the "how do
    journeys start" readout product teams put next to the funnel.

    The path string is built from the SAME (user, ts) sort the
    sessionizer already needs — rank-within-session + conditional
    min(struct) per slot, no collect_list ordering hazards, no
    second shuffle. Path count is a bounded-key aggregate
    (|types|^3 max distinct paths).
    """
    ev = Catalog(spark, sf_dir).events.select(
        "user_id", "ts", "event_id", "event_type",
        F.unix_micros("ts").alias("_us"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "_new",
        F.when(
            F.col("_us") - F.lag("_us").over(w) > F.lit(SESSION_GAP_US), 1
        ).otherwise(F.when(F.lag("_us").over(w).isNull(), 1).otherwise(0)),
    ).withColumn("session_seq", F.sum("_new").over(w))
    ws = Window.partitionBy("user_id", "session_seq").orderBy("ts", "event_id")
    ranked = flagged.withColumn("pos", F.row_number().over(ws)).filter(
        F.col("pos") <= _PATH_LEN
    )
    paths = (
        ranked.groupBy("user_id", "session_seq")
        .agg(
            F.concat_ws(
                ">",
                *[
                    F.min(F.when(F.col("pos") == i, F.col("event_type")))
                    for i in range(1, _PATH_LEN + 1)
                ],
            ).alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )
    # distributed top-k, rank re-derived on the k survivors
    wtop = [F.desc("n_sessions"), F.asc("path")]
    return (
        paths.orderBy(*wtop)
        .limit(_PATH_TOP)
        .withColumn("rank", F.row_number().over(Window.orderBy(*wtop)))
        .select("rank", "path", "n_sessions")
    )


Q_SESSION_PATHS_SQL = f"""
WITH ev AS (
  SELECT user_id, ts, event_id, event_type, epoch_us(ts) AS us
  FROM events
), flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(us) OVER w IS NULL
                OR us - lag(us) OVER w > {SESSION_GAP_US} THEN 1 ELSE 0 END AS new_s
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts, event_id, event_type,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_seq
  FROM flagged
), ranked AS (
  SELECT user_id, session_seq, event_type,
         row_number() OVER (PARTITION BY user_id, session_seq
                            ORDER BY ts, event_id) AS pos
  FROM sess
), per_session AS (
  SELECT user_id, session_seq,
         concat_ws('>',
           min(CASE WHEN pos = 1 THEN event_type END),
           min(CASE WHEN pos = 2 THEN event_type END),
           min(CASE WHEN pos = 3 THEN event_type END)) AS path
  FROM ranked WHERE pos <= {_PATH_LEN} GROUP BY 1, 2
), counts AS (
  SELECT path, count(*) AS n_sessions FROM per_session GROUP BY path
)
SELECT CAST(row_number() OVER (ORDER BY n_sessions DESC, path ASC) AS INTEGER)
         AS rank,
       path, n_sessions
FROM counts
ORDER BY rank LIMIT {_PATH_TOP}
"""

QUERIES["q_session_paths"] = (q_session_paths, Q_SESSION_PATHS_SQL)


_XCORR_MAX_LAG = 3


def q_lead_lag_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation between the hourly error and
    purchase series: Pearson corr of (errors at hour t, purchases
    at t+lag) for lags −3..+3 — the "do errors depress purchases,
    and with what delay" diagnostic, run warehouse-side before
    anyone reaches for a causal model.

    The two hourly series are one conditional aggregate over the
    fact table; each lag is an equi-join on the shifted hour key
    (never an inequality join), and corr() is algebraic so every
    lag's statistic is a one-pass aggregate. Bounded: |hours| rows
    per series, 7 output rows.
    """
    ev = Catalog(spark, sf_dir).events.select(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    )
    hourly = ev.groupBy("hour").agg(
        F.sum((F.col("event_type") == "error").cast("long")).alias("errors"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("purchases"),
    )
    lags = spark.range(-_XCORR_MAX_LAG, _XCORR_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    shifted = hourly.crossJoin(F.broadcast(lags)).select(
        "lag",
        (F.col("hour") + F.make_dt_interval(hours=F.col("lag"))).alias("hour"),
        F.col("errors").alias("errors_at_t"),
    )
    joined = shifted.join(
        hourly.select("hour", "purchases"), "hour"
    )
    return joined.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_hours"),
        _R4(F.corr("errors_at_t", "purchases"), "xcorr"),
    )


Q_LEAD_LAG_XCORR_SQL = f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour,
         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS errors,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchases
  FROM events GROUP BY 1
), lags AS (
  SELECT unnest(range(-{_XCORR_MAX_LAG}, {_XCORR_MAX_LAG} + 1)) AS lag
), shifted AS (
  SELECT l.lag, h.hour + to_hours(l.lag) AS hour, h.errors AS errors_at_t
  FROM hourly h CROSS JOIN lags l
)
SELECT s.lag AS lag, count(*) AS n_hours,
       round(corr(s.errors_at_t, h.purchases), 4) AS xcorr
FROM shifted s JOIN hourly h USING (hour)
GROUP BY s.lag
"""

QUERIES["q_lead_lag_xcorr"] = (q_lead_lag_xcorr, Q_LEAD_LAG_XCORR_SQL)


def q_attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution: each
    purchase's value splits 40% to the first touch, 40% to the last
    touch, 20% evenly across the middle touches of its path (1
    touch → 100%, 2 touches → 50/50) — the standard compromise
    between the first- and last-touch extremes reported by
    ``q_attribution_last_touch``.

    Touch→conversion assignment is ONE forward-looking window per
    user (first purchase at-or-after each event) — the as-of house
    pattern again, never a per-purchase inequality join. Path size
    and position are two more frames over the SAME
    (user, conversion) sort, then credit is row-local algebra.
    """
    ev = Catalog(spark, sf_dir).events.select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    is_pur = F.col("event_type") == "purchase"
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.first(F.when(is_pur, F.col("event_id")), ignorenulls=True)
        .over(fwd)
        .alias("conv_id"),
        F.first(F.when(is_pur, F.col("value")), ignorenulls=True)
        .over(fwd)
        .alias("conv_value"),
    )
    touches = tagged.filter(
        (F.col("event_type") != "purchase") & F.col("conv_id").isNotNull()
    )
    wp = Window.partitionBy("user_id", "conv_id").orderBy("ts", "event_id")
    wn = Window.partitionBy("user_id", "conv_id")
    sized = touches.select(
        F.col("event_type").alias("channel"),
        "conv_value",
        F.row_number().over(wp).alias("pos"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    credit = (
        F.when(F.col("n") == 1, 1.0)
        .when(F.col("n") == 2, 0.5)
        .when(F.col("pos") == 1, 0.4)
        .when(F.col("pos") == F.col("n"), 0.4)
        .otherwise(0.2 / (F.col("n") - 2))
    )
    return sized.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_touches"),
        _R4(F.sum(credit * F.col("conv_value")), "rev_position"),
    )


Q_ATTRIBUTION_POSITION_SQL = """
WITH tagged AS (
  SELECT user_id, ts, event_id, event_type,
         first_value(CASE WHEN event_type = 'purchase' THEN event_id END
                     IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS conv_id,
         first_value(CASE WHEN event_type = 'purchase' THEN value END
                     IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS conv_value
  FROM events
), touches AS (
  SELECT event_type AS channel, conv_value,
         row_number() OVER (PARTITION BY user_id, conv_id
                            ORDER BY ts, event_id) AS pos,
         count(*) OVER (PARTITION BY user_id, conv_id) AS n
  FROM tagged
  WHERE event_type != 'purchase' AND conv_id IS NOT NULL
)
SELECT channel, count(*) AS n_touches,
       round(sum(CASE WHEN n = 1 THEN 1.0
                      WHEN n = 2 THEN 0.5
                      WHEN pos = 1 THEN 0.4
                      WHEN pos = n THEN 0.4
                      ELSE 0.2 / (n - 2) END * conv_value), 4) AS rev_position
FROM touches
GROUP BY channel
"""

QUERIES["q_attribution_position"] = (
    q_attribution_position,
    Q_ATTRIBUTION_POSITION_SQL,
)


_ZSCORE_WIN = 7


def q_rolling_zscore_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-window anomaly alerts: each day's event count per
    type scored against the mean/σ of the TRAILING 7 days (never
    including itself), |z| > 3 flagged — the streaming-style alert
    rule evaluated in batch, complementary to the global
    (``q_burst_detection``) and weekday-profile
    (``dq_weekday_adjusted_volume``) screens.

    Integer daily counts keep μ/σ bit-identical cross-engine; the
    rolling frame runs over the bounded (type, day) matrix, not
    fact rows.
    """
    ev = Catalog(spark, sf_dir).events.select(
        "event_type", F.to_date("ts").alias("day")
    )
    daily = ev.groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("c"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-_ZSCORE_WIN, -1)
    )
    scored = daily.select(
        "event_type",
        "day",
        "c",
        F.avg("c").over(w).alias("mu"),
        F.stddev_samp("c").over(w).alias("sigma"),
        F.count("c").over(w).alias("n_window"),
    ).filter(F.col("n_window") == _ZSCORE_WIN)
    z = (F.col("c") - F.col("mu")) / F.nullif(F.col("sigma"), F.lit(0.0))
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days_scored"),
        F.sum((F.abs(z) > 3).cast("long")).alias("n_alerts"),
        _R4(F.max(F.abs(z)), "max_abs_z"),
    )


Q_ROLLING_ZSCORE_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
  FROM events GROUP BY 1, 2
), scored AS (
  SELECT event_type, day, c,
         avg(c) OVER w AS mu,
         stddev_samp(c) OVER w AS sigma,
         count(c) OVER w AS n_window
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN {_ZSCORE_WIN} PRECEDING AND 1 PRECEDING)
)
SELECT event_type, count(*) AS n_days_scored,
       CAST(sum(CASE WHEN abs((c - mu) / nullif(sigma, 0)) > 3
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_alerts,
       round(max(abs((c - mu) / nullif(sigma, 0))), 4) AS max_abs_z
FROM scored
WHERE n_window = {_ZSCORE_WIN}
GROUP BY event_type
"""

QUERIES["q_rolling_zscore_alerts"] = (
    q_rolling_zscore_alerts,
    Q_ROLLING_ZSCORE_SQL,
)


def q_missing_hour_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage-gap census per event type: generate the full
    expected hour grid from each type's own [first, last] hour,
    anti-join the observed hours away, and report how many hours
    are missing plus the longest contiguous outage — the
    completeness audit behind every ingestion SLA, and the
    diagnosis step before ``q_gap_fill`` repairs the series.

    `sequence()` builds the grid from two scalars per type (never
    a driver loop); the anti-join and the gaps-and-islands pass on
    the missing set run over the bounded (type, hour) matrix.
    """
    ev = Catalog(spark, sf_dir).events.select(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    )
    present = ev.distinct()
    bounds = present.groupBy("event_type").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    grid = bounds.select(
        "event_type",
        F.explode(
            F.sequence("h0", "h1", F.expr("interval 1 hour"))
        ).alias("hour"),
    )
    missing = grid.join(present, ["event_type", "hour"], "left_anti")
    w = Window.partitionBy("event_type").orderBy("hour")
    runs = (
        missing.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "grp",
            F.col("hour")
            - F.make_dt_interval(hours=F.col("rn")),
        )
        .groupBy("event_type", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    gaps = runs.groupBy("event_type").agg(
        F.sum("run_len").alias("n_missing"),
        F.max("run_len").alias("longest_outage_hours"),
    )
    expected = grid.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_expected")
    )
    return (
        expected.join(gaps, "event_type", "left")
        .select(
            "event_type",
            "n_expected",
            F.coalesce("n_missing", F.lit(0)).alias("n_missing"),
            F.coalesce("longest_outage_hours", F.lit(0)).alias(
                "longest_outage_hours"
            ),
        )
    )


Q_MISSING_HOUR_SQL = """
WITH present AS (
  SELECT DISTINCT event_type, date_trunc('hour', ts) AS hour FROM events
), bounds AS (
  SELECT event_type, min(hour) AS h0, max(hour) AS h1
  FROM present GROUP BY event_type
), grid AS (
  SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
  FROM bounds
), missing AS (
  SELECT g.event_type, g.hour
  FROM grid g LEFT JOIN present p USING (event_type, hour)
  WHERE p.hour IS NULL
), runs AS (
  SELECT event_type,
         hour - to_hours(row_number() OVER (PARTITION BY event_type
                                            ORDER BY hour)) AS grp,
         count(*) OVER () AS _dummy
  FROM missing
), run_lens AS (
  SELECT event_type, grp, count(*) AS run_len
  FROM runs GROUP BY 1, 2
), gaps AS (
  SELECT event_type, sum(run_len) AS n_missing,
         max(run_len) AS longest_outage_hours
  FROM run_lens GROUP BY event_type
), expected AS (
  SELECT event_type, count(*) AS n_expected FROM grid GROUP BY event_type
)
SELECT e.event_type, e.n_expected,
       CAST(coalesce(g.n_missing, 0) AS BIGINT) AS n_missing,
       CAST(coalesce(g.longest_outage_hours, 0) AS BIGINT)
         AS longest_outage_hours
FROM expected e LEFT JOIN gaps g USING (event_type)
"""

QUERIES["q_missing_hour_census"] = (q_missing_hour_census, Q_MISSING_HOUR_SQL)


def q_hourly_seasonality_fourier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-harmonic Fourier fit of the daily cycle per event
    type: project hourly volumes onto sin/cos at period 24 h and
    report amplitude, peak hour, and the share of variance the
    cycle explains — the closed-form answer to "how diurnal is
    this stream", one step past ``q_weekly_seasonality``'s
    day-of-week means.

    a₁ = 2·avg(y·cosθ), b₁ = 2·avg(y·sinθ) are plain algebraic
    aggregates over the bounded (type, hour) matrix — no FFT, no
    iteration; amplitude/phase are row-local atan2 algebra on the
    |types|-row result.
    """
    import math

    ev = Catalog(spark, sf_dir).events.select(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    )
    hourly = ev.groupBy("event_type", "hour").agg(
        F.count(F.lit(1)).alias("y")
    )
    theta = (
        2.0 * math.pi * F.hour(F.col("hour")).cast("double") / 24.0
    )
    fit = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.avg("y").alias("mean_level"),
        (2.0 * F.avg(F.col("y") * F.cos(theta))).alias("a1"),
        (2.0 * F.avg(F.col("y") * F.sin(theta))).alias("b1"),
        F.var_pop("y").alias("var_y"),
    )
    amp = F.sqrt(F.col("a1") * F.col("a1") + F.col("b1") * F.col("b1"))
    # peak where cos(θ − φ) = 1, φ = atan2(b1, a1) → hour = 24φ/2π mod 24
    peak = F.pmod(
        F.atan2(F.col("b1"), F.col("a1")) * 24.0 / (2.0 * math.pi), F.lit(24.0)
    )
    return fit.select(
        "event_type",
        "n_hours",
        _R4(F.col("mean_level"), "mean_level"),
        _R4(amp, "amplitude"),
        _R4(peak, "peak_hour"),
        _R4((amp * amp / 2.0) / F.col("var_y"), "cycle_var_share"),
    )


Q_HOURLY_FOURIER_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS y
  FROM events GROUP BY 1, 2
), fit AS (
  SELECT event_type, count(*) AS n_hours, avg(y) AS mean_level,
         2.0 * avg(y * cos(2 * pi() * extract(hour FROM hour) / 24.0)) AS a1,
         2.0 * avg(y * sin(2 * pi() * extract(hour FROM hour) / 24.0)) AS b1,
         var_pop(y) AS var_y
  FROM hourly GROUP BY event_type
)
SELECT event_type, n_hours,
       round(mean_level, 4) AS mean_level,
       round(sqrt(a1 * a1 + b1 * b1), 4) AS amplitude,
       round(fmod(fmod(atan2(b1, a1) * 24.0 / (2 * pi()), 24.0) + 24.0, 24.0),
             4) AS peak_hour,
       round((a1 * a1 + b1 * b1) / 2.0 / var_y, 4) AS cycle_var_share
FROM fit
"""

QUERIES["q_hourly_seasonality_fourier"] = (
    q_hourly_seasonality_fourier,
    Q_HOURLY_FOURIER_SQL,
)


def q_user_lifecycle_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lifecycle segmentation census: classify every user as
    new / active / at-risk / churned from recency and tenure
    against the corpus max timestamp (new: first seen ≤ 7 days
    ago; churned: silent > 30 days; at-risk: 14–30; else active)
    — the four-bucket readout every growth dashboard leads with.

    One aggregate per user (min/max ts, counts), a broadcast
    scalar snapshot time, then a 4-row census: no windows at all.
    """
    ev = Catalog(spark, sf_dir).events.select("user_id", "ts", "value")
    per = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    )
    snap = ev.agg(F.max("ts").alias("snap"))
    j = per.crossJoin(F.broadcast(snap))
    rec = F.datediff(F.to_date("snap"), F.to_date("last_ts"))
    ten = F.datediff(F.to_date("snap"), F.to_date("first_ts"))
    state = (
        F.when(ten <= 7, "new")
        .when(rec > 30, "churned")
        .when(rec > 14, "at_risk")
        .otherwise("active")
    )
    return j.groupBy(state.alias("state")).agg(
        F.count(F.lit(1)).alias("n_users"),
        _R4(F.avg("n_events"), "avg_events"),
        _R4(F.avg("total_value"), "avg_value"),
        _R4(F.avg(rec), "avg_recency_days"),
    )


Q_USER_LIFECYCLE_SQL = """
WITH per AS (
  SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts,
         count(*) AS n_events, sum(value) AS total_value
  FROM events GROUP BY user_id
), snap AS (
  SELECT max(ts) AS snap FROM events
), tagged AS (
  SELECT p.*,
         datediff('day', CAST(p.last_ts AS DATE), CAST(s.snap AS DATE)) AS rec,
         datediff('day', CAST(p.first_ts AS DATE), CAST(s.snap AS DATE)) AS ten
  FROM per p CROSS JOIN snap s
)
SELECT CASE WHEN ten <= 7 THEN 'new'
            WHEN rec > 30 THEN 'churned'
            WHEN rec > 14 THEN 'at_risk'
            ELSE 'active' END AS state,
       count(*) AS n_users,
       round(avg(n_events), 4) AS avg_events,
       round(avg(total_value), 4) AS avg_value,
       round(avg(rec), 4) AS avg_recency_days
FROM tagged
GROUP BY 1
"""

QUERIES["q_user_lifecycle_states"] = (
    q_user_lifecycle_states,
    Q_USER_LIFECYCLE_SQL,
)


def q_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting: decompose each week's active users
    into new / retained / resurrected, count the users churning in,
    and report the quick ratio (new+resurrected)/churned — the
    growth-accounting table (ΔWAU identity) every consumer product
    review starts with.

    Activity collapses to the (user, week) grid first; "active last
    week" is an equi-join against the grid shifted by 7 days — the
    whole decomposition is joins and aggregates on that bounded
    grid, no windows over fact rows.
    """
    ev = Catalog(spark, sf_dir).events.select(
        "user_id", F.date_trunc("week", F.to_date("ts")).cast("date").alias("wk")
    ).distinct()
    first = ev.groupBy("user_id").agg(F.min("wk").alias("first_wk"))
    prev = ev.select("user_id", F.date_add("wk", 7).alias("wk"), F.lit(1).alias("p"))
    tagged = (
        ev.join(first, "user_id")
        .join(prev, ["user_id", "wk"], "left")
        .select(
            "wk",
            (F.col("wk") == F.col("first_wk")).cast("long").alias("is_new"),
            (F.col("p") == 1).cast("long").alias("is_ret"),
        )
    )
    per_wk = tagged.groupBy("wk").agg(
        F.count(F.lit(1)).alias("n_active"),
        F.sum("is_new").alias("n_new"),
        F.sum(F.coalesce("is_ret", F.lit(0))).alias("n_retained"),
        F.sum(
            (
                (F.col("is_new") == 0)
                & (F.coalesce(F.col("is_ret"), F.lit(0)) == 0)
            ).cast("long")
        ).alias("n_resurrected"),
    )
    churn = (
        ev.select("user_id", F.date_add("wk", 7).alias("wk"))
        .join(ev, ["user_id", "wk"], "left_anti")
        .groupBy("wk")
        .agg(F.count(F.lit(1)).alias("n_churned_in"))
    )
    j = per_wk.join(churn, "wk", "left").select(
        "wk",
        "n_active",
        "n_new",
        "n_retained",
        "n_resurrected",
        F.coalesce("n_churned_in", F.lit(0)).alias("n_churned_in"),
    )
    return j.select(
        "*",
        _R4(
            (F.col("n_new") + F.col("n_resurrected"))
            / F.nullif(F.col("n_churned_in"), F.lit(0)),
            "quick_ratio",
        ),
    )


Q_GROWTH_ACCOUNTING_SQL = """
WITH active AS (
  SELECT DISTINCT user_id, date_trunc('week', CAST(ts AS DATE)) AS wk
  FROM events
), first_wk AS (
  SELECT user_id, min(wk) AS first_wk FROM active GROUP BY user_id
), tagged AS (
  SELECT a.wk,
         CASE WHEN a.wk = f.first_wk THEN 1 ELSE 0 END AS is_new,
         CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END AS is_ret
  FROM active a
  JOIN first_wk f USING (user_id)
  LEFT JOIN active p ON p.user_id = a.user_id AND p.wk + 7 = a.wk
), per_wk AS (
  SELECT wk, count(*) AS n_active,
         sum(is_new) AS n_new,
         sum(is_ret) AS n_retained,
         sum(CASE WHEN is_new = 0 AND is_ret = 0 THEN 1 ELSE 0 END)
           AS n_resurrected
  FROM tagged GROUP BY wk
), churn AS (
  SELECT a.wk + 7 AS wk, count(*) AS n_churned_in
  FROM active a
  LEFT JOIN active nxt ON nxt.user_id = a.user_id AND nxt.wk = a.wk + 7
  WHERE nxt.user_id IS NULL
  GROUP BY a.wk + 7
)
SELECT p.wk, CAST(p.n_active AS BIGINT) AS n_active,
       CAST(p.n_new AS BIGINT) AS n_new,
       CAST(p.n_retained AS BIGINT) AS n_retained,
       CAST(p.n_resurrected AS BIGINT) AS n_resurrected,
       CAST(coalesce(c.n_churned_in, 0) AS BIGINT) AS n_churned_in,
       round((p.n_new + p.n_resurrected)
             / CAST(nullif(coalesce(c.n_churned_in, 0), 0) AS DOUBLE), 4)
         AS quick_ratio
FROM per_wk p LEFT JOIN churn c USING (wk)
"""

QUERIES["q_growth_accounting"] = (q_growth_accounting, Q_GROWTH_ACCOUNTING_SQL)


def q_cohort_decay_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention half-life: average the day-0..7 cohort retention
    curve across cohorts, fit ln(rate) ~ offset by OLS, and report
    the decay slope and implied half-life in days — the one-number
    summary of the triangle ``q_retention_cohort`` emits.

    Everything after the cohort rollup is |offsets| rows; the fit
    is the algebraic regr_* pair.
    """
    ev = Catalog(spark, sf_dir).events.select(
        "user_id", F.to_date("ts").alias("day")
    )
    first_day = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    active = ev.distinct()
    tri = (
        active.join(first_day, "user_id")
        .select(
            "cohort_day",
            F.datediff("day", "cohort_day").alias("off"),
            "user_id",
        )
        .filter(F.col("off") <= 7)
        .groupBy("cohort_day", "off")
        .agg(F.count_distinct("user_id").alias("n"))
    )
    base = tri.filter(F.col("off") == 0).select(
        "cohort_day", F.col("n").alias("n0")
    )
    rates = (
        tri.join(base, "cohort_day")
        .groupBy("off")
        .agg(F.avg(F.col("n") / F.col("n0")).alias("rate"))
        .filter(F.col("off") >= 1)
    )
    fit = rates.agg(
        F.count(F.lit(1)).alias("n_points"),
        F.regr_slope(F.log("rate"), F.col("off").cast("double")).alias("slope"),
        F.regr_r2(F.log("rate"), F.col("off").cast("double")).alias("r2"),
    )
    return fit.select(
        "n_points",
        _R4(F.col("slope"), "decay_slope"),
        _R4(-F.log(F.lit(2.0)) / F.col("slope"), "half_life_days"),
        _R4(F.col("r2"), "r2"),
    )


Q_COHORT_DECAY_SQL = """
WITH fd AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY user_id
), active AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), tri AS (
  SELECT cohort_day, date_diff('day', cohort_day, day) AS off,
         count(DISTINCT user_id) AS n
  FROM active JOIN fd USING (user_id)
  WHERE date_diff('day', cohort_day, day) <= 7
  GROUP BY 1, 2
), base AS (
  SELECT cohort_day, n AS n0 FROM tri WHERE off = 0
), rates AS (
  SELECT t.off, avg(t.n / CAST(b.n0 AS DOUBLE)) AS rate
  FROM tri t JOIN base b USING (cohort_day)
  WHERE t.off >= 1 GROUP BY t.off
)
SELECT count(*) AS n_points,
       round(regr_slope(ln(rate), CAST(off AS DOUBLE)), 4) AS decay_slope,
       round(-ln(2.0) / regr_slope(ln(rate), CAST(off AS DOUBLE)), 4)
         AS half_life_days,
       round(regr_r2(ln(rate), CAST(off AS DOUBLE)), 4) AS r2
FROM rates
"""

QUERIES["q_cohort_decay_fit"] = (q_cohort_decay_fit, Q_COHORT_DECAY_SQL)


_CONV_WINDOWS_H = (1, 6, 24)


def q_conversion_window_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution-window sensitivity: how many signup→purchase
    conversions survive a 1 h / 6 h / 24 h window — the sweep that
    decides the attribution-window debate with data instead of
    opinion (if 1 h ≈ 24 h the argument is moot).

    Each user's first signup and first subsequent purchase come
    from ONE conditional aggregate; all three window counts are
    conditional sums over that per-user row. One shuffle total.
    """
    ev = Catalog(spark, sf_dir).events.select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    per = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("us"))).alias("s0")
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("us").alias("pus")
    )
    first_pur = (
        pur.join(per, "user_id")
        .filter(F.col("pus") >= F.col("s0"))
        .groupBy("user_id")
        .agg(F.min("s0").alias("s0"), F.min("pus").alias("p0"))
    )
    lat_h = (F.col("p0") - F.col("s0")) / 3_600_000_000.0
    aggs = [F.count(F.lit(1)).alias("n_converted_ever")]
    for h in _CONV_WINDOWS_H:
        aggs.append(
            F.sum((lat_h <= h).cast("long")).alias(f"n_within_{h}h")
        )
    out = first_pur.agg(*aggs)
    base = per.filter(F.col("s0").isNotNull()).agg(
        F.count(F.lit(1)).alias("n_signup_users")
    )
    return out.crossJoin(F.broadcast(base)).select(
        "n_signup_users",
        "n_converted_ever",
        *[F.col(f"n_within_{h}h") for h in _CONV_WINDOWS_H],
        *[
            _R4(F.col(f"n_within_{h}h") / F.col("n_signup_users"), f"cvr_{h}h")
            for h in _CONV_WINDOWS_H
        ],
    )


def _conv_window_sql() -> str:
    wins = ", ".join(
        f"CAST(sum(CASE WHEN (p0 - s0) / 3600000000.0 <= {h} THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS n_within_{h}h"
        for h in _CONV_WINDOWS_H
    )
    cvrs = ", ".join(
        f"round(sum(CASE WHEN (p0 - s0) / 3600000000.0 <= {h} THEN 1 ELSE 0 END)"
        f" / CAST((SELECT count(*) FROM per WHERE s0 IS NOT NULL) AS DOUBLE), 4)"
        f" AS cvr_{h}h"
        for h in _CONV_WINDOWS_H
    )
    return f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
), per AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN us END) AS s0
  FROM ev GROUP BY user_id
), first_pur AS (
  SELECT e.user_id, min(p.s0) AS s0, min(e.us) AS p0
  FROM ev e JOIN per p USING (user_id)
  WHERE e.event_type = 'purchase' AND e.us >= p.s0
  GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM per WHERE s0 IS NOT NULL) AS n_signup_users,
       count(*) AS n_converted_ever,
       {wins},
       {cvrs}
FROM first_pur
"""


QUERIES["q_conversion_window_sensitivity"] = (
    q_conversion_window_sensitivity,
    _conv_window_sql(),
)


def q_session_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Any-order engagement completeness: histogram sessions by how
    many DISTINCT event types they contain, with the share holding
    the full five-type set — the unordered complement of the staged
    funnel (stages in ``q_funnel`` must happen in order; a support
    ticket does not care which came first).

    Sessionize (house pattern), per-session distinct-type count,
    then a ≤5-row histogram. The distinct count is per (user,
    session) — bounded by the type vocabulary, never wide.
    """
    ev = Catalog(spark, sf_dir).events.select(
        "user_id", "ts", "event_id", "event_type",
        F.unix_micros("ts").alias("_us"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = ev.withColumn(
        "_new",
        F.when(
            F.col("_us") - F.lag("_us").over(w) > SESSION_GAP_US, 1
        ).otherwise(F.when(F.lag("_us").over(w).isNull(), 1).otherwise(0)),
    ).withColumn("sid", F.sum("_new").over(w))
    per = sess.groupBy("user_id", "sid").agg(
        F.count_distinct("event_type").alias("n_types"),
        F.count(F.lit(1)).alias("n_events"),
    )
    hist = per.groupBy("n_types").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        _R4(F.avg("n_events"), "avg_events"),
    )
    tot = per.agg(F.count(F.lit(1)).alias("t"))
    return hist.crossJoin(F.broadcast(tot)).select(
        "n_types",
        "n_sessions",
        "avg_events",
        _R4(F.col("n_sessions") / F.col("t"), "share"),
    )


Q_SESSION_COMPLETENESS_SQL = f"""
WITH ev AS (
  SELECT user_id, ts, event_id, event_type, epoch_us(ts) AS us FROM events
), flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(us) OVER w IS NULL
                OR us - lag(us) OVER w > {SESSION_GAP_US} THEN 1 ELSE 0 END AS new_s
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, event_type,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
), per AS (
  SELECT user_id, sid, count(DISTINCT event_type) AS n_types,
         count(*) AS n_events
  FROM sess GROUP BY 1, 2
), hist AS (
  SELECT n_types, count(*) AS n_sessions, round(avg(n_events), 4) AS avg_events
  FROM per GROUP BY n_types
)
SELECT n_types, n_sessions, avg_events,
       round(n_sessions / CAST((SELECT count(*) FROM per) AS DOUBLE), 4) AS share
FROM hist
"""

QUERIES["q_session_completeness"] = (
    q_session_completeness,
    Q_SESSION_COMPLETENESS_SQL,
)


def q_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-baseline backtest: predict each day's event volume
    with the same weekday last week (seasonal naive, the baseline
    every real forecaster must beat) and report MAE, MAPE, and
    bias per type — the honest yardstick computed before anyone
    ships a model.

    One lag-7 window over the bounded (type, day) matrix; errors
    are integer differences so the metrics are bit-stable.
    """
    ev = Catalog(spark, sf_dir).events.select(
        "event_type", F.to_date("ts").alias("day")
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("y")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    scored = daily.withColumn("yhat", F.lag("y", 7).over(w)).filter(
        F.col("yhat").isNotNull()
    )
    err = F.col("y") - F.col("yhat")
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days_scored"),
        _R4(F.avg(F.abs(err)), "mae"),
        _R4(F.avg(F.abs(err) / F.col("y")), "mape"),
        _R4(F.avg(err), "bias"),
    )


Q_SEASONAL_NAIVE_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
  FROM events GROUP BY 1, 2
), scored AS (
  SELECT event_type, y,
         lag(y, 7) OVER (PARTITION BY event_type ORDER BY day) AS yhat
  FROM daily
)
SELECT event_type, count(*) AS n_days_scored,
       round(avg(abs(y - yhat)), 4) AS mae,
       round(avg(abs(y - yhat) / CAST(y AS DOUBLE)), 4) AS mape,
       round(avg(y - yhat), 4) AS bias
FROM scored WHERE yhat IS NOT NULL
GROUP BY event_type
"""

QUERIES["q_seasonal_naive_backtest"] = (
    q_seasonal_naive_backtest,
    Q_SEASONAL_NAIVE_SQL,
)


def q_type_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix: Jaccard similarity of the USER sets
    behind each pair of event types ("do clickers also purchase?")
    — the segmentation sanity check behind every 'audiences' UI.

    The (user, type) grid is the only fact-derived object; pairs
    form by self-joining that grid ON user_id, so work is Σ per-
    user type-pairs ≤ |types|²/2 per user — bounded by the
    vocabulary, never by users². Set sizes broadcast back.
    """
    ut = Catalog(spark, sf_dir).events.select("user_id", "event_type").distinct()
    sizes = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a, b = ut.alias("a"), ut.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    na = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("nb"))
    return (
        inter.join(F.broadcast(na), "type_a")
        .join(F.broadcast(nb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            _R4(
                F.col("n_both")
                / (F.col("na") + F.col("nb") - F.col("n_both")),
                "jaccard",
            ),
        )
    )


Q_TYPE_USER_OVERLAP_SQL = """
WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events
), sizes AS (
  SELECT event_type, count(*) AS n FROM ut GROUP BY event_type
), inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_both
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT i.type_a, i.type_b, i.n_both,
       round(i.n_both / CAST(sa.n + sb.n - i.n_both AS DOUBLE), 4) AS jaccard
FROM inter i
JOIN sizes sa ON sa.event_type = i.type_a
JOIN sizes sb ON sb.event_type = i.type_b
"""

QUERIES["q_type_user_overlap"] = (q_type_user_overlap, Q_TYPE_USER_OVERLAP_SQL)


def q_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of cumulative revenue vs its linear budget
    pace: track cumulative actual minus cumulative expected (total
    × day/n) per day and report the deepest shortfall and when it
    bottomed — the pacing readout ("how far behind plan did the
    quarter get, and when") computed with two windows over the
    bounded daily series.
    """
    daily = (
        Catalog(spark, sf_dir)
        .orders.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    cum = daily.select(
        "day",
        F.sum("rev").over(w).alias("cum"),
        F.sum("rev").over(tot).alias("total"),
        F.row_number().over(Window.orderBy("day")).alias("i"),
        F.count(F.lit(1)).over(tot).alias("n"),
    )
    gap = F.col("cum") - F.col("total") * F.col("i") / F.col("n")
    pick = Window.orderBy(F.asc(F.round(gap, 2)), F.asc("day"))
    return (
        cum.withColumn("rn", F.row_number().over(pick))
        .filter("rn = 1")
        .select(
            F.col("day").alias("trough_day"),
            F.col("n").alias("n_days"),
            F.round(gap, 2).alias("max_drawdown"),
            _R4(-gap / F.col("total"), "drawdown_frac"),
        )
    )


Q_MAX_DRAWDOWN_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, sum(o_totalprice) AS rev
  FROM orders GROUP BY 1
), cum AS (
  SELECT day,
         sum(rev) OVER (ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(rev) OVER () AS total,
         row_number() OVER (ORDER BY day) AS i,
         count(*) OVER () AS n
  FROM daily
)
SELECT day AS trough_day, CAST(n AS BIGINT) AS n_days,
       round(cum - total * i / n, 2) AS max_drawdown,
       round(-(cum - total * i / n) / total, 4) AS drawdown_frac
FROM cum
ORDER BY round(cum - total * i / n, 2) ASC, day ASC
LIMIT 1
"""

QUERIES["q_max_drawdown"] = (q_max_drawdown, Q_MAX_DRAWDOWN_SQL)


def q_churn_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-time churn hazard by tenure week: P(last activity
    in week w | active through w), with users still active at the
    corpus horizon right-censored — the user-lifetime companion to
    the order-level Kaplan-Meier (``q_survival_fulfillment``),
    and the curve that says WHEN users are most at risk.

    One aggregate per user (first/last day), censoring against a
    broadcast horizon, then a |weeks|-row risk-set window.
    """
    ev = Catalog(spark, sf_dir).events.select(
        "user_id", F.to_date("ts").alias("day")
    )
    per = ev.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    horizon = ev.agg(F.max("day").alias("h"))
    tagged = per.crossJoin(F.broadcast(horizon)).select(
        F.floor(F.datediff("d1", "d0") / 7).alias("w"),
        # censored: still active in the horizon's final week
        (F.datediff("h", "d1") < 7).cast("long").alias("censored"),
    )
    grid = tagged.groupBy("w").agg(
        F.count(F.lit(1)).alias("ended_here"),
        F.sum("censored").alias("n_censored"),
    )
    risk = Window.orderBy("w").rowsBetween(Window.currentRow, Window.unboundedFollowing)
    return grid.select(
        F.col("w").alias("tenure_week"),
        (F.col("ended_here") - F.col("n_censored")).alias("n_churned"),
        F.col("n_censored"),
        F.sum("ended_here").over(risk).alias("n_at_risk"),
        _R4(
            (F.col("ended_here") - F.col("n_censored"))
            / F.sum("ended_here").over(risk),
            "hazard",
        ),
    )


Q_CHURN_HAZARD_SQL = """
WITH per AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
  FROM events GROUP BY user_id
), h AS (SELECT max(CAST(ts AS DATE)) AS h FROM events),
tagged AS (
  SELECT CAST(floor(datediff('day', d0, d1) / 7.0) AS BIGINT) AS w,
         CASE WHEN datediff('day', d1, h) < 7 THEN 1 ELSE 0 END AS censored
  FROM per CROSS JOIN h
), grid AS (
  SELECT w, count(*) AS ended_here, sum(censored) AS n_censored
  FROM tagged GROUP BY w
)
SELECT w AS tenure_week,
       CAST(ended_here - n_censored AS BIGINT) AS n_churned,
       CAST(n_censored AS BIGINT) AS n_censored,
       CAST(sum(ended_here) OVER (ORDER BY w
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
         AS n_at_risk,
       round((ended_here - n_censored)
             / CAST(sum(ended_here) OVER (ORDER BY w
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS DOUBLE),
             4) AS hazard
FROM grid
"""

QUERIES["q_churn_hazard"] = (q_churn_hazard, Q_CHURN_HAZARD_SQL)


_CL_MAX_DEV = 4


def q_chain_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chain-ladder development factors on the fulfillment run-off
    triangle: cohorts = order months, development = months from
    order to line shipment; f_d = Σ cum_{d+1} / Σ cum_d over the
    cohorts that have reached d+1 — the actuarial method behind
    every claims/backlog completion forecast, run on the
    order→ship lag triangle.

    The triangle is a bounded (cohort × dev) grid from one
    aggregate; cumulation is one window along dev; factors are a
    |dev|-row aggregate with the volume-weighted convention.
    """
    c = Catalog(spark, sf_dir)
    li = c.lineitem.join(
        c.orders.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select(
        F.date_format("o_orderdate", "yyyy-MM").alias("cohort"),
        F.floor(
            F.months_between(
                F.date_trunc("month", "l_shipdate"),
                F.date_trunc("month", "o_orderdate"),
            )
        ).cast("int").alias("dev"),
    ).filter((F.col("dev") >= 0) & (F.col("dev") <= _CL_MAX_DEV))
    tri = li.groupBy("cohort", "dev").agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("cohort")
        .orderBy("dev")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = tri.withColumn("c", F.sum("n").over(w))
    nxt = cum.select(
        "cohort", (F.col("dev") - 1).alias("dev"), F.col("c").alias("c_next")
    )
    pairs = cum.join(nxt, ["cohort", "dev"])
    return pairs.groupBy("dev").agg(
        F.count(F.lit(1)).alias("n_cohorts"),
        _R4(F.sum("c_next") / F.sum("c"), "dev_factor"),
    )


Q_CHAIN_LADDER_SQL = f"""
WITH li AS (
  SELECT strftime(CAST(o.o_orderdate AS DATE), '%Y-%m') AS cohort,
         CAST(datediff('month', date_trunc('month', CAST(o.o_orderdate AS DATE)),
                       date_trunc('month', CAST(l.l_shipdate AS DATE)))
              AS INTEGER) AS dev
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), tri AS (
  SELECT cohort, dev, count(*) AS n FROM li
  WHERE dev BETWEEN 0 AND {_CL_MAX_DEV} GROUP BY 1, 2
), cum AS (
  SELECT cohort, dev,
         sum(n) OVER (PARTITION BY cohort ORDER BY dev
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM tri
), pairs AS (
  SELECT a.dev, a.c, b.c AS c_next
  FROM cum a JOIN cum b ON b.cohort = a.cohort AND b.dev = a.dev + 1
)
SELECT dev, count(*) AS n_cohorts,
       round(sum(c_next) / CAST(sum(c) AS DOUBLE), 4) AS dev_factor
FROM pairs GROUP BY dev
"""

QUERIES["q_chain_ladder"] = (q_chain_ladder, Q_CHAIN_LADDER_SQL)


_ABSORB_STEPS = 3


def q_markov_absorption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absorption probability within 3 steps: from each event type,
    the chance the chain (transition matrix estimated from
    observed user sequences, purchase absorbing) reaches a
    purchase within 3 transitions — computed by three relational
    matrix-vector multiplies over the |types|² grid, the bounded-
    state answer to "how close is each behavior to converting".

    The only fact-scale work is the one lag window that builds
    transitions; every subsequent step is a ≤25-row join.
    """
    ev = Catalog(spark, sf_dir).events.select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = ev.select(
        F.lag("event_type").over(w).alias("src"),
        F.col("event_type").alias("dst"),
    ).filter(F.col("src").isNotNull())
    counts = trans.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("c"))
    tot = Window.partitionBy("src")
    # the model is ≤|types|² rows — materialize once so the three
    # iteration joins read a leaf instead of re-nesting the
    # fact-scale transition build per step
    p = counts.select(
        "src",
        "dst",
        F.round(F.col("c") / F.sum("c").over(tot), 8).alias("p"),
    ).localCheckpoint()
    # v_0(s) = P(purchase in 1 step from s); absorbing: purchase→1
    v = p.filter(F.col("dst") == "purchase").select(
        "src", F.col("p").alias("v")
    )
    for _ in range(_ABSORB_STEPS - 1):
        # v_{k+1}(s) = P(s→purchase) + Σ_{m≠purchase} P(s→m)·v_k(m)
        step = (
            p.filter(F.col("dst") != "purchase")
            .join(
                v.select(F.col("src").alias("dst"), F.col("v").alias("vm")),
                "dst",
            )
            .groupBy("src")
            .agg(F.sum(F.col("p") * F.col("vm")).alias("cont"))
        )
        base = p.filter(F.col("dst") == "purchase").select(
            "src", F.col("p").alias("base")
        )
        v = (
            base.join(step, "src", "full")
            .select(
                "src",
                (
                    F.coalesce("base", F.lit(0.0))
                    + F.coalesce("cont", F.lit(0.0))
                ).alias("v"),
            )
        )
    return v.select("src", _R4(F.col("v"), "p_purchase_within_3"))


def _absorption_sql() -> str:
    body = ["""
WITH trans AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS src,
         event_type AS dst
  FROM events
), t2 AS (SELECT * FROM trans WHERE src IS NOT NULL),
counts AS (
  SELECT src, dst, count(*) AS c FROM t2 GROUP BY 1, 2
), p AS (
  SELECT src, dst,
         round(c / CAST(sum(c) OVER (PARTITION BY src) AS DOUBLE), 8) AS p
  FROM counts
), v0 AS (
  SELECT src, p AS v FROM p WHERE dst = 'purchase'
)"""]
    prev = "v0"
    for i in range(1, _ABSORB_STEPS):
        body.append(f""", s{i} AS (
  SELECT p.src, sum(p.p * v.v) AS cont
  FROM p JOIN {prev} v ON v.src = p.dst
  WHERE p.dst != 'purchase'
  GROUP BY p.src
), v{i} AS (
  SELECT coalesce(b.src, s.src) AS src,
         coalesce(b.p, 0.0) + coalesce(s.cont, 0.0) AS v
  FROM (SELECT src, p FROM p WHERE dst = 'purchase') b
  FULL OUTER JOIN s{i} s ON s.src = b.src
)""")
        prev = f"v{i}"
    body.append(f"""
SELECT src, round(v, 4) AS p_purchase_within_3 FROM {prev}
""")
    return "".join(body)


QUERIES["q_markov_absorption"] = (q_markov_absorption, _absorption_sql())


def q_mtbf_reliability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability engineering on the error stream: mean time
    between failures from inter-error gaps, the exponential-model
    reliability R(t) = e^(−t/MTBF) at 1 h and 24 h, and the CV of
    gaps (≈1 validates the exponential assumption; ≪1 means
    scheduled failures, ≫1 means bursts).

    The error substream is FACT-grain (errors are ~20% of events in
    this data model, not rare), so the inter-event lag must not be a
    bare global ``Window.orderBy`` — that compiles to an
    ``Exchange SinglePartition`` one-task sort over a fifth of the
    events table. ``ranged_lag`` (operators/ranks.py) computes the
    identical lag with P parallel range slices plus a P-row boundary
    ledger; the model readout is scalar algebra.
    """
    from etl_gov_spark.operators.ranks import ranged_lag

    errs = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "error"
    ).select(F.unix_micros("ts").alias("us"), "event_id")
    gaps = ranged_lag(
        errs, [F.asc("us"), F.asc("event_id")], {"prev_us": "us"}
    ).select(
        ((F.col("us") - F.col("prev_us")) / 3_600_000_000.0).alias("gap_h")
    ).filter(F.col("gap_h").isNotNull())
    agg = gaps.agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.avg("gap_h").alias("mtbf_h"),
        F.stddev_samp("gap_h").alias("sd"),
    )
    return agg.select(
        "n_gaps",
        _R4(F.col("mtbf_h"), "mtbf_hours"),
        _R4(F.col("sd") / F.col("mtbf_h"), "gap_cv"),
        _R4(F.exp(-1.0 / F.col("mtbf_h")), "reliability_1h"),
        _R4(F.exp(-24.0 / F.col("mtbf_h")), "reliability_24h"),
    )


Q_MTBF_SQL = """
WITH errs AS (
  SELECT epoch_us(ts) AS us, event_id FROM events WHERE event_type = 'error'
), gaps AS (
  SELECT (us - lag(us) OVER (ORDER BY us, event_id)) / 3600000000.0 AS gap_h
  FROM errs
), agg AS (
  SELECT count(gap_h) AS n_gaps, avg(gap_h) AS mtbf_h,
         stddev_samp(gap_h) AS sd
  FROM gaps WHERE gap_h IS NOT NULL
)
SELECT CAST(n_gaps AS BIGINT) AS n_gaps,
       round(mtbf_h, 4) AS mtbf_hours,
       round(sd / mtbf_h, 4) AS gap_cv,
       round(exp(-1.0 / mtbf_h), 4) AS reliability_1h,
       round(exp(-24.0 / mtbf_h), 4) AS reliability_24h
FROM agg
"""

QUERIES["q_mtbf_reliability"] = (q_mtbf_reliability, Q_MTBF_SQL)


def q_seasonal_diff_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is weekly differencing enough? Lag-1 and lag-7 ACF of the
    RAW daily series next to the same ACFs of the seasonally
    differenced series (y_t − y_{t−7}) — the two-column table that
    decides the D in a SARIMA spec before anyone fits one: if the
    differenced ACFs collapse toward zero, the weekly cycle was
    the structure.

    Three lag columns over the bounded daily series; four
    algebraic corr aggregates.
    """
    daily = (
        Catalog(spark, sf_dir)
        .orders.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum("o_totalprice").alias("y"))
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "y",
        F.lag("y", 1).over(w).alias("y1"),
        F.lag("y", 7).over(w).alias("y7"),
        F.lag("y", 8).over(w).alias("y8"),
    ).select(
        "y",
        "y1",
        "y7",
        (F.col("y") - F.col("y7")).alias("d"),
        (F.col("y1") - F.col("y8")).alias("d1"),
    )
    agg = lagged.agg(
        F.count("y").alias("n_days"),
        F.corr("y", "y1").alias("acf1_raw"),
        F.corr("y", "y7").alias("acf7_raw"),
        F.corr("d", "d1").alias("acf1_diff"),
    )
    return agg.select(
        "n_days",
        _R4(F.col("acf1_raw"), "acf1_raw"),
        _R4(F.col("acf7_raw"), "acf7_raw"),
        _R4(F.col("acf1_diff"), "acf1_after_weekly_diff"),
        (
            F.abs(F.col("acf1_diff")) < F.abs(F.col("acf1_raw"))
        ).alias("differencing_helps"),
    )


Q_SEASONAL_DIFF_ACF_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, sum(o_totalprice) AS y
  FROM orders GROUP BY 1
), lagged AS (
  SELECT y,
         lag(y, 1) OVER (ORDER BY day) AS y1,
         lag(y, 7) OVER (ORDER BY day) AS y7,
         lag(y, 8) OVER (ORDER BY day) AS y8
  FROM daily
), d AS (
  SELECT y, y1, y7, y - y7 AS d, y1 - y8 AS d1 FROM lagged
), agg AS (
  SELECT count(y) AS n_days,
         corr(y, y1) AS acf1_raw,
         corr(y, y7) AS acf7_raw,
         corr(d, d1) AS acf1_diff
  FROM d
)
SELECT CAST(n_days AS BIGINT) AS n_days,
       round(acf1_raw, 4) AS acf1_raw,
       round(acf7_raw, 4) AS acf7_raw,
       round(acf1_diff, 4) AS acf1_after_weekly_diff,
       abs(acf1_diff) < abs(acf1_raw) AS differencing_helps
FROM agg
"""

QUERIES["q_seasonal_diff_acf"] = (q_seasonal_diff_acf, Q_SEASONAL_DIFF_ACF_SQL)


_SURPRISE_FLOOR = 1e-3
_SURPRISE_TOP = 10


def q_behavior_surprise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UEBA-style behavioral anomaly scoring: train the event-type
    transition model on pre-split history, then score each user's
    POST-split sequence by average surprisal −log₂ P(next|cur)
    (unseen transitions floored at 1e-3) and rank the most
    surprising users — the sequence-likelihood insider-threat
    screen, where a high score means "this account stopped acting
    like itself (or anyone)".

    The model is the bounded |types|² grid broadcast against test
    transitions; per-user scores are one aggregate; output is a
    top-10 rank.
    """
    ev = Catalog(spark, sf_dir).events.select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = ev.select(
        "user_id",
        F.lag("event_type").over(w).alias("src"),
        F.col("event_type").alias("dst"),
        (F.to_date("ts") < F.lit(_MARKOV_SPLIT)).alias("is_train"),
    ).filter(F.col("src").isNotNull())
    counts = (
        trans.filter("is_train")
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = Window.partitionBy("src")
    model = counts.select(
        "src", "dst", F.round(F.col("c") / F.sum("c").over(tot), 8).alias("p")
    )
    test = trans.filter(~F.col("is_train"))
    scored = test.join(F.broadcast(model), ["src", "dst"], "left").select(
        "user_id",
        (
            -F.log2(
                F.greatest(F.coalesce("p", F.lit(0.0)), F.lit(_SURPRISE_FLOOR))
            )
        ).alias("surprise"),
    )
    per_user = scored.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.round(F.avg("surprise"), 6).alias("avg_surprise"),
    )
    # distributed top-k, rank re-derived on the k survivors
    pick = [F.desc("avg_surprise"), F.asc("user_id")]
    return (
        per_user.orderBy(*pick)
        .limit(_SURPRISE_TOP)
        .withColumn("rank", F.row_number().over(Window.orderBy(*pick)))
        .select(
            "rank",
            "user_id",
            "n_transitions",
            _R4(F.col("avg_surprise"), "avg_surprise_bits"),
        )
    )


Q_BEHAVIOR_SURPRISE_SQL = f"""
WITH trans AS (
  SELECT user_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS src,
         event_type AS dst,
         CAST(ts AS DATE) < DATE '{_MARKOV_SPLIT}' AS is_train
  FROM events
), t2 AS (SELECT * FROM trans WHERE src IS NOT NULL),
counts AS (
  SELECT src, dst, count(*) AS c FROM t2 WHERE is_train GROUP BY 1, 2
), model AS (
  SELECT src, dst,
         round(c / CAST(sum(c) OVER (PARTITION BY src) AS DOUBLE), 8) AS p
  FROM counts
), scored AS (
  SELECT t.user_id,
         -log2(greatest(coalesce(m.p, 0.0), {_SURPRISE_FLOOR!r})) AS surprise
  FROM t2 t LEFT JOIN model m ON m.src = t.src AND m.dst = t.dst
  WHERE NOT t.is_train
), per_user AS (
  SELECT user_id, count(*) AS n_transitions,
         round(avg(surprise), 6) AS avg_surprise
  FROM scored GROUP BY user_id
)
SELECT CAST(row_number() OVER (ORDER BY avg_surprise DESC, user_id ASC)
            AS INTEGER) AS rank,
       user_id, n_transitions,
       round(avg_surprise, 4) AS avg_surprise_bits
FROM per_user
ORDER BY rank LIMIT {_SURPRISE_TOP}
"""

QUERIES["q_behavior_surprise"] = (q_behavior_surprise, Q_BEHAVIOR_SURPRISE_SQL)


def q_burstiness_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goh-Barabási burstiness of each user's inter-event times:
    B = (σ−μ)/(σ+μ) ∈ (−1, 1) — B≈−1 is clockwork, 0 is Poisson,
    →1 is bursty — censused into bands. The inter-event-TIME
    companion of ``q_fano_factor``'s count overdispersion: two
    users with identical daily counts can sit at opposite ends of
    this dial.

    One lag window per user builds gaps; per-user moments are one
    aggregate; the band census is bounded output.
    """
    ev = Catalog(spark, sf_dir).events.select(
        "user_id", F.unix_micros("ts").alias("us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gaps = ev.select(
        "user_id",
        ((F.col("us") - F.lag("us").over(w)) / 3_600_000_000.0).alias("g"),
    ).filter(F.col("g").isNotNull())
    per = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("g").alias("mu"),
        F.stddev_pop("g").alias("sd"),
    ).filter(F.col("n") >= 5)
    b = F.round((F.col("sd") - F.col("mu")) / (F.col("sd") + F.col("mu")), 6)
    band = (
        F.when(b < -0.2, "regular")
        .when(b < 0.2, "poisson_like")
        .when(b < 0.6, "bursty")
        .otherwise("extreme")
    )
    return per.groupBy(band.alias("band")).agg(
        F.count(F.lit(1)).alias("n_users"),
        _R4(F.avg(b), "avg_burstiness"),
    )


Q_BURSTINESS_SQL = """
WITH gaps AS (
  SELECT user_id,
         (epoch_us(ts) - lag(epoch_us(ts))
            OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
           / 3600000000.0 AS g
  FROM events
), per AS (
  SELECT user_id, count(g) AS n, avg(g) AS mu, stddev_pop(g) AS sd
  FROM gaps WHERE g IS NOT NULL GROUP BY user_id
), scored AS (
  SELECT round((sd - mu) / (sd + mu), 6) AS b
  FROM per WHERE n >= 5
)
SELECT CASE WHEN b < -0.2 THEN 'regular'
            WHEN b < 0.2 THEN 'poisson_like'
            WHEN b < 0.6 THEN 'bursty'
            ELSE 'extreme' END AS band,
       count(*) AS n_users,
       round(avg(b), 4) AS avg_burstiness
FROM scored GROUP BY 1
"""

QUERIES["q_burstiness_coefficient"] = (
    q_burstiness_coefficient,
    Q_BURSTINESS_SQL,
)


def q_weekday_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (weekday × hour) activity heatmap with share-of-total —
    the load-profile matrix behind capacity planning and on-call
    staffing, plus each cell's ratio to the uniform expectation so
    hot cells read directly.

    One grouped aggregate to the bounded 7×24 grid; shares are a
    broadcast-scalar division.
    """
    ev = Catalog(spark, sf_dir).events.select(
        (F.dayofweek("ts") - 1).alias("weekday"),
        F.hour("ts").alias("hour"),
    )
    cell = ev.groupBy("weekday", "hour").agg(F.count(F.lit(1)).alias("n"))
    tot = cell.agg(
        F.sum("n").alias("t"), F.count(F.lit(1)).alias("cells")
    )
    return cell.crossJoin(F.broadcast(tot)).select(
        "weekday",
        "hour",
        "n",
        # integer-path 4-dp readouts: integer-count ratios land on
        # exact 4-dp half-ties (565/100000 = .00565) where
        # round(x, 4) disagrees across engines (sf0.1 gate finding,
        # round 12)
        (F.round(F.col("n") / F.col("t") * 10000.0) / 10000.0).alias("share"),
        (
            F.round(F.col("n") * F.col("cells") / F.col("t") * 10000.0)
            / 10000.0
        ).alias("vs_uniform"),
    )


Q_WEEKDAY_HOUR_SQL = """
WITH cell AS (
  SELECT dayofweek(ts) AS weekday, extract(hour FROM ts) AS hour,
         count(*) AS n
  FROM events GROUP BY 1, 2
), tot AS (SELECT sum(n) AS t, count(*) AS cells FROM cell)
SELECT weekday, hour, n,
       round(n / CAST(t AS DOUBLE) * 10000.0) / 10000.0 AS share,
       round(n * cells / CAST(t AS DOUBLE) * 10000.0) / 10000.0 AS vs_uniform
FROM cell CROSS JOIN tot
"""

QUERIES["q_weekday_hour_profile"] = (
    q_weekday_hour_profile,
    Q_WEEKDAY_HOUR_SQL,
)


def q_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-peak census of daily revenue: days strictly above both
    neighbours AND above 1.25× the centred 7-day rolling mean — the
    prominence gate that separates genuine demand spikes from
    sawtooth noise. Top-10 peaks by prominence.

    Daily revenue folds to integer cents (bit-identical series in
    both engines); neighbours/rolling mean are bounded day-grain
    windows; the top-10 is a distributed TakeOrdered.
    """
    orders = Catalog(spark, sf_dir).orders
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.round(F.sum("o_totalprice") * 100).cast("long").alias("cents")
    )
    w = Window.orderBy("day")
    wroll = w.rowsBetween(-3, 3)
    scored = (
        daily.withColumn("prev", F.lag("cents").over(w))
        .withColumn("next", F.lead("cents").over(w))
        .withColumn("roll", F.avg("cents").over(wroll))
        .filter(
            (F.col("cents") > F.col("prev"))
            & (F.col("cents") > F.col("next"))
            & (F.col("cents") > 1.25 * F.col("roll"))
        )
        .withColumn(
            "prominence", F.round(F.col("cents") / F.col("roll"), 6)
        )
    )
    pick = [F.desc("prominence"), F.asc("day")]
    return (
        scored.orderBy(*pick)
        .limit(10)
        .withColumn("rank", F.row_number().over(Window.orderBy(*pick)))
        .select(
            "rank",
            F.col("day").cast("string").alias("day"),
            _R4(F.col("cents") / 100.0, "revenue"),
            _R4(F.col("prominence"), "prominence"),
        )
    )


Q_PEAK_DETECTION_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS cents
  FROM orders GROUP BY 1
), scored AS (
  SELECT day, cents,
         lag(cents) OVER (ORDER BY day) AS prev,
         lead(cents) OVER (ORDER BY day) AS next,
         avg(cents) OVER (ORDER BY day
             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS roll
  FROM daily
), peaks AS (
  SELECT day, cents, round(cents / roll, 6) AS prominence
  FROM scored
  WHERE cents > prev AND cents > next AND cents > 1.25 * roll
)
SELECT CAST(row_number() OVER (ORDER BY prominence DESC, day ASC) AS INTEGER)
         AS rank,
       CAST(day AS VARCHAR) AS day,
       round(cents / 100.0, 4) AS revenue,
       round(prominence, 4) AS prominence
FROM peaks ORDER BY rank LIMIT 10
"""

QUERIES["q_peak_detection"] = (q_peak_detection, Q_PEAK_DETECTION_SQL)


def q_bollinger_breakouts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger-band discipline on daily revenue: a trailing 20-day
    mean ± 2σ envelope, then the census of breakout days above/below
    the band per month — the volatility-normalized "was that day
    actually unusual" readout ops teams eyeball as a chart.

    Cents-exact daily series, one trailing window (20 rows), a
    bounded month rollup.
    """
    orders = Catalog(spark, sf_dir).orders
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.round(F.sum("o_totalprice") * 100).cast("long").alias("cents")
    )
    w = Window.orderBy("day").rowsBetween(-19, 0)
    banded = (
        daily.withColumn("mid", F.avg("cents").over(w))
        .withColumn("sd", F.stddev_samp("cents").over(w))
        .withColumn("n_win", F.count(F.lit(1)).over(w))
        .filter(F.col("n_win") == 20)  # full windows only
    )
    up = F.col("cents") > F.col("mid") + 2 * F.col("sd")
    dn = F.col("cents") < F.col("mid") - 2 * F.col("sd")
    return (
        banded.groupBy(F.date_format("day", "yyyy-MM").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum(up.cast("long")).alias("n_above_band"),
            F.sum(dn.cast("long")).alias("n_below_band"),
            _R4(F.avg(F.col("sd") / F.col("mid")), "mean_bandwidth"),
        )
    )


Q_BOLLINGER_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS cents
  FROM orders GROUP BY 1
), banded AS (
  SELECT day, cents,
         avg(cents) OVER (ORDER BY day
             ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS mid,
         stddev_samp(cents) OVER (ORDER BY day
             ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS sd,
         count(*) OVER (ORDER BY day
             ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS n_win
  FROM daily
)
SELECT strftime(day, '%Y-%m') AS month,
       count(*) AS n_days,
       CAST(sum(CASE WHEN cents > mid + 2 * sd THEN 1 ELSE 0 END) AS BIGINT)
         AS n_above_band,
       CAST(sum(CASE WHEN cents < mid - 2 * sd THEN 1 ELSE 0 END) AS BIGINT)
         AS n_below_band,
       round(avg(sd / mid), 4) AS mean_bandwidth
FROM banded WHERE n_win = 20
GROUP BY 1
"""

QUERIES["q_bollinger_breakouts"] = (q_bollinger_breakouts, Q_BOLLINGER_SQL)


def q_rsi_indicator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-day RSI (simple-average Cutler variant) of daily revenue,
    summarized as the overbought/oversold day census per quarter —
    the mean-reversion regime readout. The Cutler form (simple
    moving averages of gains/losses, not Wilder's recursive EWMA)
    is chosen deliberately: it is order-exact in one bounded window
    per engine, no recursion.

    Cents-exact series; day-grain windows only.
    """
    orders = Catalog(spark, sf_dir).orders
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.round(F.sum("o_totalprice") * 100).cast("long").alias("cents")
    )
    w = Window.orderBy("day")
    wr = w.rowsBetween(-13, 0)
    diff = F.col("cents") - F.lag("cents").over(w)
    scored = (
        daily.withColumn("gain", F.greatest(diff, F.lit(0)).cast("double"))
        .withColumn("loss", F.greatest(-diff, F.lit(0)).cast("double"))
        .withColumn("ag", F.avg("gain").over(wr))
        .withColumn("al", F.avg("loss").over(wr))
        .withColumn("n_win", F.count("gain").over(wr))
        .filter(F.col("n_win") == 14)
        .withColumn(
            "rsi",
            F.round(
                100.0
                - 100.0 / (1.0 + F.col("ag") / F.col("al")),
                6,
            ),
        )
    )
    return (
        scored.groupBy(
            F.concat(
                F.year("day").cast("string"),
                F.lit("-Q"),
                F.quarter("day").cast("string"),
            ).alias("quarter")
        )
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            _R4(F.avg("rsi"), "mean_rsi"),
            F.sum((F.col("rsi") > 70).cast("long")).alias("n_overbought"),
            F.sum((F.col("rsi") < 30).cast("long")).alias("n_oversold"),
        )
    )


Q_RSI_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS cents
  FROM orders GROUP BY 1
), diffed AS (
  SELECT day,
         greatest(CAST(cents - lag(cents) OVER (ORDER BY day) AS DOUBLE), 0)
           AS gain,
         greatest(CAST(lag(cents) OVER (ORDER BY day) - cents AS DOUBLE), 0)
           AS loss
  FROM daily
), scored AS (
  SELECT day,
         avg(gain) OVER (ORDER BY day
             ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS ag,
         avg(loss) OVER (ORDER BY day
             ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS al,
         count(gain) OVER (ORDER BY day
             ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS n_win
  FROM diffed
), rsi AS (
  SELECT day, round(100.0 - 100.0 / (1.0 + ag / al), 6) AS rsi
  FROM scored WHERE n_win = 14
)
SELECT CAST(year(day) AS VARCHAR) || '-Q' || CAST(quarter(day) AS VARCHAR)
         AS quarter,
       count(*) AS n_days,
       round(avg(rsi), 4) AS mean_rsi,
       CAST(sum(CASE WHEN rsi > 70 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_overbought,
       CAST(sum(CASE WHEN rsi < 30 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oversold
FROM rsi GROUP BY 1
"""

QUERIES["q_rsi_indicator"] = (q_rsi_indicator, Q_RSI_SQL)


def q_forecast_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MASE (Hyndman-Koehler 2006) of the seasonal-naive forecast:
    MAE of the lag-7 model scaled by the in-sample MAE of the lag-1
    naive — the scale-free forecast-eval metric that lets one
    number compare types with wildly different volumes, completing
    the backtest family next to ``q_seasonal_naive_backtest``'s
    raw MAE/MAPE. MASE < 1 means the weekly pattern genuinely
    beats "tomorrow = today".

    Both error streams come from the same lag window pass over the
    bounded (type, day) matrix; errors are integer differences so
    every aggregate is bit-stable across engines.
    """
    ev = Catalog(spark, sf_dir).events.select(
        "event_type", F.to_date("ts").alias("day")
    )
    daily = ev.groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("y"))
    w = Window.partitionBy("event_type").orderBy("day")
    scored = daily.select(
        "event_type",
        "y",
        F.lag("y", 7).over(w).alias("yhat7"),
        F.lag("y", 1).over(w).alias("yhat1"),
    ).filter(F.col("yhat7").isNotNull())
    mae7 = F.avg(F.abs(F.col("y") - F.col("yhat7")))
    mae1 = F.avg(F.abs(F.col("y") - F.col("yhat1")))
    return (
        scored.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days_scored"),
            _R4(mae7, "mae_seasonal"),
            _R4(mae1, "mae_naive1"),
            _R4(mae7 / mae1, "mase"),
            (F.round(mae7 / mae1, 6) < 1.0).alias("beats_naive"),
        )
        .orderBy("event_type")
    )


Q_FORECAST_MASE_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
  FROM events GROUP BY 1, 2
), scored AS (
  SELECT event_type, y,
         lag(y, 7) OVER (PARTITION BY event_type ORDER BY day) AS yhat7,
         lag(y, 1) OVER (PARTITION BY event_type ORDER BY day) AS yhat1
  FROM daily
)
SELECT event_type, count(*) AS n_days_scored,
       round(avg(abs(y - yhat7)), 4) AS mae_seasonal,
       round(avg(abs(y - yhat1)), 4) AS mae_naive1,
       round(avg(abs(y - yhat7)) / avg(abs(y - yhat1)), 4) AS mase,
       round(avg(abs(y - yhat7)) / avg(abs(y - yhat1)), 6) < 1.0 AS beats_naive
FROM scored WHERE yhat7 IS NOT NULL
GROUP BY event_type ORDER BY event_type
"""

QUERIES["q_forecast_mase"] = (q_forecast_mase, Q_FORECAST_MASE_SQL)


def q_tracking_signal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast tracking signal (Trigg's classic bias monitor): the
    running Σ(error)/running-MAE of the seasonal-naive forecast per
    event type, the control chart a demand planner watches — a
    signal drifting past ±4 means the forecast is systematically
    biased and must be re-fit, long before MAE alone would say so.

    One lag window + two running windows over the bounded
    (type, day) matrix; readout per type is the final signal, the
    worst |signal| on the horizon, and the count of out-of-band
    days. Integer errors keep the running sums bit-stable; the
    signal rounds at 6 dp before banding.
    """
    ev = Catalog(spark, sf_dir).events.select(
        "event_type", F.to_date("ts").alias("day")
    )
    daily = ev.groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("y"))
    w = Window.partitionBy("event_type").orderBy("day")
    scored = daily.select(
        "event_type", "day", (F.col("y") - F.lag("y", 7).over(w)).alias("e")
    ).filter(F.col("e").isNotNull())
    wrun = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run_mae = F.avg(F.abs(F.col("e"))).over(wrun)
    # a flat start (all errors 0 so far) is an in-control signal of
    # 0, not a divide-by-zero
    ts6 = F.when(run_mae == 0, F.lit(0.0)).otherwise(
        F.round(F.sum("e").over(wrun) / run_mae, 6)
    )
    sig = scored.select("event_type", "day", ts6.alias("ts"))
    return (
        sig.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days_scored"),
            _R4(F.max_by("ts", "day"), "final_signal"),
            _R4(F.max(F.abs("ts")), "max_abs_signal"),
            F.sum((F.abs("ts") > 4.0).cast("long")).alias("n_out_of_band"),
        )
        .orderBy("event_type")
    )


Q_TRACKING_SIGNAL_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
  FROM events GROUP BY 1, 2
), scored AS (
  SELECT event_type, day,
         y - lag(y, 7) OVER (PARTITION BY event_type ORDER BY day) AS e
  FROM daily
), sig AS (
  SELECT event_type, day,
         CASE WHEN avg(abs(e)) OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 0
              THEN 0.0
              ELSE round(sum(e) OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               / avg(abs(e)) OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) END AS ts
  FROM scored WHERE e IS NOT NULL
)
SELECT event_type, count(*) AS n_days_scored,
       round(max_by(ts, day), 4) AS final_signal,
       round(max(abs(ts)), 4) AS max_abs_signal,
       CAST(sum(CASE WHEN abs(ts) > 4.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_out_of_band
FROM sig GROUP BY event_type ORDER BY event_type
"""

QUERIES["q_tracking_signal"] = (q_tracking_signal, Q_TRACKING_SIGNAL_SQL)


# Watermark-lateness replay: deterministic md5-derived network delay
# (0..1799 s per event) turns the event-time-ordered feed into an
# out-of-order arrival stream; candidate watermark horizons to price.
_LATE_MAX_DELAY_S = 1800
_LATE_HORIZONS_S = (0, 60, 300, 900, 1800)


def q_watermark_lateness_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audit that PICKS the watermark for every §B streaming
    query: replay the events feed in arrival order and price each
    candidate horizon by how many events the watermark would drop.

    Arrival order is the standard replay experiment — event time
    plus a deterministic per-event network delay (md5(event_id) mod
    1800 s, identical in both engines; the feed itself is perfectly
    event-time-ordered, so lateness must be injected to be studied).
    An event is DROPPED at horizon h if, when it arrives, the
    high-water-mark (max event time seen so far) already exceeds its
    event time by more than h — exactly Structured Streaming's
    ``withWatermark`` drop rule. One row per horizon with the drop
    count/share, plus the lateness tail (max, p99-by-count) that
    says what horizon WOULD have been enough.

    Scale: the high-water-mark is a global running max at fact
    grain — computed with the ``ranged_global_rank`` prefix-max
    ledger (range repartition + P-row driver ledger lifted back as
    literals), NO Exchange SinglePartition anywhere. Everything
    downstream is one conditional aggregate; all arithmetic is
    integer microseconds.
    """
    from etl_gov_spark.operators.ranks import ranged_global_rank

    ev = Catalog(spark, sf_dir).events.select(
        "event_id", F.unix_micros("ts").alias("ts_us")
    )
    delay_us = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % _LATE_MAX_DELAY_S
    ) * 1_000_000
    arr = ev.select(
        "event_id", "ts_us", (F.col("ts_us") + delay_us).alias("arrival_us")
    )
    hwm = ranged_global_rank(
        arr,
        [F.asc("arrival_us"), F.asc("event_id")],
        rank_col=None,
        running_max_longs={"hwm_us": "ts_us"},
    )
    late = hwm.select(
        (F.col("hwm_us") - F.col("ts_us")).alias("late_us")
    )
    stats = late.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("late_us").alias("max_late_us"),
        *[
            F.sum(
                F.when(F.col("late_us") > h * 1_000_000, 1).otherwise(0)
            ).alias(f"_d{h}")
            for h in _LATE_HORIZONS_S
        ],
    )
    stacked = stats.select(
        "n_events",
        "max_late_us",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(h).alias("horizon_s"),
                        F.col(f"_d{h}").alias("n_dropped"),
                    )
                    for h in _LATE_HORIZONS_S
                ]
            )
        ).alias("x"),
    )
    return stacked.select(
        F.col("x.horizon_s").alias("horizon_s"),
        F.col("x.n_dropped").cast("long").alias("n_dropped"),
        (
            F.round(
                F.col("x.n_dropped").cast("double") / F.col("n_events") * 10000.0
            )
            / 10000.0
        ).alias("drop_share"),
        "n_events",
        (F.col("max_late_us") / F.lit(1_000_000)).cast("long").alias("max_late_s"),
    ).orderBy("horizon_s")


Q_WATERMARK_LATENESS_SQL = f"""
WITH arr AS (
  SELECT event_id, epoch_us(ts) AS ts_us,
         epoch_us(ts)
           + (CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 4) AS BIGINT)
              % {_LATE_MAX_DELAY_S}) * 1000000 AS arrival_us
  FROM events
), hwm AS (
  SELECT ts_us,
         max(ts_us) OVER (ORDER BY arrival_us, event_id
                          ROWS UNBOUNDED PRECEDING) AS hwm_us
  FROM arr
), late AS (
  SELECT hwm_us - ts_us AS late_us FROM hwm
), stats AS (
  SELECT count(*) AS n_events, max(late_us) AS max_late_us,
         {", ".join(f"sum(CASE WHEN late_us > {h} * 1000000 THEN 1 ELSE 0 END) AS d{h}" for h in _LATE_HORIZONS_S)}
  FROM late
)
SELECT u.horizon_s,
       CAST(u.n_dropped AS BIGINT) AS n_dropped,
       round(CAST(u.n_dropped AS DOUBLE) / n_events * 10000.0) / 10000.0
         AS drop_share,
       n_events,
       CAST(max_late_us // 1000000 AS BIGINT) AS max_late_s
FROM stats,
     unnest([{", ".join(f"struct_pack(horizon_s := {h}, n_dropped := d{h})" for h in _LATE_HORIZONS_S)}]) AS t(u)
ORDER BY u.horizon_s
"""

QUERIES["q_watermark_lateness_census"] = (
    q_watermark_lateness_census,
    Q_WATERMARK_LATENESS_SQL,
)


# SAX (Lin et al. 2003) gaussian breakpoints for a 4-symbol alphabet.
_SAX_BREAKS = (-0.6745, 0.0, 0.6745)
_SAX_WORD = 4
_SAX_TOP = 10


def q_sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX motif census of the daily revenue series (Lin et al.
    2003, "A Symbolic Representation of Time Series"): z-normalize
    the bounded daily series, discretize each day into a 4-symbol
    gaussian-breakpoint alphabet, slide a 4-day word, and census the
    words — the top-10 recurring motifs with first occurrence and
    support. The symbolic index is what makes motif/novelty lookups
    on a 100 TB event history O(words), not O(days²).

    Determinism: z-scores are quantized on the 1e-6 grid with
    integer-path rounding BEFORE the breakpoint comparison, so both
    engines bucket borderline days identically (a quantized z equal
    to a breakpoint falls on the same side in both). Mean/std come
    from explicit power sums. The series is bounded-domain (days),
    so the ordering window is the whitelisted shape; the census is
    a ≤4⁴-key aggregate.
    """
    daily = (
        Catalog(spark, sf_dir)
        .orders.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("y"))
    )
    m = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("s1"),
        F.sum(F.col("y") * F.col("y")).alias("s2"),
    )
    z6 = (
        F.round(
            (F.col("y") - F.col("s1") / F.col("n"))
            / F.sqrt(F.col("s2") / F.col("n") - F.pow(F.col("s1") / F.col("n"), 2))
            * 1000000.0
        )
        / 1000000.0
    )
    sym = (
        F.when(z6 < _SAX_BREAKS[0], "a")
        .when(z6 < _SAX_BREAKS[1], "b")
        .when(z6 < _SAX_BREAKS[2], "c")
        .otherwise("d")
    )
    w = Window.orderBy("day")
    words = (
        daily.crossJoin(F.broadcast(m))
        .select("day", sym.alias("s"))
        .select(
            "day",
            F.concat(
                "s",
                F.lead("s", 1).over(w),
                F.lead("s", 2).over(w),
                F.lead("s", 3).over(w),
            ).alias("word"),
        )
        .filter(F.length("word") == _SAX_WORD)
    )
    census = words.groupBy("word").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.min("day").alias("first_day"),
    )
    wr = Window.orderBy(F.desc("n_occurrences"), F.asc("word"))
    return (
        census.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= _SAX_TOP)
        .select("word", "n_occurrences", "first_day", "rank")
    )


Q_SAX_MOTIFS_SQL = f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
         round(sum(o_totalprice), 2) AS y
  FROM orders GROUP BY 1
), m AS (
  SELECT count(*) AS n, sum(y) AS s1, sum(y * y) AS s2 FROM daily
), sym AS (
  SELECT day,
         CASE WHEN z < {_SAX_BREAKS[0]} THEN 'a'
              WHEN z < {_SAX_BREAKS[1]} THEN 'b'
              WHEN z < {_SAX_BREAKS[2]} THEN 'c'
              ELSE 'd' END AS s
  FROM (
    SELECT day,
           round((y - s1 / n) / sqrt(s2 / n - (s1 / n) * (s1 / n))
                 * 1000000.0) / 1000000.0 AS z
    FROM daily, m
  )
), words AS (
  SELECT day,
         s || lead(s, 1) OVER (ORDER BY day)
           || lead(s, 2) OVER (ORDER BY day)
           || lead(s, 3) OVER (ORDER BY day) AS word
  FROM sym
), census AS (
  SELECT word, count(*) AS n_occurrences, min(day) AS first_day
  FROM words WHERE length(word) = {_SAX_WORD}
  GROUP BY word
)
SELECT word, n_occurrences, first_day,
       CAST(rank AS INTEGER) AS rank
FROM (
  SELECT *, row_number() OVER (ORDER BY n_occurrences DESC, word ASC) AS rank
  FROM census
)
WHERE rank <= {_SAX_TOP}
"""

QUERIES["q_sax_motifs"] = (q_sax_motifs, Q_SAX_MOTIFS_SQL)


_MP_L = 7  # matrix-profile subsequence length (one week)
_MP_TOP = 3


def q_matrix_profile_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact matrix profile over the daily revenue series (Yeh et
    al., ICDM 2016): z-normalized euclidean distance between every
    pair of 7-day subsequences (exclusion zone |i−j| ≥ 7), reporting
    the top-3 motif pairs (closest recurring weekly shapes) and the
    top discord (the week least like any other — the anomaly). The
    exact-distance companion to q_sax_motifs' symbolic census.

    Scale stance: the matrix profile is quadratic IN THE SERIES
    LENGTH, which is bounded-domain here (days; ~724 subsequences →
    ~0.5M pairs at any corpus size — the fact table only feeds the
    daily aggregate). Subsequences build from 6 leads over the
    day-indexed window (whitelisted bounded shape); distances are
    quantized on the 1e-6 grid with integer-path rounding before
    ranking, ties break on (day_a, day_b).
    """
    daily = (
        Catalog(spark, sf_dir)
        .orders.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("y"))
    )
    w = Window.orderBy("day")
    idx = daily.select(
        "day", "y", F.row_number().over(w).alias("i")
    )
    cols = [F.col("y").alias("y0")] + [
        F.lead("y", k).over(w).alias(f"y{k}") for k in range(1, _MP_L)
    ]
    sub = (
        idx.select("day", "i", *cols)
        .filter(F.col(f"y{_MP_L - 1}").isNotNull())
        .withColumn("v", F.array(*[f"y{k}" for k in range(_MP_L)]))
        .withColumn(
            "mu",
            F.aggregate("v", F.lit(0.0), lambda a, x: a + x) / _MP_L,
        )
        .withColumn(
            "sd",
            F.sqrt(
                F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x) / _MP_L
                - F.col("mu") * F.col("mu")
            ),
        )
        .filter(F.col("sd") > 0)
        .select(
            "day",
            "i",
            F.transform(
                "v", lambda x: (x - F.col("mu")) / F.col("sd")
            ).alias("z"),
        )
    )
    a = sub.select(
        F.col("day").alias("day_a"), F.col("i").alias("ia"), F.col("z").alias("za")
    )
    b = sub.select(
        F.col("day").alias("day_b"), F.col("i").alias("ib"), F.col("z").alias("zb")
    )
    d6 = (
        F.round(
            F.sqrt(
                F.aggregate(
                    F.zip_with("za", "zb", lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            )
            * 1000000.0
        )
        / 1000000.0
    )
    pairs = (
        a.join(b, F.abs(F.col("ia") - F.col("ib")) >= _MP_L)
        .select("day_a", "day_b", d6.alias("dist"))
    )
    wm = Window.orderBy(F.asc("dist"), F.asc("day_a"), F.asc("day_b"))
    motifs = (
        pairs.filter(F.col("day_a") < F.col("day_b"))
        .withColumn("rank", F.row_number().over(wm))
        .filter(F.col("rank") <= _MP_TOP)
        .select(
            F.lit("motif").alias("kind"), "rank", "day_a", "day_b", "dist"
        )
    )
    mp = pairs.groupBy("day_a").agg(F.min("dist").alias("dist"))
    wd = Window.orderBy(F.desc("dist"), F.asc("day_a"))
    discord = (
        mp.withColumn("rank", F.row_number().over(wd))
        .filter(F.col("rank") == 1)
        .select(
            F.lit("discord").alias("kind"),
            "rank",
            "day_a",
            F.lit(None).cast("date").alias("day_b"),
            "dist",
        )
    )
    return motifs.unionByName(discord).orderBy("kind", "rank")


Q_MATRIX_PROFILE_SQL = f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
         round(sum(o_totalprice), 2) AS y
  FROM orders GROUP BY 1
), idx AS (
  SELECT day, y, row_number() OVER (ORDER BY day) AS i FROM daily
), sub0 AS (
  SELECT day, i,
         [{", ".join(f"lead(y, {k}) OVER (ORDER BY day)" if k else "y" for k in range(_MP_L))}] AS v
  FROM idx
), sub AS (
  SELECT day, i,
         list_transform(v, x -> (x - mu) / sd) AS z
  FROM (
    SELECT day, i, v,
           list_sum(v) / {_MP_L} AS mu,
           sqrt(list_sum(list_transform(v, x -> x * x)) / {_MP_L}
                - (list_sum(v) / {_MP_L}) * (list_sum(v) / {_MP_L})) AS sd
    FROM sub0 WHERE v[{_MP_L}] IS NOT NULL
  ) WHERE sd > 0
), pairs AS (
  SELECT a.day AS day_a, b.day AS day_b,
         round(sqrt(list_sum(list_transform(
             generate_series(1, {_MP_L}),
             k -> (a.z[k] - b.z[k]) * (a.z[k] - b.z[k]))))
           * 1000000.0) / 1000000.0 AS dist
  FROM sub a JOIN sub b ON abs(a.i - b.i) >= {_MP_L}
), motifs AS (
  SELECT 'motif' AS kind, CAST(rank AS INTEGER) AS rank, day_a, day_b, dist
  FROM (
    SELECT *, row_number() OVER (ORDER BY dist ASC, day_a ASC, day_b ASC) AS rank
    FROM pairs WHERE day_a < day_b
  ) WHERE rank <= {_MP_TOP}
), discord AS (
  SELECT 'discord' AS kind, CAST(rank AS INTEGER) AS rank, day_a,
         CAST(NULL AS DATE) AS day_b, dist
  FROM (
    SELECT *, row_number() OVER (ORDER BY dist DESC, day_a ASC) AS rank
    FROM (SELECT day_a, min(dist) AS dist FROM pairs GROUP BY day_a)
  ) WHERE rank = 1
)
SELECT * FROM motifs
UNION ALL
SELECT * FROM discord
ORDER BY kind, rank
"""

QUERIES["q_matrix_profile_motifs"] = (
    q_matrix_profile_motifs,
    Q_MATRIX_PROFILE_SQL,
)
