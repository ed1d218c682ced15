"""Sketch-based approximate aggregation (SURVEY.md §2.A extension;
complements the HLL approx_count_distinct and GK approx-quantile
coverage in relational/mlstats).

Count-min sketch as pure SQL algebra: when the key cardinality is
too high to groupBy exactly (per-IP counters over 100 TB of logs),
a D×W counter matrix bounds memory at D·W cells regardless of key
count, with one-sided error ≤ 2N/W at confidence 1−(1/2)^D.

Spark-first: the sketch build is ONE groupBy over (depth, bucket) —
bounded keys, map-side combined, mergeable across partitions and
across days (sketches add cell-wise, which is why they stream).
Bucket hashing is the portable md5 scheme, so the DuckDB oracle
replays the identical sketch and the estimates match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_gov_spark.io.sources import Catalog

_R4 = lambda c, n: F.round(c, 4).alias(n)  # noqa: E731

CM_DEPTH = 4
CM_WIDTH = 256  # 2 hex chars
_TOP = 10


def _bucket(depth_col, key_col) -> F.Column:
    """Row-d bucket of a key: first 2 hex chars of md5(d:key)."""
    return F.conv(
        F.substring(
            F.md5(F.concat(depth_col.cast("string"), F.lit(":"), key_col.cast("string"))),
            1,
            2,
        ),
        16,
        10,
    ).cast("int")


def q_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 users by event count, with the count-min estimate each
    would get from a 4×256 sketch and the overcount — the accuracy
    audit you run before trusting sketch counters at scale.

    The sketch build explodes each event into its 4 (depth, bucket)
    cells and aggregates — 1024 cells total regardless of user
    cardinality. Estimates probe the same cells and take the
    row-wise min (classic CM read). Both the exact top-k (for the
    audit) and the sketch come from single-shuffle aggregates.
    """
    ev = Catalog(spark, sf_dir).events.select("user_id")
    cells = ev.select(
        "user_id", F.explode(F.sequence(F.lit(0), F.lit(CM_DEPTH - 1))).alias("d")
    ).select("d", _bucket(F.col("d"), F.col("user_id")).alias("bucket"))
    sketch = cells.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("cell"))

    true_counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_count"))
    # distributed top-k, rank re-derived on the k survivors
    w = [F.desc("true_count"), F.asc("user_id")]
    top = (
        true_counts.orderBy(*w)
        .limit(_TOP)
        .withColumn("rank", F.row_number().over(Window.orderBy(*w)))
    )
    probes = top.select(
        "user_id",
        "true_count",
        "rank",
        F.explode(F.sequence(F.lit(0), F.lit(CM_DEPTH - 1))).alias("d"),
    ).select(
        "user_id", "true_count", "rank", "d",
        _bucket(F.col("d"), F.col("user_id")).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy("user_id", "true_count", "rank")
        .agg(F.min("cell").alias("cm_estimate"))
        .select(
            "user_id",
            "true_count",
            "cm_estimate",
            (F.col("cm_estimate") - F.col("true_count")).alias("overcount"),
            "rank",
        )
    )


Q_COUNTMIN_SQL = f"""
WITH cells AS (
  SELECT d,
         CAST('0x' || substr(md5(CAST(d AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)), 1, 2) AS INTEGER) AS bucket
  FROM events, unnest(generate_series(0, {CM_DEPTH - 1})) AS t(d)
), sketch AS (
  SELECT d, bucket, count(*) AS cell FROM cells GROUP BY 1, 2
), top AS (
  SELECT user_id, true_count, rank FROM (
    SELECT user_id, count(*) AS true_count,
           CAST(row_number() OVER (ORDER BY count(*) DESC, user_id ASC) AS INTEGER) AS rank
    FROM events GROUP BY user_id
  ) WHERE rank <= {_TOP}
), probes AS (
  SELECT user_id, true_count, rank, d,
         CAST('0x' || substr(md5(CAST(d AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)), 1, 2) AS INTEGER) AS bucket
  FROM top, unnest(generate_series(0, {CM_DEPTH - 1})) AS t(d)
)
SELECT p.user_id, p.true_count,
       min(s.cell) AS cm_estimate,
       min(s.cell) - p.true_count AS overcount,
       p.rank
FROM probes p JOIN sketch s ON p.d = s.d AND p.bucket = s.bucket
GROUP BY p.user_id, p.true_count, p.rank
"""


QUERIES: dict[str, tuple] = {
    "q_countmin_heavy_hitters": (q_countmin_heavy_hitters, Q_COUNTMIN_SQL),
}


HLL_REL_BOUND = 0.05  # 3σ for lgConfigK=12 is ~4.9%; sparse mode is exact


def q_hll_daily_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch partial aggregation with a DRIVER-VISIBLE error
    audit: per-day user sketches, the WEEKLY distinct-user estimate
    by unioning the daily sketches (no second scan of raw events
    for the rollup itself), then the estimate is audited against
    the exact weekly distinct and reported as an in-bound boolean —
    the sketch bytes and the raw estimate are engine-specific, but
    the rollup keys, day counts, exact cardinalities and the error
    CONTRACT (|est−exact|/exact ≤ 5%) are deterministic, so since
    round 11 this query is fully oracle-backed instead of rows-only
    (the oracle asserts the contract must hold: TRUE).

    The exact_weekly audit column costs one extra distinct
    aggregate — the price of a verifiable readout at test scale; a
    100 TB deployment drops the audit column and keeps the
    sketch-union rollup, which is the pattern sketches exist for:
    a kilobyte sketch per (day, dimension) partition answers any
    coarser rollup by cell-wise union instead of re-scanning.
    Built-ins: hll_sketch_agg / hll_union_agg / hll_sketch_estimate.
    """
    ev = Catalog(spark, sf_dir).events.select(
        F.to_date("ts").alias("day"), "user_id"
    )
    daily = ev.groupBy("day").agg(
        F.expr("hll_sketch_agg(user_id)").alias("sketch"),
    )
    weekly = (
        daily.withColumn("week", F.date_trunc("week", "day").cast("date"))
        .groupBy("week")
        .agg(
            F.expr("hll_sketch_estimate(hll_union_agg(sketch))").alias("_est"),
            F.count(F.lit(1)).alias("n_days"),
        )
    )
    exact = (
        ev.select(F.date_trunc("week", "day").cast("date").alias("week"), "user_id")
        .groupBy("week")
        .agg(F.countDistinct("user_id").alias("exact_weekly"))
    )
    return (
        weekly.join(exact, "week")
        .select(
            "week",
            "n_days",
            "exact_weekly",
            (
                F.abs(F.col("_est") - F.col("exact_weekly"))
                / F.col("exact_weekly")
                <= HLL_REL_BOUND
            ).alias("est_in_bound"),
        )
        .orderBy("week")
    )


# NOTE: the oracle hardcodes TRUE for est_in_bound (DuckDB can't
# replay Spark's HLL++ registers), so a sketch-contract violation on
# the Spark side surfaces as an oracle VALUE mismatch on this column
# rather than a descriptive failure; the pytest bound assertions
# (tests/test_sketches.py) are the diagnostic layer that names the
# offending week. Same pattern as Q_APPROX_QUANTILES_SQL in
# mlstats.py. (ADVICE r11 — accepted by design, documented here.)
Q_HLL_DAILY_WEEKLY_SQL = """
WITH ev AS (
  SELECT CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS week,
         CAST(ts AS DATE) AS day, user_id
  FROM events
)
SELECT week,
       count(DISTINCT day) AS n_days,
       count(DISTINCT user_id) AS exact_weekly,
       TRUE AS est_in_bound
FROM ev GROUP BY week ORDER BY week
"""

QUERIES["q_hll_daily_weekly"] = (q_hll_daily_weekly, Q_HLL_DAILY_WEEKLY_SQL)


_BM_WORD = 62  # bits per bitmap word (62 keeps every shift positive
               # in DuckDB's overflow-checked BIGINT left-shift)


def q_bitmap_rollup_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users via mergeable per-day bitmaps — the
    roaring-bitmap pattern a warehouse uses when approx (HLL) isn't
    acceptable but re-scanning history for every rollup isn't either.

    Per (event_type, day): users OR into 62-bit words keyed by
    user_id div 62 (daily state, bounded by key-space/62 words).
    The weekly/total rollup then OR-merges the DAILY STATE — never
    re-touching the raw events — and pops bits. Both aggregation
    levels are ordinary map-side-combinable aggregates; the merge
    is associative/commutative, so it distributes and increments.
    Output proves exactness: bitmap count == direct countDistinct.
    """
    ev = Catalog(spark, sf_dir).events.select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    )
    daily = ev.groupBy(
        "event_type", "day", F.expr(f"user_id div {_BM_WORD}").alias("word")
    ).agg(
        F.bit_or(
            F.expr(f"shiftleft(1L, cast(user_id % {_BM_WORD} as int))")
        ).alias("bm")
    )
    merged = daily.groupBy("event_type", "word").agg(F.bit_or("bm").alias("bm"))
    bitmap_counts = merged.groupBy("event_type").agg(
        F.sum(F.bit_count("bm")).alias("n_users_bitmap")
    )
    direct = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_direct"),
        F.countDistinct("day").alias("n_days"),
    )
    return bitmap_counts.join(direct, "event_type").select(
        "event_type",
        "n_days",
        "n_users_bitmap",
        "n_users_direct",
        (F.col("n_users_bitmap") == F.col("n_users_direct")).alias("exact_match"),
    )


Q_BITMAP_ROLLUP_SQL = f"""
WITH ev AS (
  SELECT event_type, CAST(ts AS DATE) AS day, user_id FROM events
), daily AS (
  SELECT event_type, day, CAST(floor(user_id / {_BM_WORD}) AS BIGINT) AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(user_id % {_BM_WORD} AS INTEGER)) AS bm
  FROM ev GROUP BY 1, 2, 3
), merged AS (
  SELECT event_type, word, bit_or(bm) AS bm FROM daily GROUP BY 1, 2
), bc AS (
  SELECT event_type, CAST(sum(bit_count(bm)) AS BIGINT) AS n_users_bitmap
  FROM merged GROUP BY 1
), direct AS (
  SELECT event_type, count(DISTINCT user_id) AS n_users_direct,
         count(DISTINCT day) AS n_days
  FROM ev GROUP BY 1
)
SELECT event_type, n_days, n_users_bitmap, n_users_direct,
       n_users_bitmap = n_users_direct AS exact_match
FROM bc JOIN direct USING (event_type)
"""

QUERIES["q_bitmap_rollup_distinct"] = (q_bitmap_rollup_distinct, Q_BITMAP_ROLLUP_SQL)


_BLOOM_M = 16384  # filter bits
_BLOOM_K = 3  # hash functions


def q_bloom_membership_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership audit: build a 16384-bit / 3-hash
    filter over the customers that HAVE orders, probe it with the
    customers that don't, and report actual vs expected false-
    positive rate — the sizing check run before shipping a bloom
    filter into a runtime join-pruning or anti-join pre-screen.

    The filter is relational, not driver state: bit positions are
    md5-derived (portable, replayable), the "filter" is the DISTINCT
    position set (≤ m rows — broadcast-able at any data scale), and
    a probe is a false positive iff all k of its positions hit.
    Work is linear in members + probes; nothing is all-pairs.
    """
    c = Catalog(spark, sf_dir)
    custs = c.customer.select("c_custkey")
    orders = c.orders.select(F.col("o_custkey").alias("c_custkey")).distinct()
    members = custs.join(orders, "c_custkey", "left_semi")
    # guaranteed non-members: shifted keys that cannot collide with
    # any real custkey — probes every row, so the FPR estimate has
    # the full population behind it even when all customers order
    probes = custs.select((F.col("c_custkey") + 1_000_000).alias("c_custkey"))

    ks = F.explode(F.array(*[F.lit(j) for j in range(_BLOOM_K)])).alias("j")

    def positions(df):
        h = F.md5(F.concat_ws(":", F.col("c_custkey").cast("string"), F.col("j")))
        return df.select("c_custkey", ks).select(
            "c_custkey",
            (F.conv(F.substring(h, 1, 12), 16, 10).cast("long") % _BLOOM_M).alias(
                "pos"
            ),
        )

    bits = positions(members).select("pos").distinct()
    hits = (
        positions(probes)
        .join(F.broadcast(bits), "pos", "left_semi")
        .groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .filter(F.col("n_hits") == _BLOOM_K)
    )
    n_members = members.agg(F.count(F.lit(1)).alias("v"))
    n_bits = bits.agg(F.count(F.lit(1)).alias("v"))
    n_probes = probes.agg(F.count(F.lit(1)).alias("v"))
    n_fp = hits.agg(F.count(F.lit(1)).alias("v"))
    row = (
        n_members.select(F.col("v").alias("n_members"))
        .crossJoin(n_bits.select(F.col("v").alias("n_bits_set")))
        .crossJoin(n_probes.select(F.col("v").alias("n_probes")))
        .crossJoin(n_fp.select(F.col("v").alias("n_false_pos")))
    )
    fill = F.col("n_bits_set") / F.lit(float(_BLOOM_M))
    return row.select(
        "n_members",
        "n_bits_set",
        "n_probes",
        "n_false_pos",
        _R4(F.col("n_false_pos") / F.col("n_probes"), "fpr_actual"),
        _R4(F.pow(fill, F.lit(float(_BLOOM_K))), "fpr_expected"),
    )


def _bloom_sql() -> str:
    js = ", ".join(str(j) for j in range(_BLOOM_K))
    return f"""
WITH members AS (
  SELECT c_custkey FROM customer
  WHERE c_custkey IN (SELECT o_custkey FROM orders)
), probes AS (
  SELECT c_custkey + 1000000 AS c_custkey FROM customer
), mpos AS (
  SELECT DISTINCT CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':' || j), 1, 12)
              AS BIGINT) % {_BLOOM_M} AS pos
  FROM members, unnest([{js}]) AS t(j)
), ppos AS (
  SELECT c_custkey,
         CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':' || j), 1, 12)
              AS BIGINT) % {_BLOOM_M} AS pos
  FROM probes, unnest([{js}]) AS t(j)
), fp AS (
  SELECT p.c_custkey FROM ppos p JOIN mpos m USING (pos)
  GROUP BY p.c_custkey HAVING count(*) = {_BLOOM_K}
)
SELECT (SELECT count(*) FROM members) AS n_members,
       (SELECT count(*) FROM mpos) AS n_bits_set,
       (SELECT count(*) FROM probes) AS n_probes,
       (SELECT count(*) FROM fp) AS n_false_pos,
       round((SELECT count(*) FROM fp)
             / CAST((SELECT count(*) FROM probes) AS DOUBLE), 4) AS fpr_actual,
       round(pow((SELECT count(*) FROM mpos) / {float(_BLOOM_M)},
                 {float(_BLOOM_K)}), 4) AS fpr_expected
"""


QUERIES["q_bloom_membership_audit"] = (q_bloom_membership_audit, _bloom_sql())


_KMV_K = 64


def q_kmv_distinct_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch, audited against the
    exact count per event type: keep the k smallest md5(user) draws,
    estimate D̂ = (k−1)/max_kept — the mergeable bounded-memory
    cardinality sketch (Bar-Yossef et al. 2002) whose 100 TB shape
    is one TakeOrdered per group, with the estimator error measured
    in the same row (the audit HLL can't give you: KMV draws are
    deterministic md5, so BOTH engines replay the identical sketch).

    Per type: k smallest uniform draws via a partitioned window over
    the DISTINCT user contraction (bounded by users-per-type), one
    aggregate, exact count joined alongside.
    """
    ev = Catalog(spark, sf_dir).events.select("event_type", "user_id").distinct()
    u = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10)
        .cast("double")
        / F.lit(float(16**12))
    )
    drawn = ev.select("event_type", "user_id", u.alias("u"))
    w = Window.partitionBy("event_type").orderBy(F.asc("u"), F.asc("user_id"))
    kept = drawn.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= _KMV_K
    )
    est = kept.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k_kept"),
        F.max("u").alias("kth_min"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    dhat = F.when(
        F.col("k_kept") < _KMV_K, F.col("exact_distinct").cast("double")
    ).otherwise((F.col("k_kept") - 1) / F.col("kth_min"))
    return (
        est.join(exact, "event_type")
        .select(
            "event_type",
            "exact_distinct",
            "k_kept",
            F.round(dhat, 4).alias("kmv_estimate"),
            F.round(dhat / F.col("exact_distinct") - 1.0, 4).alias(
                "relative_error"
            ),
        )
    )


Q_KMV_SQL = f"""
WITH ev AS (
  SELECT DISTINCT event_type, user_id FROM events
), drawn AS (
  SELECT event_type, user_id,
         CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 12)
              AS BIGINT) / CAST(power(16, 12) AS DOUBLE) AS u
  FROM ev
), kept AS (
  SELECT event_type, u,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY u ASC, user_id ASC) AS rk
  FROM drawn
), est AS (
  SELECT event_type, count(*) AS k_kept, max(u) AS kth_min
  FROM kept WHERE rk <= {_KMV_K} GROUP BY 1
), exact AS (
  SELECT event_type, count(DISTINCT user_id) AS exact_distinct FROM ev
  GROUP BY 1
)
SELECT event_type, exact_distinct, k_kept,
       round(CASE WHEN k_kept < {_KMV_K}
                  THEN CAST(exact_distinct AS DOUBLE)
                  ELSE (k_kept - 1) / kth_min END, 4) AS kmv_estimate,
       round(CASE WHEN k_kept < {_KMV_K}
                  THEN CAST(exact_distinct AS DOUBLE)
                  ELSE (k_kept - 1) / kth_min END
             / exact_distinct - 1.0, 4) AS relative_error
FROM est JOIN exact USING (event_type)
"""

QUERIES["q_kmv_distinct_audit"] = (q_kmv_distinct_audit, Q_KMV_SQL)


HIST_BUCKETS = 128


def q_histogram_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable equi-width histogram quantile sketch vs exact — the
    streaming/distributed quantile pattern when GK/t-digest isn't
    available: one pass computes the global [min, max] of
    o_totalprice, a second bins every row into 128 equi-width
    buckets (a bounded-key groupBy — map-side combined, cell-wise
    MERGEABLE across partitions, days, or clusters: the property
    that lets a 100 TB scan keep 128 counters per node and add
    them), and the p50/p90/p99 estimates read the cumulative
    histogram's bucket upper edge. Reported next to the exact
    quantiles with the relative error — the sketch is audited, not
    trusted.

    Deterministic end-to-end (bucket = floor of a closed-form
    expression, estimate = bucket edge), so the DuckDB oracle
    replays the identical histogram and the output is hash-exact.
    """
    orders = Catalog(spark, sf_dir).orders.select(
        F.col("o_totalprice").cast("double").alias("v")
    )
    b = orders.agg(F.min("v").alias("lo"), F.max("v").alias("hi")).collect()[0]
    lo, hi = float(b.lo), float(b.hi)
    width = (hi - lo) / HIST_BUCKETS
    bucket = F.least(
        F.floor((F.col("v") - F.lit(lo)) / F.lit(width)).cast("int"),
        F.lit(HIST_BUCKETS - 1),
    )
    hist = orders.groupBy(bucket.alias("b")).agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    # 128-row cumulative pass: bounded domain (whitelisted shape —
    # the window input is ≤ HIST_BUCKETS rows by construction)
    cum = hist.withColumn("cum", F.sum("c").over(w)).withColumn(
        "n", F.sum("c").over(Window.partitionBy())
    )
    ests = [
        F.min(
            F.when(
                F.col("cum") >= F.ceil(F.col("n") * F.lit(q)),
                F.round(F.lit(lo) + (F.col("b") + 1) * F.lit(width), 4),
            )
        ).alias(f"est_p{int(q * 100)}")
        for q in (0.5, 0.9, 0.99)
    ]
    est = cum.agg(*ests)
    exact = orders.agg(
        *[
            F.round(
                F.expr(f"percentile(v, {q})"), 4
            ).alias(f"exact_p{int(q * 100)}")
            for q in (0.5, 0.9, 0.99)
        ]
    )
    out = est.crossJoin(exact)
    for p in (50, 90, 99):
        out = out.withColumn(
            f"rel_err_p{p}",
            F.round(F.col(f"est_p{p}") / F.col(f"exact_p{p}") - 1.0, 4),
        )
    return out


Q_HIST_QUANTILE_SQL = f"""
WITH v AS (SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders),
bounds AS (SELECT min(v) AS lo, max(v) AS hi FROM v),
hist AS (
  SELECT least(CAST(floor((v - lo) / ((hi - lo) / {HIST_BUCKETS})) AS INTEGER),
               {HIST_BUCKETS - 1}) AS b,
         count(*) AS c
  FROM v, bounds GROUP BY 1
), cum AS (
  SELECT b, c,
         sum(c) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(c) OVER () AS n
  FROM hist
), est AS (
  SELECT
    min(CASE WHEN cum >= ceil(n * 0.5)
             THEN round(lo + (b + 1) * ((hi - lo) / {HIST_BUCKETS}), 4) END) AS est_p50,
    min(CASE WHEN cum >= ceil(n * 0.9)
             THEN round(lo + (b + 1) * ((hi - lo) / {HIST_BUCKETS}), 4) END) AS est_p90,
    min(CASE WHEN cum >= ceil(n * 0.99)
             THEN round(lo + (b + 1) * ((hi - lo) / {HIST_BUCKETS}), 4) END) AS est_p99
  FROM cum, bounds
), exact AS (
  SELECT round(quantile_cont(v, 0.5), 4) AS exact_p50,
         round(quantile_cont(v, 0.9), 4) AS exact_p90,
         round(quantile_cont(v, 0.99), 4) AS exact_p99
  FROM v
)
SELECT est_p50, est_p90, est_p99, exact_p50, exact_p90, exact_p99,
       round(est_p50 / exact_p50 - 1.0, 4) AS rel_err_p50,
       round(est_p90 / exact_p90 - 1.0, 4) AS rel_err_p90,
       round(est_p99 / exact_p99 - 1.0, 4) AS rel_err_p99
FROM est, exact
"""

QUERIES["q_histogram_quantile_sketch"] = (
    q_histogram_quantile_sketch,
    Q_HIST_QUANTILE_SQL,
)


def q_theta_sketch_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set algebra audit: audience union / intersection
    / A-not-B estimates between every event-type pair, from ONE
    bounded KMV sketch per type (Dasgupta et al., the mergeable
    DataSketches shape), each estimate audited against the exact
    count in the same row.

    The 100 TB story: segment-overlap questions ("how many users
    did A but not B?") normally force a distinct self-join per pair
    over the fact table; with theta sketches each segment is scanned
    ONCE into k retained hashes, and every pairwise set operation is
    arithmetic over |types|·k driver-sized state — sketches merge
    associatively across partitions/days, so the same plan serves
    incremental rollup. Draws are deterministic md5 (the
    q_kmv_distinct_audit trick), so the sketch state — and therefore
    every estimate — is replayed bit-identically by the oracle: the
    approximate algorithm is exactly oracle-able, and the exact
    columns price its error honestly.

    Pair set-op semantics (fixed convention, mirrored in SQL): per
    type θ_S = kth smallest draw (1.0 when the segment has < k
    users, i.e. the sketch is exact); per pair θ = min(θ_A, θ_B);
    retained = sketch hashes with u < θ strictly; estimates =
    |retained set-op| / θ. Exact counterparts come from one distinct
    self-join on the user contraction (|types|² pairs, bounded).
    """
    ev = Catalog(spark, sf_dir).events.select("event_type", "user_id").distinct()
    u = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10)
        .cast("double")
        / F.lit(float(16**12))
    )
    drawn = ev.select("event_type", "user_id", u.alias("u"))
    w = Window.partitionBy("event_type").orderBy(F.asc("u"), F.asc("user_id"))
    kept = drawn.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= _KMV_K
    )
    theta = kept.groupBy("event_type").agg(
        F.when(F.count(F.lit(1)) < _KMV_K, F.lit(1.0))
        .otherwise(F.max("u"))
        .alias("theta")
    )
    sk = kept.join(theta, "event_type").select("event_type", "user_id", "u", "theta")

    a = sk.select(
        F.col("event_type").alias("type_a"),
        F.col("user_id").alias("ua_user"),
        F.col("u").alias("ua"),
        F.col("theta").alias("th_a"),
    )
    b = sk.select(
        F.col("event_type").alias("type_b"),
        F.col("user_id").alias("ub_user"),
        F.col("u").alias("ub"),
        F.col("theta").alias("th_b"),
    )
    # |types|² pair frame over the |types|-row theta table: an
    # equi-join on a constant key (BHJ with a residual <, never a
    # cartesian/BNLJ — keeps the PLANS.md join discipline) — the
    # pair domain is bounded by the type vocabulary, not data.
    th = (
        theta.select(
            F.col("event_type").alias("type_a"),
            F.col("theta").alias("th_a"),
            F.lit(1).alias("_k"),
        )
        .join(
            F.broadcast(
                theta.select(
                    F.col("event_type").alias("type_b"),
                    F.col("theta").alias("th_b"),
                    F.lit(1).alias("_k"),
                )
            ),
            "_k",
        )
        .filter(F.col("type_a") < F.col("type_b"))
        .select("type_a", "type_b", F.least("th_a", "th_b").alias("th"))
    )
    ra = th.join(
        a.drop("th_a"), "type_a"
    ).filter(F.col("ua") < F.col("th"))  # retained A hashes below pair theta
    rb = th.join(
        b.drop("th_b"), "type_b"
    ).filter(F.col("ub") < F.col("th"))
    inter = (
        ra.join(
            rb.select("type_a", "type_b", F.col("ub_user").alias("ua_user")),
            ["type_a", "type_b", "ua_user"],
        )
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    na = ra.groupBy("type_a", "type_b").agg(F.count(F.lit(1)).alias("n_a"))
    nb = rb.groupBy("type_a", "type_b").agg(F.count(F.lit(1)).alias("n_b"))

    # exact counterparts from the distinct user contraction
    d = ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("d"))
    ex_inter = (
        ev.select(F.col("event_type").alias("type_a"), "user_id")
        .join(ev.select(F.col("event_type").alias("type_b"), "user_id"), "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("exact_inter"))
    )
    base = (
        th.join(na, ["type_a", "type_b"], "left")
        .join(nb, ["type_a", "type_b"], "left")
        .join(inter, ["type_a", "type_b"], "left")
        .join(ex_inter, ["type_a", "type_b"], "left")
        .join(d.select(F.col("event_type").alias("type_a"), F.col("d").alias("d_a")), "type_a")
        .join(d.select(F.col("event_type").alias("type_b"), F.col("d").alias("d_b")), "type_b")
        .na.fill(0, ["n_a", "n_b", "n_inter", "exact_inter"])
    )
    est = lambda n: F.round(F.col(n) / F.col("th"), 4)  # noqa: E731
    return base.select(
        "type_a",
        "type_b",
        F.round("th", 6).alias("theta"),
        est("n_inter").alias("inter_est"),
        F.col("exact_inter"),
        F.round((F.col("n_a") + F.col("n_b") - F.col("n_inter")) / F.col("th"), 4).alias(
            "union_est"
        ),
        (F.col("d_a") + F.col("d_b") - F.col("exact_inter")).alias("exact_union"),
        est("n_a").alias("a_est"),
        F.round((F.col("n_a") - F.col("n_inter")) / F.col("th"), 4).alias(
            "anotb_est"
        ),
        (F.col("d_a") - F.col("exact_inter")).alias("exact_anotb"),
    )


Q_THETA_SETOPS_SQL = f"""
WITH ev AS (
  SELECT DISTINCT event_type, user_id FROM events
), drawn AS (
  SELECT event_type, user_id,
         CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 12)
              AS BIGINT) / CAST(power(16, 12) AS DOUBLE) AS u
  FROM ev
), kept AS (
  SELECT event_type, user_id, u FROM (
    SELECT event_type, user_id, u,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY u ASC, user_id ASC) AS rk
    FROM drawn
  ) WHERE rk <= {_KMV_K}
), theta AS (
  SELECT event_type,
         CASE WHEN count(*) < {_KMV_K} THEN 1.0 ELSE max(u) END AS theta
  FROM kept GROUP BY 1
), th AS (
  SELECT ta.event_type AS type_a, tb.event_type AS type_b,
         least(ta.theta, tb.theta) AS th
  FROM theta ta CROSS JOIN theta tb
  WHERE ta.event_type < tb.event_type
), ra AS (
  SELECT t.type_a, t.type_b, k.user_id
  FROM th t JOIN kept k ON k.event_type = t.type_a AND k.u < t.th
), rb AS (
  SELECT t.type_a, t.type_b, k.user_id
  FROM th t JOIN kept k ON k.event_type = t.type_b AND k.u < t.th
), counts AS (
  SELECT t.type_a, t.type_b,
         (SELECT count(*) FROM ra WHERE ra.type_a = t.type_a AND ra.type_b = t.type_b) AS n_a,
         (SELECT count(*) FROM rb WHERE rb.type_a = t.type_a AND rb.type_b = t.type_b) AS n_b,
         (SELECT count(*) FROM ra JOIN rb USING (type_a, type_b, user_id)
          WHERE ra.type_a = t.type_a AND ra.type_b = t.type_b) AS n_inter
  FROM th t
), d AS (
  SELECT event_type, count(DISTINCT user_id) AS d FROM ev GROUP BY 1
), ex_inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS exact_inter
  FROM ev a JOIN ev b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT t.type_a, t.type_b, round(t.th, 6) AS theta,
       round(c.n_inter / t.th, 4) AS inter_est,
       coalesce(e.exact_inter, 0) AS exact_inter,
       round((c.n_a + c.n_b - c.n_inter) / t.th, 4) AS union_est,
       da.d + db.d - coalesce(e.exact_inter, 0) AS exact_union,
       round(c.n_a / t.th, 4) AS a_est,
       round((c.n_a - c.n_inter) / t.th, 4) AS anotb_est,
       da.d - coalesce(e.exact_inter, 0) AS exact_anotb
FROM th t
JOIN counts c USING (type_a, type_b)
LEFT JOIN ex_inter e USING (type_a, type_b)
JOIN d da ON da.event_type = t.type_a
JOIN d db ON db.event_type = t.type_b
"""

QUERIES["q_theta_sketch_setops"] = (q_theta_sketch_setops, Q_THETA_SETOPS_SQL)


AMS_K = 16  # independent ±1 estimators (mean of 16: var = 2F2²/16)


def q_ams_f2_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS second-frequency-moment (F₂) sketch audit per event
    type (Alon-Matias-Szegedy 1996): Σc² of the per-user count
    vector — the self-join size / skew proxy a planner wants
    without materializing the counts — estimated by AMS_K
    independent ±1-signed sums, against the exact F₂ from the same
    contracted counts.

    Sketch-first shape: in production the estimator is ONE pass
    over raw events (Σ sign_i(u) per type is distributive and
    mergeable across partitions/days without ever building c_u);
    here both paths run so the audit can report relative error.
    Signs come from the portable md5 scheme (parity of the first
    hex nibble of md5(i:user)), so every S_i is an INTEGER and the
    DuckDB oracle replays the sketch exactly — the only doubles are
    the final ratios.
    """
    counts = (
        Catalog(spark, sf_dir).events.select("event_type", "user_id")
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ks = F.explode(F.sequence(F.lit(0), F.lit(AMS_K - 1))).alias("i")
    signed = counts.select("event_type", "user_id", "c", ks).select(
        "event_type",
        "i",
        (
            F.when(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("i").cast("string"),
                                F.lit(":"),
                                F.col("user_id").cast("string"),
                            )
                        ),
                        1,
                        1,
                    ),
                    16,
                    10,
                ).cast("int")
                % 2
                == 0,
                F.lit(1),
            ).otherwise(F.lit(-1))
            * F.col("c")
        ).alias("sc"),
    )
    est = (
        signed.groupBy("event_type", "i")
        .agg(F.sum("sc").alias("s"))
        .groupBy("event_type")
        .agg(F.avg(F.col("s") * F.col("s")).alias("est_f2"))
    )
    exact = counts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.col("c") * F.col("c")).alias("exact_f2"),
    )
    return (
        exact.join(est, "event_type")
        .select(
            "event_type",
            "n_users",
            "exact_f2",
            _R4(F.col("est_f2"), "est_f2"),
            _R4(
                F.abs(F.col("est_f2") - F.col("exact_f2")) / F.col("exact_f2"),
                "rel_err",
            ),
        )
        .orderBy("event_type")
    )


Q_AMS_F2_SQL = f"""
WITH counts AS (
  SELECT event_type, user_id, count(*) AS c
  FROM events GROUP BY 1, 2
), signed AS (
  SELECT event_type, i,
         CASE WHEN CAST('0x' || substr(md5(CAST(i AS VARCHAR) || ':'
                  || CAST(user_id AS VARCHAR)), 1, 1) AS INTEGER) % 2 = 0
              THEN c ELSE -c END AS sc
  FROM counts CROSS JOIN generate_series(0, {AMS_K - 1}) t(i)
), est AS (
  SELECT event_type, avg(s * s) AS est_f2
  FROM (SELECT event_type, i, sum(sc) AS s FROM signed GROUP BY 1, 2)
  GROUP BY event_type
), exact AS (
  SELECT event_type, count(*) AS n_users, sum(c * c) AS exact_f2
  FROM counts GROUP BY event_type
)
SELECT e.event_type, e.n_users,
       CAST(e.exact_f2 AS BIGINT) AS exact_f2,
       round(s.est_f2, 4) AS est_f2,
       round(abs(s.est_f2 - e.exact_f2) / e.exact_f2, 4) AS rel_err
FROM exact e JOIN est s USING (event_type)
ORDER BY e.event_type
"""

QUERIES["q_ams_f2_sketch"] = (q_ams_f2_sketch, Q_AMS_F2_SQL)
