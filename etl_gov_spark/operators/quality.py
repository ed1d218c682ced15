"""Data-quality / expectation operators (gov-data gate checks).

Spark-first analogue of the reference's quality gates: the
short-circuit pattern (``dags/example_short_circuit_operator.py``,
``example_short_circuit_decorator.py`` — skip downstream when a
predicate fails), SLA/freshness monitoring (``dags/example_sla_dag.py``),
and warehouse SQL checks (``dags/sql/sample.sql``). Here a gate is a
declarative expectation suite compiled into ONE conditional-
aggregation pass per table, so a 100 TB fact table pays a single
scan for its entire checklist — no per-check jobs, no collect loops.
The suite result feeds ``pipeline.short_circuit`` to gate a publish.

Scale notes
- ``run_expectations`` folds N checks into one ``agg`` of
  CASE-WHEN sums → one scan, map-side partial aggregation, a
  single-row shuffle. Uniqueness adds one count-distinct (partial
  HLL-style aggregation JVM-side; exact here because the gate must
  be exact).
- Referential checks are left-anti joins with the PK side
  broadcast when it is a dim table; fact→fact (lineitem→orders)
  shuffles on the join key, the same key the tables would be
  bucketed on at scale.
- Freshness is a grouped max + a broadcast of the single-row
  global max — no window over the fact table.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_gov_spark.io.sources import Catalog

_R4 = lambda c, n: F.round(c, 4).alias(n)  # noqa: E731


# ---------------------------------------------------------------- #
# expectation framework                                            #
# ---------------------------------------------------------------- #


@dataclass(frozen=True)
class Expectation:
    """One named check; ``violation`` marks rows that FAIL it."""

    name: str
    violation: Column


def not_null(col: str) -> Expectation:
    return Expectation(f"not_null:{col}", F.col(col).isNull())


def in_set(col: str, values: tuple) -> Expectation:
    return Expectation(
        f"in_set:{col}", ~F.col(col).isin(*values) | F.col(col).isNull()
    )


def between(col: str, lo, hi) -> Expectation:
    return Expectation(
        f"between:{col}",
        (F.col(col) < F.lit(lo)) | (F.col(col) > F.lit(hi)) | F.col(col).isNull(),
    )


def matches(col: str, regex: str) -> Expectation:
    return Expectation(
        f"matches:{col}", ~F.col(col).rlike(regex) | F.col(col).isNull()
    )


def run_expectations(
    df: DataFrame, exps: list[Expectation], unique_keys: list[str] = ()
) -> DataFrame:
    """Compile an expectation suite into one scan.

    Row-level checks become CASE-WHEN sums in a single ``agg``;
    each ``unique_keys`` column adds a count-distinct in the same
    aggregate. Output: (check, violations, n_rows, passed) — one
    row per expectation, computed with exactly one pass over df.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for e in exps:
        aggs.append(F.sum(e.violation.cast("long")).alias(e.name))
    for k in unique_keys:
        aggs.append(
            (F.count(k) - F.countDistinct(k)).alias(f"unique:{k}")
        )
    row = df.agg(*aggs)
    names = [e.name for e in exps] + [f"unique:{k}" for k in unique_keys]
    pairs = F.array(
        *[
            F.struct(
                F.lit(n).alias("check"), F.col(f"`{n}`").alias("violations")
            )
            for n in names
        ]
    )
    return row.select(F.col("__n").alias("n_rows"), F.inline(pairs)).select(
        "check",
        "violations",
        "n_rows",
        (F.col("violations") == 0).cast("int").alias("passed"),
    )


# ---------------------------------------------------------------- #
# queries()/oracle pairs                                           #
# ---------------------------------------------------------------- #

_STATUSES = ("O", "F", "P")
_PRIORITY_RE = r"^[1-5]-[A-Z ]+$"


def dq_expectation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canned gate suite for ``orders``: one scan, six checks."""
    orders = Catalog(spark, sf_dir).orders
    exps = [
        not_null("o_custkey"),
        in_set("o_orderstatus", _STATUSES),
        between("o_totalprice", 0.0, 1e7),
        between(
            "o_orderdate",
            F.lit("1992-01-01").cast("timestamp"),
            F.lit("2002-01-01").cast("timestamp"),
        ),
        matches("o_orderpriority", _PRIORITY_RE),
    ]
    return run_expectations(orders, exps, unique_keys=["o_orderkey"])


DQ_EXPECTATION_SUITE_SQL = """
WITH agg AS (
  SELECT count(*) AS n_rows,
         sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS v_null,
         sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') OR o_orderstatus IS NULL THEN 1 ELSE 0 END) AS v_set,
         sum(CASE WHEN o_totalprice < 0 OR o_totalprice > 1e7 OR o_totalprice IS NULL THEN 1 ELSE 0 END) AS v_price,
         sum(CASE WHEN o_orderdate < TIMESTAMP '1992-01-01' OR o_orderdate > TIMESTAMP '2002-01-01' OR o_orderdate IS NULL THEN 1 ELSE 0 END) AS v_date,
         sum(CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$') OR o_orderpriority IS NULL THEN 1 ELSE 0 END) AS v_prio,
         count(o_orderkey) - count(DISTINCT o_orderkey) AS v_uniq
  FROM orders
)
SELECT u."check", CAST(u.violations AS BIGINT) AS violations, agg.n_rows,
       CASE WHEN u.violations = 0 THEN 1 ELSE 0 END AS passed
FROM agg, LATERAL (VALUES
    ('not_null:o_custkey', v_null),
    ('in_set:o_orderstatus', v_set),
    ('between:o_totalprice', v_price),
    ('between:o_orderdate', v_date),
    ('matches:o_orderpriority', v_prio),
    ('unique:o_orderkey', v_uniq)) AS u("check", violations)
"""


def dq_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column null profile of ``events`` — one scan, unpivoted."""
    ev = Catalog(spark, sf_dir).events
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    row = ev.agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in cols],
    )
    pairs = F.array(
        *[
            F.struct(F.lit(c).alias("column_name"), F.col(c).alias("n_nulls"))
            for c in cols
        ]
    )
    return row.select(F.col("__n").alias("n_rows"), F.inline(pairs)).select(
        "column_name",
        "n_nulls",
        _R4(F.col("n_nulls") / F.col("n_rows"), "null_rate"),
    )


DQ_NULL_PROFILE_SQL = """
WITH agg AS (
  SELECT count(*) AS n,
         sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS c1,
         sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS c2,
         sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS c3,
         sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS c4,
         sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS c5,
         sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS c6
  FROM events
)
SELECT u.column_name, CAST(u.n_nulls AS BIGINT) AS n_nulls, round(u.n_nulls / CAST(agg.n AS DOUBLE), 4) AS null_rate
FROM agg, LATERAL (VALUES
    ('event_id', c1), ('ts', c2), ('user_id', c3),
    ('event_type', c4), ('value', c5), ('props', c6)) AS u(column_name, n_nulls)
"""


def dq_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit across four tables."""
    c = Catalog(spark, sf_dir)
    parts = []
    for tbl, key in (
        ("orders", "o_orderkey"),
        ("customer", "c_custkey"),
        ("documents", "doc_id"),
        ("events", "event_id"),
    ):
        parts.append(
            getattr(c, tbl).agg(
                F.lit(tbl).alias("table_name"),
                F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct(key).alias("n_keys"),
                (F.count(key) - F.countDistinct(key)).alias("dup_keys"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


DQ_UNIQUENESS_SQL = """
SELECT 'orders' AS table_name, count(*) AS n_rows,
       count(DISTINCT o_orderkey) AS n_keys,
       count(o_orderkey) - count(DISTINCT o_orderkey) AS dup_keys FROM orders
UNION ALL
SELECT 'customer', count(*), count(DISTINCT c_custkey),
       count(c_custkey) - count(DISTINCT c_custkey) FROM customer
UNION ALL
SELECT 'documents', count(*), count(DISTINCT doc_id),
       count(doc_id) - count(DISTINCT doc_id) FROM documents
UNION ALL
SELECT 'events', count(*), count(DISTINCT event_id),
       count(event_id) - count(DISTINCT event_id) FROM events
"""


def dq_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK-orphan audit via left-anti joins (broadcast dim side)."""
    c = Catalog(spark, sf_dir)
    checks = [
        (
            "orders.o_custkey->customer",
            c.orders.join(
                c.customer, F.col("o_custkey") == F.col("c_custkey"), "left_anti"
            ),
        ),
        (
            "lineitem.l_orderkey->orders",
            c.lineitem.join(
                c.orders, F.col("l_orderkey") == F.col("o_orderkey"), "left_anti"
            ),
        ),
        (
            "customer.c_nationkey->nation",
            c.customer.join(
                F.broadcast(c.nation),
                F.col("c_nationkey") == F.col("n_nationkey"),
                "left_anti",
            ),
        ),
        (
            "supplier.s_nationkey->nation",
            c.supplier.join(
                F.broadcast(c.nation),
                F.col("s_nationkey") == F.col("n_nationkey"),
                "left_anti",
            ),
        ),
    ]
    parts = [
        df.agg(
            F.lit(name).alias("relationship"),
            F.count(F.lit(1)).alias("orphans"),
        )
        for name, df in checks
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


DQ_REFERENTIAL_SQL = """
SELECT 'orders.o_custkey->customer' AS relationship,
       (SELECT count(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS orphans
UNION ALL
SELECT 'lineitem.l_orderkey->orders',
       (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
UNION ALL
SELECT 'customer.c_nationkey->nation',
       (SELECT count(*) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
UNION ALL
SELECT 'supplier.s_nationkey->nation',
       (SELECT count(*) FROM supplier s
        WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey))
"""


_EVENT_TYPES = ("click", "view", "signup", "purchase", "error")


def dq_accepted_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain checks: violations + distinct bad values per column."""
    c = Catalog(spark, sf_dir)
    ev = c.events.agg(
        F.lit("events.event_type").alias("check"),
        F.sum((~F.col("event_type").isin(*_EVENT_TYPES)).cast("long")).alias(
            "violations"
        ),
        F.countDistinct(
            F.when(~F.col("event_type").isin(*_EVENT_TYPES), F.col("event_type"))
        ).alias("n_bad_values"),
    )
    st = c.orders.agg(
        F.lit("orders.o_orderstatus").alias("check"),
        F.sum((~F.col("o_orderstatus").isin(*_STATUSES)).cast("long")).alias(
            "violations"
        ),
        F.countDistinct(
            F.when(~F.col("o_orderstatus").isin(*_STATUSES), F.col("o_orderstatus"))
        ).alias("n_bad_values"),
    )
    return ev.unionByName(st)


DQ_ACCEPTED_VALUES_SQL = """
SELECT 'events.event_type' AS check,
       CAST(sum(CASE WHEN event_type NOT IN ('click','view','signup','purchase','error') THEN 1 ELSE 0 END) AS BIGINT) AS violations,
       count(DISTINCT CASE WHEN event_type NOT IN ('click','view','signup','purchase','error') THEN event_type END) AS n_bad_values
FROM events
UNION ALL
SELECT 'orders.o_orderstatus',
       CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN o_orderstatus END)
FROM orders
"""


def dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type staleness vs the corpus max timestamp (SLA).

    Grouped max per type (map-side combine), then a broadcast join
    against the single-row global max — the fact table is scanned
    once and never windowed.
    """
    ev = Catalog(spark, sf_dir).events
    per_type = ev.groupBy("event_type").agg(F.max("ts").alias("max_ts"))
    global_max = ev.agg(F.max("ts").alias("global_max_ts"))
    return (
        per_type.crossJoin(F.broadcast(global_max))
        .select(
            "event_type",
            F.col("max_ts").cast("string").alias("max_ts"),
            _R4(
                (
                    F.unix_micros(F.col("global_max_ts"))
                    - F.unix_micros(F.col("max_ts"))
                )
                / 60_000_000.0,
                "lag_minutes",
            ),
        )
        .withColumn(
            "stale", (F.col("lag_minutes") > F.lit(60.0)).cast("int")
        )
    )


DQ_FRESHNESS_SQL = """
WITH g AS (SELECT max(ts) AS gmax FROM events),
     t AS (SELECT event_type, max(ts) AS max_ts FROM events GROUP BY event_type)
SELECT t.event_type,
       CAST(t.max_ts AS VARCHAR) AS max_ts,
       round(epoch_us(g.gmax - t.max_ts) / 60000000.0, 4) AS lag_minutes,
       CASE WHEN epoch_us(g.gmax - t.max_ts) / 60000000.0 > 60.0 THEN 1 ELSE 0 END AS stale
FROM t, g
"""


def dq_value_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric-range audit of ``lineitem`` — one scan, three checks."""
    li = Catalog(spark, sf_dir).lineitem
    checks = [
        ("l_quantity:[1,50]", "l_quantity", 1.0, 50.0),
        ("l_discount:[0,0.1]", "l_discount", 0.0, 0.1),
        ("l_extendedprice:>0", "l_extendedprice", 0.0, float("inf")),
    ]
    aggs = []
    for name, col, lo, hi in checks:
        bad = (F.col(col) < F.lit(lo)) | (F.col(col) > F.lit(hi))
        aggs.extend(
            [
                F.sum(bad.cast("long")).alias(f"v_{name}"),
                F.min(col).alias(f"lo_{name}"),
                F.max(col).alias(f"hi_{name}"),
            ]
        )
    row = li.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("check"),
                F.col(f"`v_{name}`").alias("violations"),
                F.round(F.col(f"`lo_{name}`"), 4).alias("min_observed"),
                F.round(F.col(f"`hi_{name}`"), 4).alias("max_observed"),
            )
            for name, _c, _lo, _hi in checks
        ]
    )
    return row.select(F.inline(pairs))


DQ_VALUE_BOUNDS_SQL = """
WITH agg AS (
  SELECT sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS v1,
         min(l_quantity) AS lo1, max(l_quantity) AS hi1,
         sum(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS v2,
         min(l_discount) AS lo2, max(l_discount) AS hi2,
         sum(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END) AS v3,
         min(l_extendedprice) AS lo3, max(l_extendedprice) AS hi3
  FROM lineitem
)
SELECT u."check", CAST(u.violations AS BIGINT) AS violations,
       round(u.min_observed, 4) AS min_observed,
       round(u.max_observed, 4) AS max_observed
FROM agg, LATERAL (VALUES
    ('l_quantity:[1,50]', v1, lo1, hi1),
    ('l_discount:[0,0.1]', v2, lo2, hi2),
    ('l_extendedprice:>0', v3, lo3, hi3)) AS u("check", violations, min_observed, max_observed)
"""


def dq_cross_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table consistency rules — the referential-PLUS-logic
    audit: line shipdate must not precede its order date, nor trail
    it by more than 120 days. One co-partitioned join on orderkey
    (both sides shard on the same key — bucketing makes it
    shuffle-free), violations counted per order year in the same
    pass."""
    cat = Catalog(spark, sf_dir)
    li = cat.lineitem.select("l_orderkey", "l_shipdate")
    o = cat.orders.select("o_orderkey", "o_orderdate")
    joined = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    early = (F.col("l_shipdate") < F.col("o_orderdate")).cast("int")
    # date-granular on both engines (timestamps truncate to days)
    late = (
        F.to_date("l_shipdate") > F.date_add(F.to_date("o_orderdate"), 120)
    ).cast("int")
    return (
        joined.groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(early).alias("n_ship_before_order"),
            F.sum(late).alias("n_ship_over_120d"),
        )
        .select(
            "order_year",
            "n_lines",
            "n_ship_before_order",
            "n_ship_over_120d",
            _R4(
                (F.col("n_ship_before_order") + F.col("n_ship_over_120d"))
                / F.col("n_lines"),
                "violation_rate",
            ),
        )
    )


DQ_CROSS_FIELD_SQL = """
SELECT CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
       count(*) AS n_lines,
       CAST(sum(CASE WHEN l.l_shipdate < o.o_orderdate THEN 1 ELSE 0 END) AS BIGINT) AS n_ship_before_order,
       CAST(sum(CASE WHEN CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + 120 THEN 1 ELSE 0 END) AS BIGINT) AS n_ship_over_120d,
       round((sum(CASE WHEN l.l_shipdate < o.o_orderdate THEN 1 ELSE 0 END)
              + sum(CASE WHEN CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + 120 THEN 1 ELSE 0 END))
             / CAST(count(*) AS DOUBLE), 4) AS violation_rate
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
"""


_PSI_BINS = 10
_PSI_BIN_W = 50.0  # value ∈ [0, ~500) → 10 fixed bins
_PSI_SPLIT = "2024-01-16"  # reference window | current window


def dq_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift audit: per event type,
    compare the value distribution of the current half-window
    against the reference half (split at the midpoint date).

    PSI = Σ_bins (p_cur − p_ref)·ln(p_cur/p_ref), with +1-count
    Laplace smoothing so empty bins stay finite and both engines
    compute identical algebra. One conditional-aggregation scan
    builds both histograms (no second pass, no join between the
    halves); <0.1 stable, >0.25 action. This is the
    model-monitoring gate a scoring pipeline runs per feed.
    """
    ev = Catalog(spark, sf_dir).events
    is_cur = F.to_date("ts") >= F.lit(_PSI_SPLIT).cast("date")
    binned = ev.select(
        "event_type",
        F.least(
            F.floor(F.col("value") / _PSI_BIN_W).cast("int"), F.lit(_PSI_BINS - 1)
        ).alias("bin"),
        is_cur.cast("int").alias("cur"),
    )
    hist = binned.groupBy("event_type", "bin").agg(
        F.sum(F.col("cur")).alias("n_cur"),
        F.sum(1 - F.col("cur")).alias("n_ref"),
    )
    tot = hist.groupBy("event_type").agg(
        F.sum("n_cur").alias("t_cur"), F.sum("n_ref").alias("t_ref")
    )
    p_cur = (F.col("n_cur") + 1) / (F.col("t_cur") + _PSI_BINS)
    p_ref = (F.col("n_ref") + 1) / (F.col("t_ref") + _PSI_BINS)
    return (
        hist.join(F.broadcast(tot), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("t_ref").alias("n_ref_events"),
            F.first("t_cur").alias("n_cur_events"),
            _R4(F.sum((p_cur - p_ref) * F.log(p_cur / p_ref)), "psi"),
        )
        .withColumn("drifted", (F.col("psi") > F.lit(0.25)).cast("int"))
    )


DQ_DISTRIBUTION_DRIFT_SQL = f"""
WITH binned AS (
  SELECT event_type,
         least(CAST(floor(value / {_PSI_BIN_W}) AS INTEGER), {_PSI_BINS - 1}) AS bin,
         CASE WHEN CAST(ts AS DATE) >= DATE '{_PSI_SPLIT}' THEN 1 ELSE 0 END AS cur
  FROM events
), hist AS (
  SELECT event_type, bin, sum(cur) AS n_cur, sum(1 - cur) AS n_ref
  FROM binned GROUP BY 1, 2
), tot AS (
  SELECT event_type, sum(n_cur) AS t_cur, sum(n_ref) AS t_ref
  FROM hist GROUP BY 1
)
SELECT h.event_type,
       CAST(min(t.t_ref) AS BIGINT) AS n_ref_events,
       CAST(min(t.t_cur) AS BIGINT) AS n_cur_events,
       round(sum(((h.n_cur + 1) / CAST(t.t_cur + {_PSI_BINS} AS DOUBLE)
                  - (h.n_ref + 1) / CAST(t.t_ref + {_PSI_BINS} AS DOUBLE))
                 * ln(((h.n_cur + 1) / CAST(t.t_cur + {_PSI_BINS} AS DOUBLE))
                      / ((h.n_ref + 1) / CAST(t.t_ref + {_PSI_BINS} AS DOUBLE)))), 4) AS psi,
       CASE WHEN round(sum(((h.n_cur + 1) / CAST(t.t_cur + {_PSI_BINS} AS DOUBLE)
                  - (h.n_ref + 1) / CAST(t.t_ref + {_PSI_BINS} AS DOUBLE))
                 * ln(((h.n_cur + 1) / CAST(t.t_cur + {_PSI_BINS} AS DOUBLE))
                      / ((h.n_ref + 1) / CAST(t.t_ref + {_PSI_BINS} AS DOUBLE)))), 4) > 0.25
            THEN 1 ELSE 0 END AS drifted
FROM hist h JOIN tot t USING (event_type)
GROUP BY h.event_type
"""


QUERIES: dict[str, tuple] = {
    "dq_cross_field": (dq_cross_field, DQ_CROSS_FIELD_SQL),
    "dq_distribution_drift": (dq_distribution_drift, DQ_DISTRIBUTION_DRIFT_SQL),
    "dq_expectation_suite": (dq_expectation_suite, DQ_EXPECTATION_SUITE_SQL),
    "dq_null_profile": (dq_null_profile, DQ_NULL_PROFILE_SQL),
    "dq_uniqueness": (dq_uniqueness, DQ_UNIQUENESS_SQL),
    "dq_referential": (dq_referential, DQ_REFERENTIAL_SQL),
    "dq_accepted_values": (dq_accepted_values, DQ_ACCEPTED_VALUES_SQL),
    "dq_freshness": (dq_freshness, DQ_FRESHNESS_SQL),
    "dq_value_bounds": (dq_value_bounds, DQ_VALUE_BOUNDS_SQL),
}


_MANIFEST_TABLES = ("region", "nation", "customer", "orders")

# column-type normalization so the checksum string is engine-stable:
# doubles render differently across engines → DECIMAL(18,4); keep
# timestamps at date granularity for the manifest
_MANIFEST_COLS = {
    "region": (("r_regionkey", "k"), ("r_name", "s")),
    "nation": (("n_nationkey", "k"), ("n_name", "s"), ("n_regionkey", "k")),
    "customer": (
        ("c_custkey", "k"), ("c_name", "s"), ("c_nationkey", "k"),
        ("c_mktsegment", "s"), ("c_acctbal", "d"),
    ),
    "orders": (
        ("o_orderkey", "k"), ("o_custkey", "k"), ("o_orderstatus", "s"),
        ("o_totalprice", "d"), ("o_orderdate", "t"), ("o_orderpriority", "s"),
    ),
}


def _norm_col(name: str, kind: str) -> Column:
    c = F.col(name)
    if kind == "d":
        return c.cast("decimal(18,4)").cast("string")
    if kind == "t":
        return c.cast("date").cast("string")
    return c.cast("string")


def dq_checksum_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table integrity manifest: row count + an order-
    independent content checksum per table (sum of the first 48 md5
    bits of every row's normalized column concatenation). Two copies
    of a dataset match iff their manifests match — the cheap
    contract check before/after replication, compaction, or engine
    moves. One scan per table; checksums are commutative sums, so
    they shard and merge freely. Columns are normalized (decimals,
    date-granular timestamps) so the fingerprint is engine-stable.
    The per-row 48-bit values are summed as DECIMAL(38,0) on both
    engines: a bigint sum would overflow at ~2^15 rows (Spark wraps
    or ANSI-errors, DuckDB silently promotes to HUGEINT — divergent
    exactly at the scale the manifest targets).
    """
    rows = []
    for t, cols in _MANIFEST_COLS.items():
        df = Catalog(spark, sf_dir).table(t)
        key = F.concat_ws("|", *[_norm_col(n, k) for n, k in cols])
        chk = F.conv(F.substring(F.md5(key), 1, 12), 16, 10).cast("decimal(38,0)")
        rows.append(
            df.agg(
                F.lit(t).alias("table_name"),
                F.count(F.lit(1)).alias("n_rows"),
                # Final cast to string: decimal(38,0) renders
                # differently across engines' client layers, and the
                # external comparison hashes rendered cells — a digit
                # string is representation-stable.
                F.sum(chk).cast("decimal(38,0)").cast("string").alias("content_checksum"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


def _manifest_sql() -> str:
    sql_norm = {
        "d": "CAST(CAST({c} AS DECIMAL(18,4)) AS VARCHAR)",
        "t": "CAST(CAST({c} AS DATE) AS VARCHAR)",
        "k": "CAST({c} AS VARCHAR)",
        "s": "CAST({c} AS VARCHAR)",
    }
    parts = []
    for t, cols in _MANIFEST_COLS.items():
        concat = " || '|' || ".join(sql_norm[k].format(c=n) for n, k in cols)
        parts.append(
            f"SELECT '{t}' AS table_name, count(*) AS n_rows, "
            f"CAST(CAST(sum(CAST(CAST('0x' || substr(md5({concat}), 1, 12) AS BIGINT) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS VARCHAR) AS content_checksum "
            f"FROM {t}"
        )
    return "\nUNION ALL\n".join(parts)


DQ_CHECKSUM_MANIFEST_SQL = _manifest_sql()

QUERIES["dq_checksum_manifest"] = (dq_checksum_manifest, DQ_CHECKSUM_MANIFEST_SQL)


def dq_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift statistic per event
    type: D = sup|F_ref − F_cur| between the reference half-window
    and the current one (split at the PSI midpoint). The
    nonparametric complement to dq_distribution_drift's PSI — no
    binning choice, sensitive to any distributional change, and the
    classic n·m/(n+m) normalization makes thresholds portable.

    One shuffle-sort per event type: tag each value with its side,
    run the two empirical CDFs as running sums over one (type,
    value) ordering, take the max gap. Never a join between the
    halves."""
    ev = Catalog(spark, sf_dir).events
    is_cur = (F.to_date("ts") >= F.lit(_PSI_SPLIT).cast("date")).cast("int")
    # counts per DISTINCT value first: the running window then sees
    # each v once, so the CDF is never evaluated mid-tie (where
    # engine-specific tie order would make the sup ambiguous)
    tagged = ev.select(
        "event_type", F.round("value", 6).alias("v"), is_cur.alias("cur")
    ).groupBy("event_type", "v").agg(
        F.sum("cur").alias("c_cur"), F.sum(1 - F.col("cur")).alias("c_ref")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy("event_type")
    cdf = tagged.select(
        "event_type",
        "v",
        (F.sum("c_cur").over(w) / F.sum("c_cur").over(tot)).alias("f_cur"),
        (F.sum("c_ref").over(w) / F.sum("c_ref").over(tot)).alias("f_ref"),
        F.sum("c_cur").over(tot).alias("n_cur"),
        F.sum("c_ref").over(tot).alias("n_ref"),
    )
    return cdf.groupBy("event_type").agg(
        F.max("n_ref").alias("n_ref"),
        F.max("n_cur").alias("n_cur"),
        F.round(F.max(F.abs(F.col("f_cur") - F.col("f_ref"))), 4).alias("ks_d"),
    )


DQ_KS_TWO_SAMPLE_SQL = f"""
WITH tagged AS (
  SELECT event_type, round(value, 6) AS v,
         CASE WHEN CAST(ts AS DATE) >= DATE '{_PSI_SPLIT}' THEN 1 ELSE 0 END AS cur
  FROM events
), counts AS (
  SELECT event_type, v, sum(cur) AS c_cur, sum(1 - cur) AS c_ref
  FROM tagged GROUP BY 1, 2
), cdf AS (
  SELECT event_type,
         sum(c_cur) OVER (PARTITION BY event_type ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           / CAST(sum(c_cur) OVER (PARTITION BY event_type) AS DOUBLE) AS f_cur,
         sum(c_ref) OVER (PARTITION BY event_type ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           / CAST(sum(c_ref) OVER (PARTITION BY event_type) AS DOUBLE) AS f_ref,
         sum(c_cur) OVER (PARTITION BY event_type) AS n_cur,
         sum(c_ref) OVER (PARTITION BY event_type) AS n_ref
  FROM counts
)
SELECT event_type,
       CAST(max(n_ref) AS BIGINT) AS n_ref,
       CAST(max(n_cur) AS BIGINT) AS n_cur,
       round(max(abs(f_cur - f_ref)), 4) AS ks_d
FROM cdf GROUP BY event_type
"""

QUERIES["dq_ks_two_sample"] = (dq_ks_two_sample, DQ_KS_TWO_SAMPLE_SQL)


def dq_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier screen per event type via the modified
    z-score: 0.6745·(x − median)/MAD with the Iglewicz–Hoaglin 3.5
    cutoff. The 3σ screens elsewhere (q_value_outliers,
    q_impute_clamp) break down when the contamination itself
    inflates σ; median/MAD are 50%-breakdown robust, which is why
    this is the screen for feeds suspected of being already dirty.

    Two bounded-key aggregate passes (median, then MAD of the
    residuals) joined back — never a window over the fact rows."""
    ev = Catalog(spark, sf_dir).events.select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    resid = ev.join(F.broadcast(med), "event_type")
    mad = resid.groupBy("event_type").agg(
        F.expr("percentile(abs(value - med), 0.5)").alias("mad")
    )
    scored = resid.join(F.broadcast(mad), "event_type").select(
        "event_type",
        "med",
        "mad",
        (0.6745 * (F.col("value") - F.col("med")) / F.col("mad")).alias("rz"),
    )
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        _R4(F.max("med"), "median"),
        _R4(F.max("mad"), "mad"),
        F.sum((F.abs(F.col("rz")) > 3.5).cast("long")).alias("n_outliers"),
    )


DQ_MAD_OUTLIERS_SQL = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
), mad AS (
  SELECT e.event_type, quantile_cont(abs(e.value - m.med), 0.5) AS mad
  FROM events e JOIN med m USING (event_type) GROUP BY e.event_type
)
SELECT e.event_type, count(*) AS n,
       round(max(m.med), 4) AS median,
       round(max(d.mad), 4) AS mad,
       CAST(sum(CASE WHEN abs(0.6745 * (e.value - m.med) / d.mad) > 3.5
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM events e JOIN med m USING (event_type) JOIN mad d USING (event_type)
GROUP BY e.event_type
"""

QUERIES["dq_mad_outliers"] = (dq_mad_outliers, DQ_MAD_OUTLIERS_SQL)


def dq_weekday_adjusted_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday-adjusted volume anomaly screen: compare each day's
    event count to the mean/σ of its OWN weekday (Mondays vs
    Mondays), flagging |z| > 3 — the seasonality-aware sibling of
    the Shewhart chart, which a weekly-cyclic feed false-alarms
    every weekend.

    Integer daily counts → weekday profile is exact cross-engine;
    two bounded aggregates (≤ 7×|days| rows) and a broadcast
    join-back. Output is the per-weekday census with the flagged
    days.
    """
    ev = Catalog(spark, sf_dir).events.select(
        F.to_date("ts").alias("day")
    )
    daily = ev.groupBy("day").agg(F.count(F.lit(1)).alias("c"))
    # dayofweek: 1=Sunday..7=Saturday in Spark; normalize to ISO-ish
    # label-free integer (0=Sunday..6) shared with the oracle
    wd = daily.withColumn("weekday", F.dayofweek("day") - 1)
    prof = wd.groupBy("weekday").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.avg("c").alias("mu"),
        F.stddev_pop("c").alias("sigma"),
    )
    z = (F.col("c") - F.col("mu")) / F.col("sigma")
    flagged = (
        wd.join(F.broadcast(prof), "weekday")
        .filter(F.col("sigma") > 0)
        .withColumn("is_anom", (F.abs(z) > 3).cast("long"))
    )
    return flagged.groupBy("weekday").agg(
        F.max("n_days").alias("n_days"),
        _R4(F.max("mu"), "mean_volume"),
        _R4(F.max("sigma"), "sigma"),
        F.sum("is_anom").alias("n_anomalous_days"),
    )


DQ_WEEKDAY_ADJUSTED_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, count(*) AS c FROM events GROUP BY 1
), wd AS (
  SELECT day, c, dayofweek(day) AS weekday FROM daily
), prof AS (
  SELECT weekday, count(*) AS n_days, avg(c) AS mu, stddev_pop(c) AS sigma
  FROM wd GROUP BY weekday
)
SELECT w.weekday, max(p.n_days) AS n_days,
       round(max(p.mu), 4) AS mean_volume,
       round(max(p.sigma), 4) AS sigma,
       CAST(sum(CASE WHEN abs((w.c - p.mu) / p.sigma) > 3 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_anomalous_days
FROM wd w JOIN prof p USING (weekday)
WHERE p.sigma > 0
GROUP BY w.weekday
"""

QUERIES["dq_weekday_adjusted_volume"] = (
    dq_weekday_adjusted_volume,
    DQ_WEEKDAY_ADJUSTED_SQL,
)


_CARD_COLUMNS = ("user_id", "event_type", "props")


def dq_cardinality_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cardinality-drift audit: exact distinct counts of key columns
    in the reference vs current half-windows, with the ratio — the
    screen that catches an upstream id-space change (new hashing,
    truncation, test-traffic flood) that value-distribution drift
    metrics miss entirely.

    One pass per column over (column-value, half) pairs — grouped
    exact distincts, no sketch needed at audit cadence; at 100 TB
    the same query swaps count_distinct for approx_count_distinct
    without changing shape.
    """
    ev = Catalog(spark, sf_dir).events
    is_cur = (F.to_date("ts") >= F.lit(_PSI_SPLIT)).cast("long")
    outs = []
    for col in _CARD_COLUMNS:
        outs.append(
            ev.select(F.col(col).cast("string").alias("v"), is_cur.alias("cur"))
            .groupBy()
            .agg(
                F.lit(col).alias("column"),
                F.count_distinct(F.when(F.col("cur") == 0, F.col("v"))).alias(
                    "n_ref"
                ),
                F.count_distinct(F.when(F.col("cur") == 1, F.col("v"))).alias(
                    "n_cur"
                ),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out.select(
        "column",
        "n_ref",
        "n_cur",
        _R4(F.col("n_cur") / F.col("n_ref"), "ratio"),
    )


def _cardinality_sql() -> str:
    parts = []
    for col in _CARD_COLUMNS:
        parts.append(f"""
SELECT '{col}' AS "column",
       count(DISTINCT CASE WHEN CAST(ts AS DATE) < DATE '{_PSI_SPLIT}'
                           THEN CAST({col} AS VARCHAR) END) AS n_ref,
       count(DISTINCT CASE WHEN CAST(ts AS DATE) >= DATE '{_PSI_SPLIT}'
                           THEN CAST({col} AS VARCHAR) END) AS n_cur
FROM events""")
    u = "\nUNION ALL\n".join(parts)
    return f"""
WITH halves AS ({u})
SELECT "column", n_ref, n_cur,
       round(n_cur / CAST(n_ref AS DOUBLE), 4) AS ratio
FROM halves
"""


QUERIES["dq_cardinality_drift"] = (dq_cardinality_drift, _cardinality_sql())


def dq_sequence_rule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-constraint validation: a purchase with NO prior
    engagement event (view/click/signup) in the same 30-minute
    session is flagged as an orphan — the state-machine DQ rule
    (bot traffic, replayed webhooks, and dropped upstream events
    all present as impossible orderings).

    Session ids come from the standard two-window sessionizer;
    "any prior engagement" is a running conditional max over the
    SAME (user, ts) sort — no joins, no second shuffle. Output is
    the per-day orphan census.
    """
    from etl_gov_spark.operators.timeseries import SESSION_GAP_US

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
    ws = (
        Window.partitionBy("user_id", "sid")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    engaged = F.max(
        F.col("event_type").isin("view", "click", "signup").cast("long")
    ).over(ws)
    flagged = sess.select(
        F.to_date("ts").alias("day"),
        "event_type",
        F.coalesce(engaged, F.lit(0)).alias("had_prior"),
    ).filter(F.col("event_type") == "purchase")
    return flagged.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(1 - F.col("had_prior")).alias("n_orphans"),
        _R4(F.avg(1 - F.col("had_prior")), "orphan_rate"),
    )


DQ_SEQUENCE_RULE_SQL = f"""
WITH ev AS (
  SELECT user_id, ts, event_id, event_type, epoch_us(ts) AS us
  FROM events
), flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(us) OVER w IS NULL
                OR us - lag(us) OVER w > {{gap}} THEN 1 ELSE 0 END AS new_s
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts, event_id, event_type,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sid
  FROM flagged
), scored AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
         coalesce(max(CASE WHEN event_type IN ('view', 'click', 'signup')
                           THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id, sid ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS had_prior
  FROM sess
)
SELECT day, count(*) AS n_purchases,
       CAST(sum(1 - had_prior) AS BIGINT) AS n_orphans,
       round(avg(1 - had_prior), 4) AS orphan_rate
FROM scored
WHERE event_type = 'purchase'
GROUP BY day
"""


def _dq_sequence_sql() -> str:
    from etl_gov_spark.operators.timeseries import SESSION_GAP_US

    return DQ_SEQUENCE_RULE_SQL.format(gap=SESSION_GAP_US)


QUERIES["dq_sequence_rule"] = (dq_sequence_rule, _dq_sequence_sql())


_ENTROPY_COLUMNS = (
    ("orders", "o_orderpriority"),
    ("orders", "o_orderstatus"),
    ("lineitem", "l_returnflag"),
    ("lineitem", "l_linestatus"),
    ("customer", "c_mktsegment"),
    ("events", "event_type"),
)


def dq_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical-column entropy profile: Shannon entropy (bits),
    cardinality, and normalized entropy (vs log₂ k) for the key
    enum columns across tables — the column-profiling readout that
    flags both degenerate columns (entropy ≈ 0: a constant wearing
    a column name) and suspicious uniformity (≈ 1: synthetic or
    hashed data).

    One scan per TABLE (each table's audited columns stack into
    (column, value) pairs via a single explode), one (column, value)
    counts aggregate, one per-column profile aggregate — 2 exchanges
    total instead of an aggregate per column. Entropy folds in one
    pass via the identity −Σ(n/t)·log₂(n/t) = log₂t − Σ n·log₂n / t
    (mirrored in the oracle so both engines round identically).
    """
    c = Catalog(spark, sf_dir)
    by_table: dict[str, list[str]] = {}
    for table, col in _ENTROPY_COLUMNS:
        by_table.setdefault(table, []).append(col)
    stacks = []
    for table, cols in by_table.items():
        df = getattr(c, table)
        pairs = [
            F.struct(
                F.lit(f"{table}.{col}").alias("column"),
                F.col(col).cast("string").alias("v"),
            )
            for col in cols
            if col in df.columns
        ]
        if pairs:
            stacks.append(
                df.select(F.explode(F.array(*pairs)).alias("s")).select(
                    "s.column", "s.v"
                )
            )
    stacked = stacks[0]
    for s in stacks[1:]:
        stacked = stacked.union(s)
    counts = stacked.groupBy("column", "v").agg(F.count(F.lit(1)).alias("n"))
    t = F.sum("n")
    ent = F.log2(t.cast("double")) - F.sum(
        F.col("n") * F.log2(F.col("n").cast("double"))
    ) / t
    return counts.groupBy("column").agg(
        F.count(F.lit(1)).alias("cardinality"),
        t.alias("n_rows"),
        _R4(ent, "entropy_bits"),
        _R4(ent / F.log2(F.count(F.lit(1)).cast("double")), "entropy_norm"),
    )


def _entropy_sql() -> str:
    by_table: dict[str, list[str]] = {}
    for table, col in _ENTROPY_COLUMNS:
        by_table.setdefault(table, []).append(col)
    stacked = "\nUNION ALL\n".join(
        f"SELECT '{table}.{col}' AS col, CAST({col} AS VARCHAR) AS v FROM {table}"
        for table, cols in by_table.items()
        for col in cols
    )
    ent = (
        "log2(CAST(sum(n) AS DOUBLE))"
        " - sum(n * log2(CAST(n AS DOUBLE))) / CAST(sum(n) AS DOUBLE)"
    )
    return f"""
WITH stacked AS (
{stacked}
), counts AS (
  SELECT col, v, count(*) AS n FROM stacked GROUP BY 1, 2
)
SELECT col AS "column", count(*) AS cardinality,
       CAST(sum(n) AS BIGINT) AS n_rows,
       round({ent}, 4) AS entropy_bits,
       round(({ent}) / log2(CAST(count(*) AS DOUBLE)), 4) AS entropy_norm
FROM counts GROUP BY col
"""


QUERIES["dq_entropy_profile"] = (dq_entropy_profile, _entropy_sql())


def dq_category_mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical mix drift: PSI of the event-type MIX between the
    reference and current half-windows — the categorical partner of
    the numeric-value PSI in ``dq_distribution_drift`` (a feed can
    keep its value distribution while its type mix silently shifts,
    and vice versa).

    One conditional aggregate to the |types|×2 grid; PSI terms are
    row algebra with the standard 1e-6 zero-guard on shares.
    """
    ev = Catalog(spark, sf_dir).events
    is_cur = (F.to_date("ts") >= F.lit(_PSI_SPLIT)).cast("long")
    cell = ev.select("event_type", is_cur.alias("cur")).groupBy(
        "event_type"
    ).agg(
        F.sum("cur").alias("n_cur"),
        F.sum(1 - F.col("cur")).alias("n_ref"),
    )
    tot = cell.agg(
        F.sum("n_cur").alias("tc"), F.sum("n_ref").alias("tr")
    )
    j = cell.crossJoin(F.broadcast(tot))
    p = F.greatest(F.col("n_ref") / F.col("tr"), F.lit(1e-6))
    q = F.greatest(F.col("n_cur") / F.col("tc"), F.lit(1e-6))
    return j.select(
        "event_type",
        "n_ref",
        "n_cur",
        _R4(p, "share_ref"),
        _R4(q, "share_cur"),
        _R4((q - p) * F.log(q / p), "psi_term"),
    )


DQ_CATEGORY_MIX_SQL = f"""
WITH cell AS (
  SELECT event_type,
         sum(CASE WHEN CAST(ts AS DATE) >= DATE '{_PSI_SPLIT}'
                  THEN 1 ELSE 0 END) AS n_cur,
         sum(CASE WHEN CAST(ts AS DATE) < DATE '{_PSI_SPLIT}'
                  THEN 1 ELSE 0 END) AS n_ref
  FROM events GROUP BY event_type
), tot AS (
  SELECT sum(n_cur) AS tc, sum(n_ref) AS tr FROM cell
)
SELECT event_type,
       CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
       round(greatest(n_ref / CAST(tr AS DOUBLE), 1e-6), 4) AS share_ref,
       round(greatest(n_cur / CAST(tc AS DOUBLE), 1e-6), 4) AS share_cur,
       round((greatest(n_cur / CAST(tc AS DOUBLE), 1e-6)
              - greatest(n_ref / CAST(tr AS DOUBLE), 1e-6))
             * ln(greatest(n_cur / CAST(tc AS DOUBLE), 1e-6)
                  / greatest(n_ref / CAST(tr AS DOUBLE), 1e-6)), 4) AS psi_term
FROM cell CROSS JOIN tot
"""

QUERIES["dq_category_mix_drift"] = (dq_category_mix_drift, DQ_CATEGORY_MIX_SQL)


_SLO_TARGET = 0.75  # error-share SLO: at most 25% errors (synthetic mix)
_BURN_FAST, _BURN_SLOW = 2.0, 1.2


def dq_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-budget burn-rate alerts, SRE style: per hour, the
    error share over the budget (1 − SLO) is the burn rate; hours
    burning >2× feed the fast-page alert, >1.2× the slow-ticket
    alert — multiwindow burn alerting evaluated in batch, the
    policy every on-call rotation runs on its SLOs.

    Hourly conditional aggregate → row algebra; census per day so
    the output stays bounded.
    """
    ev = Catalog(spark, sf_dir).events.select(
        F.date_trunc("hour", "ts").alias("hour"),
        (F.col("event_type") == "error").cast("long").alias("is_err"),
    )
    hourly = ev.groupBy("hour").agg(
        F.count(F.lit(1)).alias("n"), F.avg("is_err").alias("err_rate")
    )
    burn = F.col("err_rate") / (1 - _SLO_TARGET)
    return (
        hourly.select(
            F.to_date("hour").alias("day"),
            burn.alias("burn"),
        )
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.sum((F.col("burn") > _BURN_FAST).cast("long")).alias(
                "n_fast_page"
            ),
            F.sum(
                (
                    (F.col("burn") > _BURN_SLOW)
                    & (F.col("burn") <= _BURN_FAST)
                ).cast("long")
            ).alias("n_slow_ticket"),
            _R4(F.max("burn"), "max_burn"),
        )
    )


DQ_SLO_BURN_SQL = f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour,
         avg(CASE WHEN event_type = 'error' THEN 1.0 ELSE 0.0 END)
           / (1 - {_SLO_TARGET}) AS burn
  FROM events GROUP BY 1
)
SELECT CAST(hour AS DATE) AS day, count(*) AS n_hours,
       CAST(sum(CASE WHEN burn > {_BURN_FAST} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_fast_page,
       CAST(sum(CASE WHEN burn > {_BURN_SLOW} AND burn <= {_BURN_FAST}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_slow_ticket,
       round(max(burn), 4) AS max_burn
FROM hourly GROUP BY 1
"""

QUERIES["dq_slo_burn_rate"] = (dq_slo_burn_rate, DQ_SLO_BURN_SQL)


def dq_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier audit per event type: exact interpolated
    Q1/Q3 (Spark ``percentile`` ≡ DuckDB ``quantile_cont``), 1.5×IQR
    fences, per-type outlier census — the boxplot rule as a data
    test, next to the MAD screen (``dq_mad_outliers``) which it
    cross-checks: MAD survives >25% contamination, IQR is what every
    BI tool draws.

    Two passes over the bounded type key: one exact-quantile
    aggregate, one broadcast-fence count. At 100 TB swap the exact
    quantile for approx_percentile — same plan shape.
    """
    ev = Catalog(spark, sf_dir).events.select("event_type", "value")
    fences = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.25)).alias("q1"),
        F.percentile("value", F.lit(0.75)).alias("q3"),
    )
    j = ev.join(F.broadcast(fences), "event_type")
    iqr = F.col("q3") - F.col("q1")
    lo, hi = F.col("q1") - 1.5 * iqr, F.col("q3") + 1.5 * iqr
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        _R4(F.max("q1"), "q1"),
        _R4(F.max("q3"), "q3"),
        F.sum((F.col("value") < lo).cast("long")).alias("n_below"),
        F.sum((F.col("value") > hi).cast("long")).alias("n_above"),
        _R4(
            F.avg(((F.col("value") < lo) | (F.col("value") > hi)).cast("double")),
            "outlier_share",
        ),
    )


DQ_IQR_SQL = """
WITH fences AS (
  SELECT event_type,
         quantile_cont(value, 0.25) AS q1,
         quantile_cont(value, 0.75) AS q3
  FROM events GROUP BY 1
)
SELECT e.event_type, count(*) AS n,
       round(max(q1), 4) AS q1, round(max(q3), 4) AS q3,
       CAST(sum(CASE WHEN value < q1 - 1.5 * (q3 - q1) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_below,
       CAST(sum(CASE WHEN value > q3 + 1.5 * (q3 - q1) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_above,
       round(avg(CASE WHEN value < q1 - 1.5 * (q3 - q1)
                        OR value > q3 + 1.5 * (q3 - q1)
                      THEN 1.0 ELSE 0.0 END), 4) AS outlier_share
FROM events e JOIN fences f ON e.event_type = f.event_type
GROUP BY e.event_type
"""

QUERIES["dq_iqr_outliers"] = (dq_iqr_outliers, DQ_IQR_SQL)


def dq_regex_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format-conformance audit of the semi-structured ``props``
    payload per event type: does it match the expected
    ``{"k": <int>}`` shape, is it parseable JSON at all, and what is
    the k-value range where conformant — the contract test for a
    feed's free-text column (the #1 silent-corruption surface).

    One scan, row-local regex + JSON extraction (codegen), a bounded
    type rollup.
    """
    ev = Catalog(spark, sf_dir).events.select("event_type", "props")
    conforms = F.col("props").rlike(r'^\{"k": \d+\}$')
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(conforms.cast("long")).alias("n_conformant"),
        _R4(F.avg(conforms.cast("double")), "conformance_rate"),
        F.min(F.when(conforms, k)).alias("k_min"),
        F.max(F.when(conforms, k)).alias("k_max"),
    )


DQ_REGEX_SQL = r"""
SELECT event_type, count(*) AS n,
       CAST(sum(CASE WHEN regexp_matches(props, '^\{"k": \d+\}$')
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_conformant,
       round(avg(CASE WHEN regexp_matches(props, '^\{"k": \d+\}$')
                      THEN 1.0 ELSE 0.0 END), 4) AS conformance_rate,
       min(CASE WHEN regexp_matches(props, '^\{"k": \d+\}$')
                THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END)
         AS k_min,
       max(CASE WHEN regexp_matches(props, '^\{"k": \d+\}$')
                THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END)
         AS k_max
FROM events GROUP BY event_type
"""

QUERIES["dq_regex_conformance"] = (dq_regex_conformance, DQ_REGEX_SQL)


def dq_monotonic_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-sanity audit: do event_ids increase with event time
    within each user's stream? Reports the per-type inversion rate
    (consecutive ts-ordered pairs where the id goes backwards) —
    the cheap detector for clock skew, replayed batches, and
    mis-merged partitions.

    The lag runs inside per-user windows (partitioned — no global
    sort); the rollup is a bounded type aggregate.
    """
    ev = Catalog(spark, sf_dir).events.select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("prev_id", F.lag("event_id").over(w)).filter(
        F.col("prev_id").isNotNull()
    )
    inverted = (F.col("event_id") < F.col("prev_id")).cast("long")
    return seq.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(inverted).alias("n_inversions"),
        _R4(F.avg(inverted.cast("double")), "inversion_rate"),
    )


DQ_MONOTONIC_SQL = """
WITH seq AS (
  SELECT event_type, event_id,
         lag(event_id) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev_id
  FROM events
)
SELECT event_type, count(*) AS n_pairs,
       CAST(sum(CASE WHEN event_id < prev_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_inversions,
       round(avg(CASE WHEN event_id < prev_id THEN 1.0 ELSE 0.0 END), 4)
         AS inversion_rate
FROM seq WHERE prev_id IS NOT NULL
GROUP BY event_type
"""

QUERIES["dq_monotonic_ids"] = (dq_monotonic_ids, DQ_MONOTONIC_SQL)


def dq_benford_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit conformity screen over the money column
    (Nigrini's fraud/fabrication test — fabricated or truncated
    feeds flunk it long before distribution-drift tests fire): the
    observed first-significant-digit distribution of
    ``l_extendedprice`` vs Benford's log10(1 + 1/d), with the
    chi-square statistic and Nigrini's MAD (mean absolute deviation
    of the digit shares, his published conformity bands: < 0.006
    close, < 0.012 acceptable, < 0.015 marginal).

    Determinism: prices go through the cents-exact integer path
    (round(x*100) -> BIGINT -> VARCHAR), so the first digit is a
    string head of an integer both engines format identically — no
    float log10 at a power-of-10 boundary, no format drift. The
    digit histogram is one bounded-key aggregate (9 cells); chi2 and
    MAD fold over those 9 cells.
    """
    li = Catalog(spark, sf_dir).lineitem.select("l_extendedprice")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    digits = (
        li.filter(F.col("l_extendedprice") > 0)
        .select(F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = digits.agg(F.sum("n").alias("total"))
    joined = digits.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n",
        "total",
        (F.col("n").cast("double") / F.col("total")).alias("share"),
        (F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0))).alias("p"),
    )
    stats = joined.agg(
        F.sum(
            F.pow(F.col("n") - F.col("total") * F.col("p"), 2)
            / (F.col("total") * F.col("p"))
        ).alias("chi2"),
        F.avg(F.abs(F.col("share") - F.col("p"))).alias("mad"),
    )
    return (
        joined.crossJoin(F.broadcast(stats))
        .select(
            "digit",
            "n",
            (F.round(F.col("share") * 10000.0) / 10000.0).alias("share"),
            (F.round(F.col("p") * 10000.0) / 10000.0).alias("benford_share"),
            (F.round((F.col("share") - F.col("p")) * 10000.0) / 10000.0).alias(
                "deviation"
            ),
            (F.round(F.col("chi2") * 10000.0) / 10000.0).alias("chi2"),
            (F.round(F.col("mad") * 1000000.0) / 1000000.0).alias("mad"),
        )
        .orderBy("digit")
    )


DQ_BENFORD_SQL = """
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                          AS VARCHAR), 1, 1) AS INTEGER) AS digit,
         count(*) AS n
  FROM lineitem WHERE l_extendedprice > 0
  GROUP BY 1
), tot AS (
  SELECT sum(n) AS total FROM digits
), joined AS (
  SELECT digit, n, total,
         CAST(n AS DOUBLE) / total AS share,
         ln(1.0 + 1.0 / digit) / ln(10.0) AS p
  FROM digits, tot
), stats AS (
  SELECT sum(pow(n - total * p, 2) / (total * p)) AS chi2,
         avg(abs(share - p)) AS mad
  FROM joined
)
SELECT digit,
       n,
       round(share * 10000.0) / 10000.0 AS share,
       round(p * 10000.0) / 10000.0 AS benford_share,
       round((share - p) * 10000.0) / 10000.0 AS deviation,
       round(chi2 * 10000.0) / 10000.0 AS chi2,
       round(mad * 1000000.0) / 1000000.0 AS mad
FROM joined, stats
ORDER BY digit
"""

QUERIES["dq_benford_law"] = (dq_benford_law, DQ_BENFORD_SQL)
