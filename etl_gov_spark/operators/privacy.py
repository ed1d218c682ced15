"""Privacy-preserving publication operators (SURVEY.md §2.J ext).

A government data platform (the reference's domain) publishes
aggregates about people; these are the three standard pre-release
gates. All deterministic-by-construction so the DuckDB oracles are
exact:

- ``q_dp_noisy_counts``: ε-differential-privacy Laplace mechanism
  over per-nation counts, with the noise drawn from the portable
  48-bit md5 uniform (operators/sampling.py's trick) instead of an
  RNG — same inverse-CDF algebra, replayable on any engine/layout.
  (A production release would use a secret seed; the mechanism —
  sensitivity-1 counts + Laplace(1/ε) — is exactly this plan.)
- ``q_k_anonymity_audit``: group sizes over quasi-identifier
  combinations; any group under k is a re-identification risk.
- ``q_anon_generalize``: the generalization ladder — coarsen the
  numeric quasi-identifier band until every group reaches k, and
  report the risk profile at each level (the minimal-generalization
  search every anonymization pipeline runs).

Scale: every operator is one map-side-combined aggregate over the
quasi-identifier key space (bounded: nations × segments × bands) —
nothing pairs rows, nothing sorts globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_gov_spark.io.sources import Catalog

_R4 = lambda c, n: F.round(c, 4).alias(n)  # noqa: E731

DP_EPSILON = 1.0  # Laplace scale b = sensitivity/ε = 1.0
K_ANON = 5
_U_DENOM = float((1 << 48) + 2)  # draw ∈ (0,1) strictly: ln() stays finite


def _draw01(key: F.Column) -> F.Column:
    """Portable uniform in (0,1): first 48 md5 bits, +1, over 2^48+2
    — exact in a double, identical in DuckDB."""
    h = F.substring(F.md5(key), 1, 12)
    return (F.conv(h, 16, 10).cast("double") + F.lit(1.0)) / F.lit(_U_DENOM)


def q_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε=1 Laplace mechanism over per-nation customer counts:
    noise = −b·sgn(u−½)·ln(1−2|u−½|), u from the portable md5 draw
    keyed by 'dp:'+nation. Sensitivity of a count is 1, so b=1/ε.
    Published: the noisy count and the mechanism parameters."""
    c = Catalog(spark, sf_dir)
    counts = (
        c.customer.join(
            F.broadcast(
                c.nation.select(F.col("n_nationkey").alias("c_nationkey"), "n_name")
            ),
            "c_nationkey",
        )
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("true_n"))
    )
    u = _draw01(F.concat(F.lit("dp:"), F.col("n_name")))
    uc = u - F.lit(0.5)
    b = 1.0 / DP_EPSILON
    noise = -F.lit(b) * F.signum(uc) * F.log(1.0 - 2.0 * F.abs(uc))
    return counts.select(
        "n_name",
        _R4(F.col("true_n") + noise, "noisy_count"),
        F.lit(DP_EPSILON).alias("epsilon"),
        F.lit(1).alias("sensitivity"),
    )


Q_DP_NOISY_COUNTS_SQL = f"""
WITH counts AS (
  SELECT n.n_name, count(*) AS true_n
  FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY n.n_name
), noised AS (
  SELECT n_name, true_n,
         (CAST('0x' || substr(md5('dp:' || n_name), 1, 12) AS BIGINT) + 1)
           / {_U_DENOM!r} AS u
  FROM counts
)
SELECT n_name,
       round(true_n + (-{1.0 / DP_EPSILON!r}) * sign(u - 0.5)
             * ln(1.0 - 2.0 * abs(u - 0.5)), 4) AS noisy_count,
       CAST({DP_EPSILON!r} AS DOUBLE) AS epsilon, 1 AS sensitivity
FROM noised
"""


def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity over the quasi-identifier triple
    (nation, market segment, account-balance $1000 band): per
    nation, how many QI groups exist, how many are under k=5, and
    how many customers those risky groups expose."""
    qi = Catalog(spark, sf_dir).customer.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
    )
    groups = qi.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.count(F.lit(1)).alias("n")
    )
    return groups.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum((F.col("n") < K_ANON).cast("long")).alias("risky_groups"),
        F.sum(F.when(F.col("n") < K_ANON, F.col("n")).otherwise(0)).alias(
            "rows_at_risk"
        ),
    )


Q_K_ANONYMITY_SQL = f"""
WITH groups AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
         count(*) AS n
  FROM customer GROUP BY 1, 2, 3
)
SELECT c_nationkey,
       count(*) AS n_groups,
       CAST(sum(CASE WHEN n < {K_ANON} THEN 1 ELSE 0 END) AS BIGINT) AS risky_groups,
       CAST(sum(CASE WHEN n < {K_ANON} THEN n ELSE 0 END) AS BIGINT) AS rows_at_risk
FROM groups GROUP BY c_nationkey
"""

# balance-band widths, finest → coarsest (the generalization ladder)
ANON_LEVELS = (100, 1000, 10000)


def q_anon_generalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The minimal-generalization search: evaluate the k-anonymity
    risk profile at every band width of the ladder in ONE scan
    (the level is just another grouping column — no per-level
    re-scan), so the publisher reads off the first level whose
    risky-group count is zero."""
    cust = Catalog(spark, sf_dir).customer
    level = F.explode(
        F.array(*[F.lit(w) for w in ANON_LEVELS])
    ).alias("band_width")
    qi = cust.select("c_nationkey", "c_mktsegment", "c_acctbal", level)
    groups = qi.groupBy(
        "band_width",
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / F.col("band_width")).cast("long").alias("band"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return groups.groupBy("band_width").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum((F.col("n") < K_ANON).cast("long")).alias("risky_groups"),
        F.sum(F.when(F.col("n") < K_ANON, F.col("n")).otherwise(0)).alias(
            "rows_at_risk"
        ),
        _R4(F.min("n").cast("double"), "min_group_size"),
    )


Q_ANON_GENERALIZE_SQL = f"""
WITH qi AS (
  SELECT c_nationkey, c_mktsegment, c_acctbal, lv.band_width
  FROM customer, (VALUES {", ".join(f"({w})" for w in ANON_LEVELS)}) lv(band_width)
), groups AS (
  SELECT band_width, c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal / band_width) AS BIGINT) AS band,
         count(*) AS n
  FROM qi GROUP BY 1, 2, 3, 4
)
SELECT band_width,
       count(*) AS n_groups,
       CAST(sum(CASE WHEN n < {K_ANON} THEN 1 ELSE 0 END) AS BIGINT) AS risky_groups,
       CAST(sum(CASE WHEN n < {K_ANON} THEN n ELSE 0 END) AS BIGINT) AS rows_at_risk,
       round(CAST(min(n) AS DOUBLE), 4) AS min_group_size
FROM groups GROUP BY band_width
"""


QUERIES: dict[str, tuple] = {
    "q_dp_noisy_counts": (q_dp_noisy_counts, Q_DP_NOISY_COUNTS_SQL),
    "q_k_anonymity_audit": (q_k_anonymity_audit, Q_K_ANONYMITY_SQL),
    "q_anon_generalize": (q_anon_generalize, Q_ANON_GENERALIZE_SQL),
}


L_DIVERSITY = 3


def q_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity over the same quasi-identifier triple as the
    k-anonymity audit, with market segment as the SENSITIVE
    attribute: a QI group whose members share too few distinct
    sensitive values leaks the attribute even when it is k-
    anonymous — the standard follow-on check (k says "hidden in a
    crowd"; l says "the crowd doesn't all share your secret").

    QI groups here are (nation, balance band); per nation we report
    groups, under-l groups, and the rows they expose. Two bounded
    grouped aggregates, same shape as ``q_k_anonymity_audit``.
    """
    qi = Catalog(spark, sf_dir).customer.select(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
        "c_mktsegment",
    )
    groups = qi.groupBy("c_nationkey", "bal_band").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("c_mktsegment").alias("l"),
    )
    return groups.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum((F.col("l") < L_DIVERSITY).cast("long")).alias("low_div_groups"),
        F.sum(F.when(F.col("l") < L_DIVERSITY, F.col("n")).otherwise(0)).alias(
            "rows_exposed"
        ),
        F.min("l").alias("min_l"),
    )


Q_L_DIVERSITY_SQL = f"""
WITH groups AS (
  SELECT c_nationkey, CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
         count(*) AS n, count(DISTINCT c_mktsegment) AS l
  FROM customer GROUP BY 1, 2
)
SELECT c_nationkey,
       count(*) AS n_groups,
       CAST(sum(CASE WHEN l < {L_DIVERSITY} THEN 1 ELSE 0 END) AS BIGINT)
         AS low_div_groups,
       CAST(sum(CASE WHEN l < {L_DIVERSITY} THEN n ELSE 0 END) AS BIGINT)
         AS rows_exposed,
       min(l) AS min_l
FROM groups GROUP BY c_nationkey
"""

QUERIES["q_l_diversity_audit"] = (q_l_diversity_audit, Q_L_DIVERSITY_SQL)


T_CLOSE = 0.3  # total-variation threshold for the closeness audit


def q_t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness over the same QI scheme as the k-anonymity /
    l-diversity audits, completing the disclosure-risk triad (Li et
    al. 2007, ICDE): a QI group can be k-anonymous AND l-diverse yet
    still leak if its sensitive-value DISTRIBUTION differs sharply
    from the table's. Distance = total variation (½·Σ|p_group −
    p_global|, the categorical EMD) between each (nation, balance-
    band) group's market-segment mix and the global mix; per nation
    we report the group census, max/avg distance, and groups over
    t = 0.3.

    Plan: one customer scan → bounded (nation × band × segment)
    counts; global segment shares are a 5-row broadcast; everything
    after is algebra on the bounded grid. Missing (group, segment)
    cells contribute p_global/2 each — handled in one aggregate by
    adding (1 − Σ p_global-present)/2 per group, no grid fill join.
    """
    cust = Catalog(spark, sf_dir).customer.select(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
        "c_mktsegment",
    )
    cell = cust.groupBy("c_nationkey", "bal_band", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n")
    )
    glob = cust.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("gn"))
    glob = glob.crossJoin(
        F.broadcast(glob.agg(F.sum("gn").alias("gt")))
    ).select("c_mktsegment", (F.col("gn") / F.col("gt")).alias("p_glob"))
    wg = Window.partitionBy("c_nationkey", "bal_band")
    scored = (
        cell.join(F.broadcast(glob), "c_mktsegment")
        .withColumn("gsize", F.sum("n").over(wg))
        .withColumn("p_grp", F.col("n") / F.col("gsize"))
    )
    tvd = scored.groupBy("c_nationkey", "bal_band").agg(
        (
            0.5 * F.sum(F.abs(F.col("p_grp") - F.col("p_glob")))
            + 0.5 * (1.0 - F.sum("p_glob"))  # segments absent from the group
        ).alias("tvd")
    )
    return (
        tvd.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.round(F.max("tvd"), 4).alias("max_tvd"),
            F.round(F.avg("tvd"), 4).alias("avg_tvd"),
            F.sum((F.col("tvd") > T_CLOSE).cast("long")).alias("groups_over_t"),
        )
        .orderBy("c_nationkey")
    )


Q_T_CLOSENESS_SQL = f"""
WITH cust AS (
  SELECT c_nationkey, CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
         c_mktsegment
  FROM customer
), cell AS (
  SELECT c_nationkey, bal_band, c_mktsegment, count(*) AS n
  FROM cust GROUP BY 1, 2, 3
), gdist AS (
  SELECT c_mktsegment,
         count(*) / CAST((SELECT count(*) FROM cust) AS DOUBLE) AS p_glob
  FROM cust GROUP BY 1
), scored AS (
  SELECT c.c_nationkey, c.bal_band, c.n, g.p_glob,
         c.n / CAST(sum(c.n) OVER (PARTITION BY c.c_nationkey, c.bal_band)
                    AS DOUBLE) AS p_grp
  FROM cell c JOIN gdist g USING (c_mktsegment)
), tvd AS (
  SELECT c_nationkey, bal_band,
         0.5 * sum(abs(p_grp - p_glob)) + 0.5 * (1.0 - sum(p_glob)) AS tvd
  FROM scored GROUP BY 1, 2
)
SELECT c_nationkey, count(*) AS n_groups,
       round(max(tvd), 4) AS max_tvd,
       round(avg(tvd), 4) AS avg_tvd,
       CAST(sum(CASE WHEN tvd > {T_CLOSE} THEN 1 ELSE 0 END) AS BIGINT)
         AS groups_over_t
FROM tvd GROUP BY c_nationkey
ORDER BY c_nationkey
"""

QUERIES["q_t_closeness_audit"] = (q_t_closeness_audit, Q_T_CLOSENESS_SQL)


# --- round-9 widening: cell suppression + DP mean ------------------

_SUPPRESS_K = 10  # publish threshold: cells under 10 individuals hide


def q_small_cell_suppression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-cell suppression — the statistical-disclosure-control
    gate every census/health table passes before release: counts on
    the (nation, segment, balance-band) grid are PRIMARY-suppressed
    under _SUPPRESS_K, and any (nation, segment) row left with
    exactly ONE suppressed cell gets its smallest surviving cell
    COMPLEMENTARY-suppressed (one pass of the standard rule —
    otherwise the hidden value is recoverable from the row margin).

    Plan: one scan → bounded-grid aggregate (≤ 25×5×12 cells), then
    window algebra PARTITIONED by the (nation, segment) row — the
    row domain is bounded, so no window ever sees more than the
    band count. Readout: per-row census of published/suppressed
    cells and the published margin.
    """
    cust = Catalog(spark, sf_dir).customer.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
    )
    cells = cust.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.count(F.lit(1)).alias("n")
    )
    wr = Window.partitionBy("c_nationkey", "c_mktsegment")
    flagged = cells.withColumn(
        "primary", (F.col("n") < _SUPPRESS_K).cast("int")
    ).withColumn("n_primary", F.sum("primary").over(wr))
    # rank surviving cells small-first (band id breaks count ties);
    # the rank-1 survivor of a one-suppression row hides too
    surv_rank = F.row_number().over(
        wr.orderBy(
            F.when(F.col("primary") == 1, F.lit(None)).otherwise(F.col("n")).asc_nulls_last(),
            "bal_band",
        )
    )
    marked = flagged.withColumn(
        "complementary",
        (
            (F.col("primary") == 0)
            & (F.col("n_primary") == 1)
            & (surv_rank == 1)
        ).cast("int"),
    )
    return marked.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("primary").alias("n_primary"),
        F.sum("complementary").alias("n_complementary"),
        F.sum(
            F.when(
                (F.col("primary") == 0) & (F.col("complementary") == 0),
                F.col("n"),
            ).otherwise(F.lit(0))
        ).alias("published_total"),
    )


Q_SMALL_CELL_SUPPRESSION_SQL = f"""
WITH cust AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band
  FROM customer
), cells AS (
  SELECT c_nationkey, c_mktsegment, bal_band, count(*) AS n
  FROM cust GROUP BY 1, 2, 3
), flagged AS (
  SELECT *,
         CASE WHEN n < {_SUPPRESS_K} THEN 1 ELSE 0 END AS "primary",
         sum(CASE WHEN n < {_SUPPRESS_K} THEN 1 ELSE 0 END)
           OVER (PARTITION BY c_nationkey, c_mktsegment) AS n_primary
  FROM cells
), marked AS (
  SELECT *,
         CASE WHEN "primary" = 0 AND n_primary = 1
                   AND row_number() OVER (
                         PARTITION BY c_nationkey, c_mktsegment
                         ORDER BY CASE WHEN "primary" = 1 THEN NULL ELSE n END
                                  ASC NULLS LAST,
                                  bal_band) = 1
              THEN 1 ELSE 0 END AS complementary
  FROM flagged
)
SELECT c_nationkey, c_mktsegment, count(*) AS n_cells,
       CAST(sum("primary") AS BIGINT) AS n_primary,
       CAST(sum(complementary) AS BIGINT) AS n_complementary,
       CAST(sum(CASE WHEN "primary" = 0 AND complementary = 0 THEN n
                     ELSE 0 END) AS BIGINT) AS published_total
FROM marked GROUP BY 1, 2
"""

QUERIES["q_small_cell_suppression"] = (
    q_small_cell_suppression,
    Q_SMALL_CELL_SUPPRESSION_SQL,
)


_DP_CLAMP_LO, _DP_CLAMP_HI = 0.0, 5000.0  # bounded contribution window


def q_dp_private_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε=1 DP mean of account balance per market segment via the
    standard sum/count decomposition: values clamp to
    [_DP_CLAMP_LO, _DP_CLAMP_HI] (bounded contribution), the budget
    splits ε/2 + ε/2 across the two releases, so Laplace scales are
    b_sum = 2·(hi−lo)/ε and b_cnt = 2/ε; the published mean is
    noisy_sum / max(noisy_n, 1) — post-processing, costs no budget.
    Noise uses the portable md5 inverse-CDF draw (deterministic,
    hence exactly oracle-replayable; a production release keys it
    with a secret seed).

    Plan: one map-side-combined aggregate over 5 segments, then
    row-local algebra — no second scan, no window, no shuffle
    beyond the 5-group reduce.
    """
    b_sum = 2.0 * (_DP_CLAMP_HI - _DP_CLAMP_LO) / DP_EPSILON
    b_cnt = 2.0 / DP_EPSILON
    cust = Catalog(spark, sf_dir).customer.select(
        "c_mktsegment",
        F.least(
            F.greatest(F.col("c_acctbal"), F.lit(_DP_CLAMP_LO)),
            F.lit(_DP_CLAMP_HI),
        ).alias("clamped"),
    )
    agg = cust.groupBy("c_mktsegment").agg(
        F.sum("clamped").alias("true_sum"), F.count(F.lit(1)).alias("true_n")
    )

    def lap(tag: str, b: float) -> F.Column:
        u = _draw01(F.concat(F.lit(tag), F.col("c_mktsegment"))) - F.lit(0.5)
        return -F.lit(b) * F.signum(u) * F.log(1.0 - 2.0 * F.abs(u))

    noisy = agg.select(
        "c_mktsegment",
        (F.col("true_sum") + lap("dpsum:", b_sum)).alias("noisy_sum"),
        (F.col("true_n") + lap("dpcnt:", b_cnt)).alias("noisy_n"),
    )
    return noisy.select(
        "c_mktsegment",
        _R4(F.col("noisy_sum"), "noisy_sum"),
        _R4(F.col("noisy_n"), "noisy_n"),
        _R4(
            F.col("noisy_sum") / F.greatest(F.col("noisy_n"), F.lit(1.0)),
            "dp_mean",
        ),
        F.lit(DP_EPSILON).alias("epsilon"),
        F.lit(_DP_CLAMP_HI - _DP_CLAMP_LO).alias("clamp_width"),
    )


Q_DP_PRIVATE_MEAN_SQL = f"""
WITH agg AS (
  SELECT c_mktsegment,
         sum(least(greatest(c_acctbal, {_DP_CLAMP_LO!r}), {_DP_CLAMP_HI!r})) AS true_sum,
         count(*) AS true_n
  FROM customer GROUP BY 1
), noised AS (
  SELECT c_mktsegment, true_sum, true_n,
         (CAST('0x' || substr(md5('dpsum:' || c_mktsegment), 1, 12) AS BIGINT) + 1)
           / {_U_DENOM!r} - 0.5 AS us,
         (CAST('0x' || substr(md5('dpcnt:' || c_mktsegment), 1, 12) AS BIGINT) + 1)
           / {_U_DENOM!r} - 0.5 AS uc
  FROM agg
), pub AS (
  SELECT c_mktsegment,
         true_sum + (-{2.0 * (_DP_CLAMP_HI - _DP_CLAMP_LO) / DP_EPSILON!r})
           * sign(us) * ln(1.0 - 2.0 * abs(us)) AS noisy_sum,
         true_n + (-{2.0 / DP_EPSILON!r})
           * sign(uc) * ln(1.0 - 2.0 * abs(uc)) AS noisy_n
  FROM noised
)
SELECT c_mktsegment,
       round(noisy_sum, 4) AS noisy_sum,
       round(noisy_n, 4) AS noisy_n,
       round(noisy_sum / greatest(noisy_n, 1.0), 4) AS dp_mean,
       CAST({DP_EPSILON!r} AS DOUBLE) AS epsilon,
       CAST({_DP_CLAMP_HI - _DP_CLAMP_LO!r} AS DOUBLE) AS clamp_width
FROM pub
"""

QUERIES["q_dp_private_mean"] = (q_dp_private_mean, Q_DP_PRIVATE_MEAN_SQL)


DPQ_BINS = 32
DPQ_LO, DPQ_HI = -1000.0, 10000.0  # public domain bounds for c_acctbal
_DPQ_STEP = (DPQ_HI - DPQ_LO) / (DPQ_BINS - 1)


def q_dp_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-DP median via the EXPONENTIAL MECHANISM (McSherry & Talwar
    2007) — the third classic DP release after Laplace counts and
    the clamped mean: per market segment, candidate outputs are 32
    equi-width edges over the PUBLIC acctbal domain [-1000, 10000],
    utility u(t) = −|#{x<t} − n/2| (rank distance to the median,
    sensitivity 1), and the draw uses the Gumbel-max identity
    (argmax of ε·u/2 + Gumbel ≡ sampling ∝ exp(ε·u/2)) with the
    portable md5 uniform keyed by (segment, edge) — deterministic,
    so the oracle replays the exact released value. Published: the
    DP median, its true rank error, and the mechanism parameters.

    Scale: one conditional-aggregate pass builds all |segments|×32
    rank counts (bounded grid); the argmax is a partitioned window
    over 32 rows per segment. Nothing touches row-level data after
    the one scan.
    """
    cust = Catalog(spark, sf_dir).customer.select("c_mktsegment", "c_acctbal")
    grid = spark.range(DPQ_BINS).select(
        F.col("id").cast("int").alias("i"),
        (F.lit(DPQ_LO) + F.col("id") * F.lit(_DPQ_STEP)).alias("t"),
    )
    cnt = (
        cust.crossJoin(F.broadcast(grid))
        .groupBy("c_mktsegment", "i", "t")
        .agg(
            F.sum((F.col("c_acctbal") < F.col("t")).cast("long")).alias("lt"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    u = -F.abs(F.col("lt") - F.col("n") / 2.0)
    draw = _draw01(
        F.concat(
            F.lit("dpq:"), F.col("c_mktsegment"), F.lit(":"), F.col("i")
        )
    )
    gumbel = -F.log(-F.log(draw))
    score = F.lit(DP_EPSILON) * u / 2.0 + gumbel
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("score"), F.asc("i")
    )
    return (
        cnt.select(
            "c_mktsegment", "i", "t", "lt", "n", score.alias("score"), u.alias("u")
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_mktsegment",
            _R4(F.col("t"), "dp_median"),
            _R4(F.abs(F.col("lt") - F.col("n") / 2.0) / F.col("n"), "true_rank_err"),
            F.lit(DP_EPSILON).alias("epsilon"),
            F.lit(1).alias("sensitivity"),
        )
        .orderBy("c_mktsegment")
    )


Q_DP_QUANTILE_SQL = f"""
WITH grid AS (
  SELECT CAST(i AS INTEGER) AS i,
         CAST({DPQ_LO!r} AS DOUBLE) + i * CAST({_DPQ_STEP!r} AS DOUBLE) AS t
  FROM generate_series(0, {DPQ_BINS - 1}) g(i)
), cnt AS (
  SELECT c.c_mktsegment, g.i, g.t,
         sum(CASE WHEN c.c_acctbal < g.t THEN 1 ELSE 0 END) AS lt,
         count(*) AS n
  FROM customer c CROSS JOIN grid g
  GROUP BY 1, 2, 3
), scored AS (
  SELECT c_mktsegment, i, t, lt, n,
         {DP_EPSILON!r} * (-abs(lt - n / 2.0)) / 2.0
           + (-ln(-ln((CAST('0x' || substr(md5('dpq:' || c_mktsegment || ':' || i), 1, 12) AS BIGINT) + 1)
                      / {_U_DENOM!r}))) AS score
  FROM cnt
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY c_mktsegment
                               ORDER BY score DESC, i ASC) AS rn
  FROM scored
)
SELECT c_mktsegment,
       round(t, 4) AS dp_median,
       round(abs(lt - n / 2.0) / CAST(n AS DOUBLE), 4) AS true_rank_err,
       CAST({DP_EPSILON!r} AS DOUBLE) AS epsilon, 1 AS sensitivity
FROM ranked WHERE rn = 1
ORDER BY c_mktsegment
"""

QUERIES["q_dp_quantile"] = (q_dp_quantile, Q_DP_QUANTILE_SQL)


RR_P = 0.75  # truth-telling probability (ε_local = ln(p/(1−p)) ≈ 1.1)


def q_randomized_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warner randomized response (the classic local-DP mechanism):
    each user's sensitive bit ("ever purchased") is reported
    truthfully with probability p = 0.75, flipped otherwise — the
    per-user coin is the portable md5 draw keyed by 'rr:'+user, so
    no raw bit leaves the "device" row and the whole mechanism is
    deterministic and oracle-replayable. The unbiased estimator
    π̂ = (λ + p − 1)/(2p − 1) over the reported shares is published
    per user cohort next to the true share it can be audited
    against at test scale (a real deployment has no true column —
    that is the point).

    Shapes: per-user bit is one groupBy over events, the report is
    a codegen projection, the readout a 10-row cohort aggregate.
    """
    ev = Catalog(spark, sf_dir).events.select("user_id", "event_type")
    per_user = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("bit")
    )
    coin = _draw01(F.concat(F.lit("rr:"), F.col("user_id").cast("string")))
    reported = per_user.select(
        "user_id",
        "bit",
        F.when(coin < RR_P, F.col("bit")).otherwise(1 - F.col("bit")).alias("rep"),
    )
    lam = F.avg("rep")
    return (
        reported.groupBy((F.col("user_id") % 10).alias("cohort"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            _R4(F.avg("bit"), "true_share"),
            _R4(lam, "reported_share"),
            _R4((lam + RR_P - 1.0) / (2.0 * RR_P - 1.0), "estimated_share"),
        )
        .orderBy("cohort")
    )


Q_RANDOMIZED_RESPONSE_SQL = f"""
WITH per_user AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS bit
  FROM events GROUP BY user_id
), reported AS (
  SELECT user_id, bit,
         CASE WHEN (CAST('0x' || substr(md5('rr:' || CAST(user_id AS VARCHAR)), 1, 12)
                    AS BIGINT) + 1) / {_U_DENOM!r} < {RR_P!r}
              THEN bit ELSE 1 - bit END AS rep
  FROM per_user
)
SELECT user_id % 10 AS cohort, count(*) AS n_users,
       round(avg(bit), 4) AS true_share,
       round(avg(rep), 4) AS reported_share,
       round((avg(rep) + {RR_P!r} - 1.0) / (2.0 * {RR_P!r} - 1.0), 4) AS estimated_share
FROM reported GROUP BY 1 ORDER BY 1
"""

QUERIES["q_randomized_response"] = (q_randomized_response, Q_RANDOMIZED_RESPONSE_SQL)
