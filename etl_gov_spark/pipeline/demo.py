"""End-to-end demo pipeline (SURVEY.md §2.G `pipeline_gov_report`).

The reference's canonical DAG shape (``tutorial_dag.py`` /
``tutorial_taskflow_api.py``: extract → transform → load;
``tutorial_objectstorage.py``: fetch → store → analyze) re-expressed
as a Pipeline whose tasks wire lazy DataFrames: ingest three tables,
clean, conform, aggregate into the published gov report. Because
every task returns a lazy plan, the final DataFrame is ONE Catalyst
plan — the clean-stage filter pushes down into the ingest-stage
parquet scan, which is the whole point of the Spark-first design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_gov_spark.io.sources import read_table
from etl_gov_spark.pipeline.core import Dataset, DatasetRegistry, Pipeline


def build_gov_report_pipeline(spark: SparkSession, sf_dir: str) -> Pipeline:
    registry = DatasetRegistry()
    p = Pipeline("gov_report", spark, registry=registry)

    with p.task_group("ingest"):

        @p.task("orders")
        def ingest_orders(ctx) -> DataFrame:
            return read_table(ctx.spark, sf_dir, "orders")

        @p.task("customer")
        def ingest_customer(ctx) -> DataFrame:
            return read_table(ctx.spark, sf_dir, "customer")

        @p.task("nation")
        def ingest_nation(ctx) -> DataFrame:
            return read_table(ctx.spark, sf_dir, "nation")

    @p.task("clean", deps=["ingest.orders"])
    def clean(ctx) -> DataFrame:
        # drop malformed rows: null keys, non-positive totals
        o = ctx.pull("ingest.orders")
        return o.filter(
            F.col("o_orderkey").isNotNull()
            & F.col("o_custkey").isNotNull()
            & (F.col("o_totalprice") > 0)
        )

    @p.task("conform", deps=["clean", "ingest.customer", "ingest.nation"])
    def conform(ctx) -> DataFrame:
        o = ctx.pull("clean")
        c = ctx.pull("ingest.customer")
        n = ctx.pull("ingest.nation")
        return (
            o.join(c, F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
            .select(
                "n_name",
                F.year("o_orderdate").cast("int").alias("order_year"),
                "o_totalprice",
                "o_orderstatus",
            )
        )

    @p.task(
        "aggregate",
        deps=["conform"],
        outputs=Dataset("gov_report", uri="memory://gov_report"),
    )
    def aggregate(ctx) -> DataFrame:
        return (
            ctx.pull("conform")
            .groupBy("n_name", "order_year")
            .agg(
                F.round(F.sum("o_totalprice"), 4).alias("total_sales"),
                F.count(F.lit(1)).alias("n_orders"),
                F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
            )
        )

    return p


def pipeline_gov_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the demo pipeline and return the published report plan."""
    p = build_gov_report_pipeline(spark, sf_dir)
    ctx = p.run()
    assert ctx.registry is not None and ctx.registry.version("gov_report") == 1
    return ctx.pull("aggregate")


PIPELINE_GOV_REPORT_SQL = """
SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS order_year,
       round(sum(o_totalprice), 4) AS total_sales,
       count(*) AS n_orders,
       count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL AND o_totalprice > 0
GROUP BY 1, 2
"""


QUERIES: dict[str, tuple] = {
    "pipeline_gov_report": (pipeline_gov_report, PIPELINE_GOV_REPORT_SQL),
}


# ---------------------------------------------------------------------------
# End-to-end LLM corpus-prep pipeline (round 12): the training-data
# funnel as ONE Pipeline whose stages are the engine's own operators'
# disciplines — quality gate → exact dedup → hash split → sequence
# packing — reported as a per-stage ledger. Reference parity: the
# tutorial ETL's extract → transform → load shape applied to the
# corpus domain end to end.
# ---------------------------------------------------------------------------

_PREP_BUDGET = 256  # pack budget (tokens), corpus_pack_greedy's grain
_PREP_CONF_ALPHA = 0.1  # conformal miscoverage budget — the streaming
# gate's α (events_stream._CONF_GATE_ALPHA), a member of _CONF_ALPHAS


def build_corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> Pipeline:
    from etl_gov_spark.operators.text import tokens_col

    p = Pipeline("corpus_prep", spark)

    @p.task("ingest")
    def ingest(ctx) -> DataFrame:
        return read_table(ctx.spark, sf_dir, "documents").select(
            "doc_id", "source", "text", tokens_col().alias("toks")
        )

    @p.task("quality", deps=["ingest"])
    def quality(ctx) -> DataFrame:
        # the CONFORMAL quality cut (corpus_conformal_quality /
        # stream_conformal_gate's α=0.1 threshold): score every doc
        # with the trained classifier and keep −s ≤ qhat, where qhat
        # is the exact ⌈(n₁+1)(1−α)⌉-th smallest calibration
        # nonconformity — the distribution-free guarantee (≤ ~10% of
        # genuinely good docs dropped) now holds through the whole
        # composed funnel, not just the standalone readout. qhat is
        # computed by the distributed rank ladder (ONE scalar crosses
        # the driver).
        from etl_gov_spark.operators.corpus import (
            _conformal_qhat,
            _qc_dot,
            _qc_train,
        )

        feat, _n, bi, bw = _qc_train(ctx.spark, sf_dir)
        scored = feat.select(
            "doc_id",
            F.round(F.lit(bi) + _qc_dot("xv", bw), 6).alias("s"),
            F.col("y").cast("long").alias("yl"),
            "held",
        )
        cpos = scored.filter(
            F.col("held")
            & F.substring(
                F.md5(F.col("doc_id").cast("string")), 2, 1
            ).isin(*list("01234567"))
            & (F.col("yl") == 1)
        ).select((-F.col("s")).alias("nc"))
        qhat = _conformal_qhat(cpos, _PREP_CONF_ALPHA)
        d = ctx.pull("ingest").join(
            scored.select("doc_id", "s"), "doc_id"
        )
        if qhat is not None:
            d = d.filter(-F.col("s") <= F.lit(float(qhat)))
        return d.drop("s")

    @p.task("dedup", deps=["quality"])
    def dedup(ctx) -> DataFrame:
        # exact dedup, dedup_exact's convention: md5 of the
        # whitespace-normalized text, keep the min doc_id
        d = ctx.pull("quality").withColumn(
            "h", F.md5(F.concat_ws(" ", "toks"))
        )
        keep = d.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
        return d.join(keep, ["h", "doc_id"]).drop("h")

    @p.task("split", deps=["dedup"])
    def split(ctx) -> DataFrame:
        # corpus_split's seedless 12:2:2 hash split
        h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
        return ctx.pull("dedup").withColumn(
            "split",
            F.when(h.isin("c", "d"), "val")
            .when(h.isin("e", "f"), "test")
            .otherwise("train"),
        )

    @p.task("pack", deps=["split"])
    def pack(ctx) -> DataFrame:
        # corpus_pack_greedy's concat-and-chunk bins per (split,
        # source) — deterministic doc order, one partitioned window
        from pyspark.sql import Window

        d = ctx.pull("split").withColumn("n_tokens", F.size("toks"))
        w = (
            Window.partitionBy("split", "source")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return d.withColumn(
            "bin_id",
            F.floor(
                (F.sum("n_tokens").over(w) - F.col("n_tokens")) / _PREP_BUDGET
            ),
        )

    return p


def pipeline_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data funnel end to end, as a per-stage ledger:
    one row per (stage, split, source) with surviving docs, tokens,
    and (for the packed stage) bins. Every stage is one of the
    engine's established disciplines (the streaming doc gate's
    quality thresholds, dedup_exact's md5-keep-min,
    corpus_split's seedless hash split, corpus_pack_greedy's
    concat-and-chunk) wired through the Pipeline DSL — so the whole
    prep run is ONE lazy Catalyst plan per stage and the funnel
    numbers come out as the pipeline's published report, exactly
    what a 100 TB corpus build logs per day.
    """
    p = build_corpus_prep_pipeline(spark, sf_dir)
    ctx = p.run()

    def ledger(df: DataFrame, stage: str, with_split: bool, with_bins: bool):
        keys = [
            F.lit(stage).alias("stage"),
            (F.col("split") if with_split else F.lit("all")).alias("split"),
            F.col("source"),
        ]
        aggs = [
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size("toks")).alias("n_tokens"),
            (
                F.countDistinct("bin_id")
                if with_bins
                else F.max(F.lit(None).cast("bigint"))
            ).alias("n_bins"),
        ]
        cols = ["toks"] + (["bin_id"] if with_bins else [])
        return (
            df.select(*keys, *cols)
            .groupBy("stage", "split", "source")
            .agg(*aggs)
        )

    rows = (
        ledger(ctx.pull("ingest"), "00_raw", False, False)
        .unionByName(ledger(ctx.pull("quality"), "01_quality", False, False))
        .unionByName(ledger(ctx.pull("dedup"), "02_dedup", False, False))
        .unionByName(ledger(ctx.pull("split"), "03_split", True, False))
        .unionByName(ledger(ctx.pull("pack"), "04_packed", True, True))
    )
    return rows.orderBy("stage", "split", "source")


def _corpus_prep_sql() -> str:
    from etl_gov_spark.operators.corpus import _QC_DIM, _QC_SQL_PREFIX

    return (
        _QC_SQL_PREFIX
        + f""",
allscore AS MATERIALIZED (
  SELECT f.doc_id, f.y, f.held,
         round(b.bi + list_reduce(
           list_transform(generate_series(1, {_QC_DIM}), j -> f.xv[j] * b.bw[j]),
           (a, v) -> a + v), 6) AS s
  FROM feat f CROSS JOIN it6 b
), cpos AS (
  SELECT -s AS nc FROM allscore
  WHERE held AND y = 1.0
    AND substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)
          IN ('0','1','2','3','4','5','6','7')
), n1t AS (SELECT count(*) AS n1 FROM cpos),
thr AS (
  SELECT min(c.nc) AS qhat
  FROM n1t n
  LEFT JOIN (
    SELECT nc, sum(cn) OVER (ORDER BY nc
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n
    FROM (SELECT nc, count(*) AS cn FROM cpos GROUP BY nc)
  ) c ON c.cum_n >= ceil((n.n1 + 1) * (1.0 - {_PREP_CONF_ALPHA}))
), ingest AS (
  SELECT doc_id, source, text, toks FROM raw
), quality AS (
  SELECT i.* FROM ingest i JOIN allscore a USING (doc_id)
  WHERE (SELECT qhat FROM thr) IS NULL
     OR -a.s <= (SELECT qhat FROM thr)
), dedup AS (
  SELECT * FROM quality q
  WHERE doc_id = (SELECT min(doc_id) FROM quality q2
                  WHERE md5(array_to_string(q2.toks, ' '))
                      = md5(array_to_string(q.toks, ' ')))
), split AS (
  SELECT *,
         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c','d') THEN 'val'
              WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('e','f') THEN 'test'
              ELSE 'train' END AS split
  FROM dedup
), packed AS (
  SELECT split, source, len(toks) AS n_tokens,
         CAST(floor((sum(len(toks)) OVER (PARTITION BY split, source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     - len(toks)) / {_PREP_BUDGET}) AS BIGINT) AS bin_id
  FROM split
)
SELECT '00_raw' AS stage, 'all' AS split, source,
       count(*) AS n_docs, CAST(sum(len(toks)) AS BIGINT) AS n_tokens,
       CAST(NULL AS BIGINT) AS n_bins
FROM ingest GROUP BY source
UNION ALL
SELECT '01_quality', 'all', source, count(*), CAST(sum(len(toks)) AS BIGINT),
       CAST(NULL AS BIGINT)
FROM quality GROUP BY source
UNION ALL
SELECT '02_dedup', 'all', source, count(*), CAST(sum(len(toks)) AS BIGINT),
       CAST(NULL AS BIGINT)
FROM dedup GROUP BY source
UNION ALL
SELECT '03_split', split, source, count(*), CAST(sum(len(toks)) AS BIGINT),
       CAST(NULL AS BIGINT)
FROM split GROUP BY split, source
UNION ALL
SELECT '04_packed', split, source, count(*), CAST(sum(n_tokens) AS BIGINT),
       CAST(count(DISTINCT bin_id) AS BIGINT)
FROM packed GROUP BY split, source
ORDER BY stage, split, source
"""
    )


QUERIES["pipeline_corpus_prep"] = (pipeline_corpus_prep, _corpus_prep_sql())
