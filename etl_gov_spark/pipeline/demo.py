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


# ---------------------------------------------------------------------------
# End-to-end crawl-ingest pipeline (round 15): the Common-Crawl shape —
# WARC shards opened with the REAL container parser (member walk +
# inflate + CRC verify), response payloads extracted into documents
# (identity read from WARC-Target-URI inside the archive, no side
# channel), then the published text-prep chain: stopword-profile
# langid → Gopher rules → exact dedup — reported as a per-stage
# funnel ledger. Reference parity: the tutorial ETL's
# fetch → transform → publish shape applied to crawl ingest.
# ---------------------------------------------------------------------------


def build_crawl_prep_pipeline(spark: SparkSession, sf_dir: str) -> Pipeline:
    import pandas as pd

    from etl_gov_spark.operators.multimodal import (
        parse_warc_gz,
        synth_crawl_warc,
    )
    from etl_gov_spark.operators.text import (
        STOPWORDS_DE,
        STOPWORDS_EN,
        STOPWORDS_ES,
        STOPWORDS_FR,
        _stop_hits,
        tokens_col,
    )

    p = Pipeline("crawl_prep", spark)

    @p.task("fetch")
    def fetch(ctx) -> DataFrame:
        # the crawl shards: one REAL WARC/concatenated-gzip archive
        # per capture (3 gzip members: warcinfo + request + response,
        # the response body is the page text) — a real pipeline reads
        # the same bytes from shard files; the container framing and
        # every downstream parse are genuine either way
        docs = read_table(ctx.spark, sf_dir, "documents").select(
            "doc_id", "source", "text"
        )

        def run(batches):
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "archive": [
                            synth_crawl_warc(
                                int(i), str(s), str(t).encode("utf-8")
                            )
                            for i, s, t in zip(
                                pdf["doc_id"], pdf["source"], pdf["text"]
                            )
                        ]
                    }
                )

        return docs.mapInPandas(run, "archive binary")

    @p.task("records", deps=["fetch"])
    def records(ctx) -> DataFrame:
        # real member walk + inflate + CRC-32/ISIZE verify; document
        # identity comes from INSIDE the archive (WARC-Target-URI)
        def run(batches):
            for pdf in batches:
                rows = []
                for buf in pdf["archive"]:
                    for r in parse_warc_gz(bytes(buf)):
                        _, _, did, src = r["target_uri"].split(":", 3)
                        rows.append(
                            (
                                int(did),
                                src,
                                r["warc_type"],
                                r["payload"].decode("utf-8")
                                if r["warc_type"] == "response"
                                else None,
                            )
                        )
                yield pd.DataFrame(
                    rows, columns=["doc_id", "source", "warc_type", "text"]
                )

        # narrow rows out of the one Arrow stage, consumed by FIVE
        # ledger stages — checkpoint so the archive synthesis + parse
        # runs once, not per consumer (12 Python stages observed)
        return ctx.pull("fetch").mapInPandas(
            run, "doc_id bigint, source string, warc_type string, text string"
        ).localCheckpoint(eager=True)

    @p.task("responses", deps=["records"])
    def responses(ctx) -> DataFrame:
        return (
            ctx.pull("records")
            .filter(F.col("warc_type") == "response")
            .select("doc_id", "source", "text", tokens_col().alias("toks"))
        )

    @p.task("url_dedup", deps=["responses"])
    def url_dedup(ctx) -> DataFrame:
        # dedup_url_canonical's keep-first, run BEFORE any content
        # stage — the first dedup every real crawl pipeline performs
        # (canonicalize the capture URL, keep the earliest capture).
        # The capture URL derives from the crawl identity parsed out
        # of the archive; a real ingest reads it straight from
        # WARC-Target-URI.
        from etl_gov_spark.operators.dedup import canonical_url, synth_capture_url

        d = ctx.pull("responses").withColumn(
            "curl", canonical_url(synth_capture_url(F.col("doc_id")))
        )
        keep = d.groupBy("curl").agg(F.min("doc_id").alias("doc_id"))
        return d.join(keep, ["curl", "doc_id"]).drop("curl")

    @p.task("langid", deps=["url_dedup"])
    def langid(ctx) -> DataFrame:
        # text_langid's stopword-profile argmax, as the keep-en gate
        d = ctx.pull("url_dedup")
        t = F.col("toks")
        en, es, fr, de = (
            _stop_hits(t, STOPWORDS_EN),
            _stop_hits(t, STOPWORDS_ES),
            _stop_hits(t, STOPWORDS_FR),
            _stop_hits(t, STOPWORDS_DE),
        )
        best = F.greatest(en, es, fr, de)
        return d.filter((best > 0) & (en == best))

    @p.task("gopher", deps=["langid"])
    def gopher(ctx) -> DataFrame:
        # corpus_gopher_rules' five checks as one keep predicate
        d = ctx.pull("langid")
        toks = F.col("toks")
        n_words = F.size(toks)
        mean_wlen = (F.length(F.trim(F.col("text"))) - (n_words - 1)) / n_words
        punct = F.length("text") - F.length(
            F.regexp_replace("text", r"[.,!?;:#*]", "")
        )
        alpha_frac = F.size(F.filter(toks, lambda x: x.rlike("[a-z]"))) / n_words
        stop_arr = F.array(*[F.lit(w) for w in STOPWORDS_EN])
        stop_hits = F.size(
            F.filter(toks, lambda x: F.array_contains(stop_arr, x))
        )
        fail_any = (
            (n_words < 5)
            | (n_words > 100000)
            | ~mean_wlen.between(3.0, 10.0)
            | (punct / n_words > 0.1)
            | (alpha_frac < 0.8)
            | (stop_hits < 2)
        )
        return d.filter(~fail_any)

    @p.task("dedup", deps=["gopher"])
    def dedup(ctx) -> DataFrame:
        d = ctx.pull("gopher").withColumn(
            "h", F.md5(F.concat_ws(" ", "toks"))
        )
        keep = d.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
        return d.join(keep, ["h", "doc_id"]).drop("h")

    return p


def pipeline_crawl_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Common-Crawl ingest funnel end to end, as a per-stage
    ledger: one row per (stage, source) with record/doc/token
    counts. Stage 00 is the ARCHIVE layer (every WARC record that
    survived the real inflate + CRC walk); stages 01–05 are the
    document funnel (response extraction → canonical-URL keep-first
    dedup → stopword-profile langid keep-en → Gopher rules → exact
    content dedup), each an established engine discipline wired
    through the Pipeline DSL. URL dedup runs FIRST among the doc
    stages, exactly where a real crawl pipeline runs it — cheap
    string algebra that shrinks everything downstream.

    Scale shape: archive bytes cross exactly ONE Arrow stage and
    are never reshuffled (records emerge as narrow rows); every
    later stage is codegen filters + one hash aggregate. The funnel
    ledger is a bounded per-(stage, source) rollup — the per-shard
    report a 100 TB crawl build logs per day.
    """
    p = build_crawl_prep_pipeline(spark, sf_dir)
    ctx = p.run()

    def ledger(df: DataFrame, stage: str, records_grain: bool):
        if records_grain:
            return df.groupBy(
                F.lit(stage).alias("stage"), F.col("source")
            ).agg(
                F.count(F.lit(1)).alias("n_records"),
                F.countDistinct("doc_id").alias("n_docs"),
                F.max(F.lit(None).cast("bigint")).alias("n_tokens"),
            )
        return df.groupBy(F.lit(stage).alias("stage"), F.col("source")).agg(
            F.count(F.lit(1)).alias("n_records"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size("toks")).alias("n_tokens"),
        )

    rows = (
        ledger(ctx.pull("records"), "00_records", True)
        .unionByName(ledger(ctx.pull("responses"), "01_responses", False))
        .unionByName(ledger(ctx.pull("url_dedup"), "02_url_dedup", False))
        .unionByName(ledger(ctx.pull("langid"), "03_langid", False))
        .unionByName(ledger(ctx.pull("gopher"), "04_gopher", False))
        .unionByName(ledger(ctx.pull("dedup"), "05_dedup", False))
    )
    return rows.orderBy("stage", "source")


def _crawl_prep_sql() -> str:
    from etl_gov_spark.operators.text import (
        STOPWORDS_DE,
        STOPWORDS_EN,
        STOPWORDS_ES,
        STOPWORDS_FR,
        _sql_stop_hits,
    )

    from etl_gov_spark.operators.dedup import _SQL_URL_BASE

    en = _sql_stop_hits(STOPWORDS_EN)
    es = _sql_stop_hits(STOPWORDS_ES)
    fr = _sql_stop_hits(STOPWORDS_FR)
    de = _sql_stop_hits(STOPWORDS_DE)
    return f"""
WITH {_SQL_URL_BASE}, resp AS (
  SELECT doc_id, source, text,
         string_split_regex(trim(text), '\\s+') AS toks
  FROM documents
), rec AS (
  SELECT doc_id, source FROM resp
  CROSS JOIN (SELECT unnest(['warcinfo', 'request', 'response']) AS wt)
), ukeep AS (
  SELECT curl, min(doc_id) AS doc_id FROM curls GROUP BY curl
), udd AS (
  SELECT r.* FROM resp r JOIN ukeep k ON r.doc_id = k.doc_id
), langid AS (
  SELECT * FROM (
    SELECT udd.*, {en} AS en_hits,
           greatest({en}, {es}, {fr}, {de}) AS best
    FROM udd
  ) WHERE best > 0 AND en_hits = best
), gopher AS (
  SELECT doc_id, source, text, toks FROM (
    SELECT l.*,
           len(toks) AS n_words,
           (length(trim(text)) - (len(toks) - 1)) / CAST(len(toks) AS DOUBLE) AS mean_wlen,
           length(text) - length(regexp_replace(text, '[.,!?;:#*]', '', 'g')) AS punct,
           len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) / CAST(len(toks) AS DOUBLE) AS alpha_frac,
           len(list_filter(toks, t -> list_contains([{", ".join(repr(w) for w in STOPWORDS_EN)}], t))) AS stop_hits
    FROM langid l
  ) WHERE NOT ((n_words < 5 OR n_words > 100000)
            OR NOT (mean_wlen BETWEEN 3.0 AND 10.0)
            OR punct / CAST(n_words AS DOUBLE) > 0.1
            OR alpha_frac < 0.8
            OR stop_hits < 2)
), ded AS (
  SELECT * FROM gopher g
  WHERE doc_id = (SELECT min(doc_id) FROM gopher g2
                  WHERE md5(array_to_string(g2.toks, ' '))
                      = md5(array_to_string(g.toks, ' ')))
)
SELECT '00_records' AS stage, source,
       count(*) AS n_records, count(DISTINCT doc_id) AS n_docs,
       CAST(NULL AS BIGINT) AS n_tokens
FROM rec GROUP BY source
UNION ALL
SELECT '01_responses', source, count(*), count(*),
       CAST(sum(len(toks)) AS BIGINT)
FROM resp GROUP BY source
UNION ALL
SELECT '02_url_dedup', source, count(*), count(*),
       CAST(sum(len(toks)) AS BIGINT)
FROM udd GROUP BY source
UNION ALL
SELECT '03_langid', source, count(*), count(*),
       CAST(sum(len(toks)) AS BIGINT)
FROM langid GROUP BY source
UNION ALL
SELECT '04_gopher', source, count(*), count(*),
       CAST(sum(len(toks)) AS BIGINT)
FROM gopher GROUP BY source
UNION ALL
SELECT '05_dedup', source, count(*), count(*),
       CAST(sum(len(toks)) AS BIGINT)
FROM ded GROUP BY source
ORDER BY stage, source
"""


QUERIES["pipeline_crawl_prep"] = (pipeline_crawl_prep, _crawl_prep_sql())
