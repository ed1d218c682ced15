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
