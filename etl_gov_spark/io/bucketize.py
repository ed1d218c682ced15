"""Bucketed-catalog materialization (SURVEY.md §2.H / §7 step 5).

At 100 TB the dominant recurring cost is re-shuffling fact tables for
every join on the same key. The fix is layout, not per-query tuning:
materialize hot tables ONCE as bucketed managed tables (hash-
partitioned and sorted by their join key at write time); every
subsequent equi-join or aggregation on that key reads pre-shuffled,
pre-sorted buckets and plans a zero-Exchange SortMergeJoin.

``BucketedCatalog`` wraps that lifecycle: declare table→key→buckets,
``materialize()`` once per dataset refresh, then hand out DataFrames
interchangeable with the plain path-based ``Catalog``. Bucket counts
should scale with data volume (buckets ≈ table_bytes /
target_partition_bytes) and stay a power of two so co-located joins
between tables with different bucket counts can still align
(Spark 3.1+ bucket coalescing).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from etl_gov_spark.io.sinks import write_bucketed_table
from etl_gov_spark.io.sources import Catalog

# fact tables and the key they are repeatedly joined/aggregated on
DEFAULT_SPECS: dict[str, tuple[str, ...]] = {
    "orders": ("o_orderkey",),
    "lineitem": ("l_orderkey",),
}


@dataclass
class BucketedCatalog:
    """A set of bucketed managed tables mirroring the parquet
    catalog, co-located on their declared join keys."""

    spark: SparkSession
    sf_dir: str
    num_buckets: int = 8
    prefix: str = "bkt"
    specs: dict[str, tuple[str, ...]] = field(
        default_factory=lambda: dict(DEFAULT_SPECS)
    )

    def table_name(self, table: str) -> str:
        return f"{self.prefix}_{table}"

    def materialize(self) -> list[str]:
        """Write every spec'd table as a bucketed+sorted managed
        table (one shuffle each — paid once, amortized over every
        downstream join). Returns the created table names."""
        cat = Catalog(self.spark, self.sf_dir)
        created = []
        for table, keys in self.specs.items():
            name = self.table_name(table)
            write_bucketed_table(
                getattr(cat, table), name, keys, self.num_buckets, sort_cols=keys
            )
            created.append(name)
        return created

    def drop(self) -> None:
        for table in self.specs:
            self.spark.sql(f"DROP TABLE IF EXISTS {self.table_name(table)}")

    def __getattr__(self, table: str) -> DataFrame:
        if table.startswith("_") or table not in self.specs:
            raise AttributeError(table)
        return self.spark.table(self.table_name(table))


def order_lineitem_revenue(bc: BucketedCatalog) -> DataFrame:
    """Demo co-located query: per-order net revenue + status, the
    orders⋈lineitem join every mart view repeats. On bucketed
    inputs this plans as SortMergeJoin with zero Exchange before the
    join — the layout pays for itself after one query."""
    from pyspark.sql import functions as F

    o = bc.orders.select("o_orderkey", "o_orderstatus")
    li = bc.lineitem.select(
        "l_orderkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net"),
    )
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderstatus")
        .agg(F.round(F.sum("net"), 4).alias("net_revenue"))
    )
