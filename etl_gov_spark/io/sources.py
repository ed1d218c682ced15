"""Source connectors + table catalog.

Spark-first analogue of the reference's source layer
(``dags/tutorial_objectstorage.py`` ObjectStoragePath ingest,
``dags/tutorial_dag.py`` extract task): sources are declarative
``spark.read`` plans so Catalyst gets predicate pushdown, column
pruning, and partition pruning for free — nothing is materialized
at read time.

At 100 TB the catalog matters: every query should name tables once,
get consistent schemas, and scan parquet with pushed filters.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables: always broadcast-eligible in joins. At gov
# scale these stay tiny (regions/nations are bounded by geography).
DIM_TABLES = frozenset({"region", "nation", "supplier", "part"})


# Analyzed-plan cache keyed by (session, dir, table): every
# `spark.read.parquet` call re-lists files and re-reads footers for
# the schema — 0.5–3 s of driver time per call observed — and every
# query function builds its tables fresh. The catalog tables are
# immutable inputs, so the lazy DataFrame handle is safe to share
# process-wide; it holds no data, only the analyzed scan.
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one catalog table as a lazy parquet scan (memoized per
    session — see ``_TABLE_CACHE``).

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which
    Spark's vectorized reader rejects; we read nanos as long
    (runtime conf) and truncate to microsecond timestamps with
    integer division — same truncation DuckDB applies, so both
    engines see identical values.
    """
    from etl_gov_spark.session import tune_runtime

    tune_runtime(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    # mtime in the key: a rewritten table (tests copy + mutate
    # catalogs in tmp dirs) must miss — the cached handle pins the
    # old file listing and would read deleted files
    try:
        mtime = int(os.path.getmtime(path) * 1000)
    except OSError:
        mtime = -1
    key = (spark.sparkContext.applicationId, os.path.abspath(path), mtime)
    hit = _TABLE_CACHE.get(key)
    if hit is not None:
        return hit
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    fields = dict(df.dtypes)
    if name == "events" and fields.get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif name == "events" and fields.get("ts") == "timestamp_ntz":
        # Belt-and-braces alongside the inferTimestampNTZ=false conf
        # in tune_runtime: if a host session cached the NTZ schema
        # before the conf landed, normalize here. Session TZ is UTC,
        # so the cast re-tags the same wall-clock instant.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    _TABLE_CACHE[key] = df
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load catalog tables and register them as temp views so both
    the DataFrame API and ``spark.sql`` reach the same plans."""
    out: dict[str, DataFrame] = {}
    for name in names:
        df = read_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


@dataclass
class Catalog:
    """Named lazy table handles over one scale-factor directory."""

    spark: SparkSession
    sf_dir: str
    _cache: dict[str, DataFrame] = field(default_factory=dict)

    def table(self, name: str) -> DataFrame:
        if name not in self._cache:
            self._cache[name] = read_table(self.spark, self.sf_dir, name)
        return self._cache[name]

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return self.table(name)
        raise AttributeError(name)

    def register_views(self) -> None:
        for name in TABLES:
            self.table(name).createOrReplaceTempView(name)


def read_csv(
    spark: SparkSession, path: str, schema: StructType | str, **options: str
) -> DataFrame:
    """CSV source with an explicit schema — schema inference does a
    full extra pass over the data, which is a non-starter at scale."""
    return spark.read.options(header="true", **options).schema(schema).csv(path)


def read_json(
    spark: SparkSession, path: str, schema: StructType | str, **options: str
) -> DataFrame:
    """JSON-lines source with explicit schema (no inference pass)."""
    return spark.read.options(**options).schema(schema).json(path)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.text(path)


def read_orc(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """ORC source (native vectorized reader — the other columnar
    warehouse interchange format besides parquet; Hive estates are
    full of it). Predicate pushdown and column pruning work the
    same as parquet; schema optional because ORC footers carry it."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink with zlib compression (the ORC-ecosystem default)."""
    df.write.mode(mode).option("compression", "zlib").orc(path)


def jdbc_source_plan(
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 32,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **properties: str,
) -> dict[str, str]:
    """Build the option dict for a partitioned JDBC read.

    The container has no JDBC driver, so this returns the validated
    option plan (unit-tested) rather than a DataFrame; on a cluster:
    ``spark.read.format("jdbc").options(**plan).load()``. Partitioned
    reads (partitionColumn/lowerBound/upperBound/numPartitions) are
    mandatory at scale — a single-connection JDBC read serializes the
    whole table through one task.
    """
    plan = {"url": url, "dbtable": table, **properties}
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower/upper bounds")
        plan.update(
            partitionColumn=partition_column,
            numPartitions=str(num_partitions),
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
        )
    return plan


def read_evolving_parquet(
    spark: SparkSession,
    *paths: str,
    required: tuple[str, ...] = (),
) -> DataFrame:
    """Schema-evolution-tolerant parquet read: union partitions
    written under different schema versions (columns added over
    time) with ``mergeSchema`` — rows from older partitions carry
    NULL for later-added columns, and ``required`` asserts the
    columns every consumer depends on survived the merge.

    This is the ingestion reality of a long-lived feed: v1 files
    keep reading after v2 adds columns, no backfill rewrite. At
    scale, pin an explicit expected schema once known — mergeSchema
    reads every footer; use it at the evolution boundary, not on
    every query.
    """
    df = spark.read.option("mergeSchema", "true").parquet(*paths)
    missing = [c for c in required if c not in df.columns]
    if missing:
        raise ValueError(f"merged schema lacks required columns: {missing}")
    return df


def read_csv_quarantine(
    spark: SparkSession,
    path: str,
    schema: str,
) -> tuple[DataFrame, DataFrame]:
    """Ingest-with-quarantine CSV read: rows that parse under the
    explicit schema flow through; malformed rows land in a
    quarantine DataFrame carrying the raw line (PERMISSIVE mode +
    ``columnNameOfCorruptRecord``) — the load never aborts and bad
    records stay auditable. The standard bad-feed containment
    pattern: at scale the quarantine side is written next to the
    table and alarmed on, not silently dropped.
    """
    full_schema = schema + ", _corrupt string"
    df = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
    ).cache()  # one parse, both sides consistent
    good = df.filter(df._corrupt.isNull()).drop("_corrupt")
    bad = df.filter(df._corrupt.isNotNull()).select("_corrupt")
    return good, bad


def expand_parallelism(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's parallelism before a CPU-
    heavy stage (hash expansion, vector folds): input-split sizing
    targets scan bytes, not downstream compute, so a compact parquet
    file can arrive as ONE split and serialize the whole stage on a
    single core. Widen-only — already-parallel inputs (any real
    dataset at scale) pass through with no extra shuffle."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def read_fixed_width(
    spark: SparkSession,
    path: str,
    fields: tuple[tuple[str, int, int, str], ...],
) -> DataFrame:
    """Fixed-width-record reader — the mainframe/COBOL extract
    format legacy gov feeds still ship. ``fields`` is
    (name, start_1based, width, type); parsing is substring+trim+cast
    in one codegen projection over spark.read.text (each field slice
    pushes no Python, and malformed values try_cast to NULL for a DQ
    gate to catch — never an ANSI-mode abort)."""
    from pyspark.sql import functions as F

    raw = spark.read.text(path)
    cols = [
        F.trim(F.substring("value", start, width)).try_cast(typ).alias(name)
        for name, start, width, typ in fields
    ]
    return raw.select(*cols)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: str | None = None,
) -> DataFrame:
    """XML source (the format legacy gov registries actually ship):
    Spark's native XML reader with an explicit ``rowTag``. Pass
    ``schema`` in production — inference reads the data twice and
    pins types nondeterministically on dirty feeds. For XML embedded
    in a column (API payloads), use ``F.from_xml`` in a projection
    instead of re-reading files."""
    r = spark.read.format("xml").option("rowTag", row_tag)
    if schema:
        r = r.schema(schema)
    return r.load(path)


def avro_available(spark: SparkSession) -> bool:
    """True when the spark-avro module is on the classpath. Avro is
    'built-in but external' since Spark 2.4 — clusters deploy
    org.apache.spark:spark-avro with --packages; this container
    does not ship it, so the readers below gate on this probe
    instead of failing mid-pipeline."""
    try:
        # ask the engine's own resolver — Class.forName is not
        # enough (avro-core jars ship for shuffle serialization
        # without the spark-avro DataSourceRegister)
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "avro", spark._jvm.org.apache.spark.sql.internal.SQLConf.get()
        )
        return True
    except Exception:
        return False


def read_avro(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """Avro source (row-major interchange format — Kafka estates and
    schema-registry pipelines emit it). Raises a clear RuntimeError
    when the external module is absent rather than Spark's opaque
    'Failed to find data source'."""
    if not avro_available(spark):
        raise RuntimeError(
            "spark-avro is not on the classpath; deploy with "
            "--packages org.apache.spark:spark-avro_2.13:<spark-version>"
        )
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.format("avro").load(path)
