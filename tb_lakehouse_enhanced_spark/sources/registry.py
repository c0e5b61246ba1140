"""Source adapters.

The reference ingests via single-partition JDBC full-table pulls
(reference notebooks/12_ETL_Bronze_PySpark.py:14-26,61 — a known physical
bottleneck, SURVEY.md §3). Our engine exposes one ``load_table`` interface
with two implementations:

- parquet (tests / local): ``spark.read.parquet`` — splittable, columnar,
  filter-pushdown-capable. This is what the driver's testdata uses.
- jdbc (prod-shaped): partitioned reads (``partitionColumn`` +
  ``numPartitions``) so a 100 TB source pull fans out across executors
  instead of the reference's 1-stream read.

At 100 TB the parquet path scales naturally: Spark splits files at
``spark.sql.files.maxPartitionBytes`` and prunes columns/filters at the
scan, so adding executors adds read bandwidth linearly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# The driver's synthetic lakehouse (TESTDATA.md): TPC-H-ish star schema
# plus events / documents / embeddings extension tables.
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one source table as a DataFrame (lazy — a scan node only)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def load_files(spark: SparkSession, path: str, fmt: str = "parquet",
               schema=None, **options: str) -> DataFrame:
    """Generic file-format source (parquet / csv / json / orc / text /
    xml — XML is Spark-4 native, pass ``rowTag``).

    Parquet/ORC carry their own schema; for CSV/JSON/XML pass
    ``schema`` explicitly in production — ``inferSchema`` scans the
    data twice and is banned at 100 TB.
    """
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def save_files(df: DataFrame, path: str, fmt: str = "parquet",
               mode: str = "overwrite",
               partition_by: tuple[str, ...] = (),
               dynamic_overwrite: bool = False, **options: str) -> None:
    """Generic file sink, partitioned when asked.

    ``dynamic_overwrite=True`` switches ``mode="overwrite"`` from
    truncate-the-table to replace-only-the-partitions-present-in-``df``
    (``partitionOverwriteMode=dynamic``) — the idempotent daily-reload
    shape: re-running a day's load rewrites that day's partitions and
    leaves the other 10 years of a 100 TB table untouched.
    """
    writer = df.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if dynamic_overwrite:
        writer = writer.option("partitionOverwriteMode", "dynamic")
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def load_jdbc(spark: SparkSession, url: str, table: str,
              partition_column: str | None = None,
              num_partitions: int = 32,
              lower_bound: int | None = None,
              upper_bound: int | None = None,
              **properties: str) -> DataFrame:
    """Prod-shaped JDBC source (reference 12_ETL_Bronze_PySpark.py:61).

    Unlike the reference's single-stream pull, callers supply a numeric
    ``partition_column`` + bounds so the read is split into
    ``num_partitions`` parallel range queries.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in properties.items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (reader.option("partitionColumn", partition_column)
                  .option("numPartitions", str(num_partitions))
                  .option("lowerBound", str(lower_bound))
                  .option("upperBound", str(upper_bound)))
    return reader.load()


def load_jdbc_query(spark: SparkSession, url: str, query: str,
                    **properties: str) -> DataFrame:
    """JDBC scan with the relational work pushed INTO the source engine.

    ``query`` runs remotely and only its result crosses the wire — the
    right shape when the source can filter/aggregate 100x cheaper than
    shipping the full table (e.g. a selective bronze ingest window).
    Spark additionally pushes DataFrame filters applied on top of this
    into the generated outer query.
    """
    reader = spark.read.format("jdbc").option("url", url).option("query", query)
    for k, v in properties.items():
        reader = reader.option(k, v)
    return reader.load()


def save_jdbc(df: DataFrame, url: str, table: str, mode: str = "append",
              num_partitions: int | None = None, batch_size: int = 10_000,
              **properties: str) -> None:
    """Prod-shaped JDBC sink (the writeback half of the bronze path).

    Each of ``num_partitions`` tasks opens one connection and inserts in
    ``batch_size`` batches — the two knobs that matter at scale: too many
    partitions exhausts the DB's connection pool, too small a batch pays
    a round-trip per row. Coalesce (narrow, no shuffle) rather than
    repartition when reducing parallelism for the sink.
    """
    if num_partitions is not None and df.rdd.getNumPartitions() > num_partitions:
        df = df.coalesce(num_partitions)
    writer = (df.write.format("jdbc").option("url", url)
              .option("dbtable", table)
              .option("batchsize", str(batch_size)).mode(mode))
    for k, v in properties.items():
        writer = writer.option(k, v)
    writer.save()
