"""Catalog / DDL bootstrap (medallion namespaces + managed tables).

Re-expresses the reference's catalog plumbing (SURVEY.md §2.8):
``CREATE DATABASE bronze/silver/gold`` (reference 01_Init.py:39-41),
``DROP DATABASE ... CASCADE`` resets (01:27-29), managed
``saveAsTable`` sinks (12_ETL_Bronze:66) and informational constraints
(01:236-239, 336-341 — Databricks PK/FK are informational; OSS Spark
has no constraint DDL, so they are recorded as table properties for
lineage/docs and validated by assertion queries instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LAYERS = ("bronze", "silver", "gold")


def bootstrap(spark: SparkSession, layers=LAYERS) -> None:
    """CREATE DATABASE IF NOT EXISTS per medallion layer."""
    for layer in layers:
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {layer}")


def reset(spark: SparkSession, layers=LAYERS) -> None:
    """DROP DATABASE ... CASCADE (reference 01_Init.py:27-29)."""
    for layer in layers:
        spark.sql(f"DROP DATABASE IF EXISTS {layer} CASCADE")


def save_table(df: DataFrame, name: str,
               constraints: dict[str, str] | None = None) -> None:
    """Managed-table sink: overwrite saveAsTable (reference 12:66).

    ``constraints`` (e.g. {"primary_key": "order_id"}) are stored as
    table properties — informational, like the reference's.
    """
    df.write.mode("overwrite").format("parquet").saveAsTable(name)
    if constraints:
        spark = df.sparkSession
        props = ", ".join(f"'{k}' = '{v}'" for k, v in constraints.items())
        spark.sql(f"ALTER TABLE {name} SET TBLPROPERTIES ({props})")


def validate_fk(spark: SparkSession, fact: str, fact_key: str,
                dim: str, dim_key: str) -> int:
    """FK integrity assertion (anti-join count must be 0) — the OSS
    substitute for the reference's informational FOREIGN KEY DDL."""
    return (spark.table(fact).alias("f")
            .join(spark.table(dim).alias("d"),
                  F.col(f"f.{fact_key}") == F.col(f"d.{dim_key}"), "left_anti")
            .count())


def validate_unique(spark: SparkSession, table: str,
                    key_cols: list[str]) -> int:
    """PRIMARY KEY / UNIQUE integrity assertion: number of key tuples
    that appear more than once (0 = constraint holds) — the OSS
    substitute for the reference's informational PRIMARY KEY DDL
    (reference notebooks/01_Init.py:59,236-239), same pattern as
    ``validate_fk``. One grouped count, map-side combined."""
    return (spark.table(table)
            .groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > 1)
            .count())


def save_table_bucketed(df: DataFrame, name: str, bucket_cols: list[str],
                        num_buckets: int = 32,
                        sort_cols: list[str] | None = None) -> None:
    """Bucketed managed-table sink: the co-located-join path.

    Two tables bucketed into the same ``num_buckets`` on their join key
    hash-partition identically ON DISK, so a join between them needs NO
    exchange — Spark reads bucket i of both sides into the same task.
    At 100 TB this removes the dominant cost of repeated fact<->fact and
    fact<->big-dim joins (e.g. lineitem JOIN orders ON orderkey every
    query): the shuffle is paid once at write time, then amortized over
    every downstream join. OSS Spark's analogue of the reference's
    platform-managed layout (SURVEY.md §4; Databricks handles this with
    liquid clustering).
    """
    w = df.write.mode("overwrite").format("parquet") \
        .bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(name)


def table_checksum(df: DataFrame, cols: list[str]) -> DataFrame:
    """Order-insensitive content checksum of a table — the replica /
    migration verification primitive (does the copy equal the source
    without moving either side?).

    Each row serializes canonically (unit-separator chr(31) concat of
    the given columns, NULLs as a reserved chr(0) sentinel) and hashes
    with the portable md5-60bit; the table digest is the BIT_XOR of row
    hashes plus the row count — commutative/associative, so partition
    order, file layout, and engine never change it, and map-side
    combine makes the whole check one scan + a 1-row exchange. Pass
    only columns with engine-portable string casts (ints / strings /
    dates — serialize money as exact cents first). ANSI mirror:
    ``bit_xor(CAST(concat('0x', substr(md5(row),1,15)) AS BIGINT))``
    over ``concat_ws(chr(31), COALESCE(CAST(c AS VARCHAR), chr(0)), …)``.
    """
    from .operators.dedup import portable_hash60
    row = F.concat_ws(
        chr(31),
        *[F.coalesce(F.col(c).cast("string"), F.lit(chr(0))) for c in cols])
    return (df.select(portable_hash60(row).alias("_h"))
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.expr("bit_xor(_h)").cast("bigint").alias("checksum")))
