"""Live JDBC source test against embedded Derby (ships with Spark).

Exercises the prod-shaped ingestion path (reference
12_ETL_Bronze_PySpark.py:61 — but partitioned, unlike the reference's
single-stream pull): write a table over JDBC, read it back whole and as
a bounded partitioned read, and run it through the silver SCD2 merge.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.operators.merge import ScdConfig, scd2_merge
from tb_lakehouse_enhanced_spark.sources.registry import load_jdbc

URL = "jdbc:derby:memory:tb_jdbc_test;create=true"
PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture(scope="module")
def seeded(spark):
    df = spark.range(0, 100).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("grp"),
        F.concat(F.lit("row-"), F.col("id")).alias("name"))
    (df.write.format("jdbc").option("url", URL).option("dbtable", "SRC")
     .options(**PROPS).mode("overwrite").save())
    return df


def test_full_read_roundtrip(spark, seeded):
    got = load_jdbc(spark, URL, "SRC", **PROPS)
    assert got.count() == 100
    assert {r["name"] for r in got.filter("k < 3").collect()} \
        == {"row-0", "row-1", "row-2"}


def test_partitioned_read_covers_all_rows(spark, seeded):
    got = load_jdbc(spark, URL, "SRC", partition_column="k",
                    num_partitions=8, lower_bound=0, upper_bound=100, **PROPS)
    assert got.rdd.getNumPartitions() == 8
    assert got.count() == 100  # range predicates partition, never drop rows
    assert got.agg(F.sum("k")).collect()[0][0] == sum(range(100))


def test_jdbc_feeds_scd2(spark, seeded):
    src = load_jdbc(spark, URL, "SRC", **PROPS) \
        .select("k", "grp", "name")
    state = scd2_merge(None, src, ScdConfig(keys=("k",), tracked=("grp", "name")),
                       "2024-01-01 00:00:00")
    assert state.count() == 100
    assert state.filter(F.col("_tf_valid_to").isNull()).count() == 100


def test_query_pushdown_read(spark, seeded):
    from tb_lakehouse_enhanced_spark.sources.registry import load_jdbc_query
    got = load_jdbc_query(
        spark, URL,
        'SELECT "grp", COUNT(*) AS "n" FROM SRC WHERE "k" < 50 GROUP BY "grp"',
        **PROPS)
    rows = {r["grp"]: r["n"] for r in got.collect()}
    assert sum(rows.values()) == 50  # the aggregate ran source-side
    assert len(rows) == 7


def test_jdbc_sink_roundtrip(spark, seeded):
    from tb_lakehouse_enhanced_spark.sources.registry import load_jdbc, save_jdbc
    src = load_jdbc(spark, URL, "SRC", **PROPS)
    save_jdbc(src, URL, "SINK_COPY", mode="overwrite",
              num_partitions=2, batch_size=25, **PROPS)
    back = load_jdbc(spark, URL, "SINK_COPY", **PROPS)
    assert back.count() == 100
    assert back.agg(F.sum("K")).collect()[0][0] == sum(range(100))
