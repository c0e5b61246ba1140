"""Generic file-format adapters + layout optimization."""

from __future__ import annotations

from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable
from tb_lakehouse_enhanced_spark.sources.registry import load_files, save_files


def test_csv_json_roundtrip(spark, tmp_base):
    df = spark.createDataFrame([(1, "a", 1.5), (2, "b", 2.5)], ["id", "s", "v"])
    save_files(df, f"{tmp_base}/csv", fmt="csv", header="true")
    back_csv = load_files(spark, f"{tmp_base}/csv", fmt="csv",
                          schema=df.schema, header="true")
    assert sorted(map(tuple, back_csv.collect())) == sorted(map(tuple, df.collect()))

    save_files(df, f"{tmp_base}/json", fmt="json")
    back_json = load_files(spark, f"{tmp_base}/json", fmt="json", schema=df.schema)
    assert sorted(map(tuple, back_json.collect())) == sorted(map(tuple, df.collect()))

    # Spark-4 native XML rides the same generic registry
    save_files(df, f"{tmp_base}/xml", fmt="xml",
               rootTag="rows", rowTag="row")
    back_xml = load_files(spark, f"{tmp_base}/xml", fmt="xml",
                          schema=df.schema, rowTag="row")
    assert sorted(map(tuple, back_xml.collect())) == sorted(map(tuple, df.collect()))


def test_partitioned_save(spark, tmp_base):
    df = spark.createDataFrame([(1, "x"), (2, "y"), (3, "x")], ["id", "part"])
    save_files(df, f"{tmp_base}/p", partition_by=("part",))
    back = load_files(spark, f"{tmp_base}/p")
    assert back.count() == 3
    plan = back.filter(F.col("part") == "x")._jdf.queryExecution().toString()
    assert "PartitionFilters" in plan  # pruning available on the layout


def test_optimize_layout_sorts_files(spark, tmp_base):
    mt = ManagedTable(spark, f"{tmp_base}/t")
    mt.overwrite(spark.range(0, 1000).repartition(16)
                 .select(F.col("id"), (F.col("id") % 13).alias("k")))
    v_before = mt.current_version()
    mt.optimize_layout(("id",), target_partitions=4)
    assert mt.current_version() == v_before + 1
    assert mt.read().count() == 1000
    # clustered layout: each output file covers a disjoint id range, so
    # a selective filter reads a subset of files (row-group stats prune)
    got = mt.read().filter("id BETWEEN 10 AND 20").count()
    assert got == 11


def test_dynamic_partition_overwrite_replaces_only_present_partitions(spark, tmp_base):
    from tb_lakehouse_enhanced_spark.sources.registry import load_files, save_files
    full = spark.createDataFrame(
        [(1, "d1", 1.0), (2, "d1", 2.0), (3, "d2", 3.0)], "k long, day string, v double")
    path = f"{tmp_base}/dyn"
    save_files(full, path, partition_by=("day",))
    # reload ONLY day d1 with corrected values
    fix = spark.createDataFrame([(1, "d1", 10.0), (2, "d1", 20.0)],
                                "k long, day string, v double")
    save_files(fix, path, partition_by=("day",), dynamic_overwrite=True)
    got = {r["k"]: r["v"] for r in load_files(spark, path).collect()}
    assert got == {1: 10.0, 2: 20.0, 3: 3.0}  # d2 untouched
