"""End-to-end incremental lakehouse composition: files land → Auto
Loader-style streaming ingest upserts bronze → the materialized gold
aggregate refreshes from the change feed — twice, so every layer is
exercised on its INCREMENTAL path (second run must process only the new
files / only the changed groups), with end-state parity against a plain
batch recomputation. This is the deployment shape the pieces exist for;
the per-piece tests live in test_autoload / test_matview / test_cdc.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.operators.merge import ScdConfig
from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable
from tb_lakehouse_enhanced_spark.sources.matview import MaterializedAggView
from tb_lakehouse_enhanced_spark.streaming.autoload import autoload_into

CFG = ScdConfig(keys=("id",), tracked=("g", "v"))
SCHEMA = "id BIGINT, g STRING, v DOUBLE"


def _land(spark, path, rows):
    spark.createDataFrame(rows, ["id", "g", "v"]).coalesce(1) \
        .write.mode("append").parquet(path)


def _mv_state(mv):
    return {r["g"]: (r["n_rows"], float(r["total_v"]))
            for r in mv.read().collect()}


def _expected(df):
    return {r["g"]: (r["n"], float(r["t"])) for r in
            df.groupBy("g").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("v").cast("decimal(20,2)"))
                .cast("double").alias("t")).collect()}


def test_landing_to_gold_incremental_composition(spark, tmp_base):
    src = f"{tmp_base}/landing"
    bronze = ManagedTable(spark, f"{tmp_base}/bronze")
    ckpt = f"{tmp_base}/ckpt"
    mv = MaterializedAggView(spark, f"{tmp_base}/gold_mv", bronze,
                             keys=("id",), group_cols=("g",),
                             sum_cols={"v": "total_v"})

    # ---- batch 1 lands, flows to gold
    _land(spark, src, [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)])
    autoload_into(spark, src, SCHEMA, bronze, CFG, ckpt)
    mv.refresh()
    assert _mv_state(mv) == _expected(bronze.read())
    assert _mv_state(mv) == {"a": (2, 30.0), "b": (1, 30.0)}
    bronze_v1 = bronze.current_version()
    mv_v1 = mv.table.current_version()

    # ---- quiet rerun: nothing new anywhere — no layer commits
    autoload_into(spark, src, SCHEMA, bronze, CFG, ckpt)
    mv.refresh()
    assert bronze.current_version() == bronze_v1
    assert mv.table.current_version() == mv_v1

    # ---- batch 2: update id=2 (a -> 25), move id=3 to group c, add id=4
    _land(spark, src, [(2, "a", 25.0), (3, "c", 30.0), (4, "b", 5.0)])
    autoload_into(spark, src, SCHEMA, bronze, CFG, ckpt)
    # exactly one new bronze version: only the new file was processed
    assert bronze.current_version() == bronze_v1 + 1
    mv.refresh()

    assert {(r["id"], r["g"], r["v"]) for r in bronze.read().collect()} == \
        {(1, "a", 10.0), (2, "a", 25.0), (3, "c", 30.0), (4, "b", 5.0)}
    assert _mv_state(mv) == _expected(bronze.read())
    assert _mv_state(mv) == {"a": (2, 35.0), "b": (1, 5.0), "c": (1, 30.0)}
    # the view's high-water mark tracked the base exactly
    assert mv.last_synced_version() == bronze.current_version()
