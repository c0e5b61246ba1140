"""Incremental file ingestion: only new files are processed per run."""

from __future__ import annotations

from tb_lakehouse_enhanced_spark.operators.merge import ScdConfig
from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable
from tb_lakehouse_enhanced_spark.streaming.autoload import autoload_into

CFG = ScdConfig(keys=("id",), tracked=("v",))


def _land(spark, path, rows):
    spark.createDataFrame(rows, ["id", "v"]).coalesce(1) \
        .write.mode("append").parquet(path)


def test_autoload_ingests_only_new_files(spark, tmp_base):
    src = f"{tmp_base}/landing"
    table = ManagedTable(spark, f"{tmp_base}/bronze")
    ckpt = f"{tmp_base}/ckpt"
    schema = "id BIGINT, v BIGINT"

    _land(spark, src, [(1, 10), (2, 20)])
    autoload_into(spark, src, schema, table, CFG, ckpt)
    assert {(r["id"], r["v"]) for r in table.read().collect()} == {(1, 10), (2, 20)}
    v_after_first = table.current_version()

    # second run with no new files: no new micro-batch, no new version
    autoload_into(spark, src, schema, table, CFG, ckpt)
    assert table.current_version() == v_after_first

    # land one new file: only it is processed (update id=2, insert id=3)
    _land(spark, src, [(2, 21), (3, 30)])
    autoload_into(spark, src, schema, table, CFG, ckpt)
    assert {(r["id"], r["v"]) for r in table.read().collect()} == \
        {(1, 10), (2, 21), (3, 30)}
