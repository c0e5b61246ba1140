"""End-to-end capstone on the OBJECT-STORE commit backend (VERDICT
r12 #5).

The OCC/self-heal/retention/iceberg suites parameterize over both
commit-store backends, but the end-to-end surfaces (the full medallion
pipeline and the reference's verbatim ``01_Init.py`` script) ran
POSIX-only.  This module closes the cross-product: everything here
runs under ``TB_LAKEHOUSE_COMMIT_STORE=objectstore`` — conditional-PUT
commit publication, lease mutexes, copy carries, no flock / O_EXCL /
hardlinks on the protocol path.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.pipeline import (
    PipelineConfig,
    run_pipeline,
)
from tb_lakehouse_enhanced_spark.sqlfront import LakehouseSql

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _objectstore(monkeypatch):
    monkeypatch.setenv("TB_LAKEHOUSE_COMMIT_STORE", "objectstore")


def test_full_pipeline_on_objectstore(spark, tmp_path):
    cfg = PipelineConfig(sf_dir=SF_DIR,
                         base_dir=str(tmp_path / "lake"))
    t = run_pipeline(spark, cfg)
    # silver current rows, gold unknown member, fact FK resolution —
    # the same invariants the POSIX pipeline suite pins
    for name in ("silver.sales_order_header", "silver.customer",
                 "silver.sales_order_detail"):
        assert t[name].filter(
            F.col("_tf_valid_to").isNotNull()).count() == 0
    dim = t["gold.dim_customer"]
    unk = dim.filter(F.col("customer_id") == -9).collect()
    assert len(unk) == 1 and unk[0]["nation_name"] == "N/A"
    fact = t["gold.fact_sales"]
    detail = t["silver.sales_order_detail"]
    assert fact.count() == detail.filter(
        F.col("_tf_valid_to").isNull()).count()
    dim_ids = {r["_tf_id"] for r in dim.collect()}
    fact_fks = {r["customer_key"] for r in
                fact.select("customer_key").distinct().collect()}
    assert fact_fks <= dim_ids
    # rerun is idempotent on this backend too
    t2 = run_pipeline(spark, cfg)
    assert {k: df.count() for k, df in t.items()} \
        == {k: df.count() for k, df in t2.items()}


def _init_sql_cells() -> list[str]:
    """Verbatim %sql cells from the reference's init notebook (the
    same extraction test_sqlfront uses)."""
    text = open("/root/reference/notebooks/01_Init.py").read()
    cells = []
    for cell in text.split("# COMMAND ----------"):
        lines = cell.splitlines()
        if not any(ln.strip().startswith("# MAGIC %sql")
                   for ln in lines):
            continue
        sql = [ln.partition("# MAGIC")[2].removeprefix(" ")
               for ln in lines
               if ln.strip().startswith("# MAGIC")
               and not ln.strip().startswith(("# MAGIC %sql",
                                              "# MAGIC %md"))]
        cells.append("\n".join(sql))
    return cells


def test_verbatim_init_script_on_objectstore(spark, tmp_path):
    lake = LakehouseSql(spark, str(tmp_path / "lake"))
    cells = _init_sql_cells()
    assert len(cells) == 10
    for db in ("bronze", "silver", "gold"):
        lake.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    for cell in cells:
        lake.run_script(cell)
    cal = lake.table("gold.dim_calendar").read()
    assert cal.count() == 10959
    cust = lake.table("gold.dim_customer").read().collect()
    assert len(cust) == 1 and cust[0]["_tf_dim_customer_id"] == -9
    # the lease files cleaned up after themselves: no dangling .lease
    dangling = []
    for root, _dirs, fns in os.walk(str(tmp_path / "lake")):
        dangling += [f for f in fns if f.endswith(".lease")]
    assert not dangling, dangling
