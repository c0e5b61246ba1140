"""End-to-end medallion pipeline over the sf0.001 testdata."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.pipeline import (
    PipelineConfig, run_pipeline,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    cfg = PipelineConfig(sf_dir=SF_DIR,
                         base_dir=str(tmp_path_factory.mktemp("lake")))
    return cfg, run_pipeline(spark, cfg)


def test_silver_all_current_after_first_load(tables):
    _, t = tables
    for name in ("silver.sales_order_header", "silver.customer",
                 "silver.sales_order_detail"):
        df = t[name]
        assert df.filter(F.col("_tf_valid_to").isNotNull()).count() == 0


def test_gold_dim_customer_has_unknown_member(tables):
    _, t = tables
    dim = t["gold.dim_customer"]
    unk = dim.filter(F.col("customer_id") == -9).collect()
    assert len(unk) == 1 and unk[0]["nation_name"] == "N/A"
    # surrogate keys unique + contiguous from 1
    ids = sorted(r["_tf_id"] for r in dim.collect())
    assert ids == list(range(1, len(ids) + 1))


def test_fact_grain_and_fk_resolution(tables):
    _, t = tables
    fact = t["gold.fact_sales"]
    detail = t["silver.sales_order_detail"]
    assert fact.count() == detail.filter(F.col("_tf_valid_to").isNull()).count()
    # every order resolves -> no unknown date keys; customer keys resolve
    assert fact.filter(F.col("order_date_key") == -9).count() == 0
    dim_ids = {r["_tf_id"] for r in t["gold.dim_customer"].collect()}
    fact_fks = {r["customer_key"] for r in
                fact.select("customer_key").distinct().collect()}
    assert fact_fks <= dim_ids


def test_fact_joins_calendar(tables):
    _, t = tables
    joined = (t["gold.fact_sales"].alias("f")
              .join(t["gold.dim_calendar"].alias("c"),
                    F.col("f.order_date_key") == F.col("c.date_key"),
                    "left_anti"))
    assert joined.count() == 0  # every fact date key exists in the spine


def test_pipeline_rerun_is_idempotent(spark, tables):
    cfg, t = tables
    before = {k: df.count() for k, df in t.items()}
    t2 = run_pipeline(spark, cfg)
    after = {k: df.count() for k, df in t2.items()}
    assert before == after
    assert (t2["silver.sales_order_header"]
            .filter(F.col("_tf_valid_to").isNotNull()).count() == 0)


def test_gold_mv_matches_fact_rollup(tables):
    _, t = tables
    fact, mv = t["gold.fact_sales"], t["gold.mv_sales_by_customer"]
    want = {r["customer_key"]: (r["n"], float(r["s"])) for r in
            fact.groupBy("customer_key")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("net_revenue").cast("decimal(28,6)")).alias("s"))
            .collect()}
    got = {r["customer_key"]: (r["n_lines"], float(r["total_net_revenue"]))
           for r in mv.collect()}
    assert got == want


def test_expectation_gate_blocks_bad_silver_source(spark, tmp_path):
    from tb_lakehouse_enhanced_spark.operators.analytics import ExpectationError
    from tb_lakehouse_enhanced_spark.pipeline import run_bronze, run_silver
    from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable
    cfg = PipelineConfig(sf_dir=SF_DIR, base_dir=str(tmp_path / "lake"))
    run_bronze(spark, cfg)
    # poison a bronze natural key
    orders = ManagedTable(spark, f"{cfg.base_dir}/bronze/orders")
    orders.overwrite(orders.read().withColumn(
        "o_orderkey",
        F.when(F.col("o_custkey") % 50 == 0, F.lit(None)).otherwise(F.col("o_orderkey"))))
    with pytest.raises(ExpectationError):
        run_silver(spark, cfg)


def test_pipeline_metrics_and_retry(spark, tmp_path):
    metrics = {}
    cfg = PipelineConfig(sf_dir=SF_DIR, base_dir=str(tmp_path / "lake2"))
    run_pipeline(spark, cfg, retries=1, metrics=metrics)
    assert set(metrics) == {"run_bronze", "run_silver", "run_gold_dims",
                            "run_gold_fact", "run_gold_mv"}
    assert all(m["attempts"] == 1 and m["seconds"] >= 0 for m in metrics.values())


def test_pipeline_resume_skips_completed_stages(spark, tmp_path):
    """Crash-safe resume: with a batch_id, completed stages are recorded
    in the run ledger and a rerun of the same batch skips them; a mid-DAG
    crash resumes from the failure point."""
    from tb_lakehouse_enhanced_spark import pipeline as P

    cfg = PipelineConfig(sf_dir=SF_DIR, base_dir=str(tmp_path / "lake"))
    # simulate a crash in gold_dims on the first run
    real_gold_dims = P.run_gold_dims
    calls: list[str] = []

    def exploding_gold_dims(spark_, cfg_):
        calls.append("boom")
        raise RuntimeError("simulated crash")

    stages = tuple(exploding_gold_dims if s is P.run_gold_dims else s
                   for s in P.STAGES)
    orig = P.STAGES
    P.STAGES = stages
    try:
        with pytest.raises(RuntimeError):
            run_pipeline(spark, cfg, batch_id="b1")
    finally:
        P.STAGES = orig
    # bronze + silver committed and are in the ledger
    assert P._ledger_read(cfg, "b1") == ["run_bronze", "run_silver"]

    # resume the SAME batch: bronze/silver skip, the rest run
    metrics: dict = {}
    out = run_pipeline(spark, cfg, metrics=metrics, batch_id="b1")
    assert metrics["run_bronze"].get("skipped") is True
    assert metrics["run_silver"].get("skipped") is True
    assert metrics["run_gold_dims"]["attempts"] == 1
    assert out["gold.fact_sales"].count() > 0

    # running the finished batch again is a full no-op
    metrics2: dict = {}
    run_pipeline(spark, cfg, metrics=metrics2, batch_id="b1")
    assert all(v.get("skipped") for v in metrics2.values())

    # a new batch id re-runs everything
    metrics3: dict = {}
    run_pipeline(spark, cfg, metrics=metrics3, batch_id="b2")
    assert all(not v.get("skipped") for v in metrics3.values())
