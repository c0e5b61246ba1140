"""Physical-plan quality gates (the 100 TB design checks, SURVEY.md §4).

These assert the *shape* of the executed plan, not its output: filters
reach the parquet scan, projections prune the read schema, dimension
joins broadcast instead of shuffling, nothing degenerates into a
cartesian product, and the hot path stays inside whole-stage codegen.
A regression here is a scale bug even when results stay correct.
"""

from __future__ import annotations

import pytest

from tb_lakehouse_enhanced_spark.plans.queries import SPARK_QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _executed(df) -> str:
    df.write.format("noop").mode("overwrite").save()  # finalize AQE plan
    return df._jdf.queryExecution().executedPlan().toString()


def _full(df) -> str:
    return df._jdf.queryExecution().toString()


def test_scan_pushes_filters_and_prunes_columns(spark):
    df = SPARK_QUERIES["scan_source"](spark, SF_DIR)
    plan = _full(df)
    assert "PushedFilters: [IsNotNull(l_quantity)" in plan
    assert "GreaterThan(l_quantity,30.0)" in plan
    # projection pruning: untouched columns never leave the scan
    assert "l_partkey" not in plan.split("ReadSchema")[-1]


def test_star_joins_broadcast_not_shuffle(spark):
    for name in ("star_agg_sales_by_geo", "fact_projection", "join_dim_lookup"):
        plan = _executed(SPARK_QUERIES[name](spark, SF_DIR))
        assert plan.count("BroadcastHashJoin") >= 1, name
        assert "SortMergeJoin" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_hot_path_is_whole_stage_codegen(spark):
    import contextlib
    import io
    # AQE wraps the plan until runtime, hiding codegen subtrees from
    # explain; disable it just for the inspection
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = SPARK_QUERIES["star_agg_sales_by_geo"](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="codegen")
        out = buf.getvalue()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "WholeStageCodegen subtrees" in out
    assert "Found 0 WholeStageCodegen" not in out


def test_merge_is_single_shuffle_join(spark):
    # the SCD2 merge plans one join of current-vs-source, not N passes
    plan = _executed(SPARK_QUERIES["scd2_merge_state"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") \
        + plan.count("BroadcastHashJoin") >= 1


def test_semi_anti_plan_shapes(spark):
    semi = _executed(SPARK_QUERIES["join_semi"](spark, SF_DIR))
    anti = _executed(SPARK_QUERIES["join_anti"](spark, SF_DIR))
    assert "LeftSemi" in semi and "LeftAnti" in anti
