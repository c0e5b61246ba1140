"""Materialized aggregate view: incremental refresh == full recompute."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable
from tb_lakehouse_enhanced_spark.sources.matview import MaterializedAggView


def _expected(df):
    return {r["g"]: (r["n"], float(r["s"])) for r in
            df.groupBy("g").agg(F.count(F.lit(1)).alias("n"),
                                F.sum(F.col("v").cast("decimal(28,6)")).alias("s"))
            .collect()}


def _got(mv):
    return {r["g"]: (r["n_rows"], float(r["total_v"])) for r in mv.read().collect()}


def test_mv_incremental_refresh_tracks_base(spark, tmp_base):
    base = ManagedTable(spark, f"{tmp_base}/base")
    base.overwrite(spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0), (4, "b", 1.0)],
        "k long, g string, v double"))

    mv = MaterializedAggView(spark, f"{tmp_base}/mv", base, keys=("k",),
                             group_cols=("g",), sum_cols={"v": "total_v"})
    v1 = mv.refresh()
    assert _got(mv) == _expected(base.read())

    # idempotent: same base version -> no new view commit
    before = mv.table.current_version()
    assert mv.refresh() == v1
    assert mv.table.current_version() == before

    # mutate the base: update one row, delete a group member, insert
    base.update(F.col("k") == 1, {"v": F.lit(15.0)})
    base.delete(F.col("k") == 3)
    base.overwrite(base.read().unionByName(
        spark.createDataFrame([(5, "c", 7.0)], "k long, g string, v double")),
        operation="INSERT")

    mv.refresh()
    assert _got(mv) == _expected(base.read())
    assert mv.last_synced_version() == base.current_version()


def test_mv_group_disappears_on_full_deletion(spark, tmp_base):
    base = ManagedTable(spark, f"{tmp_base}/base2")
    base.overwrite(spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "k long, g string, v double"))
    mv = MaterializedAggView(spark, f"{tmp_base}/mv2", base, keys=("k",),
                             group_cols=("g",), sum_cols={"v": "total_v"})
    mv.refresh()
    base.delete(F.col("g") == "b")
    mv.refresh()
    assert set(r["g"] for r in mv.read().collect()) == {"a"}


def test_refresh_after_append_scans_only_the_batch(spark, tmp_base):
    """The incremental refresh must read the CHANGES, not the base:
    after an append commit, the refresh feed's plan inputs are the
    appended files only (plus the small view state)."""
    from pyspark.sql import functions as F

    from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable
    from tb_lakehouse_enhanced_spark.sources.matview import (
        MaterializedAggView,
    )
    base = ManagedTable(spark, f"{tmp_base}/mv_base", partition_by=("g",))
    base.overwrite(spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], ["id", "g", "v"]))
    mv = MaterializedAggView(spark, f"{tmp_base}/mv_view", base,
                             group_cols=["g"], sum_cols={"v": "total_v"},
                             keys=("id",))
    mv.refresh()
    prev = set(base._files_rel(0))
    base.append(spark.createDataFrame([(3, "a", 30.0)], ["id", "g", "v"]))
    added = {p for r, p in base._files_rel(1).items() if r not in prev}
    feed = base.table_changes(1, 1, keys=("id",))
    scanned = {f.replace("file://", "").replace("file:", "")
               for f in feed.inputFiles()}
    assert scanned == added
    mv.refresh()
    got = {r["g"]: (r["n_rows"], float(r["total_v"]))
           for r in mv.read().collect()}
    assert got == {"a": (2, 40.0), "b": (1, 20.0)}
