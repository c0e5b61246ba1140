"""CDC consumption: apply_changes + incremental table-to-table sync."""

from __future__ import annotations

from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.operators.cdf import (
    apply_changes, changes_between, sync_incremental,
)
from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable


def _rows(df):
    return {(r["id"], r["k"], r["v"]) for r in df.collect()}


def test_apply_changes_roundtrip(spark):
    """before + changes_between(before, after) == after, for any diff."""
    before = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["id", "k", "v"])
    after = spark.createDataFrame(
        [(1, "a", 11.0), (3, "c", 30.0), (4, "d", 40.0)], ["id", "k", "v"])
    ch = changes_between(before, after, keys=("id",))
    assert _rows(apply_changes(before, ch, keys=("id",))) == _rows(after)


def test_apply_changes_none_target(spark):
    after = spark.createDataFrame([(1, "a", 1.0)], ["id", "k", "v"])
    ch = changes_between(None, after, keys=("id",))
    assert _rows(apply_changes(None, ch, keys=("id",))) == _rows(after)


def test_sync_incremental_tracks_high_water_mark(spark, tmp_base):
    src = ManagedTable(spark, f"{tmp_base}/src")
    dst = ManagedTable(spark, f"{tmp_base}/dst")
    src.overwrite(spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], ["id", "k", "v"]))

    assert sync_incremental(src, dst, keys=("id",)) == 0   # full copy
    assert _rows(dst.read()) == _rows(src.read())

    src.update(F.col("id") == 1, {"v": F.lit(99.0)})       # v1
    src.overwrite(src.read().unionByName(                  # v2: insert id=3
        spark.createDataFrame([(3, "c", 30.0)], ["id", "k", "v"])))
    assert sync_incremental(src, dst, keys=("id",)) == 2
    assert _rows(dst.read()) == _rows(src.read())

    # no-op sync: mark already at head, no new dst version
    v_before = dst.current_version()
    assert sync_incremental(src, dst, keys=("id",)) == 2
    assert dst.current_version() == v_before

    src.delete(F.col("id") == 2)                           # v3
    sync_incremental(src, dst, keys=("id",))
    assert _rows(dst.read()) == _rows(src.read())
    assert dst.history()[0]["synced_to"] == 3


def test_incremental_agg_matches_recompute_and_drops_empty_groups(spark):
    from tb_lakehouse_enhanced_spark.operators.cdf import (
        changes_between, incremental_agg_update)
    before = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)], "k long, g string, v double")
    # group b vanishes entirely; group a: one update, one insert
    after = spark.createDataFrame(
        [(1, "a", 15.0), (2, "a", 20.0), (4, "a", 5.0)], "k long, g string, v double")
    state0 = (before.groupBy("g")
              .agg(F.count(F.lit(1)).alias("n_rows"),
                   F.sum(F.col("v").cast("decimal(28,6)"))
                   .cast("decimal(28,6)").alias("total_v")))
    new = incremental_agg_update(
        state0, changes_between(before, after, keys=("k",)),
        ["g"], {"v": "total_v"})
    rows = {r["g"]: (r["n_rows"], float(r["total_v"])) for r in new.collect()}
    assert rows == {"a": (3, 40.0)}  # b dropped at count 0


def test_incremental_agg_bootstrap_from_insert_feed(spark):
    from tb_lakehouse_enhanced_spark.operators.cdf import (
        changes_between, incremental_agg_update)
    first = spark.createDataFrame([(1, "a", 2.0), (2, "b", 3.0)],
                                  "k long, g string, v double")
    state = incremental_agg_update(
        None, changes_between(None, first), ["g"], {"v": "total_v"})
    rows = {r["g"]: (r["n_rows"], float(r["total_v"])) for r in state.collect()}
    assert rows == {"a": (1, 2.0), "b": (1, 3.0)}
