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
