"""Time-based vacuum retention (VERDICT r8 #8): one ``retain_hours``
horizon consistent across version dirs, cdc dirs, and the mirror
checkpoint — the change feed and streaming source raise their
documented retention-horizon error exactly past it."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable


def _set_commit_ts(t: ManagedTable, v: int, ts: float) -> None:
    """Backdate a commit's timestamp (tests control the clock by
    editing the plain-JSON commit record, not by mocking time)."""
    p = t._commit_file(v)
    with open(p) as f:
        meta = json.load(f)
    meta["ts"] = ts
    with open(p, "w") as f:
        json.dump(meta, f)


@pytest.fixture()
def aged(spark, tmp_base):
    """v0 old overwrite, v1 old recorded-cdc UPDATE, v2 recent
    materializing overwrite, v3 recent append."""
    import time
    t = ManagedTable(spark, f"{tmp_base}/t")
    t.set_property("delta.enableChangeDataFeed", "true")
    t.overwrite(spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, k string"))   # v0
    t.update(F.col("id") == 1, {"k": F.lit("A")})               # v1 + cdc
    t.overwrite(t.read())                                       # v2
    t.append(spark.createDataFrame([(4, "d")], "id long, k string"))  # v3
    now = time.time()
    _set_commit_ts(t, 0, now - 10 * 3600)
    _set_commit_ts(t, 1, now - 10 * 3600)
    _set_commit_ts(t, 2, now - 1 * 3600)
    _set_commit_ts(t, 3, now - 1 * 3600)
    return t


def test_retain_hours_keeps_inside_horizon(spark, aged):
    t = aged
    removed = t.vacuum(retain_last=1, retain_hours=2)
    assert set(removed) == {0, 1}
    # v2 is inside the horizon and stays readable even though
    # retain_last=1 alone would have doomed it
    assert {r["id"] for r in t.read(version=2).collect()} == {1, 2, 3}
    assert {r["id"] for r in t.read().collect()} == {1, 2, 3, 4}
    # the old commit's cdc dir was swept with the same policy
    assert not os.path.isdir(os.path.join(t.path, t._commit(1)["cdc"]))


def test_feed_and_stream_raise_past_horizon(spark, aged, tmp_path):
    t = aged
    t.vacuum(retain_last=1, retain_hours=2)
    with pytest.raises(FileNotFoundError, match="retention horizon"):
        t.table_changes(1, 1).collect()
    # inside the horizon the feed works (v3's append batch)
    feed = {(r["id"], r["_change_type"])
            for r in t.table_changes(3, 3).collect()}
    assert feed == {(4, "insert")}
    # streaming source: starting past the horizon works...
    from tb_lakehouse_enhanced_spark.sources.tablestream import stream_table
    q = (stream_table(spark, t.path, starting_version=3)
         .writeStream.format("memory").queryName("ret_ok")
         .option("checkpointLocation", str(tmp_path / "ck1")).start())
    q.processAllAvailable()
    q.stop()
    assert {r["id"] for r in spark.table("ret_ok").collect()} == {4}
    # ...starting before it raises the documented error
    q = (stream_table(spark, t.path, starting_version=1)
         .writeStream.format("memory").queryName("ret_no")
         .option("checkpointLocation", str(tmp_path / "ck2")).start())
    with pytest.raises(Exception, match="vacuumed"):
        q.processAllAvailable()
    q.stop()


def test_mirror_replay_survives_time_based_vacuum(spark, aged):
    from tb_lakehouse_enhanced_spark.sources.deltaread import read_delta
    t = aged
    t.vacuum(retain_last=1, retain_hours=2)
    assert os.path.isfile(
        os.path.join(t.path, "_delta_log", "_last_checkpoint"))
    got = {(r["id"], r["k"]) for r in read_delta(spark, t.path).collect()}
    assert got == {(1, "A"), (2, "b"), (3, "c"), (4, "d")}


def test_vacuum_retain_hours_sql(spark, tmp_path):
    import time
    from tb_lakehouse_enhanced_spark.sqlfront import LakehouseSql
    lake = LakehouseSql(spark, str(tmp_path / "lake"))
    lake.sql("CREATE TABLE d.t (id INT)")
    lake.sql("INSERT INTO d.t VALUES (1)")
    lake.sql("INSERT OVERWRITE d.t VALUES (2)")
    lake.sql("INSERT OVERWRITE d.t VALUES (3)")
    t = lake.table("d.t")
    now = time.time()
    for v in range(0, 2):
        _set_commit_ts(t, v, now - 9 * 3600)
    lake.sql("VACUUM d.t RETAIN 2 HOURS")
    assert not os.path.isdir(os.path.join(t.path, t._commit(0)["dir"]))
    assert {r["id"] for r in t.read().collect()} == {3}
