"""Live-set CHECKPOINTS for the log-native commit chain.

Round 9 made the commit log the source of truth for the live file set
(an append is its batch files + one metadata record). This file pins
the cost shape of REPLAYING that log at production chain lengths: a
year of daily ``INSERT INTO`` batches is ~365 chained commits, and a
streaming ``COPY INTO`` loop can produce thousands. Replay must stay
O(K) metadata reads per planning call (Delta's checkpoint contract —
delta-io PROTOCOL.md persists a full-state checkpoint every N commits
so readers never replay the whole log) and must be ITERATIVE — a
recursive walk dies at Python's recursion limit around chain depth
1000, which a real ingest pipeline reaches in one day of 5-minute
micro-batches.
"""

from __future__ import annotations

import json
import os
import sys

import pytest
from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable
from tb_lakehouse_enhanced_spark.sources import tablestream


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 3).alias("v"))


def test_checkpoint_written_every_k_and_bounds_replay(
        spark, tmp_base, monkeypatch):
    monkeypatch.setattr(ManagedTable, "LIVE_CHECKPOINT_EVERY", 4)
    t = ManagedTable(spark, os.path.join(tmp_base, "t"))
    t.overwrite(_batch(spark, 0, 10))
    for i in range(10):
        t.append(_batch(spark, 10 + 5 * i, 15 + 5 * i))
    # chain above v0 grows 1 per append; checkpoints land at depth 4:
    # v4 (chain v1..v4) and v8 (chain v5..v8 above the v4 checkpoint)
    assert os.path.isfile(t._live_checkpoint_file(4))
    assert os.path.isfile(t._live_checkpoint_file(8))
    assert not os.path.isfile(t._live_checkpoint_file(6))
    # replay depth from HEAD is bounded by K, not by total history
    assert t._chain_depth(t.current_version(), 1000) <= 4
    # checkpoint content == full replay at that version
    with open(t._live_checkpoint_file(8)) as f:
        cp = json.load(f)
    assert cp["root"] == "v0"
    assert sorted(cp["files"]) == sorted(t._live_files(8))
    # reads through the checkpointed chain stay exact
    assert t.read().count() == 60
    assert t.read().agg(F.sum("v")).collect()[0][0] == \
        sum(3 * i for i in range(60))
    # time travel below / at / above the checkpoint versions
    assert t.read(version=3).count() == 25
    assert t.read(version=4).count() == 30
    assert t.read(version=9).count() == 55


def test_replay_is_iterative_never_recursion_bound(spark, tmp_base):
    """A 1,500-deep chain must replay fine — pinned WITHOUT 1,500
    Spark writes by hand-extending the commit log with empty-batch
    append metas (shape-identical to what ``append`` publishes)."""
    t = ManagedTable(spark, os.path.join(tmp_base, "deep"))
    t.overwrite(_batch(spark, 0, 10))
    t.append(_batch(spark, 10, 20))
    deep = 1500
    for v in range(2, deep + 1):
        with open(t._commit_file(v), "w") as f:
            json.dump({"version": v, "dir": f"v{v}-a0", "op": "APPEND",
                       "ts": None, "added_files": [],
                       "live_base": v - 1}, f)
    with open(t._pointer, "w") as f:
        f.write(str(deep))
    limit = sys.getrecursionlimit()
    try:
        sys.setrecursionlimit(200)   # far below the chain depth
        assert t._live_files(deep) == t._live_files(1)
        assert t._materialized_root(deep) == "v0"
    finally:
        sys.setrecursionlimit(limit)
    assert t.read().count() == 20


def test_vacuum_keeps_reachable_checkpoints_sweeps_orphaned(
        spark, tmp_base, monkeypatch):
    monkeypatch.setattr(ManagedTable, "LIVE_CHECKPOINT_EVERY", 3)
    t = ManagedTable(spark, os.path.join(tmp_base, "t"))
    t.overwrite(_batch(spark, 0, 10))
    for i in range(7):                      # checkpoints at v3 and v6
        t.append(_batch(spark, 10 + 5 * i, 15 + 5 * i))
    assert os.path.isfile(t._live_checkpoint_file(3))
    assert os.path.isfile(t._live_checkpoint_file(6))
    before = t.read().orderBy("id").collect()
    # a materializing commit starts a fresh chain; old checkpoints are
    # only reachable through RETAINED old versions
    t.overwrite(t.read().withColumn("v", F.col("v") + 1))
    t.append(_batch(spark, 100, 105))
    t.vacuum(retain_last=2)                 # keeps v8 (overwrite) + v9
    # neither retained version replays through v3/v6 — both swept
    assert not os.path.isfile(t._live_checkpoint_file(3))
    assert not os.path.isfile(t._live_checkpoint_file(6))
    assert t.read().count() == 50
    # retained-chain case: checkpoints on the live chain survive vacuum
    t2 = ManagedTable(spark, os.path.join(tmp_base, "t2"))
    t2.overwrite(_batch(spark, 0, 10))
    for i in range(4):
        t2.append(_batch(spark, 10 + 5 * i, 15 + 5 * i))
    assert os.path.isfile(t2._live_checkpoint_file(3))
    t2.vacuum(retain_last=1)                # head chains through v3's cp
    assert os.path.isfile(t2._live_checkpoint_file(3))
    assert t2.read().count() == 30
    del before


def test_partitioned_reads_and_prune_across_checkpoint(
        spark, tmp_base, monkeypatch):
    monkeypatch.setattr(ManagedTable, "LIVE_CHECKPOINT_EVERY", 2)
    t = ManagedTable(spark, os.path.join(tmp_base, "p"),
                     partition_by=["k"])
    t.overwrite(spark.range(10).select(
        F.col("id"), (F.col("id") % 2).alias("k")))
    for i in range(5):
        t.append(spark.range(10 + 4 * i, 14 + 4 * i).select(
            F.col("id"), (F.col("id") % 2).alias("k")))
    assert os.path.isfile(t._live_checkpoint_file(2))
    df = t.read()
    assert df.count() == 30
    # partition values re-attach correctly from checkpointed paths
    got = {r["k"] for r in df.select("k").distinct().collect()}
    assert got == {0, 1}
    assert df.filter(F.col("k") == 1).count() == 15


def test_tablestream_files_rel_parity_at_checkpoint(
        spark, tmp_base, monkeypatch):
    """The streaming source's session-free replay must resolve the
    same live set through a checkpoint as ManagedTable does (keys are
    version-dir-relative there — owning-dir prefix stripped)."""
    monkeypatch.setattr(ManagedTable, "LIVE_CHECKPOINT_EVERY", 2)
    t = ManagedTable(spark, os.path.join(tmp_base, "s"))
    t.overwrite(_batch(spark, 0, 10))
    for i in range(4):
        t.append(_batch(spark, 10 + 5 * i, 15 + 5 * i))
    v = t.current_version()
    assert os.path.isfile(t._live_checkpoint_file(2))
    managed = {rel.split("/", 1)[1]: full
               for rel, full in t._live_files(v).items()}
    streamed = tablestream._files_rel(
        t.path, t._commit(v), partitioned=False)
    assert streamed == managed


def test_repair_orphan_commit_clears_its_checkpoint(spark, tmp_base):
    t = ManagedTable(spark, os.path.join(tmp_base, "o"))
    t.overwrite(_batch(spark, 0, 10))
    v = t.current_version() + 1
    # simulate a crashed writer: commit file exists, pointer not moved
    with open(t._commit_file(v), "w") as f:
        json.dump({"version": v, "dir": f"v{v}-adead", "op": "APPEND",
                   "ts": None, "added_files": [], "live_base": v - 1}, f)
    with open(t._live_checkpoint_file(v), "w") as f:
        json.dump({"version": v, "root": "v0", "files": []}, f)
    assert t.repair_orphan_commit() == v
    assert not os.path.isfile(t._live_checkpoint_file(v))
    assert t.read().count() == 10


def test_vacuum_collects_aged_orphan_dirs_only(spark, tmp_base):
    """An aborted writer's staged dir (referenced by NO commit) is
    reclaimed by vacuum once older than orphan_hours; a fresh one —
    indistinguishable from an in-flight writer's batch — survives.
    Dirs a commit references are swept by the log rules regardless of
    age."""
    import time as _time
    t = ManagedTable(spark, os.path.join(tmp_base, "t"))
    t.overwrite(_batch(spark, 0, 10))
    t.append(_batch(spark, 10, 20))
    # fabricate aborted-writer leftovers: a staged append batch dir, a
    # staged MOR tombstone, never committed
    old_dir = os.path.join(t.path, "v9-adeadbee")
    os.makedirs(old_dir)
    with open(os.path.join(old_dir, "part-0.parquet"), "wb") as f:
        f.write(b"x")
    old_tomb = os.path.join(t.path, "tomb_v9-mdeadbee")
    os.makedirs(old_tomb)
    fresh_dir = os.path.join(t.path, "v9-afresh00")
    os.makedirs(fresh_dir)
    stale = _time.time() - 48 * 3600
    os.utime(old_dir, (stale, stale))
    os.utime(old_tomb, (stale, stale))
    t.vacuum(retain_last=10, orphan_hours=24.0)
    assert not os.path.isdir(old_dir)        # aged orphan: collected
    assert not os.path.isdir(old_tomb)
    assert os.path.isdir(fresh_dir)          # maybe in-flight: kept
    assert t.read().count() == 20            # live data untouched
