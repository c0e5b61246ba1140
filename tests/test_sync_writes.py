"""O(changes) WRITE side for the keyed replica sync (VERDICT r8 #2).

Round 8 fixed the read side (per-commit feed); these tests pin the
write side: a sync commit must never rewrite the whole replica —
partitioned replicas take ONE partition-scoped merge commit (only
touched partitions rewritten, inode-asserted), unpartitioned replicas
land the batch merge-on-read (tombstone + delta files, base dir
untouched).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.operators.cdf import sync_incremental
from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _inodes(d):
    out = {}
    for root, _dirs, fns in os.walk(d):
        for fn in fns:
            if fn.endswith(".parquet"):
                full = os.path.join(root, fn)
                out[os.path.relpath(full, d)] = os.stat(full).st_ino
    return out


def test_partitioned_replica_sync_touches_only_changed_partition(
        spark, tmp_base):
    src = ManagedTable(spark, f"{tmp_base}/src", partition_by=("p",))
    dst = ManagedTable(spark, f"{tmp_base}/dst", partition_by=("p",))
    src.overwrite(spark.createDataFrame(
        [(i, f"k{i}", i % 4) for i in range(40)], "id long, k string, p int"))
    sync_incremental(src, dst, keys=("id",))        # full copy
    v0 = dst.current_version()
    src.update(F.col("id") == 5, {"k": F.lit("K5")})    # touches p=1 only
    sync_incremental(src, dst, keys=("id",))
    assert _rows(dst.read()) == _rows(src.read())
    meta = dst._commit(dst.current_version())
    assert meta["synced_to"] == src.current_version()
    # ONE commit, partition-scoped: only p=1 rewritten
    assert dst.current_version() == v0 + 1
    assert meta["partitions_rewritten"] == ["p=1"]
    # untouched partitions rode in as hardlinks (same inodes)
    old = _inodes(dst._version_dir(v0))
    new = _inodes(dst._version_dir(v0 + 1))
    for rel, ino in old.items():
        if rel.startswith("p=1/"):
            continue
        assert new.get(rel) == ino, f"{rel} was rewritten"


def test_partitioned_replica_sync_handles_partition_moves(
        spark, tmp_base):
    """A key whose partition value changes across SEVERAL source
    commits must have every old location rewritten (the touched set
    derives from the uncollapsed feed INCLUDING preimages)."""
    src = ManagedTable(spark, f"{tmp_base}/src", partition_by=("p",))
    dst = ManagedTable(spark, f"{tmp_base}/dst", partition_by=("p",))
    src.overwrite(spark.createDataFrame(
        [(1, "a", 0), (2, "b", 1), (3, "c", 2)], "id long, k string, p int"))
    sync_incremental(src, dst, keys=("id",))
    src.update(F.col("id") == 1, {"p": F.lit(1)})   # moves 0 -> 1
    src.update(F.col("id") == 1, {"p": F.lit(2)})   # moves 1 -> 2
    sync_incremental(src, dst, keys=("id",))
    assert _rows(dst.read()) == _rows(src.read())
    assert dst.read().filter(
        (F.col("id") == 1) & (F.col("p") != 2)).count() == 0
    touched = set(dst._commit(dst.current_version())
                  ["partitions_rewritten"])
    assert "p=0" in touched     # the ORIGINAL location was rewritten


def test_unpartitioned_replica_sync_lands_merge_on_read(spark, tmp_base):
    src = ManagedTable(spark, f"{tmp_base}/src")
    dst = ManagedTable(spark, f"{tmp_base}/dst")
    src.overwrite(spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "id long, v double"))
    sync_incremental(src, dst, keys=("id",))
    v0 = dst.current_version()
    base_inodes = _inodes(dst._version_dir(v0))
    src.update(F.col("id") == 3, {"v": F.lit(99.0)})
    src.delete(F.col("id") == 7)
    synced = sync_incremental(src, dst, keys=("id",))
    assert synced == src.current_version()
    assert _rows(dst.read()) == _rows(src.read())
    # the sync landed MOR: base files untouched, tombstone + delta
    meta = dst._commit(dst.current_version())
    assert meta.get("tombstones") and meta.get("deltas")
    assert meta["synced_to"] == synced
    assert _inodes(dst._version_dir(v0)) == base_inodes
    assert meta["dir"] == dst._commit(v0)["dir"]
    # maintenance folds the MOR debt; state unchanged
    dst.compact()
    assert _rows(dst.read()) == _rows(src.read())


def test_sync_idempotent_after_partial_crash(spark, tmp_base):
    """Crash between the delete commit and the upsert commit: the mark
    (written with the LAST commit) stays behind, the re-run re-applies
    the same collapsed batch, and last-writer-wins resolution lands on
    the same state."""
    src = ManagedTable(spark, f"{tmp_base}/src")
    dst = ManagedTable(spark, f"{tmp_base}/dst")
    src.overwrite(spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, k string"))
    sync_incremental(src, dst, keys=("id",))
    src.delete(F.col("id") == 2)
    src.update(F.col("id") == 3, {"k": F.lit("C")})
    sync_incremental(src, dst, keys=("id",))
    want = _rows(dst.read())
    # simulate the crash-replay: roll the mark back by re-running the
    # sync from the PRE-sync mark (the worst case re-application)
    from tb_lakehouse_enhanced_spark.operators.cdf import (
        CHANGE_TYPE, apply_changes,  # noqa: F401
    )
    ch = src.table_changes(1, src.current_version(), keys=("id",))
    last = ch.filter(F.col(CHANGE_TYPE) != "update_preimage")
    dels = last.filter(F.col(CHANGE_TYPE) == "delete").select("id")
    ups = last.filter(F.col(CHANGE_TYPE).isin(
        "insert", "update_postimage")).select("id", "k")
    dst.delete_mor_keys(dels, ("id",))
    dst.upsert_mor(ups, key_cols=("id",))
    assert _rows(dst.read()) == want
