"""Scale soak for the log-native metadata plane (VERDICT r9 ask #7).

Hundreds of append commits with periodic DML: planning must stay FLAT
(checkpoint-bounded commit-file reads per planning call, never
O(commits)), vacuum must reclaim superseded data dirs AND sweep
live-set checkpoints no retained chain replays through, and the table
root must not accumulate unbounded files.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable

N_APPENDS = 200


def test_soak_planning_stays_flat_and_vacuum_reclaims(spark, tmp_base):
    t = ManagedTable(spark, f"{tmp_base}/soak", partition_by=("p",))
    t.overwrite(spark.createDataFrame(
        [(i, i % 4, float(i)) for i in range(16)],
        "id long, p int, v double"))
    # pre-build the batches in one pass so the loop measures COMMIT
    # machinery, not DataFrame construction
    rows_total = 16
    for i in range(N_APPENDS):
        t.append(spark.createDataFrame(
            [(1000 + i, i % 4, float(i))], "id long, p int, v double"))
        rows_total += 1
        if i % 50 == 49:
            # periodic partition-scoped DML keeps the chain realistic
            t.update(F.col("p") == (i % 4),
                     {"v": F.col("v") + 1}, stable_partitions=True)

    head = t.current_version()
    assert head >= N_APPENDS

    # ---- planning cost: commit-file reads per _live_files call are
    # bounded by the checkpoint cadence, NOT by history length -------
    counter = {"n": 0}
    orig = ManagedTable._commit

    def counting(self, v):
        counter["n"] += 1
        return orig(self, v)

    ManagedTable._commit = counting
    try:
        fresh = ManagedTable(spark, t.path, partition_by=("p",))
        fresh._live_files(head)
        reads = counter["n"]
    finally:
        ManagedTable._commit = orig
    assert reads <= ManagedTable.LIVE_CHECKPOINT_EVERY + 4, (
        reads, "planning read O(commits) commit files — the live-set "
               "checkpoint bound is broken")

    # the data is complete and correct after the whole soak
    assert t.read().count() == rows_total

    # ---- vacuum: superseded version dirs AND stale live-set
    # checkpoints are reclaimed; the root stays bounded --------------
    dirs_before = len(os.listdir(t.path))
    cps_before = len(glob.glob(os.path.join(t.path, "_live_v*.json")))
    # each 50-append stretch between materializing DMLs crosses the
    # 32-commit cadence once -> one live-set checkpoint per stretch
    assert cps_before >= N_APPENDS // 50 - 1, cps_before
    t.vacuum(retain_last=1)
    dirs_after = len(os.listdir(t.path))
    cps_after = len(glob.glob(os.path.join(t.path, "_live_v*.json")))
    # every checkpoint below the newest retained chain is swept
    assert cps_after <= 1, cps_after
    # data dirs: only the live chain since the last materialize
    # survives — the last DML ran at commit ~200, so at most ~50
    # append dirs + the materialized root remain, NOT ~200
    live_data_dirs = [d for d in os.listdir(t.path)
                      if os.path.isdir(os.path.join(t.path, d))
                      and not d.startswith("_")]
    assert len(live_data_dirs) < 80, (len(live_data_dirs), dirs_before)
    assert dirs_after < dirs_before
    # commit-log retention (r11): commit JSONs below the newest
    # live-set checkpoint FOLD into one archive segment at checkpoint
    # cadence — the table root's ENTRY COUNT stays bounded as commits
    # grow (pre-r11 the root held one commit file per version forever)
    commit_files = glob.glob(os.path.join(t.path, "_commit_v*.json"))
    assert len(commit_files) <= 2 * ManagedTable.LIVE_CHECKPOINT_EVERY, (
        len(commit_files), "commit files grew O(commits) — retention "
                           "folding is broken")
    assert os.path.isfile(os.path.join(t.path, "_commit_archive.json"))
    assert dirs_after < 4 * ManagedTable.LIVE_CHECKPOINT_EVERY, dirs_after
    # history stays COMPLETE over the archive (every version readable)
    hist = t.history()
    assert len(hist) == t.current_version() + 1
    assert all(h.get("dir") for h in hist)
    assert t.read().count() == rows_total
    # and a fresh reader still plans checkpoint-bounded after vacuum
    counter["n"] = 0
    ManagedTable._commit = counting
    try:
        ManagedTable(spark, t.path, partition_by=("p",))._live_files(
            t.current_version())
    finally:
        ManagedTable._commit = orig
    assert counter["n"] <= ManagedTable.LIVE_CHECKPOINT_EVERY + 4
