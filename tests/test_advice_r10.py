"""Round-10 advisory regression tests.

Each test pins one of the round-9 ADVICE findings:

1. (high) A blind MOR commit rebasing over a winner whose commit file
   exists but whose pointer flip is still in flight must chain its
   ``live_base`` THROUGH the winner (w-1), not at the stale pointer —
   otherwise the winner's appended files vanish from every descendant
   live set.
2. (low) Partition-scoped rewrites stage into writer-UNIQUE dirs
   (``v{N}-r{token}``); an OCC rebase rename can therefore never land
   on a dir another in-flight rewrite already staged (previously an
   uncaught ENOTEMPTY OSError).
3. (low) ``pruned_files`` keeps (never crashes on) folded manifest
   entries that lack the probed column's stat keys — possible when
   ``analyze`` was re-run with a different column set under chained
   delta manifests.
4. (low) ``OPTIMIZE ... WHERE`` survives a partition column whose
   decoded value is None in EVERY live partition
   (``__HIVE_DEFAULT_PARTITION__`` throughout) — explicit string
   schema instead of type inference.
"""

from __future__ import annotations

import os
import re
import types

import pytest
from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.sources.managed import (
    ConcurrentWriteError, ManagedTable,
)
from tb_lakehouse_enhanced_spark.sqlfront import LakehouseSql


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _inject_before_publish(victim: ManagedTable, action) -> None:
    flag = {"done": False}

    def racing(self, v, meta):
        if not flag["done"]:
            flag["done"] = True
            action()
        return ManagedTable._publish(self, v, meta)

    victim._publish = types.MethodType(racing, victim)


# -- 1 (high): rebase chains through an unflipped winner ---------------------

def test_mor_blind_rebase_chains_through_unflipped_winner(spark, tmp_base):
    t = ManagedTable(spark, f"{tmp_base}/t")
    t.overwrite(spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, s string"))
    t.append(spark.createDataFrame([(3, "c")], "id long, s string"))
    # re-open the winner's exact crash window: commit file v1 exists,
    # pointer still at v0 (the flip is "in flight")
    with open(t._pointer, "w") as f:
        f.write("0")
    loser = ManagedTable(spark, f"{tmp_base}/t")
    loser.delete_mor_keys(
        spark.createDataFrame([(2,)], "id long"), ("id",))
    assert loser.current_version() == 2
    meta = loser._commit(2)
    assert meta.get("occ_rebased") is True
    # the fix: live_base = w-1 = 1 (through the winner), never the
    # stale pointer read (0) — the winner's appended row must survive
    assert meta["live_base"] == 1
    assert _rows(loser.read()) == [(1, "a"), (3, "c")]


def test_mor_upsert_rebase_chains_through_unflipped_winner(spark, tmp_base):
    t = ManagedTable(spark, f"{tmp_base}/t")
    t.overwrite(spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, s string"))
    t.append(spark.createDataFrame([(3, "c")], "id long, s string"))
    with open(t._pointer, "w") as f:
        f.write("0")
    loser = ManagedTable(spark, f"{tmp_base}/t")
    loser.upsert_mor(spark.createDataFrame(
        [(2, "B2")], "id long, s string"), ("id",))
    meta = loser._commit(loser.current_version())
    assert meta["live_base"] == loser.current_version() - 1
    assert _rows(loser.read()) == [(1, "a"), (2, "B2"), (3, "c")]


# -- 2 (low): writer-unique rewrite staging dirs ------------------------------

def test_rewrite_rebase_never_lands_on_foreign_staged_dir(spark, tmp_base):
    a = ManagedTable(spark, f"{tmp_base}/t", partition_by=("p",))
    a.overwrite(spark.createDataFrame(
        [(1, 1, "x"), (2, 2, "y")], "id long, p long, s string"))
    b = ManagedTable(spark, f"{tmp_base}/t")

    def interlope():
        # a blind append into an UNTOUCHED partition wins v1 ...
        b.append(spark.createDataFrame(
            [(3, 3, "z")], "id long, p long, s string"))
        # ... while a foreign in-flight rewrite squats on the OLD
        # rebase target name `v2` (non-empty dir)
        os.makedirs(f"{tmp_base}/t/v2", exist_ok=True)
        with open(f"{tmp_base}/t/v2/_inflight", "w") as f:
            f.write("foreign writer's staged bytes")

    _inject_before_publish(a, interlope)
    # pre-fix: os.rename(v1 -> v2) raised an uncaught ENOTEMPTY here
    a.update(F.col("p") == 1, {"s": F.lit("X")})
    assert a.current_version() == 2
    meta = a._commit(2)
    assert re.fullmatch(r"v2-r[0-9a-f]{8}", meta["dir"])
    assert _rows(a.read().select("id", "p", "s")) == [
        (1, 1, "X"), (2, 2, "y"), (3, 3, "z")]
    # the foreign staged dir is untouched
    assert os.path.isfile(f"{tmp_base}/t/v2/_inflight")


def test_concurrent_rewrites_first_writer_wins_cleanly(spark, tmp_base):
    a = ManagedTable(spark, f"{tmp_base}/t", partition_by=("p",))
    a.overwrite(spark.createDataFrame(
        [(1, 1, "x"), (2, 2, "y")], "id long, p long, s string"))
    b = ManagedTable(spark, f"{tmp_base}/t")
    _inject_before_publish(
        a, lambda: b.update(F.col("p") == 1, {"s": F.lit("B")}))
    # a rewrite interloper is a REAL conflict: ConcurrentWriteError,
    # never an OSError, and the winner's bytes stay intact
    with pytest.raises(ConcurrentWriteError):
        a.update(F.col("p") == 2, {"s": F.lit("A")})
    assert _rows(a.read().select("id", "p", "s")) == [
        (1, 1, "B"), (2, 2, "y")]


# -- 3 (low): folded manifests with mismatched stat columns ------------------

def test_pruned_files_keeps_entries_missing_stat_keys(spark, tmp_base):
    t = ManagedTable(spark, f"{tmp_base}/t")
    t.overwrite(spark.createDataFrame(
        [(1, 10), (2, 20)], "a long, b long"))
    t.analyze(("a",))
    t.append(spark.createDataFrame([(3, 30)], "a long, b long"))
    # re-analyze the CHAIN BOTTOM with a different column set: the
    # append's delta manifest (columns [a]) now folds over v0 entries
    # that carry only min__b/max__b
    t.analyze(("b",), version=0)
    kept = t.pruned_files("a", 0, 1)    # pre-fix: KeyError
    assert kept is not None
    # v0's two files have no 'a' stats -> kept (no pruning), and the
    # exact filter still returns the right rows
    assert _rows(t.read_where("a", 3, 3)) == [(3, 30)]
    assert _rows(t.read_where("a", 1, 1)) == [(1, 10)]


# -- 4 (low): OPTIMIZE ... WHERE over all-NULL partition values ---------------

def test_optimize_where_all_null_partition_values(spark, tmp_path):
    lake = LakehouseSql(spark, str(tmp_path / "lake"))
    lake.sql("CREATE TABLE svc.t (id INT, p INT) PARTITIONED BY (p)")
    lake.sql("INSERT INTO svc.t VALUES (1, NULL), (2, NULL)")
    lake.sql("INSERT INTO svc.t VALUES (3, NULL)")
    # pre-fix: createDataFrame inference over [None, None] raised
    # ValueError before the WHERE could even evaluate
    lake.sql("OPTIMIZE svc.t WHERE p IS NULL")
    t = lake.table("svc.t")
    assert _rows(t.read().select("id", "p")) == [
        (1, None), (2, None), (3, None)]
    assert "OPTIMIZE" in t._commit(t.current_version())["op"].upper()
