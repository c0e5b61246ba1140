"""Blind-append optimistic-concurrency retry (VERDICT r8 #3).

Delta's conflict matrix: an append-only transaction never conflicts
with another commit's file set, so on a lost commit race the append
re-reads the head and re-publishes its batch at the next version —
made safe by round 9's per-writer-unique batch dirs (two concurrent
appenders can never mix files in one dir, so each commit's
``added_files`` names exactly its own batch). Non-commuting commits
(overwrite/DML) keep first-writer-wins and still raise.
"""

from __future__ import annotations

import os
import types

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


def _inject_before_publish(victim: ManagedTable, action) -> None:
    """Run ``action()`` once, right before the victim's next commit
    publish — the deterministic interleave: the other writer wins the
    race by a hair."""
    flag = {"done": False}

    def racing(self, v, meta):
        if not flag["done"]:
            flag["done"] = True
            action()
        return ManagedTable._publish(self, v, meta)

    victim._publish = types.MethodType(racing, victim)


def test_interleaved_blind_appends_both_commit(spark, tmp_base):
    a = ManagedTable(spark, f"{tmp_base}/t")
    a.overwrite(spark.createDataFrame([(1, "base")], "id long, s string"))
    b = ManagedTable(spark, f"{tmp_base}/t")
    _inject_before_publish(a, lambda: b.append(
        spark.createDataFrame([(2, "from-b")], "id long, s string")))
    a.append(spark.createDataFrame([(3, "from-a")], "id long, s string"))
    # both appends committed — b at v1 (won the race), a retried at v2
    assert a.current_version() == 2
    assert _rows(a.read()) == [(1, "base"), (2, "from-b"), (3, "from-a")]
    # each commit's added_files names exactly its OWN batch (no mixing)
    for v in (1, 2):
        meta = a._commit(v)
        assert meta.get("live_base") == v - 1
        assert len(meta["added_files"]) >= 1
    ops = {v: a._commit(v)["op"] for v in (1, 2)}
    assert set(ops.values()) == {"APPEND"}
    # the change feed sees both batches as separate insert commits
    feed = {(r["id"], r["_change_type"], r["_commit_version"])
            for r in a.table_changes(1, 2).collect()}
    assert feed == {(2, "insert", 1), (3, "insert", 2)}


def test_append_retries_across_multiple_lost_races(spark, tmp_base):
    a = ManagedTable(spark, f"{tmp_base}/t")
    a.overwrite(spark.createDataFrame([(0,)], "id long"))
    b = ManagedTable(spark, f"{tmp_base}/t")
    flag = {"n": 0}

    def racing(self, v, meta):
        if flag["n"] < 3:
            flag["n"] += 1
            b.append(spark.createDataFrame([(100 + flag["n"],)], "id long"))
        return ManagedTable._publish(self, v, meta)

    a._publish = types.MethodType(racing, a)
    a.append(spark.createDataFrame([(7,)], "id long"))
    assert a.current_version() == 4
    assert _rows(a.read()) == [(0,), (7,), (101,), (102,), (103,)]


def test_overwrite_losing_to_append_still_raises(spark, tmp_base):
    """Non-commuting commits keep first-writer-wins: an overwrite that
    loses the race aborts (its read snapshot is stale) and the
    winner's state is untouched."""
    a = ManagedTable(spark, f"{tmp_base}/t")
    a.overwrite(spark.createDataFrame([(1,)], "id long"))
    b = ManagedTable(spark, f"{tmp_base}/t")
    _inject_before_publish(a, lambda: b.append(
        spark.createDataFrame([(2,)], "id long")))
    with pytest.raises(ConcurrentWriteError):
        a.overwrite(spark.createDataFrame([(9,)], "id long"))
    assert _rows(a.read()) == [(1,), (2,)]


def test_append_losing_to_mor_commit_rebases(spark, tmp_base):
    """Round 10: a blind append CAN retry on top of a head that picked
    up merge-on-read state mid-race — the rebased batch dir renames to
    the new version, so its rows outrank the carried tombstones/deltas
    by path-parsed sequence (one valid serial order: delete, THEN
    append). Both commits survive; pre-r10 this raised."""
    a = ManagedTable(spark, f"{tmp_base}/t")
    a.overwrite(spark.createDataFrame([(1, "x")], "id long, s string"))
    b = ManagedTable(spark, f"{tmp_base}/t")
    _inject_before_publish(a, lambda: b.delete_mor(
        F.col("id") == 1, key_cols=("id",)))
    a.append(spark.createDataFrame([(1, "y")], "id long, s string"))
    assert a.current_version() == 2
    meta = a._commit(2)
    # the rebased append carries the winner's tombstone forward ...
    assert meta["tombstones"] == a._commit(1)["tombstones"]
    assert meta.get("occ_rebased") is True
    # ... and its own re-appended row outranks it (seq 2 > tomb 1)
    assert _rows(a.read()) == [(1, "y")]
    # time travel still sees the winner's state alone
    assert _rows(a.read(1)) == []

# ---------------- partition-scoped rewrite vs blind append (round 9) ----


def _pdata(spark, rows):
    return spark.createDataFrame(rows, "id long, s string, p int")


def test_update_rebases_over_disjoint_append(spark, tmp_base,
                                              commit_backend):
    """Delta's WriteSerializable rule: a partition-scoped UPDATE that
    loses its commit race to a blind append into an UNTOUCHED
    partition (whose rows don't match the predicate) rebases — the
    interloper's files join the rewrite's live set and both commits
    survive."""
    a = ManagedTable(spark, f"{tmp_base}/t", partition_by=("p",))
    a.overwrite(_pdata(spark, [(1, "x", 0), (2, "y", 1)]))
    b = ManagedTable(spark, f"{tmp_base}/t")
    _inject_before_publish(a, lambda: b.append(
        _pdata(spark, [(9, "z", 2)])))
    a.update(F.col("p") == 0, {"s": F.lit("upd")})
    assert a.current_version() == 2     # b won v1, a rebased to v2
    assert _rows(a.read().select("id", "s", "p")) == [
        (1, "upd", 0), (2, "y", 1), (9, "z", 2)]
    meta = a._commit(2)
    assert meta["op"] == "UPDATE"
    assert meta["partitions_rewritten"] == ["p=0"]
    # the interloper's batch file is part of the rebased live set
    live = a._files_rel(2)
    assert any(r.startswith("p=2/") for r in live)
    # ... via the store's carry — a hardlink (same inode) on POSIX;
    # the object-store backend has no links, so there the carry is a
    # byte-identical copy (the inode assert is hardlink-specific)
    import os as _os
    app = a._commit(1)
    src = _os.path.join(a.path, app["dir"], app["added_files"][0])
    dst = [p for r, p in live.items() if r.startswith("p=2/")][0]
    if commit_backend == "posix":
        assert _os.stat(src).st_ino == _os.stat(dst).st_ino
    else:
        with open(src, "rb") as fs, open(dst, "rb") as fd:
            assert fs.read() == fd.read()


def test_update_losing_to_append_in_touched_partition_raises(
        spark, tmp_base):
    """An append INTO a touched partition is a real conflict (Delta's
    ConcurrentAppendException): the rewrite re-materializes that
    partition from the OLD snapshot, so rebasing would silently drop
    the appended rows."""
    a = ManagedTable(spark, f"{tmp_base}/t", partition_by=("p",))
    a.overwrite(_pdata(spark, [(1, "x", 0), (2, "y", 1)]))
    b = ManagedTable(spark, f"{tmp_base}/t")
    _inject_before_publish(a, lambda: b.append(
        _pdata(spark, [(9, "z", 0)])))
    with pytest.raises(ConcurrentWriteError):
        a.update(F.col("p") == 0, {"s": F.lit("upd")})
    # the winner's append survives untouched
    assert _rows(a.read().select("id", "s", "p")) == [
        (1, "x", 0), (2, "y", 1), (9, "z", 0)]


def test_update_losing_to_predicate_matching_append_raises(
        spark, tmp_base):
    """Even in a DISJOINT partition, appended rows that MATCH the
    UPDATE's predicate are a semantic conflict: serial execution
    (append then update) would have updated them, so rebasing the
    stale rewrite would diverge from any serial order."""
    a = ManagedTable(spark, f"{tmp_base}/t", partition_by=("p",))
    a.overwrite(_pdata(spark, [(1, "x", 0), (2, "y", 1)]))
    b = ManagedTable(spark, f"{tmp_base}/t")
    _inject_before_publish(a, lambda: b.append(
        _pdata(spark, [(9, "x", 2)])))      # s='x' matches in p=2
    with pytest.raises(ConcurrentWriteError):
        a.update(F.col("s") == "x", {"s": F.lit("upd")})
    assert _rows(a.read().select("id", "s", "p")) == [
        (1, "x", 0), (2, "y", 1), (9, "x", 2)]


def test_merge_rebases_over_disjoint_append_but_not_shared_key(
        spark, tmp_base):
    def combine(tgt, src):       # plain keyed upsert
        return tgt.join(src, ["id"], "left_anti").unionByName(src)

    a = ManagedTable(spark, f"{tmp_base}/t", partition_by=("p",))
    a.overwrite(_pdata(spark, [(1, "x", 0), (2, "y", 1)]))
    b = ManagedTable(spark, f"{tmp_base}/t")
    # disjoint key in a disjoint partition: rebase, both survive
    _inject_before_publish(a, lambda: b.append(
        _pdata(spark, [(9, "z", 2)])))
    a.merge_into_generic(_pdata(spark, [(1, "X", 0)]), combine,
                         keys=["id"])
    assert _rows(a.read().select("id", "s", "p")) == [
        (1, "X", 0), (2, "y", 1), (9, "z", 2)]
    # appended row carrying a MERGING key: real conflict, raises
    b2 = ManagedTable(spark, f"{tmp_base}/t")
    _inject_before_publish(a, lambda: b2.append(
        _pdata(spark, [(2, "race", 3)])))
    with pytest.raises(ConcurrentWriteError):
        a.merge_into_generic(_pdata(spark, [(2, "Y", 1)]), combine,
                             keys=["id"])


def test_rebased_update_change_feed_versions_stay_consistent(
        spark, tmp_base):
    """With CDF enabled, a rebased UPDATE's recorded change rows carry
    the REBASED commit version (the cdc dir renames with the commit),
    and the interloper's insert rows its own version."""
    a = ManagedTable(spark, f"{tmp_base}/t", partition_by=("p",))
    a.set_property("delta.enableChangeDataFeed", "true")
    a.overwrite(_pdata(spark, [(1, "x", 0), (2, "y", 1)]))
    b = ManagedTable(spark, f"{tmp_base}/t")
    _inject_before_publish(a, lambda: b.append(
        _pdata(spark, [(9, "z", 2)])))
    a.update(F.col("p") == 0, {"s": F.lit("upd")})
    feed = {(r["id"], r["_change_type"], r["_commit_version"])
            for r in a.table_changes(1, 2).collect()}
    assert feed == {(9, "insert", 1),
                    (1, "update_preimage", 2),
                    (1, "update_postimage", 2)}


def test_rebased_update_mirror_replays_to_table_state(spark, tmp_base):
    """The Delta-log mirror emitted for a REBASED rewrite commit must
    replay (protocol reader) to exactly the table's final state — the
    interloper's adds at its version, the rewrite's remove/add at the
    rebased version."""
    from tb_lakehouse_enhanced_spark.sources.deltaread import read_delta
    a = ManagedTable(spark, f"{tmp_base}/t", partition_by=("p",))
    a.overwrite(_pdata(spark, [(1, "x", 0), (2, "y", 1)]))
    b = ManagedTable(spark, f"{tmp_base}/t")
    _inject_before_publish(a, lambda: b.append(
        _pdata(spark, [(9, "z", 2)])))
    a.update(F.col("p") == 0, {"s": F.lit("upd")})
    got = _rows(read_delta(spark, a.path).select("id", "s", "p"))
    assert got == _rows(a.read().select("id", "s", "p"))
    assert got == [(1, "upd", 0), (2, "y", 1), (9, "z", 2)]


def test_concurrent_copy_into_manifest_stays_complete(
        spark, tmp_base, tmp_path, monkeypatch):
    """Two racing COPY INTOs both commit (blind appends), and the
    manifest reconstruction walks PAST the rebased loser's stale
    cumulative checkpoint — so a later re-COPY of either batch is a
    no-op, never a duplicate ingest."""
    from pyspark.sql import functions as FF

    from tb_lakehouse_enhanced_spark.sqlfront import LakehouseSql

    def write_batch(d, lo, hi):
        spark.range(lo, hi).select(
            FF.col("id").cast("int").alias("k"),
            FF.col("id").cast("string").alias("v")) \
            .coalesce(1).write.mode("overwrite").parquet(d)

    lake = LakehouseSql(spark, f"{tmp_base}/lake")
    lake_b = LakehouseSql(spark, f"{tmp_base}/lake")
    lake.sql("CREATE DATABASE stg")
    lake.sql("CREATE TABLE stg.ing (k INT, v STRING)")
    d1, d2 = str(tmp_path / "b1"), str(tmp_path / "b2")
    write_batch(d1, 0, 10)
    write_batch(d2, 10, 15)
    orig = ManagedTable._publish
    state = {"done": False}

    def racing(self, v, meta):
        if not state["done"] and meta.get("copy_files"):
            state["done"] = True
            lake_b.sql(f"COPY INTO stg.ing FROM '{d2}' "
                       f"FILEFORMAT = PARQUET")
        return orig(self, v, meta)

    monkeypatch.setattr(ManagedTable, "_publish", racing)
    lake.sql(f"COPY INTO stg.ing FROM '{d1}' FILEFORMAT = PARQUET")
    monkeypatch.setattr(ManagedTable, "_publish", orig)
    t = lake.table("stg.ing")
    assert t.read().count() == 15           # both batches landed
    assert t._commit(t.current_version()).get("occ_rebased") is True
    # the manifest reconstruction sees BOTH batches' files
    assert LakehouseSql._copy_manifest(t) == {
        os.path.join(d, f) for d in (d1, d2) for f in os.listdir(d)
        if f.endswith(".parquet")}
    # re-COPY of either batch: manifest no-op, no duplicate rows
    v = t.current_version()
    lake.sql(f"COPY INTO stg.ing FROM '{d1}' FILEFORMAT = PARQUET")
    lake.sql(f"COPY INTO stg.ing FROM '{d2}' FILEFORMAT = PARQUET")
    assert t.current_version() == v and t.read().count() == 15


def test_concurrent_identity_inserts_both_commit_disjoint(
        spark, tmp_base):
    """Round 10 (VERDICT r9 #5): identity ids come from a RESERVED
    slot range (tiny flock-guarded counter, floored at the snapshot's
    high-water mark), so an identity INSERT is a blind append — two
    concurrent identity INSERTs both commit with DISJOINT keys
    (pre-r10 the loser raised ConcurrentWriteError)."""
    from tb_lakehouse_enhanced_spark.sqlfront import LakehouseSql
    lake = LakehouseSql(spark, f"{tmp_base}/lake")
    lake_b = LakehouseSql(spark, f"{tmp_base}/lake")
    lake.sql("CREATE DATABASE d")
    lake.sql("CREATE TABLE d.t (id BIGINT GENERATED BY DEFAULT AS "
             "IDENTITY, v STRING)")
    lake.sql("INSERT INTO d.t (v) VALUES ('seed')")
    orig = ManagedTable._publish
    state = {"done": False}

    def racing(self, v, meta):
        if not state["done"] and meta.get("op") == "INSERT" \
                and self.path.endswith("/d/t"):
            state["done"] = True
            lake_b.sql("INSERT INTO d.t (v) VALUES ('winner')")
        return orig(self, v, meta)

    ManagedTable._publish = racing
    try:
        lake.sql("INSERT INTO d.t (v) VALUES ('loser-no-more')")
    finally:
        ManagedTable._publish = orig
    t = lake.table("d.t")
    rows = {r["v"]: r["id"] for r in t.read().collect()}
    assert set(rows) == {"seed", "winner", "loser-no-more"}
    # all three ids distinct, none re-issued
    assert len(set(rows.values())) == 3
    assert rows["seed"] == 1
    # GENERATED ALWAYS fidelity: explicit inserts still rejected
    lake.sql("CREATE TABLE d.t2 (id BIGINT GENERATED ALWAYS AS "
             "IDENTITY, v STRING)")
    with pytest.raises(Exception, match="ALWAYS"):
        lake.sql("INSERT INTO d.t2 VALUES (5, 'x')")


# ---------------- blind merge-on-read commits vs races (round 9) --------


def test_concurrent_blind_mor_upserts_both_commit(spark, tmp_base):
    """Keyed MOR upserts are BLIND (the batch encodes 'set key K',
    independent of the read snapshot), so like appends they commute:
    both racing writers commit, and the retried loser's delta
    sequences AFTER the winner — last-writer-wins equals commit
    order, one valid serial order."""
    a = ManagedTable(spark, f"{tmp_base}/t")
    a.overwrite(spark.createDataFrame(
        [(1, "base"), (2, "base")], "k long, v string"))
    b = ManagedTable(spark, f"{tmp_base}/t")
    _inject_before_publish(a, lambda: b.upsert_mor(
        spark.createDataFrame([(1, "from-b")], "k long, v string"),
        key_cols=("k",)))
    a.upsert_mor(
        spark.createDataFrame([(1, "from-a"), (3, "new")],
                              "k long, v string"), key_cols=("k",))
    assert a.current_version() == 2
    assert a._commit(2).get("occ_rebased") is True
    rows = {r["k"]: r["v"] for r in a.read().collect()}
    # a committed LAST (v2): its row for k=1 shadows b's (v1)
    assert rows == {1: "from-a", 2: "base", 3: "new"}
    # both delta files ride the head commit, sequence-ordered by name
    assert len(a._commit(2)["deltas"]) == 2


def test_blind_mor_delete_rebases_over_append(spark, tmp_base):
    a = ManagedTable(spark, f"{tmp_base}/t")
    a.overwrite(spark.createDataFrame(
        [(1, "x"), (2, "y")], "k long, v string"))
    b = ManagedTable(spark, f"{tmp_base}/t")
    _inject_before_publish(a, lambda: b.append(
        spark.createDataFrame([(3, "z")], "k long, v string")))
    a.delete_mor_keys(
        spark.createDataFrame([(2,)], "k long"), ("k",))
    rows = {r["k"]: r["v"] for r in a.read().collect()}
    assert rows == {1: "x", 3: "z"}      # append survived, key 2 gone
    assert a.current_version() == 2


def test_update_mor_losing_race_raises(spark, tmp_base):
    """update_mor computes its delta FROM the read snapshot — not
    blind; a silent retry would apply assignments computed on stale
    rows (diverging from every serial order), so it raises."""
    a = ManagedTable(spark, f"{tmp_base}/t")
    a.overwrite(spark.createDataFrame([(1, 10.0)], "k long, v double"))
    b = ManagedTable(spark, f"{tmp_base}/t")
    _inject_before_publish(a, lambda: b.upsert_mor(
        spark.createDataFrame([(1, 100.0)], "k long, v double"),
        key_cols=("k",)))
    with pytest.raises(ConcurrentWriteError):
        a.update_mor(F.col("k") == 1, {"v": F.col("v") + 1},
                     key_cols=("k",))
    rows = {r["k"]: r["v"] for r in a.read().collect()}
    assert rows == {1: 100.0}            # winner intact, no stale +1


def test_blind_mor_losing_to_schema_replace_raises(spark, tmp_base):
    """A racing overwrite that REPLACED the schema underneath makes
    the staged delta unresolvable — raise, don't rebase."""
    a = ManagedTable(spark, f"{tmp_base}/t")
    a.overwrite(spark.createDataFrame([(1, "x")], "k long, v string"))
    b = ManagedTable(spark, f"{tmp_base}/t")
    _inject_before_publish(a, lambda: b.overwrite(
        spark.createDataFrame([(1, "x", 0)], "k long, v string, extra int")))
    with pytest.raises(ConcurrentWriteError):
        a.upsert_mor(
            spark.createDataFrame([(2, "y")], "k long, v string"),
            key_cols=("k",))
    assert a.read().columns == ["k", "v", "extra"]
