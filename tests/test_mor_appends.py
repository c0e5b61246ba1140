"""O(batch) appends under merge-on-read debt (VERDICT r9 ask #2).

Round 9's append materialized the whole table when the head carried
tombstones/deltas, because appended base rows resolved at sequence 0
and older carried state would shadow/delete them. Round 10 records a
resolution sequence per base row instead — parsed from the append
batch dir's ``v{N}-a`` path, exactly like delta/tombstone sequences —
so an append onto a MOR head writes ONLY its batch's files (Delta's
DV-model cost shape), carries the parent's MOR state forward in
metadata, and its rows outrank that older state at read time.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _snapshot_inodes(path: str) -> dict[str, tuple[int, int]]:
    """{file: (inode, nlink)} for every parquet under ``path``."""
    out = {}
    for root, _dirs, fns in os.walk(path):
        for fn in fns:
            if fn.endswith(".parquet"):
                full = os.path.join(root, fn)
                st = os.stat(full)
                out[full] = (st.st_ino, st.st_nlink)
    return out


def test_append_onto_tombstones_writes_only_batch(spark, tmp_base):
    t = ManagedTable(spark, f"{tmp_base}/t")
    t.overwrite(spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, s string"))
    t.delete_mor(F.col("id") == 2, key_cols=("id",))
    before = _snapshot_inodes(t.path)
    t.append(spark.createDataFrame([(4, "d")], "id long, s string"))
    after = _snapshot_inodes(t.path)
    # every pre-existing file untouched: same inode, STILL nlink == 1
    # (no hardlink forest, no rewrite, no materialize)
    for f, (ino, nlink) in before.items():
        assert after[f] == (ino, nlink) == (before[f][0], 1)
    # the only new parquet files are the batch's, in a v2-a* dir
    new = set(after) - set(before)
    assert new and all(f"{t.path}/v2-a" in f for f in new)
    meta = t._commit(2)
    assert meta["added_files"] and meta["live_base"] == 1
    # carried MOR state rides in the commit metadata
    assert meta["tombstones"] == t._commit(1)["tombstones"]
    assert _rows(t.read()) == [(1, "a"), (3, "c"), (4, "d")]


def test_append_readds_tombstoned_key(spark, tmp_base):
    t = ManagedTable(spark, f"{tmp_base}/t")
    t.overwrite(spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, s string"))
    t.delete_mor(F.col("id") == 1, key_cols=("id",))     # v1
    t.append(spark.createDataFrame([(1, "a2")], "id long, s string"))
    # the re-appended row (seq 2) outranks the v1 tombstone
    assert _rows(t.read()) == [(1, "a2"), (2, "b")]
    # and a NEWER tombstone still deletes it
    t.delete_mor(F.col("id") == 1, key_cols=("id",))     # v3
    assert _rows(t.read()) == [(2, "b")]


def test_append_under_delta_stack_and_upsert_after(spark, tmp_base):
    t = ManagedTable(spark, f"{tmp_base}/t")
    t.overwrite(spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, s string"))
    t.upsert_mor(spark.createDataFrame(
        [(2, "B")], "id long, s string"), ("id",))       # v1 delta
    t.append(spark.createDataFrame([(3, "c")], "id long, s string"))
    assert _rows(t.read()) == [(1, "a"), (2, "B"), (3, "c")]
    # an upsert AFTER the append updates the appended row (seq 3 > 2)
    t.upsert_mor(spark.createDataFrame(
        [(3, "C")], "id long, s string"), ("id",))       # v3 delta
    assert _rows(t.read()) == [(1, "a"), (2, "B"), (3, "C")]
    # compact materializes the resolved state and clears the debt
    t.compact()
    head = t._commit(t.current_version())
    assert not head.get("tombstones") and not head.get("deltas")
    assert _rows(t.read()) == [(1, "a"), (2, "B"), (3, "C")]


def test_delete_after_append_covers_appended_rows(spark, tmp_base):
    t = ManagedTable(spark, f"{tmp_base}/t")
    t.overwrite(spark.createDataFrame([(1, "a")], "id long, s string"))
    t.delete_mor(F.col("id") == 1, key_cols=("id",))     # v1
    t.append(spark.createDataFrame(
        [(5, "e"), (6, "f")], "id long, s string"))      # v2
    t.delete_mor(F.col("id") == 5, key_cols=("id",))     # v3 > seq 2
    assert _rows(t.read()) == [(6, "f")]


def test_append_matches_materializing_semantics_exactly(spark, tmp_base):
    """Differential: the log-native MOR-append read equals what the
    old materialize-everything implementation produced, across a
    stacked tombstone/delta/append/delete interleave."""
    fast = ManagedTable(spark, f"{tmp_base}/fast")
    slow = ManagedTable(spark, f"{tmp_base}/slow")
    base = [(i, f"s{i}") for i in range(8)]
    for t in (fast, slow):
        t.overwrite(spark.createDataFrame(base, "id long, s string"))
    steps = [
        ("del", (2, 3)),
        ("ups", [(4, "S4"), (9, "s9")]),
        ("app", [(10, "s10"), (2, "s2b")]),
        ("del", (9, 10)),
        ("app", [(9, "s9b")]),
        ("ups", [(2, "S2c")]),
    ]
    for kind, arg in steps:
        if kind == "del":
            fast.delete_mor(F.col("id").isin(*arg), key_cols=("id",))
            slow.delete_mor(F.col("id").isin(*arg), key_cols=("id",))
        elif kind == "ups":
            df = spark.createDataFrame(arg, "id long, s string")
            fast.upsert_mor(df, ("id",))
            slow.upsert_mor(df, ("id",))
        else:
            df = spark.createDataFrame(arg, "id long, s string")
            fast.append(df)
            # the old semantics: materialize resolved snapshot + batch
            slow.overwrite(slow.read().unionByName(df))
    assert _rows(fast.read()) == _rows(slow.read())
    # and time travel across the interleave agrees at the end state
    assert _rows(fast.read(fast.current_version())) == _rows(slow.read())


def test_cdf_over_mor_append_serves_batch_as_inserts(spark, tmp_base):
    t = ManagedTable(spark, f"{tmp_base}/t")
    t.overwrite(spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, s string"))
    t.delete_mor(F.col("id") == 1, key_cols=("id",))     # v1
    t.append(spark.createDataFrame([(7, "g")], "id long, s string"))
    feed = {(r["id"], r["_change_type"], r["_commit_version"])
            for r in t.table_changes(2, 2).collect()}
    assert feed == {(7, "insert", 2)}
    # per-commit feed agrees
    one = {(r["id"], r["_change_type"])
           for r in t.commit_changes(2).collect()}
    assert one == {(7, "insert")}
    # the whole range: delete at v1, insert at v2
    both = {(r["id"], r["_change_type"], r["_commit_version"])
            for r in t.table_changes(1, 2).collect()}
    assert both == {(1, "delete", 1), (7, "insert", 2)}


def test_pruned_read_on_mor_append(spark, tmp_base):
    t = ManagedTable(spark, f"{tmp_base}/t")
    t.overwrite(spark.createDataFrame(
        [(i, i * 10) for i in range(1, 9)], "id long, x long"))
    t.analyze(("id",))
    t.delete_mor(F.col("id") == 3, key_cols=("id",))
    t.append(spark.createDataFrame([(3, 999), (20, 200)],
                                   "id long, x long"))
    # pruned point/range reads equal unpruned reads through the
    # seq-aware resolution
    assert _rows(t.read_where("id", 3, 3)) == [(3, 999)]
    assert _rows(t.read_where("id", 1, 4)) == \
        _rows(t.read().filter(F.col("id").between(1, 4)))
    assert _rows(t.read_where("id", 20, 25)) == [(20, 200)]


def test_restore_to_mor_append_version(spark, tmp_base):
    t = ManagedTable(spark, f"{tmp_base}/t")
    t.overwrite(spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, s string"))
    t.delete_mor(F.col("id") == 2, key_cols=("id",))     # v1
    t.append(spark.createDataFrame([(3, "c")], "id long, s string"))  # v2
    want = _rows(t.read())
    t.compact()                                          # v3
    t.append(spark.createDataFrame([(4, "d")], "id long, s string"))  # v4
    t.restore(2)                                         # v5
    assert _rows(t.read()) == want == [(1, "a"), (3, "c")]


def test_partition_scoped_dml_falls_back_when_interleaved(spark, tmp_base):
    """A stable-partitions partition-scoped UPDATE on a table whose
    live set holds appended-after-MOR rows must NOT hardlink them into
    a plain rewrite dir (their sequence would reset to 0 under the
    carried tombstones) — it materializes instead, and the results
    stay exact."""
    t = ManagedTable(spark, f"{tmp_base}/t", partition_by=("p",))
    t.overwrite(spark.createDataFrame(
        [(1, "a", 0), (2, "b", 1)], "id long, s string, p int"))
    t.delete_mor(F.col("id") == 1, key_cols=("id",))     # v1 tombstone
    t.append(spark.createDataFrame(
        [(1, "a2", 0)], "id long, s string, p int"))     # v2 re-add
    assert t._mor_appends_interleaved(2, t._commit(2))
    t.update(F.col("p") == 1, {"s": F.lit("B")},
             stable_partitions=True)
    # the re-added row in the UNTOUCHED partition survived the DML
    assert _rows(t.read().select("id", "s", "p")) == [
        (1, "a2", 0), (2, "B", 1)]
    head = t._commit(t.current_version())
    # fallback materialized: debt purged, no carried state
    assert not head.get("tombstones") and not head.get("deltas")


def test_streaming_source_serves_mor_append_batch(spark, tmp_base):
    from tb_lakehouse_enhanced_spark.sources.tablestream import stream_table
    t = ManagedTable(spark, f"{tmp_base}/t")
    t.overwrite(spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, s string"))
    t.delete_mor(F.col("id") == 1, key_cols=("id",))     # v1
    t.append(spark.createDataFrame([(8, "h")], "id long, s string"))
    out = f"{tmp_base}/out"
    q = (stream_table(spark, t.path, starting_version=2)
         .writeStream.format("parquet")
         .option("path", out)
         .option("checkpointLocation", f"{tmp_base}/ckpt")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert _rows(spark.read.parquet(out)) == [(8, "h")]
