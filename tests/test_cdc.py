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


# -- commit-log-driven CDF (ManagedTable.commit_changes / table_changes) ----

def _feed(df):
    return {(r["id"], r["k"], r["v"], r["_change_type"],
             r["_commit_version"]) for r in df.collect()}


def _mk_part_table(spark, tmp_base, name="t"):
    t = ManagedTable(spark, f"{tmp_base}/{name}", partition_by=("k",))
    t.overwrite(spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0), (4, "b", 40.0)],
        ["id", "k", "v"]))                                  # v0
    return t


def test_table_changes_per_commit_versions_and_types(spark, tmp_base):
    t = _mk_part_table(spark, tmp_base)
    t.append(spark.createDataFrame([(5, "c", 50.0)], ["id", "k", "v"]))  # v1
    t.update(F.col("id") == 1, {"v": F.lit(11.0)})                       # v2
    t.delete(F.col("id") == 3)                                           # v3

    feed = _feed(t.table_changes(0, 3, keys=("id",)))
    assert feed == {
        (1, "a", 10.0, "insert", 0), (2, "a", 20.0, "insert", 0),
        (3, "b", 30.0, "insert", 0), (4, "b", 40.0, "insert", 0),
        (5, "c", 50.0, "insert", 1),
        (1, "a", 10.0, "update_preimage", 2),
        (1, "a", 11.0, "update_postimage", 2),
        (3, "b", 30.0, "delete", 3),
    }


def test_table_changes_sees_intermediate_history(spark, tmp_base):
    """An insert-then-delete inside the range is invisible to the
    endpoint diff (changes) but present in the per-commit feed —
    the Delta table_changes semantic difference."""
    t = _mk_part_table(spark, tmp_base)
    t.append(spark.createDataFrame([(9, "a", 90.0)], ["id", "k", "v"]))  # v1
    t.delete(F.col("id") == 9)                                           # v2

    endpoint = t.changes(0, 2, keys=("id",))
    assert endpoint.count() == 0
    feed = _feed(t.table_changes(1, 2, keys=("id",)))
    assert feed == {(9, "a", 90.0, "insert", 1),
                    (9, "a", 90.0, "delete", 2)}


def test_commit_changes_append_reads_only_the_batch_files(spark, tmp_base):
    """O(batch) gate: the append commit's change plan must scan ONLY
    the files the commit added — never the hardlinked existing data."""
    t = _mk_part_table(spark, tmp_base)
    prev = set(t._files_rel(0))
    t.append(spark.createDataFrame([(5, "c", 50.0), (6, "a", 60.0)],
                                   ["id", "k", "v"]))                    # v1
    added = {p for r, p in t._files_rel(1).items() if r not in prev}
    scanned = set(t.commit_changes(1, keys=("id",)).inputFiles())
    scanned = {f.replace("file://", "").replace("file:", "") for f in scanned}
    assert scanned == added
    assert not any("/v0/" in f for f in scanned)


def test_commit_changes_partial_rewrite_scans_touched_partitions_only(
        spark, tmp_base):
    t = _mk_part_table(spark, tmp_base)
    t.update(F.col("id") == 3, {"v": F.lit(33.0)})          # v1 touches k=b
    scanned = {f.replace("file://", "").replace("file:", "")
               for f in t.commit_changes(1, keys=("id",)).inputFiles()}
    assert scanned, "diff plan must read the touched files"
    assert all("k=b" in f for f in scanned), scanned
    assert _feed(t.commit_changes(1, keys=("id",)).withColumn(
        "_commit_version", F.lit(1).cast("bigint"))) == {
        (3, "b", 30.0, "update_preimage", 1),
        (3, "b", 33.0, "update_postimage", 1)}


def test_commit_changes_optimize_and_column_map_are_empty_at_zero_read(
        spark, tmp_base):
    t = _mk_part_table(spark, tmp_base)
    t.compact(target_partitions=2)                          # v1 OPTIMIZE
    ch = t.commit_changes(1, keys=("id",))
    assert ch.count() == 0 and ch.inputFiles() == []
    cmap = t.identity_column_map() + [[None, "extra", "int"]]
    t.evolve_schema(cmap, "ALTER TABLE t ADD COLUMN extra")  # v2 map-only
    ch2 = t.commit_changes(2, keys=("id",))
    assert ch2.count() == 0 and ch2.inputFiles() == []
    assert "extra" in ch2.columns


def test_commit_changes_mor_upsert_and_tombstone(spark, tmp_base):
    t = ManagedTable(spark, f"{tmp_base}/mor")
    t.overwrite(spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], ["id", "k", "v"]))           # v0
    t.upsert_mor(spark.createDataFrame(
        [(1, "a", 11.0), (3, "c", 30.0)], ["id", "k", "v"]),
        key_cols=("id",))                                              # v1
    assert _feed(t.table_changes(1, 1)) == {
        (1, "a", 10.0, "update_preimage", 1),
        (1, "a", 11.0, "update_postimage", 1),
        (3, "c", 30.0, "insert", 1)}
    t.delete_mor(F.col("id") == 2, key_cols=("id",))                   # v2
    assert _feed(t.table_changes(2, 2)) == {(2, "b", 20.0, "delete", 2)}
    # materializing commit: resolved endpoint diff, no phantom changes
    t.compact()                                                        # v3
    assert t.commit_changes(3, keys=("id",)).count() == 0


def test_table_changes_fold_reproduces_state(spark, tmp_base):
    """apply_changes over the per-commit feed, folded in commit order,
    reproduces the final snapshot exactly — the consumer contract."""
    from tb_lakehouse_enhanced_spark.operators.cdf import apply_changes
    t = _mk_part_table(spark, tmp_base)
    t.append(spark.createDataFrame([(5, "c", 50.0)], ["id", "k", "v"]))
    t.update(F.col("id") < 3, {"v": F.col("v") + 1})
    t.delete(F.col("id") == 4)
    t.upsert_mor(spark.createDataFrame([(6, "d", 60.0)], ["id", "k", "v"]),
                 key_cols=("id",))
    feed = t.table_changes(0, t.current_version(), keys=("id",))
    state = None
    for v in range(0, t.current_version() + 1):
        batch = feed.filter(F.col("_commit_version") == v) \
            .drop("_commit_version")
        state = apply_changes(state, batch, keys=("id",))
    assert _rows(state) == _rows(t.read())


def test_table_changes_across_schema_evolution_nulls_new_column(
        spark, tmp_base):
    t = ManagedTable(spark, f"{tmp_base}/evo")
    t.overwrite(spark.createDataFrame([(1, "a", 1.0)], ["id", "k", "v"]))
    t.evolve_schema(t.identity_column_map() + [[None, "w", "double"]],
                    "ADD COLUMN w")                                    # v1
    t.overwrite(spark.createDataFrame([(1, "a", 1.0, 9.9), (2, "b", 2.0, 8.8)],
                                      ["id", "k", "v", "w"]))          # v2
    rows = {(r["id"], r["w"], r["_change_type"], r["_commit_version"])
            for r in t.table_changes(0, 2, keys=("id",)).collect()}
    # v0's insert predates the column: NULL under the end schema; the
    # materializing v2 sees id=1 change w NULL->9.9 (resolved endpoint
    # diff across the map boundary) and id=2 arrive
    assert rows == {(1, None, "insert", 0),
                    (1, None, "update_preimage", 2),
                    (1, 9.9, "update_postimage", 2),
                    (2, 8.8, "insert", 2)}


# -- write-time CDC recording (delta.enableChangeDataFeed parity) ------------

def test_cdf_enabled_records_and_serves_cdc(spark, tmp_base):
    """With the table property set, UPDATE/DELETE record their change
    rows at commit time and the feed serves them DIRECTLY — the change
    plan's inputs are the cdc files only, never the data dirs."""
    t = _mk_part_table(spark, tmp_base)
    t.set_property("delta.enableChangeDataFeed", "true")
    t.update(F.col("id") == 1, {"v": F.lit(11.0)})                   # v1
    t.delete(F.col("id") == 3)                                       # v2
    assert t._commit(1).get("cdc") == "cdc_v1"
    assert t._commit(2).get("cdc") == "cdc_v2"
    for v in (1, 2):
        scanned = {f.replace("file://", "").replace("file:", "")
                   for f in t.commit_changes(v).inputFiles()}
        assert scanned and all(f"/cdc_v{v}/" in f for f in scanned), scanned
    assert _feed(t.table_changes(1, 2, keys=("id",))) == {
        (1, "a", 10.0, "update_preimage", 1),
        (1, "a", 11.0, "update_postimage", 1),
        (3, "b", 30.0, "delete", 2)}


def test_cdf_recorded_equals_computed(spark, tmp_base):
    """The recorded feed is row-identical to the computed diff of a
    twin table taking the same DML without the property."""
    a = _mk_part_table(spark, tmp_base, "a")
    b = _mk_part_table(spark, tmp_base, "b")
    a.set_property("enableChangeDataFeed", "true")
    for t in (a, b):
        t.update(F.col("id") <= 2, {"v": F.col("v") * 2})
        t.delete(F.col("id") == 4)
        # a no-op assignment emits NO change rows on either path
        t.update(F.col("id") == 3, {"v": F.col("v")})
    assert a._commit(3).get("cdc") and not b._commit(1).get("cdc")
    fa = _feed(a.table_changes(1, 3, keys=("id",)))
    fb = _feed(b.table_changes(1, 3, keys=("id",)))
    assert fa == fb
    assert not any(cv == 3 for *_, cv in fa)  # no-op update: empty


def test_cdf_sql_statement_path_and_tblproperties(spark, tmp_path):
    """ALTER TABLE ... SET TBLPROPERTIES enables recording through the
    SQL surface, including the subquery-DML route."""
    from tb_lakehouse_enhanced_spark.sqlfront import LakehouseSql
    lake = LakehouseSql(spark, str(tmp_path / "lake"))
    lake.sql("CREATE SCHEMA IF NOT EXISTS d")
    lake.sql("CREATE TABLE d.t (id BIGINT PRIMARY KEY, grp STRING, "
             "v BIGINT)")
    lake.sql("ALTER TABLE d.t SET TBLPROPERTIES "
             "('delta.enableChangeDataFeed' = 'true')")
    lake.sql("INSERT INTO d.t VALUES (1, 'x', 10), (2, 'y', 20)")    # v1
    lake.sql("UPDATE d.t SET v = 11 WHERE id = 1")                   # v2
    lake.sql("DELETE FROM d.t WHERE id IN (SELECT id FROM d.t "
             "WHERE v >= 20)")                                       # v3
    t = lake.table("d.t")
    assert t._commit(2).get("cdc") and t._commit(3).get("cdc")
    rows = {(r["id"], r["v"], r["_change_type"], r["_commit_version"])
            for r in lake.sql(
                "SELECT * FROM table_changes('d.t', 2, 3)").collect()}
    assert rows == {(1, 10, "update_preimage", 2),
                    (1, 11, "update_postimage", 2),
                    (2, 20, "delete", 3)}


def test_cdf_vacuum_sweeps_unreferenced_cdc(spark, tmp_base):
    import os
    t = _mk_part_table(spark, tmp_base)
    t.set_property("enableChangeDataFeed", "true")
    t.update(F.col("id") == 1, {"v": F.lit(11.0)})                   # v1
    t.update(F.col("id") == 2, {"v": F.lit(22.0)})                   # v2
    t.update(F.col("id") == 3, {"v": F.lit(33.0)})                   # v3
    t.vacuum(retain_last=2)   # v0, v1 data gone
    assert not os.path.isdir(f"{t.path}/cdc_v1")
    assert os.path.isdir(f"{t.path}/cdc_v2")
    assert os.path.isdir(f"{t.path}/cdc_v3")
    assert _feed(t.table_changes(2, 3, keys=("id",))) == {
        (2, "a", 20.0, "update_preimage", 2),
        (2, "a", 22.0, "update_postimage", 2),
        (3, "b", 30.0, "update_preimage", 3),
        (3, "b", 33.0, "update_postimage", 3)}


# -- one-scan fast path for long ranges ---------------------------------------

def test_table_changes_long_range_is_one_scan(spark, tmp_base):
    """K append commits must NOT build a K-way union lineage: all
    insert files fold into ONE multi-path scan with _commit_version
    parsed from the path (and recorded cdc files into one more)."""
    t = _mk_part_table(spark, tmp_base)
    for i in range(8):
        t.append(spark.createDataFrame(
            [(100 + i, "a", float(i))], ["id", "k", "v"]))     # v1..v8
    feed = t.table_changes(0, 8, keys=("id",))
    plan = feed._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Union") <= 1, plan[:2000]
    got = _feed(feed)
    per_commit = set()
    for v in range(0, 9):
        per_commit |= _feed(t.commit_changes(v, keys=("id",)).withColumn(
            "_commit_version", F.lit(v).cast("bigint")))
    assert got == per_commit
    assert {cv for *_, cv in got} == set(range(0, 9))


def test_table_changes_fast_path_mixed_commit_kinds(spark, tmp_base):
    """Appends + recorded cdc + a diff-requiring overwrite + OPTIMIZE
    in one range: kinds route to their scans, versions stay exact."""
    t = _mk_part_table(spark, tmp_base)
    t.set_property("enableChangeDataFeed", "true")
    t.append(spark.createDataFrame([(5, "c", 50.0)], ["id", "k", "v"]))  # v1
    t.update(F.col("id") == 1, {"v": F.lit(11.0)})          # v2 (cdc)
    t.compact(target_partitions=2)                          # v3 OPTIMIZE
    t.overwrite(t.read().filter(F.col("id") != 5))          # v4 diff
    feed = t.table_changes(0, 4, keys=("id",))
    got = _feed(feed)
    per_commit = set()
    for v in range(0, 5):
        per_commit |= _feed(t.commit_changes(v, keys=("id",)).withColumn(
            "_commit_version", F.lit(v).cast("bigint")))
    assert got == per_commit
    assert (5, "c", 50.0, "delete", 4) in got


def test_table_changes_restore_in_range_keeps_exact_versions(
        spark, tmp_base):
    """A RESTORE points its commit at an OLDER version dir whose file
    paths carry the wrong vN — it must route through the per-commit
    diff, never the path-parsed insert scan."""
    t = _mk_part_table(spark, tmp_base)
    t.append(spark.createDataFrame([(9, "c", 90.0)], ["id", "k", "v"]))  # v1
    t.restore(0)                                                         # v2
    t.restore(1)           # v3: dir v1 superset of v2's dir v0 by relpath
    feed = _feed(t.table_changes(2, 3, keys=("id",)))
    assert feed == {(9, "c", 90.0, "delete", 2),
                    (9, "c", 90.0, "insert", 3)}


def test_append_feed_serves_from_metadata_without_dir_walks(
        spark, tmp_base, monkeypatch):
    """Append commits record their batch's files; the feed must plan
    from that metadata alone — zero version-dir walks (O(batch) driver
    work at any table size)."""
    import tb_lakehouse_enhanced_spark.sources.managed as m
    t = _mk_part_table(spark, tmp_base)
    t.append(spark.createDataFrame([(7, "c", 70.0)], ["id", "k", "v"]))
    assert t._commit(1)["added_files"]

    def boom(self, v):
        raise AssertionError("version-dir walk on an append feed")
    monkeypatch.setattr(m.ManagedTable, "_files_rel", boom)
    assert _feed(t.table_changes(1, 1, keys=("id",))) == {
        (7, "c", 70.0, "insert", 1)}
    assert t.commit_changes(1, keys=("id",)).count() == 1


def test_sync_incremental_multi_commit_interleave(spark, tmp_base):
    """Sync after SEVERAL src commits, including a key updated twice,
    an insert-then-delete, and a delete-then-reinsert — the collapsed
    last-change-per-key batch must land dst exactly on src."""
    src = ManagedTable(spark, f"{tmp_base}/msrc", partition_by=("k",))
    dst = ManagedTable(spark, f"{tmp_base}/mdst")
    src.overwrite(spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], ["id", "k", "v"]))
    assert sync_incremental(src, dst, keys=("id",)) == 0
    src.update(F.col("id") == 1, {"v": F.lit(11.0)})              # v1
    src.update(F.col("id") == 1, {"v": F.lit(12.0)})              # v2
    src.append(spark.createDataFrame([(9, "a", 90.0)],
                                     ["id", "k", "v"]))           # v3
    src.delete(F.col("id") == 9)                                  # v4
    src.delete(F.col("id") == 2)                                  # v5
    src.append(spark.createDataFrame([(2, "b", 22.0)],
                                     ["id", "k", "v"]))           # v6
    assert sync_incremental(src, dst, keys=("id",)) == 6
    assert _rows(dst.read()) == _rows(src.read())
    assert _rows(dst.read()) == {(1, "a", 12.0), (2, "b", 22.0)}
