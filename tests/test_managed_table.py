"""Versioned parquet managed tables: overwrite / DML / time travel."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable


@pytest.fixture()
def mt(spark, tmp_base):
    t = ManagedTable(spark, f"{tmp_base}/t")
    t.overwrite(spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)], ["id", "k", "v"]))
    return t


def test_overwrite_bumps_version(spark, mt):
    assert mt.current_version() == 0
    mt.overwrite(mt.read().filter("id < 3"))
    assert mt.current_version() == 1
    assert mt.read().count() == 2


def test_time_travel(spark, mt):
    mt.overwrite(mt.read().filter("id = 1"))
    assert mt.read(version=0).count() == 3
    assert mt.read().count() == 1


def test_update_where(spark, mt):
    mt.update(F.col("k") == "a", {"v": F.col("v") + 1, "k": F.lit("z")})
    rows = {r["id"]: (r["k"], r["v"]) for r in mt.read().collect()}
    assert rows == {1: ("z", 11.0), 2: ("b", 20.0), 3: ("z", 31.0)}


def test_delete_where(spark, mt):
    mt.delete(F.col("k") == "a")
    assert [r["id"] for r in mt.read().collect()] == [2]


def test_missing_table_raises(spark, tmp_base):
    t = ManagedTable(spark, f"{tmp_base}/none")
    assert not t.exists()
    with pytest.raises(FileNotFoundError):
        t.read()


def test_history_records_operations(spark, mt):
    mt.update(F.col("id") == 1, {"v": F.lit(99.0)})
    mt.delete(F.col("id") == 2)
    ops = [h["op"] for h in mt.history()]
    assert ops == ["DELETE", "UPDATE", "WRITE"]
    assert [h["version"] for h in mt.history()] == [2, 1, 0]


def test_restore_is_metadata_only(spark, mt, tmp_base):
    import os
    mt.overwrite(mt.read().filter("id = 1"))          # v1
    mt.restore(0)                                     # v2 -> v0's data
    assert mt.current_version() == 2
    assert mt.read().count() == 3
    # no new data directory was written for the restore commit
    assert not os.path.isdir(f"{tmp_base}/t/v2")
    assert mt._commit(2)["dir"] == "v0"


def test_vacuum_removes_old_data_but_keeps_referenced(spark, mt, tmp_base):
    import os
    mt.overwrite(mt.read().filter("id < 3"))          # v1
    mt.restore(0)                                     # v2 references v0 dir
    removed = mt.vacuum(retain_last=1)
    # v0's dir is referenced by the retained commit v2 -> survives
    assert os.path.isdir(f"{tmp_base}/t/v0")
    assert not os.path.isdir(f"{tmp_base}/t/v1")
    assert removed == [1]
    assert mt.read().count() == 3
    with pytest.raises(Exception):
        mt.read(version=1).collect()


def test_changes_keyed_cdf(spark, mt):
    # v1: update id=1, delete id=2, insert id=4
    v1 = spark.createDataFrame(
        [(1, "a", 11.0), (3, "a", 30.0), (4, "c", 40.0)], ["id", "k", "v"])
    mt.overwrite(v1)
    ch = {(r["id"], r["_change_type"]): (r["k"], r["v"])
          for r in mt.changes(0, 1, keys=("id",)).collect()}
    assert ch == {
        (1, "update_preimage"): ("a", 10.0),
        (1, "update_postimage"): ("a", 11.0),
        (2, "delete"): ("b", 20.0),
        (4, "insert"): ("c", 40.0),
    }
    assert all(r["_commit_version"] == 1
               for r in mt.changes(0, 1, keys=("id",)).collect())


def test_changes_keyless_multiset_diff(spark, mt):
    mt.overwrite(spark.createDataFrame(
        [(1, "a", 10.0), (5, "e", 50.0)], ["id", "k", "v"]))
    ch = {(r["id"], r["_change_type"]) for r in mt.changes(0, 1).collect()}
    assert ch == {(5, "insert"), (2, "delete"), (3, "delete")}


def test_file_skipping_stats(spark, tmp_base):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    t = ManagedTable(spark, f"{tmp_base}/li")
    t.overwrite(li)
    t.optimize_layout(("l_shipdate",), target_partitions=8)
    stats = t.analyze(("l_shipdate", "l_quantity"))
    assert len(stats["files"]) >= 8

    import datetime
    lo_ts = t.read().agg(F.min("l_shipdate")).collect()[0][0]
    hi_ts = lo_ts + datetime.timedelta(days=60)
    kept = t.pruned_files("l_shipdate", lo_ts, hi_ts)
    assert kept is not None and 0 < len(kept) < len(stats["files"])

    full = t.read().filter(F.col("l_shipdate").between(lo_ts, hi_ts))
    pruned = t.read_where("l_shipdate", lo_ts, hi_ts)
    assert pruned.count() == full.count()
    assert (pruned.agg(F.sum("l_quantity")).collect()[0][0]
            == full.agg(F.sum("l_quantity")).collect()[0][0])

    # un-analyzed column falls back to full scan, still correct
    assert t.pruned_files("l_extendedprice", 0.0, 1.0) is None
    fb = t.read_where("l_extendedprice", 0.0, 100.0)
    assert fb.count() == t.read().filter(
        F.col("l_extendedprice").between(0.0, 100.0)).count()

    # stats survive a restore (same data dir, same manifest)
    t.overwrite(t.read().limit(10))
    t.restore(1)
    assert t.pruned_files("l_shipdate", lo_ts, hi_ts) == kept

    # out-of-range predicate prunes everything, schema intact
    none = t.read_where("l_shipdate", datetime.datetime(2150, 1, 1),
                        datetime.datetime(2151, 1, 1))
    assert none.count() == 0 and none.columns == t.read().columns


def test_zorder_layout_prunes_both_dimensions(spark, tmp_base):
    from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable
    import pyspark.sql.functions as F
    # two independent uniform dims: lexicographic layout only prunes the
    # leading column; z-order must prune selective filters on EITHER
    df = spark.range(20_000).select(
        (F.col("id") % 1000).alias("k1"),
        ((F.col("id") * 7919) % 1000).alias("k2"))

    lex = ManagedTable(spark, f"{tmp_base}/lex")
    lex.overwrite(df)
    lex.optimize_layout(("k1", "k2"), target_partitions=8)
    lex.analyze(("k1", "k2"))

    zt = ManagedTable(spark, f"{tmp_base}/z")
    zt.overwrite(df)
    zt.optimize_layout(("k1", "k2"), target_partitions=8, zorder=True)
    zt.analyze(("k1", "k2"))

    n_lex = len(lex.pruned_files("k1", 0, 0))  # leading col: lex is optimal
    assert n_lex <= 2
    assert len(lex.pruned_files("k2", 100, 120)) == 8  # trailing col: no pruning

    z_k1 = len(zt.pruned_files("k1", 100, 120))
    z_k2 = len(zt.pruned_files("k2", 100, 120))
    assert z_k1 < 8 and z_k2 < 8  # both dimensions prune
    # and results stay identical to a full-scan filter
    got = zt.read_where("k2", 100, 120).count()
    want = df.filter(F.col("k2").between(100, 120)).count()
    assert got == want


def test_partitioned_dml_rewrites_only_touched_partitions(spark, tmp_base):
    import os
    from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable
    import pyspark.sql.functions as F
    df = spark.createDataFrame(
        [(k, k % 4, float(k)) for k in range(400)], "k long, pt int, v double")
    t = ManagedTable(spark, f"{tmp_base}/pdml", partition_by=("pt",))
    t.overwrite(df)
    v0_dir = t._version_dir(t.current_version())

    def inodes(vdir, rel):
        d = os.path.join(vdir, rel)
        return {f: os.stat(os.path.join(d, f)).st_ino
                for f in os.listdir(d) if f.endswith(".parquet")}

    # UPDATE touches only pt=1
    t.update((F.col("pt") == 1) & (F.col("k") < 100), {"v": F.lit(-1.0)})
    v1_dir = t._version_dir(t.current_version())
    meta = t.history()[0]
    assert meta["op"] == "UPDATE" and meta["partitions_rewritten"] == ["pt=1"]
    # untouched partitions are hardlinks of the previous snapshot
    for rel in ("pt=0", "pt=2", "pt=3"):
        assert inodes(v1_dir, rel) == inodes(v0_dir, rel), rel
    # touched partition was rewritten (fresh files)
    assert not set(inodes(v1_dir, "pt=1")) & set(inodes(v0_dir, "pt=1")) \
        or inodes(v1_dir, "pt=1") != inodes(v0_dir, "pt=1")
    # data correct
    assert t.read().filter("v = -1.0").count() == 25
    assert t.read().count() == 400

    # DELETE everything in pt=2: partition dir disappears
    t.delete(F.col("pt") == 2)
    assert t.history()[0]["partitions_rewritten"] == ["pt=2"]
    assert t.read().count() == 300
    assert t.read().filter("pt = 2").count() == 0

    # no-match DML is a no-op commit-wise
    before = t.current_version()
    t.update(F.col("k") < 0, {"v": F.lit(0.0)})
    assert t.current_version() == before

    # time travel still sees the original snapshot
    assert t.read(0).count() == 400


def test_partition_scoped_merge_rewrites_only_source_months(spark, tmp_base):
    import os
    from tb_lakehouse_enhanced_spark.operators.merge import ScdConfig
    from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable
    import pyspark.sql.functions as F
    cfg = ScdConfig(keys=("k",), tracked=("v",))
    base = spark.createDataFrame(
        [(k, 202401 + (k % 3), float(k)) for k in range(300)],
        "k long, month int, v double")
    t = ManagedTable(spark, f"{tmp_base}/pmerge", partition_by=("month",))
    t.merge_into(base, cfg, "2024-01-01 00:00:00")
    v0 = t._version_dir(t.current_version())

    # batch touching only month 202402: updates k=1, inserts k=1000
    batch = spark.createDataFrame(
        [(1, 202402, -5.0), (1000, 202402, 9.0)], "k long, month int, v double")
    t.merge_into(batch, cfg, "2024-01-02 00:00:00")
    v1 = t._version_dir(t.current_version())
    assert t.history()[0]["partitions_rewritten"] == ["month=202402"]

    def inodes(vdir, rel):
        d = os.path.join(vdir, rel)
        return {f: os.stat(os.path.join(d, f)).st_ino
                for f in os.listdir(d) if f.endswith(".parquet")}
    for rel in ("month=202401", "month=202403"):
        assert inodes(v1, rel) == inodes(v0, rel), rel  # hardlinked, 0 bytes

    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got[1] == -5.0 and got[1000] == 9.0 and len(got) == 301


def test_partition_scoped_merge_handles_moved_rows(spark, tmp_base):
    from tb_lakehouse_enhanced_spark.operators.merge import ScdConfig
    from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable
    cfg = ScdConfig(keys=("k",), tracked=("v",))
    t = ManagedTable(spark, f"{tmp_base}/pmove", partition_by=("month",))
    t.merge_into(spark.createDataFrame(
        [(1, 202401, 1.0), (2, 202402, 2.0)], "k long, month int, v double"),
        cfg, "2024-01-01 00:00:00")
    # k=1 MOVES from month 202401 to 202403
    moved = spark.createDataFrame([(1, 202403, 7.0)], "k long, month int, v double")
    t.merge_into(moved, cfg, "2024-01-02 00:00:00", stable_partitions=False)
    rows = {(r["k"], r["month"]): r["v"] for r in t.read().collect()}
    assert rows == {(1, 202403): 7.0, (2, 202402): 2.0}  # no stale dup in 202401
    assert t.history()[0]["partitions_rewritten"] == ["month=202401", "month=202403"]


def test_read_as_of_timestamp(spark, tmp_base):
    import time as _t
    from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable
    t = ManagedTable(spark, f"{tmp_base}/asof")
    t.overwrite(spark.range(5).toDF("k"))
    between = _t.time()
    _t.sleep(0.05)
    t.overwrite(spark.range(9).toDF("k"))
    assert t.read_as_of(between).count() == 5
    assert t.read_as_of(_t.time()).count() == 9
    import pytest
    with pytest.raises(FileNotFoundError):
        t.read_as_of(between - 1e6)


def test_files_and_partitions_metadata_tables(spark, tmp_base):
    from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable
    import pyspark.sql.functions as F
    df = spark.createDataFrame([(k, k % 3) for k in range(90)], "k long, pt int")
    t = ManagedTable(spark, f"{tmp_base}/meta", partition_by=("pt",))
    t.overwrite(df)
    files = t.files().collect()
    assert sum(r["n_rows"] for r in files) == 90
    assert all(r["size_bytes"] > 0 for r in files)
    assert {r["pt"] for r in files} == {"0", "1", "2"}
    parts = {r["pt"]: r for r in t.partitions().collect()}
    assert set(parts) == {"0", "1", "2"}
    assert all(p["n_rows"] == 30 for p in parts.values())
    assert all(p["n_files"] >= 1 for p in parts.values())


def test_check_constraints_gate_every_write_path(spark, tmp_base):
    import pytest
    from tb_lakehouse_enhanced_spark.operators.analytics import ExpectationError
    from tb_lakehouse_enhanced_spark.operators.merge import ScdConfig
    from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable
    import pyspark.sql.functions as F
    t = ManagedTable(spark, f"{tmp_base}/cons", partition_by=("pt",))
    t.overwrite(spark.createDataFrame([(1, 0, 5.0), (2, 1, 3.0)],
                                      "k long, pt int, v double"))
    t.add_constraint("v_positive", "v > 0")

    # adding a constraint violated by existing data fails immediately
    with pytest.raises(ExpectationError):
        t.add_constraint("v_big", "v > 4")
    assert "v_big" not in t.constraints()

    # overwrite path enforced, snapshot pointer untouched on violation
    before = t.current_version()
    with pytest.raises(ExpectationError):
        t.overwrite(spark.createDataFrame([(3, 0, -1.0)],
                                          "k long, pt int, v double"))
    assert t.current_version() == before

    # partial-rewrite (UPDATE) path enforced
    with pytest.raises(ExpectationError):
        t.update(F.col("k") == 1, {"v": F.lit(-9.0)})
    assert t.read().filter("v <= 0").count() == 0

    # partition-scoped merge path enforced
    bad = spark.createDataFrame([(9, 1, -2.0)], "k long, pt int, v double")
    with pytest.raises(ExpectationError):
        t.merge_into(bad, ScdConfig(keys=("k",), tracked=("v",)),
                     "2024-01-02 00:00:00")

    # valid writes still flow
    t.update(F.col("k") == 1, {"v": F.lit(9.0)})
    assert {r["v"] for r in t.read().collect()} == {9.0, 3.0}


def test_generated_columns_computed_at_write(spark, tmp_base):
    from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable
    t = ManagedTable(spark, f"{tmp_base}/gen", partition_by=("month",),
                     generated_cols={"month": "CAST(date_key / 100 AS INT)"})
    t.overwrite(spark.createDataFrame([(1, 20240115), (2, 20240216)],
                                      "k long, date_key long"))
    rows = {r["k"]: r["month"] for r in t.read().collect()}
    assert rows == {1: 202401, 2: 202402}
    # caller-supplied values win over generation
    t.overwrite(spark.createDataFrame([(3, 20240301, 999999)],
                                      "k long, date_key long, month int"))
    assert t.read().collect()[0]["month"] == 999999


def test_concurrent_commit_first_writer_wins(spark, tmp_base):
    import pytest
    from tb_lakehouse_enhanced_spark.sources.managed import (
        ConcurrentWriteError, ManagedTable)
    a = ManagedTable(spark, f"{tmp_base}/cc")
    b = ManagedTable(spark, f"{tmp_base}/cc")
    a.overwrite(spark.range(3).toDF("k"))
    # both handles observe v0; both try to commit v1
    df_a = spark.range(10).toDF("k")
    df_b = spark.range(20).toDF("k")
    a.overwrite(df_a)
    with pytest.raises(ConcurrentWriteError):
        # b computed v = its stale current_version()+1 ... simulate by
        # publishing the same version id directly
        b._publish(a.current_version(), {"version": a.current_version(),
                                         "dir": "v1", "op": "WRITE"})
    assert a.read().count() == 10  # first writer's commit is live


def test_scd2_merge_into_history_is_append_only(spark, tmp_base):
    import os
    from tb_lakehouse_enhanced_spark.operators.merge import (
        VALID_TO, ScdConfig, scd2_merge)
    from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable
    import pyspark.sql.functions as F
    cfg = ScdConfig(keys=("k",), tracked=("v",))
    b0 = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    b1 = spark.createDataFrame([(1, "a"), (2, "B"), (4, "d")], "k long, v string")
    b2 = spark.createDataFrame([(1, "A"), (2, "B"), (4, "d")], "k long, v string")

    t = ManagedTable(spark, f"{tmp_base}/scd2p", partition_by=("_tf_is_current",))
    t.scd2_merge_into(b0, cfg, "2024-01-01 00:00:00")
    t.scd2_merge_into(b1, cfg, "2024-01-02 00:00:00")
    v1_dir = t._version_dir(t.current_version())
    t.scd2_merge_into(b2, cfg, "2024-01-03 00:00:00")
    v2_dir = t._version_dir(t.current_version())

    # history files from the previous version survive as hardlinks
    def hist_inodes(vdir):
        d = os.path.join(vdir, "_tf_is_current=0")
        return {f: os.stat(os.path.join(d, f)).st_ino
                for f in os.listdir(d) if f.endswith(".parquet")}
    old, new = hist_inodes(v1_dir), hist_inodes(v2_dir)
    assert set(old) <= set(new)            # append-only
    assert all(new[f] == old[f] for f in old)  # zero bytes rewritten

    # end state equals the plain full-merge reference implementation
    want = scd2_merge(
        scd2_merge(scd2_merge(None, b0, cfg, "2024-01-01 00:00:00"),
                   b1, cfg, "2024-01-02 00:00:00"),
        b2, cfg, "2024-01-03 00:00:00")
    got = t.read().drop("_tf_is_current")
    w = {tuple(r) for r in want.select("k", "v", VALID_TO).collect()}
    g = {tuple(r) for r in got.select("k", "v", VALID_TO).collect()}
    assert g == w
    # closed versions: b0->b1 closed {2 deleted? no: 2 changed, 3 deleted}; b1->b2 closed {1}
    assert t.read().filter("_tf_is_current = 0").count() == 3


def test_compact_partitions_targets_history_only(spark, tmp_base):
    import os
    from tb_lakehouse_enhanced_spark.operators.merge import ScdConfig
    from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable
    cfg = ScdConfig(keys=("k",), tracked=("v",))
    t = ManagedTable(spark, f"{tmp_base}/hcomp", partition_by=("_tf_is_current",))
    batches = [[(1, "a"), (2, "b")], [(1, "A"), (2, "b")], [(1, "A2"), (2, "B")]]
    for i, rows in enumerate(batches):
        t.scd2_merge_into(spark.createDataFrame(rows, "k long, v string"),
                          cfg, f"2024-01-0{i+1} 00:00:00")
    before = t.read().orderBy("k", "_tf_valid_from").collect()

    def files(vdir, rel):
        d = os.path.join(vdir, rel)
        return {f: os.stat(os.path.join(d, f)).st_ino
                for f in os.listdir(d) if f.endswith(".parquet")}
    v_pre = t._version_dir(t.current_version())
    assert len(files(v_pre, "_tf_is_current=0")) >= 2  # accumulated batches

    t.compact_partitions(["_tf_is_current=0"], target_files=1)
    v_post = t._version_dir(t.current_version())
    assert len(files(v_post, "_tf_is_current=0")) == 1          # compacted
    assert files(v_post, "_tf_is_current=1") == files(v_pre, "_tf_is_current=1")  # linked
    after = t.read().orderBy("k", "_tf_valid_from").collect()
    assert after == before                                       # data identical


def test_shallow_clone_shares_files_and_diverges(spark, mt, tmp_base):
    import os
    mt.add_constraint("v_pos", "v > 0")
    cl = mt.clone(f"{tmp_base}/t_clone")
    # same data, zero bytes copied (hardlinks: inode shared)
    assert {r["id"] for r in cl.read().collect()} == {1, 2, 3}
    src_dir = mt._version_dir(mt.current_version())
    dst_dir = cl._version_dir(0)
    src_inodes = {os.stat(os.path.join(src_dir, f)).st_ino
                  for f in os.listdir(src_dir)
                  if os.path.isfile(os.path.join(src_dir, f))}
    dst_inodes = {os.stat(os.path.join(dst_dir, f)).st_ino
                  for f in os.listdir(dst_dir)
                  if os.path.isfile(os.path.join(dst_dir, f))}
    assert src_inodes == dst_inodes
    # constraints carried over and enforced on the clone
    assert cl.constraints() == {"v_pos": "v > 0"}
    # divergent writes: clone mutates, source untouched (and vice versa)
    cl.delete(F.col("id") == 1)
    assert cl.read().count() == 2
    assert mt.read().count() == 3
    mt.update(F.col("id") == 2, {"v": F.lit(99.0)})
    assert {r["v"] for r in cl.read().filter("id = 2").collect()} == {20.0}
    # cloning onto an existing table refuses
    with pytest.raises(FileExistsError):
        mt.clone(f"{tmp_base}/t_clone")


def test_tags_pin_versions_and_survive_vacuum(spark, mt):
    """Named refs (Iceberg tag analogue): a tag reads its pinned
    version forever, pins it through vacuum, and dropping the tag
    releases it."""
    mt.tag("release-1")                      # pins v0 (3 rows)
    mt.overwrite(mt.read().filter("id = 1"))
    mt.overwrite(mt.read())
    mt.overwrite(mt.read())
    assert mt.read_tag("release-1").count() == 3
    removed = mt.vacuum(retain_last=1)
    assert 0 not in removed                  # tagged version kept
    assert mt.read_tag("release-1").count() == 3
    assert mt.tags() == {"release-1": 0}
    mt.drop_tag("release-1")
    removed2 = mt.vacuum(retain_last=1)
    assert 0 in removed2                     # released after drop
    import pytest as _p
    with _p.raises(KeyError):
        mt.read_tag("release-1")
    # tagging a vacuumed version is a loud error
    with _p.raises(FileNotFoundError):
        mt.tag("bad", version=0)


def test_delete_mor_logical_delete_without_rewrite(spark, mt):
    """Merge-on-read delete: rows vanish logically, data files stay
    physically identical; tombstones stack; time travel unaffected;
    the next copy-on-write commit purges."""
    import glob
    import os
    v0_files = sorted(glob.glob(os.path.join(mt.path, "v0", "**", "*.parquet"),
                                recursive=True))
    mt.delete_mor(F.col("k") == "a", key_cols=("id",))
    assert mt.current_version() == 1
    assert [r["id"] for r in mt.read().collect()] == [2]
    # zero rewrite: version dir unchanged, commit points at v0's data
    assert sorted(glob.glob(os.path.join(mt.path, "v0", "**", "*.parquet"),
                            recursive=True)) == v0_files
    assert mt._commit(1)["dir"] == mt._commit(0)["dir"]
    # time travel to the pre-delete snapshot still sees all rows
    assert mt.read(version=0).count() == 3
    # stacked MOR delete
    mt.delete_mor(F.col("id") == 2, key_cols=("id",))
    assert mt.read().count() == 0
    # differing key cols fail loudly
    with pytest.raises(ValueError, match="key columns"):
        mt.delete_mor(F.col("id") == 1, key_cols=("k",))
    # copy-on-write commit purges tombstones
    mt.overwrite(spark.createDataFrame([(9, "z", 1.0)], ["id", "k", "v"]))
    assert "tombstones" not in mt._commit(mt.current_version())
    assert mt.read().count() == 1


def test_delete_mor_delta_mirror_protocol_episode(spark, mt):
    """The Delta mirror marks MOR commits with the deletionVectors
    reader feature (external readers refuse rather than see undeleted
    rows) and resets to protocol v1 at the next copy-on-write commit
    (latest protocol wins on replay)."""
    from tb_lakehouse_enhanced_spark.sources.deltaread import read_delta
    mt.delete_mor(F.col("k") == "a", key_cols=("id",))
    with pytest.raises(ValueError, match="unsupported Delta reader"):
        read_delta(spark, mt.path)
    # time travel to the clean v0 still reads (protocol at v0 is 1)
    assert read_delta(spark, mt.path, version=0).count() == 3
    # compaction ends the episode: mirror readable and purged
    mt.compact(target_partitions=1)
    got = read_delta(spark, mt.path)
    assert [r["id"] for r in got.collect()] == [2]


def test_delete_mor_vacuum_and_clone(spark, mt, tmp_base):
    """Tombstones ride clones (logical rows preserved, zero data bytes
    copied) and orphan tombstone dirs are swept by vacuum once no
    retained commit references them."""
    import os
    mt.delete_mor(F.col("id") == 1, key_cols=("id",))
    c = mt.clone(f"{tmp_base}/mor_clone")
    assert sorted(r["id"] for r in c.read().collect()) == [2, 3]
    # purge + vacuum on the source: tombstone dir swept
    mt.overwrite(mt.read())
    assert any(d.startswith("tomb_v") for d in os.listdir(mt.path))
    mt.vacuum(retain_last=1)
    assert not any(d.startswith("tomb_v") for d in os.listdir(mt.path))
    # the clone's hardlinked tombstone survives the source vacuum
    assert sorted(r["id"] for r in c.read().collect()) == [2, 3]


def test_upsert_mor_last_writer_wins_and_interleave(spark, mt):
    """MOR upserts append delta files (zero base rewrite); newest
    commit wins per key; deletes and re-inserts interleave by
    sequence; compaction materializes the resolved state."""
    import glob
    import os
    v0_files = sorted(glob.glob(os.path.join(mt.path, "v0", "**", "*.parquet"),
                                recursive=True))
    # v1: update id=1, insert id=4
    mt.upsert_mor(spark.createDataFrame(
        [(1, "a", 11.0), (4, "d", 40.0)], ["id", "k", "v"]), key_cols=("id",))
    got = {r["id"]: r["v"] for r in mt.read().collect()}
    assert got == {1: 11.0, 2: 20.0, 3: 30.0, 4: 40.0}
    assert sorted(glob.glob(os.path.join(mt.path, "v0", "**", "*.parquet"),
                            recursive=True)) == v0_files  # base untouched
    # v2: delete id=4 (tombstone newer than its delta row)
    mt.delete_mor(F.col("id") == 4, key_cols=("id",))
    assert sorted(r["id"] for r in mt.read().collect()) == [1, 2, 3]
    # v3: re-insert id=4 (delta newer than the tombstone)
    mt.upsert_mor(spark.createDataFrame(
        [(4, "d", 44.0)], ["id", "k", "v"]), key_cols=("id",))
    got = {r["id"]: r["v"] for r in mt.read().collect()}
    assert got == {1: 11.0, 2: 20.0, 3: 30.0, 4: 44.0}
    # newest upsert shadows the older one for the same key
    mt.upsert_mor(spark.createDataFrame(
        [(1, "a", 111.0)], ["id", "k", "v"]), key_cols=("id",))
    assert {r["id"]: r["v"] for r in mt.read().collect()}[1] == 111.0
    # time travel re-resolves each historical MOR state
    assert {r["id"]: r["v"] for r in mt.read(version=1).collect()}[1] == 11.0
    assert sorted(r["id"] for r in mt.read(version=2).collect()) == [1, 2, 3]
    # schema mismatch is loud
    with pytest.raises(ValueError, match="columns"):
        mt.upsert_mor(spark.createDataFrame([(5,)], ["id"]), key_cols=("id",))
    # compaction purges deltas+tombstones and preserves the state
    before = sorted(map(tuple, mt.read().collect()))
    mt.compact(target_partitions=1)
    meta = mt._commit(mt.current_version())
    assert "deltas" not in meta and "tombstones" not in meta
    assert sorted(map(tuple, mt.read().collect())) == before


def test_update_mor_shadows_without_rewrite(spark, mt):
    """MOR update: assignments land as an upsert delta; unmatched rows
    untouched; stacking with MOR delete still resolves correctly."""
    mt.update_mor(F.col("k") == "a", {"v": F.col("v") + 100}, key_cols=("id",))
    got = {r["id"]: r["v"] for r in mt.read().collect()}
    assert got == {1: 110.0, 2: 20.0, 3: 130.0}
    mt.delete_mor(F.col("id") == 3, key_cols=("id",))
    got = {r["id"]: r["v"] for r in mt.read().collect()}
    assert got == {1: 110.0, 2: 20.0}


def test_bloom_index_point_lookup_prunes_files(spark, tmp_base):
    """Bloom file index: a point lookup on a non-clustered column
    touches only the files whose filter fires (superset of the truly
    matching files — no false negatives), and results equal the full
    scan; a value absent from the table prunes to zero files."""
    import pyspark.sql.functions as F
    t = ManagedTable(spark, f"{tmp_base}/bloomt")
    # 16 files, doc_hash scattered so min/max stats are useless
    df = (spark.range(4000)
          .select(F.col("id"),
                  F.concat(F.lit("h"), (F.col("id") * 2654435761 % 4000)
                           .cast("string")).alias("doc_hash"))
          .repartition(16))
    t.overwrite(df)
    t.analyze_bloom("doc_hash", m_bits=4096, k=4)

    probe = "h123"
    files = t.bloom_pruned_files("doc_hash", probe)
    all_files = [r["file"] for r in t.files().collect()]
    assert files is not None and 0 < len(files) < len(all_files)
    # no false negatives: files actually holding the value are kept
    truly = {r["f"] for r in
             t.read().filter(F.col("doc_hash") == probe)
             .select(F.col("_metadata.file_path").alias("f")).collect()}
    assert truly <= set(files)
    got = sorted(map(tuple, t.read_where_eq("doc_hash", probe).collect()))
    want = sorted(map(tuple,
                      t.read().filter(F.col("doc_hash") == probe).collect()))
    assert got == want and len(got) == 1
    # absent value: near-empty file set, empty exact result
    assert t.read_where_eq("doc_hash", "nope-xyz").count() == 0
    # no manifest for another column -> full-scan fallback
    assert t.bloom_pruned_files("id", 7) is None
    assert t.read_where_eq("id", 7).count() == 1


def test_maintain_policy_triggers_on_debt(spark, mt):
    """maintain(): no-op on a healthy table, compacts when stacked MOR
    commits exceed the budget (folding deltas back into a clean
    snapshot), and compacts on small-file debt."""
    assert mt.maintain(max_files=64, max_mor_commits=8) == "noop"
    for i in range(4):
        mt.upsert_mor(spark.createDataFrame(
            [(100 + i, "m", float(i))], ["id", "k", "v"]), key_cols=("id",))
    before = sorted(map(tuple, mt.read().collect()))
    assert mt.maintain(max_mor_commits=3) == "compact"
    meta = mt._commit(mt.current_version())
    assert "deltas" not in meta and "tombstones" not in meta
    assert sorted(map(tuple, mt.read().collect())) == before
    # small-file debt
    mt.overwrite(mt.read().repartition(16))
    assert mt.maintain(max_files=4, target_partitions=2) == "compact"
    assert len(mt._data_files(mt._commit(mt.current_version())["dir"])) <= 2


def test_concurrent_mor_commits_first_writer_wins(spark, mt):
    """Optimistic concurrency covers the merge-on-read paths: two
    writers racing to publish the same next version — the loser's
    upsert_mor/delete_mor raises ConcurrentWriteError and the pointer
    still names the winner's commit."""
    from tb_lakehouse_enhanced_spark.sources.managed import (
        ConcurrentWriteError, ManagedTable,
    )
    other = ManagedTable(spark, mt.path)     # second writer, same table
    batch = spark.createDataFrame([(9, "z", 9.0)], ["id", "k", "v"])
    mt.upsert_mor(batch, key_cols=("id",))   # winner publishes v1
    # loser computed against v0 and races for v1: the O_EXCL commit
    # file must reject it (emulate by forcing the stale parent view)
    import pytest as _p
    with _p.raises(ConcurrentWriteError):
        other._publish(1, {"version": 1, "dir": "v0", "op": "X",
                           "ts": 0.0})
    # table state is the winner's
    assert mt.current_version() == 1
    assert 9 in {r["id"] for r in mt.read().collect()}
    # a REAL stale-view race: freeze the loser's version view at v0
    # and let delete_mor run — its v1 commit file already exists, so
    # the O_EXCL publish must reject it without moving the pointer
    other.current_version = lambda: 0
    with _p.raises(ConcurrentWriteError):
        other.delete_mor(F.col("id") == 1, key_cols=("id",))
    assert mt.current_version() == 1


def test_pruned_reads_respect_mor_state(spark, tmp_base):
    """Stats/bloom file skipping must compose with merge-on-read state:
    manifests built BEFORE a MOR commit (they key on the base data dir,
    which MOR commits reuse) prune base files only, and the pruned scan
    re-applies tombstones/deltas — deleted rows never leak, upserted
    rows are never missed."""
    t = ManagedTable(spark, f"{tmp_base}/morstats")
    t.overwrite(spark.range(0, 200).selectExpr(
        "id", "CAST(id AS DOUBLE) AS v").repartition(4))
    t.analyze(("id",))
    t.analyze_bloom("id", m_bits=4096, k=4)

    # MOR delete of ids [50, 60): stats built at v0 still resolve
    t.delete_mor((F.col("id") >= 50) & (F.col("id") < 60), key_cols=("id",))
    got = sorted(r["id"] for r in t.read_where("id", 40, 70).collect())
    assert got == list(range(40, 50)) + list(range(60, 71))
    assert t.read_where_eq("id", 55).count() == 0           # tombstoned
    assert t.read_where_eq("id", 45).count() == 1

    # MOR upsert shadows id=45 and inserts id=1000 (out of any base
    # file's stats range — must still be found)
    t.upsert_mor(spark.createDataFrame(
        [(45, -1.0), (1000, 7.0)], "id long, v double"), key_cols=("id",))
    assert t.read_where("id", 40, 50).filter("id = 45") \
        .collect()[0]["v"] == -1.0
    assert t.read_where("id", 900, 1100).collect()[0]["id"] == 1000
    assert t.read_where_eq("id", 1000).count() == 1
    assert t.read_where_eq("id", 55).count() == 0
    # pruned reads match the unpruned reference exactly
    ref = sorted(map(tuple, t.read().filter(
        F.col("id").between(0, 2000)).collect()))
    assert sorted(map(tuple, t.read_where("id", 0, 2000).collect())) == ref

    # manifests are buildable AT a MOR version too (base-dir scan —
    # no ambiguous _metadata through the resolution joins)
    t.analyze(("v",))
    t.analyze_bloom("v", m_bits=2048, k=4)
    assert t.read_where_eq("v", -1.0).collect()[0]["id"] == 45

    # files() on a MOR commit lists base + delta data files
    files = [r["file"] for r in t.files().collect()]
    assert any("delta_v" in f for f in files)
    assert any("/v0/" in f for f in files)


def test_partitioned_cow_paths_materialize_mor_state(spark, tmp_base):
    """Partition-scoped UPDATE/DELETE/MERGE on a table holding
    merge-on-read state must not resurrect tombstoned rows or drop
    delta upserts via the untouched-partition hardlinks: they
    materialize the resolved snapshot (and purge the MOR debt)."""
    from tb_lakehouse_enhanced_spark.operators.merge import ScdConfig
    t = ManagedTable(spark, f"{tmp_base}/morcow", partition_by=("pt",))
    t.overwrite(spark.createDataFrame(
        [(k, k % 3, float(k)) for k in range(90)],
        "k long, pt int, v double"))
    # MOR state: delete k=0 (pt=0), upsert k=1 (pt=1) with v=-1
    t.delete_mor(F.col("k") == 0, key_cols=("k",))
    t.upsert_mor(spark.createDataFrame([(1, 1, -1.0)],
                                       "k long, pt int, v double"),
                 key_cols=("k",))

    # UPDATE touching ONLY pt=2 — pt=0/pt=1 are "untouched", yet the
    # tombstone and the delta row must survive
    t.update(F.col("pt") == 2, {"v": F.col("v") + 100})
    rows = {r["k"]: r["v"] for r in t.read().collect()}
    assert 0 not in rows                 # tombstone not resurrected
    assert rows[1] == -1.0               # delta upsert not dropped
    assert rows[2] == 102.0              # the update itself applied
    meta = t.history()[0]
    assert not meta.get("tombstones") and not meta.get("deltas")

    # partition-scoped MERGE: under its default stable-partitions
    # contract the MOR state is CARRIED (minus touched keys), still
    # never resurrecting the tombstoned row
    t.delete_mor(F.col("k") == 3, key_cols=("k",))
    cfg = ScdConfig(keys=("k",), tracked=("v",))
    t.merge_into(spark.createDataFrame([(4, 1, -4.0)],
                                       "k long, pt int, v double"),
                 cfg, "2024-01-01 00:00:00")
    rows = {r["k"]: r["v"] for r in t.read().collect()}
    assert 3 not in rows and rows[4] == -4.0
    carried = t.history()[0].get("tombstones")
    assert len(carried) == 1
    # writer-unique tombstone dir, carried with the _rw suffix; the
    # resolution sequence still parses 4 from the prefix
    assert carried[0].startswith("tomb_v4-m") and \
        carried[0].endswith("_rw5")
    # without the contract the merge materializes (purging MOR debt)
    t.merge_into(spark.createDataFrame([(5, 2, -5.0)],
                                       "k long, pt int, v double"),
                 cfg, "2024-01-02 00:00:00", stable_partitions=False)
    rows = {r["k"]: r["v"] for r in t.read().collect()}
    assert 3 not in rows and rows[5] == -5.0
    assert not t.history()[0].get("tombstones")

    # compact_partitions refuses while MOR debt is outstanding
    t.delete_mor(F.col("k") == 5, key_cols=("k",))
    with pytest.raises(ValueError, match="merge-on-read"):
        t.compact_partitions(["pt=0"])
    t.compact()
    t.compact_partitions(["pt=0"])       # clean again
    assert 5 not in {r["k"] for r in t.read().collect()}


def test_restore_to_mor_version_preserves_state(spark, mt):
    """RESTORE to a merge-on-read commit carries its tombstones/deltas
    into the new commit — the restored logical rows, not the raw base
    files."""
    mt.delete_mor(F.col("id") == 1, key_cols=("id",))            # v1
    mt.upsert_mor(spark.createDataFrame([(4, "d", 40.0)],
                                        ["id", "k", "v"]),
                  key_cols=("id",))                              # v2
    mor_rows = sorted(r["id"] for r in mt.read().collect())
    assert mor_rows == [2, 3, 4]
    mt.overwrite(spark.createDataFrame([(9, "x", 9.0)],
                                       ["id", "k", "v"]))        # v3
    mt.restore(2)                                                # v4
    assert sorted(r["id"] for r in mt.read().collect()) == [2, 3, 4]
    meta = mt.history()[0]
    assert meta["tombstones"] and meta["deltas"]
    # the delta mirror marks the restored MOR state as unreadable for
    # plain readers (protocol v3), same as the original MOR commits
    import json as _json
    import os as _os
    entry = _os.path.join(mt.path, "_delta_log", f"{4:020d}.json")
    with open(entry) as f:
        acts = [_json.loads(line) for line in f if line.strip()]
    protos = [a["protocol"] for a in acts if "protocol" in a]
    assert protos and protos[0]["minReaderVersion"] == 3


def test_vacuum_sweeps_orphaned_manifests(spark, mt):
    """Stats/bloom manifests key on the data dir; once vacuum removes a
    dir its manifests are unreachable and must be swept with it."""
    import os
    mt.analyze(("id",))
    mt.analyze_bloom("id", m_bits=512, k=3)
    assert os.path.isfile(f"{mt.path}/_stats_v0.json")
    mt.overwrite(mt.read().filter("id < 3"))           # v1
    mt.analyze(("id",))                                # stats for v1
    mt.vacuum(retain_last=1)
    names = set(os.listdir(mt.path))
    assert "_stats_v0.json" not in names
    assert not any(n.startswith("_bloom_v0_") for n in names)
    assert "_stats_v1.json" in names                   # current survives


def test_maintain_rebuilds_manifests_after_compaction(spark, mt):
    """Autonomous maintenance is index-preserving: the stats and bloom
    manifests registered on the old snapshot are rebuilt for the
    compacted one, so file skipping keeps working without a manual
    re-analyze."""
    mt.analyze(("id",))
    mt.analyze_bloom("id", m_bits=512, k=3)
    for i in range(4):
        mt.upsert_mor(spark.createDataFrame(
            [(10 + i, "m", float(i))], ["id", "k", "v"]), key_cols=("id",))
    assert mt.maintain(max_mor_commits=2) == "compact"
    # fresh manifests exist for the compacted dir: pruned reads resolve
    # without falling back to the stats-less full-scan path
    assert mt.pruned_files("id", 10, 13) is not None
    assert mt.bloom_pruned_files("id", 12) is not None
    assert {r["id"] for r in mt.read_where("id", 10, 13).collect()} \
        == {10, 11, 12, 13}
    assert mt.read_where_eq("id", 12).count() == 1
    assert mt.maintain(max_mor_commits=2) == "noop"


def test_read_where_all_multi_column_pruning(spark, tmp_base):
    """Conjunctive multi-column file skipping: on a Z-ordered layout a
    2-D box predicate keeps only the files whose hyper-box intersects
    BOTH ranges (the intersection of per-column prunings), and results
    equal the unpruned filter — including under merge-on-read state."""
    t = ManagedTable(spark, f"{tmp_base}/zt")
    df = spark.range(0, 4096).selectExpr(
        "CAST(id % 64 AS LONG) AS x", "CAST(id DIV 64 AS LONG) AS y",
        "id AS payload")
    t.overwrite(df)
    t.optimize_layout(("x", "y"), target_partitions=16, zorder=True)
    t.analyze(("x", "y"))

    both = t.read_where_all({"x": (10, 20), "y": (10, 20)})
    ref = t.read().filter("x BETWEEN 10 AND 20 AND y BETWEEN 10 AND 20")
    assert sorted(map(tuple, both.collect())) == \
        sorted(map(tuple, ref.collect()))
    # the 2-D box keeps strictly fewer files than either 1-D pruning
    fx = set(t.pruned_files("x", 10, 20))
    fy = set(t.pruned_files("y", 10, 20))
    assert len(fx & fy) < min(len(fx), len(fy)) or len(fx & fy) <= 4
    # a column with no stats still filters exactly (no pruning for it)
    some = t.read_where_all({"x": (10, 20), "payload": (0, 10**9)})
    assert some.count() == t.read().filter("x BETWEEN 10 AND 20").count()

    # MOR state: tombstones respected through the pruned multi-col read
    t.delete_mor((F.col("x") == 12) & (F.col("y") == 12), key_cols=("payload",))
    both2 = t.read_where_all({"x": (10, 20), "y": (10, 20)})
    assert both2.filter("x = 12 AND y = 12").count() == 0
    assert both2.count() == ref.count() - 1


def test_repair_orphan_commit_unblocks_writers(spark, mt):
    """A writer crashing between its O_EXCL commit create and the
    pointer flip leaves an orphan commit: readers are unaffected, but
    every later write collides with the orphan. repair_orphan_commit
    rolls the never-visible commit back (file, mirror entry, and its
    unreferenced dirs) and writes proceed."""
    import json
    import os

    from tb_lakehouse_enhanced_spark.sources.managed import (
        ConcurrentWriteError,
    )
    # simulate the crash: commit file + data dir exist, pointer did not move
    v = mt.current_version() + 1
    os.makedirs(os.path.join(mt.path, f"v{v}"))
    with open(os.path.join(mt.path, f"v{v}", "junk.parquet"), "w") as f:
        f.write("x")
    with open(mt._commit_file(v), "w") as f:
        json.dump({"version": v, "dir": f"v{v}", "op": "WRITE",
                   "ts": 0.0}, f)
    assert mt.current_version() == v - 1          # readers unaffected
    assert mt.read().count() == 3
    with pytest.raises(ConcurrentWriteError):      # writers blocked
        mt.overwrite(mt.read())
    assert mt.repair_orphan_commit() == v
    assert not os.path.isdir(os.path.join(mt.path, f"v{v}"))
    mt.overwrite(mt.read().filter("id < 3"))       # writes proceed
    assert mt.current_version() == v
    assert mt.repair_orphan_commit() is None       # clean table: no-op
    # repair never touches dirs other commits still reference: orphan a
    # RESTORE-style commit that points at the live data dir
    cur = mt.current_version()
    live_dir = mt._commit(cur)["dir"]
    with open(mt._commit_file(cur + 1), "w") as f:
        json.dump({"version": cur + 1, "dir": live_dir,
                   "op": "RESTORE v0", "ts": 0.0}, f)
    assert mt.repair_orphan_commit() == cur + 1
    assert os.path.isdir(os.path.join(mt.path, live_dir))
    assert mt.read().count() == 2


def test_partitioned_dml_mor_carry_stays_partition_scoped(spark, tmp_base):
    """With stable_partitions=True, UPDATE/DELETE on a table holding
    merge-on-read state stay partition-scoped: untouched partitions
    hardlink (zero bytes), the commit still carries the MOR state with
    the touched partitions' rows/keys subtracted, and delete->reinsert
    interleaves resolve exactly."""
    import os
    t = ManagedTable(spark, f"{tmp_base}/morcarry", partition_by=("pt",))
    t.overwrite(spark.createDataFrame(
        [(k, k % 3, float(k)) for k in range(90)],
        "k long, pt int, v double"))
    # MOR state touching pt=0 and pt=1: delete k=3 (pt=0), delete->
    # reinsert k=4 (pt=1) with v=-4, upsert k=7 (pt=1) with v=-7
    t.delete_mor(F.col("k").isin(3, 4), key_cols=("k",))
    t.upsert_mor(spark.createDataFrame(
        [(4, 1, -4.0), (7, 1, -7.0)], "k long, pt int, v double"),
        key_cols=("k",))
    v_before = t.current_version()
    prev_dir = t._version_dir(v_before)

    def inodes(vdir, rel):
        d = os.path.join(vdir, rel)
        return {f: os.stat(os.path.join(d, f)).st_ino
                for f in os.listdir(d) if f.endswith(".parquet")}

    # UPDATE touches ONLY pt=1 — pt=0 and pt=2 must hardlink raw
    t.update((F.col("pt") == 1) & (F.col("k") < 10),
             {"v": F.col("v") + 100}, stable_partitions=True)
    vdir = t._version_dir(t.current_version())
    for rel in ("pt=0", "pt=2"):
        assert inodes(vdir, rel) == inodes(prev_dir, rel), rel
    meta = t.history()[0]
    assert meta["partitions_rewritten"] == ["pt=1"]
    assert meta["tombstones"] and meta["deltas"]         # carried
    assert meta["deltas"][0].startswith("delta_v")       # seq preserved
    rows = {r["k"]: r["v"] for r in t.read().collect()}
    assert 3 not in rows                  # pt=0 tombstone still applies
    assert rows[4] == 96.0                # reinserted -4 + 100 (touched)
    assert rows[7] == 93.0                # upserted -7 + 100 (touched)
    assert rows[1] == 101.0 and rows[2] == 2.0 and rows[0] == 0.0
    # the touched partition's rows no longer re-shadow or re-delete:
    # carried delta/tombstone files exclude pt=1 rows / touched keys
    delta = spark.read.parquet(
        os.path.join(t.path, meta["deltas"][0]))
    assert delta.filter("pt = 1").count() == 0
    tomb = spark.read.parquet(
        os.path.join(t.path, meta["tombstones"][0]))
    assert {r["k"] for r in tomb.collect()} == {3}
    # DELETE in pt=0 with the carry: tombstoned key stays gone, and a
    # later compaction folds everything cleanly
    t.delete((F.col("pt") == 0) & (F.col("k") == 6),
             stable_partitions=True)
    rows = {r["k"]: r["v"] for r in t.read().collect()}
    assert 6 not in rows and 3 not in rows and rows[4] == 96.0
    t.compact()
    assert {r["k"]: r["v"] for r in t.read().collect()} == rows


def test_partition_scoped_merge_mor_carry(spark, tmp_base):
    """merge_into with stable_partitions=True on a table holding
    merge-on-read state stays partition-scoped: untouched partitions
    hardlink raw, the carried tombstones/deltas subtract the touched
    months, and resolution stays exact for touched and untouched keys
    alike."""
    import os

    from tb_lakehouse_enhanced_spark.operators.merge import ScdConfig
    cfg = ScdConfig(keys=("k",), tracked=("v",))
    t = ManagedTable(spark, f"{tmp_base}/pmergemor", partition_by=("month",))
    base = spark.createDataFrame(
        [(k, 202401 + (k % 3), float(k)) for k in range(300)],
        "k long, month int, v double")
    t.merge_into(base, cfg, "2024-01-01 00:00:00")
    # MOR state in month 202401 (k%3==0) and 202403 (k%3==2):
    # delete k=3, delete->reinsert k=6 with v=-6, upsert k=8 with v=-8
    t.delete_mor(F.col("k").isin(3, 6), key_cols=("k",))
    # the merge-built table carries the _tf tech columns; build the
    # upsert batch from the table itself so schemas match
    delta = (t.read(0).filter(F.col("k").isin(6, 8))
             .withColumn("v", F.when(F.col("k") == 6, F.lit(-6.0))
                         .otherwise(F.lit(-8.0))))
    t.upsert_mor(delta, key_cols=("k",))
    prev_dir = t._version_dir(t.current_version())

    # batch touching ONLY month 202402: update k=1, insert k=1000
    batch = spark.createDataFrame(
        [(1, 202402, -5.0), (1000, 202402, 9.0)],
        "k long, month int, v double")
    t.merge_into(batch, cfg, "2024-01-02 00:00:00",
                 stable_partitions=True)
    vdir = t._version_dir(t.current_version())

    def inodes(vdir, rel):
        d = os.path.join(vdir, rel)
        return {f: os.stat(os.path.join(d, f)).st_ino
                for f in os.listdir(d) if f.endswith(".parquet")}
    for rel in ("month=202401", "month=202403"):
        assert inodes(vdir, rel) == inodes(prev_dir, rel), rel
    meta = t.history()[0]
    assert meta["partitions_rewritten"] == ["month=202402"]
    assert meta["tombstones"] and meta["deltas"]
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got[1] == -5.0 and got[1000] == 9.0          # the merge
    assert 3 not in got                                 # tombstone holds
    assert got[6] == -6.0 and got[8] == -8.0            # deltas hold
    assert len(got) == 300                              # 300-1+1
    # merge-INSERT of a tombstoned key into a touched partition: the
    # carried tombstone must not kill the fresh insert (the carry
    # subtracts the NEW content's keys, not just the old resolved ones)
    t.merge_into(spark.createDataFrame(
        [(3, 202401, 33.0)], "k long, month int, v double"),
        cfg, "2024-01-02 12:00:00", stable_partitions=True)
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got[3] == 33.0 and got[6] == -6.0 and got[8] == -8.0

    # a second MOR round then an UNSTABLE merge materializes cleanly
    t.delete_mor(F.col("k") == 9, key_cols=("k",))
    t.merge_into(spark.createDataFrame(
        [(12, 202401, -12.0)], "k long, month int, v double"),
        cfg, "2024-01-03 00:00:00", stable_partitions=False)
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert 9 not in got and got[12] == -12.0 and got[6] == -6.0
    assert not t.history()[0].get("tombstones")


def test_table_config_is_durable(spark, tmp_base):
    """Partition layout and generated columns persist with the table:
    reopening without arguments restores them, and contradicting the
    stored config is refused instead of silently mislaying data."""
    t = ManagedTable(spark, f"{tmp_base}/cfg", partition_by=("pt",),
                     generated_cols={"pt": "CAST(k % 2 AS INT)"})
    t.overwrite(spark.createDataFrame([(k, float(k)) for k in range(10)],
                                      "k long, v double"))
    # bare reopen: config restored, partition-dependent surfaces work
    t2 = ManagedTable(spark, f"{tmp_base}/cfg")
    assert t2.partition_by == ("pt",)
    assert t2.generated_cols == {"pt": "CAST(k % 2 AS INT)"}
    assert {r["pt"] for r in t2.partitions().collect()} == {"0", "1"}
    t2.update(F.col("pt") == 1, {"v": F.lit(-1.0)})
    assert t2.history()[0]["partitions_rewritten"] == ["pt=1"]
    # contradicting config is an error, not silent corruption
    with pytest.raises(ValueError, match="created with"):
        ManagedTable(spark, f"{tmp_base}/cfg", partition_by=("k",))


def test_mor_seq_parse_anchored_to_dir_component(spark, tmp_path):
    """The MOR resolver parses commit sequence from the data file's
    PARENT directory only — a table ROOTED under a path that itself
    contains 'delta_v2' must not leak that token into every row's
    sequence (which would corrupt last-writer-wins resolution)."""
    root = tmp_path / "archive_delta_v2_zone" / "tbl"
    t = ManagedTable(spark, str(root))
    t.overwrite(spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        ["id", "k", "v"]))
    # stacked MOR: upsert then delete then re-upsert the same key —
    # correctness here depends entirely on per-file sequence parsing
    t.upsert_mor(spark.createDataFrame([(1, "a", 11.0)],
                                       ["id", "k", "v"]),
                 key_cols=("id",))
    t.delete_mor(F.col("id") == 2, key_cols=("id",))
    t.upsert_mor(spark.createDataFrame([(2, "b2", 22.0)],
                                       ["id", "k", "v"]),
                 key_cols=("id",))
    rows = {r["id"]: (r["k"], r["v"]) for r in t.read().collect()}
    assert rows == {1: ("a", 11.0), 2: ("b2", 22.0), 3: ("c", 30.0)}


def test_partitioned_mor_update_delete_stay_partition_scoped(spark, tmp_path):
    """VERDICT follow-through: UPDATE/DELETE on a partitioned table IN
    MERGE-ON-READ STATE, under the stable-partitions contract, rewrite
    only the touched partitions — untouched partition files HARDLINK
    forward (same inode, zero bytes moved) and the carried MOR debt
    still resolves correctly."""
    import glob
    import os
    t = ManagedTable(spark, str(tmp_path / "pm"), partition_by=("pt",))
    t.overwrite(spark.createDataFrame(
        [(k, k % 3, float(k)) for k in range(9)],
        "k int, pt int, v double"))
    # enter MOR state: a tombstone + a delta shadowing key 4 (pt=1)
    t.delete_mor(F.col("k") == 1, key_cols=("k",))
    t.upsert_mor(spark.createDataFrame([(4, 1, 40.0)],
                                       "k int, pt int, v double"),
                 key_cols=("k",))

    def inodes(dirname, pt):
        d = os.path.join(t.path, dirname)
        return {os.path.basename(p): os.stat(p).st_ino for p in glob.glob(
            os.path.join(d, f"pt={pt}", "*.parquet"))}

    base_v = t._commit(t.current_version())["dir"]
    before = {pt: inodes(base_v, pt) for pt in (0, 2)}
    # UPDATE touches only pt=1 rows
    t.update((F.col("k") == 7), {"v": F.lit(-7.0)}, stable_partitions=True)
    new_v = t._commit(t.current_version())["dir"]
    assert new_v != base_v
    for pt in (0, 2):
        after = inodes(new_v, pt)
        assert after and after == before[pt], f"pt={pt} was rewritten"
    rows = {r["k"]: r["v"] for r in t.read().collect()}
    assert rows[7] == -7.0 and rows[4] == 40.0 and 1 not in rows
    # DELETE likewise: only pt=2 rewritten, MOR carry preserved
    before = {pt: inodes(new_v, pt) for pt in (0,)}
    t.delete(F.col("k") == 8, stable_partitions=True)
    final_v = t._commit(t.current_version())["dir"]
    assert inodes(final_v, 0) == before[0]
    rows = {r["k"]: r["v"] for r in t.read().collect()}
    assert set(rows) == {0, 2, 3, 4, 5, 6, 7} and rows[4] == 40.0


def test_partitioned_table_readable_after_delete_all(spark, tmp_base):
    """A partition-scoped DELETE that empties a fully-touched
    partitioned table (and an empty partitioned overwrite) must leave
    a READABLE snapshot: zero-row partitioned writes emit no parquet
    footer, so the commit parks one empty schema-bearing file
    (hypothesis-found via the MOR property drive)."""
    from pyspark.sql import functions as F
    t = ManagedTable(spark, f"{tmp_base}/empty_pt", partition_by=("pt",))
    t.overwrite(spark.createDataFrame([(0, 0, 0)], "k int, pt int, v int"))
    t.delete(F.col("v") == 0, stable_partitions=True)
    assert t.read().count() == 0
    assert set(t.read().columns) == {"k", "pt", "v"}
    # still writable + readable afterwards
    t.overwrite(spark.createDataFrame([(1, 1, 5)], "k int, pt int, v int"))
    assert [tuple(r) for r in t.read().select("k", "pt", "v").collect()] \
        == [(1, 1, 5)]
    t2 = ManagedTable(spark, f"{tmp_base}/empty_pt2", partition_by=("pt",))
    t2.overwrite(spark.createDataFrame([], "k int, pt int, v int"))
    assert t2.read().count() == 0


def test_is_provably_empty_tri_state(spark, tmp_base):
    """Metadata-only emptiness probe (r13): True/False only when the
    parquet footers + commit meta PROVE it; None whenever tombstone
    state could have removed rows. The SQL MERGE bootstrap fast path
    relies on this to skip a take(1) probe job."""
    t = ManagedTable(spark, f"{tmp_base}/probe")
    t.overwrite(spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], ["id", "k", "v"]))
    assert t.is_provably_empty() is False        # rows, no remove state
    t.overwrite(t.read().filter("id < 0"))
    assert t.is_provably_empty() is True         # zero footer rows
    assert t.is_provably_empty(version=0) is False   # time travel honored
    # upsert delta: rows present but tombstone_keys recorded -> must
    # answer conservatively (LWW resolution not provable from footers)
    t.overwrite(spark.createDataFrame([(1, "a", 1.0)], ["id", "k", "v"]))
    t.upsert_mor(spark.createDataFrame([(1, "a", 2.0)], ["id", "k", "v"]),
                 key_cols=("id",))
    assert t.is_provably_empty() is None
    # MOR delete: tombstones present -> unprovable
    t.delete_mor(F.col("id") == 1, key_cols=("id",))
    assert t.read().count() == 0
    assert t.is_provably_empty() is None
    # missing table raises like read()
    t2 = ManagedTable(spark, f"{tmp_base}/probe_missing")
    with pytest.raises(FileNotFoundError):
        t2.is_provably_empty()
