"""Merge-on-read writes on a column-mapped parent (round 10).

Pre-r10, `upsert_mor`/`delete_mor` on a table with a live column map
compacted (materialized) the WHOLE table first — an O(table) cliff on
the CDC-sync-onto-evolved-replica path. Now the delta/tombstone
batches are written on the PHYSICAL schema (like mapped appends),
resolution runs on the physical plane with the keys translated
through the map, and the logical projection applies on top — zero
materialize, O(changes) end to end through schema evolution.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _evolve(t, rename=None, add=None, drop=None):
    cmap = t.identity_column_map()
    if rename:
        for e in cmap:
            if e[1] == rename[0]:
                e[1] = rename[1]
    if drop:
        cmap = [e for e in cmap if e[1] != drop]
    if add:
        cmap.append([None, add[0], add[1]])
    return t.evolve_schema(cmap, "EVOLVE")


def _mapped_table(spark, path):
    t = ManagedTable(spark, path)
    t.overwrite(spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)],
        "id long, s string, score double"))
    _evolve(t, rename=("s", "name"))
    _evolve(t, add=("extra", "int"))
    return t


def test_upsert_mor_on_mapped_parent_zero_materialize(spark, tmp_base):
    t = _mapped_table(spark, f"{tmp_base}/t")
    before = {f: os.stat(f).st_ino for f in
              __import__("glob").glob(f"{t.path}/**/*.parquet",
                                      recursive=True)}
    t.upsert_mor(spark.createDataFrame(
        [(2, "B", 2.5, 9), (4, "d", 4.0, None)],
        "id long, name string, score double, extra int"), ("id",))
    # zero pre-existing file touched; ONE new delta state dir
    for f, ino in before.items():
        st = os.stat(f)
        assert (st.st_ino, st.st_nlink) == (ino, 1)
    meta = t._commit(t.current_version())
    assert meta["deltas"] and meta["column_map"]
    assert meta["dir"] == t._commit(t.current_version() - 1)["dir"]
    assert _rows(t.read()) == [
        (1, "a", 1.0, None), (2, "B", 2.5, 9),
        (3, "c", 3.0, None), (4, "d", 4.0, None)]
    # the delta batch physically carries the PHYSICAL names
    raw = spark.read.parquet(os.path.join(t.path, meta["deltas"][-1]))
    assert set(raw.columns) == {"id", "s", "score", "extra"}


def test_delete_mor_on_mapped_parent(spark, tmp_base):
    t = _mapped_table(spark, f"{tmp_base}/t")
    t.delete_mor(F.col("name") == "b", key_cols=("id",))
    meta = t._commit(t.current_version())
    assert meta["tombstones"] and meta["column_map"]
    assert _rows(t.read().select("id", "name")) == [(1, "a"), (3, "c")]
    # delete by explicit keys too (the CDC-sync shape)
    t.delete_mor_keys(spark.createDataFrame([(3,)], "id long"), ("id",))
    assert _rows(t.read().select("id", "name")) == [(1, "a")]


def test_mapped_mor_differential_vs_compacting_semantics(spark, tmp_base):
    """The mapped O(changes) MOR path reads exactly what the old
    compact-first implementation produced, across a stacked
    upsert/delete/append interleave on an evolved table."""
    fast = _mapped_table(spark, f"{tmp_base}/fast")
    slow = _mapped_table(spark, f"{tmp_base}/slow")
    slow.compact()      # the pre-r10 route: materialize the map first
    schema = "id long, name string, score double, extra int"
    steps = [
        ("ups", [(2, "B", 2.5, 9)]),
        ("del", (1,)),
        ("app", [(5, "e", 5.0, 50)]),
        ("ups", [(5, "E", 5.5, 51), (6, "f", 6.0, None)]),
        ("del", (6, 2)),
    ]
    for kind, arg in steps:
        if kind == "ups":
            df = spark.createDataFrame(arg, schema)
            fast.upsert_mor(df, ("id",))
            slow.upsert_mor(df, ("id",))
        elif kind == "del":
            fast.delete_mor(F.col("id").isin(*arg), key_cols=("id",))
            slow.delete_mor(F.col("id").isin(*arg), key_cols=("id",))
        else:
            df = spark.createDataFrame(arg, schema)
            fast.append(df)
            slow.append(df)
    assert fast.read().columns == slow.read().columns
    assert _rows(fast.read()) == _rows(slow.read())
    # the fast table never materialized: same chain bottom throughout
    assert fast._materialized_root(fast.current_version()) == "v0"
    # compact converges to the same state and clears map + debt
    fast.compact()
    head = fast._commit(fast.current_version())
    assert not head.get("column_map") and not head.get("tombstones") \
        and not head.get("deltas")
    assert _rows(fast.read()) == _rows(slow.read())


def test_cdf_over_mapped_mor_commits(spark, tmp_base):
    t = _mapped_table(spark, f"{tmp_base}/t")           # v0..v2
    t.upsert_mor(spark.createDataFrame(
        [(2, "B", 2.5, 9)],
        "id long, name string, score double, extra int"), ("id",))  # v3
    t.delete_mor(F.col("id") == 1, key_cols=("id",))    # v4
    ups = {(r["id"], r["name"], r["_change_type"])
           for r in t.commit_changes(3).collect()}
    assert ups == {(2, "b", "update_preimage"),
                   (2, "B", "update_postimage")}
    dels = {(r["id"], r["_change_type"])
            for r in t.commit_changes(4).collect()}
    assert dels == {(1, "delete")}
    feed = {(r["id"], r["_change_type"], r["_commit_version"])
            for r in t.table_changes(3, 4).collect()}
    assert feed == {(2, "update_preimage", 3), (2, "update_postimage", 3),
                    (1, "delete", 4)}


def test_pruned_read_on_mapped_mor(spark, tmp_base):
    t = ManagedTable(spark, f"{tmp_base}/t")
    t.overwrite(spark.range(40).select(
        F.col("id").alias("a"), (F.col("id") * 2.0).alias("v"))
        .repartition(4))
    _evolve(t, rename=("a", "key"))
    t.analyze(("key",))
    t.upsert_mor(spark.createDataFrame(
        [(7, 700.0), (100, 1.0)], "key long, v double"), ("key",))
    t.delete_mor(F.col("key") == 8, key_cols=("key",))
    # pruned range read == plain filtered read through map + MOR
    assert _rows(t.read_where("key", 5, 10)) == \
        _rows(t.read().filter(F.col("key").between(5, 10)))
    assert _rows(t.read_where("key", 99, 101)) == [(100, 1.0)]


def test_sync_replica_stays_o_changes_through_evolution(spark, tmp_base):
    """The CDC-sync composition (per-commit feed -> keyed MOR apply)
    onto a replica that was SCHEMA-EVOLVED after the first sync: the
    sync's MOR writes no longer force a materialize on the mapped
    replica — O(changes) straight through the evolution."""
    from tb_lakehouse_enhanced_spark.operators.cdf import sync_incremental
    src = ManagedTable(spark, f"{tmp_base}/src")
    src.overwrite(spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "id long, s string, score double"))
    rep = ManagedTable(spark, f"{tmp_base}/rep")
    sync_incremental(src, rep, keys=("id",))        # first sync = copy
    # both sides evolve (metadata-only on each)
    _evolve(src, rename=("s", "label"))
    _evolve(rep, rename=("s", "label"))
    rep_root = rep._materialized_root(rep.current_version())
    src.upsert_mor(spark.createDataFrame(
        [(2, "B", 2.5), (3, "c", 3.0)],
        "id long, label string, score double"), ("id",))
    src.delete_mor(F.col("id") == 1, key_cols=("id",))
    synced = sync_incremental(src, rep, keys=("id",))
    assert synced == src.current_version()
    assert _rows(rep.read()) == _rows(src.read()) == [
        (2, "B", 2.5), (3, "c", 3.0)]
    # the replica applied the changes WITHOUT materializing: its map
    # is live and its chain bottom never moved
    head = rep._commit(rep.current_version())
    assert head.get("column_map"), "replica map was materialized away"
    assert rep._materialized_root(rep.current_version()) == rep_root
    # idempotent re-sync is a no-op
    assert sync_incremental(src, rep, keys=("id",)) == synced


def test_scd2_merge_under_live_map(spark, tmp_base):
    """Round 10: the flag-partitioned SCD2 merge on a mapped parent
    writes its slices physical and keeps the map live — SCD2 stays
    current-slice-priced straight through an ALTER."""
    from tb_lakehouse_enhanced_spark.operators.merge import ScdConfig
    t = ManagedTable(spark, f"{tmp_base}/s2",
                     partition_by=("_tf_is_current",))
    cfg = ScdConfig(keys=("id",), tracked=("v",))
    t.scd2_merge_into(spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string"), cfg,
        load_ts="2024-01-01")
    # rename the tracked column: metadata-only
    cmap = t.identity_column_map()
    for e in cmap:
        if e[1] == "v":
            e[1] = "val"
    t.evolve_schema(cmap, "RENAME COLUMN")
    # cfg tracks the NEW logical name after the rename
    cfg2 = ScdConfig(keys=("id",), tracked=("val",))
    t.scd2_merge_into(spark.createDataFrame(
        [(1, "a2"), (3, "c")], "id long, val string"), cfg2,
        load_ts="2024-02-01")
    meta = t._commit(t.current_version())
    assert meta.get("column_map"), "SCD2 merge materialized the map"
    got = sorted((r["id"], r["val"], r["_tf_is_current"])
                 for r in t.read().collect())
    assert got == [(1, "a", 0), (1, "a2", 1), (2, "b", 0), (3, "c", 1)]
    # a third merge continues on the live map; history accumulates
    t.scd2_merge_into(spark.createDataFrame(
        [(1, "a3"), (3, "c")], "id long, val string"), cfg2,
        load_ts="2024-03-01")
    got = sorted((r["id"], r["val"], r["_tf_is_current"])
                 for r in t.read().collect())
    assert got == [(1, "a", 0), (1, "a2", 0), (1, "a3", 1),
                   (2, "b", 0), (3, "c", 1)]
    assert t._commit(t.current_version()).get("column_map")


def test_alter_on_mor_head_is_metadata_only(spark, tmp_base):
    """Round 10: an ALTER over outstanding tombstones/deltas no longer
    compacts the table — the MOR state rides the evolution commit
    (physical names are stable; only the logical key names translate),
    and reads/writes continue O(changes) on the mapped+MOR head."""
    t = ManagedTable(spark, f"{tmp_base}/t")
    t.overwrite(spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)],
        "id long, s string, score double"))
    t.delete_mor(F.col("id") == 2, key_cols=("id",))        # v1
    t.upsert_mor(spark.createDataFrame(
        [(3, "C", 3.5)], "id long, s string, score double"),
        ("id",))                                            # v2
    import glob
    before = {f: os.stat(f).st_ino for f in glob.glob(
        f"{t.path}/**/*.parquet", recursive=True)}
    _evolve(t, rename=("s", "name"))                        # v3 ALTER
    _evolve(t, add=("n", "int"))                            # v4 ALTER
    # zero files touched by either ALTER
    for f, ino in before.items():
        st = os.stat(f)
        assert (st.st_ino, st.st_nlink) == (ino, 1)
    meta = t._commit(t.current_version())
    assert meta.get("column_map") and meta.get("tombstones") \
        and meta.get("deltas")
    assert _rows(t.read()) == [
        (1, "a", 1.0, None), (3, "C", 3.5, None)]
    # MOR writes continue under the evolved schema
    t.upsert_mor(spark.createDataFrame(
        [(1, "A2", 1.5, 7)], "id long, name string, score double, n int"),
        ("id",))
    t.delete_mor(F.col("name") == "C", key_cols=("id",))
    assert _rows(t.read()) == [(1, "A2", 1.5, 7)]
    # appends too, and compact converges
    t.append(spark.createDataFrame(
        [(9, "z", 9.0, 90)], "id long, name string, score double, n int"))
    assert _rows(t.read()) == [(1, "A2", 1.5, 7), (9, "z", 9.0, 90)]
    t.compact()
    head = t._commit(t.current_version())
    assert not head.get("column_map") and not head.get("tombstones")
    assert _rows(t.read()) == [(1, "A2", 1.5, 7), (9, "z", 9.0, 90)]


def test_alter_rename_of_mor_key_translates(spark, tmp_base):
    t = ManagedTable(spark, f"{tmp_base}/t")
    t.overwrite(spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, s string"))
    t.delete_mor(F.col("id") == 1, key_cols=("id",))
    _evolve(t, rename=("id", "ident"))          # rename the MOR KEY
    meta = t._commit(t.current_version())
    assert meta["tombstone_keys"] == ["ident"]
    assert _rows(t.read()) == [(2, "b")]
    # stacked MOR writes use the NEW key name
    t.delete_mor_keys(spark.createDataFrame([(2,)], "ident long"),
                      ("ident",))
    assert _rows(t.read()) == []


def test_alter_drop_of_mor_key_refused(spark, tmp_base):
    import pytest
    t = ManagedTable(spark, f"{tmp_base}/t")
    t.overwrite(spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, s string"))
    t.delete_mor(F.col("id") == 1, key_cols=("id",))
    with pytest.raises(ValueError, match="merge-on-read key"):
        _evolve(t, drop="id")
    # non-key drops ride through; deltas' dropped values vanish like a
    # materialize would discard them
    t.upsert_mor(spark.createDataFrame([(2, "B")], "id long, s string"),
                 ("id",))
    _evolve(t, drop="s")
    assert t.read().columns == ["id"]
    assert _rows(t.read()) == [(2,)]


def test_alter_on_mor_differential_vs_compact_first(spark, tmp_base):
    fast = ManagedTable(spark, f"{tmp_base}/fast")
    slow = ManagedTable(spark, f"{tmp_base}/slow")
    for t in (fast, slow):
        t.overwrite(spark.createDataFrame(
            [(i, f"s{i}", float(i)) for i in range(6)],
            "id long, s string, score double"))
        t.delete_mor(F.col("id") == 1, key_cols=("id",))
        t.upsert_mor(spark.createDataFrame(
            [(2, "S2", 2.5), (7, "s7", 7.0)],
            "id long, s string, score double"), ("id",))
    slow.compact()                       # the pre-r10 route
    _evolve(fast, rename=("s", "name"), add=("n", "int"))
    slow.overwrite(slow.read().withColumnRenamed("s", "name")
                   .withColumn("n", F.lit(None).cast("int")))
    df = spark.createDataFrame(
        [(3, "N3", 3.5, 33)], "id long, name string, score double, n int")
    fast.upsert_mor(df, ("id",))
    slow.upsert_mor(df, ("id",))
    fast.delete_mor(F.col("n").isNull() & (F.col("id") == 5),
                    key_cols=("id",))
    slow.delete_mor(F.col("n").isNull() & (F.col("id") == 5),
                    key_cols=("id",))
    assert fast.read().columns == slow.read().columns
    assert _rows(fast.read()) == _rows(slow.read())
