"""Log-native file listing: the commit log is the source of truth.

Round-9 headline (VERDICT r8 'Next round' #1): an append commit is
its batch's files + one metadata record — no hardlink forest. These
tests pin that ``read()`` stays hash-equal to the logical state
across every history shape that can follow an append chain:
partial rewrite, full overwrite, MOR upsert/delete, metadata-only
column evolution, restore, clone, vacuum, stats/bloom pruned reads,
targeted compaction, and SCD2's history-linking merge.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _nlinks(t, v):
    return {rel: os.stat(full).st_nlink
            for rel, full in t._live_files(v).items()}


@pytest.fixture()
def chain(spark, tmp_base):
    """Partitioned table with a 3-commit append chain on top of v0."""
    t = ManagedTable(spark, f"{tmp_base}/t", partition_by=("p",))
    t.overwrite(spark.createDataFrame(
        [(1, "a", 0), (2, "b", 0), (3, "c", 1)], "id long, k string, p int"))
    t.append(spark.createDataFrame([(4, "d", 1)], "id long, k string, p int"))
    t.append(spark.createDataFrame(
        [(5, "e", 2), (6, "f", 0)], "id long, k string, p int"))
    return t


def test_append_chain_reads_and_files_metadata(spark, chain):
    t = chain
    assert _rows(t.read().select("id", "k", "p")) == [
        (1, "a", 0), (2, "b", 0), (3, "c", 1), (4, "d", 1),
        (5, "e", 2), (6, "f", 0)]
    # every live file still has exactly one name on disk
    assert set(_nlinks(t, 2).values()) == {1}
    # files() lists the whole live set with partition values
    f = {(os.path.basename(r["file"]), r["p"])
         for r in t.files().collect()}
    assert len(f) == len(t._live_files(2))
    assert {p for _n, p in f} == {"0", "1", "2"}
    # partitions() aggregates across the chain (path-derived values
    # are strings, as in the materialized listing)
    parts = {r["p"]: r["n_rows"] for r in t.partitions().collect()}
    assert parts == {"0": 3, "1": 2, "2": 1}


def test_partial_rewrite_after_append_chain(spark, chain):
    t = chain
    # UPDATE touching partition 0 only: rewrites p=0 from the LIVE set
    # (base + appended rows), links p=1/p=2 files from their dirs
    t.update(F.col("id") == 6, {"k": F.lit("F")})
    assert _rows(t.read().select("id", "k")) == [
        (1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e"), (6, "F")]
    meta = t._commit(t.current_version())
    assert meta["partitions_rewritten"] == ["p=0"]
    # untouched partitions' files rode in as hardlinks of the ORIGINAL
    # chain files (wherever they lived)
    live = t._files_rel(t.current_version())
    assert {os.path.dirname(r) for r in live} == {"p=0", "p=1", "p=2"}


def test_delete_after_append_chain(spark, chain):
    t = chain
    t.delete(F.col("p") == 1)
    assert _rows(t.read().select("id")) == [(1,), (2,), (5,), (6,)]
    assert t._commit(t.current_version())["partitions_rewritten"] == \
        ["p=1"]


def test_overwrite_after_append_chain_then_vacuum(spark, chain):
    t = chain
    want = _rows(t.read())
    t.overwrite(t.read())           # materialize
    assert _rows(t.read()) == want
    removed = t.vacuum(retain_last=1)
    assert set(removed) == {0, 1, 2}
    assert _rows(t.read()) == want


def test_mor_on_append_chain(spark, chain):
    t = chain
    t.upsert_mor(spark.createDataFrame(
        [(6, "zz", 0), (7, "g", 2)], "id long, k string, p int"),
        key_cols=("id",))
    t.delete_mor(F.col("id") == 1, key_cols=("id",))
    assert _rows(t.read().select("id", "k")) == [
        (2, "b"), (3, "c"), (4, "d"), (5, "e"), (6, "zz"), (7, "g")]
    # compaction materializes the resolved state; chain + MOR debt gone
    t.compact()
    meta = t._commit(t.current_version())
    assert not meta.get("tombstones") and not meta.get("deltas")
    assert meta.get("live_base") is None
    assert _rows(t.read().select("id", "k")) == [
        (2, "b"), (3, "c"), (4, "d"), (5, "e"), (6, "zz"), (7, "g")]


def test_metadata_evolution_on_append_chain(spark, chain):
    t = chain
    cmap = t.identity_column_map() + [[None, "extra", "int"]]
    t.evolve_schema(cmap, "ALTER TABLE ADD COLUMNS (extra int)")
    got = t.read()
    assert "extra" in got.columns
    assert got.filter(F.col("extra").isNull()).count() == 6
    # appends on a mapped parent stay O(batch) since r10: the batch is
    # written on the current physical schema, the map stays live
    t.append(spark.createDataFrame(
        [(7, "g", 0, 9)], "id long, k string, p int, extra int"))
    head = t._commit(t.current_version())
    assert head.get("added_files") and head.get("column_map")
    assert _rows(t.read().select("id", "extra")) == [
        (1, None), (2, None), (3, None), (4, None), (5, None),
        (6, None), (7, 9)]


def test_restore_to_append_version_and_onward(spark, chain):
    t = chain
    want_v1 = _rows(t.read(version=1))
    t.delete(F.col("p") == 0)                       # v3
    t.restore(1)                                    # v4 -> live(v1)
    assert _rows(t.read()) == want_v1
    # appends continue on top of the restored chain
    t.append(spark.createDataFrame([(9, "z", 3)],
                                   "id long, k string, p int"))
    assert _rows(t.read().select("id")) == [
        (1,), (2,), (3,), (4,), (9,)]
    # vacuum keeps every dir the restored chain references
    t.vacuum(retain_last=1)
    assert _rows(t.read().select("id")) == [
        (1,), (2,), (3,), (4,), (9,)]


def test_clone_from_append_head(spark, chain, tmp_base):
    t = chain
    c = t.clone(f"{tmp_base}/c")
    assert _rows(c.read()) == _rows(t.read())
    # the clone is independent: mutating it leaves the source alone
    c.delete(F.col("p") == 0)
    assert _rows(t.read().select("id")) == [
        (1,), (2,), (3,), (4,), (5,), (6,)]


def test_stats_and_bloom_pruning_on_append_chain(spark, chain):
    t = chain
    t.analyze(("id", "p"))
    # range read over the chain matches the unpruned filter
    got = t.read_where("id", 4, 6)
    assert _rows(got.select("id")) == [(4,), (5,), (6,)]
    # pruning works on the PARTITION column too (path-derived stats)
    got = t.read_where("p", 2, 2)
    assert _rows(got.select("id")) == [(5,)]
    t.analyze_bloom("k")
    assert _rows(t.read_where_eq("k", "e").select("id")) == [(5,)]
    # bloom prunes to a strict subset of the live files
    kept = t.bloom_pruned_files("k", "e")
    assert kept is not None
    assert len(kept) < len(t._live_files(t.current_version()))


def test_compact_partitions_on_append_chain(spark, chain):
    t = chain
    want = _rows(t.read())
    t.compact_partitions(["p=0"], target_files=1)
    assert _rows(t.read()) == want
    live = t._files_rel(t.current_version())
    assert sum(1 for r in live if r.startswith("p=0/")) == 1


def test_table_changes_spans_lognative_history(spark, chain):
    t = chain
    t.update(F.col("id") == 1, {"k": F.lit("A")})   # v3 partial rewrite
    feed = t.table_changes(1, 3, keys=("id",))
    got = {(r["id"], r["k"], r["_change_type"], r["_commit_version"])
           for r in feed.collect()}
    assert got == {
        (4, "d", "insert", 1),
        (5, "e", "insert", 2), (6, "f", "insert", 2),
        (1, "a", "update_preimage", 3), (1, "A", "update_postimage", 3)}


def test_scd2_history_link_after_append(spark, tmp_base):
    from tb_lakehouse_enhanced_spark.operators.merge import ScdConfig
    t = ManagedTable(spark, f"{tmp_base}/scd2",
                     partition_by=("_tf_is_current",))
    cfg = ScdConfig(keys=("nk",), tracked=("val",))
    ts1, ts2 = 1000.0, 2000.0
    t.scd2_merge_into(spark.createDataFrame(
        [(1, "x"), (2, "y")], "nk long, val string"), cfg, ts1)
    # a log-native append lands extra CURRENT rows in its own dir
    cur_cols = t.read().columns
    extra = t.read().filter("nk = 1").limit(0)
    t.append(t.read().filter("nk = 2").select(*cur_cols)
             .withColumn("nk", F.lit(3)).withColumn("val", F.lit("z")))
    del extra
    t.scd2_merge_into(spark.createDataFrame(
        [(1, "x2"), (2, "y"), (3, "z")], "nk long, val string"), cfg, ts2)
    got = {(r["nk"], r["val"], r["_tf_is_current"])
           for r in t.read().collect()}
    assert got == {(1, "x", 0), (1, "x2", 1), (2, "y", 1), (3, "z", 1)}
