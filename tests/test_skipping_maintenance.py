"""O(batch) data-skipping maintenance across append commits.

Before round 9, stats/bloom manifests were keyed by a commit's data
dir and only written by full ``analyze``/``analyze_bloom`` runs — so
every O(batch) ingest silently LOST file skipping until someone paid
an O(table) re-analyze. Delta keeps per-file stats in each add
action; the same cost shape here: an append extends the parent's
manifests with ONLY its batch files (delta manifest + ``base``
pointer, folded cumulative at live-checkpoint cadence), and the
resolvers walk the chain. A broken chain degrades to a full scan,
never to wrong pruning.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _mk(spark, lo, hi, group="g0"):
    return spark.range(lo, hi).select(
        F.col("id"), F.lit(group).alias("k"),
        (F.col("id") * 2).alias("v"))


@pytest.fixture()
def t(spark, tmp_base):
    t = ManagedTable(spark, os.path.join(tmp_base, "t"))
    t.overwrite(_mk(spark, 0, 100).repartition(4))
    t.analyze(("id",))
    t.analyze_bloom("k")
    return t


def test_append_extends_stats_as_delta_manifest(spark, t):
    t.append(_mk(spark, 100, 120, "g1"))
    head = t._commit(t.current_version())
    with open(t._stats_path_for_dir(head["dir"])) as f:
        m = json.load(f)
    # O(batch): the commit's own manifest holds ONLY its batch files
    assert m["base"] == t._commit(0)["dir"]
    assert {os.path.basename(e["file"]) for e in m["files"]} == \
        {os.path.basename(r) for r in head["added_files"]}
    # pruning covers the appended range with NO re-analyze
    kept = t.pruned_files("id", 105, 110)
    assert kept is not None
    live = t._live_files(t.current_version())
    assert 0 < len(kept) < len(live)
    assert _rows(t.read_where("id", 105, 110).select("id")) == \
        [(i,) for i in range(105, 111)]
    # pruning below the appended range never touches the batch files
    kept_lo = t.pruned_files("id", 0, 10)
    assert all(head["dir"] not in f for f in kept_lo)
    # time travel: the PARENT version still prunes from its manifest
    assert _rows(t.read_where("id", 0, 2, version=0).select("id")) == \
        [(0,), (1,), (2,)]


def test_fold_at_live_checkpoint_cadence(spark, t, monkeypatch):
    monkeypatch.setattr(ManagedTable, "LIVE_CHECKPOINT_EVERY", 3)
    for i in range(4):
        t.append(_mk(spark, 100 + 20 * i, 120 + 20 * i, f"g{i + 1}"))
    # checkpoint fired at v3 -> its manifest is folded cumulative
    with open(t._stats_path_for_dir(t._commit(3)["dir"])) as f:
        m3 = json.load(f)
    assert "base" not in m3
    assert len(m3["files"]) == len(t._live_files(3))
    # v4 chains off the folded manifest
    with open(t._stats_path_for_dir(t._commit(4)["dir"])) as f:
        m4 = json.load(f)
    assert m4["base"] == t._commit(3)["dir"]
    assert _rows(t.read_where("id", 150, 155).select("id")) == \
        [(i,) for i in range(150, 156)]


def test_bloom_maintenance_prunes_point_lookups(spark, t):
    t.append(_mk(spark, 100, 120, "needle"))
    t.append(_mk(spark, 120, 140, "hay"))
    kept = t.bloom_pruned_files("k", "needle")
    assert kept is not None
    live = t._live_files(t.current_version())
    assert 0 < len(kept) < len(live)
    got = t.read_where_eq("k", "needle")
    assert got.count() == 20
    assert _rows(got.select("id")) == [(i,) for i in range(100, 120)]
    # a value that never existed prunes everything, returns nothing
    assert t.read_where_eq("k", "absent").count() == 0


def test_broken_manifest_chain_degrades_to_full_scan(spark, t):
    t.append(_mk(spark, 100, 120, "g1"))
    mid_dir = t._commit(1)["dir"]
    t.append(_mk(spark, 120, 140, "g2"))
    os.remove(t._stats_path_for_dir(mid_dir))
    assert t.pruned_files("id", 0, 5) is None      # never wrong pruning
    assert _rows(t.read_where("id", 0, 5).select("id")) == \
        [(i,) for i in range(0, 6)]                # exact via full scan


def test_unanalyzed_table_pays_nothing(spark, tmp_base):
    t = ManagedTable(spark, os.path.join(tmp_base, "u"))
    t.overwrite(_mk(spark, 0, 50))
    t.append(_mk(spark, 50, 60))
    assert not [f for f in os.listdir(t.path)
                if f.startswith(("_stats_", "_bloom_"))]


def test_partition_column_stats_maintained_from_paths(spark, tmp_base):
    t = ManagedTable(spark, os.path.join(tmp_base, "p"),
                     partition_by=["p"])
    t.overwrite(spark.range(40).select(
        F.col("id"), (F.col("id") % 4).alias("p")))
    t.analyze(("id", "p"))
    t.append(spark.range(40, 60).select(
        F.col("id"), F.lit(7).alias("p")))        # a brand-new partition
    kept = t.pruned_files("p", 7, 7)
    assert kept is not None and len(kept) >= 1
    head_dir = t._commit(t.current_version())["dir"]
    assert all(head_dir in f for f in kept)       # only the batch files
    assert _rows(t.read_where("p", 7, 7).select("id")) == \
        [(i,) for i in range(40, 60)]


def test_vacuum_keeps_chain_manifests(spark, tmp_base):
    t = ManagedTable(spark, os.path.join(tmp_base, "v"))
    t.overwrite(_mk(spark, 0, 50))
    t.analyze(("id",))
    t.append(_mk(spark, 50, 60))
    t.append(_mk(spark, 60, 70))
    t.vacuum(retain_last=1)       # head chains through every manifest
    kept = t.pruned_files("id", 55, 58)
    assert kept is not None
    assert _rows(t.read_where("id", 55, 58).select("id")) == \
        [(i,) for i in range(55, 59)]


def test_partition_scoped_update_maintains_manifests(spark, tmp_base):
    """A partition-scoped UPDATE keeps file skipping alive at
    O(touched): untouched partitions' manifest entries re-point to
    their hardlinked copies, only the rewritten partition's new files
    re-analyze."""
    t = ManagedTable(spark, os.path.join(tmp_base, "d"),
                     partition_by=["p"])
    t.overwrite(spark.range(40).select(
        F.col("id"), F.concat(F.lit("k"), F.col("id")).alias("k"),
        (F.col("id") % 4).alias("p")))
    t.analyze(("id",))
    t.analyze_bloom("k")
    t.update(F.col("p") == 1, {"k": F.lit("rewritten")})
    head_dir = t._commit(t.current_version())["dir"]
    # the rewrite dir carries a CUMULATIVE manifest covering all files
    with open(t._stats_path_for_dir(head_dir)) as f:
        m = json.load(f)
    assert "base" not in m
    assert len(m["files"]) == len(t._live_files(t.current_version()))
    # every recorded path points into the NEW version dir
    assert all(f"/{head_dir}/" in e["file"] for e in m["files"])
    # range pruning still exact on both rewritten and untouched sides
    assert t.pruned_files("id", 0, 5) is not None
    got = sorted(r["id"] for r in t.read_where("id", 0, 5).collect())
    assert got == [0, 1, 2, 3, 4, 5]
    # bloom: the untouched needle still found, rewritten values found
    assert t.read_where_eq("k", "k2").count() == 1        # p=2, untouched
    assert t.read_where_eq("k", "rewritten").count() == 10
    assert t.read_where_eq("k", "k1").count() == 0        # overwritten
    kept = t.bloom_pruned_files("k", "k2")
    assert kept is not None
    assert 0 < len(kept) < len(t._live_files(t.current_version()))


def test_delete_emptying_partition_drops_its_entries(spark, tmp_base):
    t = ManagedTable(spark, os.path.join(tmp_base, "e"),
                     partition_by=["p"])
    t.overwrite(spark.range(30).select(
        F.col("id"), (F.col("id") % 3).alias("p")))
    t.analyze(("id",))
    t.delete(F.col("p") == 2)
    stats = t._load_stats(t.current_version())
    assert stats is not None
    assert all("p=2" not in e["file"] or "p=20" in e["file"]
               for e in stats["files"])
    assert sorted(r["id"] for r in t.read_where("id", 0, 4).collect()) \
        == [0, 1, 3, 4]          # id=2 lived in p=2, deleted


def test_append_then_update_chain_keeps_skipping(spark, tmp_base):
    """The combined history a pipeline actually produces: analyze once,
    then append / update / append — skipping stays exact throughout
    with no re-analyze."""
    t = ManagedTable(spark, os.path.join(tmp_base, "c"),
                     partition_by=["p"])
    t.overwrite(spark.range(20).select(
        F.col("id"), (F.col("id") % 2).alias("p")))
    t.analyze(("id",))
    t.append(spark.range(20, 30).select(
        F.col("id"), (F.col("id") % 2).alias("p")))
    t.update(F.col("p") == 0, {"id": F.col("id") + 100})
    t.append(spark.range(30, 40).select(
        F.col("id"), (F.col("id") % 2).alias("p")))
    assert t.pruned_files("id", 100, 130) is not None
    got = sorted(r["id"] for r in t.read_where("id", 100, 130).collect())
    assert got == sorted(i + 100 for i in range(0, 30, 2))
    want = sorted(r["id"] for r in
                  t.read().filter(F.col("id").between(25, 39)).collect())
    assert sorted(r["id"] for r in
                  t.read_where("id", 25, 39).collect()) == want


def test_targeted_compaction_carries_manifests(spark, tmp_base):
    t = ManagedTable(spark, os.path.join(tmp_base, "tc"),
                     partition_by=["p"])
    t.overwrite(spark.range(40).select(
        F.col("id"), (F.col("id") % 2).alias("p")))
    t.analyze(("id",))
    for i in range(3):      # pile small files into p=0 via appends
        t.append(spark.range(40 + 10 * i, 50 + 10 * i).select(
            F.col("id"), F.lit(0).alias("p")))
    t.compact_partitions(["p=0"], target_files=1)
    stats = t._load_stats(t.current_version())
    assert stats is not None
    assert len(stats["files"]) == len(t._live_files(t.current_version()))
    want = sorted(r["id"] for r in
                  t.read().filter(F.col("id").between(35, 55)).collect())
    assert sorted(r["id"] for r in
                  t.read_where("id", 35, 55).collect()) == want


def test_scd2_merge_carries_manifests(spark, tmp_base):
    from tb_lakehouse_enhanced_spark.operators.merge import ScdConfig
    t = ManagedTable(spark, os.path.join(tmp_base, "s2"),
                     partition_by=("_tf_is_current",))
    cfg = ScdConfig(keys=("id",), tracked=("v",))
    src1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    t.scd2_merge_into(src1, cfg, load_ts="2024-01-01")
    t.analyze(("id",))
    src2 = spark.createDataFrame([(1, "a2"), (3, "c")], "id long, v string")
    t.scd2_merge_into(src2, cfg, load_ts="2024-02-01")
    stats = t._load_stats(t.current_version())
    assert stats is not None
    # the manifest covers the rewritten current slice AND the newly
    # closed history rows — count matches the live set exactly
    assert len(stats["files"]) == len(t._live_files(t.current_version()))
    want = sorted((r["id"], r["v"]) for r in t.read()
                  .filter(F.col("id").between(1, 2)).collect())
    got = sorted((r["id"], r["v"])
                 for r in t.read_where("id", 1, 2).collect())
    assert got == want and len(got) == 3    # a, a2, b
