"""Legacy (pre-r10) None-phys column maps upgrade IN PLACE
(VERDICT r10 ask #6).

A legacy map entry ``[None, name, type]`` is an ADDED column that was
never assigned a physical name — it exists in NO file, so reading it
as a typed NULL through the superset scan schema is byte-identical to
the legacy ``lit(NULL)`` projection. Pre-r11, every write path hitting
such a map fell back to an O(table) materialize/compact (append,
MOR upsert/delete, partition DML) or refused (compact_partitions).
Now ``_upgrade_legacy_map`` assigns deterministic, collision-checked
physical names at the writer's next commit — no data touched, no extra
commit — and those fallback branches are deleted.

Legacy layouts are SYNTHESIZED here by rewriting a commit file's map
entry back to None-phys (exactly the pre-r10 on-disk shape: the ALTER
committed, no data write since).
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _make_legacy(spark, path, partition_by=()):
    """Table with an ADD-COLUMN evolution whose commit is rewritten to
    the legacy None-phys layout."""
    t = ManagedTable(spark, path, partition_by=partition_by)
    rows = [(1, "a", "x"), (2, "b", "y")] if partition_by else \
        [(1, "a"), (2, "b")]
    schema = "id long, s string" + (", pt string" if partition_by else "")
    t.overwrite(spark.createDataFrame(rows, schema))
    cmap = t.identity_column_map() + [[None, "extra", "int"]]
    t.evolve_schema(cmap, "ADD COLUMNS")
    cf = t._commit_file(t.current_version())
    with open(cf) as f:
        meta = json.load(f)
    for e in meta["column_map"]:
        if e[1] == "extra":
            e[0] = None                 # back to the pre-r10 shape
    with open(cf, "w") as f:
        json.dump(meta, f)
    assert any(p is None for p, _l, _t in
               t.column_map())          # synthesized legacy layout
    return t


def test_append_upgrades_legacy_map_at_o_batch(spark, tmp_base):
    t = _make_legacy(spark, f"{tmp_base}/t")
    root0 = t._materialized_root(t.current_version())
    before = {f: os.stat(f).st_ino for f in
              glob.glob(f"{t.path}/**/*.parquet", recursive=True)}
    t.append(spark.createDataFrame([(3, "c", 7)],
                                   "id long, s string, extra int"))
    meta = t._commit(t.current_version())
    # O(batch): an append commit, not a materialize; chain bottom same
    assert meta.get("added_files")
    assert t._materialized_root(t.current_version()) == root0
    # zero pre-existing files touched
    for f, ino in before.items():
        assert os.stat(f).st_ino == ino
    # the map upgraded: every entry now carries a physical name
    assert all(p is not None for p, _l, _t in meta["column_map"])
    assert _rows(t.read()) == [(1, "a", None), (2, "b", None),
                               (3, "c", 7)]
    # the OLD (legacy) version still reads through the None-phys path
    assert _rows(t.read(t.current_version() - 1)) == [
        (1, "a", None), (2, "b", None)]


def test_mor_writes_upgrade_legacy_map_without_compact(spark, tmp_base):
    t = _make_legacy(spark, f"{tmp_base}/t")
    root0 = t._materialized_root(t.current_version())
    t.upsert_mor(spark.createDataFrame(
        [(2, "B", 5), (4, "d", None)], "id long, s string, extra int"),
        ("id",))
    meta = t._commit(t.current_version())
    assert meta.get("deltas"), "MOR upsert degraded to a rewrite"
    assert all(p is not None for p, _l, _t in meta["column_map"])
    assert t._materialized_root(t.current_version()) == root0
    t.delete_mor(F.col("id") == 1, key_cols=("id",))
    assert t._materialized_root(t.current_version()) == root0
    assert _rows(t.read()) == [(2, "B", 5), (4, "d", None)]
    # convergence: compacting yields the same state
    expect = _rows(t.read())
    t.compact()
    assert _rows(t.read()) == expect


def test_partition_dml_upgrades_legacy_map_partition_scoped(
        spark, tmp_base):
    t = _make_legacy(spark, f"{tmp_base}/t", partition_by=("pt",))
    t.update(F.col("id") == 1, {"extra": F.lit(9)})
    meta = t._commit(t.current_version())
    # pre-r11: full materialize; now partition-scoped with the map live
    assert meta.get("partitions_rewritten") == ["pt=x"]
    assert all(p is not None for p, _l, _t in meta["column_map"])
    assert _rows(t.read()) == [(1, "a", "x", 9), (2, "b", "y", None)]


def test_compact_partitions_accepts_legacy_map(spark, tmp_base):
    t = _make_legacy(spark, f"{tmp_base}/t", partition_by=("pt",))
    t.compact_partitions(["pt=x"])      # pre-r11: raised ValueError
    meta = t._commit(t.current_version())
    assert all(p is not None for p, _l, _t in meta["column_map"])
    assert _rows(t.read()) == [(1, "a", "x", None), (2, "b", "y", None)]


def test_upgrade_is_deterministic_and_collision_checked(spark, tmp_base):
    t = _make_legacy(spark, f"{tmp_base}/t")
    parent = t._commit(t.current_version())
    up1 = t._upgrade_legacy_map(parent, t.current_version())
    up2 = t._upgrade_legacy_map(parent, t.current_version())
    assert up1 == up2                   # deterministic under races
    # collision: retire the name the upgrade would pick; it must dodge
    parent2 = {**parent,
               "phys_retired": sorted(set(parent.get("phys_retired")
                                          or []) | {"extra"})}
    up3 = t._upgrade_legacy_map(parent2, t.current_version())
    phys = {lg: p for p, lg, _t in up3}
    assert phys["extra"] not in ("extra", None)
