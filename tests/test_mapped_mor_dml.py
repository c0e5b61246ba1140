"""Partition-scoped DML on a parent with BOTH a live column map AND
merge-on-read debt (VERDICT r10 ask #1).

Pre-r11 this composition was the LAST documented O(table) cliff on an
O(touched) logical path: ``_partial_rewrite`` materialized the whole
table whenever a live map coexisted with outstanding tombstones/
deltas. The sequence ALTER -> streaming-CDC MOR sync ->
partition-scoped UPDATE is exactly the steady state of an evolved
replica; Delta pays O(touched) there. Now the MOR carry-subtraction
runs on the PHYSICAL plane — partition predicates are physical
as-is (partition columns are identity-mapped; ``evolve_schema``
through the SQL surface refuses partition-column renames) and the
logical tombstone keys translate through the map — so
``stable_partitions=True`` DML on a mapped+MOR head rewrites only the
touched partitions.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _evolve(t, rename=None, add=None):
    cmap = t.identity_column_map()
    if rename:
        for e in cmap:
            if e[1] == rename[0]:
                e[1] = rename[1]
    if add:
        cmap.append([None, add[0], add[1]])
    return t.evolve_schema(cmap, "EVOLVE")


def _mapped_mor_table(spark, path):
    """ALTER (rename + add) -> CDC-style MOR sync (upsert + delete):
    the evolved-replica steady state."""
    t = ManagedTable(spark, path, partition_by=("pt",))
    t.overwrite(spark.createDataFrame(
        [(1, "a", 1.0, "x"), (2, "b", 2.0, "x"),
         (3, "c", 3.0, "y"), (4, "d", 4.0, "y"),
         (5, "e", 5.0, "z")],
        "id long, s string, score double, pt string"))
    _evolve(t, rename=("s", "name"))
    _evolve(t, add=("extra", "int"))
    t.upsert_mor(spark.createDataFrame(
        [(2, "B", 2.5, "x", 9), (6, "f", 6.0, "y", None)],
        "id long, name string, score double, pt string, extra int"),
        ("id",))
    t.delete_mor(F.col("id") == 4, key_cols=("id",))
    return t


def _inodes(path):
    return {f: os.stat(f).st_ino
            for f in glob.glob(f"{path}/**/*.parquet", recursive=True)}


def test_mapped_mor_partition_update_is_partition_scoped(spark, tmp_base):
    t = _mapped_mor_table(spark, f"{tmp_base}/t")
    before = _inodes(t.path)
    base_files_before = {f for f in before
                         if "/delta_v" not in f and "/tomb_v" not in f}
    t.update(F.col("id") == 1, {"name": F.lit("A")},
             stable_partitions=True)
    meta = t._commit(t.current_version())
    # partition-scoped, NOT a materialize
    assert meta.get("partitions_rewritten") == ["pt=x"], meta.get("op")
    assert meta.get("column_map"), "the map was materialized away"
    # untouched partitions' base files hardlinked, not copied: every
    # pre-existing base file outside pt=x survives by inode
    after = _inodes(t.path)
    for f in base_files_before:
        if "/pt=x/" in f:
            continue
        linked = [g for g, ino in after.items()
                  if ino == before[f] and g != f]
        assert os.stat(f).st_ino == before[f]
        assert linked, f"untouched file {f} was not hardlinked forward"
    # semantics: update applied, MOR state still resolves
    assert _rows(t.read()) == [
        (1, "A", 1.0, "x", None), (2, "B", 2.5, "x", 9),
        (3, "c", 3.0, "y", None), (5, "e", 5.0, "z", None),
        (6, "f", 6.0, "y", None)]


def test_mapped_mor_partition_update_differential_vs_compact_first(
        spark, tmp_base):
    """The mapped+MOR partition-scoped route reads exactly what the
    compact-first (materialize) route produces, across updates and
    deletes touching tombstoned, delta-shadowed, and untouched keys."""
    fast = _mapped_mor_table(spark, f"{tmp_base}/fast")
    slow = _mapped_mor_table(spark, f"{tmp_base}/slow")
    slow.compact()      # the pre-r11 shape: purge map + debt first
    for apply in (
        lambda t: t.update(F.col("id") == 2, {"extra": F.lit(7)},
                           stable_partitions=True),
        lambda t: t.delete(F.col("id") == 3, stable_partitions=True),
        lambda t: t.update(F.col("pt") == "z",
                           {"score": F.col("score") * 2},
                           stable_partitions=True),
    ):
        apply(fast)
        apply(slow)
        cols = ["id", "name", "score", "pt", "extra"]
        assert _rows(fast.read().select(*cols)) == \
            _rows(slow.read().select(*cols))
    # the fast table kept its map live the whole way
    assert fast._commit(fast.current_version()).get("column_map")
    # a re-inserted key in a REWRITTEN partition must not be re-deleted
    # by a carried tombstone (the carry subtracted its key)
    fast_del = _mapped_mor_table(spark, f"{tmp_base}/fdel")
    slow_del = _mapped_mor_table(spark, f"{tmp_base}/sdel")
    slow_del.compact()
    for t in (fast_del, slow_del):
        # id=4 was tombstoned in pt=y; a partition-scoped update of
        # pt=y rewrites the partition post-tombstone — id=4 stays gone
        t.update(F.col("pt") == "y", {"extra": F.lit(1)},
                 stable_partitions=True)
    cols = ["id", "name", "score", "pt", "extra"]
    assert _rows(fast_del.read().select(*cols)) == \
        _rows(slow_del.read().select(*cols))
    assert not any(r[0] == 4 for r in fast_del.read().collect())


def test_mapped_mor_delete_keeps_untouched_mor_state(spark, tmp_base):
    """Carried deltas/tombstones keep shadowing UNTOUCHED partitions
    after a mapped partition-scoped delete elsewhere."""
    t = _mapped_mor_table(spark, f"{tmp_base}/t")
    t.delete(F.col("pt") == "z", stable_partitions=True)
    meta = t._commit(t.current_version())
    assert meta.get("partitions_rewritten") == ["pt=z"]
    assert meta.get("column_map")
    # pt=x's delta upsert (2 -> B/2.5/9) and pt=y's tombstone (id=4)
    # still resolve
    assert _rows(t.read()) == [
        (1, "a", 1.0, "x", None), (2, "B", 2.5, "x", 9),
        (3, "c", 3.0, "y", None), (6, "f", 6.0, "y", None)]
    # and a later compact converges to the same state (column order
    # aside: a materialized partitioned read lists pt last)
    cols = ["id", "name", "score", "pt", "extra"]
    expect = _rows(t.read().select(*cols))
    t.compact()
    assert _rows(t.read().select(*cols)) == expect


def test_mapped_mor_merge_into_stays_partition_scoped(spark, tmp_base):
    from tb_lakehouse_enhanced_spark.operators.merge import ScdConfig
    t = _mapped_mor_table(spark, f"{tmp_base}/t")
    src = spark.createDataFrame(
        [(1, "A+", 1.5, "x", 3), (7, "g", 7.0, "x", 4)],
        "id long, name string, score double, pt string, extra int")
    t.merge_into(src, ScdConfig(keys=("id",), tracked=("name",)),
                 "2024-01-02 00:00:00", stable_partitions=True)
    meta = t._commit(t.current_version())
    assert meta.get("partitions_rewritten") == ["pt=x"]
    assert meta.get("column_map"), "merge materialized the map"
    assert _rows(t.read()) == [
        (1, "A+", 1.5, "x", 3), (2, "B", 2.5, "x", 9),
        (3, "c", 3.0, "y", None), (5, "e", 5.0, "z", None),
        (6, "f", 6.0, "y", None), (7, "g", 7.0, "x", 4)]
