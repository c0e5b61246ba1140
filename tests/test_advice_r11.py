"""Round-11 advisory regression tests.

Each test pins one of the round-10 ADVICE findings:

1. (high) Partition-scoped rewrites under a LIVE column map (UPDATE /
   DELETE WHERE, partitioned MERGE, OPTIMIZE ... WHERE) must emit real
   add/remove actions to the Delta mirror — pre-fix their commit meta
   (``column_map`` set, ``added_files`` None) matched the
   metadata-only ALTER branch of ``_emit_delta_log`` and the mirror
   replayed the STALE pre-DML files (external ``read_delta`` diverged
   from ``table.read()``).
2. (low) Identity-reserving INSERT unpersists its batch after the
   append (previously leaked one cached DataFrame per statement).
3. (low) MERGE-assigned identity ids route through the same
   flock-guarded ``reserve_identity`` high-water counter as INSERTs,
   so a MERGE racing a reserved INSERT can never mint the same ids.
4. (low) Streaming over a mapped table whose ALTER added a
   complex-typed column (array/map/struct): the session-free DDL
   parser handles nested types instead of raising
   CANNOT_PARSE_DATATYPE before the first post-ALTER batch lands.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.sources.deltaread import read_delta
from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable
from tb_lakehouse_enhanced_spark.sqlfront import LakehouseSql


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _evolve_rename(t, old, new):
    cmap = t.identity_column_map()
    for e in cmap:
        if e[1] == old:
            e[1] = new
    return t.evolve_schema(cmap, "RENAME COLUMN")


def _mapped_part_table(spark, path):
    t = ManagedTable(spark, path, partition_by=("pt",))
    t.overwrite(spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "x"), (3, "c", "y")],
        "id long, s string, pt string"))
    _evolve_rename(t, "s", "name")
    return t


# -- 1 (high): mapped partition-scoped rewrites replay externally -------------

def test_mapped_partition_update_replays_in_mirror(spark, tmp_base):
    t = _mapped_part_table(spark, f"{tmp_base}/t")
    t.update(F.col("id") == 2, {"name": F.lit("B")})
    assert _rows(t.read()) == [(1, "a", "x"), (2, "B", "x"),
                               (3, "c", "y")]
    # pre-fix: the mirror entry was metadata-only and replay returned
    # the stale pre-update row (2, 'b', 'x')
    assert _rows(read_delta(spark, t.path)) == _rows(t.read())
    # and the commit stayed partition-scoped (not a materialize)
    meta = t._commit(t.current_version())
    assert meta.get("partitions_rewritten") == ["pt=x"]
    assert meta.get("column_map")


def test_mapped_partition_delete_replays_in_mirror(spark, tmp_base):
    t = _mapped_part_table(spark, f"{tmp_base}/t")
    t.delete(F.col("name") == "c")
    assert _rows(t.read()) == [(1, "a", "x"), (2, "b", "x")]
    assert _rows(read_delta(spark, t.path)) == _rows(t.read())


def test_mapped_optimize_where_replays_in_mirror(spark, tmp_path):
    lake = LakehouseSql(spark, str(tmp_path / "lake"))
    lake.sql("CREATE TABLE adv.t (id INT, s STRING, pt STRING) "
             "PARTITIONED BY (pt)")
    lake.sql("INSERT INTO adv.t VALUES (1, 'a', 'x'), (2, 'b', 'y')")
    lake.sql("INSERT INTO adv.t VALUES (3, 'c', 'x')")
    lake.sql("ALTER TABLE adv.t RENAME COLUMN s TO name")
    lake.sql("OPTIMIZE adv.t WHERE pt = 'x'")
    t = lake.table("adv.t")
    assert t._commit(t.current_version()).get("column_map")
    assert _rows(read_delta(spark, t.path)) == _rows(t.read())


def test_mapped_partitioned_merge_replays_in_mirror(spark, tmp_path):
    lake = LakehouseSql(spark, str(tmp_path / "lake"))
    lake.sql("CREATE TABLE adv.m (id INT, s STRING, pt STRING) "
             "PARTITIONED BY (pt)")
    lake.sql("INSERT INTO adv.m VALUES (1, 'a', 'x'), (2, 'b', 'y')")
    lake.sql("ALTER TABLE adv.m RENAME COLUMN s TO name")
    lake.sql("CREATE TABLE adv.src (id INT, name STRING, pt STRING)")
    lake.sql("INSERT INTO adv.src VALUES (1, 'A', 'x'), (9, 'z', 'x')")
    lake.sql("MERGE INTO adv.m AS tgt USING adv.src AS src "
             "ON tgt.id = src.id AND tgt.pt = src.pt "
             "WHEN MATCHED THEN UPDATE SET tgt.name = src.name "
             "WHEN NOT MATCHED THEN INSERT *")
    t = lake.table("adv.m")
    assert _rows(t.read().select("id", "name")) == [
        (1, "A"), (2, "b"), (9, "z")]
    assert _rows(read_delta(spark, t.path)) == _rows(t.read())
