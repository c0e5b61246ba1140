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


# -- 2 (low): identity INSERT unpersists its batch ----------------------------

def test_identity_insert_leaves_no_cached_blocks(spark, tmp_path):
    lake = LakehouseSql(spark, str(tmp_path / "lake"))
    lake.sql("CREATE TABLE adv.ident (id BIGINT GENERATED ALWAYS AS "
             "IDENTITY, s STRING)")
    spark.catalog.clearCache()
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    lake.sql("INSERT INTO adv.ident (s) VALUES ('a'), ('b')")
    lake.sql("INSERT INTO adv.ident (s) VALUES ('c')")
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after == before, (before, after,
                             "identity INSERT leaked cached blocks")
    t = lake.table("adv.ident")
    assert sorted(r["id"] for r in t.read().collect()) == [1, 2, 3]


# -- 3 (low): MERGE identity routes through the reservation counter -----------

def test_merge_identity_respects_inflight_insert_reservation(
        spark, tmp_path):
    """An in-flight identity INSERT holds a reserved (uncommitted) slot
    range; a MERGE assigning new ids must consult the same counter and
    mint PAST the reservation — pre-fix it read only the snapshot max
    and duplicated the in-flight ids."""
    lake = LakehouseSql(spark, str(tmp_path / "lake"))
    lake.sql("CREATE TABLE adv.m (id BIGINT GENERATED ALWAYS AS "
             "IDENTITY, k INT, s STRING)")
    lake.sql("INSERT INTO adv.m (k, s) VALUES (1, 'a'), (2, 'b')")
    t = lake.table("adv.m")
    # simulate a racing INSERT that reserved [2, 5) but has not
    # committed yet (its rows are invisible to the MERGE's snapshot)
    t.reserve_identity("id", 3, 2)
    lake.sql("CREATE TABLE adv.src (k INT, s STRING)")
    lake.sql("INSERT INTO adv.src VALUES (2, 'B'), (9, 'z')")
    lake.sql("MERGE INTO adv.m AS tgt USING adv.src AS src "
             "ON tgt.k = src.k "
             "WHEN MATCHED THEN UPDATE SET tgt.s = src.s "
             "WHEN NOT MATCHED THEN INSERT (k, s) VALUES (src.k, src.s)")
    ids = {r["k"]: r["id"] for r in t.read().collect()}
    # the merge-inserted row's id is PAST the reservation, not id 3
    assert ids[9] >= 6, (ids, "MERGE minted an id inside an in-flight "
                              "INSERT's reserved range")
    # counter advanced past the merge's own assignment too
    import json as _json
    with open(t._identity_file("id")) as f:
        assert _json.load(f)["next_slot"] >= ids[9]


def test_merge_then_insert_ids_stay_dense_and_disjoint(spark, tmp_path):
    """Race-free sequential statements keep the dense id sequence the
    oracles expect (exact-count reservation), and a following reserving
    INSERT continues past the merge's ids."""
    lake = LakehouseSql(spark, str(tmp_path / "lake"))
    lake.sql("CREATE TABLE adv.d (id BIGINT GENERATED ALWAYS AS "
             "IDENTITY, k INT)")
    lake.sql("CREATE TABLE adv.dsrc (k INT)")
    lake.sql("INSERT INTO adv.dsrc VALUES (1), (2), (3)")
    lake.sql("MERGE INTO adv.d AS tgt USING adv.dsrc AS src "
             "ON tgt.k = src.k "
             "WHEN NOT MATCHED THEN INSERT (k) VALUES (src.k)")
    lake.sql("INSERT INTO adv.d (k) VALUES (4), (5)")
    t = lake.table("adv.d")
    assert sorted(r["id"] for r in t.read().collect()) == [1, 2, 3, 4, 5]


# -- 4 (low): complex DDL types in the session-free stream schema -------------

def test_type_from_ddl_complex_types():
    from pyspark.sql.types import (
        ArrayType, DecimalType, IntegerType, MapType, StringType,
        StructField, StructType,
    )
    from tb_lakehouse_enhanced_spark.sources.tablestream import (
        _type_from_ddl,
    )
    assert _type_from_ddl("array<int>") == ArrayType(IntegerType())
    assert _type_from_ddl("map<string, decimal(10,2)>") == MapType(
        StringType(), DecimalType(10, 2))
    assert _type_from_ddl("struct<a:int, b:array<string>>") == StructType(
        [StructField("a", IntegerType()),
         StructField("b", ArrayType(StringType()))])
    assert _type_from_ddl(
        "array<struct<x:map<string,int>, y:string>>") == ArrayType(
        StructType([StructField("x", MapType(StringType(),
                                             IntegerType())),
                    StructField("y", StringType())]))


def test_stream_schema_survives_complex_added_column(spark, tmp_base):
    """ALTER ADD COLUMN of a complex type under a live map: the
    session-free schema derivation must work BEFORE any post-ALTER
    batch lands (pre-fix: CANNOT_PARSE_DATATYPE)."""
    from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable
    from tb_lakehouse_enhanced_spark.sources.tablestream import (
        _table_schema,
    )
    t = ManagedTable(spark, f"{tmp_base}/t")
    t.overwrite(spark.createDataFrame([(1, "a")], "id long, s string"))
    cmap = t.identity_column_map() + [
        [None, "tags", "array<string>"],
        [None, "attrs", "map<string,int>"],
        [None, "nested", "struct<a:int,b:array<string>>"]]
    t.evolve_schema(cmap, "ADD COLUMNS")
    schema = _table_schema(t.path)
    names = {f.name: f.dataType.simpleString() for f in schema.fields}
    assert names["tags"] == "array<string>"
    assert names["attrs"] == "map<string,int>"
    assert names["nested"] == "struct<a:int,b:array<string>>"
