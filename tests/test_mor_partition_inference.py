"""MOR state vs hive partition-type inference (r12 engine fix).

A STRING partition column holding all-numeric values ("1", "2") gets
int-inferred by hive partition discovery on the BASE scan, while a
user's MOR batch carries the string physically.  The resolver pins
the base schema onto the delta/tombstone scans, so the drift used to
crash the read (SchemaColumnConvertNotSupportedException: BINARY vs
int).  ``upsert_mor`` / ``delete_mor_keys`` now align the written
state to the base scan's dtypes, the way an INSERT into a typed table
would.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable


def _mk(spark, lo, hi, val=None):
    return spark.range(lo, hi).select(
        F.col("id"),
        (F.col("id") % 4).cast("string").alias("region"),   # "0".."3"
        (F.lit(val).cast("long") if val is not None
         else F.col("id") * 2).alias("v"))


def test_numeric_string_partition_survives_mor(spark, tmp_base):
    t = ManagedTable(spark, os.path.join(tmp_base, "t"),
                     partition_by=("region",))
    t.overwrite(_mk(spark, 0, 40))
    # upsert whose region column is a numeric STRING — pre-fix this
    # crashed every later read
    t.upsert_mor(_mk(spark, 10, 20, 999), key_cols=("id",))
    t.delete_mor_keys(spark.range(0, 5).select("id"), key_cols=("id",))
    rows = {(r.id, r.v) for r in t.read().collect()}
    expected = {(i, 999 if 10 <= i < 20 else i * 2)
                for i in range(5, 40)}
    assert rows == expected
    # partition column surfaces with the base scan's inferred type
    assert dict(t.read().dtypes)["region"] in ("int", "bigint")
    # CoW resolution of the same state materializes identically
    t.compact()
    assert {(r.id, r.v) for r in t.read().collect()} == expected


def test_mapped_numeric_string_partition_survives_mor(spark, tmp_base):
    t = ManagedTable(spark, os.path.join(tmp_base, "m"),
                     partition_by=("region",))
    t.overwrite(_mk(spark, 0, 30))
    cmap = t.identity_column_map()
    for e in cmap:
        if e[1] == "v":
            e[1] = "val"
    t.evolve_schema(cmap, "RENAME COLUMN")
    t.upsert_mor(
        _mk(spark, 5, 10, 777).withColumnRenamed("v", "val"),
        key_cols=("id",))
    rows = {(r.id, r.val) for r in t.read().collect()}
    expected = {(i, 777 if 5 <= i < 10 else i * 2) for i in range(30)}
    assert rows == expected
