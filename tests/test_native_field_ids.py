"""Native parquet field ids in engine-written files (VERDICT r12 #3).

``managed._stamp_field_ids`` attaches the Iceberg mirror's field ids
as ``parquet.field.id`` column metadata, so Spark stamps
``PARQUET:field_id`` into every footer the engine writes.  Files then
resolve by id — the spec's primary rule — and NEW tables emit no
``schema.name-mapping.default`` at all, retiring the name-collision
class (DROP-then-re-ADD resurrection) the mapping had to guard.
Legacy tables (files written before stamping) keep the mapping.
"""

from __future__ import annotations

import glob
import json
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.sources.iceberg import (
    current_metadata,
    read_iceberg,
)
from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable


def _footer_ids(path_glob: str) -> dict[str, int]:
    f = sorted(glob.glob(path_glob, recursive=True))[0]
    out = {}
    for fld in pq.read_schema(f):
        raw = (fld.metadata or {}).get(b"PARQUET:field_id")
        if raw is not None:
            out[fld.name] = int(raw)
    return out


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"),
        F.concat(F.lit("r"), (F.col("id") % 3)).alias("p"),
        (F.col("id") * 2).alias("val"))


def test_every_write_path_stamps_ids(spark, tmp_base):
    t = ManagedTable(spark, os.path.join(tmp_base, "t"),
                     partition_by=("p",))
    t.overwrite(_mk(spark, 0, 12))
    t.append(_mk(spark, 12, 18))
    t.delete_mor(F.col("id") == 1, key_cols=("id",))
    t.update(F.col("p") == "r1", {"val": F.lit(-1)})
    doc = current_metadata(t.path)
    schema = next(s for s in doc["schemas"]
                  if s["schema-id"] == doc["current-schema-id"])
    by_name = {f["name"]: f["id"] for f in schema["fields"]}
    # overwrite dir, append batch dir, tombstone dir, rewrite dir all
    # carry footer ids that MATCH the mirror schema
    for pat, cols in [
        (os.path.join(t.path, "v0", "**", "*.parquet"),
         ("id", "val")),
        (os.path.join(t.path, "v1-a*", "**", "*.parquet"),
         ("id", "val")),
        (os.path.join(t.path, "tomb_v*", "*.parquet"), ("id",)),
    ]:
        ids = _footer_ids(pat)
        for c in cols:
            assert ids.get(c) == by_name[c], (pat, c, ids, by_name)


def test_new_table_emits_no_name_mapping(spark, tmp_base):
    t = ManagedTable(spark, os.path.join(tmp_base, "nm"))
    t.overwrite(spark.range(0, 8).select(
        F.col("id"), (F.col("id") * 3).alias("v")))
    t.append(spark.range(8, 12).select(
        F.col("id"), (F.col("id") * 3).alias("v")))
    doc = current_metadata(t.path)
    assert "schema.name-mapping.default" not in doc["properties"]
    eng = sorted(map(tuple, t.read().collect()))
    ice = sorted(map(tuple,
                     read_iceberg(spark, t.path)
                     .select("id", "v").collect()))
    assert eng == ice


def test_legacy_table_keeps_name_mapping(spark, tmp_base, monkeypatch):
    path = os.path.join(tmp_base, "lg")
    monkeypatch.setenv("TB_LAKEHOUSE_ICEBERG_MIRROR", "0")
    t = ManagedTable(spark, path)
    t.overwrite(spark.range(0, 8).select(
        F.col("id"), (F.col("id") * 3).alias("v")))
    monkeypatch.setenv("TB_LAKEHOUSE_ICEBERG_MIRROR", "1")
    t.append(spark.range(8, 12).select(
        F.col("id"), (F.col("id") * 3).alias("v")))
    doc = current_metadata(path)
    # the probe saw unstamped v0 files: the cumulative mapping stays
    assert "schema.name-mapping.default" in doc["properties"]
    eng = sorted(map(tuple, t.read().collect()))
    ice = sorted(map(tuple, read_iceberg(spark, path)
                     .select("id", "v").collect()))
    assert eng == ice


def test_rename_era_resolution_by_id_only(spark, tmp_base):
    t = ManagedTable(spark, os.path.join(tmp_base, "rn"))
    t.overwrite(spark.range(0, 6).select(
        F.col("id"), (F.col("id") * 2).alias("v")))
    cmap = t.identity_column_map()
    for e in cmap:
        if e[1] == "v":
            e[1] = "w"
    t.evolve_schema(cmap, "RENAME COLUMN")
    t.append(spark.range(6, 9).select(
        F.col("id"), (F.col("id") * 2).alias("w")))
    doc = current_metadata(t.path)
    assert "schema.name-mapping.default" not in doc["properties"]
    eng = sorted(map(tuple, t.read().select("id", "w").collect()))
    ice = sorted(map(tuple, read_iceberg(spark, t.path)
                     .select("id", "w").collect()))
    assert eng == ice
    # old files' w-values resolve via id 2 stamped as "v"
    assert [x for x in eng if x[0] < 6] == [(i, i * 2)
                                            for i in range(6)]


def test_drop_readd_no_resurrection_without_mapping(spark, tmp_base):
    t = ManagedTable(spark, os.path.join(tmp_base, "dr"))
    t.overwrite(spark.range(0, 6).select(
        F.col("id"), (F.col("id") * 2).alias("v")))
    cmap = [e for e in t.identity_column_map() if e[1] != "v"]
    t.evolve_schema(cmap, "DROP COLUMN")
    cmap2 = t.identity_column_map() + [[None, "v", "long"]]
    t.evolve_schema(cmap2, "ADD COLUMNS")
    doc = current_metadata(t.path)
    assert "schema.name-mapping.default" not in doc["properties"]
    ice = read_iceberg(spark, t.path)
    # pre-drop files claim "v" under the OLD id: the fresh id must not
    # resurrect their values through the shared name
    assert ice.filter(F.col("v").isNotNull()).count() == 0


def test_stamped_ids_survive_compact_and_restore(spark, tmp_base):
    t = ManagedTable(spark, os.path.join(tmp_base, "cr"))
    t.overwrite(spark.range(0, 10).select(
        F.col("id"), (F.col("id") * 2).alias("v")))
    t.delete_mor(F.col("id") < 2, key_cols=("id",))
    t.compact()
    with open(os.path.join(t.path, "metadata",
                           "_mirror_state.json")) as f:
        st = json.load(f)
    assert st.get("native_ids") is True
    eng = sorted(map(tuple, t.read().collect()))
    ice = sorted(map(tuple, read_iceberg(spark, t.path)
                     .select("id", "v").collect()))
    assert eng == ice
    t.restore(0)
    eng = sorted(map(tuple, t.read().collect()))
    ice = sorted(map(tuple, read_iceberg(spark, t.path)
                     .select("id", "v").collect()))
    assert eng == ice and len(eng) == 10
