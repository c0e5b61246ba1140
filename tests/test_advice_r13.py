"""Regression pins for the round-13 ADVICE items.

1. ``after_vacuum`` + a tag on the CURRENT version used to retain the
   pre-vacuum snapshot AND emit the replace snapshot under the same
   snapshot id / sequence — a spec violation that made ``read_iceberg``
   resolve the stale pre-vacuum record and blocked manifest GC.
2. MOR dtype alignment (``upsert_mor``/``delete_mor_keys``) used to
   cast silently, so an un-castable value (non-numeric string into an
   int-inferred partition column) became a NULL key/row.
3. Partition bounds for int-typed source columns serialized as 8-byte
   little-endian; the spec's single-value serialization is 4 bytes.
4. ``read_iceberg`` read every parquet footer serially on the driver;
   past DRIVER_FANOUT_THRESHOLD it now fans out one Spark job.
5. ``read_iceberg`` raised a bare StopIteration on
   ``current-snapshot-id == -1`` (empty table) or an unknown snapshot
   id instead of an empty DataFrame / a clear ValueError.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.sources.avroio import read_ocf
from tb_lakehouse_enhanced_spark.sources.iceberg import (
    current_metadata,
    read_iceberg,
)
from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") % 3).alias("p"),
        (F.col("id") * 2).alias("v"))


def _rows(df):
    return {tuple(r) for r in df.collect()}


# -- 1: vacuum with the current version tagged -------------------------------

def test_vacuum_with_current_tag_keeps_snapshot_ids_unique(
        spark, tmp_base):
    t = ManagedTable(spark, os.path.join(tmp_base, "vt"),
                     partition_by=("p",))
    t.overwrite(_mk(spark, 0, 12))
    t.append(_mk(spark, 12, 18))
    t.overwrite(t.read())                 # materialize into a new dir
    t.tag("release")                      # pins the CURRENT version
    removed = t.vacuum(retain_last=1, orphan_hours=0)
    assert removed, "vacuum must actually reclaim a version dir"
    doc = current_metadata(t.path)
    ids = [s["snapshot-id"] for s in doc["snapshots"]]
    assert len(ids) == len(set(ids)), f"duplicate snapshot ids: {ids}"
    seqs = [s["sequence-number"] for s in doc["snapshots"]]
    assert len(seqs) == len(set(seqs)), \
        f"two snapshots at one sequence: {seqs}"
    # the current snapshot is the post-vacuum replace record, and the
    # tag resolves to it (same logical state, re-pointed manifests)
    cur = next(s for s in doc["snapshots"]
               if s["snapshot-id"] == doc["current-snapshot-id"])
    assert cur["summary"]["operation"] == "replace"
    assert doc["refs"]["release"]["snapshot-id"] == cur["snapshot-id"]
    eng = t.read()
    for kwargs in ({}, {"ref": "release"},
                   {"snapshot_id": cur["snapshot-id"]}):
        ice = read_iceberg(spark, t.path, **kwargs)
        assert _rows(ice.select(*eng.columns)) == _rows(eng)
    # gc really dropped the stale pre-vacuum manifests: every .avro on
    # disk is referenced from the retained snapshots
    referenced = set()
    for s in doc["snapshots"]:
        referenced.add(os.path.basename(s["manifest-list"]))
        for mf in read_ocf(s["manifest-list"])[2]:
            referenced.add(os.path.basename(mf["manifest_path"]))
    on_disk = {fn for fn in os.listdir(os.path.join(t.path, "metadata"))
               if fn.endswith(".avro")}
    assert on_disk == referenced


def test_vacuum_with_older_tag_still_retains_it(spark, tmp_base):
    t = ManagedTable(spark, os.path.join(tmp_base, "vt2"),
                     partition_by=("p",))
    t.overwrite(_mk(spark, 0, 12))
    t.tag("old")                          # pins v0
    t.append(_mk(spark, 12, 18))
    t.overwrite(t.read())
    t.vacuum(retain_last=1, orphan_hours=0)
    doc = current_metadata(t.path)
    ids = [s["snapshot-id"] for s in doc["snapshots"]]
    assert len(ids) == len(set(ids))
    assert "old" in doc["refs"]
    eng = t.read_tag("old")
    ice = read_iceberg(spark, t.path, ref="old")
    assert _rows(ice.select(*eng.columns)) == _rows(eng)


# -- 2: MOR alignment casts must not silently null values --------------------

def _mk_strpart(spark, lo, hi, region_expr):
    return spark.range(lo, hi).select(
        F.col("id"), region_expr.alias("region"),
        (F.col("id") * 2).alias("v"))


def test_upsert_mor_uncastable_value_raises(spark, tmp_base):
    t = ManagedTable(spark, os.path.join(tmp_base, "uc"),
                     partition_by=("region",))
    # numeric-string partition values -> hive int-inference on read
    t.overwrite(_mk_strpart(spark, 0, 20,
                            (F.col("id") % 4).cast("string")))
    bad = _mk_strpart(spark, 5, 8, F.lit("west"))   # not castable
    with pytest.raises(ValueError, match="null non-null"):
        t.upsert_mor(bad, key_cols=("id",))
    # table unchanged — no corrupt delta landed
    assert t.read().count() == 20
    # the documented numeric-string case still works
    t.upsert_mor(_mk_strpart(spark, 5, 8,
                             (F.col("id") % 4).cast("string")),
                 key_cols=("id",))
    assert t.read().count() == 20


def test_delete_mor_keys_uncastable_key_raises(spark, tmp_base):
    t = ManagedTable(spark, os.path.join(tmp_base, "dk"),
                     partition_by=("region",))
    t.overwrite(_mk_strpart(spark, 0, 20,
                            (F.col("id") % 4).cast("string")))
    bad_keys = spark.createDataFrame([("oops",)], "id string")
    with pytest.raises(ValueError, match="null non-null"):
        t.delete_mor_keys(bad_keys, key_cols=("id",))
    assert t.read().count() == 20
    # numeric strings still align and delete
    ok_keys = spark.createDataFrame([("3",), ("4",)], "id string")
    t.delete_mor_keys(ok_keys, key_cols=("id",))
    assert t.read().count() == 18


# -- 3: int partition bounds are 4 bytes -------------------------------------

def test_int_partition_bounds_are_four_bytes(spark, tmp_base):
    t = ManagedTable(spark, os.path.join(tmp_base, "b4"),
                     partition_by=("p",))
    # p is int-typed (hive-inferred int from small values)
    t.overwrite(spark.range(0, 12).select(
        F.col("id"), (F.col("id") % 3).cast("int").alias("p"),
        (F.col("id") * 2).alias("v")))
    doc = current_metadata(t.path)
    schema = next(s for s in doc["schemas"]
                  if s["schema-id"] == doc["current-schema-id"])
    p_type = next(f["type"] for f in schema["fields"]
                  if f["name"] == "p")
    snap = next(s for s in doc["snapshots"]
                if s["snapshot-id"] == doc["current-snapshot-id"])
    _s, _m, manifests = read_ocf(snap["manifest-list"])
    expect = 4 if p_type == "int" else 8
    checked = 0
    for mf in manifests:
        for fs in (mf.get("partitions") or []):
            if fs["lower_bound"] is not None:
                assert len(fs["lower_bound"]) == expect
                assert len(fs["upper_bound"]) == expect
                checked += 1
    assert checked > 0, "no partition summaries with bounds emitted"
    # bounds decode to the actual min/max little-endian
    lo = min(int.from_bytes(fs["lower_bound"], "little", signed=True)
             for mf in manifests for fs in (mf.get("partitions") or [])
             if fs["lower_bound"] is not None)
    assert lo == 0


# -- 4: footer-schema grouping fans out past the threshold -------------------

def test_read_iceberg_footer_fanout_matches_driver_path(
        spark, tmp_base, monkeypatch):
    import tb_lakehouse_enhanced_spark.sources.iceberg as ice_mod
    t = ManagedTable(spark, os.path.join(tmp_base, "ff"))
    t.overwrite(_mk(spark, 0, 30))
    t.append(_mk(spark, 30, 40))
    t.delete_mor_keys(spark.range(0, 3).select("id"),
                      key_cols=("id",))
    eng = t.read()
    baseline = _rows(read_iceberg(spark, t.path).select(*eng.columns))
    monkeypatch.setattr(ice_mod, "DRIVER_FANOUT_THRESHOLD", 0)
    fanned = _rows(read_iceberg(spark, t.path).select(*eng.columns))
    assert fanned == baseline == _rows(eng)


# -- 5: empty-table / unknown-snapshot reads ---------------------------------

def test_read_iceberg_no_current_snapshot_returns_empty(
        spark, tmp_base):
    t = ManagedTable(spark, os.path.join(tmp_base, "em"))
    t.overwrite(_mk(spark, 0, 5))
    mdir = os.path.join(t.path, "metadata")
    with open(os.path.join(mdir, "version-hint.text")) as f:
        n = int(f.read().strip())
    mfile = os.path.join(mdir, f"v{n}.metadata.json")
    with open(mfile) as f:
        doc = json.load(f)
    doc["current-snapshot-id"] = -1       # healed-to-empty shape
    with open(mfile, "w") as f:
        json.dump(doc, f)
    out = read_iceberg(spark, t.path)
    assert out.count() == 0
    assert set(out.columns) == {"id", "p", "v"}


def test_read_iceberg_unknown_snapshot_raises_value_error(
        spark, tmp_base):
    t = ManagedTable(spark, os.path.join(tmp_base, "uk"))
    t.overwrite(_mk(spark, 0, 5))
    with pytest.raises(ValueError, match="999999.*not found"):
        read_iceberg(spark, t.path, snapshot_id=999999)
