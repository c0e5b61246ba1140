"""Delta deletion vectors — the mirror readable THROUGH merge-on-read
(VERDICT r12 #2).

``dvio.py`` implements the public DV storage format (RoaringBitmapArray
portable serialization + the u/i/p descriptor storage types); the
mirror emits DV entries at cadence / on demand; ``read_delta`` applies
them.  These tests pin:

- codec round trips (array + bitmap containers, 64-bit buckets, Z85);
- external replay == engine read through every MOR commit shape
  (delete, upsert, delete-by-keys, mid-MOR append, re-insert, stacked
  state), on unpartitioned tables and tombstone-only partitioned ones;
- the refuse window: between cadence hits the entry carries the
  table-specific ``tbLakehouseMergeOnReadPending`` reader feature (so
  even REAL DV-capable readers refuse instead of replaying stale
  adds) and ``mirror_deletion_vectors()`` upgrades it on demand;
- partitioned tables with outstanding upsert deltas are refused, not
  mis-described (flat delta files span partition values — Delta's
  per-file partitionValues cannot express them);
- vacuum reclaims DV files once a copy-on-write commit ends the
  episode, and never while referenced;
- checkpoints carry DV descriptors through.
"""

from __future__ import annotations

import glob
import json
import os
import random

import pytest
from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.sources import dvio
from tb_lakehouse_enhanced_spark.sources.deltaread import read_delta
from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable


@pytest.fixture(autouse=True)
def _dv_every(monkeypatch):
    monkeypatch.setenv("TB_LAKEHOUSE_DV_MIRROR", "every")


def _rows(df, cols):
    return sorted(map(tuple, df.select(*cols).collect()))


def _assert_mirror(spark, t, cols, tag=""):
    assert _rows(read_delta(spark, t.path), cols) \
        == _rows(t.read(), cols), tag


# -- codec -------------------------------------------------------------------

def test_roaring64_round_trips():
    rng = random.Random(7)
    cases = [
        [],
        [0],
        [0, 1, 5, 65535, 65536, 70000],
        sorted(rng.sample(range(300000), 9000)),     # bitmap containers
        [(1 << 32) + 7, (1 << 32) + 8, 5, (3 << 32) | 123456],
        list(range(4097)),                           # array->bitmap edge
    ]
    for c in cases:
        data = dvio.serialize_roaring64(sorted(c))
        assert sorted(dvio.deserialize_roaring64(data)) == sorted(c)


def test_z85_vectors():
    # the ZeroMQ reference vector: 0x86 0x4F 0xD2 0x6F 0xB5 0x59 0xF7
    # 0x5B encodes to "HelloWorld"
    assert dvio.z85_encode(
        bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])) \
        == "HelloWorld"
    data = bytes(range(32))
    assert dvio.z85_decode(dvio.z85_encode(data)) == data


def test_dv_file_crc_and_descriptor(tmp_base):
    desc = dvio.make_dv_descriptor(
        tmp_base, {"a.parquet": [3, 1, 2],
                   "b.parquet": list(range(10000))})
    assert sorted(dvio.load_dv(tmp_base, desc["a.parquet"])) == [1, 2, 3]
    assert sorted(dvio.load_dv(tmp_base, desc["b.parquet"])) \
        == list(range(10000))
    # corrupt one byte inside the bitmap: CRC must catch it
    rel = dvio.dv_relative_path(desc["a.parquet"])
    p = os.path.join(tmp_base, rel)
    with open(p, "r+b") as f:
        f.seek(desc["a.parquet"]["offset"] + 5)
        b = f.read(1)
        f.seek(desc["a.parquet"]["offset"] + 5)
        f.write(bytes([b[0] ^ 0xFF]))
    with pytest.raises(ValueError, match="checksum|declares"):
        dvio.load_dv(tmp_base, desc["a.parquet"])


def test_inline_dv_storage_round_trip(tmp_base):
    data = dvio.serialize_roaring64([2, 4, 99])
    desc = {"storageType": "i", "pathOrInlineDv": dvio.z85_encode(
        data + b"\x00" * ((-len(data)) % 4)), "offset": None,
        "sizeInBytes": len(data), "cardinality": 3}
    # padded tail decodes to extra zero bytes beyond the bitmap — the
    # deserializer reads exactly the declared bitmaps
    got = dvio.deserialize_roaring64(
        dvio.z85_decode(desc["pathOrInlineDv"]))
    assert sorted(got) == [2, 4, 99]


# -- mirror round trips ------------------------------------------------------

def test_unpartitioned_episode_round_trips(spark, tmp_base):
    t = ManagedTable(spark, os.path.join(tmp_base, "t"))
    t.overwrite(spark.range(0, 20).select(
        F.col("id"), (F.col("id") * 2).alias("v")))
    t.delete_mor(F.col("id") < 3, key_cols=("id",))
    _assert_mirror(spark, t, ["id", "v"], "delete")
    t.upsert_mor(spark.range(5, 10).select(
        F.col("id"), F.lit(999).alias("v")), key_cols=("id",))
    _assert_mirror(spark, t, ["id", "v"], "upsert")
    t.delete_mor_keys(spark.range(7, 9).select("id"), key_cols=("id",))
    _assert_mirror(spark, t, ["id", "v"], "delete-keys")
    t.append(spark.range(100, 103).select(
        F.col("id"), (F.col("id") * 2).alias("v")))
    _assert_mirror(spark, t, ["id", "v"], "append-after-mor")
    t.upsert_mor(spark.range(1, 4).select(
        F.col("id"), F.lit(-5).alias("v")), key_cols=("id",))
    _assert_mirror(spark, t, ["id", "v"], "re-insert")
    t.compact()
    _assert_mirror(spark, t, ["id", "v"], "post-compact")
    # post-COW the protocol resets and no DV descriptors remain live
    from tb_lakehouse_enhanced_spark.sources.deltaread import _replay
    adds, _m, proto = _replay(spark, t.path)
    assert proto.get("minReaderVersion", 1) <= 2
    assert not any(a.get("deletionVector") for a in adds.values())


def test_partitioned_tombstone_only_round_trips(spark, tmp_base):
    t = ManagedTable(spark, os.path.join(tmp_base, "p"),
                     partition_by=("p",))
    t.overwrite(spark.range(0, 30).select(
        F.col("id"), (F.col("id") % 3).alias("p"),
        (F.col("id") * 2).alias("v")))
    t.delete_mor(F.col("id") % 5 == 0, key_cols=("id",))
    _assert_mirror(spark, t, ["id", "p", "v"], "part-delete")
    t.delete_mor_keys(spark.createDataFrame([(1,), (2,)], "id long"),
                      key_cols=("id",))
    _assert_mirror(spark, t, ["id", "p", "v"], "part-delete-2")


def test_partitioned_upsert_state_is_refused_not_misdescribed(
        spark, tmp_base):
    t = ManagedTable(spark, os.path.join(tmp_base, "pu"),
                     partition_by=("p",))
    t.overwrite(spark.range(0, 12).select(
        F.col("id"), (F.col("id") % 3).alias("p"),
        (F.col("id") * 2).alias("v")))
    t.upsert_mor(spark.range(0, 3).select(
        F.col("id"), (F.col("id") % 3).alias("p"),
        F.lit(7).alias("v")), key_cols=("id",))
    with pytest.raises(ValueError, match="tbLakehouseMergeOnRead"):
        read_delta(spark, t.path)
    assert t.mirror_deletion_vectors() is False
    t.compact()
    _assert_mirror(spark, t, ["id", "p", "v"], "post-compact")


def test_refuse_window_and_on_demand_upgrade(spark, tmp_base,
                                             monkeypatch):
    monkeypatch.setenv("TB_LAKEHOUSE_DV_MIRROR", "0")
    t = ManagedTable(spark, os.path.join(tmp_base, "w"))
    t.overwrite(spark.range(0, 10).select(
        F.col("id"), (F.col("id") * 3).alias("v")))
    t.delete_mor(F.col("id") == 4, key_cols=("id",))
    v = t.current_version()
    with open(os.path.join(t.path, "_delta_log",
                           f"{v:020d}.json")) as f:
        actions = [json.loads(x) for x in f if x.strip()]
    proto = next(a["protocol"] for a in actions if "protocol" in a)
    assert "tbLakehouseMergeOnReadPending" in proto["readerFeatures"]
    with pytest.raises(ValueError, match="tbLakehouseMergeOnRead"):
        read_delta(spark, t.path)
    assert t.mirror_deletion_vectors() is True
    _assert_mirror(spark, t, ["id", "v"], "on-demand")
    # idempotent on a clean table
    t.compact()
    assert t.mirror_deletion_vectors() is False


def test_dv_cadence_default(spark, tmp_base, monkeypatch):
    monkeypatch.delenv("TB_LAKEHOUSE_DV_MIRROR", raising=False)
    t = ManagedTable(spark, os.path.join(tmp_base, "c"))
    t.overwrite(spark.range(0, 40).select(
        F.col("id"), (F.col("id") * 2).alias("v")))
    refusals, dvs = 0, 0
    for i in range(ManagedTable.DV_MIRROR_EVERY):
        t.delete_mor(F.col("id") == i, key_cols=("id",))
        try:
            read_delta(spark, t.path)
            dvs += 1
        except ValueError:
            refusals += 1
    # the Nth stacked state dir hits the cadence and is readable
    assert dvs == 1 and refusals == ManagedTable.DV_MIRROR_EVERY - 1
    _assert_mirror(spark, t, ["id", "v"], "cadence")


def test_vacuum_reclaims_unreferenced_dv_files(spark, tmp_base):
    t = ManagedTable(spark, os.path.join(tmp_base, "g"))
    t.overwrite(spark.range(0, 10).select(
        F.col("id"), (F.col("id") * 2).alias("v")))
    t.delete_mor(F.col("id") < 2, key_cols=("id",))

    def dv_files():
        return sorted(os.path.basename(p) for p in glob.glob(
            os.path.join(t.path, "deletion_vector_*.bin")))

    assert dv_files(), "DV entry must have written a vector file"
    # vacuum mid-episode: the referenced vector survives
    t.vacuum(retain_last=1, orphan_hours=0)
    assert dv_files()
    _assert_mirror(spark, t, ["id", "v"], "post-vacuum-mid-episode")
    # COW ends the episode; vacuum reclaims the now-unreferenced DVs
    t.overwrite(t.read())
    t.vacuum(retain_last=1, orphan_hours=0)
    assert dv_files() == []
    _assert_mirror(spark, t, ["id", "v"], "post-vacuum-clean")


def test_checkpoint_carries_dv_descriptors(spark, tmp_base):
    t = ManagedTable(spark, os.path.join(tmp_base, "k"))
    t.overwrite(spark.range(0, 10).select(
        F.col("id"), (F.col("id") * 2).alias("v")))
    t.delete_mor(F.col("id") < 3, key_cols=("id",))
    t.checkpoint_mirror()
    # drop the JSON commits at/below the checkpoint: replay must come
    # from the checkpoint parquet alone, DVs included
    for fn in glob.glob(os.path.join(t.path, "_delta_log", "*.json")):
        os.remove(fn)
    _assert_mirror(spark, t, ["id", "v"], "checkpoint-only")
