"""Focused pins for the round-13 optimization changes that touched
operator internals: footer-served analyze() and the raw-file-key MOR
carry subtraction."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable


def _norm_files(payload: dict) -> dict:
    """Stats payload keyed by file basename (the footer path records
    plain paths, the aggregate path file: URIs — consumers accept
    both; the bounds must be identical)."""
    return {os.path.basename(e["file"]):
            {k: v for k, v in e.items() if k != "file"}
            for e in payload["files"]}


def test_analyze_footer_path_matches_aggregate(spark, tmp_base,
                                               monkeypatch):
    t = ManagedTable(spark, os.path.join(tmp_base, "t"),
                     partition_by=("k",))
    t.overwrite(spark.range(0, 200).select(
        "id", (F.col("id") % 3).cast("string").alias("v"),
        F.concat(F.lit("g"), (F.col("id") % 4)).alias("k"))
        .repartition(4))
    footer = t.analyze(("id", "v", "k"))
    # force the pre-r13 aggregate path and compare bound-for-bound
    monkeypatch.setattr(ManagedTable, "_footer_stat_entries",
                        lambda self, files, cols, meta: None)
    agg = t.analyze(("id", "v", "k"))
    assert _norm_files(footer) == _norm_files(agg)
    # the stats file on disk (last written = aggregate) serves pruning
    kept = t.pruned_files("id", 10, 20)
    assert kept is not None and 0 < len(kept)
    assert sorted(map(tuple, t.read_where("id", 10, 20)
                      .select("id").collect())) == \
        [(i,) for i in range(10, 21)]


def test_mor_carry_raw_keys_lifecycle(spark, tmp_base):
    """The r13 carry subtracts tombstones with raw base/delta keys
    (no LWW resolve). Pin the full lifecycle against a computed
    reference: tombstones in UNTOUCHED partitions survive a
    partition-scoped UPDATE, dead keys in the TOUCHED partition stay
    dead, and a post-rewrite re-insert of a previously-deleted key
    becomes visible (a wrongly-carried tombstone would kill it)."""
    t = ManagedTable(spark, os.path.join(tmp_base, "t"),
                     partition_by=("pt",))
    # pt derives from the key => stable partitions; non-numeric values
    src = spark.range(0, 20).select(
        F.col("id"), F.col("id").cast("double").alias("val"),
        F.concat(F.lit("r"), (F.col("id") % 2)).alias("pt"))
    t.overwrite(src)
    # MOR state in BOTH partitions: delta upsert + tombstones
    t.upsert_mor(src.filter(F.col("id").isin(2, 3))
                 .withColumn("val", F.col("val") + 100), ("id",))
    t.delete_mor(F.col("id").isin(4, 5), key_cols=("id",))
    # partition-scoped UPDATE touches ONLY pt=r1 (odd ids)
    t.update(F.col("pt") == "r1", {"val": F.lit(-1.0)},
             stable_partitions=True)
    head = t._commit(t.current_version())
    assert head.get("partitions_rewritten") == ["pt=r1"]
    # tombstone for id=4 (pt=r0, untouched) must have been CARRIED
    assert head.get("tombstones"), "untouched-partition tombstone lost"
    got = {r["id"]: (r["val"], r["pt"]) for r in t.read().collect()}
    assert 4 not in got and 5 not in got          # both deletes hold
    assert got[2] == (102.0, "r0")                # delta survives
    assert got[3] == (-1.0, "r1")                 # update materialized it
    assert got[1] == (-1.0, "r1") and got[0] == (0.0, "r0")
    # re-insert a key the rewrite's partition had tombstoned: a
    # wrongly-carried tombstone (old sequence) would shadow it
    t.upsert_mor(spark.range(5, 6).select(
        "id", F.lit(7.5).alias("val"), F.lit("r1").alias("pt")),
        ("id",))
    got2 = {r["id"]: r["val"] for r in t.read().collect()}
    assert got2[5] == 7.5
    assert 4 not in got2
