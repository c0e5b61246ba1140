"""Additive schema evolution across the merge family (Delta mergeSchema
semantics re-expressed; reference keeps silver schemas fixed, but a
100 TB feed evolves — SURVEY.md §7.4 hard parts)."""

from __future__ import annotations

import datetime

from tb_lakehouse_enhanced_spark.operators.merge import (
    ScdConfig, align_schemas, keyed_upsert, scd1_merge, scd2_merge,
)

TS0 = datetime.datetime(2024, 1, 1)
TS1 = datetime.datetime(2024, 2, 1)


def test_align_schemas_pads_both_sides(spark):
    t = spark.createDataFrame([(1, "a")], ["id", "old"])
    s = spark.createDataFrame([(1, 2.5)], ["id", "new"])
    t2, s2 = align_schemas(t, s)
    assert set(t2.columns) == {"id", "old", "new"}
    assert set(s2.columns) == {"id", "new", "old"}
    assert dict(t2.dtypes)["new"] == "double"
    assert dict(s2.dtypes)["old"] == "string"


def test_scd2_evolves_new_source_column(spark):
    cfg = ScdConfig(keys=("id",), tracked=("name",))
    v0 = scd2_merge(None, spark.createDataFrame(
        [(1, "ann"), (2, "bob")], ["id", "name"]), cfg, TS0)
    src = spark.createDataFrame(
        [(1, "ann", "x@y.z"), (2, "bob2", None)],
        ["id", "name", "email"])
    v1 = scd2_merge(v0, src, cfg, TS1, evolve_schema=True)
    rows = {(r["id"], r["_tf_valid_to"] is None): r for r in v1.collect()}
    # historical rows backfill NULL for the evolved column
    assert rows[(2, False)]["email"] is None
    # current rows carry the new attribute
    assert rows[(1, True)]["email"] == "x@y.z"   # new attr forced a new version
    assert rows[(1, False)]["email"] is None
    assert rows[(2, True)]["name"] == "bob2"
    assert "email" in v1.columns


def test_scd1_evolution_keeps_surrogates(spark):
    cfg = ScdConfig(keys=("id",), tracked=("name",), surrogate_key="_tf_id")
    v0 = scd1_merge(None, spark.createDataFrame(
        [(1, "ann"), (2, "bob")], ["id", "name"]), cfg, TS0)
    sk0 = {r["id"]: r["_tf_id"] for r in v0.collect()}
    src = spark.createDataFrame(
        [(1, "ann2", 7), (3, "cat", 9)], ["id", "name", "score"])
    v1 = scd1_merge(v0, src, cfg, TS1, evolve_schema=True)
    rows = {r["id"]: r for r in v1.collect()}
    assert rows[1]["_tf_id"] == sk0[1]          # update kept its surrogate
    assert rows[1]["score"] == 7
    assert rows[2]["score"] is None             # untouched row backfills NULL
    assert rows[3]["score"] == 9                # insert got a fresh surrogate
    assert rows[3]["_tf_id"] not in sk0.values() or rows[3]["_tf_id"] > max(sk0.values())


def test_upsert_evolution(spark):
    cfg = ScdConfig(keys=("id",), tracked=("v",))
    t = keyed_upsert(None, spark.createDataFrame([(1, 10)], ["id", "v"]),
                     cfg, TS0)
    t2 = keyed_upsert(t, spark.createDataFrame(
        [(1, 11, "u")], ["id", "v", "tag"]), cfg, TS1, evolve_schema=True)
    row = t2.collect()[0]
    assert (row["v"], row["tag"]) == (11, "u")
