"""SCD1 dim upsert + keyed fact upsert (reference 33/34 notebooks)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.operators.merge import (
    ScdConfig, keyed_upsert, scd1_merge, CREATE_DATE, UPDATE_DATE,
)

T0, T1 = "2024-01-01 00:00:00", "2024-01-02 00:00:00"

CFG = ScdConfig(keys=("geo_id",), tracked=("city", "country"),
                surrogate_key="_tf_id")
COLS = ["geo_id", "city", "country"]
SEED = [(-9, "N/A", "N/A"), (10, "Bern", "CH"), (20, "Lyon", "FR"),
        (30, "Kiel", "DE")]


@pytest.fixture()
def dim0(spark):
    return scd1_merge(None, spark.createDataFrame(SEED, COLS), CFG, T0).cache()


def test_initial_surrogates_contiguous(dim0):
    rows = {r["geo_id"]: r["_tf_id"] for r in dim0.collect()}
    # row_number over key order: -9 first
    assert rows == {-9: 1, 10: 2, 20: 3, 30: 4}


def test_update_keeps_surrogate_and_create_date(spark, dim0):
    src = [(10, "Basel", "CH"), (20, "Lyon", "FR"), (30, "Kiel", "DE")]
    d1 = scd1_merge(dim0, spark.createDataFrame(src, COLS), CFG, T1)
    r = d1.filter(F.col("geo_id") == 10).collect()[0]
    assert r["city"] == "Basel" and r["_tf_id"] == 2
    assert str(r[CREATE_DATE]) == T0 and str(r[UPDATE_DATE]) == T1
    # unknown member untouched (absent from source, no NOT-MATCHED-BY-SOURCE)
    unk = d1.filter(F.col("geo_id") == -9).collect()[0]
    assert unk["city"] == "N/A" and str(unk[UPDATE_DATE]) == T0


def test_insert_gets_offset_surrogate(spark, dim0):
    src = [(10, "Bern", "CH"), (40, "Oslo", "NO")]
    d1 = scd1_merge(dim0, spark.createDataFrame(src, COLS), CFG, T1)
    r = d1.filter(F.col("geo_id") == 40).collect()[0]
    assert r["_tf_id"] == 5  # max existing (4) + 1
    assert d1.count() == 5


def test_keyed_upsert_composite(spark):
    cfg = ScdConfig(keys=("a", "b"), tracked=("v",))
    t0 = keyed_upsert(None, spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 20.0)], ["a", "b", "v"]), cfg, T0)
    src = spark.createDataFrame([(1, 1, 11.0), (1, 2, 20.0), (2, 1, 30.0)],
                                ["a", "b", "v"])
    t1 = keyed_upsert(t0, src, cfg, T1)
    got = {(r["a"], r["b"]): (r["v"], str(r[UPDATE_DATE])) for r in t1.collect()}
    assert got == {(1, 1): (11.0, T1), (1, 2): (20.0, T0), (2, 1): (30.0, T1)}


def test_null_key_matching_semantics(spark):
    """null_safe_keys=True matches a NULL natural key to its own row;
    False reproduces SQL `=` MERGE semantics (NULL never matches, so
    the target row is retained and the source row re-inserts)."""
    from tb_lakehouse_enhanced_spark.operators.merge import (
        ScdConfig, scd1_merge,
    )
    t0, t1 = "2024-01-01 00:00:00", "2024-01-02 00:00:00"
    src = spark.createDataFrame(
        [(None, "x", 1.0), (7, "y", 2.0)], "k int, name string, v double")

    safe = ScdConfig(keys=("k",), tracked=("name", "v"), null_safe_keys=True)
    state0 = scd1_merge(None, src, safe, t0)
    out = scd1_merge(state0, src, safe, t1)
    assert out.count() == 2  # NULL key matched itself, unchanged

    ref = ScdConfig(keys=("k",), tracked=("name", "v"), null_safe_keys=False)
    state0 = scd1_merge(None, src, ref, t0)
    out = scd1_merge(state0, src, ref, t1).collect()
    # NULL never matches under plain `=`: old NULL-key row kept AND the
    # source NULL-key row inserted again
    assert len(out) == 3
    assert sum(1 for r in out if r.k is None) == 2


def test_keyed_sync_deletes_absent_keys(spark):
    """keyed_sync = upsert + WHEN NOT MATCHED BY SOURCE THEN DELETE:
    absent keys drop, changed rows re-stamp, unchanged keep stamps,
    new keys insert; an empty source snapshot empties the table."""
    from tb_lakehouse_enhanced_spark.operators.merge import (
        ScdConfig, keyed_sync,
    )
    cfg = ScdConfig(keys=("k",), tracked=("v",))
    t0, t1 = "2024-01-01 00:00:00", "2024-01-02 00:00:00"
    s0 = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "k int, v int")
    state = keyed_sync(None, s0, cfg, t0)
    s1 = spark.createDataFrame([(1, 10), (2, 99), (4, 40)], "k int, v int")
    state = keyed_sync(state, s1, cfg, t1)
    rows = {r["k"]: (r["v"], str(r["_tf_create_date"]),
                     str(r["_tf_update_date"])) for r in state.collect()}
    assert rows == {
        1: (10, t0, t0),      # unchanged: stamps preserved
        2: (99, t0, t1),      # updated: fresh update stamp
        4: (40, t1, t1),      # inserted
    }                          # 3 deleted
    empty = s1.filter("k < 0")
    assert keyed_sync(state, empty, cfg, t1).count() == 0
