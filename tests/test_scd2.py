"""SCD2 acceptance scenarios.

Deterministic re-creation of the reference's manual test notebook
(reference notebooks/23_Testing_SCD2.py:38-76) as asserted pytest cases
(SURVEY.md §5.2, FIXTURES.md B5): attribute update, source deletion,
insert, PK mutation, no-op idempotence — plus the NULL-transition case
the reference's null-unsafe ``!=`` change detection misses (§7.4).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.operators.merge import (
    ScdConfig, scd2_merge, VALID_FROM, VALID_TO,
)

T0, T1, T2 = ("2024-01-01 00:00:00", "2024-01-02 00:00:00",
              "2024-01-03 00:00:00")

CFG = ScdConfig(keys=("address_id",),
                tracked=("line1", "line2", "city", "postal_code"))

SEED = [
    (1, "9 Main St", None, "Bothell", "98011"),
    (2, "1 Oak Ave", "Suite 2", "Bothell", "98011"),
    (3, "5 Pine Rd", None, "Surrey", "V3S"),
    (4, "7 Elm Ct", "Unit 1", "Surrey", "V3T"),
    (1105, "3 Birch Ln", None, "Renton", "98055"),
    (6, "2 Cedar Way", None, "Duvall", "98019"),
]
COLS = ["address_id", "line1", "line2", "city", "postal_code"]


def _df(spark, rows):
    return spark.createDataFrame(rows, COLS)


def _current(state):
    return state.filter(F.col(VALID_TO).isNull())


@pytest.fixture()
def state0(spark):
    return scd2_merge(None, _df(spark, SEED), CFG, T0).cache()


def test_initial_load_all_current(spark, state0):
    assert state0.count() == len(SEED)
    assert _current(state0).count() == len(SEED)
    assert state0.filter(F.col(VALID_FROM) != T0).count() == 0


def test_attribute_update_closes_and_inserts(spark, state0):
    # step 1 (23:40-44): change postal code where city = Bothell
    src = [(r[0], r[1], r[2], r[3], "12345" if r[3] == "Bothell" else r[4])
           for r in SEED]
    state1 = scd2_merge(state0, _df(spark, src), CFG, T1)
    bothell = state1.filter(F.col("city") == "Bothell")
    closed = bothell.filter(F.col(VALID_TO).isNotNull()).collect()
    open_ = bothell.filter(F.col(VALID_TO).isNull()).collect()
    assert {r["address_id"] for r in closed} == {1, 2}
    assert {r["address_id"] for r in open_} == {1, 2}
    assert all(str(r[VALID_TO]) == T1 for r in closed)
    assert all(r["postal_code"] == "12345" for r in open_)
    # untouched rows keep their original version
    assert state1.filter((F.col("city") != "Bothell")
                         & F.col(VALID_TO).isNotNull()).count() == 0


def test_delete_closes_without_removing(spark, state0):
    # step 2 (23:50): delete Surrey rows from the source
    src = [r for r in SEED if r[3] != "Surrey"]
    state1 = scd2_merge(state0, _df(spark, src), CFG, T1)
    surrey = state1.filter(F.col("city") == "Surrey")
    assert surrey.count() == 2  # still present...
    assert surrey.filter(F.col(VALID_TO).isNull()).count() == 0  # ...but closed


def test_insert_new_key(spark, state0):
    src = SEED + [(7000, "new", None, "Kent", "98030")]
    state1 = scd2_merge(state0, _df(spark, src), CFG, T1)
    row = state1.filter(F.col("address_id") == 7000).collect()
    assert len(row) == 1 and row[0][VALID_TO] is None
    assert str(row[0][VALID_FROM]) == T1


def test_pk_mutation_close_plus_insert(spark, state0):
    # step 4 (23:60-64): AddressID 1105 -> 11383
    src = [r if r[0] != 1105 else (11383, *r[1:]) for r in SEED]
    state1 = scd2_merge(state0, _df(spark, src), CFG, T1)
    old = state1.filter(F.col("address_id") == 1105).collect()
    new = state1.filter(F.col("address_id") == 11383).collect()
    assert len(old) == 1 and str(old[0][VALID_TO]) == T1
    assert len(new) == 1 and new[0][VALID_TO] is None


def test_noop_rerun_is_idempotent(spark, state0):
    state1 = scd2_merge(state0, _df(spark, SEED), CFG, T1)
    assert state1.count() == state0.count()
    assert state1.filter(F.col(VALID_TO).isNotNull()).count() == 0


def test_null_transition_null_safe_vs_strict(spark, state0):
    # step 6 (§7.4): NULL -> value on a tracked column
    src = [r if r[0] != 1 else (1, r[1], "Apt 9", r[3], r[4]) for r in SEED]
    null_safe = scd2_merge(state0, _df(spark, src), CFG, T1)
    assert null_safe.filter(F.col("address_id") == 1).count() == 2  # versioned

    strict_cfg = ScdConfig(keys=CFG.keys, tracked=CFG.tracked,
                           strict_reference_semantics=True)
    strict = scd2_merge(state0, _df(spark, src), strict_cfg, T1)
    # the reference's != chain yields NULL for NULL<->value -> missed
    assert strict.filter(F.col("address_id") == 1).count() == 1


def test_multi_batch_history_chain(spark, state0):
    src1 = [r if r[0] != 6 else (6, r[1], r[2], r[3], "A") for r in SEED]
    src2 = [r if r[0] != 6 else (6, r[1], r[2], r[3], "B") for r in src1]
    s1 = scd2_merge(state0, _df(spark, src1), CFG, T1)
    s2 = scd2_merge(s1, _df(spark, src2), CFG, T2)
    versions = (s2.filter(F.col("address_id") == 6)
                .orderBy(VALID_FROM).collect())
    assert [v["postal_code"] for v in versions] == ["98019", "A", "B"]
    assert [str(v[VALID_TO]) for v in versions] == [T1, T2, "None"]


def test_empty_source_closes_everything(spark, state0):
    # full-snapshot semantics: an empty batch means every key was deleted
    empty = spark.createDataFrame([], schema=_df(spark, SEED).schema)
    state1 = scd2_merge(state0, empty, CFG, T1)
    assert state1.count() == len(SEED)
    assert state1.filter(F.col(VALID_TO).isNull()).count() == 0
