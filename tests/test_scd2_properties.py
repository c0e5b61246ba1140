"""Property-based SCD2 invariants (hypothesis over random batch streams).

The scenario tests pin exact outputs; these pin the ALGEBRA of the merge
for arbitrary source batches:

  I1  exactly one current version per key present in any batch so far
  I2  history is append-only: closed versions never change or vanish
  I3  idempotence: re-merging the same batch adds nothing
  I4  current attributes equal the latest batch's attributes
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.operators.merge import (
    ScdConfig, scd2_merge, VALID_TO,
)

CFG = ScdConfig(keys=("k",), tracked=("v",))
TS = ["2024-01-0%d 00:00:00" % d for d in range(1, 6)]

batch = st.dictionaries(st.integers(0, 9), st.integers(0, 3),
                        min_size=0, max_size=10)


def _df(spark, d):
    return spark.createDataFrame(
        [(k, v) for k, v in sorted(d.items())] or [(None, None)],
        "k int, v int").filter(F.col("k").isNotNull())


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(batches=st.lists(batch, min_size=1, max_size=3))
def test_scd2_invariants(spark, batches):
    state = None
    seen_keys: set[int] = set()
    closed_counts = []
    for ts, b in zip(TS, batches):
        state = scd2_merge(state, _df(spark, b), CFG, ts).cache()
        seen_keys |= set(b)

        cur = state.filter(F.col(VALID_TO).isNull())
        cur_rows = {r["k"]: r["v"] for r in cur.collect()}
        # I1: one current row per live key, none for deleted keys
        assert cur.groupBy("k").count().filter("count > 1").count() == 0
        assert set(cur_rows) == set(b)
        # I4: current attributes == latest batch
        assert cur_rows == b
        # I2: closed versions only ever accumulate
        closed_counts.append(state.filter(F.col(VALID_TO).isNotNull()).count())
        assert closed_counts == sorted(closed_counts)

    # I3: idempotent re-merge of the final batch at a later ts
    again = scd2_merge(state, _df(spark, batches[-1]), CFG, TS[4])
    assert again.count() == state.count()
    assert again.filter(F.col(VALID_TO).isNull()).count() == len(batches[-1])


UPS_SAFE = ScdConfig(keys=("k",), tracked=("v",))
UPS_EQ = ScdConfig(keys=("k",), tracked=("v",), null_safe_keys=False)


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(batches=st.lists(batch, min_size=1, max_size=3))
def test_keyed_upsert_invariants(spark, batches):
    """Invariants of the fused single-pass upsert, plus the equivalence
    of null-safe and plain-equality key matching on null-free keys."""
    from tb_lakehouse_enhanced_spark.operators.merge import keyed_upsert

    state = state_eq = None
    expected: dict[int, int] = {}
    stamps: dict[int, str] = {}
    for ts, b in zip(TS, batches):
        for k, v in b.items():
            if k not in expected or expected[k] != v:
                stamps[k] = ts  # new key or real change moves the stamp
            expected[k] = v
        state = keyed_upsert(state, _df(spark, b), UPS_SAFE, ts).cache()
        state_eq = keyed_upsert(state_eq, _df(spark, b), UPS_EQ, ts).cache()

        rows = {r["k"]: r for r in state.collect()}
        # U1: exactly one row per key ever seen
        assert set(rows) == set(expected)
        # U2: attributes equal the latest value per key
        assert {k: r["v"] for k, r in rows.items()} == expected
        # U3: update stamp moves only on actual change
        for k, r in rows.items():
            assert str(r["_tf_update_date"]).startswith(stamps[k][:10])
        # U4: null-safe and plain-equality agree when keys are non-null
        eq_rows = {r["k"]: r for r in state_eq.collect()}
        assert {k: (r["v"], r["_tf_update_date"]) for k, r in rows.items()} \
            == {k: (r["v"], r["_tf_update_date"]) for k, r in eq_rows.items()}

    # U5: idempotence — re-merging the final batch changes nothing
    last = _df(spark, batches[-1])
    again = keyed_upsert(state, last, UPS_SAFE, TS[len(batches)])
    diff = again.exceptAll(state).count() + state.exceptAll(again).count()
    assert diff == 0
