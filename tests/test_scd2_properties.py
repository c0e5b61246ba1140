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
