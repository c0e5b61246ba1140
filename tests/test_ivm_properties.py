"""Property-based IVM invariant: maintained aggregate == recomputed.

For ANY chain of snapshots (arbitrary inserts/updates/deletes between
consecutive states), folding the change feeds through
``incremental_agg_update`` must land on exactly the aggregate a full
recompute of the final snapshot produces — including groups appearing,
changing and disappearing along the way.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.operators.cdf import (
    changes_between, incremental_agg_update,
)

# snapshot: key -> (group, value); consecutive dicts imply CDF batches
snapshot = st.dictionaries(st.integers(0, 14),
                           st.tuples(st.sampled_from("abc"),
                                     st.integers(-5, 5)),
                           min_size=0, max_size=12)


def _df(spark, d):
    rows = [(k, g, float(v)) for k, (g, v) in sorted(d.items())]
    return spark.createDataFrame(rows or [(None, None, None)],
                                 "k int, g string, v double") \
        .filter(F.col("k").isNotNull())


def _collect(df):
    return {r["g"]: (r["n_rows"], float(r["total_v"])) for r in df.collect()}


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(snaps=st.lists(snapshot, min_size=1, max_size=4))
def test_maintained_equals_recomputed(spark, snaps):
    state = None
    prev = None
    for d in snaps:
        cur = _df(spark, d)
        feed = changes_between(prev, cur, keys=("k",) if prev is not None else None)
        state = incremental_agg_update(state, feed, ["g"], {"v": "total_v"})
        prev = cur

    recomputed = (_df(spark, snaps[-1]).groupBy("g")
                  .agg(F.count(F.lit(1)).alias("n_rows"),
                       F.sum(F.col("v").cast("decimal(28,6)")).alias("total_v")))
    assert _collect(state) == _collect(recomputed)
