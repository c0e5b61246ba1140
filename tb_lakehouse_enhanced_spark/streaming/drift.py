"""Streaming distribution-drift monitor: stateful per-key baseline.

The batch formulation (operators/analytics.py::distribution_drift)
compares two FIXED sides of a corpus. In a streaming ingest the
question becomes "has the item distribution of this source MOVED since
the reference window?" — the production data-quality gate in front of
a training pipeline (a feed that suddenly ships a different language /
event / category mix should trip an alarm, not silently skew the
corpus).

The baseline is arbitrary per-key state — ``applyInPandasWithState``
(same extension point as streaming/packing.py): keyed by the monitored
stream (``key_col``, e.g. source), the state holds that key's item
histogram. The first ``baseline_batches`` micro-batches ACCUMULATE the
histogram (warmup rows are emitted with phase='warmup', drift=0.0);
afterwards the baseline FREEZES and every micro-batch's histogram is
scored against it with the same add-one-smoothed triangular-
discrimination statistic the batch operator uses
(``sum (p-q)^2/(p+q)`` over the joint vocabulary) — pure + - * / on
exact integer counts, no transcendental-libm caveats. The statistic is
computed entirely inside the Arrow batch (numpy), one output row per
(key, micro-batch).

Checkpoint durability: the histogram lives in the state store, so a
restarted query resumes monitoring against the SAME baseline — the
test kills the query mid-stream and asserts drift still fires on a
shifted batch delivered after the restart.

Scale: state is one histogram per key, shuffled on the key — valid
when per-key item cardinality is bounded (event types, languages,
categories; the same contract as cooccurrence_lift's array method).
Unbounded vocabularies should monitor a capped top-K or a hashed
projection of the item instead.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = ("key string, phase string, n_base bigint, n_batch bigint, "
                 "drift double, drifted boolean")
STATE_SCHEMA = ("items array<string>, counts array<long>, n_batches long")


def _drift_stat(base: dict[str, int], cur: dict[str, int]) -> float:
    """Add-one-smoothed triangular discrimination between two item
    histograms (mirrors analytics.distribution_drift's per-item term,
    summed over the joint vocabulary)."""
    vocab = sorted(set(base) | set(cur))
    if not vocab:
        return 0.0
    na = sum(base.values())
    nb = sum(cur.values())
    v = len(vocab)
    a = np.array([base.get(w, 0) for w in vocab], dtype=np.float64)
    b = np.array([cur.get(w, 0) for w in vocab], dtype=np.float64)
    p = (a + 1.0) / (na + v)
    q = (b + 1.0) / (nb + v)
    return float(((p - q) ** 2 / (p + q)).sum())


def stream_drift_monitor(items: DataFrame, key_col: str = "source",
                         item_col: str = "item",
                         baseline_batches: int = 1,
                         threshold: float = 0.05) -> DataFrame:
    """items stream (key_col, item_col) -> one monitoring row per
    (key, micro-batch): phase ('warmup' while the baseline accumulates,
    'monitor' after it freezes), the drift statistic vs the frozen
    baseline, and the thresholded alarm flag."""

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (k,) = key
        chunks = list(pdfs)
        pdf = pd.concat(chunks) if chunks else pd.DataFrame()
        cur: dict[str, int] = {} if pdf.empty else \
            pdf[item_col].value_counts().to_dict()

        if state.exists:
            s_items, s_counts, n_batches = state.get
        else:
            s_items, s_counts, n_batches = [], [], 0
        base = dict(zip(list(s_items), [int(c) for c in s_counts]))

        if n_batches < baseline_batches:
            # warmup: fold this batch INTO the baseline
            for w, c in cur.items():
                base[w] = base.get(w, 0) + int(c)
            items_sorted = sorted(base)
            state.update((items_sorted,
                          [base[w] for w in items_sorted],
                          n_batches + 1))
            yield pd.DataFrame({
                "key": [k], "phase": ["warmup"],
                "n_base": [sum(base.values())],
                "n_batch": [int(sum(cur.values()))],
                "drift": [0.0], "drifted": [False]})
            return

        # monitor: baseline frozen, score this batch against it
        d = _drift_stat(base, cur)
        state.update((list(s_items), [int(c) for c in s_counts],
                      n_batches + 1))
        yield pd.DataFrame({
            "key": [k], "phase": ["monitor"],
            "n_base": [sum(base.values())],
            "n_batch": [int(sum(cur.values()))],
            "drift": [d], "drifted": [bool(d > threshold)]})

    return (items.groupBy(key_col)
            .applyInPandasWithState(fn, OUTPUT_SCHEMA, STATE_SCHEMA,
                                    "append", GroupStateTimeout.NoTimeout))
