"""Streaming quantiles: bounded-state hash-reservoir sample per key.

Exact streaming percentiles need state proportional to the stream; the
bounded alternative keeps, per key, the k observations whose
``md5(row id)`` hashes are SMALLEST — the bottom-k of a uniform hash is
a uniform random sample WITHOUT replacement (the KMV construction
turned into a sampler), so empirical quantiles of the retained sample
estimate the stream's quantiles with the usual ~1/sqrt(k) order-
statistic error, and are EXACT while the stream is shorter than k.

Why hash-bottom-k instead of a classic random reservoir: the sample is
then a deterministic FUNCTION OF THE IDS SEEN — replayed micro-batches
(at-least-once delivery) fold in idempotently, restarts reproduce the
same sample from checkpointed state, and nothing depends on
process-salted RNG. Duplicate ids are deduped by construction (same
hash), which is exactly the at-least-once semantics a streaming sink
wants.

State per key = k (hash, value) pairs; one output row per (key,
micro-batch) carrying the requested quantile panel. Fourth member of
the bounded-state streaming sketch family (KMV distinct, Misra-Gries
heavy hitters, drift monitor), same applyInPandasWithState extension
point and checkpoint-restart guarantees.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "hashes array<long>, vals array<double>, n_rows long"

_DEFAULT_QS = (0.5, 0.9, 0.99)


def _h60(item: str) -> int:
    return int.from_bytes(hashlib.md5(item.encode()).digest()[:8],
                          "big") >> 4


def reservoir_fold(hashes: list[int], vals: list[float],
                   new_ids, new_vals, k: int):
    """Fold (id, value) pairs into the bottom-k-by-hash sample (pure;
    duplicate ids collapse to one entry — at-least-once safe)."""
    best: dict[int, float] = dict(zip(hashes, vals))
    for i, v in zip(new_ids, new_vals):
        best[_h60(str(i))] = float(v)
    items = sorted(best.items())[:k]
    return [h for h, _ in items], [v for _, v in items]


def sample_quantiles(vals: list[float], qs) -> list[float]:
    """Empirical quantiles (nearest-rank on the sorted sample)."""
    if not vals:
        return [float("nan")] * len(qs)
    s = sorted(vals)
    n = len(s)
    return [s[min(n - 1, int(q * n))] for q in qs]


def stream_quantile_sketch(events: DataFrame, key_col: str = "source",
                           id_col: str = "event_id",
                           value_col: str = "value",
                           k: int = 512,
                           qs: tuple[float, ...] = _DEFAULT_QS
                           ) -> DataFrame:
    """events stream (key, id, value) -> one row per (key, micro-batch)
    with cumulative DELIVERED non-null row count, retained-sample size,
    exactness flag (sample not yet saturated => quantiles are exact),
    and the quantile panel ``q_<pct>``.

    ``n_rows`` counts deliveries: the sample fold itself is
    replay-idempotent (hash-bottom-k is a function of the ids seen),
    but a replayed micro-batch increments the counter again — an exact
    replay-safe distinct count would need unbounded id state, which is
    what the sibling KMV-distinct sketch estimates. Null-valued rows
    (dropped before folding) are NOT counted."""
    qcols = [f"q_{int(q * 100)}" for q in qs]
    out_schema = ("key string, n_rows bigint, sample_n bigint, "
                  "is_exact boolean, "
                  + ", ".join(f"{c} double" for c in qcols))

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (kval,) = key
        chunks = list(pdfs)
        pdf = pd.concat(chunks) if chunks else pd.DataFrame()

        if state.exists:
            s_h, s_v, n_rows = state.get
            hashes, vals = [int(x) for x in s_h], [float(x) for x in s_v]
        else:
            hashes, vals, n_rows = [], [], 0

        if not pdf.empty:
            keep = pdf[[id_col, value_col]].dropna()
            hashes, vals = reservoir_fold(
                hashes, vals, keep[id_col].astype(str),
                keep[value_col].astype(float), k)
            n_rows += int(len(keep))

        state.update((hashes, vals, n_rows))
        panel = sample_quantiles(vals, qs)
        row = {"key": [kval], "n_rows": [n_rows],
               "sample_n": [len(vals)], "is_exact": [len(vals) < k]}
        for c, v in zip(qcols, panel):
            row[c] = [v]
        yield pd.DataFrame(row)

    return (events.groupBy(key_col)
            .applyInPandasWithState(fn, out_schema, STATE_SCHEMA,
                                    "append", GroupStateTimeout.NoTimeout))
