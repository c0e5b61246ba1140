"""Streaming distinct-count: bounded-state KMV sketch per key.

Exact streaming COUNT(DISTINCT) needs state proportional to the
distinct universe; the K-Minimum-Values sketch (Bar-Yossef et al. 2002;
the batch-mergeable variant lives in operators/analytics.py) keeps only
the k smallest hash values ever seen — fixed k*8 bytes per monitored
key — and estimates the cardinality from how densely the minima pack
the hash range: with U_k = the k-th smallest hash mapped into (0, 1),
estimate = (k - 1) / U_k, relative error ~ 1/sqrt(k).

State per key = the sorted k-minima array + an exact low-cardinality
escape (below k distinct hashes the sketch IS the distinct set, so the
"estimate" is exact). Hashing is md5-low-60-bits — engine-independent
and restart-stable (Python's builtin ``hash`` is process-salted and
would corrupt the sketch across restarts).

Same extension point and guarantees pattern as the drift monitor and
heavy hitters: ``applyInPandasWithState`` keyed by the monitored
stream, one output row per (key, micro-batch), state survives
checkpoint restarts.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = ("key string, n_rows bigint, estimate bigint, "
                 "is_exact boolean")
STATE_SCHEMA = "minima array<long>, n_rows long"

_RANGE = float(1 << 60)


def _h60(item: str) -> int:
    return int.from_bytes(hashlib.md5(item.encode()).digest()[:8],
                          "big") >> 4


def kmv_fold(minima: list[int], items, k: int) -> list[int]:
    """Fold items into the sorted k-minima list (pure function)."""
    s = set(minima)
    s.update(_h60(str(x)) for x in items)
    return sorted(s)[:k]


def kmv_estimate(minima: list[int], k: int) -> tuple[int, bool]:
    """(cardinality estimate, is_exact). Exact below k distinct."""
    if len(minima) < k:
        return len(minima), True
    u_k = minima[k - 1] / _RANGE
    return int(round((k - 1) / u_k)), False


def stream_distinct_count(items: DataFrame, key_col: str = "source",
                          item_col: str = "item",
                          k: int = 256) -> DataFrame:
    """items stream (key_col, item_col) -> one row per (key,
    micro-batch): cumulative row count and the KMV cardinality
    estimate (exact while distinct < k)."""

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (kval,) = key
        chunks = list(pdfs)
        pdf = pd.concat(chunks) if chunks else pd.DataFrame()

        if state.exists:
            s_min, n_rows = state.get
            minima = [int(x) for x in s_min]
        else:
            minima, n_rows = [], 0

        if not pdf.empty:
            vals = pdf[item_col].dropna().astype(str)
            minima = kmv_fold(minima, vals.unique(), k)
            n_rows += int(len(pdf))

        state.update((minima, n_rows))
        est, exact = kmv_estimate(minima, k)
        yield pd.DataFrame({"key": [kval], "n_rows": [n_rows],
                            "estimate": [est], "is_exact": [exact]})

    return (items.groupBy(key_col)
            .applyInPandasWithState(fn, OUTPUT_SCHEMA, STATE_SCHEMA,
                                    "append", GroupStateTimeout.NoTimeout))
