"""Streaming heavy hitters: bounded-state Misra-Gries per key.

``vocab_topk`` answers "most frequent items" in batch with one exact
groupBy — fine when you can afford a full shuffle per question. On an
unbounded stream the exact answer needs unbounded state; the classic
bounded-memory alternative is the Misra-Gries summary (Misra & Gries
1982; mergeability per Agarwal et al., "Mergeable Summaries", PODS
2012): keep at most ``k`` counters, incrementing known items and
decrementing ALL counters when a new item arrives with the table full.
Guarantees, with N items folded in total:

- every counter underestimates its item's true count by at most
  N/(k+1) (the emitted ``err_bound``);
- every item with true frequency > N/(k+1) is IN the summary.

State per monitored key = the (items, counts, n_total) summary —
``applyInPandasWithState`` keyed like the other stateful operators.
Each micro-batch folds its value_counts into the summary (batch items
enter in descending batch-count order, the deterministic fold) and
emits the current summary rows with the error bound, so a dashboard
reads top items continuously without any unbounded aggregation.

``mg_merge`` combines two summaries (sum shared counters, then subtract
the (k+1)-th largest and drop non-positive) with the additive error of
the parts — the map-side-combine story for sharded batch use.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = ("key string, item string, est_count bigint, "
                 "n_total bigint, err_bound bigint")
STATE_SCHEMA = "items array<string>, counts array<long>, n_total long"


def mg_fold(summary: dict[str, int], batch: list[tuple[str, int]],
            k: int) -> dict[str, int]:
    """Fold (item, count) increments into a Misra-Gries summary of
    capacity ``k`` (mutates and returns ``summary``). Bulk-increment
    form of the classic algorithm: an unknown item entering a full
    table first absorbs decrements shared by every counter."""
    for item, cnt in batch:
        if item in summary:
            summary[item] += cnt
        elif len(summary) < k:
            summary[item] = cnt
        else:
            # decrement everyone by min(cnt, smallest counter) steps
            # repeatedly until the item fits or its count is consumed
            while cnt > 0:
                m = min(summary.values())
                if cnt <= m:
                    for w in list(summary):
                        summary[w] -= cnt
                    cnt = 0
                else:
                    cnt -= m
                    for w in list(summary):
                        summary[w] -= m
                summary = {w: c for w, c in summary.items() if c > 0}
                if cnt > 0 and len(summary) < k:
                    summary[item] = cnt
                    cnt = 0
    return {w: c for w, c in summary.items() if c > 0}


def mg_merge(a: dict[str, int], b: dict[str, int], k: int) -> dict[str, int]:
    """Merge two summaries into one of capacity ``k`` (PODS 2012):
    pointwise sum, then subtract the (k+1)-th largest combined count
    and keep the positive remainder. Error adds across the parts."""
    tot = dict(a)
    for w, c in b.items():
        tot[w] = tot.get(w, 0) + c
    if len(tot) <= k:
        return tot
    cut = sorted(tot.values(), reverse=True)[k]
    return {w: c - cut for w, c in tot.items() if c - cut > 0}


def stream_heavy_hitters(items: DataFrame, key_col: str = "source",
                         item_col: str = "item", k: int = 8) -> DataFrame:
    """items stream (key_col, item_col) -> per micro-batch, the current
    Misra-Gries summary rows for each key: (item, est_count, n_total,
    err_bound) where est_count in [true - err_bound, true]."""

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (kval,) = key
        chunks = list(pdfs)
        pdf = pd.concat(chunks) if chunks else pd.DataFrame()

        if state.exists:
            s_items, s_counts, n_total = state.get
            summary = dict(zip(list(s_items),
                               [int(c) for c in s_counts]))
        else:
            summary, n_total = {}, 0

        if not pdf.empty:
            vc = pdf[item_col].value_counts()  # descending: deterministic
            summary = mg_fold(summary, [(str(w), int(c))
                                        for w, c in vc.items()], k)
            n_total += int(vc.sum())

        items_sorted = sorted(summary, key=lambda w: (-summary[w], w))
        state.update((items_sorted,
                      [summary[w] for w in items_sorted],
                      n_total))
        err = n_total // (k + 1)
        yield pd.DataFrame({
            "key": [kval] * len(items_sorted),
            "item": items_sorted,
            "est_count": [summary[w] for w in items_sorted],
            "n_total": [n_total] * len(items_sorted),
            "err_bound": [err] * len(items_sorted)})

    return (items.groupBy(key_col)
            .applyInPandasWithState(fn, OUTPUT_SCHEMA, STATE_SCHEMA,
                                    "append", GroupStateTimeout.NoTimeout))
