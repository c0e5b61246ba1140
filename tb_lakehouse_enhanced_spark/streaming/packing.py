"""Streaming sequence packing: per-source token-offset carry.

The batch packer (operators/packing.py) computes every doc's global
token offset with a corpus-wide prefix sum — a batch-only luxury. In a
streaming ingest the offset must CARRY across micro-batches: each
source's next doc continues exactly where the last batch stopped, so
windows keep filling seamlessly at the batch boundary instead of
restarting per batch.

That carry is one number per source — textbook
``applyInPandasWithState``: state = the next token offset, keyed by
source. Each micro-batch's docs for a source are processed in
(arrival batch, doc_id) order; the manifest rows they generate are
identical to what the batch packer would emit for the same doc order,
which the tests assert by replaying the same docs through both paths.

Scale: one state row per source, shuffled on the source key (the same
partitioning a per-source sink would use); all arithmetic is
vectorized numpy inside the Arrow batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = ("source string, doc_id bigint, window_id bigint, "
                 "tok_from bigint, tok_to bigint, n_toks bigint")
STATE_SCHEMA = "off long"


def stream_pack(docs: DataFrame, window: int,
                source_col: str = "source", id_col: str = "doc_id",
                len_col: str = "n") -> DataFrame:
    """docs stream -> packing manifest rows, offsets carried per source.

    ``docs`` must carry (source_col, id_col, len_col). Zero-length docs
    are dropped. Each source packs into its own window sequence
    (window ids are per-source, starting at 0).
    """
    if window <= 0:
        raise ValueError(f"window must be positive, got {window}")
    w = int(window)

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (source,) = key
        (off,) = state.get if state.exists else (0,)
        # materialize the WHOLE group before sorting: the iterator
        # yields Arrow chunks (arrow.maxRecordsPerBatch rows each) in
        # arbitrary shuffle-read order, so a per-chunk sort would give
        # a >chunk-size source nondeterministic offsets
        # (list() first: the iterator itself is always truthy, so the
        # empty-group guard must test the materialized list — an empty
        # iterator otherwise reaches pd.concat([]) and raises)
        chunks = list(pdfs)
        pdf = pd.concat(chunks) if chunks else pd.DataFrame()
        if not pdf.empty:
            pdf = pdf[pdf[len_col] > 0].sort_values(id_col)
        if not pdf.empty:
            n = pdf[len_col].to_numpy(dtype=np.int64)
            starts = off + np.concatenate(([0], np.cumsum(n)[:-1]))
            off = int(starts[-1] + n[-1])
            w0 = starts // w
            w1 = (starts + n - 1) // w
            reps = (w1 - w0 + 1).astype(np.int64)
            doc_idx = np.repeat(np.arange(len(n)), reps)
            win = np.concatenate([np.arange(a, b + 1)
                                  for a, b in zip(w0, w1)])
            s_rep, n_rep = starts[doc_idx], n[doc_idx]
            tok_from = np.maximum(win * w - s_rep, 0)
            tok_to = np.minimum((win + 1) * w - s_rep, n_rep)
            yield pd.DataFrame({
                "source": source,
                "doc_id": pdf[id_col].to_numpy(dtype=np.int64)[doc_idx],
                "window_id": win,
                "tok_from": tok_from,
                "tok_to": tok_to,
                "n_toks": tok_to - tok_from,
            })
        state.update((off,))

    return (docs.groupBy(source_col)
            .applyInPandasWithState(fn, OUTPUT_SCHEMA, STATE_SCHEMA,
                                    "append", GroupStateTimeout.NoTimeout))
