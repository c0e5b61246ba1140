"""Stream-static enrichment: join a live stream to dimension tables.

Structured Streaming joins a stream against a static (batch) DataFrame
without any state store — each micro-batch plans a fresh join, so the
static side is re-read per batch and naturally picks up slowly-changing
dimension updates between batches. With a broadcast hint the stream
side never shuffles: the dim ships to every task once per batch, the
right shape for enriching a 100 TB/day event stream against dims that
fit in executor memory. (Big-big stream joins belong in
``tumbling.interval_stream_join`` with watermarks on both sides.)
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(stream: DataFrame, dim: DataFrame,
                  on: Sequence[str] | str, how: str = "left",
                  broadcast_dim: bool = True) -> DataFrame:
    """Join ``stream`` (streaming) to ``dim`` (static), keeping stream
    rows on ``left`` so unmatched events survive with NULL attributes
    (the unknown-member pattern lives downstream, SURVEY.md §1.1).
    """
    right = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(right, on, how)
