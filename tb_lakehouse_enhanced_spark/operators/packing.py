"""Sequence packing: docs → fixed-length training context windows.

LLM training consumes fixed-length token windows, not documents: the
corpus is tokenized, concatenated in a deterministic order, and chopped
every ``window`` tokens, with documents spanning chunk boundaries split
across the adjacent windows. The reference repo has no counterpart (its
consumption layer is BI over a star schema — SURVEY.md §2.4); this is
part of the LLM-data-pipeline extension surface mandated by
BASELINE.json, built on the same distributed prefix-sum machinery as
surrogate-key assignment (operators/sequence.py).

Distributed formulation (no single-task global window, no UDFs):

1. ``running_total`` computes each doc's exclusive global token offset
   under the order keys — one range shuffle, all cores busy;
2. each doc covers token span ``[start, start+n)``; the windows it
   touches are ``start DIV W .. (start+n-1) DIV W`` — a per-row
   ``sequence()`` + ``explode`` (narrow);
3. the slice of the doc that lands in window ``w`` is
   ``[max(w*W - start, 0), min((w+1)*W - start, n))`` — pure integer
   arithmetic inside codegen.

At 100 TB the only shuffle is the range partition by order key; the
explode fan-out is bounded by ``1 + n/W`` rows per doc. The output is a
*packing manifest* (window → doc slices) rather than materialized token
arrays: the actual token movement is a downstream ``mapInPandas`` over
the manifest joined to the tokenized docs, which stays partition-local
when both sides are range-partitioned on the same order keys.

``plan_shards`` is the no-split sibling: assign whole docs to output
shards of ~``budget`` tokens each (boundary docs go to the shard their
first token falls in) — the planning step for balanced corpus shard
writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sequence import running_total


def pack_context_windows(docs: DataFrame, len_col: str, window: int,
                         order_cols: list[str],
                         num_partitions: int | None = None) -> DataFrame:
    """Return the packing manifest: one row per (window_id, doc slice).

    Columns: ``order_cols…, window_id, tok_from, tok_to, n_toks`` where
    ``[tok_from, tok_to)`` indexes into the doc's own token sequence and
    ``n_toks = tok_to - tok_from``. Zero-length docs are dropped (they
    occupy no tokens). Deterministic whenever ``order_cols`` are unique.
    """
    if window <= 0:
        raise ValueError(f"window must be positive, got {window}")
    w = F.lit(int(window)).cast("bigint")
    d = (docs.select(*order_cols, F.col(len_col).cast("bigint").alias("_n"))
         .filter(F.col("_n") > 0))
    d = running_total(d, order_cols, "_n", "_start", exclusive=True,
                      num_partitions=num_partitions)
    # integer DIV (offsets are non-negative, so DIV == floor division)
    d = (d.withColumn("_w0", F.expr(f"_start DIV {int(window)}"))
         .withColumn("_w1", F.expr(f"(_start + _n - 1) DIV {int(window)}")))
    e = d.select(*order_cols, "_start", "_n",
                 F.explode(F.sequence("_w0", "_w1")).alias("window_id"))
    tok_from = F.greatest(F.col("window_id") * w - F.col("_start"), F.lit(0).cast("bigint"))
    tok_to = F.least((F.col("window_id") + 1) * w - F.col("_start"), F.col("_n"))
    return (e.select(*order_cols,
                     F.col("window_id").cast("bigint").alias("window_id"),
                     tok_from.cast("bigint").alias("tok_from"),
                     tok_to.cast("bigint").alias("tok_to"))
            .withColumn("n_toks", (F.col("tok_to") - F.col("tok_from"))))


def materialize_context_windows(tokens: DataFrame, manifest: DataFrame,
                                id_col: str, toks_col: str) -> DataFrame:
    """Turn the packing manifest into actual packed training samples.

    ``tokens``: (id_col, toks_col array<string>) — the tokenized docs.
    ``manifest``: output of :func:`pack_context_windows` keyed on the
    same ``id_col``. Returns one row per window:
    ``window_id, n_docs, n_toks, window_text`` (the window's tokens
    joined with single spaces, doc slices in ``id_col`` order).

    Two shuffles at any scale: the manifest→tokens equi-join on doc id
    (manifest rows ≈ docs + boundary crossings, so co-partitioning on
    id keeps it narrow) and the per-window assembly groupBy. Slicing is
    in-row ``slice()``; assembly order is pinned by sorting the
    collected (id, piece) structs, so the result is independent of
    partitioning and task order.
    """
    # slice() takes int32 positions — safe by construction: Spark
    # ArrayType is int32-indexed, so a single doc's token array can
    # never hold >= 2^31 elements and the per-doc tok_from/n_toks
    # (both < the doc's own length) always fit int. The bigint
    # manifest columns protect the CROSS-doc arithmetic, which has no
    # such bound.
    sl = F.slice(F.col(toks_col), F.col("tok_from").cast("int") + 1,
                 F.col("n_toks").cast("int"))
    joined = (manifest.join(tokens, id_col)
              .select("window_id", F.col(id_col).alias("_id"),
                      "n_toks", sl.alias("_piece")))
    assembled = F.array_join(
        F.flatten(F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("_id"), F.col("_piece")))),
            lambda s: s["_piece"])),
        " ")
    return (joined.groupBy("window_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.sum("n_toks").cast("bigint").alias("n_toks"),
                 assembled.alias("window_text")))


def plan_shards(docs: DataFrame, len_col: str, budget: int,
                order_cols: list[str],
                num_partitions: int | None = None) -> DataFrame:
    """Assign whole docs to ~``budget``-token shards (no splitting).

    ``shard_id = doc's exclusive token offset DIV budget``: a doc
    straddling a boundary lands in the shard its first token falls in,
    so every shard holds ``budget ± max_doc_len`` tokens. Returns the
    per-doc assignment (``order_cols…, shard_id, n_toks``); aggregate
    per shard downstream (or use as the partition key of the writer).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    d = (docs.select(*order_cols, F.col(len_col).cast("bigint").alias("_n"))
         .filter(F.col("_n") > 0))
    d = running_total(d, order_cols, "_n", "_start", exclusive=True,
                      num_partitions=num_partitions)
    return d.select(*order_cols,
                    F.expr(f"_start DIV {int(budget)}").cast("bigint")
                    .alias("shard_id"),
                    F.col("_n").alias("n_toks"))
