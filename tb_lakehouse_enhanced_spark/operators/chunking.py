"""Training-sequence assembly: document chunking + sequence packing.

The last mile of a pretraining data pipeline: documents become
fixed-size overlapping token windows (``chunk_documents``), and the
token stream is packed into contiguous fixed-capacity training
sequences (``pack_sequences``). Both are pure DataFrame expressions —
the chunk fan-out is an exploded per-row array (narrow, no shuffle) and
the packing offset is the distributed prefix-sum from
``operators/sequence.py`` (no single-task global window), so both
shapes survive a 100 TB corpus.

Tokens here are whitespace tokens (the engine's ``token_count``
convention); a BPE tokenizer slots in by swapping the split expression
for a Pandas-UDF token counter without changing either plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(docs: DataFrame, chunk_tokens: int = 128,
                    overlap: int = 16, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Split each document into overlapping token windows.

    Chunk ``i`` covers tokens ``[i*stride, i*stride + chunk_tokens)``
    with ``stride = chunk_tokens - overlap``; the last chunk is partial.
    Output: id, chunk_id (0-based), n_tokens, chunk_text. Narrow plan:
    per-row array build + explode, no shuffle, no UDF.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), " ")
    n = F.size(toks)
    # ceil((n - overlap) / stride) chunks, minimum 1
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)).cast("double") / F.lit(stride)).cast("int"),
        F.lit(1))
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("bigint").alias("chunk_id"),
            F.least(n - i * stride, F.lit(chunk_tokens)).cast("bigint")
            .alias("n_tokens"),
            F.array_join(F.slice(toks, i * stride + 1, chunk_tokens), " ")
            .alias("chunk_text")))
    return (docs.select(F.col(id_col), F.explode(chunks).alias("_c"))
            .select(id_col, "_c.chunk_id", "_c.n_tokens", "_c.chunk_text"))


def pack_sequences(docs: DataFrame, target_tokens: int = 2048,
                   text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Assign each document a training-sequence id by contiguous packing.

    Documents are laid out as one token stream in ``id_col`` order; a
    document's sequence is the bin its START offset falls in
    (``seq_id = floor(start_offset / target_tokens)``). Deterministic
    across runs/partitionings/engines — the packing is a pure function
    of the global prefix sum, which the two-phase ``running_total``
    computes without funneling the corpus through one task.

    Output: id, n_tokens, start_offset, seq_id.
    """
    toks = F.split(F.trim(F.col(text_col)), " ")
    with_counts = docs.select(F.col(id_col),
                              F.size(toks).cast("bigint").alias("n_tokens"))
    from .sequence import running_total
    out = running_total(with_counts, [id_col], "n_tokens", "start_offset",
                        exclusive=True)
    return out.select(
        id_col, "n_tokens", "start_offset",
        F.floor(F.col("start_offset") / F.lit(target_tokens))
        .cast("bigint").alias("seq_id"))


def register_sentence_udtf(spark, name: str = "split_sentences"):
    """Register the sentence-splitting Python UDTF (SQL: ``..., LATERAL
    split_sentences(text) s``) and return the class.

    This is the engine's documented UDTF EXTENSION POINT, not its
    default path: a plain sentence split is expressible with
    split+posexplode (JVM-side, preferred — see
    ``sentence_split_builtin``). The UDTF slot exists for per-row
    expansion logic built-ins genuinely can't express — a stateful BPE
    tokenizer, a document-structure parser — and this reference
    implementation pins the row-expansion contract (ordered 0-based
    sent_no, trimmed non-empty sentences) that such plugins must keep.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_no int, sentence string")
    class SplitSentences:
        def eval(self, text: str):
            if text is None:
                return
            parts = (p.strip() for p in text.split("."))
            for i, s in enumerate(p for p in parts if p):
                yield i, s

    spark.udtf.register(name, SplitSentences)
    return SplitSentences


def sentence_split_builtin(docs: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """The built-in equivalent of the sentence UDTF: split + filter +
    posexplode, fully inside codegen — the shape to use unless the
    expansion logic is genuinely not expressible."""
    parts = F.filter(
        F.transform(F.split(F.col(text_col), r"\."), lambda p: F.trim(p)),
        lambda p: p != "")
    return (docs.select(F.col(id_col),
                        F.posexplode(parts).alias("sent_no", "sentence")))
