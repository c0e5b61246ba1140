"""Deduplication operators (LLM-pipeline extension, SURVEY.md §2.11).

Four tiers, trading exactness for scale:

- ``exact_dedup``          hash-groupBy on normalized content (exact).
- ``jaccard_near_dup``     exact word-set Jaccard within blocking buckets
                           (oracle-verifiable; quadratic only per-bucket).
- ``minhash_lsh_pairs``    MinHash signatures + banded LSH bucket-join —
                           the 100 TB path: candidate generation is a
                           shuffle on (band, bucket-hash) instead of a
                           cross-join; candidates are then verified with
                           true Jaccard.
- ``simhash_pairs``        64-bit SimHash fingerprints; near-dup =
                           small Hamming distance, candidates via
                           16-bit-chunk blocking (pigeonhole: distance<=3
                           guarantees one exact chunk match).

All computation is built-in ``pyspark.sql.functions`` (JVM-side arrays +
xxhash64); no Python UDFs, so signatures stream at scan speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Mersenne prime 2^31-1 for the universal-hash family h(x) = (a*x+b) mod p.
# (31-bit so (p-1)*a + b stays far below 2^63 — no long overflow under ANSI.)
_P = (1 << 31) - 1


def tokens(text) -> "F.Column":
    """Lowercased whitespace word tokens."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def word_set(text) -> "F.Column":
    return F.array_distinct(tokens(text))


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """One survivor per distinct text: deterministic min-id winner.

    ``dropDuplicates`` keeps an arbitrary row; a min-id groupBy is
    deterministic AND map-side-combinable (partial min per partition →
    one shuffle of group keys only).
    """
    return (docs.groupBy(text_col)
            .agg(F.min(id_col).alias(id_col))
            .select(id_col, text_col))


def jaccard_near_dup(docs: DataFrame, threshold: float = 0.6,
                     text_col: str = "text", id_col: str = "doc_id",
                     block_col: str | None = "lang") -> DataFrame:
    """Exact word-set Jaccard pairs >= threshold, blocked to stay sub-quadratic.

    Blocking on a low-cardinality column (language) bounds each join
    bucket; at scale block on (lang, length-band) or feed LSH candidates
    instead (``minhash_lsh_pairs``).
    """
    d = docs.select(F.col(id_col).alias("id"), word_set(F.col(text_col)).alias("ws"),
                    *( [F.col(block_col).alias("blk")] if block_col else [F.lit(1).alias("blk")] ))
    a, b = d.alias("a"), d.alias("b")
    pairs = a.join(b, (F.col("a.blk") == F.col("b.blk"))
                   & (F.col("a.id") < F.col("b.id")))
    inter = F.size(F.array_intersect(F.col("a.ws"), F.col("b.ws")))
    union = F.size(F.array_union(F.col("a.ws"), F.col("b.ws")))
    jac = inter.cast("double") / union.cast("double")
    return (pairs.select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                         jac.alias("jaccard"))
            .filter(F.col("jaccard") >= F.lit(threshold)))


def _minhash_signature(ws, num_hashes: int):
    """num_hashes minhash values over a word-set column.

    Base hash: xxhash64(word) (JVM-side); family: (a_i*x+b_i) mod 2^61-1
    with fixed seeds — fully deterministic across runs/partitions.
    """
    sigs = []
    for i in range(num_hashes):
        a, b = 2 * i + 1, (i * 0x9E3779B9 + 7) % _P
        h = F.transform(ws, lambda w: F.pmod(F.pmod(F.xxhash64(w), _P) * a + b, _P))
        sigs.append(F.array_min(h).alias(f"mh_{i}"))
    return sigs


def minhash_lsh_pairs(docs: DataFrame, threshold: float = 0.5,
                      num_hashes: int = 16, bands: int = 4,
                      text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs via MinHash + banded LSH, verified with true Jaccard.

    shingle -> minhash signature -> band buckets -> bucket equi-join
    (the only shuffle, on hash keys) -> exact Jaccard verification of the
    candidate pairs. rows/bands chosen so the LSH s-curve threshold
    (1/bands)^(1/rows) brackets ``threshold``.
    """
    rows = num_hashes // bands
    base = docs.select(F.col(id_col).alias("id"),
                       word_set(F.col(text_col)).alias("ws"))
    sig = base.select("id", "ws", *_minhash_signature(F.col("ws"), num_hashes))
    band_cols = [
        F.xxhash64(*[F.col(f"mh_{b * rows + r}") for r in range(rows)],
                   F.lit(b)).alias("bucket")
        for b in range(bands)
    ]
    buckets = sig.select(
        "id", "ws",
        F.explode(F.array(*band_cols)).alias("bucket"))
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col("a.id") < F.col("b.id")))
            .select("a.id", "a.ws", F.col("b.id").alias("id_b"),
                    F.col("b.ws").alias("ws_b"))
            .dropDuplicates(["id", "id_b"]))
    inter = F.size(F.array_intersect(F.col("ws"), F.col("ws_b")))
    union = F.size(F.array_union(F.col("ws"), F.col("ws_b")))
    jac = inter.cast("double") / union.cast("double")
    return (cand.select(F.col("id").alias("id_a"), F.col("id_b"),
                        jac.alias("jaccard"))
            .filter(F.col("jaccard") >= F.lit(threshold)))


def simhash(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """64-bit SimHash fingerprint per document.

    Bit b of the fingerprint = majority vote of bit b over xxhash64 of
    each distinct word. Expressed as array ops + bit arithmetic — no UDF.
    """
    ws = word_set(F.col(text_col))
    hashes = F.transform(ws, lambda w: F.xxhash64(w))
    one = F.lit(1).cast("long")

    def vote(b: int):
        # two-arg lambda required by F.aggregate; bind b via closure
        def merge(acc, h):
            return acc + F.when(h.bitwiseAND(F.shiftleft(one, b)) != 0,
                                F.lit(1)).otherwise(F.lit(-1))
        return (F.aggregate(hashes, F.lit(0), merge) > 0).cast("long") \
            * F.shiftleft(one, b)

    bit_votes = [vote(b) for b in range(bits)]
    fp = bit_votes[0]
    for bv in bit_votes[1:]:
        fp = fp.bitwiseOR(bv)
    return docs.select(F.col(id_col).alias("id"), fp.alias("simhash"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 3,
                  text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming.

    Candidate generation: split the 64-bit fingerprint into 4 x 16-bit
    chunks; any pair within distance 3 shares at least one exact chunk
    (pigeonhole), so candidates come from 4 chunk equi-joins — shuffles
    on 16-bit keys, never a cross-join.
    """
    fps = simhash(docs, text_col, id_col)
    chunks = fps.select(
        "id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("chunk_no"),
                     F.shiftright(F.col("simhash"), 16 * i)
                     .bitwiseAND(F.lit(0xFFFF).cast("long")).alias("chunk"))
            for i in range(4)
        ])).alias("c")
    ).select("id", "simhash", "c.chunk_no", "c.chunk")
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (a.join(b, (F.col("a.chunk_no") == F.col("b.chunk_no"))
                   & (F.col("a.chunk") == F.col("b.chunk"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    F.col("a.simhash").alias("sh_a"), F.col("b.simhash").alias("sh_b"))
            .dropDuplicates(["id_a", "id_b"]))
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (cand.select("id_a", "id_b", ham.cast("int").alias("hamming"))
            .filter(F.col("hamming") <= max_hamming))
