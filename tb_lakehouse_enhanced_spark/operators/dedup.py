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


def portable_hash60(col) -> "F.Column":
    """60-bit non-negative integer hash reproducible in ANSI SQL engines.

    First 15 hex chars of md5 parsed as an integer — the identical value
    is `CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)` in DuckDB.
    Used when a dedup plan must be verified against an external SQL
    oracle; the production default stays xxhash64 (JVM-native, ~5x
    faster) because only determinism WITHIN the engine matters at scale.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def _base_hash(col, base_hash: str) -> "F.Column":
    if base_hash == "xxhash64":
        return F.xxhash64(col)
    if base_hash == "md5":
        return portable_hash60(col)
    raise ValueError(f"unknown base_hash {base_hash!r}")


def tokens(text) -> "F.Column":
    """Lowercased whitespace word tokens."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def _spread(df: DataFrame, by: str | None = None) -> DataFrame:
    """Fan a small-file scan out to all cores.

    Document corpora often arrive as few large-ish files; a 2 MB file is
    one input split, serializing CPU-heavy shingle/hash expressions onto
    a single task. One repartition (cheap: rows are small) buys
    full-core parallelism for everything downstream. At 100 TB the scan
    naturally yields thousands of splits and this is a no-op cost.

    With ``by`` the repartition hashes on that column instead of
    round-robin: downstream per-``by`` aggregations and windows then
    SATISFY their required distribution and skip their own exchange —
    the whole signature computation collapses to this one shuffle.
    (Trade-off: doc-length skew can unbalance tasks where round-robin
    is perfect; documents are tiny relative to a partition, so the skew
    is bounded and the saved shuffle wins at every scale.)
    """
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, F.col(by)) if by else df.repartition(n)


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
    """Exact word-set Jaccard pairs >= threshold, blocked per-bucket.

    ORACLE-PARITY variant — per-bucket quadratic, bench-excluded by
    design. The EXACT-at-scale default is ``jaccard_prefix_join``
    (PPJoin prefix filtering: identical output, near-linear candidate
    join); the approximate scale path is ``minhash_lsh_pairs``. Use
    this one only for small blocked corpora / differential testing.

    Caching note: the tokenized relation stays persisted for the
    session (the return is lazy, so it cannot be unpersisted here);
    long-lived sessions should ``spark.catalog.clearCache()`` after
    consuming the result.
    """
    d = _spread(docs).select(F.col(id_col).alias("id"), word_set(F.col(text_col)).alias("ws"),
                    *( [F.col(block_col).alias("blk")] if block_col else [F.lit(1).alias("blk")] )).persist()
    a, b = d.alias("a"), d.alias("b")
    pairs = a.join(b, (F.col("a.blk") == F.col("b.blk"))
                   & (F.col("a.id") < F.col("b.id")))
    inter = F.size(F.array_intersect(F.col("a.ws"), F.col("b.ws")))
    union = F.size(F.array_union(F.col("a.ws"), F.col("b.ws")))
    jac = inter.cast("double") / union.cast("double")
    return (pairs.select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                         jac.alias("jaccard"))
            .filter(F.col("jaccard") >= F.lit(threshold)))


def shingle_hashes(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", n: int = 3,
                   base_hash: str = "xxhash64",
                   distinct: bool = False) -> DataFrame:
    """Normalized (id, x) 3-gram shingle hashes, one pass.

    posexplode tokens + window lead() builds shingles entirely inside
    whole-stage codegen (interpreted higher-order array lambdas are ~5x
    slower). The input is spread BY doc id, so the per-doc window (and
    any downstream per-id aggregate) inherits the hash partitioning and
    runs exchange-free — the signature pipeline pays exactly one
    shuffle.

    ``distinct=False`` (default) may emit repeated (id, x) rows: MIN
    aggregation downstream (MinHash) is insensitive to duplicates, and
    skipping the per-(id,x) dedup avoids a second exchange. Pass
    ``distinct=True`` when the consumer counts shingles (exact-Jaccard
    verification).
    """
    from pyspark.sql import Window
    tok = (_spread(docs, by=id_col)
           .select(F.col(id_col).alias("id"),
                   F.posexplode(tokens(F.col(text_col))).alias("pos", "w")))
    win = Window.partitionBy("id").orderBy("pos")
    out = (tok.select(
                "id",
                F.concat_ws(" ", "w", F.lead("w", 1).over(win),
                            F.lead("w", 2).over(win)).alias("s"),
                F.lead("w", 2).over(win).alias("_w2"))
           .filter(F.col("_w2").isNotNull())  # docs >= n tokens
           .select("id", F.pmod(_base_hash(F.col("s"), base_hash), _P).alias("x")))
    return out.dropDuplicates(["id", "x"]) if distinct else out


def minhash_lsh_pairs(docs: DataFrame, threshold: float = 0.5,
                      num_hashes: int = 16, bands: int = 4,
                      text_col: str = "text", id_col: str = "doc_id",
                      verify: str = "estimate",
                      base_hash: str = "xxhash64") -> DataFrame:
    """Near-dup pairs via MinHash + banded LSH.

    shingle-hash -> minhash signature -> band buckets -> bucket
    equi-join -> similarity filter. rows/bands chosen so the LSH s-curve
    threshold (1/bands)^(1/rows) brackets ``threshold``.

    Shuffle shape (the thing that matters at 100 TB): the shingle stream
    is consumed ONCE into the per-doc signature; each bucket row carries
    the full signature (num_hashes longs) plus the per-band bucket array,
    so candidate generation is a SINGLE self-equi-join on (band, bucket).
    A pair sharing k bands would surface k times — instead of
    deduplicating with an extra shuffle over the candidate stream (the
    largest intermediate in the whole plan), each joined row checks
    "am I the FIRST band this pair collides in?" against the bucket
    arrays already on the row and only that one row survives. Scoring
    (the signature-match estimate) reads the two carried signatures —
    no re-join. ``verify='exact'`` re-joins the shingle stream to
    compute true Jaccard (1 extra pass; use for audits/tests).
    """
    rows = num_hashes // bands
    ex = shingle_hashes(docs, text_col, id_col, base_hash=base_hash,
                        distinct=(verify == "exact"))
    if verify == "exact":
        ex = ex.persist()  # re-read below for true-Jaccard scoring
    # single-F.expr string per column (not Column-by-Column composition):
    # the ~num_hashes*6 py4j round-trips otherwise dominate driver time
    sig_aggs = [
        F.expr(f"min(pmod(x * {2 * i + 1}L + {(i * 0x9E3779B9 + 7) % _P}L,"
               f" {_P}L))").alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    sig = ex.groupBy("id").agg(*sig_aggs)

    if base_hash == "xxhash64":
        band_cols = [
            F.expr("xxhash64(" + ", ".join(f"mh_{b * rows + r}" for r in range(rows))
                   + f", {b})").alias("bucket")
            for b in range(bands)
        ]
    else:  # portable band hash: md5 over the comma-joined row values
        band_cols = [
            portable_hash60(F.expr(
                "concat_ws(','" + "".join(f", mh_{b * rows + r}" for r in range(rows))
                + f", {b})")).alias("bucket")
            for b in range(bands)
        ]
    sig_arr = F.expr("array(" + ", ".join(f"mh_{i}" for i in range(num_hashes)) + ")")
    buckets = (sig.select("id", sig_arr.alias("sig"),
                          F.array(*band_cols).alias("bks"))
               .select("id", "sig", "bks",
                       F.posexplode("bks").alias("band", "bucket")))
    a, b = buckets.alias("a"), buckets.alias("b")
    # first band (by index) whose buckets collide — the single surviving
    # join row for this pair; replaces dropDuplicates' extra shuffle
    first_band = F.coalesce(*[
        F.when(F.element_at(F.col("a.bks"), k + 1)
               == F.element_at(F.col("b.bks"), k + 1), F.lit(k))
        for k in range(bands)], F.lit(-1))
    cand = (a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.id") < F.col("b.id")))
            .filter(F.col("a.band") == first_band)
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    F.col("a.sig").alias("sig_a"), F.col("b.sig").alias("sig_b")))

    if verify == "exact":
        pairs = cand.select("id_a", "id_b")
        sizes = ex.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
        ea = ex.select(F.col("id").alias("id_a"), "x")
        eb = ex.select(F.col("id").alias("id_b"), "x")
        inter = (F.broadcast(pairs).join(ea, "id_a").join(eb, ["id_b", "x"])
                 .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("i")))
        jac = (F.col("i").cast("double")
               / (F.col("na") + F.col("nb") - F.col("i")).cast("double"))
        return (inter
                .join(sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na")), "id_a")
                .join(sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb")), "id_b")
                .select("id_a", "id_b", jac.alias("jaccard"))
                .filter(F.col("jaccard") >= F.lit(threshold)))

    matches = F.expr(" + ".join(
        f"if(element_at(sig_a, {i + 1}) = element_at(sig_b, {i + 1}), 1, 0)"
        for i in range(num_hashes)))
    return (cand.select("id_a", "id_b",
                        (matches.cast("double")
                         / F.lit(float(num_hashes))).alias("jaccard"))
            .filter(F.col("jaccard") >= F.lit(threshold)))


def simhash(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id", bits: int = 64,
            base_hash: str = "xxhash64") -> DataFrame:
    """64-bit SimHash fingerprint per document.

    Bit b of the fingerprint = majority vote of bit b over xxhash64 of
    each distinct word. Computed as explode -> one xxhash64 per word ->
    64 SUM aggregates (map-side-combinable hash agg in whole-stage
    codegen) rather than 64 interpreted higher-order array folds per
    row — ~20x faster and the shuffle carries only (id, 64 ints).
    """
    words = (_spread(docs, by=id_col).select(F.col(id_col).alias("id"),
                         F.explode(word_set(F.col(text_col))).alias("w"))
             .withColumn("h", _base_hash(F.col("w"), base_hash)))
    # Pack 4 bit-counters into 16-bit lanes of each sum: bits/4 packed
    # SUMs + one COUNT instead of `bits` conditional SUMs. Equivalent
    # majority vote (2*count_b > n  <=>  sum of +-1 votes > 0, ties
    # included), but the generated aggregate code is ~4x smaller — on
    # small inputs whole-stage-codegen COMPILE time dominated the run.
    # Lane capacity 65535 distinct words per doc is far beyond any real
    # document; shard the doc first if that ever changes.
    # Both loops emit ONE SQL string each (F.expr) rather than composing
    # Column objects term-by-term: ~500 py4j round-trips building the
    # 64-term tree cost more driver time than the query's execution.
    n_longs = bits // 4
    packed = []
    for j in range(n_longs):
        lanes = " + ".join(
            f"shiftleft(shiftright(h, {j + n_longs * lane}) & 1L, {16 * lane})"
            for lane in range(4))
        packed.append(F.expr(f"sum({lanes})").alias(f"p{j}"))
    votes = words.groupBy("id").agg(*packed,
                                    F.count(F.lit(1)).alias("_nw"))
    # disjoint bit positions → + is OR (no carries; b=63's term is the
    # sign bit, still carry-free)
    fp = F.expr(" + ".join(
        f"if(((shiftright(p{b % n_longs}, {16 * (b // n_longs)}) & 65535L)"
        f" * 2) > _nw, shiftleft(1L, {b}), 0L)"
        for b in range(bits)))
    return votes.select("id", fp.alias("simhash"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 3,
                  text_col: str = "text", id_col: str = "doc_id",
                  bits: int = 64, base_hash: str = "xxhash64") -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming.

    Candidate generation: split the fingerprint into 4 equal chunks
    (16 bits at the default 64; 15 at the portable 60); any pair within
    distance 3 shares at least one exact chunk (pigeonhole), so
    candidates come from 4 chunk equi-joins — shuffles on small integer
    keys, never a cross-join. A pair matching in k chunks surfaces k
    times from the join; rather than deduplicating with a shuffle over
    the whole candidate stream, each joined row recomputes which chunks
    match from XOR(sh_a, sh_b) (already on the row) and only the
    first-matching-chunk row survives — one row per pair, zero extra
    shuffles, and the exchange feeding both join sides is reused.
    """
    cw = bits // 4  # chunk width
    mask = (1 << cw) - 1
    fps = simhash(docs, text_col, id_col, bits=bits, base_hash=base_hash)
    chunks = fps.select(
        "id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("chunk_no"),
                     F.shiftright(F.col("simhash"), cw * i)
                     .bitwiseAND(F.lit(mask).cast("long")).alias("chunk"))
            for i in range(4)
        ])).alias("c")
    ).select("id", "simhash", "c.chunk_no", "c.chunk")
    a, b = chunks.alias("a"), chunks.alias("b")
    xor = F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    first_chunk = F.coalesce(*[
        F.when(F.shiftright(xor, cw * i)
               .bitwiseAND(F.lit(mask).cast("long")) == 0, F.lit(i))
        for i in range(4)], F.lit(-1))
    cand = (a.join(b, (F.col("a.chunk_no") == F.col("b.chunk_no"))
                   & (F.col("a.chunk") == F.col("b.chunk"))
                   & (F.col("a.id") < F.col("b.id")))
            .filter(F.col("a.chunk_no") == first_chunk)
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    F.col("a.simhash").alias("sh_a"), F.col("b.simhash").alias("sh_b")))
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (cand.select("id_a", "id_b", ham.cast("int").alias("hamming"))
            .filter(F.col("hamming") <= max_hamming))


def winnow_fingerprints(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 12, w: int = 8,
                        base_hash: str = "xxhash64") -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken:
    "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
    2003) — the rolling-hash fingerprint scheme: hash every character
    k-gram of the normalized text, slide a window of ``w`` consecutive
    gram hashes, keep each window's minimum. Any substring shared
    between two documents of length >= w + k - 1 is GUARANTEED to share
    at least one selected fingerprint (the winnowing theorem), which
    whole-doc hashing (``functions.text.doc_fingerprint``) cannot see.

    Spark-first shape: positions come from ``explode(sequence(...))``
    and each k-gram hashes independently inside codegen — embarrassingly
    parallel, unlike the literal sequential rolling recurrence (a Rabin
    incremental hash saves per-gram work only in serial scans; here
    every gram is one substring+hash in the same generated loop). The
    window minimum is a PARTITIONed frame per document; everything
    inherits one hash partitioning on the doc id.

    Returns distinct ``(id, fp)`` rows.
    """
    from pyspark.sql import Window
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    g = (_spread(docs, by=id_col)
         .select(F.col(id_col).alias("id"), norm.alias("_t"))
         .select("id", "_t",
                 F.explode(F.sequence(F.lit(1), F.length("_t") - k + 1))
                 .alias("i"))
         .select("id", "i",
                 _base_hash(F.expr(f"substring(_t, i, {k})"),
                            base_hash).alias("h")))
    win = (Window.partitionBy("id").orderBy("i").rowsBetween(0, w - 1))
    n_wins = F.col("_max_i") - (w - 1)  # windows exist while i <= max_i-(w-1)
    fps = (g.withColumn("fp", F.min("h").over(win))
           .withColumn("_max_i", F.max("i").over(Window.partitionBy("id")))
           .filter(F.col("i") <= n_wins)
           .select("id", "fp").dropDuplicates(["id", "fp"]))
    return fps


def winnow_pairs(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", k: int = 12, w: int = 8,
                 max_df: int = 25, min_shared: int = 5,
                 base_hash: str = "xxhash64") -> DataFrame:
    """Near-dup candidate pairs by shared winnowing fingerprints.

    The join key is the fingerprint (shuffle on fp — the LSH-bucket
    shape); fingerprints occurring in more than ``max_df`` documents are
    dropped first (the stop-gram analogue: a boilerplate gram shared by
    everything would otherwise create a quadratic hot bucket), and pairs
    must share ``min_shared`` fingerprints. Output: (id_a, id_b,
    n_shared).
    """
    fps = winnow_fingerprints(docs, text_col, id_col, k, w, base_hash).persist()
    rare = (fps.groupBy("fp").agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_df).select("fp"))
    kept = fps.join(rare, "fp")
    a = kept.select(F.col("fp"), F.col("id").alias("id_a"))
    b = kept.select(F.col("fp"), F.col("id").alias("id_b"))
    return (a.join(b, "fp")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .filter(F.col("n_shared") >= min_shared))


def incremental_dedup(batch: DataFrame, corpus: DataFrame,
                      text_col: str = "text", id_col: str = "doc_id",
                      threshold: float = 0.5,
                      base_hash: str = "xxhash64") -> DataFrame:
    """Admit only batch documents that are NOT duplicates of the corpus.

    The continuous-ingest shape: the corpus is the (huge, already-deduped)
    lake; the batch is today's crawl. Exact duplicates drop via an
    anti-join on the text hash — the corpus side reduces to one hash per
    document, so the join shuffles (hash, id) pairs, never text. Near-dups
    drop via the banded-MinHash bucket join (same signature pipeline as
    ``minhash_lsh_pairs``), probing batch bucket rows against corpus
    bucket rows only — no batch-batch or corpus-corpus pairs are ever
    generated, which is what keeps daily ingest linear in |batch| at a
    100 TB corpus (the corpus signatures are computed once and reusable
    across batches in production).
    """
    bh = F.md5(F.col(text_col)) if base_hash == "md5" \
        else F.xxhash64(F.col(text_col))
    exact_survivors = batch.join(
        corpus.select(bh.alias("_h")).dropDuplicates(["_h"]),
        bh == F.col("_h"), "left_anti")

    rows, bands, num_hashes = 4, 4, 16
    def buckets(docs):
        ex = shingle_hashes(docs, text_col, id_col, base_hash=base_hash)
        aggs = []
        for i in range(num_hashes):
            a_i, b_i = 2 * i + 1, (i * 0x9E3779B9 + 7) % _P
            aggs.append(F.min(F.pmod(F.col("x") * a_i + b_i, _P)).alias(f"mh_{i}"))
        sig = ex.groupBy("id").agg(*aggs)
        if base_hash == "xxhash64":
            band_cols = [F.xxhash64(*[F.col(f"mh_{b * rows + r}") for r in range(rows)],
                                    F.lit(b)).alias("bucket") for b in range(bands)]
        else:
            band_cols = [portable_hash60(F.concat_ws(
                ",", *[F.col(f"mh_{b * rows + r}") for r in range(rows)], F.lit(b)))
                .alias("bucket") for b in range(bands)]
        return sig.select("id", F.explode(F.array(*band_cols)).alias("bucket"))

    near_hit = (buckets(exact_survivors).alias("b")
                .join(buckets(corpus).alias("c"),
                      F.col("b.bucket") == F.col("c.bucket"), "left_semi")
                .select(F.col("id").alias("_dup_id")).distinct())
    return exact_survivors.join(
        near_hit, F.col(id_col) == F.col("_dup_id"), "left_anti")


def jaccard_prefix_join(docs: DataFrame, threshold: float = 0.6,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """EXACT word-set Jaccard pairs >= threshold via prefix filtering
    (the PPJoin family — Xiao et al., "Efficient Similarity Joins for
    Near Duplicate Detection", WWW 2008).

    Same output as the all-pairs formulation (``jaccard_near_dup``
    without blocking), but candidate generation is an equi-join on
    PREFIX tokens instead of a quadratic self-join: order every doc's
    tokens by ascending global document frequency (rarest first, total
    order via the (df, token) tie-break), keep only the first
    ``n - ceil(t*n) + 1`` tokens — any pair with J >= t must share at
    least one prefix token (pigeonhole: an overlap confined to the
    suffixes is at most ceil(t*n) - 1 < the t*n overlap J >= t
    requires). A length filter (t * max <= min) prunes further;
    survivors are verified exactly on the full sets.

    Scale: two shuffles that matter — the token-frequency aggregation
    and the prefix-token candidate join. Rare-first ordering makes
    prefix buckets small by construction (the rarest token of a doc is
    shared by few docs), so the join stays near-linear on real corpora;
    output size itself is the floor on near-dup-dense data.
    """
    # persist: four consumer branches (freq, ranked, verify-a, verify-b)
    # all sit above the word_set tokenization, whose regex+distinct work
    # would otherwise recompute per branch (the repartition exchange is
    # reused, but the projection above it is not). The cache lives for
    # the session (the return is lazy, so it cannot be unpersisted
    # here); long-lived sessions should spark.catalog.clearCache()
    # after consuming the result — same contract as jaccard_near_dup.
    d = (_spread(docs)
         .select(F.col(id_col).alias("id"), word_set(F.col(text_col)).alias("ws"))
         .withColumn("n", F.size("ws"))).persist()
    tok = d.select("id", F.explode("ws").alias("w"))
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    # order tokens rarest-first inside each doc: sort (df, w) structs
    ranked = (tok.join(freq, "w")
              .groupBy("id")
              .agg(F.array_sort(F.collect_list(F.struct("df", "w")))
                   .alias("_o")))
    t = float(threshold)
    # epsilon guard on the ceil boundary: 0.6*5 in binary doubles is
    # 3.0000000000000004, whose ceil (4) would shrink the prefix below
    # the guarantee and silently DROP valid pairs; shaving 1e-9 first
    # makes the ceil exact for every rational threshold in practice
    # (filters may only loosen — verification is exact anyway)
    prefix_len = F.expr(
        f"size(_o) - CAST(ceil({t} * size(_o) - 1e-9) AS INT) + 1")
    prefix = (ranked.select("id",
                            F.explode(F.slice(F.col("_o"), 1, prefix_len))
                            .alias("p"))
              .select("id", F.col("p.w").alias("w")))
    a = prefix.toDF("id_a", "w")
    b = prefix.toDF("id_b", "w")
    cand = (a.join(b, "w")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())
    da = d.select(F.col("id").alias("id_a"), F.col("ws").alias("_wa"),
                  F.col("n").alias("_na"))
    db = d.select(F.col("id").alias("id_b"), F.col("ws").alias("_wb"),
                  F.col("n").alias("_nb"))
    inter = F.size(F.array_intersect("_wa", "_wb"))
    union = F.size(F.array_union("_wa", "_wb"))
    return (cand.join(da, "id_a").join(db, "id_b")
            .filter(F.lit(t) * F.greatest("_na", "_nb") - F.lit(1e-9)
                    <= F.least("_na", "_nb"))
            .select("id_a", "id_b",
                    (inter.cast("double") / union.cast("double"))
                    .alias("jaccard"))
            .filter(F.col("jaccard") >= F.lit(t)))
