"""Scale soak for the LLM-pipeline tier (VERDICT r10 ask #5).

The dedup/ANN/BM25 operators are bucketed by design but were only
measured at sf0.1; this suite pins the scale SHAPE on generated
corpora 10x larger, with controlled duplicate structure so the
assertions are about the ALGORITHM, not the fixture:

- MinHash-LSH / SimHash candidate+match counts grow ~LINEARLY in the
  corpus size when true near-dup clusters are bounded (a quadratic
  all-pairs shape would grow ~100x over a 10x corpus);
- IVF recall against exact cosine top-k holds at 10x the embedding
  fixture size;
- the BM25 index probe keeps reading only the probe terms' bucket
  partitions as the corpus grows 10x — the scanned-bytes FRACTION of
  the index is bounded by |probed buckets|/n_buckets, independent of
  corpus size (the latency-stays-flat property, pinned structurally
  rather than by wall clock).

Corpora are derived from hash expressions (deterministic, generated at
full parallelism, zero storage reads) — the same load-shaping idea as
sources/synthetic.py.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

SMALL = 2_500
BIG = 25_000        # 10x


def _docs(spark, n):
    """n unique docs (24 words from a ~1M-word space: random pairs
    share essentially nothing) plus one near-dup per 10th doc —
    bounded cluster size 2, so true pair count is exactly n/10."""
    words = F.transform(
        F.sequence(F.lit(1), F.lit(24)),
        lambda i: F.conv(F.pmod(F.xxhash64(F.col("id"), i),
                                F.lit(1_000_000)).cast("string"),
                         10, 36))
    base = (spark.range(n)
            .select(F.col("id").alias("doc_id"),
                    F.concat_ws(" ", words).alias("text")))
    dups = (base.filter(F.col("doc_id") % 10 == 0)
            .select((F.col("doc_id") + n).alias("doc_id"),
                    F.concat(F.col("text"), F.lit(" qq zz")).alias("text")))
    return base.unionByName(dups)


def _embeddings(spark, n, dim=16):
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda i: (F.pmod(F.xxhash64(F.col("id"), i), F.lit(1000))
                   .cast("double") / F.lit(500.0) - F.lit(1.0)))
    return spark.range(n).select(F.col("id").alias("vec_id"),
                                 vec.alias("embedding"))


def test_minhash_candidates_grow_linearly(spark):
    from tb_lakehouse_enhanced_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    counts = {}
    for n in (SMALL, BIG):
        pairs = minhash_lsh_pairs(_docs(spark, n), threshold=0.5)
        counts[n] = pairs.count()
        # the planted near-dups are found (recall sanity at this scale)
        assert counts[n] >= 0.8 * (n // 10), (n, counts[n])
    ratio = counts[BIG] / max(counts[SMALL], 1)
    # linear shape: 10x corpus -> ~10x pairs. All-pairs/quadratic
    # candidate generation would land near 100x.
    assert ratio < 30, (counts, "minhash pair count grew superlinearly")


def test_simhash_pairs_grow_linearly(spark):
    from tb_lakehouse_enhanced_spark.operators.dedup import simhash_pairs

    def docs(n):
        # near-dups share the DISTINCT word set (simhash is a majority
        # vote over distinct words, so these pair at hamming 0) while
        # unrelated docs draw from a ~1M-word space
        base = _docs(spark, n).filter(F.col("doc_id") < n)
        dups = (base.filter(F.col("doc_id") % 10 == 0)
                .select((F.col("doc_id") + n).alias("doc_id"),
                        F.concat(F.col("text"), F.lit(" "),
                                 F.split(F.col("text"), " ")[0]
                                 ).alias("text")))
        return base.unionByName(dups)

    counts = {}
    for n in (SMALL, BIG):
        counts[n] = simhash_pairs(docs(n), max_hamming=3).count()
        assert counts[n] >= 0.8 * (n // 10), (n, counts[n])
    ratio = counts[BIG] / max(counts[SMALL], 1)
    assert ratio < 30, (counts, "simhash pair count grew superlinearly")


def test_ivf_recall_holds_at_10x(spark):
    from tb_lakehouse_enhanced_spark.operators.similarity import (
        cosine_topk, ivf_topk,
    )
    n = 20_000          # 10x the 2000-vector parquet fixture
    emb = _embeddings(spark, n).persist()
    queries = emb.filter(F.col("vec_id") % (n // 20) == 0).limit(20)
    try:
        exact = {(r["query_id"], r["neighbor_id"])
                 for r in cosine_topk(emb, queries, k=5).collect()}
        approx = {(r["query_id"], r["neighbor_id"])
                  for r in ivf_topk(emb, queries, k=5, n_lists=16,
                                    n_probe=8).collect()}
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.6, (recall, n, "IVF recall gate broke at 10x")
    finally:
        emb.unpersist()


def _dir_bytes(d):
    total = 0
    for root, _dirs, fns in os.walk(d):
        for fn in fns:
            if fn.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, fn))
    return total


def test_bm25_probe_fraction_flat_as_corpus_grows(spark, tmp_path):
    from tb_lakehouse_enhanced_spark.operators.retrieval import (
        _term_buckets, bm25_probe, build_bm25_index,
    )
    terms = ["engine", "spark"]

    def corpus(n):
        # realistic vocabulary width (~50k distinct terms) so bucket
        # byte-shares reflect hashing, not a toy 20-word vocab; the
        # probe terms are PLANTED in every 20th doc
        words = F.transform(
            F.sequence(F.lit(1), F.lit(20)),
            lambda i: F.conv(F.pmod(F.xxhash64(F.col("id"), i),
                                    F.lit(50_000)).cast("string"),
                             10, 36))
        text = F.concat_ws(" ", words)
        text = F.when(F.col("id") % 20 == 0,
                      F.concat(text, F.lit(" spark engine"))
                      ).otherwise(text)
        return spark.range(n).select(F.col("id").alias("doc_id"),
                                     text.alias("text"))

    fracs = {}
    for n in (4_000, 40_000):
        path = str(tmp_path / f"idx{n}")
        stats = build_bm25_index(corpus(n), path, n_buckets=64)
        got = bm25_probe(spark, path, terms, k=10)
        assert got.count() == 10
        buckets = set(_term_buckets(spark, terms, stats["n_buckets"]))
        post_root = os.path.join(path, "postings")
        probed = sum(
            _dir_bytes(os.path.join(post_root, b_dir, f"term_bucket={b}"))
            for b_dir in os.listdir(post_root) for b in buckets)
        total = _dir_bytes(post_root)
        fracs[n] = probed / total
        # structural prune bound: the probe's candidate bytes are the
        # probed buckets' share of the index, not the whole index
        assert fracs[n] <= (len(buckets) + 1) / 64 * 2.5, (n, fracs[n])
    # and the FRACTION does not grow with corpus size (flat-latency
    # property relative to index growth)
    assert fracs[40_000] <= fracs[4_000] * 1.5, fracs
