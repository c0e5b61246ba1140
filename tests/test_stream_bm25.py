"""Streaming corpus -> searchable BM25 index (exactly-once appends)."""

from __future__ import annotations

import json
import os


def test_stream_bm25_index_sink_exactly_once(spark, tmp_path):
    """The synthetic doc stream feeds stream_bm25_index_sink; after the
    stream drains, probes against the streamed index equal probes
    against a batch-built index over the same corpus, and replaying an
    applied micro-batch changes nothing (high-water skip + invisible
    crashed-batch dirs)."""
    from tb_lakehouse_enhanced_spark.operators.retrieval import (
        bm25_probe, build_bm25_index,
    )
    from tb_lakehouse_enhanced_spark.sources.synthetic import (
        register as reg_synth,
    )
    from tb_lakehouse_enhanced_spark.streaming.sink import bm25_batch_sink
    reg_synth(spark)
    idx = str(tmp_path / "idx")
    stream = (spark.readStream.format("synthetic_docs")
              .option("rows", 300).option("rows_per_batch", 100)
              .option("seed", 11).load())
    q = (__import__("tb_lakehouse_enhanced_spark.streaming.sink",
                    fromlist=["stream_bm25_index_sink"])
         .stream_bm25_index_sink(stream, idx, n_buckets=16)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .start())
    q.processAllAvailable()
    q.stop()

    corpus = (spark.read.format("synthetic_docs")
              .option("rows", 300).option("seed", 11).load())
    ref = str(tmp_path / "ref")
    build_bm25_index(corpus, ref, n_buckets=16)
    terms = ["customer", "window", "merge", "slow"]
    want = sorted(map(tuple, bm25_probe(spark, ref, terms, k=25).collect()))
    got = sorted(map(tuple, bm25_probe(spark, idx, terms, k=25).collect()))
    assert got == want and len(got) == 25

    # replay an applied batch: the high-water mark skips it
    stats_before = json.load(open(os.path.join(idx, "_bm25_stats.json")))
    sink = bm25_batch_sink(idx, n_buckets=16)
    sink(corpus.limit(50), 0)            # foreachBatch replays batch 0
    stats_after = json.load(open(os.path.join(idx, "_bm25_stats.json")))
    assert stats_after == stats_before
    assert sorted(map(tuple, bm25_probe(spark, idx, terms, k=25)
                  .collect())) == want

    # a crashed append (dir written, mark not advanced) is invisible
    hw = stats_after["last_batch"]
    orphan = os.path.join(idx, "postings", f"ingest_batch={hw + 7}")
    (corpus.limit(20).selectExpr(
        "doc_id", "CAST(1.0 AS DOUBLE) AS dl",
        "'customer' AS term", "CAST(9.0 AS DOUBLE) AS tf",
        "CAST(3 AS BIGINT) AS term_bucket")
     .write.mode("overwrite").partitionBy("term_bucket").parquet(orphan))
    assert sorted(map(tuple, bm25_probe(spark, idx, terms, k=25)
                  .collect())) == want
