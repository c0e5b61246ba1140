"""Streaming sequence packing (streaming/packing.py): offsets carry
across micro-batches and reproduce the batch packer's manifest."""

from __future__ import annotations

from pyspark.sql import functions as F


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, "source string, doc_id long, n long") \
        .coalesce(1).write.mode("append").parquet(path)


def test_stream_pack_matches_batch_and_carries_offsets(spark, tmp_path):
    from tb_lakehouse_enhanced_spark.operators.packing import (
        pack_context_windows,
    )
    from tb_lakehouse_enhanced_spark.streaming.packing import stream_pack

    src = str(tmp_path / "in")
    b1 = [("a", 1, 3), ("a", 2, 5), ("b", 1, 7)]
    b2 = [("a", 3, 4), ("b", 2, 2), ("b", 3, 9), ("a", 4, 0)]
    _write_batch(spark, src, b1)

    stream = (spark.readStream.schema("source string, doc_id long, n long")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream_pack(stream, window=4)
         .writeStream.format("memory").queryName("pack_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .start())
    q.processAllAvailable()
    _write_batch(spark, src, b2)
    q.processAllAvailable()
    q.stop()

    got = {(r.source, r.doc_id, r.window_id, r.tok_from, r.tok_to)
           for r in spark.table("pack_out").collect()}

    # batch reference: per-source packing over the same doc order
    all_rows = spark.createDataFrame(b1 + b2,
                                     "source string, doc_id long, n long")
    want = set()
    for s in ("a", "b"):
        m = pack_context_windows(
            all_rows.filter(F.col("source") == s).select("doc_id", "n"),
            "n", 4, ["doc_id"])
        want |= {(s, r.doc_id, r.window_id, r.tok_from, r.tok_to)
                 for r in m.collect()}
    assert got == want
    # the boundary doc (a:3, len 4 arriving with offset 8) proves the
    # carry: with a per-batch restart it would begin at window 0 again
    a3 = [x for x in got if x[0] == "a" and x[1] == 3]
    assert a3 == [("a", 3, 2, 0, 4)]


def test_stream_pack_multichunk_group_deterministic(spark, tmp_path):
    """A group larger than arrow.maxRecordsPerBatch arrives as several
    chunks in arbitrary order — the packer must sort the WHOLE group,
    not each chunk (regression for the per-chunk sort bug)."""
    from tb_lakehouse_enhanced_spark.operators.packing import (
        pack_context_windows,
    )
    from tb_lakehouse_enhanced_spark.streaming.packing import stream_pack

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "7")
    try:
        rows = [("a", i, (i * 37) % 11 + 1) for i in range(1, 101)]
        src = str(tmp_path / "in")
        _write_batch(spark, src, rows)
        stream = (spark.readStream
                  .schema("source string, doc_id long, n long").parquet(src))
        q = (stream_pack(stream, window=16)
             .writeStream.format("memory").queryName("pack_chunks")
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ck"))
             .start())
        q.processAllAvailable()
        q.stop()
        got = {(r.doc_id, r.window_id, r.tok_from, r.tok_to)
               for r in spark.table("pack_chunks").collect()}
        all_rows = spark.createDataFrame(
            rows, "source string, doc_id long, n long")
        want = {(r.doc_id, r.window_id, r.tok_from, r.tok_to)
                for r in pack_context_windows(
                    all_rows.select("doc_id", "n"), "n", 16,
                    ["doc_id"]).collect()}
        assert got == want
    finally:
        spark.conf.set(key, old)


def test_stream_pack_offsets_survive_checkpoint_restart(spark, tmp_path):
    """The per-source offset lives in the state store: a NEW query
    restarted from the same checkpoint must continue packing exactly
    where the stopped one left off (no window restart, no re-emission)."""
    from tb_lakehouse_enhanced_spark.operators.packing import (
        pack_context_windows,
    )
    from tb_lakehouse_enhanced_spark.streaming.packing import stream_pack

    src, out, ck = (str(tmp_path / d) for d in ("in", "out", "ck"))
    b1 = [("a", 1, 3), ("a", 2, 5)]
    b2 = [("a", 3, 4), ("a", 4, 6)]

    def run_until_drained():
        stream = (spark.readStream
                  .schema("source string, doc_id long, n long").parquet(src))
        q = (stream_pack(stream, window=4)
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ck).outputMode("append")
             .start())
        q.processAllAvailable()
        q.stop()

    _write_batch(spark, src, b1)
    run_until_drained()
    _write_batch(spark, src, b2)
    run_until_drained()  # fresh query object, same checkpoint

    got = {(r.doc_id, r.window_id, r.tok_from, r.tok_to)
           for r in spark.read.parquet(out).collect()}
    all_rows = spark.createDataFrame(b1 + b2,
                                     "source string, doc_id long, n long")
    want = {(r.doc_id, r.window_id, r.tok_from, r.tok_to)
            for r in pack_context_windows(
                all_rows.select("doc_id", "n"), "n", 4, ["doc_id"]).collect()}
    assert got == want
    # doc 3 (offset 8) must land in window 2 — proof the restarted query
    # resumed from the stored offset instead of restarting at zero
    assert (3, 2, 0, 4) in got
