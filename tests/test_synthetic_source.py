"""Custom Python DataSource (sources/synthetic.py): batch + stream."""

from __future__ import annotations

from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.sources.synthetic import register


def _load(spark, **opts):
    r = spark.read.format("synthetic_docs")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_rows_schema_parallelism(spark):
    register(spark)
    df = _load(spark, rows=10_000, partitions=8, seed=7)
    assert df.count() == 10_000
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "text", "lang", "source", "n_chars"]
    # ids are a dense unique range; generation really fans out over
    # the requested partitions
    assert df.select("doc_id").distinct().count() == 10_000
    assert df.rdd.getNumPartitions() == 8
    # n_chars is consistent with text
    bad = df.filter(F.length("text") != F.col("n_chars")).count()
    assert bad == 0


def test_batch_deterministic_and_seed_sensitive(spark):
    register(spark)
    a = _load(spark, rows=500, partitions=4, seed=7)
    b = _load(spark, rows=500, partitions=2, seed=7)  # different layout
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    c = _load(spark, rows=500, partitions=4, seed=8)
    assert c.exceptAll(a).count() > 0


def test_stream_drains_and_matches_batch(spark, tmp_path):
    register(spark)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (spark.readStream.format("synthetic_docs")
         .option("rows", 350).option("rows_per_batch", 100).option("seed", 7)
         .load()
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .start())
    # default trigger: micro-batches run until read() returns an empty
    # batch with an unmoved offset (the stream runs dry at `rows`)
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(out)
    want = _load(spark, rows=350, seed=7)
    assert got.count() == 350
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_stream_source_composes_with_streaming_tier(spark, tmp_path):
    """The custom stream source feeding a real streaming aggregation:
    per-lang doc counts accumulate across micro-batches into a sink
    table (complete mode), matching the batch groupBy of the same rows."""
    register(spark)
    q = (spark.readStream.format("synthetic_docs")
         .option("rows", 300).option("rows_per_batch", 75).option("seed", 3)
         .load()
         .groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
         .writeStream.format("memory").queryName("synth_lang_counts")
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .start())
    q.processAllAvailable()
    q.stop()
    got = {r.lang: r.n for r in spark.table("synth_lang_counts").collect()}
    want = {r.lang: r.n for r in
            _load(spark, rows=300, seed=3)
            .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == want


def test_batch_zero_rows_is_empty_relation(spark):
    register(spark)
    assert _load(spark, rows=0).count() == 0
