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

# ---------------------------------------------------------------- writer ----

def _store(spark):
    from tb_lakehouse_enhanced_spark.sources.jsonl_store import register as reg
    reg(spark)


def test_jsonl_store_batch_roundtrip(spark, tmp_path):
    """Writer half of the Python DataSource API: write -> manifest
    commit -> read back identical rows (types incl. date/timestamp/
    arrays survive the trip via the manifest schema)."""
    _store(spark)
    path = str(tmp_path / "store")
    df = spark.sql("""
        SELECT id AS k, CAST(id * 1.5 AS DOUBLE) AS x,
               concat('v', id) AS s, id % 2 = 0 AS flag,
               DATE'2024-01-01' + CAST(id AS INT) AS d,
               TIMESTAMP'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id) AS ts,
               array(id, id + 1) AS arr
        FROM range(100)""")
    df.write.format("jsonl_store").option("path", path).mode("overwrite").save()
    got = spark.read.format("jsonl_store").option("path", path).load()
    assert got.schema == df.schema
    assert got.exceptAll(df).count() == 0 and df.exceptAll(got).count() == 0
    # append mode accumulates; overwrite replaces
    df.write.format("jsonl_store").option("path", path).mode("append").save()
    assert spark.read.format("jsonl_store").option("path", path).load().count() == 200
    df.limit(10).write.format("jsonl_store").option("path", path).mode("overwrite").save()
    assert spark.read.format("jsonl_store").option("path", path).load().count() == 10


def test_jsonl_store_uncommitted_files_invisible(spark, tmp_path):
    """Manifest visibility rule: a part file on disk that no manifest
    names (zombie task / crashed job) is never read."""
    _store(spark)
    path = str(tmp_path / "store")
    spark.range(5).selectExpr("id AS k").write.format("jsonl_store") \
        .option("path", path).mode("overwrite").save()
    # plant an orphan part file, as a failed task would leave behind
    with open(f"{path}/part-orphan.jsonl", "w") as f:
        f.write('{"k": 999}\n')
    got = spark.read.format("jsonl_store").option("path", path).load()
    assert got.count() == 5
    assert got.filter("k = 999").count() == 0


def test_jsonl_store_stream_writer_exactly_once(spark, tmp_path):
    """DataSourceStreamWriter: the synthetic stream source feeds the
    jsonl_store sink; contents equal the batch generation, and replaying
    a committed epoch (batch id recorded atomically in the manifest)
    adds no duplicate rows."""
    from tb_lakehouse_enhanced_spark.sources.jsonl_store import (
        JsonlStreamWriter, _FileCommit, _read_manifest,
    )
    from tb_lakehouse_enhanced_spark.sources.synthetic import register as reg_synth
    _store(spark)
    reg_synth(spark)
    path = str(tmp_path / "sink")
    q = (spark.readStream.format("synthetic_docs")
         .option("rows", 260).option("rows_per_batch", 100).option("seed", 11)
         .load()
         .writeStream.format("jsonl_store")
         .option("path", path)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .start())
    q.processAllAvailable()
    q.stop()
    got = spark.read.format("jsonl_store").option("path", path).load()
    want = _load(spark, rows=260, seed=11)
    assert got.count() == 260
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    # replay a committed epoch: same batchId, a fresh attempt file ->
    # commit must drop the attempt and leave the manifest unchanged.
    # The applied mark and the file list commit in ONE atomic rename,
    # so no crash window can commit files without marking the batch.
    before = _read_manifest(path)
    batch_id = before["last_batch"]
    assert batch_id >= 0, "stream committed no batches"
    w = JsonlStreamWriter(path, got.schema)
    with open(f"{path}/part-replayed.jsonl", "w") as f:
        f.write('{"doc_id": 0}\n')
    w.commit([_FileCommit(file="part-replayed.jsonl", rows=1)], batch_id)
    after = _read_manifest(path)
    assert after == before
    assert spark.read.format("jsonl_store").option("path", path).load().count() == 260


def test_jsonl_store_filter_pushdown(spark, tmp_path):
    """Spark 4.1 Python DataSource pushFilters: supported predicates
    evaluate inside the reader (unit-checked), unsupported ones are
    handed back to Spark, and end-to-end results stay correct with
    pushdown enabled."""
    from pyspark.sql.datasource import (
        EqualTo, GreaterThan, IsNotNull, StringContains,
    )
    from tb_lakehouse_enhanced_spark.sources.jsonl_store import JsonlReader
    _store(spark)
    path = str(tmp_path / "store")
    df = spark.sql("""
        SELECT id AS k, concat('v', id % 3) AS s,
               DATE'2024-01-01' + CAST(id AS INT) AS d
        FROM range(20)""")
    df.write.format("jsonl_store").option("path", path).mode("overwrite").save()

    got = spark.read.format("jsonl_store").option("path", path).load()
    r = JsonlReader(path, got.schema)
    leftover = list(r.pushFilters([
        EqualTo(("s",), "v1"),
        GreaterThan(("k",), 10),
        IsNotNull(("k",)),
        GreaterThan(("d",), None),        # temporal: must NOT push
        StringContains(("s",), "v"),      # unsupported type: hand back
    ]))
    assert len(leftover) == 2             # date filter + StringContains
    rows = [row for p in r.partitions() for row in r.read(p)]
    assert rows and all(row[0] > 10 and row[1] == "v1" for row in rows)

    # end-to-end (register() enabled the pushdown conf): results exact
    out = (spark.read.format("jsonl_store").option("path", path).load()
           .filter("k > 10 AND s = 'v1'").collect())
    assert sorted(row.k for row in out) == [13, 16, 19]


def test_jsonl_store_commit_protocol_model(spark, tmp_path):
    """Model-based drive of the manifest commit protocol: random
    interleavings of batch commits (overwrite/append), stream-batch
    commits, REPLAYED stream batches, and aborted attempts must keep
    the manifest equal to a dict model — files never double-commit,
    replays drop their attempt files, aborts leave no trace."""
    import random

    from tb_lakehouse_enhanced_spark.sources.jsonl_store import (
        JsonlStreamWriter, JsonlWriter, _FileCommit, _read_manifest,
    )
    from pyspark.sql.types import StructType
    schema = StructType.fromJson(
        {"type": "struct", "fields": [
            {"name": "k", "type": "long", "nullable": True,
             "metadata": {}}]})
    path = str(tmp_path / "store")
    rng = random.Random(13)
    model_files: list[str] = []
    last_batch = -1
    counter = 0

    def mk_files(n):
        nonlocal counter
        out = []
        for _ in range(n):
            name = f"part-model-{counter}.jsonl"
            counter += 1
            with open(f"{path}/{name}", "w") as f:
                f.write('{"k": 1}\n')
            out.append(name)
        return out

    import os
    os.makedirs(path, exist_ok=True)
    for _ in range(40):
        op = rng.choice(["overwrite", "append", "stream", "replay",
                         "abort"])
        files = mk_files(rng.randint(0, 3))
        msgs = [_FileCommit(file=f, rows=1) for f in files]
        if op == "overwrite":
            JsonlWriter(path, schema, overwrite=True).commit(msgs)
            model_files = list(files)
        elif op == "append":
            JsonlWriter(path, schema, overwrite=False).commit(msgs)
            model_files += files
        elif op == "stream":
            last_batch += 1
            JsonlStreamWriter(path, schema).commit(msgs, last_batch)
            model_files += files
        elif op == "replay" and last_batch >= 0:
            replay_id = rng.randint(0, last_batch)
            JsonlStreamWriter(path, schema).commit(msgs, replay_id)
            # model unchanged; the attempt's files must be gone
            for f in files:
                assert not os.path.exists(f"{path}/{f}"), f
        else:
            JsonlWriter(path, schema, overwrite=False).abort(msgs)
            for f in files:
                assert not os.path.exists(f"{path}/{f}"), f
        man = _read_manifest(path)
        assert man["files"] == model_files, op
        assert man.get("last_batch", -1) == last_batch
    # the committed table reads exactly the model's row count
    from tb_lakehouse_enhanced_spark.sources.jsonl_store import register
    register(spark)
    got = (spark.read.format("jsonl_store").option("path", path)
           .load().count())
    assert got == len(model_files)


def test_jsonl_store_compaction(spark, tmp_path):
    """compact_jsonl_store folds many per-commit part files into a few,
    preserves contents and the stream replay guard, and sweeps the
    superseded (already invisible) files."""
    import glob
    import os

    from tb_lakehouse_enhanced_spark.sources.jsonl_store import (
        JsonlStreamWriter, _FileCommit, _read_manifest,
        compact_jsonl_store,
    )
    _store(spark)
    path = str(tmp_path / "store")
    for i in range(6):   # six commits -> many part files
        spark.range(i * 10, i * 10 + 10).selectExpr("id AS k") \
            .repartition(3).write.format("jsonl_store") \
            .option("path", path).mode("append").save()
    # simulate a prior stream epoch so the guard has something to keep
    man = _read_manifest(path)
    assert len(man["files"]) >= 12
    w = JsonlStreamWriter(path, spark.range(1).selectExpr("id AS k").schema)
    with open(f"{path}/part-stream.jsonl", "w") as f:
        f.write('{"k": 999}\n')
    w.commit([_FileCommit(file="part-stream.jsonl", rows=1)], 5)

    before = sorted(r.k for r in spark.read.format("jsonl_store")
                    .option("path", path).load().collect())
    new = compact_jsonl_store(spark, path, target_files=2)
    assert len(new["files"]) <= 2
    assert new["last_batch"] == 5                    # guard preserved
    after = sorted(r.k for r in spark.read.format("jsonl_store")
                   .option("path", path).load().collect())
    assert after == before
    # superseded files swept; only the live ones remain on disk
    on_disk = {os.path.basename(f)
               for f in glob.glob(f"{path}/part-*.jsonl")}
    assert on_disk == set(new["files"])
    # a replayed epoch after compaction still drops its attempt
    with open(f"{path}/part-replay.jsonl", "w") as f:
        f.write('{"k": 1000}\n')
    w.commit([_FileCommit(file="part-replay.jsonl", rows=1)], 4)
    assert sorted(r.k for r in spark.read.format("jsonl_store")
                  .option("path", path).load().collect()) == before
