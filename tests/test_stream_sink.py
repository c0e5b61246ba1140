"""foreachBatch streaming upsert into a ManagedTable."""

from __future__ import annotations

from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.operators.merge import ScdConfig, UPDATE_DATE
from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable
from tb_lakehouse_enhanced_spark.streaming.sink import stream_upsert_sink
from tb_lakehouse_enhanced_spark.streaming.tumbling import read_event_stream


def test_stream_upsert_accumulates_state(spark, tmp_base):
    # two files -> two micro-batches; key 2 updated by the second batch
    b1 = spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], ["k", "s", "v"])
    b2 = spark.createDataFrame([(2, "b", 9.0), (3, "c", 3.0)], ["k", "s", "v"])
    src = f"{tmp_base}/in"
    b1.repartition(1).write.parquet(f"{src}/f1")
    b2.repartition(1).write.parquet(f"{src}/f2")

    table = ManagedTable(spark, f"{tmp_base}/out")
    cfg = ScdConfig(keys=("k",), tracked=("s", "v"))
    stream = read_event_stream(spark, f"{src}/*", b1.schema,
                               max_files_per_trigger=1)
    q = (stream_upsert_sink(stream, table, cfg)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    rows = {r["k"]: (r["s"], r["v"]) for r in table.read().collect()}
    assert rows == {1: ("a", 1.0), 2: ("b", 9.0), 3: ("c", 3.0)}
    # the key updated in a later micro-batch carries a later update stamp
    stamps = {r["k"]: str(r[UPDATE_DATE]) for r in table.read().collect()}
    assert stamps[3] == stamps[2] and stamps[2] > stamps[1]
    # versioned snapshots: one per non-empty micro-batch
    assert table.current_version() >= 1


def test_stream_scd2_sink_accumulates_history(spark, tmp_base):
    from tb_lakehouse_enhanced_spark.operators.merge import (
        VALID_TO, ScdConfig)
    from tb_lakehouse_enhanced_spark.streaming.sink import stream_scd2_sink

    # batch1: keys 1,2. batch2: key 2 changed, key 1 absent (deleted)
    b1 = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "s"])
    b2 = spark.createDataFrame([(2, "B"), (3, "c")], ["k", "s"])
    src = f"{tmp_base}/in"
    b1.repartition(1).write.parquet(f"{src}/f1")
    b2.repartition(1).write.parquet(f"{src}/f2")

    from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable
    from tb_lakehouse_enhanced_spark.streaming.tumbling import read_event_stream
    table = ManagedTable(spark, f"{tmp_base}/out")
    q = (stream_scd2_sink(
        read_event_stream(spark, f"{src}/*", b1.schema, max_files_per_trigger=1),
        table, ScdConfig(keys=("k",), tracked=("s",)))
        .trigger(availableNow=True).start())
    q.awaitTermination(120)

    rows = table.read().collect()
    current = {r["k"]: r["s"] for r in rows if r[VALID_TO] is None}
    closed = {r["k"]: r["s"] for r in rows if r[VALID_TO] is not None}
    assert current == {2: "B", 3: "c"}          # new version + insert
    assert closed == {1: "a", 2: "b"}           # delete-close + change-close
    assert len(rows) == 4


def test_enrich_stream_static_broadcast(spark, tmp_base):
    from tb_lakehouse_enhanced_spark.streaming.enrich import enrich_stream
    from tb_lakehouse_enhanced_spark.streaming.tumbling import read_event_stream

    ev = spark.createDataFrame([(1, 10.0), (2, 20.0), (9, 90.0)], ["ck", "v"])
    src = f"{tmp_base}/in"
    ev.repartition(1).write.parquet(f"{src}/f1")
    dim = spark.createDataFrame([(1, "gold"), (2, "basic")], ["ck", "tier"])

    out = enrich_stream(
        read_event_stream(spark, f"{src}/*", ev.schema), dim, "ck")
    q = (out.writeStream.format("memory").queryName("enriched")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = {r["ck"]: r["tier"] for r in spark.sql("SELECT * FROM enriched").collect()}
    assert rows == {1: "gold", 2: "basic", 9: None}  # left join keeps orphans


def test_stream_mor_sink_exactly_once_and_no_rewrite(spark, tmp_path):
    """Streaming CDC into a merge-on-read table: each micro-batch is
    one appended delta (base files never rewritten), a replayed batch
    id is skipped via the commit-metadata high-water mark, and the
    resolved table equals last-writer-wins over all batches."""
    import glob
    import os

    from pyspark.sql import functions as F

    from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable
    from tb_lakehouse_enhanced_spark.streaming.sink import stream_mor_sink

    src = str(tmp_path / "in")

    def write(rows):
        spark.createDataFrame(rows, "id long, v double") \
            .coalesce(1).write.mode("append").parquet(src)

    table = ManagedTable(spark, str(tmp_path / "mor_tbl"))

    def start():
        stream = (spark.readStream.schema("id long, v double")
                  .option("maxFilesPerTrigger", 1).parquet(src))
        return (stream_mor_sink(stream, table, key_cols=("id",))
                .option("checkpointLocation", str(tmp_path / "ck"))
                .outputMode("update").start())

    write([(1, 1.0), (2, 2.0)])          # batch 0 -> initial overwrite
    q = start()
    q.processAllAvailable()
    q.stop()
    base_files = sorted(glob.glob(os.path.join(table.path, "v0", "*.parquet")))

    write([(2, 22.0), (3, 3.0)])         # batch 1 -> delta
    write([(1, 11.0)])                   # batch 2 -> delta
    q2 = start()
    q2.processAllAvailable()
    q2.stop()

    got = {r["id"]: r["v"] for r in table.read().collect()}
    assert got == {1: 11.0, 2: 22.0, 3: 3.0}
    # base snapshot untouched by the CDC batches
    assert sorted(glob.glob(os.path.join(table.path, "v0", "*.parquet"))) \
        == base_files
    meta = table._commit(table.current_version())
    assert len(meta.get("deltas", [])) == 2
    last_batch = meta["stream_batch_id"]
    v_before = table.current_version()
    # an at-least-once REPLAY: foreachBatch hands the same batch id
    # again after a failure — the sink must skip it entirely
    from tb_lakehouse_enhanced_spark.streaming.sink import mor_batch_sink
    sink = mor_batch_sink(table, key_cols=("id",))
    sink(spark.createDataFrame([(1, 999.0)], "id long, v double"),
         last_batch)
    assert table.current_version() == v_before        # no new commit
    assert {r["id"]: r["v"] for r in table.read().collect()} == got
    # a genuinely NEW batch still applies
    sink(spark.createDataFrame([(4, 4.0)], "id long, v double"),
         last_batch + 1)
    assert table.current_version() == v_before + 1
    assert {r["id"]: r["v"] for r in table.read().collect()} == \
        {**got, 4: 4.0}


def test_stream_sql_merge_sink_statement_text_exactly_once(spark, tmp_path):
    """Streaming ingestion driven by the reference's MERGE statement
    TEXT: micro-batches register as the USING view and the text
    executes through the SQL front-end; replayed batch ids are skipped
    via the commit-metadata high-water mark, and a checkpoint restart
    continues cleanly."""
    from tb_lakehouse_enhanced_spark.sqlfront import LakehouseSql
    from tb_lakehouse_enhanced_spark.streaming.sink import (
        sql_merge_batch_sink, stream_sql_merge_sink,
    )
    lake = LakehouseSql(spark, str(tmp_path / "lake"),
                        now="2024-01-01 00:00:00")
    lake.sql("CREATE TABLE silver.kv (k INT, v STRING, "
             "_tf_update_date TIMESTAMP)")
    merge_sql = """
MERGE INTO silver.kv AS tgt USING kv_batch AS src ON tgt.k = src.k
WHEN MATCHED AND tgt.v != src.v THEN
  UPDATE SET tgt.v = src.v, tgt._tf_update_date = current_timestamp()
WHEN NOT MATCHED THEN
  INSERT (k, v, _tf_update_date)
  VALUES (src.k, src.v, current_timestamp())
"""
    src_dir = str(tmp_path / "in")

    def write(rows):
        spark.createDataFrame(rows, "k int, v string") \
            .coalesce(1).write.mode("append").parquet(src_dir)

    def start():
        stream = (spark.readStream.schema("k int, v string")
                  .option("maxFilesPerTrigger", 1).parquet(src_dir))
        return (stream_sql_merge_sink(stream, lake, merge_sql)
                .option("checkpointLocation", str(tmp_path / "ck"))
                .start())

    write([(1, "a"), (2, "b")])
    q = start()
    q.processAllAvailable()
    q.stop()
    # restart with an update + an insert
    write([(2, "B"), (3, "c")])
    q2 = start()
    q2.processAllAvailable()
    q2.stop()
    rows = {r["k"]: r["v"] for r in lake.table("silver.kv").read().collect()}
    assert rows == {1: "a", 2: "B", 3: "c"}
    # direct replay of an applied batch id is a no-op (at-least-once)
    v_before = lake.table("silver.kv").current_version()
    sink = sql_merge_batch_sink(lake, merge_sql)
    sink(spark.createDataFrame([(9, "z")], "k int, v string"), 0)
    assert lake.table("silver.kv").current_version() == v_before
    assert 9 not in {r["k"]
                     for r in lake.table("silver.kv").read().collect()}


def test_replay_guard_survives_interleaved_commits(spark, tmp_path):
    """The exactly-once high-water mark must survive an interleaved
    NON-stream commit on the same target (OPTIMIZE / ad-hoc DML
    through the front-end): the guard walks commits backward to the
    most recent one carrying ``stream_batch_id`` instead of reading
    only HEAD — a replayed batch still skips."""
    from tb_lakehouse_enhanced_spark.sqlfront import LakehouseSql
    from tb_lakehouse_enhanced_spark.streaming.sink import (
        mor_batch_sink, sql_merge_batch_sink,
    )
    lake = LakehouseSql(spark, str(tmp_path / "lake"),
                        now="2024-01-01 00:00:00")
    lake.sql("CREATE TABLE silver.cnt (k INT, n INT)")
    lake.table("silver.cnt").overwrite(
        spark.createDataFrame([(1, 0)], "k int, n int"))
    merge_sql = """
MERGE INTO silver.cnt AS tgt USING cnt_batch AS src ON tgt.k = src.k
WHEN MATCHED THEN UPDATE SET tgt.n = tgt.n + src.n
WHEN NOT MATCHED THEN INSERT (k, n) VALUES (src.k, src.n)
"""
    sink = sql_merge_batch_sink(lake, merge_sql)
    batch = spark.createDataFrame([(1, 5)], "k int, n int")
    sink(batch, 3)
    assert lake.table("silver.cnt").read().collect()[0]["n"] == 5
    # interleave maintenance + unrelated DML (neither carries the mark)
    lake.sql("OPTIMIZE silver.cnt")
    lake.sql("UPDATE silver.cnt SET k = k WHERE k < 0")
    # at-least-once delivery replays batch 3: NON-idempotent text must
    # NOT re-apply
    sink(batch, 3)
    assert lake.table("silver.cnt").read().collect()[0]["n"] == 5

    # same latent hole in the MOR sink
    from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable
    t = ManagedTable(spark, str(tmp_path / "mor_t"))
    msink = mor_batch_sink(t, key_cols=("k",))
    msink(spark.createDataFrame([(1, "a")], "k int, v string"), 0)
    msink(spark.createDataFrame([(1, "b")], "k int, v string"), 1)
    t.compact()                        # maintenance commit at HEAD
    msink(spark.createDataFrame([(1, "c")], "k int, v string"), 1)
    assert [r["v"] for r in t.read().collect()] == ["b"]


def test_stream_append_sink_exactly_once_and_hardlinks(spark, tmp_path):
    """Streaming ingest through the O(batch) append commit: each
    micro-batch writes only its own files (every prior file rides
    forward as a hardlink — same inode), and a replayed batch id is
    skipped via the commit-metadata high-water mark."""
    import os

    from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable
    from tb_lakehouse_enhanced_spark.streaming.sink import (
        append_batch_sink, stream_append_sink,
    )

    src = str(tmp_path / "in")

    def write(rows):
        spark.createDataFrame(rows, "id long, v double") \
            .coalesce(1).write.mode("append").parquet(src)

    table = ManagedTable(spark, str(tmp_path / "app_tbl"))

    def start():
        stream = (spark.readStream.schema("id long, v double")
                  .option("maxFilesPerTrigger", 1).parquet(src))
        return (stream_append_sink(stream, table)
                .option("checkpointLocation", str(tmp_path / "ck"))
                .outputMode("append").start())

    write([(1, 1.0), (2, 2.0)])
    write([(3, 3.0)])
    q = start()
    q.processAllAvailable()
    q.stop()
    assert {r["id"] for r in table.read().collect()} == {1, 2, 3}
    v = table.current_version()
    assert v >= 1                        # one commit per micro-batch

    # log-native check: each micro-batch commit recorded ONLY its own
    # files and no earlier live file gained a link (no hardlink forest)
    meta_v = table._commit(v)
    assert meta_v.get("live_base") == v - 1
    vdir = os.path.join(table.path, meta_v["dir"])
    in_dir = {os.path.relpath(os.path.join(r, f), vdir)
              for r, _d, fs in os.walk(vdir)
              for f in fs if f.endswith(".parquet")}
    assert in_dir == set(meta_v["added_files"])
    for rel, full in table._live_files(v).items():
        if not rel.startswith(meta_v["dir"] + "/"):
            assert os.stat(full).st_nlink == 1, f"{rel} grew a link"

    # replay guard: re-delivering an already-applied batch id is a
    # no-op (no new commit, no duplicate rows)
    sink = append_batch_sink(table)
    sink(spark.createDataFrame([(9, 9.0)], "id long, v double"), 0)
    assert table.current_version() == v
    assert table.read().count() == 3
    # a NEW batch id applies
    sink(spark.createDataFrame([(9, 9.0)], "id long, v double"),
         batch_id=10**6)
    assert table.read().count() == 4
