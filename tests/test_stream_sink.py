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
