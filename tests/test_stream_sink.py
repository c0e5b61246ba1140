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
