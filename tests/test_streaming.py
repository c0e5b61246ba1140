"""Structured Streaming: tumbling windows + watermark, batch-equivalent."""

from __future__ import annotations

from tb_lakehouse_enhanced_spark.streaming.tumbling import (
    read_event_stream, stream_tumbling_agg, tumbling_agg,
)


def _write_event_files(spark, path):
    rows = [
        ("2024-01-01 00:10:00", "click", 1.0),
        ("2024-01-01 00:40:00", "click", 2.0),
        ("2024-01-01 01:05:00", "click", 4.0),
        ("2024-01-01 01:20:00", "view", 8.0),
        ("2024-01-01 00:50:00", "view", 16.0),   # late for window 0 (file 2)
    ]
    df = spark.createDataFrame(rows, ["ts_s", "event_type", "value"]) \
        .selectExpr("CAST(ts_s AS TIMESTAMP) AS ts", "event_type", "value")
    df.filter("event_type = 'click'").repartition(1).write.parquet(f"{path}/f1")
    df.filter("event_type = 'view'").repartition(1).write.parquet(f"{path}/f2")
    return df


def test_stream_matches_batch(spark, tmp_base):
    src = f"{tmp_base}/events"
    batch_df = _write_event_files(spark, src)
    schema = batch_df.schema

    stream = read_event_stream(spark, f"{src}/*", schema,
                               max_files_per_trigger=1)
    agg = stream_tumbling_agg(stream, watermark="10 hours")
    q = (agg.writeStream.format("memory").queryName("tumbling_test")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {(str(r["window_start"]), r["event_type"]):
           (r["n_events"], float(r["total_value"]))
           for r in spark.sql("SELECT * FROM tumbling_test").collect()}
    expect = {(str(r["window_start"]), r["event_type"]):
              (r["n_events"], float(r["total_value"]))
              for r in tumbling_agg(batch_df).collect()}
    assert got == expect
    assert got[("2024-01-01 00:00:00", "click")] == (2, 3.0)
    assert got[("2024-01-01 00:00:00", "view")] == (1, 16.0)
