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


def test_stream_stream_interval_join(spark, tmp_base):
    """Clicks joined to views of the same user within 30 min, both
    streaming: the interval condition bounds state on both sides."""
    from tb_lakehouse_enhanced_spark.streaming.tumbling import interval_stream_join

    src = f"{tmp_base}/ssj"
    rows_l = [("2024-01-01 00:00:00", 1, "click"),
              ("2024-01-01 02:00:00", 2, "click")]
    rows_r = [("2024-01-01 00:10:00", 1, "view"),    # within 30 min of u1 click
              ("2024-01-01 01:00:00", 1, "view"),    # too late for u1 click
              ("2024-01-01 02:05:00", 2, "view")]    # within 30 min of u2 click
    mk = lambda rows: (spark.createDataFrame(rows, ["ts_s", "user_id", "ev"])
                       .selectExpr("CAST(ts_s AS TIMESTAMP) AS ts", "user_id", "ev"))
    mk(rows_l).repartition(1).write.parquet(f"{src}/left")
    mk(rows_r).repartition(1).write.parquet(f"{src}/right")
    schema = mk(rows_l).schema

    ls = (spark.readStream.schema(schema).parquet(f"{src}/left")
          .select("ts", "user_id"))
    rs = (spark.readStream.schema(schema).parquet(f"{src}/right")
          .selectExpr("ts AS view_ts", "user_id"))
    j = interval_stream_join(ls, rs, left_ts="ts", right_ts="view_ts",
                             key="user_id", tolerance="30 minutes")
    q = (j.writeStream.format("memory").queryName("ssj_test")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["user_id"], str(r["view_ts"]))
           for r in spark.sql("SELECT * FROM ssj_test").collect()}
    assert got == {(1, "2024-01-01 00:10:00"), (2, "2024-01-01 02:05:00")}


def test_dedup_within_watermark(spark, tmp_base):
    """Duplicate event ids within the watermark horizon are dropped with
    bounded state; batch mode gives the same multiset."""
    from tb_lakehouse_enhanced_spark.streaming.tumbling import dedup_within_watermark

    src = f"{tmp_base}/dwm"
    rows = [("2024-01-01 00:00:00", "e1", 1.0),
            ("2024-01-01 00:05:00", "e1", 1.0),   # duplicate delivery
            ("2024-01-01 00:10:00", "e2", 2.0),
            ("2024-01-01 03:00:00", "e3", 3.0)]
    df = (spark.createDataFrame(rows, ["ts_s", "event_id", "value"])
          .selectExpr("CAST(ts_s AS TIMESTAMP) AS ts", "event_id", "value"))
    df.repartition(1).write.parquet(f"{src}/f1")

    stream = spark.readStream.schema(df.schema).parquet(f"{src}/*")
    dd = dedup_within_watermark(stream, ["event_id"], watermark="1 hour")
    q = (dd.writeStream.format("memory").queryName("dwm_test")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(r["event_id"]
                 for r in spark.sql("SELECT * FROM dwm_test").collect())
    assert got == ["e1", "e2", "e3"]
    # batch path: same multiset
    assert sorted(r["event_id"] for r in
                  dedup_within_watermark(df, ["event_id"]).collect()) == got


def test_sliding_stream_matches_batch(spark, tmp_base):
    """Sliding windows (1h/30min) under readStream + watermark produce
    the same multiset as the batch plan — each event in width/slide = 2
    windows."""
    from tb_lakehouse_enhanced_spark.streaming.tumbling import tumbling_agg

    src = f"{tmp_base}/events_sliding"
    batch_df = _write_event_files(spark, src)
    stream = read_event_stream(spark, f"{src}/*", batch_df.schema,
                               max_files_per_trigger=1)
    agg = tumbling_agg(stream, watermark="10 hours", slide="30 minutes")
    q = (agg.writeStream.format("memory").queryName("sliding_test")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {(str(r["window_start"]), r["event_type"]):
           (r["n_events"], float(r["total_value"]))
           for r in spark.sql("SELECT * FROM sliding_test").collect()}
    expect = {(str(r["window_start"]), r["event_type"]):
              (r["n_events"], float(r["total_value"]))
              for r in tumbling_agg(batch_df, slide="30 minutes").collect()}
    assert got == expect
    # 00:10 click lands in starts 23:30 and 00:00
    assert got[("2023-12-31 23:30:00", "click")] == (1, 1.0)
    assert got[("2024-01-01 00:00:00", "click")] == (2, 3.0)


def test_interval_stream_join_left_outer(spark, tmp_base):
    """Left-outer stream-stream join: the unmatched click is emitted
    with NULLs once the watermark passes; matched rows are identical to
    the inner join."""
    from tb_lakehouse_enhanced_spark.streaming.tumbling import interval_stream_join

    src = f"{tmp_base}/ssj_lo"
    rows_l = [("2024-01-01 00:00:00", 1, "click"),
              ("2024-01-01 02:00:00", 2, "click"),
              ("2024-01-01 02:00:00", 3, "click")]    # never matched
    rows_r = [("2024-01-01 00:10:00", 1, "view"),
              ("2024-01-01 02:05:00", 2, "view"),
              ("2024-01-01 09:00:00", 9, "view")]     # advances watermark
    mk = lambda rows: (spark.createDataFrame(rows, ["ts_s", "user_id", "ev"])
                       .selectExpr("CAST(ts_s AS TIMESTAMP) AS ts", "user_id", "ev"))
    mk(rows_l).repartition(1).write.parquet(f"{src}/left")
    mk(rows_r).repartition(1).write.parquet(f"{src}/right")
    schema = mk(rows_l).schema

    def run(_tag):
        ls = (spark.readStream.schema(schema).parquet(f"{src}/left")
              .select("ts", "user_id"))
        rs = (spark.readStream.schema(schema).parquet(f"{src}/right")
              .selectExpr("ts AS view_ts", "user_id"))
        j = interval_stream_join(ls, rs, left_ts="ts", right_ts="view_ts",
                                 key="user_id", tolerance="30 minutes",
                                 how="left_outer").select("l.user_id",
                                                          "view_ts")
        # file sink (not memory): it supports restarting from the same
        # checkpoint, which the second run below depends on
        q = (j.writeStream.format("parquet")
             .option("path", f"{src}/out")
             .option("checkpointLocation", f"{src}/ckpt")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        return {(r["user_id"], r["view_ts"] and str(r["view_ts"]))
                for r in spark.read.parquet(f"{src}/out").collect()}

    got = run("run1")
    assert (1, "2024-01-01 00:10:00") in got
    assert (2, "2024-01-01 02:05:00") in got
    # the unmatched click's NULL row emits once the GLOBAL watermark
    # (min of both sides) passes left.ts + tolerance AND a later batch
    # runs the eviction: append late data to BOTH sides and restart on
    # the same checkpoint twice — this is the watermark-delayed emission
    # the outer mode exists for
    for hour in ("12", "13"):
        mk([(f"2024-01-01 {hour}:00:00", 9, "click")]).repartition(1) \
            .write.mode("append").parquet(f"{src}/left")
        mk([(f"2024-01-01 {hour}:00:00", 9, "view")]).repartition(1) \
            .write.mode("append").parquet(f"{src}/right")
    got2 = run("run2")
    assert (3, None) in got2
    # batch mode emits the unmatched row immediately — same join, no wait
    lb = mk(rows_l).select("ts", "user_id")
    rb = mk(rows_r).selectExpr("ts AS view_ts", "user_id")
    jb = interval_stream_join(lb, rb, left_ts="ts", right_ts="view_ts",
                              key="user_id", tolerance="30 minutes",
                              how="left_outer").select("l.user_id", "view_ts")
    batch = {(r["user_id"], r["view_ts"] and str(r["view_ts"]))
             for r in jb.collect()}
    assert batch == {(1, "2024-01-01 00:10:00"),
                     (2, "2024-01-01 02:05:00"), (3, None)}
