"""applyInPandasWithState session windows: closed sessions emit in-stream."""

from __future__ import annotations

from tb_lakehouse_enhanced_spark.streaming.stateful import sessionize_stateful
from tb_lakehouse_enhanced_spark.streaming.tumbling import read_event_stream


def test_stateful_sessionization(spark, tmp_base):
    rows = [
        # user 7: two sessions — (00:00, 00:10) then (03:00)
        ("2024-01-01 00:00:00", 7), ("2024-01-01 00:10:00", 7),
        ("2024-01-01 03:00:00", 7),
        # user 8: one long session, never closed in-data
        ("2024-01-01 01:00:00", 8), ("2024-01-01 01:05:00", 8),
    ]
    df = (spark.createDataFrame(rows, ["s", "user_id"])
          .selectExpr("CAST(s AS TIMESTAMP) AS ts", "user_id"))
    src = f"{tmp_base}/ev"
    df.repartition(1).write.parquet(f"{src}/f1")

    stream = read_event_stream(spark, f"{src}/*", df.schema)
    sessions = sessionize_stateful(stream, gap_minutes=30)
    q = (sessions.writeStream.format("memory").queryName("sess_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {(r["user_id"], str(r["session_start"]), str(r["session_end"]),
            r["n_events"])
           for r in spark.sql("SELECT * FROM sess_out").collect()}
    # user 7's first session closed by the 03:00 event; the open tails
    # (user 7 @03:00, user 8) remain in state awaiting timeout
    assert (7, "2024-01-01 00:00:00", "2024-01-01 00:10:00", 2) in got
    assert all(u != 8 for (u, *_rest) in got)


def test_stateful_session_timeout_flush(spark, tmp_base):
    """The open-session state must FLUSH via event-time timeout once a
    later batch advances the watermark — the branch the in-data close
    test leaves unexercised. File sink + checkpoint restart (memory sink
    cannot resume)."""
    rows1 = [("2024-01-01 01:00:00", 8), ("2024-01-01 01:05:00", 8)]
    df1 = (spark.createDataFrame(rows1, ["s", "user_id"])
           .selectExpr("CAST(s AS TIMESTAMP) AS ts", "user_id"))
    src, out, ckpt = f"{tmp_base}/ev", f"{tmp_base}/out", f"{tmp_base}/ck"
    df1.repartition(1).write.parquet(f"{src}/f1")

    def run():
        stream = read_event_stream(spark, f"{src}/*", df1.schema)
        q = (sessionize_stateful(stream, gap_minutes=30, watermark="1 minute")
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)

    run()
    got = {(r["user_id"], str(r["session_start"]), r["n_events"])
           for r in spark.read.parquet(out).collect()}
    assert got == set()  # session still open, nothing emitted

    # a much-later event (other user) drags the watermark past
    # 01:05 + gap => user 8's open session times out and emits
    rows2 = [("2024-01-01 09:00:00", 9)]
    (spark.createDataFrame(rows2, ["s", "user_id"])
     .selectExpr("CAST(s AS TIMESTAMP) AS ts", "user_id")
     .repartition(1).write.parquet(f"{src}/f2"))
    run()
    got = {(r["user_id"], str(r["session_start"]), r["n_events"])
           for r in spark.read.parquet(out).collect()}
    assert (8, "2024-01-01 01:00:00", 2) in got
