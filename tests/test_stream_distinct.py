"""Streaming KMV distinct-count (streaming/distinct.py)."""

from __future__ import annotations


def test_kmv_accuracy_and_exact_escape():
    from tb_lakehouse_enhanced_spark.streaming.distinct import (
        kmv_estimate, kmv_fold,
    )
    k = 256
    # exact below k distinct
    m = kmv_fold([], [f"x{i}" for i in range(100)], k)
    est, exact = kmv_estimate(m, k)
    assert exact and est == 100
    # ~1/sqrt(k) relative error above k, independent of fold chunking
    m2: list[int] = []
    for lo in range(0, 20000, 777):
        m2 = kmv_fold(m2, [f"v{i}" for i in range(lo, min(lo + 777, 20000))], k)
    est2, exact2 = kmv_estimate(m2, k)
    assert not exact2
    assert abs(est2 - 20000) / 20000 < 0.15
    # duplicates never change the sketch
    m3 = kmv_fold(m2, [f"v{i}" for i in range(500)], k)
    assert m3 == m2


def test_stream_distinct_count_restart(spark, tmp_path):
    """The k-minima survive a checkpoint restart: the estimate after
    the restart reflects ALL batches, and stays exact below k."""
    from tb_lakehouse_enhanced_spark.streaming.distinct import (
        stream_distinct_count,
    )
    src = str(tmp_path / "in")

    def write(rows):
        spark.createDataFrame(rows, "source string, item string") \
            .coalesce(1).write.mode("append").parquet(src)

    def start():
        stream = (spark.readStream.schema("source string, item string")
                  .option("maxFilesPerTrigger", 1).parquet(src))
        return (stream_distinct_count(stream, k=64)
                .writeStream.format("parquet")
                .option("path", str(tmp_path / "out"))
                .option("checkpointLocation", str(tmp_path / "ck"))
                .outputMode("append").start())

    write([("s", f"a{i}") for i in range(30)])       # 30 distinct
    q = start()
    q.processAllAvailable()
    q.stop()

    # restart; overlap (a0..a9 repeat) + 20 new -> 50 distinct total
    write([("s", f"a{i}") for i in range(10)]
          + [("s", f"b{i}") for i in range(20)])
    q2 = start()
    q2.processAllAvailable()
    q2.stop()

    out = spark.read.parquet(str(tmp_path / "out")).collect()
    final = max(out, key=lambda r: r.n_rows)
    assert final.n_rows == 60
    assert final.is_exact and final.estimate == 50   # below k=64: exact
