"""Streaming bounded-state quantile sketch (streaming/quantiles.py)."""

from __future__ import annotations


def test_reservoir_fold_invariants():
    """Pure-function properties: chunking-independent, duplicate-id
    idempotent, bounded to k, and quantiles accurate at ~1/sqrt(k)."""
    from tb_lakehouse_enhanced_spark.streaming.quantiles import (
        reservoir_fold, sample_quantiles,
    )
    k = 512
    ids = [f"e{i}" for i in range(20000)]
    vals = [float(i % 1000) for i in range(20000)]    # uniform 0..999
    # fold in odd-sized chunks
    h, v = [], []
    for lo in range(0, 20000, 777):
        h, v = reservoir_fold(h, v, ids[lo:lo + 777],
                              vals[lo:lo + 777], k)
    assert len(v) == k
    # one-shot fold gives the identical sample (order-independent)
    h1, v1 = reservoir_fold([], [], ids, vals, k)
    assert (h, v) == (h1, v1)
    # replayed ids change nothing (at-least-once safe)
    h2, v2 = reservoir_fold(h, v, ids[:5000], vals[:5000], k)
    assert (h2, v2) == (h, v)
    q50, q90, q99 = sample_quantiles(v, (0.5, 0.9, 0.99))
    assert abs(q50 - 500) < 70 and abs(q90 - 900) < 70
    assert q99 > 930
    # below k the sample IS the stream: exact empirical quantiles
    hs, vs = reservoir_fold([], [], ids[:100], [float(i) for i in range(100)], k)
    assert sorted(vs) == [float(i) for i in range(100)]
    assert sample_quantiles(vs, (0.5,))[0] == 50.0


def test_stream_quantile_sketch_restart(spark, tmp_path):
    """The sample survives a checkpoint restart: the panel after the
    restart reflects ALL batches, stays exact below k, and replayed
    event ids add nothing."""
    from tb_lakehouse_enhanced_spark.streaming.quantiles import (
        stream_quantile_sketch,
    )
    src = str(tmp_path / "in")

    def write(rows):
        spark.createDataFrame(
            rows, "source string, event_id string, value double") \
            .coalesce(1).write.mode("append").parquet(src)

    def start():
        stream = (spark.readStream
                  .schema("source string, event_id string, value double")
                  .option("maxFilesPerTrigger", 1).parquet(src))
        return (stream_quantile_sketch(stream, k=64, qs=(0.5, 0.9))
                .writeStream.format("parquet")
                .option("path", str(tmp_path / "out"))
                .option("checkpointLocation", str(tmp_path / "ck"))
                .outputMode("append").start())

    write([("s", f"e{i}", float(i)) for i in range(30)])   # 0..29
    q = start()
    q.processAllAvailable()
    q.stop()

    # restart; replay e0..e9 (no-ops) + 20 new values 100..119
    write([("s", f"e{i}", float(i)) for i in range(10)]
          + [("s", f"n{i}", float(100 + i)) for i in range(20)])
    q2 = start()
    q2.processAllAvailable()
    q2.stop()

    out = spark.read.parquet(str(tmp_path / "out")).collect()
    final = max(out, key=lambda r: r.n_rows)
    assert final.n_rows == 60
    assert final.is_exact and final.sample_n == 50     # 50 distinct ids
    # exact nearest-rank quantiles of {0..29, 100..119}
    s = sorted([float(i) for i in range(30)]
               + [float(100 + i) for i in range(20)])
    assert final.q_50 == s[25] and final.q_90 == s[45]
