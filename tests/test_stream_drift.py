"""Streaming drift monitor (streaming/drift.py): stateful baseline,
checkpoint-restart durability, alarm on an injected shifted batch."""

from __future__ import annotations


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, "source string, item string") \
        .coalesce(1).write.mode("append").parquet(path)


def _start(spark, src, ck):
    from tb_lakehouse_enhanced_spark.streaming.drift import (
        stream_drift_monitor,
    )
    stream = (spark.readStream.schema("source string, item string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    return (stream_drift_monitor(stream, key_col="source",
                                 item_col="item",
                                 baseline_batches=1, threshold=0.05)
            .writeStream.format("parquet")
            .option("path", ck + "_out")
            .option("checkpointLocation", ck)
            .outputMode("append")
            .start())


BASE = [("s1", w) for w in
        ["en"] * 50 + ["de"] * 30 + ["fr"] * 20]          # reference mix
SAME = [("s1", w) for w in
        ["en"] * 48 + ["de"] * 32 + ["fr"] * 20]          # same-ish mix
SHIFTED = [("s1", w) for w in
           ["zh"] * 70 + ["en"] * 30]                     # moved mix


def test_drift_monitor_baseline_survives_restart(spark, tmp_path):
    src = str(tmp_path / "in")
    ck = str(tmp_path / "ck")

    _write_batch(spark, src, BASE)            # batch 0: warmup
    q = _start(spark, src, ck)
    q.processAllAvailable()
    _write_batch(spark, src, SAME)            # batch 1: in-distribution
    q.processAllAvailable()
    q.stop()                                  # kill mid-stream

    # restart from the checkpoint: the frozen baseline must survive in
    # the state store and the shifted batch must trip the alarm
    _write_batch(spark, src, SHIFTED)
    q2 = _start(spark, src, ck)
    q2.processAllAvailable()
    q2.stop()

    rows = sorted(spark.read.parquet(ck + "_out").collect(),
                  key=lambda r: (r.phase != "warmup", r.n_batch != 100))
    by_phase = [(r.phase, r.n_base, r.n_batch, r.drifted) for r in rows]
    # batch 0 accumulated the baseline
    assert by_phase[0] == ("warmup", 100, 100, False)
    monitor = sorted((r for r in rows if r.phase == "monitor"),
                     key=lambda r: r.drift)
    assert len(monitor) == 2
    same, shifted = monitor
    # the baseline count proves the state survived the restart
    assert same.n_base == 100 and shifted.n_base == 100
    assert not same.drifted and same.drift < 0.05
    assert shifted.drifted and shifted.drift > 0.05


def test_drift_stat_matches_batch_operator(spark):
    """The streaming statistic equals the batch operator's sum over
    items for the same two sides."""
    from pyspark.sql import functions as F

    from tb_lakehouse_enhanced_spark.operators.analytics import (
        distribution_drift,
    )
    from tb_lakehouse_enhanced_spark.streaming.drift import _drift_stat

    a = {"en": 50, "de": 30, "fr": 20}
    b = {"zh": 70, "en": 30}
    rows = [(w, True) for w, c in a.items() for _ in range(c)] + \
           [(w, False) for w, c in b.items() for _ in range(c)]
    df = spark.createDataFrame(rows, "item string, is_a boolean")
    want = (distribution_drift(df, "item", "is_a")
            .agg(F.sum("drift")).collect()[0][0])
    got = _drift_stat(a, b)
    assert abs(got - want) < 1e-12
