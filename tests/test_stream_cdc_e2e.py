"""Streaming CDC end-to-end composition (VERDICT r8 #5).

The deployed shape: source table with ``delta.enableChangeDataFeed``
→ ``stream_table(read_change_feed=True)`` → ``stream_cdf_apply_sink``
into a downstream replica — exactly-once across a checkpoint restart
(replica == source at every epoch, no duplicate applies).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable
from tb_lakehouse_enhanced_spark.sources.tablestream import stream_table
from tb_lakehouse_enhanced_spark.streaming.sink import (
    cdf_apply_batch_sink, stream_cdf_apply_sink,
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _run_epoch(spark, src, dst, ck):
    q = stream_cdf_apply_sink(
        stream_table(spark, src.path, read_change_feed=True),
        dst, key_cols=("id",)) \
        .option("checkpointLocation", ck).start()
    q.processAllAvailable()
    q.stop()


def test_cdf_stream_apply_exactly_once_across_restart(
        spark, tmp_base, tmp_path):
    src = ManagedTable(spark, f"{tmp_base}/src")
    dst = ManagedTable(spark, f"{tmp_base}/dst")
    ck = str(tmp_path / "ck")
    src.overwrite(spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], ["id", "k", "v"]))
    src.set_property("delta.enableChangeDataFeed", "true")
    src.append(spark.createDataFrame([(3, "c", 30.0)], ["id", "k", "v"]))

    _run_epoch(spark, src, dst, ck)             # epoch 1
    assert _rows(dst.read()) == _rows(src.read())

    # epoch 2: recorded DML while the stream is DOWN, then restart
    src.update(F.col("id") == 1, {"v": F.lit(11.0)})
    src.delete(F.col("id") == 2)
    _run_epoch(spark, src, dst, ck)
    assert _rows(dst.read()) == _rows(src.read())
    # the delete landed MERGE-ON-READ (tombstone), not a rewrite
    head = dst._commit(dst.current_version())
    assert head.get("tombstones") or head.get("deltas")

    # epoch 3: nothing new — restart applies nothing, no new commits
    v = dst.current_version()
    _run_epoch(spark, src, dst, ck)
    assert dst.current_version() == v
    assert _rows(dst.read()) == _rows(src.read())

    # epoch 4: more appends + update, replica converges again
    src.append(spark.createDataFrame([(4, "d", 40.0)], ["id", "k", "v"]))
    src.update(F.col("id") == 3, {"v": F.lit(33.0)})
    _run_epoch(spark, src, dst, ck)
    assert _rows(dst.read()) == _rows(src.read())
    # maintenance folds the replica's MOR debt; state unchanged
    dst.maintain(max_mor_commits=0)
    assert _rows(dst.read()) == _rows(src.read())


def test_cdf_apply_batch_replay_is_idempotent(spark, tmp_base):
    """foreachBatch may REPLAY a delivered batch after a crash: at or
    below the recorded mark it is skipped; a re-application beyond the
    mark (crash between the delete and upsert commits) resolves to the
    same state."""
    dst = ManagedTable(spark, f"{tmp_base}/dst")
    sink = cdf_apply_batch_sink(dst, ("id",))
    b0 = spark.createDataFrame(
        [(1, "a", "insert", 0), (2, "b", "insert", 0)],
        ["id", "k", "_change_type", "_commit_version"])
    sink(b0, 0)
    b1 = spark.createDataFrame(
        [(1, "A", "update_postimage", 1), (2, "b", "delete", 1),
         (3, "c", "insert", 2)],
        ["id", "k", "_change_type", "_commit_version"])
    sink(b1, 1)
    want = _rows(dst.read())
    assert want == [(1, "A"), (3, "c")]
    v = dst.current_version()
    sink(b1, 1)                     # replay at the mark: skipped
    assert dst.current_version() == v
    assert _rows(dst.read()) == want
    # same batch forced past the mark (worst-case partial replay):
    # MOR last-writer-wins lands on the same state
    sink(b1, 2)
    assert _rows(dst.read()) == want


def test_cdf_apply_collapses_multi_commit_batches(spark, tmp_base):
    """One micro-batch spanning several source commits applies each
    key's LAST change only — insert-then-delete inside the batch nets
    to absence, insert-then-update to the newest image."""
    dst = ManagedTable(spark, f"{tmp_base}/dst")
    dst.overwrite(spark.createDataFrame([(9, "z")], ["id", "k"]))
    sink = cdf_apply_batch_sink(dst, ("id",))
    batch = spark.createDataFrame(
        [(1, "a", "insert", 1), (1, "a", "update_preimage", 2),
         (1, "A", "update_postimage", 2),
         (2, "b", "insert", 1), (2, "b", "delete", 3)],
        ["id", "k", "_change_type", "_commit_version"])
    sink(batch, 0)
    assert _rows(dst.read()) == [(1, "A"), (9, "z")]
