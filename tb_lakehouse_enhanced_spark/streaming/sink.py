"""Streaming -> lakehouse sink: micro-batch upserts into managed tables.

``foreachBatch`` bridges Structured Streaming to the engine's merge
operators: each micro-batch runs a keyed upsert (or SCD2 merge) against
a ManagedTable snapshot, giving exactly-once *effective* semantics —
the merge is idempotent on (key, batch content), so micro-batch replays
after failure converge to the same state. This is the streaming
ingestion option SURVEY.md §2.10 reserves, wired to the same merge code
the batch pipeline uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.merge import ScdConfig, keyed_upsert, scd2_merge
from ..sources.managed import ManagedTable


def stream_upsert_sink(stream: DataFrame, table: ManagedTable,
                       cfg: ScdConfig, clock=None):
    """Return a writeStream wired to upsert each micro-batch.

    ``clock(batch_id) -> load_ts`` injects deterministic timestamps for
    tests (defaults to a synthetic per-batch timestamp).
    """
    clock = clock or (lambda bid: f"2024-01-01 00:00:{bid:02d}")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        target = table.read() if table.exists() else None
        table.overwrite(keyed_upsert(target, batch_df, cfg, clock(batch_id)))

    return stream.writeStream.foreachBatch(sink)


def stream_scd2_sink(stream: DataFrame, table: ManagedTable,
                     cfg: ScdConfig, clock=None):
    """Streaming silver layer: each micro-batch runs the SCD2 merge, so
    the table accumulates full version HISTORY (closed rows + current
    rows) as batches arrive — the streaming twin of the batch silver
    load (reference 22_ETL_Silver_PySpark.py:62-330, SURVEY.md §2.9).

    Micro-batches here are treated as key-complete snapshots (absent
    key = deletion), matching the reference's NOT-MATCHED-BY-SOURCE
    close semantics; feed CDC upserts through ``stream_upsert_sink``
    instead when batches are partial.
    """
    clock = clock or (lambda bid: f"2024-01-01 00:00:{bid:02d}")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        target = table.read() if table.exists() else None
        table.overwrite(scd2_merge(target, batch_df, cfg, clock(batch_id)))

    return stream.writeStream.foreachBatch(sink)


def stream_mor_sink(stream: DataFrame, table: ManagedTable,
                    key_cols: tuple[str, ...]):
    """Streaming CDC into a MERGE-ON-READ table: each micro-batch
    lands as one appended delta file via ``upsert_mor`` — per-batch
    sink cost is O(|batch|) no matter how large the table has grown,
    where the overwrite-based sinks above pay a full (or partitioned)
    rewrite per batch. The read-side window resolution amortizes
    across queries until compaction.

    Exactly-once on at-least-once delivery: ``foreachBatch`` can
    REPLAY a batch after a failure, and replayed MOR upserts would
    stack duplicate delta files — so the applied batch id is stored in
    the table's own commit metadata (``stream_batch_id``) and a batch
    <= the recorded high-water mark is skipped. The mark rides the
    SAME atomic commit as the delta it describes (the
    ``sync_incremental`` durability pattern), so sink state can never
    disagree with table state.
    """
    return stream.writeStream.foreachBatch(mor_batch_sink(table, key_cols))


def mor_batch_sink(table: ManagedTable, key_cols: tuple[str, ...]):
    """The per-batch function behind ``stream_mor_sink`` — exposed so
    the replay-idempotence guard is directly testable (and reusable
    from hand-rolled foreachBatch wiring)."""
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if not table.exists():
            table.overwrite(batch_df,
                            extra_meta={"stream_batch_id": batch_id})
            return
        # walk commits backward: an interleaved maintenance/DML
        # commit on the same table must not reset the high-water mark
        last = table.last_meta("stream_batch_id", -1)
        if batch_id <= last:
            return                      # replayed batch: already applied
        table.upsert_mor(batch_df, key_cols=key_cols,
                         extra_meta={"stream_batch_id": batch_id})
    return sink


def stream_append_sink(stream: DataFrame, table: ManagedTable):
    """Streaming INGEST into a managed table via the LOG-NATIVE
    O(batch) append commit (``ManagedTable.append``): each micro-batch
    writes ONLY its own files plus one commit record — no existing
    file is copied or even hardlinked (readers resolve the live set
    from the commit log) — so per-batch sink cost is O(|batch|) in
    bytes AND metadata at any table size, with NO read-side
    resolution debt (contrast ``stream_mor_sink``, whose delta stack
    costs a window shuffle per read until compaction). The right sink
    for pure-insert streams — event logs, document feeds, the
    Auto-Loader-shaped file ingest COPY INTO serves in batch.

    Exactly-once on at-least-once delivery: the applied batch id rides
    the append's own atomic commit (``stream_batch_id``, backward
    commit-walk on read — the same replay guard as the MOR sink), so a
    replayed micro-batch is skipped instead of appending duplicates.
    """
    return stream.writeStream.foreachBatch(append_batch_sink(table))


def append_batch_sink(table: ManagedTable):
    """The per-batch function behind ``stream_append_sink`` — exposed
    so the replay-idempotence guard is directly testable."""
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        last = table.last_meta("stream_batch_id", -1) \
            if table.exists() else -1
        if batch_id <= last:
            return                      # replayed batch: already applied
        table.append(batch_df,
                     extra_meta={"stream_batch_id": batch_id})
    return sink


def stream_cdf_apply_sink(stream: DataFrame, table: ManagedTable,
                          key_cols: tuple[str, ...]):
    """The composed CDC shape users actually deploy: a
    ``readChangeFeed`` table stream (``sources/tablestream.py``)
    applied into a downstream replica. Each micro-batch of change
    rows (``_change_type`` + ``_commit_version``) is collapsed to
    every key's LAST change, then applied MERGE-ON-READ: deletes land
    as a tombstone key file (``delete_mor_keys`` — zero replica files
    read), upserts as one delta file (``upsert_mor``) — per-batch cost
    O(|changes|) no matter how large the replica is. Run
    ``table.maintain()`` on a cadence to fold the MOR debt.

    Exactly-once on at-least-once delivery: the applied batch id rides
    the LAST commit of the apply (``stream_batch_id``); a replayed
    batch beyond the mark re-applies idempotently (identical tombstone
    + delta stack resolves to the same state), a batch at-or-below the
    mark is skipped outright.
    """
    return stream.writeStream.foreachBatch(
        cdf_apply_batch_sink(table, key_cols))


def cdf_apply_batch_sink(table: ManagedTable,
                         key_cols: tuple[str, ...]):
    """The per-batch function behind ``stream_cdf_apply_sink`` —
    exposed so the replay guard and the delete/upsert split are
    directly testable."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        keys = list(key_cols)
        # one micro-batch can span several source commits: collapse to
        # each key's newest change (same exactness argument as
        # operators/cdf.py::sync_incremental)
        w = Window.partitionBy(*keys).orderBy(F.desc("_commit_version"))
        last = (batch_df.filter(F.col("_change_type") != "update_preimage")
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn", "_commit_version"))
        cols = [c for c in last.columns if c != "_change_type"]
        ups = (last.filter(F.col("_change_type").isin(
            "insert", "update_postimage")).select(cols))
        if not table.exists():
            table.overwrite(ups, extra_meta={"stream_batch_id": batch_id})
            return
        mark = table.last_meta("stream_batch_id", -1)
        if batch_id <= mark:
            return                      # replayed batch: already applied
        dels = last.filter(F.col("_change_type") == "delete").select(keys)
        meta = {"stream_batch_id": batch_id}
        has_dels, has_ups = not dels.isEmpty(), not ups.isEmpty()
        if has_dels and has_ups:
            table.delete_mor_keys(dels, key_cols)
            table.upsert_mor(ups, key_cols=key_cols, extra_meta=meta)
        elif has_dels:
            table.delete_mor_keys(dels, key_cols, extra_meta=meta)
        elif has_ups:
            table.upsert_mor(ups, key_cols=key_cols, extra_meta=meta)
    return sink


def stream_bm25_index_sink(stream: DataFrame, path: str,
                           n_buckets: int = 64,
                           id_col: str = "doc_id",
                           text_col: str = "text"):
    """Streaming corpus -> searchable BM25 index: each micro-batch of
    documents indexes into the persisted posting list via
    ``append_bm25_index`` — O(|batch|) sink cost at any index size,
    and probes between batches always see a consistent committed
    prefix (the stats JSON's ``last_batch`` mark gates visibility).

    Exactly-once on at-least-once delivery: the foreachBatch batch id
    IS the ingest_batch id (offset by the build's batch 0), so a
    replayed batch is skipped by the high-water check, and a batch
    that crashed mid-write left only an invisible directory that the
    retry overwrites before the mark advances.
    """
    return stream.writeStream.foreachBatch(
        bm25_batch_sink(path, n_buckets, id_col, text_col))


def bm25_batch_sink(path: str, n_buckets: int = 64,
                    id_col: str = "doc_id", text_col: str = "text"):
    """The per-batch function behind ``stream_bm25_index_sink`` —
    exposed so the replay guard is directly testable."""
    import os

    from ..operators.retrieval import append_bm25_index, build_bm25_index

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if not os.path.isfile(os.path.join(path, "_bm25_stats.json")):
            # bootstrap an EMPTY index as ingest batch 0; every stream
            # batch then appends at batch_id + 1 uniformly, so a replay
            # of ANY batch (including the first) hits the high-water
            # skip instead of double-indexing
            build_bm25_index(batch_df.limit(0), path, n_buckets=n_buckets,
                             id_col=id_col, text_col=text_col)
        append_bm25_index(batch_df, path, batch_id=batch_id + 1,
                          id_col=id_col, text_col=text_col)

    return sink


def sql_merge_batch_sink(lake, merge_sql: str):
    """Per-batch executor: each micro-batch binds as the statement's
    USING relation and the MERGE TEXT runs through the SQL front-end —
    streaming ingestion driven by the SAME statement string the batch
    pipeline uses (reference 22_ETL_Silver_PySpark.py:62-101 texts,
    unchanged).

    Exactly-once on at-least-once delivery, the ``mor_batch_sink``
    pattern: the applied batch id rides the target's own commit
    metadata (``stream_batch_id``), atomically with the merge result
    it describes, and replayed batch ids are skipped. The target table
    must exist (the reference's DDL-first flow; create it via
    ``lake.sql("CREATE TABLE ...")``)."""
    from ..sqlfront import parse_merge
    spec = parse_merge(merge_sql)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        tbl = lake.table(spec.target)
        # backward commit walk, not just HEAD: OPTIMIZE/VACUUM or any
        # other statement through the same front-end between batches
        # would otherwise hide the mark and re-apply a replayed batch
        # (fatal for non-idempotent merge texts like cnt = cnt + 1)
        last = tbl.last_meta("stream_batch_id", -1)
        if batch_id <= last:
            return                      # replayed batch: already applied
        # the micro-batch IS the USING relation: foreachBatch hands it
        # over in a CLONED session whose temp views the outer session
        # cannot resolve, so it binds directly instead of via a view
        lake.sql(merge_sql, extra_meta={"stream_batch_id": batch_id},
                 source_df=batch_df)
    return sink


def stream_sql_merge_sink(stream: DataFrame, lake, merge_sql: str):
    """writeStream wiring for ``sql_merge_batch_sink``."""
    return stream.writeStream.foreachBatch(
        sql_merge_batch_sink(lake, merge_sql))
