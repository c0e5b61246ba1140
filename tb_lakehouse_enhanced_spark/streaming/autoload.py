"""Incremental file ingestion (Databricks Auto Loader's role, OSS-style).

The reference's bronze ingest re-reads every source table in full per
run (notebooks/12_ETL_Bronze_PySpark.py:61 — single-stream JDBC scans).
At 100 TB the bronze layer must ingest only what's NEW: this module uses
the Structured Streaming *file source* — which durably tracks processed
files in its checkpoint log — with an ``availableNow`` trigger, so each
invocation discovers and processes exactly the files that arrived since
the last run, then stops. Replays after a crash reprocess only
un-committed micro-batches, and the merge sink is idempotent on key, so
end-to-end the ingest is effectively exactly-once.

Landing new data as files + incremental discovery + keyed merge is the
same bronze pattern Auto Loader + MERGE provides on Databricks.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..operators.merge import ScdConfig
from ..sources.managed import ManagedTable
from .sink import stream_upsert_sink


def autoload_into(spark: SparkSession, src_dir: str, schema,
                  table: ManagedTable, cfg: ScdConfig,
                  checkpoint_dir: str, fmt: str = "parquet",
                  clock=None) -> int:
    """Ingest files that arrived in ``src_dir`` since the last run.

    Blocks until all currently-available files are merged (availableNow),
    then returns the table's resulting version. ``schema`` is required:
    a streaming file source cannot infer schemas per-batch (and at scale
    you want the contract pinned anyway).
    """
    stream = (spark.readStream.format(fmt)
              .schema(schema)
              .load(src_dir))
    q = (stream_upsert_sink(stream, table, cfg, clock=clock)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return table.current_version()
