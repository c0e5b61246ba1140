"""Custom Python DataSource WRITER (Spark 4 ``pyspark.sql.datasource``):
a manifest-committed JSONL store, readable and writable.

``sources/synthetic.py`` exercises the READER half of the Python
DataSource extension point; this module completes the surface with the
writer half — the idiomatic way to add a non-file, non-JDBC SINK to the
engine without touching the JVM (the role the reference's managed-table
``saveAsTable`` sink plays — reference notebooks/12_ETL_Bronze_PySpark
.py:66 — re-expressed as a first-class Spark source/sink pair):

- ``DataSourceWriter``: each task streams its rows to a uniquely-named
  ``part-*.jsonl`` file and returns a commit message (file, row count).
  The DRIVER commits by writing a ``_manifest.json`` listing exactly
  the committed files (tmp + atomic rename), so readers never observe
  a partial job: failed/zombie task files exist on disk but are
  invisible until a manifest names them (the same visibility rule
  Delta's log provides). ``abort`` deletes the named files.
- ``DataSourceStreamWriter``: same task-side write; ``commit`` runs
  once per micro-batch with the batch id and is IDEMPOTENT — the
  applied-batch high-water mark is recorded INSIDE the manifest, in the
  same atomic rename that publishes the batch's files, so a replayed
  epoch (restart re-runs the last uncommitted batch) is detected and
  dropped instead of appending duplicates — exactly-once table contents
  on at-least-once batch delivery, with no two-file commit window.
- ``DataSourceReader``: schema comes from the manifest (recorded at
  write time), one input partition per committed file — a 1000-file
  table reads 1000-way parallel.

Scale notes: tasks write directly to their own files (no driver data
path); commit traffic is one tiny message per task; the manifest is
O(files). JSONL is the demonstration encoding — the protocol (task
files + manifest commit + epoch idempotence) is the part that carries
to any backend.

Supported field types for round-trip fidelity: long/int, double,
string, boolean, date, timestamp, and arrays thereof (JSON-native
encodings; date/timestamp as ISO strings, decoded via the manifest
schema).
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource, DataSourceReader, DataSourceStreamWriter, DataSourceWriter,
    InputPartition, WriterCommitMessage,
)
from pyspark.sql.types import StructType


def _encode(v):
    if isinstance(v, _dt.datetime):
        return {"__ts__": v.isoformat()}
    if isinstance(v, _dt.date):
        return {"__date__": v.isoformat()}
    if isinstance(v, list):
        return [_encode(x) for x in v]
    return v


def _decode(v, dtype: str):
    if v is None:
        return None
    if dtype.startswith("array<"):
        return [_decode(x, dtype[6:-1]) for x in v]
    if dtype == "timestamp":
        return _dt.datetime.fromisoformat(v["__ts__"])
    if dtype == "date":
        return _dt.date.fromisoformat(v["__date__"])
    return v


@dataclass
class _FileCommit(WriterCommitMessage):
    file: str
    rows: int


def _manifest_path(path: str) -> str:
    return os.path.join(path, "_manifest.json")


def _read_manifest(path: str) -> dict:
    try:
        with open(_manifest_path(path)) as f:
            return json.load(f)
    except FileNotFoundError:
        return {"version": -1, "files": [], "schema": None}


def _write_manifest(path: str, manifest: dict) -> None:
    tmp = _manifest_path(path) + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, _manifest_path(path))  # atomic visibility flip


class JsonlWriter(DataSourceWriter):
    def __init__(self, path: str, schema: StructType, overwrite: bool):
        self.path = path
        self.schema_json = schema.json()
        self.overwrite = overwrite
        os.makedirs(path, exist_ok=True)

    def write(self, iterator):
        """Task side: stream rows to a uniquely-named part file."""
        name = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, name), "w") as f:
            for row in iterator:
                f.write(json.dumps(
                    {k: _encode(v) for k, v in row.asDict().items()}) + "\n")
                n += 1
        return _FileCommit(file=name, rows=n)

    def commit(self, messages):
        new_files = [m.file for m in messages if m is not None]
        old = _read_manifest(self.path)
        files = new_files if self.overwrite else old["files"] + new_files
        manifest = {
            "version": old["version"] + 1, "files": files,
            "schema": self.schema_json}
        # preserve the stream writer's applied-batch high-water mark:
        # a batch commit interleaved with streaming must not drop the
        # replay guard, or a later replayed epoch would double-append
        if "last_batch" in old:
            manifest["last_batch"] = old["last_batch"]
        _write_manifest(self.path, manifest)

    def abort(self, messages):
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.file))
                except FileNotFoundError:
                    pass


class JsonlStreamWriter(DataSourceStreamWriter):
    """Per-micro-batch append with manifest-recorded idempotence.

    The applied-batch high-water mark lives INSIDE the manifest, so a
    batch's files and its applied marker become visible in the same
    atomic rename — there is no window where a crash leaves the files
    committed but the batch unmarked (which would make the replayed
    epoch append duplicates). Batch ids are monotonic within a
    checkpoint lineage, so `batchId <= last_batch` means already
    applied; one sink path therefore binds to one checkpoint lineage
    (restarting with a FRESH checkpoint against the same path must use
    a new path, as with any idempotent sink keyed by batch id).
    """

    def __init__(self, path: str, schema: StructType):
        self.path = path
        self.schema_json = schema.json()
        os.makedirs(path, exist_ok=True)

    def write(self, iterator):
        return JsonlWriter(self.path, StructType.fromJson(
            json.loads(self.schema_json)), overwrite=False).write(iterator)

    def commit(self, messages, batchId):
        old = _read_manifest(self.path)
        if batchId <= old.get("last_batch", -1):
            # replayed epoch: drop this attempt's files, keep the
            # committed attempt's — table contents stay exactly-once
            self.abort(messages, batchId)
            return
        new_files = [m.file for m in messages if m is not None]
        _write_manifest(self.path, {
            "version": old["version"] + 1,
            "files": old["files"] + new_files,
            "schema": self.schema_json,
            "last_batch": batchId})

    def abort(self, messages, batchId):
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.file))
                except FileNotFoundError:
                    pass


class _FilePartition(InputPartition):
    def __init__(self, file: str):
        self.file = file


_PUSHABLE_TYPES = {"bigint", "int", "smallint", "tinyint", "double",
                   "float", "string", "boolean"}


class JsonlReader(DataSourceReader):
    def __init__(self, path: str, schema: StructType):
        self.path = path
        self.fields = [(f.name, f.dataType.simpleString())
                       for f in schema.fields]
        self._preds: list = []

    # -- filter pushdown (Spark 4.1 Python DataSource API) -------------------
    # Comparison/null/in filters on JSON-native columns evaluate inside
    # the reader, so a selective scan emits only matching rows instead
    # of shipping everything to Spark for re-filtering (enable
    # spark.sql.python.filterPushdown.enabled). Temporal columns stay
    # Spark-side: their raw JSON encoding differs from the typed filter
    # value. Unsupported filters are returned, per the contract.
    def _compile(self, f):
        from pyspark.sql.datasource import (
            EqualTo, GreaterThan, GreaterThanOrEqual, In, IsNotNull,
            IsNull, LessThan, LessThanOrEqual,
        )
        attr = getattr(f, "attribute", None)
        if attr is None or len(attr) != 1:
            return None
        col = attr[0]
        dtype = dict(self.fields).get(col)
        if dtype not in _PUSHABLE_TYPES:
            return None
        if isinstance(f, IsNull):
            return lambda rec: rec.get(col) is None
        if isinstance(f, IsNotNull):
            return lambda rec: rec.get(col) is not None
        if isinstance(f, In):
            vals = set(f.value)
            return lambda rec: rec.get(col) in vals
        ops = {EqualTo: lambda a, b: a == b,
               GreaterThan: lambda a, b: a > b,
               GreaterThanOrEqual: lambda a, b: a >= b,
               LessThan: lambda a, b: a < b,
               LessThanOrEqual: lambda a, b: a <= b}
        op = ops.get(type(f))
        if op is None:
            return None
        v = f.value

        def pred(rec, op=op, v=v):
            x = rec.get(col)
            return x is not None and op(x, v)
        return pred

    def pushFilters(self, filters):
        for f in filters:
            compiled = self._compile(f)
            if compiled is None:
                yield f                      # Spark evaluates it
            else:
                self._preds.append(compiled)

    def partitions(self):
        files = _read_manifest(self.path)["files"]
        return [_FilePartition(f) for f in files] or [_FilePartition("")]

    def read(self, partition):
        if not partition.file:
            return
        with open(os.path.join(self.path, partition.file)) as f:
            for line in f:
                rec = json.loads(line)
                if all(p(rec) for p in self._preds):
                    yield tuple(_decode(rec.get(name), dtype)
                                for name, dtype in self.fields)


class JsonlStoreDataSource(DataSource):
    @classmethod
    def name(cls):
        return "jsonl_store"

    def _path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("jsonl_store requires a 'path' option")
        return path

    def schema(self):
        stored = _read_manifest(self._path())["schema"]
        if stored is None:
            raise ValueError(
                f"jsonl_store at {self._path()} has no manifest; write "
                "first or pass an explicit schema")
        return StructType.fromJson(json.loads(stored))

    def reader(self, schema):
        return JsonlReader(self._path(), schema)

    def writer(self, schema, overwrite):
        return JsonlWriter(self._path(), schema, overwrite)

    def streamWriter(self, schema, overwrite):
        return JsonlStreamWriter(self._path(), schema)


def register(spark) -> None:
    """Register; afterwards both directions work:
    ``df.write.format("jsonl_store").option("path", p).save()`` and
    ``spark.read.format("jsonl_store").option("path", p).load()`` plus
    ``df.writeStream.format("jsonl_store")...``. Spark refuses any
    reader that implements ``pushFilters`` while the pushdown flag is
    off, so registration enables it (it only affects sources that opt
    into the API)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(JsonlStoreDataSource)


def compact_jsonl_store(spark, path: str, target_files: int = 4) -> dict:
    """Fold the store's committed part files into ``target_files`` — the
    OPTIMIZE of the JSONL table. Every batch/stream commit leaves one
    part file per task; read parallelism should track data size, not
    commit history (the reader schedules one InputPartition per file).

    Implementation is the store's own write path: read -> coalesce ->
    overwrite-save, so the new files become visible in the same atomic
    manifest flip every commit uses (a concurrent reader sees the old
    file set or the new one, never a mix), and the stream writer's
    ``last_batch`` high-water mark is preserved — replayed epochs are
    still rejected after compaction. Superseded part files (invisible
    the moment the manifest flips) are swept afterwards; like the other
    stores' maintenance, run with no concurrent writer.
    """
    old = _read_manifest(path)
    if not old["files"]:
        return old
    before = set(old["files"])
    (spark.read.format("jsonl_store").option("path", path).load()
     .coalesce(max(1, int(target_files)))
     .write.format("jsonl_store").option("path", path)
     .mode("overwrite").save())
    new = _read_manifest(path)
    live = set(new["files"])
    for fn in os.listdir(path):
        if fn.startswith("part-") and fn.endswith(".jsonl") \
                and fn not in live and fn in before:
            try:
                os.remove(os.path.join(path, fn))
            except FileNotFoundError:
                pass
    return new
