"""Custom Python DataSource (Spark 4 DataSource API): synthetic corpus.

The reference ingests from JDBC only (SURVEY.md §2.1 S1); this module
exercises Spark's NATIVE source-extension point — `pyspark.sql.
datasource` — the idiomatic way to add a non-file, non-JDBC source to
the engine without touching the JVM: a deterministic synthetic
document corpus, usable both as a batch relation and as a micro-batch
stream.

Why a generator source: load-shaping. It materializes any row count at
full partition parallelism with ZERO storage reads — the tool for
soak-testing the dedup/packing/text tiers at sizes the parquet
fixtures don't cover (each InputPartition generates its slice
independently, so a 1000-executor cluster generates 1000-way parallel).

Determinism: every row is a pure function of (seed, doc_id) via a
splitmix64-style hash — same options, same rows, on any cluster
layout, any number of partitions. The stream variant exposes the same
rows through `SimpleDataSourceStreamReader` with replayable offsets
({"index": n} row high-water mark), so a restarted query re-reads
exactly the committed range.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource, DataSourceReader, InputPartition, SimpleDataSourceStreamReader,
)

_SCHEMA = ("doc_id bigint, text string, lang string, source string, "
           "n_chars bigint")

_VOCAB = ("the quick brown fox jumps over lazy dog data spark engine "
          "corpus token window shuffle merge join scan filter group "
          "stream batch delta table column row partition cluster "
          "query plan hash sort broadcast exchange").split()
_LANGS = ["en", "de", "fr", "es"]
_SOURCES = ["src0", "src1", "src2"]

_MASK = (1 << 64) - 1


def _mix(x: int) -> int:
    """splitmix64 finalizer — avalanche a 64-bit value."""
    x = (x + 0x9E3779B97F4A7C15) & _MASK
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK
    return x ^ (x >> 31)


def _doc_row(seed: int, doc_id: int) -> tuple:
    h = _mix(seed ^ _mix(doc_id))
    n_words = 5 + h % 40
    words = []
    for i in range(n_words):
        h = _mix(h + i + 1)
        words.append(_VOCAB[h % len(_VOCAB)])
    text = " ".join(words)
    return (doc_id, text, _LANGS[_mix(h + 1) % len(_LANGS)],
            _SOURCES[_mix(h + 2) % len(_SOURCES)], len(text))


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.numparts = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        if self.rows <= 0:
            # an empty relation is a valid request — one empty partition
            return [_RangePartition(0, 0)]
        n = max(1, self.numparts)
        step = -(-self.rows // n)  # ceil
        return [_RangePartition(i, min(i + step, self.rows))
                for i in range(0, self.rows, step)]

    def read(self, partition):
        for doc_id in range(partition.start, partition.end):
            yield _doc_row(self.seed, doc_id)


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch view of the same deterministic corpus.

    Offset = {"index": next_row}; each read() serves at most
    ``rows_per_batch`` rows and the stream runs dry at ``rows`` total,
    so `processAllAvailable()` terminates. readBetweenOffsets replays
    any committed range bit-identically (generator determinism is the
    replay log).
    """

    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.batch = int(options.get("rows_per_batch", 100))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self):
        return {"index": 0}

    def read(self, start):
        i = start["index"]
        end = min(i + self.batch, self.rows)
        return (iter([_doc_row(self.seed, d) for d in range(i, end)]),
                {"index": end})

    def readBetweenOffsets(self, start, end):
        return iter([_doc_row(self.seed, d)
                     for d in range(start["index"], end["index"])])


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls):
        return "synthetic_docs"

    def schema(self):
        return _SCHEMA

    def reader(self, schema):
        return SyntheticDocsReader(self.options)

    def simpleStreamReader(self, schema):
        return SyntheticDocsStreamReader(self.options)


def register(spark) -> None:
    """Register the source; afterwards
    ``spark.read.format("synthetic_docs").option("rows", N).load()`` and
    ``spark.readStream.format("synthetic_docs")...`` both work."""
    spark.dataSource.register(SyntheticDocsDataSource)


def write_external_delta(df, path: str, table_id: str = "ext-cm") -> list:
    """Emit ``df`` as the kind of Delta table a MODERN EXTERNAL WRITER
    produces: 'name'-mode column mapping (reader protocol 2) — parquet
    files carry physical ``col-<id>`` column names, the log schema the
    logical names with ``delta.columnMapping.physicalName`` field
    metadata. Interop fixture for sources/deltaread.py (the engine's
    own mirror in managed.py deliberately emits plain protocol-1
    tables); unpartitioned by design — partition re-attach under
    mapping is pytest-covered separately. Returns the data file names.
    """
    import glob as _glob
    import json as _json
    import os as _os
    import shutil as _shutil

    from pyspark.sql import functions as F
    spark = df.sparkSession
    phys = {f.name: f"col-{i + 1}"
            for i, f in enumerate(df.schema.fields)}
    tmp = _os.path.join(path, "_tmp_write")
    (df.select(*[F.col(c).alias(phys[c]) for c in df.columns])
     .write.mode("overwrite").parquet(tmp))
    _os.makedirs(path, exist_ok=True)
    rels = []
    for i, part in enumerate(sorted(
            _glob.glob(_os.path.join(tmp, "part-*.parquet")))):
        rel = f"part-{i:05d}.parquet"
        _os.replace(part, _os.path.join(path, rel))
        rels.append(rel)
    _shutil.rmtree(tmp)
    fields = [{"name": f.name, "type": f.dataType.jsonValue(),
               "nullable": True,
               "metadata": {"delta.columnMapping.id": i + 1,
                            "delta.columnMapping.physicalName":
                                phys[f.name]}}
              for i, f in enumerate(df.schema.fields)]
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {
            "id": table_id,
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _json.dumps(
                {"type": "struct", "fields": fields}),
            "partitionColumns": [],
            "configuration": {
                "delta.columnMapping.mode": "name",
                "delta.columnMapping.maxColumnId": str(len(fields))},
            "createdTime": 0}},
        *[{"add": {"path": rel, "partitionValues": {}, "size": 1,
                   "modificationTime": 0, "dataChange": True}}
          for rel in rels],
    ]
    log = _os.path.join(path, "_delta_log")
    _os.makedirs(log, exist_ok=True)
    with open(_os.path.join(log, "0" * 20 + ".json"), "w") as f:
        f.write("\n".join(_json.dumps(a) for a in actions) + "\n")
    return rels


def write_external_iceberg(df, path: str,
                           delete_positions: list | None = None) -> dict:
    """Emit ``df`` as the kind of Iceberg v2 table a MODERN EXTERNAL
    WRITER produces — the interop fixture for
    ``sources/iceberg.py::read_iceberg`` (the engine's own mirror
    deliberately writes stock-Spark parquet + a name mapping; this
    fixture exercises the OTHER half of the spec's resolution rules):

    - parquet data files written via pyarrow WITH real
      ``PARQUET:field_id`` column metadata;
    - the FIRST file's column names differ from the table schema (the
      post-rename layout real writers leave behind), and NO
      ``schema.name-mapping.default`` property exists — only footer
      field ids can resolve it;
    - the second snapshot's file uses current names (id + name both
      work);
    - manifests and the manifest list are DEFLATE-coded Avro (what
      real Java writers emit; the engine's own mirror writes codec
      null);
    - large random-looking snapshot ids (no small-int assumptions).

    Splits ``df`` ~half per snapshot on a row hash.  Returns
    {"rows": per-snapshot row counts}.

    ``delete_positions``: optional list of ``(snapshot_index,
    row_position)`` pairs — when given, a THIRD snapshot adds a
    POSITION-delete file (``content=1``: ``file_path`` + ``pos``
    columns, spec field ids 2147483546/2147483545) naming those rows,
    exercising the reader's position-delete path (the engine's own
    mirror emits only key-based equality deletes).
    """
    import os as _os

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from .avroio import write_ocf as _write_ocf
    from .iceberg import _MANIFEST_FILE_AVRO, _manifest_entry_avro

    pdf = df.toPandas()
    ncol = len(pdf.columns)
    logical = list(pdf.columns)
    physical = [f"c{i + 1}" for i in range(ncol)]
    mdir = _os.path.join(path, "metadata")
    ddir = _os.path.join(path, "data")
    _os.makedirs(mdir, exist_ok=True)
    _os.makedirs(ddir, exist_ok=True)

    def _arrow(names, part):
        arrs = [_pa.array(part[c]) for c in logical]
        fields = [_pa.field(n, a.type, metadata={
            b"PARQUET:field_id": str(i + 1).encode()})
            for i, (n, a) in enumerate(zip(names, arrs))]
        return _pa.Table.from_arrays(arrs, schema=_pa.schema(fields))

    import numpy as _np
    mask = (_np.arange(len(pdf)) % 2) == 0
    halves = [pdf[mask], pdf[~mask]]
    names_per_snap = [physical, logical]
    part_schema = {"type": "record", "name": "r102", "fields": []}
    entry_schema = _manifest_entry_avro(part_schema)
    # iceberg type names for the schema JSON
    def _ice_type(a):
        t = str(a)
        return {"int64": "long", "int32": "int", "object": "string",
                "float64": "double", "bool": "boolean"}.get(t, "string")
    schema_fields = [{"id": i + 1, "name": n, "required": False,
                      "type": _ice_type(pdf.dtypes[n])}
                     for i, n in enumerate(logical)]
    snap_ids = [5236712900241817531, 8431006117564873204]
    manifests_meta = {
        "schema": __import__("json").dumps(
            {"type": "struct", "schema-id": 0,
             "fields": schema_fields}),
        "schema-id": "0", "partition-spec": "[]",
        "partition-spec-id": "0", "format-version": "2",
        "content": "data"}
    snapshots, manifest_entries = [], []
    for i, (half, names) in enumerate(zip(halves, names_per_snap)):
        fp = _os.path.join(ddir, f"{i:05d}-ext.parquet")
        _pq.write_table(_arrow(names, half), fp)
        manifest_entries.append({
            "status": 1, "snapshot_id": snap_ids[i],
            "sequence_number": i + 1, "file_sequence_number": None,
            "data_file": {
                "content": 0, "file_path": fp,
                "file_format": "PARQUET", "partition": {},
                "record_count": len(half),
                "file_size_in_bytes": _os.path.getsize(fp),
                "equality_ids": None, "sort_order_id": None}})
        mpath = _os.path.join(mdir, f"ext-m{i}.avro")
        mlen = _write_ocf(mpath, entry_schema,
                          [manifest_entries[i]], manifests_meta,
                          codec="deflate")
        lpath = _os.path.join(mdir, f"snap-{snap_ids[i]}-1-ext.avro")
        _write_ocf(lpath, _MANIFEST_FILE_AVRO, [{
            "manifest_path": _os.path.join(mdir, f"ext-m{j}.avro"),
            "manifest_length": _os.path.getsize(
                _os.path.join(mdir, f"ext-m{j}.avro")),
            "partition_spec_id": 0, "content": 0,
            "sequence_number": j + 1, "min_sequence_number": j + 1,
            "added_snapshot_id": snap_ids[j],
            "added_files_count": 1, "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": len(halves[j]),
            "existing_rows_count": 0, "deleted_rows_count": 0}
            for j in range(i + 1)],
            {"snapshot-id": str(snap_ids[i]),
             "sequence-number": str(i + 1),
             "format-version": "2"}, codec="deflate")
        snapshots.append({
            "snapshot-id": snap_ids[i],
            **({"parent-snapshot-id": snap_ids[0]} if i else {}),
            "sequence-number": i + 1,
            "timestamp-ms": 1700000000000 + i,
            "manifest-list": lpath,
            "summary": {"operation": "append"},
            "schema-id": 0})
        del mlen
    doc = {
        "format-version": 2, "table-uuid":
            "00000000-0000-0000-0000-00000000ext1",
        "location": path, "last-sequence-number": 2,
        "last-updated-ms": 1700000000001, "last-column-id": ncol,
        "current-schema-id": 0,
        "schemas": [{"type": "struct", "schema-id": 0,
                     "fields": schema_fields}],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {},          # NO name mapping: ids must resolve
        "current-snapshot-id": snap_ids[1],
        "snapshots": snapshots,
        "snapshot-log": [{"timestamp-ms": s["timestamp-ms"],
                          "snapshot-id": s["snapshot-id"]}
                         for s in snapshots],
        "metadata-log": [],
        "refs": {"main": {"snapshot-id": snap_ids[1],
                          "type": "branch"}},
    }
    if delete_positions:
        # third snapshot: a position-delete file over the data files
        pd_snap = 6650912447018823117
        files_by_snap = [e["data_file"]["file_path"]
                         for e in manifest_entries]
        pdf_rows = sorted((files_by_snap[i], int(pos))
                          for i, pos in delete_positions)
        tbl = _pa.Table.from_arrays(
            [_pa.array([r[0] for r in pdf_rows], _pa.string()),
             _pa.array([r[1] for r in pdf_rows], _pa.int64())],
            schema=_pa.schema([
                _pa.field("file_path", _pa.string(), metadata={
                    b"PARQUET:field_id": b"2147483546"}),
                _pa.field("pos", _pa.int64(), metadata={
                    b"PARQUET:field_id": b"2147483545"})]))
        dp = _os.path.join(ddir, "00002-posdel.parquet")
        _pq.write_table(tbl, dp)
        del_entry = {
            "status": 1, "snapshot_id": pd_snap,
            "sequence_number": 3, "file_sequence_number": None,
            "data_file": {
                "content": 1, "file_path": dp,
                "file_format": "PARQUET", "partition": {},
                "record_count": len(pdf_rows),
                "file_size_in_bytes": _os.path.getsize(dp),
                "equality_ids": None, "sort_order_id": None}}
        _write_ocf(_os.path.join(mdir, "ext-mdel.avro"), entry_schema,
                   [del_entry], {**manifests_meta,
                                 "content": "deletes"},
                   codec="deflate")
        lpath = _os.path.join(mdir, f"snap-{pd_snap}-1-ext.avro")
        _write_ocf(lpath, _MANIFEST_FILE_AVRO, [{
            "manifest_path": _os.path.join(mdir, f"ext-m{j}.avro"),
            "manifest_length": _os.path.getsize(
                _os.path.join(mdir, f"ext-m{j}.avro")),
            "partition_spec_id": 0, "content": 0,
            "sequence_number": j + 1, "min_sequence_number": j + 1,
            "added_snapshot_id": snap_ids[j],
            "added_files_count": 1, "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": len(halves[j]),
            "existing_rows_count": 0, "deleted_rows_count": 0}
            for j in range(2)] + [{
            "manifest_path": _os.path.join(mdir, "ext-mdel.avro"),
            "manifest_length": _os.path.getsize(
                _os.path.join(mdir, "ext-mdel.avro")),
            "partition_spec_id": 0, "content": 1,
            "sequence_number": 3, "min_sequence_number": 3,
            "added_snapshot_id": pd_snap,
            "added_files_count": 1, "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": len(pdf_rows),
            "existing_rows_count": 0, "deleted_rows_count": 0}],
            {"snapshot-id": str(pd_snap), "sequence-number": "3",
             "format-version": "2"}, codec="deflate")
        snapshots.append({
            "snapshot-id": pd_snap,
            "parent-snapshot-id": snap_ids[1],
            "sequence-number": 3,
            "timestamp-ms": 1700000000002,
            "manifest-list": lpath,
            "summary": {"operation": "delete"},
            "schema-id": 0})
        doc["snapshots"] = snapshots
        doc["snapshot-log"] = [
            {"timestamp-ms": s["timestamp-ms"],
             "snapshot-id": s["snapshot-id"]} for s in snapshots]
        doc["current-snapshot-id"] = pd_snap
        doc["last-sequence-number"] = 3
        doc["refs"] = {"main": {"snapshot-id": pd_snap,
                                "type": "branch"}}
    import json as _json
    with open(_os.path.join(mdir, "v1.metadata.json"), "w") as f:
        _json.dump(doc, f)
    with open(_os.path.join(mdir, "version-hint.text"), "w") as f:
        f.write("1")
    return {"rows": [len(h) for h in halves]}
