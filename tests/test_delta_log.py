"""Delta-protocol log mirror (sources/managed.py::_emit_delta_log).

No external Delta reader is installable in this container (verified:
``import delta`` fails, DuckDB's delta extension needs a network
download), so conformance is golden-tested against the published Delta
Transaction Log Protocol shapes (delta-io/delta PROTOCOL.md): action
key sets, version file naming, schemaString, partitionValues encoding,
and — the strongest check — a protocol REPLAY: reconstructing the live
file set the way a Delta reader would (adds minus removes, in version
order) must reproduce the current table contents exactly.
"""

from __future__ import annotations

import glob
import json
import os
import re

import pytest
from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable


def _log_entries(path: str) -> dict[int, list[dict]]:
    out = {}
    for fn in sorted(glob.glob(f"{path}/_delta_log/*.json")):
        v = int(os.path.basename(fn).split(".")[0])
        with open(fn) as f:
            out[v] = [json.loads(line) for line in f if line.strip()]
    return out


def _replay_live_files(path: str) -> set[str]:
    """What a Delta reader does: fold adds/removes in version order."""
    live: set[str] = set()
    for _v, actions in sorted(_log_entries(path).items()):
        for a in actions:
            if "remove" in a:
                live.discard(a["remove"]["path"])
            if "add" in a:
                live.add(a["add"]["path"])
    return live


@pytest.fixture()
def mt(spark, tmp_base):
    t = ManagedTable(spark, f"{tmp_base}/dlt")
    t.overwrite(spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)], ["id", "k", "v"]))
    return t


def test_log_file_naming_and_action_shapes(spark, mt):
    mt.overwrite(mt.read().filter("id < 3"))
    logs = _log_entries(mt.path)
    assert sorted(logs) == [0, 1]
    # version files use the 20-digit zero-padded protocol name
    assert os.path.exists(
        os.path.join(mt.path, "_delta_log", "0" * 20 + ".json"))

    v0 = logs[0]
    kinds = [next(iter(a)) for a in v0]
    # protocol + metaData must appear in version 0
    assert "protocol" in kinds and "metaData" in kinds and "add" in kinds
    proto = next(a["protocol"] for a in v0 if "protocol" in a)
    assert proto == {"minReaderVersion": 1, "minWriterVersion": 2}

    meta = next(a["metaData"] for a in v0 if "metaData" in a)
    # exact spec field set for metaData
    assert set(meta) == {"id", "format", "schemaString",
                         "partitionColumns", "configuration", "createdTime"}
    assert meta["format"] == {"provider": "parquet", "options": {}}
    # schemaString is a Spark StructType JSON equal to the table schema
    from pyspark.sql.types import StructType
    assert StructType.fromJson(json.loads(meta["schemaString"])) == \
        mt.read().schema

    for a in v0:
        if "add" in a:
            assert set(a["add"]) == {"path", "partitionValues", "size",
                                     "modificationTime", "dataChange"}
            assert a["add"]["dataChange"] is True
            full = os.path.join(mt.path, a["add"]["path"])
            assert os.path.getsize(full) == a["add"]["size"]

    v1 = logs[1]
    removes = [a["remove"] for a in v1 if "remove" in a]
    assert removes, "second commit must remove the previous snapshot"
    for r in removes:
        assert set(r) == {"path", "deletionTimestamp", "dataChange"}
    # removed paths are exactly version 0's added paths
    v0_adds = {a["add"]["path"] for a in v0 if "add" in a}
    assert {r["path"] for r in removes} == v0_adds


def test_metadata_id_stable_across_commits(spark, mt):
    mt.overwrite(mt.read())
    logs = _log_entries(mt.path)
    ids = {a["metaData"]["id"]
           for acts in logs.values() for a in acts if "metaData" in a}
    assert len(ids) == 1


def test_replay_reconstructs_current_table(spark, mt):
    """Protocol replay (adds minus removes over all versions) names
    exactly the files of the CURRENT snapshot, and reading those files
    reproduces the table — what an external Delta reader would see,
    across overwrite, UPDATE, DELETE, and RESTORE commits."""
    mt.update(F.col("k") == "a", {"v": F.col("v") + 1})
    mt.delete(F.col("id") == 2)
    mt.restore(1)
    live = _replay_live_files(mt.path)
    assert live  # non-empty
    paths = [os.path.join(mt.path, p) for p in sorted(live)]
    got = spark.read.parquet(*paths)
    want = mt.read()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_partitioned_table_partition_values(spark, tmp_base):
    t = ManagedTable(spark, f"{tmp_base}/dltp", partition_by=("k",))
    t.overwrite(spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, None, 30.0)], ["id", "k", "v"]))
    logs = _log_entries(t.path)
    adds = [a["add"] for a in logs[0] if "add" in a]
    vals = {a["partitionValues"].get("k") for a in adds}
    # string-encoded values per the protocol; hive NULL sentinel -> null
    assert {"a", "b", None} <= vals
    meta = next(a["metaData"] for a in logs[0] if "metaData" in a)
    assert meta["partitionColumns"] == ["k"]
    # partition column present in schemaString even though it is
    # directory-encoded, not stored in the parquet files
    fields = {f["name"] for f in
              json.loads(meta["schemaString"])["fields"]}
    assert "k" in fields
    # replay works for partitioned layouts too (basePath keeps the
    # partition column when reading explicit leaf files)
    live = sorted(_replay_live_files(t.path))
    got = (spark.read.option("basePath", os.path.join(t.path, "v0"))
           .parquet(*[os.path.join(t.path, p) for p in live]))
    assert got.count() == 3


def test_merge_and_clone_continue_the_log(spark, tmp_base):
    """Partition-scoped merge commits and shallow clones emit too: the
    clone starts its own log at version 0 with protocol+metaData."""
    t = ManagedTable(spark, f"{tmp_base}/dltm")
    t.overwrite(spark.createDataFrame([(1, 10.0)], ["id", "v"]))
    c = t.clone(f"{tmp_base}/dltm_clone")
    logs = _log_entries(c.path)
    assert sorted(logs) == [0]
    kinds = [next(iter(a)) for a in logs[0]]
    assert "protocol" in kinds and "metaData" in kinds and "add" in kinds
    live = _replay_live_files(c.path)
    got = spark.read.parquet(*[os.path.join(c.path, p) for p in sorted(live)])
    assert got.collect() == c.read().collect()


# ----------------------------------------------------------- read side ----

def test_read_delta_roundtrip_and_time_travel(spark, mt):
    """read_delta (protocol replay, no delta-spark) reproduces the
    ManagedTable contents across mutations, including VERSION AS OF."""
    from tb_lakehouse_enhanced_spark.sources.deltaread import read_delta
    mt.update(F.col("k") == "a", {"v": F.col("v") + 1})
    mt.delete(F.col("id") == 2)
    got = read_delta(spark, mt.path)
    want = mt.read()
    assert got.schema == want.schema
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # time travel to version 0
    got0 = read_delta(spark, mt.path, version=0)
    want0 = mt.read(version=0)
    assert got0.exceptAll(want0).count() == 0
    assert want0.exceptAll(got0).count() == 0


def test_read_delta_partitioned_reattaches_columns(spark, tmp_base):
    from tb_lakehouse_enhanced_spark.sources.deltaread import read_delta
    t = ManagedTable(spark, f"{tmp_base}/dlrp", partition_by=("k",))
    t.overwrite(spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, None, 30.0)], ["id", "k", "v"]))
    got = read_delta(spark, t.path)
    rows = {r["id"]: r["k"] for r in got.collect()}
    assert rows == {1: "a", 2: "b", 3: None}


def test_checkpoint_bounds_replay_and_allows_truncation(spark, mt):
    """checkpoint_delta_log + read_delta: after checkpointing, the
    pre-checkpoint JSON commits can be DELETED and the table still
    reads correctly — replay cost is bounded by checkpoint cadence,
    the 100 TB log-growth story."""
    from tb_lakehouse_enhanced_spark.sources.deltaread import (
        checkpoint_delta_log, read_delta,
    )
    mt.overwrite(mt.read().withColumn("v", F.col("v") * 2))
    mt.delete(F.col("id") == 1)
    v = checkpoint_delta_log(spark, mt.path)
    assert v == 2
    # one more post-checkpoint commit
    mt.update(F.col("id") == 3, {"v": F.lit(99.0)})
    # truncate everything the checkpoint covers
    for old in range(v + 1):
        os.remove(os.path.join(mt.path, "_delta_log",
                               f"{old:020d}.json"))
    got = read_delta(spark, mt.path)
    want = mt.read()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_read_delta_refuses_advanced_protocol(spark, mt, tmp_base):
    from tb_lakehouse_enhanced_spark.sources.deltaread import read_delta
    import pytest as _pytest
    entry = os.path.join(mt.path, "_delta_log", "0" * 20 + ".json")
    lines = open(entry).read().splitlines()
    out = []
    for ln in lines:
        a = json.loads(ln)
        if "protocol" in a:
            a["protocol"]["minReaderVersion"] = 3
        out.append(json.dumps(a))
    with open(entry, "w") as f:
        f.write("\n".join(out) + "\n")
    with _pytest.raises(ValueError, match="unsupported Delta reader"):
        read_delta(spark, mt.path)


def _cm_schema_string() -> str:
    """Logical (k long, v double, p string) with columnMapping
    physical names, as a 'name'-mode writer emits."""
    def fld(name, typ, fid, phys):
        return {"name": name, "type": typ, "nullable": True,
                "metadata": {"delta.columnMapping.id": fid,
                             "delta.columnMapping.physicalName": phys}}
    return json.dumps({"type": "struct", "fields": [
        fld("k", "long", 1, "col-aaa"),
        fld("v", "double", 2, "col-bbb"),
        fld("p", "string", 3, "col-ccc")]})


def _write_cm_fixture(spark, root: str) -> list[tuple[str, str]]:
    """Emit a 'name'-mode column-mapped partitioned Delta table the way
    an external modern writer would: data files carry PHYSICAL column
    names, partitionValues are keyed physically. Returns
    [(rel_path, partition_value)]."""
    import shutil
    files = []
    for p in ("x", "y"):
        rows = [(i, float(i) * 2.0) for i in range(5)] if p == "x" \
            else [(i, float(i) * 3.0) for i in range(5, 8)]
        tmp = os.path.join(root, f"_tmp_{p}")
        (spark.createDataFrame(rows, "`col-aaa` long, `col-bbb` double")
         .coalesce(1).write.mode("overwrite").parquet(tmp))
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        rel = f"part-{p}.parquet"
        os.makedirs(root, exist_ok=True)
        os.replace(part, os.path.join(root, rel))
        shutil.rmtree(tmp)
        files.append((rel, p))
    return files


def test_read_delta_column_mapping_name_mode(spark, tmp_base):
    """An external 'name'-mode column-mapped table (reader protocol 2:
    physical col-<id> names in the files, logical names in the log,
    partitionValues keyed physically) reads back under its LOGICAL
    schema."""
    from tb_lakehouse_enhanced_spark.sources.deltaread import read_delta
    root = f"{tmp_base}/ext_cm"
    files = _write_cm_fixture(spark, root)
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {
            "id": "ext-cm-1",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _cm_schema_string(),
            "partitionColumns": ["p"],
            "configuration": {"delta.columnMapping.mode": "name",
                              "delta.columnMapping.maxColumnId": "3"},
            "createdTime": 0}},
        *[{"add": {"path": rel, "partitionValues": {"col-ccc": p},
                   "size": 1, "modificationTime": 0, "dataChange": True}}
          for rel, p in files],
    ]
    with open(os.path.join(log, "0" * 20 + ".json"), "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions) + "\n")
    got = read_delta(spark, root)
    assert got.columns == ["k", "v", "p"]
    rows = sorted(map(tuple, got.collect()))
    want = sorted([(i, float(i) * 2.0, "x") for i in range(5)]
                  + [(i, float(i) * 3.0, "y") for i in range(5, 8)])
    assert rows == want


def test_read_delta_column_mapping_nested_struct_refused(spark, tmp_base):
    """A column-mapped table whose schema carries physically-mapped
    NESTED fields (struct members) must be refused loudly: only
    top-level renames are implemented, and reading would silently NULL
    every nested field (by-name parquet resolution misses the physical
    names)."""
    from tb_lakehouse_enhanced_spark.sources.deltaread import read_delta
    root = f"{tmp_base}/ext_cm_nested"
    os.makedirs(os.path.join(root, "_delta_log"))
    nested_schema = json.dumps({"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.id": 1,
                      "delta.columnMapping.physicalName": "col-aaa"}},
        {"name": "addr", "nullable": True,
         "metadata": {"delta.columnMapping.id": 2,
                      "delta.columnMapping.physicalName": "col-bbb"},
         "type": {"type": "struct", "fields": [
             {"name": "city", "type": "string", "nullable": True,
              "metadata": {"delta.columnMapping.id": 3,
                           "delta.columnMapping.physicalName": "col-ccc"}},
         ]}},
    ]})
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {
            "id": "ext-cm-2",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": nested_schema,
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "name",
                              "delta.columnMapping.maxColumnId": "3"},
            "createdTime": 0}},
    ]
    with open(os.path.join(root, "_delta_log", "0" * 20 + ".json"),
              "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions) + "\n")
    with pytest.raises(ValueError, match="NESTED"):
        read_delta(spark, root)


def test_read_delta_multipart_checkpoint(spark, tmp_base):
    """A classic multi-part checkpoint (`parts` in _last_checkpoint,
    <v>.checkpoint.<i>.<n>.parquet shards) replays as the union of its
    parts — commit JSONs at or before it are not needed; an incomplete
    part set is refused, not silently partial."""
    from tb_lakehouse_enhanced_spark.sources.deltaread import read_delta
    root = f"{tmp_base}/ext_mp"
    t = ManagedTable(spark, root)
    t.overwrite(spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, s string"))
    t.overwrite(spark.createDataFrame(
        [(1, "a"), (4, "d")], "k long, s string"))
    want = sorted(map(tuple, read_delta(spark, root).collect()))

    # split the engine-written single checkpoint into two parts
    from tb_lakehouse_enhanced_spark.sources.deltaread import (
        checkpoint_delta_log,
    )
    v = checkpoint_delta_log(spark, root)
    log = os.path.join(root, "_delta_log")
    single = os.path.join(log, f"{v:020d}.checkpoint.parquet")
    cp = spark.read.parquet(single)
    half = [cp.filter(F.col("add").isNull()),
            cp.filter(F.col("add").isNotNull())]
    n = cp.count()
    for i, part_df in enumerate(half, start=1):
        tmp = single + f".tmp{i}"
        part_df.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        os.replace(src, os.path.join(
            log, f"{v:020d}.checkpoint.{i:010d}.{2:010d}.parquet"))
        import shutil
        shutil.rmtree(tmp)
    os.remove(single)
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        json.dump({"version": v, "size": n, "parts": 2}, f)
    # commit JSONs <= checkpoint removed: replay must come from parts
    for fn in glob.glob(os.path.join(log, "*.json")):
        if int(os.path.basename(fn).split(".")[0]) <= v:
            os.remove(fn)
    assert sorted(map(tuple, read_delta(spark, root).collect())) == want

    # an incomplete part set raises instead of reading half a table
    os.remove(os.path.join(
        log, f"{v:020d}.checkpoint.{2:010d}.{2:010d}.parquet"))
    with pytest.raises(FileNotFoundError, match="multi-part checkpoint"):
        read_delta(spark, root)


def test_mirror_emits_cdc_actions_for_recorded_commits(spark, tmp_path):
    """A cdf-enabled DML commit mirrors its recorded change files as
    protocol `cdc` actions (writer v4 + enableChangeDataFeed config);
    data replay (add/remove) is unaffected and external readers that
    ignore cdc still round-trip the snapshot."""
    import json
    import os

    from pyspark.sql import functions as F

    from tb_lakehouse_enhanced_spark.sources.deltaread import read_delta
    from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable
    t = ManagedTable(spark, str(tmp_path / "cdc_mirror"))
    t.overwrite(spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], ["id", "k", "v"]))
    t.set_property("delta.enableChangeDataFeed", "true")
    t.update(F.col("id") == 1, {"v": F.lit(11.0)})                    # v1
    entry = os.path.join(t.path, "_delta_log", f"{1:020d}.json")
    actions = [json.loads(line) for line in open(entry)]
    cdc = [a["cdc"] for a in actions if "cdc" in a]
    assert cdc and all(a["path"].startswith("cdc_v1") for a in cdc)
    assert all(a["dataChange"] is False for a in cdc)
    proto = next(a["protocol"] for a in actions if "protocol" in a)
    assert proto["minWriterVersion"] == 4
    meta = next(a["metaData"] for a in actions if "metaData" in a)
    assert meta["configuration"]["delta.enableChangeDataFeed"] == "true"
    got = {(r["id"], r["v"]) for r in read_delta(spark, t.path).collect()}
    assert got == {(1, 11.0), (2, 20.0)}
    # the cdc files the actions reference carry the protocol's
    # _change_type column
    ch = spark.read.parquet(os.path.join(t.path, "cdc_v1"))
    assert "_change_type" in ch.columns and ch.count() == 2


def test_append_mirror_is_incremental_and_replay_correct(spark, mt):
    """Append commits mirror adds-only for the batch (O(batch) log
    lines); a later overwrite removes the LIVE paths (replay-based) so
    external readers never see duplicated rows."""
    from tb_lakehouse_enhanced_spark.sources.deltaread import read_delta
    mt.append(spark.createDataFrame([(4, "d", 40.0)], ["id", "k", "v"]))
    mt.append(spark.createDataFrame([(5, "e", 50.0)], ["id", "k", "v"]))
    logs = _log_entries(mt.path)
    for v in (1, 2):
        kinds = [next(iter(a)) for a in logs[v]]
        assert "remove" not in kinds and "metaData" not in kinds
        adds = [a["add"]["path"] for a in logs[v] if "add" in a]
        # exactly the batch's recorded files, nothing re-added
        mt_meta = mt._commit(v)
        assert sorted(adds) == sorted(
            f"{mt_meta['dir']}/{r}" for r in mt_meta["added_files"])
    got = {(r["id"], r["v"]) for r in read_delta(spark, mt.path).collect()}
    assert got == {(1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0), (5, 50.0)}
    # the overwrite must remove v0's AND the appends' paths — the live
    # set — not a walk of the parent dir's hardlinked copies
    mt.overwrite(mt.read().filter("id <= 2"))
    removes = {a["remove"]["path"] for a in _log_entries(mt.path)[3]
               if "remove" in a}
    assert any(p.startswith("v0/") for p in removes)
    assert any(p.startswith(mt._commit(1)["dir"] + "/") for p in removes)
    assert any(p.startswith(mt._commit(2)["dir"] + "/") for p in removes)
    got = {(r["id"], r["v"]) for r in read_delta(spark, mt.path).collect()}
    assert got == {(1, 10.0), (2, 20.0)}


def test_vacuum_keeps_append_chain_then_reclaims_after_materialize(
        spark, mt):
    """Log-native appends never duplicate bytes into new dirs, so a
    retained head's live set REFERENCES the chain's old dirs — vacuum
    must keep them all (Delta's retention semantics: bytes become
    reclaimable only once a materializing commit stops referencing
    them), then reclaim everything at the next materialize."""
    import os

    from tb_lakehouse_enhanced_spark.sources.deltaread import read_delta
    mt.append(spark.createDataFrame([(4, "d", 40.0)], ["id", "k", "v"]))
    mt.append(spark.createDataFrame([(5, "e", 50.0)], ["id", "k", "v"]))
    removed = mt.vacuum(retain_last=1)
    assert removed == []            # head's live chain spans v0..v2
    assert os.path.isdir(os.path.join(mt.path, "v0"))
    want = {(1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0), (5, 50.0)}
    assert {(r["id"], r["v"])
            for r in read_delta(spark, mt.path).collect()} == want
    assert {(r["id"], r["v"])
            for r in mt.read().collect()} == want
    # a materializing commit ends the chain: vacuum now reclaims it
    mt.compact()
    removed = mt.vacuum(retain_last=1)
    assert set(removed) == {0, 1, 2}
    for d in ("v0", "v1", "v2"):
        assert not os.path.isdir(os.path.join(mt.path, d))
    assert os.path.isfile(
        os.path.join(mt.path, "_delta_log", "_last_checkpoint"))
    assert {(r["id"], r["v"])
            for r in read_delta(spark, mt.path).collect()} == want
    assert {(r["id"], r["v"]) for r in mt.read().collect()} == want


def test_partial_rewrite_mirror_is_partition_scoped(spark, tmp_base):
    """A partition-scoped UPDATE mirrors removes/adds for the touched
    partition ONLY (O(touched) log entry); untouched partitions' adds
    stay live under their original paths and external replay matches
    the table — including after a later vacuum re-points them."""
    import os

    from pyspark.sql import functions as F

    from tb_lakehouse_enhanced_spark.sources.deltaread import read_delta
    from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable
    t = ManagedTable(spark, f"{tmp_base}/pmir", partition_by=("k",))
    t.overwrite(spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        ["id", "k", "v"]))
    t.set_property("enableChangeDataFeed", "true")
    t.update(F.col("id") == 2, {"v": F.lit(22.0)})           # touches k=b
    entry = _log_entries(t.path)[1]
    kinds = [next(iter(a)) for a in entry]
    assert "metaData" not in kinds
    removes = [a["remove"]["path"] for a in entry if "remove" in a]
    adds = [a["add"]["path"] for a in entry if "add" in a]
    assert removes and all("/k=b/" in p for p in removes), removes
    assert adds and all("/k=b/" in p for p in adds), adds
    # rewrite staging dirs are writer-unique since r10 (v1-r{token})
    assert all(re.match(r"v1(-r[0-9a-f]{8})?/", p) for p in adds)
    assert [a for a in entry if "cdc" in a], "recorded cdc must mirror"
    got = {(r["id"], r["v"]) for r in read_delta(spark, t.path).collect()}
    assert got == {(1, 10.0), (2, 22.0), (3, 30.0)}
    t.vacuum(retain_last=1)
    assert not os.path.isdir(os.path.join(t.path, "v0"))
    got = {(r["id"], r["v"]) for r in read_delta(spark, t.path).collect()}
    assert got == {(1, 10.0), (2, 22.0), (3, 30.0)}


def test_scd2_merge_mirror_includes_closed_history_rows(spark, tmp_base):
    """r10 fix: the SCD2 merge's NEWLY-CLOSED rows land as fresh files
    in the (otherwise hardlinked) history partition — the mirror must
    emit adds for exactly those files (``partitions_appended``), or
    external replay silently loses every closed row. Hardlinked old
    history files keep their original add actions (no duplicates)."""
    from tb_lakehouse_enhanced_spark.operators.merge import ScdConfig
    from tb_lakehouse_enhanced_spark.sources.deltaread import read_delta
    from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable
    t = ManagedTable(spark, f"{tmp_base}/s2m",
                     partition_by=("_tf_is_current",))
    cfg = ScdConfig(keys=("id",), tracked=("v",))
    t.scd2_merge_into(spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string"), cfg,
        load_ts="2024-01-01")
    t.scd2_merge_into(spark.createDataFrame(
        [(1, "a2"), (3, "c")], "id long, v string"), cfg,
        load_ts="2024-02-01")
    t.scd2_merge_into(spark.createDataFrame(
        [(1, "a3"), (3, "c")], "id long, v string"), cfg,
        load_ts="2024-03-01")

    def rows(df):
        return sorted((r["id"], r["v"], r["_tf_is_current"])
                      for r in df.collect())

    want = rows(t.read())
    assert (1, "a", 0) in want and (2, "b", 0) in want  # closed rows
    assert rows(read_delta(spark, t.path)) == want
    # no duplicate adds: each live path added exactly once across
    # the whole log
    import glob as _glob
    adds = []
    for fn in sorted(_glob.glob(os.path.join(t.path, "_delta_log",
                                             "*.json"))):
        for line in open(fn):
            if line.strip():
                a = json.loads(line)
                if "add" in a:
                    adds.append(a["add"]["path"])
    assert len(adds) == len(set(adds))
    # replay survives vacuum's checkpoint re-pointing
    t.vacuum(retain_last=1)
    assert rows(read_delta(spark, t.path)) == want
