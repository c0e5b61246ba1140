"""Delta-mirror long-history protocol conformance (VERDICT r9 ask #6).

No external Delta reader is installable in this sandbox, so beyond the
byte-shape goldens (test_delta_log_goldens) this drives ONE generated
history through create -> append chain -> schema-evolution episode ->
mapped ingest -> MOR episode -> materialize -> partition DML ->
checkpoint -> vacuum, and asserts the protocol's TRANSITION RULES hold
as invariants over every mirrored entry:

- every entry carries exactly one commitInfo;
- column mapping is ONE-WAY: once a metaData announces
  ``columnMapping.mode=name``, every later metaData keeps it and the
  reader protocol never drops below 2 (except deletionVectors
  refuse-entries, which are >= 3);
- ``maxColumnId`` never decreases;
- add/remove actions PAIR: a remove names a live path (added earlier,
  not yet removed), an add never duplicates a live path;
- MOR refuse-entries carry protocol v3 with the deletionVectors
  feature and NO actions;
- the final replay (and the replay from the checkpoint after vacuum)
  equals the table's own read.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable


def _entries(path):
    out = []
    for fn in sorted(glob.glob(os.path.join(path, "_delta_log",
                                            "*.json"))):
        with open(fn) as f:
            out.append((int(os.path.basename(fn).split(".")[0]),
                        [json.loads(x) for x in f if x.strip()]))
    return out


def _build_history(spark, path) -> ManagedTable:
    t = ManagedTable(spark, path, partition_by=("p",))
    t.overwrite(spark.createDataFrame(
        [(i, f"s{i}", i % 3) for i in range(12)],
        "id long, s string, p int"))                          # v0
    for i in range(8):                                        # v1..v8
        t.append(spark.createDataFrame(
            [(100 + i, f"a{i}", i % 3)], "id long, s string, p int"))
    cmap = t.identity_column_map()
    for e in cmap:
        if e[1] == "s":
            e[1] = "name"
    t.evolve_schema(cmap, "RENAME COLUMN")                    # v9
    cmap = t.identity_column_map() + [[None, "extra", "int"]]
    t.evolve_schema(cmap, "ADD COLUMNS")                      # v10
    for i in range(4):                                        # v11..v14
        t.append(spark.createDataFrame(
            [(200 + i, f"m{i}", i % 3, i)],
            "id long, name string, p int, extra int"))
    t.update(F.col("p") == 2, {"extra": F.lit(9)})            # v15 mapped DML
    t.overwrite(t.read())                                     # v16 material
    t.delete_mor(F.col("id") == 3, key_cols=("id",))          # v17
    t.upsert_mor(spark.createDataFrame(
        [(4, "B4", 1, None)], "id long, name string, p int, extra int"),
        ("id",))                                              # v18
    t.append(spark.createDataFrame(                           # v19 (MOR+app)
        [(300, "z", 0, 7)], "id long, name string, p int, extra int"))
    t.compact()                                               # v20 material
    t.set_property("delta.enableChangeDataFeed", "true")
    t.update(F.col("p") == 1, {"extra": F.lit(1)})            # v21 part-DML
    for i in range(10):                                       # v22..v31
        t.append(spark.createDataFrame(
            [(400 + i, f"t{i}", i % 3, i)],
            "id long, name string, p int, extra int"))
    # HEAL EPISODE (r11): a writer crashes between its commit-file
    # create (mirror entry already emitted) and its pointer flip; the
    # next appender auto-heals — the crashed version's mirror entry is
    # REPLACED by a commitInfo-only no-op and later commits proceed
    cur = t.current_version()
    t.append(spark.createDataFrame(
        [(999, "crash", 0, 0)], "id long, name string, p int, extra int"))
    cf = t._commit_file(cur + 1)
    old = os.stat(cf).st_mtime - 3600
    os.utime(cf, (old, old))
    with open(t._pointer, "w") as f:                # roll the flip back
        f.write(str(cur))
    t2 = ManagedTable(spark, t.path, partition_by=("p",))
    t2.append(spark.createDataFrame(
        [(500, "after-heal", 1, 2)],
        "id long, name string, p int, extra int"))
    healed = t2._commit(cur + 1)
    assert healed.get("healed") and healed["op"] == "HEALED ORPHAN"
    return t2


def test_mirror_transition_invariants_over_full_history(spark, tmp_base):
    t = _build_history(spark, f"{tmp_base}/h")
    entries = _entries(t.path)
    assert len(entries) >= 30
    mapping_on = False
    max_col_id = 0
    min_reader_floor = 1
    live: set[str] = set()
    for v, actions in entries:
        kinds = [next(iter(a)) for a in actions]
        assert kinds.count("commitInfo") == 1, (v, kinds)
        prot = next((a["protocol"] for a in actions
                     if "protocol" in a), None)
        metas = [a["metaData"] for a in actions if "metaData" in a]
        feats = set(prot.get("readerFeatures") or ()) if prot else set()
        if "tbLakehouseMergeOnReadPending" in feats:
            # MOR refuse-entry (no DV materialized): protocol >= 3 +
            # the table-specific pending feature every spec reader
            # must refuse; no add/remove/metaData actions
            assert prot["minReaderVersion"] >= 3
            assert not metas
            assert not any(k in ("add", "remove") for k in kinds), v
            continue
        if "deletionVectors" in feats:
            # MOR DV entry (r13): protocol v3 + real deletion vectors;
            # adds redescribe the state, each DV descriptor names an
            # existing, loadable vector
            from tb_lakehouse_enhanced_spark.sources.dvio import load_dv
            assert prot["minReaderVersion"] >= 3
            for a in actions:
                dvd = a.get("add", {}).get("deletionVector") \
                    if "add" in a else None
                if dvd:
                    assert dvd["cardinality"] == len(
                        load_dv(t.path, dvd))
            continue
        for m in metas:
            conf = m.get("configuration") or {}
            if mapping_on:
                # one-way: once mapped, every later metaData stays
                assert conf.get("delta.columnMapping.mode") == "name", v
            if conf.get("delta.columnMapping.mode") == "name":
                mapping_on = True
                min_reader_floor = 2
                mid = int(conf["delta.columnMapping.maxColumnId"])
                assert mid >= max_col_id, (v, mid, max_col_id)
                max_col_id = mid
                # every field annotates id + physicalName
                fields = json.loads(m["schemaString"])["fields"]
                for fld in fields:
                    md = fld.get("metadata") or {}
                    assert "delta.columnMapping.id" in md, (v, fld)
                    assert "delta.columnMapping.physicalName" in md
        if prot is not None:
            assert prot["minReaderVersion"] >= min_reader_floor, (
                v, prot, "protocol downgraded below the mapping floor")
        # add/remove pairing against the replayed live set (the
        # mirror's whole-table-replace and partial-rewrite entries
        # both emit their removes BEFORE their adds)
        for a in actions:
            if "remove" in a:
                assert a["remove"]["path"] in live, (
                    v, a["remove"]["path"], "remove of a never-live path")
                live.discard(a["remove"]["path"])
        for a in actions:
            if "add" in a:
                p = a["add"]["path"]
                assert p not in live, (v, p,
                                       "duplicate add of a live path")
                live.add(p)
    assert mapping_on, "history never entered a mapping episode?"

    # final replay equals the table's own read
    from tb_lakehouse_enhanced_spark.sources.deltaread import read_delta

    def rows(df):
        return sorted(map(tuple, df.select(
            "id", "name", "p", "extra").collect()))

    assert rows(read_delta(spark, t.path)) == rows(t.read())
    # checkpoint, vacuum history, replay again from the checkpoint
    t.checkpoint_mirror()
    t.vacuum(retain_last=1)
    assert rows(read_delta(spark, t.path)) == rows(t.read())
