"""Byte-shape goldens for the Delta-log mirror (VERDICT r8 #4).

No external Delta reader is installable in this container, so the
mirror was verified only by this repo's own protocol replay — a
shared writer/reader misreading of PROTOCOL.md would pass. These
goldens pin the SERIALIZED action shapes for one history covering
create / append / partition-scoped rewrite / column-map episode /
materialize-after-map / recorded cdc, with volatile fields
(timestamps, sizes, uuids, file names, append-dir tokens) normalized
deterministically. A mirror change now shows up as a reviewed golden
diff instead of only a replay-equivalence pass.

Regenerate deliberately with:
    REGEN_DELTA_GOLDENS=1 python -m pytest tests/test_delta_log_goldens.py
"""

from __future__ import annotations

import glob
import json
import os
import re

from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "delta_log_golden.json")


def _build_history(spark, path: str) -> ManagedTable:
    t = ManagedTable(spark, path, partition_by=("p",))
    t.overwrite(spark.createDataFrame(
        [(1, "a", 0), (2, "b", 1)], "id bigint, k string, p int"))   # v0
    t.append(spark.createDataFrame(
        [(3, "c", 1)], "id bigint, k string, p int"))                # v1
    t.set_property("delta.enableChangeDataFeed", "true")
    t.update(F.col("id") == 2, {"k": F.lit("B")})                    # v2 (cdc)
    cmap = t.identity_column_map() + [[None, "extra", "int"]]
    t.evolve_schema(cmap, "ADD COLUMNS (extra int)")                 # v3
    t.overwrite(t.read().withColumn("extra", F.lit(7)))              # v4
    # mapped-era episode (r11 golden surface): a SECOND evolution
    # (rename -> maxColumnId ratchet), an O(batch) mapped append
    # (adds-only under protocol 2/5), a mapped partition-scoped UPDATE
    # (real add/remove actions, ADVICE r10 high), then identity DDL
    # metadata riding the materialized identity-mapped schemaString
    cmap = t.identity_column_map()
    for e in cmap:
        if e[1] == "k":
            e[1] = "label"
    t.evolve_schema(cmap, "RENAME COLUMN")                           # v5
    t.append(spark.createDataFrame(
        [(4, "d", 0, 1)], "id bigint, label string, p int, extra int"))  # v6
    t.update(F.col("id") == 1, {"extra": F.lit(9)})                  # v7
    with open(os.path.join(t.path, "_ddl_info.json"), "w") as f:
        json.dump({"identity": "id", "identity_start": 1,
                   "identity_step": 1, "identity_always": True}, f)
    t.overwrite(t.read())                                            # v8
    return t


def _normalize(path: str) -> list[dict]:
    """Every mirror entry, volatile fields replaced by deterministic
    placeholders; file paths keep their structure but data file names
    become FILE_<i> in first-seen order and append-dir tokens TOK."""
    file_ids: dict[str, str] = {}

    def norm_path(p: str) -> str:
        p = re.sub(r"(v\d+)-a[0-9a-f]{8}", r"\1-aTOK", p)
        p = re.sub(r"(v\d+)-r[0-9a-f]{8}", r"\1-rTOK", p)
        p = re.sub(r"((?:delta|tomb)_v\d+)-m[0-9a-f]{8}", r"\1-mTOK", p)
        base = os.path.basename(p)
        if base.endswith(".parquet"):
            fid = file_ids.setdefault(base,
                                      f"FILE_{len(file_ids)}.parquet")
            p = p[: -len(base)] + fid
        return p

    out = []
    for fn in sorted(glob.glob(os.path.join(path, "_delta_log", "*.json"))):
        v = int(os.path.basename(fn).split(".")[0])
        with open(fn) as f:
            actions = [json.loads(line) for line in f if line.strip()]
        for a in actions:
            if "commitInfo" in a:
                a["commitInfo"]["timestamp"] = 0
            if "metaData" in a:
                a["metaData"]["id"] = "TABLE_ID"
                a["metaData"]["createdTime"] = 0
            if "add" in a:
                a["add"].update(
                    path=norm_path(a["add"]["path"]), size=0,
                    modificationTime=0)
            if "remove" in a:
                a["remove"].update(
                    path=norm_path(a["remove"]["path"]),
                    deletionTimestamp=0)
            if "cdc" in a:
                a["cdc"].update(path=norm_path(a["cdc"]["path"]), size=0)
        # adds/removes sorted for a stable golden (emission order is
        # already sorted, but don't let that be the thing pinned)
        keyed = sorted(
            actions, key=lambda a: (next(iter(a)),
                                    json.dumps(a, sort_keys=True)))
        out.append({"version": v, "actions": keyed})
    return out


def test_mirror_action_shapes_match_golden(spark, tmp_base):
    t = _build_history(spark, f"{tmp_base}/g")
    got = _normalize(t.path)
    if os.environ.get("REGEN_DELTA_GOLDENS"):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w") as f:
            json.dump(got, f, indent=1, sort_keys=True)
    with open(GOLDEN) as f:
        want = json.load(f)
    assert json.loads(json.dumps(got, sort_keys=True)) == want, (
        "mirror serialization changed — if intentional, regenerate "
        "with REGEN_DELTA_GOLDENS=1 and review the diff")


DV_GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                         "delta_dv_golden.json")


def _build_dv_history(spark, path: str) -> ManagedTable:
    """A merge-on-read episode mirrored THROUGH with real deletion
    vectors (VERDICT r12 #2): delete -> upsert -> mid-MOR append ->
    refuse window -> on-demand DV -> copy-on-write reset."""
    t = ManagedTable(spark, path)
    t.overwrite(spark.createDataFrame(
        [(i, i * 10) for i in range(6)], "id bigint, v bigint"))   # v0
    t.delete_mor(F.col("id") <= 1, key_cols=("id",))               # v1 DV
    t.upsert_mor(spark.createDataFrame(
        [(3, 999)], "id bigint, v bigint"), ("id",))               # v2 DV
    t.append(spark.createDataFrame(
        [(7, 70)], "id bigint, v bigint"))                         # v3 DV
    os.environ["TB_LAKEHOUSE_DV_MIRROR"] = "0"
    try:
        t.delete_mor(F.col("id") == 5, key_cols=("id",))           # v4 refuse
    finally:
        os.environ["TB_LAKEHOUSE_DV_MIRROR"] = "every"
    t.mirror_deletion_vectors()          # v4 entry rewritten with DVs
    t.compact()                                                    # v5 clean
    return t


def test_dv_mirror_action_shapes_match_golden(spark, tmp_base,
                                              monkeypatch):
    monkeypatch.setenv("TB_LAKEHOUSE_DV_MIRROR", "every")
    t = _build_dv_history(spark, f"{tmp_base}/dv")
    got = _normalize(t.path)
    # DV descriptors: the uuid reference and byte spans are volatile;
    # cardinality is semantic and stays pinned
    for entry in got:
        for a in entry["actions"]:
            dvd = (a.get("add") or {}).get("deletionVector")
            if dvd:
                dvd.update(pathOrInlineDv="DVREF", offset=0,
                           sizeInBytes=0)
    if os.environ.get("REGEN_DELTA_GOLDENS"):
        with open(DV_GOLDEN, "w") as f:
            json.dump(got, f, indent=1, sort_keys=True)
    with open(DV_GOLDEN) as f:
        want = json.load(f)
    assert json.loads(json.dumps(got, sort_keys=True)) == want, (
        "DV mirror serialization changed — if intentional, regenerate "
        "with REGEN_DELTA_GOLDENS=1 and review the diff")
    # and the episode round-trips: external replay == engine read at
    # the final state AND at the DV'd mid-MOR version
    from tb_lakehouse_enhanced_spark.sources.deltaread import read_delta

    def rows(df):
        return sorted(map(tuple, df.select("id", "v").collect()))

    assert rows(read_delta(spark, t.path)) == rows(t.read())
    assert rows(read_delta(spark, t.path, version=4)) == \
        rows(t.read(version=4))
