"""Round-9 advisory regression tests.

Each test pins one of the round-8 ADVICE findings:

1. CDC UPDATE postimages are built in ONE projection, so every
   assignment sees the PRE-image (``SET a = a+1, b = a`` must record
   b = old a, matching what the rewrite actually stores).
2. A data commit on a table whose ``_delta_log`` was never written
   (or was removed) falls back to the legacy commit-record walk
   instead of crashing on ``_replay``'s ValueError.
3. ``SET TBLPROPERTIES`` parses quoted values containing commas /
   parens / spaces, and raises on garbage instead of dropping pairs.
4. ``CREATE OR REPLACE`` with an UNCHANGED layout still clears the
   old definition's generated columns.
5. The Delta mirror never downgrades out of column-mapping mode:
   after an evolution episode, later materialized commits keep
   protocol 2/5 and ``delta.columnMapping.mode=name``.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable
from tb_lakehouse_enhanced_spark.sqlfront import LakehouseSql


def _mk(spark, path, rows=((1, 10, 100), (2, 20, 200))):
    t = ManagedTable(spark, path)
    t.overwrite(spark.createDataFrame(list(rows), ["id", "a", "b"]))
    return t


# -- 1: postimage sees the pre-image ----------------------------------------

def test_update_cdc_postimage_uses_preimage(spark, tmp_base):
    t = _mk(spark, f"{tmp_base}/t")
    t.set_property("delta.enableChangeDataFeed", "true")
    t.update(F.col("id") == 1, {"a": F.col("a") + 1, "b": F.col("a")})
    post = {(r["a"], r["b"])
            for r in t.table_changes(1, 1).filter(
                F.col("_change_type") == "update_postimage").collect()}
    stored = {(r["a"], r["b"])
              for r in t.read().filter(F.col("id") == 1).collect()}
    assert post == {(11, 10)}       # b = OLD a, not a+1
    assert post == stored           # feed matches the table


def test_subquery_update_cdc_postimage_uses_preimage(spark, tmp_path):
    lake = LakehouseSql(spark, str(tmp_path / "lake"))
    lake.sql("CREATE TABLE d.t (id INT, a INT, b INT)")
    lake.sql("INSERT INTO d.t VALUES (1, 10, 100), (2, 20, 200)")
    lake.sql("ALTER TABLE d.t SET TBLPROPERTIES "
             "('delta.enableChangeDataFeed' = 'true')")
    lake.sql("CREATE TABLE d.who (id INT)")
    lake.sql("INSERT INTO d.who VALUES (1)")
    # subquery-DML route (correlated EXISTS) with inter-referencing SET
    lake.sql("UPDATE d.t SET a = a + 1, b = a WHERE EXISTS "
             "(SELECT 1 FROM d.who w WHERE w.id = t.id)")
    t = lake.table("d.t")
    v = t.current_version()
    post = {(r["a"], r["b"])
            for r in t.table_changes(v, v).filter(
                F.col("_change_type") == "update_postimage").collect()}
    stored = {(r["a"], r["b"])
              for r in t.read().filter(F.col("id") == 1).collect()}
    assert post == {(11, 10)}
    assert post == stored


# -- 2: missing _delta_log falls back, not crashes ---------------------------

def test_data_commit_survives_missing_delta_log(spark, tmp_base):
    t = ManagedTable(spark, f"{tmp_base}/t", partition_by=("p",))
    t.overwrite(spark.createDataFrame(
        [(1, "x", 1), (2, "y", 2)], ["id", "k", "p"]))
    shutil.rmtree(os.path.join(t.path, "_delta_log"))
    # partial rewrite: its mirror emission replays the (absent) log
    t.update(F.col("id") == 1, {"k": F.lit("z")})
    assert {(r["id"], r["k"]) for r in t.read().collect()} == \
        {(1, "z"), (2, "y")}
    # full overwrite path too
    shutil.rmtree(os.path.join(t.path, "_delta_log"))
    t.overwrite(t.read())
    assert t.read().count() == 2


# -- 3: TBLPROPERTIES literal parsing ----------------------------------------

def test_tblproperties_quoted_values_with_commas(spark, tmp_path):
    import pytest
    lake = LakehouseSql(spark, str(tmp_path / "lake"))
    lake.sql("CREATE TABLE d.t (id INT)")
    lake.sql("ALTER TABLE d.t SET TBLPROPERTIES "
             "('k1' = 'a,b', 'k2' = 'x (y), z', k3 = 'v 1', "
             "'delta.enableChangeDataFeed' = 'true')")
    props = lake.table("d.t").properties()
    assert props["k1"] == "a,b"
    assert props["k2"] == "x (y), z"
    assert props["k3"] == "v 1"
    assert props["delta.enableChangeDataFeed"] == "true"
    with pytest.raises(ValueError):
        lake.sql("ALTER TABLE d.t SET TBLPROPERTIES ('k1' = = 'x')")


# -- 4: OR REPLACE clears generated columns on same layout -------------------

def test_create_or_replace_same_layout_clears_generated_cols(
        spark, tmp_path):
    lake = LakehouseSql(spark, str(tmp_path / "lake"))
    # table created through the API with a generated column
    path = os.path.join(lake.root, "d", "t")
    t = ManagedTable(spark, path, generated_cols={"twice": "id * 2"})
    t.overwrite(spark.createDataFrame([(1,)], ["id"]))
    assert "twice" in t.read().columns
    # replace with the SAME (un)partitioned layout and a new schema
    lake.sql("CREATE OR REPLACE TABLE d.t (name STRING)")
    t2 = lake.table("d.t")
    assert t2.generated_cols == {}
    with open(os.path.join(path, "_table_config.json")) as f:
        assert json.load(f)["generated_cols"] == {}
    # a write through the replacement must NOT run the stale expression
    t2.append(spark.createDataFrame([("n",)], ["name"]))
    assert t2.read().columns == ["name"]


# -- 5: column mapping is one-way in the mirror -------------------------------

def _last_mirror_actions(path):
    log = os.path.join(path, "_delta_log")
    vs = sorted(f for f in os.listdir(log) if f.endswith(".json"))
    with open(os.path.join(log, vs[-1])) as f:
        return [json.loads(line) for line in f if line.strip()]


def test_mirror_keeps_column_mapping_after_episode(spark, tmp_base):
    from tb_lakehouse_enhanced_spark.sources.deltaread import read_delta
    t = _mk(spark, f"{tmp_base}/t")
    cmap = t.identity_column_map() + [[None, "c", "int"]]
    t.evolve_schema(cmap, "ALTER TABLE ADD COLUMNS (c int)")
    # next DATA commit materializes — mirror must NOT downgrade
    t.overwrite(t.read().withColumn("c", F.lit(7)))
    acts = _last_mirror_actions(t.path)
    proto = next(a["protocol"] for a in acts if "protocol" in a)
    assert proto["minReaderVersion"] == 2
    assert proto["minWriterVersion"] == 5
    md = next(a["metaData"] for a in acts if "metaData" in a)
    assert md["configuration"]["delta.columnMapping.mode"] == "name"
    assert int(md["configuration"]["delta.columnMapping.maxColumnId"]) >= 4
    schema = json.loads(md["schemaString"])
    for fld in schema["fields"]:
        assert fld["metadata"]["delta.columnMapping.physicalName"] == \
            fld["name"]
    # protocol readers still reproduce the table across the episode
    got = {(r["id"], r["a"], r["b"], r["c"])
           for r in read_delta(spark, t.path).collect()}
    assert got == {(1, 10, 100, 7), (2, 20, 200, 7)}
    # a later APPEND keeps 2/5 too (no silent 1/2 re-emission)
    t.append(spark.createDataFrame([(3, 30, 300, 9)],
                                   ["id", "a", "b", "c"]))
    acts = _last_mirror_actions(t.path)
    proto = next(a["protocol"] for a in acts if "protocol" in a)
    assert (proto["minReaderVersion"], proto["minWriterVersion"]) == (2, 5)
