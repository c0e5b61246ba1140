"""Round-9 table-service SQL: OPTIMIZE ... WHERE (partition-targeted
compaction), VACUUM ... DRY RUN, CREATE/DROP BLOOMFILTER INDEX — the
Databricks/Delta service-statement surface mapped onto the managed
table's maintenance methods."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.sqlfront import LakehouseSql
from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable


@pytest.fixture()
def lake(spark, tmp_path):
    return LakehouseSql(spark, str(tmp_path / "lake"))


def _files_by_part(t: ManagedTable) -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    for rel in t._files_rel(t.current_version()):
        out.setdefault(os.path.dirname(rel), []).append(rel)
    return out


def test_optimize_where_compacts_only_matching_partitions(spark, lake):
    lake.sql("CREATE DATABASE svc")
    lake.sql("CREATE TABLE svc.t (id BIGINT, p INT) PARTITIONED BY (p)")
    for i in range(3):      # small-file debt in both partitions
        lake.sql(f"INSERT INTO svc.t VALUES ({i}, 0), ({i + 10}, 1)")
    t = lake.table("svc.t")
    before = _files_by_part(t)
    assert len(before["p=0"]) >= 3
    want = sorted(r["id"] for r in t.read().collect())
    lake.sql("OPTIMIZE svc.t WHERE p = 0")
    after = _files_by_part(t)
    assert len(after["p=0"]) < len(before["p=0"])      # compacted
    assert sorted(after["p=1"]) == sorted(before["p=1"])  # untouched
    assert sorted(r["id"] for r in t.read().collect()) == want
    # predicate matching nothing: no-op
    v = t.current_version()
    lake.sql("OPTIMIZE svc.t WHERE p = 99")
    assert t.current_version() == v
    # unpartitioned table refuses (Delta's restriction)
    lake.sql("CREATE TABLE svc.u (id BIGINT)")
    lake.sql("INSERT INTO svc.u VALUES (1)")
    with pytest.raises(ValueError, match="partitioned"):
        lake.sql("OPTIMIZE svc.u WHERE id = 1")


def test_vacuum_dry_run_lists_without_deleting(spark, lake):
    lake.sql("CREATE DATABASE svc")
    lake.sql("CREATE TABLE svc.t (id BIGINT)")
    lake.sql("INSERT INTO svc.t VALUES (1)")
    t = lake.table("svc.t")
    t.overwrite(spark.range(5).select(F.col("id")))   # supersedes v0+v1
    t.overwrite(spark.range(7).select(F.col("id")))
    planned = lake.sql("VACUUM svc.t DRY RUN").collect()
    paths = {r["path"] for r in planned}
    assert paths                                       # something to do
    for p in paths:
        assert os.path.exists(p)                       # nothing deleted
    assert t.read().count() == 7
    lake.sql("VACUUM svc.t")                           # the real one
    for p in paths:
        assert not os.path.exists(p)
    assert t.read().count() == 7
    # clean table: empty dry-run plan
    assert lake.sql("VACUUM svc.t DRY RUN").count() == 0


def test_bloomfilter_index_ddl(spark, lake):
    lake.sql("CREATE DATABASE svc")
    lake.sql("CREATE TABLE svc.t (id BIGINT, k STRING)")
    lake.sql("INSERT INTO svc.t SELECT id, concat('k', id) "
             "FROM range(200)")
    lake.sql("CREATE BLOOMFILTER INDEX ON TABLE svc.t FOR COLUMNS"
             "(k OPTIONS (fpp = 0.05, numItems = 256))")
    t = lake.table("svc.t")
    kept = t.bloom_pruned_files("k", "k42")
    assert kept is not None
    got = t.read_where_eq("k", "k42")
    assert [r["id"] for r in got.collect()] == [42]
    # the index maintains itself through ingest (round-9 contract)
    lake.sql("INSERT INTO svc.t VALUES (999, 'needle')")
    assert t.read_where_eq("k", "needle").count() == 1
    # sized from fpp/numItems: m = -n ln p / ln^2 2, word-rounded
    import json as _json
    head_dir = t._commit(t.current_version())["dir"]
    with open(t._bloom_path_for_dir(head_dir, "k")) as f:
        b = _json.load(f)
    assert b["m_bits"] == 1600 and b["k"] == 4
    lake.sql("DROP BLOOMFILTER INDEX ON TABLE svc.t FOR COLUMNS(k)")
    assert t.bloom_pruned_files("k", "k42") is None
    assert t.read_where_eq("k", "k42").count() == 1    # full-scan path
