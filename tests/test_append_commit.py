"""LOG-NATIVE O(batch) append commits (ManagedTable.append) and the
statement paths riding them (INSERT INTO, COPY INTO with the
cumulative manifest checkpoint), plus the round-8 transactional
CREATE OR REPLACE and merge_chain guards.

The reference's ingest surface (reference
notebooks/12_ETL_Bronze_PySpark.py:61-128) refreshes bronze in full;
COPY INTO / INSERT INTO exist precisely to be incremental — at 100 TB
an ingest batch must cost O(|batch|), not O(table), in BYTES and in
METADATA operations. The inode assertions here pin the round-9 cost
shape: an append commit creates ONLY its batch's files (the commit
log is the source of truth for the live file set — Delta's model);
no pre-existing file is copied, rewritten, or even hardlinked
forward, so inode/dentry count never grows with versions × files.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.sqlfront import LakehouseSql
from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable


@pytest.fixture()
def lake(spark, tmp_path):
    return LakehouseSql(spark, str(tmp_path / "lake"))


def _inodes(vdir: str) -> dict[str, int]:
    out = {}
    for root, _dirs, fns in os.walk(vdir):
        for fn in fns:
            if fn.endswith(".parquet"):
                full = os.path.join(root, fn)
                out[os.path.relpath(full, vdir)] = os.stat(full).st_ino
    return out


def _assert_log_native_append(t: ManagedTable, new_v: int):
    """The append commit is log-native: its version dir holds EXACTLY
    the batch's files (the writer-recorded ``added_files``), the
    commit records ``live_base`` so readers resolve the live set from
    the log, and NO pre-existing live file gained a link (st_nlink
    stays 1 — the metadata plane is O(batch), not O(live files))."""
    meta = t._commit(new_v)
    assert meta.get("live_base") == new_v - 1
    vdir = t._version_dir(new_v)
    in_dir = set(_inodes(vdir)) if os.path.isdir(vdir) else set()
    assert in_dir == set(meta["added_files"])
    for rel, full in t._live_files(new_v).items():
        if not rel.startswith(meta["dir"] + "/"):
            assert os.stat(full).st_nlink == 1, \
                f"{rel} was linked forward (hardlink forest)"


# --------------------------------------------------------- append core ---

def test_append_unpartitioned_is_log_native(spark, tmp_base):
    t = ManagedTable(spark, os.path.join(tmp_base, "t"))
    t.overwrite(spark.range(100).select(
        F.col("id"), (F.col("id") * 2).alias("v")))
    t.append(spark.range(100, 120).select(
        F.col("id"), (F.col("id") * 2).alias("v")))
    _assert_log_native_append(t, 1)
    assert t.read().count() == 120
    assert t.read().agg(F.sum("v")).collect()[0][0] == \
        sum(2 * i for i in range(120))
    # time travel still sees the pre-append snapshot
    assert t.read(version=0).count() == 100
    # append chains stack without touching earlier versions' files
    t.append(spark.range(120, 125).select(
        F.col("id"), (F.col("id") * 2).alias("v")))
    _assert_log_native_append(t, 2)
    assert t.read().count() == 125
    assert t.read(version=1).count() == 120


def test_append_partitioned_new_and_existing_partitions(spark, tmp_base):
    t = ManagedTable(spark, os.path.join(tmp_base, "t"),
                     partition_by=("p",))
    t.overwrite(spark.range(50).select(
        F.col("id"), (F.col("id") % 2).alias("p")))
    # batch lands in existing partition 1 and NEW partition 7
    t.append(spark.createDataFrame(
        [(1000, 1), (1001, 7)], "id long, p long"))
    _assert_log_native_append(t, 1)
    got = t.read()
    assert got.count() == 52
    assert got.filter(F.col("p") == 7).count() == 1
    # untouched partition 0 has NO presence in the new version dir —
    # the live set resolves its files from v0 through the commit log
    assert not os.path.isdir(os.path.join(
        t._version_dir(1), "p=0"))
    assert got.filter(F.col("p") == 0).count() == 25
    # partition values survive the multi-dir scan
    assert {r["p"] for r in got.select("p").distinct().collect()} == \
        {0, 1, 7}


def test_append_validates_new_rows_against_check_constraints(
        spark, tmp_base):
    t = ManagedTable(spark, os.path.join(tmp_base, "t"))
    t.overwrite(spark.range(10).select(F.col("id").alias("v")))
    t.add_constraint("pos", "v >= 0")
    with pytest.raises(Exception):
        t.append(spark.createDataFrame([(-5,)], "v long"))
    # the failed append never moved the pointer
    assert t.current_version() == 0 and t.read().count() == 10
    t.append(spark.createDataFrame([(99,)], "v long"))
    assert t.read().count() == 11


def test_append_on_mor_parent_stays_o_batch(spark, tmp_base):
    """Round 10: an append onto a tombstone-carrying head no longer
    materializes — the batch's rows resolve at THIS commit's sequence
    (path-parsed from the v{N}-a batch dir), outranking the older
    tombstone, so the re-inserted key survives with only the batch's
    files written and the MOR debt carried forward in metadata
    (pre-r10 this append rewrote the whole table to dodge the
    tombstone; see test_mor_appends.py for the full matrix)."""
    t = ManagedTable(spark, os.path.join(tmp_base, "t"))
    t.overwrite(spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, s string"))
    t.delete_mor(F.col("k") == 2, key_cols=("k",))
    t.append(spark.createDataFrame([(2, "b2")], "k long, s string"))
    got = {(r["k"], r["s"]) for r in t.read().collect()}
    assert got == {(1, "a"), (2, "b2"), (3, "c")}
    # O(batch): an append commit carrying the tombstone forward
    meta = t._commit(t.current_version())
    assert meta.get("added_files") and meta.get("tombstones")
    assert meta["live_base"] == t.current_version() - 1


def test_partition_scoped_delete_emptying_touched_partitions(
        spark, tmp_base):
    """ADVICE r7: a DELETE that empties every touched partition while
    others survive must not park a root-level schema file next to the
    hardlinked partition dirs (_ensure_readable now runs AFTER the
    hardlink loop, sees the linked parquet, and skips parking)."""
    t = ManagedTable(spark, os.path.join(tmp_base, "t"),
                     partition_by=("p",))
    t.overwrite(spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1), (4, 1)], "id long, p long"))
    t.delete(F.col("p") == 0)
    vdir = t._version_dir(t.current_version())
    root_parquet = [f for f in os.listdir(vdir)
                    if f.endswith(".parquet")]
    assert root_parquet == [], "parked schema file next to partitions"
    got = t.read()
    assert {r["id"] for r in got.collect()} == {3, 4}
    assert got.columns == ["id", "p"]


# ------------------------------------------------------ INSERT / COPY ---

DDL = """
CREATE TABLE stg.events (
  id BIGINT GENERATED BY DEFAULT AS IDENTITY,
  k INT,
  v STRING
)"""


def test_insert_into_is_append_commit_with_identity(spark, lake):
    lake.sql("CREATE DATABASE stg")
    lake.sql(DDL)
    lake.sql("INSERT INTO stg.events (k, v) VALUES (1, 'a'), (2, 'b')")
    t = lake.table("stg.events")
    v_first = t.current_version()
    lake.sql("INSERT INTO stg.events (k, v) VALUES (3, 'c')")
    assert t._commit(t.current_version())["op"] == "INSERT"
    _assert_log_native_append(t, t.current_version())
    rows = {(r["id"], r["k"]) for r in t.read().collect()}
    # identity continues past the first batch's high-water mark
    assert {k for _, k in rows} == {1, 2, 3}
    ids = sorted(i for i, _ in rows)
    assert ids == [1, 2, 3]


def test_insert_overwrite_identity_watermark_never_regresses(
        spark, lake):
    """ADVICE r7: Delta's identity high-water mark is table metadata
    and never regresses across INSERT OVERWRITE — generated ids after
    the overwrite continue past the PRE-overwrite maximum instead of
    restarting at START WITH and re-issuing values."""
    lake.sql("CREATE DATABASE stg")
    lake.sql(DDL)
    lake.sql("INSERT INTO stg.events (k, v) VALUES (1, 'a'), (2, 'b')")
    lake.sql("INSERT OVERWRITE stg.events (k, v) VALUES (9, 'z')")
    got = lake.table("stg.events").read().collect()
    assert len(got) == 1 and got[0]["id"] == 3


def _write_copy_batch(spark, d, lo, hi):
    spark.range(lo, hi).select(
        F.col("id").cast("int").alias("k"),
        F.col("id").cast("string").alias("v")) \
        .coalesce(1).write.mode("overwrite").parquet(d)


def test_copy_into_appends_and_checkpoints_manifest(spark, lake,
                                                   tmp_path):
    lake.sql("CREATE DATABASE stg")
    lake.sql("CREATE TABLE stg.ing (k INT, v STRING)")
    d1, d2 = str(tmp_path / "b1"), str(tmp_path / "b2")
    _write_copy_batch(spark, d1, 0, 10)
    lake.sql(f"COPY INTO stg.ing FROM '{d1}' FILEFORMAT = PARQUET")
    t = lake.table("stg.ing")
    v1 = t.current_version()
    # second COPY of a NEW dir: O(batch) — log-native append commit
    _write_copy_batch(spark, d2, 10, 15)
    lake.sql(f"COPY INTO stg.ing FROM '{d2}' FILEFORMAT = PARQUET")
    assert t.current_version() == v1 + 1
    _assert_log_native_append(t, t.current_version())
    assert t.read().count() == 15
    # re-COPY of both dirs: no new files -> no commit
    v2 = t.current_version()
    lake.sql(f"COPY INTO stg.ing FROM '{d1}' FILEFORMAT = PARQUET")
    lake.sql(f"COPY INTO stg.ing FROM '{d2}' FILEFORMAT = PARQUET")
    assert t.current_version() == v2 and t.read().count() == 15
    # the newest COPY commit carries the CUMULATIVE manifest
    manifest = t._commit(v2)["copy_manifest"]
    assert len(manifest) == 2  # one file per coalesced batch
    assert all(p.startswith(str(tmp_path)) for p in manifest)


def test_copy_manifest_reconstruction_is_o1_commit_reads(
        spark, lake, tmp_path, monkeypatch):
    """ADVICE/VERDICT r7: manifest reconstruction must stop at the
    newest checkpoint, not walk every commit back to v0."""
    lake.sql("CREATE DATABASE stg")
    lake.sql("CREATE TABLE stg.ing (k INT, v STRING)")
    d1 = str(tmp_path / "b1")
    _write_copy_batch(spark, d1, 0, 10)
    lake.sql(f"COPY INTO stg.ing FROM '{d1}' FILEFORMAT = PARQUET")
    # pile up unrelated commits after the COPY
    for i in range(5):
        lake.sql(f"INSERT INTO stg.ing (k, v) VALUES ({100 + i}, 'x')")
    reads = []
    orig = ManagedTable._commit

    def counting(self, v):
        reads.append(v)
        return orig(self, v)

    monkeypatch.setattr(ManagedTable, "_commit", counting)
    assert LakehouseSql._copy_manifest(lake.table("stg.ing")) == {
        os.path.join(d1, f) for f in os.listdir(d1)
        if f.endswith(".parquet")}
    # walked the 5 INSERT commits + the checkpointed COPY, NOT v0/v1
    assert len(reads) == 6


def test_copy_into_force_keeps_manifest_cumulative(spark, lake,
                                                   tmp_path):
    lake.sql("CREATE DATABASE stg")
    lake.sql("CREATE TABLE stg.ing (k INT, v STRING)")
    d1 = str(tmp_path / "b1")
    _write_copy_batch(spark, d1, 0, 5)
    lake.sql(f"COPY INTO stg.ing FROM '{d1}' FILEFORMAT = PARQUET")
    lake.sql(f"COPY INTO stg.ing FROM '{d1}' FILEFORMAT = PARQUET "
             f"COPY_OPTIONS ('force' = 'true')")
    t = lake.table("stg.ing")
    assert t.read().count() == 10  # force re-loaded the batch
    # a later NON-force COPY still sees the full loaded set -> no-op
    v = t.current_version()
    lake.sql(f"COPY INTO stg.ing FROM '{d1}' FILEFORMAT = PARQUET")
    assert t.current_version() == v


# ------------------------------------- CREATE OR REPLACE transactional ---

def test_create_or_replace_new_layout_preserves_history(spark, lake):
    lake.sql("CREATE DATABASE stg")
    lake.sql("CREATE TABLE stg.t (k INT, p INT)")
    lake.sql("INSERT INTO stg.t VALUES (1, 0), (2, 1)")
    t = lake.table("stg.t")
    v_before = t.current_version()
    lake.sql("CREATE OR REPLACE TABLE stg.t (k INT, p INT) "
             "PARTITIONED BY (p)")
    t2 = lake.table("stg.t")
    assert tuple(t2.partition_by) == ("p",)
    assert t2.read().count() == 0
    # history survived the replace: the old snapshot still reads
    assert t2.current_version() == v_before + 1
    assert {(r["k"], r["p"]) for r in
            t2.read(version=v_before).collect()} == {(1, 0), (2, 1)}


def test_create_or_replace_failing_ctas_leaves_table_intact(
        spark, lake):
    """ADVICE r7 (medium): a failing replacement CTAS must not destroy
    the existing table — the old rmtree-first flow left nothing."""
    lake.sql("CREATE DATABASE stg")
    lake.sql("CREATE TABLE stg.t (k INT, p INT)")
    lake.sql("INSERT INTO stg.t VALUES (1, 0)")
    with pytest.raises(Exception):
        lake.sql("CREATE OR REPLACE TABLE stg.t PARTITIONED BY (p) "
                 "AS SELECT k, p, assert_true(false) AS boom "
                 "FROM stg.t")
    t = lake.table("stg.t")
    assert tuple(t.partition_by or ()) == ()  # layout rolled back
    assert {(r["k"], r["p"]) for r in t.read().collect()} == {(1, 0)}
    # and the table still accepts writes under the OLD layout
    lake.sql("INSERT INTO stg.t VALUES (2, 1)")
    assert t.read().count() == 2


def test_create_or_replace_drops_stale_identity_and_constraints(
        spark, lake):
    lake.sql("CREATE DATABASE stg")
    lake.sql("CREATE TABLE stg.t "
             "(id BIGINT GENERATED ALWAYS AS IDENTITY, k INT NOT NULL)")
    lake.sql("CREATE OR REPLACE TABLE stg.t (id BIGINT, k INT)")
    # the replaced definition has no identity: explicit ids insert fine,
    # and the old NOT NULL constraint is gone
    lake.sql("INSERT INTO stg.t VALUES (42, NULL)")
    got = lake.table("stg.t").read().collect()
    assert len(got) == 1 and got[0]["id"] == 42 and got[0]["k"] is None


# ---------------------------------------------------- merge_chain guards ---

def test_merge_chain_self_referencing_source_runs_sequentially(
        spark, lake):
    """ADVICE r7 (medium): a chained MERGE whose USING source reads the
    chain's target must NOT fuse — each statement's source has to see
    the previous statement's committed result, so the chain falls back
    to statement-by-statement execution."""
    lake.sql("CREATE DATABASE stg")
    lake.sql("CREATE TABLE stg.acc (k INT, n INT)")
    lake.sql("INSERT INTO stg.acc VALUES (1, 1)")
    stmt = """
MERGE INTO stg.acc AS tgt
USING (SELECT k, SUM(n) AS n FROM stg.acc GROUP BY k) AS src
ON tgt.k = src.k
WHEN MATCHED THEN UPDATE SET tgt.n = tgt.n + src.n
"""
    lake.merge_chain([stmt, stmt])
    got = lake.table("stg.acc").read().collect()
    # sequential: 1 -> 2 (src saw 1) -> 4 (src saw 2); a fused run
    # would compute 1 -> 3 (both sources reading the pre-chain 1)
    assert got[0]["n"] == 4
    assert lake.table("stg.acc").current_version() >= 3


def test_merge_chain_fused_path_rejects_always_identity(spark, lake):
    """ADVICE r7 (low): the fused close+insert and empty-target fast
    paths must reject explicit GENERATED ALWAYS identity values
    exactly as the sequential path does."""
    lake.sql("CREATE DATABASE stg")
    lake.sql("CREATE TABLE stg.d "
             "(id BIGINT GENERATED ALWAYS AS IDENTITY, k INT, v STRING)")
    spark.createDataFrame([(1, "a")], "k int, v string") \
        .createOrReplaceTempView("chain_src")
    ins = """
MERGE INTO stg.d AS tgt USING chain_src AS src ON tgt.k = src.k
WHEN NOT MATCHED THEN INSERT (id, k, v) VALUES (99, src.k, src.v)
"""
    close = """
MERGE INTO stg.d AS tgt USING chain_src AS src ON tgt.k = src.k
WHEN MATCHED THEN UPDATE SET tgt.v = src.v
"""
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        lake.merge_chain([close, ins])   # empty-target fast path


# ------------------------------------------------------------- views ---

def test_create_temp_view_statement(spark, lake):
    lake.sql("CREATE DATABASE stg")
    lake.sql("CREATE TABLE stg.t (k INT, v STRING)")
    lake.sql("INSERT INTO stg.t VALUES (1, 'a'), (2, 'b')")
    lake.sql("CREATE OR REPLACE TEMP VIEW tv AS "
             "SELECT k, upper(v) AS vv FROM stg.t WHERE k > 1")
    got = lake.sql("SELECT * FROM tv").collect()
    assert [(r["k"], r["vv"]) for r in got] == [(2, "B")]
    # MERGE USING the SQL-created temp view
    lake.sql("CREATE TABLE stg.d (k INT, vv STRING)")
    lake.sql("""
MERGE INTO stg.d AS tgt USING tv AS src ON tgt.k = src.k
WHEN NOT MATCHED THEN INSERT *
""")
    assert lake.table("stg.d").read().count() == 1


def test_persistent_view_survives_restart(spark, lake):
    lake.sql("CREATE DATABASE stg")
    lake.sql("CREATE TABLE stg.t (k INT, v STRING)")
    lake.sql("INSERT INTO stg.t VALUES (1, 'a'), (2, 'b')")
    lake.sql("CREATE VIEW stg.big AS SELECT k, v FROM stg.t "
             "WHERE k >= 2")
    # a NEW front-end over the same root (restart) resolves the view
    lake2 = LakehouseSql(spark, lake.root)
    got = lake2.sql("SELECT v FROM stg.big ORDER BY v").collect()
    assert [r["v"] for r in got] == ["b"]
    # views track the CURRENT table state, not a snapshot
    lake2.sql("INSERT INTO stg.t VALUES (3, 'c')")
    assert lake2.sql("SELECT count(*) AS n FROM stg.big") \
        .collect()[0]["n"] == 2
    # MERGE USING a persistent view
    lake2.sql("CREATE TABLE stg.d2 (k INT, v STRING)")
    lake2.sql("""
MERGE INTO stg.d2 AS tgt USING stg.big AS src ON tgt.k = src.k
WHEN NOT MATCHED THEN INSERT *
""")
    assert lake2.table("stg.d2").read().count() == 2
    # DROP VIEW removes it for every future session
    lake2.sql("DROP VIEW stg.big")
    with pytest.raises(Exception):
        LakehouseSql(spark, lake.root).sql("SELECT * FROM stg.big")


def test_view_name_collisions_and_bare_resolution(spark, lake):
    lake.sql("CREATE DATABASE stg")
    lake.sql("CREATE TABLE stg.t (k INT)")
    lake.sql("INSERT INTO stg.t VALUES (1)")
    with pytest.raises(ValueError, match="managed TABLE"):
        lake.sql("CREATE VIEW stg.t AS SELECT 1 AS x")
    lake.sql("CREATE VIEW stg.w AS SELECT k * 2 AS kk FROM stg.t")
    with pytest.raises(ValueError, match="view exists"):
        lake.sql("CREATE VIEW stg.w AS SELECT 1 AS x")
    # bare-name resolution under USE SCHEMA
    lake.sql("USE SCHEMA stg")
    assert lake.sql("SELECT kk FROM w").collect()[0]["kk"] == 2


def test_copy_into_csv_and_pattern(spark, lake, tmp_path):
    """COPY INTO FILEFORMAT = CSV (header on by default; headerless
    positional with FORMAT_OPTIONS) and the PATTERN glob filter —
    Databricks' ingest surface beyond parquet/json."""
    lake.sql("CREATE DATABASE stg")
    lake.sql("CREATE TABLE stg.c (k INT, v STRING)")
    d = tmp_path / "csv"
    d.mkdir()
    (d / "a_part1.csv").write_text("k,v\n1,x\n2,y\n")
    (d / "a_part2.csv").write_text("k,v\n3,z\n")
    (d / "skipme.csv").write_text("k,v\n99,nope\n")
    lake.sql(f"COPY INTO stg.c FROM '{d}' FILEFORMAT = CSV "
             f"PATTERN = 'a_*.csv'")
    got = {(r["k"], r["v"])
           for r in lake.table("stg.c").read().collect()}
    assert got == {(1, "x"), (2, "y"), (3, "z")}
    # re-COPY with a WIDER pattern loads only the not-yet-loaded file
    lake.sql(f"COPY INTO stg.c FROM '{d}' FILEFORMAT = CSV")
    assert lake.table("stg.c").read().count() == 4
    # headerless positional CSV
    lake.sql("CREATE TABLE stg.c2 (k INT, v STRING)")
    d2 = tmp_path / "csv2"
    d2.mkdir()
    (d2 / "b.csv").write_text("7,h\n8,i\n")
    lake.sql(f"COPY INTO stg.c2 FROM '{d2}' FILEFORMAT = CSV "
             f"FORMAT_OPTIONS ('header' = 'false')")
    assert {(r["k"], r["v"])
            for r in lake.table("stg.c2").read().collect()} \
        == {(7, "h"), (8, "i")}


def test_create_or_replace_to_unpartitioned(spark, lake):
    """Replacing a partitioned table with a definition that has no
    PARTITIONED BY clause yields an UNPARTITIONED table (Delta
    semantics: the replacement's layout wins), history preserved."""
    lake.sql("CREATE DATABASE stg")
    lake.sql("CREATE TABLE stg.t (k INT, p INT) PARTITIONED BY (p)")
    lake.sql("INSERT INTO stg.t VALUES (1, 0)")
    v_before = lake.table("stg.t").current_version()
    lake.sql("CREATE OR REPLACE TABLE stg.t (k INT)")
    t = lake.table("stg.t")
    assert tuple(t.partition_by or ()) == ()
    lake.sql("INSERT INTO stg.t VALUES (5)")
    assert {r["k"] for r in t.read().collect()} == {5}
    # pre-replace snapshot still time-travels (with its old layout)
    old = t.read(version=v_before)
    assert {(r["k"], r["p"]) for r in old.collect()} == {(1, 0)}
