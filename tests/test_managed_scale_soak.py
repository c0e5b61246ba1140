"""Scale soak for the MANAGED-TABLE tier (VERDICT r11 ask #6).

The LLM tier got its 10x growth pins in r11 (test_llm_scale_soak);
this suite gives the managed-table cost shapes the same treatment.
The discriminating design: the TABLE grows 10x while the TOUCHED set
stays CONSTANT — an O(touched) implementation stays ~flat, while the
O(table) failure mode (a silent materialize, a full-table window, an
unpruned scan) shows up as ~10x.  Primary assertions are STRUCTURAL
(bytes written by the commit, files admitted into the scan, partition
dirs rewritten — deterministic properties of the plan); wall-clock
ratios are secondary with fat margins for host noise.

Pinned properties:
- the evolved-replica UPDATE (ALTER -> MOR debt -> partition-scoped
  DML, the ``evolved_mor_dml`` composition) writes O(touched) bytes
  and stays ~flat in time when only the table grows;
- the stats-pruned range read (``skipping_ingest_read``'s shape)
  admits the same file count into the scan as the table grows 10x;
- the partition-scoped MERGE rewrites only the touched partition
  dirs and writes O(touched) bytes at 10x the table.

Data is derived from ``spark.range`` + hash expressions
(deterministic, generated at full parallelism, zero storage reads) —
the same load-shaping idea as sources/synthetic.py and
test_llm_scale_soak.py.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable

SMALL = 60_000
BIG = 600_000       # 10x — rows ADDED ONLY to untouched partitions

# wall-clock secondary margin: expected ~1x for O(touched); the
# O(table) failure mode lands ~10x.  4x absorbs host burst + the
# O(metadata) component (10x more files to list/link).
WALL_RATIO_BOUND = 4.0


def _base(spark, n):
    """Rows 0..SMALL live in partitions p0..p3; rows beyond SMALL go
    ONLY to partitions p4..p31 — so growing n 10x leaves p0..p3
    byte-identical (the constant touched set)."""
    return spark.range(n).select(
        F.col("id"),
        F.concat(F.lit("p"), F.when(F.col("id") < SMALL,
                                    F.col("id") % 4)
                 .otherwise(4 + F.col("id") % 28)).alias("pt"),
        (F.col("id") * 7 % 1000).alias("qty"))


def _dir_bytes(root):
    total = 0
    for r, _d, fns in os.walk(root):
        for fn in fns:
            total += os.path.getsize(os.path.join(r, fn))
    return total


def _evolved_update(spark, path, n):
    """The evolved_mor_dml composition at size n; returns (seconds of
    the UPDATE step, bytes the UPDATE commit wrote, head meta)."""
    t = ManagedTable(spark, path, partition_by=("pt",))
    t.overwrite(_base(spark, n))
    cmap = t.identity_column_map()
    for e in cmap:
        if e[1] == "qty":
            e[1] = "quantity"
    t.evolve_schema(cmap, "RENAME COLUMN")
    cmap = t.identity_column_map() + [[None, "tag", "string"]]
    t.evolve_schema(cmap, "ADD COLUMNS")
    # constant MOR debt: keys confined to the constant partitions
    t.upsert_mor(
        spark.range(0, 2000).select(
            F.col("id"),
            F.concat(F.lit("p"), F.col("id") % 4).alias("pt"),
            F.lit(555).alias("quantity"), F.lit("u").alias("tag")),
        ("id",))
    t.delete_mor(F.col("id").between(2000, 2999), key_cols=("id",))
    t0 = time.time()
    t.update(F.col("pt") == "p1", {"tag": F.lit("dml")},
             stable_partitions=True)
    wall = time.time() - t0
    head = t._commit(t.current_version())
    written = _dir_bytes(os.path.join(path, head["dir"]))
    return wall, written, head


@pytest.mark.slow
def test_evolved_update_stays_o_touched_at_10x(spark, tmp_base):
    w_small, b_small, h_small = _evolved_update(
        spark, os.path.join(tmp_base, "small"), SMALL)
    w_big, b_big, h_big = _evolved_update(
        spark, os.path.join(tmp_base, "big"), BIG)
    # structural: the commit stayed partition-scoped at both sizes
    assert h_small.get("partitions_rewritten") == ["pt=p1"]
    assert h_big.get("partitions_rewritten") == ["pt=p1"]
    assert h_big.get("column_map"), "map must stay live"
    # structural: the UPDATE wrote ~the same bytes (touched partition
    # is byte-identical across sizes; only its rewrite is materialized
    # to disk — untouched partitions ride as hardlinks, which os.walk
    # double-counts identically at both sizes only if we subtract).
    # Compare the REWRITTEN dirs only: files NOT hardlinked (nlink==1).
    def _fresh_bytes(path, head):
        total = 0
        for r, _d, fns in os.walk(path):
            for fn in fns:
                st = os.stat(os.path.join(r, fn))
                if st.st_nlink == 1:
                    total += st.st_size
        return total
    f_small = _fresh_bytes(os.path.join(
        os.path.join(tmp_base, "small"), h_small["dir"]), h_small)
    f_big = _fresh_bytes(os.path.join(
        os.path.join(tmp_base, "big"), h_big["dir"]), h_big)
    assert f_big <= 3 * max(f_small, 1), (
        f"UPDATE wrote {f_big}B at 10x vs {f_small}B — O(table) cliff")
    # secondary: wall clock ~flat
    assert w_big <= WALL_RATIO_BOUND * max(w_small, 0.5), (
        f"UPDATE took {w_big:.1f}s at 10x vs {w_small:.1f}s")


@pytest.mark.slow
def test_pruned_range_read_admits_constant_files_at_10x(spark,
                                                        tmp_base):
    admitted = {}
    for tag, n in (("small", SMALL), ("big", BIG)):
        t = ManagedTable(spark, os.path.join(tmp_base, f"skip-{tag}"))
        # monotone layout: sorted by id so each file owns an id range
        t.overwrite(spark.range(n).select(
            F.col("id"), (F.col("id") % 97).alias("v"))
            .repartitionByRange(max(8, n // 25_000), "id")
            .sortWithinPartitions("id"))
        t.analyze(("id",))
        df = t.read_where("id", 1000, 3000)
        assert df.count() == 2001
        admitted[tag] = len(df.inputFiles())
    # the matching id-range lives in ~1 file at both sizes; pruning
    # must keep the scan's admitted file set ~constant as the table
    # grows 10x (an unpruned scan admits 10x the files)
    assert admitted["big"] <= admitted["small"] + 2, admitted


@pytest.mark.slow
def test_partition_scoped_merge_writes_o_touched_at_10x(spark,
                                                        tmp_base):
    walls, fresh = {}, {}
    for tag, n in (("small", SMALL), ("big", BIG)):
        path = os.path.join(tmp_base, f"mrg-{tag}")
        t = ManagedTable(spark, path, partition_by=("pt",))
        t.overwrite(_base(spark, n))
        batch = spark.range(0, 3000).select(
            F.col("id"),
            F.concat(F.lit("p"), F.col("id") % 2).alias("pt"),
            F.lit(777).alias("qty"))

        def combine(target_slice, src):
            return (target_slice
                    .join(src.select("id"), ["id"], "left_anti")
                    .unionByName(src))
        t0 = time.time()
        t.merge_into_generic(batch, combine, keys=["id"])
        walls[tag] = time.time() - t0
        head = t._commit(t.current_version())
        assert sorted(head.get("partitions_rewritten") or []) == \
            ["pt=p0", "pt=p1"], head.get("partitions_rewritten")
        total = 0
        for r, _d, fns in os.walk(os.path.join(path, head["dir"])):
            for fn in fns:
                st = os.stat(os.path.join(r, fn))
                if st.st_nlink == 1:
                    total += st.st_size
        fresh[tag] = total
    assert fresh["big"] <= 3 * max(fresh["small"], 1), fresh
    assert walls["big"] <= WALL_RATIO_BOUND * max(walls["small"], 0.5), \
        walls
