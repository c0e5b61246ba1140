"""Model-based property test for the Iceberg mirror (r12).

Random commit sequences — appends, MOR upserts/deletes,
partition-scoped DML, resolving overwrites, restores — drive one
managed table, and after EVERY commit the table reconstructed from
the Iceberg metadata alone (``read_iceberg``) must equal the engine's
own read.  Complements the scripted 14-step history in
test_iceberg_mirror.py the same way the engine's MOR/SCD property
suites complement their example tests: the generator explores
interleavings (delete-then-reappend, upsert-over-upsert,
restore-into-MOR-debt) nobody scripts by hand.

Derandomized (fixed example set per hypothesis version) so CI is
stable; each example builds its own table directory.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.sources.iceberg import read_iceberg
from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable

_OP = st.one_of(
    st.tuples(st.just("append"), st.integers(0, 6)),
    st.tuples(st.just("upsert"), st.integers(0, 6)),
    st.tuples(st.just("delete"), st.integers(0, 6)),
    st.tuples(st.just("update_part"), st.integers(0, 2)),
    st.tuples(st.just("overwrite"), st.integers(0, 0)),
    st.tuples(st.just("compact"), st.integers(0, 0)),
    st.tuples(st.just("restore"), st.integers(0, 7)),
)


def _batch(spark, lo, hi, val=None):
    return spark.range(lo, hi).select(
        F.col("id"),
        F.concat(F.lit("p"), F.col("id") % 3).alias("pt"),
        (F.lit(val).cast("long") if val is not None
         else F.col("id") * 2).alias("val"))


@settings(max_examples=5, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(st.lists(_OP, min_size=3, max_size=6))
def test_random_commit_sequences_roundtrip(spark, ops):
    root = tempfile.mkdtemp(prefix="ice_prop_")
    try:
        t = ManagedTable(spark, os.path.join(root, "t"),
                         partition_by=("pt",))
        t.overwrite(_batch(spark, 0, 30))
        next_lo = 30
        for kind, arg in ops:
            if kind == "append":
                t = t.append(_batch(spark, next_lo, next_lo + 5 + arg))
                next_lo += 5 + arg
            elif kind == "upsert":
                lo = 2 * arg
                t = t.upsert_mor(_batch(spark, lo, lo + 6, 900 + arg),
                                 key_cols=("id",))
            elif kind == "delete":
                lo = 3 * arg
                t = t.delete_mor(F.col("id").between(lo, lo + 4),
                                 key_cols=("id",))
            elif kind == "update_part":
                t = t.update(F.col("pt") == f"p{arg}",
                             {"val": F.lit(-1 - arg)},
                             stable_partitions=True)
            elif kind == "overwrite":
                t = t.overwrite(t.read())
            elif kind == "compact":
                t = t.compact(target_partitions=2)
            elif kind == "restore":
                t = t.restore(arg % (t.current_version() + 1))
            eng = {tuple(r) for r in
                   t.read().select("id", "pt", "val").collect()}
            ice = {tuple(r) for r in
                   read_iceberg(spark, t.path)
                   .select("id", "pt", "val").collect()}
            assert eng == ice, (kind, arg, len(eng), len(ice))
    finally:
        shutil.rmtree(root, ignore_errors=True)
