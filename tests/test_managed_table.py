"""Versioned parquet managed tables: overwrite / DML / time travel."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable


@pytest.fixture()
def mt(spark, tmp_base):
    t = ManagedTable(spark, f"{tmp_base}/t")
    t.overwrite(spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)], ["id", "k", "v"]))
    return t


def test_overwrite_bumps_version(spark, mt):
    assert mt.current_version() == 0
    mt.overwrite(mt.read().filter("id < 3"))
    assert mt.current_version() == 1
    assert mt.read().count() == 2


def test_time_travel(spark, mt):
    mt.overwrite(mt.read().filter("id = 1"))
    assert mt.read(version=0).count() == 3
    assert mt.read().count() == 1


def test_update_where(spark, mt):
    mt.update(F.col("k") == "a", {"v": F.col("v") + 1, "k": F.lit("z")})
    rows = {r["id"]: (r["k"], r["v"]) for r in mt.read().collect()}
    assert rows == {1: ("z", 11.0), 2: ("b", 20.0), 3: ("z", 31.0)}


def test_delete_where(spark, mt):
    mt.delete(F.col("k") == "a")
    assert [r["id"] for r in mt.read().collect()] == [2]


def test_missing_table_raises(spark, tmp_base):
    t = ManagedTable(spark, f"{tmp_base}/none")
    assert not t.exists()
    with pytest.raises(FileNotFoundError):
        t.read()
