"""Catalog DDL: namespaces, managed saveAsTable, informational constraints."""

from __future__ import annotations

import pytest

from tb_lakehouse_enhanced_spark import catalog


@pytest.fixture(scope="module", autouse=True)
def clean(spark):
    catalog.reset(spark)
    catalog.bootstrap(spark)
    yield
    catalog.reset(spark)


def test_bootstrap_creates_layers(spark):
    dbs = {d.name for d in spark.catalog.listDatabases()}
    assert {"bronze", "silver", "gold"} <= dbs


def test_save_and_read_managed_table(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    catalog.save_table(df, "bronze.t1", constraints={"primary_key": "id"})
    assert spark.table("bronze.t1").count() == 2
    props = spark.sql("SHOW TBLPROPERTIES bronze.t1").collect()
    assert any(p["key"] == "primary_key" and p["value"] == "id" for p in props)


def test_fk_validation(spark):
    catalog.save_table(spark.createDataFrame([(1,), (2,)], ["k"]), "gold.dim")
    catalog.save_table(spark.createDataFrame([(1, 10), (2, 20)], ["k", "v"]),
                       "gold.fact_ok")
    catalog.save_table(spark.createDataFrame([(1, 10), (9, 90)], ["k", "v"]),
                       "gold.fact_bad")
    assert catalog.validate_fk(spark, "gold.fact_ok", "k", "gold.dim", "k") == 0
    assert catalog.validate_fk(spark, "gold.fact_bad", "k", "gold.dim", "k") == 1


def test_drop_cascade(spark):
    catalog.save_table(spark.createDataFrame([(1,)], ["x"]), "silver.tmp")
    catalog.reset(spark, layers=("silver",))
    dbs = {d.name for d in spark.catalog.listDatabases()}
    assert "silver" not in dbs
    catalog.bootstrap(spark)


def test_validate_unique(spark, tmp_base):
    from tb_lakehouse_enhanced_spark.catalog import validate_unique

    import shutil

    spark.sql("CREATE DATABASE IF NOT EXISTS tvu")
    for t in ("ok", "dup"):
        # a previous session's warehouse dir can survive its (in-memory)
        # metastore entry — drop both the table and the orphan location
        spark.sql(f"DROP TABLE IF EXISTS tvu.{t}")
        loc = spark.sql("DESCRIBE DATABASE tvu").filter(
            "info_name = 'Location'").collect()[0]["info_value"]
        shutil.rmtree(f"{loc.removeprefix('file:')}/{t}",
                      ignore_errors=True)
    spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string") \
        .write.mode("overwrite").saveAsTable("tvu.ok")
    spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "k long, v string") \
        .write.mode("overwrite").saveAsTable("tvu.dup")
    assert validate_unique(spark, "tvu.ok", ["k"]) == 0
    assert validate_unique(spark, "tvu.dup", ["k"]) == 1
    assert validate_unique(spark, "tvu.dup", ["k", "v"]) == 0


def test_table_checksum_order_insensitive_and_sensitive_to_change(spark):
    from tb_lakehouse_enhanced_spark.catalog import table_checksum

    a = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, None)], "k long, v string")
    base = table_checksum(a, ["k", "v"]).collect()[0]
    shuffled = table_checksum(a.repartition(5).sortWithinPartitions("v"),
                              ["k", "v"]).collect()[0]
    assert (base["n_rows"], base["checksum"]) == \
        (shuffled["n_rows"], shuffled["checksum"])

    changed = spark.createDataFrame(
        [(1, "x"), (2, "z"), (3, None)], "k long, v string")
    got = table_checksum(changed, ["k", "v"]).collect()[0]
    assert got["checksum"] != base["checksum"]


def test_identity_column_continues_across_loads(spark):
    """GENERATED AS IDENTITY DDL surface (reference 01_Init.py:59):
    successive loads continue the sequence past the table's max —
    ids are dense 1..N on first load and never reused afterwards,
    including across an overwrite (Delta's identity high-water mark)."""
    df1 = spark.createDataFrame(
        [("a",), ("b",), ("c",)], ["name"])
    catalog.save_table(df1, "silver.dim_ident", identity_col="sk",
                       identity_order_cols=["name"])
    got1 = {r["name"]: r["sk"] for r in spark.table("silver.dim_ident").collect()}
    assert got1 == {"a": 1, "b": 2, "c": 3}
    # append continues past the max
    df2 = spark.createDataFrame([("d",), ("e",)], ["name"])
    catalog.save_table(df2, "silver.dim_ident", identity_col="sk",
                       identity_order_cols=["name"], mode="append")
    got2 = {r["name"]: r["sk"] for r in spark.table("silver.dim_ident").collect()}
    assert got2 == {"a": 1, "b": 2, "c": 3, "d": 4, "e": 5}
    # overwrite also never reuses ids (high-water mark semantics)
    df3 = spark.createDataFrame([("z",)], ["name"])
    catalog.save_table(df3, "silver.dim_ident", identity_col="sk",
                       identity_order_cols=["name"], mode="overwrite")
    got3 = {r["name"]: r["sk"] for r in spark.table("silver.dim_ident").collect()}
    assert got3 == {"z": 6}
    # a df that already carries the column keeps its values
    df4 = spark.createDataFrame([(100, "q")], ["sk", "name"])
    catalog.save_table(df4, "silver.dim_ident", identity_col="sk",
                       identity_order_cols=["name"], mode="append")
    assert {r["sk"] for r in spark.table("silver.dim_ident").collect()} == {6, 100}
    # identity recorded as a table property
    props = {r["key"]: r["value"] for r in spark.sql(
        "SHOW TBLPROPERTIES silver.dim_ident").collect()}
    assert props.get("identity_column") == "sk"
    # missing order cols is a loud error
    with pytest.raises(ValueError):
        catalog.save_table(df1, "silver.dim_ident2", identity_col="sk")


def test_identity_start_with_increment_by_catalog(spark):
    """save_table's identity honors (START WITH s INCREMENT BY i):
    generated ids land on the start + k*step domain past the
    watermark, a seed outside the domain never drags generation
    before START WITH, and negative steps track the MIN downward."""
    df1 = spark.createDataFrame([("a",), ("b",)], ["name"])
    catalog.save_table(df1, "silver.dim_sw", identity_col="sk",
                       identity_order_cols=["name"],
                       identity_start=100, identity_step=10)
    got = {r["name"]: r["sk"]
           for r in spark.table("silver.dim_sw").collect()}
    assert got == {"a": 100, "b": 110}
    # append continues the domain past the max
    catalog.save_table(spark.createDataFrame([("c",)], ["name"]),
                       "silver.dim_sw", identity_col="sk",
                       identity_order_cols=["name"],
                       identity_start=100, identity_step=10,
                       mode="append")
    got = {r["name"]: r["sk"]
           for r in spark.table("silver.dim_sw").collect()}
    assert got["c"] == 120
    # negative step: MIN-tracking, floor at START WITH
    catalog.save_table(
        spark.createDataFrame([("x",), ("y",)], ["name"]),
        "silver.dim_neg", identity_col="sk",
        identity_order_cols=["name"],
        identity_start=0, identity_step=-5)
    got = {r["name"]: r["sk"]
           for r in spark.table("silver.dim_neg").collect()}
    assert got == {"x": 0, "y": -5}
    import pytest as _pytest
    with _pytest.raises(ValueError, match="non-zero"):
        catalog.save_table(df1, "silver.bad", identity_col="sk",
                           identity_order_cols=["name"],
                           identity_step=0)
