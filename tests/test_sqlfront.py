"""SQL-string DML front-end: the reference's statement texts against
managed tables (sqlfront.py).

The statement texts here are the reference's user surface, quoted as
behavior specs (reference notebooks/22_ETL_Silver_PySpark.py:62-101,
23_Testing_SCD2.py:40-50, 01_Init.py:265-321) with columns renamed to
the driver test tables; the assertion is that executing them through
``LakehouseSql`` reproduces the hand-built operators' state exactly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.sqlfront import (
    LakehouseSql, MergeCardinalityError, apply_merge, parse_delete,
    parse_insert, parse_merge, parse_update,
)

T0 = "2024-01-01 00:00:00"
T1 = "2024-01-02 00:00:00"

SCD2_CLOSE = """
MERGE INTO silver.orders AS tgt
USING src_orders AS src
ON tgt.o_orderkey = src.o_orderkey AND tgt._tf_valid_to IS NULL
WHEN MATCHED AND (
       tgt.o_custkey != src.o_custkey OR
       tgt.o_orderstatus != src.o_orderstatus OR
       tgt.o_totalprice != src.o_totalprice
) THEN UPDATE SET
    tgt._tf_valid_to = current_timestamp(),
    tgt._tf_update_date = current_timestamp()
WHEN NOT MATCHED BY SOURCE AND tgt._tf_valid_to IS NULL THEN
  UPDATE SET
    tgt._tf_valid_to = current_timestamp(),
    tgt._tf_update_date = current_timestamp()
"""

SCD2_INSERT = """
MERGE INTO silver.orders AS tgt
USING src_orders AS src
ON tgt.o_orderkey = src.o_orderkey AND tgt._tf_valid_to IS NULL
WHEN NOT MATCHED THEN
  INSERT (
    o_orderkey, o_custkey, o_orderstatus, o_totalprice,
    _tf_valid_from, _tf_valid_to, _tf_create_date, _tf_update_date
  )
  VALUES (
    src.o_orderkey, src.o_custkey, src.o_orderstatus, src.o_totalprice,
    current_timestamp(), NULL, current_timestamp(), current_timestamp()
  )
"""


def test_parse_merge_reference_scd2_shape():
    spec = parse_merge(SCD2_CLOSE)
    assert spec.target == "silver.orders"
    assert (spec.t_alias, spec.s_alias) == ("tgt", "src")
    assert spec.on == \
        "tgt.o_orderkey = src.o_orderkey AND tgt._tf_valid_to IS NULL"
    assert [c.kind for c in spec.clauses] == ["matched_update",
                                              "nmbs_update"]
    assert "tgt.o_custkey != src.o_custkey" in spec.clauses[0].cond
    assert spec.clauses[0].assigns == {
        "_tf_valid_to": "current_timestamp()",
        "_tf_update_date": "current_timestamp()"}
    assert spec.clauses[1].cond == "tgt._tf_valid_to IS NULL"

    ins = parse_merge(SCD2_INSERT)
    (cl,) = ins.clauses
    assert cl.kind == "insert" and cl.cond is None
    assert cl.insert_cols[:2] == ("o_orderkey", "o_custkey")
    assert cl.insert_vals[4] == "current_timestamp()"
    assert len(cl.insert_cols) == len(cl.insert_vals) == 8


def test_parse_case_then_inside_condition():
    """A CASE..THEN..END inside a WHEN condition must not be mistaken
    for the clause's own THEN."""
    spec = parse_merge("""
MERGE INTO db.t AS tgt USING v AS src ON tgt.k = src.k
WHEN MATCHED AND (CASE WHEN src.x > 1 THEN 1 ELSE 0 END) = 1
THEN UPDATE SET tgt.v = src.v
""")
    (cl,) = spec.clauses
    assert cl.kind == "matched_update"
    assert cl.cond == "(CASE WHEN src.x > 1 THEN 1 ELSE 0 END) = 1"
    assert cl.assigns == {"v": "src.v"}


def test_parse_update_delete_insert_shapes():
    # reference 23_Testing_SCD2.py:40-44
    tbl, assigns, where = parse_update("""
UPDATE address
SET PostalCode = '12345', ModifiedDate = current_timestamp()
WHERE City = 'Bothell'
""")
    assert tbl == "address"
    assert assigns == {"PostalCode": "'12345'",
                       "ModifiedDate": "current_timestamp()"}
    assert where == "City = 'Bothell'"
    # reference 23:50
    assert parse_delete("DELETE FROM address WHERE City = 'Surrey'") == \
        ("address", "City = 'Surrey'")
    tbl, cols, sel, ow = parse_insert(
        "INSERT INTO gold.dim_customer (cust_id, cust_name) "
        "VALUES (-9, 'N/A')")
    assert ow is False
    assert tbl == "gold.dim_customer" and cols == ("cust_id", "cust_name")
    assert sel.startswith("SELECT * FROM (VALUES")


@pytest.fixture()
def lake(spark, tmp_path):
    return LakehouseSql(spark, str(tmp_path / "lake"))


def _orders_src(orders, batch):
    base = orders.select("o_orderkey", "o_custkey", "o_orderstatus",
                         "o_totalprice")
    if batch == 0:
        return base.filter(F.col("o_orderkey") % 10 != 7)
    return (base.filter(F.col("o_orderkey") % 10 != 3)
            .withColumn("o_totalprice",
                        F.col("o_totalprice")
                        + F.when(F.col("o_orderkey") % 7 == 0,
                                 F.lit(100.0)).otherwise(F.lit(0.0))))


def test_reference_scd2_merge_text_equals_operator(spark, lake):
    """The reference's two-pass SCD2 MERGE texts
    (22_ETL_Silver_PySpark.py:62-101 shape), executed verbatim through
    the front-end (with the current_timestamp() seam pinned), produce
    state identical to operators/merge.scd2_merge on the same
    batches."""
    from tb_lakehouse_enhanced_spark.operators.merge import (
        ScdConfig, scd2_merge,
    )
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    src0, src1 = _orders_src(orders, 0), _orders_src(orders, 1)

    # bootstrap the managed target empty with the SCD2 schema (the
    # reference's 01_Init DDL step)
    empty = (src0.limit(0)
             .withColumn("_tf_valid_from", F.lit(None).cast("timestamp"))
             .withColumn("_tf_valid_to", F.lit(None).cast("timestamp"))
             .withColumn("_tf_create_date", F.lit(None).cast("timestamp"))
             .withColumn("_tf_update_date", F.lit(None).cast("timestamp")))
    lake.table("silver.orders").overwrite(empty)

    for now, src in ((T0, src0), (T1, src1)):
        lake.now = now
        src.createOrReplaceTempView("src_orders")
        lake.sql(SCD2_CLOSE)
        lake.sql(SCD2_INSERT)

    cfg = ScdConfig(keys=("o_orderkey",),
                    tracked=("o_custkey", "o_orderstatus", "o_totalprice"),
                    null_safe_keys=False)
    want_df = scd2_merge(scd2_merge(None, src0, cfg, T0), src1, cfg, T1)
    cols = sorted(want_df.columns)
    got = sorted(map(tuple, lake.table("silver.orders").read()
                     .select(*cols).collect()))
    want = sorted(map(tuple, want_df.select(*cols).collect()))
    assert got == want and len(got) > 1000


def test_update_delete_statements_against_managed_table(spark, lake):
    t = lake.table("bronze.address")
    t.overwrite(spark.createDataFrame(
        [(1, "Bothell", "98011"), (2, "Surrey", "V3S"),
         (3, "Bothell", "98012"), (4, "Irving", "75061")],
        "AddressID int, City string, PostalCode string"))
    # reference 23_Testing_SCD2.py:40-50 statement shapes
    lake.sql("""
UPDATE bronze.address
SET PostalCode = '12345'
WHERE City = 'Bothell'
""")
    lake.sql("DELETE FROM bronze.address WHERE City = 'Surrey'")
    rows = {r["AddressID"]: (r["City"], r["PostalCode"])
            for r in lake.table("bronze.address").read().collect()}
    assert rows == {1: ("Bothell", "12345"), 3: ("Bothell", "12345"),
                    4: ("Irving", "75061")}


def test_insert_values_unknown_member(spark, lake):
    """The -9 unknown-member seed INSERT (reference 01_Init.py:306-321
    shape): explicit column list, remaining columns NULL-filled."""
    t = lake.table("gold.dim_customer")
    t.overwrite(spark.createDataFrame(
        [(1, "Ann", "a@x.com")],
        "cust_id int, cust_name string, cust_email string"))
    lake.sql("INSERT INTO gold.dim_customer (cust_id, cust_name) "
             "VALUES (-9, 'N/A')")
    rows = {r["cust_id"]: (r["cust_name"], r["cust_email"])
            for r in t.read().collect()}
    assert rows == {1: ("Ann", "a@x.com"), -9: ("N/A", None)}


def test_merge_matched_delete_clause(spark, lake):
    lake.table("db.t").overwrite(spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k int, v double"))
    spark.createDataFrame([(2, 0.0), (3, 99.0)], "k int, v double") \
        .createOrReplaceTempView("src_del")
    lake.sql("""
MERGE INTO db.t AS tgt USING src_del AS src ON tgt.k = src.k
WHEN MATCHED AND src.v = 0.0 THEN DELETE
WHEN MATCHED THEN UPDATE SET tgt.v = src.v
WHEN NOT MATCHED THEN INSERT (k, v) VALUES (src.k, src.v)
""")
    rows = {r["k"]: r["v"] for r in lake.table("db.t").read().collect()}
    assert rows == {1: 10.0, 3: 99.0}


def test_merge_cardinality_error_and_insert_only_multimatch(spark, lake):
    lake.table("db.c").overwrite(spark.createDataFrame(
        [(1, 1.0)], "k int, v double"))
    dup = spark.createDataFrame([(1, 2.0), (1, 3.0), (5, 5.0)],
                                "k int, v double")
    dup.createOrReplaceTempView("src_dup")
    with pytest.raises(MergeCardinalityError):
        lake.sql("""
MERGE INTO db.c AS tgt USING src_dup AS src ON tgt.k = src.k
WHEN MATCHED THEN UPDATE SET tgt.v = src.v
""")
    # insert-only merges take the anti-join fast path: multi-matches
    # are fine and the matched target row is neither duplicated nor
    # modified
    lake.sql("""
MERGE INTO db.c AS tgt USING src_dup AS src ON tgt.k = src.k
WHEN NOT MATCHED THEN INSERT (k, v) VALUES (src.k, src.v)
""")
    rows = sorted(map(tuple, lake.table("db.c").read().collect()))
    assert rows == [(1, 1.0), (5, 5.0)]


def test_merge_insert_star_and_subquery_source(spark, lake):
    lake.table("db.s").overwrite(spark.createDataFrame(
        [(1, "a")], "k int, name string"))
    spark.createDataFrame([(1, "a2"), (7, "g")], "k int, name string") \
        .createOrReplaceTempView("src_star")
    lake.sql("""
MERGE INTO db.s AS tgt
USING (SELECT * FROM src_star WHERE k > 1) AS src
ON tgt.k = src.k
WHEN NOT MATCHED THEN INSERT *
""")
    rows = sorted(map(tuple, lake.table("db.s").read().collect()))
    assert rows == [(1, "a"), (7, "g")]


def test_apply_merge_passthrough_of_history_rows(spark):
    """Rows matching no clause pass through unchanged — the SCD2
    history slice (valid_to NOT NULL) is 'not matched by source' under
    the current-row ON condition but must survive the guarded NMBS
    clause untouched."""
    tgt = spark.createDataFrame(
        [(1, 5.0, "2023"), (1, 6.0, None), (2, 7.0, None)],
        "k int, v double, closed string")
    src = spark.createDataFrame([(1, 8.0)], "k int, v double")
    spec = parse_merge("""
MERGE INTO x AS t USING y AS s ON t.k = s.k AND t.closed IS NULL
WHEN MATCHED AND t.v != s.v THEN UPDATE SET t.closed = 'now'
WHEN NOT MATCHED BY SOURCE AND t.closed IS NULL THEN
  UPDATE SET t.closed = 'now'
""")
    got = sorted(map(tuple, apply_merge(tgt, src, spec).collect()))
    assert got == [(1, 5.0, "2023"),      # history: untouched
                   (1, 6.0, "now"),       # current, changed: closed
                   (2, 7.0, "now")]       # current, deleted: closed


def test_create_table_reference_ddl_shape(spark, lake):
    """The reference's typed DDL (01_Init.py:46-355 shape — inline
    comments, identity, PK, NOT NULL modifiers) creates an empty typed
    managed table and records the informational constraints."""
    t = lake.sql("""
CREATE OR REPLACE TABLE silver.address (
    _tf_id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 1 INCREMENT BY 1) PRIMARY KEY NOT NULL, -- Incremental surrogate key

    -- Source table columns
    address_id INT,
    city STRING,
    rowguid CHAR(36),
    modified_date TIMESTAMP,

    -- Technical columns
    _tf_valid_from TIMESTAMP,
    _tf_valid_to TIMESTAMP -- NULL indicates current record
)
""")
    df = t.read()
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == [
        "_tf_id", "address_id", "city", "rowguid", "modified_date",
        "_tf_valid_from", "_tf_valid_to"]
    assert df.schema["address_id"].dataType.simpleString() == "int"
    assert df.schema["rowguid"].dataType.simpleString() == "string"
    assert lake._ddl_info(t) == {"identity": "_tf_id",
                                 "identity_always": True,
                                 "identity_start": 1,
                                 "identity_step": 1,
                                 "primary_key": ["_tf_id"],
                                 "not_null": ["_tf_id"],
                                 "foreign_keys": []}
    # plain CREATE on an existing table errors; IF NOT EXISTS no-ops
    with pytest.raises(ValueError, match="table exists"):
        lake.sql("CREATE TABLE silver.address (x INT)")
    lake.sql("CREATE TABLE IF NOT EXISTS silver.address (x INT)")
    assert len(lake.table("silver.address").read().columns) == 7


def test_create_drop_database_and_table(spark, lake):
    import os
    lake.sql("CREATE DATABASE IF NOT EXISTS bronze")
    assert os.path.isdir(os.path.join(lake.root, "bronze"))
    lake.sql("CREATE TABLE bronze.t AS SELECT 1 AS k, 'a' AS s")
    assert lake.table("bronze.t").read().collect() == [(1, "a")]
    with pytest.raises(ValueError, match="not empty"):
        lake.sql("DROP DATABASE bronze")
    lake.sql("DROP TABLE bronze.t")
    assert not lake.table("bronze.t").exists()
    lake.sql("DROP DATABASE IF EXISTS bronze CASCADE")
    assert not os.path.isdir(os.path.join(lake.root, "bronze"))


def test_merge_assigns_identity_deterministically(spark, lake):
    """A MERGE whose INSERT omits the identity column gets dense ids
    past the high-water mark, ordered by the merge key — re-merging
    never reuses ids, matched rows keep theirs."""
    lake.sql("""
CREATE TABLE gold.dim (
  _tf_id BIGINT GENERATED ALWAYS AS IDENTITY PRIMARY KEY NOT NULL,
  k INT, v STRING
)
""")
    merge = """
MERGE INTO gold.dim AS tgt USING src_idm AS src ON tgt.k = src.k
WHEN MATCHED AND tgt.v != src.v THEN UPDATE SET tgt.v = src.v
WHEN NOT MATCHED THEN INSERT (k, v) VALUES (src.k, src.v)
"""
    spark.createDataFrame([(30, "c"), (10, "a"), (20, "b")],
                          "k int, v string") \
        .createOrReplaceTempView("src_idm")
    lake.sql(merge)
    rows = {r["k"]: (r["_tf_id"], r["v"])
            for r in lake.table("gold.dim").read().collect()}
    assert rows == {10: (1, "a"), 20: (2, "b"), 30: (3, "c")}
    # second batch: update k=20, insert k=5 and k=40 -> ids 4 and 5
    spark.createDataFrame([(40, "d"), (20, "B"), (5, "e")],
                          "k int, v string") \
        .createOrReplaceTempView("src_idm")
    lake.sql(merge)
    rows = {r["k"]: (r["_tf_id"], r["v"])
            for r in lake.table("gold.dim").read().collect()}
    assert rows == {10: (1, "a"), 20: (2, "B"), 30: (3, "c"),
                    5: (4, "e"), 40: (5, "d")}


def test_identity_start_with_increment_by(spark, lake):
    """Non-default START WITH / INCREMENT BY specs are honored: ids
    land on the generated domain start + k*step, the high-water mark
    continues past explicit BY DEFAULT seeds, and seeds outside the
    domain never drag generated values before START WITH."""
    lake.sql("""
CREATE TABLE gold.dim_sw (
  id BIGINT GENERATED BY DEFAULT AS IDENTITY (START WITH 100 INCREMENT BY 10),
  k INT, v STRING
)
""")
    info = lake._ddl_info(lake.table("gold.dim_sw"))
    assert (info["identity_start"], info["identity_step"]) == (100, 10)
    # seed outside the domain (the reference's -9 pattern) then insert
    lake.sql("INSERT INTO gold.dim_sw (id, k, v) VALUES (-9, 0, 'seed')")
    lake.sql("INSERT INTO gold.dim_sw (k, v) VALUES (1, 'a'), (2, 'b')")
    rows = {r["k"]: r["id"]
            for r in lake.table("gold.dim_sw").read().collect()}
    assert rows == {0: -9, 1: 100, 2: 110}
    # an explicit seed INSIDE the domain advances the watermark past it
    lake.sql("INSERT INTO gold.dim_sw (id, k, v) VALUES (135, 3, 'x')")
    lake.sql("INSERT INTO gold.dim_sw (k, v) VALUES (4, 'c')")
    rows = {r["k"]: r["id"]
            for r in lake.table("gold.dim_sw").read().collect()}
    assert rows[4] == 140
    # negative increment tracks the MIN downward
    lake.sql("""
CREATE TABLE gold.dim_neg (
  id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 0 INCREMENT BY -5),
  k INT
)""")
    lake.sql("INSERT INTO gold.dim_neg (k) VALUES (1), (2), (3)")
    got = {r["k"]: r["id"]
           for r in lake.table("gold.dim_neg").read().collect()}
    assert got == {1: 0, 2: -5, 3: -10}
    with pytest.raises(ValueError, match="non-zero"):
        lake.sql("CREATE TABLE gold.bad "
                 "(id BIGINT GENERATED ALWAYS AS IDENTITY "
                 "(START WITH 1 INCREMENT BY 0), k INT)")
    # the watermark is exact past 2^53: double-based floor division
    # rounds 9007199254740995 to an even neighbor and can re-issue an
    # existing id
    lake.sql("CREATE TABLE gold.dim_big "
             "(id BIGINT GENERATED BY DEFAULT AS IDENTITY, k INT)")
    lake.sql("INSERT INTO gold.dim_big (id, k) "
             "VALUES (9007199254740996, 1)")
    lake.sql("INSERT INTO gold.dim_big (k) VALUES (2)")
    big = {r["k"]: r["id"]
           for r in lake.table("gold.dim_big").read().collect()}
    assert big == {1: 9007199254740996, 2: 9007199254740997}


def test_run_script_statement_sequence(spark, lake):
    """The notebook flow: a ;-separated DDL + seed + DML sequence runs
    in order through one entry point (01_Init.py shape)."""
    lake.run_script("""
CREATE DATABASE IF NOT EXISTS gold;
CREATE OR REPLACE TABLE gold.dim_geo (
  _tf_id BIGINT GENERATED BY DEFAULT AS IDENTITY PRIMARY KEY NOT NULL,
  geo_city STRING,
  note STRING
);
INSERT INTO gold.dim_geo (_tf_id, geo_city, note)
VALUES (-9, 'N/A', 'seed; unknown member');
UPDATE gold.dim_geo SET note = 'n/a' WHERE geo_city = 'N/A'
""")
    rows = sorted(map(tuple, lake.table("gold.dim_geo").read().collect()))
    # the literal containing ';' survived the split
    assert rows == [(-9, "N/A", "n/a")]


def test_copy_into_idempotent_file_ingest(spark, lake, tmp_path):
    """COPY INTO loads each landing file exactly once: the loaded-file
    manifest rides the commit metadata and survives interleaved
    maintenance commits, so re-runs are no-ops and new files append
    alone."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    land = tmp_path / "landing"
    land.mkdir()
    lake.sql("CREATE TABLE bronze.cp (k INT, v STRING)")
    pq.write_table(pa.table({"k": [1, 2], "v": ["a", "b"]}),
                   str(land / "f1.parquet"))
    lake.sql(f"COPY INTO bronze.cp FROM '{land}' FILEFORMAT = PARQUET")
    t = lake.table("bronze.cp")
    assert sorted(r["k"] for r in t.read().collect()) == [1, 2]
    v1 = t.current_version()
    # re-run: nothing new -> no-op, no commit
    lake.sql(f"COPY INTO bronze.cp FROM '{land}' FILEFORMAT = PARQUET")
    assert t.current_version() == v1
    # a new file + an interleaved maintenance commit: only the new
    # file loads (the manifest walk spans the whole history)
    pq.write_table(pa.table({"k": [3], "v": ["c"]}),
                   str(land / "f2.parquet"))
    lake.sql("OPTIMIZE bronze.cp")
    lake.sql(f"COPY INTO bronze.cp FROM '{land}' FILEFORMAT = PARQUET")
    assert sorted(r["k"] for r in t.read().collect()) == [1, 2, 3]
    v3 = t.current_version()
    lake.sql(f"COPY INTO bronze.cp FROM '{land}' FILEFORMAT = PARQUET")
    assert t.current_version() == v3
    # force = 'true' bypasses the manifest (the Databricks escape
    # hatch after a RESTORE): every file re-ingests
    lake.sql(f"COPY INTO bronze.cp FROM '{land}' FILEFORMAT = PARQUET "
             f"COPY_OPTIONS ('force' = 'true')")
    assert sorted(r["k"] for r in t.read().collect()) \
        == [1, 1, 2, 2, 3, 3]


def test_analyze_and_show_partitions(spark, lake):
    """ANALYZE TABLE builds the file-skipping stats (pruned_files then
    prunes on the analyzed column); SHOW PARTITIONS lists the live
    partition dirs."""
    from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable
    t = ManagedTable(spark, f"{lake.root}/gold/ap",
                     partition_by=("b",))
    t.overwrite(spark.createDataFrame(
        [(i, "x" if i < 50 else "y") for i in range(100)],
        "k int, b string").repartition("b"))
    parts = [r["partition"]
             for r in lake.sql("SHOW PARTITIONS gold.ap").collect()]
    assert parts == ["b=x", "b=y"]
    lake.sql("ANALYZE TABLE gold.ap COMPUTE STATISTICS FOR COLUMNS k")
    kept = t.pruned_files("k", 0, 10)
    assert kept and len(kept) < len(t.pruned_files("k", 0, 99))
    with pytest.raises(ValueError, match="not a partitioned"):
        lake.sql("CREATE TABLE gold.flat AS SELECT 1 AS x")
        lake.sql("SHOW PARTITIONS gold.flat")


def test_alter_table_column_evolution(spark, lake):
    """Explicit schema-evolution DDL: ADD COLUMN(S) appends typed
    NULLs, RENAME COLUMN remaps the recorded constraints (identity /
    PK / enforced NOT NULL CHECK) and keeps them working, DROP COLUMN
    refuses identity / partition / CHECK-referenced columns."""
    lake.sql("""
CREATE TABLE silver.evo (
  id BIGINT GENERATED BY DEFAULT AS IDENTITY PRIMARY KEY NOT NULL,
  k INT, v STRING
)""")
    lake.sql("INSERT INTO silver.evo (k, v) VALUES (1, 'a')")
    lake.sql("ALTER TABLE silver.evo ADD COLUMNS "
             "(email STRING COMMENT 'contact', score DOUBLE)")
    df = lake.table("silver.evo").read()
    assert df.columns == ["id", "k", "v", "email", "score"]
    assert df.collect()[0]["email"] is None
    lake.sql("ALTER TABLE silver.evo ADD COLUMN note STRING")
    assert "note" in lake.table("silver.evo").read().columns
    with pytest.raises(ValueError, match="column exists"):
        lake.sql("ALTER TABLE silver.evo ADD COLUMN k INT")
    # rename remaps identity/PK/NOT NULL records AND the enforced
    # CHECK constraint expression; the sequence keeps working
    lake.sql("ALTER TABLE silver.evo RENAME COLUMN id TO evo_id")
    info = lake._ddl_info(lake.table("silver.evo"))
    assert info["identity"] == "evo_id"
    assert info["primary_key"] == ["evo_id"]
    assert info["not_null"] == ["evo_id"]
    assert lake.table("silver.evo").constraints() \
        == {"nn_evo_id": "evo_id IS NOT NULL"}
    lake.sql("INSERT INTO silver.evo (k, v) VALUES (2, 'b')")
    assert sorted(r["evo_id"] for r in
                  lake.table("silver.evo").read().collect()) == [1, 2]
    # drops: plain column ok; identity and CHECK-referenced refused
    lake.sql("ALTER TABLE silver.evo DROP COLUMN score")
    assert "score" not in lake.table("silver.evo").read().columns
    with pytest.raises(ValueError, match="identity"):
        lake.sql("ALTER TABLE silver.evo DROP COLUMN evo_id")
    lake.sql("ALTER TABLE silver.evo ALTER COLUMN k SET NOT NULL")
    with pytest.raises(ValueError, match="references"):
        lake.sql("ALTER TABLE silver.evo DROP COLUMN k")
    lake.sql("ALTER TABLE silver.evo DROP COLUMNS (email, note)")
    assert lake.table("silver.evo").read().columns \
        == ["evo_id", "k", "v"]


def test_describe_detail_and_show_create_table(spark, lake):
    """DESCRIBE DETAIL reports the table's physical layout; SHOW
    CREATE TABLE reconstructs DDL that round-trips through the
    front-end with identical recorded constraints."""
    lake.sql("""
CREATE TABLE silver.sct (
  id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 5 INCREMENT BY 2) PRIMARY KEY NOT NULL,
  k INT REFERENCES gold.dim(k2),
  v STRING
) PARTITIONED BY (v)
""")
    lake.sql("INSERT INTO silver.sct (k, v) VALUES (1, 'a'), (2, 'b')")
    d = lake.sql("DESCRIBE DETAIL silver.sct").collect()[0]
    assert d["format"] == "parquet"
    assert d["partitionColumns"] == ["v"]
    assert d["numFiles"] >= 2 and d["version"] >= 1
    ddl = lake.sql("SHOW CREATE TABLE silver.sct").collect()[0][0]
    assert "GENERATED ALWAYS AS IDENTITY (START WITH 5 INCREMENT BY 2)" \
        in ddl
    assert "PRIMARY KEY" in ddl and "REFERENCES gold.dim(k2)" in ddl
    assert ddl.rstrip().endswith("PARTITIONED BY (v)")
    # round-trip: the emitted DDL recreates an equivalent table
    lake.sql(ddl.replace("silver.sct", "silver.sct2"))
    assert lake._ddl_info(lake.table("silver.sct2")) \
        == lake._ddl_info(lake.table("silver.sct"))
    assert lake.table("silver.sct2").partition_by \
        == lake.table("silver.sct").partition_by


def test_notebook_catalog_preamble(spark, lake):
    """The notebooks' catalog preamble runs verbatim (12_ETL_Bronze_
    PySpark.py:35-52, repeated identically in 01/22/33/34): SHOW
    CATALOGS feeds the detection logic, USE CATALOG records the pick,
    USE SCHEMA scopes bare table names to that schema."""
    lake.sql("CREATE DATABASE IF NOT EXISTS bronze")
    # the notebook's own detection logic (dbutils.widgets elided)
    catalogs = [row.catalog
                for row in lake.sql("SHOW CATALOGS").collect()]
    unity_catalogs = [c for c in catalogs if c != "hive_metastore"]
    if len(unity_catalogs) == 1:
        default_catalog = unity_catalogs[0]
    else:
        default_catalog = next(
            (c for c in unity_catalogs if c.startswith("dbw_")),
            "hive_metastore")
    catalog = default_catalog
    bronze_schema = "bronze"
    lake.sql(f"USE CATALOG {catalog}")
    lake.sql(f"USE SCHEMA {bronze_schema}")
    assert (lake.current_catalog, lake.current_db) \
        == ("spark_catalog", "bronze")
    # bare table names now resolve into the schema (the ingestion
    # notebook's saveAsTable targets)
    lake.sql("CREATE TABLE Address AS "
             "SELECT 1 AS address_id, 'Bothell' AS city")
    assert lake.table("bronze.Address").read().collect() \
        == [(1, "Bothell")]
    lake.sql("INSERT INTO Address VALUES (2, 'Surrey')")
    assert lake.table("Address").read().count() == 2
    # bare names in SELECT bind to the schema's managed tables too —
    # with CTEs and temp views keeping resolution precedence
    assert lake.sql("SELECT city FROM Address WHERE address_id = 2"
                    ).collect() == [("Surrey",)]
    assert lake.sql("WITH Address AS (SELECT 'cte' AS who) "
                    "SELECT who FROM Address").collect() == [("cte",)]
    spark.range(1).selectExpr("'view' AS who") \
        .createOrReplaceTempView("Address")
    assert lake.sql("SELECT who FROM Address").collect() == [("view",)]
    spark.catalog.dropTempView("Address")
    # SHOW TABLES reflects the current schema; SHOW SCHEMAS the root
    rows = {(r["namespace"], r["tableName"])
            for r in lake.sql("SHOW TABLES").collect()}
    assert rows == {("bronze", "Address")}
    assert ("bronze",) in [tuple(r)
                           for r in lake.sql("SHOW SCHEMAS").collect()]
    with pytest.raises(ValueError, match="schema not found"):
        lake.sql("USE SCHEMA does_not_exist")


def test_select_reads_managed_tables(spark, lake):
    """The reference's ad-hoc SELECT checks (23_Testing_SCD2.py:39,49)
    work against managed tables: db.table references bind to the
    current snapshot at query time."""
    lake.sql("CREATE TABLE bronze.addr AS SELECT 1 AS id, 'Bothell' AS city")
    rows = lake.sql(
        "SELECT * FROM bronze.addr WHERE city = 'Bothell'").collect()
    assert rows == [(1, "Bothell")]
    lake.sql("UPDATE bronze.addr SET city = 'Surrey' WHERE id = 1")
    # re-binding picks up the NEW snapshot
    assert lake.sql("SELECT city FROM bronze.addr").collect() == [("Surrey",)]
    # a WITH query and a join across two managed tables
    lake.sql("CREATE TABLE bronze.x AS SELECT 1 AS id, 10 AS v")
    got = lake.sql("""
WITH j AS (
  SELECT a.city, x.v FROM bronze.addr a JOIN bronze.x x ON a.id = x.id
) SELECT * FROM j
""").collect()
    assert got == [("Surrey", 10)]


def test_utility_sql_and_time_travel(spark, lake):
    """The Delta table-service command family as SQL texts: OPTIMIZE /
    VACUUM / RESTORE / DESCRIBE HISTORY, plus VERSION AS OF time
    travel inside SELECT."""
    lake.sql("CREATE TABLE db.tt AS SELECT 1 AS k, 'a' AS v")
    lake.sql("UPDATE db.tt SET v = 'b' WHERE k = 1")
    assert lake.sql(
        "SELECT v FROM db.tt VERSION AS OF 0").collect() == [("a",)]
    assert lake.sql("SELECT v FROM db.tt").collect() == [("b",)]
    hist = lake.sql("DESCRIBE HISTORY db.tt").collect()
    assert [r["version"] for r in hist][:2] == [1, 0] or \
        sorted(r["version"] for r in hist) == [0, 1]
    lake.sql("RESTORE TABLE db.tt TO VERSION AS OF 0")
    assert lake.sql("SELECT v FROM db.tt").collect() == [("a",)]
    lake.sql("OPTIMIZE db.tt")
    lake.sql("VACUUM db.tt RETAIN 1 VERSIONS")
    assert lake.sql("SELECT v FROM db.tt").collect() == [("a",)]


def test_select_binding_ignores_string_literals(spark, lake):
    """A literal containing a managed-table name must not be rewritten
    by the SELECT binder."""
    lake.sql("CREATE TABLE db.lit AS SELECT 1 AS k, 'db.lit' AS note")
    rows = lake.sql(
        "SELECT note FROM db.lit WHERE note = 'db.lit'").collect()
    assert rows == [("db.lit",)]


def test_full_medallion_flow_by_statement_texts(spark, lake):
    """Capstone: the reference's whole notebook flow — typed DDL,
    silver SCD2 two-pass MERGE, gold dim SCD1 MERGE with an identity
    surrogate, gold fact MERGE joining silver current rows — executed
    END TO END as statement texts against one managed root, with the
    catalog validators asserting the result's integrity."""
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet") \
        .limit(2000).cache()
    customer = spark.read.parquet(
        "/root/testdata/sf0.001/customer.parquet")
    lake.now = T0
    lake.run_script("""
CREATE DATABASE IF NOT EXISTS silver;
CREATE DATABASE IF NOT EXISTS gold;
CREATE OR REPLACE TABLE silver.orders (
  o_orderkey BIGINT,
  o_custkey BIGINT,
  o_totalprice DOUBLE,
  _tf_valid_from TIMESTAMP,
  _tf_valid_to TIMESTAMP,
  _tf_create_date TIMESTAMP,
  _tf_update_date TIMESTAMP
);
CREATE OR REPLACE TABLE gold.dim_customer (
  _tf_id BIGINT GENERATED ALWAYS AS IDENTITY PRIMARY KEY NOT NULL,
  cust_customer_id BIGINT,
  cust_name STRING,
  _tf_create_date TIMESTAMP,
  _tf_update_date TIMESTAMP
);
CREATE OR REPLACE TABLE gold.fact_orders (
  sales_order_id BIGINT,
  _tf_dim_customer_id BIGINT,
  sales_total DOUBLE,
  _tf_create_date TIMESTAMP,
  _tf_update_date TIMESTAMP
)
""")
    silver_close = """
MERGE INTO silver.orders AS tgt
USING src_orders AS src
ON tgt.o_orderkey = src.o_orderkey AND tgt._tf_valid_to IS NULL
WHEN MATCHED AND (tgt.o_totalprice != src.o_totalprice) THEN
  UPDATE SET tgt._tf_valid_to = current_timestamp(),
             tgt._tf_update_date = current_timestamp()
WHEN NOT MATCHED BY SOURCE AND tgt._tf_valid_to IS NULL THEN
  UPDATE SET tgt._tf_valid_to = current_timestamp(),
             tgt._tf_update_date = current_timestamp()
"""
    silver_insert = """
MERGE INTO silver.orders AS tgt
USING src_orders AS src
ON tgt.o_orderkey = src.o_orderkey AND tgt._tf_valid_to IS NULL
WHEN NOT MATCHED THEN
  INSERT (o_orderkey, o_custkey, o_totalprice,
          _tf_valid_from, _tf_valid_to, _tf_create_date, _tf_update_date)
  VALUES (src.o_orderkey, src.o_custkey, src.o_totalprice,
          current_timestamp(), NULL, current_timestamp(),
          current_timestamp())
"""
    dim_merge = """
MERGE INTO gold.dim_customer AS tgt
USING src_cust AS src
ON tgt.cust_customer_id = src.cust_customer_id
WHEN MATCHED AND (tgt.cust_name != src.cust_name) THEN
  UPDATE SET tgt.cust_name = src.cust_name,
             tgt._tf_update_date = current_timestamp()
WHEN NOT MATCHED THEN
  INSERT (cust_customer_id, cust_name, _tf_create_date, _tf_update_date)
  VALUES (src.cust_customer_id, src.cust_name,
          current_timestamp(), current_timestamp())
"""
    fact_merge = """
MERGE INTO gold.fact_orders AS tgt
USING src_fact AS src
ON tgt.sales_order_id = src.sales_order_id
WHEN MATCHED AND (tgt.sales_total != src.sales_total OR
                  tgt._tf_dim_customer_id != src._tf_dim_customer_id) THEN
  UPDATE SET tgt.sales_total = src.sales_total,
             tgt._tf_dim_customer_id = src._tf_dim_customer_id,
             tgt._tf_update_date = current_timestamp()
WHEN NOT MATCHED THEN
  INSERT (sales_order_id, _tf_dim_customer_id, sales_total,
          _tf_create_date, _tf_update_date)
  VALUES (src.sales_order_id, src._tf_dim_customer_id, src.sales_total,
          current_timestamp(), current_timestamp())
"""

    def load(batch_filter, now):
        lake.now = now
        orders.filter(batch_filter) \
            .select("o_orderkey", "o_custkey", "o_totalprice") \
            .createOrReplaceTempView("src_orders")
        lake.sql(silver_close)
        lake.sql(silver_insert)
        customer.select(
            F.col("c_custkey").alias("cust_customer_id"),
            F.col("c_name").alias("cust_name")) \
            .createOrReplaceTempView("src_cust")
        lake.sql(dim_merge)
        # fact from silver CURRENT rows joined to the dim surrogate
        lake.sql("""
SELECT s.o_orderkey AS sales_order_id,
       d._tf_id AS _tf_dim_customer_id,
       s.o_totalprice AS sales_total
FROM silver.orders s
LEFT JOIN gold.dim_customer d ON d.cust_customer_id = s.o_custkey
WHERE s._tf_valid_to IS NULL
""").createOrReplaceTempView("src_fact")
        lake.sql(fact_merge)

    load("o_orderkey % 10 != 7", T0)
    load("o_orderkey % 10 != 3", T1)

    silver = lake.table("silver.orders").read()
    current = silver.filter("_tf_valid_to IS NULL")
    fact = lake.table("gold.fact_orders").read()
    n_current = current.count()
    assert n_current > 100
    # the fact carries every current order exactly once
    assert fact.count() >= n_current
    dup = fact.groupBy("sales_order_id").count().filter("count > 1").count()
    assert dup == 0
    # surrogate FK integrity: every fact row's dim id exists
    dim = lake.table("gold.dim_customer").read()
    orphans = (fact.join(dim, fact._tf_dim_customer_id == dim._tf_id,
                         "left_anti").count())
    assert orphans == 0
    # identity ids are unique and dense from 1
    ids = sorted(r["_tf_id"] for r in dim.collect())
    assert ids == list(range(1, len(ids) + 1))
    # SCD2 history exists for keys whose price changed... (batch 2 kept
    # prices equal, so closed rows come from the deleted keys %10==3)
    closed = silver.filter("_tf_valid_to IS NOT NULL")
    assert closed.count() > 0
    assert {r["o_orderkey"] % 10 for r in closed.collect()} == {3}


def test_ddl_not_null_is_enforced(spark, lake):
    """NOT NULL column modifiers in the DDL become enforced managed-
    table constraints: a write carrying NULLs aborts atomically."""
    lake.sql("CREATE TABLE db.nn (k INT NOT NULL, v STRING)")
    spark.createDataFrame([(1, "a")], "k int, v string") \
        .createOrReplaceTempView("src_nn_ok")
    lake.sql("""
MERGE INTO db.nn AS tgt USING src_nn_ok AS src ON tgt.k = src.k
WHEN NOT MATCHED THEN INSERT (k, v) VALUES (src.k, src.v)
""")
    assert lake.sql("SELECT * FROM db.nn").collect() == [(1, "a")]
    from tb_lakehouse_enhanced_spark.operators.analytics import (
        ExpectationError,
    )
    spark.createDataFrame([(None, "bad")], "k int, v string") \
        .createOrReplaceTempView("src_nn_bad")
    with pytest.raises(ExpectationError, match="nn_k"):
        lake.sql("""
MERGE INTO db.nn AS tgt USING src_nn_bad AS src ON tgt.k = src.k
WHEN NOT MATCHED THEN INSERT (k, v) VALUES (src.k, src.v)
""")
    # the failed write left the table untouched
    assert lake.sql("SELECT * FROM db.nn").collect() == [(1, "a")]


def test_merge_statement_is_partition_scoped(spark, lake, tmp_path):
    """A provably partition-safe MERGE text (ON carries
    ``tgt.month = src.month``, no NMBS clause, insert maps the
    partition column to src) rewrites ONLY the source-touched
    partitions — untouched partition files hardlink forward (same
    inode), the 100 TB merge shape through the SQL surface."""
    import glob
    import os

    from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable
    t = ManagedTable(spark, f"{lake.root}/gold/fact_m",
                     partition_by=("month",))
    t.overwrite(spark.createDataFrame(
        [(k, f"2024-{(k % 3) + 1:02d}", float(k)) for k in range(30)],
        "k int, month string, v double"))

    def inodes(ver, month):
        d = os.path.join(t.path, t._commit(ver)["dir"], f"month={month}")
        return {os.path.basename(p): os.stat(p).st_ino
                for p in glob.glob(os.path.join(d, "*.parquet"))}
    before = {m: inodes(0, m) for m in ("2024-02", "2024-03")}

    # source touches ONLY month 2024-01 (update k=0, insert k=100);
    # the partition-equality conjunct in the ON is what PROVES matched
    # pairs share a partition, so the scoped route may engage
    spark.createDataFrame(
        [(0, "2024-01", -1.0), (100, "2024-01", 100.0)],
        "k int, month string, v double").createOrReplaceTempView("src_pm")
    lake.sql("""
MERGE INTO gold.fact_m AS tgt USING src_pm AS src
ON tgt.k = src.k AND tgt.month = src.month
WHEN MATCHED AND tgt.v != src.v THEN UPDATE SET tgt.v = src.v
WHEN NOT MATCHED THEN
  INSERT (k, month, v) VALUES (src.k, src.month, src.v)
""")
    meta = t._commit(t.current_version())
    assert meta["partitions_rewritten"] == ["month=2024-01"]
    for m in ("2024-02", "2024-03"):
        assert inodes(1, m) == before[m], f"month {m} was rewritten"
    rows = {r["k"]: r["v"] for r in t.read().collect()}
    assert rows[0] == -1.0 and rows[100] == 100.0 and len(rows) == 31

    # an NMBS clause is NOT partition-safe: falls back to full rewrite
    # with the correct global close semantics
    spark.createDataFrame([(100, "2024-01", 100.0)],
                          "k int, month string, v double") \
        .createOrReplaceTempView("src_pm2")
    lake.sql("""
MERGE INTO gold.fact_m AS tgt USING src_pm2 AS src
ON tgt.k = src.k
WHEN NOT MATCHED BY SOURCE THEN DELETE
WHEN NOT MATCHED THEN INSERT (k, month, v) VALUES (src.k, src.month, src.v)
""")
    assert {r["k"] for r in t.read().collect()} == {100}


def test_merge_key_only_on_never_duplicates_moved_keys(spark, lake):
    """The partition-scoped route must NOT engage on a key-only ON
    (``tgt.k = src.k`` with no partition conjunct): a source row whose
    partition value differs from its matched target row's would
    otherwise hardlink the target row untouched AND insert the source
    row — a silent duplicate key where Delta MERGE updates in place.
    Default (auto) semantics: full rewrite, Delta-equal result.
    ``stable_partitions=True`` is the caller's explicit assertion that
    re-enables the scoped route for key-only ONs."""
    from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable
    from tb_lakehouse_enhanced_spark.sqlfront import LakehouseSql
    t = ManagedTable(spark, f"{lake.root}/gold/fact_mv",
                     partition_by=("month",))
    t.overwrite(spark.createDataFrame(
        [(1, "2024-02", 1.0), (2, "2024-03", 2.0)],
        "k int, month string, v double"))
    # source row k=1 carries month=2024-01 — a DIFFERENT partition than
    # its matched target row (the ADVICE's divergence scenario)
    spark.createDataFrame([(1, "2024-01", -1.0)],
                          "k int, month string, v double") \
        .createOrReplaceTempView("src_moved")
    stmt = """
MERGE INTO gold.fact_mv AS tgt USING src_moved AS src
ON tgt.k = src.k
WHEN MATCHED THEN UPDATE SET tgt.v = src.v
WHEN NOT MATCHED THEN INSERT (k, month, v) VALUES (src.k, src.month, src.v)
"""
    lake.sql(stmt)
    rows = sorted(map(tuple, t.read().select("k", "month", "v").collect()))
    # Delta semantics: k=1 UPDATED in place (still in 2024-02), not
    # duplicated into 2024-01
    assert rows == [(1, "2024-02", -1.0), (2, "2024-03", 2.0)]
    meta = t._commit(t.current_version())
    assert "partitions_rewritten" not in meta  # full rewrite was taken

    # the explicit opt-in re-enables the scoped route (and with it the
    # caller-owned contract); partitions_rewritten proves it engaged
    spark.createDataFrame([(2, "2024-03", -2.0)],
                          "k int, month string, v double") \
        .createOrReplaceTempView("src_moved")
    asserted = LakehouseSql(spark, lake.root, stable_partitions=True)
    asserted.sql(stmt.replace("fact_mv", "fact_mv"))
    meta = t._commit(t.current_version())
    assert meta["partitions_rewritten"] == ["month=2024-03"]
    rows = sorted(map(tuple, t.read().select("k", "month", "v").collect()))
    assert rows == [(1, "2024-02", -1.0), (2, "2024-03", -2.0)]


def test_update_delete_with_in_subquery(spark, lake):
    """Delta's subquery-DML surface: UPDATE/DELETE with a
    ``col [NOT] IN (SELECT ...)`` membership test executes with exact
    SQL three-valued semantics (the predicate passes verbatim to
    Catalyst over the snapshot view) — including NOT IN's NULL
    poisoning; residual AND predicates compose in place."""
    lake.sql("CREATE TABLE db.s (k INT, grp STRING)")
    lake.table("db.s").overwrite(spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(10)],
        "k int, grp string"))
    lake.sql("CREATE TABLE db.bad AS "
             "SELECT * FROM VALUES (2), (4), (99) AS t(bk)")
    lake.sql("DELETE FROM db.s WHERE k IN (SELECT bk FROM db.bad)")
    assert sorted(r["k"] for r in lake.table("db.s").read().collect()) \
        == [0, 1, 3, 5, 6, 7, 8, 9]
    # UPDATE with residual predicate: only grp='b' members update
    lake.sql("UPDATE db.s SET grp = 'X' "
             "WHERE k IN (SELECT bk + 1 FROM db.bad) AND grp = 'b'")
    rows = {r["k"]: r["grp"] for r in lake.table("db.s").read().collect()}
    assert rows[3] == "X" and rows[5] == "X" and rows[0] == "a"
    # a NULL in the NOT IN subquery poisons the predicate (never TRUE)
    # — standard SQL, what Databricks executes; nothing deletes
    lake.sql("CREATE TABLE db.badnull AS "
             "SELECT * FROM VALUES (2), (NULL) AS t(bk)")
    lake.sql("DELETE FROM db.s WHERE k NOT IN (SELECT bk FROM db.badnull)")
    assert lake.table("db.s").read().count() == 8
    # NOT IN over a NULL-free subquery deletes the non-members
    lake.sql("DELETE FROM db.s WHERE k NOT IN (SELECT bk FROM db.bad)")
    assert sorted(r["k"] for r in lake.table("db.s").read().collect()) == []


# The VERBATIM silver-address MERGE texts from the reference
# (notebooks/22_ETL_Silver_PySpark.py:62-101), character-for-character —
# quoted as the behavior spec this front-end must execute.
ADDRESS_CLOSE = """
MERGE INTO silver.address AS tgt
USING src_address AS src
ON tgt.address_id = src.address_id AND tgt._tf_valid_to IS NULL
WHEN MATCHED AND (
       tgt.address_line1 != src.address_line1 OR
       tgt.address_line2 != src.address_line2 OR
       tgt.city != src.city OR
       tgt.state_province != src.state_province OR
       tgt.country_region != src.country_region OR
       tgt.postal_code != src.postal_code OR
       tgt.rowguid != src.rowguid OR
       tgt.modified_date != src.modified_date
) THEN UPDATE SET
    tgt._tf_valid_to = current_timestamp(),
    tgt._tf_update_date = current_timestamp()
WHEN NOT MATCHED BY SOURCE AND tgt._tf_valid_to IS NULL THEN
  UPDATE SET
    tgt._tf_valid_to = current_timestamp(),
    tgt._tf_update_date = current_timestamp()
"""

ADDRESS_INSERT = """
MERGE INTO silver.address AS tgt
USING src_address AS src
ON tgt.address_id = src.address_id AND tgt._tf_valid_to IS NULL
WHEN NOT MATCHED THEN
  INSERT (
    address_id, address_line1, address_line2, city, state_province,
    country_region, postal_code, rowguid, modified_date,
    _tf_valid_from, _tf_valid_to, _tf_create_date, _tf_update_date
  )
  VALUES (
    src.address_id, src.address_line1, src.address_line2, src.city, src.state_province,
    src.country_region, src.postal_code, src.rowguid, src.modified_date,
    current_timestamp(), NULL, current_timestamp(), current_timestamp()
  )
"""

ADDR_COLS = ("address_line1", "address_line2", "city", "state_province",
             "country_region", "postal_code", "rowguid", "modified_date")


def _address_src(spark, batch):
    """Deterministic bronze.address-shaped batches derived from the
    driver's customer table (the reference's AdventureWorks columns,
    synthetic values): batch 1 updates city for id%7==0, drops id%10==3,
    adds unseen ids."""
    c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    base = c.select(
        F.col("c_custkey").alias("address_id"),
        F.concat(F.lit("no. "), F.col("c_custkey")).alias("address_line1"),
        F.lit(None).cast("string").alias("address_line2"),
        F.concat(F.lit("city"), (F.col("c_custkey") % 50)).alias("city"),
        F.col("c_mktsegment").alias("state_province"),
        F.lit("US").alias("country_region"),
        (F.col("c_custkey") % 99999).cast("string").alias("postal_code"),
        F.md5(F.col("c_custkey").cast("string")).alias("rowguid"),
        F.to_timestamp(F.lit("2023-06-01 00:00:00")).alias("modified_date"))
    if batch == 0:
        return base.filter("address_id % 10 != 7")
    return (base.filter("address_id % 10 != 3")
            .withColumn("city", F.when(F.col("address_id") % 7 == 0,
                                       F.lit("Bothell"))
                        .otherwise(F.col("city"))))


def test_verbatim_reference_address_merge(spark, lake):
    """The reference's silver.address MERGE texts executed VERBATIM
    (exact statement strings, exact column names) reproduce
    operators/merge.scd2_merge on the same batches — null-unsafe
    change detection included: address_line2 is all-NULL, and the
    reference's != chain must NOT close rows over NULL != NULL."""
    from tb_lakehouse_enhanced_spark.operators.merge import (
        ScdConfig, scd2_merge,
    )
    src0, src1 = _address_src(spark, 0), _address_src(spark, 1)
    empty = src0.limit(0)
    for c in ("_tf_valid_from", "_tf_valid_to",
              "_tf_create_date", "_tf_update_date"):
        empty = empty.withColumn(c, F.lit(None).cast("timestamp"))
    lake.table("silver.address").overwrite(empty)
    for now, src in ((T0, src0), (T1, src1)):
        lake.now = now
        src.createOrReplaceTempView("src_address")
        lake.sql(ADDRESS_CLOSE)
        lake.sql(ADDRESS_INSERT)
    cfg = ScdConfig(keys=("address_id",), tracked=ADDR_COLS,
                    strict_reference_semantics=True,
                    null_safe_keys=False)
    want_df = scd2_merge(scd2_merge(None, src0, cfg, T0), src1, cfg, T1)
    cols = sorted(want_df.columns)
    got = sorted(map(tuple, lake.table("silver.address").read()
                     .select(*cols).collect()))
    want = sorted(map(tuple, want_df.select(*cols).collect()))
    assert got == want and len(got) > 100
    # both versions exist for changed keys; history rows closed at T1
    closed = lake.table("silver.address").read() \
        .filter("_tf_valid_to IS NOT NULL")
    assert closed.filter("address_id % 7 = 0").count() > 0


def test_alter_table_constraint_ddl(spark, lake):
    """The reference's post-CTAS constraint statements (01_Init.py:
    236-239): ALTER COLUMN SET NOT NULL becomes an enforced
    constraint, ADD PRIMARY KEY records the informational key, ADD/
    DROP CONSTRAINT CHECK round-trips."""
    from tb_lakehouse_enhanced_spark.operators.analytics import (
        ExpectationError,
    )
    lake.sql("CREATE TABLE gold.dim_cal AS "
             "SELECT * FROM VALUES (1, 'a'), (2, 'b') AS t(cal_id, d)")
    lake.sql("ALTER TABLE gold.dim_cal "
             "ALTER COLUMN cal_id SET NOT NULL")
    lake.sql("ALTER TABLE gold.dim_cal ADD PRIMARY KEY (cal_id)")
    t = lake.table("gold.dim_cal")
    assert lake._ddl_info(t)["primary_key"] == ["cal_id"]
    assert "nn_cal_id" in t.constraints()
    with pytest.raises(ExpectationError, match="nn_cal_id"):
        t.overwrite(spark.createDataFrame([(None, "x")],
                                          "cal_id int, d string"))
    lake.sql("ALTER TABLE gold.dim_cal ADD CONSTRAINT pos "
             "CHECK (cal_id > 0)")
    with pytest.raises(ExpectationError, match="pos"):
        t.overwrite(spark.createDataFrame([(-1, "x")],
                                          "cal_id int, d string"))
    lake.sql("ALTER TABLE gold.dim_cal DROP CONSTRAINT pos")
    t.overwrite(spark.createDataFrame([(-1, "x")],
                                      "cal_id int, d string"))
    assert t.read().collect() == [(-1, "x")]


# ------------------------------------------------- verbatim 01_Init.py ------

def _init_sql_cells() -> list[str]:
    """Extract the %sql cells from the reference's init notebook,
    VERBATIM (only the Databricks `# MAGIC ` line prefix stripped —
    the same text a user would paste)."""
    text = open("/root/reference/notebooks/01_Init.py").read()
    cells = []
    for cell in text.split("# COMMAND ----------"):
        lines = cell.splitlines()
        if not any(ln.strip().startswith("# MAGIC %sql") for ln in lines):
            continue
        sql = [ln.partition("# MAGIC")[2].removeprefix(" ")
               for ln in lines
               if ln.strip().startswith("# MAGIC")
               and not ln.strip().startswith(("# MAGIC %sql",
                                              "# MAGIC %md"))]
        cells.append("\n".join(sql))
    return cells


def test_verbatim_init_notebook_runs_end_to_end(spark, lake):
    """The reference's ENTIRE 01_Init.py SQL sequence — every %sql
    cell, verbatim — runs through run_script: four silver DDLs
    (GENERATED ALWAYS identity, CHAR(n), inline comments), the
    leading-CTE calendar CTAS + its two ALTERs (01_Init.py:180-239),
    the BY DEFAULT gold dims + their -9 seeds (:244-321), and the fact
    DDL with column-level REFERENCES FKs (:327-352)."""
    cells = _init_sql_cells()
    assert len(cells) == 10, [c[:40] for c in cells]
    lake.now = T0
    for db in ("bronze", "silver", "gold"):
        lake.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    for cell in cells:
        lake.run_script(cell)

    # calendar spine: 2000-01-01 .. 2030-01-01 inclusive
    cal = lake.table("gold.dim_calendar").read()
    assert cal.count() == 10959
    row = cal.filter(F.col("cal_date") == "2024-02-29").collect()[0]
    assert row["_tf_dim_calendar_id"] == 20240229
    assert row["cal_fiscal_quarter"] == 1
    assert row["cal_day_name"] == "Thursday"
    # the post-CTAS ALTERs landed: NOT NULL constraint + recorded PK
    info = lake._ddl_info(lake.table("gold.dim_calendar"))
    assert info["primary_key"] == ["_tf_dim_calendar_id"]
    assert "_tf_dim_calendar_id" in info["not_null"]

    # silver tables: typed, empty, ALWAYS-identity recorded
    addr = lake.table("silver.address")
    assert addr.read().count() == 0
    assert addr.read().schema["rowguid"].dataType.simpleString() == "string"
    ainfo = lake._ddl_info(addr)
    assert ainfo["identity"] == "_tf_id" and ainfo["identity_always"]

    # BY DEFAULT dims took their explicit -9 unknown-member seeds
    geo = lake.table("gold.dim_geography").read().collect()
    assert len(geo) == 1 and geo[0]["_tf_dim_geography_id"] == -9
    cust = lake.table("gold.dim_customer").read().collect()
    assert len(cust) == 1 and cust[0]["_tf_dim_customer_id"] == -9

    # fact DDL: schema + ALWAYS identity + the three recorded FKs
    finfo = lake._ddl_info(lake.table("gold.fact_sales"))
    assert finfo["identity"] == "_tf_fact_sales_id"
    assert finfo["identity_always"] is True
    assert finfo["foreign_keys"] == [
        ["_tf_dim_calendar_id", "gold.dim_calendar",
         "_tf_dim_calendar_id"],
        ["_tf_dim_customer_id", "gold.dim_customer",
         "_tf_dim_customer_id"],
        ["_tf_dim_geography_id", "gold.dim_geography",
         "_tf_dim_geography_id"]]
    fcols = [f.name for f in lake.table("gold.fact_sales").read().schema]
    assert fcols == [
        "_tf_fact_sales_id", "sales_order_id", "sales_order_detail_id",
        "_tf_dim_calendar_id", "_tf_dim_customer_id",
        "_tf_dim_geography_id", "sales_order_qty", "sales_unit_price",
        "sales_unit_price_discount", "sales_line_total",
        "_tf_create_date", "_tf_update_date"]

    # FK integrity wiring: empty fact -> all clean; a row referencing a
    # missing calendar id -> exactly that FK trips
    assert set(lake.validate_foreign_keys("gold.fact_sales").values()) \
        == {0}
    lake.sql("""
INSERT INTO gold.fact_sales (
  sales_order_id, sales_order_detail_id, _tf_dim_calendar_id,
  _tf_dim_customer_id, _tf_dim_geography_id, sales_order_qty,
  sales_unit_price, sales_unit_price_discount, sales_line_total,
  _tf_create_date, _tf_update_date)
VALUES (1, 1, 99999999, -9, -9, 1, 1.0, 0.0, 1.0,
        current_timestamp(), current_timestamp())""")
    viol = lake.validate_foreign_keys("gold.fact_sales")
    assert viol == {
        "_tf_dim_calendar_id->gold.dim_calendar(_tf_dim_calendar_id)": 1,
        "_tf_dim_customer_id->gold.dim_customer(_tf_dim_customer_id)": 0,
        "_tf_dim_geography_id->gold.dim_geography(_tf_dim_geography_id)": 0}


def test_generated_always_rejects_by_default_accepts(spark, lake):
    """Identity fidelity (01_Init.py:59 vs :246): explicit values into
    a GENERATED ALWAYS identity raise; BY DEFAULT accepts them (the -9
    unknown-member seeds rely on this); omitting the column always
    works and assigns past the high-water mark."""
    lake.sql("""CREATE TABLE gold.d_always (
      id BIGINT GENERATED ALWAYS AS IDENTITY, v STRING)""")
    lake.sql("""CREATE TABLE gold.d_default (
      id BIGINT GENERATED BY DEFAULT AS IDENTITY, v STRING)""")
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        lake.sql("INSERT INTO gold.d_always (id, v) VALUES (-9, 'x')")
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        lake.sql(
            "UPDATE gold.d_always SET id = 5 WHERE v = 'x'")
    lake.sql("INSERT INTO gold.d_default (id, v) VALUES (-9, 'x')")
    lake.sql("INSERT INTO gold.d_always (v) VALUES ('a')")
    lake.sql("INSERT INTO gold.d_default (v) VALUES ('b')")
    assert {tuple(r) for r in lake.table("gold.d_always").read().collect()} \
        == {(1, "a")}
    assert {tuple(r) for r in lake.table("gold.d_default").read().collect()} \
        == {(-9, "x"), (1, "b")}
    # MERGE insert clause naming the ALWAYS column raises too
    spark.createDataFrame([(7, "m")], "id bigint, v string") \
        .createOrReplaceTempView("src_alw")
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        lake.sql("""
MERGE INTO gold.d_always AS tgt USING src_alw AS src ON tgt.v = src.v
WHEN NOT MATCHED THEN INSERT (id, v) VALUES (src.id, src.v)""")


def test_merge_using_subquery_nested_parens(spark, lake):
    """USING (SELECT ...) sources with nested parentheses — function
    calls, inner IN-subqueries — parse via the paren scan, and
    db.table references INSIDE the subquery bind to managed tables."""
    lake.sql("CREATE TABLE bronze.feed AS "
             "SELECT * FROM VALUES (1, 10), (2, 20), (3, 30) AS t(k, v)")
    lake.table("gold.tgt_sub").overwrite(spark.createDataFrame(
        [(1, 0), (9, 90)], "k int, v int"))
    lake.sql("""
MERGE INTO gold.tgt_sub AS tgt
USING (
  SELECT coalesce(k, 0) AS k, v FROM bronze.feed
  WHERE k IN (SELECT k FROM bronze.feed WHERE v >= 20)
) AS src
ON tgt.k = src.k
WHEN MATCHED THEN UPDATE SET tgt.v = src.v
WHEN NOT MATCHED THEN INSERT (k, v) VALUES (src.k, src.v)""")
    rows = sorted(map(tuple, lake.table("gold.tgt_sub").read().collect()))
    assert rows == [(1, 0), (2, 20), (3, 30), (9, 90)]


def test_merge_chain_fuses_scd2_pair(spark, lake):
    """merge_chain runs the reference's close+insert SCD2 pair as ONE
    commit with state identical to sequential execution."""
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    src0, src1 = _orders_src(orders, 0), _orders_src(orders, 1)
    empty = (src0.limit(0)
             .withColumn("_tf_valid_from", F.lit(None).cast("timestamp"))
             .withColumn("_tf_valid_to", F.lit(None).cast("timestamp"))
             .withColumn("_tf_create_date", F.lit(None).cast("timestamp"))
             .withColumn("_tf_update_date", F.lit(None).cast("timestamp")))
    # sequential reference run
    lake.table("silver.orders").overwrite(empty)
    for now, src in ((T0, src0), (T1, src1)):
        lake.now = now
        src.createOrReplaceTempView("src_orders")
        lake.sql(SCD2_CLOSE)
        lake.sql(SCD2_INSERT)
    seq_versions = lake.table("silver.orders").current_version()
    cols = sorted(lake.table("silver.orders").read().columns)
    want = sorted(map(tuple, lake.table("silver.orders").read()
                      .select(*cols).collect()))
    # fused run: one commit per load instead of two
    fused = LakehouseSql(spark, lake.root + "_fused")
    fused.table("silver.orders").overwrite(empty)
    for now, src in ((T0, src0), (T1, src1)):
        fused.now = now
        src.createOrReplaceTempView("src_orders")
        fused.merge_pair(SCD2_CLOSE, SCD2_INSERT)
    got = sorted(map(tuple, fused.table("silver.orders").read()
                     .select(*cols).collect()))
    assert got == want and len(got) > 100
    assert fused.table("silver.orders").current_version() \
        == seq_versions - 2
    assert fused.table("silver.orders") \
        ._commit(fused.table("silver.orders").current_version())["fused"] == 2
    # run_script(fuse_merges=True) takes the same path
    scripted = LakehouseSql(spark, lake.root + "_scripted")
    scripted.table("silver.orders").overwrite(empty)
    for now, src in ((T0, src0), (T1, src1)):
        scripted.now = now
        src.createOrReplaceTempView("src_orders")
        scripted.run_script(SCD2_CLOSE + ";\n" + SCD2_INSERT,
                            fuse_merges=True)
    got2 = sorted(map(tuple, scripted.table("silver.orders").read()
                      .select(*cols).collect()))
    assert got2 == want


def test_merge_statement_schema_evolution_opt_in(spark, lake):
    """Opt-in mergeSchema semantics for statement-text MERGE: a WHEN
    clause referencing a source column absent from the target evolves
    the target (historical rows read NULL); without the flag it still
    fails loudly."""
    lake.table("silver.cust_ev").overwrite(spark.createDataFrame(
        [(1, "Ann")], "k int, name string"))
    spark.createDataFrame([(1, "Ann", "a@x.com"), (2, "Bob", "b@x.com")],
                          "k int, name string, email string") \
        .createOrReplaceTempView("src_ev")
    stmt = """
MERGE INTO silver.cust_ev AS tgt USING src_ev AS src ON tgt.k = src.k
WHEN MATCHED THEN UPDATE SET tgt.email = src.email
WHEN NOT MATCHED THEN
  INSERT (k, name, email) VALUES (src.k, src.name, src.email)"""
    with pytest.raises(Exception):
        lake.sql(stmt)             # no flag: unknown column fails
    evolving = LakehouseSql(spark, lake.root, merge_schema=True)
    evolving.sql(stmt)
    rows = sorted(map(tuple,
                      lake.table("silver.cust_ev").read().collect()))
    assert rows == [(1, "Ann", "a@x.com"), (2, "Bob", "b@x.com")]


def test_cardinality_duplicate_unmatched_keys_insert_fine(spark, lake):
    """Delta only raises when a target row actually multi-matches;
    duplicated source keys that match NO target row feed the NOT
    MATCHED insert branch and must pass (each inserts)."""
    lake.table("gold.card_t").overwrite(
        spark.createDataFrame([(1, 10)], "k int, v int"))
    # two NEW rows sharing key 5 (no target match) + one matched key 1
    spark.createDataFrame([(5, 50), (5, 51), (1, 11)], "k int, v int") \
        .createOrReplaceTempView("src_card")
    lake.sql("""
MERGE INTO gold.card_t AS tgt USING src_card AS src ON tgt.k = src.k
WHEN MATCHED THEN UPDATE SET tgt.v = src.v
WHEN NOT MATCHED THEN INSERT (k, v) VALUES (src.k, src.v)""")
    rows = sorted(map(tuple, lake.table("gold.card_t").read().collect()))
    assert rows == [(1, 11), (5, 50), (5, 51)]
    # but a duplicated key that DOES match a target row still raises
    spark.createDataFrame([(1, 100), (1, 101)], "k int, v int") \
        .createOrReplaceTempView("src_card")
    with pytest.raises(MergeCardinalityError):
        lake.sql("""
MERGE INTO gold.card_t AS tgt USING src_card AS src ON tgt.k = src.k
WHEN MATCHED THEN UPDATE SET tgt.v = src.v
WHEN NOT MATCHED THEN INSERT (k, v) VALUES (src.k, src.v)""")


def test_create_table_partitioned_by(spark, lake):
    """PARTITIONED BY in typed DDL and CTAS lays the table out
    hive-partitioned, so later partition-safe MERGEs hardlink."""
    lake.sql("""CREATE TABLE gold.part_t (k INT, month STRING, v DOUBLE)
                PARTITIONED BY (month)""")
    t = lake.table("gold.part_t")
    assert t.partition_by == ("month",)
    lake.sql("""CREATE TABLE gold.part_ctas PARTITIONED BY (m) AS
                SELECT 1 AS k, '2024-01' AS m""")
    assert lake.table("gold.part_ctas").partition_by == ("m",)
    assert lake.table("gold.part_ctas").read().count() == 1


def test_fusable_close_insert_guard_proofs():
    """Fusion safety: the close+insert pair fuses only when pass-1
    updates provably cannot re-establish the ON's target-only guard on
    rows outside the fused window."""
    from tb_lakehouse_enhanced_spark.sqlfront import (
        _fusable_close_insert,
    )

    def pair(close_extra="", on="tgt.k = src.k AND tgt.vt IS NULL",
             nmbs_set="tgt.vt = TIMESTAMP '2024-01-01 00:00:00'"):
        close = parse_merge(f"""
MERGE INTO db.t AS tgt USING v AS src ON {on}
WHEN MATCHED THEN UPDATE SET tgt.vt = TIMESTAMP '2024-01-01 00:00:00'
WHEN NOT MATCHED BY SOURCE AND tgt.vt IS NULL THEN
  UPDATE SET {nmbs_set}{close_extra}""")
        ins = parse_merge(f"""
MERGE INTO db.t AS tgt USING v AS src ON {on}
WHEN NOT MATCHED THEN INSERT (k, vt) VALUES (src.k, NULL)""")
        return close, ins

    assert _fusable_close_insert(*pair())
    # NMBS assigning the guard column a NULL literal could flip the
    # guard back on: must NOT fuse
    assert not _fusable_close_insert(*pair(nmbs_set="tgt.vt = NULL"))
    # ...same for a non-literal expression
    assert not _fusable_close_insert(
        *pair(nmbs_set="tgt.vt = tgt.other"))
    # a non-IS NULL guard whose column an NMBS clause touches: no proof
    assert not _fusable_close_insert(
        *pair(on="tgt.k = src.k AND tgt.flag = 1",
              nmbs_set="tgt.flag = 0"))
    # guard untouched by any NMBS assignment: fuses even if not IS NULL
    assert _fusable_close_insert(
        *pair(on="tgt.k = src.k AND tgt.flag = 1",
              nmbs_set="tgt.other = 1"))
    # different ON between the passes: no fusion
    c, _ = pair()
    _, i2 = pair(on="tgt.k = src.k")
    assert not _fusable_close_insert(c, i2)


def test_merge_pair_unfusable_falls_back_sequential(spark, lake):
    """A pair that fails the fusability proof still executes through
    merge_chain's sequential composition with correct semantics (one
    commit, state == statement-by-statement)."""
    lake.table("db.t_nf").overwrite(spark.createDataFrame(
        [(1, "a", None), (2, "b", None)],
        "k int, v string, vt timestamp"))
    spark.createDataFrame([(1, "A"), (3, "c")], "k int, v string") \
        .createOrReplaceTempView("src_nf")
    # NMBS sets the guard column to NULL -> unfusable shape
    close = """
MERGE INTO db.t_nf AS tgt USING src_nf AS src
ON tgt.k = src.k AND tgt.vt IS NULL
WHEN MATCHED AND tgt.v != src.v THEN
  UPDATE SET tgt.vt = TIMESTAMP '2024-01-02 00:00:00'
WHEN NOT MATCHED BY SOURCE AND tgt.vt IS NULL THEN
  UPDATE SET tgt.vt = NULL"""
    ins = """
MERGE INTO db.t_nf AS tgt USING src_nf AS src
ON tgt.k = src.k AND tgt.vt IS NULL
WHEN NOT MATCHED THEN INSERT (k, v, vt) VALUES (src.k, src.v, NULL)"""
    lake.merge_pair(close, ins)
    rows = sorted(map(tuple, lake.table("db.t_nf").read()
                      .select("k", "v").collect()))
    # k=1 closed then re-inserted with new value; k=2 NMBS'd (vt stays
    # NULL); k=3 fresh insert
    assert rows == [(1, "A"), (1, "a"), (2, "b"), (3, "c")]


def test_sql_merge_partitioned_scenario_hardlinks(spark):
    """The bench's partition-scoped SQL-MERGE scenario really takes the
    scoped route: the merge commit records exactly buckets 0 and 1 as
    rewritten, and an untouched bucket's files hardlink forward (same
    inode)."""
    import glob
    import os

    from tb_lakehouse_enhanced_spark.plans import scd_scenarios as scd
    from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable
    df = scd.sql_merge_partitioned_state(spark, "/root/testdata/sf0.001")
    # locate the managed table the scenario just wrote (its read path)
    path = df.inputFiles()[0]
    root = path[:path.index("/gold/fact_part")] + "/gold/fact_part"
    root = root.replace("file:", "")
    t = ManagedTable(spark, root)
    meta = t._commit(t.current_version())
    assert meta["partitions_rewritten"] == ["l_bucket=0", "l_bucket=1"]

    def inodes(ver, bucket):
        d = os.path.join(root, t._commit(ver)["dir"], f"l_bucket={bucket}")
        return {os.path.basename(p): os.stat(p).st_ino
                for p in glob.glob(os.path.join(d, "*.parquet"))}
    for b in (2, 7, 15):
        assert inodes(1, b) == inodes(0, b) and inodes(1, b), \
            f"bucket {b} should hardlink forward"
    assert inodes(1, 0) != inodes(0, 0)


def test_dml_with_correlated_exists(spark, lake):
    """Delta's full subquery-DML surface: correlated EXISTS / NOT
    EXISTS and scalar subqueries in UPDATE/DELETE WHERE execute with
    exact SQL semantics (Catalyst decorrelation over the snapshot
    view)."""
    lake.table("silver.ord").overwrite(spark.createDataFrame(
        [(1, "open", 10.0), (2, "open", 20.0), (3, "done", 30.0)],
        "oid int, status string, amt double"))
    lake.sql("CREATE TABLE silver.pay AS "
             "SELECT * FROM VALUES (1, 5.0), (1, 5.0), (3, 30.0) "
             "AS t(oid, paid)")
    # correlated EXISTS referencing the target by bare table name
    lake.sql("""
UPDATE silver.ord SET status = 'paid'
WHERE EXISTS (SELECT 1 FROM silver.pay p WHERE p.oid = ord.oid)""")
    rows = {r["oid"]: r["status"]
            for r in lake.table("silver.ord").read().collect()}
    assert rows == {1: "paid", 2: "open", 3: "paid"}
    # correlated NOT EXISTS + residual conjunct
    lake.sql("""
DELETE FROM silver.ord
WHERE NOT EXISTS (SELECT 1 FROM silver.pay p WHERE p.oid = ord.oid)
  AND status = 'open'""")
    assert {r["oid"] for r in lake.table("silver.ord").read().collect()} \
        == {1, 3}
    # scalar subquery comparison
    lake.sql("""
UPDATE silver.ord SET amt = 0.0
WHERE amt < (SELECT SUM(paid) FROM silver.pay p WHERE p.oid = ord.oid)""")
    amts = {r["oid"]: r["amt"]
            for r in lake.table("silver.ord").read().collect()}
    assert amts == {1: 10.0, 3: 30.0}  # 10 !< 10, 30 !< 30: unchanged
    lake.sql("""
UPDATE silver.ord SET amt = -1.0
WHERE amt <= (SELECT SUM(paid) FROM silver.pay p WHERE p.oid = ord.oid)""")
    amts = {r["oid"]: r["amt"]
            for r in lake.table("silver.ord").read().collect()}
    assert amts == {1: -1.0, 3: -1.0}
    # the transient bare-name snapshot view does not leak into the
    # session catalog...
    temps = {t.name for t in spark.catalog.listTables()
             if t.isTemporary}
    assert "ord" not in temps
    # ...and a PRE-EXISTING session temp view under the bare name is
    # restored after the DML instead of being clobbered
    spark.range(1).selectExpr("42 AS marker").createOrReplaceTempView("ord")
    lake.sql("""
DELETE FROM silver.ord
WHERE EXISTS (SELECT 1 FROM silver.pay p WHERE p.oid = ord.oid)""")
    assert lake.table("silver.ord").read().count() == 0
    assert [tuple(r) for r in spark.table("ord").collect()] == [(42,)]
    spark.catalog.dropTempView("ord")


def test_subquery_dml_partition_scoped(spark, lake):
    """Correlated-subquery DML rides the same partition-scoped rewrite
    core as plain-predicate UPDATE/DELETE: only partitions holding
    matches are rewritten, untouched partitions hardlink forward
    (inode-identical), and a no-match predicate commits nothing."""
    import os

    from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable
    t = ManagedTable(spark, f"{lake.root}/silver/pord",
                     partition_by=("bucket",))
    t.overwrite(spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0), (4, "c", 40.0)],
        "oid int, bucket string, amt double").repartition("bucket"))
    lake.sql("CREATE TABLE silver.ppay AS "
             "SELECT * FROM VALUES (1), (2) AS t(oid)")

    def inodes(ver, b):
        d = os.path.join(t.path, t._commit(ver)["dir"], f"bucket={b}")
        return {f: os.stat(os.path.join(d, f)).st_ino
                for f in os.listdir(d)}

    before = {b: inodes(0, b) for b in ("a", "b", "c")}
    lake.sql("""
UPDATE silver.pord SET amt = 0.0
WHERE EXISTS (SELECT 1 FROM silver.ppay p WHERE p.oid = pord.oid)""")
    assert t.current_version() == 1
    for b in ("b", "c"):
        assert inodes(1, b) == before[b], f"bucket {b} was rewritten"
    assert inodes(1, "a") != before["a"]
    amts = {r["oid"]: r["amt"] for r in t.read().collect()}
    assert amts == {1: 0.0, 2: 0.0, 3: 30.0, 4: 40.0}
    # a no-match subquery predicate is a no-op (no commit, like Delta)
    lake.sql("""
DELETE FROM silver.pord
WHERE EXISTS (SELECT 1 FROM silver.ppay p WHERE p.oid = -pord.oid)""")
    assert t.current_version() == 1
    lake.sql("""
DELETE FROM silver.pord
WHERE EXISTS (SELECT 1 FROM silver.ppay p WHERE p.oid = pord.oid)""")
    assert t.current_version() == 2
    assert {r["oid"] for r in t.read().collect()} == {3, 4}


def test_optimize_zorder_statement(spark, lake):
    """Delta's OPTIMIZE ... ZORDER BY statement maps onto
    optimize_layout: after clustering, min/max file stats become
    selective on BOTH zorder columns (files prune on either
    predicate)."""
    import random
    rnd = random.Random(7)
    rows = [(rnd.randrange(1000), rnd.randrange(1000), i)
            for i in range(4000)]
    lake.table("gold.zt").overwrite(
        spark.createDataFrame(rows, "a int, b int, i int")
        .repartition(8))
    lake.sql("OPTIMIZE gold.zt ZORDER BY (a, b)")
    t = lake.table("gold.zt")
    assert t._commit(t.current_version())["op"].startswith("OPTIMIZE")
    t.analyze(("a", "b"))
    # pruning is selective on both dimensions: a narrow range on
    # either column must keep only a strict subset of files
    kept_a = t.pruned_files("a", 0, 50)
    kept_b = t.pruned_files("b", 0, 50)
    total = len(t.read().inputFiles())
    assert kept_a is not None and kept_b is not None
    assert len(kept_a) < total and len(kept_b) < total
    # rows survive intact
    assert t.read().count() == 4000


def test_databricks_ddl_decorations_and_service_statements(spark, lake):
    """Databricks-flavored DDL decorations (USING DELTA, COMMENT,
    TBLPROPERTIES, column COMMENTs) parse; INSERT OVERWRITE replaces
    content; TRUNCATE empties; SHOW TABLES / DESCRIBE TABLE report the
    managed catalog."""
    lake.sql("""
CREATE TABLE gold.deco (
  id BIGINT GENERATED BY DEFAULT AS IDENTITY COMMENT 'surrogate; key',
  v STRING NOT NULL COMMENT 'payload'
) USING DELTA COMMENT 'decorated table'
  TBLPROPERTIES ('delta.appendOnly' = 'false')
  PARTITIONED BY (v)""")
    t = lake.table("gold.deco")
    assert t.partition_by == ("v",)
    assert lake._ddl_info(t)["identity"] == "id"
    with pytest.raises(ValueError, match="unsupported storage"):
        lake.sql("CREATE TABLE gold.bad (x INT) USING ICEBERG")
    # CTAS with decorations
    lake.sql("CREATE TABLE gold.deco2 USING DELTA TBLPROPERTIES "
             "('k'='v') AS SELECT 1 AS a")
    assert lake.table("gold.deco2").read().count() == 1

    lake.table("gold.seed").overwrite(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"))
    lake.sql("INSERT OVERWRITE gold.seed VALUES (9, 'z')")
    assert [tuple(r) for r in lake.table("gold.seed").read().collect()] \
        == [(9, "z")]
    lake.sql("INSERT OVERWRITE TABLE gold.seed (k, v) "
             "SELECT 7, 'q'")
    assert [tuple(r) for r in lake.table("gold.seed").read().collect()] \
        == [(7, "q")]
    lake.sql("TRUNCATE TABLE gold.seed")
    assert lake.table("gold.seed").read().count() == 0

    tables = {(r["namespace"], r["tableName"])
              for r in lake.sql("SHOW TABLES IN gold").collect()}
    assert ("gold", "seed") in tables and ("gold", "deco") in tables
    desc = {r["col_name"]: r["data_type"]
            for r in lake.sql("DESCRIBE TABLE gold.deco2").collect()}
    assert desc == {"a": "int"}


# ------------------------------------------- verbatim medallion flow -------

def _notebook_sql_statements(name: str) -> list[str]:
    """Extract every triple-quoted ``spark.sql(\"\"\"...\"\"\")``
    statement text from a reference notebook, VERBATIM."""
    import re as _re
    text = open(f"/root/reference/notebooks/{name}").read()
    return [m.group(1).strip() for m in
            _re.finditer(r'spark\.sql\("""(.*?)"""\)', text, _re.DOTALL)]


def test_verbatim_medallion_flow_end_to_end(spark, lake):
    """The WHOLE reference pipeline as verbatim statement texts: the
    init notebook's DDL, then the silver SCD2 MERGE pairs
    (22_ETL_Silver_PySpark.py), the gold dim MERGEs
    (33_ETL_Gold_Dim_PySpark.py), and the fact MERGE
    (34_ETL_Gold_Fact_PySpark.py) — every SQL string extracted from
    the notebooks, executed unchanged against managed tables, with the
    clock pinned per load."""
    for db in ("bronze", "silver", "gold"):
        lake.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    lake.now = T0
    for cell in _init_sql_cells():
        lake.run_script(cell)

    def preamble(schema):
        # each ETL notebook's catalog-detection preamble, verbatim
        # (22_ETL_Silver:16-34 and identically in 33/34; widgets
        # elided): SHOW CATALOGS -> pick -> USE CATALOG + USE SCHEMA
        catalogs = [row.catalog
                    for row in lake.sql("SHOW CATALOGS").collect()]
        unity_catalogs = [c for c in catalogs if c != "hive_metastore"]
        if len(unity_catalogs) == 1:
            default_catalog = unity_catalogs[0]
        else:
            default_catalog = next(
                (c for c in unity_catalogs if c.startswith("dbw_")),
                "hive_metastore")
        catalog = default_catalog
        lake.sql(f"USE CATALOG {catalog}")
        lake.sql(f"USE SCHEMA {schema}")

    s22 = _notebook_sql_statements("22_ETL_Silver_PySpark.py")
    s33 = _notebook_sql_statements("33_ETL_Gold_Dim_PySpark.py")
    s34 = _notebook_sql_statements("34_ETL_Gold_Fact_PySpark.py")
    assert len(s22) == 8 and len(s33) == 2 and len(s34) == 1
    preamble("silver")
    by_target = {}
    for stmt in s22:
        tgt = parse_merge(stmt).target
        by_target.setdefault(tgt, []).append(stmt)

    ts = F.lit("2020-01-01 00:00:00").cast("timestamp")

    def views(addrs, custs):
        spark.createDataFrame(
            [(i, f"{n} St", "apt 1", c, "WA", "US", "98011", f"g-{i}", None)
             for i, n, c in addrs],
            "address_id int, address_line1 string, address_line2 string,"
            "city string, state_province string, country_region string,"
            "postal_code string, rowguid string, modified_date timestamp"
        ).withColumn("modified_date", ts).createOrReplaceTempView(
            "src_address")
        spark.createDataFrame(
            [(i, False, "Mr", fn, "Q", "Doe", None, "Acme", "sp", None,
              "555", "h", "s", f"cg-{i}", None) for i, fn in custs],
            "customer_id int, name_style boolean, title string,"
            "first_name string, middle_name string, last_name string,"
            "suffix string, company_name string, sales_person string,"
            "email_address string, phone string, password_hash string,"
            "password_salt string, rowguid string,"
            "modified_date timestamp"
        ).withColumn("modified_date", ts).createOrReplaceTempView(
            "src_customer")

    def order_views():
        spark.createDataFrame(
            [(100, 1, "2024-03-05 00:00:00", None, None, 1, True,
              "SO100", None, "AC1", 1, 1, 1, "truck", None,
              10.0, 1.0, 2.0, 13.0, None, "og", None)],
            "sales_order_id int, revision_number smallint,"
            "order_date string, due_date timestamp, ship_date timestamp,"
            "status smallint, online_order_flag boolean,"
            "sales_order_number string, purchase_order_number string,"
            "account_number string, customer_id int,"
            "ship_to_address_id int, bill_to_address_id int,"
            "ship_method string, credit_card_approval_code string,"
            "sub_total double, tax_amt double, freight double,"
            "total_due double, comment string, rowguid string,"
            "modified_date timestamp") \
            .withColumn("order_date", F.col("order_date").cast("timestamp")) \
            .withColumn("sub_total", F.col("sub_total").cast("decimal(19,4)")) \
            .withColumn("tax_amt", F.col("tax_amt").cast("decimal(19,4)")) \
            .withColumn("freight", F.col("freight").cast("decimal(19,4)")) \
            .withColumn("total_due", F.col("total_due").cast("decimal(19,4)")) \
            .createOrReplaceTempView("src_soh")
        spark.createDataFrame(
            [(100, 1001, 2, 7, 5.0, 0.0, 10.0, "dg", None),
             (100, 1002, 1, 8, 3.0, 0.0, 3.0, "dg2", None)],
            "sales_order_id int, sales_order_detail_id int,"
            "order_qty smallint, product_id int, unit_price double,"
            "unit_price_discount double, line_total double,"
            "rowguid string, modified_date timestamp") \
            .withColumn("unit_price", F.col("unit_price").cast("decimal(19,4)")) \
            .withColumn("unit_price_discount",
                        F.col("unit_price_discount").cast("decimal(19,4)")) \
            .withColumn("line_total", F.col("line_total").cast("decimal(38,6)")) \
            .createOrReplaceTempView("src_sod")

    # ---- load 1 -----------------------------------------------------
    views(addrs=[(1, "Main", "Bothell"), (2, "Oak", "Surrey")],
          custs=[(1, "Ann"), (2, "Bob")])
    order_views()
    for tgt, pair in by_target.items():
        for stmt in pair:
            lake.sql(stmt)
    assert lake.table("silver.address").read().count() == 2
    assert lake.table("silver.customer").read().count() == 2
    # gold dims (sources are the silver current slices, reference
    # 33:44-56 selectExpr shapes driven through the front-end's
    # SELECT binding)
    lake.sql("""
SELECT CAST(address_id AS INT) AS geo_address_id,
  COALESCE(TRY_CAST(address_line1 AS STRING), 'N/A') AS geo_address_line_1,
  COALESCE(TRY_CAST(address_line2 AS STRING), 'N/A') AS geo_address_line_2,
  COALESCE(TRY_CAST(city AS STRING), 'N/A') AS geo_city,
  COALESCE(TRY_CAST(state_province AS STRING), 'N/A') AS geo_state_province,
  COALESCE(TRY_CAST(country_region AS STRING), 'N/A') AS geo_country_region,
  COALESCE(TRY_CAST(postal_code AS STRING), 'N/A') AS geo_postal_code
FROM silver.address WHERE _tf_valid_to IS NULL
""").createOrReplaceTempView("src_geo")
    lake.sql("""
SELECT CAST(customer_id AS INT) AS cust_customer_id,
  COALESCE(TRY_CAST(title AS STRING), 'N/A') AS cust_title,
  COALESCE(TRY_CAST(first_name AS STRING), 'N/A') AS cust_first_name,
  COALESCE(TRY_CAST(middle_name AS STRING), 'N/A') AS cust_middle_name,
  COALESCE(TRY_CAST(last_name AS STRING), 'N/A') AS cust_last_name,
  COALESCE(TRY_CAST(suffix AS STRING), 'N/A') AS cust_suffix,
  COALESCE(TRY_CAST(company_name AS STRING), 'N/A') AS cust_company_name,
  COALESCE(TRY_CAST(sales_person AS STRING), 'N/A') AS cust_sales_person,
  COALESCE(TRY_CAST(email_address AS STRING), 'N/A') AS cust_email_address,
  COALESCE(TRY_CAST(phone AS STRING), 'N/A') AS cust_phone
FROM silver.customer WHERE _tf_valid_to IS NULL
""").createOrReplaceTempView("src_cust")
    preamble("gold")                  # 33/34 switch the schema context
    for stmt in s33:
        lake.sql(stmt)
    geo = {r["geo_address_id"]: r["_tf_dim_geography_id"]
           for r in lake.table("gold.dim_geography").read().collect()}
    assert set(geo) == {0, 1, 2}            # -9 seed (addr 0) + 2 rows
    assert geo[0] == -9 and sorted(geo[v] for v in (1, 2)) == [1, 2]

    # fact: the 34:44-83 join chain through the SELECT binding
    lake.sql("""
SELECT CAST(soh.sales_order_id AS INT) AS sales_order_id,
  CAST(sod.sales_order_detail_id AS INT) AS sales_order_detail_id,
  10000 * YEAR(soh.order_date) + 100 * MONTH(soh.order_date)
    + DAY(soh.order_date) AS _tf_dim_calendar_id,
  COALESCE(cust._tf_dim_customer_id, -9) AS _tf_dim_customer_id,
  COALESCE(geo._tf_dim_geography_id, -9) AS _tf_dim_geography_id,
  COALESCE(CAST(sod.order_qty AS SMALLINT), 0) AS sales_order_qty,
  COALESCE(CAST(sod.unit_price AS DECIMAL(19,4)), 0) AS sales_unit_price,
  COALESCE(CAST(sod.unit_price_discount AS DECIMAL(19,4)), 0)
    AS sales_unit_price_discount,
  COALESCE(CAST(sod.line_total AS DECIMAL(38,6)), 0) AS sales_line_total
FROM silver.sales_order_detail sod
LEFT JOIN silver.sales_order_header soh
  ON sod.sales_order_id = soh.sales_order_id
     AND soh._tf_valid_to IS NULL
LEFT JOIN silver.customer c
  ON soh.customer_id = c.customer_id AND c._tf_valid_to IS NULL
LEFT JOIN gold.dim_customer cust
  ON c.customer_id = cust.cust_customer_id
LEFT JOIN silver.address a
  ON soh.bill_to_address_id = a.address_id AND a._tf_valid_to IS NULL
LEFT JOIN gold.dim_geography geo
  ON a.address_id = geo.geo_address_id
WHERE sod._tf_valid_to IS NULL
""").createOrReplaceTempView("_tmp_fact_sales")
    lake.sql(s34[0])
    fact = lake.table("gold.fact_sales").read().collect()
    assert len(fact) == 2
    ids = sorted(r["_tf_fact_sales_id"] for r in fact)
    assert ids == [1, 2]                    # ALWAYS identity assigned
    assert all(r["_tf_dim_calendar_id"] == 20240305 for r in fact)
    assert set(lake.validate_foreign_keys("gold.fact_sales").values()) \
        == {0}

    # ---- load 2: change addr 1, drop addr 2, add addr 3 -------------
    lake.now = T1
    views(addrs=[(1, "Main", "Irving"), (3, "Pine", "Bothell")],
          custs=[(1, "Ann"), (2, "Bob")])
    for stmt in by_target["silver.address"]:
        lake.sql(stmt)
    addr = lake.table("silver.address").read().collect()
    current = {r["address_id"]: r["city"] for r in addr
               if r["_tf_valid_to"] is None}
    closed = {r["address_id"]: r["city"] for r in addr
              if r["_tf_valid_to"] is not None}
    assert current == {1: "Irving", 3: "Bothell"}
    assert closed == {1: "Bothell", 2: "Surrey"}
    # silver identities are GENERATED ALWAYS: all distinct, all >= 1
    tids = [r["_tf_id"] for r in addr]
    assert len(set(tids)) == len(tids) and min(tids) >= 1


def test_merge_update_set_star(spark, lake):
    """Delta's UPDATE SET * / INSERT * shorthand pair: every source
    column copies to its same-named target column; target-only columns
    pass through on update."""
    lake.table("gold.star_t").overwrite(spark.createDataFrame(
        [(1, "a", 0.5), (2, "b", 0.6)], "k int, v string, keepme double"))
    spark.createDataFrame([(1, "A"), (3, "c")], "k int, v string") \
        .createOrReplaceTempView("src_star")
    lake.sql("""
MERGE INTO gold.star_t AS tgt USING src_star AS src ON tgt.k = src.k
WHEN MATCHED THEN UPDATE SET *
WHEN NOT MATCHED THEN INSERT *""")
    rows = sorted(map(tuple, lake.table("gold.star_t").read().collect()))
    assert rows == [(1, "A", 0.5), (2, "b", 0.6), (3, "c", None)]
    with pytest.raises(ValueError, match="NOT MATCHED BY SOURCE"):
        lake.sql("""
MERGE INTO gold.star_t AS tgt USING src_star AS src ON tgt.k = src.k
WHEN NOT MATCHED BY SOURCE THEN UPDATE SET *""")


# -- table_changes() TVF (Delta CDF SQL surface) ------------------------------

def test_table_changes_tvf(lake):
    """SELECT ... FROM table_changes('db.t', s[, e]) binds the
    commit-log-driven per-commit feed, classified on the recorded
    PRIMARY KEY."""
    spark = lake.spark
    lake.sql("CREATE SCHEMA IF NOT EXISTS cdc")
    lake.sql("CREATE TABLE cdc.acct (id BIGINT PRIMARY KEY, "
             "bal BIGINT NOT NULL)")
    lake.sql("INSERT INTO cdc.acct VALUES (1, 100), (2, 200)")      # v1
    lake.sql("UPDATE cdc.acct SET bal = 150 WHERE id = 1")          # v2
    lake.sql("DELETE FROM cdc.acct WHERE id = 2")                   # v3

    rows = {(r["id"], r["bal"], r["_change_type"], r["_commit_version"])
            for r in lake.sql(
                "SELECT * FROM table_changes('cdc.acct', 1, 3)").collect()}
    assert rows == {
        (1, 100, "insert", 1), (2, 200, "insert", 1),
        (1, 100, "update_preimage", 2), (1, 150, "update_postimage", 2),
        (2, 200, "delete", 3),
    }
    # open upper bound = table head; projections/filters compose
    upd = lake.sql(
        "SELECT id, bal FROM table_changes('cdc.acct', 2) "
        "WHERE _change_type = 'update_postimage'").collect()
    assert [(r["id"], r["bal"]) for r in upd] == [(1, 150)]


def test_show_tblproperties_and_describe_detail_properties(lake):
    lake.sql("CREATE SCHEMA IF NOT EXISTS p")
    lake.sql("CREATE TABLE p.t (id BIGINT, v BIGINT)")
    lake.sql("ALTER TABLE p.t SET TBLPROPERTIES "
             "('delta.enableChangeDataFeed' = 'true', 'owner' = 'etl')")
    props = {r["key"]: r["value"]
             for r in lake.sql("SHOW TBLPROPERTIES p.t").collect()}
    assert props == {"delta.enableChangeDataFeed": "true", "owner": "etl"}
    lake.sql("INSERT INTO p.t VALUES (1, 1)")
    d = lake.sql("DESCRIBE DETAIL p.t").collect()[0]
    assert d["properties"]["owner"] == "etl"


def test_table_changes_tvf_timestamp_bounds(lake):
    """Quoted bounds are timestamps (Delta's spelling): the start
    resolves to the earliest commit at/after it, the end to the newest
    at/before."""
    import time
    spark = lake.spark
    lake.sql("CREATE SCHEMA IF NOT EXISTS cdt")
    lake.sql("CREATE TABLE cdt.t (id BIGINT PRIMARY KEY, v BIGINT)")
    lake.sql("INSERT INTO cdt.t VALUES (1, 10)")                    # v1
    time.sleep(0.05)
    import datetime as dt
    cut = dt.datetime.now().isoformat()
    time.sleep(0.05)
    lake.sql("INSERT INTO cdt.t VALUES (2, 20)")                    # v2
    lake.sql("UPDATE cdt.t SET v = 21 WHERE id = 2")                # v3
    rows = {(r["id"], r["_change_type"], r["_commit_version"])
            for r in lake.sql(
                f"SELECT * FROM table_changes('cdt.t', '{cut}')").collect()}
    assert rows == {(2, "insert", 2),
                    (2, "update_preimage", 3),
                    (2, "update_postimage", 3)}
    end = dt.datetime.now().isoformat()
    mixed = {(r["id"], r["_commit_version"]) for r in lake.sql(
        f"SELECT * FROM table_changes('cdt.t', 2, '{end}')").collect()}
    assert mixed == {(2, 2), (2, 3)}


def test_create_table_shallow_clone_statement(lake):
    import os
    lake.sql("CREATE SCHEMA IF NOT EXISTS cl")
    lake.sql("CREATE TABLE cl.src (id BIGINT, v BIGINT)")
    lake.sql("INSERT INTO cl.src VALUES (1, 10), (2, 20)")       # v1
    lake.sql("UPDATE cl.src SET v = 99 WHERE id = 2")            # v2
    lake.sql("CREATE TABLE cl.dup SHALLOW CLONE cl.src")
    got = {(r["id"], r["v"])
           for r in lake.sql("SELECT * FROM cl.dup").collect()}
    assert got == {(1, 10), (2, 99)}
    # zero-copy: the clone's v0 files are hardlinks of the source's
    src_t, dup_t = lake.table("cl.src"), lake.table("cl.dup")
    src_inodes = {os.stat(p).st_ino
                  for p in src_t._files_rel(src_t.current_version()).values()}
    dup_inodes = {os.stat(p).st_ino
                  for p in dup_t._files_rel(0).values()}
    assert dup_inodes <= src_inodes
    # at an historical version; writers stay independent
    lake.sql("CREATE TABLE cl.old SHALLOW CLONE cl.src VERSION AS OF 1")
    got = {(r["id"], r["v"])
           for r in lake.sql("SELECT * FROM cl.old").collect()}
    assert got == {(1, 10), (2, 20)}
    lake.sql("INSERT INTO cl.dup VALUES (3, 30)")
    assert lake.sql("SELECT * FROM cl.src").count() == 2
    # IF NOT EXISTS no-ops on an existing clone
    lake.sql("CREATE TABLE IF NOT EXISTS cl.dup SHALLOW CLONE cl.src")
    assert lake.sql("SELECT * FROM cl.dup").count() == 3


def test_restore_to_timestamp(lake):
    import datetime as dt
    import time
    lake.sql("CREATE SCHEMA IF NOT EXISTS rs")
    lake.sql("CREATE TABLE rs.t (id BIGINT, v BIGINT)")
    lake.sql("INSERT INTO rs.t VALUES (1, 10)")                 # v1
    time.sleep(0.05)
    cut = dt.datetime.now().isoformat()
    time.sleep(0.05)
    lake.sql("UPDATE rs.t SET v = 99 WHERE id = 1")             # v2
    lake.sql(f"RESTORE TABLE rs.t TO TIMESTAMP AS OF '{cut}'")  # -> v1
    assert [(r["id"], r["v"])
            for r in lake.sql("SELECT * FROM rs.t").collect()] == [(1, 10)]


def test_merge_pair_duplicate_source_aborts_fused_commit(spark, lake):
    """A FUSABLE pair whose source carries duplicate keys must abort
    the speculative fused commit pre-publish (r13: the uniqueness gate
    runs concurrently with the fused write) and re-run sequentially:
    state identical to statement-by-statement, no orphan version dir,
    exactly one visible commit for the pair."""
    import os

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    src = _orders_src(orders, 0)                # keys %10 != 7
    dup_src = src.unionByName(src.limit(7))     # 7 duplicate keys
    empty = (src.limit(0)
             .withColumn("_tf_valid_from", F.lit(None).cast("timestamp"))
             .withColumn("_tf_valid_to", F.lit(None).cast("timestamp"))
             .withColumn("_tf_create_date", F.lit(None).cast("timestamp"))
             .withColumn("_tf_update_date", F.lit(None).cast("timestamp")))
    # seed keys DISJOINT from the source (%10 == 7): the duplicates are
    # all unmatched, so sequential semantics are well-defined (a
    # matched duplicate raises MergeCardinalityError on either path)
    seed = (orders.select("o_orderkey", "o_custkey", "o_orderstatus",
                          "o_totalprice")
            .filter(F.col("o_orderkey") % 10 == 7).limit(50))
    for c in ("_tf_valid_from", "_tf_valid_to",
              "_tf_create_date", "_tf_update_date"):
        seed = seed.withColumn(c, F.lit(None).cast("timestamp"))
    # sequential reference
    lake.now = T0
    lake.table("silver.orders").overwrite(empty)
    lake.table("silver.orders").overwrite(seed)
    dup_src.createOrReplaceTempView("src_orders")
    lake.sql(SCD2_CLOSE)
    lake.sql(SCD2_INSERT)
    cols = sorted(lake.table("silver.orders").read().columns)

    def _key(r):
        return tuple((x is None, x) for x in r)
    want = sorted(map(tuple, lake.table("silver.orders").read()
                      .select(*cols).collect()), key=_key)
    # fused-path entry with the same duplicate source
    fused = LakehouseSql(spark, lake.root + "_dupfused")
    fused.now = T0
    fused.table("silver.orders").overwrite(empty)
    fused.table("silver.orders").overwrite(seed)
    base_v = fused.table("silver.orders").current_version()
    dup_src.createOrReplaceTempView("src_orders")
    fused.merge_pair(SCD2_CLOSE, SCD2_INSERT)
    t = fused.table("silver.orders")
    got = sorted(map(tuple, t.read().select(*cols).collect()), key=_key)
    assert got == want and len(got) > 50
    # one commit for the pair (the sequential composition also folds
    # both passes into a single commit and tags it fused=len(specs)),
    # and the aborted speculative dir was cleaned up before the
    # fallback rewrote it
    assert t.current_version() == base_v + 1
    dirs = [d for d in os.listdir(t.path)
            if d.startswith(f"v{base_v + 1}")]
    assert len(dirs) == 1
