"""Extended TPC-H-style consumption queries (SURVEY.md §2.4/§2.11 breadth).

The reference's consumption surface is a Power BI star-schema dashboard
(reference dashboard_example.pbix: measures "Total Ventes" / "Nombre
Commandes"); q1/q3/q5/q6/q14 in plans/queries.py cover its aggregate
shapes. This module widens the analytic surface to the rest of the TPC-H
patterns expressible over the driver's tables: correlated EXISTS /
NOT EXISTS (semi/anti joins), scalar subqueries, HAVING pushups,
OR-of-ANDs pushdown predicates, groupwise-max, and histogram-of-counts.

The synthetic schema lacks partsupp and some lineitem/customer columns
(l_commitdate/l_receiptdate/l_shipmode, c_phone/c_address, o_comment);
queries needing them are adapted and suffixed ``_style``:
- q4_style / q21_style: "late delivery" (commit<receipt) becomes
  ``l_returnflag = 'R'`` — same semi/anti-join plan shape.
- q9_style: ps_supplycost proxied by p_retailprice.
- q16_style: the part-supplier relation is derived from lineitem.
- q19_style / q22_style: predicate constants adapted to available
  columns (p_size/l_quantity bands; country code from c_custkey).

Exactness rules (see ARCHITECTURE.md): money math in DECIMAL end-to-end,
final aggregate outputs cast to DOUBLE on both engines; avg-threshold
comparisons are cross-multiplied (qty * 5 * cnt < sum) so no engine ever
divides; only final ratios divide, in IEEE double.

All registered below the 50-query oracle fold (driver checks the prefix;
these are judge/bench surface) but every one carries a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .queries import _REV_SQL, _rev, _t, q

_D = "decimal(18,4)"


def _dec(c):
    return F.col(c).cast(_D)


@q("tpch_q4_style", """
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem li
              WHERE li.l_orderkey = o.o_orderkey AND li.l_returnflag = 'R')
GROUP BY o.o_orderpriority
""")
def tpch_q4_style(spark, sf_dir):
    """Order-priority checking (TPC-H Q4 shape): correlated EXISTS ->
    left-semi join; the probe side is pre-filtered so the semi join's
    build input is a fraction of lineitem."""
    o = (_t(spark, sf_dir, "orders")
         .filter((F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                 & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (o.join(li, o["o_orderkey"] == li["l_orderkey"], "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count")))


@q("tpch_q7", f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(YEAR(li.l_shipdate) AS INTEGER) AS l_year,
       CAST(CAST(SUM({_REV_SQL}) AS DECIMAL(38,8)) AS DOUBLE) AS revenue
FROM lineitem li
  JOIN orders o ON li.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON li.l_suppkey = s.s_suppkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND li.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND li.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1, 2, 3
""")
def tpch_q7(spark, sf_dir):
    """Volume shipping between two nations (TPC-H Q7): the two nation
    dims broadcast; the disjunctive nation pair predicate prunes after
    the broadcast joins, before the aggregate shuffle."""
    li = (_t(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
          .alias("li"))
    o = _t(spark, sf_dir, "orders").alias("o")
    c = _t(spark, sf_dir, "customer").alias("c")
    s = _t(spark, sf_dir, "supplier").alias("s")
    n1 = _t(spark, sf_dir, "nation").alias("n1")
    n2 = _t(spark, sf_dir, "nation").alias("n2")
    pair = (((F.col("n1.n_name") == "NATION_1") & (F.col("n2.n_name") == "NATION_2"))
            | ((F.col("n1.n_name") == "NATION_2") & (F.col("n2.n_name") == "NATION_1")))
    return (li.join(o, F.col("li.l_orderkey") == F.col("o.o_orderkey"))
            .join(c, F.col("o.o_custkey") == F.col("c.c_custkey"))
            .join(s, F.col("li.l_suppkey") == F.col("s.s_suppkey"))
            .join(F.broadcast(n1), F.col("s.s_nationkey") == F.col("n1.n_nationkey"))
            .join(F.broadcast(n2), F.col("c.c_nationkey") == F.col("n2.n_nationkey"))
            .filter(pair)
            .groupBy(F.col("n1.n_name").alias("supp_nation"),
                     F.col("n2.n_name").alias("cust_nation"),
                     F.year("li.l_shipdate").cast("int").alias("l_year"))
            .agg(F.sum(_rev("li.l_extendedprice", "li.l_discount"))
                 .cast("decimal(38,8)").cast("double").alias("revenue")))


@q("tpch_q8", f"""
SELECT CAST(YEAR(o.o_orderdate) AS INTEGER) AS o_year,
       CAST(CAST(SUM(CASE WHEN n2.n_name = 'NATION_5' THEN {_REV_SQL}
                          ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(38,8)) AS DOUBLE)
       / CAST(CAST(SUM({_REV_SQL}) AS DECIMAL(38,8)) AS DOUBLE) AS mkt_share
FROM lineitem li
  JOIN part p ON p.p_partkey = li.l_partkey
  JOIN orders o ON li.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON li.l_suppkey = s.s_suppkey
  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
  JOIN region r ON n1.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1
""")
def tpch_q8(spark, sf_dir):
    """National market share (TPC-H Q8): conditional share-of-total per
    year. Sums stay decimal-exact; only the final share divides, in
    double."""
    li = _t(spark, sf_dir, "lineitem").alias("li")
    p = (_t(spark, sf_dir, "part")
         .filter(F.col("p_type") == "PROMO").alias("p"))
    o = (_t(spark, sf_dir, "orders")
         .filter((F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                 & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")))
         .alias("o"))
    c = _t(spark, sf_dir, "customer").alias("c")
    s = _t(spark, sf_dir, "supplier").alias("s")
    n1 = _t(spark, sf_dir, "nation").alias("n1")
    n2 = _t(spark, sf_dir, "nation").alias("n2")
    r = (_t(spark, sf_dir, "region")
         .filter(F.col("r_name") == "ASIA").alias("r"))
    rev = _rev("li.l_extendedprice", "li.l_discount")
    national = F.when(F.col("n2.n_name") == "NATION_5", rev) \
        .otherwise(F.lit(0).cast(_D))
    return (li.join(p, F.col("p.p_partkey") == F.col("li.l_partkey"))
            .join(o, F.col("li.l_orderkey") == F.col("o.o_orderkey"))
            .join(c, F.col("o.o_custkey") == F.col("c.c_custkey"))
            .join(s, F.col("li.l_suppkey") == F.col("s.s_suppkey"))
            .join(F.broadcast(n1), F.col("c.c_nationkey") == F.col("n1.n_nationkey"))
            .join(F.broadcast(n2), F.col("s.s_nationkey") == F.col("n2.n_nationkey"))
            .join(F.broadcast(r), F.col("n1.n_regionkey") == F.col("r.r_regionkey"))
            .groupBy(F.year("o.o_orderdate").cast("int").alias("o_year"))
            .agg((F.sum(national).cast("decimal(38,8)").cast("double")
                  / F.sum(rev).cast("decimal(38,8)").cast("double"))
                 .alias("mkt_share")))


@q("tpch_q9_style", """
SELECT n.n_name AS nation, CAST(YEAR(o.o_orderdate) AS INTEGER) AS o_year,
       CAST(CAST(SUM(CAST(li.l_extendedprice AS DECIMAL(18,4))
                     * (CAST(1 AS DECIMAL(18,4)) - CAST(li.l_discount AS DECIMAL(18,4)))
                     - CAST(p.p_retailprice AS DECIMAL(18,4))
                       * CAST(li.l_quantity AS DECIMAL(18,4)))
            AS DECIMAL(38,8)) AS DOUBLE) AS sum_profit
FROM lineitem li
  JOIN part p ON p.p_partkey = li.l_partkey
  JOIN supplier s ON li.l_suppkey = s.s_suppkey
  JOIN orders o ON li.l_orderkey = o.o_orderkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%r%'
GROUP BY 1, 2
""")
def tpch_q9_style(spark, sf_dir):
    """Product-type profit (TPC-H Q9 shape; no partsupp in the synthetic
    schema, so ps_supplycost is proxied by p_retailprice). Profit stays
    decimal end-to-end until the final double cast."""
    li = _t(spark, sf_dir, "lineitem").alias("li")
    p = (_t(spark, sf_dir, "part")
         .filter(F.col("p_name").like("%r%")).alias("p"))
    s = _t(spark, sf_dir, "supplier").alias("s")
    o = _t(spark, sf_dir, "orders").alias("o")
    n = _t(spark, sf_dir, "nation").alias("n")
    one = F.lit(1).cast(_D)
    profit = (F.col("li.l_extendedprice").cast(_D)
              * (one - F.col("li.l_discount").cast(_D))
              - F.col("p.p_retailprice").cast(_D)
              * F.col("li.l_quantity").cast(_D))
    return (li.join(p, F.col("p.p_partkey") == F.col("li.l_partkey"))
            .join(s, F.col("li.l_suppkey") == F.col("s.s_suppkey"))
            .join(o, F.col("li.l_orderkey") == F.col("o.o_orderkey"))
            .join(F.broadcast(n), F.col("s.s_nationkey") == F.col("n.n_nationkey"))
            .groupBy(F.col("n.n_name").alias("nation"),
                     F.year("o.o_orderdate").cast("int").alias("o_year"))
            .agg(F.sum(profit).cast("decimal(38,8)").cast("double")
                 .alias("sum_profit")))


@q("tpch_q10", f"""
SELECT c.c_custkey, c.c_name,
       CAST(CAST(SUM({_REV_SQL}) AS DECIMAL(38,8)) AS DOUBLE) AS revenue,
       c.c_acctbal, n.n_name
FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem li ON li.l_orderkey = o.o_orderkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND li.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""")
def tpch_q10(spark, sf_dir):
    """Returned-item reporting (TPC-H Q10): top-20 customers by lost
    revenue in a quarter."""
    c = _t(spark, sf_dir, "customer").alias("c")
    o = (_t(spark, sf_dir, "orders")
         .filter((F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
                 & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp")))
         .alias("o"))
    li = (_t(spark, sf_dir, "lineitem")
          .filter(F.col("l_returnflag") == "R").alias("li"))
    n = _t(spark, sf_dir, "nation").alias("n")
    return (li.join(o, F.col("li.l_orderkey") == F.col("o.o_orderkey"))
            .join(c, F.col("o.o_custkey") == F.col("c.c_custkey"))
            .join(F.broadcast(n), F.col("c.c_nationkey") == F.col("n.n_nationkey"))
            .groupBy(F.col("c.c_custkey").alias("c_custkey"),
                     F.col("c.c_name").alias("c_name"),
                     F.col("c.c_acctbal").alias("c_acctbal"),
                     F.col("n.n_name").alias("n_name"))
            .agg(F.sum(_rev("li.l_extendedprice", "li.l_discount"))
                 .cast("decimal(38,8)").cast("double").alias("revenue"))
            .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
            .orderBy(F.desc("revenue"), F.asc("c_custkey")).limit(20))


@q("tpch_q13", """
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey)
GROUP BY c_count
""")
def tpch_q13(spark, sf_dir):
    """Customer order-count distribution (TPC-H Q13): two-level
    aggregate — per-customer counts, then a histogram of the counts.
    The second aggregate's input is one row per customer, so the heavy
    shuffle happens exactly once."""
    c = _t(spark, sf_dir, "customer").alias("c")
    o = _t(spark, sf_dir, "orders").alias("o")
    per_cust = (c.join(o, F.col("c.c_custkey") == F.col("o.o_custkey"), "left_outer")
                .groupBy("c.c_custkey")
                .agg(F.count("o.o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist")))


@q("tpch_q15", f"""
WITH revenue AS (
  SELECT li.l_suppkey AS supplier_no,
         SUM({_REV_SQL}) AS total_rev
  FROM lineitem li
  WHERE li.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND li.l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY li.l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       CAST(CAST(r.total_rev AS DECIMAL(38,8)) AS DOUBLE) AS total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue)
""")
def tpch_q15(spark, sf_dir):
    """Top supplier (TPC-H Q15): groupwise max over a derived revenue
    view. The max is taken on the EXACT decimal sum (double would make
    the equality engine-dependent); the scalar max broadcasts back as a
    1-row join, not a driver collect."""
    li = (_t(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))))
    s = _t(spark, sf_dir, "supplier")
    rev = (li.groupBy(F.col("l_suppkey").alias("supplier_no"))
           .agg(F.sum(_rev()).alias("total_rev")))
    mx = rev.agg(F.max("total_rev").alias("_mx"))
    return (rev.join(F.broadcast(mx), rev["total_rev"] == mx["_mx"])
            .join(s, s["s_suppkey"] == rev["supplier_no"])
            .select("s_suppkey", "s_name",
                    F.col("total_rev").cast("decimal(38,8)").cast("double")
                    .alias("total_revenue")))


@q("tpch_q16_style", """
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT li.l_suppkey) AS supplier_cnt
FROM part p JOIN lineitem li ON p.p_partkey = li.l_partkey
WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
GROUP BY p.p_brand, p.p_type, p.p_size
""")
def tpch_q16_style(spark, sf_dir):
    """Part-supplier relationship counting (TPC-H Q16 shape; the
    synthetic schema has no partsupp, so the relation is derived from
    lineitem). NOT-equal + IN-list predicates push into the part scan;
    the distinct count shuffles (brand,type,size,suppkey) once."""
    p = (_t(spark, sf_dir, "part")
         .filter((F.col("p_brand") != "Brand#1")
                 & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
         .alias("p"))
    li = _t(spark, sf_dir, "lineitem").alias("li")
    return (li.join(F.broadcast(p), F.col("p.p_partkey") == F.col("li.l_partkey"))
            .groupBy(F.col("p.p_brand").alias("p_brand"),
                     F.col("p.p_type").alias("p_type"),
                     F.col("p.p_size").alias("p_size"))
            .agg(F.countDistinct("li.l_suppkey").alias("supplier_cnt")))


@q("tpch_q17_style", """
SELECT CAST(CAST(SUM(CAST(li.l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE)
       / 7.0 AS avg_yearly
FROM lineitem li
  JOIN part p ON p.p_partkey = li.l_partkey
  JOIN (SELECT l_partkey, SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sq,
               COUNT(*) AS cnt
        FROM lineitem GROUP BY l_partkey) t ON t.l_partkey = li.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND CAST(li.l_quantity AS DECIMAL(18,4)) * 5 * t.cnt < t.sq
""")
def tpch_q17_style(spark, sf_dir):
    """Small-quantity-order revenue (TPC-H Q17 shape). The correlated
    scalar subquery (0.2 * per-part avg quantity) is decorrelated into a
    per-part aggregate join, and the threshold is cross-multiplied
    (qty * 5 * cnt < sum) so both engines compare exact decimals —
    no avg/division rounding at the boundary."""
    li = _t(spark, sf_dir, "lineitem").alias("li")
    p = (_t(spark, sf_dir, "part")
         .filter(F.col("p_brand") == "Brand#1").alias("p"))
    t = (_t(spark, sf_dir, "lineitem")
         .groupBy("l_partkey")
         .agg(F.sum(_dec("l_quantity")).alias("sq"),
              F.count(F.lit(1)).alias("cnt")).alias("t"))
    return (li.join(F.broadcast(p), F.col("p.p_partkey") == F.col("li.l_partkey"))
            .join(t, F.col("t.l_partkey") == F.col("li.l_partkey"))
            .filter(F.col("li.l_quantity").cast(_D) * 5 * F.col("t.cnt")
                    < F.col("t.sq"))
            .agg((F.sum(F.col("li.l_extendedprice").cast(_D))
                  .cast("decimal(38,4)").cast("double") / F.lit(7.0))
                 .alias("avg_yearly")))


@q("tpch_q18", """
WITH big AS (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 150
)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       CAST(CAST(b.sum_qty AS DECIMAL(38,4)) AS DOUBLE) AS total_qty
FROM big b
  JOIN orders o ON o.o_orderkey = b.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
""")
def tpch_q18(spark, sf_dir):
    """Large-volume customers (TPC-H Q18): HAVING on an exact decimal
    sum selects big orders before the header/customer joins, so the
    joins see only the qualifying fraction."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").alias("o")
    c = _t(spark, sf_dir, "customer").alias("c")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum(_dec("l_quantity")).alias("sum_qty"))
           .filter(F.col("sum_qty") > F.lit(150).cast(_D)).alias("b"))
    return (big.join(o, F.col("o.o_orderkey") == F.col("b.l_orderkey"))
            .join(c, F.col("c.c_custkey") == F.col("o.o_custkey"))
            .select(F.col("c.c_name").alias("c_name"),
                    F.col("c.c_custkey").alias("c_custkey"),
                    F.col("o.o_orderkey").alias("o_orderkey"),
                    F.col("o.o_orderdate").alias("o_orderdate"),
                    F.col("o.o_totalprice").alias("o_totalprice"),
                    F.col("b.sum_qty").cast("decimal(38,4)").cast("double")
                    .alias("total_qty"))
            .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(100))


@q("tpch_q19_style", f"""
SELECT CAST(CAST(SUM({_REV_SQL}) AS DECIMAL(38,8)) AS DOUBLE) AS revenue
FROM lineitem li JOIN part p ON p.p_partkey = li.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
       AND li.l_quantity >= 1 AND li.l_quantity <= 20)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 5 AND 20
       AND li.l_quantity >= 5 AND li.l_quantity <= 30)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 10 AND 40
       AND li.l_quantity >= 10 AND li.l_quantity <= 40)
""")
def tpch_q19_style(spark, sf_dir):
    """Discounted-revenue OR-of-ANDs predicate (TPC-H Q19 shape,
    constants adapted to available columns). Catalyst extracts the
    common join key and pushes the per-branch part predicates below the
    join; the disjunction evaluates post-join in one codegen stage."""
    li = _t(spark, sf_dir, "lineitem").alias("li")
    p = _t(spark, sf_dir, "part").alias("p")
    qy = F.col("li.l_quantity")
    branch = (
        ((F.col("p.p_brand") == "Brand#1") & F.col("p.p_size").between(1, 10)
         & (qy >= 1) & (qy <= 20))
        | ((F.col("p.p_brand") == "Brand#2") & F.col("p.p_size").between(5, 20)
           & (qy >= 5) & (qy <= 30))
        | ((F.col("p.p_brand") == "Brand#3") & F.col("p.p_size").between(10, 40)
           & (qy >= 10) & (qy <= 40)))
    return (li.join(F.broadcast(p), F.col("p.p_partkey") == F.col("li.l_partkey"))
            .filter(branch)
            .agg(F.sum(_rev("li.l_extendedprice", "li.l_discount"))
                 .cast("decimal(38,8)").cast("double").alias("revenue")))


@q("tpch_q21_style", """
SELECT s.s_name, COUNT(*) AS numwait
FROM supplier s
  JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
  JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s.s_name
""")
def tpch_q21_style(spark, sf_dir):
    """Suppliers who kept orders waiting (TPC-H Q21 shape; "late" is
    adapted to l_returnflag='R' — the synthetic schema has no
    commit/receipt dates). The correlated EXISTS / NOT EXISTS pair
    becomes a left-semi then left-anti join on the same key with a
    non-equi residual (suppkey <>), the canonical Q21 plan."""
    li = _t(spark, sf_dir, "lineitem")
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.alias("l2")
    l3 = li.filter(F.col("l_returnflag") == "R").alias("l3")
    o = (_t(spark, sf_dir, "orders")
         .filter(F.col("o_orderstatus") == "F").alias("o"))
    s = _t(spark, sf_dir, "supplier").alias("s")
    sole_late = (
        l1.join(l2, (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
                & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")), "left_semi")
        .join(l3, (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
              & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey")), "left_anti"))
    return (sole_late.join(o, F.col("o.o_orderkey") == F.col("l1.l_orderkey"))
            .join(s, F.col("s.s_suppkey") == F.col("l1.l_suppkey"))
            .groupBy(F.col("s.s_name").alias("s_name"))
            .agg(F.count(F.lit(1)).alias("numwait")))


@q("tpch_q22_style", """
WITH pos AS (
  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS s, COUNT(*) AS n
  FROM customer WHERE c_acctbal > 0.0
)
SELECT CAST(c.c_custkey % 10 AS INTEGER) AS cntrycode,
       COUNT(*) AS numcust,
       CAST(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE)
       AS totacctbal
FROM customer c, pos
WHERE CAST(c.c_acctbal AS DECIMAL(18,4)) * pos.n > pos.s
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY 1
""")
def tpch_q22_style(spark, sf_dir):
    """Global sales opportunity (TPC-H Q22 shape; country code derived
    from c_custkey — the synthetic schema has no c_phone). Above-average
    balance is cross-multiplied (bal * n > sum) so the threshold
    comparison is exact decimal on both engines; customers without
    recent orders via left-anti join (every synthetic customer has SOME
    order, so 'no orders since 2000' keeps the anti-join non-degenerate)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    pos = (c.filter(F.col("c_acctbal") > 0.0)
           .agg(F.sum(_dec("c_acctbal")).alias("s"),
                F.count(F.lit(1)).alias("n")))
    recent = o.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
    return (c.join(recent, c["c_custkey"] == recent["o_custkey"], "left_anti")
            .join(F.broadcast(pos))
            .filter(_dec("c_acctbal") * F.col("n") > F.col("s"))
            .groupBy((F.col("c_custkey") % 10).cast("int").alias("cntrycode"))
            .agg(F.count(F.lit(1)).alias("numcust"),
                 F.sum(_dec("c_acctbal")).cast("decimal(38,4)").cast("double")
                 .alias("totacctbal")))


@q("tpch_q12_style", """
SELECT l.l_linestatus AS l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1 ORDER BY 1
""")
def tpch_q12_style(spark, sf_dir):
    """Shipping-priority split (TPC-H Q12 shape; the mode/commit/receipt
    columns are absent so the year band filters on l_shipdate and the
    grouping key is l_linestatus). The plan shape is the point: the
    selective fact filter reaches the scan, the join is fact->orders on
    the key, and both counters come from ONE pass of conditional
    aggregation — never two scans."""
    li = (_t(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))))
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .groupBy("l_linestatus")
            .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
                 F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count")))


@q("tpch_q20_style", """
WITH shipped AS (
  SELECT l_suppkey, l_partkey, SUM(CAST(l_quantity AS DECIMAL(18,4))) AS qty
  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_suppkey, l_partkey
), red_parts AS (
  SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
)
SELECT s.s_name, CAST(s.s_nationkey AS INT) AS s_nationkey
FROM supplier s
WHERE EXISTS (
  SELECT 1 FROM shipped sh JOIN red_parts p ON p.p_partkey = sh.l_partkey
  WHERE sh.l_suppkey = s.s_suppkey AND sh.qty > CAST(50.0 AS DECIMAL(18,4)))
ORDER BY s.s_name
""")
def tpch_q20_style(spark, sf_dir):
    """Suppliers with heavy shipments of red parts (TPC-H Q20 shape;
    partsupp/availqty is absent so "excess stock" is adapted to shipped
    quantity per (supplier, part) over a year exceeding a threshold).
    The nested IN-subquery chain becomes: grouped HAVING on the fact,
    semi-join to the filtered part list, semi-join up to supplier — the
    canonical Q20 reduction, all equi-joins, threshold compared in
    exact DECIMAL."""
    li = (_t(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))))
    shipped = (li.groupBy("l_suppkey", "l_partkey")
               .agg(F.sum(_dec("l_quantity")).alias("qty"))
               .filter(F.col("qty") > F.lit(50.0).cast(_D)))
    red = (_t(spark, sf_dir, "part")
           .filter(F.col("p_name").startswith("red"))
           .select("p_partkey"))
    heavy_supp = (shipped
                  .join(F.broadcast(red),
                        shipped["l_partkey"] == red["p_partkey"], "left_semi")
                  .select("l_suppkey").dropDuplicates(["l_suppkey"]))
    s = _t(spark, sf_dir, "supplier")
    return (s.join(heavy_supp, s["s_suppkey"] == heavy_supp["l_suppkey"], "left_semi")
            .select("s_name", F.col("s_nationkey").cast("int").alias("s_nationkey")))


@q("tpch_q2_style", """
WITH cost AS (  -- ps_supplycost proxy: per-unit price observed on shipments
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem WHERE l_quantity > 0 GROUP BY l_partkey, l_suppkey
), eu AS (
  SELECT s.s_suppkey, s.s_name, n.n_name
  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
                  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
), cand AS (
  SELECT c.l_partkey, c.unit_cost, e.s_suppkey, e.s_name, e.n_name
  FROM cost c JOIN eu e ON e.s_suppkey = c.l_suppkey
), best AS (
  SELECT l_partkey, MIN(unit_cost) AS min_cost FROM cand GROUP BY l_partkey
)
SELECT p.p_partkey, p.p_brand, CAST(p.p_size AS INT) AS p_size,
       c.s_name, c.n_name, c.unit_cost
FROM cand c
JOIN best b ON b.l_partkey = c.l_partkey AND c.unit_cost = b.min_cost
JOIN part p ON p.p_partkey = c.l_partkey
WHERE p.p_size IN (5, 10, 15)
ORDER BY p.p_partkey, c.s_suppkey
""")
def tpch_q2_style(spark, sf_dir):
    """Minimum-cost supplier per part in a region (TPC-H Q2 shape; the
    partsupp supply cost is proxied by the minimum observed per-unit
    shipment price). The correlated min-subquery decorrelates to a
    grouped MIN joined back on (part, cost) — the classic Q2 plan. The
    unit cost is a RATIO, so it stays in IEEE double (one shared
    division — bit-portable; decimal division is NOT, its quotient
    rounding depends on each engine's result-scale rules)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    cost = (li.groupBy("l_partkey", "l_suppkey")
            .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity"))
                 .alias("unit_cost")))
    s = _t(spark, sf_dir, "supplier").alias("s")
    n = _t(spark, sf_dir, "nation").alias("n")
    r = _t(spark, sf_dir, "region").alias("r")
    eu = (s.join(F.broadcast(n), F.col("s.s_nationkey") == F.col("n.n_nationkey"))
          .join(F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
                F.col("n.n_regionkey") == F.col("r.r_regionkey"))
          .select(F.col("s.s_suppkey").alias("s_suppkey"),
                  F.col("s.s_name").alias("s_name"),
                  F.col("n.n_name").alias("n_name")))
    cand = cost.join(eu, cost["l_suppkey"] == eu["s_suppkey"])
    best = cand.groupBy("l_partkey").agg(F.min("unit_cost").alias("min_cost"))
    p = (_t(spark, sf_dir, "part")
         .filter(F.col("p_size").isin(5, 10, 15)).alias("p"))
    return (cand.alias("c")
            .join(best.alias("b"),
                  (F.col("c.l_partkey") == F.col("b.l_partkey"))
                  & (F.col("c.unit_cost") == F.col("b.min_cost")))
            .join(p, F.col("p.p_partkey") == F.col("c.l_partkey"))
            .select(F.col("p.p_partkey").alias("p_partkey"),
                    F.col("p.p_brand").alias("p_brand"),
                    F.col("p.p_size").cast("int").alias("p_size"),
                    F.col("c.s_name").alias("s_name"),
                    F.col("c.n_name").alias("n_name"),
                    F.col("c.unit_cost").alias("unit_cost"))
            .orderBy("p_partkey", "c.s_suppkey"))


@q("tpch_q11_style", """
WITH pv AS (  -- per (part, nation) shipped value
  SELECT l.l_partkey, n.n_name,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS val
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  GROUP BY 1, 2
), de AS (SELECT l_partkey, val FROM pv WHERE n_name = 'NATION_7'),
tot AS (SELECT SUM(val) AS total FROM de)
SELECT d.l_partkey AS p_partkey, CAST(d.val AS DOUBLE) AS part_value
FROM de d, tot
WHERE d.val * 10000 > tot.total  -- value share > 0.01%, cross-multiplied
ORDER BY 2 DESC, 1
""")
def tpch_q11_style(spark, sf_dir):
    """Important-stock identification (TPC-H Q11 shape; partsupp value
    proxied by shipped value per part from NATION_7 suppliers). The
    HAVING-above-global-scalar-subquery decorrelates to a 1-row
    broadcast; the share threshold is cross-multiplied in DECIMAL so no
    engine divides."""
    li = _t(spark, sf_dir, "lineitem").alias("l")
    s = _t(spark, sf_dir, "supplier").alias("s")
    n = (_t(spark, sf_dir, "nation")
         .filter(F.col("n_name") == "NATION_7").alias("n"))
    de = (li.join(s, F.col("l.l_suppkey") == F.col("s.s_suppkey"))
          .join(F.broadcast(n), F.col("s.s_nationkey") == F.col("n.n_nationkey"))
          .groupBy(F.col("l.l_partkey").alias("l_partkey"))
          .agg(F.sum(_dec("l_extendedprice")).alias("val")))
    tot = de.agg(F.sum("val").alias("total"))
    return (de.crossJoin(F.broadcast(tot))
            .filter(F.col("val") * 10000 > F.col("total"))
            .select(F.col("l_partkey").alias("p_partkey"),
                    F.col("val").cast("double").alias("part_value"))
            .orderBy(F.desc("part_value"), "p_partkey"))
