"""Star-schema fact builder.

Re-expresses the reference's gold fact load
(reference notebooks/34_ETL_Gold_Fact_PySpark.py:44-139): a left-deep
chain of left-outer equi-joins from the detail grain through header /
customer / geography, surrogate-key lookups with the ``COALESCE(..., -9)``
unknown-member convention (34:76-81) and the smart date key (34:75).

Mapped onto the driver's star schema (FIXTURES.md role mapping):
``lineitem`` = order detail, ``orders`` = header, ``customer`` /
``nation`` / ``region`` = customer + geography dims.

Scale design: the dimension sides (customer/nation/region at TPC-H
ratios) are orders of magnitude smaller than the fact; they are
explicitly ``broadcast()`` so the fact-side never shuffles — the plan is
a chain of BroadcastHashJoins over a single lineitem scan. At 100 TB the
lineitem scan partitions by file split; no shuffle appears anywhere in
the build (verified via .explain in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .calendar import date_key

UNKNOWN_MEMBER = -9  # reference 01_Init.py:265-277


def build_fact_sales(lineitem: DataFrame, orders: DataFrame,
                     customer: DataFrame, nation: DataFrame,
                     region: DataFrame) -> DataFrame:
    """Detail-grain fact with resolved dim keys and derived measures."""
    li, o = lineitem.alias("li"), orders.alias("o")
    c, n, r = customer.alias("c"), nation.alias("n"), region.alias("r")

    joined = (
        li.join(o, F.col("li.l_orderkey") == F.col("o.o_orderkey"),
                "left_outer")
        .join(c, F.col("o.o_custkey") == F.col("c.c_custkey"),
              "left_outer")
        .join(F.broadcast(n), F.col("c.c_nationkey") == F.col("n.n_nationkey"),
              "left_outer")
        .join(F.broadcast(r), F.col("n.n_regionkey") == F.col("r.r_regionkey"),
              "left_outer")
    )
    unknown = F.lit(UNKNOWN_MEMBER)
    return joined.select(
        F.col("li.l_orderkey").alias("order_key"),
        F.col("li.l_linenumber").alias("line_number"),
        F.coalesce(F.col("c.c_custkey"), unknown.cast("bigint")).alias("customer_key"),
        F.coalesce(F.col("n.n_nationkey"), unknown.cast("int")).alias("nation_key"),
        F.coalesce(F.col("r.r_regionkey"), unknown.cast("int")).alias("region_key"),
        F.coalesce(date_key(F.col("o.o_orderdate")), unknown.cast("int")).alias("order_date_key"),
        F.col("li.l_quantity").alias("quantity"),
        F.col("li.l_extendedprice").alias("extended_price"),
        # price*(1-disc) in exact integer 1e-4-dollar units, finished in
        # double: money columns are 2-decimal fixed-point stored as
        # double, so round(x*100) is the exact cents and the whole
        # expression stays in codegen's 64-bit path (no per-row
        # BigDecimal multiply)
        ((F.round(F.col("li.l_extendedprice") * 100).cast("long")
          * (F.lit(100).cast("long")
             - F.round(F.col("li.l_discount") * 100).cast("long")))
         .cast("double") / F.lit(1e4)).alias("net_revenue"),
    )
