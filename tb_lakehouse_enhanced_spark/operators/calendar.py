"""Calendar dimension (date spine) generator.

Re-expresses the reference's ``gold.dim_calendar`` CTAS
(reference notebooks/01_Init.py:180-233): a ``SEQUENCE``/``explode`` date
spine with derived attributes and the "smart" integer date key
``10000*year + 100*month + day`` (01_Init.py:197, also used by the fact
builder at 34_ETL_Gold_Fact_PySpark.py:75).

The spine is generated driver-free: one row with ``sequence()`` exploded
on the executors, so a century-long spine is still a single narrow task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def date_key(col):
    """Smart INT key yyyyMMdd (reference 01_Init.py:197)."""
    return (F.year(col) * 10000 + F.month(col) * 100 + F.dayofmonth(col)).cast("int")


def calendar_spine(spark: SparkSession, start: str = "1995-01-01",
                   end: str = "2002-12-31") -> DataFrame:
    """Build the calendar dimension for [start, end]."""
    d = F.col("cal_date")
    return (
        spark.range(1)
        .select(F.explode(F.sequence(
            F.to_date(F.lit(start)), F.to_date(F.lit(end)),
            F.expr("interval 1 day"))).alias("cal_date"))
        .select(
            date_key(d).alias("date_key"),
            d,
            F.year(d).cast("int").alias("cal_year"),
            F.quarter(d).cast("int").alias("cal_quarter"),
            F.month(d).cast("int").alias("cal_month"),
            F.dayofmonth(d).cast("int").alias("cal_day"),
            F.date_format(d, "EEEE").alias("day_name"),
            F.date_format(d, "MMMM").alias("month_name"),
            F.weekofyear(d).cast("int").alias("week_of_year"),
            (F.weekday(d) + 1).cast("int").alias("iso_day_of_week"),
            (F.weekday(d) >= 5).alias("is_weekend"),
            F.trunc(d, "month").alias("month_start"),
            F.last_day(d).alias("month_end"),
            # fiscal year shifted ~3 months (reference 01_Init.py:228)
            F.year(F.date_add(d, 89)).cast("int").alias("fiscal_year"),
        )
    )
