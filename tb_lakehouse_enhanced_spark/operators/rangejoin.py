"""Range (interval) join — point-in-interval matching without a cross join.

Spark has no native range join (Databricks' range-join hint is
proprietary); the scalable OSS formulation buckets the domain: each
interval explodes to the fixed-width buckets it overlaps, each point
maps to exactly one bucket, and the join becomes a bucket equi-join
with the precise interval predicate as a residual filter. Work scales
with (intervals x buckets-per-interval + points), never |left| x |right|.
A point lands in exactly one bucket, so no post-join dedup is needed.

Bucket width tuning: ~the median interval length — each interval then
explodes to ~2 buckets while bucket populations stay balanced.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(points: DataFrame, intervals: DataFrame,
               point_col: str, start_col: str, end_col: str,
               bucket_width_days: int = 7,
               how: str = "inner") -> DataFrame:
    """Join point rows to interval rows where start <= point < end.

    Timestamp columns; bucketing on epoch-days. Returns the joined
    relation with all columns from both sides.
    """
    def day_bucket(c: Column) -> Column:
        return F.floor(F.unix_date(F.to_date(c)) / bucket_width_days).cast("long")

    p = points.withColumn("_pb", day_bucket(F.col(point_col)))
    i = intervals.withColumn(
        "_buckets",
        F.sequence(day_bucket(F.col(start_col)), day_bucket(F.col(end_col))))
    i = i.withColumn("_ib", F.explode("_buckets")).drop("_buckets")

    # the interval predicate lives INSIDE the join condition: with an
    # outer join a post-filter would silently drop never-matched
    # intervals (their point side is NULL)
    cond = ((F.col("_pb") == F.col("_ib"))
            & (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col)))
    joined = p.join(i, cond, how)
    # NOTE on outer variants: an interval exploded to k buckets yields up
    # to k unmatched rows; null-ignoring aggregates (count(col)/sum) are
    # unaffected — consume outer output through an aggregate, or use
    # how='inner' for row-level output.
    return joined.drop("_pb", "_ib")
