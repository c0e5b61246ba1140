"""Scalable global dense sequence (surrogate-key assignment).

``ROW_NUMBER() OVER (ORDER BY keys)`` with no PARTITION BY forces Spark
to funnel every row through ONE task (WindowExec warns about exactly
this) — fine for a 1 500-row dim, fatal for a 100 TB fact. This module
computes the identical dense 1..N sequence with the classic two-phase
formulation instead:

1. range-repartition on the order keys + local sort (the same machinery
   a global ``orderBy`` uses — a single range shuffle, all cores busy);
2. count rows per partition (tiny job: P counts to the driver);
3. global id = cumulative offset of the partition + local row_number
   (a PARTITIONED window — parallel).

The result does not depend on where the sampled range boundaries fall:
offsets + local ranks compose to the same global rank for any split, so
the output is deterministic whenever the order keys are unique (the same
condition under which the global window itself is deterministic).

Emulates ``GENERATED ... AS IDENTITY`` (reference 01_Init.py:59) the way
a distributed engine has to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PID = "_seq_pid"
_LOCAL = "_seq_local"


def dense_sequence(df: DataFrame, order_cols: list[str], out_col: str,
                   offset: int = 0, num_partitions: int | None = None) -> DataFrame:
    """Add ``out_col`` = offset + dense global rank of the row under
    ``order_cols`` (1-based), without a single-task global window."""
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    # Persist the INPUT, not the shuffled output: repartitionByRange runs
    # a boundary-sampling pass over its child, and both the count job and
    # the final job re-plan from the same lineage — an unpersisted child
    # (e.g. a merge's full-outer join) would be recomputed three times.
    # With the input cached, sampling reads the cache (RangePartitioner's
    # sketch is seeded deterministically, so boundaries agree across
    # jobs) and the range shuffle itself is reused as a skipped stage.
    src = df.persist()
    part = (src.repartitionByRange(n, *order_cols)
            .withColumn(_PID, F.spark_partition_id()))
    counts = {r[_PID]: r["cnt"] for r in
              part.groupBy(_PID).agg(F.count(F.lit(1)).alias("cnt")).collect()}
    acc, offsets = offset, {}
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if offsets:
        off_map = F.create_map(
            *[F.lit(v) for pid in sorted(offsets) for v in (pid, offsets[pid])])
        off_expr = F.coalesce(off_map[F.col(_PID)], F.lit(offset))
    else:  # empty input: no partitions counted (map() would type as void)
        off_expr = F.lit(offset)
    w = Window.partitionBy(_PID).orderBy(*order_cols)
    return (part.withColumn(_LOCAL, F.row_number().over(w))
            .withColumn(out_col,
                        (F.col(_LOCAL) + off_expr).cast("bigint"))
            .drop(_PID, _LOCAL))
