"""As-of (time-travel) join — an operator Spark lacks natively.

For each left row (key, ts) find the latest right row with the same key
and right.ts <= left.ts. Implemented as the union-sort trick rather than
a range join: tag both sides, sort within key by (ts, side) and carry
the last non-null right payload forward with an unbounded-preceding
``last(ignorenulls)`` window — ONE shuffle on the key, no range
explosion, no skewed inequality join (a range join re-scans right rows
per left row; the union-sort is linear in |left|+|right|).

At 100 TB both sides arrive partitioned by key; the union preserves
that, so the window sort is per-key and spill-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str = "ts", right_ts: str = "ts",
              payload: tuple[str, ...] = (),
              prefix: str = "asof_") -> DataFrame:
    """Left as-of join (backward, inclusive): latest right state at or
    before each left timestamp. Right payload columns are emitted as
    ``{prefix}{col}`` (NULL when no prior right row exists)."""
    out_payload = [f"{prefix}{p}" for p in payload]
    l = (left
         .withColumn("_ts", F.col(left_ts))
         .withColumn("_side", F.lit(1)))
    r = right.select(
        F.col(key), F.col(right_ts).alias("_ts"), F.lit(0).alias("_side"),
        *[F.col(p).alias(o) for p, o in zip(payload, out_payload)])
    both = l.unionByName(r, allowMissingColumns=True)

    # right rows (side 0) sort before left rows at equal ts => inclusive <=
    w = (Window.partitionBy(key).orderBy("_ts", "_side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    for o in out_payload:
        both = both.withColumn(o, F.last(o, ignorenulls=True).over(w))
    return both.filter(F.col("_side") == 1).select(*left.columns, *out_payload)
