"""As-of (time-travel) join — an operator Spark lacks natively.

For each left row (key, ts) find the right row with the same key that is
nearest in time under a direction rule:

- ``backward`` (default): latest right with right.ts <= left.ts
- ``forward``: earliest right with right.ts >= left.ts
- ``nearest``: whichever of the two is closer (ties -> backward)

Implemented as the union-sort trick rather than a range join: tag both
sides, sort within key by (ts, side) and carry the adjacent right
payload across with an unbounded ``last/first(ignorenulls)`` window —
ONE shuffle on the key, no range explosion, no skewed inequality join
(a range join re-scans right rows per left row; the union-sort is
linear in |left|+|right|). ``nearest`` runs both directional windows
over the SAME sorted partition, so it still costs one shuffle + one
sort.

At 100 TB both sides arrive partitioned by key; the union preserves
that, so the window sort is per-key and spill-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str = "ts", right_ts: str = "ts",
              payload: tuple[str, ...] = (),
              prefix: str = "asof_",
              direction: str = "backward") -> DataFrame:
    """Left as-of join. Right payload columns are emitted as
    ``{prefix}{col}`` (NULL when no matching right row exists in the
    chosen direction). Both directional bounds are INCLUSIVE; ``nearest``
    breaks exact-distance ties backward."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction {direction!r}")
    out_payload = [f"{prefix}{p}" for p in payload]

    # side ordering controls inclusivity at equal timestamps:
    #   backward window (frame ...current) must SEE a right row at the
    #   same ts  -> right sorts before left  (side 0 < 1);
    #   forward window (frame current...) must see it too -> right sorts
    #   after left (side 2 > 1). nearest uses side 0: the equal-ts row
    #   resolves through the backward branch with distance 0, which wins
    #   every tie anyway.
    r_side = 2 if direction == "forward" else 0
    l = (left
         .withColumn("_ts", F.col(left_ts))
         .withColumn("_side", F.lit(1)))
    r = right.select(
        F.col(key), F.col(right_ts).alias("_ts"),
        F.lit(r_side).alias("_side"),
        *[F.col(p).alias(o) for p, o in zip(payload, out_payload)])
    both = l.unionByName(r, allowMissingColumns=True)

    wb = (Window.partitionBy(key).orderBy("_ts", "_side")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wf = (Window.partitionBy(key).orderBy("_ts", "_side")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing))

    if direction == "backward":
        for o in out_payload:
            both = both.withColumn(o, F.last(o, ignorenulls=True).over(wb))
    elif direction == "forward":
        for o in out_payload:
            both = both.withColumn(o, F.first(o, ignorenulls=True).over(wf))
    else:  # nearest: both directions over the one sorted partition
        m_ts = F.when(F.col("_side") == r_side, F.col("_ts"))
        both = (both
                .withColumn("_mb", F.last(m_ts, ignorenulls=True).over(wb))
                .withColumn("_mf", F.first(m_ts, ignorenulls=True).over(wf)))
        use_fwd = (F.col("_mf").isNotNull()
                   & (F.col("_mb").isNull()
                      | (F.col("_mf").cast("double") - F.col("_ts").cast("double")
                         < F.col("_ts").cast("double") - F.col("_mb").cast("double"))))
        for o in out_payload:
            b_val = F.last(o, ignorenulls=True).over(wb)
            f_val = F.first(o, ignorenulls=True).over(wf)
            both = both.withColumn(o, F.when(use_fwd, f_val).otherwise(b_val))
        both = both.drop("_mb", "_mf")
    return both.filter(F.col("_side") == 1).select(*left.columns, *out_payload)
